"""Deduplication operators for training-data pipelines.

Exact and near-duplicate detection over a ``documents(doc_id, text)``
table, each designed to scale: every stage is a DataFrame op whose
shuffle keys are bounded (hash prefixes, band signatures), never an
all-pairs comparison — the only pairwise work happens on LSH-bucketed
or prefix-filtered candidates.

Hot-path design: shingling, hashing and signature math run in
Arrow-vectorized pandas UDFs (str.split + hashlib.md5 at C speed +
numpy) — Catalyst's interpreted higher-order-function path measured
~6 s per pass over 5k docs for the same work, and shingle-hash arrays
are computed ONCE and staged to parquet so candidate generation and
exact-Jaccard verification share them.

Two shingle-hash families, selected by ``hash_fn``:

- ``"md5_oracle"`` (default): low 8 md5 digest bytes little-endian ==
  DuckDB's ``md5_number_lower``, so an independent SQL engine can
  rebuild the exact hash sets — the value oracles for the
  minhash/simhash pair queries depend on this identity.
- ``"xxhash64"``: the production path — shingling AND hashing stay
  JVM-side (split/slice/concat_ws + ``F.xxhash64`` inside whole-stage
  codegen, zero Python in the hash loop). Same banding, candidate-join
  and exact-Jaccard verify machinery; not SQL-oracle-reproducible
  (DuckDB has no xxhash64), so its queries are pinned by pytest
  equivalence against the md5 path instead.

- exact_dedup:        md5-hash groupBy; canonical = min(doc_id)
- shingle_hashes:     (doc_id, hashes array<long>) staged basis
- minhash_signatures: k permutations (a*h + b) mod P over shingle hashes
- minhash_lsh_pairs:  band the signature, bucket-join, verify with real
                      Jaccard over the shared hash arrays
- simhash64:          63-bit simhash from shingle hashes
- ngram_jaccard_pairs: exact Jaccard on df-ordered prefix-filtered
                      candidates
"""

from __future__ import annotations

import hashlib
import random
import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window

# Mersenne prime 2^31-1: universal-hash modulus. Operands < 2^31 keep
# a*x + b under 2^62 — no int64 overflow (numpy or JVM).
_P = (1 << 31) - 1


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by content hash.

    Returns (content_hash, canonical_id, dup_count, doc_ids). One shuffle
    on the hash — at 100 TB the hash groupBy is the only viable exact
    strategy (map-side partial aggregation applies).
    """
    normalized = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return (
        docs.select(F.col(id_col), F.md5(normalized).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("dup_count"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
    )


# Canonical whitespace class for tokenization: exactly RE2's \s
# ([ \t\n\r\f]), written explicitly so the Python path (re), the JVM
# path (Java regex, whose \s also includes \x0b), and the DuckDB
# oracles (RE2 \s+) all split identically — including on exotic
# whitespace the test corpus doesn't contain.
_WS_CLASS = "[ \t\n\r\f]+"
_WS_RE = re.compile(_WS_CLASS)


def _shingle_set(text: str, n: int) -> set[str]:
    toks = [t for t in _WS_RE.split(text.lower()) if t]
    if len(toks) < n:
        return {"_".join(toks)} if toks else set()
    return {"_".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _md5_lower64(s: str) -> int:
    """Low 8 md5 digest bytes, little-endian — bit-identical to DuckDB's
    ``md5_number_lower``, which is what makes the pair oracles possible."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:16], "little")


def _hashes_udf(n: int):
    @pandas_udf("array<long>")
    def hashes(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if not t:
                out.append([])
                continue
            hs = {_md5_lower64(s) % _P for s in _shingle_set(t, n)}
            out.append(sorted(hs))
        return pd.Series(out)

    return hashes


def _shingle_expr(text_col: str, n: int):
    """Word shingles as a pure JVM expression — same semantics as
    ``_shingle_set``: lowercase, split on the canonical whitespace
    class, drop empty tokens, n-token windows joined by "_"; short docs
    collapse to one shingle."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), _WS_CLASS), lambda t: t != "")
    many = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
        lambda i: F.concat_ws("_", F.slice(toks, i, n)),
    )
    return (
        F.when(F.size(toks) >= n, many)
        .when(F.size(toks) > 0, F.array(F.concat_ws("_", toks)))
        .otherwise(F.array().cast("array<string>"))
    )


def _xxh_shingle_hashes_expr(
    text_col: str, n: int, modulus: int | None = _P, mask: int | None = None
):
    """Sorted distinct xxhash64 shingle hashes, entirely JVM-side (the
    production hash path: whole-stage codegen, no Python loop). ``modulus``
    maps into [0, P) for minhash math; ``mask`` keeps raw low bits for
    simhash voting."""

    def h(s):
        x = F.xxhash64(s)
        if modulus is not None:
            x = F.pmod(x, F.lit(modulus))
        if mask is not None:
            x = x.bitwiseAND(F.lit(mask))
        return x

    return F.array_sort(F.array_distinct(F.transform(_shingle_expr(text_col, n), h)))


def shingle_hashes(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    stage: bool = True,
    hash_fn: str = "md5_oracle",
) -> DataFrame:
    """(doc_id, hashes array<long>) — distinct word-shingle hashes,
    sorted, in [0, P). Staged to parquet by default so several consumers
    (signature generation, Jaccard verification, simhash) share one
    computation. ``hash_fn``: see module docstring — "md5_oracle"
    (DuckDB-reproducible pandas UDF) or "xxhash64" (JVM codegen)."""
    if hash_fn == "xxhash64":
        out = docs.select(
            F.col(id_col),
            _xxh_shingle_hashes_expr(text_col, shingle_n).alias("hashes"),
        )
    elif hash_fn == "md5_oracle":
        from rat_strain_loader_pipeline_spark.ship import ensure_shipped

        ensure_shipped(docs.sparkSession)
        out = docs.select(
            F.col(id_col), _hashes_udf(shingle_n)(F.col(text_col)).alias("hashes")
        )
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn!r}")
    if stage:
        from rat_strain_loader_pipeline_spark.staging import stage_to_parquet

        out = stage_to_parquet(out, "shingle-hashes")
    return out


def _minhash_coeffs(num_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """The seeded permutation coefficients (a odd, b) — the SINGLE
    source of the draw order; `_minhash_udf` and `_hashes_and_sig_udf`
    must stay bit-identical and both draw through here (pinned by
    tests/test_dedup_similarity.test_fused_udf_equals_two_stage)."""
    rnd = random.Random(seed)
    a = np.array([rnd.randrange(1, _P) | 1 for _ in range(num_hashes)], dtype=np.int64)
    b = np.array([rnd.randrange(0, _P) for _ in range(num_hashes)], dtype=np.int64)
    return a, b


def _minhash_udf(num_hashes: int, seed: int):
    a, b = _minhash_coeffs(num_hashes, seed)

    @pandas_udf("array<long>")
    def sig(hashes: pd.Series) -> pd.Series:
        out = []
        for h in hashes:
            if h is None or len(h) == 0:
                out.append([int(_P)] * num_hashes)
                continue
            hv = np.asarray(h, dtype=np.int64)
            m = ((a[:, None] * hv[None, :] + b[:, None]) % _P).min(axis=1)
            out.append(m.tolist())
        return pd.Series(out)

    return sig


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
    hashes: DataFrame | None = None,
    hash_fn: str = "md5_oracle",
) -> DataFrame:
    """(doc_id, sig array<long>) — k-permutation minhash over the staged
    shingle hashes. Deterministic given ``seed``."""
    from rat_strain_loader_pipeline_spark.ship import ensure_shipped

    ensure_shipped(docs.sparkSession)
    if hashes is None:
        hashes = shingle_hashes(docs, text_col, id_col, shingle_n, stage=False, hash_fn=hash_fn)
    sig = _minhash_udf(num_hashes, seed)
    return hashes.select(F.col(id_col), sig(F.col("hashes")).alias("sig"))


def band_signatures(
    sigs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """(id, band, band_sig) — the LSH banding of minhash signatures:
    each signature splits into ``bands`` row-groups, each hashed to one
    bucket key, so near-dup candidates reduce to equi-joins on
    (band, band_sig)."""
    rows_per_band = num_hashes // bands
    return sigs.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            ",",
                            *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)],
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_sig"),
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
    seed: int = 42,
    hot_bucket_cap: int | None = None,
    hash_fn: str = "md5_oracle",
    hashes: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs via banded minhash-LSH + exact-Jaccard verify.

    b=16, r=4 puts the S-curve threshold at (1/b)^(1/r) = 0.5. Pipeline:
    staged shingle hashes → signatures → explode to (band, band_sig) →
    self-join on the band bucket (equi-join: shuffle hash, never
    all-pairs) → distinct candidate pairs → exact Jaccard on the SAME
    staged hash arrays → threshold filter. Returns (id_a, id_b, jaccard)
    with id_a < id_b.

    ``hot_bucket_cap``: the 100 TB guard. A bucket with n members emits
    n(n-1)/2 candidate pairs — web-scale corpora have boilerplate
    buckets with 1e5+ near-identical members, which quadratically
    dominates the whole job. With a cap, buckets larger than it switch
    to star topology: every member pairs with the bucket's min id only
    (O(n) pairs). Pair ENUMERATION inside oversized buckets becomes
    incomplete, but dedup-survivor semantics are preserved — every
    member still verifies (exact Jaccard) against the representative it
    would transitively collapse into. None (default) = exact all-pairs.

    ``hashes``: an already-staged (id, hashes) table from
    ``shingle_hashes`` with the same (text_col, id_col, shingle_n,
    hash_fn) — lets several pair pipelines share one hash pass.
    """
    if hashes is None:
        hashes = shingle_hashes(docs, text_col, id_col, shingle_n, stage=True, hash_fn=hash_fn)
    sigs = minhash_signatures(docs, text_col, id_col, num_hashes, shingle_n, seed, hashes=hashes)
    banded = band_signatures(sigs, id_col, num_hashes, bands)

    hot_pairs = None
    if hot_bucket_cap is not None:
        # bucket size + representative in one window pass over the same
        # (band, band_sig) partitioning the join shuffles on anyway
        w = Window.partitionBy("band", "band_sig")
        sized = banded.withColumn("__n", F.count(F.lit(1)).over(w)).withColumn(
            "__rep", F.min(id_col).over(w)
        )
        hot_pairs = (
            sized.filter((F.col("__n") > hot_bucket_cap) & (F.col(id_col) != F.col("__rep")))
            .select(F.col("__rep").alias("id_a"), F.col(id_col).alias("id_b"))
        )
        banded = sized.filter(F.col("__n") <= hot_bucket_cap).drop("__n", "__rep")

    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.band_sig") == F.col("b.band_sig"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
    )
    if hot_pairs is not None:
        candidates = candidates.unionByName(hot_pairs)
    return _verify_jaccard(candidates.dropDuplicates(), hashes, id_col, jaccard_threshold)


def _verify_jaccard(
    candidates: DataFrame,
    hashes: DataFrame,
    id_col: str,
    threshold: float,
) -> DataFrame:
    """Exact Jaccard over shingle-hash arrays for candidate pairs."""
    return (
        candidates.join(
            hashes.select(F.col(id_col).alias("id_a"), F.col("hashes").alias("h_a")), "id_a"
        )
        .join(hashes.select(F.col(id_col).alias("id_b"), F.col("hashes").alias("h_b")), "id_b")
        .withColumn(
            # integer micros: floor(|i| * 1e6 / |u|) — exact (|i|*1e6 far
            # below 2^53, the double division can't cross an integer
            # boundary), matching DuckDB's `* 1000000 // len(u)`
            "jaccard_micros",
            F.floor(
                (F.size(F.array_intersect("h_a", "h_b")).cast("long") * 1_000_000)
                .cast("double")
                / F.size(F.array_union("h_a", "h_b")).cast("double")
            ).cast("long"),
        )
        .filter(F.col("jaccard_micros") >= int(round(threshold * 1_000_000)))
        .select("id_a", "id_b", "jaccard_micros")
    )


def simhash64(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 63,
    hash_fn: str = "md5_oracle",
) -> DataFrame:
    """SimHash per document (63 usable bits).

    Shingles hashed to 62 low bits — md5 path (DuckDB-reproducible, see
    ``_md5_lower64``) hashes in the same pandas UDF that votes; xxhash64
    path hashes JVM-side and the UDF only does the numpy bit voting.
    Bit votes vectorized in numpy per Arrow batch. Map-only — no shuffle
    at any scale. Near-dups then cluster by hamming distance on the
    signature (prefix-bucket join).
    """
    from rat_strain_loader_pipeline_spark.ship import ensure_shipped

    ensure_shipped(docs.sparkSession)
    shifts = np.arange(n_bits, dtype=np.int64)

    def _vote(hv: np.ndarray) -> int:
        bits = (hv[:, None] >> shifts[None, :]) & 1
        votes = (2 * bits - 1).sum(axis=0)
        return int(((votes > 0).astype(np.int64) << shifts).sum())

    if hash_fn == "xxhash64":

        @pandas_udf("long")
        def sim_from_hashes(harrs: pd.Series) -> pd.Series:
            out = np.zeros(len(harrs), dtype=np.int64)
            for i, h in enumerate(harrs):
                if h is None or len(h) == 0:
                    continue
                out[i] = _vote(np.asarray(h, dtype=np.int64))
            return pd.Series(out)

        hashes = _xxh_shingle_hashes_expr(
            text_col, 3, modulus=None, mask=(1 << 62) - 1
        )
        return docs.select(F.col(id_col), sim_from_hashes(hashes).alias("simhash"))
    if hash_fn != "md5_oracle":
        raise ValueError(f"unknown hash_fn: {hash_fn!r}")

    @pandas_udf("long")
    def sim(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            if not t:
                continue
            shingles = _shingle_set(t, 3)
            if not shingles:
                continue
            hv = np.array(
                [_md5_lower64(s) & ((1 << 62) - 1) for s in shingles],
                dtype=np.int64,
            )
            out[i] = _vote(hv)
        return pd.Series(out)

    return docs.select(F.col(id_col), sim(F.col(text_col)).alias("simhash"))


def simhash_near_dup_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 63,
    sigs: DataFrame | None = None,
    hash_fn: str = "md5_oracle",
) -> DataFrame:
    """Near-duplicate pairs by simhash hamming distance.

    Pigeonhole banding: split the signature into ``max_hamming + 1``
    bit-bands — any pair within hamming distance k differs in ≤ k bands,
    so at least one band matches exactly. Candidates come from an
    equi-join on (band, band_value) — shuffle-hash, never all-pairs —
    then exact ``bit_count(xor)`` verifies. Returns (id_a, id_b,
    hamming) with id_a < id_b. Pass precomputed ``sigs``
    (id_col, simhash) to reuse signatures across calls.
    """
    if sigs is None:
        sigs = simhash64(docs, text_col, id_col, n_bits, hash_fn=hash_fn)
    bands = max_hamming + 1
    width = n_bits // bands
    exprs = []
    for bi in range(bands):
        lo = bi * width
        w = n_bits - lo if bi == bands - 1 else width
        exprs.append(
            F.struct(
                F.lit(bi).alias("band"),
                F.shiftright(F.col("simhash"), lo).bitwiseAND(F.lit((1 << w) - 1)).alias("val"),
            )
        )
    banded = sigs.select(
        F.col(id_col), F.col("simhash"), F.explode(F.array(*exprs)).alias("bv")
    ).select(id_col, "simhash", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.val") == F.col("b.val"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("__sa"),
            F.col("b.simhash").alias("__sb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb"))).cast("int")
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Transitive closure of a near-duplicate pair graph → dedup groups.

    Pair emitters (minhash_lsh_pairs, simhash_near_dup_pairs, ...) give
    EDGES; dedup-survivor selection needs the component each doc
    belongs to (A~B, B~C ⇒ {A,B,C} collapse together even if A~C was
    never emitted). Hash-to-min label propagation WITH pointer jumping:
    every node starts as its own label; each round takes
    min(own, neighbors' labels) and then shortcuts through its label's
    label — the doubling step that makes convergence O(log n) rounds
    even on path graphs, not O(diameter). Per round: two shuffle joins
    + one groupBy, lineage truncated through a parquet stage.

    Returns (node_id, component_id = min node id in the component) for
    every node that appears in ``pairs``. Raises if the fixpoint is not
    reached within ``max_iterations`` (wrong labels must never be
    returned silently — survivors selected from them would underdedup).
    """
    from rat_strain_loader_pipeline_spark.staging import stage_to_parquet

    edges = stage_to_parquet(
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct(),
        "cc-edges",
    )
    labels = edges.select(F.col("src").alias("node_id")).distinct().withColumn(
        "label", F.col("node_id")
    )
    for i in range(max_iterations):
        nbr = (
            edges.join(labels.withColumnRenamed("node_id", "src"), "src")
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("dst", "node_id")
        )
        # carry the previous label through the round so convergence
        # detection needs NO second join: the staged round output holds
        # (old_label, label) side by side
        stepped = labels.join(nbr, "node_id", "left").select(
            "node_id",
            F.col("label").alias("old_label"),
            F.least(F.col("label"), F.coalesce("nbr_label", F.col("label"))).alias("label"),
        )
        # pointer jumping: follow label → that node's label (labels are
        # always node ids, so the self-join is total)
        parent = stepped.select(
            F.col("node_id").alias("label"), F.col("label").alias("label2")
        )
        staged = stage_to_parquet(
            stepped.join(parent, "label", "left").select(
                "node_id",
                "old_label",
                F.least(F.col("label"), F.coalesce("label2", F.col("label"))).alias("label"),
            ),
            f"cc-iter-{i}",
        )
        # fixpoint probe rides the staged round output: a limit(1) scan
        # over the parquet just written, not a join against the previous
        # round (which would re-shuffle both label sets per round)
        changed = (
            staged.filter(F.col("label") != F.col("old_label")).limit(1).count() > 0
        )
        labels = staged.select("node_id", "label")
        if not changed:
            return labels.select("node_id", F.col("label").alias("component_id"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} iterations"
    )


def connected_components_incremental(
    old_components: DataFrame,
    delta_pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Delta-batch component maintenance: merge a new batch's near-dup
    pairs into a STORED component table without recomputing closure
    over the old corpus — the dedup-at-ingest lifecycle
    (minhash_lsh_cross_pairs emits the delta edges; this folds them in).

    The old component table is a graph CONTRACTION: every old node
    collapses to its component id (which is the min node id of that
    component, so labels stay comparable with raw node ids). Each delta
    edge maps its endpoints through the stored labels (new nodes map to
    themselves), self-loops drop, and full CC runs ONLY on that
    contracted delta graph — bounded by the batch's edges and the
    components they touch, never by the old corpus. Untouched
    components keep their labels through a left join; merged labels are
    min-over-contracted-ids, which equals min-over-all-member-node-ids
    exactly because old labels are already component minima — so the
    result is bit-identical to scratch CC over the union edge set.

    Returns the updated (node_id, component_id) table covering old
    nodes ∪ delta-edge nodes.

    100 TB shape: per ingest batch the work is |delta edges| contracted
    rows through log-rounds CC plus two component-table-sized hash
    joins; the old pair set is never re-paired and old labels are never
    re-derived (the same incremental contract as incremental_rollup and
    join_delta).
    """
    old = old_components.select("node_id", "component_id")
    edges = delta_pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    contracted = (
        edges.join(
            old.select(
                F.col("node_id").alias("src"), F.col("component_id").alias("c_src")
            ),
            "src",
            "left",
        )
        .join(
            old.select(
                F.col("node_id").alias("dst"), F.col("component_id").alias("c_dst")
            ),
            "dst",
            "left",
        )
        .select(
            F.coalesce("c_src", F.col("src")).alias("id_a"),
            F.coalesce("c_dst", F.col("dst")).alias("id_b"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
    )
    merged = connected_components(contracted, max_iterations=max_iterations)
    relabel = merged.select(
        F.col("node_id").alias("old_cid"), F.col("component_id").alias("new_cid")
    )
    old_upd = (
        old.join(relabel, old["component_id"] == relabel["old_cid"], "left")
        .select(
            "node_id",
            F.coalesce("new_cid", F.col("component_id")).alias("component_id"),
        )
    )
    delta_nodes = (
        edges.select(F.col("src").alias("node_id"))
        .unionByName(edges.select(F.col("dst").alias("node_id")))
        .distinct()
        .join(old.select("node_id"), "node_id", "left_anti")
    )
    new_upd = (
        delta_nodes.join(
            relabel, delta_nodes["node_id"] == relabel["old_cid"], "left"
        )
        .select(
            "node_id",
            F.coalesce("new_cid", F.col("node_id")).alias("component_id"),
        )
    )
    return old_upd.unionByName(new_upd)


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
    prefix_cap: int | None = 8,
    hash_fn: str = "md5_oracle",
    hashes: DataFrame | None = None,
) -> DataFrame:
    """N-gram Jaccard near-dup pairs via df-ordered prefix filtering.

    Classic prefix filtering: order each document's shingle hashes by
    GLOBAL rarity (ascending document frequency) and emit only the first
    ``|sh| - ceil(threshold*|sh|) + 1`` as join tokens — a pair with
    Jaccard >= threshold must share one. Ordering by rarity bounds the
    candidate fanout by the rarest shingles' df². ``prefix_cap``
    additionally bounds the prefix (trades recall for a hard fanout
    limit on adversarial corpora); None applies the exact bound.

    Three shuffles (df groupBy, df join on tok, candidate join), all on
    long hashes (never strings). No global rank: the prefix window only
    needs SOME deterministic total order by rarity, and (df, tok) already
    is one — a dense global row_number would funnel every distinct token
    through a single unpartitioned-window task and then broadcast a map
    that is billions of entries at 100 TB.

    ``hashes``: an already-staged (id, hashes) table from
    ``shingle_hashes`` with the same parameters — shares one hash pass
    across pair pipelines (the minhash_lsh_pairs contract).
    """
    if hashes is None:
        hashes = shingle_hashes(docs, text_col, id_col, shingle_n, stage=True, hash_fn=hash_fn)

    df_counts = (
        hashes.select(F.explode("hashes").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )

    exploded = hashes.select(id_col, F.size("hashes").alias("n_sh"), F.explode("hashes").alias("tok"))
    ranked = exploded.join(df_counts, "tok")

    w = Window.partitionBy(id_col).orderBy("df", "tok")
    prefix_len = (F.col("n_sh") - F.ceil(F.col("n_sh") * F.lit(threshold)) + 1).cast("int")
    if prefix_cap is not None:
        prefix_len = F.least(prefix_len, F.lit(prefix_cap))
    prefix = (
        ranked.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= prefix_len)
        .select(id_col, "tok")
    )

    a = prefix.select(F.col(id_col).alias("id_a"), "tok")
    b = prefix.select(F.col(id_col).alias("id_b"), "tok")
    candidates = (
        a.join(b, "tok")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates()
    )
    return _verify_jaccard(candidates, hashes, id_col, threshold)


def remove_duplicate_lines(
    docs: DataFrame,
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level duplicate-line removal (the RefinedWeb/CCNet-style
    boilerplate filter): a line that occurs >= ``min_count`` times across
    the WHOLE corpus (headers, footers, nav text, license banners) is
    dropped from every document; each document's remaining lines are
    reassembled in their original order.

    Shape at scale: split+posexplode (map-side) -> one groupBy(line)
    count -> join back by line -> one groupBy(doc) reassembly. Line
    counts are corpus-global, so this is inherently two shuffles — the
    same envelope as exact_dedup but keyed on lines. Reassembly uses
    sort_array(collect_list(struct(pos, line))), so output text is
    deterministic regardless of partitioning; per-doc line lists are
    bounded by document size, the same per-group envelope every other
    per-doc operator here assumes.

    Returns (id_col, clean_text, n_kept, n_removed).
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    counts = lines.groupBy("line").agg(F.count(F.lit(1)).alias("line_count"))
    keep = F.col("line_count") < min_count
    return (
        lines.join(counts, "line")
        .groupBy(id_col)
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.when(keep, F.struct("pos", "line")))
                    ),
                    lambda s: s.line,
                ),
            ).alias("clean_text"),
            F.sum(keep.cast("long")).alias("n_kept"),
            F.sum((~keep).cast("long")).alias("n_removed"),
        )
    )


def _winnow_udf(k: int, w: int, modulus: int = _P):
    """Arrow-batched winnowed-fingerprint computation on the md5-oracle
    hash identity (``md5_number_lower % modulus``) — the same
    pandas-UDF pattern as ``_hashes_udf``: Python hashlib beats a
    JVM higher-order ``transform`` here because HOF lambdas are
    interpreted per element (the md5-fold chain inside one ran ~8x
    slower than this at sf0.1)."""

    @pandas_udf("array<long>")
    def fps(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = [x for x in _WS_RE.split((t or "").lower()) if x]
            if not toks:
                out.append([])
                continue
            if len(toks) < k:
                grams = ["_".join(toks)]
            else:
                grams = ["_".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
            hs = np.array([_md5_lower64(g) % modulus for g in grams], dtype=np.int64)
            if len(hs) <= w:
                mins = [int(hs.min())]
            else:
                mins = (
                    np.unique(
                        np.lib.stride_tricks.sliding_window_view(hs, w).min(axis=1)
                    )
                    .astype(int)
                    .tolist()
                )
            out.append(sorted(set(mins)))
        return pd.Series(out)

    return fps


def winnow_fingerprints_expr(
    text_col: str = "text", k: int = 4, w: int = 5, modulus: int = _P
):
    """Winnowing fingerprint set as pure JVM column expressions on the
    PRODUCTION hash (``xxhash64 % modulus`` — one hash call per gram):
    positional k-token-gram hashes, sliding windows of ``w`` consecutive
    hashes, the minimum hash of each window, distinct-sorted. The MOSS
    scheme (Schleimer/Wilkerson/Aiken, SIGMOD'03): any shared token run
    of >= w+k-1 tokens between two documents is guaranteed to share at
    least one fingerprint. The oracle-identity twin lives in
    ``_winnow_udf`` (md5-fold, Arrow-batched), mirroring the
    md5_oracle/xxhash64 dual-path of the minhash pipeline."""
    grams = _shingle_expr(text_col, k)
    hashes = F.transform(grams, lambda s: F.pmod(F.xxhash64(s), F.lit(modulus)))
    n_windows = F.size(hashes) - (w - 1)
    wins = F.sequence(F.lit(1), F.greatest(n_windows, F.lit(1)))
    return F.array_sort(
        F.array_distinct(
            F.transform(wins, lambda j: F.array_min(F.slice(hashes, j, w)))
        )
    )


def _winnow_shared_counts(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    w: int,
    stop_df: int,
    hash_fn: str,
    stage_label: str,
):
    """Shared winnowing basis for both pair operators: staged exploded
    fingerprint table, stop-df pruning, and the inverted-index
    shared-fingerprint counts. Returns (fps, shared) where ``fps`` is
    the staged PRE-prune (id, fp) table and ``shared`` is
    (id_a, id_b, n_shared) over stop-df-surviving fingerprints — the
    SINGLE source of the fingerprint/prune/join semantics both
    ``winnow_dup_pairs`` and ``winnow_containment_pairs`` promise are
    identical."""
    from rat_strain_loader_pipeline_spark.staging import stage_to_parquet

    if hash_fn == "md5_oracle":
        from rat_strain_loader_pipeline_spark.ship import ensure_shipped

        ensure_shipped(docs.sparkSession)
        fp_arr = _winnow_udf(k, w)(F.col(text_col))
    elif hash_fn == "xxhash64":
        fp_arr = winnow_fingerprints_expr(text_col, k, w)
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn!r}")
    fps = stage_to_parquet(
        docs.select(F.col(id_col), F.explode(fp_arr).alias("fp")).filter(
            F.col("fp").isNotNull()
        ),
        stage_label,
    )
    keep = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= stop_df)
        .select("fp")
    )
    pruned = fps.join(keep, "fp")
    a, b = pruned.alias("a"), pruned.alias("b")
    shared = (
        a.join(
            b,
            on=[
                F.col("a.fp") == F.col("b.fp"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return fps, shared


def winnow_dup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 5,
    stop_df: int = 20,
    min_shared: int = 2,
    hash_fn: str = "md5_oracle",
) -> DataFrame:
    """Substring near-dup candidate pairs via winnowing fingerprints
    (the MOSS local-fingerprinting scheme): explode per-doc fingerprint
    sets, drop STOP fingerprints (present in more than ``stop_df`` docs
    — boilerplate k-grams whose inverted lists would quadratically
    dominate, the same guard family as ``hot_bucket_cap``), then an
    inverted-index self-join pairs docs sharing >= ``min_shared``
    surviving fingerprints. Detects shared SUBSTRINGS (>= w+k-1 token
    runs are guaranteed a common fingerprint) that whole-document
    hashing misses and set-level Jaccard dilutes. Returns
    (id_a, id_b, n_shared) with id_a < id_b.

    ``hash_fn``: "md5_oracle" (DuckDB-reproducible, Arrow-batched UDF)
    or "xxhash64" (JVM expressions, the 100 TB production hash) — the
    same dual-path contract as ``minhash_lsh_pairs``.

    100 TB shape: fingerprint count per doc is ~tokens/w (winnowing
    SAMPLES the k-gram stream); the fingerprint table is STAGED so the
    expensive hash pass runs once (both the stop-df aggregate and the
    join probe read the staged copy); the self-join is equi on
    fingerprint with every inverted list bounded by ``stop_df``, so
    candidate volume is O(n_fingerprints * stop_df^2) — never
    all-pairs, never unbounded per key."""
    _fps, shared = _winnow_shared_counts(
        docs, text_col, id_col, k, w, stop_df, hash_fn, "winnow-fps"
    )
    return shared.filter(F.col("n_shared") >= min_shared)


def _hashes_and_sig_udf(shingle_n: int, num_hashes: int, seed: int):
    """Fused shingle-hash + minhash-signature computation in ONE
    Arrow-batched pass (struct<hashes, sig> output) — the streaming
    gate's per-batch path, where two separate pandas-UDF stages would
    double the fixed Python-worker round-trip cost per micro-batch.
    Hash math is identical to ``_hashes_udf`` + ``_minhash_udf``
    (md5_number_lower % P, coefficients from the shared
    ``_minhash_coeffs`` draw), so decisions are bit-identical to the
    two-stage path — pinned by an equivalence test."""
    a, b = _minhash_coeffs(num_hashes, seed)

    @pandas_udf("struct<hashes: array<long>, sig: array<long>>")
    def both(texts: pd.Series) -> pd.DataFrame:
        hs_out, sig_out = [], []
        empty_sig = [int(_P)] * num_hashes
        for t in texts:
            hs = sorted({_md5_lower64(s) % _P for s in _shingle_set(t or "", shingle_n)})
            hs_out.append(hs)
            if not hs:
                sig_out.append(empty_sig)
                continue
            hv = np.asarray(hs, dtype=np.int64)
            sig_out.append(((a[:, None] * hv[None, :] + b[:, None]) % _P).min(axis=1).tolist())
        return pd.DataFrame({"hashes": hs_out, "sig": sig_out})

    return both


def dedup_survivors_by(
    docs: DataFrame,
    pairs: DataFrame,
    order_cols: list,
    id_col: str = "doc_id",
) -> DataFrame:
    """Priority survivor selection: keep the BEST member of each
    near-dup component by an explicit ordering — the production
    curation policy (keep the longest / highest-quality / most-trusted
    copy) where plain ``dedup_survivors`` keeps the min id. Docs in no
    pair are their own singleton component and always survive.

    ``order_cols`` must totally order members (end with the id column
    as tie-break) or survivor choice is nondeterministic. Returns the
    surviving doc rows plus their ``component_id``.

    100 TB shape: components via the O(log n)-round hash-to-min pass,
    then ONE hash-partitioned window per component — partition size =
    component size (boilerplate mega-components should be capped
    upstream via hot_bucket_cap before they reach here)."""
    from rat_strain_loader_pipeline_spark.operators.sampling import topk_per_group

    cc = connected_components(pairs)
    members = docs.join(
        cc.withColumnRenamed("node_id", id_col), id_col, "left"
    ).withColumn(
        "component_id",
        F.coalesce(F.col("component_id"), F.col(id_col)).cast("long"),
    )
    return topk_per_group(
        members, ["component_id"], order_cols, k=1, rank_col="__rn"
    ).drop("__rn")


def winnow_containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 5,
    stop_df: int = 20,
    containment: float = 0.8,
    hash_fn: str = "md5_oracle",
) -> DataFrame:
    """Near-CONTAINMENT pairs: doc pairs where the smaller fingerprint
    set is mostly inside the other's — the quote/excerpt/wrapper-page
    relation that symmetric Jaccard misses entirely (a 100-word doc
    fully quoted inside a 10k-word doc has Jaccard ~0.01 but
    containment ~1.0).

    Score = |shared fingerprints| / min(|fps_a|, |fps_b|), emitted as
    floored micro-units over pairs sharing at least one surviving
    (stop-df pruned) fingerprint. Same winnowing basis, staging, and
    inverted-index join bounds as ``winnow_dup_pairs``; the per-doc
    fingerprint-count table (doc-cardinality) joins in by id.
    Returns (id_a, id_b, n_shared, containment_micros), id_a < id_b,
    containment >= the threshold."""
    fps, shared = _winnow_shared_counts(
        docs, text_col, id_col, k, w, stop_df, hash_fn, "winnow-cont-fps"
    )
    n_fps = fps.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_fps"))
    na = n_fps.select(F.col(id_col).alias("id_a"), F.col("n_fps").alias("nfa"))
    nb = n_fps.select(F.col(id_col).alias("id_b"), F.col("n_fps").alias("nfb"))
    cont = F.col("n_shared").cast("double") / F.least("nfa", "nfb").cast("double")
    return (
        shared.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_shared",
            F.floor(cont * F.lit(1000000.0)).cast("bigint").alias("containment_micros"),
        )
        .filter(F.col("containment_micros") >= int(containment * 1_000_000))
    )


def duplicated_span_removal(
    docs: DataFrame,
    k: int = 8,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    pos_enc: int = 1 << 20,
    counts_only: bool = False,
    scope: str = "cross_doc",
    min_run: int | None = None,
) -> DataFrame:
    """Exact duplicated-SPAN removal (the suffix-array-style step of
    Lee et al.'s "Deduplicating Training Data" recast as a Spark plan):
    every k-token span whose exact text occurs in >= ``min_df``
    DISTINCT documents is excised from every occurrence except the
    global first (keep-first: minimal (doc_id, position)); surviving
    tokens are reassembled in original order. A duplicated run of
    L >= k tokens yields L-k+1 overlapping duplicated k-grams whose
    coverage union is the whole run, so long shared boilerplate is
    stripped wholesale while the keeper document keeps its copy intact.
    Complements the detectors: E25/E31 (winnowing) FIND shared
    substrings, this REMOVES them — the step a curation run performs
    right after near-dup dedup.

    Semantics are exact, not sketched: span identity is the full
    md5 hex of the '_'-joined k tokens (128-bit — collisions are not a
    practical concern, the exact_dedup precedent), case-sensitive and
    whitespace-canonical, so the DuckDB oracle rebuilds identical
    spans via list ops. Keep-first is encoded order-free as
    min(doc_id * pos_enc + pos); ``pos_enc`` bounds per-doc token
    positions (default 2^20 — raise it for documents beyond ~1M
    tokens).

    Shape at scale: one staged explode to span-occurrence grain
    (O(total tokens) rows, the winnow-exf envelope), one
    groupBy(span-hash) stats pass (count-distinct + min — map-side
    partial, no list accumulation, so boilerplate hot spans skew only
    a counter), one join back on span-hash, a bounded coverage explode
    (dup occurrences x k), and one per-doc reassembly groupBy bounded
    by document size (the remove_duplicate_lines envelope). Nothing is
    all-pairs; nothing collects.

    Returns (id_col, clean_text, n_tokens, n_removed); with
    ``counts_only=True`` skips the token re-explode and ordered
    reassembly entirely (n_removed = per-doc covered-position count)
    and returns (id_col, n_tokens, n_removed) — the cheap path for
    consumers that budget tokens without needing the excised text
    (corpus_curation's span stage). Without a ``min_run`` floor the
    counts path never materializes covered positions at all: the
    covered count is the per-doc union length of the [pos, pos+k-1]
    intervals, computed with one running-max window over duplicate
    occurrences — same value, no k-wide explode, no corpus-sized
    DISTINCT shuffle.

    ``scope`` picks the duplication criterion: "cross_doc" (default)
    counts DISTINCT documents per span — within-doc repetition is left
    alone; "all" counts raw occurrences — the Lee et al. criterion
    (any span repeated anywhere, including inside one document, keeps
    exactly its global first occurrence), which also strips
    within-document repetition loops (the Gopher-style repetition
    pathology) rather than just measuring them.

    ``min_run`` (None = off) excises only maximal covered RUNS of at
    least that many tokens — the Lee et al. length floor (they use 50):
    overlapping/adjacent duplicated k-grams union into runs first, then
    runs shorter than ``min_run`` are forgiven, so incidental k-token
    collisions survive while genuine boilerplate blocks are stripped.
    Run detection is one per-doc gaps-and-islands window (partition =
    document, bounded by document length — the same per-doc window
    envelope as reassembly).
    """
    from rat_strain_loader_pipeline_spark.staging import stage_to_parquet

    toks = F.filter(F.split(F.col(text_col), _WS_CLASS), lambda t: t != "")
    base = docs.select(F.col(id_col), toks.alias("ts"))
    # span identity is the full md5 of the joined k tokens (see above);
    # it is carried as 16-byte binary (unhex) rather than the 32-char
    # hex string — identical identity, half the staged/shuffled bytes
    gram_structs = F.when(
        F.size("ts") >= k,
        F.transform(
            F.sequence(F.lit(1), F.size("ts") - F.lit(k - 1)),
            lambda i: F.struct(
                (i - 1).cast("long").alias("pos"),
                F.unhex(
                    F.md5(F.concat_ws("_", F.slice(F.col("ts"), i, k)))
                ).alias("gh"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:long,gh:binary>>"))
    occ = stage_to_parquet(
        base.select(F.col(id_col), F.explode(gram_structs).alias("o")).select(
            id_col, F.col("o.pos").alias("pos"), F.col("o.gh").alias("gh")
        ),
        "span-occ",
    )
    if scope == "cross_doc":
        df_agg = F.countDistinct(id_col)
    elif scope == "all":
        df_agg = F.count(F.lit(1))
    else:
        raise ValueError(f"unknown scope: {scope!r}")
    stats = occ.groupBy("gh").agg(
        df_agg.alias("dfd"),
        F.min(F.col(id_col) * pos_enc + F.col("pos")).alias("keeper_key"),
    )
    dup_occ = occ.join(stats.filter(F.col("dfd") >= min_df), "gh").filter(
        F.col(id_col) * pos_enc + F.col("pos") != F.col("keeper_key")
    )
    counts = base.select(F.col(id_col), F.size("ts").cast("long").alias("n_tokens"))
    if counts_only and (min_run is None or min_run <= k):
        # n_removed = |union of the [pos, pos+k-1] intervals| per doc.
        # Computing the union length directly with one per-doc window
        # (running max of interval end over preceding occurrences)
        # replaces the k-wide coverage explode + corpus-sized DISTINCT
        # shuffle with a shuffle of just the duplicate occurrences:
        # contribution of each interval = end - max(prev_max_end,
        # pos - 1), clamped at 0 — exactly the covered-position count.
        w = (
            Window.partitionBy(id_col)
            .orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        prev_end = F.max(F.col("pos") + F.lit(k - 1)).over(w)
        contrib = F.greatest(
            F.lit(0).cast("long"),
            (F.col("pos") + F.lit(k - 1))
            - F.greatest(F.coalesce(prev_end, F.lit(-1)), F.col("pos") - 1),
        )
        rm = (
            dup_occ.select(F.col(id_col), "pos")
            .withColumn("contrib", contrib)
            .groupBy(id_col)
            .agg(F.sum("contrib").alias("n_rm"))
        )
        return counts.join(rm, id_col, "left").select(
            id_col,
            "n_tokens",
            F.coalesce(F.col("n_rm"), F.lit(0)).cast("long").alias("n_removed"),
        )
    covered = dup_occ.select(
        id_col,
        F.explode(F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))).alias("cpos"),
    ).distinct()
    if min_run is not None and min_run > k:
        w = Window.partitionBy(id_col).orderBy("cpos")
        isl = covered.withColumn(
            "isl_id",
            F.sum(
                (F.col("cpos") - F.lag("cpos", 1, -2).over(w) > 1).cast("int")
            ).over(w),
        )
        runs = isl.groupBy(id_col, "isl_id").agg(
            F.count(F.lit(1)).alias("run_len")
        )
        covered = isl.join(
            runs.filter(F.col("run_len") >= min_run), [id_col, "isl_id"]
        ).select(id_col, "cpos")
    if counts_only:
        rm = covered.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_rm"))
        return counts.join(rm, id_col, "left").select(
            id_col,
            "n_tokens",
            F.coalesce(F.col("n_rm"), F.lit(0)).cast("long").alias("n_removed"),
        )
    tokpos = base.select(
        F.col(id_col), F.posexplode("ts").alias("pos", "tk")
    ).withColumn("pos", F.col("pos").cast("long"))
    kept = tokpos.join(
        covered,
        on=[
            tokpos[id_col] == covered[id_col],
            tokpos["pos"] == covered["cpos"],
        ],
        how="left_anti",
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "tk"))),
                lambda s: s.tk,
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return counts.join(rebuilt, id_col, "left").select(
        id_col,
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        "n_tokens",
        (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0))).alias("n_removed"),
    )


# CDC (content-defined chunking) parameters — shared by the engine and
# the oracle generator in __spark_entry__.py
CDC_WINDOW = 16
CDC_BASE = 31
CDC_MOD = 1 << 20
CDC_BOUNDARY_MOD = 64


def cdc_duplicate_chunks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-defined chunking dedup — the byte/substring-level
    duplication report (LBFS/rsync-style): a Karp-Rabin rolling hash
    over a CDC_WINDOW-char window marks a chunk boundary wherever
    h % CDC_BOUNDARY_MOD == 0 (expected chunk ~64 chars), so IDENTICAL
    substrings chunk identically regardless of their offset in the
    document — the property fixed-width shingling lacks. Duplicated
    chunks (md5 identity, > 1 occurrence corpus-wide) are reported with
    doc/occurrence counts.

    Shapes: boundary detection runs in ONE Arrow-batched mapInPandas
    pass (np.correlate sliding dot products — exact int64: codepoints ×
    powers × window stay far under 2^53; the interpreted Catalyst HOF
    formulation of the same math measured >100 s at sf0.01, the
    module's standing hot-path finding); chunk hashing (md5/length)
    stays JVM-side and the only shuffle is the (chunk_hash) partial
    agg. The DuckDB oracle replays the identical per-position integer
    polynomial.

    Returns (chunk_hash, chunk_len, n_docs, n_occurrences).
    """
    from rat_strain_loader_pipeline_spark.ship import ensure_shipped

    ensure_shipped(docs.sparkSession)
    w, mod, bmod = CDC_WINDOW, CDC_MOD, CDC_BOUNDARY_MOD
    powers = np.array(
        [pow(CDC_BASE, w - 1 - j, mod) for j in range(w)], dtype=np.int64
    )

    def run(batches):
        for pdf in batches:
            out_id, out_chunk = [], []
            for row in pdf.itertuples(index=False):
                t = row[1]
                if not t:
                    continue
                n = len(t)
                # exact codepoints, vectorized (== F.ascii / DuckDB ascii)
                codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(
                    np.int64
                )
                if n >= w:
                    # np.correlate(a, v)[k] = sum_j a[k+j]*v[j] — the
                    # window starting at k scored against powers directly
                    h = np.correlate(codes, powers)
                    ends = np.nonzero((h % mod) % bmod == 0)[0] + w  # 1-based end p
                    bounds = ends.tolist()
                else:
                    bounds = []
                if not bounds or bounds[-1] != n:
                    bounds.append(n)
                lo = 0
                for b in bounds:
                    out_id.append(row[0])
                    out_chunk.append(t[lo:b])
                    lo = b
            yield pd.DataFrame({id_col: pd.Series(out_id, dtype="int64"),
                                "chunk": pd.Series(out_chunk, dtype="object")})

    exploded = (
        docs.select(F.col(id_col), F.col(text_col))
        .mapInPandas(run, schema=f"{id_col} long, chunk string")
        .select(
            F.col(id_col),
            F.md5("chunk").alias("chunk_hash"),
            F.length("chunk").cast("long").alias("chunk_len"),
        )
    )
    return (
        exploded.groupBy("chunk_hash")
        .agg(
            F.min("chunk_len").alias("chunk_len"),
            F.countDistinct(id_col).cast("long").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_occurrences") > 1)
    )


def fuzzy_name_matches(
    df: DataFrame,
    name_col: str,
    max_dist: int = 2,
    block_positions: int = 2,
    max_block: int | None = None,
) -> DataFrame:
    """Entity-resolution candidate matching: blocked edit-distance join
    over the DISTINCT value vocabulary of ``name_col``.

    The canonical record-linkage shape (Fellegi-Sunter blocking +
    string comparator): collapsing to distinct names FIRST means block
    sizes are bounded by vocabulary, not by row count — a table with a
    billion rows but a million distinct names pairs at vocabulary
    scale. Blocking keys are (position, token) for the first
    ``block_positions`` whitespace tokens, so two names pair when they
    agree on ANY early token ("red widget" ~ "red bolt" via
    ("red", 0)) — the multi-key union that keeps recall without an
    all-pairs product. Candidates dedupe on the ordered name pair,
    then exact ``levenshtein`` verifies; distance 0 (identical, not a
    match *candidate*) is excluded, distances in [1, max_dist] emit.

    100 TB shape: one distinct on names (vocab-sized), one
    (pos, token)-keyed self-join whose fan-out is per-block-size², and
    the verify runs only on candidates. Skewed blocks (a stop-token
    shared by half the vocabulary) follow the minhash hot-bucket-cap
    precedent (`minhash_lsh_pairs`): pass ``max_block`` and blocking
    keys whose block exceeds it are dropped BEFORE the join — bounded
    recall traded for a hard fan-out ceiling. Returns
    (name_a, name_b, dist).
    """
    names = df.select(F.col(name_col).alias("name")).distinct()
    toks = (
        names.select(
            "name",
            F.posexplode(
                F.filter(
                    F.split(F.trim("name"), "[ \t\n\r\f]+"), lambda t: t != ""
                )
            ).alias("pos", "tok"),
        )
        .filter(F.col("pos") < block_positions)
    )
    if max_block is not None:
        from pyspark.sql.window import Window

        w_blk = Window.partitionBy("pos", "tok")
        toks = (
            toks.withColumn("blk_n", F.count(F.lit(1)).over(w_blk))
            .filter(F.col("blk_n") <= max_block)
            .drop("blk_n")
        )
    a, b = toks.alias("a"), toks.alias("b")
    cand = (
        a.join(b, on=["pos", "tok"])
        .filter(F.col("a.name") < F.col("b.name"))
        .select(
            F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b")
        )
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("name_a", "name_b").cast("long"))
        .filter((F.col("dist") >= 1) & (F.col("dist") <= max_dist))
        .select("name_a", "name_b", "dist")
    )


def minhash_lsh_cross_pairs(
    new_docs: DataFrame,
    old_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Delta dedup: near-duplicate pairs BETWEEN a new batch and an
    already-ingested corpus — the incremental-ingest shape where
    re-pairing the old corpus against itself (``minhash_lsh_pairs`` on
    the union) would redo O(old²) work for an O(new·collisions) job.
    Each side bands independently (same coefficients — signatures are
    content-only, so the old side's bands are computable once at ingest
    and SERVED from a (band, band_sig)-partitioned store); candidates
    come from the cross equi-join on the band bucket only (no same-side
    pairing ever materializes) and verify by exact Jaccard on the
    staged shingle-hash arrays. Returns (id_new, id_old,
    jaccard_micros).

    100 TB shape: the old side is a static posting table; per batch the
    new side computes |new| signatures, shuffles |new|·bands rows into
    the band partitioning, and only bucket collisions join — the same
    admission semantics as the streaming LSH gate
    (streaming/dedup_gate.py), in batch form with exact verification.
    """
    h_new = shingle_hashes(new_docs, text_col, id_col, shingle_n, stage=True)
    h_old = shingle_hashes(old_docs, text_col, id_col, shingle_n, stage=True)
    sig_new = minhash_signatures(
        new_docs, text_col, id_col, num_hashes, shingle_n, seed, hashes=h_new
    )
    sig_old = minhash_signatures(
        old_docs, text_col, id_col, num_hashes, shingle_n, seed, hashes=h_old
    )
    b_new = band_signatures(sig_new, id_col, num_hashes, bands).select(
        F.col(id_col).alias("id_new"), "band", "band_sig"
    )
    b_old = band_signatures(sig_old, id_col, num_hashes, bands).select(
        F.col(id_col).alias("id_old"), "band", "band_sig"
    )
    cand = (
        b_new.join(b_old, ["band", "band_sig"])
        .select("id_new", "id_old")
        .dropDuplicates()
    )
    thr = int(round(jaccard_threshold * 1_000_000))
    return (
        cand.join(
            h_new.select(F.col(id_col).alias("id_new"), F.col("hashes").alias("h_a")),
            "id_new",
        )
        .join(
            h_old.select(F.col(id_col).alias("id_old"), F.col("hashes").alias("h_b")),
            "id_old",
        )
        .withColumn(
            "jaccard_micros",
            F.floor(
                (F.size(F.array_intersect("h_a", "h_b")).cast("long") * 1_000_000)
                .cast("double")
                / F.size(F.array_union("h_a", "h_b")).cast("double")
            ).cast("long"),
        )
        .filter(F.col("jaccard_micros") >= thr)
        .select("id_new", "id_old", "jaccard_micros")
    )
