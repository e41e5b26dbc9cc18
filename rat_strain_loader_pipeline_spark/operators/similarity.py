"""Similarity search over an embedding column (array<float>).

- cosine_sim_expr:  pure-expression cosine between two array columns
                    (F.aggregate/zip_with — JVM-side, no UDF)
- brute_force_topk: exact top-k for a single query vector: broadcast the
                    query as a literal, score every row, global top-k.
                    One pass, no shuffle until the final k-row sort.
- lsh_bucketed_topk: scale path — random-hyperplane LSH buckets the
                    corpus once; a query only scores its bucket (and
                    neighbors via multi-probe). Recall < 1, tunable.
- ivf_train_centroids / ivf_assign / ivf_topk: the IVF scale path —
                    spherical k-means coarse quantizer trained on a
                    driver-sized sample, corpus assigned to inverted
                    lists (write partitioned by list_id), queries probe
                    the nprobe nearest lists only. nprobe = n_lists
                    degenerates to exact (the partition-completeness
                    check); smaller nprobe trades recall for pruning.
- pairwise_topk_join: all-pairs top-k between two small/medium sets via
                    block nested join — candidate stage for kNN graphs.
- embedding_near_dup_pairs_blocked: exact all-pairs over-threshold via a
                    distributed block self-join (grouped GEMM per block
                    pair) — no driver collect, no broadcast; the checked
                    dedup path.
- knn_join_blocked: exact query×corpus top-k via the same block scheme +
                    per-query window reduce of the block-local partials.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: cosine scores are emitted as ``cosine_micros`` bigints: components are
#: quantized to floor(x * 1e6) int64 first, so dots/norms are EXACT
#: integer sums in every engine (and exact even through float64 BLAS —
#: all intermediates are integers < 2^53, so no rounding ever occurs),
#: and the final score is the single fixed IEEE tree
#: floor(dot / (sqrt(na2) * sqrt(nb2)) * 1e6). This replaces the old
#: round(cosine, 4) doubles, whose cross-engine equality was only
#: empirical (numpy GEMM vs sequential list_sum differ in last ulps).
MICROS = 1_000_000


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_sim_expr(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns; NULL-safe on zero
    norms. Sequential left-fold sum → deterministic float result."""
    denom = _norm(a) * _norm(b)
    return F.when(denom > 0, _dot(a, b) / denom).otherwise(F.lit(None))


def _quantize(vec: Column) -> Column:
    """array<bigint> of floor(x * 1e6) per component — the engine-exact
    representation every cosine emitter scores over."""
    return F.transform(vec, lambda x: F.floor(x.cast("double") * MICROS).cast("long"))


def _idot(a: Column, b: Column) -> Column:
    """Exact int64 dot of two array<bigint> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def cosine_micros_expr(a_q: Column, b_q: Column) -> Column:
    """floor(cosine * 1e6) bigint over two QUANTIZED (array<bigint>)
    vectors — dot and squared norms are exact integers, the score is one
    fixed IEEE-754 tree (sqrt/division/multiply all correctly rounded),
    so every engine computes the identical bigint. NULL on zero norm."""
    dot = _idot(a_q, b_q)
    na2 = _idot(a_q, a_q)
    nb2 = _idot(b_q, b_q)
    denom = F.sqrt(na2.cast("double")) * F.sqrt(nb2.cast("double"))
    return F.when(
        (na2 > 0) & (nb2 > 0),
        F.floor(dot.cast("double") / denom * MICROS).cast("long"),
    ).otherwise(F.lit(None).cast("long"))


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for one query vector, scored in integer micros
    (see ``MICROS``): returns (id, cosine_micros bigint), ordered by
    cosine_micros desc then id asc.

    The query is a literal array (broadcast by value into the plan); the
    scan scores rows map-side and only k survivors per partition reach
    the final ordering (Spark's TakeOrderedAndProject), so the shuffle is
    O(k * partitions) — the right shape at any corpus size.
    """
    qq = [int(math.floor(float(x) * MICROS)) for x in query_vec]
    q = F.array(*[F.lit(v).cast("long") for v in qq])
    scored = embeddings.select(
        F.col(id_col),
        cosine_micros_expr(_quantize(F.col(vec_col)), q).alias("cosine_micros"),
    )
    return (
        scored.orderBy(F.col("cosine_micros").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "cosine_micros")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rnd = random.Random(seed)
    return [[rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: one bit per plane (sign of dot)."""
    bits = [
        F.when(_dot(vec, F.array(*[F.lit(p) for p in plane])) >= 0, F.lit(1)).otherwise(F.lit(0))
        for plane in planes
    ]
    out = F.lit(0)
    for b in bits:
        out = out * 2 + b
    return out.alias("bucket")


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: score only rows whose LSH bucket matches the
    query's (plus ``multiprobe`` single-bit-flip neighbor buckets).

    At 100 TB the corpus is written bucket-partitioned once; a query then
    prunes to ~corpus/2^n_planes rows. Here the bucket filter runs inline
    to keep the operator self-contained.
    """
    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes, seed)

    def sig(v: list[float]) -> int:
        out = 0
        for plane in planes:
            d = sum(x * y for x, y in zip(v, plane))
            out = out * 2 + (1 if d >= 0 else 0)
        return out

    q_bucket = sig(query_vec)
    probes = {q_bucket} | {q_bucket ^ (1 << i) for i in range(min(multiprobe * n_planes, n_planes))} if multiprobe else {q_bucket}

    bucketed = embeddings.withColumn("bucket", lsh_bucket_expr(F.col(vec_col), planes))
    candidates = bucketed.filter(F.col("bucket").isin(*probes))
    return brute_force_topk(candidates, query_vec, k, id_col, vec_col)


def ivf_train_centroids(
    embeddings: DataFrame,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    sample_size: int = 4096,
    iters: int = 10,
):
    """Train an IVF coarse quantizer: spherical k-means on a
    deterministic sample (the standard IVF recipe — train on a sample,
    assign the full corpus; the sample fits the driver by construction).

    Returns a (n_lists, dim) numpy array of UNIT centroids. Empty
    clusters re-seed deterministically from the sample. Deterministic
    for a given (seed, corpus): the sample is the first ``sample_size``
    rows by ``id_col``.
    """
    import numpy as np

    rows = (
        embeddings.orderBy(id_col).limit(sample_size).select(vec_col).collect()
    )
    x = np.array([r[0] for r in rows], dtype=np.float64)
    n = np.sqrt((x * x).sum(axis=1))
    n[n == 0] = 1.0
    x = x / n[:, None]
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=min(n_lists, len(x)), replace=False)]
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)
        for j in range(len(cent)):
            members = x[assign == j]
            if len(members) == 0:  # re-seed empty list
                cent[j] = x[rng.randint(len(x))]
                continue
            m = members.mean(axis=0)
            nm = np.sqrt((m * m).sum())
            cent[j] = m / nm if nm > 0 else cent[j]
    return cent


def ivf_assign(
    embeddings: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest (max cosine) centroid list.

    Vectorized: the small centroid matrix rides into each task (numpy
    matmul per Arrow batch); at corpus scale the output is written
    partitioned by ``list_id`` ONCE so queries prune file-level.
    Adds ``list_id int``.
    """
    import numpy as np
    import pandas as pd

    cent = centroids
    out_schema = f"{id_col} long, {vec_col} array<double>, list_id int"

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a = np.array(list(pdf[vec_col]), dtype=np.float64)
            an = np.sqrt((a * a).sum(axis=1))
            an[an == 0] = 1.0
            lists = ((a / an[:, None]) @ cent.T).argmax(axis=1).astype(np.int32)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(dtype=np.int64),
                    vec_col: [list(map(float, v)) for v in pdf[vec_col]],
                    "list_id": lists,
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(run, schema=out_schema)


def ivf_topk(
    assigned: DataFrame,
    centroids,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF query: score only the members of the ``nprobe`` centroid
    lists nearest the query — the FAISS-style scale path (recall
    tunable via nprobe; nprobe = n_lists degenerates to exact).

    ``assigned``: output of ``ivf_assign`` (ideally read back from a
    list_id-partitioned store so the ``isin`` filter prunes files).
    """
    import numpy as np

    q = np.array(query_vec, dtype=np.float64)
    qn = np.sqrt((q * q).sum())
    if qn > 0:
        q = q / qn
    probes = [int(i) for i in (centroids @ q).argsort()[::-1][:nprobe]]
    candidates = assigned.filter(F.col("list_id").isin(*probes))
    return brute_force_topk(candidates, query_vec, k, id_col, vec_col)


def _quant_np(rows, np):
    """float64 matrix of floor(x * 1e6) per component — integer-valued,
    so BLAS GEMMs over it are exact (see ``MICROS``)."""
    m = np.array(list(rows), dtype=np.float64)
    return np.floor(m * MICROS)


SENTINEL_MICROS = -2_000_000_000
"""Zero-norm score inside the numpy GEMM paths: below any real cosine
(micros are in [-1e6, 1e6]) so it never crosses a threshold and always
sorts last in a top-k — the same relative order as the NULL the
expression path (``cosine_micros_expr``) emits under desc NULLS LAST.
Top-k emitters convert it back to NULL after selection
(``_null_sentinel``) so both paths return identical rows."""


def _null_sentinel(df: DataFrame) -> DataFrame:
    """Map the zero-norm sentinel back to NULL on the final output —
    keeps the numpy paths row-identical to the NULL-emitting expression
    path (brute_force_topk) when k exceeds the nonzero-norm count."""
    return df.withColumn(
        "cosine_micros",
        F.when(
            F.col("cosine_micros") == F.lit(SENTINEL_MICROS), F.lit(None)
        ).otherwise(F.col("cosine_micros")),
    )


def _cos_micros_np(dots, na2, nb2, np):
    """floor(dot / (sqrt(na2)*sqrt(nb2)) * 1e6) int64 for a |A| x |B|
    exact-integer dot matrix; zero-norm rows/cols score the
    ``SENTINEL_MICROS`` sentinel (below any real cosine, never above a
    threshold; top-k paths NULL it on output via ``_null_sentinel``)."""
    denom = np.sqrt(na2)[:, None] * np.sqrt(nb2)[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        cos = dots / denom * MICROS
    out = np.full(dots.shape, SENTINEL_MICROS, dtype=np.int64)
    ok = denom > 0
    out[ok] = np.floor(cos[ok]).astype(np.int64)
    return out


def pairwise_topk_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """For every query vector, its top-k cosine neighbors in ``corpus`` —
    the kNN-graph candidate stage. Scores are integer micros (see
    ``MICROS``) — bit-identical to ``brute_force_topk``'s.

    Same scale shape as ``embedding_near_dup_pairs``: the (quantized)
    corpus matrix broadcasts once, each query partition runs one numpy
    GEMM (exact — integer-valued float64) and keeps k survivors —
    O(|Q|·|C|·d) FLOPs spread over partitions, shuffle carries only
    |Q|·k result rows. Ties break by ascending corpus id
    (deterministic). Returns (q_id, c_id, rank, cosine_micros), rank
    1-based; self-pairs are kept (filter q_id != c_id for a strict
    graph).
    """
    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession
    rows = corpus.select(id_col, vec_col).collect()
    c_ids = np.array([r[0] for r in rows], dtype=np.int64)
    order = np.argsort(c_ids)
    c_ids = c_ids[order]
    mat = _quant_np([r[1] for r in rows], np)[order]
    b_ids = spark.sparkContext.broadcast(c_ids)
    b_mat = spark.sparkContext.broadcast(mat)

    def run(batches):
        all_ids, cq = b_ids.value, b_mat.value
        cn2 = (cq * cq).sum(axis=1)
        kk = min(k, len(all_ids))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q_ids = pdf[id_col].to_numpy(dtype=np.int64)
            qq = _quant_np(pdf[vec_col], np)
            micros = _cos_micros_np(qq @ cq.T, (qq * qq).sum(axis=1), cn2, np)
            out_q, out_c, out_r, out_s = [], [], [], []
            for row_i in range(len(q_ids)):
                # lexsort: ties at the k boundary break by ascending c_id
                idx = np.lexsort((all_ids, -micros[row_i]))[:kk]
                out_q.extend([q_ids[row_i]] * len(idx))
                out_c.extend(all_ids[idx])
                out_r.extend(range(1, len(idx) + 1))
                out_s.extend(micros[row_i, idx])
            yield pd.DataFrame(
                {"q_id": out_q, "c_id": out_c, "rank": out_r, "cosine_micros": out_s}
            )

    return _null_sentinel(
        queries.select(id_col, vec_col).mapInPandas(
            run, schema="q_id long, c_id long, rank int, cosine_micros long"
        )
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact): every (a, b) with
    ``a < b`` and cosine_micros >= floor(threshold * 1e6) — integer-
    micros scoring (see ``MICROS``), engine-exact.

    Plan shape: the (normalized) corpus matrix is broadcast once; each
    partition of row-vectors then computes a dense numpy block-matmul
    against it and keeps only pairs over threshold — O(n^2 d) FLOPs
    spread evenly over partitions with NO pairwise shuffle (a crossJoin
    formulation shuffles n^2 rows and evaluates interpreted per-pair
    lambdas; this one moves n·d floats once). Fits while n·d floats fit
    executor memory (~10^8 vectors at d=64); past that, switch to the
    LSH-bucketed variant (``lsh_bucket_expr`` + per-bucket self-join +
    exact verify) — same output modulo LSH recall, and this function is
    the exact baseline the approximate path is measured against.
    """
    import numpy as np
    import pandas as pd

    thr_micros = int(math.floor(threshold * MICROS))
    spark = embeddings.sparkSession
    mat_rows = embeddings.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in mat_rows], dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    mat = _quant_np([r[1] for r in mat_rows], np)[order]
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    def run(batches):
        all_ids, cq = b_ids.value, b_mat.value
        cn2 = (cq * cq).sum(axis=1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a_ids = pdf[id_col].to_numpy(dtype=np.int64)
            aq = _quant_np(pdf[vec_col], np)
            micros = _cos_micros_np(aq @ cq.T, (aq * aq).sum(axis=1), cn2, np)
            oi, oj = np.nonzero(micros >= thr_micros)
            if len(oi) == 0:
                continue
            pa, pb = a_ids[oi], all_ids[oj]
            keep = pa < pb
            yield pd.DataFrame(
                {
                    "a_id": pa[keep],
                    "b_id": pb[keep],
                    "cosine_micros": micros[oi, oj][keep],
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        run, schema="a_id long, b_id long, cosine_micros long"
    )


def _blocked_sides(
    embeddings: DataFrame,
    n_blocks: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Replicate each vector into every block-PAIR group it belongs to.

    Block id = pmod(xxhash64(id), n_blocks). A row in block p joins group
    (i=p, j) for every j >= p with side 'a' and group (i, j=p) for every
    i <= p with side 'b' — so the unordered block pair (i, j) sees block
    i as the 'a' side and block j as the 'b' side exactly once. The
    replication factor is n_blocks + 1 per row; shuffle volume is
    n * (n_blocks + 1) rows for an exact n² comparison with no driver
    materialization and no broadcast."""
    spark = embeddings.sparkSession
    pair_rows = [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)]
    pairs = spark.createDataFrame(pair_rows, "i int, j int")
    base = embeddings.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("__blk"),
    )
    side_a = base.join(pairs, base["__blk"] == pairs["i"]).select(
        "i", "j", "__id", "__vec", F.lit("a").alias("__side")
    )
    side_b = base.join(pairs, base["__blk"] == pairs["j"]).select(
        "i", "j", "__id", "__vec", F.lit("b").alias("__side")
    )
    return side_a.unionByName(side_b)


def embedding_near_dup_pairs_blocked(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_blocks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding near-duplicate pairs, fully distributed.

    Same output as ``embedding_near_dup_pairs`` (every a < b with
    cosine_micros >= floor(threshold * 1e6), integer-micros scoring —
    see ``MICROS``) but with NO driver collect and NO broadcast: vectors
    are hashed into ``n_blocks`` blocks, every unordered block pair
    (i <= j) becomes one ``applyInPandas`` group, and each group runs a
    dense numpy GEMM between its two blocks. Work is O(n²d) FLOPs — the
    inherent cost of exact all-pairs — split into (n_blocks²+n_blocks)/2
    independent tasks of (n/n_blocks)² each; shuffle carries
    n·(n_blocks+1) vector rows. Size n_blocks so a block pair
    (~2·(n/n_blocks)·d doubles) fits one task's memory: n_blocks ~
    n·d·16B / 256MB. For threshold >= ~0.8 prefer LSH bucketing (this
    operator is the exact baseline and the low-threshold path).
    """
    import numpy as np
    import pandas as pd

    thr_micros = int(math.floor(threshold * MICROS))

    def gemm(pdf: pd.DataFrame) -> pd.DataFrame:
        i = int(pdf["i"].iloc[0])
        j = int(pdf["j"].iloc[0])
        a_pdf = pdf[pdf["__side"] == "a"]
        b_pdf = pdf[pdf["__side"] == "b"]
        if len(a_pdf) == 0 or len(b_pdf) == 0:
            return pd.DataFrame({"a_id": [], "b_id": [], "cosine_micros": []}).astype(
                {"a_id": "int64", "b_id": "int64", "cosine_micros": "int64"}
            )

        a_ids = a_pdf["__id"].to_numpy(dtype=np.int64)
        b_ids = b_pdf["__id"].to_numpy(dtype=np.int64)
        aq = _quant_np(a_pdf["__vec"], np)
        bq = _quant_np(b_pdf["__vec"], np)
        micros = _cos_micros_np(
            aq @ bq.T, (aq * aq).sum(axis=1), (bq * bq).sum(axis=1), np
        )
        oi, oj = np.nonzero(micros >= thr_micros)
        pa, pb, s = a_ids[oi], b_ids[oj], micros[oi, oj]
        if i == j:  # diagonal group: both sides are the same block
            keep = pa < pb
            pa, pb, s = pa[keep], pb[keep], s[keep]
        else:  # cross pair: normalize order
            lo, hi = np.minimum(pa, pb), np.maximum(pa, pb)
            pa, pb = lo, hi
        return pd.DataFrame({"a_id": pa, "b_id": pb, "cosine_micros": s})

    return (
        _blocked_sides(embeddings, n_blocks, id_col, vec_col)
        .groupBy("i", "j")
        .applyInPandas(gemm, schema="a_id long, b_id long, cosine_micros long")
    )


def knn_join_blocked(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_blocks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact query×corpus cosine top-k, fully distributed (no driver
    collect / broadcast of the corpus, unlike ``pairwise_topk_join``).
    Scores are integer micros (see ``MICROS``) — engine-exact, identical
    to ``brute_force_topk``'s.

    Corpus is hashed into ``n_blocks`` blocks; every query row joins
    every block (replication factor n_blocks), each (block) group GEMMs
    its queries against its corpus slice and keeps k block-local
    partials, then one hash-partitioned window per q_id reduces the
    n_blocks·k partials to the global top-k. Ties break by ascending
    corpus id, matching ``brute_force_topk``. Returns
    (q_id, c_id, rank, cosine_micros), rank 1-based, self-pairs kept.
    """
    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession
    blocks = spark.createDataFrame([(b,) for b in range(n_blocks)], "blk int")
    q_rep = queries.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec")
    ).crossJoin(F.broadcast(blocks)).select(
        "blk", "__id", "__vec", F.lit("a").alias("__side")
    )
    c_rep = corpus.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("blk"),
    ).select("blk", "__id", "__vec", F.lit("b").alias("__side"))

    def gemm_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        q_pdf = pdf[pdf["__side"] == "a"]
        c_pdf = pdf[pdf["__side"] == "b"]
        if len(q_pdf) == 0 or len(c_pdf) == 0:
            return pd.DataFrame({"q_id": [], "c_id": [], "cosine_micros": []}).astype(
                {"q_id": "int64", "c_id": "int64", "cosine_micros": "int64"}
            )
        c_ids = c_pdf["__id"].to_numpy(dtype=np.int64)
        order = np.argsort(c_ids)
        c_ids = c_ids[order]

        q_ids = q_pdf["__id"].to_numpy(dtype=np.int64)
        qq = _quant_np(q_pdf["__vec"], np)
        cq = _quant_np(c_pdf["__vec"], np)[order]
        micros = _cos_micros_np(
            qq @ cq.T, (qq * qq).sum(axis=1), (cq * cq).sum(axis=1), np
        )
        kk = min(k, len(c_ids))
        out_q, out_c, out_s = [], [], []
        for r in range(len(q_ids)):
            # full lexsort, NOT argpartition: ties at the block-local
            # k-th position must break by ascending c_id or the global
            # reduce can never recover the candidate brute_force_topk's
            # tie-break would have kept
            idx = np.lexsort((c_ids, -micros[r]))[:kk]
            out_q.extend([q_ids[r]] * len(idx))
            out_c.extend(c_ids[idx])
            out_s.extend(micros[r, idx])
        return pd.DataFrame({"q_id": out_q, "c_id": out_c, "cosine_micros": out_s})

    partials = (
        q_rep.unionByName(c_rep)
        .groupBy("blk")
        .applyInPandas(gemm_topk, schema="q_id long, c_id long, cosine_micros long")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine_micros").desc(), F.col("c_id").asc()
    )
    return _null_sentinel(
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "rank", "cosine_micros")
    )


def semantic_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space benchmark decontamination — the semantic twin of
    the n-gram ``ngram_contamination`` gate (operators/text.py): a
    corpus document is contaminated when its embedding scores >=
    ``threshold`` cosine against ANY benchmark embedding. N-gram
    overlap misses paraphrased / translated benchmark leakage; this
    closes that standard eval-hygiene hole (the semantic membership
    test of Lee et al.'s dedup line and the GPT-3 appendix-C screen).

    Exact integer-micros scoring (see ``MICROS``), composed from the
    existing GEMM machinery: the benchmark table is BENCHMARK-sized
    (thousands of eval rows, dimension-bounded — the one side of this
    problem that is always small), so it rides ``pairwise_topk_join``'s
    broadcast-matrix path with k=1: each corpus partition runs one
    numpy GEMM against the broadcast benchmark matrix and keeps only
    its best benchmark hit; rows at or above floor(threshold·1e6) are
    flagged. Ties at the max break by ascending benchmark id —
    deterministic, SQL-replayable.

    100 TB shape: map-only over the corpus (the k=1 top-k never
    shuffles more than one row per corpus doc), benchmark matrix
    broadcast once; downstream, a left_anti on the flagged ids is the
    actual gate. Returns flagged rows only:
    (vec_id, bench_id, cosine_micros), cosine_micros >= threshold
    micros.
    """
    thr_micros = int(math.floor(threshold * MICROS))
    best = pairwise_topk_join(
        corpus, benchmark, k=1, id_col=id_col, vec_col=vec_col
    )
    return best.filter(F.col("cosine_micros") >= thr_micros).select(
        F.col("q_id").alias(id_col),
        F.col("c_id").alias("bench_id"),
        "cosine_micros",
    )


def label_centroid_sums(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-label centroid statistics — the supervision-side aggregate of
    an embedding corpus (class prototypes for nearest-centroid
    classification, drift monitoring, per-label norms).

    Cross-row float sums are aggregation-order-dependent, so components
    quantize to integer micro-units BEFORE summing (floor(x * 1e6) per
    dimension) — the sum is exact and engine-reproducible; the centroid
    is sum_micros / (n_vecs * 1e6) to the quantization precision. One
    shuffle on (label, dim) with map-side partial aggregation; output is
    O(labels x dims), independent of corpus size.

    Returns (label, dim_idx, sum_micros, n_vecs), dim_idx 0-based.
    """
    exploded = embeddings.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("dim_idx", "component"),
    )
    return exploded.groupBy("label", "dim_idx").agg(
        F.sum(F.floor(F.col("component").cast("double") * 1e6).cast("long")).alias(
            "sum_micros"
        ),
        F.count(F.lit(1)).alias("n_vecs"),
    )


def hard_negatives(
    anchors: DataFrame,
    corpus: DataFrame,
    neg_k: int = 3,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor,
    the ``neg_k`` most-cosine-similar corpus vectors carrying a
    DIFFERENT label — the negatives that actually move a contrastive
    loss, mined corpus-wide.

    Engine-exact (unlike the GEMM kNN path, which is empirical at
    round-4 precision): dots and norms are bigint sums over micro-unit
    quantized components, and the ranking score is
    ``floor(dot / (sqrt(na2) * sqrt(nb2)) * 1e6)`` — one fixed
    IEEE-754 double expression tree over integers (sqrt is correctly
    rounded per IEEE 754), so every engine computes the identical
    bigint score; ties break on ascending corpus id.

    100 TB shape: the anchor set is the bounded side (a training batch,
    not the corpus) — its exploded (id, dim, xq) table broadcasts into
    a dim-equi-join against the corpus explode, one (anchor, candidate)
    partial-agg dot reduction, and one window per anchor over
    corpus-candidate partials. Nothing corpus x corpus, nothing
    collected.
    """
    from pyspark.sql.window import Window

    MICROS = 1_000_000

    def ex(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(f"{side}_id"),
            F.col(label_col).alias(f"{side}_label"),
            F.posexplode(vec_col).alias("dim", "x"),
        ).select(
            f"{side}_id",
            f"{side}_label",
            "dim",
            F.floor(F.col("x").cast("double") * MICROS)
            .cast("long")
            .alias(f"{side}_xq"),
        )

    a_ex = ex(anchors, "a")
    c_ex = ex(corpus, "c")
    n2 = lambda e, side: e.groupBy(f"{side}_id").agg(
        F.sum(F.col(f"{side}_xq") * F.col(f"{side}_xq")).alias(f"{side}_n2")
    )
    dots = (
        c_ex.join(F.broadcast(a_ex), "dim")
        .filter(F.col("a_label") != F.col("c_label"))
        .groupBy("a_id", "c_id")
        .agg(F.sum(F.col("a_xq") * F.col("c_xq")).alias("dot"))
    )
    scored = (
        dots.join(F.broadcast(n2(a_ex, "a")), "a_id")
        .join(n2(c_ex, "c"), "c_id")
        .filter((F.col("a_n2") > 0) & (F.col("c_n2") > 0))
        .withColumn(
            "cos_micros",
            F.floor(
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("a_n2").cast("double"))
                    * F.sqrt(F.col("c_n2").cast("double"))
                )
                * MICROS
            ).cast("long"),
        )
    )
    w = Window.partitionBy("a_id").orderBy(F.desc("cos_micros"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= neg_k)
        .select("a_id", "c_id", F.col("rank").cast("long").alias("rank"), "cos_micros")
    )


def centroid_distance_matrix(
    centroids: DataFrame,
) -> DataFrame:
    """Pairwise cosine between label centroids — the class-confusion
    structure of an embedding space (which labels sit dangerously
    close, which drifted apart): consumes ``label_centroid_sums``
    output directly and exploits scale-invariance (cosine of the SUM
    vectors equals cosine of the means), so no division happens before
    the final score. Dots and norms accumulate the micro-quantized
    component products as DECIMAL(38,0) — exact at any magnitude,
    where bigint squares of 1e6-scaled sums would overflow — and the
    emitted ``cos_q`` is one fixed IEEE tree (dot / (sqrt(na)·sqrt(nb)))
    floored to micros, the integer-exact-cosine contract the
    dedup_embedding family uses.

    100 TB shape: input is already O(labels × dims); the dim-keyed
    pair join and both aggregates run on that grain — corpus size
    never appears. Returns (label_a, label_b, cos_q), label_a < label_b.
    """
    d38 = "decimal(38,0)"
    a = centroids.select(
        F.col("label").alias("la"),
        "dim_idx",
        F.col("sum_micros").alias("sa"),
    )
    b = centroids.select(
        F.col("label").alias("lb"),
        "dim_idx",
        F.col("sum_micros").alias("sb"),
    )
    dots = (
        a.join(b, "dim_idx")
        .filter(F.col("la") < F.col("lb"))
        .groupBy("la", "lb")
        .agg(
            F.sum(F.col("sa").cast(d38) * F.col("sb").cast(d38)).alias("dot")
        )
    )
    norms = centroids.groupBy(F.col("label")).agg(
        F.sum(
            F.col("sum_micros").cast(d38) * F.col("sum_micros").cast(d38)
        ).alias("nrm")
    )
    na = norms.select(F.col("label").alias("la"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("label").alias("lb"), F.col("nrm").alias("nb"))
    return (
        dots.join(F.broadcast(na), "la")
        .join(F.broadcast(nb), "lb")
        .select(
            F.col("la").alias("label_a"),
            F.col("lb").alias("label_b"),
            F.floor(
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("na").cast("double"))
                    * F.sqrt(F.col("nb").cast("double"))
                )
                * F.lit(1_000_000.0)
            )
            .cast("long")
            .alias("cos_q"),
        )
    )


def cluster_margin(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-label separation margin — silhouette-lite over label
    centroids: every vector's cosine to its OWN centroid vs its best
    OTHER centroid; a label whose members sit closer to a foreign
    prototype than their own is mislabeled, collapsed, or drifting
    (the cheap per-round proxy for a full silhouette, which is
    all-pairs and unshippable).

    Exactness: components quantize to integer micros; centroid SUMS
    come from label_centroid_sums (exact ints, scale-invariant under
    cosine); every dot accumulates DECIMAL(38,0) products inside
    ``zip_with``/``aggregate`` (JVM, whole-stage codegen — no Python
    in the hot loop); the only doubles are the final fixed IEEE tree
    per (vector, candidate) score, floored to micros. Margins are
    emitted as signed SUMS (no signed floor-division).

    100 TB shape: the centroid table collapses to K rows of
    (dim-array, norm) and BROADCASTS; the corpus is touched in ONE
    map pass that fans each vector to K scored rows (K is class
    count, not corpus-sized), then a label-grain aggregate. Returns
    (label, n_vecs, n_misassigned, sum_margin_q).
    """
    d38 = "decimal(38,0)"
    cent = label_centroid_sums(embeddings, label_col, vec_col, id_col)
    nrm = cent.groupBy("label").agg(
        F.sum(
            F.col("sum_micros").cast(d38) * F.col("sum_micros").cast(d38)
        ).alias("ns")
    )
    arrs = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("dim_idx", "sum_micros"))
            ),
            lambda st: st["sum_micros"],
        ).alias("s_arr")
    )
    cand = (
        arrs.join(nrm, "label")
        .select(F.col("label").alias("cand"), "s_arr", "ns")
    )
    vq = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(1_000_000.0)).cast(
            "long"
        ),
    )
    v = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(label_col).alias("own"),
        vq.alias("vq"),
    ).withColumn(
        "nv",
        F.aggregate(
            F.col("vq"),
            F.lit(0).cast(d38),
            lambda acc, x: acc + x.cast(d38) * x.cast(d38),
        ),
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("vq"), F.col("s_arr"), lambda a, b: a.cast(d38) * b.cast(d38)
        ),
        F.lit(0).cast(d38),
        lambda acc, x: acc + x,
    )
    cos_q = F.floor(
        dot.cast("double")
        / (
            F.sqrt(F.col("nv").cast("double"))
            * F.sqrt(F.col("ns").cast("double"))
        )
        * F.lit(1_000_000.0)
    ).cast("long")
    scored = v.crossJoin(F.broadcast(cand)).select(
        "vid", "own", "cand", cos_q.alias("cos_q")
    )
    per_vec = scored.groupBy("vid", "own").agg(
        F.max(F.when(F.col("cand") == F.col("own"), F.col("cos_q"))).alias(
            "own_q"
        ),
        F.max(F.when(F.col("cand") != F.col("own"), F.col("cos_q"))).alias(
            "other_q"
        ),
    )
    return per_vec.groupBy(F.col("own").alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum(
            F.when(F.col("other_q") >= F.col("own_q"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_misassigned"),
        F.sum(F.col("own_q") - F.col("other_q"))
        .cast("long")
        .alias("sum_margin_q"),
    )


def embedding_gram(
    embeddings: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact integer Gram matrix XᵀX of the (quantized) embedding
    corpus — the sufficient statistic for PCA / whitening / covariance
    drift (cov = Gram/n − mean·meanᵀ, both derivable from this plus the
    label_centroid_sums means): components quantize to floor(x·1e6)
    int64 first (see ``MICROS``), so every partial is an exact integer
    and the cross-partition sum is order-free — the same
    exact-mergeability argument as the engine's other GEMM emitters.

    Plan: one Arrow pass; each partition GEMMs its slice (m.T @ m in
    integer-valued float64 — exact while per-partition sums stay under
    2^53, i.e. ≲9e15/1e12 ≈ 9000 rows per partition at unit-norm-ish
    micros components; repartition the input finer for heavier blocks)
    and emits ONE dims²/2-row partial; the only shuffle carries
    (dims², n_partitions) rows into a DECIMAL(38,0) sum that cannot
    overflow at any corpus size. Returns upper-triangle
    (dim_i, dim_j, gram, n_vecs), dim 0-based, gram DECIMAL(38,0).
    """
    import numpy as np
    import pandas as pd

    def partial(batches):
        acc = None
        n = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = _quant_np(pdf[vec_col], np)
            acc = m.T @ m if acc is None else acc + m.T @ m
            n += len(pdf)
        if acc is None:
            return
        d = acc.shape[0]
        iu, ju = np.triu_indices(d)
        yield pd.DataFrame(
            {
                "dim_i": iu.astype("int32"),
                "dim_j": ju.astype("int32"),
                "partial": acc[iu, ju].astype("int64"),
                "n_part": np.full(len(iu), n, dtype="int64"),
            }
        )

    partials = embeddings.select(vec_col).mapInPandas(
        partial, schema="dim_i int, dim_j int, partial long, n_part long"
    )
    # every partition emits its row count on each (i, j) row, so the
    # per-cell sum of n_part IS the corpus size — no second pass
    return partials.groupBy("dim_i", "dim_j").agg(
        F.sum(F.col("partial").cast("decimal(38,0)")).alias("gram"),
        F.sum("n_part").cast("long").alias("n_vecs"),
    )


def maxsim_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    n_sub: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ColBERT-style late-interaction MaxSim retrieval: both query and
    corpus vectors split into ``n_sub`` contiguous sub-vectors, and the
    relevance score is Σ_q max_d cos(q_i, d_j) — the multi-vector
    scorer that preserves token-level matching a single pooled cosine
    flattens away (Khattab & Zaharia 2020). Scores are integer micros
    per sub-cosine (see ``MICROS``), so the max/sum algebra is exact;
    zero-norm sub-vectors score the ``SENTINEL_MICROS`` floor via
    COALESCE on BOTH engines (NULL-skipping greatest() semantics
    differ across engines — never rely on them).

    Plan shape: the query sub-vectors are literals broadcast by value;
    every corpus row evaluates n_sub² sub-cosines inside ONE
    whole-stage-codegen projection (no explode, no shuffle), and the
    top-k is a TakeOrdered — identical scan shape to
    ``brute_force_topk`` with a wider expression. Returns
    (id, maxsim_micros), ordered desc, ties by ascending id.
    """
    dim = len(query_vec)
    if n_sub <= 0 or dim % n_sub != 0:
        raise ValueError(
            f"maxsim_topk: query dim {dim} not divisible into {n_sub} "
            "sub-vectors — trailing components would be silently "
            "excluded from scoring"
        )
    sub = dim // n_sub
    qsubs = [
        [
            int(math.floor(float(x) * MICROS))
            for x in query_vec[s * sub : (s + 1) * sub]
        ]
        for s in range(n_sub)
    ]
    # query-side sub-norms are CONSTANTS — compute sqrt in Python
    # (IEEE sqrt of the exact integer, bit-identical to the oracle's
    # sqrt(CAST(Σq² AS DOUBLE))) instead of folding a literal array per
    # row: this removes 2·n_sub² of the 3·n_sub² per-row folds, keeping
    # the projection inside whole-stage codegen limits
    qn = [math.sqrt(sum(v * v for v in qs)) for qs in qsubs]
    dq = _quantize(F.col(vec_col))
    dsubs = [F.slice(dq, d * sub + 1, sub) for d in range(n_sub)]
    dn2 = [_idot(ds, ds) for ds in dsubs]
    score = None
    for qs, qnorm in zip(qsubs, qn):
        if qnorm == 0:
            score = (score if score is not None else F.lit(0).cast("long")) + F.lit(
                SENTINEL_MICROS
            )
            continue
        qlit = F.array(*[F.lit(v).cast("long") for v in qs])
        best = None
        for d in range(n_sub):
            dot = _idot(dsubs[d], qlit)
            c = F.when(
                dn2[d] > 0,
                F.floor(
                    dot.cast("double")
                    / (F.sqrt(dn2[d].cast("double")) * F.lit(qnorm))
                    * MICROS
                ).cast("long"),
            ).otherwise(F.lit(SENTINEL_MICROS).cast("long"))
            best = c if best is None else F.greatest(best, c)
        score = best if score is None else score + best
    scored = embeddings.select(F.col(id_col), score.alias("maxsim_micros"))
    return (
        scored.orderBy(F.col("maxsim_micros").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "maxsim_micros")
    )


def label_centroid_drift(
    embeddings: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pairwise cosine between per-group embedding centroids — the
    corpus-drift monitor (did source/shard/label A move away from B in
    embedding space?). Cosine is scale-invariant, so the centroid
    cosine equals the cosine of the raw per-group SUM vectors — no
    division by n ever happens and every dot/norm stays an exact
    integer: s[g][d] = Σ floor(x·1e6) per (group, dim), dot and
    norms² accumulate in DECIMAL(38,0) (s ≤ n·1e6 makes bigint
    overflow at ~3e9 rows/group), and the final score is the repo's
    one fixed IEEE cosine tree in micros (NULL on a zero-norm side).

    Shape: one explode to (group, dim) sums (groups×dims rows — the
    ONLY corpus-sized pass), then all pairwise work is on the
    groups×dims table: a dim-equi self-join bounded by groups²·dims.
    Returns (group_a, group_b, n_a, n_b, cos_q) for group_a < group_b.
    """
    sums = (
        embeddings.select(
            F.col(group_col).alias("g"), F.posexplode(F.col(vec_col))
        )
        .select(
            "g",
            F.col("pos").alias("i"),
            F.floor(F.col("col").cast("double") * MICROS)
            .cast("long")
            .alias("x"),
        )
        .groupBy("g", "i")
        .agg(F.sum("x").cast("long").alias("s"))
    )
    counts = embeddings.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    norms = sums.groupBy("g").agg(
        F.sum(F.col("s").cast("decimal(38,0)") * F.col("s")).alias("n2")
    )
    a = sums.select(
        F.col("g").alias("group_a"), "i", F.col("s").alias("s_a")
    )
    b = sums.select(
        F.col("g").alias("group_b"), "i", F.col("s").alias("s_b")
    )
    dots = (
        a.join(b, "i")
        .filter(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(
            F.sum(F.col("s_a").cast("decimal(38,0)") * F.col("s_b")).alias(
                "dot"
            )
        )
    )
    na = norms.select(F.col("g").alias("group_a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("g").alias("group_b"), F.col("n2").alias("nb2"))
    ca = counts.select(F.col("g").alias("group_a"), F.col("n").alias("n_a"))
    cb = counts.select(F.col("g").alias("group_b"), F.col("n").alias("n_b"))
    denom = F.sqrt(F.col("na2").cast("double")) * F.sqrt(
        F.col("nb2").cast("double")
    )
    return (
        dots.join(F.broadcast(na), "group_a")
        .join(F.broadcast(nb), "group_b")
        .join(F.broadcast(ca), "group_a")
        .join(F.broadcast(cb), "group_b")
        .select(
            "group_a",
            "group_b",
            "n_a",
            "n_b",
            F.when(
                (F.col("na2") > 0) & (F.col("nb2") > 0),
                F.floor(
                    F.col("dot").cast("double") / denom * MICROS
                ).cast("long"),
            ).alias("cos_q"),
        )
    )
