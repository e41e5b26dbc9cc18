"""Corpus selection operators for training-data pipelines.

- deterministic_split: stable train/val/test assignment by salted md5
  bucket — map-side, no shuffle, reproducible in ANY engine that has
  md5 (bucket == md5_number_lower(key) % resolution, the same identity
  the dedup shingle hashes use). Changing the salt reshuffles the
  split; changing fractions only moves boundary buckets, so a doc
  never migrates between train and test when val grows.
- topk_per_group: keep the k best rows per group (per-domain corpus
  caps, best-N-by-quality selection). One hash-partitioned window —
  scales as long as no single group is pathological; cap such groups
  upstream or pre-aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_FRACTIONS = (("train", 0.9), ("val", 0.05), ("test", 0.05))


def _md5_fold(key: Column, modulus: int) -> Column:
    """``md5_number_lower(key) % modulus`` in pure Spark expressions.

    The low 8 md5 digest bytes little-endian exceed int64 as a full
    value, so reduce mod ``modulus`` term-by-term:
    sum_j byte_j * (256^j mod m) ≡ value mod m — every term stays far
    under int64 for any m <= 2^52 (at m = 2^52, 256^7 ≡ 0). Bit-
    identical to DuckDB's ``md5_number_lower(key) % m``
    (oracle-checked); the single source of that identity for both
    ``md5_bucket`` and ``md5_uniform``.
    """
    h = F.md5(key)
    acc = F.lit(0).cast("long")
    for j in range(8):
        byte_j = F.conv(F.substring(h, 17 + 2 * j, 2), 16, 10).cast("long")
        acc = acc + byte_j * ((256**j) % modulus)
    return acc % modulus


def md5_mod(key: Column, modulus: int) -> Column:
    """``md5_number_lower(key) % modulus`` as a bigint — for moduli
    past int range (versioning fingerprints use 10^15)."""
    return _md5_fold(key, modulus)


def md5_bucket(key: Column, resolution: int = 10_000) -> Column:
    """``md5_number_lower(key) % resolution`` as an int bucket."""
    return _md5_fold(key, resolution).cast("int")


def deterministic_split(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "v1",
    fractions: tuple[tuple[str, float], ...] = DEFAULT_FRACTIONS,
    resolution: int = 10_000,
) -> DataFrame:
    """Adds ``bucket`` (int) and ``split`` (string) columns."""
    total = sum(f for _, f in fractions)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bucket = md5_bucket(
        F.concat(F.lit(f"split:{salt}:"), F.col(id_col).cast("string")), resolution
    )
    out = df.withColumn("bucket", bucket)
    expr = None
    cum = 0.0
    for name, frac in fractions[:-1]:
        cum += frac
        cond = F.col("bucket") < int(round(cum * resolution))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = fractions[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return out.withColumn("split", expr)


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """The k best rows per group, 1-based ``rank_col`` added. Pass fully
    deterministic ``order_cols`` (break ties on a unique key) or the
    selection is not reproducible."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    id_col: str = "doc_id",
    salt: str = "v1",
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Exact-count deterministic stratified sample: the ``n_per_stratum``
    rows per stratum whose salted md5 ranks lowest.

    Unlike ``df.sampleBy`` (fraction-based, count varies run to run and
    with partitioning), ranking by a content hash gives (a) exact
    per-stratum counts, (b) bit-reproducible selection in any engine
    with md5, and (c) nested samples: a size-m sample (m < n) is a
    strict subset of the size-n sample under the same salt, so growing
    a validation set never churns the rows already selected. One
    hash-partitioned window — same scale envelope as ``topk_per_group``.
    """
    w = Window.partitionBy(*strata_cols).orderBy(
        F.md5(F.concat(F.lit(f"sample:{salt}:"), F.col(id_col).cast("string"))),
        F.col(id_col),
    )
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n_per_stratum)
    )


def md5_uniform(key: Column, salt: str = "v1") -> Column:
    """Deterministic uniform in (0, 1] from a salted md5 — the seed for
    weighted sampling. Same byte-sum reduction as ``md5_bucket`` at
    resolution 2^52 (256^7 ≡ 0 mod 2^52, so terms stay far under int64);
    +1 keeps ln() away from 0. Engine-portable: DuckDB mirrors it as
    ``(md5_number_lower(key) % 2^52 + 1) / 2^52``.
    """
    res = 1 << 52
    folded = _md5_fold(F.concat(F.lit(f"wsample:{salt}:"), key), res)
    return (folded.cast("double") + 1.0) / float(res)


def aes_candidates(
    df: DataFrame,
    weight_col: str,
    n: int,
    id_col: str = "doc_id",
    salt: str = "v1",
) -> DataFrame:
    """A-ES candidate state: the n smallest Efraimidis-Spirakis
    priorities ``-ln(u) / w`` of ``df`` (u deterministic from salted
    md5, w = weight), with the EXACT double priority kept in the
    ``__priority`` column. This is the mergeable kernel shared by the
    batch sample and its streaming twin: priorities are content-only
    (no batch-dependent state), so top-n(union) == top-n(union of
    per-batch top-n) — the max-merge identity that makes a weighted
    reservoir maintainable per micro-batch. Rows with weight <= 0 are
    excluded (zero mass)."""
    u = md5_uniform(F.col(id_col).cast("string"), salt)
    w = F.col(weight_col).cast("double")
    priority = (-F.log(u)) / w
    return (
        df.filter(w > 0)
        .select(
            F.col(id_col),
            F.col(weight_col),
            priority.alias("__priority"),
        )
        .orderBy(F.col("__priority").asc(), F.col(id_col).asc())
        .limit(n)
    )


def aes_select(candidates: DataFrame, n: int, id_col: str = "doc_id") -> DataFrame:
    """Final selection over A-ES candidate rows (one or many batches'
    worth): n smallest exact priorities, output in integer micro-units
    for engine-exact value checks."""
    cols = [c for c in candidates.columns if c != "__priority"]
    return (
        candidates.orderBy(F.col("__priority").asc(), F.col(id_col).asc())
        .limit(n)
        .select(
            *cols,
            F.floor(F.col("__priority") * 1e6).cast("long").alias("priority_micros"),
        )
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    id_col: str = "doc_id",
    salt: str = "v1",
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis A-ES):
    each row draws priority ``-ln(u) / w`` (u deterministic from salted
    md5, w = weight) — an Exp(w) variate, so the n smallest priorities
    are a weight-proportional sample. Deterministic, engine-portable,
    and distributed: the selection is ``orderBy(priority).limit(n)`` →
    TakeOrderedAndProject (per-partition heaps, n rows to the driver),
    never a global sort — the standard one-pass distributed weighted
    sample. Rows with weight <= 0 are excluded (zero mass).

    Returns (id_col, weight_col, priority_micros) for the n selected
    rows, priority in integer micro-units for engine-exact value checks.
    """
    return aes_select(aes_candidates(df, weight_col, n, id_col, salt), n, id_col)


def mixture_weights(
    df: DataFrame,
    group_col: str = "source",
    alpha: float = 0.5,
    budget: int = 1_000_000,
) -> DataFrame:
    """Temperature-scaled source mixing weights — the data-mixing
    primitive for multi-source training corpora: ``p_s = n_s^alpha /
    sum_t n_t^alpha``. ``alpha = 1`` is proportional sampling,
    ``alpha = 0`` uniform, and the usual ``0 < alpha < 1`` upweights
    small sources (the multilingual/low-resource rebalancing move).

    Returns (group_col, n_docs, weight_micros, expected_docs) where
    ``weight_micros = floor(p * 1e6)`` and ``expected_docs =
    floor(budget * p)`` — the per-source epoch allocation.

    Exactness: each ``n^alpha`` floors to bigint micro-units, the
    denominator is an order-free bigint sum, and the final ratio /
    budget math is one identical IEEE sequence from exact operands.
    ``alpha = 0.5`` evaluates via ``sqrt`` (IEEE-mandated correct
    rounding in every engine); other alphas use ``pow``, whose last-bit
    behavior is libm-specific — fine for weights, but pin oracles to
    0.5.

    100 TB shape: one map-side-partial count per source, then
    everything is dimension-sized (a broadcast 1-row total against the
    per-source table)."""
    from rat_strain_loader_pipeline_spark.staging import stage_to_parquet

    # stage the per-source counts (dimension-sized): the total and the
    # final select both consume them — unstaged, each consumer is a
    # full fact scan
    counts = stage_to_parquet(
        df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs")),
        "mixture-counts",
    )
    n_d = F.col("n_docs").cast("double")
    scaled = F.sqrt(n_d) if alpha == 0.5 else F.pow(n_d, F.lit(alpha))
    wtab = counts.withColumn(
        "a_micros", F.floor(scaled * F.lit(1e6)).cast("long")
    )
    tot = wtab.agg(F.sum("a_micros").alias("tot_micros"))
    p = F.col("a_micros").cast("double") / F.col("tot_micros").cast("double")
    return wtab.crossJoin(F.broadcast(tot)).select(
        group_col,
        "n_docs",
        F.floor(p * F.lit(1e6)).cast("bigint").alias("weight_micros"),
        F.floor(p * F.lit(float(budget))).cast("bigint").alias("expected_docs"),
    )


def token_kl_drift(
    docs: DataFrame,
    split_a: str = "train",
    split_b: str = "test",
    salt: str = "v1",
    fractions: tuple[tuple[str, float], ...] = (("train", 0.8), ("val", 0.1), ("test", 0.1)),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """KL(P_b || P_a) between the token distributions of two splits —
    the drift diagnostic run before trusting a held-out split: a high
    value means the test split's language differs from train (leakage
    fixes, topical skew, a broken split function all show up here).

    Distributions use add-one smoothing over the UNION vocabulary, so
    every vocab word contributes (including words absent from one
    split). Each word's term ``P_b * ln(P_b / P_a)`` floors to PICO
    units (1e-12 — per-word probabilities are ~1/V, micro units would
    floor them all to zero); the sum is order-free bigint. Returns one
    row (n_tokens_a, n_tokens_b, vocab_size, kl_picos), or ZERO rows
    when neither split has a token (empty/whitespace-only corpus).

    100 TB shape: one (token) shuffle with map-side partial conditional
    sums (tokens tagged by split in the same pass — the split column is
    a map-side md5 bucket, no join); the per-word table is
    vocabulary-bounded; totals are a broadcast 1-row aggregate.
    """
    tagged = deterministic_split(docs, id_col=id_col, salt=salt, fractions=fractions)
    from rat_strain_loader_pipeline_spark.operators.text import tokens
    from rat_strain_loader_pipeline_spark.staging import stage_to_parquet

    tok = tagged.filter(F.col("split").isin([split_a, split_b])).select(
        "split", F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
    )
    # staged: the vocabulary-bounded word table feeds the totals
    # aggregate AND the KL sum — unstaged, each consumer re-runs the
    # corpus tokenize/shuffle (same rule as mixture_weights' counts)
    per_word = stage_to_parquet(
        tok.groupBy("token").agg(
            F.sum(F.when(F.col("split") == split_a, 1).otherwise(0))
            .cast("long")
            .alias("ca"),
            F.sum(F.when(F.col("split") == split_b, 1).otherwise(0))
            .cast("long")
            .alias("cb"),
        ),
        "kl-per-word",
    )
    totals = per_word.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    pa = (F.col("ca") + 1).cast("double") / (F.col("na") + F.col("v")).cast("double")
    pb = (F.col("cb") + 1).cast("double") / (F.col("nb") + F.col("v")).cast("double")
    term = F.floor(pb * F.log(pb / pa) * F.lit(1e12)).cast("long")
    # group on the (constant) totals rather than a global agg: an empty
    # word table then yields ZERO rows — matching the oracle's
    # GROUP BY — instead of one all-null row
    return (
        per_word.crossJoin(F.broadcast(totals))
        .groupBy(
            F.col("na").alias("n_tokens_a"),
            F.col("nb").alias("n_tokens_b"),
            F.col("v").alias("vocab_size"),
        )
        .agg(F.sum(term).cast("long").alias("kl_picos"))
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "v1",
    n_buckets: int = 256,
    hash_res: int = 1_000_000_007,
    rank_col: str = "shuffle_rank",
) -> DataFrame:
    """Deterministic global training order — the corpus shuffle every
    training run performs before sharding, reproducible across runs and
    engines (salted md5, no RNG state).

    The order is ROW_NUMBER() OVER (ORDER BY bucket, order_hash, id)
    with bucket = md5(shuffle:salt:id) % n_buckets and order_hash =
    md5(order:salt:id) % hash_res — but computed WITHOUT a global sort
    or a single-task window (the classic scale trap of a bare
    row_number over everything). Two-level construction, the
    upsert_variants distributed-ranking pattern: a per-bucket
    row_number (parallel across n_buckets window partitions), plus
    bucket starting offsets from a cumulative sum over the tiny
    n_buckets-row count table (the only single-partition window, over
    256 rows), broadcast back. Identical ranks to the naive global
    window by construction: global order groups by bucket first, so
    rank = rows in earlier buckets + rank within own bucket.

    Changing the salt is a fresh epoch shuffle. Returns ``df`` plus
    ``rank_col`` (1-based, dense, unique).
    """
    sid = F.col(id_col).cast("string")
    bucket = _md5_fold(F.concat(F.lit(f"shuffle:{salt}:"), sid), n_buckets).cast("int")
    order_hash = _md5_fold(F.concat(F.lit(f"order:{salt}:"), sid), hash_res)
    tagged = df.withColumn("__b", bucket).withColumn("__h", order_hash)
    w_in = Window.partitionBy("__b").orderBy("__h", id_col)
    ranked = tagged.withColumn("__r", F.row_number().over(w_in))
    sizes = ranked.groupBy("__b").agg(F.count(F.lit(1)).alias("__n"))
    w_off = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offs = sizes.select(
        "__b", F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off")
    )
    return (
        ranked.join(F.broadcast(offs), "__b")
        .withColumn(rank_col, (F.col("__off") + F.col("__r")).cast("long"))
        .drop("__b", "__h", "__r", "__off")
    )


def shard_by_bytes(
    df: DataFrame,
    bytes_col: str,
    shard_bytes: int,
    rank_col: str = "shuffle_rank",
    block: int = 4096,
) -> DataFrame:
    """Greedy contiguous byte-budget sharding in training order — the
    step after ``deterministic_shuffle`` that materializes the corpus
    as ~shard_bytes-sized shard files. A doc lands in shard
    ``cum_bytes_before // shard_bytes`` over the rank order, so shards
    are contiguous rank ranges that fill to the budget (the last doc
    of a shard may overflow it by one doc — standard greedy packing).

    The global prefix sum is computed WITHOUT a global sort or a
    corpus-sized single-task window — the deterministic_shuffle
    two-level pattern again, but over rank blocks: a per-block running
    sum (parallel window partitions of ``block`` rows), plus block
    starting offsets from a cumsum over the tiny blocks-count table,
    broadcast back. Integer ``div`` keeps the shard id exact in every
    engine (operands are non-negative, so truncation == floor).

    Returns ``df`` plus ``cum_before`` and ``shard_id`` (bigint).
    """
    tagged = df.withColumn(
        "__blk", F.expr(f"(({rank_col}) - 1) div {int(block)}")
    )
    w_in = (
        Window.partitionBy("__blk")
        .orderBy(rank_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    blks = tagged.groupBy("__blk").agg(F.sum(bytes_col).alias("__bs"))
    w_off = Window.orderBy("__blk").rowsBetween(Window.unboundedPreceding, -1)
    offs = blks.select(
        "__blk", F.coalesce(F.sum("__bs").over(w_off), F.lit(0)).alias("__boff")
    )
    return (
        tagged.withColumn("__cin", F.sum(bytes_col).over(w_in))
        .join(F.broadcast(offs), "__blk")
        .withColumn(
            "cum_before",
            (F.col("__boff") + F.col("__cin") - F.col(bytes_col)).cast("long"),
        )
        .withColumn("shard_id", F.expr(f"cum_before div {int(shard_bytes)}"))
        .drop("__blk", "__cin", "__boff")
    )


def curriculum_order(
    df: DataFrame,
    band: Column,
    id_col: str = "doc_id",
    salt: str = "v1",
    n_buckets: int = 64,
    hash_res: int = 1_000_000_007,
    rank_col: str = "curriculum_rank",
) -> DataFrame:
    """Curriculum training order: highest ``band`` first (clean data
    early), deterministically shuffled WITHIN each band — the standard
    quality-curriculum layout, as one reproducible global rank.

    Same two-level construction as ``deterministic_shuffle`` with the
    band prepended to the order: global order = (band DESC, bucket,
    order_hash, id); per-(band, bucket) parallel row_numbers plus
    offsets from a cumsum over the tiny (bands x n_buckets)-row count
    table. Identical to the naive global ROW_NUMBER by construction —
    no global sort, no corpus-sized single-task window.

    Returns ``df`` plus ``band`` and ``rank_col`` (1-based, unique).
    """
    sid = F.col(id_col).cast("string")
    bucket = _md5_fold(F.concat(F.lit(f"shuffle:{salt}:"), sid), n_buckets).cast(
        "int"
    )
    order_hash = _md5_fold(F.concat(F.lit(f"order:{salt}:"), sid), hash_res)
    tagged = (
        df.withColumn("band", band)
        .withColumn("__b", bucket)
        .withColumn("__h", order_hash)
    )
    w_in = Window.partitionBy("band", "__b").orderBy("__h", id_col)
    ranked = tagged.withColumn("__r", F.row_number().over(w_in))
    sizes = ranked.groupBy("band", "__b").agg(F.count(F.lit(1)).alias("__n"))
    w_off = Window.orderBy(F.col("band").desc(), F.col("__b")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = sizes.select(
        "band",
        "__b",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
    )
    return (
        ranked.join(F.broadcast(offs), ["band", "__b"])
        .withColumn(rank_col, (F.col("__off") + F.col("__r")).cast("long"))
        .drop("__b", "__h", "__r", "__off")
    )


# Cumulative Poisson(1) pmf thresholds in micros (P<=0, <=1, <=2, <=3);
# the residual ~0.4% mass maps to weight 4. Shared verbatim with the
# bootstrap oracle SQL — the two sides must draw identical weights.
POISSON1_CUM_MICROS = (367879, 735759, 919699, 980996)


def poisson_bootstrap_mean(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    id_col: str = "doc_id",
    n_resamples: int = 32,
    salt: str = "v1",
) -> DataFrame:
    """Per-group bootstrap confidence interval for the mean via the
    POISSON bootstrap — the resampling scheme that actually scales:
    instead of materializing B resamples, every row draws an
    independent Poisson(1) replication weight per resample, so the
    whole procedure is one explode(B) + one map-side-combinable
    aggregate (Chamandy et al., "Estimating Uncertainty for Massive
    Data Streams", the production formulation at Google scale).

    Determinism: the weight for (row, b) comes from the md5 uniform of
    ``boot:<salt>:<id>:<b>`` thresholded through POISSON1_CUM_MICROS —
    reproducible run-to-run, partition-invariant, and replayable by a
    SQL oracle. All arithmetic is bigint (``value_col`` must be
    integer; weighted sums stay < 2^63/1e6 at test scales — widen to
    DECIMAL(38,0) for corpus-scale absolute sums); the resample and
    point means use FLOOR division (pmod idiom), which is well-defined
    for signed measures — note an oracle replaying a SIGNED-measure run
    must spell the mod-floor explicitly (DuckDB's integer ``//``
    truncates toward zero on signed operands; see the
    kappa_agreement / theil_sen_trend oracles for the idiom). The
    interval is
    rank-based: 2nd-smallest / 2nd-largest resample mean (~94% CI at
    B=32; min/max when fewer than 4 usable resamples); resamples whose
    total weight is 0 are excluded on both sides (probability ~0.37^n).

    100 TB shape: the explode multiplies the SCAN, not the shuffle —
    partial aggregation collapses to (keys, b) grain map-side, so the
    shuffle carries B rows per group; ranking windows run on that
    B-sized grain, and the point-estimate join is group-sized
    (broadcast). Returns (keys..., n_docs, mean_q, b_used, lo_q, hi_q).
    """
    from pyspark.sql.window import Window

    t0, t1, t2, t3 = POISSON1_CUM_MICROS
    x = F.col(value_col)
    rs = df.select(*keys, F.col(id_col).alias("_id"), x.alias("_x")).withColumn(
        "b", F.explode(F.sequence(F.lit(0), F.lit(n_resamples - 1)))
    )
    u = md5_bucket(
        F.concat(
            F.lit(f"boot:{salt}:"),
            F.col("_id").cast("string"),
            F.lit(":"),
            F.col("b").cast("string"),
        ),
        1_000_000,
    )
    w = (
        F.when(u < t0, 0)
        .when(u < t1, 1)
        .when(u < t2, 2)
        .when(u < t3, 3)
        .otherwise(4)
    )
    per = (
        rs.withColumn("w", w)
        .groupBy(*keys, "b")
        .agg(
            F.sum(F.col("w") * F.col("_x")).cast("long").alias("s"),
            F.sum("w").cast("long").alias("n"),
        )
        .filter(F.col("n") > 0)
        # floor division (pmod idiom), not `div`: Spark `div` truncates
        # toward zero while DuckDB `//` floors — they only agree on
        # non-negative numerators, and value_col may be signed.
        .select(
            *keys,
            "b",
            F.expr(
                "(s * 1000000L - pmod(s * 1000000L, n)) div n"
            ).alias("mean_b_q"),
        )
    )
    w_asc = Window.partitionBy(*keys).orderBy(F.asc("mean_b_q"), F.asc("b"))
    w_desc = Window.partitionBy(*keys).orderBy(F.desc("mean_b_q"), F.desc("b"))
    w_all = Window.partitionBy(*keys)
    ranked = (
        per.withColumn("ra", F.row_number().over(w_asc))
        .withColumn("rd", F.row_number().over(w_desc))
        .withColumn("cnt", F.count(F.lit(1)).over(w_all))
    )
    pick = F.when(F.col("cnt") >= 4, F.lit(2)).otherwise(F.lit(1))
    ci = ranked.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("b_used"),
        F.max(F.when(F.col("ra") == pick, F.col("mean_b_q")))
        .cast("long")
        .alias("lo_q"),
        F.max(F.when(F.col("rd") == pick, F.col("mean_b_q")))
        .cast("long")
        .alias("hi_q"),
    )
    point = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(x).cast("long").alias("_sx"),
    ).select(
        *keys,
        "n_docs",
        F.expr(
            "(_sx * 1000000L - pmod(_sx * 1000000L, n_docs)) div n_docs"
        ).alias("mean_q"),
    )
    return point.join(F.broadcast(ci), keys).select(
        *keys, "n_docs", "mean_q", "b_used", "lo_q", "hi_q"
    )


def dsir_importance_weights(
    docs: DataFrame,
    is_target,
    n_buckets: int = 128,
    top_n: int = 50,
    salt: str = "dsir:v1:",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.
    2023): rank raw-corpus documents by how target-like they are under
    hashed-n-gram bag models. Feature = md5 bucket of each token
    (``md5_mod(salt || tok, n_buckets)`` — the repo's engine-exact hash
    identity); the per-bucket log importance ratio under add-one
    smoothing,

        lr[b] = floor(ln( (cnt_t[b]+1)·(R+D) / ((cnt_r[b]+1)·(T+D)) ) · 1e6)

    (T/R = total target/raw tokens, D = n_buckets), is ONE double
    quotient + one ln + one floor — a fixed IEEE tree both engines
    compute identically (the floored-ln precedent); per-document
    log-weight is the exact integer sum of lr over token INSTANCES.
    Both products must stay < 2^53 for the double quotient to be exact
    (counts to ~9e15 against a 128-bucket table — beyond that, bucket
    counts should be pre-scaled).

    100 TB shape: two token-grain partial aggs (target is a filter of
    the same pass) collapse to the D-sized ratio table, which
    broadcasts back onto the token explode; per-doc reduce, then ONE
    bounded TakeOrdered for the top-N selection. Returns the selected
    (id, n_toks, logw_q), ties at the boundary broken by ascending id.
    """
    from rat_strain_loader_pipeline_spark.operators.text import tokens

    toks = docs.select(
        F.col(id_col),
        is_target.alias("__t"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
    ).withColumn(
        "b", md5_mod(F.concat(F.lit(salt), F.col("tok")), n_buckets)
    )
    counts = toks.groupBy("b").agg(
        F.count(F.lit(1)).cast("long").alias("cnt_r"),
        F.sum(F.col("__t").cast("long")).cast("long").alias("cnt_t"),
    )
    totals = counts.agg(
        F.sum("cnt_r").cast("long").alias("r_tot"),
        F.sum("cnt_t").cast("long").alias("t_tot"),
    )
    lr = counts.crossJoin(F.broadcast(totals)).select(
        "b",
        F.floor(
            F.log(
                ((F.col("cnt_t") + 1) * (F.col("r_tot") + n_buckets)).cast(
                    "double"
                )
                / ((F.col("cnt_r") + 1) * (F.col("t_tot") + n_buckets)).cast(
                    "double"
                )
            )
            * F.lit(1_000_000.0)
        )
        .cast("long")
        .alias("lr_q"),
    )
    scored = (
        toks.join(F.broadcast(lr), "b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_toks"),
            F.sum("lr_q").cast("long").alias("logw_q"),
        )
    )
    return (
        scored.orderBy(F.desc("logw_q"), F.asc(id_col))
        .limit(top_n)
        .select(id_col, "n_toks", "logw_q")
    )


def aes_group_candidates(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    n_per_group: int,
    id_col: str = "doc_id",
    salt: str = "v1",
) -> DataFrame:
    """Per-group A-ES candidate state: each group's n smallest exact
    priorities (one hash-partitioned window — never a global sort),
    the stratified twin of ``aes_candidates``. Priorities are
    content-only, so the per-group max-merge identity holds exactly as
    in the global reservoir: top-n(group ∪) == top-n(∪ of per-batch
    per-group top-n)."""
    from pyspark.sql.window import Window

    u = md5_uniform(F.col(id_col).cast("string"), salt)
    w = F.col(weight_col).cast("double")
    priority = (-F.log(u)) / w
    ranked = (
        df.filter(w > 0)
        .select(
            F.col(group_col),
            F.col(id_col),
            F.col(weight_col),
            priority.alias("__priority"),
        )
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy(group_col).orderBy(
                    F.col("__priority").asc(), F.col(id_col).asc()
                )
            ),
        )
    )
    return ranked.filter(F.col("__rn") <= n_per_group).drop("__rn")


def aes_group_select(
    candidates: DataFrame,
    group_col: str,
    n_per_group: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Final per-group selection over stratified A-ES candidate rows
    (one or many batches' worth), output in integer micro-units."""
    from pyspark.sql.window import Window

    cols = [c for c in candidates.columns if c not in ("__priority",)]
    ranked = candidates.withColumn(
        "__rn",
        F.row_number().over(
            Window.partitionBy(group_col).orderBy(
                F.col("__priority").asc(), F.col(id_col).asc()
            )
        ),
    )
    return (
        ranked.filter(F.col("__rn") <= n_per_group)
        .select(
            *cols,
            F.floor(F.col("__priority") * 1e6).cast("long").alias(
                "priority_micros"
            ),
        )
    )


def group_weighted_sample(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    n_per_group: int,
    id_col: str = "doc_id",
    salt: str = "v1",
) -> DataFrame:
    """Stratified weighted sampling without replacement: the n-smallest
    A-ES priorities PER GROUP (per-domain corpus caps with
    weight-proportional selection inside each domain). One
    hash-partitioned window; scales as long as no group is pathological
    — exactly topk_per_group's contract with priorities for ranks."""
    return aes_group_select(
        aes_group_candidates(
            df, group_col, weight_col, n_per_group, id_col, salt
        ),
        group_col,
        n_per_group,
        id_col,
    )


def sequence_pack_bfd(
    df: DataFrame,
    capacity: int,
    size_col: str = "n_tokens",
    shard_col: str = "shard",
    id_col: str = "doc_id",
) -> DataFrame:
    """Best-fit-decreasing sequence packing — the standard upgrade over
    first-fit concat-and-chunk for training-batch construction: within
    each shard, docs sort by effective size DESC (id-asc ties) and each
    doc goes to the open window with the SMALLEST remaining capacity
    that still fits (remaining-then-bin-id ties); no fit opens a new
    window. BFD's bin count is <= 11/9 * OPT + 6/9 (Johnson's published
    bound), vs first-fit-decreasing's 11/9 * OPT + 1 and plain
    first-fit's 17/10 * OPT — the packing-efficiency audit beside this
    operator turns that from folklore into a measured occupancy number.

    Docs longer than ``capacity`` are truncated to one full window
    (size_eff = least(size, capacity) — the LLM packing convention);
    they always open their own window. Docs with a NULL size are
    DROPPED before the fold (a null n_tokens would turn into NaN
    remaining capacity inside the pandas fold and poison every
    subsequent fit test); upstream token counters never emit nulls,
    so this is a guard, not a semantic branch.

    The per-shard fold is inherently sequential, so it runs via
    ``applyInPandas`` — but ONLY doc METADATA (id + size) shuffles,
    never text: at 100 TB the shard count is the parallel unit (pick
    shards ~ cores), each shard's fold is O(n_docs * open_windows)
    over two bigint columns, and the assignment joins back to the
    corpus by id. Deterministic end-to-end, so a recursive-CTE oracle
    replays the exact fold. Returns (shard, id, size, size_eff,
    bin_id); bin ids are dense 0..n_bins-1 per shard.
    """
    import pandas as pd

    cap = int(capacity)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["size_eff"] = pdf[size_col].clip(upper=cap)
        pdf = pdf.sort_values(
            ["size_eff", id_col], ascending=[False, True]
        )
        rem: list[int] = []
        assigned = []
        for s in pdf["size_eff"].tolist():
            best = -1
            for i, r in enumerate(rem):
                if r >= s and (best < 0 or r < rem[best]):
                    best = i
            if best < 0:
                assigned.append(len(rem))
                rem.append(cap - s)
            else:
                assigned.append(best)
                rem[best] -= s
        pdf["bin_id"] = assigned
        return pdf[[shard_col, id_col, size_col, "size_eff", "bin_id"]]

    out_schema = (
        f"{shard_col} int, {id_col} long, {size_col} long, "
        "size_eff long, bin_id long"
    )
    return (
        df.select(
            F.col(shard_col).cast("int").alias(shard_col),
            F.col(id_col).cast("long").alias(id_col),
            F.col(size_col).cast("long").alias(size_col),
        )
        .filter(F.col(size_col).isNotNull())
        .groupBy(shard_col)
        .applyInPandas(pack, schema=out_schema)
    )
