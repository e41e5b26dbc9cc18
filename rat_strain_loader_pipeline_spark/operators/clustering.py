"""Distributed k-means clustering over an embedding corpus.

The cluster stage of SemDeDup-style semantic curation (cluster the
corpus, then dedup/prune within clusters), and the fully-distributed
twin of ``similarity.ivf_train_centroids`` (which trains on a
driver-side sample — the standard IVF recipe). Use THIS when even the
training sample exceeds the driver, or when the cluster assignment of
every vector is itself the product (SemDeDup, per-cluster quotas).

Engine-reproducible by construction — no RNG, no float accumulation:

- vectors quantize once to integer micro-units
  (``floor(x_d * 1e6)`` per dimension, bigint);
- init centroids are the K smallest-id vectors (deterministic,
  engine-portable — the ivf_train_centroids "first rows by id"
  precedent, minus the RNG);
- distances are bigint sums of squared integer differences
  (order-free); assignment is argmin with (dist, cluster) tie-break;
- centroid updates floor the exact double quotient of bigint sums
  (``floor(CAST(sum AS DOUBLE)/count)`` — identical IEEE division in
  every engine; NOT integer ``div``/``//``, whose negative-operand
  truncation direction differs between Spark and DuckDB);
- empty clusters keep their previous centroid.

So a DuckDB oracle can unroll the same ``iters`` rounds in SQL and
match bit-exactly (the pagerank oracle pattern).

100 TB shape: one staged (vec_id, dim, xq) explode; per round, one
equi-join against the (K x dim)-sized centroid table (dimension-sized
— broadcast at any corpus scale), one (vec_id, cluster) partial-agg
distance reduction, one per-vector argmin aggregate, one (cluster,
dim) partial-agg centroid update. Nothing is all-pairs; per-round
state is K x dim rows; rounds are lineage-truncated through parquet
stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MICROS = 1_000_000


def kmeans_fit(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Lloyd's k-means in integer micro-units; returns
    ``(assignments, centroids)`` — assignments as (id_col, j, dist)
    from the final round, centroids as the (j, dim, c) table those
    distances were measured against (the model an ADC/IVF consumer
    probes). See module docstring for the exactness contract."""
    from rat_strain_loader_pipeline_spark.staging import stage_to_parquet

    ex = stage_to_parquet(
        embeddings.select(
            F.col(id_col),
            F.posexplode(vec_col).alias("dim", "x"),
        ).select(
            id_col,
            "dim",
            F.floor(F.col("x").cast("double") * MICROS).cast("long").alias("xq"),
        ),
        "kmeans-ex",
    )
    # K-row window: cluster ids 0..k-1 in id order over the seed set only
    seeds = (
        embeddings.select(id_col)
        .orderBy(id_col)
        .limit(k)
        .withColumn("j", F.row_number().over(Window.orderBy(id_col)) - 1)
    )
    cent = ex.join(seeds, id_col).select("j", "dim", F.col("xq").alias("c"))
    assign = None
    for r in range(iters):
        dists = (
            ex.join(cent, "dim")
            .groupBy(id_col, "j")
            .agg(
                F.sum((F.col("xq") - F.col("c")) * (F.col("xq") - F.col("c"))).alias(
                    "dist"
                )
            )
        )
        assign = stage_to_parquet(
            dists.groupBy(id_col)
            .agg(F.min(F.struct("dist", "j")).alias("m"))
            .select(id_col, F.col("m.j").alias("j"), F.col("m.dist").alias("dist"))
            .coalesce(4),  # vector-count rows; 32 near-empty files cost more than they parallelize
            f"kmeans-assign-{r}",
        )
        if r == iters - 1:
            break
        updated = (
            ex.join(assign.select(id_col, "j"), id_col)
            .groupBy("j", "dim")
            .agg(
                F.floor(
                    F.sum("xq").cast("double") / F.count(F.lit(1)).cast("double")
                )
                .cast("long")
                .alias("cn")
            )
        )
        cent = stage_to_parquet(
            cent.join(updated, ["j", "dim"], "left").select(
                "j", "dim", F.coalesce("cn", "c").alias("c")
            ).coalesce(1),  # K x dims rows
            f"kmeans-cent-{r}",
        )
    return assign, cent


def kmeans_micros(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means in integer micro-units; returns one row per
    vector: (id_col, cluster_id, dist_sq) from the final assignment
    round. See module docstring for the exactness contract."""
    assign, _ = kmeans_fit(embeddings, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    return assign.select(
        F.col(id_col),
        F.col("j").cast("long").alias("cluster_id"),
        F.col("dist").alias("dist_sq"),
    )


#: soft ceiling for the estimated within-cluster pair count before
#: semdedup_prune warns that k is too small for the corpus (the pair
#: stage is sum of squared cluster sizes — the caller's k controls it)
SEMDEDUP_PAIR_WARN = 100_000_000


def semdedup_prune(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 3,
    tau: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int | None = None,
    assign: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al.): cluster the corpus with ``kmeans_micros``,
    then prune near-duplicates WITHIN each cluster — a vector is dropped
    when a smaller-id cluster-mate has cosine >= ``tau``. Clustering
    bounds the pairwise stage to within-cluster pairs (sum of squared
    cluster sizes, not corpus²) — that reduction IS the method; size
    clusters (k) so the largest cluster's pair block stays tractable.

    Guardrail: the k-sized cluster-size table is inspected BEFORE the
    pair stage. If the estimated pair count exceeds
    ``SEMDEDUP_PAIR_WARN`` a warning names the fix (raise k). With
    ``max_cluster_size`` set, oversize clusters are additionally SPLIT
    into deterministic hash sub-blocks (the minhash hot-bucket-cap
    precedent, dedup.py): each pair block is then at most
    ~max_cluster_size rows — cross-sub-block pairs are skipped, so this
    trades bounded recall loss for a hard work bound; leave it None for
    exact within-cluster semantics.

    Exactness: dots and norms are bigint sums over the micro-unit
    quantized components; the threshold test dot² >= tau²·|a|²·|b|²
    (guarded by dot > 0) is evaluated as one fixed IEEE-754 double
    expression tree over those integers — identical in any engine, so
    the DuckDB oracle matches exactly.

    ``assign`` (optional precomputed (id_col, cluster_id, ...) frame,
    e.g. a staged ``kmeans_micros`` run shared across consumers — the
    build-once lifecycle hook) skips the clustering; k/iters are then
    documentation of how it was built.

    Returns one row per vector: (id_col, cluster_id, kept).
    """
    import warnings

    from rat_strain_loader_pipeline_spark.staging import stage_to_parquet

    if assign is None:
        assign = kmeans_micros(
            embeddings, k=k, iters=iters, id_col=id_col, vec_col=vec_col
        )
    # guardrail: k rows — one tiny job, never corpus-sized
    sizes = assign.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("__n"))
    size_rows = sizes.collect()
    est_pairs = sum(r["__n"] * (r["__n"] - 1) // 2 for r in size_rows)
    biggest = max((r["__n"] for r in size_rows), default=0)
    if max_cluster_size is None and est_pairs > SEMDEDUP_PAIR_WARN:
        warnings.warn(
            f"semdedup_prune: estimated within-cluster pair count {est_pairs:_}"
            f" exceeds {SEMDEDUP_PAIR_WARN:_} (largest cluster {biggest:_},"
            f" k={k}) — raise k, or set max_cluster_size to hash-split"
            " oversize clusters (bounded recall loss)",
            stacklevel=2,
        )
    if max_cluster_size is not None and biggest > max_cluster_size:
        warnings.warn(
            f"semdedup_prune: largest cluster {biggest:_} >"
            f" max_cluster_size={max_cluster_size:_}; splitting oversize"
            " clusters into hash sub-blocks — cross-block near-dups are"
            " not compared (raise k for exact within-cluster semantics)",
            stacklevel=2,
        )
    if max_cluster_size is not None:
        n_sub = F.ceil(F.col("__n") / max_cluster_size).cast("long")
        assign = (
            assign.join(F.broadcast(sizes), "cluster_id")
            .withColumn(
                "__sub",
                F.when(
                    F.col("__n") > max_cluster_size,
                    F.pmod(F.xxhash64(F.col(id_col)), n_sub),
                ).otherwise(F.lit(0).cast("long")),
            )
            .drop("__n")
        )
    else:
        assign = assign.withColumn("__sub", F.lit(0).cast("long"))
    ex = stage_to_parquet(
        embeddings.select(
            F.col(id_col), F.posexplode(vec_col).alias("dim", "x")
        ).select(
            id_col,
            "dim",
            F.floor(F.col("x").cast("double") * MICROS).cast("long").alias("xq"),
        ),
        "semdedup-ex",
    )
    n2 = ex.groupBy(id_col).agg(F.sum(F.col("xq") * F.col("xq")).alias("n2"))
    mem = ex.join(assign.select(id_col, "cluster_id", "__sub"), id_col)
    a, b = mem.alias("a"), mem.alias("b")
    dots = (
        a.join(
            b,
            on=[
                F.col("a.cluster_id") == F.col("b.cluster_id"),
                F.col("a.__sub") == F.col("b.__sub"),
                F.col("a.dim") == F.col("b.dim"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.sum(F.col("a.xq") * F.col("b.xq")).alias("dot"))
    )
    na = n2.select(F.col(id_col).alias("id_a"), F.col("n2").alias("na2"))
    nb = n2.select(F.col(id_col).alias("id_b"), F.col("n2").alias("nb2"))
    dot_d = F.col("dot").cast("double")
    losers = (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .filter(
            (F.col("dot") > 0)
            & (
                dot_d * dot_d
                >= F.lit(tau * tau)
                * F.col("na2").cast("double")
                * F.col("nb2").cast("double")
            )
        )
        .select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("__lost", F.lit(True))
    )
    return (
        assign.select(id_col, "cluster_id")
        .join(losers, id_col, "left")
        .select(
            id_col,
            "cluster_id",
            F.col("__lost").isNull().alias("kept"),
        )
    )


def kmeans_fit_grouped(
    ex: DataFrame,
    k: int,
    iters: int,
    id_col: str = "vec_id",
) -> tuple[DataFrame, DataFrame]:
    """Lloyd's k-means over MANY independent vector spaces in ONE set
    of jobs: ``ex`` is a pre-exploded (id_col, g, dim, xq) frame where
    ``g`` names the space (e.g. one group per PQ subspace, plus one for
    the coarse quantizer) and xq is the micro-unit integer component.
    The group id rides every join/agg key, so training M codebooks
    costs the SAME number of scans/shuffles as training one — the
    single-pass multi-codebook build an IVF-PQ index runs at corpus
    scale, where per-subspace serial fits would multiply the scan count
    by M.

    Per group the arithmetic is IDENTICAL to ``kmeans_fit`` (same
    smallest-id seeding — every vector appears in every group, so the
    global id ranking seeds each group identically; same bigint
    distances, (dist, j) argmin, floored-double centroid updates,
    empty-cluster keep-old), so a per-group unrolled-CTE oracle matches
    value-exact.

    Returns (assignments (id_col, g, j, dist), centroids (g, j, dim, c))
    from the final round.
    """
    from rat_strain_loader_pipeline_spark.staging import stage_to_parquet

    ex = stage_to_parquet(ex, "kmeansg-ex")
    seeds = (
        ex.select(id_col)
        .distinct()
        .orderBy(id_col)
        .limit(k)
        .withColumn("j", F.row_number().over(Window.orderBy(id_col)) - 1)
    )
    cent = ex.join(seeds, id_col).select("g", "j", "dim", F.col("xq").alias("c"))
    assign = None
    for r in range(iters):
        dists = (
            ex.join(cent, ["g", "dim"])
            .groupBy(id_col, "g", "j")
            .agg(
                F.sum((F.col("xq") - F.col("c")) * (F.col("xq") - F.col("c"))).alias(
                    "dist"
                )
            )
        )
        assign = stage_to_parquet(
            dists.groupBy(id_col, "g")
            .agg(F.min(F.struct("dist", "j")).alias("m"))
            .select(
                id_col, "g", F.col("m.j").alias("j"), F.col("m.dist").alias("dist")
            )
            .coalesce(4),  # groups x vector-count rows
            f"kmeansg-assign-{r}",
        )
        if r == iters - 1:
            break
        updated = (
            ex.join(assign.select(id_col, "g", "j"), [id_col, "g"])
            .groupBy("g", "j", "dim")
            .agg(
                F.floor(
                    F.sum("xq").cast("double") / F.count(F.lit(1)).cast("double")
                )
                .cast("long")
                .alias("cn")
            )
        )
        cent = stage_to_parquet(
            cent.join(updated, ["g", "j", "dim"], "left").select(
                "g", "j", "dim", F.coalesce("cn", "c").alias("c")
            ).coalesce(1),  # groups x K x dims rows
            f"kmeansg-cent-{r}",
        )
    return assign, cent


def cluster_quota_sample(
    embeddings: DataFrame,
    docs: DataFrame,
    quota: int,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    doc_id_col: str = "doc_id",
    priority_cols: list | None = None,
    assign: DataFrame | None = None,
) -> DataFrame:
    """Diversity-balanced corpus sampling: cluster the embedding space
    with ``kmeans_micros``, then keep at most ``quota`` documents per
    cluster, highest-priority first — the selection step after
    SemDeDup-style curation that stops one over-represented mode (web
    boilerplate, one domain) from dominating the training mix. Uniform
    sampling keeps the corpus' skew; per-cluster quotas cap it.

    ``priority_cols`` is the deterministic keep order (default: longest
    document first, doc id ties). One hash-partitioned window per
    cluster — no global sort, no pairwise stage; the kmeans rounds are
    the documented flat-cost scans.

    ``assign`` (optional precomputed assignment frame) skips the
    clustering — the shared-kmeans lifecycle hook.

    Returns kept rows only: (doc_id, cluster_id, rk), rk 1-based.
    """
    if assign is None:
        assign = kmeans_micros(embeddings, k=k, iters=iters, id_col=id_col)
    joined = assign.join(
        docs, assign[id_col] == docs[doc_id_col]
    )
    order = priority_cols or [F.col("n_chars").desc(), F.col(doc_id_col).asc()]
    w = Window.partitionBy("cluster_id").orderBy(*order)
    return (
        joined.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= quota)
        .select(
            F.col(doc_id_col),
            F.col("cluster_id"),
            F.col("rk").cast("long").alias("rk"),
        )
    )
