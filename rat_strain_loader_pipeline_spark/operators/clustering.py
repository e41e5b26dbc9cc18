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
            .select(id_col, F.col("m.j").alias("j"), F.col("m.dist").alias("dist")),
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
            ),
            f"kmeans-cent-{r}",
        )
    return assign.select(
        F.col(id_col),
        F.col("j").cast("long").alias("cluster_id"),
        F.col("dist").alias("dist_sq"),
    )
