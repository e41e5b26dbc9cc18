"""Streaming ANN index maintenance.

A trained IVF index (operators/similarity.py: sampled k-means
centroids + inverted posting lists) must keep ingesting new vectors
long after training — retraining or globally rebuilding the index per
delivery does not scale. Here the posting store grows incrementally:
each micro-batch assigns its vectors to the FIXED trained centroids and
appends to the parquet posting store, O(batch) work per trigger.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

def ivf_ingest_available_now(
    spark: SparkSession,
    src_dir: str,
    centroids,
    work_dir: str,
    schema=None,
    max_files_per_trigger: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Incremental ANN index maintenance: embeddings stream in as
    micro-batches and each batch is assigned to its nearest centroid
    list (operators/similarity.py ivf_assign against the FIXED trained
    centroids) and appended to the posting store — how a vector index
    ingests a continuously-growing corpus without retraining or global
    rebuilds. Assignment is per-row against static centroids, so the
    posting store is batch-split-invariant; queries over it (ivf_topk)
    return exactly what a batch-built index returns — the property the
    driver query checks value-exact via the brute-force oracle at
    nprobe = n_lists.

    Returns the posting store DataFrame (id, vec, list_id).
    """
    from rat_strain_loader_pipeline_spark.operators.similarity import ivf_assign

    postings = os.path.join(work_dir, "postings")
    checkpoint = os.path.join(work_dir, "checkpoint")
    if schema is None:
        schema = spark.read.parquet(src_dir).schema

    def ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch is at-least-once: per-batch overwritten partition
        # so a retried batch replaces rather than duplicates postings
        ivf_assign(batch_df, centroids, id_col=id_col, vec_col=vec_col).write.mode(
            "overwrite"
        ).parquet(os.path.join(postings, f"batch={batch_id}"))

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    q = (
        reader.parquet(src_dir)
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .foreachBatch(ingest_batch)
        .start()
    )
    q.awaitTermination()
    if not os.path.exists(postings):
        empty = spark.createDataFrame([], schema)
        return ivf_assign(empty, centroids, id_col=id_col, vec_col=vec_col)
    return spark.read.parquet(postings).drop("batch")


def ivf_pq_encode_ingest_available_now(
    spark: SparkSession,
    src_dir: str,
    index_path: str,
    work_dir: str,
    dims: int,
    m: int = 2,
    schema=None,
    max_files_per_trigger: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Streaming PQ-coded ingest against a persisted RESIDUAL IVF-PQ
    artifact — the compressed-representation twin of
    ``ivf_ingest_available_now``: each micro-batch routes + encodes its
    vectors with the FROZEN stored model (operators/quantize.py
    ivf_pq_encode_batch — 1 routing bigint + m code bigints per vector,
    never the raw vector) and lands at a deterministic ``batch=<id>``
    partition (overwrite — at-least-once replay rewrites, never
    duplicates). Encode is per-vector against static model state, so
    the merged store is bit-identical to the one-shot encode of the
    same rows at ANY batch split — the mergeability contract the
    driver oracle checks value-exact.

    Returns the merged (id_col, jc, g, j) code store."""
    from rat_strain_loader_pipeline_spark.operators.quantize import (
        ivf_pq_encode_batch,
    )

    codes_store = os.path.join(work_dir, "pq-codes")
    checkpoint = os.path.join(work_dir, "checkpoint")
    if schema is None:
        schema = spark.read.parquet(src_dir).schema

    def ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        ivf_pq_encode_batch(
            spark, index_path, batch_df, dims, m=m,
            id_col=id_col, vec_col=vec_col,
        ).write.mode("overwrite").parquet(
            os.path.join(codes_store, f"batch={batch_id}")
        )

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    q = (
        reader.parquet(src_dir)
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .foreachBatch(ingest_batch)
        .start()
    )
    q.awaitTermination()
    if not os.path.exists(codes_store):
        # Schema must match the non-empty path exactly: ivf_pq_encode_batch
        # emits int jc/j (kmeans row_number - 1 seeds are Spark ints).
        return spark.createDataFrame(
            [], f"{id_col} long, jc int, g int, j int"
        )
    return spark.read.parquet(codes_store).drop("batch")
