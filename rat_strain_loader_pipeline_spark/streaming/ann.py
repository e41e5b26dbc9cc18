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
