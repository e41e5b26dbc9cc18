"""Streaming near-duplicate admission gate.

The ingestion-time counterpart of the batch dedup suite: documents
arrive as micro-batches, and each doc is ADMITTED only if it is not a
verified near-duplicate (exact Jaccard over shingle hashes >= the
threshold) of any EARLIER document — earlier meaning previous batches,
or a smaller id inside the same batch. This is how a training-data
pipeline keeps a continuously-ingested corpus deduped without
re-running global dedup after every delivery.

State across batches is a parquet signature store holding every seen
document's shingle-hash array and its LSH band rows, so a batch probes
the corpus with the SAME banded equi-join the batch operator uses
(operators/dedup.py minhash_lsh_pairs) — candidate generation is
O(batch x matching buckets), never O(batch x corpus), and state grows
by O(batch) per trigger.

With id-ordered arrival (the natural case: deliveries are appended with
monotonically-increasing ids), "earlier" coincides with "smaller id",
so the admitted set equals the batch rule "reject iff a verified
near-dup with smaller doc_id exists anywhere in the corpus" — the
property the driver query's DuckDB oracle checks value-exact across a
real multi-batch run. Note this nearest-neighbor rule is deliberately
NOT connected-components survivorship: a doc with no smaller-id
near-dup NEIGHBOR is admitted even if a transitive chain links it to a
smaller doc (that policy lives in dedup_survivors).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def dedup_gate_available_now(
    spark: SparkSession,
    src_dir: str,
    work_dir: str,
    jaccard_threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
    hash_fn: str = "md5_oracle",
    schema=None,
    max_files_per_trigger: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Run the admission gate as an AvailableNow stream over a document
    directory; returns (id_col, admitted) for every streamed doc."""
    from rat_strain_loader_pipeline_spark.operators.dedup import (
        _verify_jaccard,
        band_signatures,
        minhash_signatures,
        shingle_hashes,
    )

    hashes_store = os.path.join(work_dir, "hashes")
    bands_store = os.path.join(work_dir, "bands")
    out_path = os.path.join(work_dir, "out")
    checkpoint = os.path.join(work_dir, "checkpoint")
    if schema is None:
        schema = spark.read.parquet(src_dir).schema

    def gate_batch(batch_df: DataFrame, batch_id: int) -> None:
        bh = shingle_hashes(batch_df, text_col, id_col, shingle_n, stage=True, hash_fn=hash_fn)
        bs = minhash_signatures(
            batch_df, text_col, id_col, num_hashes, shingle_n, seed, hashes=bh
        )
        bb = band_signatures(bs, id_col, num_hashes, bands)
        # stage the banded rows: they feed two joins below AND the state
        # append, and the state read must never see a half-written self
        from rat_strain_loader_pipeline_spark.staging import stage_to_parquet

        bb = stage_to_parquet(bb, "gate-bands")

        # foreachBatch is at-least-once: state lives in per-batch
        # overwritten partitions, and the probe reads STRICTLY EARLIER
        # batches only. This covers two failure modes at once: a retried
        # batch that already half-appended its own signatures must not
        # match its docs against themselves (self-pairs at Jaccard 1.0
        # would reject the whole batch), and a full restart over a lost
        # checkpoint (batch ids reassigned from 0) must not let an early
        # batch probe a LATER batch's leftover state — with batch < id,
        # a rerun into the same work_dir reproduces identical decisions.
        if os.path.exists(hashes_store):
            prev_hashes = (
                spark.read.parquet(hashes_store)
                .filter(F.col("batch") < batch_id)
                .drop("batch")
            )
            prev_bands = (
                spark.read.parquet(bands_store)
                .filter(F.col("batch") < batch_id)
                .drop("batch")
            )
        else:
            prev_hashes = spark.createDataFrame([], bh.schema)
            prev_bands = spark.createDataFrame([], bb.schema)

        # earlier-doc candidates: cross-batch (any previous doc) via the
        # banded equi-join, plus in-batch pairs with smaller id
        cross = (
            prev_bands.alias("p")
            .join(
                bb.alias("c"),
                on=[F.col("p.band") == F.col("c.band"), F.col("p.band_sig") == F.col("c.band_sig")],
            )
            .select(F.col(f"p.{id_col}").alias("id_a"), F.col(f"c.{id_col}").alias("id_b"))
        )
        within = (
            bb.alias("a")
            .join(
                bb.alias("b"),
                on=[
                    F.col("a.band") == F.col("b.band"),
                    F.col("a.band_sig") == F.col("b.band_sig"),
                    F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
                ],
            )
            .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        )
        candidates = cross.unionByName(within).dropDuplicates()
        all_hashes = prev_hashes.unionByName(bh)
        rejected = (
            _verify_jaccard(candidates, all_hashes, id_col, jaccard_threshold)
            .select(F.col("id_b").alias(id_col))
            .dropDuplicates()
        )
        decisions = batch_df.select(id_col).join(rejected, id_col, "left_anti").withColumn(
            "admitted", F.lit(True)
        ).unionByName(rejected.withColumn("admitted", F.lit(False)))
        decisions.write.mode("overwrite").parquet(os.path.join(out_path, f"batch={batch_id}"))
        # state lands AFTER decisions, per-batch overwrite: O(batch)
        # growth per trigger, idempotent under retry
        bh.write.mode("overwrite").parquet(os.path.join(hashes_store, f"batch={batch_id}"))
        bb.write.mode("overwrite").parquet(os.path.join(bands_store, f"batch={batch_id}"))

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    q = (
        reader.parquet(src_dir)
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .foreachBatch(gate_batch)
        .start()
    )
    q.awaitTermination()
    if not os.path.exists(out_path):
        return spark.createDataFrame([], f"{id_col} long, admitted boolean")
    return spark.read.parquet(out_path).drop("batch")

