"""Structured Streaming tests: incremental hourly agg matches batch,
foreachBatch upsert is exactly-once on replayed input."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from rat_strain_loader_pipeline_spark.sources.tables import read_table
from rat_strain_loader_pipeline_spark.streaming.events import (
    dedup_within_watermark,
    hourly_event_counts,
    stream_events,
    write_upsert_foreach_batch,
)


def _events_dir(spark, tmp_path, sf_dir):
    # materialize the testdata events as a proper timestamp parquet dir
    src = read_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_in")
    src.write.mode("overwrite").parquet(out)
    return out, src


def test_streaming_hourly_matches_batch(spark, tmp_path, sf_dir):
    path, batch_src = _events_dir(spark, tmp_path, sf_dir)
    stream = stream_events(spark, path)
    agg = hourly_event_counts(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("hourly_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("select * from hourly_test").collect()
    }
    expected = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in (
            batch_src.groupBy(
                F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
            )
            .collect()
        )
    }
    assert got == expected


def test_streaming_dedup_and_upsert(spark, tmp_path, sf_dir):
    path, batch_src = _events_dir(spark, tmp_path, sf_dir)
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt2")

    stream = dedup_within_watermark(stream_events(spark, path), ["event_id"])
    q = write_upsert_foreach_batch(stream, store, ckpt, ["event_id"]).start()
    q.awaitTermination(120)

    n_src = batch_src.count()
    n_store = spark.read.parquet(store).count()
    assert n_store == n_src

    # replay the same input with a FRESH checkpoint: anti-join keeps the
    # store exactly-once
    q2 = write_upsert_foreach_batch(
        dedup_within_watermark(stream_events(spark, path), ["event_id"]),
        store,
        str(tmp_path / "ckpt3"),
        ["event_id"],
    ).start()
    q2.awaitTermination(120)
    assert spark.read.parquet(store).count() == n_src
