"""Canonical store: partition layout, pruning, dynamic overwrite."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from rat_strain_loader_pipeline_spark.store import (
    overwrite_partitions,
    read_table,
    write_table,
)


def _vmd(spark, chrom, genic):
    return spark.createDataFrame(
        [(i, chrom, 100 + i, 101 + i, None, genic, 360) for i in range(5)],
        "rgd_id long, chromosome string, start_pos long, end_pos long, "
        "padding_base string, genic_status string, map_key int",
    )


def test_partition_layout_and_pruning(spark, tmp_path):
    root = str(tmp_path / "store")
    write_table(_vmd(spark, "1", "GENIC"), root, "variant_map_data")
    write_table(_vmd(spark, "2", "GENIC"), root, "variant_map_data")

    base = os.path.join(root, "variant_map_data", "map_key=360")
    assert sorted(os.listdir(base)) == ["chromosome=1", "chromosome=2"]

    df = read_table(spark, root, "variant_map_data", map_key=360, chromosome="2")
    assert df.count() == 5
    assert {r["chromosome"] for r in df.collect()} == {"2"}
    # the filter must reach the scan as a PartitionFilter, not a row filter
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "chromosome" in plan.split("PartitionFilters")[1][:200]


def test_overwrite_partitions_touches_only_present(spark, tmp_path):
    root = str(tmp_path / "store")
    write_table(_vmd(spark, "1", "INTERGENIC"), root, "variant_map_data")
    write_table(_vmd(spark, "2", "INTERGENIC"), root, "variant_map_data")

    # fixup recomputes chromosome 1 only
    overwrite_partitions(_vmd(spark, "1", "GENIC"), root, "variant_map_data")

    out = {
        (r["chromosome"], r["genic_status"])
        for r in read_table(spark, root, "variant_map_data").collect()
    }
    assert out == {("1", "GENIC"), ("2", "INTERGENIC")}


def test_bucketed_store_elides_store_side_shuffle(spark, tmp_path):
    """A store bucketed on the join key must join without an Exchange on
    the bucketed side — the co-location the reference approximates with
    per-chromosome processes."""
    from rat_strain_loader_pipeline_spark.store import write_bucketed

    store = spark.range(10_000).select(
        (F.col("id") % 977).alias("start_pos"), F.col("id").alias("rgd_id")
    )
    write_bucketed(store, "bucketed_variant_store_test", ["start_pos"], n_buckets=8)
    try:
        stored = spark.table("bucketed_variant_store_test")
        incoming = spark.range(500).select(
            (F.col("id") * 3 % 977).alias("start_pos"), F.col("id").alias("payload")
        )
        # force a sort-merge join so bucketing (not broadcast) does the work
        joined = incoming.hint("merge").join(stored, "start_pos")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]  # executed plan string repeats both
        # exactly ONE exchange: the incoming side repartitions to the
        # bucket layout; the bucketed scan itself must not shuffle
        assert final.count("Exchange hashpartitioning") == 1, final
        assert "SortMergeJoin" in final
        assert "Bucketed: true" in final
        # correctness unchanged
        expect = incoming.join(store, "start_pos").count()
        assert joined.count() == expect
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_variant_store_test")


def test_compact_table_content_invariant(spark, tmp_path):
    """Compaction shrinks the file count without touching the row
    multiset, for both unpartitioned and partitioned tables."""
    from rat_strain_loader_pipeline_spark.store import compact_table, read_table

    root = str(tmp_path)
    # unpartitioned: 20 tiny appends
    for i in range(20):
        spark.createDataFrame([(i * 10 + j, f"v{i}") for j in range(5)],
                              "rgd_id long, v string").write.mode("append").parquet(
            f"{root}/variant"
        )
    before = spark.read.parquet(f"{root}/variant").collect()
    stats = compact_table(spark, root, "variant", target_rows_per_file=1000)
    after = spark.read.parquet(f"{root}/variant").collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))
    assert stats["files_after"] < stats["files_before"]
    assert stats["files_after"] == 1 and stats["rows"] == 100

    # partitioned: appends across two (map_key, chromosome) partitions
    for i in range(6):
        spark.createDataFrame(
            [(i, 360, "1"), (i, 360, "2")], "rgd_id long, map_key int, chromosome string"
        ).write.mode("append").partitionBy("map_key", "chromosome").parquet(
            f"{root}/variant_map_data"
        )
    before = read_table(spark, root, "variant_map_data").collect()
    stats = compact_table(spark, root, "variant_map_data", target_rows_per_file=1000)
    after = read_table(spark, root, "variant_map_data").collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))
    assert stats["files_after"] < stats["files_before"]
