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
