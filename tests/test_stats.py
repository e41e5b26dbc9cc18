"""value_histogram unit tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from rat_strain_loader_pipeline_spark.operators.stats import value_histogram


def test_value_histogram_partitions_range(spark):
    rows = [(i, float(i)) for i in range(100)]  # values 0..99
    df = spark.createDataFrame(rows, "id long, value double")
    out = value_histogram(df, "value", n_bins=10).orderBy("bin").collect()
    assert [r["bin"] for r in out] == list(range(10))
    assert sum(r["n"] for r in out) == 100
    # max value closes into the last bin (no bin 10): values 90..99
    assert sum(r["n"] for r in out if r["bin"] == 9) == 10
    # edges tile the range in micro-units
    assert out[0]["bin_lo_micros"] == 0
    for a, b in zip(out, out[1:]):
        assert a["bin_hi_micros"] == b["bin_lo_micros"]


def test_value_histogram_nulls_keys_degenerate(spark):
    rows = [(1, "a", 5.0), (2, "a", 5.0), (3, "b", 5.0), (4, "b", None)]
    df = spark.createDataFrame(rows, "id long, k string, value double")
    out = {
        (r["k"], r["bin"]): r["n"]
        for r in value_histogram(df, "value", n_bins=4, keys=["k"]).collect()
    }
    # lo == hi: everything in bin 0; NULL excluded
    assert out == {("a", 0): 2, ("b", 0): 1}


def test_value_histogram_nan_excluded(spark):
    """One NaN must not poison the max/width (NaN sorts greatest in
    Spark) — it is excluded like NULL."""
    rows = [(1, 0.0), (2, 10.0), (3, float("nan")), (4, None)]
    df = spark.createDataFrame(rows, "id long, value double")
    out = value_histogram(df, "value", n_bins=2).orderBy("bin").collect()
    assert [(r["bin"], r["n"]) for r in out] == [(0, 1), (1, 1)]
    assert out[-1]["bin_hi_micros"] == 10_000_000
