"""Count-Min sketch: no-undercount guarantee, collision behavior,
partition invariance."""

from __future__ import annotations

from pyspark.sql import functions as F


def _hh(spark, rows, **kw):
    df = spark.createDataFrame([(k,) for k in rows], "k string")
    from rat_strain_loader_pipeline_spark.operators.sketch import (
        count_min_heavy_hitters,
    )

    return {r["k"]: r for r in count_min_heavy_hitters(df, "k", **kw).collect()}


def test_cms_never_undercounts_and_tiny_width_collides(spark):
    # 3 keys, width 2: at least two keys must share a bucket in every
    # row, so some estimate strictly exceeds its exact count — while
    # the no-undercount invariant holds for all
    rows = ["a"] * 50 + ["b"] * 30 + ["c"] * 20
    out = _hh(spark, rows, depth=2, width=2, topn=3)
    assert {k: r["exact_n"] for k, r in out.items()} == {"a": 50, "b": 30, "c": 20}
    assert all(r["over_ok"] for r in out.values())
    assert all(r["est_n"] >= r["exact_n"] for r in out.values())
    assert any(r["slack"] > 0 for r in out.values())


def test_cms_wide_sketch_is_exact_for_isolated_keys(spark):
    # width far above cardinality: with high probability no collisions;
    # regardless, the min-over-depth estimate can only shrink as width
    # grows, and exactness here is deterministic given the fixed md5
    # hashes (pinned by this test)
    rows = [f"k{i}" for i in range(10) for _ in range(i + 1)]
    out = _hh(spark, rows, depth=3, width=4096, topn=10)
    assert all(r["slack"] == 0 for r in out.values())
    assert all(r["bound_ok"] for r in out.values())


def test_cms_partition_invariant(spark, sf_dir):
    from rat_strain_loader_pipeline_spark.operators.sketch import (
        count_min_heavy_hitters,
    )
    from rat_strain_loader_pipeline_spark.sources.tables import read_table

    ev = read_table(spark, sf_dir, "events")
    a = sorted(
        tuple(r)
        for r in count_min_heavy_hitters(
            ev.coalesce(1), "user_id", depth=3, width=64, topn=10
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in count_min_heavy_hitters(
            ev.repartition(17, F.col("event_id") % 5), "user_id",
            depth=3, width=64, topn=10,
        ).collect()
    )
    assert a == b
    assert len(a) == 10
