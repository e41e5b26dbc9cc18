"""Incremental rollup maintenance: merge == from-scratch."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_merge_rollup_handles_one_sided_groups_and_null_sums(spark):
    from rat_strain_loader_pipeline_spark.operators.incremental import (
        merge_rollup,
        rollup_events,
    )

    # base: groups A (valued), B (all-null values); delta: B (valued),
    # C (delta-only, all-null) — exercises every coalesce branch
    base_rows = [
        (1, 10, "A", 1.5),
        (2, 10, "A", 2.25),
        (3, 20, "B", None),
    ]
    delta_rows = [
        (4, 20, "B", 4.0),
        (5, 30, "C", None),
        (6, 30, "C", float("nan")),
    ]
    schema = "event_id long, user_id long, event_type string, value double"
    base = spark.createDataFrame(base_rows, schema)
    delta = spark.createDataFrame(delta_rows, schema)
    keys = ("user_id", "event_type")
    merged = {
        (r["user_id"], r["event_type"]): r
        for r in merge_rollup(
            rollup_events(base, keys),
            rollup_events(delta, keys),
            keys,
            sums=("n_events",),
            nullable_sums=("sum_value_q",),
            mins=("min_value_q",),
            maxs=("max_value_q",),
        ).collect()
    }
    scratch = {
        (r["user_id"], r["event_type"]): r
        for r in rollup_events(base.unionByName(delta), keys).collect()
    }
    assert set(merged) == set(scratch) == {(10, "A"), (20, "B"), (30, "C")}
    for k in scratch:
        for c in ("n_events", "sum_value_q", "min_value_q", "max_value_q"):
            assert merged[k][c] == scratch[k][c], (k, c)
    # the all-null groups really are null, not 0
    assert merged[(30, "C")]["sum_value_q"] is None
    assert merged[(20, "B")]["sum_value_q"] == math.floor(4.0 * 1_000_000)


def test_maintained_rollup_equals_scratch_on_real_table(spark, sf_dir):
    from rat_strain_loader_pipeline_spark.operators.incremental import (
        maintain_events_rollup,
        rollup_events,
    )
    from rat_strain_loader_pipeline_spark.sources.tables import read_table

    ev = read_table(spark, sf_dir, "events")
    got = sorted(
        tuple(r)
        for r in maintain_events_rollup(
            ev, ("user_id", "event_type"), F.col("event_id") % 10 == 0
        ).collect()
    )
    want = sorted(
        tuple(r) for r in rollup_events(ev, ("user_id", "event_type")).collect()
    )
    assert got == want


def test_retraction_equals_scratch_and_drops_erased_groups(spark, sf_dir):
    from rat_strain_loader_pipeline_spark.operators.incremental import (
        retract_events_rollup,
        rollup_events,
    )
    from rat_strain_loader_pipeline_spark.sources.tables import read_table

    ev = read_table(spark, sf_dir, "events")
    pred = F.col("user_id") % 7 == 0
    got = sorted(
        tuple(r)
        for r in retract_events_rollup(
            ev, ("user_id", "event_type"), pred
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in rollup_events(ev.filter(~pred), ("user_id", "event_type")).collect()
    )
    assert got == want
    assert all(t[0] % 7 != 0 for t in got)  # erased users are gone
