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


def test_cc_incremental_equals_scratch_on_real_docs(spark, sf_dir):
    """Merging a delta batch's pairs into the stored component table
    must be bit-identical to scratch CC over the union edge set — the
    dedup-at-ingest contract."""
    from rat_strain_loader_pipeline_spark.operators.dedup import (
        connected_components,
        connected_components_incremental,
        minhash_lsh_cross_pairs,
        minhash_lsh_pairs,
    )
    from rat_strain_loader_pipeline_spark.sources.tables import read_table

    docs = read_table(spark, sf_dir, "documents")
    old_docs = docs.filter(F.col("doc_id") % 2 == 0)
    new_docs = docs.filter(F.col("doc_id") % 2 == 1)
    old_cc = connected_components(
        minhash_lsh_pairs(old_docs, jaccard_threshold=0.5)
    )
    delta = (
        minhash_lsh_pairs(new_docs, jaccard_threshold=0.5)
        .select("id_a", "id_b")
        .unionByName(
            minhash_lsh_cross_pairs(new_docs, old_docs, jaccard_threshold=0.5)
            .select(F.col("id_new").alias("id_a"), F.col("id_old").alias("id_b"))
        )
    )
    got = connected_components_incremental(old_cc, delta)
    want = connected_components(minhash_lsh_pairs(docs, jaccard_threshold=0.5))
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in want.collect()
    )


def test_cc_incremental_empty_delta_keeps_labels(spark):
    """A delta with no surviving edges must return the stored table
    unchanged (plus nothing)."""
    from rat_strain_loader_pipeline_spark.operators.dedup import (
        connected_components_incremental,
    )

    old = spark.createDataFrame(
        [(2, 2), (4, 2), (6, 6)], "node_id long, component_id long"
    )
    delta = spark.createDataFrame([], "id_a long, id_b long")
    got = sorted(
        tuple(r) for r in connected_components_incremental(old, delta).collect()
    )
    assert got == [(2, 2), (4, 2), (6, 6)]


def test_cc_incremental_bridges_two_old_components(spark):
    """One delta edge through a new node must merge two stored
    components and relabel every member to the global min."""
    from rat_strain_loader_pipeline_spark.operators.dedup import (
        connected_components_incremental,
    )

    old = spark.createDataFrame(
        [(2, 2), (4, 2), (6, 6), (8, 6), (10, 10)],
        "node_id long, component_id long",
    )
    # new node 5 touches both components; new nodes 7,9 pair up alone
    delta = spark.createDataFrame(
        [(5, 4), (5, 8), (7, 9)], "id_a long, id_b long"
    )
    got = sorted(
        tuple(r) for r in connected_components_incremental(old, delta).collect()
    )
    assert got == [
        (2, 2), (4, 2), (5, 2), (6, 2), (7, 7), (8, 2), (9, 7), (10, 10)
    ]
