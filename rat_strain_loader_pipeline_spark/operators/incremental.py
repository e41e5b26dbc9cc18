"""Incremental materialized-rollup maintenance.

A 100 TB rollup is never recomputed from scratch: the stored aggregate
(one row per group, with MERGEABLE measures — counts, sums, mins,
maxes) absorbs each delta batch by (a) aggregating the delta alone and
(b) full-outer-merging the two group tables with coalesced combines.
Cost is O(delta + touched groups), independent of base size; that
independence is the entire point of keeping the rollup.

Only decomposable measures qualify (count/sum/min/max here; avg as
sum/count at read time). Non-decomposable measures (exact median,
exact distinct) need their own sketch state — see the approx_* queries
for the sketch contracts.

The maintained result must be INDISTINGUISHABLE from a from-scratch
group-by over base+delta — that equality is what the DuckDB oracle
(which recomputes from scratch) checks value-exact, and what
``merge_rollup``'s full-outer + coalesce structure guarantees,
including groups present on only one side.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICROS = 1_000_000

# measure name -> (per-row column builder applied pre-agg is caller's
# job; combine function for the merge)
_COMBINE = {
    "sum": lambda a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)),
    "min": F.least,
    "max": F.greatest,
}


def rollup_events(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """The rollup measures for the events table: row count plus
    null/NaN-guarded micro-unit value sum/min/max (the repo's numeric
    policy — bigint micro-units, order-free sums)."""
    vq = F.when(
        F.col("value").isNotNull() & ~F.isnan(F.col("value")),
        F.floor(F.col("value") * MICROS).cast("long"),
    )
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(vq).alias("sum_value_q"),
        F.min(vq).alias("min_value_q"),
        F.max(vq).alias("max_value_q"),
    )


def merge_rollup(
    base: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    sums: Sequence[str] = ("n_events",),
    mins: Sequence[str] = (),
    maxs: Sequence[str] = (),
    nullable_sums: Sequence[str] = (),
) -> DataFrame:
    """Full-outer merge of two group tables with coalesced combines.

    ``sums`` are never-null counters (absent group = 0); a
    ``nullable_sums`` measure stays NULL only when both sides are NULL
    (a SQL ``sum`` over all-null input), matching the from-scratch
    aggregate exactly. ``mins``/``maxs`` use least/greatest, whose
    null-skipping matches min/max over a union of the groups' rows.
    """
    b = base.alias("b")
    d = delta.alias("d")
    cond = None
    for k in keys:
        eq = F.col(f"b.{k}").eqNullSafe(F.col(f"d.{k}"))
        cond = eq if cond is None else cond & eq
    joined = b.join(d, cond, "full_outer")
    out_cols = [
        F.coalesce(F.col(f"b.{k}"), F.col(f"d.{k}")).alias(k) for k in keys
    ]
    for c in sums:
        out_cols.append(
            (_COMBINE["sum"](F.col(f"b.{c}"), F.col(f"d.{c}"))).alias(c)
        )
    for c in nullable_sums:
        out_cols.append(
            F.when(
                F.col(f"b.{c}").isNull() & F.col(f"d.{c}").isNull(), F.lit(None)
            )
            .otherwise(_COMBINE["sum"](F.col(f"b.{c}"), F.col(f"d.{c}")))
            .cast("long")
            .alias(c)
        )
    for c in mins:
        out_cols.append(F.least(F.col(f"b.{c}"), F.col(f"d.{c}")).alias(c))
    for c in maxs:
        out_cols.append(F.greatest(F.col(f"b.{c}"), F.col(f"d.{c}")).alias(c))
    return joined.select(*out_cols)


def maintain_events_rollup(
    events: DataFrame, keys: Sequence[str], delta_pred
) -> DataFrame:
    """Split ``events`` into base (NOT delta_pred) and delta, stage the
    base rollup to parquet (the stored MV — in production it already
    exists; staging makes the maintained path visible in the plan: the
    final merge scans the stage, never re-aggregating base rows), then
    absorb the delta. Result == from-scratch rollup over all events."""
    from rat_strain_loader_pipeline_spark.staging import stage_to_parquet

    base_agg = stage_to_parquet(
        rollup_events(events.filter(~delta_pred), keys), "rollup-base"
    )
    delta_agg = rollup_events(events.filter(delta_pred), keys)
    return merge_rollup(
        base_agg,
        delta_agg,
        keys,
        sums=("n_events",),
        nullable_sums=("sum_value_q",),
        mins=("min_value_q",),
        maxs=("max_value_q",),
    )


def retract_events_rollup(
    events: DataFrame, keys: Sequence[str], delete_pred
) -> DataFrame:
    """Deletion propagation into the maintained rollup (the
    right-to-be-forgotten path): rows matching ``delete_pred`` leave
    the store, and the rollup downdates WITHOUT a full recompute.
    Counts/sums are group-retractable by pure subtraction, but min/max
    are NOT downdatable from the aggregate alone (the deleted row may
    BE the extreme), so touched groups — and only touched groups —
    re-aggregate from their surviving rows (which also yields their
    n/sum, so no separate subtraction pass is needed for this measure
    set; a sums-only rollup would skip the survivor scan entirely and
    just merge a negated delta). Untouched groups keep their stored MV
    row verbatim — the left_anti + union makes that visible in the
    plan. Cost: O(deleted + touched groups' surviving rows),
    independent of base size.

    Result must equal the from-scratch rollup over surviving rows —
    the oracle's check. Groups whose every row is deleted disappear.
    """
    from rat_strain_loader_pipeline_spark.staging import stage_to_parquet

    keys = list(keys)
    base_mv = stage_to_parquet(rollup_events(events, keys), "rollup-mv")
    touched = events.filter(delete_pred).select(*keys).distinct()
    # min/max force a re-aggregation over SURVIVING rows, touched
    # groups only
    survivors_touched = events.filter(~delete_pred).join(
        F.broadcast(touched), keys
    )
    fresh_touched = rollup_events(survivors_touched, keys)
    untouched = base_mv.join(F.broadcast(touched), keys, "left_anti")
    return untouched.unionByName(fresh_touched)
