"""Data-quality profiling and constraint checking (Deequ-style).

The admission gate a 100 TB ingest runs before data reaches training
or the warehouse: per-column completeness, cardinality, and range
stats, plus pass/fail verdicts against declared constraints. ONE scan
computes every column's stats as parallel aggregates (Catalyst fuses
them into a single partial-agg pass); the profile table is
columns-sized, so the constraint evaluation is free.

Numeric mins/maxes are reported in micro-unit bigints (the repo's
numeric policy). Exact count(DISTINCT) per column expands the agg —
fine for a profile run; a continuous monitor swaps in
approx_count_distinct (the pinned-contract swap q_approx_distinct
exercises).

Constraints supported per column: ``max_null_frac`` (completeness,
evaluated as n_null * DENOM <= frac_micros * n — pure integer, no
float division), ``min_q``/``max_q`` (value range, micro-units),
``unique`` (n_distinct + n_null == n: every non-null value distinct).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICROS = 1_000_000


def profile_columns(
    df: DataFrame,
    cols: Sequence[str],
    constraints: Mapping[str, Mapping[str, int]] | None = None,
) -> DataFrame:
    """One row per profiled column: (col, n, n_null, n_distinct,
    min_q, max_q, passed). Numeric columns report floor(x * 1e6)
    min/max; non-numeric report NULL there. ``constraints`` maps
    column -> {max_null_frac_micros | min_q | max_q | unique}."""
    constraints = constraints or {}
    numeric = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in ("long", "integer", "double", "float", "short")
    }
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__null"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__dist"))
        if c in numeric:
            q = F.floor(F.col(c).cast("double") * MICROS).cast("long")
            aggs.append(F.min(q).alias(f"{c}__min"))
            aggs.append(F.max(q).alias(f"{c}__max"))
    from rat_strain_loader_pipeline_spark.staging import stage_to_parquet

    # stage the 1-row stats so the per-column unpivot selects below
    # scan one tiny parquet instead of re-running the corpus agg per
    # column
    stats = stage_to_parquet(df.agg(*aggs), "profile-stats")

    rows = []
    for c in cols:
        spec = constraints.get(c, {})
        checks = []
        if "max_null_frac_micros" in spec:
            checks.append(
                F.col(f"{c}__null") * MICROS
                <= F.lit(int(spec["max_null_frac_micros"])) * F.col("n")
            )
        if spec.get("unique"):
            checks.append(F.col(f"{c}__dist") + F.col(f"{c}__null") == F.col("n"))
        if "min_q" in spec:
            checks.append(F.col(f"{c}__min") >= F.lit(int(spec["min_q"])))
        if "max_q" in spec:
            checks.append(F.col(f"{c}__max") <= F.lit(int(spec["max_q"])))
        passed = F.lit(True)
        for ch in checks:
            passed = passed & ch
        rows.append(
            stats.select(
                F.lit(c).alias("col"),
                F.col("n"),
                F.col(f"{c}__null").alias("n_null"),
                F.col(f"{c}__dist").alias("n_distinct"),
                (
                    F.col(f"{c}__min") if c in numeric else F.lit(None).cast("long")
                ).alias("min_q"),
                (
                    F.col(f"{c}__max") if c in numeric else F.lit(None).cast("long")
                ).alias("max_q"),
                passed.alias("passed"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
