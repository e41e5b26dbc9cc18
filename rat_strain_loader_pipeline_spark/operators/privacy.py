"""Privacy-preserving release operators.

Companions to ``text.redact_pii`` (which scrubs identifiers INSIDE a
document): these govern what a released dataset's METADATA can leak.
k-anonymity (Sweeney 2002) is the standard bar for quasi-identifier
columns — attributes that are individually harmless but jointly
identifying (language x source here; zip x birthdate x sex in the
classic case): every released combination must be shared by at least
k rows, and rarer combinations are generalized to '*'.

100 TB shape: one group-by over the quasi-identifier combination (a
partial-agg reduction; the combination table is tiny next to the
corpus) and one hash join back — no windows, no pairwise stage. The
suppression decision is a pure function of exact group counts, so a
DuckDB oracle replays it value-exact.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SUPPRESSED = "*"


def k_anonymize(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Suppress quasi-identifier combinations shared by fewer than
    ``k`` rows: qualifying rows keep their values, the rest release
    ``*`` in every quasi column. Emits (id_col, <quasi>_out...,
    group_n, suppressed) — group_n is the combination's exact size,
    the quantity the k-anonymity property is stated over."""
    counts = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("group_n"))
    joined = df.select(id_col, *quasi_cols).join(counts, list(quasi_cols))
    ok = F.col("group_n") >= k
    out_cols = [F.col(id_col)]
    for c in quasi_cols:
        out_cols.append(
            F.when(ok, F.col(c)).otherwise(F.lit(SUPPRESSED)).alias(f"{c}_out")
        )
    out_cols.append(F.col("group_n"))
    out_cols.append((~ok).alias("suppressed"))
    return joined.select(*out_cols)


def l_diversity_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    l: int,
) -> DataFrame:
    """l-diversity audit — the companion check k-anonymity alone
    misses: a group can be k-large yet expose its members through a
    HOMOGENEOUS sensitive attribute (every row in the group shares the
    value, so re-identification is unnecessary). Per quasi-identifier
    combination: exact group size, exact distinct-sensitive-value
    count, and the pass flag ``n_sensitive >= l``.

    One groupBy with a count-distinct — at scale the exact distinct
    runs as the standard two-phase (quasi..., sensitive) partial
    dedup + count, both map-side combinable; output is
    combination-table-sized. Returns (quasi..., group_n, n_sensitive,
    diverse).
    """
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("group_n"),
            F.countDistinct(sensitive_col).cast("long").alias("n_sensitive"),
        )
        .select(
            *quasi_cols,
            "group_n",
            "n_sensitive",
            (F.col("n_sensitive") >= l).alias("diverse"),
        )
    )

def t_closeness_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    t_micros: int,
) -> DataFrame:
    """t-closeness audit — the third rung of the privacy ladder after
    ``k_anonymize`` (group size) and ``l_diversity_audit`` (distinct
    sensitive values): each quasi-identifier group's SENSITIVE-value
    distribution must stay within distance t of the global one, or the
    group leaks (a group can be k-large and l-diverse yet 95% one
    disease). For a categorical sensitive attribute the distance is
    total variation, computed fraction-free:

        tv_num_g = Σ_s |n_gs·n − n_s·n_g|   (absent s contribute n_s·n_g)
        tv_q     = (tv_num_g · 1e6) div (2 · n_g · n)

    All products in DECIMAL(38,0) (n_s·n_g overflows bigint at corpus
    scale), every operand non-negative so trunc == floor both engines.
    The absent-sensitive term folds closed-form — tv_num_g =
    Σ_{s∈g} |n_gs·n − n_s·n_g| + n_g·(n − Σ_{s∈g} n_s) — so only
    PRESENT (group, sensitive) pairs are ever materialized.

    Shapes: one (quasi, sensitive)-grain partial agg; the global
    sensitive histogram and the 1-row total broadcast onto it; one
    quasi-grain reduce. Returns (quasi..., group_n, tv_q, close).
    """
    q = list(quasi_cols)
    pair = df.groupBy(*q, sensitive_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_gs")
    )
    glob = df.groupBy(sensitive_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_s")
    )
    total = df.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    from pyspark.sql.window import Window

    joined = (
        pair.join(F.broadcast(glob), sensitive_col)
        .crossJoin(F.broadcast(total))
        .withColumn(
            "n_g", F.sum("n_gs").over(Window.partitionBy(*q)).cast("long")
        )
    )
    g = joined.groupBy(*q).agg(
        F.max("n_g").alias("group_n"),
        F.sum("n_s").cast("long").alias("present_ns"),
        F.max("n_total").alias("n_total"),
        F.sum(
            F.abs(
                F.col("n_gs").cast("decimal(38,0)") * F.col("n_total")
                - F.col("n_s").cast("decimal(38,0)") * F.col("n_g")
            )
        ).alias("tv_present"),
    )
    return g.select(
        *q,
        "group_n",
        F.expr(
            "CAST(((tv_present"
            " + CAST(group_n AS DECIMAL(38,0)) * (n_total - present_ns))"
            " * 1000000)"
            " div (2 * CAST(group_n AS DECIMAL(38,0)) * n_total) AS BIGINT)"
        ).alias("tv_q"),
    ).withColumn("close", F.col("tv_q") <= F.lit(int(t_micros)))
