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
