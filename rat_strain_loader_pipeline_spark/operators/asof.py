"""As-of (temporal point-in-time) join.

Joins each left row to the latest right row with ``right.ts <= left.ts``
within the same key group — the standard point-in-time enrichment of a
training-data/event pipeline (attach the most recent profile snapshot,
price tick, or preceding interaction to each observation) that plain
equi-joins cannot express and naive range joins explode into
O(left x right) per key.

Spark-first shape: NO range join and NO per-key collect. Both sides are
union-tagged and sorted once per key group — a single hash shuffle on
the join keys, then one window pass where ``last(payload, ignorenulls)``
carries the most recent right payload forward onto each left row. Cost
is sort-merge-like: one shuffle + one in-partition sort, independent of
time-gap density (a 100 TB event table with hot keys salts or AQE-skews
the same way any keyed window does).

Determinism: rows ordering inside a key is (ts, side, tiebreak) — right
rows at the same timestamp sort before the left row (at-or-before
semantics) and ties among right rows resolve to the HIGHEST tiebreak
value, so results are exact and engine-reproducible, matching a
``ORDER BY ts DESC, tiebreak DESC LIMIT 1`` lateral oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    payload: dict[str, str],
    tiebreak: str,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: the nearest right row at-or-before (``backward``,
    default) or at-or-after (``forward``) each left row's ts per key.

    ``payload`` maps right column -> output column name (names must not
    collide with left's columns). ``tiebreak`` is a right column that
    makes equal-timestamp matches deterministic (backward: max wins;
    forward: min wins — the mirror image, so both directions match a
    ``ORDER BY ts [DESC|ASC], tiebreak [DESC|ASC] LIMIT 1`` lateral
    oracle). Left rows with no match keep NULL payload (left-join
    semantics). Forward mode is the same single-shuffle window pass with
    the sort order reversed — not a second algorithm.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    left_cols = left.columns
    out_cols = list(payload.values())
    clash = set(out_cols) & set(left_cols)
    if clash:
        raise ValueError(f"payload output names collide with left columns: {sorted(clash)}")

    # SQL lateral semantics for NULLs: a NULL ts or NULL join key never
    # matches (`r.ts <= l.ts` / `r.key = l.key` are never true). Window
    # partitioning WOULD group NULL keys together and NULLS FIRST/LAST
    # ordering WOULD let a NULL-ts right row shadow real matches, so
    # drop such right rows up front; NULL-ts left rows get their match
    # nulled at the end.
    for c in [ts_col, *on]:
        right = right.filter(F.col(c).isNotNull())

    l_tagged = left.select(
        *left_cols,
        F.lit(1).alias("__side"),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("__tb"),
        *[F.lit(None).cast(right.schema[src].dataType).alias(dst) for src, dst in payload.items()],
    )
    r_tagged = right.select(
        *[F.col(c) if c in (on + [ts_col]) else F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols],
        F.lit(0).alias("__side"),
        F.col(tiebreak).alias("__tb"),
        *[F.col(src).alias(dst) for src, dst in payload.items()],
    )
    # right rows sort before left at equal ts (at-or-before / at-or-
    # after), and among right rows the winning tiebreak lands nearest
    # the left row, so last(ignorenulls) picks exactly the lateral-
    # oracle match. Forward mode reverses ts and tiebreak order (the
    # nearest FOLLOWING right is the last one seen scanning backward).
    # The payload travels as ONE struct (NULL on left rows): carrying
    # fields independently would stitch values from DIFFERENT right
    # rows whenever a payload field is NULL on the matched row.
    if direction == "backward":
        order = [F.col(ts_col).asc(), F.col("__side").asc(), F.col("__tb").asc_nulls_first()]
    else:
        order = [F.col(ts_col).desc(), F.col("__side").asc(), F.col("__tb").desc_nulls_first()]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bundle = F.when(
        F.col("__side") == 0, F.struct(*[F.col(dst) for dst in out_cols])
    )
    carried = r_tagged.unionByName(l_tagged).select(
        *left_cols,
        "__side",
        F.last(bundle, ignorenulls=True).over(w).alias("__match"),
    )
    match = F.when(F.col(ts_col).isNotNull(), F.col("__match"))
    return carried.filter(F.col("__side") == 1).select(
        *left_cols, *[match.getField(dst).alias(dst) for dst in out_cols]
    )
