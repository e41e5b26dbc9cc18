"""Z-order (Morton-curve) data layout for multi-dimensional skipping.

The layout step a 100 TB table runs so that BOTH of two filter columns
prune files (Delta/Iceberg ``OPTIMIZE ZORDER BY``): quantize each
dimension to ``bits`` levels, interleave the bits into a Morton code,
and cut the z-ordered corpus into equal-count files. Files then hold
small axis-aligned boxes in (x, y) space, so a box predicate's
min/max-stats pruning skips most files on either column — a single-
column sort gives that for one dimension only.

Engine-reproducible by construction: binning is non-negative integer
``div`` against exact min/max bounds (truncation == floor in every
engine), the Morton code is an unrolled bit-interleave polynomial, and
the file id comes from the exact global z-rank. The rank is computed
WITHOUT a global sort: coarse z-ranges (``z >> block_shift``) are
already ordered, so rank = per-block row_number + block offsets from a
cumsum over the tiny block-count table (the shard_by_bytes two-level
pattern) — the only unpartitioned window runs over <= 2^(2*bits -
block_shift) block rows.

The emitted per-file min/max stats + box-overlap booleans ARE the
product: they're exactly what a scan planner consults, so the overlap
column measures pruning effectiveness directly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def morton_interleave(bx: Column, by: Column, bits: int) -> Column:
    """z = interleave(bx, by): bit j of bx lands at 2j, of by at 2j+1."""
    z = F.lit(0).cast("long")
    for j in range(bits):
        z = z + F.shiftright(bx, j).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * j))
        z = z + F.shiftright(by, j).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * j + 1))
    return z


def morton_interleave_sql(bx: str, by: str, bits: int) -> str:
    """The identical polynomial as SQL text — the single source the
    DuckDB oracle interpolates, so both sides move together."""
    terms = []
    for j in range(bits):
        terms.append(f"((({bx}) >> {j}) & 1) * {1 << (2 * j)}")
        terms.append(f"((({by}) >> {j}) & 1) * {1 << (2 * j + 1)}")
    return "(" + " + ".join(terms) + ")"


def zorder_file_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    tiebreak: list[str],
    bits: int = 8,
    n_files: int = 64,
    block_shift: int = 10,
) -> DataFrame:
    """Cut ``df`` into ``n_files`` equal-count files in z order and
    emit each file's planner stats: (file_id, n_rows, min_x, max_x,
    min_y, max_y, box_overlap). The probe box is the quarter-to-half
    span of each dimension (integer div of the exact bounds, so it is
    sf-independent and engine-portable); ``box_overlap`` is the
    planner's interval test — FALSE means a scan for that box skips
    the file entirely.

    ``tiebreak`` must extend (z,) to a total order on the stats
    columns (equal-key rows are interchangeable for per-file stats,
    so richer ties beyond x/y are unnecessary).
    """
    bounds = df.agg(
        F.min(x_col).alias("mnx"),
        F.max(x_col).alias("mxx"),
        F.min(y_col).alias("mny"),
        F.max(y_col).alias("mxy"),
        F.count(F.lit(1)).alias("n"),
    )
    t = df.crossJoin(F.broadcast(bounds))
    lv = 1 << bits
    bx = F.expr(f"(({x_col} - mnx) * {lv}) div (mxx - mnx + 1)").cast("long")
    by = F.expr(f"(({y_col} - mny) * {lv}) div (mxy - mny + 1)").cast("long")
    t = t.withColumn("__z", morton_interleave(bx, by, bits)).withColumn(
        "__blk", F.shiftright(F.col("__z"), block_shift)
    )
    w_in = Window.partitionBy("__blk").orderBy("__z", *tiebreak)
    blks = t.groupBy("__blk").agg(F.count(F.lit(1)).alias("__bc"))
    w_off = Window.orderBy("__blk").rowsBetween(Window.unboundedPreceding, -1)
    offs = blks.select(
        "__blk", F.coalesce(F.sum("__bc").over(w_off), F.lit(0)).alias("__boff")
    )
    ranked = (
        t.withColumn("__rn", F.row_number().over(w_in))
        .join(F.broadcast(offs), "__blk")
        .withColumn(
            "file_id",
            F.expr(f"((__boff + __rn - 1) * {int(n_files)}) div n").cast("long"),
        )
    )
    stats = ranked.groupBy("file_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(x_col).alias("min_x"),
        F.max(x_col).alias("max_x"),
        F.min(y_col).alias("min_y"),
        F.max(y_col).alias("max_y"),
    )
    boxed = stats.crossJoin(F.broadcast(bounds)).selectExpr(
        "file_id",
        "n_rows",
        "min_x",
        "max_x",
        "min_y",
        "max_y",
        "NOT (max_x < mnx + (mxx - mnx) div 4 OR min_x > mnx + (mxx - mnx) div 2 "
        "OR max_y < mny + (mxy - mny) div 4 OR min_y > mny + (mxy - mny) div 2) "
        "AS box_overlap",
    )
    return boxed
