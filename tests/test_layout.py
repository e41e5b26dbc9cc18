"""Z-order layout: Morton math, determinism, and the reason it exists
(two-column pruning beats a single-column sort)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_morton_interleave_known_values(spark):
    from rat_strain_loader_pipeline_spark.operators.layout import morton_interleave

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255)], "bx long, by long"
    )
    got = [
        r[0]
        for r in df.select(
            morton_interleave(F.col("bx"), F.col("by"), 8)
        ).collect()
    ]

    def ref(x, y):
        z = 0
        for j in range(8):
            z |= ((x >> j) & 1) << (2 * j)
            z |= ((y >> j) & 1) << (2 * j + 1)
        return z

    assert got == [ref(x, y) for x, y in [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255)]]
    assert got[-1] == (1 << 16) - 1


def test_zorder_partition_invariant_and_counts_balanced(spark, sf_dir):
    from rat_strain_loader_pipeline_spark.operators.layout import zorder_file_stats
    from rat_strain_loader_pipeline_spark.sources.tables import read_table

    li = read_table(spark, sf_dir, "lineitem")
    kw = dict(tiebreak=["l_partkey", "l_suppkey"], bits=8, n_files=16, block_shift=10)
    a = sorted(
        tuple(r)
        for r in zorder_file_stats(
            li.coalesce(1), "l_partkey", "l_suppkey", **kw
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in zorder_file_stats(
            li.repartition(13, F.col("l_orderkey") % 7), "l_partkey", "l_suppkey", **kw
        ).collect()
    )
    assert a == b
    n = li.count()
    counts = [t[1] for t in a]
    # equal-count cut: every file holds floor(n/16) or ceil(n/16) rows
    assert sum(counts) == n
    assert max(counts) - min(counts) <= 1


def test_zorder_prunes_both_dimensions_better_than_x_sort(spark, sf_dir):
    """The box predicate constrains x AND y; a layout sorted by x only
    cannot skip files on y, so its overlap count is at least the
    z-order layout's. (On this data z-order strictly wins.)"""
    from rat_strain_loader_pipeline_spark.operators.layout import zorder_file_stats
    from rat_strain_loader_pipeline_spark.sources.tables import read_table
    from pyspark.sql.window import Window

    li = read_table(spark, sf_dir, "lineitem")
    z = zorder_file_stats(
        li, "l_partkey", "l_suppkey",
        tiebreak=["l_partkey", "l_suppkey"], bits=8, n_files=16, block_shift=10,
    )
    z_overlap = z.filter("box_overlap").count()

    # x-sorted strawman: same equal-count cut, ordered by x alone
    bounds = li.agg(
        F.min("l_partkey").alias("mnx"), F.max("l_partkey").alias("mxx"),
        F.min("l_suppkey").alias("mny"), F.max("l_suppkey").alias("mxy"),
        F.count(F.lit(1)).alias("n"),
    )
    rk = F.row_number().over(Window.orderBy("l_partkey", "l_suppkey")) - 1
    xs = (
        li.select("l_partkey", "l_suppkey")
        .withColumn("rk", rk)
        .crossJoin(F.broadcast(bounds))
        .withColumn("file_id", F.expr("(rk * 16) div n"))
        .groupBy("file_id")
        .agg(
            F.min("l_partkey").alias("min_x"), F.max("l_partkey").alias("max_x"),
            F.min("l_suppkey").alias("min_y"), F.max("l_suppkey").alias("max_y"),
        )
        .crossJoin(F.broadcast(bounds))
        .filter(
            "NOT (max_x < mnx + (mxx - mnx) div 4 OR min_x > mnx + (mxx - mnx) div 2 "
            "OR max_y < mny + (mxy - mny) div 4 OR min_y > mny + (mxy - mny) div 2)"
        )
    )
    x_overlap = xs.count()
    assert z_overlap <= x_overlap
    assert z_overlap < 16  # the layout actually prunes something
