"""Wiggle fixedStep source (S5) — the stateful parse.

Format (ConservationScoreLoader.java:100-140): a declaration line
``fixedStep chrom=chr1 start=3462 step=1`` resets the cursor; each
following data line is the score at ``pos``, then ``pos += step``.
Line meaning depends on arbitrarily-distant earlier lines, which breaks
naive partition independence.

Spark-first plan (SURVEY.md §4.2): read with ``spark.read.text``
preserving per-file order, tag declaration rows, propagate the current
``(chrom, start, step, decl_id)`` with ``last(..., ignorenulls=True)``
over a window ordered by line offset within the file, then compute
``position = start + step * (row_number within block - 1)``.

Scale note: one window pass per file. Conservation wigs ship as one
file per chromosome, so parallelism = #files — the same unit the
reference uses (one loader process per chromosome). For a single
monster file, split upstream or fall back to a mapPartitions
cursor-carry; not needed for the reference workload.

Chromosome names longer than 2 chars after stripping 'chr' (scaffolds)
are rejected, matching the loader's guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rat_strain_loader_pipeline_spark.schemas import CONSERVATION_SCHEMA


def read_fixedstep_wig(spark: SparkSession, path: str) -> DataFrame:
    """Parse fixedStep wiggle file(s) → (position long, chr string, score double)."""
    # wholetext guarantees exact line order (split offsets can be
    # bin-packed out of order otherwise); parallelism = #files, the same
    # unit as the reference's per-chromosome loader processes.
    lines = (
        spark.read.text(path, wholetext=True)
        .select(F.input_file_name().alias("__file"), F.col("value"))
        .select(
            "__file",
            F.posexplode(F.split(F.col("value"), "\r?\n")).alias("__line_id", "value"),
        )
        .filter(F.col("value") != "")
    )
    return parse_fixedstep_lines(lines)


def parse_fixedstep_lines(lines: DataFrame) -> DataFrame:
    """The stateful parse on pre-split lines.

    ``lines``: (__file string, __line_id long-sortable, value string) —
    __line_id orders lines within a file. Factored out of
    ``read_fixedstep_wig`` so any line source (files, a staged table, a
    stream batch) feeds the same window machinery.
    """
    is_decl = F.col("value").startswith("fixedStep")
    parsed = lines.withColumn(
        "__decl_chrom",
        F.when(is_decl, F.regexp_extract("value", r"chrom=(\S+)", 1)),
    ).withColumn(
        "__decl_start",
        F.when(is_decl, F.regexp_extract("value", r"start=(\d+)", 1).cast("long")),
    ).withColumn(
        "__decl_step",
        F.when(is_decl, F.coalesce(F.regexp_extract("value", r"step=(\d+)", 1).cast("long"), F.lit(1))),
    ).withColumn(
        "__decl_id", F.when(is_decl, F.col("__line_id"))
    )

    w = Window.partitionBy("__file").orderBy("__line_id").rowsBetween(Window.unboundedPreceding, 0)
    filled = (
        parsed.withColumn("chrom", F.last("__decl_chrom", ignorenulls=True).over(w))
        .withColumn("start", F.last("__decl_start", ignorenulls=True).over(w))
        .withColumn("step", F.last("__decl_step", ignorenulls=True).over(w))
        .withColumn("block", F.last("__decl_id", ignorenulls=True).over(w))
    )

    wb = Window.partitionBy("__file", "block").orderBy("__line_id")
    data = (
        filled.filter(~is_decl & F.col("block").isNotNull())
        .withColumn("__row_in_block", F.row_number().over(wb))
        .withColumn("position", F.col("start") + F.col("step") * (F.col("__row_in_block") - 1))
        .withColumn("chr", _normalize_wig_chrom(F.col("chrom")))
        .withColumn("score", F.col("value").cast("double"))
        .filter(F.col("chr").isNotNull() & F.col("score").isNotNull())
        .select("position", "chr", "score")
    )
    return data


def _normalize_wig_chrom(chrom):
    c = F.regexp_replace(chrom, "^chr", "")
    c = F.when(c == "M", F.lit("MT")).otherwise(c)
    return F.when((F.length(c) > 2) | (c == ""), F.lit(None).cast("string")).otherwise(c)


def conservation_from_rows(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    return spark.createDataFrame(rows, schema=CONSERVATION_SCHEMA)
