"""Common Format 2 TSV source/sink (S1 / K4).

16-column TSV, one allele per row, ``#`` comment lines, plain or
``.txt.gz`` (VariantLoad3.java:192-207; writer
convert/CommonFormat2Writer.java:36-102 — header once, optional gzip,
one output file per strain).

Spark: a plain csv read — gzip is transparent, comment lines dropped by
option, schema fixed. The per-strain file fan-out of the reference
becomes ``partitionBy('strain')`` on write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rat_strain_loader_pipeline_spark.schemas import CF2_SCHEMA


def read_cf2(spark: SparkSession, path: str) -> DataFrame:
    """Read CF2 TSV (plain or gz). '' parsed as NULL like the reference's
    ``Utils.NVL`` handling of empty columns."""
    return (
        spark.read.schema(CF2_SCHEMA)
        .options(
            sep="\t",
            comment="#",
            header="false",
            emptyValue=None,
            nullValue="",
            mode="PERMISSIVE",
        )
        .csv(path)
    )


def write_cf2(
    df: DataFrame,
    path: str,
    partition_by_strain: bool = False,
    compression: str = "gzip",
) -> None:
    """Write CF2 TSV. With ``partition_by_strain`` emits one directory per
    strain (the reference keeps one open writer per strain,
    VcfToCommonFormat2Converter.java:393-405)."""
    cols = [f.name for f in CF2_SCHEMA.fields]
    out = df.select(*(c for c in df.columns if c in cols or c == "strain"))
    writer = out.write.mode("overwrite").options(sep="\t", compression=compression, emptyValue="", nullValue="")
    if partition_by_strain and "strain" in out.columns:
        writer = writer.partitionBy("strain")
    writer.csv(path)


def cf2_from_rows(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    """Literal-rows constructor for tests/fixtures."""
    return spark.createDataFrame(rows, schema=CF2_SCHEMA)
