"""SQL front door: temp-view registration + spark.sql passthrough.

The reference exposes hard-coded tools; this engine additionally
exposes the full corpus as SQL — `register_tables` lands every test
table as a temp view (through `sources.tables.read_table`, so the
events nanos normalization applies) and `run_sql` is a thin
`spark.sql` passthrough. Any ANSI-ish query a reference user writes
against the store runs verbatim; Catalyst owns the plan (predicate
pushdown, join reordering, AQE) with zero engine code in the loop —
the point of being Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rat_strain_loader_pipeline_spark.sources.tables import read_table

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> None:
    """Create/replace one temp view per corpus table."""
    for t in tables:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(sql)
