"""Parquet table loading with schema quirks handled.

``read_table`` is the engine's canonical parquet scan. One quirk in the
driver testdata: ``events.ts`` is TIMESTAMP(NANOS), which Spark's
vectorized parquet reader rejects by default. We flip the session conf
``spark.sql.legacy.parquet.nanosAsLong`` and convert nanos → micros
timestamp ourselves, so callers always see a proper TimestampType.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        # events.ts is TIMESTAMP(NANOS); set proactively so the first read
        # attempt doesn't fail a task (works on any session, incl. the
        # driver's default-configured one)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)

    if name == "events":
        ts_field = df.schema["ts"] if "ts" in df.columns else None
        if ts_field is not None and isinstance(ts_field.dataType, LongType):
            # nanos-as-long → microsecond timestamp (truncation == DuckDB's)
            df = df.withColumn("ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long")))
    return df
