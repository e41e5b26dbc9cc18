"""JSONL document ingest with a quarantine lane.

The newline-delimited-JSON corpus drop is the most common raw landing
format a training-data pipeline ingests (alongside the reference's
TSV/VCF line formats — same shape: one record per line, schema known,
dirty lines expected; cf. `VcfToCommonFormat2Converter.java:161-223`'s
per-line parse-and-skip). Spark's native JSON reader already does the
hard part distributively; the operator's job is the CONTRACT:

- explicit schema (never inferSchema — a schema-inference pass is a
  full extra scan at 100 TB and type-drifts under dirty data),
- PERMISSIVE mode with a named corrupt-record column, so malformed
  lines land in a quarantine lane instead of killing the job or being
  silently dropped (FAILFAST/DROPMALFORMED respectively),
- the caller splits the stream on ``is_quarantined`` and audits both.

100 TB shape: one parallel line-split scan (JSON text splits on line
boundaries like CSV/TSV), schema projection pushed to the parser;
quarantined rows carry only the raw line, so the bad lane costs
nothing extra to move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt"


def read_jsonl_with_quarantine(
    spark: SparkSession, path: str, schema_ddl: str
) -> DataFrame:
    """Read JSONL at ``path`` against ``schema_ddl`` (not including the
    corrupt column), adding ``is_quarantined`` + the raw line for bad
    records. PERMISSIVE corrupt-record capture requires the corrupt
    column to be part of the read schema."""
    full = f"{schema_ddl}, {CORRUPT_COL} string"
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    return df.withColumn(
        "is_quarantined", F.col(CORRUPT_COL).isNotNull()
    )
