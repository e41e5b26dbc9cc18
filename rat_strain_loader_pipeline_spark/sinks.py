"""JDBC sink (K1/K2/K3 in SURVEY.md §2.2) — the optional relational leg
of the Parquet-canonical store.

The reference lands every table through Spring ``BatchSqlUpdate`` with
hard-won batch sizes (10 000 for variant/VT/polyphen, 50 000 for
conservation, 5 000 for the conditional RGD_IDS insert —
VariantTranscriptBatch.java:26, VariantProcessingBase.java:231,246,262,
ConservationScoreLoader.java:152, VariantProcessingBase.java:387), and
brackets bulk loads with index/constraint toggles
(VariantProcessingBase.java:86-157: ALTER INDEX ... UNUSABLE → load →
ALTER INDEX ... REBUILD PARALLEL NOCOMPRESS NOLOGGING).

Spark-first:
- appends go through ``df.write.jdbc`` with ``batchsize`` (each executor
  task opens its own connection — writes parallelize across partitions;
  ``numPartitions`` caps connection count against the DB);
- there is no MERGE in DataFrameWriter, so upserts stage into a
  ``<table>_stage`` table and run ONE server-side MERGE — the SQL is
  generated here and testable without a database;
- index/constraint brackets are generated as plain SQL for the caller's
  connection (executed via JDBC outside Spark — the Oracle-specific
  ALTER INDEX forms have no embedded-DB twin, so they stay caller-side).

The append / staged-MERGE / partitioned-scan legs run live against
embedded Apache Derby (bundled with PySpark) in
tests/test_jdbc_derby.py — the MERGE executes server-side, not just
string-checked.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

# Reference batch sizes (see module docstring for citations).
DEFAULT_BATCH_SIZE = 10_000
CONSERVATION_BATCH_SIZE = 50_000
RGD_IDS_BATCH_SIZE = 5_000


@dataclass
class JdbcTarget:
    url: str
    table: str
    properties: dict[str, str] = field(default_factory=dict)


def jdbc_append(
    df: DataFrame,
    target: JdbcTarget,
    batchsize: int = DEFAULT_BATCH_SIZE,
    num_partitions: int | None = None,
) -> None:
    """K1 batched INSERT: parallel per-partition appends.

    ``num_partitions`` bounds concurrent connections (reference loads
    ran 2-way parallel per shell stage; a 1000-executor cluster needs
    an explicit cap or it will open 1000 connections).
    """
    out = df.repartition(num_partitions) if num_partitions else df
    (
        out.write.mode("append")
        .option("batchsize", str(batchsize))
        .jdbc(target.url, target.table, properties=target.properties)
    )


def stage_table_name(table: str) -> str:
    return f"{table}_stage"


def merge_sql(
    table: str,
    key_cols: list[str],
    update_cols: list[str],
    insert_cols: list[str],
    stage: str | None = None,
) -> str:
    """K3/J4 server-side MERGE from the staged batch into ``table``.

    Replaces both the reference's batched UPDATE
    (VariantProcessingBase.java:277-294) and the conditional
    INSERT ... WHERE NOT EXISTS (:396-405): one statement, one scan of
    the stage, executed after ``jdbc_append`` into the stage table.
    """
    stage = stage or stage_table_name(table)
    on = " AND ".join(f"t.{c} = s.{c}" for c in key_cols)
    sets = ", ".join(f"t.{c} = s.{c}" for c in update_cols)
    ins_cols = ", ".join(insert_cols)
    ins_vals = ", ".join(f"s.{c}" for c in insert_cols)
    parts = [f"MERGE INTO {table} t USING {stage} s ON ({on})"]
    if update_cols:
        parts.append(f"WHEN MATCHED THEN UPDATE SET {sets}")
    parts.append(f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})")
    return "\n".join(parts)


def jdbc_upsert_via_staging(
    df: DataFrame,
    target: JdbcTarget,
    key_cols: list[str],
    update_cols: list[str] | None = None,
    batchsize: int = DEFAULT_BATCH_SIZE,
    num_partitions: int | None = None,
) -> str:
    """Stage the batch then return the MERGE statement to run.

    Two steps by design: Spark parallel-appends into ``<table>_stage``;
    the caller executes the returned MERGE on its own connection (one
    transactional statement server-side, like the reference's
    staging-table flows). Columns default to all non-key columns.
    """
    cols = df.columns
    update_cols = [c for c in cols if c not in key_cols] if update_cols is None else update_cols
    stage = stage_table_name(target.table)
    jdbc_append(df, JdbcTarget(target.url, stage, target.properties), batchsize, num_partitions)
    return merge_sql(target.table, key_cols, update_cols, cols, stage=stage)


def jdbc_scan_options(
    target: JdbcTarget,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = DEFAULT_BATCH_SIZE,
) -> dict[str, str]:
    """S7/S8 partitioned JDBC scan options for ``spark.read.jdbc``.

    The reference parallelizes DB reads by randomized row order
    (``ORDER BY dbms_random.value``, ClinVar2Vcf.java:81-88) — a
    load-balance hack obsoleted by range-partitioned scans: Spark
    splits ``partition_column`` into ``num_partitions`` ranges and each
    task reads its slice with pushdown. Returns the option dict
    (testable without a driver); feed to
    ``spark.read.options(**opts).format("jdbc").load()``.
    """
    opts = {
        "url": target.url,
        "dbtable": target.table,
        "fetchsize": str(fetchsize),
        **target.properties,
    }
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError("partitioned scan needs lower/upper bounds and num_partitions")
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def bulk_load_bracket_sql(
    table: str, index_names: list[str], fk_constraint_names: list[str]
) -> tuple[list[str], list[str]]:
    """Pre/post statement lists for a bulk load
    (VariantProcessingBase.java:86-157): disable indexes + FK
    constraints before, rebuild parallel + re-enable after."""
    pre = [f"ALTER INDEX {ix} UNUSABLE" for ix in index_names] + [
        f"ALTER TABLE {table} DISABLE CONSTRAINT {c}" for c in fk_constraint_names
    ]
    post = [
        f"ALTER INDEX {ix} REBUILD PARALLEL NOCOMPRESS NOLOGGING" for ix in index_names
    ] + [f"ALTER TABLE {table} ENABLE CONSTRAINT {c}" for c in fk_constraint_names]
    return pre, post
