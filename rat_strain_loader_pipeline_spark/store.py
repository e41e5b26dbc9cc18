"""Parquet-canonical variant store.

The reference's Oracle tables (SURVEY.md §1.2) become parquet table
directories under one root, partitioned to match the access patterns
the reference encodes procedurally:

- ``variant_map_data`` / ``variant_transcript`` / ``conservation``
  partition by ``(map_key, chromosome)`` — the reference runs one
  process per (mapKey, chr) and every post-processing/export query
  filters on both (VariantPostProcessing.java:157-286,
  Polyphen.java:135-355); under parquet those filters become partition
  PRUNING, scanning only the matching directories.
- ``variant_sample_detail`` partitions by ``sample_id`` — loads and
  the J5 anti-join are per-sample.
- ``variant`` (identity) has no placement columns by design (placement
  lives in variant_map_data, same as the reference schema) — unpartitioned.

Writes append (the reference's INSERT batches); recompute-style fixups
overwrite per-partition via ``overwrite_partitions`` with dynamic
partition overwrite, the Spark image of the reference's batched
UPDATE (K3) without rewriting untouched chromosomes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITIONING: dict[str, tuple[str, ...]] = {
    "variant": (),
    "variant_map_data": ("map_key", "chromosome"),
    "variant_sample_detail": ("sample_id",),
    "variant_transcript": ("map_key",),
    "conservation": ("chr",),
    "snp_eff": ("sample_id",),
    "polyphen": (),
    "sequences": (),
}


# canonical types for partition columns — parquet partition discovery
# type-infers directory values (chromosome=2 would come back as int
# while chromosome=X stays string); normalize on read
_PARTITION_TYPES = {
    "chromosome": "string",
    "chr": "string",
    "map_key": "int",
    "sample_id": "int",
}


def _path(root: str, table: str) -> str:
    return f"{root.rstrip('/')}/{table}"


def write_table(
    df: DataFrame, root: str, table: str, mode: str = "append"
) -> None:
    """Append ``df`` into the store with the table's canonical
    partitioning (columns not present are skipped, so projections of a
    table can still land)."""
    cols = [c for c in PARTITIONING.get(table, ()) if c in df.columns]
    w = df.write.mode(mode)
    if cols:
        w = w.partitionBy(*cols)
    w.parquet(_path(root, table))


def overwrite_partitions(df: DataFrame, root: str, table: str) -> None:
    """Replace ONLY the partitions present in ``df`` (dynamic partition
    overwrite) — the K3 recompute-and-overwrite sink for fixups: a
    chromosome's recomputed rows replace that chromosome's directory,
    every other partition's files are untouched."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    cols = [c for c in PARTITIONING.get(table, ()) if c in df.columns]
    if not cols:
        raise ValueError(f"table {table!r} has no partition columns to overwrite by")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*cols).parquet(_path(root, table))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_table(
    spark: SparkSession,
    root: str,
    table: str,
    map_key: int | None = None,
    chromosome: str | None = None,
    sample_id: int | None = None,
) -> DataFrame:
    """Read a store table; the keyword filters land on partition columns
    where the table has them, so they prune directories instead of
    scanning (F2 chromosome filter → partition pruning)."""
    df = spark.read.parquet(_path(root, table))
    for col, val in (("map_key", map_key), ("chromosome", chromosome), ("sample_id", sample_id)):
        if val is not None and col in df.columns:
            df = df.filter(F.col(col) == val)
    casts = {
        c: F.col(c).cast(t)
        for c, t in _PARTITION_TYPES.items()
        if c in df.columns and c in PARTITIONING.get(table, ())
    }
    return df.withColumns(casts) if casts else df


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 64,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table for co-located joins (SURVEY §4: 'bucketing
    for co-located joins').

    A store bucketed on its join key lets every future upsert/probe join
    read bucket-aligned files and skip the store-side shuffle entirely —
    the right trade when one big table is joined on the same key every
    load cycle (the variant store's natural key). Bucketing needs the
    session catalog (saveAsTable), not a bare parquet path.
    """
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def write_load_result(result, root: str, map_key: int) -> None:
    """Land a ``pipelines.load.LoadResult`` into the store (the three
    K1 insert targets of saveVariants)."""
    write_table(result.variant, root, "variant")
    write_table(
        result.variant_map_data.withColumn("map_key", F.lit(map_key)),
        root,
        "variant_map_data",
    )
    write_table(result.variant_sample_detail, root, "variant_sample_detail")


def compact_table(
    spark: SparkSession,
    root: str,
    table: str,
    target_rows_per_file: int = 1_000_000,
) -> dict:
    """Small-file compaction — the maintenance job every append-heavy
    parquet store needs at scale (each micro-batch/load appends files;
    thousands of tiny files degrade scan planning, listing, and shuffle
    locality long before data volume does).

    Rewrites each partition directory (or the whole table when
    unpartitioned) to ``ceil(rows / target_rows_per_file)`` files via a
    per-partition coalesce. The staged write means a failed compaction
    never corrupts the table, but the swap is TWO renames, so this is a
    maintenance job for a quiesced table (single-writer, no concurrent
    readers) — posix has no atomic directory exchange, and concurrent
    scans could see a missing path between the renames. Content-
    invariant: row multiset is untouched (pinned by test), only layout
    changes.

    Returns {"files_before", "files_after", "rows"}.
    """
    import math
    import os
    import shutil
    import uuid

    path = _path(root, table)

    def _data_files(p: str) -> list[str]:
        out = []
        for dirpath, _dirs, files in os.walk(p):
            out += [
                os.path.join(dirpath, f)
                for f in files
                if not f.startswith(("_", ".")) and not f.endswith(".crc")
            ]
        return out

    before = len(_data_files(path))
    df = spark.read.parquet(path)
    rows = df.count()
    parts = PARTITIONING.get(table, ())
    staged = path + f".compact-{uuid.uuid4().hex[:8]}"
    if parts:
        # per-partition file budget: repartition on the partition columns
        # so each directory is written by few tasks, then let the writer
        # split at maxRecordsPerFile — no global single-partition funnel
        (
            df.repartition(*[F.col(c) for c in parts])
            .write.mode("overwrite")
            .option("maxRecordsPerFile", target_rows_per_file)
            .partitionBy(*parts)
            .parquet(staged)
        )
    else:
        n_files = max(1, math.ceil(rows / target_rows_per_file))
        df.coalesce(n_files).write.mode("overwrite").parquet(staged)
    old = path + f".old-{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(staged, path)
    shutil.rmtree(old)
    return {"files_before": before, "files_after": len(_data_files(path)), "rows": rows}
