"""Dataset versioning: content fingerprints and version diffs.

A 100 TB corpus is re-released constantly (new crawls, re-filters,
dedup re-runs); training reproducibility needs (a) a cheap identity
for "exactly this data" and (b) an accounting of what changed between
two versions. Both must be one-pass and order-free — a canonical sort
of 100 TB just to hash it is not a plan.

The fingerprint is an order-free modular sum of per-document content
hashes (md5 of the text, folded through the repo's engine-portable
``sampling.md5_mod`` identity (the md5_bucket fold at bigint width)): commutative and associative, so it
parallelizes as an ordinary partial aggregation, merges across
partitions/shards, and is replayed exactly by a SQL oracle. Sums run
in DECIMAL(38,0) — exact far beyond any corpus size — before the
final fold back to bigint.

The diff is one full-outer join on the document key comparing content
hashes: added / removed / changed / unchanged, per source. No text
ever crosses the wire twice — versions compare by hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rat_strain_loader_pipeline_spark.operators.sampling import md5_mod

FP_MOD = 10**15  # < 2^52, the md5_bucket fold bound


def content_hash(id_col: Column, text_col: Column) -> Column:
    """Per-document content hash in [0, FP_MOD): md5 of the text,
    bound to the id so moved content changes the fingerprint."""
    return md5_mod(
        F.concat(
            F.lit("fp:"),
            id_col.cast("string"),
            F.lit(":"),
            F.md5(F.coalesce(text_col, F.lit(""))),
        ),
        FP_MOD,
    )


def corpus_fingerprint(
    docs: DataFrame,
    group_cols: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per group: (group..., n_docs, fp) with fp = the modular
    sum of content hashes — the order-free dataset version id."""
    h = content_hash(F.col(id_col), F.col(text_col)).cast("decimal(38,0)")
    return (
        docs.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum(h) % F.lit(FP_MOD)).cast("long").alias("fp"),
        )
    )


def dataset_diff(
    v1: DataFrame,
    v2: DataFrame,
    group_cols: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Version accounting per group: added (only in v2), removed (only
    in v1), changed (both, different content hash), unchanged. One
    full-outer hash join on the document key; group attribution for
    added/removed comes from whichever side has the row."""
    def keyed(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            F.col(id_col),
            *[F.col(c).alias(f"{c}_{tag}") for c in group_cols],
            content_hash(F.col(id_col), F.col(text_col)).alias(f"h_{tag}"),
        )

    j = keyed(v1, "a").join(keyed(v2, "b"), id_col, "full_outer")
    groups = [
        F.coalesce(F.col(f"{c}_b"), F.col(f"{c}_a")).alias(c) for c in group_cols
    ]
    in_a = F.col("h_a").isNotNull()
    in_b = F.col("h_b").isNotNull()
    return j.select(
        *groups,
        (~in_a & in_b).cast("long").alias("add1"),
        (in_a & ~in_b).cast("long").alias("rem1"),
        (in_a & in_b & (F.col("h_a") != F.col("h_b"))).cast("long").alias("chg1"),
        (in_a & in_b & (F.col("h_a") == F.col("h_b"))).cast("long").alias("same1"),
    ).groupBy(*group_cols).agg(
        F.sum("add1").alias("n_added"),
        F.sum("rem1").alias("n_removed"),
        F.sum("chg1").alias("n_changed"),
        F.sum("same1").alias("n_same"),
    )
