"""Dataset fingerprints and version diffs."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_fingerprint_order_free_and_content_sensitive(spark):
    from rat_strain_loader_pipeline_spark.operators.versioning import (
        corpus_fingerprint,
    )

    rows = [(i, "s", f"text number {i}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    a = corpus_fingerprint(df.coalesce(1), ["source"]).collect()[0]
    b = corpus_fingerprint(
        df.repartition(13, F.col("doc_id") % 5), ["source"]
    ).collect()[0]
    assert (a["n_docs"], a["fp"]) == (b["n_docs"], b["fp"])
    # editing ONE document changes the fingerprint
    edited = df.withColumn(
        "text",
        F.when(F.col("doc_id") == 7, F.lit("changed")).otherwise(F.col("text")),
    )
    c = corpus_fingerprint(edited, ["source"]).collect()[0]
    assert c["fp"] != a["fp"]
    assert c["n_docs"] == a["n_docs"]


def test_dataset_diff_accounts_every_document_once(spark):
    from rat_strain_loader_pipeline_spark.operators.versioning import dataset_diff

    v1 = spark.createDataFrame(
        [(1, "s", "a"), (2, "s", "b"), (3, "s", "c")],
        "doc_id long, source string, text string",
    )
    v2 = spark.createDataFrame(
        [(2, "s", "b"), (3, "s", "c-edited"), (4, "s", "d")],
        "doc_id long, source string, text string",
    )
    r = dataset_diff(v1, v2, ["source"]).collect()[0]
    assert (r["n_added"], r["n_removed"], r["n_changed"], r["n_same"]) == (
        1,
        1,
        1,
        1,
    )
