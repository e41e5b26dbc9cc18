"""JDBC sink tests — SQL generation and writer assembly (no database in
the environment; execution is caller-side by design, see sinks.py)."""

from __future__ import annotations

from rat_strain_loader_pipeline_spark.sinks import (
    CONSERVATION_BATCH_SIZE,
    DEFAULT_BATCH_SIZE,
    RGD_IDS_BATCH_SIZE,
    bulk_load_bracket_sql,
    merge_sql,
    stage_table_name,
)


def test_reference_batch_sizes():
    # VariantTranscriptBatch.java:26; ConservationScoreLoader.java:152;
    # VariantProcessingBase.java:387
    assert DEFAULT_BATCH_SIZE == 10_000
    assert CONSERVATION_BATCH_SIZE == 50_000
    assert RGD_IDS_BATCH_SIZE == 5_000


def test_merge_sql_upsert():
    sql = merge_sql(
        "variant",
        key_cols=["rgd_id"],
        update_cols=["rs_id", "clinvar_id"],
        insert_cols=["rgd_id", "ref_nuc", "var_nuc", "rs_id", "clinvar_id"],
    )
    assert sql.splitlines() == [
        "MERGE INTO variant t USING variant_stage s ON (t.rgd_id = s.rgd_id)",
        "WHEN MATCHED THEN UPDATE SET t.rs_id = s.rs_id, t.clinvar_id = s.clinvar_id",
        "WHEN NOT MATCHED THEN INSERT (rgd_id, ref_nuc, var_nuc, rs_id, clinvar_id) "
        "VALUES (s.rgd_id, s.ref_nuc, s.var_nuc, s.rs_id, s.clinvar_id)",
    ]


def test_merge_sql_insert_only():
    # K2 conditional insert (no update clause): VARIANT_RGD_IDS flow
    sql = merge_sql("variant_rgd_ids", ["rgd_id"], [], ["rgd_id", "object_status"])
    assert "WHEN MATCHED" not in sql
    assert "WHEN NOT MATCHED THEN INSERT (rgd_id, object_status)" in sql


def test_bulk_load_bracket():
    pre, post = bulk_load_bracket_sql(
        "variant_map_data", ["vmd_ix1", "vmd_ix2"], ["fk_vmd_variant"]
    )
    assert pre == [
        "ALTER INDEX vmd_ix1 UNUSABLE",
        "ALTER INDEX vmd_ix2 UNUSABLE",
        "ALTER TABLE variant_map_data DISABLE CONSTRAINT fk_vmd_variant",
    ]
    assert post == [
        "ALTER INDEX vmd_ix1 REBUILD PARALLEL NOCOMPRESS NOLOGGING",
        "ALTER INDEX vmd_ix2 REBUILD PARALLEL NOCOMPRESS NOLOGGING",
        "ALTER TABLE variant_map_data ENABLE CONSTRAINT fk_vmd_variant",
    ]


def test_stage_table_name():
    assert stage_table_name("variant") == "variant_stage"


def test_observe_counters_single_pass(spark):
    """K7 counters aggregate during the consuming action — no second
    pass over the plan — and render as a SYSTEM_LOG-shaped row."""
    from pyspark.sql import functions as F

    from rat_strain_loader_pipeline_spark.observe import run_log_row, with_counters

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7 == 0).alias("skipped")
    )
    out, obs = with_counters(
        df,
        "load-run",
        rows_total=F.count(F.lit(1)),
        rows_skipped=F.sum(F.col("skipped").cast("long")),
    )
    kept = out.filter(~F.col("skipped"))
    assert kept.count() == 1000 - 143
    row = run_log_row(obs, "variant-load")
    assert row == {"event": "variant-load", "rows_total": 1000, "rows_skipped": 143}


def test_jdbc_scan_options():
    from rat_strain_loader_pipeline_spark.sinks import JdbcTarget, jdbc_scan_options

    t = JdbcTarget("jdbc:oracle:thin:@db:1521/rgd", "variant", {"user": "u"})
    opts = jdbc_scan_options(t, "rgd_id", 1, 1_000_000, 32)
    assert opts["partitionColumn"] == "rgd_id"
    assert opts["numPartitions"] == "32"
    assert opts["fetchsize"] == "10000"
    assert opts["user"] == "u"
    import pytest

    with pytest.raises(ValueError):
        jdbc_scan_options(t, "rgd_id")  # bounds missing
