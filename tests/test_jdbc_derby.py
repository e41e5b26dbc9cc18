"""Live JDBC round-trip (K1/K2/K3/S7) against embedded Apache Derby.

Derby ships in PySpark's jar directory (it backs the Hive metastore), so
the sandbox CAN execute the relational leg end-to-end in one JVM:
parallel batched appends (K1), the staged-MERGE upsert replacing the
reference's batched UPDATE + conditional INSERT
(VariantProcessingBase.java:277-294, :396-405), and the
range-partitioned scan (S7) with real pushdown. The generated
MERGE/bracket SQL was previously unit-tested only; here the MERGE
actually runs server-side.
"""

from __future__ import annotations

import pytest

from rat_strain_loader_pipeline_spark.sinks import (
    JdbcTarget,
    jdbc_append,
    jdbc_scan_options,
    jdbc_upsert_via_staging,
    stage_table_name,
)

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture()
def derby(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    jvm = spark._jvm
    jvm.java.lang.Class.forName(DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    yield url, conn
    conn.close()


def _exec(conn, sql: str) -> None:
    st = conn.createStatement()
    try:
        st.execute(sql)
    finally:
        st.close()


def test_jdbc_append_upsert_merge_partitioned_scan(spark, derby):
    url, conn = derby
    props = {"driver": DRIVER}
    target = JdbcTarget(url, "variant", properties=props)

    _exec(conn, "CREATE TABLE variant (rgd_id BIGINT PRIMARY KEY, chromosome VARCHAR(8), quality_score INT)")
    _exec(conn, f"CREATE TABLE {stage_table_name('variant')} (rgd_id BIGINT, chromosome VARCHAR(8), quality_score INT)")

    # K1: parallel batched append
    base = spark.createDataFrame(
        [(i, str(1 + i % 3), 10 + i) for i in range(200)],
        "rgd_id long, chromosome string, quality_score int",
    )
    jdbc_append(base, target, batchsize=50, num_partitions=4)

    # K2/K3/J4: stage a batch that updates 100 existing keys and inserts
    # 50 new ones, then run the generated MERGE server-side
    batch = spark.createDataFrame(
        [(i, str(1 + i % 3), 900 + i) for i in range(100, 250)],
        "rgd_id long, chromosome string, quality_score int",
    )
    merge = jdbc_upsert_via_staging(batch, target, key_cols=["rgd_id"], num_partitions=2)
    _exec(conn, merge)

    # S7: range-partitioned scan with pushdown
    opts = jdbc_scan_options(
        target, partition_column="rgd_id", lower_bound=0, upper_bound=250, num_partitions=5
    )
    got = spark.read.format("jdbc").options(**opts).load()
    assert got.rdd.getNumPartitions() == 5

    rows = {r["RGD_ID"]: r["QUALITY_SCORE"] for r in got.collect()}
    assert len(rows) == 250
    assert rows[50] == 60        # untouched original
    assert rows[150] == 1050     # MERGE-updated
    assert rows[249] == 1149     # MERGE-inserted

    # predicate pushdown reaches the JDBC source
    plan = got.filter("rgd_id = 150")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "RGD_ID" in plan.upper()
