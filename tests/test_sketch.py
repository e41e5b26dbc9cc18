"""Count-Min sketch: no-undercount guarantee, collision behavior,
partition invariance."""

from __future__ import annotations

from pyspark.sql import functions as F


def _hh(spark, rows, **kw):
    df = spark.createDataFrame([(k,) for k in rows], "k string")
    from rat_strain_loader_pipeline_spark.operators.sketch import (
        count_min_heavy_hitters,
    )

    return {r["k"]: r for r in count_min_heavy_hitters(df, "k", **kw).collect()}


def test_cms_never_undercounts_and_tiny_width_collides(spark):
    # 3 keys, width 2: at least two keys must share a bucket in every
    # row, so some estimate strictly exceeds its exact count — while
    # the no-undercount invariant holds for all
    rows = ["a"] * 50 + ["b"] * 30 + ["c"] * 20
    out = _hh(spark, rows, depth=2, width=2, topn=3)
    assert {k: r["exact_n"] for k, r in out.items()} == {"a": 50, "b": 30, "c": 20}
    assert all(r["over_ok"] for r in out.values())
    assert all(r["est_n"] >= r["exact_n"] for r in out.values())
    assert any(r["slack"] > 0 for r in out.values())


def test_cms_wide_sketch_is_exact_for_isolated_keys(spark):
    # width far above cardinality: with high probability no collisions;
    # regardless, the min-over-depth estimate can only shrink as width
    # grows, and exactness here is deterministic given the fixed md5
    # hashes (pinned by this test)
    rows = [f"k{i}" for i in range(10) for _ in range(i + 1)]
    out = _hh(spark, rows, depth=3, width=4096, topn=10)
    assert all(r["slack"] == 0 for r in out.values())
    assert all(r["bound_ok"] for r in out.values())


def test_cms_partition_invariant(spark, sf_dir):
    from rat_strain_loader_pipeline_spark.operators.sketch import (
        count_min_heavy_hitters,
    )
    from rat_strain_loader_pipeline_spark.sources.tables import read_table

    ev = read_table(spark, sf_dir, "events")
    a = sorted(
        tuple(r)
        for r in count_min_heavy_hitters(
            ev.coalesce(1), "user_id", depth=3, width=64, topn=10
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in count_min_heavy_hitters(
            ev.repartition(17, F.col("event_id") % 5), "user_id",
            depth=3, width=64, topn=10,
        ).collect()
    )
    assert a == b
    assert len(a) == 10


def test_bloom_no_false_negatives_and_tiny_m_forces_fps(spark):
    from rat_strain_loader_pipeline_spark.operators.sketch import bloom_prune_report

    fact = spark.createDataFrame([(i % 100,) for i in range(1000)], "k long")
    dim = spark.createDataFrame([(i,) for i in range(0, 100, 10)], "k long")
    # m=4 with 10 keys: every row of the partitioned filter is nearly
    # full, so non-member keys must collide into false positives
    r = bloom_prune_report(fact, dim, "k", m=4, k=2).collect()[0]
    assert r["no_false_negatives"]
    assert r["n_fact"] == 1000
    assert r["n_true"] == 100  # 10 member keys x 10 rows each
    assert r["n_pass"] == r["n_true"] + r["n_fp"]
    assert r["n_fp"] > 0
    # a wide filter kills the fps without touching the true matches
    r2 = bloom_prune_report(fact, dim, "k", m=1 << 16, k=3).collect()[0]
    assert r2["no_false_negatives"]
    assert r2["n_true"] == 100
    assert r2["n_fp"] == 0


def test_bloom_prune_partition_invariant(spark, sf_dir):
    from rat_strain_loader_pipeline_spark.operators.sketch import bloom_prune_report
    from rat_strain_loader_pipeline_spark.sources.tables import read_table
    from pyspark.sql import functions as F2

    li = read_table(spark, sf_dir, "lineitem").select(
        F2.col("l_orderkey").alias("okey")
    )
    dim = (
        read_table(spark, sf_dir, "orders")
        .filter("o_totalprice > 400000")
        .select(F2.col("o_orderkey").alias("okey"))
    )
    a = bloom_prune_report(li.coalesce(1), dim, "okey", m=512, k=3).collect()
    b = bloom_prune_report(
        li.repartition(11, F2.col("okey") % 3), dim, "okey", m=512, k=3
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_cms_join_size_never_undercounts(spark):
    from rat_strain_loader_pipeline_spark.operators.sketch import (
        cms_join_size_report,
    )

    # skewed degrees: key 0 has 40 rows, others 2 each
    left = spark.createDataFrame(
        [(0,) for _ in range(40)] + [(i, ) for i in range(1, 21) for _ in range(2)],
        "k long",
    )
    r = cms_join_size_report(left, left, "k", depth=2, width=4).collect()[0]
    exact = 40 * 40 + 20 * (2 * 2)
    assert r["exact_join"] == exact
    assert r["over_ok"] and r["est_join"] >= exact
    # collision-free regime: unique keys, huge width -> estimate exact
    u = spark.createDataFrame([(i,) for i in range(50)], "k long")
    r2 = cms_join_size_report(u, u, "k", depth=3, width=1 << 16).collect()[0]
    assert r2["exact_join"] == 50
    assert r2["est_join"] == 50
    assert r2["bound_ok"]


def test_k_anonymize_property_holds_on_release(spark):
    """Every released (non-'*') combination must appear >= k times,
    and suppressed rows release no quasi values."""
    from rat_strain_loader_pipeline_spark.operators.privacy import k_anonymize

    rows = (
        [(i, "en", "web") for i in range(12)]
        + [(100 + i, "fr", "web") for i in range(3)]
        + [(200, "de", "books")]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    out = k_anonymize(df, ("lang", "source"), k=5).collect()
    released = [r for r in out if not r["suppressed"]]
    suppressed = [r for r in out if r["suppressed"]]
    assert len(released) == 12 and len(suppressed) == 4
    assert all(r["lang_out"] == "en" and r["group_n"] == 12 for r in released)
    assert all(r["lang_out"] == "*" and r["source_out"] == "*" for r in suppressed)
    # the k-anonymity property over the released table
    from collections import Counter

    combos = Counter((r["lang_out"], r["source_out"]) for r in out)
    for (lang, src), n in combos.items():
        if lang != "*":
            assert n >= 5


def test_l_diversity_audit_flags_homogeneous_group(spark):
    from rat_strain_loader_pipeline_spark.operators.privacy import (
        l_diversity_audit,
    )

    rows = [
        ("en", 1, "s1"), ("en", 1, "s2"), ("en", 1, "s3"),
        ("fr", 2, "only"), ("fr", 2, "only"),
    ]
    df = spark.createDataFrame(rows, "lang string, b long, source string")
    got = {
        (r["lang"], r["b"]): (r["group_n"], r["n_sensitive"], r["diverse"])
        for r in l_diversity_audit(df, ("lang", "b"), "source", l=2).collect()
    }
    assert got[("en", 1)] == (3, 3, True)
    assert got[("fr", 2)] == (2, 1, False)


def test_hll_registers_match_brute_force_and_estimate_branches(spark):
    """Registers must equal the per-key brute-force max-rho, the
    linear-counting branch must fire for tiny cardinalities, and the
    raw branch for cardinalities >> m."""
    from rat_strain_loader_pipeline_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
    )

    small = spark.range(10).select(F.col("id").cast("string").alias("k"))
    est_small = hll_estimate(hll_registers(small, "k", p=8), p=8).collect()[0]
    assert est_small["used_linear"]
    # linear counting is near-exact at n << m
    assert abs(est_small["est_q"] / 1e6 - 10) < 1.0

    big = spark.range(20000).select(F.col("id").cast("string").alias("k"))
    est_big = hll_estimate(hll_registers(big, "k", p=8), p=8).collect()[0]
    assert not est_big["used_linear"]
    # classical HLL relative error ~1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert abs(est_big["est_q"] / 1e6 - 20000) < 0.2 * 20000

    # duplicate keys must not move any register (idempotent per key)
    dup = small.unionByName(small).unionByName(small)
    regs_a = sorted(tuple(r) for r in hll_registers(small, "k", p=8).collect())
    regs_b = sorted(tuple(r) for r in hll_registers(dup, "k", p=8).collect())
    assert regs_a == regs_b


def test_streaming_hll_merge_equals_single_pass(spark, tmp_path, sf_dir):
    """Per-batch register tables max-merged must be bit-identical to
    the single-pass registers (max-merge identity) — across a real
    multi-batch availableNow replay."""
    from rat_strain_loader_pipeline_spark.operators.sketch import hll_registers
    from rat_strain_loader_pipeline_spark.sources.tables import read_table
    from rat_strain_loader_pipeline_spark.streaming.sketches import (
        maintain_hll_available_now,
    )

    keyed = (
        read_table(spark, sf_dir, "events")
        .select(F.col("user_id").cast("string").alias("k"))
    )
    src = str(tmp_path / "src")
    keyed.repartition(5).write.parquet(src)
    got = maintain_hll_available_now(
        spark, src, "k string", str(tmp_path / "work"), "k", p=8
    )
    want = hll_registers(keyed, "k", p=8)
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in want.collect()
    )


def test_cms_batch_grid_equals_one_pass_sketch(spark):
    # the micro-batch maintainer's union-shaped builder (special-cased
    # for tiny per-batch jobs, r13) must produce the identical grid to
    # the one-pass explode builder the batch queries use
    from rat_strain_loader_pipeline_spark.operators.sketch import count_min_sketch
    from rat_strain_loader_pipeline_spark.streaming.sketches import _cms_batch_grid

    rows = [f"k{i % 37}" for i in range(500)]
    df = spark.createDataFrame([(k,) for k in rows], "k string")
    a = sorted(tuple(r) for r in count_min_sketch(df, "k", 3, 16).collect())
    b = sorted(tuple(r) for r in _cms_batch_grid(df, "k", 3, 16).collect())
    assert a == b
