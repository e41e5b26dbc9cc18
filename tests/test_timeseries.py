"""gap_fill densification and trailing_range event-time windows."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from rat_strain_loader_pipeline_spark.operators.timeseries import (
    gap_fill,
    trailing_range,
)


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def _events(spark):
    # key 'a': hours 00, 03 observed (01, 02 missing); key 'b': hour 01 only.
    rows = [
        ("a", _ts("2024-01-01T00:10:00"), 1.0),
        ("a", _ts("2024-01-01T00:50:00"), 2.0),
        ("a", _ts("2024-01-01T03:05:00"), 4.0),
        ("b", _ts("2024-01-01T01:30:00"), 8.0),
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, v double")


def test_gap_fill_zero_fill_and_locf(spark):
    out = gap_fill(
        _events(spark),
        keys=["k"],
        ts_col="ts",
        aggs={"n": F.count(F.lit(1)), "sv": F.sum("v")},
        zero_fill=["n"],
        locf=["sv"],
    ).collect()
    got = {(r["k"], r["hour"].hour): (r["n"], r["filled_sv"]) for r in out}
    # full grid: 2 keys x 4 hours (00..03)
    assert len(out) == 8
    assert got[("a", 0)] == (2, 3.0)
    assert got[("a", 1)] == (0, 3.0)  # gap: zero count, LOCF carries 3.0
    assert got[("a", 2)] == (0, 3.0)
    assert got[("a", 3)] == (1, 4.0)
    # 'b' has no observation before hour 01 → LOCF is NULL there
    assert got[("b", 0)] == (0, None)
    assert got[("b", 1)] == (1, 8.0)  # the one observed 'b' event
    assert got[("b", 3)] == (0, 8.0)


def test_gap_fill_single_row_series(spark):
    one = _events(spark).limit(1)
    out = gap_fill(
        one, keys=["k"], ts_col="ts", aggs={"n": F.count(F.lit(1))}, zero_fill=["n"]
    ).collect()
    assert len(out) == 1 and out[0]["n"] == 1


def test_trailing_range_inclusive_bounds(spark):
    # rows at t=0h, 23h, 24h: the 23h-back frame at 23h includes 0h
    # (inclusive lower bound, matching SQL RANGE ... PRECEDING), the one
    # at 24h does not.
    rows = [
        ("a", _ts("2024-01-01T00:00:00"), 1),
        ("a", _ts("2024-01-01T23:00:00"), 10),
        ("a", _ts("2024-01-02T00:00:00"), 100),
        ("b", _ts("2024-01-01T23:00:00"), 7),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, n long")
    out = trailing_range(
        df,
        keys=["k"],
        ts_col="ts",
        aggs={"s": F.sum("n")},
        trailing_seconds=23 * 3600,
    ).collect()
    got = {(r["k"], r["ts"].isoformat()): r["s"] for r in out}
    assert got[("a", "2024-01-01T00:00:00")] == 1
    assert got[("a", "2024-01-01T23:00:00")] == 11
    assert got[("a", "2024-01-02T00:00:00")] == 110  # 0h dropped, 23h+24h kept
    assert got[("b", "2024-01-01T23:00:00")] == 7  # keys don't leak


def test_trailing_range_single_shuffle_plan(spark):
    df = _events(spark).groupBy(
        "k", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    out = trailing_range(
        df, keys=["k"], ts_col="hour", aggs={"s": F.sum("n")}, trailing_seconds=3600
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # two exchanges only: groupBy on (k, hour), then window on (k); no
    # self-join / cartesian anywhere in the trailing-window plan
    assert plan.count("Exchange hashpartitioning") == 2
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan


def test_doc_chunks_windows_and_tail(spark):
    from rat_strain_loader_pipeline_spark.operators.text import doc_chunks

    import pytest as _pytest

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # n=10 > chunk → 3 windows
            (2, "a b c"),  # n <= chunk → 1 window
            (3, "   "),  # no tokens → no rows
        ],
        "doc_id long, text string",
    )
    out = doc_chunks(docs, chunk_size=4, stride=3).collect()
    got = {(r["doc_id"], r["chunk_id"]): (r["n_chunk_tokens"], r["chunk_text"]) for r in out}
    assert {k[0] for k in got} == {1, 2}
    # doc 1: starts 0,3,6 → windows t0-t3, t3-t6, t6-t9; tail start 9 not emitted
    # because (10-4+2) div 3 + 1 = 3 chunks
    assert got[(1, 0)] == (4, "t0 t1 t2 t3")
    assert got[(1, 1)] == (4, "t3 t4 t5 t6")
    assert got[(1, 2)] == (4, "t6 t7 t8 t9")
    assert (1, 3) not in got
    assert got[(2, 0)] == (3, "a b c")
    # stride > chunk_size is rejected (windows would skip tokens)
    with _pytest.raises(ValueError):
        doc_chunks(docs, chunk_size=3, stride=4)


def test_cusum_finds_planted_mean_shift(spark):
    from rat_strain_loader_pipeline_spark.operators.timeseries import (
        cusum_change_point,
    )
    from pyspark.sql import functions as F2

    # level 10 for buckets 0..19, level 50 from bucket 20 on: the
    # |dev| peak must land exactly at the last pre-shift bucket (19)
    rows = [("a", b, 10 if b < 20 else 50) for b in range(40)]
    # a flat control group: every bucket identical -> dev == 0 at all t
    rows += [("flat", b, 7) for b in range(40)]
    df = spark.createDataFrame(rows, "grp string, b long, v long")
    out = {
        r["grp"]: r
        for r in cusum_change_point(
            df, ["grp"], F2.col("b"), F2.col("v")
        ).collect()
    }
    assert out["a"]["cp_bucket"] == 19
    assert out["a"]["n_buckets"] == 40
    assert out["flat"]["dev_abs"] == 0
    assert out["flat"]["cp_bucket"] == 0  # earliest-bucket tie-break


def test_markov_transitions_counts_and_probs(spark):
    from rat_strain_loader_pipeline_spark.operators.timeseries import (
        markov_transitions,
    )

    # user 1: a -> b -> a  (pairs: a->b, b->a); user 2: a -> a (a->a)
    rows = [
        (1, _ts("2024-01-01T00:00:00"), 10, "a"),
        (1, _ts("2024-01-01T00:01:00"), 11, "b"),
        (1, _ts("2024-01-01T00:02:00"), 12, "a"),
        (2, _ts("2024-01-01T00:00:00"), 20, "a"),
        (2, _ts("2024-01-01T00:03:00"), 21, "a"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["prob_q"])
        for r in markov_transitions(df).collect()
    }
    # from 'a': 1x a->b, 1x a->a  => 500000 micros each
    assert got[("a", "b")] == (1, 500000)
    assert got[("a", "a")] == (1, 500000)
    assert got[("b", "a")] == (1, 1000000)
    assert len(got) == 3


def test_markov_transitions_tiebreak_deterministic(spark):
    from rat_strain_loader_pipeline_spark.operators.timeseries import (
        markov_transitions,
    )

    # identical ts: event_id is the deterministic order (5 -> 6)
    rows = [
        (1, _ts("2024-01-01T00:00:00"), 5, "x"),
        (1, _ts("2024-01-01T00:00:00"), 6, "y"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = markov_transitions(df).collect()
    assert [(r["from_type"], r["to_type"]) for r in out] == [("x", "y")]


def test_ewma_smooth_recurrence_and_residuals(spark):
    from rat_strain_loader_pipeline_spark.operators.timeseries import (
        ewma_smooth,
    )

    # series 4, 2, 8: s = 4e6, (2e6+4e6)//2=3e6, (8e6+3e6)//2=5.5e6
    rows = [("a", 1, 4), ("a", 2, 2), ("a", 3, 8)]
    df = spark.createDataFrame(rows, "k string, b long, v long")
    out = {
        r["b"]: (r["s_q"], r["resid_q"])
        for r in ewma_smooth(df, "k", "b", "v").collect()
    }
    assert out[1] == (4_000_000, None)
    assert out[2] == (3_000_000, 2_000_000 - 4_000_000)
    assert out[3] == (5_500_000, 8_000_000 - 3_000_000)


def test_ewma_smooth_partition_invariant(spark):
    from rat_strain_loader_pipeline_spark.operators.timeseries import (
        ewma_smooth,
    )

    rows = [("k%d" % (i % 3), i // 3, (i * 7) % 11) for i in range(60)]
    df = spark.createDataFrame(rows, "k string, b long, v long")
    one = sorted(map(tuple, ewma_smooth(df.coalesce(1), "k", "b", "v").collect()))
    many = sorted(
        map(
            tuple,
            ewma_smooth(df.repartition(13, F.col("b") % 5), "k", "b", "v").collect(),
        )
    )
    assert one == many
