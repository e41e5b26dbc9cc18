"""value_histogram unit tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from rat_strain_loader_pipeline_spark.operators.stats import value_histogram


def test_value_histogram_partitions_range(spark):
    rows = [(i, float(i)) for i in range(100)]  # values 0..99
    df = spark.createDataFrame(rows, "id long, value double")
    out = value_histogram(df, "value", n_bins=10).orderBy("bin").collect()
    assert [r["bin"] for r in out] == list(range(10))
    assert sum(r["n"] for r in out) == 100
    # max value closes into the last bin (no bin 10): values 90..99
    assert sum(r["n"] for r in out if r["bin"] == 9) == 10
    # edges tile the range in micro-units
    assert out[0]["bin_lo_micros"] == 0
    for a, b in zip(out, out[1:]):
        assert a["bin_hi_micros"] == b["bin_lo_micros"]


def test_value_histogram_nulls_keys_degenerate(spark):
    rows = [(1, "a", 5.0), (2, "a", 5.0), (3, "b", 5.0), (4, "b", None)]
    df = spark.createDataFrame(rows, "id long, k string, value double")
    out = {
        (r["k"], r["bin"]): r["n"]
        for r in value_histogram(df, "value", n_bins=4, keys=["k"]).collect()
    }
    # lo == hi: everything in bin 0; NULL excluded
    assert out == {("a", 0): 2, ("b", 0): 1}


def test_value_histogram_nan_excluded(spark):
    """One NaN must not poison the max/width (NaN sorts greatest in
    Spark) — it is excluded like NULL."""
    rows = [(1, 0.0), (2, 10.0), (3, float("nan")), (4, None)]
    df = spark.createDataFrame(rows, "id long, value double")
    out = value_histogram(df, "value", n_bins=2).orderBy("bin").collect()
    assert [(r["bin"], r["n"]) for r in out] == [(0, 1), (1, 1)]
    assert out[-1]["bin_hi_micros"] == 10_000_000


def test_dq_profile_constraints_and_single_scan(spark):
    from rat_strain_loader_pipeline_spark.operators.profile import profile_columns

    rows = [
        (1, 10.0, "a"),
        (2, 20.0, "a"),
        (3, None, None),
        (4, 200.0, "b"),
    ]
    df = spark.createDataFrame(rows, "id long, v double, s string")
    out = {
        r["col"]: r
        for r in profile_columns(
            df,
            ("id", "v", "s"),
            {
                "id": {"unique": True, "min_q": 1_000_000},
                "v": {"max_q": 100_000_000},          # fails: 200.0
                "s": {"max_null_frac_micros": 500_000},  # 1/4 null, passes
            },
        ).collect()
    }
    assert out["id"]["passed"] and out["id"]["n_distinct"] == 4
    assert not out["v"]["passed"]
    assert out["v"]["n_null"] == 1
    assert out["v"]["min_q"] == 10_000_000 and out["v"]["max_q"] == 200_000_000
    assert out["s"]["passed"] and out["s"]["min_q"] is None
    # exactly-at-threshold null fraction passes (integer comparison)
    out2 = {
        r["col"]: r
        for r in profile_columns(
            df, ("v",), {"v": {"max_null_frac_micros": 250_000}}
        ).collect()
    }
    assert out2["v"]["passed"]


def test_weighted_median_hand_case_and_invariance(spark):
    from rat_strain_loader_pipeline_spark.operators.stats import weighted_median
    from pyspark.sql import functions as F2

    # group g: values 1 (w=1), 2 (w=1), 3 (w=10) -> median 3
    # group h: values 10 (w=5), 20 (w=5) -> 2*cum(10)=10 >= 10 -> 10
    rows = [("g", 1, 1), ("g", 2, 1), ("g", 3, 10), ("h", 10, 5), ("h", 20, 5)]
    df = spark.createDataFrame(rows, "grp string, v long, w long")
    out = {
        r["grp"]: (r["wmedian_q"], r["total_w"])
        for r in weighted_median(df, ["grp"], F2.col("v"), F2.col("w")).collect()
    }
    assert out == {"g": (3, 12), "h": (10, 10)}
    out2 = {
        r["grp"]: (r["wmedian_q"], r["total_w"])
        for r in weighted_median(
            df.repartition(7, F2.col("v") % 3), ["grp"], F2.col("v"), F2.col("w")
        ).collect()
    }
    assert out2 == out


def test_quantile_rank_min_rank_ties_and_bounds(spark):
    from rat_strain_loader_pipeline_spark.operators.stats import quantile_rank
    from pyspark.sql import functions as F2

    # values 1,1,2,3 in group g: minranks 1,3,4 over n=4
    rows = [("g", 1), ("g", 1), ("g", 2), ("g", 3), ("solo", 9)]
    df = spark.createDataFrame(rows, "grp string, v long")
    out = {
        (r["grp"], r["v"]): r
        for r in quantile_rank(df, ["grp"], F2.col("v")).collect()
    }
    assert out[("g", 1)]["pr_q"] == 0
    assert out[("g", 2)]["pr_q"] == (2 * 1_000_000) // 3
    assert out[("g", 3)]["pr_q"] == 1_000_000
    assert out[("g", 1)]["n_rows"] == 2
    assert out[("solo", 9)]["pr_q"] == 0  # single-row group


def test_grouped_trend_exact_slope_on_planted_line(spark):
    from rat_strain_loader_pipeline_spark.operators.stats import grouped_trend
    from pyspark.sql import functions as F2

    # y = 3x + 7 exactly -> slope_num/slope_den == 3; flat group -> 0
    rows = [("up", x, 3 * x + 7) for x in range(50)]
    rows += [("flat", x, 42) for x in range(50)]
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    out = {
        r["grp"]: r
        for r in grouped_trend(df, ["grp"], F2.col("x"), F2.col("y")).collect()
    }
    up = out["up"]
    assert int(up["slope_num"]) == 3 * int(up["slope_den"])
    assert int(up["slope_den"]) > 0 and up["n"] == 50
    assert int(out["flat"]["slope_num"]) == 0


def test_winsorized_sum_clamps_planted_outliers(spark):
    from rat_strain_loader_pipeline_spark.operators.stats import winsorized_sum
    from pyspark.sql import functions as F2

    # 98 values of 10, one -1000 and one +1000: p05 pick = 10 (rank 5
    # lands inside the 10s after the single low outlier), p95 = 10,
    # so both outliers clamp to 10 and the sum is exactly 100 * 10
    rows = [("g", 10)] * 98 + [("g", -1000), ("g", 1000)]
    df = spark.createDataFrame(rows, "grp string, v long")
    r = winsorized_sum(df, ["grp"], F2.col("v")).collect()[0]
    assert (r["n"], r["lo_q"], r["hi_q"], r["win_sum_q"]) == (100, 10, 10, 1000)


def test_psi_drift_detects_planted_shift(spark):
    from rat_strain_loader_pipeline_spark.operators.stats import psi_drift
    from pyspark.sql import functions as F2

    # reference uniform over [0, 100); current concentrated in [0, 10)
    rows = [(i, float(i % 100)) for i in range(0, 2000, 2)]          # ref (even)
    rows += [(i, float(i % 10)) for i in range(1, 2000, 2)]          # cur (odd)
    df = spark.createDataFrame(rows, "event_id long, value double")
    out = psi_drift(df, F2.col("event_id") % 2 == 1, "value", n_bins=10).collect()
    psi = sum(r["psi_contrib_q"] for r in out) / 1e6
    assert psi > 0.25  # the standard "drifted" threshold
    # identical slices -> PSI ~ 0 (only floor jitter, bounded by bins)
    same = psi_drift(df.withColumn("value", F2.lit(5.0)),
                     F2.col("event_id") % 2 == 1, "value", n_bins=10).collect()
    assert abs(sum(r["psi_contrib_q"] for r in same)) <= len(same)


def test_ks_two_sample_exact_on_disjoint_and_identical(spark):
    from rat_strain_loader_pipeline_spark.operators.stats import ks_two_sample
    from pyspark.sql import functions as F2

    # disjoint supports -> D = 1 exactly; identical samples -> D = 0
    rows = [("d", i, 0) for i in range(50)] + [("d", 1000 + i, 1) for i in range(50)]
    rows += [("s", i % 10, j) for i in range(40) for j in (0, 1)]
    df = spark.createDataFrame(rows, "grp string, v long, cur int")
    out = {
        r["grp"]: r
        for r in ks_two_sample(
            df, ["grp"], F2.col("cur") == 1, F2.col("v")
        ).collect()
    }
    assert out["d"]["ks_micros"] == 1_000_000
    assert out["d"]["v_at_max"] == 49  # the last ref value, where the gap peaks
    assert out["s"]["ks_micros"] == 0
    assert out["s"]["d_scaled"] == 0


def test_mann_whitney_auc_separation_extremes_and_ties(spark):
    from rat_strain_loader_pipeline_spark.operators.stats import mann_whitney_auc
    from pyspark.sql import functions as F2

    # perfect separation (all cur above all ref) -> AUC 0 for ref-high
    # convention check: U counts cur-below-ref pairs via ref ranks
    rows = [("p", i, 0) for i in range(20)] + [("p", 100 + i, 1) for i in range(20)]
    # pure ties: identical values -> AUC exactly 0.5
    rows += [("t", 7, j % 2) for j in range(40)]
    df = spark.createDataFrame(rows, "grp string, v long, cur int")
    out = {
        r["grp"]: r
        for r in mann_whitney_auc(
            df, ["grp"], F2.col("cur") == 1, F2.col("v")
        ).collect()
    }
    assert out["p"]["auc_micros"] in (0, 1_000_000)  # perfect separation
    assert out["p"]["u_times2"] in (0, 2 * 20 * 20)
    assert out["t"]["auc_micros"] == 500_000  # all-tied -> exactly 1/2


def test_correlation_pairs_perfect_and_independent(spark):
    from rat_strain_loader_pipeline_spark.operators.stats import correlation_pairs
    from pyspark.sql import functions as F2

    rows = [(x, 2 * x + 3, (x * 7) % 5) for x in range(100)]
    df = spark.createDataFrame(rows, "x long, y long, z long")
    out = {
        (r["col_a"], r["col_b"]): r
        for r in correlation_pairs(
            df, {"x": F2.col("x"), "y": F2.col("y"), "z": F2.col("z")}
        ).collect()
    }
    xy = out[("x", "y")]
    # perfect linear relation: corr_num^2 == den_a * den_b exactly
    assert int(xy["corr_num"]) ** 2 == int(xy["den_a"]) * int(xy["den_b"])
    assert int(xy["corr_num"]) > 0 and xy["n"] == 100
    # (x*7)%5 cycles independently of x -> much weaker relation
    xz = out[("x", "z")]
    assert int(xz["corr_num"]) ** 2 * 10 < int(xz["den_a"]) * int(xz["den_b"])


def test_grouped_ols_perfect_line_and_degenerate(spark):
    from rat_strain_loader_pipeline_spark.operators.stats import grouped_ols

    rows = [
        # group 'g': y = 3x + 7 exactly
        ("g", 1, 10), ("g", 2, 13), ("g", 3, 16), ("g", 4, 19),
        # group 'c': constant x -> undefined slope
        ("c", 5, 1), ("c", 5, 2),
        # group 'f': flat y -> slope 0, r2 undefined (zero y-variance)
        ("f", 1, 4), ("f", 2, 4),
    ]
    df = spark.createDataFrame(rows, "k string, x long, y long")
    got = {
        r["k"]: (r["n"], r["slope_q"], r["icept_q"], r["r2_q"])
        for r in grouped_ols(df, F.col("x"), F.col("y"), keys=["k"]).collect()
    }
    assert got["g"] == (4, 3_000_000, 7_000_000, 1_000_000)
    assert got["c"] == (2, None, None, None)
    assert got["f"] == (2, 0, 4_000_000, None)


def test_calibration_bins_integer_binning(spark):
    from rat_strain_loader_pipeline_spark.operators.stats import (
        calibration_bins,
    )

    # scores 0..9, label = score >= 5; 5 bins of width 2
    rows = [(s, s >= 5) for s in range(10)]
    df = spark.createDataFrame(rows, "score long, y boolean")
    got = {
        r["bin"]: (r["n"], r["n_pos"], r["pos_rate_q"], r["lo_q"], r["hi_q"])
        for r in calibration_bins(df, "score", "y", n_bins=5).collect()
    }
    assert set(got) == {0, 1, 2, 3, 4}
    assert got[0] == (2, 0, 0, 0, 9)
    assert got[2] == (2, 1, 500000, 0, 9)  # scores 4,5
    assert got[4] == (2, 2, 1000000, 0, 9)


def test_calibration_bins_degenerate_single_score(spark):
    from rat_strain_loader_pipeline_spark.operators.stats import (
        calibration_bins,
    )

    df = spark.createDataFrame([(7, True), (7, False)], "score long, y boolean")
    out = calibration_bins(df, "score", "y", n_bins=4).collect()
    assert len(out) == 1 and out[0]["bin"] == 0 and out[0]["n"] == 2


def test_kaplan_meier_textbook_curve(spark):
    import math

    from rat_strain_loader_pipeline_spark.operators.stats import kaplan_meier

    # classic toy: events at t=1 (d=1 of n=5), t=3 (d=1 of n=3);
    # censored at t=2 and t=4; one more subject censored at t=5.
    rows = [
        ("a", 1, True),
        ("a", 2, False),
        ("a", 3, True),
        ("a", 4, False),
        ("a", 5, False),
    ]
    df = spark.createDataFrame(rows, "cohort string, dur long, observed boolean")
    out = {r["dur"]: r for r in kaplan_meier(df).collect()}
    assert set(out) == {1, 3}  # censoring-only times dropped
    assert (out[1]["n_risk"], out[1]["d"]) == (5, 1)
    assert (out[3]["n_risk"], out[3]["d"]) == (3, 1)
    t1 = math.floor(math.log(4 / 5) * 1e6)
    t3 = math.floor(math.log(2 / 3) * 1e6)
    assert out[1]["logsurv_q"] == t1
    assert out[3]["logsurv_q"] == t1 + t3


def test_kaplan_meier_risk_exhaustion_nulls(spark):
    from rat_strain_loader_pipeline_spark.operators.stats import kaplan_meier

    # all subjects die at t=2 -> S hits exact zero -> NULL from there
    rows = [("a", 1, True), ("a", 2, True), ("a", 2, True)]
    df = spark.createDataFrame(rows, "cohort string, dur long, observed boolean")
    out = {r["dur"]: r for r in kaplan_meier(df).collect()}
    assert out[1]["logsurv_q"] is not None
    assert out[2]["logsurv_q"] is None and out[2]["d"] == 2


def test_hhi_concentration_extremes(spark):
    from rat_strain_loader_pipeline_spark.operators.stats import (
        hhi_concentration,
    )

    rows = (
        [("mono", "a")] * 10
        + [("even", x) for x in ("p", "q", "r", "s") for _ in range(5)]
    )
    df = spark.createDataFrame(rows, "k string, item string")
    got = {
        r["k"]: (r["n_rows"], r["n_items"], r["hhi_q"])
        for r in hhi_concentration(df, ["k"], "item").collect()
    }
    assert got["mono"] == (10, 1, 1_000_000)
    # 4 even items: 4 * (250000^2 / 1e6) = 250000
    assert got["even"] == (20, 4, 250_000)


def test_gini_coefficient_extremes(spark):
    from rat_strain_loader_pipeline_spark.operators.stats import (
        gini_coefficient,
    )

    rows = (
        [("equal", 5)] * 4                       # perfect equality -> 0
        + [("conc", 0), ("conc", 0), ("conc", 0), ("conc", 100)]
    )
    df = spark.createDataFrame(rows, "k string, x long")
    got = {
        r["k"]: (r["n"], r["gini_q"])
        for r in gini_coefficient(df, ["k"], "x").collect()
    }
    assert got["equal"] == (4, 0)
    # one holder of everything among 4: G = (n-1)/n = 0.75
    assert got["conc"] == (4, 750_000)


def test_peak_concurrency_sweep(spark):
    from rat_strain_loader_pipeline_spark.operators.stats import (
        peak_concurrency,
    )

    # [0,10) [5,15) [9,12) overlap 3 at t=9; [20,30) alone;
    # back-to-back [40,50) [50,60) must NOT double-count (exclusive end)
    rows = [
        ("a", 0, 10), ("a", 5, 15), ("a", 9, 12),
        ("a", 20, 30),
        ("b", 40, 50), ("b", 50, 60),
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = {
        r["k"]: (r["peak"], r["peak_at"])
        for r in peak_concurrency(df, ["k"], "s", "e").collect()
    }
    assert got["a"] == (3, 9)
    assert got["b"] == (1, 40)


def test_cohens_kappa_negative_floor(spark):
    """Anti-correlated raters give kappa < 0; the signed division must
    FLOOR (pmod idiom), matching the oracle's explicit mod-floor —
    DuckDB's // truncates on signed ints, so this is the case a plain
    div would get wrong."""
    import duckdb

    from rat_strain_loader_pipeline_spark.operators.stats import cohens_kappa
    from pyspark.sql import functions as F

    # 7 disagreements, 3 agreements → kappa negative and non-divisible
    rows = [(1, i, i % 2 == 0, (i % 2 == 1) if i < 7 else (i % 2 == 0))
            for i in range(10)]
    df = spark.createDataFrame(rows, "g int, i int, ra boolean, rb boolean")
    got = cohens_kappa(df, ["g"], F.col("ra"), F.col("rb")).collect()[0]
    assert got["kappa_q"] is not None and got["kappa_q"] < 0
    # independent floor computation
    n = 10
    a1 = sum(1 for _, _, ra, _ in rows if ra)
    b1 = sum(1 for _, _, _, rb in rows if rb)
    agree = sum(1 for _, _, ra, rb in rows if ra == rb)
    pe = a1 * b1 + (n - a1) * (n - b1)
    num = (agree * n - pe) * 1_000_000
    den = n * n - pe
    import math
    assert got["kappa_q"] == math.floor(num / den)
    # and DuckDB mod-floor agrees
    dd = duckdb.sql(
        f"SELECT ({num} - (({num} % {den} + {den}) % {den})) // {den}"
    ).fetchone()[0]
    assert got["kappa_q"] == dd


def test_gini_no_bigint_wrap_at_large_volumes(spark):
    """Regression for the round-7 advice: 2·S1·1e6 wrapped bigint once
    n·Σx exceeded ~4.6e12. With three ~2e12 values the old expression
    wrapped; the DECIMAL path must match the exact Python fraction."""
    from pyspark.sql import functions as F

    from rat_strain_loader_pipeline_spark.operators.stats import (
        gini_coefficient,
    )

    xs = [2_000_000_000_000, 1_500_000_000_000, 500_000_000_000]
    df = spark.createDataFrame(
        [("g", x) for x in xs], "k string, x long"
    )
    got = gini_coefficient(df, ["k"], "x").collect()[0]
    n, s = len(xs), sum(xs)
    s1 = sum(i * x for i, x in enumerate(sorted(xs), start=1))
    want = (2 * s1 * 1_000_000) // (n * s) - ((n + 1) * 1_000_000) // n
    assert got["gini_q"] == want
    assert got["sum_x"] == s


def test_pass_at_k_matches_comb():
    """The product-ratio form must equal the exact-rational
    1 − C(n−c,k)/C(n,k) definition for every (n, c) cell."""
    import math

    k = 3
    for n, c in [(5, 0), (5, 2), (5, 5), (3, 1), (7, 3), (4, 4)]:
        num = 1
        den = 1
        for i in range(k):
            num *= max(n - c - i, 0)
            den *= n - i
        got = 1_000_000 - (num * 1_000_000) // den
        # compare against the exact rational C(n-c,k)/C(n,k)
        import fractions

        frac = (
            fractions.Fraction(math.comb(n - c, k), math.comb(n, k))
            if n - c >= k
            else fractions.Fraction(0)
        )
        exact = 1_000_000 - (frac.numerator * 1_000_000) // frac.denominator
        assert got == exact, (n, c)


def test_quantile_normalize_tied_global_max_keeps_all_cells(spark):
    """ADVICE r8 (high): with the global max tied (gn > 1), its
    MIN-rank percent rank is < 1e6, so a group cell at pr_q = 1e6
    matched no global row and vanished from the inner mapping join.
    MAX-rank on the global side keeps every cell: groups A=[1,9],
    B=[9] must emit all three value cells, and (A,9) maps to the
    global maximum."""
    from rat_strain_loader_pipeline_spark.operators.stats import (
        quantile_normalize,
    )

    df = spark.createDataFrame(
        [("A", 1), ("A", 9), ("B", 9)], "k string, v long"
    )
    out = {
        (r["k"], r["v"]): r["v_norm"]
        for r in quantile_normalize(df, ["k"], F.col("v")).collect()
    }
    assert set(out) == {("A", 1), ("A", 9), ("B", 9)}
    # (A,9) is the group max (pr_q = 1e6) -> global max value 9
    assert out[("A", 9)] == 9
    # (A,1) is the group min (pr_q = 0) -> smallest global value
    assert out[("A", 1)] == 1


def test_maxsim_topk_rejects_indivisible_dim(spark):
    """ADVICE r8: dim % n_sub != 0 silently dropped the tail of every
    vector from scoring — must now raise."""
    import pytest

    from rat_strain_loader_pipeline_spark.operators.similarity import (
        maxsim_topk,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0, 5.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="not divisible"):
        maxsim_topk(df, [1.0, 2.0, 3.0, 4.0, 5.0], n_sub=2, k=1)


def test_gram_power_iteration_rank1_exact(spark):
    """Rank-1 corpus: the top component is the common direction (L∞
    micros: (1e6, 5e5)) and it explains ALL the variance (ev_q = 1e6
    exactly — num div den equals trace with zero truncation)."""
    from rat_strain_loader_pipeline_spark.operators.similarity import (
        embedding_gram,
    )
    from rat_strain_loader_pipeline_spark.operators.spectral import (
        gram_power_iteration,
    )

    df = spark.createDataFrame(
        [(1, [2.0, 1.0]), (2, [4.0, 2.0]), (3, [-2.0, -1.0])],
        "vec_id long, embedding array<double>",
    )
    out = {
        r["dim"]: (r["v_q"], r["ev_q"])
        for r in gram_power_iteration(embedding_gram(df), rounds=3).collect()
    }
    assert out == {0: (1_000_000, 1_000_000), 1: (500_000, 1_000_000)}


def test_gram_power_iteration_zero_gram_nulls(spark):
    """Degenerate all-zero corpus: max|w| = 0 every round — components
    and ev_q must be NULL, not a division error."""
    from rat_strain_loader_pipeline_spark.operators.similarity import (
        embedding_gram,
    )
    from rat_strain_loader_pipeline_spark.operators.spectral import (
        gram_power_iteration,
    )

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rows = gram_power_iteration(embedding_gram(df), rounds=2).collect()
    assert len(rows) == 2
    assert all(r["v_q"] is None and r["ev_q"] is None for r in rows)


def test_ks_drift_hand_computed_two_groups(spark):
    """A=[0,0,1] vs B=[1,2]: sup|F_A - F_B| is at v=0 with
    |2*2 - 0*3| = 4, D = 4/6 -> 666666 micros, symmetric by group."""
    from rat_strain_loader_pipeline_spark.operators.stats import ks_drift

    df = spark.createDataFrame(
        [("A", 0.0), ("A", 0.4), ("A", 1.0), ("B", 1.2), ("B", 2.0)],
        "g string, value double",
    )
    got = {r["g"]: r for r in ks_drift(df, "g", "value").collect()}
    assert got["A"]["n_grp"] == 3 and got["A"]["n_rest"] == 2
    assert int(got["A"]["d_scaled"]) == 4 and got["A"]["d_q"] == 666666
    assert int(got["B"]["d_scaled"]) == 4 and got["B"]["d_q"] == 666666


def test_ks_drift_identical_distributions_zero(spark):
    """Two groups drawing identical value multisets must have D = 0."""
    from rat_strain_loader_pipeline_spark.operators.stats import ks_drift

    rows = [("A", float(v)) for v in range(10)] + [
        ("B", float(v)) for v in range(10)
    ]
    df = spark.createDataFrame(rows, "g string, value double")
    for r in ks_drift(df, "g", "value").collect():
        assert int(r["d_scaled"]) == 0 and r["d_q"] == 0


def test_pca_project_extremes_separates_known_direction(spark):
    """Vectors along +e0 must land on one side, -e0 on the other, and
    a degenerate (all-zero Gram) component must yield an empty result."""
    from rat_strain_loader_pipeline_spark.operators.similarity import (
        embedding_gram,
    )
    from rat_strain_loader_pipeline_spark.operators.spectral import (
        gram_power_iteration,
        pca_project_extremes,
    )

    rows = [(i, [1.0 if i < 5 else -1.0, 0.0]) for i in range(10)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    comp = gram_power_iteration(embedding_gram(emb), rounds=3)
    out = pca_project_extremes(emb, comp, topk=5)
    sides = {r["vec_id"]: r["side"] for r in out.collect()}
    assert len(sides) == 10
    # all +e0 vectors share one side, all -e0 the other
    assert len({sides[i] for i in range(5)}) == 1
    assert len({sides[i] for i in range(5, 10)}) == 1
    assert sides[0] != sides[9]

    zero = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    comp0 = gram_power_iteration(embedding_gram(zero), rounds=3)
    assert pca_project_extremes(zero, comp0, topk=5).count() == 0


def test_centroid_drift_scale_invariance_and_orthogonality(spark):
    """Identical-direction groups must score 1e6 regardless of group
    size (cosine of sums == cosine of centroids); orthogonal groups 0;
    a zero-norm group yields NULL."""
    from rat_strain_loader_pipeline_spark.operators.similarity import (
        label_centroid_drift,
    )

    rows = (
        [(i, [1.0, 0.0], 0) for i in range(3)]
        + [(10 + i, [2.0, 0.0], 1) for i in range(7)]
        + [(20 + i, [0.0, 1.0], 2) for i in range(2)]
        + [(30, [0.0, 0.0], 3)]
    )
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    got = {
        (r["group_a"], r["group_b"]): r
        for r in label_centroid_drift(emb).collect()
    }
    assert got[(0, 1)]["cos_q"] == 1_000_000
    assert got[(0, 1)]["n_a"] == 3 and got[(0, 1)]["n_b"] == 7
    assert got[(0, 2)]["cos_q"] == 0
    assert got[(0, 3)]["cos_q"] is None
    assert len(got) == 6


def test_kruskal_wallis_textbook_case_no_ties(spark):
    """A=[1,2], B=[3,4]: ranks 1..4, R_A=3, R_B=7,
    H = 12/20*(9/2+49/2) - 15 = 2.4 -> 2_400_000 micros; no ties so
    tie_q = 1e6 and h_adj == h."""
    from rat_strain_loader_pipeline_spark.operators.stats import kruskal_wallis

    df = spark.createDataFrame(
        [("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0)],
        "g string, value double",
    )
    r = kruskal_wallis(df, "g", "value").collect()[0]
    assert r["n_total"] == 4 and r["n_groups"] == 2
    assert r["h_q"] == 2_400_000
    assert r["tie_q"] == 1_000_000
    assert r["h_adj_q"] == 2_400_000


def test_kruskal_wallis_identical_groups_h_zero(spark):
    """Identical group distributions (all ties across groups) must give
    H <= 0-ish (exactly the tie-floor) and a tie-corrected value that
    stays small; with every value tied, tie_q reflects the t^3-t mass."""
    from rat_strain_loader_pipeline_spark.operators.stats import kruskal_wallis

    rows = [("A", 5.0)] * 4 + [("B", 5.0)] * 4
    df = spark.createDataFrame(rows, "g string, value double")
    r = kruskal_wallis(df, "g", "value").collect()[0]
    # single tied value: every rank is the midrank, H = 0 exactly up to
    # the per-group floor (each term floors identically) and tie_q = 0
    # (t^3 - t == N^3 - N) -> adjusted H is NULL
    assert abs(r["h_q"]) <= 1  # floor slack
    assert r["tie_q"] == 0 and r["h_adj_q"] is None


def test_acf_daily_periodic_and_constant_series(spark):
    """A period-2 alternating series has lag-1 ACF near -1 and lag-2
    near +1; a constant series has zero variance -> NULL."""
    import datetime

    from rat_strain_loader_pipeline_spark.operators.timeseries import acf_daily

    rows = []
    base = datetime.datetime(2024, 1, 1)
    for d in range(40):
        n = 3 if d % 2 == 0 else 1
        for i in range(n):
            rows.append(("alt", base + datetime.timedelta(days=d)))
    for d in range(40):
        rows.append(("flat", base + datetime.timedelta(days=d)))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {
        (r["event_type"], r["lag"]): r
        for r in acf_daily(df, "ts", "event_type", lags=(1, 2)).collect()
    }
    assert got[("alt", 1)]["r_q"] <= -900_000
    assert got[("alt", 2)]["r_q"] >= 900_000
    assert got[("flat", 1)]["r_q"] is None
    assert got[("alt", 1)]["n"] == 39


def test_mann_kendall_monotone_and_flat(spark, tmp_path, sf_dir):
    """A strictly increasing daily series gives S = n(n-1)/2 and
    var18 = n(n-1)(2n+5) (no ties); a constant series gives S = 0."""
    import datetime

    import __spark_entry__ as em

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for d in range(5):  # 'up': 1, 2, 3, 4, 5 events per day
        for i in range(d + 1):
            rows.append((int(d * 10 + i), 1, "up",
                         base + datetime.timedelta(days=d), 1.0))
    for d in range(5):  # 'flat': 2 per day
        for i in range(2):
            rows.append((int(1000 + d * 10 + i), 1, "flat",
                         base + datetime.timedelta(days=d), 1.0))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp,"
        " value double"
    )
    p = str(tmp_path / "events.parquet")
    df.coalesce(1).write.parquet(p)
    import os
    import shutil
    # the query reads <sf_dir>/events.parquet via read_table; build a
    # minimal sf_dir with just events
    sfd = str(tmp_path / "sf")
    os.makedirs(sfd)
    shutil.move(p, os.path.join(sfd, "events.parquet"))
    got = {r["event_type"]: r for r in em.q_mann_kendall(spark.builder.getOrCreate(), sfd).collect()}
    up = got["up"]
    assert up["s"] == 10 and up["var18"] == 5 * 4 * 15
    import math
    want_z = math.floor((10 - 1) / math.sqrt(300 / 18.0) * 1e6)
    assert up["z_q"] == want_z
    flat = got["flat"]
    assert flat["s"] == 0 and flat["z_q"] == 0


def test_gram_second_component_separates_orthogonal_directions(spark):
    """With variance concentrated on e0 then e1, PC1 must peak at dim 0
    and the deflated PC2 at dim 1, with ev1 >= ev2 > 0."""
    from rat_strain_loader_pipeline_spark.operators.similarity import (
        embedding_gram,
    )
    from rat_strain_loader_pipeline_spark.operators.spectral import (
        gram_deflated_second_component,
        gram_power_iteration,
    )

    rows = (
        [(i, [1.0, 0.0, 0.0]) for i in range(10)]
        + [(100 + i, [0.0, 1.0, 0.0]) for i in range(5)]
        + [(200, [0.0, 0.0, 0.5])]
    )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    gram = embedding_gram(emb)
    v1 = {r["dim"]: r for r in gram_power_iteration(gram, rounds=5).collect()}
    v2 = {
        r["dim"]: r
        for r in gram_deflated_second_component(gram, rounds=5).collect()
    }
    top1 = max(v1, key=lambda d: abs(v1[d]["v_q"]))
    top2 = max(v2, key=lambda d: abs(v2[d]["v_q"]))
    assert top1 == 0 and top2 == 1
    assert v1[0]["ev_q"] >= v2[0]["ev_q"] > 0
    # deflation held: the PC2 vector has negligible dim-0 component
    assert abs(v2[0]["v_q"]) < 100_000  # < 0.1 of the L-inf unit
