"""Distribution statistics over measure columns.

The telemetry/EDA staple missing from groupBy aggregates: fixed-width
histograms computed distributively. (Quantiles live in the
length_quantiles query via exact percentile SQL; Spearman lives in the
entry module; both follow the same exactness rules used here.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, FloatType


def value_histogram(
    df: DataFrame,
    value_col: str,
    n_bins: int = 20,
    keys: list[str] | None = None,
) -> DataFrame:
    """Fixed-width histogram of ``value_col``, optionally per ``keys``.

    Bounds come from ONE global min/max aggregate (broadcast 1-row —
    bins are globally aligned even when keyed, so per-key histograms
    are comparable); bin = ``least(floor((v - lo)/width), n_bins-1)``
    (the max value closes into the last bin). NULL values are excluded;
    for float/double columns NaN is excluded too (NaN sorts greatest in
    Spark, so one NaN would poison the max and every bin with it).
    Returns (keys..., bin, bin_lo_micros, bin_hi_micros, n) — bin edges
    in floored micro-units so every emitted column is exact-comparable
    across engines (lo + bin*width is the identical IEEE sequence from
    the identical 1-row bounds).

    100 TB shape: exactly TWO fact passes — bounds, then counts with
    map-side partial aggregation on (keys, bin, lo, hi); lo/hi are
    constants from the broadcast bounds row, so grouping on them adds
    no cardinality but carries the edges through the aggregation (no
    third pass to re-attach them). Bin cardinality is n_bins x
    key-cardinality, never fact-sized. Degenerate case lo == hi puts
    everything in bin 0.
    """
    keys = keys or []
    v = F.col(value_col)
    valid = v.isNotNull()
    if isinstance(df.schema[value_col].dataType, (DoubleType, FloatType)):
        valid = valid & ~F.isnan(v)
    bounds = df.filter(valid).agg(
        F.min(v).cast("double").alias("lo"), F.max(v).cast("double").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(float(n_bins))
    bin_raw = F.floor((v.cast("double") - F.col("lo")) / width).cast("long")
    bin_ = (
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(F.least(bin_raw, F.lit(n_bins - 1)))
        .cast("long")
    )
    return (
        df.filter(valid)
        .crossJoin(F.broadcast(bounds))
        .groupBy(*keys, bin_.alias("bin"), F.col("lo"), F.col("hi"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            *keys,
            "bin",
            F.floor((F.col("lo") + F.col("bin").cast("double") * width) * F.lit(1e6))
            .cast("long")
            .alias("bin_lo_micros"),
            F.floor((F.col("lo") + (F.col("bin") + 1).cast("double") * width) * F.lit(1e6))
            .cast("long")
            .alias("bin_hi_micros"),
            "n",
        )
    )


def weighted_median(
    df: DataFrame,
    group_cols: list[str],
    value_q,
    weight,
) -> DataFrame:
    """Exact weighted median per group: the smallest value v whose
    cumulative weight reaches half the group total (2·cum >= total —
    integer comparison, no halving division). ``value_q`` must already
    be an exact integer column (micro-units per the numeric policy)
    and ``weight`` an exact integer column.

    Shape: duplicates collapse FIRST (one partial-agg reduction to
    (group, value) grain — the window then runs over distinct values,
    not rows, which is what keeps a 100 TB group tractable: cumsum
    state is value-cardinality, and a heavy-tailed value domain can
    further bucket the cumsum with the two-level block pattern the
    repo uses for global ranks). Returns (group..., wmedian_q,
    total_w).
    """
    from pyspark.sql.window import Window

    g = list(group_cols)
    collapsed = df.groupBy(*g, value_q.alias("v")).agg(
        F.sum(weight).alias("w")
    )
    wcum = (
        Window.partitionBy(*g)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy(*g)
    ranked = collapsed.withColumn("cum", F.sum("w").over(wcum)).withColumn(
        "tot", F.sum("w").over(wtot)
    )
    hit = ranked.filter(F.col("cum") * 2 >= F.col("tot"))
    return (
        hit.groupBy(*g)
        .agg(F.min("v").alias("wmedian_q"), F.min("tot").alias("total_w"))
    )


def quantile_rank(
    df: DataFrame,
    group_cols: list[str],
    value_q,
) -> DataFrame:
    """Quantile (percent-rank) normalization per group — the rank-based
    feature transform that is immune to outliers and scale: each
    distinct value maps to floor((min_rank - 1) * 1e6 / (n - 1)),
    min-rank semantics on ties (SQL percent_rank), pure non-negative
    integer division. Groups of one row map to 0.

    Same collapse-first shape as ``weighted_median``: one partial-agg
    reduction to (group, value) grain, then the window runs over
    distinct values — value-cardinality state, not row-cardinality.
    Returns (group..., v, n_rows, pr_q).
    """
    from pyspark.sql.window import Window

    g = list(group_cols)
    collapsed = df.groupBy(*g, value_q.alias("v")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    w_cum = (
        Window.partitionBy(*g).orderBy("v").rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    w_all = Window.partitionBy(*g)
    ranked = collapsed.withColumn(
        "minrank", F.sum("n_rows").over(w_cum) - F.col("n_rows") + 1
    ).withColumn("n", F.sum("n_rows").over(w_all))
    pr = F.when(F.col("n") > 1, F.expr("((minrank - 1) * 1000000) div (n - 1)")
               ).otherwise(F.lit(0)).cast("long")
    return ranked.select(*g, "v", "n_rows", pr.alias("pr_q"))


def grouped_trend(
    df: DataFrame,
    group_cols: list[str],
    x,
    y_q,
) -> DataFrame:
    """Per-group OLS slope of y against x with EXACT integer algebra:
    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), emitted as the exact
    numerator/denominator pair (DECIMAL(38,0) — order-free sums far
    beyond bigint) plus n. Consumers divide at read time; keeping the
    ratio unevaluated is what makes the statistic mergeable across
    partitions/shards AND engine-exact (no IEEE division in the
    contract).

    ``x`` should be pre-centered by the caller (e.g. seconds since the
    window start) to keep Σx² small; ``y_q`` is micro-units. One
    partial-agg pass; group table is key-cardinality.
    """
    g = list(group_cols)
    d38 = "decimal(38,0)"
    agg = df.select(
        *g, x.cast(d38).alias("x"), y_q.cast(d38).alias("y")
    ).groupBy(*g).agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return agg.select(
        *g,
        F.col("n").cast("long").alias("n"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast(d38)
        .alias("slope_num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast(d38)
        .alias("slope_den"),
    )


def winsorized_sum(
    df: DataFrame,
    group_cols: list[str],
    value_q,
    lo_frac_micros: int = 50_000,
    hi_frac_micros: int = 950_000,
) -> DataFrame:
    """Winsorized aggregation per group: values clamp to the exact
    [p_lo, p_hi] picks before summing — the robust mean's preprocessing
    step that bounds heavy-tail influence. Percentile picks use
    discrete (percentile_disc) semantics on the collapsed (group,
    value) cumsum: the smallest value whose cumulative count reaches
    ceil(n · frac), with ceil as pure integer arithmetic
    ((n·frac + 1e6 − 1) div 1e6) — no float ranks anywhere.

    Same value-grain collapse as weighted_median/quantile_rank; the
    (group, lo, hi) bounds table is group-cardinality and broadcasts
    back for the clamped re-aggregation. Returns (group..., n, lo_q,
    hi_q, win_sum_q).
    """
    from pyspark.sql.window import Window

    g = list(group_cols)
    collapsed = df.groupBy(*g, value_q.alias("v")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_cum = (
        Window.partitionBy(*g).orderBy("v").rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    w_all = Window.partitionBy(*g)
    ranked = collapsed.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "n", F.sum("cnt").over(w_all)
    )
    rank_lo = F.expr(f"(n * {int(lo_frac_micros)} + 999999) div 1000000")
    rank_hi = F.expr(f"(n * {int(hi_frac_micros)} + 999999) div 1000000")
    bounds = ranked.groupBy(*g).agg(
        F.min(F.when(F.col("cum") >= rank_lo, F.col("v"))).alias("lo_q"),
        F.min(F.when(F.col("cum") >= rank_hi, F.col("v"))).alias("hi_q"),
        F.min("n").alias("n"),
    )
    clamped = df.select(*g, value_q.alias("v")).join(F.broadcast(bounds), g)
    win = F.least(F.greatest(F.col("v"), F.col("lo_q")), F.col("hi_q"))
    return (
        clamped.groupBy(*g)
        .agg(
            F.min("n").alias("n"),
            F.min("lo_q").alias("lo_q"),
            F.min("hi_q").alias("hi_q"),
            F.sum(win).alias("win_sum_q"),
        )
    )


def psi_drift(
    df: DataFrame,
    is_current,
    value_col: str = "value",
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    slice of one measure — the standard feature-drift monitor a
    production model gates on (PSI < 0.1 stable, > 0.25 drifted).
    Globally-aligned fixed-width bins (the value_histogram bounds
    idiom), add-one smoothing over the bin count so empty-on-one-side
    bins stay finite, and the per-bin contribution
    (p - q) * ln(p / q) floored to micro-units — the bigram_logprob
    precedent: floor is toward -inf in both engines, and the ln/
    division tree is evaluated in the identical operand order, so the
    DuckDB oracle replays the emitted integers exactly.

    Returns one row per occupied bin: (bin, n_ref, n_cur,
    psi_contrib_q); the headline PSI is the micro-unit sum. Two fact
    passes (bounds, counts); everything downstream is bins-sized.
    """
    v = F.col(value_col)
    valid = v.isNotNull()
    if isinstance(df.schema[value_col].dataType, (DoubleType, FloatType)):
        valid = valid & ~F.isnan(v)
    base = df.filter(valid).select(
        v.cast("double").alias("v"), is_current.alias("cur")
    )
    bounds = base.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / F.lit(float(n_bins))
    bin_raw = F.floor((F.col("v") - F.col("lo")) / width).cast("long")
    bin_ = (
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(F.least(bin_raw, F.lit(n_bins - 1)))
        .cast("long")
    )
    counts = (
        base.crossJoin(F.broadcast(bounds))
        .withColumn("bin", bin_)
        .groupBy("bin")
        .agg(
            F.sum(F.when(~F.col("cur"), 1).otherwise(0)).alias("n_ref"),
            F.sum(F.when(F.col("cur"), 1).otherwise(0)).alias("n_cur"),
        )
    )
    tot = counts.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    p = (F.col("n_ref") + 1).cast("double") / (
        F.col("t_ref") + n_bins
    ).cast("double")
    q = (F.col("n_cur") + 1).cast("double") / (
        F.col("t_cur") + n_bins
    ).cast("double")
    contrib = F.floor((p - q) * F.log(p / q) * F.lit(1_000_000.0)).cast("long")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select("bin", "n_ref", "n_cur", contrib.alias("psi_contrib_q"))
    )


def ks_two_sample(
    df: DataFrame,
    group_cols: list[str],
    is_current,
    value_q,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic per group,
    fraction-free: D = max_x |F_ref(x) − F_cur(x)| needs fractional
    ECDFs, but scaling by n_ref·n_cur keeps everything bigint:
    dev(x) = |n_cur·cumref(x) − n_ref·cumcur(x)|, D = max dev /
    (n_ref·n_cur). Both sides' counts collapse onto the MERGED value
    grid first (one conditional-sum aggregation), so the cumsum window
    runs at value cardinality partitioned by group — the
    weighted_median discipline. Reported as (group..., n_ref, n_cur,
    d_scaled, ks_micros, v_at_max) with ks_micros = floor(d_scaled ·
    1e6 / (n_ref·n_cur)) (non-negative integer div) and v_at_max the
    smallest value attaining the max."""
    from pyspark.sql.window import Window

    g = list(group_cols)
    collapsed = df.select(*g, value_q.alias("v"), is_current.alias("cur")).groupBy(
        *g, "v"
    ).agg(
        F.sum(F.when(~F.col("cur"), 1).otherwise(0)).alias("r"),
        F.sum(F.when(F.col("cur"), 1).otherwise(0)).alias("c"),
    )
    w_cum = (
        Window.partitionBy(*g).orderBy("v").rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    w_all = Window.partitionBy(*g)
    scored = (
        collapsed.withColumn("cumr", F.sum("r").over(w_cum))
        .withColumn("cumc", F.sum("c").over(w_cum))
        .withColumn("nr", F.sum("r").over(w_all))
        .withColumn("nc", F.sum("c").over(w_all))
        .withColumn(
            "dev",
            F.abs(F.col("nc") * F.col("cumr") - F.col("nr") * F.col("cumc")),
        )
    )
    return (
        scored.groupBy(*g)
        .agg(
            F.min("nr").alias("n_ref"),
            F.min("nc").alias("n_cur"),
            F.max(F.struct(F.col("dev"), (-F.col("v")).alias("nv"))).alias("m"),
        )
        .select(
            *g,
            "n_ref",
            "n_cur",
            F.col("m.dev").alias("d_scaled"),
            F.expr("(m.dev * 1000000) div (n_ref * n_cur)").alias("ks_micros"),
            (-F.col("m.nv")).alias("v_at_max"),
        )
    )


def mann_whitney_auc(
    df: DataFrame,
    group_cols: list[str],
    is_current,
    value_q,
) -> DataFrame:
    """Mann-Whitney U per group — identically the exact ROC-AUC of the
    value as a ref-vs-cur separator (U / (n_ref·n_cur)), the other
    standard nonparametric two-sample test beside KS. Fraction-free
    via DOUBLED midranks: a tied block after cum_before prior rows
    with cnt members has 2·midrank = 2·cum_before + cnt + 1, so
    2·R_ref = Σ_v r_v·(2·cumall_before + cntall + 1) and
    2·U = 2·R_ref − n_ref·(n_ref+1) stay bigint end-to-end; AUC
    reports in micros by non-negative integer division. Same
    value-grain collapse + per-group windows as ks_two_sample.

    Returns (group..., n_ref, n_cur, u_times2, auc_micros)."""
    from pyspark.sql.window import Window

    g = list(group_cols)
    collapsed = df.select(*g, value_q.alias("v"), is_current.alias("cur")).groupBy(
        *g, "v"
    ).agg(
        F.sum(F.when(~F.col("cur"), 1).otherwise(0)).alias("r"),
        F.sum(F.when(F.col("cur"), 1).otherwise(0)).alias("c"),
    )
    w_cum = (
        Window.partitionBy(*g).orderBy("v").rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    w_all = Window.partitionBy(*g)
    scored = (
        collapsed.withColumn("cnt", F.col("r") + F.col("c"))
        .withColumn("cumall", F.sum(F.col("r") + F.col("c")).over(w_cum))
        .withColumn("nr", F.sum("r").over(w_all))
        .withColumn("nc", F.sum("c").over(w_all))
        .withColumn(
            "rank2_contrib",
            F.col("r")
            * (2 * (F.col("cumall") - F.col("cnt")) + F.col("cnt") + 1),
        )
    )
    return (
        scored.groupBy(*g)
        .agg(
            F.min("nr").alias("n_ref"),
            F.min("nc").alias("n_cur"),
            F.sum("rank2_contrib").alias("r2"),
        )
        .select(
            *g,
            "n_ref",
            "n_cur",
            (F.col("r2") - F.col("n_ref") * (F.col("n_ref") + 1)).alias(
                "u_times2"
            ),
            F.expr(
                "((r2 - n_ref * (n_ref + 1)) * 1000000)"
                " div (2 * n_ref * n_cur)"
            ).alias("auc_micros"),
        )
    )


def correlation_pairs(
    df: DataFrame,
    cols_q: dict,
) -> DataFrame:
    """Exact Pearson-correlation building blocks for every column pair:
    corr² = num² / (den_x · den_y) with num = n·Σxy − Σx·Σy and
    den_c = n·Σc² − (Σc)², all DECIMAL(38,0)-exact from micro-unit
    integer inputs — the mergeable-sufficient-statistics form (one
    partial-agg pass computes every pair's sums; shards combine by
    addition; no IEEE ops in the contract, consumers divide at read
    time). ``cols_q`` maps name -> integer Column. Returns one row per
    unordered pair: (col_a, col_b, n, corr_num, den_a, den_b)."""
    names = sorted(cols_q)
    d38 = "decimal(38,0)"
    proj = df.select(*[cols_q[c].cast(d38).alias(c) for c in names])
    aggs = [F.count(F.lit(1)).cast(d38).alias("n")]
    for c in names:
        aggs.append(F.sum(F.col(c)).alias(f"s_{c}"))
        aggs.append(F.sum(F.col(c) * F.col(c)).alias(f"ss_{c}"))
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"sp_{a}_{b}"))
    from rat_strain_loader_pipeline_spark.staging import stage_to_parquet

    stats = stage_to_parquet(proj.agg(*aggs), "corr-stats")
    rows = []
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            rows.append(
                stats.select(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    F.col("n").cast("long").alias("n"),
                    (
                        F.col("n") * F.col(f"sp_{a}_{b}")
                        - F.col(f"s_{a}") * F.col(f"s_{b}")
                    )
                    .cast(d38)
                    .alias("corr_num"),
                    (
                        F.col("n") * F.col(f"ss_{a}")
                        - F.col(f"s_{a}") * F.col(f"s_{a}")
                    )
                    .cast(d38)
                    .alias("den_a"),
                    (
                        F.col("n") * F.col(f"ss_{b}")
                        - F.col(f"s_{b}") * F.col(f"s_{b}")
                    )
                    .cast(d38)
                    .alias("den_b"),
                )
            )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def grouped_ols(
    df: DataFrame,
    x,
    y,
    keys: list[str] | None = None,
) -> DataFrame:
    """Per-group closed-form simple linear regression (OLS).

    The grouped trend-fitting staple (per-domain length scaling,
    per-tenant cost curves): slope, intercept, and r² from the five
    exact moment sums, computed in ONE aggregation pass. ``x`` and
    ``y`` must be integer-valued columns; moments accumulate as
    DECIMAL(38,0) so partial aggregation is exact and mergeable at any
    scale. The final ratios convert each exact sum to double ONCE
    (named columns, fixed operand order) so the IEEE sequence is
    reproducible cross-engine, then floor to integer micros:

        slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
        intercept = (Σy·Σx² − Σx·Σxy) / (n·Σx² − (Σx)²)
        r²        = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²)(n·Σy² − (Σy)²))

    Groups with zero x-variance emit NULL slope/intercept/r² (vertical
    fit undefined); zero y-variance emits NULL r².

    100 TB shape: one map-side-combined groupBy — moment sums are the
    textbook mergeable statistic; nothing after the agg touches the
    fact table, and the ratio arithmetic runs on group-cardinality
    rows. Returns (keys..., n, slope_q, icept_q, r2_q).
    """
    keys = keys or []
    d38 = "decimal(38,0)"
    moments = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x.cast(d38)).alias("sx"),
        F.sum(y.cast(d38)).alias("sy"),
        F.sum((x.cast(d38) * x.cast(d38))).alias("sxx"),
        F.sum((x.cast(d38) * y.cast(d38))).alias("sxy"),
        F.sum((y.cast(d38) * y.cast(d38))).alias("syy"),
    )
    dbl = moments.select(
        *keys,
        "n",
        F.col("n").cast("double").alias("nd"),
        F.col("sx").cast("double").alias("sxd"),
        F.col("sy").cast("double").alias("syd"),
        F.col("sxx").cast("double").alias("sxxd"),
        F.col("sxy").cast("double").alias("sxyd"),
        F.col("syy").cast("double").alias("syyd"),
    )
    den = F.col("nd") * F.col("sxxd") - F.col("sxd") * F.col("sxd")
    num = F.col("nd") * F.col("sxyd") - F.col("sxd") * F.col("syd")
    deny = F.col("nd") * F.col("syyd") - F.col("syd") * F.col("syd")
    micros = F.lit(1_000_000.0)
    return dbl.select(
        *keys,
        "n",
        F.when(den != 0.0, F.floor(num / den * micros).cast("long")).alias(
            "slope_q"
        ),
        F.when(
            den != 0.0,
            F.floor(
                (F.col("syd") * F.col("sxxd") - F.col("sxd") * F.col("sxyd"))
                / den
                * micros
            ).cast("long"),
        ).alias("icept_q"),
        F.when(
            (den != 0.0) & (deny != 0.0),
            F.floor(num * num / (den * deny) * micros).cast("long"),
        ).alias("r2_q"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins for an integer-scored classifier.

    The model-monitoring staple paired with grouped AUC (mw_auc): bin
    rows by an INTEGER score (micros from a model head), count
    positives per bin, and emit the empirical positive rate — the
    curve a calibration plot draws. Because the score is integral the
    whole operator is pure integer arithmetic, bit-identical across
    engines: bounds from ONE 1-row min/max aggregate (broadcast), then

        bin = (score - lo) * n_bins div (hi - lo + 1)

    (non-negative operands, so truncating and flooring division agree;
    the +1 closes the max score into the last bin). ``pos_rate_q`` is
    ``n_pos * 1e6 div n``. A degenerate lo == hi corpus lands in bin 0.

    100 TB shape: two fact passes (bounds, then one map-side-combined
    groupBy on the bin id); bin cardinality is ``n_bins``, never
    fact-sized; the bounds row broadcasts. Returns
    (bin, lo_q, hi_q, n, n_pos, pos_rate_q) with lo_q/hi_q the global
    bounds carried through for plot axes.
    """
    s = F.col(score_col)
    bounds = df.agg(
        F.min(s).cast("long").alias("lo_q"), F.max(s).cast("long").alias("hi_q")
    )
    binned = (
        df.crossJoin(F.broadcast(bounds))
        .select(
            F.expr(
                f"({score_col} - lo_q) * {int(n_bins)}L"
                f" div (hi_q - lo_q + 1)"
            )
            .cast("long")
            .alias("bin"),
            "lo_q",
            "hi_q",
            F.col(label_col).cast("boolean").alias("y"),
        )
        .groupBy("bin", "lo_q", "hi_q")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("y"), 1).otherwise(0)).cast("long").alias("n_pos"),
        )
    )
    return binned.select(
        "bin",
        "lo_q",
        "hi_q",
        "n",
        "n_pos",
        F.expr("n_pos * 1000000L div n").cast("long").alias("pos_rate_q"),
    )


def kaplan_meier(
    subjects: DataFrame,
    cohort_col: str = "cohort",
    dur_col: str = "dur",
    observed_col: str = "observed",
) -> DataFrame:
    """Kaplan-Meier survival steps per cohort, integer-exact.

    The time-to-event summary behind retention/conversion curves:
    ``subjects`` has one row per subject with a non-negative integer
    duration and an observed flag (censored rows carry their censor
    time). The estimator at each distinct observed event time t is
    S(t) = prod_{t_i <= t} (1 - d_i / n_i); we emit the log-survival
    as a bigint (floored-ln micros per step, then a cumulative sum —
    integer-exact and mergeable, the repo's floored-ln idiom) instead
    of a float product.

    Risk sets without a self-join: aggregate subjects to the
    (cohort, dur) grain (m subjects, d observed), then a DESCENDING
    cumulative sum of m gives n_at_risk at each distinct duration —
    subjects censored exactly at t count as at-risk at t (the standard
    convention). Rows with d = 0 (pure-censoring times) are dropped
    after the risk window. If a step exhausts the risk set (d = n),
    S hits exact zero and ``logsurv_q`` is NULL from that step on
    (both sides gate on a cumulative max of the exhaustion flag).

    100 TB shape: the fact table collapses to subject grain upstream;
    this operator shuffles once on (cohort, dur) and runs two bounded
    windows on the distinct-duration grain — curve-sized, never
    subject-sized. Returns (cohort, dur, n_risk, d, logsurv_q).
    """
    from pyspark.sql.window import Window

    grain = subjects.groupBy(
        F.col(cohort_col).alias("cohort"), F.col(dur_col).alias("dur")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum(F.when(F.col(observed_col), 1).otherwise(0))
        .cast("long")
        .alias("d"),
    )
    w_desc = (
        Window.partitionBy("cohort")
        .orderBy(F.desc("dur"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    risk = grain.withColumn("n_risk", F.sum("m").over(w_desc)).filter(
        F.col("d") > 0
    )
    term = F.when(
        F.col("d") < F.col("n_risk"),
        F.floor(
            F.log(
                (F.col("n_risk") - F.col("d")).cast("double")
                / F.col("n_risk").cast("double")
            )
            * F.lit(1_000_000.0)
        ).cast("long"),
    )
    w_asc = (
        Window.partitionBy("cohort")
        .orderBy(F.asc("dur"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    stepped = risk.withColumn("term_q", term).withColumn(
        "dead", F.max((F.col("d") == F.col("n_risk")).cast("int")).over(w_asc)
    )
    return stepped.select(
        "cohort",
        "dur",
        "n_risk",
        "d",
        F.when(F.col("dead") == 0, F.sum("term_q").over(w_asc))
        .cast("long")
        .alias("logsurv_q"),
    )


def hhi_concentration(
    df: DataFrame,
    keys: list[str],
    item_col: str,
) -> DataFrame:
    """Herfindahl-Hirschman concentration index per group — the
    corpus-diversity alarm: how concentrated is each group's mass over
    ``item_col`` (a language dominated by one source scores near 1e6;
    an even 20-way mix scores 50_000). Integer end-to-end: per-item
    share in micros (c·1e6 div tot), squared-share terms scaled back
    by div 1e6, summed to ``hhi_q`` — both divisions on non-negative
    operands, so the oracle replays the identical truncation.

    100 TB shape: one (keys, item) partial agg collapses the corpus;
    the total/window and term sum run at item-combination grain.
    Returns (keys..., n_rows, n_items, hhi_q).
    """
    from pyspark.sql.window import Window

    counts = df.groupBy(*keys, item_col).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w = Window.partitionBy(*keys)
    shared = counts.withColumn("tot", F.sum("c").over(w)).withColumn(
        "term_q",
        F.expr("(c * 1000000L div tot) * (c * 1000000L div tot) div 1000000L"),
    )
    return shared.groupBy(*keys).agg(
        F.max("tot").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("term_q").cast("long").alias("hhi_q"),
    )


def gini_coefficient(
    df: DataFrame,
    keys: list[str],
    value_col: str,
) -> DataFrame:
    """Exact Gini inequality index per group over a non-negative
    integer measure — the distribution-inequality alarm beside HHI's
    item-share concentration (a corpus where 1% of users generate 95%
    of events scores near 1e6): the rank formulation

        G = (2·Σ i·x_(i) ) / (n·Σx) − (n+1)/n

    computed fraction-free in micros: gini_q =
    floor(2·S1·1e6 / (n·S)) − ((n+1)·1e6) div n, with S1 = Σ rank·value
    over values sorted ascending. Ranking ties is safe without a
    tiebreak: any permutation of equal values leaves the rank-value
    sum unchanged (the x_i inside a tie run are equal), so
    row_number on the value alone is deterministic in effect. All
    divisions are on non-negative operands (trunc == floor both
    engines). The 2·S1·1e6 div (n·S) term is computed in DECIMAL(38,0)
    (the grouped_ols precedent): S1 can reach n·S, so a bigint
    numerator would silently wrap once n·S exceeds ~4.6e12 — well
    inside the operator's claimed scale. Decimal `div` yields the
    exact integral quotient (≤ 2e6 here, so the long cast is safe);
    the oracle mirrors with HUGEINT `//`.

    100 TB shape: one groupBy collapses to the measured grain
    upstream; the rank window runs per group over group-member rows
    (bound the group or pre-aggregate to value-grain + weighted rank
    for heavy groups). Returns (keys..., n, sum_x, gini_q).
    """
    from pyspark.sql.window import Window

    ranked = df.select(*keys, F.col(value_col).alias("x")).withColumn(
        "i", F.row_number().over(Window.partitionBy(*keys).orderBy(F.asc("x")))
    )
    agg = ranked.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sum_x"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("i")).alias("s1d"),
    )
    return agg.select(
        *keys,
        "n",
        "sum_x",
        F.when(
            F.col("sum_x") > 0,
            F.expr(
                "(s1d * 2000000) div (CAST(n AS DECIMAL(38,0)) * sum_x)"
            )
            - F.expr("((n + 1) * 1000000L) div n"),
        )
        .cast("long")
        .alias("gini_q"),
    )


def peak_concurrency(
    df: DataFrame,
    keys: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Maximum overlapping intervals per group — the classic sweep:
    +1 at each start, −1 at each (exclusive) end, cumulative sum in
    boundary order, peak = max prefix. Boundary ties order ends
    BEFORE starts (delta ascending: −1 < +1), so back-to-back
    intervals [a,b) [b,c) never double-count — the exclusive-end
    convention, pinned identically in the oracle. Emits the peak and
    the EARLIEST boundary time achieving it (deterministic argmax via
    a (−peak, t) struct-min).

    100 TB shape: the sweep is one explode to 2 rows per interval +
    one group-keyed window over boundary-grain rows; for groups with
    billions of intervals, pre-collapse boundaries to (t, Σdelta)
    grain first (the window then runs at distinct-time grain) — done
    here unconditionally, which also makes the cumsum
    tie-independent. Returns (keys..., peak, peak_at).
    """
    from pyspark.sql.window import Window

    starts = df.select(
        *keys, F.col(start_col).alias("t"), F.lit(1).alias("delta")
    )
    ends = df.select(
        *keys, F.col(end_col).alias("t"), F.lit(-1).alias("delta")
    )
    bounds = (
        starts.unionByName(ends)
        .groupBy(*keys, "t")
        .agg(F.sum("delta").cast("long").alias("d"))
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    swept = bounds.withColumn("cur", F.sum("d").over(w))
    return (
        swept.groupBy(*keys)
        .agg(
            F.max(
                F.struct(F.col("cur"), (-F.col("t")).alias("nt"))
            ).alias("m")
        )
        .select(
            *keys,
            F.col("m.cur").cast("long").alias("peak"),
            (-F.col("m.nt")).cast("long").alias("peak_at"),
        )
    )


def bradley_terry_strengths(
    pairs: DataFrame,
    rounds: int = 3,
    item_a: str = "item_a",
    item_b: str = "item_b",
    wins_a: str = "wins_a",
    wins_b: str = "wins_b",
) -> DataFrame:
    """Bradley-Terry preference-strength fit over pairwise win counts —
    the canonical aggregation of RLHF / DPO preference data into a
    per-item (model, prompt-source, annotator) strength table, via the
    classic MM update (Hunter 2004, "MM algorithms for generalized
    Bradley-Terry models"):

        w_i  <-  W_i / sum_j n_ij / (w_i + w_j)

    run for a FIXED number of rounds in integer micros so every engine
    computes the identical bigints (the pagerank/kmeans/ewma
    bounded-rounds pattern): strengths start at 1e6 (w = 1); per round
    each pair contributes c_ij = (n_ij * 1e12) div (s_i + s_j) — the
    micro-scaled denominator term, exact integral quotient in
    DECIMAL(38,0) — and the update is
    s_i' = clamp((W_i * 1e12) div max(D_i, 1), 1, 1e12), D_i = sum c_ij.
    The [1, 1e12] clamp (w in [1e-6, 1e6]) is the standard
    regularization for degenerate items: an all-wins item's true MLE is
    infinite and an all-losses item's is zero — both would otherwise
    overflow/zero-divide in later rounds; the clamp keeps every round's
    arithmetic defined and both engines identical. Ties and ordering
    never matter: all aggregations are order-free integer sums.

    ``pairs`` must be at unordered-pair grain (item_a < item_b) with
    non-negative integer win counts; n_ij = wins_a + wins_b.

    100 TB shape: the pair table collapses to item-pair grain upstream
    (one shuffle); each round is one broadcast join of the ITEM-sized
    strength table onto the pair grain + one item-keyed partial agg,
    with a parquet staging barrier per round (vocab-sized state, the
    bpe_train pattern — nothing corpus-sized iterates). Returns
    (item, n_wins, n_games, strength_q).
    """
    from rat_strain_loader_pipeline_spark.staging import stage_to_parquet

    pg = (
        pairs.groupBy(item_a, item_b)
        .agg(
            F.sum(wins_a).cast("long").alias("wa"),
            F.sum(wins_b).cast("long").alias("wb"),
        )
        .withColumn("n", F.col("wa") + F.col("wb"))
    )
    pg = stage_to_parquet(pg, "bt-pairs")
    per_item = pg.select(
        F.col(item_a).alias("item"), F.col("wa").alias("w"), F.col("n").alias("g")
    ).unionByName(
        pg.select(
            F.col(item_b).alias("item"), F.col("wb").alias("w"), F.col("n").alias("g")
        )
    )
    wins = stage_to_parquet(
        per_item.groupBy("item").agg(
            F.sum("w").cast("long").alias("n_wins"),
            F.sum("g").cast("long").alias("n_games"),
        ),
        "bt-wins",
    )
    strengths = wins.select("item", F.lit(1_000_000).cast("long").alias("s"))
    for r in range(rounds):
        sa = strengths.select(F.col("item").alias(item_a), F.col("s").alias("s_a"))
        sb = strengths.select(F.col("item").alias(item_b), F.col("s").alias("s_b"))
        c = (
            pg.join(F.broadcast(sa), item_a)
            .join(F.broadcast(sb), item_b)
            .select(
                item_a,
                item_b,
                F.expr(
                    "CAST(n AS DECIMAL(38,0)) * 1000000000000 div (s_a + s_b)"
                ).alias("c"),
            )
        )
        # d stays DECIMAL(38,0): c can reach n_ij*1e12/2, so an item
        # with ~2e7+ total games overflows a LONG sum — the non-ANSI
        # cast would NULL and greatest(d, 1) would silently snap the
        # strength to the upper clamp. Clamp in decimal, cast last.
        d = (
            c.select(F.col(item_a).alias("item"), "c")
            .unionByName(c.select(F.col(item_b).alias("item"), "c"))
            .groupBy("item")
            .agg(
                F.sum(F.col("c").cast("decimal(38,0)")).alias("d")
            )
        )
        strengths = stage_to_parquet(
            wins.join(d, "item").select(
                "item",
                F.least(
                    F.greatest(
                        F.expr(
                            "CAST(n_wins AS DECIMAL(38,0)) * 1000000000000"
                            " div greatest(d, CAST(1 AS DECIMAL(38,0)))"
                        ),
                        F.lit(1).cast("long"),
                    ),
                    F.lit(1_000_000_000_000).cast("long"),
                ).alias("s"),
            ),
            f"bt-s{r + 1}",
        )
    return wins.join(strengths, "item").select(
        "item", "n_wins", "n_games", F.col("s").alias("strength_q")
    )


def cohens_kappa(
    df: DataFrame,
    keys: list[str],
    rater_a,
    rater_b,
) -> DataFrame:
    """Cohen's kappa inter-annotator agreement over two binary raters —
    the RLHF-label hygiene number beside preference_bias (length bias)
    and bt_strengths (strength fit): how much better than chance the
    two verdict sources agree. Exact integer algebra per group:

        po_num = #agreements,  pe_num = a1·b1 + (n−a1)·(n−b1)
        kappa  = (po − pe)/(1 − pe) = (po_num·n − pe_num)/(n² − pe_num)

    emitted as kappa_q = floor(num·1e6 / den) with all products in
    DECIMAL(38,0) (n² overflows bigint at ~3e9 rows/group) and the
    FLOOR division done via the pmod idiom — the numerator is signed
    (kappa < 0 = worse-than-chance), where Spark's `div` would
    truncate and diverge from DuckDB's `//`. NULL when den = 0 (a
    constant rater — kappa undefined).

    One map-side-combinable aggregate; group-sized output. Returns
    (keys..., n_pairs, n_agree, kappa_q).
    """
    base = df.select(
        *keys,
        rater_a.cast("int").alias("ra"),
        rater_b.cast("int").alias("rb"),
    )
    agg = base.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("ra").cast("long").alias("a1"),
        F.sum("rb").cast("long").alias("b1"),
        F.sum((F.col("ra") == F.col("rb")).cast("int"))
        .cast("long")
        .alias("n_agree"),
    )
    d = "CAST({} AS DECIMAL(38,0))"
    pe = (
        f"({d.format('a1')} * b1"
        f" + ({d.format('n_pairs')} - a1) * (CAST(n_pairs AS DECIMAL(38,0)) - b1))"
    )
    num = f"(({d.format('n_agree')} * n_pairs - {pe}) * 1000000)"
    den = f"({d.format('n_pairs')} * n_pairs - {pe})"
    return agg.select(
        *keys,
        "n_pairs",
        "n_agree",
        F.expr(
            f"CASE WHEN {den} > 0 THEN"
            f" CAST(({num} - pmod({num}, {den})) div {den} AS BIGINT) END"
        ).alias("kappa_q"),
    )


def target_encode_loo(
    df: DataFrame,
    keys: list[str],
    value_q,
    id_col: str,
) -> DataFrame:
    """Leave-one-out target encoding — the category→number feature map
    that doesn't leak the row's own label (plain mean encoding memorizes
    singleton categories; LOO excludes self):

        loo_q = (Σ_group y − y_i) · 1e6 div (n_group − 1)

    NULL for singleton groups (nothing to average). ``value_q`` must be
    a non-negative exact integer column (so trunc == floor both
    engines); the products run in DECIMAL(38,0) — a group sum times 1e6
    overflows bigint long before corpus scale.

    100 TB shape: one group-grain partial agg, then the group table
    (key-cardinality) broadcasts back onto the fact rows — map-side,
    no fact shuffle. Returns (keys..., id, y_q, loo_q).
    """
    g = df.groupBy(*keys).agg(
        F.sum(value_q).cast("decimal(38,0)").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    base = df.select(*keys, F.col(id_col), value_q.alias("y_q"))
    return base.join(F.broadcast(g), keys).select(
        *keys,
        id_col,
        "y_q",
        F.expr(
            "CASE WHEN n > 1 THEN"
            " CAST(((s - y_q) * 1000000) div (CAST(n AS DECIMAL(38,0)) - 1)"
            " AS BIGINT) END"
        ).alias("loo_q"),
    )


def quantile_normalize(
    df: DataFrame,
    keys: list[str],
    value_q,
) -> DataFrame:
    """Quantile normalization — map every group's value distribution
    onto the GLOBAL one (the batch-effect correction standard from
    expression-array statistics, equally the cross-source score
    calibration move in a corpus pipeline): a value at group percent
    rank p is replaced by the smallest global value whose global
    percent rank reaches p. Exact min-rank integer ranks
    (``quantile_rank``'s algebra) on BOTH sides, so the mapping is a
    pure integer inequality join.

    ``value_q`` must be an exact integer column at a BOUNDED value
    grain (bucket continuous measures first): both sides collapse to
    value grain before any window, and the mapping join is
    (group-values x global-values) — bounded by distinct-value counts,
    never row counts. Returns (keys..., v, n_rows, pr_q, v_norm).
    """
    from pyspark.sql.window import Window

    g = list(keys)
    grp = df.groupBy(*g, value_q.alias("v")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    w_cum = Window.partitionBy(*g).orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy(*g)
    grp = grp.withColumn(
        "minrank", F.sum("n_rows").over(w_cum) - F.col("n_rows") + 1
    ).withColumn("n", F.sum("n_rows").over(w_all))
    grp = grp.select(
        *g,
        "v",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.when(
            F.col("n") > 1, F.expr("((minrank - 1) * 1000000) div (n - 1)")
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("pr_q"),
    )
    glob = df.groupBy(value_q.alias("gv")).agg(F.count(F.lit(1)).alias("gn"))
    gw_cum = Window.orderBy("gv").rowsBetween(Window.unboundedPreceding, 0)
    gw_all = Window.partitionBy(F.lit(1))
    glob = glob.withColumn(
        "gminrank", F.sum("gn").over(gw_cum) - F.col("gn") + 1
    ).withColumn("gtot", F.sum("gn").over(gw_all))
    # MAX-rank percent rank on the global side: a tied global maximum
    # (gn > 1) must still reach gpr_q = 1e6, or every group cell whose
    # pr_q exceeds the min-rank percent of the top value would match no
    # global row and silently vanish from the inner mapping join.
    glob = glob.select(
        "gv",
        F.when(
            F.col("gtot") > 1,
            F.expr("((gminrank + gn - 2) * 1000000) div (gtot - 1)"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("gpr_q"),
    )
    return (
        grp.join(glob, F.col("gpr_q") >= F.col("pr_q"))
        .groupBy(*g, "v", "n_rows", "pr_q")
        .agg(F.min("gv").cast("long").alias("v_norm"))
    )


def interval_union_length(
    df: DataFrame,
    keys: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Total covered length of the UNION of [start, end) intervals per
    group — peak_concurrency's sibling question (that one asks how
    DEEP the overlap gets; this asks how MUCH of the axis is covered —
    uptime, listening time, sensor coverage). The classic sweep:
    intervals sorted by (start, end), each contributes
    greatest(0, e − greatest(s, max-end-so-far-before-this-row)); the
    per-group SUM is order-invariant within equal starts, so the pinned
    (s, e) ordering is for determinism of the plan, not the result.

    Multiplicity never matters to a union, so duplicates collapse
    FIRST — the window runs at distinct-interval grain (bound it
    further by pre-merging at a coarser grain if groups are
    pathological). All-integer. Returns (keys..., n_intervals,
    union_len).
    """
    from pyspark.sql.window import Window

    iv = df.select(
        *keys, F.col(start_col).alias("s"), F.col(end_col).alias("e")
    ).distinct()
    w = (
        Window.partitionBy(*keys)
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pmax = F.max("e").over(w)
    contrib = F.greatest(
        F.lit(0).cast("long"),
        F.col("e") - F.greatest(F.col("s"), F.coalesce(pmax, F.col("s"))),
    )
    return (
        iv.withColumn("c", contrib)
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
            F.sum("c").cast("long").alias("union_len"),
        )
    )


def ks_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov drift statistic per group vs
    the REST of the corpus — the distribution-shift monitor (is this
    source/shard/day drawing values from the same distribution as
    everything else?).

    Values collapse to the integer grid floor(v) first (the
    quantile_normalize domain); both ECDFs are step functions that only
    change at observed grid points, so the supremum is attained on the
    observed-value grid and the statistic is EXACT on that grid:
    d_scaled = max over grid v of |c_g(v)·n_rest − c_rest(v)·n_g| with
    every operand an exact non-negative integer in DECIMAL(38,0)
    (c·n products overflow bigint at corpus scale), and
    d_q = d_scaled·1e6 div (n_g·n_rest) — the classical D in micros,
    fraction-free.

    Shape: one groups×grid dense grid (groups are dimension-sized →
    broadcast cross join; the grid is value-cardinality-bounded like
    quantile_normalize's mapping table), one cumsum window per group,
    one broadcast of the global per-value cumulative counts. NULL/NaN
    values are excluded. Returns (group, n_grp, n_rest, d_scaled, d_q).
    """
    from pyspark.sql.window import Window

    v = F.col(value_col)
    base = df.filter(v.isNotNull() & ~F.isnan(v.cast("double"))).select(
        F.col(group_col).alias("g"), F.floor(v).cast("long").alias("v")
    )
    grps = base.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("n_grp"))
    vals = base.select("v").distinct()
    cnt = base.groupBy("g", "v").agg(F.count(F.lit(1)).cast("long").alias("c"))
    gcum = (
        base.groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("c_all"))
        .withColumn(
            "cum_all",
            F.sum("c_all").over(
                Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .select("v", "cum_all")
    )
    grid = vals.crossJoin(F.broadcast(grps))
    cum = (
        grid.join(cnt, ["g", "v"], "left")
        .withColumn(
            "cum_g",
            F.sum(F.coalesce("c", F.lit(0))).over(
                Window.partitionBy("g")
                .orderBy("v")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .join(F.broadcast(gcum), "v")
    )
    tot = base.agg(F.count(F.lit(1)).cast("long").alias("n_all"))
    diff = cum.crossJoin(F.broadcast(tot)).select(
        "g",
        "n_grp",
        (F.col("n_all") - F.col("n_grp")).alias("n_rest"),
        F.abs(
            F.col("cum_g").cast("decimal(38,0)")
            * (F.col("n_all") - F.col("n_grp"))
            - (F.col("cum_all") - F.col("cum_g")).cast("decimal(38,0)")
            * F.col("n_grp")
        ).alias("d_v"),
    )
    return (
        diff.groupBy("g", "n_grp", "n_rest")
        .agg(F.max("d_v").alias("d_scaled"))
        .select(
            F.col("g").alias(group_col),
            "n_grp",
            "n_rest",
            F.col("d_scaled").cast("decimal(38,0)").alias("d_scaled"),
            F.expr(
                "CASE WHEN n_rest > 0 THEN CAST((d_scaled * 1000000)"
                " div (CAST(n_grp AS DECIMAL(38,0)) * n_rest) AS BIGINT) END"
            ).alias("d_q"),
        )
    )


def kruskal_wallis(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Exact Kruskal-Wallis H — the k-group rank test (are these
    sources/shards drawing from the same value distribution?), the
    location-test sibling of ks_drift's shape test.

    Ranks use midranks for ties, carried in DOUBLED units so they stay
    integers (mid2 = 2·minrank + c − 1); every group rank sum R2_g is
    then exact. The per-group term R2_g²·1e6 div (4·n_g) is computed by
    the SPLIT QUOTIENT q·R2·1e6 + (rem·R2·1e6) div n (q = R2 div n,
    rem = R2 − q·n) — identical value to the direct floor, but no
    intermediate ever reaches R2² ≈ 4N⁴, so DECIMAL(38,0) holds to
    N ≈ 1e9 rows instead of 2e7. Then
        h_q    = (12·S4) div (N·(N+1)) − 3·(N+1)·1e6      (micros)
        tie_q  = ((N³−N) − Σ(c³−c))·1e6 div (N³−N)        (correction C)
        h_adj_q = h_q·1e6 div tie_q                        (two-step)
    — all integer ops, mirrored verbatim by the oracle. NULL h_adj_q
    when ties swallow everything (tie_q = 0). Values on the floor(v)
    grid; NULL/NaN excluded. Returns ONE row
    (n_total, n_groups, h_q, tie_q, h_adj_q).
    """
    from pyspark.sql.window import Window

    v = F.col(value_col)
    base = df.filter(v.isNotNull() & ~F.isnan(v.cast("double"))).select(
        F.col(group_col).alias("g"), F.floor(v).cast("long").alias("v")
    )
    cnt = base.groupBy("g", "v").agg(
        F.count(F.lit(1)).cast("long").alias("c_gv")
    )
    gl = (
        base.groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .withColumn(
            "minrank",
            F.sum("c").over(
                Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
            )
            - F.col("c")
            + 1,
        )
        .select(
            "v",
            "c",
            (F.lit(2) * F.col("minrank") + F.col("c") - 1).alias("mid2"),
        )
    )
    per_g = (
        cnt.join(F.broadcast(gl.select("v", "mid2")), "v")
        .groupBy("g")
        .agg(
            F.sum("c_gv").cast("decimal(38,0)").alias("n_g"),
            F.sum(F.col("c_gv").cast("decimal(38,0)") * F.col("mid2")).alias(
                "r2"
            ),
        )
    )
    terms = per_g.select(
        F.expr(
            "(r2 div n_g) * r2 * 1000000"
            " + ((r2 - (r2 div n_g) * n_g) * r2 * 1000000) div n_g"
        ).alias("t"),
    )
    # floor(floor(x)/4) == floor(x/4), so t div 4 is exactly
    # floor(R2²·1e6 / (4·n_g)) — the R_g = R2_g/2 halving, post-split
    s = terms.agg(F.sum(F.expr("t div 4")).alias("s4"))
    counts = base.agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("n_tot"))
    kgrp = per_g.agg(F.count(F.lit(1)).cast("long").alias("n_groups"))
    t3 = gl.agg(
        F.sum(
            F.col("c").cast("decimal(38,0)") * F.col("c") * F.col("c")
            - F.col("c")
        ).alias("t3")
    )
    return (
        s.crossJoin(F.broadcast(counts))
        .crossJoin(F.broadcast(kgrp))
        .crossJoin(F.broadcast(t3))
        .select(
            F.col("n_tot").cast("long").alias("n_total"),
            "n_groups",
            F.expr(
                "CAST((12 * s4) div (n_tot * (n_tot + 1))"
                " - 3 * (n_tot + 1) * 1000000 AS BIGINT)"
            ).alias("h_q"),
            F.expr(
                "CASE WHEN n_tot > 1 THEN CAST((((n_tot * n_tot * n_tot"
                " - n_tot) - t3) * 1000000) div (n_tot * n_tot * n_tot"
                " - n_tot) AS BIGINT) END"
            ).alias("tie_q"),
        )
        .select(
            "n_total",
            "n_groups",
            "h_q",
            "tie_q",
            F.expr(
                "CASE WHEN tie_q > 0 THEN CAST((CAST(h_q AS DECIMAL(38,0))"
                " * 1000000) div tie_q AS BIGINT) END"
            ).alias("h_adj_q"),
        )
    )
