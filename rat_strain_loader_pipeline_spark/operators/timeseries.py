"""Time-series densification and trailing-range windows.

Extension operators (no reference twin — the reference is batch ETL with
no time dimension; `ConservationScoreLoader.java:100-140` is the closest
analog, a dense per-base series, which motivates the same densify shape).
These cover the two standard gaps a training-data/telemetry pipeline
hits that plain groupBy windows don't:

- ``gap_fill``: densify a keyed hourly (or any fixed-step) series over
  the full observed range, zero-filling counts and carrying the last
  observed value forward (LOCF).
- ``trailing_range``: exact trailing-window aggregates over event time
  (RANGE frame on the epoch), e.g. 24 h rolling sums, without
  self-joining the series against itself.

100 TB shape
------------
The dense grid is ``n_keys x n_steps`` — bounded by the calendar and the
key cardinality, NOT by the event count. ``gap_fill`` scans the fact
table exactly ONCE (the pre-aggregation), stages the collapsed series
(series-sized parquet, lineage truncation), and builds the grid —
bounds, key list, the join's left side — from that staged series; the
1-row bounds agg, ``sequence``/``explode``, and broadcast key list are
all series-sized work. The only real shuffle is the left join of the
grid onto the series, keyed on (key, step). The LOCF window
partitions per key; its length is the number of steps in the range (a
calendar bound), so no partition grows with data volume. For
multi-year × million-key grids, partition the window by (key, coarse
bucket) and stitch with a per-bucket last — not needed at these bounds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def gap_fill(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    aggs: dict[str, Column],
    zero_fill: list[str] | None = None,
    locf: list[str] | None = None,
) -> DataFrame:
    """Hourly aggregate ``df`` per (keys, hour), then densify the series.

    ``aggs`` maps output column -> aggregate expression. Columns named in
    ``zero_fill`` become 0 on missing hours; columns in ``locf`` carry the
    last non-null observation forward (null until first observation) and
    are RENAMED to ``filled_<name>`` in the output (the raw column name
    would misleadingly suggest observed-only values); ``zero_fill``
    columns keep their names. Returns one row per (keys..., hour) over
    the full observed range.

    The fact table is scanned once: the collapsed series is staged, and
    the grid (bounds + distinct keys) derives from the staged series,
    not the raw facts."""
    from rat_strain_loader_pipeline_spark.staging import stage_to_parquet

    zero_fill = zero_fill or []
    locf = locf or []
    hour = F.date_trunc("hour", F.col(ts_col)).alias("hour")
    series = stage_to_parquet(
        df.groupBy(*keys, hour).agg(
            *[expr.alias(name) for name, expr in aggs.items()]
        ),
        "gapfill-series",
    )
    bounds = series.agg(F.min("hour").alias("lo"), F.max("hour").alias("hi"))
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    grid = hours.crossJoin(F.broadcast(series.select(*keys).distinct()))
    dense = grid.join(series, on=[*keys, "hour"], how="left")
    out_cols: list[Column] = [F.col(k) for k in keys] + [F.col("hour")]
    w = (
        Window.partitionBy(*keys)
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for name in aggs:
        if name in zero_fill:
            out_cols.append(F.coalesce(F.col(name), F.lit(0)).alias(name))
        elif name in locf:
            out_cols.append(F.last(name, ignorenulls=True).over(w).alias(f"filled_{name}"))
        else:
            out_cols.append(F.col(name))
    return dense.select(*out_cols)


def trailing_range(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    aggs: dict[str, Column],
    trailing_seconds: int,
) -> DataFrame:
    """Exact trailing event-time window: for each row, aggregate all rows
    of the same key with ``ts in [ts - trailing_seconds, ts]`` (inclusive
    bounds, matching SQL ``RANGE BETWEEN <interval> PRECEDING AND
    CURRENT ROW``).

    RANGE frame over the epoch second — one shuffle on ``keys``, no
    self-join, no step explosion (frames are resolved by Spark's window
    exec against the sorted run). ``aggs`` values must be bare aggregate
    expressions (the window frame attaches via ``.over``; a cast or
    arithmetic wrapper would detach it — wrap in a later select
    instead)."""
    epoch = F.unix_timestamp(F.col(ts_col))
    w = (
        Window.partitionBy(*keys)
        .orderBy(epoch)
        .rangeBetween(-trailing_seconds, 0)
    )
    out = df
    for name, expr in aggs.items():
        out = out.withColumn(name, expr.over(w))
    return out


def cusum_change_point(
    df: DataFrame,
    group_cols: list[str],
    bucket: Column,
    value_q: Column,
) -> DataFrame:
    """CUSUM mean-shift detection per group, fraction-free: over the
    per-bucket sums h_i, the classic statistic is cumsum(h) - t·mean,
    which needs a fractional mean — multiplying through by the bucket
    count T keeps everything bigint: dev_t = T·cumsum(h_1..h_t) -
    t·H_total. The change point is the bucket maximizing |dev_t|
    (earliest bucket on ties). A shift in level makes |dev| peak at
    the shift; a stationary series keeps it near zero.

    Shape: one partial-agg reduction to (group, bucket) grain, then
    windows over the BUCKET series (hundreds of rows per group, not
    corpus rows) — the aggregate-then-analyze pattern that makes
    time-series scans 100 TB-safe. Returns (group..., cp_bucket,
    dev_abs, n_buckets).
    """
    g = list(group_cols)
    # a bucket whose every value is NULL sums to NULL — pin it to 0 so
    # the window cumsum/dev stay non-null (oracle mirrors the coalesce)
    hourly = df.groupBy(*g, bucket.alias("b")).agg(
        F.coalesce(F.sum(value_q), F.lit(0)).alias("h")
    )
    w_cum = (
        Window.partitionBy(*g).orderBy("b").rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    w_all = Window.partitionBy(*g)
    scored = (
        hourly.withColumn("cum", F.sum("h").over(w_cum))
        .withColumn("t", F.row_number().over(Window.partitionBy(*g).orderBy("b")))
        .withColumn("tt", F.count(F.lit(1)).over(w_all))
        .withColumn("htot", F.sum("h").over(w_all))
        .withColumn(
            "dev",
            F.abs(F.col("tt") * F.col("cum") - F.col("t") * F.col("htot")),
        )
    )
    return (
        scored.groupBy(*g)
        .agg(
            F.max(F.struct(F.col("dev"), (-F.col("b")).alias("nb"))).alias("m"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
        .select(
            *g,
            (-F.col("m.nb")).alias("cp_bucket"),
            F.col("m.dev").alias("dev_abs"),
            "n_buckets",
        )
    )


def markov_transitions(
    df: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """First-order Markov transition matrix over per-key event streams.

    The sequence-model summary behind churn/funnel diagnostics and
    synthetic-trace generation: for each key, order events by
    ``order_cols`` (the last column must be unique so ``lead`` is
    deterministic), pair each event type with its successor, and count
    (from_type, to_type) transitions. Probabilities are row-normalized
    integer micros computed with pure bigint arithmetic
    (``n * 1_000_000 div row_total`` — both operands positive, so
    truncating and flooring division agree across engines).

    100 TB shape: ONE shuffle on ``key_col`` for the lead() window
    (the same partitioning any sessionization pass already uses), then
    a (from, to) partial aggregation whose cardinality is event-type²
    — never fact-sized. The row-total window runs on that tiny
    aggregate, not on events. Returns (from_type, to_type, n, prob_q).
    """
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    pairs = (
        df.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        F.expr("n * 1000000L div sum(n) over (partition by from_type)")
        .cast("long")
        .alias("prob_q"),
    )


def ewma_smooth(
    df: DataFrame,
    key_col: str = "event_type",
    bucket_col: str = "hour_bucket",
    value_col: str = "v",
) -> DataFrame:
    """Integer-exact EWMA (alpha = 1/2) over keyed bucket series, with
    one-step-ahead residuals.

    The linear recurrence s_t = floor((v_t·1e6 + s_{t-1}) / 2),
    s_1 = v_1·1e6 — the halving EWMA whose floor at every step keeps
    the whole state machine in bigints (no float drift to accumulate
    across a year of buckets). The recurrence is inherently sequential,
    so it runs per key via ``applyInPandas`` — but ONLY on the
    pre-aggregated bucket series (bounded by the calendar), never on
    fact rows: the aggregate-then-analyze shape that keeps the Python
    stage thousands of rows per key at any corpus size. ``resid_q`` is
    the one-step-ahead forecast error v_t·1e6 − s_{t-1} (NULL at the
    first bucket) — the anomaly signal an EWMA monitor alerts on.

    100 TB shape: one (key, bucket) partial agg upstream collapses the
    corpus; the applyInPandas shuffle moves series-sized rows keyed by
    ``key_col``; the lag window for residuals runs on the same grain.
    Returns (key, bucket, v, s_q, resid_q).
    """
    import pandas as pd

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(bucket_col).reset_index(drop=True)
        s: list[int] = []
        prev: int | None = None
        for v in pdf[value_col]:
            vq = int(v) * 1_000_000
            prev = vq if prev is None else (vq + prev) // 2
            s.append(prev)
        pdf["s_q"] = pd.Series(s, dtype="int64")
        return pdf

    series = df.groupBy(key_col, bucket_col).agg(
        F.sum(value_col).cast("long").alias(value_col)
    )
    # Key/bucket field types come from the actual series schema — the
    # operator accepts arbitrary key/bucket columns, so hardcoding
    # string/long here would fail Arrow conversion for other types.
    key_t = series.schema[key_col].dataType.simpleString()
    bucket_t = series.schema[bucket_col].dataType.simpleString()
    schema = (
        f"{key_col} {key_t}, {bucket_col} {bucket_t}, {value_col} long, s_q long"
    )
    smoothed = series.groupBy(key_col).applyInPandas(smooth, schema=schema)
    w = Window.partitionBy(key_col).orderBy(bucket_col)
    return smoothed.select(
        key_col,
        bucket_col,
        value_col,
        "s_q",
        (F.col(value_col) * F.lit(1_000_000) - F.lag("s_q").over(w))
        .cast("long")
        .alias("resid_q"),
    )


def acf_daily(
    df: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    lags: tuple[int, ...] = (1, 7),
) -> DataFrame:
    """Exact lag-k autocorrelation of the DENSE daily-count series per
    group — the seasonality/memory diagnostic beside cusum_change_point
    (lag 7 ≈ weekly rhythm, lag 1 ≈ persistence). The series densifies
    over each group's [min_day, max_day] with zero fill (a gap IS a
    zero-count observation; skipping gaps would silently shift lags),
    then for each lag the Pearson r over pairs (x_t, x_{t+k}) is
    assembled from exact integer sums: n, Σx, Σy, Σxx, Σyy, Σxy in
    DECIMAL(38,0), num = n·Σxy − Σx·Σy, den = (n·Σxx − Σx²)(n·Σyy − Σy²),
    and ONLY the final r = num/√den runs through one fixed IEEE tree in
    micros. NULL when either variance leg is ≤ 0 (constant series).

    Shape: day-grain collapse first (the corpus-sized pass), then the
    dense series is groups×days rows; each lag is one self-equi-join on
    (group, day+k). Returns (group, lag, n, r_q).
    """
    from pyspark.sql import functions as F

    daily = (
        df.select(
            F.col(group_col).alias("g"),
            F.expr(f"unix_timestamp({ts_col}) div 86400").alias("day"),
        )
        .groupBy("g", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    spans = daily.groupBy("g").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    dense = (
        spans.select(
            "g", F.explode(F.expr("sequence(d0, d1)")).alias("day")
        )
        .join(daily, ["g", "day"], "left")
        .select("g", "day", F.coalesce("n", F.lit(0)).alias("x"))
    )
    from rat_strain_loader_pipeline_spark.staging import stage_to_parquet

    dense = stage_to_parquet(dense, "acf-dense")
    out = None
    for k in lags:
        a = dense.select("g", "day", F.col("x").alias("xa"))
        b = dense.select(
            "g", (F.col("day") - k).alias("day"), F.col("x").alias("xb")
        )
        agg = (
            a.join(b, ["g", "day"])
            .groupBy("g")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("xa").cast("decimal(38,0)").alias("sx"),
                F.sum("xb").cast("decimal(38,0)").alias("sy"),
                F.sum(F.col("xa").cast("decimal(38,0)") * F.col("xa")).alias("sxx"),
                F.sum(F.col("xb").cast("decimal(38,0)") * F.col("xb")).alias("syy"),
                F.sum(F.col("xa").cast("decimal(38,0)") * F.col("xb")).alias("sxy"),
            )
        )
        r = agg.select(
            F.col("g"),
            F.lit(k).cast("int").alias("lag"),
            "n",
            F.expr(
                "CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0"
                " THEN CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)"
                "   / sqrt(CAST((n * sxx - sx * sx) * (n * syy - sy * sy)"
                "          AS DOUBLE)) * 1000000) AS BIGINT) END"
            ).alias("r_q"),
        )
        out = r if out is None else out.unionByName(r)
    return out.select(F.col("g").alias(group_col), "lag", "n", "r_q")
