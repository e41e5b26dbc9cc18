"""Count-Min sketch: bounded-memory frequency estimation.

The sketch an ingest pipeline keeps when exact per-key counts don't
fit: a depth x width grid of counters; key k increments cell
(i, h_i(k)) for each of the depth hash rows, and its estimate is the
MIN over those cells. Estimates never undercount (every cell the key
touches holds its true count plus nonneg collision mass) and overshoot
by more than (e/width) * N with probability only e^-depth per key
(Cormode & Muthukrishnan 2005).

Engine-reproducible by construction: the row hashes are
``sampling.md5_bucket`` (md5_number_lower % width — the repo's
engine-portable hash identity), and every counter is a bigint sum, so
a DuckDB oracle rebuilds the identical sketch and identical estimates
— value-exact, including the slack column and the (probabilistic,
therefore merely replayed, not asserted) bound boolean.

100 TB shape: the sketch IS the scale story — a depth x width bigint
grid (DEPTH x WIDTH rows here) built by one map-side partial
aggregation over the corpus, mergeable across partitions/streams by
cell-wise addition, broadcast to estimate any candidate set. Nothing
key-cardinality-sized ever shuffles for the sketch itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rat_strain_loader_pipeline_spark.operators.sampling import md5_bucket

E_OVER_W_NUM = 2.718281828459045  # e, the classical CMS bound constant


def _cms_cell(key: Column, row: int, width: int) -> Column:
    return md5_bucket(F.concat(F.lit(f"cms:{row}:"), key.cast("string")), width)


def count_min_sketch(
    df: DataFrame,
    key_col: str,
    depth: int,
    width: int,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Build the sketch: (i, b, cell) with cell = total occurrences of
    keys hashing to bucket b under row hash i. ONE scan of the input —
    the depth dimension is an inline array explode per row (the union
    formulation scanned the source depth times), then one partial-agg
    reduction to depth x width.

    ``counts``: an already-aggregated (key_col, n) table for the same
    input. The md5 row hash is a pure function of the KEY, so hashing
    each distinct key once and weighting its bucket by n is cell-wise
    identical to hashing every row — and costs |keys| x depth hashes
    instead of |rows| x depth. Callers that compute exact per-key
    counts anyway (the heavy-hitter contract check, the join-size
    report's degree tables) pass them in; the sketch itself stays the
    bounded-memory one-pass grid when they don't."""
    if counts is not None:
        rows = counts.select(
            F.col("n"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("i"),
                            _cms_cell(F.col(key_col), i, width).alias("b"),
                        )
                        for i in range(depth)
                    ]
                )
            ).alias("o"),
        ).select("n", "o.i", "o.b")
        return rows.groupBy("i", "b").agg(F.sum("n").alias("cell"))
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        _cms_cell(F.col(key_col), i, width).alias("b"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("o")
    ).select("o.i", "o.b")
    return rows.groupBy("i", "b").agg(F.count(F.lit(1)).alias("cell"))


def count_min_heavy_hitters(
    df: DataFrame,
    key_col: str,
    depth: int = 3,
    width: int = 64,
    topn: int = 20,
    sketch: DataFrame | None = None,
) -> DataFrame:
    """Estimate the exact top-``topn`` keys against the sketch and
    report the CMS contract per key: (key, exact_n, est_n, slack,
    over_ok, bound_ok) where slack = est_n - exact_n, over_ok is the
    DETERMINISTIC no-undercount guarantee (always true — a false here
    is a broken sketch), and bound_ok is the probabilistic
    slack <= ceil(e/width * N) envelope (expected true for all but
    ~e^-depth of keys; replayed, not asserted, by the oracle).

    The candidate set here is the exact top-n (the query is the
    contract demo); a 100 TB deployment feeds whatever candidate
    stream it has — the sketch answers any key in O(depth).

    ``sketch`` may be a prebuilt (i, b, cell) grid (e.g. one maintained
    incrementally by streaming.sketches) — cell-wise addition is the
    sketch's merge, so a grid summed from per-batch grids answers
    identically to one built in a single pass.
    """
    exact = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("exact_n"))
    if sketch is None:
        # the exact per-key counts are computed anyway for the contract
        # check — build the grid from them (hash per distinct key, not
        # per row; identical cells, and the repeated aggregate subtree
        # reuses one exchange)
        sketch = count_min_sketch(
            df, key_col, depth, width,
            counts=exact.select(key_col, F.col("exact_n").alias("n")),
        )
    # every hash row counts each input row once: sum_b cms[0][b] = N —
    # the bound's N comes from the grid, not another scan of df
    total = sketch.filter(F.col("i") == 0).agg(
        F.sum("cell").alias("n_total")
    )
    top = exact.orderBy(F.col("exact_n").desc(), F.col(key_col).asc()).limit(topn)
    # one pass over the candidate set: the depth probes explode inline
    # (the union formulation recomputed the exact-count top-n per row)
    probes = top.select(
        key_col,
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        _cms_cell(F.col(key_col), i, width).alias("b"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("o"),
    ).select(key_col, "exact_n", "o.i", "o.b")
    est = (
        probes.join(F.broadcast(sketch), ["i", "b"])
        .groupBy(key_col, "exact_n")
        .agg(F.min("cell").alias("est_n"))
    )
    bound = F.ceil(F.lit(E_OVER_W_NUM) / F.lit(float(width)) * F.col("n_total"))
    return (
        est.crossJoin(F.broadcast(total))
        .select(
            key_col,
            "exact_n",
            "est_n",
            (F.col("est_n") - F.col("exact_n")).alias("slack"),
            (F.col("est_n") >= F.col("exact_n")).alias("over_ok"),
            ((F.col("est_n") - F.col("exact_n")) <= bound).alias("bound_ok"),
        )
    )


def bloom_bits(keys: DataFrame, key_col: str, m: int, k: int) -> DataFrame:
    """Partitioned Bloom filter (Kirsch-Mitzenmacher layout: hash row i
    owns its own m-bit array, so (i, pos) membership is exact per row):
    returns the DISTINCT (i, pos) set bits for the key set. At most
    k * |keys| rows, bounded by k * m — broadcastable whenever the
    filter itself would be."""
    rows = keys.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        md5_bucket(
                            F.concat(
                                F.lit(f"bloom:{i}:"), F.col(key_col).cast("string")
                            ),
                            m,
                        ).alias("pos"),
                    )
                    for i in range(k)
                ]
            )
        ).alias("o")
    ).select("o.i", "o.pos")
    return rows.distinct()


def bloom_prune_report(
    fact: DataFrame,
    dim_keys: DataFrame,
    key_col: str,
    m: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Bloom semi-join pruning report: build the filter from
    ``dim_keys``, probe every distinct fact key (the Bloom test is a
    pure function of the key, so keys are tested once and the verdict
    fans back to rows through one hash join), and emit the single-row
    accounting a planner wants: total fact rows, rows passing the
    filter, true-match rows, false-positive rows, and the
    no-false-negative invariant (deterministic — a FALSE is a broken
    filter, since every true key's bits were set by construction).

    100 TB shape: the filter is <= k*m (i, pos) rows — built by one
    map-side-distinct pass over the dim and broadcast — so the fact's
    non-matching rows die in a map-side probe BEFORE the join shuffle;
    only matches + the false-positive sliver shuffle. The fp rate is
    the published (1 - e^(-n/m))^k trade-off; the exact join after the
    probe removes fps, so pruning never changes results.
    """
    bits = bloom_bits(dim_keys, key_col, m, k)
    fact_keys = fact.groupBy(key_col).agg(F.count(F.lit(1)).alias("n_rows"))
    # one pass over the aggregated fact keys (the union formulation
    # recomputed the fact groupBy k times)
    probes = fact_keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        md5_bucket(
                            F.concat(
                                F.lit(f"bloom:{i}:"), F.col(key_col).cast("string")
                            ),
                            m,
                        ).alias("pos"),
                    )
                    for i in range(k)
                ]
            )
        ).alias("o"),
    ).select(key_col, "o.i", "o.pos")
    passing = (
        probes.join(F.broadcast(bits), ["i", "pos"])
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("hits"))
        .filter(F.col("hits") == k)
        .select(key_col)
    )
    flags = (
        fact_keys.join(
            passing.withColumn("passed", F.lit(True)), key_col, "left"
        )
        .join(
            dim_keys.select(key_col).distinct().withColumn("true_m", F.lit(True)),
            key_col,
            "left",
        )
        .select(
            "n_rows",
            F.coalesce("passed", F.lit(False)).alias("passed"),
            F.coalesce("true_m", F.lit(False)).alias("true_m"),
        )
    )
    return flags.agg(
        F.sum("n_rows").alias("n_fact"),
        F.sum(F.when(F.col("passed"), F.col("n_rows")).otherwise(0)).alias("n_pass"),
        F.sum(F.when(F.col("true_m"), F.col("n_rows")).otherwise(0)).alias("n_true"),
        F.sum(
            F.when(F.col("passed") & ~F.col("true_m"), F.col("n_rows")).otherwise(0)
        ).alias("n_fp"),
        (
            F.sum(F.when(F.col("true_m") & ~F.col("passed"), 1).otherwise(0)) == 0
        ).alias("no_false_negatives"),
    )


def cms_join_size_report(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    depth: int = 3,
    width: int = 64,
) -> DataFrame:
    """Equi-join cardinality estimation from Count-Min sketches — the
    planner statistic that decides join strategy at 100 TB without
    touching either table twice: |A join B on k| = sum_k degA(k) *
    degB(k), and the sketch inner product min_i sum_b cmsA[i][b] *
    cmsB[i][b] NEVER undercounts it (every true pair lands in the same
    bucket of every row; collisions only add cross terms), with the
    standard e/width * N_a * N_b overshoot envelope (Cormode &
    Muthukrishnan 2005, join-size section).

    Emits one row: (exact_join, est_join, over_ok, bound_ok). Both
    sketches are depth x width bigint grids (broadcast-mergeable); the
    exact figure needs one shuffle over the key degrees — the thing
    the sketch exists to avoid, computed here only because it IS the
    contract check. Deterministic md5 row hashes, so the oracle
    rebuilds both grids and replays the estimate value-exact.
    """
    da = left.groupBy(key_col).agg(F.count(F.lit(1)).alias("da"))
    db = right.groupBy(key_col).agg(F.count(F.lit(1)).alias("db"))
    # grids from the degree tables (hash per distinct key, weighted by
    # its degree — cell-wise identical, |keys| x depth hashes instead
    # of |rows| x depth) — the degrees are needed for the exact figure
    # anyway, so the aggregate subtree is shared
    a = count_min_sketch(
        left, key_col, depth, width,
        counts=da.select(key_col, F.col("da").alias("n")),
    )
    b = count_min_sketch(
        right, key_col, depth, width,
        counts=db.select(key_col, F.col("db").alias("n")),
    )
    est = (
        a.join(b.withColumnRenamed("cell", "cell_b"), ["i", "b"])
        .groupBy("i")
        .agg(F.sum(F.col("cell") * F.col("cell_b")).alias("ip"))
        .agg(F.min("ip").alias("est_join"))
    )
    exact = da.join(db, key_col).agg(
        F.sum(F.col("da") * F.col("db")).alias("exact_join")
    )
    # N_a / N_b fall out of the grids themselves (each hash row counts
    # every input row exactly once, so sum_b cms[0][b] = N) — no extra
    # scan of either input for the bound
    na = a.filter(F.col("i") == 0).agg(F.sum("cell").alias("na"))
    nb = b.filter(F.col("i") == 0).agg(F.sum("cell").alias("nb"))
    bound = F.ceil(
        F.lit(E_OVER_W_NUM)
        / F.lit(float(width))
        * F.col("na").cast("double")
        * F.col("nb").cast("double")
    )
    return (
        exact.crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .select(
            "exact_join",
            "est_join",
            (F.col("est_join") >= F.col("exact_join")).alias("over_ok"),
            ((F.col("est_join") - F.col("exact_join")) <= bound).alias("bound_ok"),
        )
    )


def fixed_histogram(
    df: DataFrame,
    value_q: Column,
    n_bins: int,
    lo_q: int,
    hi_q: int,
) -> DataFrame:
    """Fixed-domain equal-width histogram — the exactly-MERGEABLE
    quantile state (unlike value_histogram's data-derived bounds, the
    bin edges here are constants, so the grid of a union is the
    cell-wise sum of the grids: the same linearity that makes a
    Count-Min grid streamable). ``value_q`` must be an integer
    micro-unit column; values clamp into [lo_q, hi_q], bin width =
    (hi_q - lo_q) div n_bins (choose a divisible domain), the top edge
    closes into the last bin. All-integer, one map-side-combinable
    aggregate. Returns (bin int, n bigint).
    """
    width = (hi_q - lo_q) // n_bins
    v = F.least(F.greatest(value_q, F.lit(lo_q)), F.lit(hi_q))
    # integer div on the non-negative offset (clamped to >= lo_q), not
    # float /: a double quotient can round up across an integer for
    # huge domains, misbinning vs the oracle's integer //.
    off = df.select((v - F.lit(lo_q)).cast("long").alias("off"))
    bin_ = F.least(
        F.expr(f"off div {width}"), F.lit(n_bins - 1)
    ).cast("int")
    return off.select(bin_.alias("bin")).groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def histogram_quantiles(
    grid: DataFrame,
    qs_micros: list[int],
    n_bins: int,
    lo_q: int,
    hi_q: int,
) -> DataFrame:
    """Rank-quantile answers from a ``fixed_histogram`` grid: for each
    q (in micros), rank = ceil(N·q / 1e6) (non-negative integer
    arithmetic, identical both engines) and the answer is the SMALLEST
    bin whose cumulative count reaches the rank — the bin-resolution
    quantile a mergeable fixed grid can answer exactly (the bin is
    exact; the value is bracketed by the bin edges, emitted in micros).
    Bins-sized math: one cumsum window over <= n_bins rows + one
    broadcast of the 1-row total. Returns
    (q_micros, rank, bin, bin_lo_q, bin_hi_q, cum_n).
    """
    from pyspark.sql.window import Window

    spark = grid.sparkSession
    width = (hi_q - lo_q) // n_bins
    total = grid.agg(F.sum("n").cast("long").alias("n_total"))
    cum = grid.withColumn(
        "cum_n",
        F.sum("n").over(
            Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    qdf = spark.createDataFrame([(int(q),) for q in qs_micros], "q_micros long")
    ranked = qdf.crossJoin(F.broadcast(total)).select(
        "q_micros",
        F.expr("(n_total * q_micros + 999999) div 1000000").alias("rank"),
    )
    hit = (
        ranked.join(cum, cum["cum_n"] >= ranked["rank"])
        .groupBy("q_micros", "rank")
        .agg(F.min("bin").cast("int").alias("bin"))
    )
    return (
        hit.join(cum.select("bin", "cum_n"), "bin")
        .select(
            "q_micros",
            "rank",
            "bin",
            (F.lit(lo_q) + F.col("bin").cast("long") * F.lit(width)).alias(
                "bin_lo_q"
            ),
            (F.lit(lo_q) + (F.col("bin") + 1).cast("long") * F.lit(width)).alias(
                "bin_hi_q"
            ),
            "cum_n",
        )
    )


def _hll_est_sql(m: int) -> str:
    """The HLL estimator as ONE double expression tree, written with
    every literal explicitly CAST to DOUBLE so both engines parse pure
    IEEE arithmetic (bare 0.7213 parses as DECIMAL in Spark AND DuckDB,
    with different division rules): raw = alpha_m * m^2 * 2^53 /
    s_scaled, small-range linear counting m * ln(m / V) when the
    classical E <= 2.5m gate fires and empty registers exist
    (Flajolet et al. 2007). Shared verbatim by the engine expression
    and the DuckDB oracle — the fixed-IEEE-tree discipline."""
    alpha = (
        f"CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)"
        f" + CAST(1.079 AS DOUBLE) / CAST({m}.0 AS DOUBLE))"
    )
    raw = (
        f"{alpha} * CAST({m}.0 AS DOUBLE) * CAST({m}.0 AS DOUBLE)"
        f" * CAST(9007199254740992.0 AS DOUBLE) / CAST(s_scaled AS DOUBLE)"
    )
    linear = f"CAST({m}.0 AS DOUBLE) * ln(CAST({m}.0 AS DOUBLE) / CAST(v_zero AS DOUBLE))"
    gate = (
        f"v_zero > 0 AND {raw} <= CAST(2.5 AS DOUBLE) * CAST({m}.0 AS DOUBLE)"
    )
    return (
        f"CAST(floor((CASE WHEN {gate} THEN {linear} ELSE {raw} END)"
        f" * CAST(1000000.0 AS DOUBLE)) AS BIGINT)"
    )


def _hll_gate_sql(m: int) -> str:
    """The linear-counting gate alone (used_linear flag)."""
    alpha = (
        f"CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)"
        f" + CAST(1.079 AS DOUBLE) / CAST({m}.0 AS DOUBLE))"
    )
    raw = (
        f"{alpha} * CAST({m}.0 AS DOUBLE) * CAST({m}.0 AS DOUBLE)"
        f" * CAST(9007199254740992.0 AS DOUBLE) / CAST(s_scaled AS DOUBLE)"
    )
    return f"(v_zero > 0 AND {raw} <= CAST(2.5 AS DOUBLE) * CAST({m}.0 AS DOUBLE))"


def hll_registers(df: DataFrame, key_col: str, p: int = 8) -> DataFrame:
    """HyperLogLog register table (sparse): m = 2^p registers; key k
    lands in register md5 % m with rank rho = leading-zeros(52-bit
    md5 value) + 1, register value = max rho. Engine-reproducible by
    construction: both hashes are the repo's md5_number_lower identity
    and rho is 53 - bitlength (exact integer via bin()), so a DuckDB
    oracle rebuilds the identical registers. Returns (i, reg) for the
    occupied registers only (empty register == 0 by convention).

    The registers are MAX-MERGEABLE: registers(A ∪ B) =
    element-wise max(registers(A), registers(B)) — the streaming twin
    appends per-batch registers and maxes. One map-side partial-max
    aggregation over the corpus; nothing key-cardinality-sized ever
    shuffles (the whole point vs exact COUNT DISTINCT at 100 TB)."""
    from rat_strain_loader_pipeline_spark.operators.sampling import md5_mod

    m = 1 << p
    key = F.col(key_col).cast("string")
    v = md5_mod(F.concat(F.lit("hll:val:"), key), 1 << 52)
    rho = F.when(v == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.bin(v)).cast("int")
    )
    return (
        df.select(
            md5_mod(F.concat(F.lit("hll:idx:"), key), m).cast("int").alias("i"),
            rho.cast("int").alias("reg"),
        )
        .groupBy("i")
        .agg(F.max("reg").alias("reg"))
    )


def hll_estimate(registers: DataFrame, p: int = 8) -> DataFrame:
    """Cardinality estimate from an HLL register table (built in one
    pass or max-merged from many): s_scaled = sum over ALL m registers
    of 2^(53 - reg) (empty registers contribute 2^53; max total
    m * 2^53 = 2^61 stays in bigint), then the classical raw /
    linear-counting estimator in one fixed IEEE double tree. Returns
    one row (n_registers, v_zero, s_scaled, est_q, used_linear)."""
    m = 1 << p
    agg = registers.agg(
        F.count(F.lit(1)).cast("long").alias("n_registers"),
        F.coalesce(
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 53 - reg)")), F.lit(0)
        )
        .cast("long")
        .alias("s_present"),
    )
    return agg.select(
        "n_registers",
        (F.lit(m) - F.col("n_registers")).cast("long").alias("v_zero"),
        (
            F.col("s_present")
            + (F.lit(m) - F.col("n_registers"))
            * F.lit(1 << 53).cast("long")
        ).alias("s_scaled"),
    ).select(
        "n_registers",
        "v_zero",
        "s_scaled",
        F.expr(_hll_est_sql(m)).alias("est_q"),
        F.expr(_hll_gate_sql(m)).alias("used_linear"),
    )


def hll_registers_by(
    df: DataFrame, group_col: str, key_col: str, p: int = 8
) -> DataFrame:
    """Per-group HLL registers — one sketch per window/shard/day:
    (group, i, reg) sparse, same identities as ``hll_registers``. The
    state is groups × 2^p rows regardless of key cardinality, which is
    what makes a per-window distinct monitor affordable where per-window
    dropDuplicates state is not."""
    from rat_strain_loader_pipeline_spark.operators.sampling import md5_mod

    m = 1 << p
    key = F.col(key_col).cast("string")
    v = md5_mod(F.concat(F.lit("hll:val:"), key), 1 << 52)
    rho = F.when(v == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.bin(v)).cast("int")
    )
    return (
        df.select(
            F.col(group_col).alias("g"),
            md5_mod(F.concat(F.lit("hll:idx:"), key), m).cast("int").alias("i"),
            rho.cast("int").alias("reg"),
        )
        .groupBy("g", "i")
        .agg(F.max("reg").alias("reg"))
    )


def hll_estimate_by(registers: DataFrame, p: int = 8) -> DataFrame:
    """Per-group cardinality estimates from a (g, i, reg) register
    table: the same s_scaled fold and fixed IEEE estimator tree as
    ``hll_estimate``, one row per group."""
    m = 1 << p
    agg = registers.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_registers"),
        F.coalesce(
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 53 - reg)")), F.lit(0)
        )
        .cast("long")
        .alias("s_present"),
    )
    return agg.select(
        "g",
        "n_registers",
        (F.lit(m) - F.col("n_registers")).cast("long").alias("v_zero"),
        (
            F.col("s_present")
            + (F.lit(m) - F.col("n_registers")) * F.lit(1 << 53).cast("long")
        ).alias("s_scaled"),
    ).select(
        "g",
        "n_registers",
        "v_zero",
        "s_scaled",
        F.expr(_hll_est_sql(m)).alias("est_q"),
        F.expr(_hll_gate_sql(m)).alias("used_linear"),
    )
