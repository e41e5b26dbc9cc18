"""Spectral analysis over staged Gram matrices.

``similarity.embedding_gram`` reduces the corpus to the exact integer
sufficient statistic XᵀX once (dims²-sized, broadcastable at any corpus
scale); everything here consumes THAT table, never the corpus — the
100 TB contract is that adding a spectral question costs zero
additional corpus scans.

The iteration itself runs on the DRIVER over the collected dims²-row
matrix in arbitrary-precision Python integers. That collect is bounded
by the embedding dimension (64² rows here), not the corpus — the same
dimension-sized-state exemption as the broadcast bounds and the
per-round BPE argmax — and it is the honest architecture: a production
ANN/PCA trainer (FAISS et al.) iterates small dense eigenproblems
locally after one distributed reduction pass. Python ints replay the
DECIMAL(38,0)/HUGEINT algebra exactly; the only care point is integral
division, which Spark ``div`` and DuckDB ``//`` TRUNCATE TOWARD ZERO on
signed operands (verified) while Python ``//`` floors — ``_tdiv``
spells out the truncating quotient.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICROS = 1_000_000


def _tdiv(a: int, b: int) -> int:
    """Integral quotient truncated toward zero — the Spark ``div`` /
    DuckDB ``//`` semantics (Python ``//`` floors, which differs on
    negative operands)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def gram_power_iteration(
    gram: DataFrame,
    rounds: int = 5,
) -> DataFrame:
    """Top principal component of a corpus from its Gram matrix
    (``similarity.embedding_gram`` output: upper-triangle
    (dim_i, dim_j, gram DECIMAL(38,0), n_vecs)) via ``rounds`` of
    power iteration, plus the Rayleigh-quotient explained-variance
    share — the canonical consumer of the PCA sufficient statistic.

    Recurrence (all exact integers, unrolled-oracle-replayable):
        v₀[d]  = 1e6                      (uniform start, sign-free)
        w      = G·v                      (exact integer matvec)
        v'     = (w · 1e6) div max|w|     (L∞ micros normalization)
    After the last round one more G·v gives the Rayleigh numerator
    vᵀGv (≥ 0 exactly — G = XᵀX is PSD for ANY integer v) and
        ev_q = ((vᵀGv div vᵀv) · 1e6) div trace(G)
    the top component's explained-variance share in micros (the
    two-step quotient is deliberate: a single-step scaled division
    would overflow DECIMAL(38,0) at corpus scale; the DuckDB oracle
    replays the identical two steps so parity is exact). Degenerate
    zero Gram (max|w| = 0) yields NULL components and NULL ev_q.

    100 TB shape: the corpus is consumed ONCE (the distributed Gram
    pass); the collected state and every iteration are dims²-bounded —
    constant work regardless of corpus size. Returns
    (dim int, v_q bigint, ev_q bigint), one row per dimension.
    """
    rows = gram.select("dim_i", "dim_j", "gram").collect()  # dims² rows
    if not rows:
        return gram.sparkSession.createDataFrame(
            [], "dim int, v_q long, ev_q long"
        )
    g: dict[tuple[int, int], int] = {}
    dims_set: set[int] = set()
    for r in rows:
        i, j, val = int(r["dim_i"]), int(r["dim_j"]), int(r["gram"])
        g[(i, j)] = val
        if i != j:
            g[(j, i)] = val
        dims_set.add(i)
        dims_set.add(j)
    dims = sorted(dims_set)

    def matvec(v: dict[int, int]) -> dict[int, int]:
        return {
            i: sum(g.get((i, j), 0) * v[j] for j in dims) for i in dims
        }

    v: dict[int, int | None] = {d: MICROS for d in dims}
    degenerate = False
    for _ in range(rounds):
        w = matvec(v)
        mx = max(abs(x) for x in w.values())
        if mx == 0:
            degenerate = True
            break
        v = {d: _tdiv(w[d] * MICROS, mx) for d in dims}
    if degenerate:
        out = [(int(d), None, None) for d in dims]
    else:
        gv = matvec(v)
        num = sum(v[d] * gv[d] for d in dims)
        den = sum(v[d] * v[d] for d in dims)
        trace = sum(g.get((d, d), 0) for d in dims)
        ev = (
            _tdiv(_tdiv(num, den) * MICROS, trace)
            if den > 0 and trace > 0
            else None
        )
        out = [(int(d), int(v[d]), ev) for d in dims]
    return gram.sparkSession.createDataFrame(
        out, "dim int, v_q long, ev_q long"
    )


def pca_project_extremes(
    embeddings: DataFrame,
    component: DataFrame,
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Principal-direction outlier audit — the projection consumer of
    ``gram_power_iteration``: score every vector by its exact integer
    dot product with the micros eigenvector (proj = Σ floor(x·1e6)·v_q,
    bounded by dims·1e12 so bigint holds at any corpus size) and emit
    the ``topk`` most-positive and most-negative documents per side —
    what a curation pass actually reads to see WHAT the top component
    separates.

    The eigenvector collects to the driver (dims-sized exemption) and
    is inlined as literal coefficients in ONE codegen projection — the
    maxsim lesson: no join, no shuffle; the corpus pass is a scan +
    two TakeOrdered heaps. A degenerate component (NULL v_q from a
    zero Gram) yields an empty result rather than garbage scores.
    Returns (side, id_col, proj_q) with deterministic id tiebreaks.
    """
    rows = component.select("dim", "v_q").collect()  # dims-sized
    spark = embeddings.sparkSession
    if not rows or any(r["v_q"] is None for r in rows):
        return spark.createDataFrame([], f"side string, {id_col} long, proj_q long")
    v = [int(r["v_q"]) for r in sorted(rows, key=lambda r: int(r["dim"]))]
    arr = "array({})".format(
        ", ".join(f"CAST({x} AS BIGINT)" for x in v)
    )
    proj = F.expr(
        f"aggregate(zip_with({vec_col}, {arr},"
        f" (x, c) -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) * c),"
        f" CAST(0 AS BIGINT), (acc, t) -> acc + t)"
    )
    scored = embeddings.select(F.col(id_col), proj.alias("proj_q"))
    pos = (
        scored.orderBy(F.col("proj_q").desc(), F.col(id_col).asc())
        .limit(topk)
        .select(F.lit("pos").alias("side"), id_col, "proj_q")
    )
    neg = (
        scored.orderBy(F.col("proj_q").asc(), F.col(id_col).asc())
        .limit(topk)
        .select(F.lit("neg").alias("side"), id_col, "proj_q")
    )
    return pos.unionByName(neg)


def gram_deflated_second_component(
    gram: DataFrame,
    rounds: int = 5,
) -> DataFrame:
    """Second principal component via DEFLATED power iteration over the
    staged Gram matrix — the next spectral consumer after
    ``gram_power_iteration``: run the identical v₁ recurrence first,
    then iterate u with per-round orthogonalization against v₁ in
    integer arithmetic:

        w  = G·u
        c  = tdiv(v₁ᵀw, v₁ᵀv₁)          (integer projection coefficient)
        w' = w − c·v₁                    (deflation, exact)
        u' = tdiv(w'·1e6, max|w'|)       (L∞ micros normalization)

    The truncating quotient makes the orthogonalization approximate by
    < 1 v₁-unit per round, but it is re-applied EVERY round, so the
    dominant component never re-accumulates — and as a defined integer
    recurrence the DuckDB oracle replays it bit-exactly (parity is the
    contract; convergence quality is the pytest's job). Rayleigh share
    ev_q uses the same two-step quotient as the top component.
    Degenerate inputs (zero Gram, or rank-1 where deflation leaves
    nothing) yield NULL components. dims²-bounded driver state; the
    corpus is touched zero times. Returns (dim, v_q, ev_q).
    """
    rows = gram.select("dim_i", "dim_j", "gram").collect()  # dims² rows
    if not rows:
        return gram.sparkSession.createDataFrame(
            [], "dim int, v_q long, ev_q long"
        )
    g: dict[tuple[int, int], int] = {}
    dims_set: set[int] = set()
    for r in rows:
        i, j, val = int(r["dim_i"]), int(r["dim_j"]), int(r["gram"])
        g[(i, j)] = val
        if i != j:
            g[(j, i)] = val
        dims_set.add(i)
        dims_set.add(j)
    dims = sorted(dims_set)

    def matvec(v: dict[int, int]) -> dict[int, int]:
        return {i: sum(g.get((i, j), 0) * v[j] for j in dims) for i in dims}

    def none_rows():
        return gram.sparkSession.createDataFrame(
            [(int(d), None, None) for d in dims], "dim int, v_q long, ev_q long"
        )

    v1: dict[int, int] = {d: MICROS for d in dims}
    for _ in range(rounds):
        w = matvec(v1)
        mx = max(abs(x) for x in w.values())
        if mx == 0:
            return none_rows()
        v1 = {d: _tdiv(w[d] * MICROS, mx) for d in dims}
    v1v1 = sum(v1[d] * v1[d] for d in dims)

    u: dict[int, int] = {d: MICROS for d in dims}
    for _ in range(rounds):
        w = matvec(u)
        c = _tdiv(sum(v1[d] * w[d] for d in dims), v1v1)
        w = {d: w[d] - c * v1[d] for d in dims}
        mx = max(abs(x) for x in w.values())
        if mx == 0:
            return none_rows()
        u = {d: _tdiv(w[d] * MICROS, mx) for d in dims}
    gu = matvec(u)
    num = sum(u[d] * gu[d] for d in dims)
    den = sum(u[d] * u[d] for d in dims)
    trace = sum(g.get((d, d), 0) for d in dims)
    ev = (
        _tdiv(_tdiv(num, den) * MICROS, trace)
        if den > 0 and trace > 0
        else None
    )
    return gram.sparkSession.createDataFrame(
        [(int(d), int(u[d]), ev) for d in dims], "dim int, v_q long, ev_q long"
    )


def leverage_extremes(
    embeddings: DataFrame,
    top_component: DataFrame,
    second_component: DataFrame,
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-component leverage scores — the spectral outlier audit over
    BOTH principal directions: per vector the exact integer projections
    p₁ = Σ x_q·v₁ and p₂ = Σ x_q·u, combined as the defined integer
    quantity lev = p₁² div (v₁ᵀv₁) + p₂² div (uᵀu) (each term the
    squared projection in component-norm units — the classical
    leverage shape with truncating division, oracle-replayable). Emits
    the ``topk`` highest-leverage vectors: the documents the 2-D
    spectral summary leans on hardest, which is where a curation pass
    looks for dominating boilerplate or outlier content.

    Both component vectors inline as literal coefficients (the
    pca_project lesson): one codegen projection, one TakeOrdered heap,
    no joins. Degenerate components yield an empty result. Returns
    (id_col, p1_q, p2_q, lev_q).
    """
    spark = embeddings.sparkSession
    empty_schema = f"{id_col} long, p1_q long, p2_q long, lev_q long"

    def vec_of(component):
        rows = component.select("dim", "v_q").collect()
        if not rows or any(r["v_q"] is None for r in rows):
            return None
        return [int(r["v_q"]) for r in sorted(rows, key=lambda r: int(r["dim"]))]

    v1 = vec_of(top_component)
    u = vec_of(second_component)
    if v1 is None or u is None:
        return spark.createDataFrame([], empty_schema)
    n1 = sum(x * x for x in v1)
    n2 = sum(x * x for x in u)
    if n1 == 0 or n2 == 0:
        return spark.createDataFrame([], empty_schema)

    def proj_expr(coeffs):
        arr = "array({})".format(", ".join(f"CAST({x} AS BIGINT)" for x in coeffs))
        return (
            f"aggregate(zip_with({vec_col}, {arr},"
            f" (x, c) -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) * c),"
            f" CAST(0 AS BIGINT), (acc, t) -> acc + t)"
        )

    scored = embeddings.select(
        F.col(id_col),
        F.expr(proj_expr(v1)).alias("p1_q"),
        F.expr(proj_expr(u)).alias("p2_q"),
    ).select(
        id_col,
        "p1_q",
        "p2_q",
        F.expr(
            f"CAST((CAST(p1_q AS DECIMAL(38,0)) * p1_q) div {n1}"
            f" + (CAST(p2_q AS DECIMAL(38,0)) * p2_q) div {n2} AS BIGINT)"
        ).alias("lev_q"),
    )
    return scored.orderBy(F.col("lev_q").desc(), F.col(id_col).asc()).limit(topk)
