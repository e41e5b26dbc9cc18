"""Iterative link analysis over edge tables.

Companion to the hash-to-min connected components in ``dedup.py``: CC
answers "which rows collapse together", PageRank-style propagation
answers "which nodes matter" — the centrality/importance signal used to
weight corpus sources, rank near-dup cluster canonicals, or order crawl
frontiers.

Deterministic INTEGER formulation (engine-portable by construction):
ranks live in micro-units (bigint, initial 1_000_000 per node); each
round every node keeps a base of ``(1-d)`` micro-units and receives
``(rank(u) * d_pct) div (100 * outdeg(u))`` from each in-neighbor —
pure integer arithmetic with identical truncation in Spark (``div``)
and DuckDB (``//`` on positives), so a SQL oracle reproduces every
round bit-exactly. Dangling nodes (no out-edges) leak their damped
mass each round — the documented spec here (classic PageRank
redistributes it; at corpus scale the ranking, not the absolute mass,
is what's consumed).

100 TB shape: per round ONE shuffle join of edges onto the rank table
plus one groupBy(dst) with map-side partial sums — O(edges) work, no
per-node loops; each round's rank table is staged to parquet (lineage
truncation, same pattern as connected_components) so round k+1 reads a
flat scan, not a k-deep join tree. Fixed iteration count = fixed cost;
convergence-based stopping would ride the staged round output exactly
like the CC fixpoint probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_micros(
    edges: DataFrame,
    iterations: int = 5,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
    stage_every: int = 2,
) -> DataFrame:
    """Integer PageRank over a directed edge table → (node, rank_micros).

    ``damping_pct`` is the damping factor in percent (85 = the classic
    0.85). Every node present as src OR dst participates; duplicate
    edges are counted once (the edge set is made distinct — parallel
    edges would double-ship mass nondeterministically vs the oracle's
    set semantics)."""
    from rat_strain_loader_pipeline_spark.staging import stage_to_parquet

    e = stage_to_parquet(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct(),
        "pagerank-edges",
    )
    nodes = stage_to_parquet(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct(),
        "pagerank-nodes",
    )
    # out-degree is loop-invariant: attach it to the staged edge table
    # ONCE instead of re-aggregating + re-joining it every iteration
    # (per round: 1 join + 1 agg fewer, identical shares)
    ew = stage_to_parquet(
        e.join(e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")), "src"),
        "pagerank-eweighted",
    )
    base = 1_000_000 - damping_pct * 10_000  # (1-d) in micro-units
    ranks = nodes.withColumn("rank", F.lit(1_000_000).cast("long"))
    for i in range(iterations):
        shares = (
            ew.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr(f"(rank * {damping_pct}) div (100 * outdeg)").alias("share"),
            )
        )
        incoming = shares.groupBy("node").agg(F.sum("share").alias("inc"))
        ranks = nodes.join(incoming, "node", "left").select(
            "node",
            (F.lit(base) + F.coalesce(F.col("inc"), F.lit(0)))
            .cast("long")
            .alias("rank"),
        )
        # stage every `stage_every` rounds: a 1-2 level join tree is
        # cheap for Catalyst, so truncating lineage EVERY round pays a
        # parquet write for nothing; unbounded depth would blow up
        # planning time (same tradeoff as connected_components, which
        # must stage every round because its trees double)
        if (i + 1) % stage_every == 0 and i + 1 < iterations:
            ranks = stage_to_parquet(ranks, f"pagerank-iter-{i}")
    return ranks.select("node", F.col("rank").alias("rank_micros"))


def triangle_count(edges: DataFrame) -> DataFrame:
    """Distributed triangle counting by degree-ordered orientation
    (Suri & Vassilvitskii 2011): orient every undirected edge from its
    lower-(degree, id) endpoint to the higher, enumerate wedges as
    self-joins of the oriented adjacency on the source, and close each
    wedge against the oriented edge set. Orientation is the scale
    trick — out-degrees are bounded by O(sqrt(m)), so the wedge join
    is Σ out_deg² ≈ m^1.5 worst case instead of Σ deg² (which a hub
    node makes quadratic); every triangle is counted exactly once from
    its lowest-ordered vertex.

    ``edges``: undirected, one row per edge, columns (a, b) with
    a < b, no self-loops. The composite order key packs (degree, id)
    into one bigint (deg * 2^32 + id — exact while id < 2^32 and
    deg < 2^20, both true far past this corpus), keeping every
    comparison engine-portable integer arithmetic.

    Returns one row: (n_nodes, n_edges, n_triangles).
    """
    from rat_strain_loader_pipeline_spark.staging import stage_to_parquet

    both = edges.select(F.col("a").alias("v"), F.col("b").alias("w")).unionByName(
        edges.select(F.col("b").alias("v"), F.col("a").alias("w"))
    )
    deg = both.groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
    keyed = stage_to_parquet(
        both.join(deg, "v")
        .join(
            deg.select(F.col("v").alias("w"), F.col("deg").alias("deg_w")), "w"
        )
        .select(
            "v",
            "w",
            (F.col("deg") * F.lit(1 << 32) + F.col("v")).alias("ov"),
            (F.col("deg_w") * F.lit(1 << 32) + F.col("w")).alias("ow"),
        )
        .filter(F.col("ov") < F.col("ow"))
        .select("v", "w", "ow"),
        "tri-oriented",
    )
    # wedges from the common lowest-ordered vertex; order the two
    # out-neighbors to close each triangle once
    w1 = keyed.select(F.col("v"), F.col("w").alias("b"), F.col("ow").alias("ob"))
    w2 = keyed.select(F.col("v"), F.col("w").alias("c"), F.col("ow").alias("oc"))
    wedges = w1.join(w2, "v").filter(F.col("ob") < F.col("oc")).select("b", "c")
    closed = wedges.join(
        keyed.select(F.col("v").alias("b"), F.col("w").alias("c")), ["b", "c"]
    )
    tri = closed.agg(F.count(F.lit(1)).alias("n_triangles"))
    stats = edges.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(
        F.broadcast(deg.agg(F.count(F.lit(1)).alias("n_nodes")))
    )
    return stats.crossJoin(F.broadcast(tri)).select(
        "n_nodes", "n_edges", "n_triangles"
    )


def label_propagation(edges: DataFrame, iters: int = 3) -> DataFrame:
    """Synchronous label propagation (Raghavan et al.) made
    deterministic: labels start as node ids; each round every node
    adopts the most frequent label among its NEIGHBORS, ties broken by
    smallest label — argmax via one (count DESC, label ASC) argmin
    struct, no RNG, no visit order. A fixed ``iters`` rounds (LPA's
    stock convergence is oscillation-prone; fixed-round determinism is
    the engine-portable contract, and the oracle unrolls the same
    rounds — the pagerank pattern).

    Per round: one join of the bidirectional edge list against the
    label table (node-keyed, hash-partitioned), one (node, label)
    partial-agg count, one per-node argmax — all map-side-combinable;
    per-round state is one label per node. Community detection that
    costs O(iters · m) — no pairwise stage.

    ``edges``: undirected (a, b), a != b. Returns (node_id, label).
    """
    from rat_strain_loader_pipeline_spark.staging import stage_to_parquet

    bd = stage_to_parquet(
        edges.select(F.col("a").alias("v"), F.col("b").alias("w")).unionByName(
            edges.select(F.col("b").alias("v"), F.col("a").alias("w"))
        ),
        "lpa-edges",
    )
    labels = bd.select(F.col("v").alias("node_id")).distinct().select(
        "node_id", F.col("node_id").alias("label")
    )
    for r in range(iters):
        msgs = bd.join(
            labels.select(F.col("node_id").alias("w"), "label"), "w"
        ).select(F.col("v").alias("node_id"), "label")
        counts = msgs.groupBy("node_id", "label").agg(
            F.count(F.lit(1)).alias("c")
        )
        labels = stage_to_parquet(
            counts.groupBy("node_id")
            .agg(F.min(F.struct((-F.col("c")).alias("nc"), F.col("label"))).alias("m"))
            .select("node_id", F.col("m.label").alias("label")),
            f"lpa-labels-{r}",
        )
    return labels


def k_core_peel(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """Bounded-round k-core peeling: repeatedly drop nodes whose degree
    in the surviving subgraph is < k.

    The graph-sparsification primitive behind community mining and
    spam-subgraph extraction (a node's coreness survives ties that raw
    degree can't see). Full decomposition iterates to a fixpoint;
    this runs a FIXED ``rounds`` peels — the engine-portable contract
    the repo uses for every iterative operator (pagerank / LPA /
    kmeans): a SQL oracle unrolls the identical rounds and matches
    exactly, and a caller needing the fixpoint re-invokes on the
    staged survivor table until stable (each round's edge table is
    staged to parquet, so the loop reads flat scans, not a
    rounds-deep join tree).

    Per round: one degree groupBy (map-side partial) + two node-keyed
    hash joins filtering both endpoints — O(edges) work, state =
    surviving edge list. ``edges``: undirected (a, b) with a != b;
    both directions are materialized once up front. Returns surviving
    (node_id, deg) — degree within the final surviving subgraph
    (rows with deg < k remain only if ``rounds`` stopped short of the
    fixpoint).
    """
    from rat_strain_loader_pipeline_spark.staging import stage_to_parquet

    cur = stage_to_parquet(
        edges.select(F.col("a").alias("v"), F.col("b").alias("w")).unionByName(
            edges.select(F.col("b").alias("v"), F.col("a").alias("w"))
        ),
        "kcore-edges",
    )
    for r in range(rounds):
        keep = (
            cur.groupBy("v")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= k)
            .select("v")
        )
        cur = stage_to_parquet(
            cur.join(keep, "v").join(
                keep.withColumnRenamed("v", "w"), "w"
            ).select("v", "w"),
            f"kcore-round-{r}",
        )
    return cur.groupBy(F.col("v").alias("node_id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )


def bfs_reach(edges: DataFrame, seeds: DataFrame, rounds: int) -> DataFrame:
    """Bounded-round multi-source BFS — shortest hop distance from a
    seed set, the influence-reach / blast-radius primitive beside
    pagerank's stationary score: "which nodes are within ``rounds``
    hops of the flagged accounts?" Runs the repo's fixed-rounds
    iterative contract (pagerank / LPA / k-core precedent) so a SQL
    oracle unrolls the identical rounds: per round, the current
    distance table joins the (both-directions) edge list once and the
    min-distance fold collapses duplicates — distances only ever
    shrink, and a node first reached in round r gets dist = r exactly.

    ``edges``: undirected (a, b), a != b; ``seeds``: (node_id). Per
    round one node-keyed hash join + one min agg over O(edges) rows;
    the frontier table is staged to parquet per round (flat scans, not
    a rounds-deep join tree). Returns reached (node_id, dist),
    dist <= rounds, seeds at 0.
    """
    from rat_strain_loader_pipeline_spark.staging import stage_to_parquet

    e2 = stage_to_parquet(
        edges.select(F.col("a").alias("v"), F.col("b").alias("w")).unionByName(
            edges.select(F.col("b").alias("v"), F.col("a").alias("w"))
        ),
        "bfs-edges",
    )
    dist = seeds.select(
        F.col("node_id"), F.lit(0).cast("long").alias("dist")
    )
    for r in range(rounds):
        nxt = (
            dist.join(e2, dist["node_id"] == e2["v"])
            .select(F.col("w").alias("node_id"), (F.col("dist") + 1).alias("dist"))
        )
        dist = stage_to_parquet(
            dist.unionByName(nxt)
            .groupBy("node_id")
            .agg(F.min("dist").cast("long").alias("dist")),
            f"bfs-round-{r}",
        )
    return dist
