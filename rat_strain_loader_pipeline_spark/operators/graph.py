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
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    base = 1_000_000 - damping_pct * 10_000  # (1-d) in micro-units
    ranks = nodes.withColumn("rank", F.lit(1_000_000).cast("long"))
    for i in range(iterations):
        shares = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
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
