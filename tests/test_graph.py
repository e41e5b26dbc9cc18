"""Integer PageRank vs an exact Python model."""

from __future__ import annotations

from rat_strain_loader_pipeline_spark.operators.graph import pagerank_micros


def _model(edges, iterations=5, damping_pct=85):
    edges = sorted(set(edges))
    nodes = sorted({n for e in edges for n in e})
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = 1_000_000 - damping_pct * 10_000
    rank = {n: 1_000_000 for n in nodes}
    for _ in range(iterations):
        inc = {n: 0 for n in nodes}
        for s, d in edges:
            inc[d] += (rank[s] * damping_pct) // (100 * outdeg[s])
        rank = {n: base + inc[n] for n in nodes}
    return rank


def test_pagerank_matches_python_model(spark):
    edges = [
        (1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (5, 1), (1, 2),  # dup edge
        (6, 7),  # small disconnected pair; 7 is dangling (leaks mass)
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank_micros"] for r in pagerank_micros(df).collect()
    }
    assert got == _model(edges)
    # hub node 1 (three in-edges) must outrank the dangling leaf 7
    assert got[1] > got[7]


def test_pagerank_stage_cadence_invariant(spark):
    """Lineage-staging cadence is an execution detail — results must be
    identical whether every round stages or none do."""
    edges = [(i, (i * 3) % 11) for i in range(11) if i != (i * 3) % 11]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {r["node"]: r["rank_micros"] for r in pagerank_micros(df, stage_every=1).collect()}
    b = {r["node"]: r["rank_micros"] for r in pagerank_micros(df, stage_every=100).collect()}
    assert a == b == _model(edges)


def test_triangle_count_known_graph_and_partition_invariance(spark):
    from rat_strain_loader_pipeline_spark.operators.graph import triangle_count
    from pyspark.sql import functions as F2

    # K4 on {1,2,3,4} (4 triangles) + a pendant edge + a 4-cycle
    # {10,11,12,13} (0 triangles)
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = k4 + [(4, 5), (10, 11), (11, 12), (12, 13), (10, 13)]
    df = spark.createDataFrame(edges, "a long, b long")
    r = triangle_count(df).collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (9, 11, 4)
    r2 = triangle_count(df.repartition(7, F2.col("a") % 3)).collect()[0]
    assert tuple(r2) == tuple(r)


def test_label_propagation_two_cliques_with_bridge(spark):
    from rat_strain_loader_pipeline_spark.operators.graph import label_propagation
    from pyspark.sql import functions as F2

    # two K4 cliques {1..4} and {10..13} joined by one bridge 4-10:
    # after 3 rounds each clique agrees on its smallest id
    k = lambda ns: [(a, b) for a in ns for b in ns if a < b]
    edges = k([1, 2, 3, 4]) + k([10, 11, 12, 13]) + [(4, 10)]
    df = spark.createDataFrame(edges, "a long, b long")
    out = {r["node_id"]: r["label"] for r in label_propagation(df, 3).collect()}
    assert {out[n] for n in (1, 2, 3)} == {1}
    assert {out[n] for n in (11, 12, 13)} == {10}
    # determinism under repartition
    out2 = {
        r["node_id"]: r["label"]
        for r in label_propagation(df.repartition(5, F2.col("a") % 2), 3).collect()
    }
    assert out2 == out


def test_k_core_peel_cascades(spark):
    from rat_strain_loader_pipeline_spark.operators.graph import k_core_peel

    # triangle 1-2-3 (each degree 2) + a chain 3-4, 4-5 hanging off it.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "a long, b long"
    )
    # k=2: 5 peels first (deg 1), THEN 4 (deg drops to 1) -> cascade
    # needs the second round; triangle survives with degree 2 each.
    out = {r["node_id"]: r["deg"] for r in k_core_peel(edges, 2, 3).collect()}
    assert out == {1: 2, 2: 2, 3: 2}
    # k=3: nothing survives
    assert k_core_peel(edges, 3, 3).count() == 0
