"""kmeans_micros: distributed Lloyd's in integer micro-units."""

from __future__ import annotations

from pyspark.sql import functions as F


def _km(spark, rows, k=2, iters=3):
    from rat_strain_loader_pipeline_spark.operators.clustering import kmeans_micros

    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return {r["vec_id"]: r for r in kmeans_micros(df, k=k, iters=iters).collect()}


def test_kmeans_separates_two_blobs(spark):
    # two tight blobs far apart; seeds (ids 0,1) land one in each blob
    blob_a = [(0, [0.0, 0.1]), (2, [0.05, 0.0]), (4, [0.0, 0.05])]
    blob_b = [(1, [5.0, 5.1]), (3, [5.05, 5.0]), (5, [5.0, 5.05])]
    out = _km(spark, blob_a + blob_b)
    a_clusters = {out[i]["cluster_id"] for i, _ in blob_a}
    b_clusters = {out[i]["cluster_id"] for i, _ in blob_b}
    assert a_clusters == {0}
    assert b_clusters == {1}
    # members are near their centroid: squared micro-dist well under
    # the inter-blob distance (~5e6 micros per dim)
    assert all(r["dist_sq"] < 10**11 for r in out.values())


def test_kmeans_deterministic_and_partition_invariant(spark, sf_dir):
    from rat_strain_loader_pipeline_spark.operators.clustering import kmeans_micros
    from rat_strain_loader_pipeline_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    a = sorted(
        tuple(r) for r in kmeans_micros(emb.coalesce(1), k=4, iters=2).collect()
    )
    b = sorted(
        tuple(r)
        for r in kmeans_micros(
            emb.repartition(13, F.col("vec_id") % 7), k=4, iters=2
        ).collect()
    )
    assert a == b
    # every vector assigned exactly once, clusters within range
    assert len(a) == emb.count()
    assert {t[1] for t in a} <= set(range(4))


def test_semdedup_prunes_planted_near_dup(spark):
    from rat_strain_loader_pipeline_spark.operators.clustering import semdedup_prune

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [0.99, 0.01, 0.0]),   # near-dup of 0 (cosine ~0.9999)
        (3, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in semdedup_prune(df, k=2, iters=2, tau=0.9).collect()}
    assert out[0]["kept"] is True      # smaller id of the dup pair survives
    assert out[2]["kept"] is False     # near-dup pruned
    assert out[1]["kept"] and out[3]["kept"]
    # prune happened within one cluster
    assert out[0]["cluster_id"] == out[2]["cluster_id"]


def test_semdedup_partition_invariant(spark, sf_dir):
    from rat_strain_loader_pipeline_spark.operators.clustering import semdedup_prune
    from rat_strain_loader_pipeline_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    a = sorted(
        tuple(r) for r in semdedup_prune(emb.coalesce(1), k=4, iters=2).collect()
    )
    b = sorted(
        tuple(r)
        for r in semdedup_prune(
            emb.repartition(13, F.col("vec_id") % 7), k=4, iters=2
        ).collect()
    )
    assert a == b
    assert len(a) == emb.count()


def test_grouped_kmeans_matches_per_group_separate_fits(spark, sf_dir):
    """kmeans_fit_grouped trains every group in one set of jobs but
    must reproduce kmeans_fit bit-exactly per group: group -1 = the
    full vector, groups 0/1 = the two halves (the ivf_pq_topk
    layout)."""
    from rat_strain_loader_pipeline_spark.operators.clustering import (
        MICROS,
        kmeans_fit,
        kmeans_fit_grouped,
    )
    from rat_strain_loader_pipeline_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    dims = len(emb.select("embedding").first()[0])
    d = dims // 2

    base = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "x")
    ).select(
        "vec_id",
        "dim",
        F.floor(F.col("x").cast("double") * MICROS).cast("long").alias("xq"),
    )
    ex = base.select("vec_id", F.lit(-1).alias("g"), "dim", "xq").unionByName(
        base.select(
            "vec_id",
            (F.col("dim") / d).cast("int").alias("g"),
            (F.col("dim") % d).alias("dim"),
            "xq",
        )
    )
    ga, gc = kmeans_fit_grouped(ex, k=4, iters=2)
    got_assign = {
        g: sorted((r["vec_id"], r["j"], r["dist"]) for r in rows)
        for g, rows in _group_rows(ga.collect()).items()
    }
    got_cent = {
        g: sorted((r["j"], r["dim"], r["c"]) for r in rows)
        for g, rows in _group_rows(gc.collect()).items()
    }

    slices = {-1: (1, dims), 0: (1, d), 1: (d + 1, d)}
    for g, (lo, n) in slices.items():
        sub = emb.select("vec_id", F.slice("embedding", lo, n).alias("embedding"))
        a, c = kmeans_fit(sub, k=4, iters=2)
        assert got_assign[g] == sorted(
            (r["vec_id"], r["j"], r["dist"]) for r in a.collect()
        )
        assert got_cent[g] == sorted((r["j"], r["dim"], r["c"]) for r in c.collect())


def _group_rows(rows):
    out = {}
    for r in rows:
        out.setdefault(r["g"], []).append(r)
    return out


def test_cluster_quota_sample_caps_every_cluster(spark, sf_dir):
    from rat_strain_loader_pipeline_spark.operators.clustering import (
        cluster_quota_sample,
        kmeans_micros,
    )
    from rat_strain_loader_pipeline_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    out = cluster_quota_sample(emb, docs, quota=5, k=4, iters=2).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    sizes = {
        r["cluster_id"]: 0
        for r in kmeans_micros(emb, k=4, iters=2).collect()
    }
    for r in kmeans_micros(emb, k=4, iters=2).collect():
        sizes[r["cluster_id"]] += 1
    # every cluster capped at quota, and filled to min(size, quota)
    for c, rows in by_cluster.items():
        assert len(rows) == min(sizes[c], 5)
        assert sorted(r["rk"] for r in rows) == list(range(1, len(rows) + 1))
    # priority respected: within a cluster, kept docs are the longest
    chars = {
        r["doc_id"]: r["n_chars"] for r in docs.collect()
    }
    assign = {r["vec_id"]: r["cluster_id"] for r in kmeans_micros(emb, k=4, iters=2).collect()}
    for c, rows in by_cluster.items():
        kept = {r["doc_id"] for r in rows}
        rest = [d for d, cl in assign.items() if cl == c and d not in kept]
        if rest and len(kept) == 5:
            worst_kept = min((chars[d], -d) for d in kept)
            best_rest = max((chars[d], -d) for d in rest)
            assert worst_kept >= best_rest


def test_semdedup_oversize_cluster_cap_and_warning(spark):
    """100 TB guardrail: a deliberately-lopsided clustering (k=1, all
    vectors identical) with max_cluster_size set is hash-split into
    sub-blocks — the pair stage is bounded and the caller is warned;
    each sub-block still keeps exactly its min-id member."""
    import warnings

    from pyspark.sql import functions as F

    from rat_strain_loader_pipeline_spark.operators.clustering import semdedup_prune

    n, cap = 24, 5
    rows = [(i, [1.0, 0.0]) for i in range(n)]  # all identical -> 1 cluster
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = {r["vec_id"]: r["kept"] for r in
               semdedup_prune(df, k=1, iters=1, tau=0.9,
                              max_cluster_size=cap).collect()}
    assert any("max_cluster_size" in str(w.message) for w in caught)
    assert len(out) == n

    # expected survivors: min id of every hash sub-block (replicate the
    # deterministic salt: pmod(xxhash64(id), ceil(n/cap)))
    n_sub = -(-n // cap)
    buckets = {
        r["vec_id"]: r["b"]
        for r in df.select(
            "vec_id", F.pmod(F.xxhash64("vec_id"), F.lit(n_sub)).alias("b")
        ).collect()
    }
    want_kept = {min(ids for ids, b in buckets.items() if b == bb) for bb in set(buckets.values())}
    assert {i for i, kept in out.items() if kept} == want_kept
    assert 1 < len(want_kept) < n  # actually split AND actually pruned

    # uncapped twin on the same input keeps only the global min
    kept_exact = {i for i, k in
                  ((r["vec_id"], r["kept"]) for r in
                   semdedup_prune(df, k=1, iters=1, tau=0.9).collect()) if k}
    assert kept_exact == {0}
