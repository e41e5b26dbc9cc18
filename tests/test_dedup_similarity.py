"""Tests for dedup + similarity operators against brute-force oracles."""

from __future__ import annotations

import itertools
import math

import pytest
from pyspark.sql import functions as F

from rat_strain_loader_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
)
from rat_strain_loader_pipeline_spark.operators.similarity import (
    brute_force_topk,
    cosine_sim_expr,
    lsh_bucketed_topk,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog again and again today"),
    (1, "the quick brown fox jumps over the lazy dog again and again today"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy dog again and again tomorrow"),  # near dup
    (3, "completely different content about spark dataframes and shuffles here"),
    (4, "Spark   DataFrames    and shuffles"),  # whitespace/case variant of nothing
    (5, "the quick brown fox jumps over the lazy cat again and again today"),  # near dup of 0
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _shingle_set(text: str, n: int = 3) -> set[str]:
    toks = text.lower().split()
    if len(toks) < n:
        return {"_".join(toks)}
    return {"_".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _jaccard(a: set, b: set) -> float:
    return len(a & b) / len(a | b)


def _jaccard_micros(a: set, b: set) -> int:
    return len(a & b) * 1_000_000 // len(a | b)


def test_exact_dedup_groups(spark):
    out = exact_dedup(_docs_df(spark)).collect()
    groups = {r["canonical_id"]: r["dup_count"] for r in out}
    assert groups[0] == 2  # docs 0 and 1 identical
    assert sum(groups.values()) == 6


def test_minhash_estimates_jaccard(spark):
    sigs = {r["doc_id"]: r["sig"] for r in minhash_signatures(_docs_df(spark), num_hashes=128).collect()}
    for i, j in [(0, 1), (0, 2), (0, 3)]:
        est = sum(a == b for a, b in zip(sigs[i], sigs[j])) / 128
        true = _jaccard(_shingle_set(DOCS[i][1]), _shingle_set(DOCS[j][1]))
        assert abs(est - true) < 0.2, (i, j, est, true)


def test_minhash_lsh_finds_planted_dups(spark):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard_micros"]
        for r in minhash_lsh_pairs(_docs_df(spark), jaccard_threshold=0.5).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1_000_000
    assert (0, 2) in pairs  # one-word diff
    # verified jaccard values are exact
    for (a, b), j in pairs.items():
        assert j == _jaccard_micros(_shingle_set(DOCS[a][1]), _shingle_set(DOCS[b][1]))


def test_jvm_shingle_expr_matches_python(spark):
    """The xxhash path's JVM shingling (_shingle_expr) must produce the
    SAME shingle sets as the md5 path's Python _shingle_set — edge cases
    included: empty, null, short docs, whitespace runs, tabs/newlines."""
    from rat_strain_loader_pipeline_spark.operators.dedup import _shingle_expr

    cases = [
        (0, "the quick brown fox jumps over"),
        (1, "one"),
        (2, "two tokens"),
        (3, ""),
        (4, None),
        (5, "  leading   runs\tand\ttabs\nnewlines  trailing  "),
        (6, "Case MIX case mix CASE mix"),
        (7, "a a a a a"),  # repeated shingles collapse (distinct)
    ]
    df = spark.createDataFrame(cases, "doc_id long, text string")
    got = {
        r["doc_id"]: sorted(set(r["sh"]))
        for r in df.select(
            "doc_id", _shingle_expr("text", 3).alias("sh")
        ).collect()
    }
    for doc_id, text in cases:
        toks = [t for t in (text or "").lower().split() if t]
        if not toks:
            expected = []
        elif len(toks) < 3:
            expected = ["_".join(toks)]
        else:
            expected = sorted({"_".join(toks[i : i + 3]) for i in range(len(toks) - 2)})
        assert got[doc_id] == expected, (doc_id, got[doc_id], expected)


def _planted_corpus(spark):
    """Deterministic corpus with unambiguous dups: 8 base docs of 50
    words, each with a 2-word-dropped near-dup (Jaccard ≈ 0.9, simhash
    hamming ≈ 0-2 under ANY hash family) and 8 unrelated docs — no
    borderline pairs, so every hash family must emit exactly the planted
    pairs."""
    import random as _random

    rnd = _random.Random(7)
    vocab = [f"w{k}" for k in range(400)]
    rows = []
    for i in range(8):
        words = [vocab[rnd.randrange(400)] for _ in range(50)]
        rows.append((i * 10, " ".join(words)))
        rows.append((i * 10 + 1, " ".join(words[:30] + words[32:])))
    for i in range(8):
        rows.append((1000 + i, " ".join(vocab[rnd.randrange(400)] for _ in range(50))))
    return (
        spark.createDataFrame(rows, "doc_id long, text string"),
        {(i * 10, i * 10 + 1) for i in range(8)},
    )


def test_minhash_lsh_xxhash_equivalence(spark):
    """Production (xxhash64, JVM-side) and oracle (md5, pandas-UDF) hash
    paths emit the SAME pair set with the SAME exact-Jaccard values:
    Jaccard over hashed shingle sets is hash-family-invariant absent
    collisions, and the planted dups sit far above the banding S-curve."""
    docs, planted = _planted_corpus(spark)
    md5_pairs = {
        (r["id_a"], r["id_b"]): r["jaccard_micros"]
        for r in minhash_lsh_pairs(docs, jaccard_threshold=0.5).collect()
    }
    xxh_pairs = {
        (r["id_a"], r["id_b"]): r["jaccard_micros"]
        for r in minhash_lsh_pairs(
            docs, jaccard_threshold=0.5, hash_fn="xxhash64"
        ).collect()
    }
    assert set(md5_pairs) == set(xxh_pairs) == planted
    assert md5_pairs == xxh_pairs  # jaccard values identical, not just pairs


def test_simhash_and_ngram_xxhash_equivalence(spark):
    """The xxhash64 paths of simhash_near_dup_pairs and
    ngram_jaccard_pairs find the same planted pairs as the md5 paths;
    ngram Jaccard values are identical across hash families."""
    from rat_strain_loader_pipeline_spark.operators.dedup import (
        simhash_near_dup_pairs,
    )

    # simhash radius max_hamming=3 needs MUCH closer dups than the
    # word-drop corpus (those sit at hamming ≈ 7): plant exact dups —
    # identical shingle sets give identical signatures (hamming 0) under
    # ANY hash family, while unrelated docs sit at hamming ≈ 25-35
    import random as _random

    rnd = _random.Random(11)
    vocab = [f"w{k}" for k in range(400)]
    rows = []
    for i in range(8):
        text = " ".join(vocab[rnd.randrange(400)] for _ in range(50))
        rows.append((i * 10, text))
        rows.append((i * 10 + 1, text))
    for i in range(8):
        rows.append((1000 + i, " ".join(vocab[rnd.randrange(400)] for _ in range(50))))
    sim_docs = spark.createDataFrame(rows, "doc_id long, text string")
    sim_planted = {(i * 10, i * 10 + 1) for i in range(8)}
    sim_md5 = {(r["id_a"], r["id_b"]) for r in simhash_near_dup_pairs(sim_docs, max_hamming=3).collect()}
    sim_xxh = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_dup_pairs(sim_docs, max_hamming=3, hash_fn="xxhash64").collect()
    }
    assert sim_md5 == sim_xxh == sim_planted

    docs, planted = _planted_corpus(spark)

    ng_md5 = {
        (r["id_a"], r["id_b"]): r["jaccard_micros"]
        for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    ng_xxh = {
        (r["id_a"], r["id_b"]): r["jaccard_micros"]
        for r in ngram_jaccard_pairs(docs, threshold=0.8, hash_fn="xxhash64").collect()
    }
    assert ng_md5 == ng_xxh and set(ng_md5) == planted


def test_ngram_jaccard_matches_brute_force(spark):
    threshold = 0.5
    got = {
        (r["id_a"], r["id_b"]): r["jaccard_micros"]
        for r in ngram_jaccard_pairs(
            _docs_df(spark), shingle_n=3, threshold=threshold, prefix_cap=None
        ).collect()
    }
    expected = {}
    for (i, ti), (j, tj) in itertools.combinations(DOCS, 2):
        jac = _jaccard(_shingle_set(ti), _shingle_set(tj))
        if _jaccard_micros(_shingle_set(ti), _shingle_set(tj)) >= threshold * 1_000_000:
            expected[(i, j)] = _jaccard_micros(_shingle_set(ti), _shingle_set(tj))
    assert got == expected  # prefix filtering (uncapped) is exact


def test_simhash_similar_docs_close(spark):
    sims = {r["doc_id"]: r["simhash"] for r in simhash64(_docs_df(spark)).collect()}
    def hamming(a, b):
        return bin((a ^ b) & ((1 << 63) - 1)).count("1")
    assert sims[0] == sims[1]  # identical docs → identical signature
    assert hamming(sims[0], sims[2]) < hamming(sims[0], sims[3])


EMB = [
    (0, [1.0, 0.0, 0.0]),
    (1, [0.9, 0.1, 0.0]),
    (2, [0.0, 1.0, 0.0]),
    (3, [-1.0, 0.0, 0.0]),
    (4, [0.7, 0.7, 0.0]),
]


def test_cosine_expr_and_brute_force_topk(spark):
    df = spark.createDataFrame(EMB, "vec_id long, embedding array<float>")
    out = brute_force_topk(df, [1.0, 0.0, 0.0], k=3).collect()
    ids = [r["vec_id"] for r in out]
    assert ids == [0, 1, 4]
    cos = {r["vec_id"]: r["cosine_micros"] for r in out}
    assert cos[0] == 1_000_000
    assert cos[1] == pytest.approx(1e6 * 0.9 / math.sqrt(0.81 + 0.01), abs=200)


def test_lsh_topk_subset_of_exact_ranking(spark):
    df = spark.createDataFrame(EMB, "vec_id long, embedding array<float>")
    approx = lsh_bucketed_topk(df, [1.0, 0.0, 0.0], k=3, n_planes=2, multiprobe=1)
    rows = approx.collect()
    exact_scores = {r["vec_id"]: r["cosine_micros"] for r in brute_force_topk(df, [1.0, 0.0, 0.0], k=5).collect()}
    for r in rows:  # approximate results carry exact scores
        assert r["cosine_micros"] == exact_scores[r["vec_id"]]


def test_zero_norm_is_null(spark):
    df = spark.createDataFrame([(0, [0.0, 0.0])], "vec_id long, embedding array<float>")
    out = df.select(cosine_sim_expr(F.col("embedding"), F.array(F.lit(1.0), F.lit(0.0))).alias("c"))
    assert out.collect()[0]["c"] is None


def test_embedding_near_dup_pairs_matches_brute_force(spark):
    from rat_strain_loader_pipeline_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    import random

    rnd = random.Random(7)
    base = [rnd.gauss(0, 1) for _ in range(8)]
    vecs = []
    for i in range(20):
        if i % 4 == 0:  # planted near-dup of base
            vecs.append((i, [b + rnd.gauss(0, 0.01) for b in base]))
        else:
            vecs.append((i, [rnd.gauss(0, 1) for _ in range(8)]))
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")

    got = {
        (r.a_id, r.b_id)
        for r in embedding_near_dup_pairs(df, threshold=0.95).collect()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    want = {
        (a[0], b[0])
        for a, b in itertools.combinations(vecs, 2)
        if cos(a[1], b[1]) >= 0.95
    }
    assert got == want
    assert len(want) >= 6  # the planted group pairs up


def test_embedding_near_dup_zero_norm_excluded(spark):
    from rat_strain_loader_pipeline_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [1.0, 0.0001])],
        "vec_id long, embedding array<double>",
    )
    got = {(r.a_id, r.b_id) for r in embedding_near_dup_pairs(df, threshold=0.9).collect()}
    assert got == {(1, 2)}


def test_minhash_hot_bucket_cap(spark):
    """100 TB guard: a boilerplate group larger than the cap must emit
    O(n) star pairs to its min-id representative instead of n(n-1)/2,
    and survivors after collapsing pairs must be unchanged."""
    from rat_strain_loader_pipeline_spark.operators.dedup import minhash_lsh_pairs

    boiler = [(i, "the same boilerplate sentence repeated verbatim here") for i in range(40)]
    distinct = [
        (100 + i, f"a genuinely unique document number {i} with its own words {i*7}")
        for i in range(5)
    ]
    docs = spark.createDataFrame(boiler + distinct, "doc_id long, text string")

    capped = minhash_lsh_pairs(docs, hot_bucket_cap=8).collect()
    # star topology: every boilerplate member pairs with doc 0 only
    pairs = {(r["id_a"], r["id_b"]) for r in capped}
    assert pairs == {(0, i) for i in range(1, 40)}
    assert all(r["jaccard_micros"] == 1_000_000 for r in capped)

    # exact (uncapped) run finds the same duplicate MEMBERSHIP
    exact = minhash_lsh_pairs(docs).collect()
    dup_members_exact = {r["id_a"] for r in exact} | {r["id_b"] for r in exact}
    dup_members_capped = {r["id_a"] for r in capped} | {r["id_b"] for r in capped}
    assert dup_members_capped == dup_members_exact == set(range(40))


def test_ivf_full_probe_exact_and_recall(spark, sf_dir):
    """IVF: full probe equals brute force exactly (lists tile the
    corpus); nprobe=2 of 8 keeps high recall on the real embeddings."""
    from rat_strain_loader_pipeline_spark.operators.similarity import (
        brute_force_topk,
        ivf_assign,
        ivf_topk,
        ivf_train_centroids,
    )
    from rat_strain_loader_pipeline_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    cent = ivf_train_centroids(emb, n_lists=8, sample_size=256, iters=5)
    assigned = ivf_assign(emb, cent)

    # inverted lists partition the corpus exactly
    assert assigned.count() == emb.count()
    assert assigned.select("vec_id").distinct().count() == emb.count()

    exact = [(r["vec_id"], r["cosine_micros"]) for r in brute_force_topk(emb, qvec, k=10).collect()]
    full = [(r["vec_id"], r["cosine_micros"]) for r in ivf_topk(assigned, cent, qvec, k=10, nprobe=8).collect()]
    assert full == exact

    probed = {r["vec_id"] for r in ivf_topk(assigned, cent, qvec, k=10, nprobe=2).collect()}
    recall = len(probed & {v for v, _ in exact}) / 10
    assert recall >= 0.5, recall


def test_pairwise_topk_join_matches_brute_force(spark, sf_dir):
    """kNN-graph stage: each query's neighbor list equals per-query
    brute_force_topk output (same ordering, same rounding)."""
    from rat_strain_loader_pipeline_spark.operators.similarity import (
        brute_force_topk,
        pairwise_topk_join,
    )
    from rat_strain_loader_pipeline_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 3")
    got = pairwise_topk_join(queries, emb, k=5).collect()
    by_q = {}
    for r in sorted(got, key=lambda r: (r["q_id"], r["rank"])):
        by_q.setdefault(r["q_id"], []).append((r["c_id"], r["cosine_micros"]))
    assert set(by_q) == {0, 1, 2}
    for qid, neighbors in by_q.items():
        qvec = [float(x) for x in emb.filter(f"vec_id = {qid}").first()["embedding"]]
        exact = [(r["vec_id"], r["cosine_micros"]) for r in brute_force_topk(emb, qvec, k=5).collect()]
        assert neighbors == exact, qid


def test_blocked_near_dup_matches_collect_exact(spark, sf_dir):
    """The distributed block self-join (checked dedup path) must emit
    exactly the same pair set + cosines as the collect-based exact
    baseline, including the n_blocks=1 and oversplit regimes."""
    from rat_strain_loader_pipeline_spark.operators.similarity import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_blocked,
    )
    from rat_strain_loader_pipeline_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    want = sorted(map(tuple, embedding_near_dup_pairs(emb, threshold=0.35).collect()))
    assert len(want) > 0
    for nb in (1, 8, 37):
        got = sorted(
            map(tuple, embedding_near_dup_pairs_blocked(emb, threshold=0.35, n_blocks=nb).collect())
        )
        assert got == want, nb


def test_knn_join_blocked_matches_brute_force(spark, sf_dir):
    """Distributed kNN join: block-local partials + window reduce must
    reproduce per-query brute_force_topk exactly (ordering + rounding)."""
    from rat_strain_loader_pipeline_spark.operators.similarity import (
        brute_force_topk,
        knn_join_blocked,
    )
    from rat_strain_loader_pipeline_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 3")
    got = knn_join_blocked(queries, emb, k=5, n_blocks=6).collect()
    by_q = {}
    for r in sorted(got, key=lambda r: (r["q_id"], r["rank"])):
        by_q.setdefault(r["q_id"], []).append((r["c_id"], r["cosine_micros"]))
    assert set(by_q) == {0, 1, 2}
    for qid, neighbors in by_q.items():
        qvec = [float(x) for x in emb.filter(f"vec_id = {qid}").first()["embedding"]]
        exact = [(r["vec_id"], r["cosine_micros"]) for r in brute_force_topk(emb, qvec, k=5).collect()]
        assert neighbors == exact, qid


def test_knn_join_blocked_boundary_ties(spark):
    """Duplicate embeddings tying exactly at the block-local k-th slot:
    the lower c_id must survive, matching brute_force_topk's tie-break."""
    from pyspark.sql import functions as F

    from rat_strain_loader_pipeline_spark.operators.similarity import (
        brute_force_topk, knn_join_blocked,
    )

    # ids 0..7 all share one embedding (all tie at cosine 1.0); id 8 differs
    rows = [(i, [1.0, 0.0]) for i in range(8)] + [(8, [0.0, 1.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") == 0)
    got = sorted(
        (r["rank"], r["c_id"])
        for r in knn_join_blocked(queries, emb, k=4, n_blocks=3).collect()
    )
    exact = sorted(
        (r_i + 1, r["vec_id"])
        for r_i, r in enumerate(brute_force_topk(emb, [1.0, 0.0], k=4).collect())
    )
    assert got == exact == [(1, 0), (2, 1), (3, 2), (4, 3)]


def test_connected_components(spark):
    """Transitive closure: chains collapse to one group, disjoint pairs
    stay separate, and min-id is the canonical label."""
    from rat_strain_loader_pipeline_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (22, 20)],
        "id_a long, id_b long",
    )
    got = {r["node_id"]: r["component_id"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_path_graph_logn_rounds(spark):
    """Adversarial 10,000-node chain (diameter 9,999): pointer jumping
    must converge in O(log n) rounds — max_iterations=20 would be
    exceeded by any diameter-bound propagation, so convergence here IS
    the O(log n) proof. All nodes collapse to component 0."""
    from pyspark.sql import functions as F

    from rat_strain_loader_pipeline_spark.operators.dedup import connected_components

    n = 10_000
    chain = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    comps = connected_components(chain, max_iterations=20)
    agg = comps.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("component_id").alias("n_comp"),
        F.max("component_id").alias("max_comp"),
    ).collect()[0]
    assert (agg["n"], agg["n_comp"], agg["max_comp"]) == (n, 1, 0)


def test_deterministic_split_and_md5_bucket(spark):
    """Split assignment is stable, respects fractions roughly, and the
    Spark md5_bucket expression equals DuckDB's md5_number_lower % m."""
    import duckdb

    from pyspark.sql import functions as F

    from rat_strain_loader_pipeline_spark.operators.sampling import (
        deterministic_split, md5_bucket,
    )

    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    out = deterministic_split(df, fractions=(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert 700 < counts["train"] < 900 and 50 < counts["val"] < 150

    # rerun → identical assignment (no RNG anywhere)
    again = deterministic_split(df, fractions=(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    assert out.exceptAll(again).count() == 0

    spark_buckets = {
        r["doc_id"]: r["b"]
        for r in df.limit(50).select(
            "doc_id", md5_bucket(F.concat(F.lit("k:"), F.col("doc_id").cast("string"))).alias("b")
        ).collect()
    }
    duck = dict(duckdb.sql(
        "SELECT i, CAST(md5_number_lower('k:' || CAST(i AS VARCHAR)) % 10000 AS INT)"
        " FROM range(50) t(i)"
    ).fetchall())
    assert spark_buckets == duck


def test_topk_per_group(spark):
    from pyspark.sql import functions as F

    from rat_strain_loader_pipeline_spark.operators.sampling import topk_per_group

    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 30), ("a", 3, 30), ("a", 4, 5), ("b", 5, 1)],
        "g string, id long, score long",
    )
    got = sorted(
        (r["g"], r["id"], r["rank"])
        for r in topk_per_group(
            df, ["g"], [F.col("score").desc(), F.col("id").asc()], k=2
        ).collect()
    )
    assert got == [("a", 2, 1), ("a", 3, 2), ("b", 5, 1)]


def test_ngram_contamination(spark):
    """Decontamination: doc sharing an 8-gram with the benchmark flags;
    short docs and non-overlapping docs don't."""
    from rat_strain_loader_pipeline_spark.operators.text import ngram_contamination

    leak = "the quick brown fox jumps over the lazy dog tonight"
    docs = spark.createDataFrame(
        [
            (1, "intro words here then " + leak + " and a tail"),
            (2, "completely different content with no benchmark overlap at all today"),
            (3, "too short to matter"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, leak)], "doc_id long, text string")
    got = {r["doc_id"]: r["contaminated"] for r in ngram_contamination(docs, bench, n=8).collect()}
    assert got == {1: True, 2: False, 3: False}


def test_simhash_near_dup_pairs_banding(spark):
    """Pigeonhole banding finds every pair within max_hamming exactly;
    beyond-threshold pairs are dropped even when a band collides."""
    from rat_strain_loader_pipeline_spark.operators.dedup import simhash_near_dup_pairs

    base = 0b101010110011001110001111000011111000001111110000000111111100000 & ((1 << 63) - 1)
    flip = lambda sig, *bits: sig ^ sum(1 << b for b in bits)  # noqa: E731
    sigs = spark.createDataFrame(
        [
            (1, base),
            (2, flip(base, 5)),            # hamming 1 → pair
            (3, flip(base, 5, 20, 40)),    # hamming 3 → pair (at threshold)
            (4, flip(base, 1, 2, 3, 4)),   # hamming 4, flips within one band
                                           #   → candidate via clean bands, dropped by verify
            (5, ~base & ((1 << 63) - 1)),  # far away → no pair
        ],
        "doc_id long, simhash long",
    )
    docs = spark.createDataFrame([(0, "unused")], "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dup_pairs(docs, max_hamming=3, sigs=sigs).collect()
    }
    assert got[(1, 2)] == 1
    assert got[(1, 3)] == 3
    assert got[(2, 3)] == 2
    assert (1, 4) not in got and (1, 5) not in got
    # 3 vs 4: bits {5,20,40} vs {1,2,3,4} → hamming 7 → absent
    assert (3, 4) not in got


def test_remove_duplicate_lines(spark):
    """Corpus-global line threshold; order-preserving reassembly; docs
    reduced to nothing get empty text, not NULL."""
    from rat_strain_loader_pipeline_spark.operators.dedup import remove_duplicate_lines

    docs = spark.createDataFrame(
        [
            (1, "HEADER\nalpha\nHEADER"),   # HEADER x2 here, x3 corpus-wide
            (2, "HEADER\nbeta"),
            (3, "gamma\ndelta"),
            (4, "HEADER"),                   # everything boilerplate → ''
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_duplicate_lines(docs, min_count=3).collect()}
    assert out[1]["clean_text"] == "alpha" and out[1]["n_removed"] == 2
    assert out[2]["clean_text"] == "beta"
    assert out[3]["clean_text"] == "gamma\ndelta" and out[3]["n_removed"] == 0
    assert out[4]["clean_text"] == "" and out[4]["n_kept"] == 0 and out[4]["n_removed"] == 1


def test_winnow_guarantee_and_pruning(spark):
    """Winnowing guarantee: two docs sharing a token run of >= w+k-1
    tokens MUST share a fingerprint (here k=4, w=3 -> any shared 6-token
    run). Disjoint docs share none; stop-df pruning kills boilerplate
    fingerprints; short/empty docs don't crash."""
    from rat_strain_loader_pipeline_spark.operators.dedup import (
        winnow_dup_pairs,
        winnow_fingerprints_expr,
    )

    shared = "alpha beta gamma delta epsilon zeta"  # 6-token shared run
    rows = [
        (0, f"intro words here {shared} tail one"),
        (1, f"other prefix tokens {shared} different ending"),
        (2, "nothing in common with anything else at all whatsoever"),
        (3, "tiny"),
        (4, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in winnow_dup_pairs(
            docs, k=4, w=3, stop_df=100, min_shared=1
        ).collect()
    }
    assert (0, 1) in pairs
    assert all(2 not in p and 3 not in p and 4 not in p for p in pairs)

    # production xxhash64 path: same guarantee (the fingerprint SAMPLE
    # differs by hash family, but any >= w+k-1 shared run must pair)
    xpairs = {
        (r["id_a"], r["id_b"])
        for r in winnow_dup_pairs(
            docs, k=4, w=3, stop_df=100, min_shared=1, hash_fn="xxhash64"
        ).collect()
    }
    assert (0, 1) in xpairs
    assert all(2 not in p and 3 not in p and 4 not in p for p in xpairs)

    # fingerprint sets are deterministic, sorted, null-free
    fps = docs.select(
        "doc_id", winnow_fingerprints_expr("text", 4, 3).alias("fps")
    ).collect()
    by_id = {r["doc_id"]: r["fps"] for r in fps}
    assert by_id[4] in ([], [None])  # empty doc degenerates, exploded+filtered away
    assert by_id[0] == sorted(set(by_id[0]))

    # stop-df pruning: fingerprints selected by more than stop_df docs
    # are dropped, so boilerplate-only relatedness shrinks sharply
    # (not necessarily to zero — winnowing SAMPLES grams, so a common
    # gram can survive by being window-min in only a small subset)
    boiler = [(i, f"common boilerplate header line four unique{i} body") for i in range(6)]
    bdocs = spark.createDataFrame(boiler, "doc_id long, text string")
    unpruned = winnow_dup_pairs(bdocs, k=4, w=3, stop_df=100, min_shared=1).collect()
    pruned = winnow_dup_pairs(bdocs, k=4, w=3, stop_df=3, min_shared=1).collect()
    assert len(unpruned) >= 10  # most 6-choose-2 pairs relate via boilerplate
    assert len(pruned) < len(unpruned)


def test_fused_udf_equals_two_stage(spark):
    """The gate's fused hashes+sig UDF must be bit-identical to the
    two-stage shingle_hashes + minhash_signatures path — the property
    its docstring promises and the gate's decisions depend on."""
    from rat_strain_loader_pipeline_spark.operators.dedup import (
        _hashes_and_sig_udf,
        shingle_hashes,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        DOCS + [(97, ""), (98, "one"), (99, "two tok")],
        "doc_id long, text string",
    )
    fused = {
        r["doc_id"]: (list(r["hs"]["hashes"]), list(r["hs"]["sig"]))
        for r in docs.select(
            "doc_id", _hashes_and_sig_udf(3, 64, 42)(F.col("text")).alias("hs")
        ).collect()
    }
    bh = shingle_hashes(docs, stage=False)
    bs = minhash_signatures(docs, hashes=bh)
    two = {
        r["doc_id"]: (list(r["hashes"]), list(r["sig"]))
        for r in bh.join(bs, "doc_id").collect()
    }
    assert fused == two


def test_dedup_survivors_by_priority(spark):
    """Component keeps its best member by the explicit ordering
    (longest, then min id); singletons always survive."""
    from rat_strain_loader_pipeline_spark.operators.dedup import dedup_survivors_by

    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (4, 5), (9, 7)],
        "doc_id long, n_chars long",
    )
    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.9)], "id_a long, id_b long, jaccard double"
    )
    got = {
        r["doc_id"]: r["component_id"]
        for r in dedup_survivors_by(
            docs, pairs, [F.col("n_chars").desc(), F.col("doc_id").asc()]
        ).collect()
    }
    # component {1,2,3}: longest is tie 2/3 at 30 chars -> min id 2 wins
    # 4 and 9 are singletons (their own component)
    assert got == {2: 1, 4: 4, 9: 9}


def test_winnow_containment_finds_excerpts(spark):
    """A short doc quoted inside a long one: containment ~1.0 while
    symmetric Jaccard is far below any dedup threshold."""
    from rat_strain_loader_pipeline_spark.operators.dedup import (
        winnow_containment_pairs,
        winnow_dup_pairs,
        winnow_fingerprints_expr,
    )

    import random as _random

    rnd = _random.Random(5)
    vocab = [f"w{k}" for k in range(300)]
    quote = " ".join(vocab[rnd.randrange(300)] for _ in range(15))
    long_doc = (
        " ".join(vocab[rnd.randrange(300)] for _ in range(120))
        + " " + quote + " "
        + " ".join(vocab[rnd.randrange(300)] for _ in range(120))
    )
    other = " ".join(vocab[rnd.randrange(300)] for _ in range(120))
    docs = spark.createDataFrame(
        [(1, quote), (2, long_doc), (3, other)], "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["containment_micros"]
        for r in winnow_containment_pairs(
            docs, k=4, w=5, stop_df=100, containment=0.5
        ).collect()
    }
    assert (1, 2) in got and got[(1, 2)] >= 700000
    assert all(3 not in p for p in got)
    # the pair DOES share fingerprints symmetrically, but they are a
    # small fraction of the long doc's set — containment, not Jaccard,
    # is the signal that flags the excerpt relation
    sym = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in winnow_dup_pairs(docs, k=4, w=5, stop_df=100, min_shared=1).collect()
    }
    n_shared = sym.get((1, 2), 0)
    assert n_shared > 0
    fps2 = (
        docs.filter(F.col("doc_id") == 2)
        .select(F.explode(winnow_fingerprints_expr("text", 4, 5)))
        .count()
    )
    assert n_shared / fps2 < 0.5  # symmetric overlap stays sub-threshold


def test_duplicated_span_removal_semantics(spark):
    from rat_strain_loader_pipeline_spark.operators.dedup import (
        duplicated_span_removal,
    )

    shared = "the quick brown fox jumps over a lazy dog tonight"  # 10 tokens
    docs = spark.createDataFrame(
        [
            (1, f"intro one {shared} outro one"),
            (2, f"prefix two {shared} suffix two"),
            (3, "completely unrelated text with no repeats at all here"),
            (4, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in duplicated_span_removal(docs, k=8, min_df=2).collect()
    }
    # keeper (doc 1, first occurrence) keeps the span verbatim
    assert out[1]["clean_text"] == f"intro one {shared} outro one"
    assert out[1]["n_removed"] == 0
    # doc 2 loses the ENTIRE 10-token run (3 overlapping dup 8-grams
    # union to full coverage), keeps its own framing tokens
    assert out[2]["clean_text"] == "prefix two suffix two"
    assert out[2]["n_removed"] == 10
    assert out[2]["n_tokens"] == 14
    # untouched docs pass through, including one shorter than k
    assert out[3]["n_removed"] == 0
    assert out[4]["clean_text"] == "tiny doc"
    assert out[4]["n_tokens"] == 2


def test_duplicated_span_removal_within_doc_repeat_kept(spark):
    # a span repeated only WITHIN one doc has df(docs)=1 -> not excised
    from rat_strain_loader_pipeline_spark.operators.dedup import (
        duplicated_span_removal,
    )

    s = "a b c d e f g h"
    docs = spark.createDataFrame(
        [(1, f"{s} and then {s}"), (2, "nothing shared in this one really")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in duplicated_span_removal(docs, k=8, min_df=2).collect()}
    assert out[1]["n_removed"] == 0
    assert out[2]["n_removed"] == 0


def test_duplicated_span_removal_occurrence_scope(spark):
    # scope="all": a span repeated only WITHIN one doc IS excised
    # (keep-first), unlike the cross_doc default
    from rat_strain_loader_pipeline_spark.operators.dedup import (
        duplicated_span_removal,
    )

    s = "a b c d e f g h"
    docs = spark.createDataFrame(
        [(1, f"{s} and then {s}"), (2, "nothing shared in this one really")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in duplicated_span_removal(docs, k=8, min_df=2, scope="all").collect()
    }
    assert out[1]["clean_text"] == f"{s} and then"
    assert out[1]["n_removed"] == 8
    assert out[2]["n_removed"] == 0


def test_duplicated_span_removal_min_run_floor(spark):
    # a shared 10-token run: excised at min_run<=10, forgiven above
    from rat_strain_loader_pipeline_spark.operators.dedup import (
        duplicated_span_removal,
    )

    shared = "the quick brown fox jumps over a lazy dog tonight"  # 10 tokens
    docs = spark.createDataFrame(
        [(1, f"intro one {shared} outro one"), (2, f"prefix two {shared} suffix two")],
        "doc_id long, text string",
    )
    strict = {
        r["doc_id"]: r
        for r in duplicated_span_removal(docs, k=8, min_df=2, min_run=10).collect()
    }
    assert strict[2]["n_removed"] == 10
    lenient = {
        r["doc_id"]: r
        for r in duplicated_span_removal(docs, k=8, min_df=2, min_run=11).collect()
    }
    assert lenient[2]["n_removed"] == 0
    assert lenient[2]["clean_text"] == f"prefix two {shared} suffix two"


def test_cdc_chunks_model_and_offset_invariance(spark):
    """CDC chunking matches a direct Python rolling-hash model, and a
    shared substring embedded at DIFFERENT offsets still yields the
    same interior chunks — the content-defined property fixed-width
    shingling lacks."""
    from rat_strain_loader_pipeline_spark.operators.dedup import (
        CDC_BASE,
        CDC_BOUNDARY_MOD,
        CDC_MOD,
        CDC_WINDOW,
        cdc_duplicate_chunks,
    )

    import random as _r

    rnd = _r.Random(3)
    shared = "".join(rnd.choice("abcdefgh ") for _ in range(400))
    pre_a = "".join(rnd.choice("ijklmnop ") for _ in range(37))
    pre_b = "".join(rnd.choice("qrstuvwx ") for _ in range(181))
    rows = [(0, pre_a + shared), (1, pre_b + shared)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def chunks_of(t):
        w, powers = CDC_WINDOW, [
            pow(CDC_BASE, CDC_WINDOW - 1 - j, CDC_MOD) for j in range(CDC_WINDOW)
        ]
        n = len(t)
        bounds = []
        for p in range(w, n + 1):
            h = sum(ord(t[p - w + j]) * powers[j] for j in range(w)) % CDC_MOD
            if h % CDC_BOUNDARY_MOD == 0:
                bounds.append(p)
        if not bounds or bounds[-1] != n:
            bounds.append(n)
        out, lo = [], 0
        for b in bounds:
            out.append(t[lo:b])
            lo = b
        return out

    import collections
    import hashlib as _h

    cnt = collections.Counter()
    docs_per = collections.defaultdict(set)
    for did, t in rows:
        for c in chunks_of(t):
            k = _h.md5(c.encode()).hexdigest()
            cnt[k] += 1
            docs_per[k].add(did)
    want = {
        k: (cnt[k], len(docs_per[k])) for k in cnt if cnt[k] > 1
    }
    got = {
        r["chunk_hash"]: (r["n_occurrences"], r["n_docs"])
        for r in cdc_duplicate_chunks(docs).collect()
    }
    assert got == want
    # the shared tail produced actual cross-doc duplicate chunks
    assert any(nd == 2 for _, nd in got.values())


def test_fuzzy_name_matches_blocking_and_verify(spark):
    from rat_strain_loader_pipeline_spark.operators.dedup import (
        fuzzy_name_matches,
    )

    rows = [
        (1, "red widget"),
        (2, "red widgets"),   # dist 1, shares ("red", 0)
        (3, "red bolt"),      # dist to "red widget" > 2 but blocked
        (4, "blue gear"),     # no shared early token with red*
        (5, "red widget"),    # exact dup of 1: collapsed by distinct
    ]
    df = spark.createDataFrame(rows, "p_partkey long, p_name string")
    got = {
        (r["name_a"], r["name_b"]): r["dist"]
        for r in fuzzy_name_matches(df, "p_name", max_dist=2).collect()
    }
    assert got == {("red widget", "red widgets"): 1}
    # widen the radius: "red bolt" ~ "red widget" now verifies (dist 5)
    got5 = {
        (r["name_a"], r["name_b"]): r["dist"]
        for r in fuzzy_name_matches(df, "p_name", max_dist=6).collect()
    }
    assert ("red bolt", "red widget") in got5
    assert all("blue gear" not in k for pair in got5 for k in pair)


def test_fuzzy_name_matches_max_block_cap(spark):
    from rat_strain_loader_pipeline_spark.operators.dedup import (
        fuzzy_name_matches,
    )

    # "stop" is shared by all names -> with max_block=2 that blocking
    # key is dropped and no candidates survive
    rows = [(i, f"stop u{i}") for i in range(5)]
    df = spark.createDataFrame(rows, "p_partkey long, p_name string")
    assert (
        fuzzy_name_matches(df, "p_name", max_dist=3, max_block=2).count() == 0
    )
    assert (
        fuzzy_name_matches(df, "p_name", max_dist=3).count() > 0
    )


def test_dedup_recall_audit_invariants(spark, sf_dir):
    import __spark_entry__ as em

    row = em.q_dedup_recall_audit(spark, sf_dir).collect()[0]
    # LSH pairs are exact-verified, so they are a subset of truth
    assert row["n_hit"] == row["n_lsh"] <= row["n_truth"]
    if row["n_truth"]:
        assert row["recall_q"] == row["n_hit"] * 1_000_000 // row["n_truth"]


def test_centroid_distance_matrix_orthogonal_and_identical(spark):
    from rat_strain_loader_pipeline_spark.operators.similarity import (
        centroid_distance_matrix,
        label_centroid_sums,
    )

    rows = [
        (1, [1.0, 0.0], 0),
        (2, [1.0, 0.0], 0),   # label 0 centroid -> x axis
        (3, [0.0, 2.0], 1),   # label 1 centroid -> y axis (orthogonal)
        (4, [3.0, 0.0], 2),   # label 2 centroid -> x axis (parallel to 0)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {
        (r["label_a"], r["label_b"]): r["cos_q"]
        for r in centroid_distance_matrix(label_centroid_sums(df)).collect()
    }
    assert got[(0, 1)] == 0
    assert got[(0, 2)] == 1_000_000
    assert got[(1, 2)] == 0
    assert len(got) == 3


def test_cluster_margin_separable_labels(spark):
    from rat_strain_loader_pipeline_spark.operators.similarity import (
        cluster_margin,
    )

    # two clean clusters on orthogonal axes + one planted mislabel
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.9, 0.1], 0),
        (3, [0.0, 1.0], 1),
        (4, [0.1, 0.9], 1),
        (5, [1.0, 0.05], 1),   # labeled 1 but sits on label-0 axis
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {
        r["label"]: (r["n_vecs"], r["n_misassigned"])
        for r in cluster_margin(df).collect()
    }
    assert got[0] == (2, 0)
    # the planted vector must be flagged as misassigned within label 1
    assert got[1][0] == 3 and got[1][1] == 1


def test_duplicated_span_removal_counts_only_interval_union(spark):
    """The counts_only fast path (per-doc interval-union window, no
    coverage explode/DISTINCT) must report exactly the full path's
    n_removed — including overlapping and adjacent duplicated spans."""
    from rat_strain_loader_pipeline_spark.operators.dedup import (
        duplicated_span_removal,
    )

    shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    other = "o1 o2 o3 o4 o5 o6 o7 o8"
    docs = spark.createDataFrame(
        [
            (1, f"intro one {shared} outro {other} end"),
            (2, f"prefix two {shared} suffix two"),
            (3, f"{other} alone plus tail tokens here"),
            (4, "tiny doc"),
            (5, f"{shared} {other}"),
        ],
        "doc_id long, text string",
    )
    full = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"])
        for r in duplicated_span_removal(docs, k=8, min_df=2).collect()
    }
    fast = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"])
        for r in duplicated_span_removal(
            docs, k=8, min_df=2, counts_only=True
        ).collect()
    }
    assert fast == full
    fast_all = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"])
        for r in duplicated_span_removal(
            docs, k=8, min_df=2, counts_only=True, scope="all"
        ).collect()
    }
    full_all = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"])
        for r in duplicated_span_removal(
            docs, k=8, min_df=2, scope="all"
        ).collect()
    }
    assert fast_all == full_all
