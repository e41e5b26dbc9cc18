"""Round-6 curation operators: int8/PQ quantization, byte-budget
shards, hard-negative mining."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_quantize_codes_and_errors(spark):
    from rat_strain_loader_pipeline_spark.operators.quantize import quantize_int8

    rows = [
        (0, [0.0, 10.0, 7.5]),
        (1, [1.0, 0.0, 7.5]),
        (2, [0.5, 5.0, 7.5]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    # dim0 range [0,1]: codes 0/255/127; dim1 range [0,10]: 255/0/127;
    # dim2 constant: mx-mn=0 -> code 0 for everyone
    assert out[0]["sum_code"] == 0 + 255 + 0
    assert out[1]["sum_code"] == 255 + 0 + 0
    assert out[2]["sum_code"] == 127 + 127 + 0
    # range endpoints reconstruct exactly -> zero error (constant dim too)
    assert out[0]["sum_err_q"] == 0
    assert out[1]["sum_err_q"] == 0
    # mid-range values carry quantization error, bounded by one step
    # (step = range/255 -> dim0 ~3922 micros, dim1 ~39216 micros)
    assert 0 < out[2]["max_err_q"] <= 39216
    assert out[2]["sum_err_q"] >= out[2]["max_err_q"]


def test_pq_codes_compose_subspace_kmeans(spark, sf_dir):
    from rat_strain_loader_pipeline_spark.operators.clustering import kmeans_micros
    from rat_strain_loader_pipeline_spark.operators.quantize import pq_codes
    from rat_strain_loader_pipeline_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    out = {r["vec_id"]: r for r in pq_codes(emb, dims=64, m=2, k=4, iters=2).collect()}
    assert len(out) == emb.count()
    assert all(0 <= r["code_s0"] < 4 and 0 <= r["code_s1"] < 4 for r in out.values())
    # dist_q is exactly the sum of the two independent subspace runs
    lo = kmeans_micros(
        emb.select("vec_id", F.slice("embedding", 1, 32).alias("embedding")),
        k=4,
        iters=2,
    )
    hi = kmeans_micros(
        emb.select("vec_id", F.slice("embedding", 33, 32).alias("embedding")),
        k=4,
        iters=2,
    )
    lo_d = {r["vec_id"]: r["dist_sq"] for r in lo.collect()}
    hi_d = {r["vec_id"]: r["dist_sq"] for r in hi.collect()}
    assert all(out[v]["dist_q"] == lo_d[v] + hi_d[v] for v in out)


def test_quantize_partition_invariant(spark, sf_dir):
    from rat_strain_loader_pipeline_spark.operators.quantize import quantize_int8
    from rat_strain_loader_pipeline_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    a = sorted(tuple(r) for r in quantize_int8(emb.coalesce(1)).collect())
    b = sorted(
        tuple(r)
        for r in quantize_int8(emb.repartition(13, F.col("vec_id") % 7)).collect()
    )
    assert a == b
    assert len(a) == emb.count()


def test_shard_by_bytes_contiguous_and_budgeted(spark, sf_dir):
    from rat_strain_loader_pipeline_spark.operators.sampling import (
        deterministic_shuffle,
        shard_by_bytes,
    )
    from rat_strain_loader_pipeline_spark.sources.tables import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ranked = deterministic_shuffle(docs)
    budget = 10_000
    out = shard_by_bytes(ranked, "n_chars", budget, block=64)
    man = (
        out.groupBy("shard_id")
        .agg(
            F.sum("n_chars").alias("chars"),
            F.max("n_chars").alias("biggest"),
            F.min("shuffle_rank").alias("lo"),
            F.max("shuffle_rank").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("shard_id")
        .collect()
    )
    # shards are contiguous rank ranges covering 1..N without gaps
    assert man[0]["lo"] == 1
    for prev, cur in zip(man, man[1:]):
        assert cur["lo"] == prev["hi"] + 1
        assert prev["hi"] - prev["lo"] + 1 == prev["n"]
    assert man[-1]["hi"] == docs.count()
    # greedy budget: every non-last shard's char total is within one
    # doc of the budget on both sides (a doc straddling the boundary
    # charges the overflow to the earlier shard)
    gmax = max(r["biggest"] for r in man)
    for r in man[:-1]:
        assert budget - gmax < r["chars"] < budget + gmax
    # same result regardless of input partitioning
    b = shard_by_bytes(
        deterministic_shuffle(docs.repartition(17, F.col("doc_id") % 5)),
        "n_chars",
        budget,
        block=64,
    )
    assert sorted(map(tuple, out.select("doc_id", "shard_id").collect())) == sorted(
        map(tuple, b.select("doc_id", "shard_id").collect())
    )


def test_hard_negatives_excludes_same_label(spark):
    from rat_strain_loader_pipeline_spark.operators.similarity import hard_negatives

    rows = [
        (0, [1.0, 0.0], 1),   # anchor
        (1, [0.99, 0.14], 1),  # same label, nearest — must be excluded
        (2, [0.9, 0.43], 2),   # different label, the true hard negative
        (3, [0.0, 1.0], 2),    # different label, far
        (4, [-1.0, 0.0], 3),   # different label, opposite
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = hard_negatives(df.filter("vec_id = 0"), df, neg_k=2).collect()
    assert [(r["c_id"], r["rank"]) for r in sorted(out, key=lambda r: r["rank"])] == [
        (2, 1),
        (3, 2),
    ]
    # negative cosine is representable (floor toward -inf on both sides)
    neg = hard_negatives(df.filter("vec_id = 0"), df, neg_k=3).collect()
    worst = max(neg, key=lambda r: r["rank"])
    assert worst["c_id"] == 4 and worst["cos_micros"] <= -999999


def test_pq_adc_self_distance_matches_pq_codes(spark, sf_dir):
    from rat_strain_loader_pipeline_spark.operators.quantize import (
        pq_adc_topk,
        pq_codes,
    )
    from rat_strain_loader_pipeline_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    n = emb.count()
    q = emb.filter(F.col("vec_id") < 5)
    # topk = full corpus so every (query, corpus) pair is present
    adc = pq_adc_topk(q, emb, dims=64, m=2, k=4, iters=2, topk=n)
    self_d = {
        r["q_id"]: r["adist_q"]
        for r in adc.filter(F.col("q_id") == F.col("c_id")).collect()
    }
    truth = {
        r["vec_id"]: r["dist_q"]
        for r in pq_codes(emb, dims=64, m=2, k=4, iters=2)
        .filter(F.col("vec_id") < 5)
        .collect()
    }
    # ADC distance of a vector to itself IS its PQ quantization distance
    assert self_d == truth
    # ranks are a permutation 1..n per query
    ranks = [r["rank"] for r in adc.filter(F.col("q_id") == 0).collect()]
    assert sorted(ranks) == list(range(1, n + 1))


def test_ivf_pq_recall_monotone_in_nprobe(spark, sf_dir):
    """Probing every list removes routing loss, so recall@k with
    nprobe=coarse_k must dominate nprobe=1 per query; hits are
    bounded by k."""
    from rat_strain_loader_pipeline_spark.operators.quantize import ivf_pq_recall
    from rat_strain_loader_pipeline_spark.sources.tables import read_table
    from pyspark.sql import functions as F2

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F2.col("vec_id") < 5)
    kw = dict(dims=64, coarse_k=4, coarse_iters=2, m=2, k=4, iters=2, topk=3)
    r_all = {
        r["q_id"]: r["n_hits"]
        for r in ivf_pq_recall(q, emb, nprobe=4, **kw).collect()
    }
    r_one = {
        r["q_id"]: r["n_hits"]
        for r in ivf_pq_recall(q, emb, nprobe=1, **kw).collect()
    }
    assert set(r_all) == set(r_one) and len(r_all) == 5
    for qid in r_all:
        assert 0 <= r_one[qid] <= r_all[qid] <= 3


def test_ivf_pq_residual_partition_invariant(spark, sf_dir):
    from rat_strain_loader_pipeline_spark.operators.quantize import (
        ivf_pq_topk_residual,
    )
    from rat_strain_loader_pipeline_spark.sources.tables import read_table
    from pyspark.sql import functions as F2

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F2.col("vec_id") < 4)
    kw = dict(dims=64, coarse_k=4, coarse_iters=2, m=2, k=4, iters=2,
              nprobe=2, topk=3)
    a = sorted(tuple(r) for r in ivf_pq_topk_residual(q, emb.coalesce(1), **kw).collect())
    b = sorted(
        tuple(r)
        for r in ivf_pq_topk_residual(
            q, emb.repartition(9, F2.col("vec_id") % 4), **kw
        ).collect()
    )
    assert a == b
    assert len(a) == 4 * 3
    # ranks are 1..topk per query
    ranks = {}
    for qid, cid, rank, dist in a:
        ranks.setdefault(qid, []).append(rank)
    assert all(sorted(v) == [1, 2, 3] for v in ranks.values())


def test_opq_dim_assign_balanced_permutation(spark, sf_dir):
    """The OPQ map is a permutation-shaped allocation: every dim
    appears exactly once, groups are variance-snake balanced (64 dims,
    m=2 -> 32/32), and the map is input-partitioning invariant."""
    from rat_strain_loader_pipeline_spark.operators.quantize import opq_dim_assign
    from rat_strain_loader_pipeline_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    rows = opq_dim_assign(emb, m=2).collect()
    assert sorted(r["dim"] for r in rows) == list(range(64))
    sizes = {}
    for r in rows:
        sizes[r["g"]] = sizes.get(r["g"], 0) + 1
    assert sizes == {0: 32, 1: 32}
    again = {
        r["dim"]: r["g"]
        for r in opq_dim_assign(
            emb.repartition(7, F.col("vec_id") % 3), m=2
        ).collect()
    }
    assert again == {r["dim"]: r["g"] for r in rows}


def test_pq_adc_topk_opq_partition_invariant_and_ranked(spark, sf_dir):
    from rat_strain_loader_pipeline_spark.operators.quantize import pq_adc_topk_opq
    from rat_strain_loader_pipeline_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 4)
    kw = dict(dims=64, m=2, k=4, iters=2, topk=3)
    a = sorted(tuple(r) for r in pq_adc_topk_opq(q, emb.coalesce(1), **kw).collect())
    b = sorted(
        tuple(r)
        for r in pq_adc_topk_opq(
            q, emb.repartition(9, F.col("vec_id") % 4), **kw
        ).collect()
    )
    assert a == b
    assert len(a) == 4 * 3
    ranks = {}
    for qid, cid, rank, dist in a:
        ranks.setdefault(qid, []).append(rank)
    assert all(sorted(v) == [1, 2, 3] for v in ranks.values())


def test_ivf_pq_reindex_drifted_touched_equality_and_passthrough(spark, sf_dir):
    """MAINTAIN-half contract (the connected_components_incremental
    shape): (a) with an empty new batch nothing flags and the manifest
    fingerprints reproduce the stored artifact bit-for-bit (pure
    passthrough); (b) with the drifted odd/reversed batch, every list
    the gate flags carries EXACTLY the codes+centroid fingerprints the
    force-all full re-encode produces (touched-list equality), while
    untouched lists keep their stored centroid fingerprint."""
    import __spark_entry__ as em
    from rat_strain_loader_pipeline_spark.operators.quantize import (
        ivf_pq_reindex_drifted,
    )
    from rat_strain_loader_pipeline_spark.operators.sampling import md5_mod
    from rat_strain_loader_pipeline_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    old = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter(F.col("vec_id") % 2 == 1).select(
        "vec_id", F.reverse("embedding").alias("embedding")
    )
    path = em._ivf_residual_even_index_path(spark, sf_dir)
    kw = dict(dims=64, m=2, fp_mod=em.IVFPQ_FP_MOD)

    # (a) empty batch -> passthrough == stored artifact
    empty = new.filter(F.lit(False))
    base = {r["j"]: r for r in ivf_pq_reindex_drifted(
        spark, path, old, empty, drift_threshold_q=500_000, **kw
    ).collect()}
    assert base and not any(r["reindexed"] for r in base.values())
    stored = spark.read.parquet(path + "/codes")
    lists = stored.filter(F.col("g") == -1).select(
        "vec_id", F.col("j").alias("jc")
    )
    stored_fp = {
        r["jc"]: r["fp"]
        for r in stored.filter(F.col("g") >= 0)
        .join(lists, "vec_id")
        .select(
            "jc",
            md5_mod(
                F.concat_ws(":", F.lit("k"), F.col("vec_id").cast("string"),
                            F.col("g").cast("string"), F.col("j").cast("string")),
                em.IVFPQ_FP_MOD,
            ).alias("h"),
        )
        .groupBy("jc")
        .agg(F.expr(
            f"CAST(sum(CAST(h AS DECIMAL(38,0))) % {em.IVFPQ_FP_MOD} AS BIGINT)"
        ).alias("fp"))
        .collect()
    }
    assert {j: r["fp_codes"] for j, r in base.items()} == stored_fp

    # (b) drifted batch: incremental == full on touched lists,
    #     stored centroid fp kept on untouched lists
    drifts = sorted(
        r["drift_q"]
        for r in ivf_pq_reindex_drifted(
            spark, path, old, new, drift_threshold_q=0, **kw
        ).collect()
        if r["drift_q"] is not None
    )
    thr = drifts[len(drifts) // 2]  # force a split on this corpus
    inc = {r["j"]: r for r in ivf_pq_reindex_drifted(
        spark, path, old, new, drift_threshold_q=thr, **kw
    ).collect()}
    full = {r["j"]: r for r in ivf_pq_reindex_drifted(
        spark, path, old, new, force_all=True, **kw
    ).collect()}
    touched = [j for j, r in inc.items() if r["reindexed"]]
    untouched = [j for j, r in inc.items() if not r["reindexed"]]
    assert touched and untouched  # both branches exercised
    for j in touched:
        assert inc[j]["fp_codes"] == full[j]["fp_codes"], j
        assert inc[j]["fp_cent"] == full[j]["fp_cent"], j
    cent_fp = {
        r["jc"]: r["fp"]
        for r in spark.read.parquet(path + "/coarse_centroids")
        .select(
            F.col("j").alias("jc"),
            md5_mod(
                F.concat_ws(":", F.lit("c"), F.col("dim").cast("string"),
                            F.col("c").cast("string")),
                em.IVFPQ_FP_MOD,
            ).alias("h"),
        )
        .groupBy("jc")
        .agg(F.expr(
            f"CAST(sum(CAST(h AS DECIMAL(38,0))) % {em.IVFPQ_FP_MOD} AS BIGINT)"
        ).alias("fp"))
        .collect()
    }
    for j in untouched:
        assert inc[j]["fp_cent"] == cent_fp[j], j


def test_ivf_pq_nprobe_curve_monotone_and_full_probe_equivalence(spark, sf_dir):
    """The recall curve is monotone nondecreasing in nprobe (candidate
    sets are nested), and the full-probe point equals ivf_pq_recall at
    nprobe = coarse_k summed over queries."""
    import __spark_entry__ as em
    from pyspark.sql import functions as F2
    from rat_strain_loader_pipeline_spark.operators.quantize import (
        ivf_pq_nprobe_curve,
        ivf_pq_recall,
    )
    from rat_strain_loader_pipeline_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F2.col("vec_id") < em.PQADC_QUERIES)
    path = em._ivf_index_path(spark, sf_dir)
    curve = {
        r["nprobe"]: r["n_hits"]
        for r in ivf_pq_nprobe_curve(
            spark, path, q, emb, dims=em.EMB_DIMS, coarse_k=em.KMEANS_K,
            m=em.PQ_M, topk=em.PQADC_TOPK,
        ).collect()
    }
    assert sorted(curve) == list(range(1, em.KMEANS_K + 1))
    vals = [curve[n] for n in sorted(curve)]
    assert all(a <= b for a, b in zip(vals, vals[1:]))
    full = sum(
        r["n_hits"]
        for r in ivf_pq_recall(
            q, emb, dims=em.EMB_DIMS, coarse_k=em.KMEANS_K,
            coarse_iters=em.IVFPQ_COARSE_ITERS, m=em.PQ_M, k=em.PQ_K,
            iters=em.PQ_ITERS, nprobe=em.KMEANS_K, topk=em.PQADC_TOPK,
        ).collect()
    )
    assert vals[-1] == full


def test_ivf_pq_opq_serve_matches_hermetic_dim_map(spark, sf_dir):
    """The OPQ artifact persists the dim map as model state; serving
    from it is bit-identical to the hermetic ivf_pq_topk(dim_map=)
    run at the same constants."""
    import __spark_entry__ as em
    from pyspark.sql import functions as F2
    from rat_strain_loader_pipeline_spark.operators.quantize import (
        ivf_pq_serve_topk,
        ivf_pq_topk,
        opq_dim_assign,
    )
    from rat_strain_loader_pipeline_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F2.col("vec_id") < em.PQADC_QUERIES)
    path = em._ivf_opq_index_path(spark, sf_dir)
    assert path == em._ivf_opq_index_path(spark, sf_dir)  # idempotent
    served = {
        (r["q_id"], r["rank"]): (r["c_id"], r["adist_q"])
        for r in ivf_pq_serve_topk(
            spark, path, q, dims=em.EMB_DIMS, m=em.PQ_M,
            nprobe=em.IVFPQ_NPROBE, topk=em.PQADC_TOPK,
        ).collect()
    }
    dim_map = opq_dim_assign(emb, m=em.PQ_M)
    hermetic = {
        (r["q_id"], r["rank"]): (r["c_id"], r["adist_q"])
        for r in ivf_pq_topk(
            q, emb, dims=em.EMB_DIMS, coarse_k=em.KMEANS_K,
            coarse_iters=em.IVFPQ_COARSE_ITERS, m=em.PQ_M, k=em.PQ_K,
            iters=em.PQ_ITERS, nprobe=em.IVFPQ_NPROBE,
            topk=em.PQADC_TOPK, dim_map=dim_map,
        ).collect()
    }
    assert served == hermetic


def test_opq_dim_assign_m4_snake(spark, sf_dir):
    """Snake allocation generalizes beyond m=2: with m=4 the ranked
    dims deal 0,1,2,3,3,2,1,0,... so each group gets dims/m dims and
    consecutive-rank variance mass spreads across groups."""
    from rat_strain_loader_pipeline_spark.operators.quantize import opq_dim_assign
    from rat_strain_loader_pipeline_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    rows = opq_dim_assign(emb, m=4).collect()
    sizes = {}
    for r in rows:
        sizes[r["g"]] = sizes.get(r["g"], 0) + 1
    assert sizes == {0: 16, 1: 16, 2: 16, 3: 16}
    # reconstruct rank order from the variance stat to pin the snake
    from pyspark.sql import functions as F2

    ex = emb.select(F2.posexplode("embedding").alias("dim", "x")).select(
        "dim",
        F2.floor(F2.col("x").cast("double") * 1000000).cast("long").alias("xq"),
    )
    stats = (
        ex.groupBy("dim")
        .agg(F2.expr(
            "CAST(count(*) AS DECIMAL(38,0)) * sum(CAST(xq AS DECIMAL(38,0)) * xq)"
            " - sum(CAST(xq AS DECIMAL(38,0))) * sum(CAST(xq AS DECIMAL(38,0)))"
        ).alias("s"))
        .collect()
    )
    ranked = [r["dim"] for r in sorted(stats, key=lambda r: (-r["s"], r["dim"]))]
    gmap = {r["dim"]: r["g"] for r in rows}
    expected = []
    for block in range(0, 64, 4):
        off = [0, 1, 2, 3] if (block // 4) % 2 == 0 else [3, 2, 1, 0]
        expected.extend(off)
    assert [gmap[d] for d in ranked] == expected


def test_validate_dim_map_rejects_wrong_coverage(spark):
    """A dim_map that doesn't cover exactly 0..dims-1 must raise at
    build time instead of silently truncating ADC distances through
    the inner map join."""
    import pytest

    from rat_strain_loader_pipeline_spark.operators.quantize import (
        _validate_dim_map,
    )

    good = spark.createDataFrame(
        [(d, d % 2) for d in range(8)], "dim int, g int"
    )
    _validate_dim_map(good, 8)  # exact cover: no raise
    short = spark.createDataFrame(
        [(d, d % 2) for d in range(6)], "dim int, g int"
    )
    with pytest.raises(ValueError, match="cover exactly"):
        _validate_dim_map(short, 8)
    dup = spark.createDataFrame(
        [(0, 0), (0, 1)] + [(d, d % 2) for d in range(1, 7)],
        "dim int, g int",
    )
    with pytest.raises(ValueError, match="cover exactly"):
        _validate_dim_map(dup, 8)
    shifted = spark.createDataFrame(
        [(d + 1, d % 2) for d in range(8)], "dim int, g int"
    )
    with pytest.raises(ValueError, match="cover exactly"):
        _validate_dim_map(shifted, 8)


def test_pq_index_build_layout_in_slug(spark, sf_dir, tmp_path):
    """Raw and OPQ flat-PQ artifacts at the SAME tag land at different
    slugged paths (the layout is artifact identity), and load-or-build
    is idempotent per layout."""
    from rat_strain_loader_pipeline_spark.operators.quantize import (
        pq_index_build,
    )
    from rat_strain_loader_pipeline_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings").limit(32)
    root = str(tmp_path)
    p_raw = pq_index_build(emb, dims=64, m=2, k=4, iters=1, root=root, tag="t")
    p_opq = pq_index_build(
        emb, dims=64, m=2, k=4, iters=1, root=root, tag="t", opq=True
    )
    assert p_raw != p_opq
    assert "-opq" in p_opq.split("/")[-1]
    assert p_raw == pq_index_build(
        emb, dims=64, m=2, k=4, iters=1, root=root, tag="t"
    )


def test_ivf_pq_maintenance_plan_decision_flips_on_planted_shift(spark, sf_dir):
    """The staleness rung's three-way decision responds to the data:
    with every list force-drifted, a MILD shift (reversed vectors —
    same scale, so the frozen codebooks still fit) decides reencode,
    while a STRONG planted shift (x3-scaled vectors — residuals far
    outside the codebooks' fitted range) flips the same lists to
    retrain; and with an in-distribution batch at the real gate, lists
    pass through untouched."""
    import __spark_entry__ as em
    from rat_strain_loader_pipeline_spark.operators.quantize import (
        ivf_pq_maintenance_plan,
    )
    from rat_strain_loader_pipeline_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    path = em._ivf_residual_even_index_path(spark, sf_dir)
    old = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)

    def plan(batch, drift_q, ratio_q):
        return {
            r["j"]: r["decision"]
            for r in ivf_pq_maintenance_plan(
                spark, path, old, batch,
                dims=em.EMB_DIMS, m=em.PQ_M,
                drift_threshold_q=drift_q, stale_ratio_q=ratio_q,
            ).collect()
        }

    force_all = 1_000_001  # drift cosine is <= 1e6, so every list gates
    mild = plan(
        odd.select("vec_id", F.reverse("embedding").alias("embedding")),
        force_all, em.MPLAN_STALE_RATIO_Q,
    )
    strong = plan(
        odd.select(
            "vec_id",
            F.expr("transform(embedding, x -> x * 3.0D)").alias("embedding"),
        ),
        force_all, em.MPLAN_STALE_RATIO_Q,
    )
    assert set(mild.values()) == {"reencode"}
    assert "retrain" in set(strong.values())
    flipped = [j for j in mild if strong.get(j) == "retrain"]
    assert flipped, "the planted x3 shift must flip at least one list"
    # in-distribution traffic at the real gate: untouched lists
    same = plan(odd, em.REINDEX_DRIFT_Q, em.MPLAN_STALE_RATIO_Q)
    assert "passthrough" in set(same.values())


def test_ivf_pq_maintenance_apply_acts_on_decision(spark, sf_dir):
    """The apply rung executes the plan: (a) with an in-distribution
    batch at the real gate, passthrough lists' final code/centroid
    fingerprints equal a manifest computed from the STORED artifact
    content (verbatim copy, old members never re-encoded); (b) with
    every list force-drifted and a planted x3 shift, retrained lists'
    final ADC error is never worse than the frozen-codebook re-encode
    error the plan measured (the kmeans objective only improves on an
    assignment against its init centroids)."""
    import os

    import __spark_entry__ as em
    from rat_strain_loader_pipeline_spark.operators.quantize import (
        ivf_pq_maintenance_apply,
        ivf_pq_maintenance_plan,
    )
    from rat_strain_loader_pipeline_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    path = em._ivf_residual_even_index_path(spark, sf_dir)
    old = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)

    # (a) in-distribution batch: passthrough lists copy verbatim.
    applied = {
        r["j"]: r
        for r in ivf_pq_maintenance_apply(
            spark, path, old, odd,
            dims=em.EMB_DIMS, m=em.PQ_M, k=em.PQ_K, iters=em.PQ_ITERS,
            drift_threshold_q=em.REINDEX_DRIFT_Q,
            stale_ratio_q=em.MPLAN_STALE_RATIO_Q,
            fp_mod=em.IVFPQ_FP_MOD,
        ).collect()
    }
    passthrough = [j for j, r in applied.items() if r["decision"] == "passthrough"]
    assert passthrough, "in-distribution batch must leave some list untouched"
    for j in passthrough:
        assert applied[j]["err_final_q"] is None
    # stored-content fingerprints of one passthrough list's OLD code
    # rows must be a subset component of the final fp only when the
    # list gained no new members; check such a list exists and matches
    from rat_strain_loader_pipeline_spark.operators.sampling import md5_mod

    stored = spark.read.parquet(os.path.join(path, "codes"))
    lists = stored.filter(F.col("g") == -1).select(
        "vec_id", F.col("j").alias("jc")
    )
    quiet = [j for j in passthrough if applied[j]["n_new"] == 0]
    if quiet:
        fp_stored = {
            r["jc"]: r["fp"]
            for r in stored.filter(F.col("g") >= 0)
            .join(lists, "vec_id")
            .filter(F.col("jc").isin([int(j) for j in quiet]))
            .select(
                "jc",
                md5_mod(
                    F.concat_ws(
                        ":",
                        F.lit("k"),
                        F.col("vec_id").cast("string"),
                        F.col("g").cast("string"),
                        F.col("j").cast("string"),
                    ),
                    em.IVFPQ_FP_MOD,
                ).alias("h"),
            )
            .groupBy("jc")
            .agg(
                F.expr(
                    f"CAST(sum(CAST(h AS DECIMAL(38,0))) % {em.IVFPQ_FP_MOD} AS BIGINT)"
                ).alias("fp")
            )
            .collect()
        }
        for j, fp in fp_stored.items():
            assert applied[j]["fp_codes"] == fp

    # (b) planted strong shift, force-drifted: retrain beats reencode.
    strong_batch = odd.select(
        "vec_id",
        F.expr("transform(embedding, x -> x * 3.0D)").alias("embedding"),
    )
    force_all = 1_000_001
    plan = {
        r["j"]: r
        for r in ivf_pq_maintenance_plan(
            spark, path, old, strong_batch,
            dims=em.EMB_DIMS, m=em.PQ_M,
            drift_threshold_q=force_all,
            stale_ratio_q=em.MPLAN_STALE_RATIO_Q,
        ).collect()
    }
    applied2 = {
        r["j"]: r
        for r in ivf_pq_maintenance_apply(
            spark, path, old, strong_batch,
            dims=em.EMB_DIMS, m=em.PQ_M, k=em.PQ_K, iters=em.PQ_ITERS,
            drift_threshold_q=force_all,
            stale_ratio_q=em.MPLAN_STALE_RATIO_Q,
            fp_mod=em.IVFPQ_FP_MOD,
        ).collect()
    }
    retrained = [j for j, r in applied2.items() if r["decision"] == "retrain"]
    assert retrained, "the planted x3 shift must retrain at least one list"
    for j in retrained:
        assert applied2[j]["err_final_q"] is not None
        assert applied2[j]["err_final_q"] <= plan[j]["err_refreshed_q"]
