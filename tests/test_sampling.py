

def test_poisson_bootstrap_mean_structure(spark):
    from rat_strain_loader_pipeline_spark.operators.sampling import (
        poisson_bootstrap_mean,
    )

    rows = [("g", i, 100 + i) for i in range(50)]
    df = spark.createDataFrame(rows, "k string, doc_id long, x long")
    out = poisson_bootstrap_mean(
        df, keys=["k"], value_col="x", id_col="doc_id", n_resamples=16
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_docs"] == 50
    # exact point estimate: mean of 100..149 = 124.5
    assert r["mean_q"] == 124_500_000
    assert 1 <= r["b_used"] <= 16
    assert r["lo_q"] <= r["mean_q"] <= r["hi_q"]


def test_poisson_bootstrap_partition_invariant(spark):
    from pyspark.sql import functions as F

    from rat_strain_loader_pipeline_spark.operators.sampling import (
        poisson_bootstrap_mean,
    )

    rows = [("g%d" % (i % 3), i, (i * 13) % 97) for i in range(60)]
    df = spark.createDataFrame(rows, "k string, doc_id long, x long")

    def run(d):
        return sorted(
            map(
                tuple,
                poisson_bootstrap_mean(
                    d, ["k"], "x", "doc_id", n_resamples=8
                ).collect(),
            )
        )

    assert run(df.coalesce(1)) == run(df.repartition(13, F.col("doc_id") % 7))


def test_sequence_pack_bfd_hand_computed(spark):
    """Tiny known instance, capacity 10, one shard: sorted desc
    [7,6,4,3,3,2] — BFD places 7→w0, 6→w1, 4→w1 (best fit: rem 4 < 3?
    no — w1 rem 4 is the smallest that fits), 3→w0 (rem 3), 3→w2
    (nothing fits), 2→w2. Three windows; first-fit-decreasing would
    also give 3 here, but the per-step choices pin the BEST-fit
    tie-break (smallest remaining, then smallest window id)."""
    from rat_strain_loader_pipeline_spark.operators.sampling import (
        sequence_pack_bfd,
    )

    rows = [(i + 1, s, 0) for i, s in enumerate([7, 6, 4, 3, 3, 2])]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long, shard int")
    out = {
        r["doc_id"]: (r["bin_id"], r["size_eff"])
        for r in sequence_pack_bfd(df, capacity=10).collect()
    }
    assert out == {1: (0, 7), 2: (1, 6), 3: (1, 4), 4: (0, 3),
                   5: (2, 3), 6: (2, 2)}


def test_sequence_pack_bfd_truncates_and_respects_capacity(spark):
    """Oversized docs truncate to one full window and open their own;
    every window's packed size_eff total stays within capacity."""
    from rat_strain_loader_pipeline_spark.operators.sampling import (
        sequence_pack_bfd,
    )

    rows = [(1, 25, 0), (2, 9, 0), (3, 4, 0), (4, 8, 1), (5, 3, 1)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long, shard int")
    out = sequence_pack_bfd(df, capacity=10).collect()
    eff = {r["doc_id"]: r["size_eff"] for r in out}
    assert eff[1] == 10  # truncated from 25
    fills = {}
    for r in out:
        fills.setdefault((r["shard"], r["bin_id"]), 0)
        fills[(r["shard"], r["bin_id"])] += r["size_eff"]
    assert all(v <= 10 for v in fills.values())
    # the truncated doc fills a window alone
    solo = [k for k, v in fills.items() if v == 10 and k[0] == 0]
    assert solo


def test_sequence_pack_bfd_null_sizes_dropped(spark):
    """NULL n_tokens rows are dropped before the fold (a NaN size
    would poison every subsequent best-fit test); non-null rows pack
    exactly as if the null rows were absent."""
    from rat_strain_loader_pipeline_spark.operators.sampling import (
        sequence_pack_bfd,
    )

    rows = [(1, 7, 0), (2, None, 0), (3, 6, 0)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long, shard int")
    out = {
        r["doc_id"]: (r["bin_id"], r["size_eff"])
        for r in sequence_pack_bfd(df, capacity=10).collect()
    }
    assert out == {1: (0, 7), 3: (1, 6)}
