

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
