

def test_zipf_hill_known_counts(spark):
    import math

    from rat_strain_loader_pipeline_spark.operators.text import zipf_hill

    # Build docs whose token counts are exactly: a=8, b=4, c=2, d=1.
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    df = spark.createDataFrame([(1, text, "en")], "doc_id long, text string, lang string")
    out = zipf_hill(df, group_col="lang", top_k=3).collect()
    assert len(out) == 1
    r = out[0]
    # ranked a,b,c kept; d (count 1) is the threshold
    assert r["k_used"] == 3 and r["c_tail"] == 1
    want = sum(math.floor(math.log(c / 1.0) * 1e6) for c in (8, 4, 2))
    assert r["ln_sum_q"] == want
    assert r["alpha_q"] == 1_000_000 + (3 * 10**12) // want


def test_zipf_hill_uniform_counts_null_alpha(spark):
    from rat_strain_loader_pipeline_spark.operators.text import zipf_hill

    # two tokens, equal counts -> ln ratio 0 -> NULL alpha
    df = spark.createDataFrame(
        [(1, "x y", "en"), (2, "x y", "en")], "doc_id long, text string, lang string"
    )
    out = zipf_hill(df, group_col="lang", top_k=5).collect()
    assert out[0]["ln_sum_q"] == 0 and out[0]["alpha_q"] is None
