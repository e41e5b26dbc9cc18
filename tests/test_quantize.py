"""quantize_int8: affine int8 codes + exact micro-unit error report."""

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
