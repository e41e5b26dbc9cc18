"""Zygosity ladder tests (X4/X5) — thresholds 100/85/15, half-up rounding,
hemizygous/PAR paths (decompiled edu.mcw.rgd.util.Zygosity semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rat_strain_loader_pipeline_spark.functions.zygosity import (
    zygosity_indel,
    zygosity_snv,
)


def _run_snv(spark, rows):
    df = spark.createDataFrame(
        rows,
        "ref string, var string, a int, c int, g int, t int, gender string, chr string, in_par boolean",
    )
    cols = zygosity_snv(
        F.col("ref"), F.col("var"), F.col("a"), F.col("c"), F.col("g"), F.col("t"),
        F.col("gender"), F.col("chr"), F.col("in_par"),
    )
    return df.withColumns(cols).collect()


def test_snv_status_ladder(spark):
    rows = [
        # var=C: 100% → homozygous
        ("A", "C", 0, 50, 0, 0, "F", "1", False),
        # 85% exactly → possibly homozygous (85/100 counts)
        ("A", "C", 15, 85, 0, 0, "F", "1", False),
        # 84% → heterozygous
        ("A", "C", 16, 84, 0, 0, "F", "1", False),
        # 15% → heterozygous + poss_error Y
        ("A", "C", 85, 15, 0, 0, "F", "1", False),
    ]
    out = _run_snv(spark, rows)
    assert out[0]["zygosity_status"] == "homozygous"
    assert out[0]["zygosity_percent_read"] == 100
    assert out[0]["zygosity_ref_allele"] == "N"
    assert out[0]["zygosity_num_allele"] == 1
    assert out[1]["zygosity_status"] == "possibly homozygous"
    assert out[2]["zygosity_status"] == "heterozygous"
    assert out[2]["zygosity_ref_allele"] == "Y"
    assert out[2]["zygosity_num_allele"] == 2
    assert out[3]["zygosity_poss_error"] == "Y"
    assert out[3]["zygosity_percent_read"] == 15


def test_snv_half_up_rounding(spark):
    # 1/3 → 33.33 → 33 ; 2/3 → 66.67 → 67 ; 0.5 boundary: 1/200 = 0.5 → 1
    rows = [
        ("A", "C", 2, 1, 0, 0, "F", "1", False),
        ("A", "C", 1, 2, 0, 0, "F", "1", False),
        ("A", "C", 199, 1, 0, 0, "F", "1", False),
    ]
    out = _run_snv(spark, rows)
    assert out[0]["zygosity_percent_read"] == 33
    assert out[1]["zygosity_percent_read"] == 67
    assert out[2]["zygosity_percent_read"] == 1  # 0.5 rounds up


def test_hemizygous_paths(spark):
    rows = [
        # male, X, outside PAR: ladder → hemizygous family
        ("A", "C", 0, 50, 0, 0, "M", "X", False),
        ("A", "C", 15, 85, 0, 0, "M", "X", False),
        ("A", "C", 50, 50, 0, 0, "M", "X", False),
        # male, X, inside PAR: autosomal ladder + in_pseudo=Y
        ("A", "C", 0, 50, 0, 0, "M", "X", True),
        # female X: autosomal ladder
        ("A", "C", 0, 50, 0, 0, "F", "X", False),
        # gender P behaves like male (patient)
        ("A", "C", 0, 50, 0, 0, "P", "Y", False),
    ]
    out = _run_snv(spark, rows)
    assert out[0]["zygosity_status"] == "hemizygous"
    assert out[1]["zygosity_status"] == "probably hemizygous"
    assert out[2]["zygosity_status"] == "possibly hemizygous"
    assert out[3]["zygosity_status"] == "homozygous"
    assert out[3]["zygosity_in_pseudo"] == "Y"
    assert out[4]["zygosity_status"] == "homozygous"
    assert out[4]["zygosity_in_pseudo"] == "N"
    assert out[5]["zygosity_status"] == "hemizygous"


def test_case_insensitive_alleles(spark):
    rows = [("a", "c", 10, 90, 0, 0, "F", "1", False)]
    out = _run_snv(spark, rows)
    assert out[0]["zygosity_percent_read"] == 90
    assert out[0]["zygosity_ref_allele"] == "Y"


def test_indel_zygosity(spark):
    df = spark.createDataFrame(
        [
            # 100%: hom
            (50, 50, "A", None, None, None, None, "F", "1", False),
            # 85.4 → 85 possibly hom ; 84.5 → 85 (half-up)
            (854, 1000, "A", None, None, None, None, "F", "1", False),
            (169, 200, "A", None, None, None, None, "F", "1", False),
            # zero depth → 0 percent (F9 drop happens upstream)
            (0, 100, "A", None, None, None, None, "F", "1", False),
        ],
        "ad int, rd int, ref string, a int, c int, g int, t int, gender string, chr string, in_par boolean",
    )
    cols = zygosity_indel(
        F.col("ad"), F.col("rd"), F.col("ref"), F.col("a"), F.col("c"), F.col("g"), F.col("t"),
        F.col("gender"), F.col("chr"), F.col("in_par"),
    )
    out = df.withColumns(cols).collect()
    assert out[0]["zygosity_status"] == "homozygous"
    assert out[1]["zygosity_percent_read"] == 85
    assert out[1]["zygosity_status"] == "possibly homozygous"
    assert out[2]["zygosity_percent_read"] == 85  # 84.5 half-up
    assert out[3]["zygosity_percent_read"] == 0
    assert out[3]["zygosity_poss_error"] == "Y"
