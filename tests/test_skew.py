"""Salted join: equality with the unsalted join, actual key splitting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rat_strain_loader_pipeline_spark.operators.skew import (
    salt_distribution,
    salted_join,
)


def _skewed(spark):
    # one hot key (90%) + tail
    fact = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, "HOT").otherwise(F.concat(F.lit("k"), F.col("id") % 7)).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.createDataFrame(
        [("HOT", 1), ("k0", 2), ("k3", 3), ("absent", 9)], "k string, attr int"
    )
    return fact, dim


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_salted_join_equals_plain(spark, how):
    fact, dim = _skewed(spark)
    plain = fact.join(dim, ["k"], how)
    salted = salted_join(fact, dim, ["k"], n_salts=4, how=how)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_hot_key_actually_splits(spark):
    fact, _ = _skewed(spark)
    dist = salt_distribution(fact, ["k"], n_salts=4).filter(F.col("k") == "HOT").collect()
    # the hot key spreads over every salt bucket, none holding everything
    assert len(dist) == 4
    assert max(r["count"] for r in dist) < 1800


def test_unsupported_how_raises(spark):
    fact, dim = _skewed(spark)
    with pytest.raises(ValueError):
        salted_join(fact, dim, ["k"], how="full")
