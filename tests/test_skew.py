"""Skew operators: salted two-phase aggregate and salted join must be
result-identical to their plain counterparts on skewed input."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from icebergproject_spark.operators.skew import salted_agg, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90%) + long tail
    hot = [("hot", i % 7, float(i % 13)) for i in range(900)]
    tail = [(f"k{i}", i, float(i)) for i in range(100)]
    return spark.createDataFrame(hot + tail, ["key", "n", "x"])


def test_salted_agg_matches_plain(spark, skewed):
    plain = {
        r.key: (r.s, r.c, r.mn, r.mx)
        for r in skewed.groupBy("key")
        .agg(
            F.sum("x").alias("s"),
            F.count(F.lit(1)).alias("c"),
            F.min("n").alias("mn"),
            F.max("n").alias("mx"),
        )
        .collect()
    }
    salted = {
        r.key: (r.s, r.c, r.mn, r.mx)
        for r in salted_agg(
            skewed,
            keys=["key"],
            aggs={
                "s": ("sum", "x"),
                "c": ("count", "x"),
                "mn": ("min", "n"),
                "mx": ("max", "n"),
            },
            salt_buckets=8,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_rejects_non_algebraic(skewed):
    with pytest.raises(ValueError):
        salted_agg(skewed, ["key"], {"a": ("avg", "x")})


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H"), ("k1", "K1"), ("k2", "K2")], ["key", "label"]
    )
    plain = sorted(
        (r.key, r.n, r.label)
        for r in skewed.join(dim, ["key"], "left").collect()
    )
    salted = sorted(
        (r.key, r.n, r.label)
        for r in salted_join(skewed, dim, on=["key"], how="left").collect()
    )
    assert salted == plain


def test_salted_join_inner(spark, skewed):
    dim = spark.createDataFrame([("hot", "H")], ["key", "label"])
    plain = skewed.join(dim, ["key"], "inner").count()
    assert salted_join(skewed, dim, on=["key"], how="inner").count() == plain
