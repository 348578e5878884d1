"""Skew utilities: salted plans must be result-identical to plain plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aircan_spark.skew import salted_agg, salted_join


@pytest.fixture()
def skewed(spark):
    # one hot key (90% of rows) + a long tail
    hot = spark.range(0, 900).select(
        F.lit("hot").alias("k"), (F.col("id") % 7).alias("v")
    )
    tail = spark.range(0, 100).select(
        F.concat(F.lit("t"), F.col("id") % 25).alias("k"), F.col("id").alias("v")
    )
    return hot.unionByName(tail)


def test_salted_agg_equals_plain_groupby(spark, skewed):
    plain = {
        (r["k"], r["n"], r["s"], r["mn"], r["mx"])
        for r in skewed.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r["k"], r["n"], r["s"], r["mn"], r["mx"])
        for r in salted_agg(
            skewed,
            ["k"],
            {
                "n": ("*", "count"),
                "s": ("v", "sum"),
                "mn": ("v", "min"),
                "mx": ("v", "max"),
            },
            salt_buckets=8,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_rejects_non_algebraic(spark, skewed):
    with pytest.raises(ValueError, match="algebraic"):
        salted_agg(skewed, ["k"], {"a": ("v", "avg")})


def test_salted_join_inner_equals_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", 1), ("hot", 2), ("t3", 30), ("absent", 99)], "k string, d long"
    )
    plain = sorted(
        (r["k"], r["v"], r["d"]) for r in skewed.join(dim, "k", "inner").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["d"])
        for r in salted_join(skewed, dim, ["k"], salt_buckets=4).collect()
    )
    assert salted == plain  # duplicates on BOTH sides preserved exactly


def test_salted_join_left_keeps_unmatched(spark, skewed):
    dim = spark.createDataFrame([("t3", 30)], "k string, d long")
    plain = sorted(
        (r["k"], r["v"], r["d"]) for r in skewed.join(dim, "k", "left").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["d"])
        for r in salted_join(skewed, dim, ["k"], salt_buckets=4, how="left").collect()
    )
    assert salted == plain


def test_salted_join_rejects_right_outer(spark, skewed):
    dim = spark.createDataFrame([("t3", 30)], "k string, d long")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(skewed, dim, ["k"], how="right")
