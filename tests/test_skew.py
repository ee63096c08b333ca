"""Salted aggregation/join must be result-identical to the unsalted plans
(determinism included — salting uses hash, not rand)."""

from __future__ import annotations

from pyspark.sql import functions as F

from qcfractal_spark.operators.skew import (
    adaptive_salted_join,
    co_partition,
    hot_keys,
    salted_aggregate,
    salted_join,
)


def _skewed_df(spark):
    # one hot key (90%) + long tail
    hot = spark.range(9000).select(
        F.lit("hot").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    tail = spark.range(1000).select(
        F.concat(F.lit("k"), (F.col("id") % 50).cast("string")).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.unionByName(tail)


def test_salted_aggregate_matches_plain(spark):
    df = _skewed_df(spark)
    plain = {
        (r["k"]): (r["n"], r["s"], r["mn"], r["mx"])
        for r in df.groupBy("k")
        .agg(
            F.count("v").alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r["k"]): (r["n"], r["s"], r["mn"], r["mx"])
        for r in salted_aggregate(
            df,
            ["k"],
            {"n": ("count", "v"), "s": ("sum", "v"), "mn": ("min", "v"), "mx": ("max", "v")},
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    skewed = _skewed_df(spark)
    dim = spark.createDataFrame(
        [("hot", 1)] + [(f"k{i}", i) for i in range(50)], "k string, attr int"
    )
    plain = skewed.join(dim, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("attr").alias("s")
    )
    salted = salted_join(skewed, dim, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("attr").alias("s")
    )
    a = {r["k"]: (r["n"], r["s"]) for r in plain.collect()}
    b = {r["k"]: (r["n"], r["s"]) for r in salted.collect()}
    assert a == b


def test_salted_join_outer_preserves_unmatched(spark):
    skewed = spark.createDataFrame([("a", 1), ("zz", 2)], "k string, v int")
    dim = spark.createDataFrame([("a", 10)], "k string, attr int")
    out = {r["k"]: r["attr"] for r in salted_join(skewed, dim, "k", how="left").collect()}
    assert out == {"a": 10, "zz": None}


def test_co_partition_join(spark):
    left = spark.range(1000).select(F.col("id").alias("k"), F.lit(1).alias("x"))
    right = spark.range(500).select(F.col("id").alias("k"), F.lit(2).alias("y"))
    l2, r2 = co_partition(left, right, "k", 8)
    assert l2.join(r2, "k").count() == 500
    assert l2.rdd.getNumPartitions() == 8 and r2.rdd.getNumPartitions() == 8


def test_hot_keys_exact_detection(spark):
    df = _skewed_df(spark)
    hk = {r["k"] for r in hot_keys(df, ["k"], min_count=100).collect()}
    assert hk == {"hot"}  # tail keys have 20 rows each
    assert hot_keys(df, ["k"], min_count=10_000).count() == 0


def test_adaptive_salted_join_matches_plain_and_bounds_replication(spark):
    skewed = _skewed_df(spark)
    dim = spark.createDataFrame(
        [("hot", 1)] + [(f"k{i}", i) for i in range(50)], "k string, attr int"
    )
    hk = hot_keys(skewed, ["k"], min_count=100)
    plain = skewed.join(dim, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("attr").alias("s")
    )
    adaptive = adaptive_salted_join(skewed, dim, "k", hk, buckets=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("attr").alias("s")
    )
    a = {r["k"]: (r["n"], r["s"]) for r in plain.collect()}
    b = {r["k"]: (r["n"], r["s"]) for r in adaptive.collect()}
    assert a == b
    # left join keeps unmatched fact rows exactly once
    extra = spark.createDataFrame([("zz", 0.0)], "k string, v double")
    left_out = adaptive_salted_join(
        skewed.unionByName(extra), dim, "k", hk, buckets=8, how="left"
    )
    assert left_out.where(F.col("k") == "zz").count() == 1
    # replication bound: dim grows by (buckets-1) rows per HOT key only,
    # not buckets x |dim| as in uniform salting
    flag = F.broadcast(hk.withColumn("_hot", F.lit(True)))
    salts = F.when(F.col("_hot"), F.array(*[F.lit(i) for i in range(8)])).otherwise(
        F.array(F.lit(0))
    )
    replicated = dim.join(flag, "k", "left").withColumn("_salt", F.explode(salts))
    assert replicated.count() == 51 + 7  # 51 dim rows + 7 extra copies of 'hot'

    import pytest

    with pytest.raises(ValueError, match="inner.*left"):
        adaptive_salted_join(skewed, dim, "k", hk, how="full")
