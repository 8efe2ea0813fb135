"""Utility operator tests: parallelism fan-out and the salted skew join."""

from __future__ import annotations

from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.util import ensure_parallelism, salted_join


def test_ensure_parallelism_fans_out_and_noops(spark):
    few = spark.range(1000).coalesce(1)
    assert ensure_parallelism(few).rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
    many = spark.range(1000).repartition(64)
    # already parallel enough: untouched, no extra exchange
    assert ensure_parallelism(many).rdd.getNumPartitions() == 64


def test_salted_join_matches_plain_join(spark):
    # heavy skew: 90% of left rows share one key
    left = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("lval"),
    )
    right = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 2).alias("rval"))
    plain = left.join(right, "k").groupBy("k").agg(
        F.count("*").alias("n"), F.sum("rval").alias("s")
    )
    salted = salted_join(left, right, "k").groupBy("k").agg(
        F.count("*").alias("n"), F.sum("rval").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_hot_key(spark):
    left = spark.range(10_000).select(F.lit(1).alias("k"), F.col("id").alias("lval"))
    right = spark.range(4).select(F.col("id").alias("k"), F.col("id").alias("rval"))
    out = salted_join(left, right, "k", salt_buckets=8)
    assert out.count() == 10_000  # only k=1 matches; every row exactly once
