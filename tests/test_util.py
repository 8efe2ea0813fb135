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


def test_ensure_parallelism_is_metadata_only(spark):
    """The under-parallelism test must never convert the frame to an RDD
    (r15: the old df.rdd.getNumPartitions() cost ~100 ms of physical
    planning + Python-RDD setup per distinct plan at the head of every
    operator chain)."""
    from pyspark.sql import DataFrame

    few = spark.range(1000).coalesce(1)
    calls = []
    orig = DataFrame.rdd.fget

    def spy(self):
        calls.append(1)
        return orig(self)

    DataFrame.rdd = property(spy)
    try:
        out = ensure_parallelism(few)
    finally:
        DataFrame.rdd = property(orig)
    assert not calls, "ensure_parallelism touched df.rdd"
    assert out is not few  # tiny single-partition input still fans out


def test_ensure_parallelism_fans_out_large_explicit_coalesce(spark):
    """An explicit coalesce BELOW the target caps parallelism regardless of
    byte volume — the estimate must not let a big single-partition frame
    through un-fanned (the old physical check repartitioned it)."""
    big = spark.range(50_000_000).coalesce(2)  # ~400 MB of longs, 2 parts
    out = ensure_parallelism(big)
    assert out is not big


def test_ensure_parallelism_respects_aqe_coalesced_aggregates(spark):
    """A small-bytes aggregate output collapses to few partitions under
    AQE's byte-based coalescing — the CPU-bound case the fan-out exists
    to fix — so ensure_parallelism must still fire on it."""
    grouped = spark.range(10_000).groupBy((F.col("id") % 97).alias("k")).count()
    assert ensure_parallelism(grouped) is not grouped


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
