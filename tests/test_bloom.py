"""Bloom pre-join pruning: zero false negatives, bounded false positives,
and join-result equivalence with and without the prefilter."""

from __future__ import annotations

from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.operators import bloom

SF = "/root/testdata/sf0.001"


def test_no_false_negatives_and_bounded_fp(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    # key set: a 10% slice of customers that actually have orders
    keys = orders.select(F.col("o_custkey").alias("k")).distinct().filter(F.col("k") % 10 == 0)

    filtered = bloom.bloom_prefilter(orders, keys, "o_custkey", "k")
    true_match = orders.join(F.broadcast(keys), orders.o_custkey == keys.k, "left_semi")

    n_true = true_match.count()
    n_kept = filtered.count()
    n_total = orders.count()
    # every joinable row survives
    assert filtered.join(F.broadcast(keys), filtered.o_custkey == keys.k, "left_semi").count() == n_true
    assert n_kept >= n_true
    # and the filter actually prunes: false-positive share of the non-matching
    # rows stays small for a 64Kbit/5-hash filter over ~100 keys
    fp_rate = (n_kept - n_true) / max(n_total - n_true, 1)
    assert fp_rate < 0.05, f"fp rate {fp_rate:.3f}"


def test_join_after_prefilter_is_equivalent(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet").filter(F.col("c_custkey") % 7 == 0)

    direct = orders.join(customer, orders.o_custkey == customer.c_custkey).select("o_orderkey")
    pre = bloom.bloom_prefilter(orders, customer, "o_custkey", "c_custkey")
    via_bloom = pre.join(customer, pre.o_custkey == customer.c_custkey).select("o_orderkey")
    assert {r.o_orderkey for r in direct.collect()} == {r.o_orderkey for r in via_bloom.collect()}
