"""Streaming heavy-hitters tracker: with a sketch wide enough for the test
cardinality (no collisions), the final per-group top-k must equal the exact
batch top-k, with state carried across micro-batches."""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.streaming.heavy_hitters import heavy_hitters_stream

SCHEMA = "event_type string, user_id bigint, ts timestamp"


def _write_events(path, fname, rows):
    import os

    os.makedirs(path, exist_ok=True)
    base = pd.Timestamp("2024-01-01 00:00:00")
    with open(f"{path}/{fname}", "w") as f:
        for etype, uid, off in rows:
            f.write(
                json.dumps(
                    {"event_type": etype, "user_id": uid, "ts": str(base + pd.Timedelta(seconds=off))}
                )
                + "\n"
            )


def test_topk_matches_exact_counts_across_batches(spark, tmp_path):
    # distinct per-item frequencies so the top-3 is unique; two files force
    # two micro-batches -> the second batch must read sketch state from the
    # first (user 1's count finishes split 4+3 across the files)
    batch1 = (
        [("click", 1, i) for i in range(4)]
        + [("click", 2, i) for i in range(5)]
        + [("click", 3, 10)]
        + [("view", 7, i) for i in range(3)]
        + [("view", 8, 20)]
    )
    batch2 = (
        [("click", 1, 30 + i) for i in range(3)]  # 1 -> 7 total, overtakes 2
        + [("click", 4, 40), ("click", 4, 41)]
        + [("view", 9, 50)]
    )
    src = str(tmp_path / "events")
    _write_events(src, "b1.json", batch1)
    _write_events(src, "b2.json", batch2)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        heavy_hitters_stream(stream, k=3, width=64, watermark_delay="0 seconds")
        .writeStream.format("memory")
        .queryName("hh")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = spark.table("hh")
    # "current" rows = the emission with the group's highest total_seen
    w = W.partitionBy("grp")
    final = out.withColumn("mx", F.max("total_seen").over(w)).filter(
        F.col("total_seen") == F.col("mx")
    )
    got = {(r.grp, r.item, r.est_count, r.rank) for r in final.collect()}

    # exact oracle over the union of both files
    batch = spark.read.schema(SCHEMA).json(src)
    counts = batch.groupBy("event_type", "user_id").agg(F.count("*").alias("n"))
    w2 = W.partitionBy("event_type").orderBy(F.col("n").desc(), "user_id")
    want = {
        (r.event_type, r.user_id, r.n, r.rk)
        for r in counts.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= 3)
        .collect()
    }
    assert got == want


def test_sketch_estimates_upper_bound_exact(spark, tmp_path):
    """With a deliberately TINY sketch (collisions certain), estimates must
    still be >= true counts (count-min error is one-sided)."""
    rows = [("click", uid, uid) for uid in range(50) for _ in range(uid % 5 + 1)]
    src = str(tmp_path / "events")
    _write_events(src, "b1.json", rows)

    stream = spark.readStream.schema(SCHEMA).json(src)
    q = (
        heavy_hitters_stream(stream, k=10, width=8, depth=2, watermark_delay="0 seconds")
        .writeStream.format("memory")
        .queryName("hh_tiny")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    batch = spark.read.schema(SCHEMA).json(src)
    true = {
        (r.event_type, r.user_id): r.n
        for r in batch.groupBy("event_type", "user_id").agg(F.count("*").alias("n")).collect()
    }
    emitted = spark.table("hh_tiny").collect()
    assert emitted, "tracker emitted nothing"
    for r in emitted:
        assert r.est_count >= true[(r.grp, r.item)]
