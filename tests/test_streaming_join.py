"""Stream-stream interval join: streaming output must equal the same join
run in batch over the same inputs (watermarks only bound state, never drop
on-time rows)."""

from __future__ import annotations

import json

import pandas as pd

from demo_otel_parquet_antalya_spark.streaming.stream_join import interval_join_streams

SCHEMA = "user_id bigint, ts timestamp, action string"


def _write(path, fname, rows):
    import os

    os.makedirs(path, exist_ok=True)
    base = pd.Timestamp("2024-01-01 00:00:00")
    with open(f"{path}/{fname}", "w") as f:
        for uid, off, action in rows:
            f.write(
                json.dumps({"user_id": uid, "ts": str(base + pd.Timedelta(seconds=off)), "action": action}) + "\n"
            )


def test_stream_join_matches_batch(spark, tmp_path):
    views = [(1, 0, "v1"), (1, 100, "v2"), (2, 0, "v3"), (3, 0, "v4")]
    clicks = [
        (1, 50, "c1"),   # joins v1 (50s after)
        (1, 120, "c2"),  # joins v2 (20s) and v1 (120s)
        (2, 400, "c3"),  # outside 300s window of v3 -> no match
        (4, 10, "c4"),   # keyless -> no match
    ]
    vsrc, csrc = str(tmp_path / "views"), str(tmp_path / "clicks")
    _write(vsrc, "v.json", views)
    _write(csrc, "c.json", clicks)

    vstream = spark.readStream.schema(SCHEMA).json(vsrc)
    cstream = spark.readStream.schema(SCHEMA).json(csrc)
    q = (
        interval_join_streams(cstream, vstream, max_delay_seconds=300)
        .writeStream.format("memory")
        .queryName("sj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.k, str(r.l_ts), str(r.r_ts), r.l_action, r.r_action)
        for r in spark.table("sj").collect()
    }

    vbatch = spark.read.schema(SCHEMA).json(vsrc)
    cbatch = spark.read.schema(SCHEMA).json(csrc)
    want = {
        (r.k, str(r.l_ts), str(r.r_ts), r.l_action, r.r_action)
        for r in interval_join_streams(cbatch, vbatch, max_delay_seconds=300).collect()
    }
    assert got == want
    assert len(want) == 3  # c1->v1, c2->v2, c2->v1


def test_stream_outer_join_emits_unmatched_after_watermark(spark, tmp_path):
    """Left-outer: unmatched clicks emit with NULL view columns once the
    watermark passes their join window. A second batch carries far-future
    events that push the watermark beyond every batch-1 window."""
    views = [(1, 0, "v1")]
    clicks_b1 = [(1, 50, "c1"), (2, 60, "c2")]        # c1 matches, c2 never can
    pushers_b2 = [(9, 100000, "c9"), (8, 100000, "v8")]  # advance both watermarks
    vsrc, csrc = str(tmp_path / "views"), str(tmp_path / "clicks")
    _write(vsrc, "v1.json", views)
    _write(csrc, "c1.json", clicks_b1)
    _write(vsrc, "v2.json", [pushers_b2[1]])
    _write(csrc, "c2.json", [pushers_b2[0]])

    from demo_otel_parquet_antalya_spark.streaming.stream_join import (
        interval_join_streams_outer,
    )

    vstream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(vsrc)
    cstream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(csrc)
    q = (
        interval_join_streams_outer(cstream, vstream, max_delay_seconds=300)
        .writeStream.format("memory")
        .queryName("sjo")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("sjo").collect()
    matched = {(r.k, r.l_action, r.r_action) for r in rows if r.r_action is not None}
    unmatched = {(r.k, r.l_action) for r in rows if r.r_action is None}
    assert (1, "c1", "v1") in matched
    assert (2, "c2") in unmatched  # surfaced with NULLs, not dropped


def test_stream_static_enrichment_matches_batch(spark, tmp_path):
    """Stream-static dimension enrichment: streaming output equals the same
    broadcast join in batch; unmatched keys survive a left join with NULL
    dimension columns (lookup misses stay observable, not dropped)."""
    from demo_otel_parquet_antalya_spark.streaming.stream_join import enrich_with_dimension

    events = [(1, 0, "view"), (2, 5, "click"), (9, 7, "view")]  # 9 has no dim row
    src = str(tmp_path / "events")
    _write(src, "e.json", events)
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "bronze"), (3, "silver")], "user_id bigint, tier string"
    )

    stream = spark.readStream.schema(SCHEMA).json(src)
    q = (
        enrich_with_dimension(stream, dim, "user_id")
        .writeStream.format("memory")
        .queryName("enrich")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.user_id, r.action, r.tier) for r in spark.table("enrich").collect()}

    batch = spark.read.schema(SCHEMA).json(src)
    want = {
        (r.user_id, r.action, r.tier)
        for r in enrich_with_dimension(batch, dim, "user_id").collect()
    }
    assert got == want
    assert (9, "view", None) in got
