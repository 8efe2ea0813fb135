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
