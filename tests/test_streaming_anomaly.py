"""Streaming EWMA anomaly detector: flags a rate spike after warmup, carries
moments across micro-batches, and matches the plain-Python EWMA oracle
bucket-for-bucket."""

from __future__ import annotations

import json
import math
import os

import pandas as pd

from demo_otel_parquet_antalya_spark.streaming.anomaly import (
    ewma_anomaly_stream,
    ewma_reference_batch,
)

SCHEMA = "event_type string, ts timestamp"
BASE = pd.Timestamp("2024-01-01 00:00:00")


def _write(path, fname, rates):
    """rates: list of (minute_index, n_events) -> one json file."""
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/{fname}", "w") as f:
        for minute, n in rates:
            for i in range(n):
                ts = BASE + pd.Timedelta(minutes=minute, seconds=i % 60)
                f.write(json.dumps({"event_type": "svc", "ts": str(ts)}) + "\n")


def test_spike_flagged_and_state_carries_across_batches(spark, tmp_path):
    # steady ~10/min for 5 minutes (batch 1), then a 50/min spike (batch 2):
    # the spike must be scored against batch-1 moments -> state carry-over.
    batch1 = [(0, 10), (1, 11), (2, 9), (3, 10), (4, 10)]
    batch2 = [(5, 50), (6, 10)]
    src = str(tmp_path / "ev")
    _write(src, "b1.json", batch1)
    _write(src, "b2.json", batch2)

    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(src)
    q = (
        ewma_anomaly_stream(stream, alpha=0.3, threshold=3.0, warmup=3, watermark_delay="0 seconds")
        .writeStream.format("memory")
        .queryName("anom")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = (
        spark.sql("SELECT * FROM anom")
        .toPandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    series = [(str(m), n) for m, n in batch1 + batch2]
    want = ewma_reference_batch(series, alpha=0.3, threshold=3.0, warmup=3)

    assert len(got) == len(want)
    for row, (n, mean_after, z, flag) in zip(got.itertuples(index=False), want):
        assert row.n == n
        assert math.isclose(row.ewma_mean, mean_after, rel_tol=1e-9)
        assert math.isclose(row.zscore, z, rel_tol=1e-9, abs_tol=1e-12)
        assert bool(row.is_anomaly) == flag

    # exactly the spike bucket is flagged
    flagged = got[got.is_anomaly]
    assert list(flagged.n) == [50]


def test_warmup_suppresses_early_buckets(spark, tmp_path):
    # a wild series entirely inside warmup -> nothing flagged
    src = str(tmp_path / "ev")
    _write(src, "b1.json", [(0, 5), (1, 100), (2, 1)])
    stream = spark.readStream.schema(SCHEMA).json(src)
    q = (
        ewma_anomaly_stream(stream, alpha=0.3, threshold=3.0, warmup=3, watermark_delay="0 seconds")
        .writeStream.format("memory")
        .queryName("anom_warm")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM anom_warm").toPandas()
    assert len(got) == 3
    assert not got.is_anomaly.any()
