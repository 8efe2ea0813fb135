"""observe() ingest metrics: batch Observation values must equal a direct
aggregation, and the streaming listener must see per-batch metrics."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.sources.generator import generate_files
from demo_otel_parquet_antalya_spark.sources.otlp import flatten_otlp, read_otlp_json
from demo_otel_parquet_antalya_spark.streaming.ingest import read_otlp_stream
from demo_otel_parquet_antalya_spark.streaming.metrics import (
    collect_stream_metrics,
    observe_ingest,
    observe_ingest_stream,
)


def test_batch_observation_matches_direct_agg(spark, tmp_path):
    landing = str(tmp_path / "landing")
    generate_files(landing, n_files=3, records_per_file=200)
    flat = flatten_otlp(read_otlp_json(spark, landing))

    observed, obs = observe_ingest(flat)
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get

    want = flat.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("timestamp").isNull(), 1).otherwise(0)).alias("null_ts"),
        F.sum(F.when(F.col("severity_text") == "ERROR", 1).otherwise(0)).alias("n_errors"),
        F.max("timestamp").alias("max_event_time"),
    ).collect()[0]
    assert got["n_rows"] == want.n_rows == 600
    assert got["null_ts"] == want.null_ts
    assert got["n_errors"] == want.n_errors
    assert got["max_event_time"] == want.max_event_time


def test_stream_listener_sees_per_batch_metrics(spark, tmp_path):
    landing = str(tmp_path / "landing")
    generate_files(landing, n_files=2, records_per_file=100)

    stream = flatten_otlp(read_otlp_stream(spark, landing))
    listener = collect_stream_metrics(spark)
    try:
        q = (
            observe_ingest_stream(stream)
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # listener delivery is async; give it a moment
        deadline = time.time() + 20
        while time.time() < deadline and not listener.rows:
            time.sleep(0.25)
    finally:
        spark.streams.removeListener(listener)
    assert listener.rows, "no observed metrics arrived"
    assert sum(r["n_rows"] for r in listener.rows) == 200
