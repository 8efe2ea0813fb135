"""Streaming record-level dedup: retried (duplicate) OTLP posts must land
exactly once in the warehouse; distinct records all survive."""

from __future__ import annotations

import json

from demo_otel_parquet_antalya_spark.sources.otlp import flatten_otlp
from demo_otel_parquet_antalya_spark.sources.parquet_sink import with_partition_columns
from demo_otel_parquet_antalya_spark.schema import PARTITION_COLUMNS
from demo_otel_parquet_antalya_spark.streaming.dedup import dedup_stream
from demo_otel_parquet_antalya_spark.streaming.ingest import read_otlp_stream
from demo_otel_parquet_antalya_spark.streaming.receiver import write_landing_file
from tests.test_streaming import _payload


def test_retried_records_land_once(spark, tmp_path):
    landing = str(tmp_path / "landing")
    # 6 distinct records; records 0-2 delivered twice (collector retry);
    # the duplicate payload is a byte-identical re-POST in a separate file
    for i in range(6):
        write_landing_file(landing, _payload(i))
    for i in range(3):
        write_landing_file(landing, _payload(i))

    flat = flatten_otlp(read_otlp_stream(spark, landing))
    deduped = dedup_stream(flat, watermark_delay="1 hour")
    q = (
        with_partition_columns(deduped)
        .writeStream.format("parquet")
        .partitionBy(*PARTITION_COLUMNS)
        .option("path", str(tmp_path / "wh"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = spark.read.option("basePath", str(tmp_path / "wh")).parquet(str(tmp_path / "wh"))
    rows = out.collect()
    assert len(rows) == 6  # 9 deliveries -> 6 records
    assert sorted({r.body for r in rows}) == sorted({f"msg {i}" for i in range(6)})


def test_without_dedup_duplicates_land_twice(spark, tmp_path):
    """Control: the plain pipeline keeps duplicates — the contract really is
    upgraded by dedup_stream, not by the sink."""
    landing = str(tmp_path / "landing")
    for i in range(3):
        write_landing_file(landing, _payload(i))
    write_landing_file(landing, _payload(0))

    flat = flatten_otlp(read_otlp_stream(spark, landing))
    q = (
        with_partition_columns(flat)
        .writeStream.format("parquet")
        .partitionBy(*PARTITION_COLUMNS)
        .option("path", str(tmp_path / "wh"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.option("basePath", str(tmp_path / "wh")).parquet(str(tmp_path / "wh"))
    assert out.count() == 4
