"""Streaming template catalog: stream result equals batch mining over all
input; replay does not double-count; new templates are visible as
first_seen rows."""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.functions.text import log_template
from demo_otel_parquet_antalya_spark.streaming.templates import (
    incremental_template_catalog,
    read_template_catalog,
)

SCHEMA = "ts timestamp, message string"


def _write(path, fname, rows):
    import os

    os.makedirs(path, exist_ok=True)
    base = pd.Timestamp("2024-01-01 00:00:00")
    with open(f"{path}/{fname}", "w") as f:
        for off, msg in rows:
            f.write(
                json.dumps({"ts": str(base + pd.Timedelta(seconds=off)), "message": msg})
                + "\n"
            )


def _run(spark, src, tmp_path):
    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(src)
    q = incremental_template_catalog(
        stream, str(tmp_path / "catalog"), str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    return read_template_catalog(spark, str(tmp_path / "catalog"))


def test_stream_catalog_equals_batch_mining(spark, tmp_path):
    b1 = [(0, "GET /user/1 took 12ms"), (5, "GET /user/2 took 9ms"), (9, "oom at 0xFF")]
    b2 = [(60, "GET /user/3 took 30ms"), (65, "conn from 10.0.0.1 lost")]
    src = str(tmp_path / "logs")
    _write(src, "b1.json", b1)
    _write(src, "b2.json", b2)

    got = {
        (r.template, r.n_events, str(r.first_seen), str(r.last_seen))
        for r in _run(spark, src, tmp_path).collect()
    }
    want = {
        (r.template, r.n_events, str(r.first_seen), str(r.last_seen))
        for r in spark.read.schema(SCHEMA)
        .json(src)
        .groupBy(log_template("message").alias("template"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("first_seen"),
            F.max("ts").alias("last_seen"),
        )
        .collect()
    }
    assert got == want
    # the three distinct shapes collapsed to three templates
    assert {t for t, *_ in got} == {
        "GET /user/<NUM> took <NUM>ms",
        "oom at <HEX>",
        "conn from <IP> lost",
    }


def test_replayed_batch_does_not_double_count(spark, tmp_path):
    from demo_otel_parquet_antalya_spark.streaming.templates import _mine

    rows = [(0, "GET /user/1 took 12ms"), (5, "GET /user/9 took 1ms")]
    src = str(tmp_path / "logs")
    _write(src, "b1.json", rows)
    cat = _run(spark, src, tmp_path)
    assert [(r.template, r.n_events) for r in cat.collect()] == [
        ("GET /user/<NUM> took <NUM>ms", 2)
    ]
    # simulate the crash-replay of batch 0: apply it again by hand through
    # the same versioned-merge rule (merge base = snapshots with id < 0 ->
    # none), then confirm the re-written snapshot is identical
    batch = spark.read.schema(SCHEMA).json(src)
    inc = _mine(batch, "message", "ts")
    inc.select(
        "template",
        F.col("n_events").cast("long"),
        "first_seen",
        "last_seen",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "catalog" / "v=0")
    )
    again = read_template_catalog(spark, str(tmp_path / "catalog"))
    assert [(r.template, r.n_events) for r in again.collect()] == [
        ("GET /user/<NUM> took <NUM>ms", 2)
    ]
