"""Continuously-maintained deterministic sample: the streamed sample must
equal the batch top-k-by-hash over the same input, regardless of how the
input was split into micro-batches, and a replayed batch must leave the
sample unchanged."""

from __future__ import annotations

import json

from demo_otel_parquet_antalya_spark.streaming.reservoir import (
    batch_sample,
    incremental_sample,
    read_sample,
)

SCHEMA = "event_id bigint, action string"


def _write(path, fname, rows):
    import os

    os.makedirs(path, exist_ok=True)
    with open(f"{path}/{fname}", "w") as f:
        for eid, action in rows:
            f.write(json.dumps({"event_id": eid, "action": action}) + "\n")


def _rows(df):
    return sorted((r.event_id, r.action) for r in df.collect())


def test_streamed_sample_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    # three files -> maxFilesPerTrigger=1 forces three micro-batches
    _write(src, "a.json", [(i, f"a{i}") for i in range(0, 40)])
    _write(src, "b.json", [(i, f"b{i}") for i in range(40, 80)])
    _write(src, "c.json", [(i, f"c{i}") for i in range(80, 120)])

    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(src)
    target, ckpt = str(tmp_path / "sample"), str(tmp_path / "ckpt")
    q = incremental_sample(stream, target, ckpt, k=10, payload_cols=["action"])
    q.awaitTermination()

    got = read_sample(spark, target, "event_id", ["action"])
    want = batch_sample(spark.read.schema(SCHEMA).json(src), 10, "event_id", ["action"])
    assert _rows(got) == _rows(want)
    assert got.count() == 10


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """Re-applying a batch id that already committed must reproduce the same
    snapshot (merge-from-prior + overwrite-own-version discipline)."""
    from demo_otel_parquet_antalya_spark.streaming import reservoir

    src = str(tmp_path / "src")
    _write(src, "a.json", [(i, f"a{i}") for i in range(0, 50)])
    stream = spark.readStream.schema(SCHEMA).json(src)
    target, ckpt = str(tmp_path / "sample"), str(tmp_path / "ckpt")
    incremental_sample(stream, target, ckpt, k=10, payload_cols=["action"]).awaitTermination()
    before = _rows(read_sample(spark, target, "event_id", ["action"]))

    # replay batch 0 by hand: same input frame, same batch id
    batch_df = spark.read.schema(SCHEMA).json(src)
    cand = reservoir.batch_sample(batch_df, 10, "event_id", ["action"])
    prior_vs = [v for v in reservoir._versions(spark, target) if v < 0]
    assert prior_vs == []  # batch 0 merges from nothing, both times
    cand.coalesce(1).write.mode("overwrite").parquet(f"{target}/v=0")
    after = _rows(read_sample(spark, target, "event_id", ["action"]))
    assert after == before


def test_streamed_weighted_sample_equals_batch(spark, tmp_path):
    """Weighted (Efraimidis-Spirakis) mode: the streamed top-k-by-ES-key
    sample must equal the batch twin over the union, for any micro-batch
    split, and must favor heavy rows."""
    from demo_otel_parquet_antalya_spark.streaming.reservoir import (
        batch_sample,
        incremental_sample,
        read_sample,
    )

    schema_w = "event_id bigint, action string, w double"
    src = str(tmp_path / "src")
    # heavy rows (w=1000) in one file, light (w=0.01) in another
    import json, os
    os.makedirs(src, exist_ok=True)
    with open(f"{src}/a.json", "w") as f:
        for i in range(0, 30):
            f.write(json.dumps({"event_id": i, "action": f"h{i}", "w": 1000.0}) + "\n")
    with open(f"{src}/b.json", "w") as f:
        for i in range(30, 200):
            f.write(json.dumps({"event_id": i, "action": f"l{i}", "w": 0.01}) + "\n")

    stream = spark.readStream.schema(schema_w).option("maxFilesPerTrigger", 1).json(src)
    target, ckpt = str(tmp_path / "wsample"), str(tmp_path / "ckpt")
    q = incremental_sample(
        stream, target, ckpt, k=20, payload_cols=["action"], weight_col="w"
    )
    q.awaitTermination()

    got = read_sample(spark, target, "event_id", ["action"], weighted=True)
    want = batch_sample(
        spark.read.schema(schema_w).json(src), 20, "event_id", ["action"], weight_col="w"
    )
    assert sorted((r.event_id, r.action) for r in got.collect()) == sorted(
        (r.event_id, r.action) for r in want.collect()
    )
    # the 30 heavy rows (weights 100000x the light ones) dominate the sample
    heavy = sum(1 for r in got.collect() if r.action.startswith("h"))
    assert heavy >= 18


def test_weighted_sample_excludes_nonpositive_weights(spark):
    """w = 0 divides the ES key to -Inf (never sampled) and w < 0 flips it
    positive (always wins) — both outside the Efraimidis-Spirakis
    precondition, so such rows must be excluded, not silently mis-ranked
    (ADVICE r4 #4)."""
    rows = [(1, "a", -5.0), (2, "b", 0.0), (3, "c", 1.0), (4, "d", 2.0)]
    df = spark.createDataFrame(rows, "event_id long, action string, w double")
    got = sorted(
        r.event_id
        for r in batch_sample(df, 10, "event_id", ["action"], weight_col="w").collect()
    )
    assert got == [3, 4]
