"""Streaming media ingest: landing dir -> classified partitioned parquet +
quarantine, exactly-once and incremental — the multimodal sibling of the
OTLP ingest tests."""

from __future__ import annotations

import os

import numpy as np
import pytest

from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.operators import multimodal as mm
from demo_otel_parquet_antalya_spark.streaming.media import (
    classify_media_files,
    run_media_ingest_once,
)


def _write_landing(d):
    os.makedirs(d, exist_ok=True)
    img = np.full((12, 20), 50, dtype=np.uint8)
    files = {
        "a.png": mm.encode_png(img),
        "b.jpg": mm.encode_jpeg_baseline(img),
        "c.gif": mm.encode_gif(img),
        "d.wav": mm.encode_wav_pcm16(np.zeros(1600, dtype="<i2"), 16000),
        "e.avi": mm.encode_avi_mjpeg(
            [mm.encode_jpeg_baseline(img)] * 3, fps=10, width=20, height=12
        ),
        "f.bin": b"utterly not a media file",
    }
    for name, payload in files.items():
        with open(os.path.join(d, name), "wb") as f:
            f.write(payload)
    return files


def test_ingest_classifies_partitions_and_quarantines(spark, tmp_path):
    landing = str(tmp_path / "landing")
    wh = str(tmp_path / "warehouse")
    ckpt = str(tmp_path / "ckpt")
    _write_landing(landing)
    run_media_ingest_once(spark, landing, wh, ckpt)

    out = spark.read.parquet(wh)
    got = {os.path.basename(r.path): r for r in out.collect()}
    assert {n: r.media_type for n, r in got.items()} == {
        "a.png": "image", "b.jpg": "image", "c.gif": "image",
        "d.wav": "audio", "e.avi": "video",
    }
    # header-derived properties are exact
    assert (got["a.png"].width, got["a.png"].height) == (20, 12)
    assert (got["b.jpg"].width, got["b.jpg"].height) == (20, 12)
    assert (got["c.gif"].width, got["c.gif"].height) == (20, 12)
    assert (got["d.wav"].sample_rate, got["d.wav"].channels) == (16000, 1)
    assert got["d.wav"].duration_ms == 100
    assert got["e.avi"].duration_ms == 300
    # media_type is a physical partition directory (pruned scans downstream)
    assert sorted(
        d for d in os.listdir(wh) if d.startswith("media_type=")
    ) == ["media_type=audio", "media_type=image", "media_type=video"]
    # the junk file is quarantined with its bytes intact, not dropped
    q = spark.read.parquet(os.path.join(wh, "_quarantine")).collect()
    assert len(q) == 1 and os.path.basename(q[0].path) == "f.bin"
    assert bytes(q[0].payload) == b"utterly not a media file"


def test_ingest_is_incremental_and_idempotent(spark, tmp_path):
    landing = str(tmp_path / "landing")
    wh = str(tmp_path / "warehouse")
    ckpt = str(tmp_path / "ckpt")
    _write_landing(landing)
    run_media_ingest_once(spark, landing, wh, ckpt)
    n1 = spark.read.parquet(wh).count()

    # re-run with no new files: the checkpoint means nothing re-ingests
    run_media_ingest_once(spark, landing, wh, ckpt)
    assert spark.read.parquet(wh).count() == n1

    # drop one new file: exactly one new row lands
    with open(os.path.join(landing, "late.png"), "wb") as f:
        f.write(mm.encode_png(np.zeros((4, 4), dtype=np.uint8)))
    run_media_ingest_once(spark, landing, wh, ckpt)
    out = spark.read.parquet(wh)
    assert out.count() == n1 + 1
    assert out.filter(F.col("path").endswith("late.png")).count() == 1


def test_replayed_batch_overwrites_instead_of_double_appending(spark, tmp_path):
    """Exactly-once effect under replay: if a micro-batch re-runs (failure
    after the sink writes but before the checkpoint commit), the dynamic
    overwrite of its ingest_batch_id partitions must REPLACE the earlier
    output, not append a second copy. Simulated by wiping the checkpoint so
    the whole landing dir replays as batch 0 again."""
    import shutil

    landing = str(tmp_path / "landing")
    wh = str(tmp_path / "warehouse")
    ckpt = str(tmp_path / "ckpt")
    _write_landing(landing)
    run_media_ingest_once(spark, landing, wh, ckpt)
    n1 = spark.read.parquet(wh).count()
    q1 = spark.read.parquet(os.path.join(wh, "_quarantine")).count()

    shutil.rmtree(ckpt)  # forces a full replay with the same batch ids
    run_media_ingest_once(spark, landing, wh, ckpt)
    assert spark.read.parquet(wh).count() == n1
    assert spark.read.parquet(os.path.join(wh, "_quarantine")).count() == q1


def test_stream_classification_equals_batch(spark, tmp_path):
    """The stream's per-batch classification must equal the batch twin over
    the same files — the repo's standard stream==batch equivalence."""
    landing = str(tmp_path / "landing")
    wh = str(tmp_path / "warehouse")
    _write_landing(landing)
    run_media_ingest_once(spark, landing, wh, str(tmp_path / "ckpt"))

    batch = classify_media_files(
        spark.read.format("binaryFile")
        .load(landing)
        .select("path", "length", F.col("content").alias("payload"))
    ).filter(F.col("media_type") != "unknown")
    cols = ["path", "media_type", "mime", "width", "height",
            "sample_rate", "channels", "duration_ms", "n_bytes"]
    want = {tuple(r) for r in batch.select(*cols).collect()}
    got = {tuple(r) for r in spark.read.parquet(wh).select(*cols).collect()}
    assert got == want
