"""Continuous PSI drift monitor: the streamed current-window counts must
yield exactly the PSI the batch computation gives over the same rows,
regardless of micro-batch split, and a drifted stream must score higher
than an undrifted one."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.streaming.drift import (
    incremental_category_counts,
    read_psi,
    reference_distribution,
)

SCHEMA = "event_id bigint, action string"


def _write(path, fname, rows):
    import os

    os.makedirs(path, exist_ok=True)
    with open(f"{path}/{fname}", "w") as f:
        for eid, action in rows:
            f.write(json.dumps({"event_id": eid, "action": action}) + "\n")


def _psi_total(df):
    return sum(r.psi_term for r in df.collect())


def test_streamed_psi_matches_batch_and_detects_drift(spark, tmp_path):
    ref_rows = [(i, ("view", "click", "buy")[i % 3]) for i in range(300)]
    drifted = [(i, ("view", "view", "buy")[i % 3]) for i in range(300, 600)]
    refsrc, cursrc = str(tmp_path / "ref"), str(tmp_path / "cur")
    _write(refsrc, "r.json", ref_rows)
    # three files -> three micro-batches
    _write(cursrc, "a.json", drifted[:100])
    _write(cursrc, "b.json", drifted[100:200])
    _write(cursrc, "c.json", drifted[200:])

    reference = reference_distribution(
        spark.read.schema(SCHEMA).json(refsrc), "action"
    )

    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(cursrc)
    target, ckpt = str(tmp_path / "counts"), str(tmp_path / "ckpt")
    incremental_category_counts(stream, target, ckpt, "action").awaitTermination()

    got = read_psi(spark, target, reference)
    # batch twin over the same current rows
    cur_batch = spark.read.schema(SCHEMA).json(cursrc)
    q = cur_batch.groupBy(F.col("action").alias("category")).agg(
        (F.count("*") / F.lit(len(drifted))).alias("q")
    )
    want = (
        reference.join(q, "category")
        .select(
            "category",
            F.round("p", 6).alias("p_ref"),
            F.round("q", 6).alias("q_cur"),
            F.round((F.col("q") - F.col("p")) * F.log(F.col("q") / F.col("p")), 6).alias("psi_term"),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert _psi_total(got) > 0.1  # the drifted mix trips the gate

    # an undrifted stream scores ~0
    same_src = str(tmp_path / "same")
    _write(same_src, "s.json", [(i, ("view", "click", "buy")[i % 3]) for i in range(600, 900)])
    s2 = spark.readStream.schema(SCHEMA).json(same_src)
    t2, c2 = str(tmp_path / "counts2"), str(tmp_path / "ckpt2")
    incremental_category_counts(s2, t2, c2, "action").awaitTermination()
    assert _psi_total(read_psi(spark, t2, reference)) < 1e-9
