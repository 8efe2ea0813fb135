"""Small-file compaction: discovery finds only offending partitions, the
rewrite hits the ideal file count, data survives byte-identical, and
untouched partitions keep their files."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.sources.compaction import (
    compact_partitions,
    plan_compaction,
)


def _files(root: str, part: str) -> list[str]:
    return sorted(glob.glob(os.path.join(root, part, "*.parquet")))


def _build_warehouse(spark, root: str) -> None:
    # partition k=0: 12 tiny files; k=1: a single file
    many = (
        spark.range(0, 600)
        .withColumn("k", F.lit(0))
        .withColumn("v", F.col("id") * 2)
        .repartition(12)
    )
    one = (
        spark.range(1000, 1100)
        .withColumn("k", F.lit(1))
        .withColumn("v", F.col("id") * 2)
        .coalesce(1)
    )
    many.write.partitionBy("k").mode("overwrite").parquet(root)
    one.write.partitionBy("k").mode("append").parquet(root)


def test_plan_targets_only_small_file_partitions(spark, tmp_path):
    root = str(tmp_path / "wh")
    _build_warehouse(spark, root)
    assert len(_files(root, "k=0")) == 12
    assert len(_files(root, "k=1")) == 1

    targets = plan_compaction(spark, root, ["k"], target_rows_per_file=10_000)
    assert [t.values for t in targets] == [{"k": "0"}]
    assert targets[0].n_files == 12 and targets[0].n_rows == 600
    assert targets[0].ideal_files == 1


def test_compact_rewrites_and_preserves_rows(spark, tmp_path):
    root = str(tmp_path / "wh")
    _build_warehouse(spark, root)
    before = sorted(spark.read.parquet(root).collect())
    untouched_before = _files(root, "k=1")

    targets = plan_compaction(spark, root, ["k"], target_rows_per_file=10_000)
    assert compact_partitions(spark, root, targets) == 1

    assert len(_files(root, "k=0")) == 1
    assert _files(root, "k=1") == untouched_before  # other partition untouched
    assert not glob.glob(os.path.join(root, "*", "*.compacting"))
    after = sorted(spark.read.parquet(root).collect())
    assert after == before


def test_steady_state_is_noop(spark, tmp_path):
    root = str(tmp_path / "wh")
    _build_warehouse(spark, root)
    compact_targets = plan_compaction(spark, root, ["k"], target_rows_per_file=10_000)
    compact_partitions(spark, root, compact_targets)
    # second pass: nothing left to do
    assert plan_compaction(spark, root, ["k"], target_rows_per_file=10_000) == []


def test_streaming_sink_manifest_dropped_after_compaction(spark, tmp_path):
    """A streaming-sink warehouse reads through its _spark_metadata
    manifest; compaction rewrites the files it references, so compact()
    must drop it — otherwise every post-compaction read fails resolving
    deleted files. Rows must be preserved across the whole sequence."""
    from demo_otel_parquet_antalya_spark.sources.compaction import compact
    from demo_otel_parquet_antalya_spark.sources.generator import generate_files
    from demo_otel_parquet_antalya_spark.streaming.ingest import run_ingest_once

    landing, wh = str(tmp_path / "l"), str(tmp_path / "wh")
    generate_files(landing, n_files=6, records_per_file=80)
    run_ingest_once(spark, landing, wh, str(tmp_path / "c"))
    assert os.path.isdir(os.path.join(wh, "_spark_metadata"))
    before = spark.read.parquet(wh).count()
    from demo_otel_parquet_antalya_spark.schema import PARTITION_COLUMNS

    # a live streaming root is refused by default (dropping the
    # manifest under a still-writing sink would silently lose history)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="streaming sink"):
        compact(spark, wh, list(PARTITION_COLUMNS), target_rows_per_file=10_000,
                min_excess_files=1)
    # crash-safety ordering (ADVICE r8): the manifest is dropped BEFORE any
    # rewrite, so a crash at any later point leaves a warehouse that reads
    # by plain directory listing — never a manifest pinning deleted files
    import demo_otel_parquet_antalya_spark.sources.compaction as _c

    real_rewrite = _c.compact_partitions

    def _crash(*a, **k):
        raise RuntimeError("simulated crash mid-compaction")

    _c.compact_partitions = _crash
    try:
        with _pytest.raises(RuntimeError, match="simulated crash"):
            compact(spark, wh, list(PARTITION_COLUMNS),
                    target_rows_per_file=10_000, min_excess_files=1,
                    finalize_streaming=True)
    finally:
        _c.compact_partitions = real_rewrite
    assert not os.path.isdir(os.path.join(wh, "_spark_metadata"))
    assert spark.read.parquet(wh).count() == before  # reads still work
    # a re-run (no manifest left; finalize flag now moot) just completes
    rewritten = compact(
        spark, wh, list(PARTITION_COLUMNS), target_rows_per_file=10_000,
        min_excess_files=1, finalize_streaming=True,
    )
    assert rewritten > 0
    assert not os.path.isdir(os.path.join(wh, "_spark_metadata"))
    assert spark.read.parquet(wh).count() == before
