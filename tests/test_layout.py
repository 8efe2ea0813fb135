"""Z-order layout: files must own small hyper-rectangles of the clustered
space, so a selective range predicate on EITHER clustered column overlaps few
files' parquet min/max stats — the file-skipping property itself, measured
from the written parquet footers (engine-agnostic), not from a Spark plan.
"""

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.sources import layout


def _xy(spark):
    # two independent uniform dims — the case hive partitioning can't serve
    return spark.range(20_000).select(
        F.col("id"),
        F.floor(F.rand(seed=1) * 1000).alias("x"),
        F.floor(F.rand(seed=2) * 1000).alias("y"),
    )


def _overlapping_files(path, col, lo, hi):
    """Count files whose footer min/max for col overlaps [lo, hi] — exactly
    the files any stats-based reader must open for that predicate."""
    total, overlap = 0, 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        if md.num_rows == 0:
            continue
        idx = md.schema.names.index(col)
        stats = [
            md.row_group(i).column(idx).statistics
            for i in range(md.num_row_groups)
            if md.row_group(i).num_rows > 0
        ]
        fmin = min(s.min for s in stats)
        fmax = max(s.max for s in stats)
        total += 1
        if fmax >= lo and fmin <= hi:
            overlap += 1
    return total, overlap


def test_zorder_skips_on_both_dims(spark, tmp_path):
    zdir = str(tmp_path / "z")
    xy = _xy(spark)
    layout.write_zordered(xy, zdir, ["x", "y"], n_files=16)

    # content is layout-invariant
    back = spark.read.parquet(zdir)
    assert back.count() == xy.count()
    assert (
        back.agg(F.sum("x"), F.sum("y")).collect()
        == xy.agg(F.sum("x"), F.sum("y")).collect()
    )

    # a 1/16-wide slice on EITHER dim overlaps only the files owning that
    # stripe of the z-grid (4x4 blocks at 16 files -> ~4), never most of
    # them. Ratio-based so a session-conf leak that shifts the exact file
    # count (shared-session suite) can't flake the skipping contract.
    for col in ("x", "y"):
        total, overlap = _overlapping_files(zdir, col, 0, 62)
        assert total >= 8, f"expected ~16 z-clustered files, got {total}"
        assert overlap <= max(6, total * 0.45), f"{col}: {overlap}/{total} files overlap"


def test_single_sort_fails_second_dim(spark, tmp_path):
    """The negative control: sorting by x alone leaves y unclustered, so the
    same y-slice overlaps (nearly) every file — the gap z-ordering closes."""
    xdir = str(tmp_path / "xsorted")
    xy = _xy(spark)
    (
        xy.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xdir)
    )
    _, x_overlap = _overlapping_files(xdir, "x", 0, 62)
    total, y_overlap = _overlapping_files(xdir, "y", 0, 62)
    assert x_overlap <= 3  # x-sort serves x, as expected
    assert y_overlap >= total - 2  # ...and abandons y


def test_zorder_guards(spark):
    xy = _xy(spark)
    with pytest.raises(ValueError, match=">= 2 columns"):
        layout.zorder_column(xy, ["x"])
    with pytest.raises(ValueError, match="overflows"):
        layout.zorder_column(xy, ["x", "y", "id"], bits=21)


def test_backfill_overwrites_only_touched_partitions(spark, tmp_path):
    """Dynamic-partition backfill: the reprocessed hour's rows are replaced,
    every other partition's files are physically untouched (same paths +
    mtimes), and re-running the same backfill converges."""
    import os

    from demo_otel_parquet_antalya_spark.sources.generator import generate_files
    from demo_otel_parquet_antalya_spark.sources.otlp import ingest_otlp_json
    from demo_otel_parquet_antalya_spark.sources.parquet_sink import (
        backfill_logs,
        read_logs,
        write_logs,
    )
    from pyspark.sql import functions as F

    d = tmp_path / "otlp"
    generate_files(str(d), n_files=4, records_per_file=50)
    logs = ingest_otlp_json(spark, str(d))
    root = str(tmp_path / "wh")
    write_logs(logs, root)

    def file_state(skip_hour):
        out = {}
        for dirpath, _, files in os.walk(root):
            if f"hour={skip_hour}" in dirpath:
                continue
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(dirpath, f)
                    out[p] = os.path.getmtime(p)
        return out

    hours = [r.h for r in logs.select(F.hour("timestamp").alias("h")).distinct().collect()]
    target = hours[0]
    before_others = file_state(target)

    # "reprocess" the target hour: same rows, amended body
    fixed = logs.filter(F.hour("timestamp") == target).withColumn(
        "body", F.concat(F.col("body"), F.lit(" [backfilled]"))
    )
    backfill_logs(fixed, root)

    assert file_state(target) == before_others  # untouched partitions intact
    got = read_logs(spark, root)
    assert got.count() == logs.count()
    in_hour = got.filter(F.col("hour") == target)
    assert in_hour.filter(~F.col("body").endswith("[backfilled]")).count() == 0
    assert in_hour.count() == fixed.count()

    backfill_logs(fixed, root)  # idempotent re-run
    assert read_logs(spark, root).count() == logs.count()
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static") == "static"
