"""Raw-warehouse retention (sources/retention.py): whole hour partitions
strictly older than the cutoff's hour are expired from the directory
listing alone — no rewrite, partial boundary hour survives, NULL
partitions are exempt, dry-run first, manifest-guarded, idempotent."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.sources.parquet_sink import write_logs
from demo_otel_parquet_antalya_spark.sources.retention import expire_partitions


def _mini_logs(spark, rows):
    """Minimal logs-shaped frame: (timestamp literal or None, service)."""
    return spark.createDataFrame(
        [(t, s, "INFO", 9, "m") for t, s in rows],
        "ts string, service_name string, severity_text string, "
        "severity_number int, body string",
    ).select(
        F.col("ts").cast("timestamp").alias("timestamp"),
        "service_name", "severity_text", "severity_number", "body",
    )


@pytest.fixture()
def warehouse(spark, tmp_path):
    root = str(tmp_path / "wh")
    rows = [
        ("2024-01-01 08:10:00", "api"),
        ("2024-01-01 09:20:00", "api"),
        ("2024-01-01 10:30:00", "api"),
        ("2024-01-01 10:59:59", "web"),
        ("2024-01-01 11:00:00", "web"),
        ("2024-01-01 12:05:00", "web"),
        (None, "api"),  # NULL timestamp -> __HIVE_DEFAULT_PARTITION__
    ]
    write_logs(_mini_logs(spark, rows), root)
    return root


def test_dry_run_lists_without_deleting_then_expire(spark, warehouse):
    cutoff = "2024-01-01 11:00:00"
    before = spark.read.option("basePath", warehouse).parquet(warehouse).count()

    doomed = expire_partitions(spark, warehouse, cutoff)  # dry_run default
    # hours 08, 09, 10 (x2 services) are strictly before hour 11; the
    # boundary hour 11 and later, and the NULL partition, are not
    assert len(doomed) == 4
    assert all("hour=1" not in p or "hour=10" in p for p in doomed)
    assert not any("__HIVE_DEFAULT_PARTITION__" in p for p in doomed)
    # nothing deleted on dry run
    assert spark.read.option("basePath", warehouse).parquet(warehouse).count() == before

    gone = expire_partitions(spark, warehouse, cutoff, dry_run=False)
    assert gone == doomed
    left = spark.read.option("basePath", warehouse).parquet(warehouse)
    got = {
        (str(r.timestamp) if r.timestamp is not None else None)
        for r in left.select("timestamp").collect()
    }
    # survivors: the boundary hour's partial rows, everything after, and
    # the NULL-timestamp row — whole-partition semantics
    assert got == {"2024-01-01 11:00:00", "2024-01-01 12:05:00", None}
    # idempotent: a re-run finds nothing left to expire
    assert expire_partitions(spark, warehouse, cutoff, dry_run=False) == []
    # empty parents were pruned best-effort (no year=/month= husks left
    # under the api service for the fully-expired day... api still holds
    # the NULL partition dir, so just assert the hour dirs are gone)
    for p in gone:
        assert not os.path.exists(p)


def test_cutoff_forms_and_session_tz_consistency(spark, warehouse):
    # datetime and epoch-int cutoffs resolve to the same hour tuple as
    # the ISO string (session tz is UTC in the test session)
    iso = expire_partitions(spark, warehouse, "2024-01-01 11:00:00")
    dt = expire_partitions(
        spark, warehouse, datetime.datetime(2024, 1, 1, 11, 0, 0)
    )
    epoch = expire_partitions(spark, warehouse, 1704106800)
    assert iso == dt == epoch and len(iso) == 4
    # a cutoff INSIDE an hour spares that whole hour
    assert len(expire_partitions(spark, warehouse, "2024-01-01 10:30:00")) == 2
    with pytest.raises(ValueError, match="unparseable"):
        expire_partitions(spark, warehouse, "not a time")
    with pytest.raises(ValueError, match="unusable"):
        expire_partitions(spark, warehouse, None)


def test_streaming_manifest_refusal_and_finalize(spark, tmp_path):
    """A sink-written root refuses expiry (manifest-routed reads would
    break) unless the caller declares the sink finished — compact()'s
    contract, mirrored."""
    from demo_otel_parquet_antalya_spark.sources.generator import generate_files
    from demo_otel_parquet_antalya_spark.streaming.ingest import run_ingest_once

    landing = str(tmp_path / "landing")
    wh = str(tmp_path / "wh")
    generate_files(landing, n_files=2, records_per_file=30)
    run_ingest_once(spark, landing, wh, str(tmp_path / "ckpt"))

    with pytest.raises(ValueError, match="_spark_metadata"):
        expire_partitions(spark, wh, "2099-01-01 00:00:00")
    # dry run with finalize declared: lists but leaves the manifest alone
    doomed = expire_partitions(
        spark, wh, "2099-01-01 00:00:00", finalize_streaming=True
    )
    assert doomed and os.path.exists(os.path.join(wh, "_spark_metadata"))
    # real run finalizes first, then expires everything before the (far
    # future) cutoff; the NULL-free warehouse empties out
    gone = expire_partitions(
        spark, wh, "2099-01-01 00:00:00", dry_run=False, finalize_streaming=True
    )
    assert gone == doomed
    assert not os.path.exists(os.path.join(wh, "_spark_metadata"))


def test_remote_branch_routes_through_hadoop_fs(spark, tmp_path, monkeypatch):
    """Forced-remote: with local_root() denying the path, deletion must
    go through hadoop_delete (the _versions remote-branch discipline) —
    proven by monkeypatching both and observing the calls."""
    import demo_otel_parquet_antalya_spark.sources.retention as ret

    root = str(tmp_path / "wh")
    write_logs(
        _mini_logs(spark, [("2024-01-01 08:10:00", "api"),
                           ("2024-01-01 11:00:00", "api")]),
        root,
    )
    monkeypatch.setattr(ret, "_local_root", lambda p: None)
    deleted = []
    monkeypatch.setattr(
        ret, "hadoop_delete", lambda _s, p, r: deleted.append((p, r)) or True
    )
    gone = expire_partitions(spark, root, "2024-01-01 11:00:00", dry_run=False)
    assert len(gone) == 1 and "hour=8" in gone[0]
    assert deleted == [(gone[0], True)]
    # the data is untouched on disk (the fake remote delete proved the
    # routing without destroying the local fixture)
    assert os.path.exists(gone[0])


def test_retention_composes_with_registry_retire(spark, tmp_path):
    """r13: expire_partitions + LogTableRegistry.retire_missing keep
    catalog-mediated reads green across a retention sweep — the registry
    half of raw retention. Also: the retire commit is metadata-only
    (snapshot history advances), idempotent, and refused on an
    Iceberg-mirrored registry (it would desync the Iceberg manifests)."""
    from demo_otel_parquet_antalya_spark.sources.registry import LogTableRegistry

    root = str(tmp_path / "wh")
    write_logs(
        _mini_logs(spark, [
            ("2024-01-01 08:10:00", "api"),
            ("2024-01-01 11:00:00", "api"),
            ("2024-01-01 12:05:00", "web"),
        ]),
        root,
    )
    reg = LogTableRegistry(spark, root)
    assert len(reg.sync()) == 3
    head_before = reg.current_snapshot_id()

    gone = expire_partitions(spark, root, "2024-01-01 11:00:00", dry_run=False)
    assert len(gone) == 1
    retired = reg.retire_missing()
    assert len(retired) == 1 and "hour=8" in retired[0]
    # catalog-mediated read works and sees exactly the survivors
    got = {str(r.timestamp) for r in reg.table().select("timestamp").collect()}
    assert got == {"2024-01-01 11:00:00", "2024-01-01 12:05:00"}
    # metadata-only commit: history advanced, re-run is a no-op commit-wise
    assert reg.current_snapshot_id() == head_before + 1
    assert reg.retire_missing() == []
    assert reg.current_snapshot_id() == head_before + 1
    # sync stays idempotent after retirement (nothing new to register)
    assert reg.sync() == []

    # Iceberg-mirrored registries refuse (desync hazard)
    reg_ice = LogTableRegistry(
        spark, root, iceberg_table="local.db.logs", run_sql=lambda *_a: None
    )
    with pytest.raises(ValueError, match="desync"):
        reg_ice.retire_missing()


def test_mispointed_root_refuses_instead_of_silent_noop(spark, tmp_path):
    """A root that holds parquet data but no hour layout is a mis-pointed
    retention — returning [] would read as 'nothing old enough' while the
    disk fills forever, so it refuses loudly. Empty/absent roots (a fresh
    deployment with no data yet) stay a clean no-op."""
    flat = str(tmp_path / "flat")
    _mini_logs(spark, [("2024-01-01 08:10:00", "api")]).write.parquet(flat)
    with pytest.raises(ValueError, match="not the hive hour layout"):
        expire_partitions(spark, flat, "2024-01-01 11:00:00")
    # no data at all: nothing to protect, nothing to expire
    assert expire_partitions(
        spark, str(tmp_path / "empty"), "2024-01-01 11:00:00"
    ) == []
