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


def test_failed_deletes_raise_after_maximal_sweep(spark, warehouse, monkeypatch):
    """ADVICE r13: a delete failure must never read as a completed sweep.
    The sweep attempts EVERY doomed path, then raises
    RetentionDeleteError carrying both the provably-gone and the failed
    paths; a re-run converges on exactly the failed remainder. Covers
    both the local (rmtree) and the remote (hadoop_delete flag) branch."""
    import shutil as _shutil

    import demo_otel_parquet_antalya_spark.sources.retention as ret
    from demo_otel_parquet_antalya_spark.sources.retention import (
        RetentionDeleteError,
    )

    cutoff = "2024-01-01 11:00:00"
    doomed = expire_partitions(spark, warehouse, cutoff)
    assert len(doomed) == 4

    # local branch: fail exactly one path, transiently
    real_rmtree = _shutil.rmtree
    victim = doomed[1]

    def flaky(path, *a, **k):
        if path == victim:
            raise OSError("permission denied (simulated)")
        return real_rmtree(path, *a, **k)

    monkeypatch.setattr(ret.shutil if hasattr(ret, "shutil") else _shutil,
                        "rmtree", flaky)
    with pytest.raises(RetentionDeleteError, match="FAILED on 1") as ei:
        expire_partitions(spark, warehouse, cutoff, dry_run=False)
    assert ei.value.failed == [victim]
    assert sorted(ei.value.expired) == sorted(p for p in doomed if p != victim)
    assert os.path.exists(victim)  # honestly still there
    for p in ei.value.expired:
        assert not os.path.exists(p)

    # re-run after the failure clears: converges on the remainder only
    monkeypatch.setattr(_shutil, "rmtree", real_rmtree)
    assert expire_partitions(spark, warehouse, cutoff, dry_run=False) == [victim]

    # remote branch: hadoop_delete's success flag is honored
    monkeypatch.setattr(ret, "_local_root", lambda p: None)
    monkeypatch.setattr(ret, "hadoop_delete", lambda _s, _p, _r: False)
    # hour 11/12 + NULL survive above; push the cutoff past them
    with pytest.raises(RetentionDeleteError, match="FAILED on"):
        expire_partitions(spark, warehouse, "2024-01-02 00:00:00", dry_run=False)

    # remote branch, THROWING delete (java exception, not a false flag):
    # the sweep still attempts every path before raising — maximal, and
    # the non-throwing deletes are reported expired (code-review r14)
    doomed_all = expire_partitions(spark, warehouse, "2024-01-02 00:00:00")
    assert len(doomed_all) >= 2
    calls = []

    def throwing(_s, p, _r):
        calls.append(p)
        if p == doomed_all[0]:
            raise RuntimeError("simulated IOException")
        return True

    monkeypatch.setattr(ret, "hadoop_delete", throwing)
    with pytest.raises(RetentionDeleteError) as ei2:
        expire_partitions(spark, warehouse, "2024-01-02 00:00:00", dry_run=False)
    assert calls == doomed_all  # every path attempted
    assert ei2.value.failed == [doomed_all[0]]
    assert ei2.value.expired == doomed_all[1:]


def test_full_retention_lifecycle_keeps_every_panel_honest(spark, tmp_path):
    """VERDICT r13 #3 — the three bounding operators composed END TO END,
    one chain: ingest -> maintain (rollup + M4 + sketches) -> grain-compact
    both tails -> trim both fine states (markers recorded) -> EXPIRE the
    raw hours the coarse tails own -> retire them from the catalog ->
    and then every serving surface still answers correctly:

    - the maintained-state panels (q5-from-rollup spanned at
      boundary='auto', /panels/m4_downsample at 'auto',
      /panels/approx_rollup) serve FULL history — including the hours
      whose raw data no longer exists — exactly (M4/rollup) or within
      the published sketch error (approx);
    - the raw-window panels (q2 newest-N, q6 window) stay green over the
      surviving window;
    - expired windows answer HONESTLY: raw holds nothing (q6: empty), and
      requests only the trimmed fine state could have served exactly are
      400 — never silently-wrong numbers."""
    import json
    import urllib.error
    import urllib.request

    from demo_otel_parquet_antalya_spark.plans import facade
    from demo_otel_parquet_antalya_spark.serving import start_sql_endpoint
    from demo_otel_parquet_antalya_spark.sources.registry import LogTableRegistry
    from demo_otel_parquet_antalya_spark.streaming.rollup import (
        compact_rollup_grain,
        incremental_rollup,
        read_trim_boundary,
    )
    from demo_otel_parquet_antalya_spark.streaming.sketches import (
        _m4_batch,
        _m4_with_start,
        compact_m4_grain,
        incremental_m4,
        incremental_sketches,
        m4_remerge,
        sketch_panel,
    )

    base_epoch = 1704067200  # 2024-01-01 00:00:00 UTC
    boundary = base_epoch + 4 * 3600  # hour 04 — aligned to 300 AND 7200
    dims = ("service_name", "severity_text")

    def _rows(hours, tag):
        out = []
        for h in hours:
            for i in range(6):
                svc = "api" if i % 2 == 0 else "web"
                sev = "ERROR" if i % 3 == 0 else "INFO"
                out.append((
                    f"2024-01-01 {h:02d}:{(i * 9) % 60:02d}:{(i * 17) % 60:02d}",
                    svc, sev, 17 if sev == "ERROR" else 9, f"{tag}-{h}-{i}",
                    "app",
                ))
        return out

    rows_a = _rows(range(0, 4), "old")      # raw will be expired
    rows_b = _rows(range(4, 6), "recent")   # raw survives
    rows_c = [  # the fresh batch that drives the trimming resume
        (f"2024-01-01 05:5{i}:00", "api", "INFO", 9, f"fresh-{i}", "app")
        for i in range(4)
    ]

    def _frame(rows):
        return spark.createDataFrame(
            rows,
            "ts string, service_name string, severity_text string, "
            "severity_number int, body string, scope_name string",
        ).select(
            F.col("ts").cast("timestamp").alias("timestamp"),
            "service_name", "severity_text", "severity_number", "body",
            "scope_name",
        )

    def _land(fname, rows):
        import json as _json

        os.makedirs(str(tmp_path / "land"), exist_ok=True)
        with open(str(tmp_path / "land" / fname), "w") as f:
            for ts, svc, sev, num, body, scope in rows:
                f.write(_json.dumps({
                    "timestamp": ts, "service_name": svc,
                    "severity_text": sev, "severity_number": num,
                    "body": body, "scope_name": scope,
                }) + "\n")

    schema = (
        "timestamp timestamp, service_name string, severity_text string, "
        "severity_number int, body string, scope_name string"
    )

    def _stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(tmp_path / "land"))
        )

    wh = str(tmp_path / "wh")
    rollup_dir, rollup_tail = str(tmp_path / "ru"), str(tmp_path / "ru_tail")
    m4_dir, m4_tail = str(tmp_path / "m4"), str(tmp_path / "m4_tail")
    sketch_dir = str(tmp_path / "sk")

    # 1. ingest history into the partitioned warehouse + catalog
    write_logs(_frame(rows_a + rows_b), wh)
    reg = LogTableRegistry(spark, wh)
    assert reg.sync()

    # 2. maintain all three states over the same history
    _land("a.json", rows_a + rows_b)
    incremental_rollup(
        _stream(), rollup_dir, str(tmp_path / "ck_ru"),
        bucket="30 seconds", ts_col="timestamp", dim_cols=dims,
    ).awaitTermination()
    incremental_m4(
        _stream(), m4_dir, str(tmp_path / "ck_m4"),
        ts_col="timestamp", id_col="body", value_col="severity_number",
    ).awaitTermination()
    incremental_sketches(
        _stream(), sketch_dir, str(tmp_path / "ck_sk"),
        ts_col="timestamp", user_col="service_name",
        value_col="severity_number",
    ).awaitTermination()

    # 3. compact both tails below the boundary, 4. trim both fine states
    compact_rollup_grain(spark, rollup_dir, rollup_tail, 30, 300,
                         dim_cols=dims, older_than="2024-01-01 04:00:00")
    compact_m4_grain(spark, m4_dir, m4_tail, 7200, older_than_epoch=boundary)
    _land("c.json", rows_c)
    write_logs(_frame(rows_c), wh)
    reg.sync()
    incremental_rollup(
        _stream(), rollup_dir, str(tmp_path / "ck_ru"),
        bucket="30 seconds", ts_col="timestamp", dim_cols=dims,
        trim_horizon_s=3600, trim_coarse_dir=rollup_tail,
        trim_coarse_interval_s=300,
    ).awaitTermination()
    incremental_m4(
        _stream(), m4_dir, str(tmp_path / "ck_m4"),
        ts_col="timestamp", id_col="body", value_col="severity_number",
        trim_horizon_s=3600, trim_coarse_dir=m4_tail,
        trim_coarse_interval_s=7200,
    ).awaitTermination()
    incremental_sketches(
        _stream(), sketch_dir, str(tmp_path / "ck_sk"),
        ts_col="timestamp", user_col="service_name",
        value_col="severity_number",
    ).awaitTermination()
    # the rollup trim clamps to PROVEN coverage = max coarse bucket + grain
    # (the last hour's data ends at :45, so its 300 s coverage ends 03:50,
    # ten minutes shy of the compaction cut); the M4 trim's 7200 s pixels
    # land exactly on the boundary
    assert read_trim_boundary(spark, rollup_dir) == (boundary - 600, 300)
    assert read_trim_boundary(spark, m4_dir) == (boundary, 7200)

    # 5. expire the raw hours the coarse tails own, retire from catalog
    doomed = expire_partitions(spark, wh, boundary)
    assert len(doomed) > 0
    gone = expire_partitions(spark, wh, boundary, dry_run=False)
    assert gone == doomed
    assert reg.retire_missing()
    spark.catalog.refreshByPath(wh)
    survivors = {str(r.timestamp) for r in reg.table().select("timestamp").collect()}
    assert survivors == {r[0] for r in rows_b + rows_c}

    # 6. every serving surface still answers, and honestly
    oracle = _frame(rows_a + rows_b + rows_c)  # full history incl. expired
    server = start_sql_endpoint(
        spark, "/root/testdata/sf0.001", row_cap=5000, logs_dir=wh,
        rollup_dir=rollup_dir, rollup_interval_s=30, rollup_dims=dims,
        rollup_coarse_dir=rollup_tail, rollup_coarse_interval_s=300,
        rollup_boundary="auto",
        m4_dir=m4_dir, m4_interval_s=3600, m4_coarse_dir=m4_tail,
        m4_coarse_interval_s=7200, m4_boundary="auto",
        sketch_dir=sketch_dir, request_timeout_s=15.0,
    )
    host, port = server.server_address
    base = f"http://{host}:{port}"

    def _get(path):
        with urllib.request.urlopen(base + path) as r:
            return json.loads(r.read())

    def _norm_t(rows):
        return sorted((r[0].replace("T", " "), *r[1:]) for r in rows)

    try:
        # q5 full history at the coarse grain: served from the spanned
        # rollup (boundary follows the trim marker) — EXACT counts for
        # hours whose raw data is gone
        q5 = _get("/panels/q5_timeseries?interval=300")
        assert q5["source"] == "rollup"
        want5 = [
            (str(r.t), r.series, r.value)
            for r in facade.q5_timeseries(oracle, interval_seconds=300).collect()
        ]
        assert _norm_t(q5["rows"]) == sorted(want5)

        # q3 severity counts: spanned rollup, full history, exact
        q3 = _get("/panels/q3_severity_counts")
        assert q3["source"] == "rollup"
        want3 = [
            tuple(r) for r in facade.q3_severity_counts(oracle).collect()
        ]
        assert sorted(map(tuple, q3["rows"])) == sorted(want3)

        # M4 panel at 'auto': bare GET (coarsest-grain default) == direct
        # M4 over the FULL history
        m4 = _get("/panels/m4_downsample")
        assert m4["source"] == "m4"
        want_m4 = {
            (str(r.t), r.v_first, r.v_min, r.v_max, r.v_last)
            for r in m4_remerge(
                _m4_with_start(
                    _m4_batch(oracle, "timestamp", "body", "severity_number"),
                    3600,
                ), 7200,
            ).select(
                F.timestamp_seconds("bucket_start").alias("t"),
                "v_first", "v_min", "v_max", "v_last",
            ).collect()
        }
        assert set(_norm_t(m4["rows"])) == {
            (t.replace("T", " "), *rest) for (t, *rest) in want_m4
        }
        assert m4["row_count"] == 3  # 6 h of history at 2 h pixels

        # approx panel: HTTP == the library's own merge over the state
        ap = _get("/panels/approx_rollup?interval=7200")
        want_ap = {
            (str(r.t), r.approx_users, r.p50, r.p95)
            for r in sketch_panel(spark, sketch_dir, 7200).collect()
        }
        assert set(_norm_t(ap["rows"])) == {
            (t.replace("T", " "), *rest) for (t, *rest) in want_ap
        }
        assert ap["row_count"] == 3

        # raw-window panels over the SURVIVING window: green and exact
        q2 = _get("/panels/q2_recent_logs?limit=5")
        assert q2["source"] == "pruned" and q2["row_count"] == 5
        q6 = _get(
            "/panels/q6_log_panel?start=2024-01-01%2004:00:00"
            "&end=2024-01-01%2005:00:00"
        )
        assert q6["source"] == "pruned"
        # Grafana $timeFilter is inclusive on BOTH ends (the facade's q6
        # contract), so hour 04's six rows plus the 05:00:00 row qualify
        assert q6["row_count"] == 7

        # an EXPIRED window: raw honestly holds nothing
        q6_old = _get(
            "/panels/q6_log_panel?start=2024-01-01%2001:00:00"
            "&end=2024-01-01%2002:00:00"
        )
        assert q6_old["row_count"] == 0

        # a fine-grain request only the trimmed fine state could serve
        # exactly: forced rollup route answers 400 (trimmed + coarse tail
        # cannot serve 30 s buckets below the boundary), never wrong bins
        try:
            urllib.request.urlopen(
                f"{base}/panels/q5_timeseries?interval=30&source=rollup"
                "&start=2024-01-01%2000:00:00&end=2024-01-01%2006:00:00"
            )
        except urllib.error.HTTPError as e:
            assert e.code == 400
        else:
            raise AssertionError("expected 400 for fine-grain expired window")

        # the M4 panel at the fine grain (not a coarse multiple): 400 —
        # no raw fallback exists, and raw is partly expired anyway
        try:
            urllib.request.urlopen(f"{base}/panels/m4_downsample?interval=3600")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "not a positive multiple" in json.loads(e.read())["error"]
        else:
            raise AssertionError("expected 400 for fine-grain M4 interval")
    finally:
        server.shutdown()
