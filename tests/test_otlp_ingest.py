"""OTLP ingest pipeline tests (SURVEY.md §5.2): flattener golden rows,
NULL handling, attribute promotion/residuals, ns→µs decode, partitioned
write + incremental registration idempotence, and the reference's Q1-Q6
over the round-tripped table."""

from __future__ import annotations

import datetime
import json
import os

import pytest

from demo_otel_parquet_antalya_spark.plans import facade
from demo_otel_parquet_antalya_spark.schema import OTEL_LOGS_SCHEMA
from demo_otel_parquet_antalya_spark.sources.generator import generate_files
from demo_otel_parquet_antalya_spark.sources.otlp import ingest_otlp_json
from demo_otel_parquet_antalya_spark.sources.parquet_sink import read_logs, write_logs
from demo_otel_parquet_antalya_spark.sources.registry import LogTableRegistry

# The reference's canonical manual-test payload shape (README.md:49-63):
# one record, service.name=my-app, severity INFO, body "Test log message".
CANONICAL_PAYLOAD = {
    "resourceLogs": [
        {
            "resource": {
                "attributes": [
                    {"key": "service.name", "value": {"stringValue": "my-app"}},
                    {"key": "team", "value": {"stringValue": "obs"}},
                ]
            },
            "scopeLogs": [
                {
                    "scope": {"name": "manual-test", "version": "1.0.0", "attributes": []},
                    "logRecords": [
                        {
                            "timeUnixNano": "1700000000123456789",
                            "observedTimeUnixNano": "1700000000223456789",
                            "severityText": "INFO",
                            "severityNumber": 9,
                            "body": {"stringValue": "Test log message"},
                            "traceId": "0123456789abcdef0123456789abcdef",
                            "spanId": "0123456789abcdef",
                            "attributes": [
                                {"key": "http.method", "value": {"stringValue": "GET"}}
                            ],
                        }
                    ],
                }
            ],
        }
    ]
}

# Variant (c): optional fields absent -> NULLs / defaults
SPARSE_PAYLOAD = {
    "resourceLogs": [
        {
            "resource": {"attributes": []},
            "scopeLogs": [
                {
                    "scope": {"name": None, "version": None, "attributes": []},
                    "logRecords": [{"observedTimeUnixNano": "1700000001000000000"}],
                }
            ],
        }
    ]
}


def _write(tmp_path, name, payload):
    p = os.path.join(tmp_path, name)
    with open(p, "w") as f:
        json.dump(payload, f)
    return p


def test_flatten_canonical_record(spark, tmp_path):
    d = str(tmp_path / "in")
    os.makedirs(d)
    _write(d, "canonical.json", CANONICAL_PAYLOAD)
    rows = ingest_otlp_json(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    # ns -> µs truncation (1700000000123456789 ns -> ...123456 µs)
    assert r.timestamp == datetime.datetime(2023, 11, 14, 22, 13, 20, 123456)
    assert r.observed_timestamp == 1700000000223456789
    assert r.service_name == "my-app"
    assert r.service_namespace is None
    assert r.severity_text == "INFO"
    assert r.severity_number == 9
    assert r.body == "Test log message"
    assert r.trace_id == "0123456789abcdef0123456789abcdef"
    # promoted attr must NOT appear in residual JSON; non-promoted must
    assert json.loads(r.resource_attributes) == {"team": "obs"}
    assert json.loads(r.log_attributes) == {"http.method": "GET"}
    assert r.scope_name == "manual-test"
    assert r.scope_version == "1.0.0"
    assert r.scope_attributes is None


def test_flatten_sparse_record_nulls(spark, tmp_path):
    d = str(tmp_path / "in")
    os.makedirs(d)
    _write(d, "sparse.json", SPARSE_PAYLOAD)
    r = ingest_otlp_json(spark, d).collect()[0]
    # missing timeUnixNano falls back to observed
    assert r.timestamp == datetime.datetime(2023, 11, 14, 22, 13, 21)
    assert r.service_name == ""  # non-null default
    assert r.severity_text == ""
    assert r.severity_number == 0
    assert r.body is None and r.trace_id is None and r.span_id is None
    assert r.resource_attributes is None and r.log_attributes is None


def test_flatten_schema_exact(spark, tmp_path):
    d = str(tmp_path / "in")
    os.makedirs(d)
    _write(d, "canonical.json", CANONICAL_PAYLOAD)
    df = ingest_otlp_json(spark, d)
    assert [f.name for f in df.schema.fields] == [f.name for f in OTEL_LOGS_SCHEMA.fields]
    assert [f.dataType for f in df.schema.fields] == [f.dataType for f in OTEL_LOGS_SCHEMA.fields]


def test_multi_nesting_explodes_to_all_records(spark, tmp_path):
    d = str(tmp_path / "in")
    os.makedirs(d)
    generate_files(d, n_files=4, records_per_file=25, seed=7)
    df = ingest_otlp_json(spark, d)
    assert df.count() == 100
    # resource context is carried down to every exploded record
    assert df.filter(df.service_name == "").count() == 0


@pytest.fixture()
def warehouse(spark, tmp_path):
    """End-to-end: generate -> ingest -> partitioned write -> registry sync."""
    in_dir, wh = str(tmp_path / "in"), str(tmp_path / "wh")
    generate_files(in_dir, n_files=6, records_per_file=200, seed=11)
    logs = ingest_otlp_json(spark, in_dir)
    write_logs(logs, wh)
    reg = LogTableRegistry(spark, wh)
    reg.sync()
    return wh, reg


def test_partitioned_layout_and_pruning(spark, warehouse):
    wh, _reg = warehouse
    # hive layout exists
    services = [p for p in os.listdir(wh) if p.startswith("service_name=")]
    assert services, "expected service_name= partitions"
    df = read_logs(spark, wh)
    assert df.count() == 1200
    # partition filter must prune: scan only the one service directory
    one = services[0].split("=", 1)[1]
    plan = df.filter(df.service_name == one)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(service_name" in plan


def test_registry_idempotent_no_double_count(spark, warehouse):
    wh, reg = warehouse
    n1 = reg.table().count()
    assert reg.sync() == []  # second cycle: no new files
    assert reg.table().count() == n1
    # re-registering after new data arrives counts only the delta
    extra = reg.table().limit(0)  # no-op write path exercised separately


def test_registry_sees_only_registered_snapshot(spark, tmp_path):
    in_dir, wh = str(tmp_path / "in"), str(tmp_path / "wh")
    generate_files(in_dir, n_files=2, records_per_file=50, seed=3)
    logs = ingest_otlp_json(spark, in_dir)
    write_logs(logs, wh)
    reg = LogTableRegistry(spark, wh)
    reg.sync()
    before = reg.table().count()
    # new flush lands but is NOT yet synced -> invisible (freshness contract)
    in2 = str(tmp_path / "in2")
    generate_files(in2, n_files=1, records_per_file=50, seed=4)
    write_logs(ingest_otlp_json(spark, in2), wh)
    assert reg.table().count() == before
    new = reg.sync()
    assert new, "sync must pick up the new flush"
    assert reg.table().count() == before + 50


def test_reference_queries_q1_to_q6(spark, warehouse):
    wh, reg = warehouse
    logs = reg.table()
    assert facade.q1_projection(logs).columns == ["service_name", "severity_text", "body", "timestamp"]
    recent = facade.q2_recent_logs(logs).collect()
    assert len(recent) == 10
    assert recent[0].timestamp >= recent[-1].timestamp  # newest first
    counts = facade.q3_severity_counts(logs)
    assert counts.agg({"count": "sum"}).collect()[0][0] == 1200
    assert facade.q4_select_all(logs).count() == 1200
    series = facade.q5_timeseries(logs).collect()
    assert len(series) >= 2 and all(row.value > 0 for row in series)
    panel = facade.q6_log_panel(logs, limit=1000).collect()
    assert len(panel) == 1000  # LIMIT actually truncates
    assert panel[0].log_time <= panel[-1].log_time  # oldest first


def test_malformed_payloads_dont_poison_ingest(spark, tmp_path):
    """Corrupt landing files must contribute zero rows, not fail the job
    (schema-enforced PERMISSIVE read -> null envelope -> nothing to explode)."""
    import json as _json

    d = tmp_path / "landing"
    d.mkdir()
    (d / "good.json").write_text(_json.dumps(CANONICAL_PAYLOAD))
    (d / "bad1.json").write_text("{not json at all")
    (d / "bad2.json").write_text('{"resourceLogs": "not-an-array"}')
    flat = ingest_otlp_json(spark, str(d))
    rows = flat.collect()
    assert len(rows) == 1 and rows[0].body == "Test log message"


def test_compaction_preserves_rows_and_layout(spark, tmp_path):
    """compact_warehouse: same rows, same partition values, fewer files."""
    from demo_otel_parquet_antalya_spark.sources.registry import compact_warehouse

    generate_files(str(tmp_path / "otlp"), n_files=12, records_per_file=25)
    flat = ingest_otlp_json(spark, str(tmp_path / "otlp"))
    # many tiny appends -> small-file buildup
    for i in range(3):
        write_logs(flat, str(tmp_path / "wh"))
    before = read_logs(spark, str(tmp_path / "wh"))
    n_before = before.count()
    files_before = sum(1 for p in (tmp_path / "wh").rglob("*.parquet"))

    compact_warehouse(spark, str(tmp_path / "wh"), str(tmp_path / "wh2"))
    after = read_logs(spark, str(tmp_path / "wh2"))
    assert after.count() == n_before
    files_after = sum(1 for p in (tmp_path / "wh2").rglob("*.parquet"))
    assert files_after < files_before
    # identical content, partition columns included
    assert sorted(map(tuple, before.collect())) == sorted(map(tuple, after.collect()))


def test_schema_drift_merges_with_nulls(spark, tmp_path):
    """A column appearing only in later files (promoted OTLP attr) must read
    as NULL for earlier files under merge_schema — rows never drop, queries
    never fail on drift."""
    from demo_otel_parquet_antalya_spark.sources.registry import LogTableRegistry

    root = str(tmp_path / "wh")
    spark.createDataFrame(
        [(1, "a")], "event_id long, body string"
    ).write.parquet(f"{root}/day=1")
    spark.createDataFrame(
        [(2, "b", "checkout")], "event_id long, body string, service string"
    ).write.parquet(f"{root}/day=2")

    reg = LogTableRegistry(spark, root, state_path=str(tmp_path / "state.txt"))
    reg.sync()
    merged = reg.table(merge_schema=True)
    assert set(merged.columns) >= {"event_id", "body", "service"}
    rows = {r.event_id: r.service for r in merged.collect()}
    assert rows[1] is None and rows[2] == "checkout"


def test_audited_ingest_quarantines_corrupt_payloads(spark, tmp_path):
    """A garbage file must not kill the read (FAILFAST) nor vanish
    (silent PERMISSIVE): good envelopes flatten normally, the poison
    payload lands in the audit frame verbatim."""
    from demo_otel_parquet_antalya_spark.sources.generator import generate_files
    from demo_otel_parquet_antalya_spark.sources.otlp import ingest_otlp_json_audited

    src = str(tmp_path / "otlp")
    generate_files(src, n_files=2, records_per_file=5)
    poison = '{"resourceLogs": [{"scopeLogs": THIS IS NOT JSON'
    with open(f"{src}/poison.json", "w") as f:
        f.write(poison)

    flat, bad = ingest_otlp_json_audited(spark, src)
    assert flat.count() == 10  # both good files fully flattened
    bad_rows = bad.collect()
    assert len(bad_rows) == 1
    assert bad_rows[0]["raw"] == poison


def test_snapshot_diff_and_incremental_read(spark, tmp_path):
    """diff_snapshots reports exactly the committed delta (footer-metadata
    rows, no scan) and read_increment serves ONLY the added files — the
    checkpoint-and-consume-the-delta contract of incremental downstreams."""
    in_dir, wh = str(tmp_path / "in"), str(tmp_path / "wh")
    generate_files(in_dir, n_files=2, records_per_file=50, seed=11)
    write_logs(ingest_otlp_json(spark, in_dir), wh)
    reg = LogTableRegistry(spark, wh)
    reg.sync()
    snap1 = reg.current_snapshot_id()
    n1 = reg.table().count()

    in2 = str(tmp_path / "in2")
    generate_files(in2, n_files=1, records_per_file=50, seed=12)
    write_logs(ingest_otlp_json(spark, in2), wh)
    reg.sync()

    diff = reg.diff_snapshots(snap1)
    assert diff["from"] == snap1 and diff["to"] == reg.current_snapshot_id()
    assert diff["removed_files"] == [] and diff["removed_rows"] == 0
    assert diff["added_rows"] == 50
    assert len(diff["added_files"]) >= 1

    inc = reg.read_increment(snap1)
    assert inc.count() == 50
    assert reg.table().count() == n1 + 50

    # nothing new since HEAD -> explicit signal, not an empty frame
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no files added"):
        reg.read_increment(reg.current_snapshot_id())


def test_vacuum_orphans_finds_and_removes_only_unreferenced(spark, tmp_path):
    """Files no snapshot references (crash leftovers) are reported by the
    dry run and deleted by the real run; every registered file survives."""
    import os

    in_dir, wh = str(tmp_path / "in"), str(tmp_path / "wh")
    generate_files(in_dir, n_files=2, records_per_file=50, seed=21)
    write_logs(ingest_otlp_json(spark, in_dir), wh)
    reg = LogTableRegistry(spark, wh)
    reg.sync()
    n = reg.table().count()

    # a writer dies after flush, before sync: orphan parquet appears
    orphan = os.path.join(wh, "service_name=ghost", "crash-leftover.parquet")
    os.makedirs(os.path.dirname(orphan), exist_ok=True)
    spark.range(3).toPandas().to_parquet(orphan)

    found = reg.vacuum_orphans(dry_run=True)
    assert found == [orphan]
    assert os.path.exists(orphan)  # dry run never deletes

    removed = reg.vacuum_orphans(dry_run=False)
    assert removed == [orphan] and not os.path.exists(orphan)
    assert reg.table().count() == n  # registered data untouched
    assert reg.vacuum_orphans(dry_run=True) == []
