"""The reference's six shipped queries (SURVEY.md §2.B Q1-Q6), pasted
VERBATIM from its README/AGENTS/Grafana dashboard, must run through the
dialect shim against an ingested logs table and agree with the facade API."""

from __future__ import annotations

import pytest

from demo_otel_parquet_antalya_spark.plans import facade
from demo_otel_parquet_antalya_spark.plans.clickhouse_compat import sql, translate
from demo_otel_parquet_antalya_spark.sources.generator import generate_files
from demo_otel_parquet_antalya_spark.sources.otlp import ingest_otlp_json

# verbatim from the reference (README.md:84,114-123; AGENTS.md:76;
# grafana/provisioning/dashboards/logs.json:123,181)
Q1 = "SELECT service_name, severity_text, body, timestamp FROM ice.`otel.logs`"
Q2 = "SELECT timestamp, service_name, severity_text, body FROM ice.`otel.logs` ORDER BY timestamp DESC LIMIT 10"
Q3 = "SELECT service_name, severity_text, count() FROM ice.`otel.logs` GROUP BY service_name, severity_text"
Q4 = "SELECT * FROM ice.`otel.logs` FORMAT Pretty"
Q5 = (
    "SELECT $timeSeries as t, service_name as series, count() as value "
    "FROM $table WHERE $timeFilter GROUP BY t, series ORDER BY t"
)
Q6 = (
    "SELECT toDateTime64(timestamp, 3) as log_time, body as message, service_name, "
    "scope_name, severity_text FROM $table WHERE $timeFilter ORDER BY timestamp LIMIT 1000"
)


@pytest.fixture(scope="module")
def logs_view(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("ch_compat")
    generate_files(str(d / "otlp"), n_files=6, records_per_file=50)
    logs = ingest_otlp_json(spark, str(d / "otlp"))
    logs.createOrReplaceTempView("otel_logs")
    return logs


def test_q1_q4_scan_shapes(spark, logs_view):
    n = logs_view.count()
    assert sql(spark, Q1).count() == n
    assert sql(spark, Q4).count() == n
    assert sql(spark, Q4).columns == logs_view.columns


def test_q2_recent_tail_matches_facade(spark, logs_view):
    got = sql(spark, Q2).collect()
    want = facade.q2_recent_logs(logs_view).collect()
    assert [r.body for r in got] == [r.body for r in want] and len(got) == 10


def test_q3_counts_match_facade(spark, logs_view):
    got = {(r[0], r[1]): r[2] for r in sql(spark, Q3).collect()}
    want = {(r[0], r[1]): r[2] for r in facade.q3_severity_counts(logs_view).collect()}
    assert got == want and len(got) > 1


def test_q5_timeseries_matches_facade(spark, logs_view):
    got = sorted(tuple(r) for r in sql(spark, Q5).collect())
    want = sorted(tuple(r) for r in facade.q5_timeseries(logs_view).collect())
    assert got == want and len(got) > 0


def test_q6_log_panel_matches_facade(spark, logs_view):
    got = sql(spark, Q6)
    want = facade.q6_log_panel(logs_view)
    assert got.columns == want.columns
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_time_filter_bounds(spark, logs_view):
    lo, hi = "2023-11-14 22:13:00", "2023-11-14 22:14:00"
    df = sql(spark, Q6, time_from=lo, time_to=hi)
    rows = df.collect()
    in_range = logs_view.filter(
        (logs_view.timestamp >= lo) & (logs_view.timestamp <= hi)
    ).count()
    assert len(rows) == min(in_range, 1000)


def test_translate_is_string_level():
    out = translate(Q5, interval_seconds=30)
    assert "$" not in out and "count()" not in out
    assert "otel_logs" in out and "timestamp_seconds" in out
