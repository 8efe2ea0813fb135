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


def test_time_filter_non_partitioned_column_keeps_all_rows(spark):
    """ADVICE r8: the derived year/month/day/hour partition predicates
    encode the hour of the PARTITIONING column (timestamp). Filtering a
    different time column on a frame that carries those columns must not
    attach them — a row whose observed_timestamp falls in the window but
    whose timestamp-hour partition does not would be silently dropped."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("2023-11-14 22:30:00", "2023-11-15 01:00:00")],
        "timestamp string, observed_timestamp string",
    ).select(
        F.to_timestamp("timestamp").alias("timestamp"),
        F.to_timestamp("observed_timestamp").alias("observed_timestamp"),
    ).withColumns(
        {
            "year": F.year("timestamp"),
            "month": F.month("timestamp"),
            "day": F.dayofmonth("timestamp"),
            "hour": F.hour("timestamp"),
        }
    )
    # window matches observed_timestamp (01:00) but NOT the partition hour
    # (22:00 on the 14th) — exact semantics require the row to survive
    got = facade.time_filter(
        df, "2023-11-15 00:00:00", "2023-11-15 02:00:00", col="observed_timestamp"
    )
    assert got.count() == 1
    # filtering the partitioning column itself still prunes (and matches)
    assert facade.time_filter(df, "2023-11-15 00:00:00", None).count() == 0
    assert facade.time_filter(df, "2023-11-14 22:00:00", None).count() == 1
    # a warehouse partitioned by another column opts in explicitly
    got = facade.time_filter(
        df,
        "2023-11-15 00:00:00",
        None,
        col="observed_timestamp",
        partitioned_by="observed_timestamp",
    )
    # partition columns here encode timestamp's hour, so the opt-in with a
    # mismatched layout drops the row — exactly the contract the parameter
    # names: the caller asserts the layout derives from `partitioned_by`
    assert got.count() == 0


def test_translate_is_string_level():
    out = translate(Q5, interval_seconds=30)
    assert "$" not in out and "count()" not in out
    assert "otel_logs" in out and "timestamp_seconds" in out


# ---------------------------------------------------------------------------
# Ad-hoc dialect widening: each rewritten construct must VALUE-match the
# native Spark SQL a user would otherwise have to write by hand.
# ---------------------------------------------------------------------------

ADHOC_CASES = [
    # (ClickHouse form, native Spark form)
    (
        "SELECT toStartOfMinute(timestamp) AS m, count() AS n FROM $table GROUP BY m",
        "SELECT date_trunc('minute', timestamp) AS m, COUNT(*) AS n FROM otel_logs GROUP BY m",
    ),
    (
        "SELECT toStartOfInterval(timestamp, INTERVAL 30 second) AS b, count() AS n FROM $table GROUP BY b",
        "SELECT timestamp_seconds(CAST(floor(unix_timestamp(timestamp) / 30) * 30 AS BIGINT)) AS b, "
        "COUNT(*) AS n FROM otel_logs GROUP BY b",
    ),
    (
        "SELECT countIf(severity_text = 'ERROR') AS e, sumIf(1, severity_text = 'INFO') AS i FROM $table",
        "SELECT count_if(severity_text = 'ERROR') AS e, SUM(IF(severity_text = 'INFO', 1, NULL)) AS i FROM otel_logs",
    ),
    (
        "SELECT uniqExact(service_name) AS u, toDate(timestamp) AS d FROM $table GROUP BY d",
        "SELECT COUNT(DISTINCT service_name) AS u, to_date(timestamp) AS d FROM otel_logs GROUP BY d",
    ),
    (
        "SELECT quantileExact(0.5)(toInt64(severity_number)) AS p50 FROM $table",
        "SELECT percentile(CAST(severity_number AS BIGINT), 0.5) AS p50 FROM otel_logs",
    ),
    (
        "SELECT service_name FROM $table WHERE startsWith(severity_text, 'ERR') "
        "AND position(body, 'a') > 0 AND notEmpty(body) ORDER BY timestamp LIMIT 5",
        "SELECT service_name FROM otel_logs WHERE startswith(severity_text, 'ERR') "
        "AND instr(body, 'a') > 0 AND (length(body) > 0) ORDER BY timestamp LIMIT 5",
    ),
    (
        "SELECT intDiv(severity_number, 4) AS bucket, count() AS n FROM $table GROUP BY bucket",
        "SELECT (severity_number DIV 4) AS bucket, COUNT(*) AS n FROM otel_logs GROUP BY bucket",
    ),
]


@pytest.mark.parametrize("ch, native", ADHOC_CASES)
def test_adhoc_dialect_value_matches_native(spark, logs_view, ch, native):
    got = sorted(tuple(r) for r in sql(spark, ch).collect())
    want = sorted(tuple(r) for r in spark.sql(native).collect())
    assert got == want and len(got) > 0


def test_unknown_constructs_fail_loudly(spark, logs_view):
    """Anything outside the declared scope must reach Catalyst untouched and
    fail to parse/resolve — never be silently half-translated."""
    with pytest.raises(Exception):
        sql(spark, "SELECT windowFunnel(3600)(timestamp, 1, 2) FROM $table").collect()


def test_uniq_maps_to_sketch(spark, logs_view):
    assert "approx_count_distinct" in translate("SELECT uniq(service_name) FROM $table")


def test_string_literals_pass_through_untouched(spark, logs_view):
    """Construct-shaped substrings inside string literals are data, not
    dialect — they must survive translation byte-identical."""
    t = translate(
        "SELECT count() AS n FROM $table "
        "WHERE body LIKE '%count()%' OR body = 'toDate(now()) uniq(x) $timeFilter'"
    )
    assert "'%count()%'" in t
    assert "'toDate(now()) uniq(x) $timeFilter'" in t
    assert t.count("COUNT(*)") == 1  # only the real aggregate rewritten
    assert sql(spark, "SELECT count() AS n FROM $table WHERE body LIKE '%count()%'").first().n == 0
