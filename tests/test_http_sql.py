"""SQL-over-HTTP serving surface (serving.py): the dashboard-facing query
path the reference fronts with Grafana->ClickHouse (SURVEY §2.A A14),
served read-only from a live SparkSession over stdlib HTTP."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from demo_otel_parquet_antalya_spark.serving import start_sql_endpoint

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def endpoint(spark):
    server = start_sql_endpoint(spark, SF_DIR, row_cap=500)
    host, port = server.server_address
    yield f"http://{host}:{port}"
    server.shutdown()


def _post(base, path, payload):
    req = urllib.request.Request(
        base + path,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read())


def _post_err(base, path, payload):
    try:
        _post(base, path, payload)
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())
    raise AssertionError("expected an HTTP error")


def test_health_and_catalog(endpoint):
    with urllib.request.urlopen(endpoint + "/health") as resp:
        health = json.loads(resp.read())
    assert health["status"] == "ok"
    assert "lineitem" in health["tables"]
    with urllib.request.urlopen(endpoint + "/queries") as resp:
        catalog = json.loads(resp.read())
    assert "scan_count" in catalog and len(catalog) > 200


def test_query_matches_direct_spark(endpoint, spark):
    sql = (
        "SELECT l_returnflag AS flag, COUNT(*) AS n, "
        "ROUND(SUM(l_quantity), 2) AS qty "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "GROUP BY l_returnflag ORDER BY flag"
    )
    got = _post(endpoint, "/query", {"sql": sql})
    want = [[r[0], r[1], float(r[2])] for r in spark.sql(sql).collect()]
    assert got["columns"] == ["flag", "n", "qty"]
    assert got["rows"] == want
    assert got["truncated"] is False


def test_timestamps_serialize_and_row_cap_truncates(endpoint):
    got = _post(
        endpoint,
        "/query",
        {"sql": "SELECT event_id, ts FROM events ORDER BY event_id", "limit": 7},
    )
    assert got["row_count"] == 7 and got["truncated"] is True
    # ISO-formatted timestamp string, parseable back
    assert "T" in got["rows"][0][1] or "-" in got["rows"][0][1]
    # the per-request limit can only LOWER the server cap
    big = _post(
        endpoint,
        "/query",
        {"sql": "SELECT event_id FROM events", "limit": 10_000_000},
    )
    assert big["row_count"] <= 500


def test_read_only_enforcement(endpoint):
    code, err = _post_err(endpoint, "/query", {"sql": "DROP TABLE lineitem"})
    assert code == 400 and "read-only" in err["error"]
    code, err = _post_err(
        endpoint, "/query", {"sql": "WITH x AS (SELECT 1) INSERT INTO t SELECT * FROM x"}
    )
    assert code == 400 and "read-only" in err["error"]
    # mutation keywords INSIDE string literals are data, not statements
    ok = _post(endpoint, "/query", {"sql": "SELECT 'please do not DROP me' AS s"})
    assert ok["rows"] == [["please do not DROP me"]]
    # malformed SQL surfaces as a 400 with the analyzer message, not a 500
    code, err = _post_err(endpoint, "/query", {"sql": "SELECT FROM nothing x y z"})
    assert code == 400


def test_panels_serve_reference_dashboard_over_ingested_logs(spark, tmp_path):
    """The reference's full loop, Spark-side: generated OTLP landing files
    -> exactly-once ingest -> partitioned warehouse -> the Grafana panel
    queries (facade q5/q6) served over HTTP. Values must equal the direct
    facade call on the same warehouse."""
    from demo_otel_parquet_antalya_spark.plans import facade
    from demo_otel_parquet_antalya_spark.sources.generator import generate_files
    from demo_otel_parquet_antalya_spark.streaming.ingest import run_ingest_once

    landing = str(tmp_path / "landing")
    wh = str(tmp_path / "warehouse")
    generate_files(landing, n_files=3, records_per_file=50)
    run_ingest_once(spark, landing, wh, str(tmp_path / "ckpt"))

    server = start_sql_endpoint(spark, SF_DIR, row_cap=5000, logs_dir=wh)
    host, port = server.server_address
    base = f"http://{host}:{port}"
    try:
        with urllib.request.urlopen(f"{base}/panels/q5_timeseries?interval=30") as r:
            got = json.loads(r.read())
        logs = spark.read.parquet(wh)
        want = facade.q5_timeseries(logs, interval_seconds=30).collect()
        assert got["columns"] == ["t", "series", "value"]
        assert got["row_count"] == len(want)
        assert sorted(r_[2] for r_ in got["rows"]) == sorted(r_["value"] for r_ in want)
        with urllib.request.urlopen(f"{base}/panels/q6_log_panel?limit=25") as r:
            q6 = json.loads(r.read())
        assert q6["row_count"] == 25
        assert q6["columns"] == [
            "log_time", "message", "service_name", "scope_name", "severity_text",
        ]
        code, err = _post_err(base, "/query", {"sql": "DELETE FROM lineitem"})
        assert code == 400
        try:
            urllib.request.urlopen(f"{base}/panels/nope")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()


def test_panels_without_logs_dir_rejected(endpoint):
    try:
        urllib.request.urlopen(endpoint + "/panels/q5_timeseries")
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "warehouse" in json.loads(e.read())["error"]
    else:
        raise AssertionError("expected 400")


def test_run_catalog_query_by_name(endpoint, spark):
    from demo_otel_parquet_antalya_spark.plans import QUERIES

    got = _post(endpoint, "/run/agg_multikey_counts", {})
    want = QUERIES["agg_multikey_counts"].build(spark, SF_DIR).count()
    assert got["row_count"] == want
    code, err = _post_err(endpoint, "/run/no_such_query", {})
    assert code == 404
