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


def test_run_catalog_query_by_name(endpoint, spark):
    from demo_otel_parquet_antalya_spark.plans import QUERIES

    got = _post(endpoint, "/run/agg_multikey_counts", {})
    want = QUERIES["agg_multikey_counts"].build(spark, SF_DIR).count()
    assert got["row_count"] == want
    code, err = _post_err(endpoint, "/run/no_such_query", {})
    assert code == 404
