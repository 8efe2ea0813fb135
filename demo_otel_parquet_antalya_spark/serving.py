"""SQL-over-HTTP serving surface: a long-running read-only endpoint that
answers dashboard-sized queries from a live SparkSession.

Re-expresses the reference's dashboard-facing query path (SURVEY.md §2.A
A14; the reference wires Grafana straight at ClickHouse,
docker-compose.yaml:133-145) as the thinnest Spark-native equivalent: a
stdlib ``ThreadingHTTPServer`` (the same idiom as the OTLP receiver,
streaming/receiver.py) that registers the warehouse tables as temp views
and serves

    GET  /health            -> {"status": "ok", "tables": [...]}
    GET  /queries           -> the registered query catalog (name -> doc)
    POST /query             -> {"sql": "SELECT ..."} run against the views
    POST /run/<name>        -> run a catalog query by name (plans.QUERIES)
    GET  /panels/<name>     -> the reference's Grafana panel queries
                               (plans/facade.py q1..q6) over an ingested
                               logs warehouse; ?start=&end=&interval=&limit=

Responses are JSON ``{"columns": [...], "rows": [[...]], "row_count": N,
"truncated": bool}`` with timestamps/dates ISO-formatted, Decimals
stringified, and binary base64-encoded.

Design notes (scale + safety):
- READ-ONLY by construction: the statement must start with
  SELECT/WITH/VALUES/SHOW/DESCRIBE/EXPLAIN and, after string literals are
  stripped, must contain no mutation keyword (INSERT/UPDATE/DELETE/MERGE/
  DROP/CREATE/ALTER/TRUNCATE). Defense-in-depth for a trusted-network
  dashboard port — not an auth boundary; put real authn/z in front of it
  exactly as the reference fronts ClickHouse with Grafana's auth.
- ROW-CAPPED: every result is fetched through ``.limit(cap + 1)`` (default
  10k, per-request override DOWNWARD only), so a SELECT * over 100 TB
  costs one partition-ish of work under Spark's incremental collect, never
  a driver OOM; ``truncated`` tells the client the cap bit.
- The session is shared and thread-safe; concurrent requests become
  concurrent Spark jobs scheduled FIFO (or FAIR if the session is so
  configured). Dashboard panels are sub-second shapes (BENCH_r*.json);
  heavy analytics belong in batch jobs, not behind this port.
- Stateless: run N replicas behind a balancer against the same warehouse,
  like the receiver. Nothing is cached server-side beyond Spark's own
  relation memoization (plans/tables.py).
"""

from __future__ import annotations

import base64
import datetime
import decimal
import json
import math
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession

from demo_otel_parquet_antalya_spark.plans.tables import load_table
from demo_otel_parquet_antalya_spark.schema import TESTDATA_TABLES

DEFAULT_ROW_CAP = 10_000

_ALLOWED_HEADS = ("select", "with", "values", "show", "describe", "explain")
_MUTATORS = re.compile(
    r"\b(insert|update|delete|merge|drop|create|alter|truncate)\b", re.IGNORECASE
)
_STRING_LITERAL = re.compile(r"'(?:[^']|'')*'")


def _reject_reason(sql: str) -> str | None:
    head = sql.lstrip().split(None, 1)
    if not head:
        return "empty statement"
    if head[0].lower() not in _ALLOWED_HEADS:
        return f"read-only endpoint: statement must start with one of {_ALLOWED_HEADS}"
    if _MUTATORS.search(_STRING_LITERAL.sub("''", sql)):
        return "read-only endpoint: mutation keywords are not allowed"
    return None


def _jsonable(v):
    if v is None or isinstance(v, (bool, int, str)):
        return v
    if isinstance(v, float):
        return None if math.isnan(v) else v
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode("ascii")
    if isinstance(v, dict):
        return {str(k): _jsonable(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    if hasattr(v, "asDict"):  # Row / struct
        return {k: _jsonable(x) for k, x in v.asDict().items()}
    return str(v)


def _df_payload(df, cap: int) -> dict:
    rows = df.limit(cap + 1).collect()
    truncated = len(rows) > cap
    rows = rows[:cap]
    return {
        "columns": df.columns,
        "rows": [[_jsonable(v) for v in row] for row in rows],
        "row_count": len(rows),
        "truncated": truncated,
    }


def _panel_frame(logs, name: str, params: dict):
    """Dispatch to the reference's dashboard queries (plans/facade.py)."""
    from demo_otel_parquet_antalya_spark.plans import facade

    start = params.get("start")
    end = params.get("end")
    if name == "q1_projection":
        return facade.q1_projection(logs)
    if name == "q2_recent_logs":
        return facade.q2_recent_logs(logs, limit=int(params.get("limit", 10)))
    if name == "q3_severity_counts":
        return facade.q3_severity_counts(logs)
    if name == "q4_select_all":
        return facade.q4_select_all(logs)
    if name == "q5_timeseries":
        return facade.q5_timeseries(
            logs, start, end, interval_seconds=int(params.get("interval", 30))
        )
    if name == "q6_log_panel":
        return facade.q6_log_panel(
            logs, start, end, limit=int(params.get("limit", 1000))
        )
    raise KeyError(name)


class _SQLHandler(BaseHTTPRequestHandler):
    spark: SparkSession
    sf_dir: str
    tables: tuple
    logs_dir: str | None = None
    row_cap: int = DEFAULT_ROW_CAP

    # quiet: the stdlib default logs every request to stderr
    def log_message(self, fmt, *args):  # noqa: D102
        pass

    def _send(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode("utf-8")
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802
        path, _, query = self.path.partition("?")
        path = path.rstrip("/")
        if path == "/health":
            self._send(200, {"status": "ok", "tables": list(self.tables)})
            return
        if path == "/queries":
            from demo_otel_parquet_antalya_spark.plans import QUERIES

            self._send(
                200,
                {name: (spec.doc or "").split(". ")[0] for name, spec in QUERIES.items()},
            )
            return
        if path.startswith("/panels/"):
            if self.logs_dir is None:
                self._send(400, {"error": "no logs warehouse configured"})
                return
            import urllib.parse

            params = {k: v[0] for k, v in urllib.parse.parse_qs(query).items()}
            try:
                logs = self.spark.read.parquet(self.logs_dir)
                frame = _panel_frame(logs, path[len("/panels/") :], params)
                self._send(200, _df_payload(frame, self.row_cap))
            except KeyError as exc:
                self._send(404, {"error": f"unknown panel {exc}"})
            except Exception as exc:
                self._send(400, {"error": f"{type(exc).__name__}: {exc}"})
            return
        self._send(404, {"error": "unknown path"})

    def do_POST(self):  # noqa: N802
        length = int(self.headers.get("Content-Length", 0))
        raw = self.rfile.read(length) if length else b""
        path = self.path.split("?", 1)[0].rstrip("/")
        try:
            if path == "/query":
                req = json.loads(raw or b"{}")
                sql = req.get("sql", "")
                reason = _reject_reason(sql)
                if reason:
                    self._send(400, {"error": reason})
                    return
                cap = min(int(req.get("limit", self.row_cap)), self.row_cap)
                self._send(200, _df_payload(self.spark.sql(sql), cap))
                return
            if path.startswith("/run/"):
                from demo_otel_parquet_antalya_spark.plans import QUERIES

                name = path[len("/run/") :]
                spec = QUERIES.get(name)
                if spec is None:
                    self._send(404, {"error": f"unknown query {name!r}"})
                    return
                self._send(
                    200, _df_payload(spec.build(self.spark, self.sf_dir), self.row_cap)
                )
                return
            self._send(404, {"error": "unknown path"})
        except json.JSONDecodeError:
            self._send(400, {"error": "request body must be JSON"})
        except Exception as exc:  # AnalysisException etc. -> client error
            self._send(400, {"error": f"{type(exc).__name__}: {exc}"})


def start_sql_endpoint(
    spark: SparkSession,
    sf_dir: str,
    host: str = "127.0.0.1",
    port: int = 0,
    tables: tuple = TESTDATA_TABLES,
    row_cap: int = DEFAULT_ROW_CAP,
    logs_dir: str | None = None,
) -> ThreadingHTTPServer:
    """Register ``tables`` from ``sf_dir`` as temp views and serve the
    read-only SQL endpoint on (host, port) in a daemon thread. ``port=0``
    binds an ephemeral port (read it back from ``server.server_address``).
    ``logs_dir`` (optional) points at an ingested logs warehouse
    (streaming/ingest.py output) and enables the /panels/* dashboard
    routes. Call ``server.shutdown()`` to stop."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

    handler = type(
        "_BoundSQLHandler",
        (_SQLHandler,),
        {
            "spark": spark,
            "sf_dir": sf_dir,
            "tables": tuple(tables),
            "row_cap": row_cap,
            "logs_dir": logs_dir,
        },
    )
    server = ThreadingHTTPServer((host, port), handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server
