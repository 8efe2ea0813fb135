"""ClickHouse-dialect compatibility shim: run the reference's own SQL verbatim.

The reference hands users ClickHouse SQL over ``ice.`otel.logs``
(reference README.md:80-87, AGENTS.md:74-77) and its Grafana panels inject
macros ($table, $timeFilter, $timeSeries — grafana/provisioning/dashboards/
logs.json:123,181). A user switching to this engine should be able to paste
those queries unchanged. ``translate`` rewrites the reference dialect's
surface (exactly the constructs its shipped queries use — not a general
ClickHouse parser) into Spark SQL; ``sql`` executes against a registered
logs view.

Covered constructs, each cited to its use in the reference:

- ``ice.`otel.logs``` / ``$table``  -> the registered view      (README.md:84)
- ``count()``                       -> ``COUNT(*)``             (README.md:123)
- ``toDateTime64(x, p)``            -> ms/µs truncation         (logs.json:181)
- ``$timeFilter``                   -> time range on timestamp  (logs.json:123)
- ``$timeSeries`` (+interval)       -> floor-to-bucket epoch    (logs.json:120-123)
- ``FORMAT Pretty`` suffix          -> stripped (.show() shapes output) (AGENTS.md:76)

Beyond the shipped queries, the reference hands users FULL ClickHouse SQL
for ad-hoc work (reference README.md:80-87) — so the shim also rewrites the
common ad-hoc idioms a ClickHouse user would paste (scope listed in
``_ADHOC_REWRITES``; each is value-tested against native Spark SQL in
tests/test_clickhouse_compat.py). Rewrites are deliberately conservative:
patterns match only simple (non-nested) argument lists and leave anything
else untouched, so a construct outside the scope fails loudly in Catalyst's
parser instead of being silently half-translated.

String-level rewriting is deliberate: these are macro expansions (Grafana
does the same client-side), not semantics — Catalyst still parses, analyzes
and optimizes the result as first-class Spark SQL.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_TRUNC_UNIT = {0: "second", 3: "millisecond", 6: "microsecond"}

# one "simple" argument: no nested parens, no commas
_A = r"([^,()]+)"

# (pattern, replacement) — ClickHouse ad-hoc construct -> Spark SQL
_ADHOC_REWRITES: list[tuple[str, str]] = [
    # time bucketing
    (rf"\btoStartOfMinute\({_A}\)", r"date_trunc('minute', \1)"),
    (rf"\btoStartOfHour\({_A}\)", r"date_trunc('hour', \1)"),
    (rf"\btoStartOfDay\({_A}\)", r"date_trunc('day', \1)"),
    (
        rf"\btoStartOfInterval\({_A},\s*INTERVAL\s+(\d+)\s+second\s*\)",
        r"timestamp_seconds(CAST(floor(unix_timestamp(\1) / \2) * \2 AS BIGINT))",
    ),
    (
        rf"\btoStartOfInterval\({_A},\s*INTERVAL\s+(\d+)\s+minute\s*\)",
        r"timestamp_seconds(CAST(floor(unix_timestamp(\1) / (\2 * 60)) * (\2 * 60) AS BIGINT))",
    ),
    # type conversions
    (rf"\btoDate\({_A}\)", r"to_date(\1)"),
    (rf"\btoDateTime\({_A}\)", r"CAST(\1 AS TIMESTAMP)"),
    (rf"\btoU?Int(?:8|16|32|64)\({_A}\)", r"CAST(\1 AS BIGINT)"),
    (rf"\btoFloat(?:32|64)\({_A}\)", r"CAST(\1 AS DOUBLE)"),
    (rf"\btoString\({_A}\)", r"CAST(\1 AS STRING)"),
    # conditional aggregates (the -If combinators)
    (rf"\bcountIf\(", r"count_if("),
    (rf"\bsumIf\({_A},\s*{_A}\)", r"SUM(IF(\2, \1, NULL))"),
    (rf"\bavgIf\({_A},\s*{_A}\)", r"AVG(IF(\2, \1, NULL))"),
    # distinct-count family
    (rf"\buniqExact\({_A}\)", r"COUNT(DISTINCT \1)"),
    (rf"\buniq(?:Combined|HLL12)?\({_A}\)", r"approx_count_distinct(\1)"),
    # quantile combinators: quantile(p)(x) — x may carry one paren level
    # (it is often itself a rewritten cast)
    (r"\bquantileExact\(([\d.]+)\)\(((?:[^()]|\([^()]*\))+)\)", r"percentile(\2, \1)"),
    (r"\bquantile\(([\d.]+)\)\(((?:[^()]|\([^()]*\))+)\)", r"percentile_approx(\2, \1)"),
    # arrays / strings
    (rf"\bhas\({_A},\s*{_A}\)", r"array_contains(\1, \2)"),
    (rf"\barrayJoin\({_A}\)", r"explode(\1)"),
    (rf"\bposition\({_A},\s*{_A}\)", r"instr(\1, \2)"),  # CH arg order == instr
    (rf"\bnotEmpty\({_A}\)", r"(length(\1) > 0)"),
    (rf"\bempty\({_A}\)", r"(length(\1) = 0)"),
    (rf"\bintDiv\({_A},\s*{_A}\)", r"(\1 DIV \2)"),
    (r"\btoday\(\)", r"current_date()"),
    (rf"\bstartsWith\({_A},\s*{_A}\)", r"startswith(\1, \2)"),
    (rf"\bendsWith\({_A},\s*{_A}\)", r"endswith(\1, \2)"),
]


def translate(
    query: str,
    table: str = "otel_logs",
    time_from: str | None = None,
    time_to: str | None = None,
    interval_seconds: int = 30,
    time_col: str = "timestamp",
) -> str:
    """Reference-dialect SQL -> Spark SQL (see module docstring for scope)."""
    q = query

    # String literals are masked up front and restored at the end: a
    # construct-shaped substring INSIDE a literal (WHERE body LIKE
    # '%count()%') is data, not dialect, and must pass through
    # byte-identical — macros included (stricter than Grafana, which
    # substitutes even inside literals).
    literals: list[str] = []

    def _mask(m: re.Match) -> str:
        literals.append(m.group(0))
        return f"\x00{len(literals) - 1}\x00"

    q = re.sub(r"'(?:[^']|'')*'", _mask, q)

    # FORMAT <name> suffix (ClickHouse output formatting, AGENTS.md:76)
    q = re.sub(r"\s+FORMAT\s+\w+\s*$", "", q, flags=re.IGNORECASE)

    # table references: ice.`otel.logs`, `ice`.`otel.logs`, $table
    q = re.sub(r"(?:`?ice`?\.)?`otel\.logs`", table, q)
    q = q.replace("$table", table)

    # bare count() (ClickHouse spelling, README.md:123)
    q = re.sub(r"\bcount\(\s*\)", "COUNT(*)", q, flags=re.IGNORECASE)

    # toDateTime64(expr, precision) -> date_trunc to the matching precision
    def _to_dt64(m: re.Match) -> str:
        unit = _TRUNC_UNIT.get(int(m.group(2)), "microsecond")
        return f"date_trunc('{unit}', {m.group(1).strip()})"

    q = re.sub(r"toDateTime64\(([^,]+),\s*(\d)\s*\)", _to_dt64, q)

    # Grafana $timeSeries: interval-floored epoch bucket of the time column
    bucket = (
        f"timestamp_seconds(CAST(floor(unix_timestamp({time_col}) / {interval_seconds}) "
        f"* {interval_seconds} AS BIGINT))"
    )
    q = q.replace("$timeSeries", bucket)

    # Grafana $timeFilter: closed range on the time column
    if time_from is not None and time_to is not None:
        tf = f"{time_col} >= TIMESTAMP '{time_from}' AND {time_col} <= TIMESTAMP '{time_to}'"
    else:
        tf = "1=1"
    q = q.replace("$timeFilter", tf)

    # ad-hoc ClickHouse idioms (module docstring; conservative simple-arg
    # patterns, repeated so rewrite outputs containing further constructs —
    # e.g. toDate inside toStartOfDay — converge)
    for _ in range(3):
        prev = q
        for pat, repl in _ADHOC_REWRITES:
            q = re.sub(pat, repl, q)
        if q == prev:
            break
    q = re.sub(r"\x00(\d+)\x00", lambda m: literals[int(m.group(1))], q)

    return q


def sql(spark: SparkSession, query: str, **kwargs) -> DataFrame:
    """Translate + execute a reference-dialect query (the logs view must be
    registered, e.g. via ``sources.registry.LogTableRegistry.register_view``)."""
    return spark.sql(translate(query, **kwargs))
