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

String-level rewriting is deliberate: these are macro expansions (Grafana
does the same client-side), not semantics — Catalyst still parses, analyzes
and optimizes the result as first-class Spark SQL.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_TRUNC_UNIT = {0: "second", 3: "millisecond", 6: "microsecond"}


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

    return q


def sql(spark: SparkSession, query: str, **kwargs) -> DataFrame:
    """Translate + execute a reference-dialect query (the logs view must be
    registered, e.g. via ``sources.registry.LogTableRegistry.register_view``)."""
    return spark.sql(translate(query, **kwargs))
