"""Physical-plan audit: the operator-docstring scale claims, measurable.

``plan_audit(df)`` reduces a DataFrame's formatted physical plan to the
handful of numbers that decide whether it survives a 100x scale-up —
join strategies, exchange count, Python evaluation nodes, scan pushdown,
whole-stage-codegen coverage. ``tests/test_plan_quality.py`` asserts these
properties query by query; this module is the same analysis as a library
(usable in notebooks / CI on user queries), and ``audit_registry`` renders
the evidence table committed as ``PLANS.md``.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def _formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_audit(df: DataFrame) -> dict:
    """Summarize the physical plan into scale-relevant counters."""
    plan = _formatted_plan(df)
    n = lambda pat: len(re.findall(pat, plan))
    return {
        "scans": n(r"\(\d+\) Scan parquet"),
        "scans_vectorized": n(r"Batched: true"),
        "scans_with_pushdown": n(r"PushedFilters: \[[^\]]"),
        "broadcast_hash_joins": n(r"\(\d+\) BroadcastHashJoin"),
        "sort_merge_joins": n(r"\(\d+\) SortMergeJoin"),
        "nested_loop_joins": n(r"\(\d+\) BroadcastNestedLoopJoin"),
        "cartesian_products": n(r"\(\d+\) CartesianProduct"),
        "exchanges": n(r"\(\d+\) Exchange"),
        "take_ordered_topk": n(r"\(\d+\) TakeOrderedAndProject"),
        "python_eval_nodes": n(r"EvalPython"),
        "windows": n(r"\(\d+\) Window"),
    }


def audit_registry(spark, sf_dir: str, names: list[str]) -> str:
    """Markdown evidence table for the named registry queries."""
    from demo_otel_parquet_antalya_spark.plans import QUERIES

    cols = [
        ("scans", "scans"),
        ("scans_with_pushdown", "pushdown"),
        ("broadcast_hash_joins", "BHJ"),
        ("sort_merge_joins", "SMJ"),
        ("nested_loop_joins", "BNLJ"),
        ("cartesian_products", "cartesian"),
        ("exchanges", "exchanges"),
        ("take_ordered_topk", "top-k"),
        ("python_eval_nodes", "pyeval"),
    ]
    lines = [
        "| query | " + " | ".join(h for _, h in cols) + " |",
        "|" + "---|" * (len(cols) + 1),
    ]
    for name in names:
        a = plan_audit(QUERIES[name].build(spark, sf_dir))
        lines.append(
            f"| `{name}` | " + " | ".join(str(a[k]) for k, _ in cols) + " |"
        )
    return "\n".join(lines)
