"""Bucketed-table layout: pre-shuffled storage for co-located joins.

The reference joins only broadcast-sized dimensions, so it never needs
this; at 100 TB the fact-to-fact joins (orders x lineitem, events x
sessions) dominate, and re-shuffling both sides per query is the
bottleneck. Writing both tables bucketed by the join key with the SAME
bucket count makes every subsequent equi-join on that key shuffle-free:
the scan exposes the bucketing as a hash partitioning and Catalyst elides
both Exchanges (asserted in tests/test_plan_quality.py).

Bucket-count sizing: buckets x maxPartitionBytes should cover the table's
working set — 1024 buckets for a 1 TB table keeps ~1 GB per bucket file
set. Bucket pruning applies on equality filters over the bucket key, so
point lookups read 1/buckets of the data.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed (and optionally sorted)
    by ``keys``. ``table`` may be db-qualified; the db controls location.

    Sorting within buckets additionally lets sort-merge joins skip their
    sort step and makes min/max row-group pruning effective on the sort
    key.
    """
    w = df.write.mode(mode).format("parquet").bucketBy(buckets, *keys)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join_ready(spark: SparkSession, left: str, right: str) -> bool:
    """True if both tables report bucketing specs with equal bucket counts
    on their join columns (the precondition for exchange-free joins)."""

    def spec(t):
        rows = spark.sql(f"DESCRIBE EXTENDED {t}").collect()
        kv = {r.col_name: r.data_type for r in rows}
        return kv.get("Num Buckets"), kv.get("Bucket Columns")

    (nl, cl), (nr, cr) = spec(left), spec(right)
    return nl is not None and nl == nr and cl is not None and cr is not None
