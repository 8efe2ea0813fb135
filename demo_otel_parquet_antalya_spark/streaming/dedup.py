"""Streaming record-level deduplication.

The reference's delivery contract is at-least-once with FILE-level
idempotence (state file + --skip-duplicates, reference
scripts/sync-logs.sh:44-49, README.md:170) — duplicate RECORDS from
collector retries still land twice. This extension upgrades the contract to
record-level exactly-once inside a watermark horizon using Spark's native
streaming dropDuplicates: state holds one key per record within the
watermark and is reaped as event time advances, so state size is bounded by
(ingest rate × horizon), not total history.

Key choice: an explicit id column when the source provides one (OTLP
trace_id+span_id+timestamp), else a content hash of the canonical columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: columns that uniquely identify an OTLP log record for retry-dedup
DEFAULT_KEY_COLS = ["timestamp", "trace_id", "span_id", "body"]


def with_record_key(logs: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """Add a deterministic 128-bit record key (md5 of the identifying
    columns) — collision-safe at any realistic volume, and stable across
    retries because it derives only from record content."""
    cols = key_cols or DEFAULT_KEY_COLS
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]
    return logs.withColumn("__record_key", F.md5(F.concat_ws("\x1f", *parts)))


def dedup_stream(
    logs: DataFrame,
    watermark_delay: str = "10 minutes",
    ts_col: str = "timestamp",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Drop duplicate records within the watermark horizon.

    Records whose key was already seen (and whose event time is inside the
    horizon) are filtered; a duplicate arriving later than the horizon is
    passed through — the same bounded-memory trade every streaming dedup
    makes. Place this between ``flatten_otlp`` and the partitioned sink.
    """
    keyed = with_record_key(logs.withWatermark(ts_col, watermark_delay), key_cols)
    return keyed.dropDuplicatesWithinWatermark(["__record_key"]).drop("__record_key")
