"""Stream-stream interval join with watermark-bounded state.

The reference correlates signals only at query time over landed parquet
(batch join); this is the continuous counterpart — ENGINE EXTENSION per
SURVEY.md §2.A notes: join two live event streams (e.g. clicks to the
views that preceded them) without unbounded buffering.

Both sides carry watermarks and the join predicate bounds event time
(``view.ts <= click.ts <= view.ts + max_delay``), so Spark derives state
retention for BOTH sides: a buffered view row is dropped once the click
watermark passes ``view.ts + max_delay``; buffered clicks once the view
watermark passes ``click.ts``. State is bounded by traffic within the
delay window — the 100 TB requirement for any stream-stream join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay_seconds: int = 300,
    watermark_delay: str = "30 seconds",
) -> DataFrame:
    """Join right-stream rows to left-stream rows of the same key where the
    left event lands in ``[right_ts, right_ts + max_delay_seconds]``.

    Output columns: key, l_ts, r_ts, plus passthrough ``l_`` / ``r_``
    prefixed value columns. Works identically on batch DataFrames (minus
    watermarks), which the equivalence test exploits.
    """
    is_streaming = left.isStreaming
    l = left.select(
        F.col(key_col).alias("k"),
        F.col(left_ts).alias("l_ts"),
        *[F.col(c).alias(f"l_{c}") for c in left.columns if c not in (key_col, left_ts)],
    )
    r = right.select(
        F.col(key_col).alias("rk"),
        F.col(right_ts).alias("r_ts"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c not in (key_col, right_ts)],
    )
    if is_streaming:
        l = l.withWatermark("l_ts", "30 seconds" if watermark_delay is None else watermark_delay)
        r = r.withWatermark("r_ts", "30 seconds" if watermark_delay is None else watermark_delay)
    cond = (
        (F.col("k") == F.col("rk"))
        & (F.col("l_ts") >= F.col("r_ts"))
        & (F.col("l_ts") <= F.col("r_ts") + F.expr(f"INTERVAL {max_delay_seconds} SECONDS"))
    )
    return l.join(r, cond).drop("rk")


def interval_join_streams_outer(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay_seconds: int = 300,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """LEFT OUTER variant: every left row eventually emits — matched rows as
    they join, unmatched rows with NULL right columns once the watermark
    proves no match can still arrive (left_ts + max_delay < right-side
    watermark). The audit shape: "every click, with its view if any" —
    unmatched rows surface instead of silently disappearing, and state for
    them is reclaimed at the same watermark that released them.
    """
    is_streaming = left.isStreaming
    l = left.select(
        F.col(key_col).alias("k"),
        F.col(left_ts).alias("l_ts"),
        *[F.col(c).alias(f"l_{c}") for c in left.columns if c not in (key_col, left_ts)],
    )
    r = right.select(
        F.col(key_col).alias("rk"),
        F.col(right_ts).alias("r_ts"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c not in (key_col, right_ts)],
    )
    if is_streaming:
        l = l.withWatermark("l_ts", watermark_delay)
        r = r.withWatermark("r_ts", watermark_delay)
    cond = (
        (F.col("k") == F.col("rk"))
        & (F.col("l_ts") >= F.col("r_ts"))
        & (F.col("l_ts") <= F.col("r_ts") + F.expr(f"INTERVAL {max_delay_seconds} SECONDS"))
    )
    return l.join(r, cond, "left_outer").drop("rk")


def enrich_with_dimension(
    stream: DataFrame,
    dim: DataFrame,
    key_col: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static dimension enrichment: join a live stream to a bounded
    dimension table (the lookup-table pattern — user -> account tier,
    service -> team, host -> rack).

    The static side is broadcast once per micro-batch executor-side — no
    stream state, no shuffle of the stream; at 1000 executors the dimension
    ships as one broadcast, and updating it is re-reading the static frame
    (Spark re-plans the static side every micro-batch for file sources).
    Works identically on a batch frame, which the equivalence test uses.
    """
    return stream.join(F.broadcast(dim), key_col, how)
