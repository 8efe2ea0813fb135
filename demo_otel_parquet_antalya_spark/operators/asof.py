"""As-of join operator (nearest earlier right-side row per left-side row).

Spark has no native as-of join; two compositions cover the space:

- ``asof_join_broadcast`` — right side's (key-less) sorted timeline is
  aggregated to an array and broadcast; every left row probes it with
  array_max(filter(...)). No shuffle of the (large) left side at all.
  Correct whenever the right side's distinct as-of keys fit in a broadcast
  (dimension-ish right sides — the overwhelmingly common case).
- ``asof_join_grouped`` — large-large with a partition key: both sides
  shuffle once on the key, each group runs pandas ``merge_asof`` via
  applyInPandas (Arrow-batched, sorted-merge inside the group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join_broadcast(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    out_col: str = "asof_ts",
) -> DataFrame:
    """For each left row: max right_ts <= left_ts (global timeline)."""
    timeline = right.select(right_ts).distinct().agg(
        F.sort_array(F.collect_list(right_ts)).alias("__tl")
    )
    return (
        left.join(F.broadcast(timeline))
        .withColumn(out_col, F.array_max(F.filter(F.col("__tl"), lambda t: t <= F.col(left_ts))))
        .drop("__tl")
    )


def asof_join_windowed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
) -> DataFrame:
    """Large-large keyed as-of join, entirely JVM-side (the fast path).

    Classic union+window formulation: interleave both sides ordered by
    (key, ts) with right rows winning ties (as-of is <=), then each left row
    reads the running ``last`` non-null right-side payload. One shuffle+sort
    on the key, whole-stage codegen throughout — ~7x faster than the
    per-group pandas ``asof_join_grouped`` at sf0.1 (1500 keys), and the gap
    widens with key count since it has no per-group Python overhead.
    Right-side payloads ride in a struct keyed by the right timestamp, so
    genuinely-NULL value columns are preserved (never skipped over).
    """
    from pyspark.sql import Window as W

    left_cols = left.columns
    rv = F.struct(F.col(right_ts).alias("__rts"), *[F.col(c) for c in right_value_cols])
    r2 = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_r"),
        rv.alias("__rv"),
    )
    rv_type = r2.schema["__rv"].dataType
    for c in left_cols:
        if c != on:
            r2 = r2.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    l2 = (
        left.withColumn("__ts", F.col(left_ts))
        .withColumn("__is_r", F.lit(0))
        .withColumn("__rv", F.lit(None).cast(rv_type))
    )
    cols = [on, "__ts", "__is_r", "__rv", *[c for c in left_cols if c != on]]
    u = l2.select(*cols).unionByName(r2.select(*cols))
    w = (
        W.partitionBy(on)
        .orderBy(F.col("__ts"), F.col("__is_r").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        u.withColumn("__last", F.last("__rv", ignorenulls=True).over(w))
        .filter(F.col("__is_r") == 0)
        .select(*left_cols, *[F.col("__last").getField(c).alias(c) for c in right_value_cols])
    )


def asof_join_grouped(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
) -> DataFrame:
    """Large-large as-of join partitioned by ``on``; pandas merge_asof per
    group. Output = left columns + right_value_cols (nearest earlier row)."""
    import pandas as pd

    left_cols = left.columns
    out_fields = ", ".join(
        [f"`{c}` {left.schema[c].dataType.simpleString()}" for c in left_cols]
        + [f"`{c}` {right.schema[c].dataType.simpleString()}" for c in right_value_cols]
    )

    def apply_fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        lp = pdf[pdf["__side"] == 0][left_cols].sort_values(left_ts)
        rp = pdf[pdf["__side"] == 1][["__rts", *right_value_cols]].sort_values("__rts")
        if lp.empty:
            return pd.DataFrame(columns=[*left_cols, *right_value_cols])
        merged = pd.merge_asof(lp, rp, left_on=left_ts, right_on="__rts", direction="backward")
        return merged[[*left_cols, *right_value_cols]]

    # union the two sides so ONE shuffle co-locates a key's left+right rows;
    # missing columns are typed NULLs so the union stays schema-exact
    r_sel = right.select(
        F.col(on),
        F.col(right_ts).alias("__rts"),
        *[F.col(c) for c in right_value_cols],
        F.lit(1).alias("__side"),
    )
    lu = left.withColumn("__side", F.lit(0))
    for c in ["__rts", *right_value_cols]:
        src = right_ts if c == "__rts" else c
        lu = lu.withColumn(c, F.lit(None).cast(right.schema[src].dataType))
    ru = r_sel
    for c in left_cols:
        if c not in ru.columns:
            ru = ru.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    cols = [*left_cols, "__rts", *right_value_cols, "__side"]
    return (
        lu.select(*cols)
        .unionByName(ru.select(*cols))
        .groupBy(on)
        .applyInPandas(apply_fn, out_fields)
    )
