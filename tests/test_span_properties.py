"""Property-based tests (hypothesis) for the mixed-grain span machinery:
for ANY set of fine buckets, ANY aligned boundary and ANY grain pair, the
spanned union re-aggregated at a coarse multiple must equal direct
aggregation of the fine snapshot — the exactness claim every serving
route in the r12/r13 layout rests on. Random inputs hunt the edge the
hand-written fixtures miss (empty sides, pre-epoch buckets, boundary at
either extreme, duplicate dims)."""

from __future__ import annotations

import datetime

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

# grains: fine 30 s, coarse 300 s (the production shapes)
FINE, COARSE = 30, 300
BASE = 1_700_000_000 - (1_700_000_000 % 300)

_buckets = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=200),  # fine-bucket index (pre-BASE too)
        st.sampled_from(["click", "view", "buy"]),
        st.integers(min_value=1, max_value=9),
    ),
    min_size=0,
    max_size=40,
)
_boundary_ix = st.integers(min_value=-6, max_value=25)  # coarse-bucket index


def _frame(spark, rows):
    data = [
        (datetime.datetime.fromtimestamp(
            BASE + ix * FINE, datetime.timezone.utc
        ).replace(tzinfo=None), et, n)
        for ix, et, n in rows
    ]
    df = spark.createDataFrame(
        data, "bucket timestamp, event_type string, n long"
    )
    # collapse duplicate (bucket, dim) rows like a real snapshot
    return df.groupBy("bucket", "event_type").agg(
        F.sum("n").cast("long").alias("n")
    )


@settings(max_examples=15, deadline=None)
@given(rows=_buckets, b_ix=_boundary_ix)
def test_span_plus_rebucket_equals_direct(spark, rows, b_ix):
    from demo_otel_parquet_antalya_spark.streaming.rollup import (
        _coarsen,
        span_snapshots,
    )

    fine = _frame(spark, rows)
    boundary_epoch = BASE + b_ix * COARSE
    coarse = _coarsen(
        fine.filter(F.unix_timestamp("bucket") < boundary_epoch),
        FINE, COARSE, ("event_type",),
    )
    spanned = span_snapshots(fine, coarse, boundary_epoch, FINE, COARSE)

    # totals per dimension (the q3 shape)
    got = {
        (r.event_type, r.n)
        for r in spanned.groupBy("event_type").agg(F.sum("n").alias("n")).collect()
    }
    want = {
        (r.event_type, r.n)
        for r in fine.groupBy("event_type").agg(F.sum("n").alias("n")).collect()
    }
    assert got == want

    # re-bucketed at a coarse multiple (the q5 shape), floor semantics
    # across pre-epoch buckets included
    rb = F.timestamp_seconds(
        F.floor(F.unix_timestamp("bucket") / 900).cast("long") * 900
    )
    got5 = {
        (str(r.b), r.event_type, r.n)
        for r in spanned.groupBy(rb.alias("b"), "event_type")
        .agg(F.sum("n").alias("n")).collect()
    }
    want5 = {
        (str(r.b), r.event_type, r.n)
        for r in fine.groupBy(rb.alias("b"), "event_type")
        .agg(F.sum("n").alias("n")).collect()
    }
    assert got5 == want5
