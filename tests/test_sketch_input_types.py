"""Sketch-aggregate INPUT-TYPE contracts (r14, VERDICT r13 #4).

The r13 KLL crash (integer value columns at stream runtime, fixed by a
cast in commit 8c5b677) was one instance of a class: datasketches
aggregates hard-reject whole families of input types at ANALYSIS time,
so an engine-composed call site that forwards a USER-CHOSEN column type
crashes the maintenance stream on first batch. This module (a) PINS the
probed accept/reject matrix of every sketch aggregate the engine calls
through ``F.expr`` — a Spark upgrade that shifts the matrix fails here,
not in a production stream — and (b) proves the engine's own composed
sites (``_sketch_batch``'s user/value columns, ``_m4_batch``'s value
column) normalize the rejected types instead of forwarding them.

Call-site audit (the sweep itself): ``hll_union_agg`` /
``kll_merge_agg_double`` consume BINARY states the engine itself wrote —
no user type reaches them; ``theta_*`` and ``approx_top_k*`` appear only
in registry queries over fixed testdata columns (bigint/string), both
accepted; the two sites where a caller's column type flows into a
sketch aggregate are ``incremental_sketches``' ``user_col``/``value_col``
and ``incremental_m4``'s ``value_col`` — all three normalized below.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

# per-aggregate accepted input matrix, probed on this Spark build
# (pyspark 4.1): True = analyzes and runs, False = DATATYPE_MISMATCH
_MATRIX = {
    # (agg template, {type: accepted})
    "hll_sketch_agg": (
        "hll_sketch_estimate(hll_sketch_agg({c}))",
        {
            "tinyint": False, "smallint": False, "int": True,
            "bigint": True, "float": False, "double": False,
            "decimal(10,2)": False, "string": True,
        },
    ),
    "theta_sketch_agg": (
        "theta_sketch_estimate(theta_sketch_agg({c}))",
        {
            "tinyint": False, "smallint": False, "int": True,
            "bigint": True, "float": True, "double": True,
            "decimal(10,2)": False, "string": True,
        },
    ),
    "kll_sketch_agg_double": (
        "kll_sketch_get_quantile_double(kll_sketch_agg_double({c}, 256), 0.5)",
        {
            "tinyint": False, "smallint": False, "int": False,
            "bigint": False, "float": True, "double": True,
            "decimal(10,2)": False, "string": False,
        },
    ),
    "approx_top_k": (
        "approx_top_k({c}, 3)",
        {
            "tinyint": True, "smallint": True, "int": True,
            "bigint": True, "float": True, "double": True,
            "decimal(10,2)": True, "string": True,
        },
    ),
}


@pytest.fixture(scope="module")
def typed(spark):
    names = list(_MATRIX["hll_sketch_agg"][1])
    return (
        spark.range(50).select(
            *[F.col("id").cast(t).alias(t.replace("(10,2)", "")) for t in names]
        ),
        names,
    )


@pytest.mark.parametrize("agg", sorted(_MATRIX))
def test_aggregate_input_matrix_is_pinned(spark, typed, agg):
    df, names = typed
    tpl, accepts = _MATRIX[agg]
    for t in names:
        col = t.replace("(10,2)", "")
        if accepts[t]:
            df.agg(F.expr(tpl.format(c=col))).collect()
        else:
            with pytest.raises(Exception, match="DATATYPE_MISMATCH"):
                df.agg(F.expr(tpl.format(c=col))).collect()


def test_sketch_batch_normalizes_every_user_and_value_type(spark):
    """The maintenance stream's per-batch sketch aggregate must accept
    ANY reasonable user/value column type: narrow integrals widen to INT
    for the HLL (lossless), accepted types pass through UNCHANGED (the
    hash domain of committed states must not move), the rest go through
    their canonical string form (injective per distinct value — distinct
    counts preserved); values widen to double (the r13 KLL rule)."""
    from demo_otel_parquet_antalya_spark.streaming.sketches import (
        _sketch_batch,
        sketch_estimates,
    )

    base = spark.range(60).select(
        F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("ts"),
        (F.col("id") % 7).alias("u"),
        (F.col("id") % 13).alias("v"),
    )
    for ut in ("tinyint", "smallint", "int", "bigint", "float", "double",
               "decimal(10,2)", "string"):
        for vt in ("tinyint", "int", "bigint", "float", "double",
                   "decimal(10,2)"):
            df = base.select(
                "ts",
                F.col("u").cast(ut).alias("user_id"),
                F.col("v").cast(vt).alias("value"),
            )
            states = _sketch_batch(df, "ts", "user_id", "value")
            row = sketch_estimates(states).collect()[0]
            # 7 distinct users, exact at this cardinality; p50 of 0..12
            assert row.approx_users == 7, (ut, vt, row)
            assert 4.0 <= row.p50 <= 8.0, (ut, vt, row)


def test_hll_accepted_types_pass_through_unchanged(spark):
    """A BIGINT user column must reach hll_sketch_agg UNCAST: the sketch
    hash of long 5 differs from string '5', and committed states from
    existing deployments were built on the raw column — a blanket cast
    would silently double-count every user after an engine upgrade.
    Proven by merging a raw-built state with a _sketch_batch state over
    the same users: distinct count stays at the true cardinality."""
    from demo_otel_parquet_antalya_spark.streaming.sketches import (
        _sketch_batch,
        sketch_estimates,
    )

    df = spark.range(40).select(
        F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("ts"),
        (F.col("id") % 5).alias("user_id"),
        F.col("id").cast("double").alias("value"),
    )
    ours = _sketch_batch(df, "ts", "user_id", "value")
    raw = df.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.expr("hll_sketch_agg(user_id)").alias("hll"),
        F.expr("kll_sketch_agg_double(value, 256)").alias("kll"),
    )
    merged = ours.unionByName(raw).groupBy("hour").agg(
        F.expr("hll_union_agg(hll)").alias("hll"),
        F.expr("kll_merge_agg_double(kll, 256)").alias("kll"),
    )
    assert sketch_estimates(merged).collect()[0].approx_users == 5


def test_m4_batch_int_value_commits_double_schema(spark, tmp_path):
    """_m4_batch casts the value column to double at sketch time (the
    M4_SCHEMA contract): an integer value column must produce a snapshot
    whose parquet value columns ARE double, not int32 parquet that every
    reader widens on trust."""
    from demo_otel_parquet_antalya_spark.streaming.sketches import _m4_batch

    df = spark.range(30).select(
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 60).alias("ts"),
        F.col("id").alias("event_id"),
        (F.col("id") % 9).cast("int").alias("value"),
    )
    out = _m4_batch(df, "ts", "event_id", "value")
    types = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    for c in ("v_first", "v_min", "v_max", "v_last"):
        assert types[c] == "double", types
    p = str(tmp_path / "m4_int")
    out.write.parquet(p)
    back = {f.name: f.dataType.simpleString() for f in spark.read.parquet(p).schema.fields}
    for c in ("v_first", "v_min", "v_max", "v_last"):
        assert back[c] == "double", back
