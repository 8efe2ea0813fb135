"""Log-template mining: masking-rule behavior and template grouping."""

from __future__ import annotations

from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.functions import text as tx


def _mask(spark, messages):
    df = spark.createDataFrame([(m,) for m in messages], "msg string")
    return [r.t for r in df.select(tx.log_template("msg").alias("t")).collect()]


def test_masks_each_variable_kind(spark):
    got = _mask(
        spark,
        [
            "request 550e8400-e29b-41d4-a716-446655440000 finished",
            "pointer 0xDEADbeef freed",
            "conn from 10.42.0.17 dropped",
            "took 1503ms retry -2 ratio 0.75",
        ],
    )
    assert got == [
        "request <UUID> finished",
        "pointer <HEX> freed",
        "conn from <IP> dropped",
        "took <NUM>ms retry <NUM> ratio <NUM>",
    ]


def test_specificity_order(spark):
    """A UUID must not degrade into <NUM>/<HEX> fragments, an IP not into
    four <NUM>s — the mask chain is ordered most-specific first."""
    (got,) = _mask(
        spark, ["id=123e4567-e89b-12d3-a456-426614174000 ip=192.168.1.1 n=7"]
    )
    assert got == "id=<UUID> ip=<IP> n=<NUM>"


def test_template_grouping_collapses_variants(spark):
    msgs = [f"GET /api/user/{i} took {i * 3}ms from 10.0.0.{i}" for i in range(50)]
    df = spark.createDataFrame([(m,) for m in msgs], "msg string")
    out = (
        df.select(tx.log_template("msg").alias("template"))
        .groupBy("template")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert len(out) == 1
    assert out[0].template == "GET /api/user/<NUM> took <NUM>ms from <IP>"
    assert out[0].n == 50


def test_sql_twin_matches_spark(spark):
    """template_masks_sql applies the identical chain in DuckDB."""
    import duckdb

    msgs = [
        "err 0xFF at 10.1.2.3 uuid 550e8400-e29b-41d4-a716-446655440000 n -3.5",
        "plain text with no variables at all",
    ]
    spark_side = _mask(spark, msgs)
    con = duckdb.connect()
    con.execute("CREATE TABLE m(msg VARCHAR)")
    con.executemany("INSERT INTO m VALUES (?)", [(m,) for m in msgs])
    duck_side = [
        r[0]
        for r in con.sql(
            f"SELECT {tx.template_masks_sql('msg')} FROM m"
        ).fetchall()
    ]
    assert spark_side == duck_side


def test_null_and_empty_messages_are_safe(spark):
    """NULL messages stay NULL (grouped as one catalog row, never a crash);
    empty strings mask to empty templates."""
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "ok 5ms"), (4, None)],
        "id long, msg string",
    )
    out = {
        r.template: r.n
        for r in df.select(tx.log_template("msg").alias("template"))
        .groupBy("template")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert out == {None: 2, "": 1, "ok <NUM>ms": 1}
