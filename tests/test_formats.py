"""Interchange-format matrix: JSONL / CSV / ORC round-trips preserve values
and types; ORC keeps pushdown + pruning; schema discipline is enforced."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.plans.tables import load_table
from demo_otel_parquet_antalya_spark.sources import formats

SF = "/root/testdata/sf0.001"

ORDERS_DDL = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string"
)


def _orders(spark):
    return (
        load_table(spark, SF, "orders")
        .select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority",
        )
        .orderBy("o_orderkey")
        .limit(200)
    )


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("o_orderkey").collect()]


@pytest.mark.parametrize("fmt", ["jsonl", "csv", "orc"])
def test_round_trip_preserves_values_and_types(spark, tmp_path, fmt):
    src = _orders(spark)
    path = str(tmp_path / fmt)
    if fmt == "jsonl":
        formats.write_jsonl(src, path)
        back = formats.read_jsonl(spark, path, ORDERS_DDL)
    elif fmt == "csv":
        formats.write_csv(src, path)
        back = formats.read_csv(spark, path, ORDERS_DDL)
    else:
        formats.write_orc(src, path)
        back = formats.read_orc(spark, path, ORDERS_DDL)
    assert back.schema == src.schema
    assert _sorted_rows(back) == _sorted_rows(src)


def test_readers_refuse_schema_inference(spark, tmp_path):
    src = _orders(spark)
    formats.write_jsonl(src, str(tmp_path / "j"))
    with pytest.raises(ValueError, match="explicit schema required"):
        formats.read_jsonl(spark, str(tmp_path / "j"), None)
    with pytest.raises(ValueError, match="explicit schema required"):
        formats.read_csv(spark, str(tmp_path / "c"), None)


def test_csv_refuses_nested_columns(spark, tmp_path):
    df = spark.createDataFrame([(1, [1, 2])], "id long, xs array<int>")
    with pytest.raises(ValueError, match="nested columns"):
        formats.write_csv(df, str(tmp_path / "bad"))


def test_failfast_surfaces_type_drift(spark, tmp_path):
    """A CSV drop whose column types drifted must fail at the scan, not land
    as silent NULLs (the schema-on-read failure mode at scale)."""
    p = tmp_path / "drift"
    p.mkdir()
    (p / "part.csv").write_text("o_orderkey,o_totalprice\n1,12.5\n2,NOT_A_NUMBER\n")
    bad = formats.read_csv(spark, str(p), "o_orderkey bigint, o_totalprice double")
    with pytest.raises(Exception, match="(?i)malformed|failfast"):
        bad.collect()


def test_orc_scan_keeps_pushdown_and_pruning(spark, tmp_path):
    """ORC must stay a first-class analytics source: the filter reaches the
    scan as a pushed predicate and only referenced columns are read."""
    path = str(tmp_path / "orders_orc")
    formats.write_orc(_orders(spark), path)
    q = (
        formats.read_orc(spark, path, ORDERS_DDL)
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_totalprice")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)" in plan, plan
    assert "o_orderdate" not in plan.split("ReadSchema")[1].splitlines()[0], plan


def test_avro_gated_honestly(spark, tmp_path):
    """Without the spark-avro connector the writer raises the actionable
    error (never a bare ClassNotFound); with it, the round trip runs."""
    src = _orders(spark)
    if formats.avro_available(spark):
        path = str(tmp_path / "avro")
        formats.write_avro(src, path)
        assert _sorted_rows(formats.read_avro(spark, path)) == _sorted_rows(src)
    else:
        with pytest.raises(RuntimeError, match="spark-avro connector"):
            formats.write_avro(src, str(tmp_path / "avro"))


def test_xml_round_trip(spark, tmp_path):
    """Spark 4 built-in XML source: explicit-schema round trip preserves
    values and types; inference is refused like every other reader."""
    src = _orders(spark)
    path = str(tmp_path / "xml")
    formats.write_xml(src, path)
    back = formats.read_xml(spark, path, ORDERS_DDL)
    assert back.schema == src.schema
    assert _sorted_rows(back) == _sorted_rows(src)
    with pytest.raises(ValueError, match="explicit schema required"):
        formats.read_xml(spark, path, None)
