"""Every registry query with an oracle must hash-match DuckDB (mirrors the
driver's t2 gate). Runs at sf0.001 for speed; the driver reruns at sf0.01."""

from __future__ import annotations

import pytest

from demo_otel_parquet_antalya_spark.plans import QUERIES
from tests.oracle import compare, duckdb_connection

ORACLE_QUERIES = [name for name, spec in QUERIES.items() if spec.oracle is not None]
ROWS_ONLY_QUERIES = [name for name, spec in QUERIES.items() if spec.oracle is None]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, sf_dir, con, name):
    spec = QUERIES[name]
    ok, msg = compare(spec.build(spark, sf_dir), con, spec.oracle)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, sf_dir, name):
    spec = QUERIES[name]
    df = spec.build(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
