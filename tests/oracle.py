"""DuckDB-oracle comparison harness mirroring the driver's t2 check.

Both sides produce pandas frames; columns are sorted by name, rows sorted by
all columns, values normalized (timestamps -> isoformat strings, floats left
as-is since both sides ROUND in-query), then compared exactly.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from demo_otel_parquet_antalya_spark.schema import TESTDATA_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        norm = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                norm.append(None)
            elif isinstance(v, pd.Timestamp):
                norm.append(v.isoformat())
            elif hasattr(v, "isoformat"):
                norm.append(v.isoformat())
            elif isinstance(v, float):
                norm.append(round(v, 9))
            else:
                norm.append(v)
        rows.append(tuple(norm))
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def _dtype_kind(dtype) -> str:
    """Collapse pandas dtype kinds into the classes the driver's typed value
    hash distinguishes: integer ('i', includes unsigned), float ('f'),
    boolean ('b'), datetime ('M'), everything else object-like ('O').

    This is what caught the r4 `select_token_budget` red row: DuckDB's
    HUGEINT (from an uncast window SUM over BIGINT) fetches as float64 while
    Spark emits int64 — values equal under Python ==, hashes differ. The
    local harness must be exactly as strict as the driver (VERDICT r4 #1).
    """
    k = dtype.kind
    if k == "u":
        return "i"
    if k in ("i", "f", "b", "M"):
        return k
    return "O"


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    actual = spark_df.toPandas()
    expected = con.sql(sql).df()
    if sorted(actual.columns) != sorted(expected.columns):
        return False, f"column mismatch: spark={sorted(actual.columns)} oracle={sorted(expected.columns)}"
    kind_mismatch = [
        (c, actual[c].dtype, expected[c].dtype)
        for c in actual.columns
        if _dtype_kind(actual[c].dtype) != _dtype_kind(expected[c].dtype)
    ]
    if kind_mismatch:
        detail = "; ".join(
            f"{c}: spark={a} oracle={e}" for c, a, e in kind_mismatch
        )
        return False, f"dtype kind mismatch (driver hash would differ): {detail}"
    if len(actual) != len(expected):
        return False, f"row count mismatch: spark={len(actual)} oracle={len(expected)}"
    a, e = _normalize(actual), _normalize(expected)
    for i, (ra, re) in enumerate(zip(a, e)):
        if ra != re:
            return False, f"row {i} mismatch:\n  spark : {ra}\n  oracle: {re}"
    return True, "ok"
