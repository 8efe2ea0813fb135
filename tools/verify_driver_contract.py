#!/usr/bin/env python
"""Drive __spark_entry__ exactly the way the external correctness driver
does: a BARE SparkSession (none of the engine's session configs), every
``queries()`` entry executed at the given scale factor, each oracle-bearing
query compared against its DuckDB ``oracle_sql()`` twin — values
order-insensitively AND pandas dtype kinds (the typed-hash strictness that
caught the round-4 HUGEINT slip).

    python tools/verify_driver_contract.py [--sf-dir /root/testdata/sf0.01]
        [--only PREFIX] [--window-only]

Exit code 0 iff every compared query matches. This is the executable form
of .claude/skills/verify/SKILL.md — run it from anywhere (it inserts the
repo on sys.path itself, which is also what catches cwd assumptions).
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(df):
    df = df[sorted(df.columns)]
    out = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append(None)
            elif hasattr(v, "isoformat"):
                vals.append(str(v.isoformat()))
            elif isinstance(v, float):
                vals.append(round(v, 9))
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda r: tuple((x is None, str(x)) for x in r))


def _kind(dtype) -> str:
    k = dtype.kind
    return "i" if k == "u" else (k if k in ("i", "f", "b", "M") else "O")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None, help="only queries whose name starts with this")
    ap.add_argument("--window-only", action="store_true", help="first 50 registered queries only")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print("ENTRY rows:", len(E.entry(spark).collect()))

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")

    qs, osql = E.queries(), E.oracle_sql()
    names = list(qs)
    if args.window_only:
        names = names[:50]
    if args.only:
        names = [n for n in names if n.startswith(args.only)]

    fails, kind_fails, n_oracle, n_rows_only = [], [], 0, 0
    for name in names:
        sdf = qs[name](spark, args.sf_dir)
        if name not in osql:
            n_rows_only += 1
            sdf.count()
            continue
        n_oracle += 1
        a = sdf.toPandas()
        e = con.sql(osql[name]).df()
        if _norm(a) != _norm(e):
            fails.append(name)
            print(name, "MISMATCH")
            continue
        if sorted(a.columns) != sorted(e.columns) or any(
            _kind(a[c].dtype) != _kind(e[c].dtype) for c in a.columns
        ):
            kind_fails.append(name)
            print(name, "DTYPE-KIND MISMATCH")
    print(f"oracle-compared: {n_oracle}  rows-only: {n_rows_only}")
    print("FAILURES:", fails or "none")
    print("KIND-MISMATCHES:", kind_fails or "none")
    return 1 if (fails or kind_fails) else 0


if __name__ == "__main__":
    raise SystemExit(main())
