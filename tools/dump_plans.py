#!/usr/bin/env python
"""Dump .explain("formatted") for named queries to plans/<tag>/<query>_<suffix>.txt.

Usage: python tools/dump_plans.py --tag r14 --suffix before QUERY [QUERY...]

Note: queries with eager localCheckpoint rounds EXECUTE those rounds at
build time; the dumped plan is the final segment above the last
checkpoint — exactly what the driver-visible plan is. The structural
job/stage/shuffle evidence for the full chain lives in
tools/query_metrics.py output.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from demo_otel_parquet_antalya_spark.plans import QUERIES  # noqa: E402
from demo_otel_parquet_antalya_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--tag", default="r14")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump_plans")
    for name in args.queries:
        df = QUERIES[name].build(spark, args.sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(path, flush=True)


if __name__ == "__main__":
    main()
