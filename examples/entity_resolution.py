#!/usr/bin/env python
"""Entity-resolution walkthrough: messy customer records -> golden records.

    python examples/entity_resolution.py

1. blocking: deletion-neighborhood edit-distance join (exact, short-key tier)
2. scoring: Fellegi-Sunter agreement weights over (nation, segment, balance)
3. clustering: connected components over the match-pair graph
4. survivorship: min-id golden record + merged-duplicate counts

Every stage is the independently oracle-verified operator; the registered
query `er_golden_records` runs the same chain against a single
brute-join + recursive-CTE oracle.
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.operators import dedup
from demo_otel_parquet_antalya_spark.operators.stringsim import (
    edit_distance_join_deletions,
)
from demo_otel_parquet_antalya_spark.plans.tables import load_table
from demo_otel_parquet_antalya_spark.session import get_spark

SF = "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark(app_name="entity-resolution")
    spark.sparkContext.setLogLevel("ERROR")
    cust = load_table(spark, SF, "customer")
    print(f"== 1. blocking over {cust.count()} customer records ==")
    blocks = edit_distance_join_deletions(cust, "c_custkey", "c_name", d=1).cache()
    print(f"{blocks.count()} candidate pairs within edit distance 1 "
          "(deletion-neighborhood join — never the all-pairs product)")

    print("\n== 2. Fellegi-Sunter scoring ==")
    feats = cust.select(
        F.col("c_custkey").alias("id"), "c_nationkey", "c_mktsegment", "c_acctbal"
    )

    def w(cond, m, u):
        return F.when(cond, math.log2(m / u)).otherwise(math.log2((1 - m) / (1 - u)))

    fa = feats.toDF("id_a", "nat_a", "seg_a", "bal_a")
    fb = feats.toDF("id_b", "nat_b", "seg_b", "bal_b")
    weight = F.round(
        w(F.col("nat_a") == F.col("nat_b"), 0.9, 0.04)
        + w(F.col("seg_a") == F.col("seg_b"), 0.85, 0.2)
        + w(F.abs(F.col("bal_a") - F.col("bal_b")) <= 100.0, 0.8, 0.1),
        6,
    )
    scored = blocks.join(fa, "id_a").join(fb, "id_b").select(
        "id_a", "id_b", weight.alias("weight")
    ).cache()
    scored.groupBy(
        F.when(F.col("weight") >= 4.0, "match")
        .when(F.col("weight") >= 0.0, "possible")
        .otherwise("non_match")
        .alias("verdict")
    ).count().orderBy("verdict").show()

    print("== 3+4. cluster matches -> golden records ==")
    matches = scored.filter(F.col("weight") >= 4.0).select("id_a", "id_b")
    cc = dedup.connected_components(matches)
    golden = (
        cc.groupBy(F.col("cluster_id").alias("golden_id"))
        .agg(F.count("*").alias("n_merged"))
        .filter(F.col("n_merged") >= 2)
    )
    print(f"{golden.count()} golden records absorb duplicates; largest merges:")
    golden.orderBy(F.desc("n_merged"), "golden_id").show(5)

    spark.stop()
    print("done")


if __name__ == "__main__":
    main()
