#!/usr/bin/env python
"""Synthesize an N-times-larger copy of an sf directory for scaling runs.

    python tools/gen_scale_data.py [src_sf_dir] [out_dir] [n_copies]

Each copy offsets every key column by copy_index * max_key so foreign-key
relationships survive (lineitem -> orders -> customer, nation/region shared).
Document text gets a PER-COPY TOKEN RENAMING (token -> token_<copy>, a
bijection on the vocabulary): shingle structure within each copy is
preserved exactly (bijective token maps induce bijective shingle maps, so
every within-copy Jaccard is unchanged) while cross-copy shingle overlap is
zero — without that, k identical copies inflate every dedup posting list
k-fold and the pair count quadratically, which measures the synthesizer,
not the operator.
Dimension tables bounded by a constant in the schema (region, nation) are
NOT multiplied.

Only meant for /tmp scaling experiments; never writes into /root/testdata.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.plans.tables import load_table
from demo_otel_parquet_antalya_spark.session import get_spark

# table -> columns to offset by copy * (max+1)
OFFSETS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
PASSTHROUGH = ["region", "nation"]


def scale_table(spark, src: str, out: str, name: str, n_copies: int) -> None:
    df = load_table(spark, src, name)
    if name in PASSTHROUGH:
        df.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        return
    keys = OFFSETS[name]
    bases = {k: df.agg(F.max(k)).collect()[0][0] + 1 for k in keys}
    copies = []
    for i in range(n_copies):
        c = df
        for k in keys:
            c = c.withColumn(k, F.col(k) + F.lit(i * bases[k]))
        if name == "documents" and i > 0:
            toks = F.split(F.trim(F.col("text")), r"\s+")
            c = c.withColumn(
                "text",
                F.concat_ws(
                    " ",
                    F.transform(toks, lambda t: F.concat(t, F.lit(f"_{i}"))),
                ),
            )
        copies.append(c)
    unioned = copies[0]
    for c in copies[1:]:
        unioned = unioned.unionAll(c)
    unioned.write.mode("overwrite").parquet(f"{out}/{name}.parquet")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark(app_name="gen-scale-data")
    spark.sparkContext.setLogLevel("ERROR")
    for name in list(OFFSETS) + PASSTHROUGH:
        scale_table(spark, src, out, name, n)
        print(f"{name}: done")
    spark.stop()


if __name__ == "__main__":
    main()
