"""Diverse coreset selection: greedy k-center (farthest-point traversal).

The data-curation counterpart of dedup: dedup REMOVES redundancy,
k-center SELECTS a maximally-spread representative subset — the classic
2-approximation to the k-center objective (Gonzalez 1985, "Clustering to
minimize the maximum intercluster distance") used for diverse
training-subset selection and embedding-space coverage audits.

Greedy farthest-point traversal, made deterministic for oracle replay:

- center 0 = the lowest-id vector (not a random seed);
- round i picks argmax of the rounded (6-dp) min-distance-to-selected,
  ties to the lowest id — rounding before the argmax keeps the float
  comparison engine-portable, the same ROUND(x, 6) discipline as the
  cosine similarity oracles;
- distance = cosine distance (1 - cosine), computed JVM-side with the
  similarity module's zip_with/aggregate fold — no Python anywhere.

Scale shape: each round is ONE full-column scan (update the running min
against the single newly-chosen center, a broadcast 1-row value) + ONE
TakeOrderedAndProject(1) argmax; k rounds total, so the work is
O(k * N * dim) with no pairwise blowup and nothing but k single-row
collects on the driver (bounded by contract). The running-min column
rides a localCheckpoint per round, exactly like the CC/PageRank loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.operators.similarity import cosine
from demo_otel_parquet_antalya_spark.util import ensure_parallelism


def k_center_select(
    vectors: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(sel_round, vec_id, mind) — the k greedily-selected centers in
    selection order; ``mind`` is the (rounded) distance to the previously
    selected set at pick time (0 for the seed; non-increasing over rounds,
    and the last row's value bounds the selection's covering radius within
    the greedy 2-approximation guarantee).

    Selection stops early once every remaining vector is at (rounded)
    distance 0 from the selected set — continuing would re-pick duplicate
    points forever, so ``k`` larger than the number of distinct embedding
    directions returns fewer than ``k`` rows rather than degenerate
    repeats (ADVICE r4 #5). The ``vec_id`` output column keeps the input
    id column's type (ids need not be longs)."""
    v = ensure_parallelism(vectors).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    id_type = v.schema["vec_id"].dataType.simpleString()
    seeds = v.orderBy("vec_id").limit(1).collect()  # 1 row by contract
    if not seeds:
        return vectors.sparkSession.createDataFrame(
            [], f"sel_round int, vec_id {id_type}, mind double"
        )
    seed = seeds[0]
    chosen = [(0, seed.vec_id, 0.0)]
    state = v.select(
        "vec_id",
        "v",
        F.round(1.0 - cosine(F.col("v"), F.lit(seed.v).cast("array<double>")), 6).alias(
            "mind"
        ),
    ).localCheckpoint(eager=True)
    for i in range(1, k):
        # argmax of the rounded running min-distance, ties to lowest id
        top = state.orderBy(F.col("mind").desc(), "vec_id").limit(1).collect()[0]
        if float(top.mind) <= 0.0:
            # every remaining vector coincides with a chosen center:
            # further rounds would re-select duplicates at mind=0
            break
        chosen.append((i, top.vec_id, float(top.mind)))
        state = state.select(
            "vec_id",
            "v",
            F.least(
                "mind",
                F.round(
                    1.0 - cosine(F.col("v"), F.lit(top.v).cast("array<double>")), 6
                ),
            ).alias("mind"),
        ).localCheckpoint(eager=True)
    spark = vectors.sparkSession
    return spark.createDataFrame(
        chosen, f"sel_round int, vec_id {id_type}, mind double"
    )
