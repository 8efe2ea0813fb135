"""Similarity search over embedding columns (array<float>).

Three strategies:

- ``cosine_topk`` — brute-force exact top-k: broadcast the query set, score
  every (query, vector) pair with JVM-side zip_with/aggregate, per-query
  window top-k. Exact; cost |Q| x |N| — the correctness baseline and fine
  whenever |Q| is small (the common "probe a batch of queries" shape).
- ``lsh_topk`` — random-hyperplane LSH: bucket vectors by signature prefix,
  probe only matching buckets, exact re-rank inside. Linear index pass; the
  100 TB path for big query sets.
- ``ivf_topk`` — IVF-style coarse quantization: deterministic centroid
  subset, assign every vector to its nearest centroid (one pass), probe the
  ``nprobe`` nearest centroids per query. The classic FAISS-IVF layout in
  DataFrame form; the assignment doubles as a partitioning key so a real
  deployment writes the index partitioned by centroid for pruning.

All dot products run as higher-order functions in doubles — bit-identical
to the DuckDB oracle's double cosine, so ranked results hash-match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.util import ensure_parallelism


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    round_digits: int = 6,
) -> DataFrame:
    """Exact brute-force cosine top-k.

    Returns (query_id, neighbor_id, rank, sim). Ranking uses the ROUNDED
    similarity with neighbor-id tiebreak so results are stable across
    engines and float summation orders.
    """
    q = F.broadcast(queries.select(F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv")))
    scored = (
        ensure_parallelism(vectors)
        .select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v"))
        .join(q)  # broadcast nested-loop: |N| x |Q| score pass, no shuffle
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("v"), F.col("qv")), round_digits).alias("sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic random hyperplanes (driver-side constants, broadcast as
    literals — tiny: n_planes x dim doubles)."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def _signature(vec: Column, planes: list[list[float]]) -> Column:
    """Bit-signature: sign of <v, plane_i> per plane, packed to a long."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(w) for w in plane]),
                    lambda x, wcol: x.cast("double") * wcol,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.shiftleft(F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long"))
        for i, plane in enumerate(planes)
    ]
    sig = bits[0]
    for b in bits[1:]:
        sig = sig.bitwiseOR(b)
    return sig


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH.

    Each of ``n_tables`` tables buckets by an independent n_planes-bit
    signature; a query probes its bucket in every table, candidates are
    unioned and exactly re-ranked. Index pass is one projection over the
    vectors; the probe join shuffles only on (table, signature).
    """
    tables = [
        _hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)
    ]
    vec_sigs = ensure_parallelism(vectors).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("v"),
        *[_signature(F.col(vec_col), tables[t]).alias(f"sig{t}") for t in range(n_tables)],
    )
    q_sigs = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("qv"),
        *[_signature(F.col(query_vec_col), tables[t]).alias(f"qsig{t}") for t in range(n_tables)],
    )
    probe = None
    for t in range(n_tables):
        m = vec_sigs.join(
            F.broadcast(q_sigs), F.col(f"sig{t}") == F.col(f"qsig{t}")
        ).select("query_id", "neighbor_id", "v", "qv")
        probe = m if probe is None else probe.unionAll(m)
    cands = probe.distinct().filter(F.col("neighbor_id") != F.col("query_id"))
    scored = cands.select(
        "query_id", "neighbor_id", F.round(cosine(F.col("v"), F.col("qv")), 6).alias("sim")
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF-style approximate top-k.

    Centroids: deterministic stratified subset of the vectors (every
    len/n-th by id — a real deployment would k-means; the index contract is
    identical). Vectors get assigned to their nearest centroid once; queries
    probe the ``nprobe`` nearest centroid cells and re-rank exactly.
    """
    w_rank = W.orderBy("vec_id")
    ids = vectors.select(F.col(id_col).alias("vec_id")).withColumn("rn", F.row_number().over(w_rank))
    total = vectors.count()
    stride = max(total // n_centroids, 1)
    centroid_ids = ids.filter((F.col("rn") - 1) % stride == 0).limit(n_centroids).select("vec_id")
    centroids = (
        vectors.join(centroid_ids, on=vectors[id_col] == centroid_ids.vec_id, how="left_semi")
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
    )
    # one-pass assignment: argmin centroid per vector (broadcast centroids)
    assign_w = W.partitionBy("nid").orderBy(F.col("csim").desc(), F.col("cid"))
    assigned = (
        ensure_parallelism(vectors)
        .select(F.col(id_col).alias("nid"), F.col(vec_col).alias("v"))
        .join(F.broadcast(centroids))
        .select("nid", "v", "cid", F.round(cosine(F.col("v"), F.col("cv")), 9).alias("csim"))
        .withColumn("r", F.row_number().over(assign_w))
        .filter(F.col("r") == 1)
        .select("nid", "v", "cid")
    )
    # queries probe nprobe nearest centroids
    probe_w = W.partitionBy("query_id").orderBy(F.col("csim").desc(), F.col("cid"))
    probes = (
        queries.select(F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv"))
        .join(F.broadcast(centroids))
        .select("query_id", "qv", "cid", F.round(cosine(F.col("qv"), F.col("cv")), 9).alias("csim"))
        .withColumn("r", F.row_number().over(probe_w))
        .filter(F.col("r") <= nprobe)
        .select("query_id", "qv", "cid")
    )
    scored = (
        probes.join(assigned, "cid")
        .filter(F.col("nid") != F.col("query_id"))
        .select(
            "query_id",
            F.col("nid").alias("neighbor_id"),
            F.round(cosine(F.col("v"), F.col("qv")), 6).alias("sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )
