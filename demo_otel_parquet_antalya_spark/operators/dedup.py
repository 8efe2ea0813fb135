"""Deduplication operators for training-data pipelines.

Four tiers, increasing scale-friendliness:

1. ``exact_dedup`` — content-hash groupBy; one shuffle on the hash key.
2. ``ngram_jaccard_pairs`` — EXACT near-dup pairs via shingle inverted index
   (explode -> self equi-join on shingle -> pair counts). Quadratic only
   within shingle posting lists; ``max_shingle_freq`` drops stop-shingles so
   hot postings can't blow up the join (the standard suffix-array-era trick).
3. ``minhash_lsh`` — MinHash signatures + banded LSH bucketing. Cost is
   linear in corpus size: one shuffle on (band, bucket-key); candidate
   verification re-checks exact Jaccard only inside buckets. This is the
   100 TB path (the others are oracles/baselines for it).
4. ``simhash64`` — 64-bit SimHash fingerprints + hamming-distance candidate
   pairing via rotated prefix blocks.

All shingling/hashing is JVM-side (higher-order functions + xxhash64) — no
Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, Window as W
from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.functions.text import fingerprint, word_shingles
from demo_otel_parquet_antalya_spark.util import ensure_parallelism

# Mersenne prime modulus for the MinHash universal-hash family. 2^31-1 keeps
# a*x + b inside a signed 64-bit long (a, x < 2^31), avoiding ANSI overflow.
_MERSENNE = (1 << 31) - 1


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one canonical row (min id) per exact content fingerprint.

    groupBy on md5(normalized text): map-side partial agg then one shuffle on
    the 128-bit key — no skew (hashes are uniform), no row comparisons.
    """
    fp = fingerprint(F.col(text_col))
    keep = (
        df.select(F.col(id_col), fp.alias("__fp"))
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")


def shingle_sets(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) distinct pairs — the inverted-index rows."""
    return (
        ensure_parallelism(df)
        .select(F.col(id_col).alias("id"), F.explode(word_shingles(F.col(text_col), n)).alias("s"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity for all pairs >= threshold.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to 6dp.

    Plan shape: shingle inverted index -> self equi-join on shingle (shuffle
    on shingle) -> pair intersection counts -> join per-doc set sizes
    (broadcast at any realistic doc count per partition) -> ratio filter.
    ``max_shingle_freq`` caps posting-list length: a shingle shared by f docs
    contributes f^2 candidate pairs, so dropping ubiquitous shingles bounds
    the blow-up with negligible Jaccard error on near-dup pairs.
    """
    sh = shingle_sets(df, id_col, text_col, n)
    if max_shingle_freq is not None:
        freq_w = W.partitionBy("s")
        sh = sh.withColumn("__f", F.count("*").over(freq_w)).filter(F.col("__f") <= max_shingle_freq).drop("__f")
    # eager hinge materialization (r14, same rationale as the PPJoin /
    # MinHash hinges): the three consumers below (sizes, both self-join
    # sides) share one job, where a lazily-populated cache races and
    # re-evaluates the explode+distinct; the algorithm (string-exact
    # brute posting-list join — the correctness baseline) is unchanged
    sh = sh.localCheckpoint(eager=True)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("c"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb"))
    jac = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _minhash_params(num_hashes: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal hash family
    h_i(x) = (a_i * x + b_i) mod p."""
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE)) for _ in range(num_hashes)]


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    seed: int = 7,
) -> DataFrame:
    """(id, sig: array<bigint>) MinHash signatures.

    Shingles hash to 64-bit via xxhash64 ONCE per (doc, shingle); each
    permutation is an affine map mod a Mersenne prime evaluated as one of
    num_hashes ``min`` aggregate columns over the exploded shingles. This
    keeps every expression inside whole-stage codegen — higher-order-function
    lambdas are interpreted per element and Catalyst does not CSE across
    them, so the "compute the signature as an array fold per row" forms
    measured 25-50x slower at sf0.1. Cost: one map-side-combined shuffle of
    (id, 64 longs) partials — negligible next to the hash arithmetic it
    parallelizes, and MinHash output feeds a banding shuffle anyway.

    Docs with fewer than ``n`` words produce no shingles and drop out (they
    can near-dup-match nothing; exact_dedup handles empty/degenerate docs).
    """
    params = _minhash_params(num_hashes, seed)
    sh = ensure_parallelism(df).select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("s"),
    )
    # duplicate shingles can't change a min — no distinct needed
    hashed = sh.select("id", F.pmod(F.xxhash64("s"), F.lit(_MERSENNE)).alias("h"))
    # h, a < 2^31 so h*a + b stays inside a signed 64-bit long (no overflow)
    mins = hashed.groupBy("id").agg(
        *[
            F.min(F.pmod(F.col("h") * F.lit(a) + F.lit(b), F.lit(_MERSENNE))).alias(f"m{i}")
            for i, (a, b) in enumerate(params)
        ]
    )
    return mins.select("id", F.array(*[f"m{i}" for i in range(num_hashes)]).alias("sig"))


def minhash_signatures_pandas(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    seed: int = 7,
) -> DataFrame:
    """(id, sig) MinHash signatures via a numpy Arrow-batch kernel.

    Same affine hash family as ``minhash_signatures`` but the base shingle
    hash is crc32 (C-speed per call) instead of xxhash64, and all
    ``num_hashes`` permutations evaluate as one uint64 outer-product + mod
    + row-min per document instead of 64 codegen'd aggregate columns. The
    two kernels produce different (equally uniform) hash families, so
    banding buckets differ — recall, and the exact-verified output pair
    set, do not (pytest-checked). Wins by ~2x at sf0.1 because the per-
    shingle work drops from 64 interpreted-plan pmods to a BLAS-shaped
    numpy loop; the (id, sig) output and downstream banding are identical.
    """
    import numpy as np

    params = _minhash_params(num_hashes, seed)
    a_vec = np.array([a for a, _ in params], dtype=np.uint64)
    b_vec = np.array([b for _, b in params], dtype=np.uint64)
    prime = np.uint64(_MERSENNE)

    def compute(batches):
        import numpy as _np
        import pandas as _pd
        from zlib import crc32

        for pdf in batches:
            ids, sigs = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                words = (text or "").split()
                if len(words) < n:
                    continue
                hs = {
                    crc32(" ".join(words[i : i + n]).encode("utf-8"))
                    for i in range(len(words) - n + 1)
                }
                h = _np.fromiter(hs, dtype=_np.uint64, count=len(hs))
                # a, h < 2^32 so a*h + b fits in uint64 — no overflow
                vals = (a_vec[:, None] * h[None, :] + b_vec[:, None]) % prime
                ids.append(doc_id)
                sigs.append(vals.min(axis=1).astype(_np.int64))
            yield _pd.DataFrame({"id": _pd.Series(ids, dtype="int64"), "sig": sigs})

    return (
        ensure_parallelism(df)
        .select(id_col, text_col)
        .mapInPandas(compute, "id long, sig array<long>")
    )


def banded_buckets(
    signatures: DataFrame, bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """(id, band, bucket) banding of MinHash signatures — the LSH join key
    frame, shared by the batch pair search, the persisted index writer and
    the incremental (new-batch-vs-index) path."""
    assert bands * rows_per_band <= 1024
    return signatures.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.hash(*[F.col("sig")[bi * rows_per_band + ri] for ri in range(rows_per_band)]).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """Banded LSH: docs agreeing on ALL rows of any band become a candidate
    pair. One explode (bands per doc) + one shuffle on the bucket key —
    linear scaling; bucket sizes stay tiny for uniform hashes.

    The banded frame is materialized ONCE before the self-join (r14
    optimization round): the join's two sides are the same subtree, but a
    broadcast plan has no exchange to reuse between them, so the ENTIRE
    corpus signature pass — the Arrow mapInPandas kernel — evaluated
    twice per call (plan-verified: two MapInPandas nodes, zero
    ReusedExchange). The checkpoint pins it to one evaluation at ~24
    bytes x bands per doc."""
    banded = banded_buckets(signatures, bands, rows_per_band).localCheckpoint(
        eager=True
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 7,
    sig_impl: str = "pandas",
) -> DataFrame:
    """The scale path: LSH candidates, then EXACT Jaccard verification only
    on candidate pairs. Returns (id_a, id_b, jaccard >= threshold).

    ``sig_impl`` picks the signature kernel ("pandas" = numpy batch kernel,
    "jvm" = codegen aggregate columns); the verified output pair set is the
    same either way.

    Verification re-shingles ONLY docs that appear in some candidate pair
    (semi-join prune — at 100 TB that's the near-dup sliver of the corpus,
    broadcast-sized) and intersects via the posting-list self-join, then
    keeps LSH-candidate pairs. The join-each-pair-to-both-shingle-sets
    alternative materializes |shingles_a| x |shingles_b| rows per pair and
    measured >2x the whole pipeline's cost at sf0.1.
    """
    rows_per_band = num_hashes // bands
    sig_fn = minhash_signatures_pandas if sig_impl == "pandas" else minhash_signatures
    sigs = sig_fn(df, id_col, text_col, n, num_hashes, seed)
    # candidate pairs are the near-dup sliver (tiny); materialize ONCE so
    # the three consumers below (cand_ids prune, sizes, final semi-join)
    # don't each re-run the signature+banding pipeline — measured 2x on
    # the full op. Eager localCheckpoint rather than cache() (r14
    # optimization round, the PPJoin hinge discipline): the checkpoint
    # TRUNCATES the Arrow mapInPandas signature lineage out of every
    # consumer plan instead of carrying it under an InMemoryRelation, and
    # a cache is only lazily populated — consumers racing within one job
    # would re-evaluate the pipeline before blocks land.
    cands = lsh_candidate_pairs(sigs, bands, rows_per_band).localCheckpoint(eager=True)
    cand_ids = (
        cands.select(F.col("id_a").alias("id"))
        .unionAll(cands.select(F.col("id_b").alias("id")))
        .distinct()
    )
    # prune DOCS to candidates BEFORE shingling: the semi-join key exists
    # pre-explode, but Catalyst won't push a join below the generate +
    # distinct, so joining after shingle_sets explodes and dedups the WHOLE
    # corpus (~200 shingle rows/doc) just to discard non-candidates
    cand_docs = df.join(
        F.broadcast(cand_ids.select(F.col("id").alias(id_col))), id_col, "left_semi"
    )
    # sliver-sized (candidate docs only); eager for the same race reason —
    # its three consumers (sizes, both self-join sides) share one job
    sh = shingle_sets(cand_docs, id_col, text_col, n).localCheckpoint(eager=True)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("c"))
        .join(cands, ["id_a", "id_b"], "left_semi")
    )
    jac = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    return (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb")), "id_b")
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# embedding_cosine_pairs is quadratic BY DESIGN (correctness baseline/oracle);
# refuse to run it on a corpus where n^2 detonates unless explicitly forced
MAX_COSINE_PAIRS_ROWS = 100_000


def embedding_cosine_pairs(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    round_digits: int = 6,
    force: bool = False,
) -> DataFrame:
    """Embedding-cosine near-dup pairs: (id_a, id_b, cos) with cos >= threshold.

    Exact all-pairs comparison — the correctness baseline. The self-join has
    no equi key, so Spark plans a broadcast nested loop over the (projected:
    id + vector only) right side; quadratic by definition. The linear-scaling
    path at corpus scale is LSH bucketing first (``similarity.lsh_topk``'s
    signature machinery) and exact re-scoring inside buckets, trading recall
    for the removal of the O(n^2) term.

    Because the quadratic term is intentional, the operator guards itself:
    above ``MAX_COSINE_PAIRS_ROWS`` input rows it raises unless ``force=True``
    (the count is one columnar metadata-cheap scan, negligible next to the
    pair join it gates). This keeps the one deliberately-nonscalable plan in
    the registry from being pointed at a 100 TB corpus by accident
    (VERDICT r2 item 7).
    """
    from demo_otel_parquet_antalya_spark.operators.similarity import _dot, _norm

    if not force:
        n = vectors.count()
        if n > MAX_COSINE_PAIRS_ROWS:
            raise ValueError(
                f"embedding_cosine_pairs is O(n^2) and input has {n} rows "
                f"(> {MAX_COSINE_PAIRS_ROWS}); use the LSH/IVF similarity path "
                "at this scale, or pass force=True to run the baseline anyway"
            )

    # per-side norms precomputed before the pair join: the O(n^2) inner loop
    # is one dot product per pair, not three interpreted array folds
    a = ensure_parallelism(vectors).select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), _norm(F.col(vec_col)).alias("na")
    )
    b = vectors.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), _norm(F.col(vec_col)).alias("nb")
    )
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), round_digits).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def simhash64(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash fingerprints: per-token xxhash64 (computed once), each
    bit votes ±1 via 64 codegen'd sum aggregates over the exploded tokens,
    fingerprint bit = sign of the vote sum. Same explode+groupBy shape as
    ``minhash_signatures`` and for the same reason: per-row array folds with
    higher-order functions re-hash per bit and run interpreted.

    Token-less docs drop out (cannot near-dup-match anything).

    Returns (id, simhash: bigint)."""
    from demo_otel_parquet_antalya_spark.functions.text import tokens

    ex = ensure_parallelism(df).select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("t")
    )
    hashed = ex.select("id", F.xxhash64("t").alias("h"))
    votes = hashed.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{i}")
            for i in range(64)
        ]
    )
    # bit 63's weight is long-min in two's complement
    fp = F.lit(0).cast("long")
    for i in range(64):
        weight = (1 << i) if i < 63 else -(1 << 63)
        fp = fp.bitwiseOR(
            F.when(F.col(f"v{i}") > 0, F.lit(weight).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    return votes.select("id", fp.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    blocks: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs with hamming distance <= max_hamming.

    Pigeonhole blocking: split the 64-bit fingerprint into ``blocks`` chunks;
    any pair within distance ``max_hamming < blocks`` agrees on >= 1 chunk, so
    an equi-join per chunk finds all candidates — linear shuffle, no O(n^2).
    Exact hamming verification via bit_count(xor).
    """
    assert max_hamming < blocks
    bits_per = 64 // blocks
    sigs = simhash64(df, id_col, text_col)
    chunked = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftright(F.col("simhash"), i * bits_per)
                        .bitwiseAND(F.lit((1 << bits_per) - 1))
                        .alias("chunk"),
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("c"),
    ).select("id", "simhash", "c.blk", "c.chunk")
    # eager hinge (r14): the self-join's sides are the same subtree with
    # no reusable exchange under a broadcast plan — the 64-aggregate
    # SimHash computation would evaluate twice per call
    chunked = chunked.localCheckpoint(eager=True)
    a, b = chunked.alias("a"), chunked.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), hamming.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    broadcast_state_max: int | None = None,
) -> DataFrame:
    """(id, cluster_id) for every id in ``pairs``: cluster_id = min id in the
    connected component. Turns near-dup PAIRS into dedup GROUPS (pick the
    min-id member as canonical, drop the rest).

    Iterative min-label propagation with pointer jumping: each round takes
    the min over neighbours' labels AND the label's own current label
    (path-halving), so convergence is O(log diameter) rounds, not
    O(diameter) — chains of pairwise-similar docs (the classic boilerplate
    case) stay cheap. Each round is one shuffle join; lineage is truncated
    with localCheckpoint so plans don't grow exponentially. Iteration stops
    at the first round with zero label changes.

    Near-dup graphs are edge-sparse (the near-dup sliver), so every round's
    join is small regardless of corpus size.
    """
    from demo_otel_parquet_antalya_spark.operators.graph import (
        _iter_layout,
        _pick_small,
        _state_side,
    )

    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (
        fwd.unionAll(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("id")).distinct().withColumn("comp", F.col("id"))
    ).localCheckpoint(eager=True)
    # near-dup pair graphs are the edge-sparse sliver, so the label table
    # (one row per node) is usually broadcast-sized; past the limit (r12:
    # derived from state bytes vs the session's broadcast threshold — see
    # graph.derived_broadcast_state_max) the neighbor join runs against a
    # persist()ed dst-partitioned edge layout instead (partitioning
    # survives persist, NOT localCheckpoint — the r11 finding)
    _, small = _pick_small(labels, "id", broadcast_state_max)

    # convergence test: least()-only updates mean labels never move once at
    # fixpoint, so the multiset of labels is unchanged iff the round was a
    # no-op — detected by one exact decimal aggregate over xxhash64(comp)
    # per round instead of an old-vs-new join. xxhash64 is type-agnostic
    # (ids may be strings — a numeric cast threw / nulled under ANSI,
    # ADVICE r4 #1) and the decimal(38,0) sum can't overflow at corpus
    # scale. A premature exit needs the per-row hash deltas of a changed
    # round to sum to exactly 0 across 2^64 space — negligible.
    def _label_sum(df):
        return df.agg(F.sum(F.xxhash64("comp").cast("decimal(38,0)"))).first()[0]

    # the initial sum runs BEFORE the layout is built: a Spark job between
    # _iter_layout and the try would leak the CacheManager entry on failure
    # — the finally below only releases a layout that exists (ADVICE r11).
    # It also guards the per-round Observation fusion below: an EMPTY pair
    # set (sum None) returns here, so the observed frames are always
    # non-empty and AQE's empty-relation propagation can never eliminate a
    # CollectMetrics whose .get we then block on (the SURVEY §7.14
    # src_hwm/Observation failure class).
    prev_sum = _label_sum(labels)
    if prev_sum is None:
        return labels.select("id", F.col("comp").alias("cluster_id"))
    # self-loops (r15 optimization round): one (n, n) edge per node makes
    # the neighbor-min aggregate include the node's own label, so the
    # separate hop = labels LEFT JOIN nbr_min + least() pass — one
    # node-sized join (and its broadcast materialization job) per round —
    # disappears; the per-round min over {own comp} ∪ {neighbor comps} is
    # IDENTICAL, hence so are every round's labels and the convergence
    # round count. Measured at sf0.1: er_golden_records 43 -> 38 jobs.
    # (An agg-key edge layout on the broadcast path was A/B'd too and
    # REJECTED for CC: the near-dup edge frame is sliver-sized, so the
    # partial-agg exchange it removes is tiny while the persisted layout
    # added a repartition job and 32 near-empty tasks per round — wall
    # 3.5 -> 4.4 s; see graph._iter_layout. label_propagation, whose
    # per-round exchange is EDGE-sized votes, keeps that layout.)
    edges_aug = edges.unionAll(
        labels.select(F.col("id").alias("src"), F.col("id").alias("dst"))
    )
    edges = _iter_layout(edges_aug, "dst", small)
    try:
        for i in range(max_iter):
            hop = (
                edges.join(_state_side(labels, small), edges.dst == labels.id)
                .groupBy("src")
                .agg(F.min("comp").alias("comp"))
                .select(F.col("src").alias("id"), "comp")
            )
            # pointer jumping: comp <- label(comp)
            lut = labels.select(
                F.col("id").alias("comp"), F.col("comp").alias("comp2")
            )
            # the convergence sum rides the checkpoint materialization as an
            # observed metric (r14 optimization round): the separate
            # _label_sum action per round was a second full pass over the
            # label table — one extra job per round here, one extra
            # node-table scan per round at warehouse scale. Observed
            # metrics fire on eager localCheckpoint (probe-verified, value
            # equal to the plain aggregate); labels is non-empty (guarded
            # above) and the left joins preserve its rows, so the metric
            # always arrives.
            obs = Observation(f"cc_round_{i}")
            jumped = (
                hop.join(_state_side(lut, small), "comp", "left")
                .select(
                    "id",
                    F.least("comp", F.coalesce("comp2", F.col("comp"))).alias("comp"),
                )
                .observe(
                    obs,
                    F.sum(F.xxhash64("comp").cast("decimal(38,0)")).alias("s"),
                )
                .localCheckpoint(eager=True)
            )
            labels = jumped
            new_sum = obs.get["s"]
            if new_sum == prev_sum:
                break
            prev_sum = new_sum
    finally:
        # jumped labels are checkpointed every round, so the returned
        # plan never references the persist()ed layout — release it
        # even on a mid-round failure (CacheManager entries are not
        # GC-freed, unlike checkpointed RDDs)
        edges.unpersist()
    return labels.select("id", F.col("comp").alias("cluster_id"))


def semantic_dedup_drops(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_seeds: int = 8,
    threshold: float = 0.4,
) -> DataFrame:
    """Semantic (embedding-space) dedup, SemDeDup-shaped: partition the corpus
    into clusters, then compare pairs ONLY within a cluster and drop every
    vector that has a lower-id semantic duplicate there (cosine >= threshold).

    Clustering here is one deterministic assignment pass — each vector goes to
    the seed (the ``n_seeds`` lowest-id vectors) it is most cosine-similar to,
    ties to the lowest seed id — rather than trained k-means centroids, so the
    oracle can reproduce the exact partition in SQL. The scale shape is the
    point and is identical either way:

    - assignment is a broadcast of k seed vectors + one map-side argmax per
      row (aggregate of max(struct(cos, -seed_id)) over the exploded
      seed x vector frame; partial aggregation collapses each vector's k
      candidates before the shuffle);
    - the pair join shuffles on cluster_id, so the quadratic term is
      sum(|cluster|^2), not |corpus|^2 — with k ~ sqrt(N) clusters this is
      ~N^1.5 total work spread across the cluster, the SemDeDup trade
      (cross-cluster duplicates are invisible by design);
    - a skewed cluster (one seed swallowing the corpus) re-concentrates the
      quadratic term; at production scale seeds come from a k-means pass and
      oversized cells get re-split, exactly like the IVF index path.

    Returns dropped vectors: (vec_id, cluster_id, dup_of, n_dups) where
    dup_of is the lowest-id in-cluster duplicate and n_dups the number of
    lower-id in-cluster duplicates. Integer-only output — hash-stable.
    """
    from demo_otel_parquet_antalya_spark.operators.similarity import _dot, _norm

    v = ensure_parallelism(vectors).select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    )
    seeds = v.orderBy("vid").limit(n_seeds).select(
        F.col("vid").alias("seed_id"), F.col("v").alias("sv")
    )
    # the seed set is k rows by contract — collect it and compile the
    # assignment into ONE map-side expression (k dot products + a greatest()
    # argmax per row). The explode-join-groupBy alternative shuffles k copies
    # of every vector through the aggregate; this form shuffles nothing.
    import math

    seed_rows = seeds.collect()
    vnorm = _norm(F.col("v"))
    cands = []
    for r in seed_rows:
        sv, sid = list(r.sv), int(r.seed_id)
        cos = _dot(F.col("v"), F.array(*[F.lit(x) for x in sv])) / (
            vnorm * F.lit(math.sqrt(sum(x * x for x in sv)))
        )
        # argmax by (cos desc, seed_id asc): max struct picks highest cos,
        # then highest -seed_id = lowest seed
        cands.append(F.struct(cos.alias("cos"), F.lit(-sid).alias("neg_seed")))
    assign = v.select(
        "vid", "v", (-F.greatest(*cands).getField("neg_seed")).alias("cluster_id")
    )
    a = assign.select(
        F.col("vid").alias("id_a"), F.col("cluster_id").alias("ca"), F.col("v").alias("va")
    )
    b = assign.select(
        F.col("vid").alias("id_b"), F.col("cluster_id").alias("cb"), F.col("v").alias("vb")
    )
    pairs = a.join(b, (F.col("ca") == F.col("cb")) & (F.col("id_a") < F.col("id_b"))).filter(
        _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
        >= threshold
    )
    return (
        pairs.groupBy(F.col("id_b").alias("vec_id"), F.col("cb").alias("cluster_id"))
        .agg(F.min("id_a").alias("dup_of"), F.count("*").alias("n_dups"))
    )


def repeated_ngram_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document repeated n-gram SPANS — the distributed approximation of
    exact-substring dedup (suffix-array dedup a la 'Deduplicating Training
    Data Makes Language Models Better'): find every maximal token span whose
    n-grams all also occur in at least ``min_docs - 1`` OTHER documents.

    Plan shape, linear end to end:
    1. posexplode positional word n-grams (scan-stage, ~tokens-per-doc rows);
    2. one g-keyed window pass flags grams spanning >= min_docs distinct
       docs (r15: min != max over the gram partition for min_docs=2, the
       dense_rank count for the general case) — ONE full-stream exchange,
       where the previous groupBy(gram) + left-semi shape paid the
       aggregate exchange plus the probe's own exchange at scale;
    3. gaps-and-islands per document (window on (doc, pos): new island when
       the gap exceeds n) merges overlapping/adjacent hits into maximal
       spans — the window shuffle is doc-partitioned, embarrassing at scale.

    Suffix arrays find arbitrary-length repeats; fixed-n posting lists find
    any repeat of length >= n tokens (shorter ones are invisible) at a tiny
    fraction of the cost and with no global ordered structure to build —
    the standard large-corpus trade.

    The posting stream carries 8-byte xxhash64 gram fingerprints, never
    the gram text — the same discipline as ``duplicated_line_hashes``:
    the corpus-wide frequency exchange moves ~24 bytes/gram instead of
    the ~50-byte n-gram strings. A fingerprint collision needs two
    distinct grams among the corpus's distinct grams to share an
    xxhash64 — ~d^2/2^65, zero at every tested SF and negligible at
    corpus scale (the line-dedup tier has shipped on the same bound
    since r4).

    Returns (doc_id, span_start, span_end, n_grams): token offsets, end
    exclusive, integer-only (hash-stable).
    """
    sh = (
        ensure_parallelism(docs)
        .select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(word_shingles(F.col(text_col), n)).alias("pos", "gram"),
        )
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("pos"),
            F.xxhash64("gram").alias("g"),
        )
    )
    # distinct-doc gate as ONE g-keyed window pass (r15, the
    # exact_substring_spans shape — see that operator for why this beats
    # the checkpoint + groupBy(g) + semi-join form at every scale):
    # min != max covers the common min_docs=2 case in a single unordered
    # window aggregate; the general case counts distinct docs as
    # max(dense_rank ordered by doc_id) — same single exchange on g, one
    # sort by (g, doc_id) that the unordered max reuses.
    wg = W.partitionBy("g")
    if min_docs <= 1:
        hits = sh.select("doc_id", "pos")
    elif min_docs == 2:
        hits = (
            sh.withColumn("_dup", F.min("doc_id").over(wg) != F.max("doc_id").over(wg))
            .filter(F.col("_dup"))
            .select("doc_id", "pos")
        )
    else:
        hits = (
            sh.withColumn("_dr", F.dense_rank().over(wg.orderBy("doc_id")))
            .withColumn("_nd", F.max("_dr").over(wg))
            .filter(F.col("_nd") >= min_docs)
            .select("doc_id", "pos")
        )
    w = W.partitionBy("doc_id").orderBy("pos")
    brk = F.when(
        F.lag("pos").over(w).isNull() | (F.col("pos") - F.lag("pos").over(w) > n), 1
    ).otherwise(0)
    islands = hits.withColumn(
        "island", F.sum(brk).over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + n).alias("span_end"),
            F.count("*").alias("n_grams"),
        )
        .drop("island")
    )


def exact_substring_matches(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    max_postings: int | None = None,
) -> DataFrame:
    """Individual maximal common substrings of token length >= ``n``
    between every pair of distinct documents — the suffix-array answer
    (what ``infini-gram``/ExactSubstr tooling reports), from posting
    lists.

    A maximal common substring of length L >= n between docs A and B is
    EXACTLY a maximal run of L-n+1 consecutive n-gram matches on one
    (A, B, pos_a - pos_b) diagonal, so: positional grams -> cross-doc
    gram self-join (posting-list shape, quadratic within a posting list —
    ``max_postings`` caps it for the scale path at a documented recall
    trade) -> gaps-and-islands per diagonal.

    Returns (doc_id, other_id, pos, other_pos, length): both directions
    of each pair, token offsets, length in tokens. Deterministic and
    integer-only.
    """
    sh = (
        ensure_parallelism(docs)
        .select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(word_shingles(F.col(text_col), n)).alias("pos", "gram"),
        )
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "gram")
        # eager hinge (r14): both self-join sides (and the optional cap's
        # frequency pass) otherwise re-run the tokenize+explode — under a
        # broadcast plan there is no exchange to reuse between them
        .localCheckpoint(eager=True)
    )
    if max_postings is not None:
        keep = (
            sh.groupBy("gram")
            .agg(F.count("*").alias("pf"))
            .filter(F.col("pf") <= max_postings)
            .select("gram")
        )
        sh = sh.join(keep, "gram", "left_semi")
    a = sh.alias("a")
    b = sh.alias("b")
    m = a.join(
        b,
        (F.col("a.gram") == F.col("b.gram")) & (F.col("a.doc_id") != F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_id"),
        F.col("a.pos").alias("pos"),
        F.col("b.doc_id").alias("other_id"),
        (F.col("a.pos") - F.col("b.pos")).alias("diag"),
    )
    wd = W.partitionBy("doc_id", "other_id", "diag").orderBy("pos")
    brk = F.when(
        F.lag("pos").over(wd).isNull() | (F.col("pos") - F.lag("pos").over(wd) > 1), 1
    ).otherwise(0)
    return (
        m.withColumn(
            "run", F.sum(brk).over(wd.rowsBetween(W.unboundedPreceding, W.currentRow))
        )
        .groupBy("doc_id", "other_id", "diag", "run")
        .agg(F.min("pos").alias("pos"), (F.max("pos") - F.min("pos") + n).alias("length"))
        .select(
            "doc_id",
            "other_id",
            "pos",
            (F.col("pos") - F.col("diag")).alias("other_pos"),
            "length",
        )
    )


def exact_substring_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    max_postings: int | None = None,
) -> DataFrame:
    """TRUE ExactSubstr maximal spans (Lee et al. 2022, 'Deduplicating
    Training Data Makes Language Models Better', arXiv:2107.06499 —
    reference behavior, not code): for each document, every maximal token
    interval covered by some substring of length >= ``n`` tokens that
    occurs VERBATIM in at least one other document.

    The chain requirement is the suffix-array semantics itself: a maximal
    common substring of token length L >= n between docs A and B appears
    as EXACTLY a maximal run of L-n+1 consecutive gram matches on one
    (A, B, pos_a - pos_b) diagonal, so

    COVERAGE-EQUIVALENCE THEOREM (pinned by a brute-force reference in
    tests/test_exact_substr.py, fixed corpus + hypothesis property): the
    merged per-doc spans equal the union of [p, p+n) over exactly the
    positional grams occurring in >= 2 distinct documents — a gram occurs
    in >= 2 distinct docs iff some cross-doc diagonal match exists for
    each of its occurrences, and the island break condition gap > n is
    exactly interval disjointness (gap == n is a touching, hence merged,
    interval under the end-exclusive bounds).

    Since the r14 optimization round the operator COMPUTES through the
    theorem (r15 tightened the physical shape): one g-keyed window pass
    flags each positional gram with "occurs in >= 2 distinct docs"
    (min(doc_id) != max(doc_id) over the gram partition) and the posting
    length, then per-doc gaps-and-islands. That is linear in the gram
    stream with exactly ONE full-stream exchange before the per-doc
    window — the diagonal self-join it replaces was quadratic within
    every posting list (the same O(sum |posting|^2) term the PPJoin
    filters bound elsewhere), and at 100 TB the posting lists of
    boilerplate grams are exactly the ones that explode. The per-partner diagonal tier remains
    ``exact_substring_matches`` (offsets, partners, true lengths — which
    no per-doc island chain can produce) with its own brute-force tests;
    the spans' correctness is pinned directly against the independent
    brute-force span reference, not against the diagonal form.

    Returns (doc_id, span_start, span_end, span_len): token offsets, end
    exclusive, integer-only. Use ``scrub_exact_substrings`` to remove the
    spans and reassemble the surviving tokens.
    """
    # 8-byte gram fingerprints — the duplicated_line_hashes /
    # repeated_ngram_spans discipline (see that docstring for the
    # collision bound): the frequency pass moves fingerprints, never
    # n-gram strings
    sh = (
        ensure_parallelism(docs)
        .select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(word_shingles(F.col(text_col), n)).alias("pos", "gram"),
        )
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("pos"),
            F.xxhash64("gram").alias("g"),
        )
    )
    # nd >= 2 and the posting-length cap as ONE g-keyed window pass (r15
    # optimization round, VERDICT r14 #2): min(doc_id) != max(doc_id) over
    # the gram's partition IS "occurs in >= 2 distinct docs", and count(*)
    # is the posting length (the cap's unit — drop the WHOLE gram,
    # matching the diagonal tier). The r14 shape (checkpoint + groupBy(g)
    # aggregate + left-semi probe) paid one eager barrier and touched the
    # gram stream through TWO g-keyed operators (the aggregate exchange
    # and, at scale where the duplicated-gram set outgrows a broadcast,
    # the semi-join's own exchange); the window form pays exactly one
    # full-stream exchange on g and nothing else — strictly fewer passes
    # both locally and at 100 TB, and sh now has a single consumer so no
    # materialization hinge is needed at all.
    wg = W.partitionBy("g")
    gated = sh.withColumn(
        "_dup", F.min("doc_id").over(wg) != F.max("doc_id").over(wg)
    )
    if max_postings is not None:
        gated = gated.withColumn("_pf", F.count("*").over(wg)).filter(
            F.col("_pf") <= max_postings
        )
    hits = gated.filter(F.col("_dup")).select("doc_id", "pos")
    w = W.partitionBy("doc_id").orderBy("pos")
    brk = F.when(
        F.lag("pos").over(w).isNull() | (F.col("pos") - F.lag("pos").over(w) > n), 1
    ).otherwise(0)
    islands = hits.withColumn(
        "isl", F.sum(brk).over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    )
    return (
        islands.groupBy("doc_id", "isl")
        .agg(F.min("pos").alias("span_start"), (F.max("pos") + n).alias("span_end"))
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_len"),
        )
    )


def scrub_exact_substrings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    max_postings: int | None = None,
) -> DataFrame:
    """Remove every cross-document repeated span (>= ``n`` tokens, per
    ``exact_substring_spans``) from each document and reassemble the
    surviving tokens in order — span-granularity scrubbing, the ExactSubstr
    dedup action itself.

    The span table rides back to the corpus as one per-doc array join;
    token filtering is a single JVM higher-order ``filter`` with an
    ``exists`` membership probe per token index — no Python in the path,
    no extra shuffle beyond the span computation. Docs with no spans pass
    through byte-identical. Returns the input columns with ``text``
    replaced by the scrubbed text plus ``n_scrubbed_tokens``.
    """
    from demo_otel_parquet_antalya_spark.functions.text import tokens

    spans = exact_substring_spans(docs, id_col, text_col, n, max_postings)
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("spans")
    )
    joined = docs.join(
        per_doc, docs[id_col] == per_doc["doc_id"], "left"
    ).drop("doc_id") if id_col != "doc_id" else docs.join(per_doc, "doc_id", "left")
    toks = tokens(F.col(text_col))
    spans_arr = F.coalesce("spans", F.array())
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(
            spans_arr,
            lambda s: (i >= s["span_start"]) & (i < s["span_end"]),
        ),
    )
    return (
        joined.withColumn("__kept", kept)
        .withColumn("n_scrubbed_tokens", (F.size(toks) - F.size("__kept")).cast("long"))
        # docs with NO spans keep their original text byte-identical — the
        # concat_ws rebuild would whitespace-normalize them (tabs/runs of
        # spaces/newlines collapse) despite scrubbing nothing (ADVICE r4 #3)
        .withColumn(
            text_col,
            F.when(F.col("spans").isNull(), F.col(text_col)).otherwise(
                F.concat_ws(" ", "__kept")
            ),
        )
        .drop("__kept", "spans")
    )


def minhash_index_write(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 7,
    sig_impl: str = "pandas",
) -> None:
    """Persist the corpus's banded LSH index as parquet partitioned by band:
    (bucket, id) under band=N directories.

    This is what makes dedup INCREMENTAL at ingestion time: the corpus's
    signature pass is paid once, and every new batch probes the stored
    buckets instead of re-signing 100 TB. Partitioning by band means a probe
    batch's band-keyed join prunes to the partitions it actually collides
    with, and index maintenance (append a new batch's own bands after it is
    admitted) is a partition-local append."""
    rows_per_band = num_hashes // bands
    sig_fn = minhash_signatures_pandas if sig_impl == "pandas" else minhash_signatures
    sigs = sig_fn(docs, id_col, text_col, n, num_hashes, seed)
    (
        banded_buckets(sigs, bands, rows_per_band)
        .write.mode("overwrite")
        .partitionBy("band")
        .parquet(path)
    )


def minhash_dedup_incremental(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 7,
    sig_impl: str = "pandas",
) -> DataFrame:
    """Dedup a NEW batch against an already-indexed corpus: returns
    (id_new, id_old, jaccard >= threshold) without recomputing anything
    corpus-wide.

    Cost at 100 TB is proportional to the BATCH, not the corpus:
    - signature pass over the new batch only;
    - band-keyed equi-join of the batch's (band, bucket) rows against the
      stored index (shuffle sized by the batch; the index side is a
      partition-pruned scan);
    - exact-Jaccard verification re-shingles only docs appearing in some
      candidate pair — the batch's near-dup sliver plus the corpus rows it
      collided with (semi-join pruned out of ``corpus_docs``).

    Same signature parameters MUST be used as at index-write time (banding
    is parameter-dependent); new/old id domains are assumed disjoint.
    """
    spark = new_docs.sparkSession
    rows_per_band = num_hashes // bands
    sig_fn = minhash_signatures_pandas if sig_impl == "pandas" else minhash_signatures
    new_banded = banded_buckets(
        sig_fn(new_docs, id_col, text_col, n, num_hashes, seed), bands, rows_per_band
    ).select(F.col("id").alias("id_new"), "band", "bucket")
    idx = spark.read.parquet(index_path).select(
        F.col("id").alias("id_old"), "band", "bucket"
    )
    cands = (
        new_banded.join(idx, ["band", "bucket"])
        .select("id_new", "id_old")
        .distinct()
        # eager hinge materialization (r14, same rationale as
        # minhash_dedup_pairs): three consumers, batch-sized
        .localCheckpoint(eager=True)
    )
    new_cand = new_docs.join(
        F.broadcast(cands.select(F.col("id_new").alias(id_col)).distinct()),
        id_col,
        "left_semi",
    )
    old_cand = corpus_docs.join(
        F.broadcast(cands.select(F.col("id_old").alias(id_col)).distinct()),
        id_col,
        "left_semi",
    )
    sh_new = shingle_sets(new_cand, id_col, text_col, n)
    sh_old = shingle_sets(old_cand, id_col, text_col, n)
    sizes_new = sh_new.groupBy("id").agg(F.count("*").alias("n_new"))
    sizes_old = sh_old.groupBy("id").agg(F.count("*").alias("n_old"))
    inter = (
        sh_new.select(F.col("id").alias("id_new"), "s")
        .join(sh_old.select(F.col("id").alias("id_old"), "s"), "s")
        .groupBy("id_new", "id_old")
        .agg(F.count("*").alias("c"))
        .join(cands, ["id_new", "id_old"], "left_semi")
    )
    jac = F.col("c") / (F.col("n_new") + F.col("n_old") - F.col("c"))
    return (
        inter.join(sizes_new.select(F.col("id").alias("id_new"), "n_new"), "id_new")
        .join(sizes_old.select(F.col("id").alias("id_old"), "n_old"), "id_old")
        .select("id_new", "id_old", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# Line-level dedup (RefinedWeb / MassiveText style)
# ---------------------------------------------------------------------------


def line_windows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_tokens: int = 12,
    delimiter: str | None = None,
) -> DataFrame:
    """Segment documents into 'lines' -> (id, line_no, line).

    ``delimiter`` given (e.g. ``"\\n"``): physical-line split, the
    RefinedWeb/MassiveText definition (empty lines dropped, whitespace
    trimmed). ``delimiter=None``: deterministic fixed-width fallback —
    non-overlapping ``line_tokens``-token windows — for corpora whose
    newline structure was lost upstream (the synthetic testdata corpus is
    single-line, so the registered query uses this path; both paths share
    every downstream operator).

    Map-side only: tokenize + slice inside whole-stage codegen, one
    posexplode. No shuffle.
    """
    if delimiter is not None:
        lines = df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), delimiter)).alias("line_no", "line"),
        )
        return lines.select(
            id_col, "line_no", F.trim(F.col("line")).alias("line")
        ).filter(F.length("line") > 0)
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_lines = F.greatest(F.ceil(F.size("toks") / line_tokens).cast("int"), F.lit(1))
    return df.select(F.col(id_col), toks.alias("toks")).select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_lines - 1),
                lambda i: F.concat_ws(" ", F.slice("toks", i * line_tokens + 1, line_tokens)),
            )
        ).alias("line_no", "line"),
    )


def duplicated_line_hashes(
    lines: DataFrame, id_col: str = "doc_id", min_docs: int = 2
) -> DataFrame:
    """Hashes of lines appearing in >= ``min_docs`` DISTINCT documents.

    The corpus-wide shuffle carries 8-byte xxhash64 keys, never line text —
    at 100 TB the line-frequency pass moves ~16 bytes/line instead of the
    raw strings (the same trick as the MinHash signature pass). countDistinct
    is map-side partially aggregated on (hash, id) first.
    """
    return (
        lines.select(F.xxhash64("line").alias("line_hash"), F.col(id_col))
        .groupBy("line_hash")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("line_hash")
    )


def line_level_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_tokens: int = 12,
    min_docs: int = 2,
    delimiter: str | None = None,
) -> DataFrame:
    """Per-document duplicated-line exposure: (id, n_lines, n_dup_lines,
    dup_line_frac), ordered by exposure. The detection half of line dedup —
    'which documents are assembled from boilerplate lines seen elsewhere'.
    """
    lines = line_windows(df, id_col, text_col, line_tokens, delimiter)
    # ONE corpus pass, 16 bytes/line, line TEXT never shuffled: each line
    # occurrence is flagged "appears in >= min_docs distinct docs" by a
    # line_hash-keyed window (r15, the exact_substring_spans shape —
    # min != max over the hash partition for the min_docs=2 default, the
    # dense_rank count otherwise), then one per-doc aggregate computes
    # totals and dup counts together. The r14 form (checkpoint + three
    # consumers: frequency groupBy, per-doc totals, dup-hit join+groupBy)
    # paid an eager barrier, two id-keyed exchanges and a join; this pays
    # one line_hash exchange + one id exchange, no barrier, no join.
    hashed = lines.select(F.col(id_col), F.xxhash64("line").alias("line_hash"))
    wl = W.partitionBy("line_hash")
    if min_docs <= 1:
        is_dup = F.lit(True)
    elif min_docs == 2:
        is_dup = F.min(id_col).over(wl) != F.max(id_col).over(wl)
    else:
        dr = F.dense_rank().over(wl.orderBy(id_col))
        is_dup = F.max(dr).over(wl) >= min_docs
    per_doc = (
        hashed.withColumn("_dup", is_dup)
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("_dup").cast("long")).alias("n_dup_lines"),
        )
        .filter(F.col("n_dup_lines") >= 1)
    )
    frac = F.col("n_dup_lines") / F.col("n_lines")
    return per_doc.select(
        id_col,
        "n_lines",
        "n_dup_lines",
        F.round(frac, 4).alias("dup_line_frac"),
    ).orderBy(F.col("dup_line_frac").desc(), id_col)


def line_level_scrub(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_tokens: int = 12,
    min_docs: int = 2,
    delimiter: str | None = None,
    joiner: str = " ",
) -> DataFrame:
    """The dedup ACTION: drop every occurrence of a cross-document duplicated
    line and reassemble the survivors in original order -> (id, n_kept_lines,
    clean_text), for documents that lost >= 1 line and kept >= 1.

    Reassembly is a per-document collect_list + array_sort — bounded by a
    single document's size by definition, never by corpus size.
    """
    lines = line_windows(df, id_col, text_col, line_tokens, delimiter)
    hashed = lines.withColumn("line_hash", F.xxhash64("line"))
    dup = duplicated_line_hashes(lines, id_col, min_docs)
    affected = hashed.join(dup, "line_hash", "left_semi").select(id_col).distinct()
    kept = hashed.join(dup, "line_hash", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count("*").alias("n_kept_lines"),
        F.concat_ws(
            joiner,
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_no", "line"))),
                lambda s: s.getField("line"),
            ),
        ).alias("clean_text"),
    )
    return rebuilt.join(affected, id_col, "left_semi").orderBy(id_col)


def cluster_density(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Per-connected-component graph diagnostic over a verified near-dup
    pair set: (cluster_id, n_nodes, n_edges, density, shape) where shape is
    'clique' (all-mutual duplicates — safe to keep one canonical) vs
    'partial' (a transitive chain — min-label merging may over-group).

    One label join + two broadcast-sized aggregates on top of
    ``connected_components``; the pair graph is the near-dup sliver, so
    every frame here is tiny relative to the corpus.
    """
    labels = connected_components(pairs, id_a=id_a, id_b=id_b)
    edges_per = (
        pairs.join(labels.withColumnRenamed("id", id_a), id_a)
        .groupBy("cluster_id")
        .agg(F.count("*").alias("n_edges"))
    )
    nodes_per = labels.groupBy("cluster_id").agg(F.count("*").alias("n_nodes"))
    possible = F.col("n_nodes") * (F.col("n_nodes") - 1)
    return (
        nodes_per.join(edges_per, "cluster_id")
        .select(
            "cluster_id",
            "n_nodes",
            "n_edges",
            F.round(2.0 * F.col("n_edges") / possible, 4).alias("density"),
            F.when(2 * F.col("n_edges") == possible, F.lit("clique"))
            .otherwise(F.lit("partial"))
            .alias("shape"),
        )
        .orderBy("cluster_id")
    )


def jaccard_pairs_ppjoin(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact Jaccard pairs >= threshold via PPJoin-style prefix filtering
    (Bayardo/Ma/Srikant WWW'07 AllPairs; Xiao et al. WWW'08 PPJoin).

    Same contract and output as ``ngram_jaccard_pairs`` — (id_a, id_b,
    jaccard), exact, no recall loss — but candidate generation joins only
    each document's PREFIX shingles instead of every shingle: under one
    global shingle order (ascending corpus frequency, shingle text as
    tie-break), two sets with J >= t must share a shingle within their
    first ``|S| - ceil(t*|S|) + 1`` shingles (pigeonhole on the overlap
    bound ``inter >= t/(1+t) * (|A|+|B|) >= t*|A|``). The posting lists
    that enter the self-join are built from each doc's rarest ~(1-t)
    fraction of shingles, so the ubiquitous boilerplate shingles that
    dominate the baseline's shuffle never generate candidates — the
    higher the threshold, the smaller the join. Verification recomputes
    the exact intersection for candidate pairs only, via a semi-join
    prune of the full shingle stream.

    Candidate generation applies all three exact PPJoin filters, so the
    verification stage sees candidates, not the corpus (r14 optimization
    round — the prefix-only form produced 118,826 candidates for a ~50-pair
    answer at sf0.1/t=0.8, which made the verification self-join degenerate
    to the brute posting-list join over nearly every doc):

    - prefix filter (AllPairs): only the first ``|S| - ceil(t*|S|) + 1``
      shingles under the global order enter the join;
    - length filter: J >= t forces ``t * max(|A|,|B|) <= min(|A|,|B|)``;
    - ACCUMULATED positional filter (PPJoin's overlap accumulation, r15):
      the common shingles lying in both prefixes are exactly the first
      ``pc`` commons of the pair under the shared global order, so every
      other common shingle sits at rank > ra_max in A and > rb_max in B
      (the maxima over those collisions), giving the exact bound
      ``|A ∩ B| <= pc + min(|A|-ra_max, |B|-rb_max)``, which must reach
      the overlap bound ``ceil(t/(1+t) * (|A|+|B|))`` (J >= t ⇔
      c >= t/(1+t)(|A|+|B|)). For a single collision this is the r14
      first-common-shingle witness bound; with more collisions it is
      strictly tighter — recall exactly preserved, candidates only fewer.

    The prefix/overlap bounds are computed FP-safely: ``ceil(t * n)`` on
    doubles can round UP past the exact integer (e.g. 0.54 * 450 ->
    243.00000000000003, ceil 244), shortening the prefix below the
    pigeonhole guarantee and silently dropping qualifying pairs.
    Subtracting a 1e-9 epsilon before every ceil errs toward a one-longer
    prefix / one-smaller required overlap (a pure perf cost, never a
    recall loss).

    The shingle stream is materialized ONCE (eager localCheckpoint, the
    graph operators' discipline — ContextCleaner frees the blocks on
    GC): it feeds the frequency count, the ranked prefix and the
    verification prune, and without truncation each one re-scans and
    re-explodes the full corpus — measured 2x end-to-end cold at sf0.1
    (11.4 s -> 5.7 s; the warm gap shrinks only because the page cache
    hides the re-scans, which nothing hides at warehouse scale). A LAZY
    checkpoint does not help the first action: the subtrees race within
    one job before any block lands. The ranked prefix and the candidate
    pair set are checkpointed for the same reason: each feeds multiple
    downstream keys, and the candidate set (near-dup-sliver-sized) is the
    hinge between generation and verification.
    """
    # 8-byte shingle fingerprints through the whole tier (r14 optimization
    # round, the duplicated_line_hashes discipline): the frequency pass,
    # the ranked prefix, the candidate join and the verification
    # intersection all shuffle/hash fixed-width longs instead of ~20-byte
    # shingle strings. Correctness: the prefix/positional guarantees hold
    # under ANY fixed total shingle order — (cnt, fingerprint) is as valid
    # a tie-break as (cnt, text) — and the verified intersection counts
    # are exact up to xxhash64 collisions (~d^2/2^65 across the corpus's
    # distinct shingles; zero at every tested SF, the bound the line-dedup
    # tier has shipped on since r4). NOTE the exactness ASYMMETRY (ADVICE
    # r14): the brute baseline ngram_jaccard_pairs stays string-exact, so
    # a corpus-wide fingerprint collision would surface as a baseline/
    # oracle MISMATCH rather than a silent approximation — that is the
    # designed failure mode; a corpus with d approaching 2^32 distinct
    # shingles (collision odds ~1e-4) should re-evaluate the bound before
    # trusting the hash tier against the exact one.
    sh = (
        ensure_parallelism(df)
        .select(
            F.col(id_col).alias("id"),
            F.explode(word_shingles(F.col(text_col), n)).alias("s"),
        )
        .select("id", F.xxhash64("s").alias("s"))  # BEFORE the distinct:
        # the set-dedup shuffle itself then moves fixed-width keys
        .distinct()
        .localCheckpoint(eager=True)
    )
    # corpus frequency as a count over the s-partition (r15): the separate
    # groupBy(s) aggregate + join-back paid an aggregate exchange AND a
    # second pass over the shingle stream; the window pays exactly one
    # full-stream exchange on s, then the id-keyed pass proceeds as before
    w_s = W.partitionBy("s")
    w_id = W.partitionBy("id")
    prefix = (
        sh.withColumn("cnt", F.count("*").over(w_s))
        .withColumn("n_sh", F.count("*").over(w_id))
        .withColumn("rk", F.row_number().over(w_id.orderBy("cnt", "s")))
        .filter(
            F.col("rk")
            <= F.col("n_sh")
            - F.ceil(F.lit(threshold) * F.col("n_sh") - F.lit(1e-9))
            + 1
        )
        .select("id", "s", "rk", "n_sh")
        .localCheckpoint(eager=True)
    )
    a = prefix.alias("a")
    b = prefix.alias("b")
    # ACCUMULATED positional filter (r15, PPJoin's own overlap
    # accumulation): under the shared global order, the common shingles
    # lying in BOTH prefixes are exactly the FIRST pc commons of the pair
    # (ranks are monotone in the order, so a common shingle below another
    # common shingle's ranks is in every prefix the other is in). Every
    # remaining common shingle therefore sits at rank > ra_max in A and
    # > rb_max in B, giving the exact bound
    #   |A ∩ B| <= pc + min(|A| - ra_max, |B| - rb_max),
    # which must reach ceil(t/(1+t) * (|A|+|B|)). For pc = 1 this equals
    # the old per-collision witness bound; for pc >= 2 it is STRICTLY
    # tighter (ra_max >= ra_first + pc - 1), so recall is preserved and
    # the candidate set can only shrink. The collision groupBy replaces
    # the old distinct — the same pair-keyed exchange, now carrying the
    # rank maxima it needs for the bound.
    coll = a.join(
        b,
        (F.col("a.s") == F.col("b.s"))
        & (F.col("a.id") < F.col("b.id"))
        # length filter
        & (
            F.least(F.col("a.n_sh"), F.col("b.n_sh"))
            >= F.ceil(
                F.lit(threshold) * F.greatest(F.col("a.n_sh"), F.col("b.n_sh"))
                - F.lit(1e-9)
            )
        ),
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.col("a.rk").alias("ra"),
        F.col("b.rk").alias("rb"),
        F.col("a.n_sh").alias("na"),
        F.col("b.n_sh").alias("nb"),
    )
    # required overlap c >= t/(1+t) * (|A|+|B|), epsilon erring DOWN
    min_ov = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (F.col("na") + F.col("nb"))
        - F.lit(1e-9)
    )
    cand = (
        coll.groupBy("id_a", "id_b")
        .agg(
            F.count("*").alias("pc"),
            F.max("ra").alias("ra_max"),
            F.max("rb").alias("rb_max"),
            F.max("na").alias("na"),  # constant per id; max picks it
            F.max("nb").alias("nb"),
        )
        .filter(
            F.col("pc")
            + F.least(F.col("na") - F.col("ra_max"), F.col("nb") - F.col("rb_max"))
            >= min_ov
        )
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    # verify candidates exactly: prune the shingle stream to candidate ids,
    # then count the true intersection per pair
    cand_ids = cand.select(F.col("id_a").alias("id")).union(
        cand.select(F.col("id_b").alias("id"))
    ).distinct()
    sh_c = sh.join(cand_ids, "id")
    ca = sh_c.alias("ca")
    cb = sh_c.alias("cb")
    inter = (
        ca.join(cb, (F.col("ca.s") == F.col("cb.s")) & (F.col("ca.id") < F.col("cb.id")))
        .select(F.col("ca.id").alias("id_a"), F.col("cb.id").alias("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("c"))
    )
    # every candidate id has >= 1 prefix row (it collided on one), so the
    # checkpointed prefix stream doubles as the per-doc size table — the
    # old groupBy(id) size pass over the full shingle stream is gone, and
    # one inner join both semi-filters inter to candidate pairs and
    # attaches (na, nb)
    psz = prefix.select("id", "n_sh").distinct()
    cand_sz = cand.join(
        psz.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na")), "id_a"
    ).join(psz.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb")), "id_b")
    jac = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    return (
        inter.join(cand_sz, ["id_a", "id_b"])
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
