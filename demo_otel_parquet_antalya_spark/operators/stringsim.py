"""Edit-distance string similarity join (Ed-Join family — Xiao, Wang, Lin
VLDB'08; prefix filtering per Chaudhuri, Ganti, Kaushik ICDE'06).

Finds all pairs within Levenshtein distance ``d`` WITHOUT the all-pairs
cross product:

1. every string emits its positional q-gram multiset as occurrence-numbered
   tokens ``(gram, occ#)`` — occurrence numbering makes the multiset overlap
   bound sound when a gram repeats inside one string;
2. prefix filter: under ONE global token order (ascending corpus frequency,
   token text as tie-break), two strings with ed <= d must share a token
   within their first ``q*d + 1`` tokens — the pigeonhole on the bound
   ``overlap >= max(|Ga|,|Gb|) - q*d``. Only these prefix tokens enter the
   join, so posting lists are built from each string's RAREST grams (the
   ubiquitous boilerplate grams never generate candidates);
3. candidates dedup to distinct id pairs and verify with one exact
   levenshtein call per pair.

Scale shape: token-frequency count and the prefix join are plain keyed
shuffles (map-side-combined count, equi-join on token); per-string state is
one row_number window keyed by id. Verification cost is |candidates|, which
the prefix filter keeps near |true pairs|. Exact output (no recall loss) —
which is what lets the DuckDB brute-force levenshtein join serve as the
oracle.

The filter's overlap bound needs every string to have at least one
guaranteed shared token: len(s) >= q * (d + 1). The operator checks the
corpus min length once and refuses (rather than silently missing pairs) if
the guarantee would not hold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.util import ensure_parallelism


def edit_distance_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    d: int = 1,
    q: int = 2,
    validate_lengths: bool = True,
) -> DataFrame:
    """All (id_a, id_b, dist) with id_a < id_b and levenshtein <= d. Exact."""
    raw = df.select(F.col(id_col).alias("id"), F.col(str_col).alias("s"))
    # fan the scan out first: a small-SF single-file input otherwise runs
    # the gram explode + candidate probe + levenshtein verify on ONE task
    base = ensure_parallelism(raw)
    if validate_lengths:
        row = raw.agg(F.min(F.length("s")).alias("m")).first()
        if row.m is not None and row.m < q * (d + 1):
            raise ValueError(
                f"prefix-filter guarantee needs len >= q*(d+1) = {q * (d + 1)}; "
                f"corpus min length is {row.m}"
            )
    grams = F.element_at(
        F.transform(
            F.array(F.col("s")),
            lambda s: F.transform(
                F.sequence(F.lit(1), F.length(s) - (q - 1)),
                lambda i: F.substr(s, i, F.lit(q)),
            ),
        ),
        1,
    )
    toks = base.select("id", F.posexplode(grams).alias("pos", "g"))
    occ_w = W.partitionBy("id", "g").orderBy("pos")
    # 8-byte token keys (r14 optimization round): the frequency pass, the
    # ranked prefix and the collision self-join shuffle xxhash64 of the
    # occurrence-numbered gram instead of the string. EXACT, not
    # probabilistic: equal tokens hash equal (no candidate lost), and a
    # colliding unequal token only ADDS a candidate that the levenshtein
    # verification below kills.
    toks = toks.withColumn(
        "tok",
        F.xxhash64(
            F.concat_ws("", "g", F.row_number().over(occ_w).cast("string"))
        ),
    ).select("id", "tok")
    freq = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    rank_w = W.partitionBy("id").orderBy("cnt", "tok")
    prefix = (
        toks.join(freq, "tok")
        .withColumn("rk", F.row_number().over(rank_w))
        .filter(F.col("rk") <= q * d + 1)
        .select("id", "tok")
    )
    a = prefix.alias("a")
    b = prefix.alias("b")
    # ids only through the collision join + distinct: a candidate pair
    # collides on up to q*d+1 prefix tokens, so carrying both strings
    # through the dedup shuffle would move each string that many times —
    # the strings rejoin once per side AFTER the multiplicity collapses
    cand = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # raw, not the fanned-out base: these sides build broadcast hash
    # relations, and a round-robin exchange under a BroadcastExchange is
    # pure overhead (r15, same fix as the deletion tier)
    strs = raw
    cand = (
        cand.join(strs.select(F.col("id").alias("id_a"), F.col("s").alias("s_a")), "id_a")
        .join(strs.select(F.col("id").alias("id_b"), F.col("s").alias("s_b")), "id_b")
    )
    dist = F.levenshtein(F.col("s_a"), F.col("s_b"))
    return cand.select(
        "id_a", "id_b", dist.cast("int").alias("dist")
    ).filter(F.col("dist") <= d)


def _deletion_variants(s, max_del: int):
    """array<string> of all strings reachable by deleting up to ``max_del``
    characters (the Mor-Fraenkel / FastSS / SymSpell deletion
    neighborhood), as one JVM HOF expression. Sizes: 1 + L for d=1,
    + L*(L-1)/2 for d=2."""
    one = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(F.substr(s, F.lit(1), i - 1), F.substr(s, i + 1, F.length(s))),
    )
    out = F.concat(F.array(s), one)
    if max_del >= 2:
        two = F.flatten(
            F.transform(
                one,
                lambda v: F.transform(
                    F.sequence(F.lit(1), F.length(v)),
                    lambda i: F.concat(
                        F.substr(v, F.lit(1), i - 1), F.substr(v, i + 1, F.length(v))
                    ),
                ),
            )
        )
        out = F.concat(out, two)
    return F.array_distinct(out)


def edit_distance_join_deletions(
    df: DataFrame,
    id_col: str,
    str_col: str,
    d: int = 1,
) -> DataFrame:
    """Exact Levenshtein join via deletion-neighborhood blocking
    (Mor-Fraenkel 1982; FastSS; the SymSpell index): two strings are
    within edit distance d only if their <=d-deletion neighborhoods
    intersect, so an equi-join on deletion variants + one levenshtein
    verify per candidate finds every pair.

    The complementary exact tier to ``edit_distance_join``: q-gram prefix
    filtering discriminates on LOCAL substrings and degrades when the
    corpus shares long runs (serial-number keys like 'Customer#000000042'
    — measured 10M candidates for a 262k-pair answer at sf0.1); deletion
    variants carry the FULL string content minus d characters, so a
    variant collision already implies near-total agreement and candidates
    track the answer. The price is write amplification — (1 + L) variants
    per string at d=1, +L(L-1)/2 at d=2 — which is why this is the
    short-key path (names, SKUs, codes) and Ed-Join the long-string path.
    Supports d in {1, 2}.
    """
    if d not in (1, 2):
        raise ValueError("deletion-neighborhood join supports d in {1, 2}")
    raw = df.select(F.col(id_col).alias("id"), F.col(str_col).alias("s"))
    # fan the scan out first: a small-SF single-file input otherwise runs
    # the variant explode + candidate probe + levenshtein verify on ONE task
    base = ensure_parallelism(raw)
    # 8-byte variant keys: the collision self-join shuffles xxhash64 of
    # each deletion variant instead of the near-full-length string. EXACT —
    # equal variants hash equal, and a colliding unequal variant only ADDS
    # a candidate that the levenshtein verification kills. (~L variants per
    # string at d=1, so this roughly halves the blocking shuffle's bytes.)
    # NOT hinged (r15 interleaved A/B, best-of-4 ×2): under the local
    # broadcast plan the explode runs once per side, but an eager
    # checkpoint measured WORSE (wall 1.82-1.88 s vs 1.67-1.74 s, tasks
    # 78 -> 109 — the barrier plus checkpoint-scan costs more than the
    # cheap JVM HOF explode it saves), and at scale the self-join is an
    # SMJ whose two identical sides share ONE exchange via ReusedExchange
    # — the double-evaluation only exists in the broadcast regime, where
    # it is cheap by definition (unlike the r14-hinged Arrow kernels,
    # re-confirmed this round: minhash hinge vs lazy-cache parent =
    # 29 vs 52 stages, 143 vs 583 tasks, ~-25% wall).
    variants = base.select(
        "id",
        F.explode(
            F.array_distinct(
                F.transform(_deletion_variants(F.col("s"), d), lambda v: F.xxhash64(v))
            )
        ).alias("v"),
    )
    a = variants.alias("a")
    b = variants.alias("b")
    # ids only through the collision join + distinct: a d=1 pair collides
    # on up to ~L shared deletion variants, so carrying both strings
    # through the dedup shuffle would move each string ~L times — the
    # strings rejoin once per side AFTER the multiplicity collapses
    cand = (
        a.join(b, (F.col("a.v") == F.col("b.v")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # the string rejoin reads the RAW frame, not the fanned-out base: these
    # sides build broadcast hash relations, and the round-robin exchange
    # the explode needs is pure overhead under a BroadcastExchange (r15 —
    # the before-plan carried Exchange -> BroadcastExchange on both sides)
    strs = raw
    cand = (
        cand.join(strs.select(F.col("id").alias("id_a"), F.col("s").alias("s_a")), "id_a")
        .join(strs.select(F.col("id").alias("id_b"), F.col("s").alias("s_b")), "id_b")
    )
    dist = F.levenshtein(F.col("s_a"), F.col("s_b"))
    return cand.select("id_a", "id_b", dist.cast("int").alias("dist")).filter(
        F.col("dist") <= d
    )
