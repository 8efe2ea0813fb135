"""Bloom-filter pre-join pruning, DataFrame-native.

The 100 TB join problem this solves: a fact-to-dimension semi join where
the dimension's KEY SET is too big to broadcast as rows but its BLOOM
FILTER isn't (a 100 M-key set fits ~180 MB of rows but ~120 KB of bloom
bits at 1% fp). Building the filter is one linear pass + a tiny shuffle
(m/64 words); probing is a map-side expression on the fact scan — rows
that can't join die BEFORE the shuffle, which is exactly what Spark's
internal runtime row-filters do (the `bloom_filter_agg` expression is not
SQL-exposed, so this reimplements the pattern with public primitives).

Guarantees: NO false negatives (every joinable row survives); false
positives bounded by the classic (1 - e^{-kn/m})^k, then eliminated by
the real join that follows. Everything runs JVM-side: xxhash64 + affine
rehashing + bit_or aggregate; the probe is k bit-tests against an array
literal broadcast with the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_P = (1 << 31) - 1


def _probe_positions(key: Column, num_hashes: int, num_bits: int) -> list[Column]:
    """k bucket positions for a key: xxhash64 once, affine-rehash k times."""
    import random

    rng = random.Random(97)
    h = F.pmod(F.xxhash64(key), F.lit(_P))
    out = []
    for _ in range(num_hashes):
        a, b = rng.randrange(1, _P), rng.randrange(0, _P)
        out.append(F.pmod(h * F.lit(a) + F.lit(b), F.lit(_P)) % F.lit(num_bits))
    return out


def build_bloom(keys: DataFrame, key_col: str, num_bits: int = 1 << 16, num_hashes: int = 5) -> list[int]:
    """One pass over the key set -> the filter as a python list of longs.

    Words hold 63 bits (sign bit unused) so masks can be computed as
    pow(2, bit) — exact for powers of two — because Spark's shift
    functions take only literal shift amounts. The shuffle carries only
    (word_index, partial-OR) pairs — at most num_bits/63 rows regardless
    of key count."""
    n_words = num_bits // 63 + 1
    positions = _probe_positions(F.col(key_col), num_hashes, num_bits)
    exploded = keys.select(
        F.explode(F.array(*positions)).alias("pos")
    ).select(
        (F.col("pos") / 63).cast("long").alias("word"),
        F.pow(F.lit(2.0), (F.col("pos") % 63).cast("int")).cast("long").alias("mask"),
    )
    words = exploded.groupBy("word").agg(F.bit_or("mask").alias("bits")).collect()
    filt = [0] * n_words
    for r in words:
        filt[r.word] = r.bits
    return filt


def bloom_might_contain(
    filt: list[int], key: Column, num_hashes: int = 5, num_bits: int | None = None
) -> Column:
    """Probe expression: AND of k bit-tests against the filter literal.
    ``num_bits`` must equal the value used at build time (position modulus)."""
    if num_bits is None:
        num_bits = (len(filt) - 1) * 63
    arr = F.array(*[F.lit(w) for w in filt])
    cond = F.lit(True)
    for pos in _probe_positions(key, num_hashes, num_bits):
        word = F.element_at(arr, (pos / 63).cast("int") + 1)
        mask = F.pow(F.lit(2.0), (pos % 63).cast("int")).cast("long")
        cond = cond & (word.bitwiseAND(mask) != 0)
    return cond


def bloom_prefilter(
    big: DataFrame,
    keys: DataFrame,
    big_key: str,
    keys_key: str | None = None,
    num_bits: int = 1 << 16,
    num_hashes: int = 5,
) -> DataFrame:
    """Drop ``big`` rows whose key can't be in ``keys`` (bloom-certain),
    BEFORE any shuffle. Compose with the real join afterwards: the filter
    only removes guaranteed non-matches."""
    filt = build_bloom(keys, keys_key or big_key, num_bits, num_hashes)
    return big.filter(bloom_might_contain(filt, F.col(big_key), num_hashes, num_bits))
