"""Unigram-LM (SentencePiece-style) tokenizer training on a Spark corpus.

The second tokenizer-training family next to ``operators/bpe.py``: BPE
grows a vocabulary bottom-up by merging; the unigram LM (Kudo,
arXiv:1804.10959) starts from a LARGE seed vocabulary and fits piece
probabilities by EM over the best segmentation of every word, pruning down
to the target size. This implementation uses hard (Viterbi) EM — each
round segments every word type with the current piece log-probabilities
and re-estimates probabilities from the best-path piece counts — which is
deterministic end-to-end (Viterbi ties break on fewer-pieces, then
lexicographic), so the same corpus yields the same vocabulary on any
engine, partitioning, or run.

Distributed architecture (the same type-table split as BPE, with NO
driver-side loop over words anywhere):

- corpus -> (word, freq): one map-side-combinable aggregate;
- seed vocabulary: every substring up to ``seed_max_len`` of every word
  type explodes JVM-side (nested HOF transforms, no Python), weighted by
  word frequency; the top ``seed_size`` by weighted count is a
  TakeOrderedAndProject whose result is bounded by contract;
- each E-step is one Arrow-batched ``mapInPandas`` over the TYPE TABLE —
  per-word Viterbi is O(len^2 · max_piece_len) Python on a compact frame,
  embarrassingly parallel over types; piece counts come back through one
  map-side-combinable groupBy;
- the M-step normalization and the final prune are single aggregates.

Only the finished vocabulary (<= ``vocab_size`` rows, bounded by
contract) is ever collected, to broadcast into the next E-step's closure
— the bounded-collect pattern of the IVF centroid table.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.operators.bpe import word_frequencies
from demo_otel_parquet_antalya_spark.util import ensure_parallelism

# The E-step / encoder closures call module-level _viterbi: register the
# module for BY-VALUE cloudpickle so those mapInPandas stages ship
# self-contained to Python workers (same contract as sources/otlp_proto.py;
# regression-tested in tests/test_unigram_lm.py)
import sys as _sys

from pyspark import cloudpickle as _cloudpickle

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])


def _viterbi(word: str, logp: dict, max_len: int) -> list[str]:
    """Best segmentation of ``word`` under piece log-probs ``logp``.

    Maximizes total log-prob; ties prefer FEWER pieces, then the
    lexicographically smallest piece sequence — a total order, so the
    result is deterministic. Characters absent from ``logp`` fall back to
    a floor log-prob so coverage is total (they re-enter the vocab
    through their counts).
    """
    n = len(word)
    floor = -1e9
    # dp[i] = (score, neg_pieces, path_key, split) best for word[:i]
    NEG = (-math.inf, 0, (), -1)
    dp = [NEG] * (n + 1)
    dp[0] = (0.0, 0, (), -1)
    back = [-1] * (n + 1)
    for i in range(1, n + 1):
        best = NEG
        bj = -1
        for j in range(max(0, i - max_len), i):
            if dp[j][3] == -2:
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j > 1:
                    continue
                lp = floor  # single-char fallback keeps coverage total
            cand = (dp[j][0] + lp, dp[j][1] - 1, dp[j][2] + (piece,), j)
            # order: higher score, then fewer pieces (neg_pieces larger),
            # then lexicographically SMALLER piece-tuple. The piece tuples
            # must be compared as tuples of strings — flattened to chars
            # they all spell word[:i] and never discriminate (ADVICE r4 #2)
            if (
                bj == -1
                or (cand[0], cand[1]) > (best[0], best[1])
                or ((cand[0], cand[1]) == (best[0], best[1]) and cand[2] < best[2])
            ):
                best, bj = cand, j
        dp[i] = best
        back[i] = bj
    pieces = []
    i = n
    while i > 0:
        j = back[i]
        pieces.append(word[j:i])
        i = j
    return list(reversed(pieces))


def seed_vocabulary(
    words: DataFrame, seed_size: int = 2000, seed_max_len: int = 6
) -> DataFrame:
    """(piece, weight): every substring up to ``seed_max_len`` of every word
    type, weighted by word frequency; top ``seed_size`` by (weight desc,
    piece asc) UNION all single characters (mandatory for coverage).
    All substring generation is JVM-side HOFs — no Python until the E-step.
    """
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1), F.least(F.lit(seed_max_len), F.length("word") - i + 1)
                ),
                lambda l: F.substr(F.col("word"), i, l),
            ),
        )
    )
    exploded = words.select(F.col("freq"), F.explode(subs).alias("piece"))
    weighted = exploded.groupBy("piece").agg(F.sum("freq").alias("weight"))
    top = (
        weighted.filter(F.length("piece") > 1)
        .orderBy(F.col("weight").desc(), "piece")
        .limit(seed_size)
    )
    chars = weighted.filter(F.length("piece") == 1)
    return top.unionByName(chars).distinct()


def _estep_counts(words: DataFrame, logp: dict, max_len: int) -> DataFrame:
    """One Viterbi E-step over the type table: (piece, count) with count
    weighted by word frequency. ``logp`` rides into the closure (bounded:
    <= seed/vocab size by contract), so the stage is self-contained."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            counts: dict = {}
            for word, freq in zip(pdf["word"], pdf["freq"]):
                for piece in _viterbi(str(word), logp, max_len):
                    counts[piece] = counts.get(piece, 0) + int(freq)
            yield pd.DataFrame(
                {"piece": list(counts.keys()), "cnt": list(counts.values())}
            )

    part = words.mapInPandas(run, "piece string, cnt long")
    return part.groupBy("piece").agg(F.sum("cnt").alias("cnt"))


def train_unigram_lm(
    docs: DataFrame,
    vocab_size: int = 200,
    n_rounds: int = 3,
    text_col: str = "text",
    min_freq: int = 1,
    seed_size: int = 2000,
    seed_max_len: int = 6,
) -> DataFrame:
    """Train the unigram-LM vocabulary; returns (piece, logprob) with at
    most ``vocab_size`` rows (all corpus characters always retained).

    Rounds 1..n run Viterbi-EM at full seed width; the prune to
    ``vocab_size`` happens ONCE after the last round (by final count desc,
    piece asc, characters exempt), followed by one re-normalization.
    """
    words = ensure_parallelism(word_frequencies(docs, text_col, min_freq)).localCheckpoint(
        eager=True
    )
    seed = seed_vocabulary(words, seed_size, seed_max_len)
    total = seed.agg(F.sum("weight")).first()[0]
    # bounded collect by contract: seed_size + |charset| rows
    logp = {
        r.piece: math.log(r.weight / total) for r in seed.collect()
    }
    counts = None
    for _ in range(n_rounds):
        counts = _estep_counts(words, logp, seed_max_len).localCheckpoint(eager=True)
        tot = counts.agg(F.sum("cnt")).first()[0]
        logp = {r.piece: math.log(r.cnt / tot) for r in counts.collect()}
    kept = (
        counts.withColumn("is_char", F.length("piece") == 1)
        .orderBy(F.col("is_char").desc(), F.col("cnt").desc(), "piece")
        .limit(vocab_size)
    )
    tot_kept = kept.agg(F.sum("cnt")).first()[0]
    return kept.select(
        "piece", F.log(F.col("cnt") / F.lit(float(tot_kept))).alias("logprob")
    )


def corpus_log_likelihood(docs: DataFrame, vocab: DataFrame, text_col: str = "text") -> float:
    """Sum over word tokens of the best-path log-prob under ``vocab`` — the
    quantity Viterbi-EM is non-decreasing in (tested)."""
    logp = {r.piece: r.logprob for r in vocab.collect()}
    max_len = max((len(p) for p in logp), default=1)
    words = word_frequencies(docs, text_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ll = 0.0
            for word, freq in zip(pdf["word"], pdf["freq"]):
                ll += int(freq) * sum(
                    logp.get(p, -1e9) for p in _viterbi(str(word), logp, max_len)
                )
            yield pd.DataFrame({"ll": [ll]})

    part = words.mapInPandas(run, "ll double")
    return part.agg(F.sum("ll")).first()[0]


def apply_unigram(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    out_col: str = "pieces",
) -> DataFrame:
    """Encode every document: ``out_col`` = array of vocabulary pieces
    (whitespace tokens each Viterbi-segmented, concatenation preserved).
    One Arrow-batched scan-stage pass; the vocab rides the closure
    (<= vocab_size rows by contract)."""
    logp = {r.piece: r.logprob for r in vocab.collect()}
    max_len = max((len(p) for p in logp), default=1)

    @F.pandas_udf("array<string>")
    def encode(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            pieces: list = []
            for word in str(t or "").split():
                pieces.extend(_viterbi(word, logp, max_len))
            out.append(pieces)
        return pd.Series(out)

    return docs.withColumn(out_col, encode(F.col(text_col)))
