"""BPE tokenizer training on a Spark corpus.

The classic byte-pair-encoding trainer (Sennrich et al., arXiv:1508.07909)
operates on the WORD-FREQUENCY TYPE TABLE, not the raw corpus: merges only
ever look at distinct words and their counts. That split is exactly the
right distributed architecture:

- the 100 TB part — corpus -> (word, count) — is one map-side-combinable
  Spark aggregate (the same shuffle shape as ``vocab_top_tokens``);
- the merge loop runs on the compact type table, which is bounded by the
  distinct-word vocabulary (sublinear in corpus size, Heaps' law), i.e.
  driver-sized BY CONTRACT — the same bounded-collect pattern as the IVF
  centroid table and the LSH probe batch.

Each round counts adjacent symbol pairs weighted by word frequency, merges
the most frequent pair (ties broken lexicographically for determinism), and
rewrites the type table. Deterministic: same corpus -> same merge list on
any engine, partitioning, or run.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the merge loop is driver-side on the word-type table; refuse corpora whose
# TYPE table (not corpus!) exceeds this without an explicit override
MAX_WORD_TYPES = 1_000_000


def word_frequencies(
    docs: DataFrame, text_col: str = "text", min_freq: int = 1
) -> DataFrame:
    """(word, freq) over the corpus — the distributed half of BPE training."""
    from demo_otel_parquet_antalya_spark.functions.text import tokens

    w = docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
    out = w.groupBy("word").agg(F.count("*").alias("freq"))
    if min_freq > 1:
        out = out.filter(F.col("freq") >= min_freq)
    return out


def train_bpe_merges(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    min_freq: int = 1,
    end_of_word: str = "</w>",
    force: bool = False,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from the corpus.

    Returns the ordered merge list [(left, right), ...] — the artifact a
    tokenizer ships. Deterministic: most-frequent pair first, ties broken
    by (left, right) lexicographic order.
    """
    freqs = word_frequencies(docs, text_col, min_freq)
    if not force:
        n_types = freqs.count()
        if n_types > MAX_WORD_TYPES:
            raise ValueError(
                f"word-type table has {n_types} rows (> {MAX_WORD_TYPES}); "
                "raise min_freq to shrink it, or pass force=True"
            )
    types = {
        tuple(r.word) + (end_of_word,): r.freq for r in freqs.collect()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for symbols, freq in types.items():
            for a, b in zip(symbols, symbols[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + freq
        if not pair_counts:
            break
        # deterministic: max count, then lexicographically SMALLEST pair
        best_count = max(pair_counts.values())
        best_pair = min(p for p, c in pair_counts.items() if c == best_count)
        merges.append(best_pair)
        merged = best_pair[0] + best_pair[1]
        new_types: dict[tuple[str, ...], int] = {}
        for symbols, freq in types.items():
            out: list[str] = []
            i = 0
            while i < len(symbols):
                if (
                    i + 1 < len(symbols)
                    and symbols[i] == best_pair[0]
                    and symbols[i + 1] == best_pair[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            key = tuple(out)
            new_types[key] = new_types.get(key, 0) + freq
        types = new_types
    return merges


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    end_of_word: str = "</w>",
) -> DataFrame:
    """Tokenize the corpus with a learned merge list — the distributed
    ENCODE side: merges broadcast as plan literals, each word rewritten by
    repeated pair substitution in a pandas batch (Arrow boundary crossed
    once per batch; the merge list is tokenizer-sized, not corpus-sized).

    Returns the input plus ``bpe_tokens array<string>`` and
    ``n_bpe_tokens int``.
    """
    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_word(word: str) -> list[str]:
        symbols = list(word) + [end_of_word]
        while len(symbols) > 1:
            pairs = [
                (ranks[(a, b)], i)
                for i, (a, b) in enumerate(zip(symbols, symbols[1:]))
                if (a, b) in ranks
            ]
            if not pairs:
                break
            _, i = min(pairs)
            symbols[i : i + 2] = [symbols[i] + symbols[i + 1]]
        return symbols

    @F.pandas_udf("array<string>")
    def encode(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks: list[str] = []
            for w in (t or "").split():
                toks.extend(encode_word(w))
            out.append(toks)
        return pd.Series(out)

    return docs.withColumn("bpe_tokens", encode(F.col(text_col))).withColumn(
        "n_bpe_tokens", F.size("bpe_tokens")
    )
