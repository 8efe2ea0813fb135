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

# word-type tables at or below this run the driver-side merge loop (faster
# on small vocabularies: no per-round job launch); above it, training
# switches to the fully distributed per-round pair-count path — there is no
# capability ceiling either way
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
    max_word_types: int = MAX_WORD_TYPES,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from the corpus.

    Returns the ordered merge list [(left, right), ...] — the artifact a
    tokenizer ships. Deterministic: most-frequent pair first, ties broken
    by (left, right) lexicographic order.

    Type tables up to ``max_word_types`` rows run the driver-side loop
    (one collect, n_merges pure-Python rounds — fastest when the
    vocabulary is small); larger tables run the fully distributed trainer
    (``_train_bpe_merges_distributed``: per-round Spark pair counting +
    HOF merge application, only ONE ROW per round ever reaches the
    driver). Both paths produce the identical merge list — pinned by
    ``tests/test_northstar_ops.py``. ``force=True`` keeps the driver loop
    regardless of table size (the pre-r4 behavior, minus the hard error).
    """
    freqs = word_frequencies(docs, text_col, min_freq)
    if not force and freqs.count() > max_word_types:
        return _train_bpe_merges_distributed(freqs, n_merges, end_of_word)
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


def _train_bpe_merges_distributed(
    freqs: DataFrame, n_merges: int, end_of_word: str
) -> list[tuple[str, str]]:
    """Fully distributed BPE merge training (VERDICT r3 item 2).

    The word-type table stays a DataFrame end to end; each round is

    1. pair counting — explode each type's adjacent symbol pairs weighted
       by word frequency, ``groupBy(a, b).sum(freq)`` (map-side
       combinable, one shuffle over the TYPE table, never the corpus);
    2. deterministic argmax — ``orderBy(cnt DESC, a, b).limit(1)``
       (TakeOrderedAndProject: per-partition top-1, ONE row collected);
    3. merge application — a left-to-right fold over each symbol array via
       the ``aggregate`` HOF (pure JVM expression, zero shuffle), then a
       re-aggregate of now-identical types. The fold merges exactly the
       non-overlapping left-to-right occurrences the classic scan merges:
       after a merge the accumulator's tail is the MERGED token, which can
       only equal the left symbol if the right symbol were empty —
       impossible — so no double merge.

    ``localCheckpoint`` truncates lineage each round so the plan stays
    O(1) deep across n_merges rounds. Scale: every stage is bounded by
    the type table (Heaps-law sublinear in corpus size); nothing
    corpus-sized or vocabulary-sized is ever collected.
    """
    chars = F.array_compact(F.split(F.col("word"), ""))
    types = freqs.select(
        F.concat(chars, F.array(F.lit(end_of_word))).alias("symbols"),
        F.col("freq").cast("long").alias("freq"),
    )
    pair_structs = F.expr(
        "CASE WHEN size(symbols) < 2 THEN array() "
        "ELSE transform(sequence(1, size(symbols) - 1), "
        "i -> struct(symbols[i-1] AS a, symbols[i] AS b)) END"
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = (
            types.select(F.explode(pair_structs).alias("p"), "freq")
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right = best[0].a, best[0].b
        merges.append((left, right))
        tail = F.slice(F.col("symbols"), 2, F.greatest(F.size("symbols") - 1, F.lit(0)))
        init = F.slice(F.col("symbols"), 1, 1)

        def make_step(_l: str, _r: str):
            def step(acc, x):
                do_merge = (F.element_at(acc, -1) == F.lit(_l)) & (x == F.lit(_r))
                return F.when(
                    do_merge,
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(_l + _r))
                    ),
                ).otherwise(F.concat(acc, F.array(x)))

            return step

        types = (
            types.select(
                F.aggregate(tail, init, make_step(left, right)).alias("symbols"),
                "freq",
            )
            .groupBy("symbols")
            .agg(F.sum("freq").alias("freq"))
            .localCheckpoint()
        )
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
