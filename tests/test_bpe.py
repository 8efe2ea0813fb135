"""BPE trainer: the merge list must match a hand-computed reference on a
known corpus, be deterministic, and the encoder must honor merge order."""

from __future__ import annotations

from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.operators import bpe


def _corpus(spark, rows):
    return spark.createDataFrame([(i, t) for i, t in enumerate(rows)], "doc_id long, text string")


def test_merges_match_hand_computed(spark):
    # classic toy corpus: "low" x5, "lower" x2 -> first merges are (l,o),(lo,w)
    docs = _corpus(spark, ["low low low low low", "lower lower"])
    merges = bpe.train_bpe_merges(docs, n_merges=3)
    assert merges[0] == ("l", "o")
    assert merges[1] == ("lo", "w")
    # after 'low' exists: "low</w>" x5 beats "lowe..." x2
    assert merges[2] == ("low", "</w>")


def test_training_is_deterministic(spark):
    docs = _corpus(spark, ["the cat sat", "the cat", "the bat sat"])
    a = bpe.train_bpe_merges(docs, n_merges=8)
    b = bpe.train_bpe_merges(docs, n_merges=8)
    assert a == b and len(a) == 8


def test_encode_applies_merges_in_rank_order(spark):
    docs = _corpus(spark, ["low low low low low", "lower lower"])
    merges = bpe.train_bpe_merges(docs, n_merges=3)
    enc = bpe.apply_bpe(docs, merges).collect()
    by_id = {r.doc_id: r for r in enc}
    # "low" encodes to the single learned token low</w>
    assert by_id[0].bpe_tokens[:1] == ["low</w>"]
    assert by_id[0].n_bpe_tokens == 5  # five whole-word tokens
    # "lower" reuses the 'low' prefix merge then falls back to chars
    assert by_id[1].bpe_tokens[0] == "low"


def test_type_table_guard(spark):
    docs = _corpus(spark, ["a b c"])
    old = bpe.MAX_WORD_TYPES
    bpe.MAX_WORD_TYPES = 2
    try:
        import pytest

        with pytest.raises(ValueError, match="word-type table"):
            bpe.train_bpe_merges(docs, n_merges=1)
        assert bpe.train_bpe_merges(docs, n_merges=1, force=True)
    finally:
        bpe.MAX_WORD_TYPES = old
