"""operators/unigram_lm.py — SentencePiece-style unigram-LM tokenizer
training (distributed Viterbi-EM over the word-type table)."""

from __future__ import annotations

import math

import pytest

from demo_otel_parquet_antalya_spark.operators import unigram_lm as U

DOCS_SCHEMA = "doc_id long, text string"
ROWS = [
    (1, "the cat sat on the mat"),
    (2, "the cat ate the rat"),
    (3, "a cat and a rat sat"),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(ROWS, DOCS_SCHEMA)


def test_viterbi_prefers_higher_probability_path():
    logp = {"ab": -1.0, "a": -2.0, "b": -2.0, "c": -2.0}
    assert U._viterbi("abc", logp, 2) == ["ab", "c"]
    # flip the odds and the single chars win
    logp2 = {"ab": -5.0, "a": -1.0, "b": -1.0, "c": -1.0}
    assert U._viterbi("abc", logp2, 2) == ["a", "b", "c"]


def test_viterbi_unknown_char_fallback_keeps_coverage():
    assert U._viterbi("axb", {"a": -1.0, "b": -1.0}, 2) == ["a", "x", "b"]


def test_trained_vocab_learns_corpus_words(spark, docs):
    vocab = U.train_unigram_lm(docs, vocab_size=40, n_rounds=2, seed_size=30, seed_max_len=4)
    rows = {r.piece: r.logprob for r in vocab.collect()}
    # frequent whole words become pieces, ordered by frequency
    assert rows["the"] > rows["cat"] > rows["and"]
    # log-probs normalize: sum of probs over the vocab is 1
    assert sum(math.exp(p) for p in rows.values()) == pytest.approx(1.0)


def test_encode_round_trip_and_vocab_membership(spark, docs):
    vocab = U.train_unigram_lm(docs, vocab_size=40, n_rounds=2, seed_size=30, seed_max_len=4)
    pieces_ok = {r.piece for r in vocab.collect()}
    for r in U.apply_unigram(docs, vocab).collect():
        assert "".join(r.pieces) == r.text.replace(" ", "")
        assert all(p in pieces_ok for p in r.pieces)


def test_training_is_deterministic(spark, docs):
    kw = dict(vocab_size=40, n_rounds=2, seed_size=30, seed_max_len=4)
    v1 = sorted(map(tuple, U.train_unigram_lm(docs, **kw).collect()))
    v2 = sorted(map(tuple, U.train_unigram_lm(docs.repartition(7), **kw).collect()))
    assert v1 == v2


def test_likelihood_non_decreasing_over_rounds(spark, docs):
    """Hard-EM monotonicity: with a vocab wide enough that the final prune
    keeps every counted piece, more EM rounds never reduce the corpus
    best-path log-likelihood."""
    lls = []
    for rounds in (1, 2, 3):
        vocab = U.train_unigram_lm(
            docs, vocab_size=500, n_rounds=rounds, seed_size=100, seed_max_len=4
        )
        lls.append(U.corpus_log_likelihood(docs, vocab))
    assert lls[0] <= lls[1] + 1e-9 and lls[1] <= lls[2] + 1e-9


def test_estep_ships_by_value_not_by_module_reference():
    """The E-step closure calls module-level _viterbi; the module registers
    for by-value cloudpickle, so the closure must run in an interpreter that
    cannot import this package (same contract as the PNG codec and the OTLP
    proto decoder)."""
    import subprocess
    import sys
    import tempfile

    from pyspark import cloudpickle

    with tempfile.NamedTemporaryFile(suffix=".pkl", delete=False) as f:
        f.write(cloudpickle.dumps(U._viterbi))
        blob_path = f.name
    script = (
        "import pickle, sys\n"
        "assert not any('repo' in p for p in sys.path)\n"
        f"vit = pickle.load(open({blob_path!r}, 'rb'))\n"
        "assert vit('abc', {'ab': -1.0, 'a': -2.0, 'b': -2.0, 'c': -2.0}, 2) == ['ab', 'c']\n"
        "assert 'demo_otel_parquet_antalya_spark' not in sys.modules\n"
        "print('OK')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", script], cwd=tempfile.gettempdir(),
        capture_output=True, text=True, timeout=120,
        env={"PATH": "/usr/bin:/bin", "PYTHONPATH": ""},
    )
    assert proc.returncode == 0 and "OK" in proc.stdout, proc.stderr


def test_viterbi_tie_breaks_to_lexicographically_smallest_pieces():
    """Equal score AND equal piece count: the piece TUPLES are compared
    (not their concatenation, which is always word[:i] and never
    discriminates — ADVICE r4 #2): ('a','bc') < ('ab','c')."""
    logp = {"a": -1.0, "bc": -1.0, "ab": -1.0, "c": -1.0}
    assert U._viterbi("abc", logp, 2) == ["a", "bc"]
