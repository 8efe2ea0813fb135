"""Winnowing fingerprint tests: the SIGMOD'03 coverage guarantee, density,
determinism, and the overlap join's frequency-cap guard."""

from __future__ import annotations

from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.operators import fingerprint as fpr

K, W = 4, 5


def _fps(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return fpr.winnow_fingerprints(df, k=K, window=W)


def test_winnowing_guarantee_shared_run(spark):
    """Any shared word run of length >= k + window - 1 (= 8) must contribute
    at least one common fingerprint — the winnowing coverage guarantee."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    rows = [
        (1, f"unrelated prefix words here {shared} and a suffix tail"),
        (2, f"{shared} completely different ending of the second document"),
    ]
    out = _fps(spark, rows).groupBy("fp").agg(F.count("*").alias("n"))
    assert out.filter(F.col("n") == 2).count() >= 1


def test_disjoint_docs_share_nothing(spark):
    rows = [
        (1, "one two three four five six seven eight nine ten"),
        (2, "cat dog bird fish horse cow sheep goat pig duck"),
    ]
    out = _fps(spark, rows).groupBy("fp").agg(F.count("*").alias("n"))
    assert out.filter(F.col("n") > 1).count() == 0


def test_density_and_determinism(spark):
    words = " ".join(f"w{i * 7919 % 101}" for i in range(200))
    rows = [(1, words)]
    a = sorted(r.fp for r in _fps(spark, rows).collect())
    b = sorted(r.fp for r in _fps(spark, rows).collect())
    assert a == b
    # 197 grams, 193 windows; expected selected ~= 2/(w+1) = 1/3 of grams.
    # Distinct-per-doc makes it slightly lower; assert a generous band.
    assert 20 <= len(a) <= 120


def test_short_doc_gets_one_fingerprint(spark):
    rows = [(1, "only three words"), (2, "tiny")]
    out = _fps(spark, rows).groupBy("id").agg(F.count("*").alias("n")).collect()
    got = {r.id: r.n for r in out}
    assert got == {1: 1, 2: 1}


def test_overlap_pairs_cap_guard(spark):
    """A fingerprint present in more docs than max_fp_freq is dropped before
    the self-join, so boilerplate cannot create quadratic pairs."""
    boiler = "standard legal disclaimer text appended to every document here"
    rows = [(i, f"unique{i} body{i} content{i} words{i} {boiler}") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = fpr.winnow_fingerprints(df, k=K, window=W)
    freqs = fps.groupBy("fp").agg(F.count("*").alias("n"))
    # the all-8-docs boilerplate fingerprint exists and is what the cap drops
    assert freqs.filter(F.col("n") == 8).count() >= 1
    uncapped = fpr.fingerprint_overlap_pairs(
        df, k=K, window=W, min_shared=1, max_fp_freq=100
    )
    capped = fpr.fingerprint_overlap_pairs(df, k=K, window=W, min_shared=1, max_fp_freq=4)
    assert uncapped.count() == 8 * 7 // 2  # boilerplate links every pair
    # with the cap, only fingerprints on <=4 posting lists survive; the
    # pair graph shrinks strictly (the freq-8 clique-maker is gone)
    assert capped.count() < uncapped.count()


from hypothesis import HealthCheck, given, settings, strategies as st

_word = st.text(alphabet="xyz", min_size=1, max_size=4)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pre=st.lists(_word, min_size=0, max_size=10),
    post=st.lists(_word, min_size=0, max_size=10),
    pre2=st.lists(_word, min_size=0, max_size=10),
    shared=st.lists(_word, min_size=K + W - 1, max_size=K + W - 1),
)
def test_winnowing_guarantee_property(spark, pre, post, pre2, shared):
    """For ANY surrounding context, a shared run of k+window-1 words must
    contribute >= 1 common fingerprint (the SIGMOD'03 guarantee)."""
    doc1 = " ".join(pre + shared + post)
    doc2 = " ".join(pre2 + shared)
    out = (
        _fps(spark, [(1, doc1), (2, doc2)])
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") == 2)
        .count()
    )
    assert out >= 1
