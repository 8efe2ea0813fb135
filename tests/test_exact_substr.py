"""TRUE ExactSubstr maximal spans: diagonal-run operator vs a brute-force
all-pairs all-offsets span finder, per-partner match detail, coverage
equivalence with the fixed-n island approximation, scrub round-trip
(VERDICT r3 item 3)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from demo_otel_parquet_antalya_spark.operators import dedup


def _brute_spans(rows, n):
    """Independent reference: mark every token position of doc A covered by
    ANY length-n window that occurs verbatim in another doc, then merge
    consecutive positions into maximal intervals. Since a common substring
    of length L >= n is covered by exactly its L-n+1 windows, this is the
    Lee-et-al. span set."""
    toks = {d: t.split() for d, t in rows}
    cover = {d: set() for d in toks}
    for a in toks:
        for b in toks:
            if a == b:
                continue
            ta, tb = toks[a], toks[b]
            for i in range(len(ta) - n + 1):
                for j in range(len(tb) - n + 1):
                    if ta[i : i + n] == tb[j : j + n]:
                        cover[a].update(range(i, i + n))
    out = []
    for d, c in cover.items():
        if not c:
            continue
        pos = sorted(c)
        s = prev = pos[0]
        for p in pos[1:]:
            if p == prev + 1:
                prev = p
                continue
            out.append((d, s, prev + 1, prev + 1 - s))
            s = prev = p
        out.append((d, s, prev + 1, prev + 1 - s))
    return sorted(out)


def _spark_spans(spark, rows, n):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return sorted(
        tuple(r) for r in dedup.exact_substring_spans(df, n=n).collect()
    )


COMMON = "the quick brown fox jumps over the lazy dog near the river bank"
CORPUS = [
    (1, f"intro one two three {COMMON} tail a b c"),
    (2, f"{COMMON} something else entirely here now ok fine"),
    (3, "totally unrelated text with no overlap at all whatsoever in here friend"),
    (4, f"x1 x2 x3 x4 x5 x6 x7 {COMMON} y1 y2 {COMMON}"),
    # doc 5 shares one run with doc 6 and an ADJACENT run with doc 7 —
    # the intervals touch, so they merge into one scrub region
    (5, "p1 p2 a1 a2 a3 a4 a5 a6 a7 a8 b1 b2 b3 b4 b5 b6 b7 b8 q1 q2"),
    (6, "z1 a1 a2 a3 a4 a5 a6 a7 a8 z2 z3"),
    (7, "w1 b1 b2 b3 b4 b5 b6 b7 b8 w2 w3"),
]


def test_spans_match_bruteforce(spark):
    assert _spark_spans(spark, CORPUS, 8) == _brute_spans(CORPUS, 8)


def test_matches_report_true_substrings_with_offsets(spark):
    """exact_substring_matches must report each maximal common substring
    with partner, both offsets, and TRUE token length — the detail no
    per-doc island chain can produce. Doc 1 shares an 8-token block with
    doc 2 and a different one with doc 3; the blocks are separate matches
    with the correct partner attribution."""
    rows = [
        (1, "a1 a2 a3 a4 a5 a6 a7 a8 gapx gapy gapz b1 b2 b3 b4 b5 b6 b7 b8"),
        (2, "u1 a1 a2 a3 a4 a5 a6 a7 a8 u2"),
        (3, "v1 b1 b2 b3 b4 b5 b6 b7 b8 v2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in dedup.exact_substring_matches(df, n=8).collect()
    )
    assert got == [
        (1, 2, 0, 1, 8),
        (1, 3, 11, 1, 8),
        (2, 1, 1, 0, 8),
        (3, 1, 1, 11, 8),
    ]


def test_coverage_equivalence_with_island_approximation(spark):
    """The theorem in exact_substring_spans' docstring: merged per-doc
    span bounds coincide with repeated_ngram_spans' — both are the union
    of [p, p+n) over the same duplicated-gram positions. Checked on the
    handcrafted corpus and on adversarial repeated-vocab corpora."""
    import random

    rng = random.Random(5)
    vocab = "aa bb cc dd".split()
    corpora = [CORPUS] + [
        [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 20))))
            for i in range(5)
        ]
        for _ in range(3)
    ]
    for rows, n in [(corpora[0], 8)] + [(c, 3) for c in corpora[1:]]:
        df = spark.createDataFrame(rows, "doc_id long, text string")
        exact = sorted(
            (r.doc_id, r.span_start, r.span_end)
            for r in dedup.exact_substring_spans(df, n=n).collect()
        )
        island = sorted(
            (r.doc_id, r.span_start, r.span_end)
            for r in dedup.repeated_ngram_spans(df, n=n, min_docs=2).collect()
        )
        assert exact == island


def test_scrub_round_trip(spark):
    """Scrub removes exactly the span tokens, reassembles survivors in
    order, leaves clean docs byte-identical — and a re-run on the scrubbed
    corpus (unique filler tokens, so no new adjacencies) finds nothing."""
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    scrubbed = dedup.scrub_exact_substrings(df, n=8)
    got = {r.doc_id: (r.text, r.n_scrubbed_tokens) for r in scrubbed.collect()}
    assert got[3] == (CORPUS[2][1], 0)  # untouched doc passes through
    assert got[1] == ("intro one two three tail a b c", 13)
    assert got[2][1] == 13 and got[2][0].startswith("something else")
    assert got[5] == ("p1 p2 q1 q2", 16)  # merged adjacent spans scrub once
    rescan = dedup.exact_substring_spans(
        spark.createDataFrame(
            [(d, t) for d, (t, _) in got.items()], "doc_id long, text string"
        ),
        n=8,
    )
    assert rescan.count() == 0


def test_max_postings_cap_drops_hot_grams(spark):
    """With a cap of 2, a gram occurring in 3 docs generates no matches —
    the documented recall trade of the scale path."""
    shared = " ".join(f"s{i}" for i in range(8))
    rows = [(i, f"pad{i}a pad{i}b {shared} tail{i}") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert dedup.exact_substring_spans(df, n=8).count() == 3
    assert dedup.exact_substring_spans(df, n=8, max_postings=2).count() == 0


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.sampled_from("aa bb cc".split()), min_size=3, max_size=12),
        min_size=2,
        max_size=5,
    )
)
def test_spans_match_bruteforce_property(spark, word_lists):
    """Tiny repeated vocabulary maximizes overlapping diagonals, run
    splits/joins and multi-partner merges; n=3 keeps runs short."""
    rows = [(i, " ".join(ws)) for i, ws in enumerate(word_lists)]
    assert _spark_spans(spark, rows, 3) == _brute_spans(rows, 3)


def test_word_shingles_short_doc_yields_empty_not_error(spark):
    """Regression: a doc with fewer than n tokens used to crash EVERY
    shingle-based operator (sequence(0, -1) descends to [0, -1] and the -1
    index made slice() throw) — one short doc would kill a 100 TB job.
    Short docs must produce an empty shingle set and drop out silently."""
    from pyspark.sql import functions as F

    from demo_otel_parquet_antalya_spark.functions.text import word_shingles

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "one two three four five six seven eight nine")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.s
        for r in df.select("doc_id", word_shingles(F.col("text"), 8).alias("s")).collect()
    }
    assert got[1] == []
    assert len(got[2]) == 2  # 9 tokens -> two 8-gram shingles
    # and the full span operator tolerates the mixed corpus
    assert dedup.exact_substring_spans(df, n=8).count() == 0


def test_scrub_preserves_raw_whitespace_in_untouched_docs(spark):
    """A doc with NO scrubbed spans must pass through byte-identical —
    including tabs, runs of spaces, and newlines, which the concat_ws
    rebuild would otherwise collapse (ADVICE r4 #3). Scrubbed docs are
    rebuilt single-spaced by contract."""
    shared = " ".join(f"w{i}" for i in range(8))
    raw = "alpha\tbeta  gamma\ndelta"
    df = spark.createDataFrame(
        [(1, shared + " left"), (2, shared + " right"), (3, raw)],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.text, r.n_scrubbed_tokens) for r in
           dedup.scrub_exact_substrings(df, n=8).collect()}
    assert got[3] == (raw, 0)
    assert got[1] == ("left", 8) and got[2] == ("right", 8)
