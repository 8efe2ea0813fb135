"""Ed-Join edit-distance similarity join: exactness vs brute force
(including repeated grams and mixed lengths), and the length-guarantee
guard."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from demo_otel_parquet_antalya_spark.operators.stringsim import edit_distance_join


def _brute(strings, d):
    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    out = set()
    for i, a in enumerate(strings):
        for j in range(i + 1, len(strings)):
            dist = lev(a, strings[j])
            if dist <= d:
                out.add((i, j, dist))
    return out


def _spark_pairs(spark, strings, d, q=2):
    df = spark.createDataFrame(list(enumerate(strings)), "id long, s string")
    return {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_join(df, "id", "s", d=d, q=q).collect()
    }


def test_exact_on_known_neardups(spark):
    strings = [
        "warehouse-42-east",
        "warehouse-42-west",  # dist 4 from east (east->west)
        "warehouse-43-east",  # dist 1 from [0]
        "warehose-42-east",   # deletion, dist 1 from [0]
        "completely different",
    ]
    assert _spark_pairs(spark, strings, d=1) == _brute(strings, 1)


@settings(
    max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    st.lists(
        st.text(alphabet="abc", min_size=6, max_size=12),
        min_size=2,
        max_size=12,
        unique=True,
    ),
    st.integers(min_value=1, max_value=2),
)
def test_matches_bruteforce_property(spark, strings, d):
    """Prefix filtering must lose NO pair — exactness is the operator's
    contract (and what justifies the brute-force oracle). Alphabet 'abc'
    forces heavy gram repetition, exercising the occurrence-numbered
    multiset tokens."""
    assert _spark_pairs(spark, strings, d=d) == _brute(strings, d)


def test_short_string_guard(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "abd")], "id long, s string")
    with pytest.raises(ValueError, match="prefix-filter guarantee"):
        edit_distance_join(df, "id", "s", d=2, q=2)


from demo_otel_parquet_antalya_spark.operators.stringsim import (
    edit_distance_join_deletions,
)


def _spark_pairs_del(spark, strings, d):
    df = spark.createDataFrame(list(enumerate(strings)), "id long, s string")
    return {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_join_deletions(df, "id", "s", d=d).collect()
    }


@settings(
    max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=10),
        min_size=2,
        max_size=12,
        unique=True,
    ),
    st.integers(min_value=1, max_value=2),
)
def test_deletion_join_matches_bruteforce(spark, strings, d):
    """Deletion-neighborhood blocking is exact for d in {1,2} — including
    insert/delete pairs of unequal length and the empty-ish short strings
    the q-gram tier refuses."""
    assert _spark_pairs_del(spark, strings, d) == _brute(strings, d)


def test_deletion_join_equals_gram_join(spark):
    strings = [f"item-{i:04d}-unit" for i in range(60)]
    assert _spark_pairs_del(spark, strings, 1) == _spark_pairs(spark, strings, 1)


def test_deletion_join_rejects_large_d(spark):
    df = spark.createDataFrame([(1, "abcdef")], "id long, s string")
    with pytest.raises(ValueError, match="supports d in"):
        edit_distance_join_deletions(df, "id", "s", d=3)
