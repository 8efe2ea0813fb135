"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken — SIGMOD'03).

The classic local document-fingerprinting algorithm behind MOSS: hash every
word k-gram, then in each sliding window of ``window`` consecutive gram
hashes keep the minimum. The selected set is a position-robust fingerprint:
any shared substring of length >= k + window - 1 words is *guaranteed* to
contribute at least one common fingerprint (the winnowing guarantee), while
the expected density is only 2/(window+1) of all grams — so overlap detection
costs a join on a small selected subset instead of on every shingle.

Scale shape (100 TB): the whole selection is a per-row JVM higher-order-
function expression — zero shuffles, zero Python. Downstream overlap joins
shuffle only the winnowed fingerprints (a ~2/(w+1) sample of the gram
stream), with the same frequency-cap guard the Jaccard path uses so a
degenerate hot fingerprint cannot create a quadratic posting list.

The reference (an observability lakehouse over opaque services,
docker-compose.yaml) ships no fingerprinting; this is part of the
training-data-curation tier this engine adds on top of the reference's
query surface.

Hash choice: md5 of the gram string. Both Spark and DuckDB expose an
identical md5(), which is what lets the driver oracle verify the exact
selected set (lexicographic min over identical hex strings on both sides).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.functions import text as tx
from demo_otel_parquet_antalya_spark.util import ensure_parallelism


def _bound(arr: Column, fn) -> Column:
    """Evaluate ``arr`` once and expose it to ``fn`` as a lambda variable.

    HOF lambdas are interpreted per element and Catalyst does not CSE outer
    expressions into them (the 70x shingle-kernel rule, SCALE.md); wrapping
    the array in a single-element ``transform`` makes it a bound variable the
    inner lambda reads for free.
    """
    return F.element_at(F.transform(F.array(arr), fn), 1)


def winnow_fingerprint_col(text: Column | str, k: int = 4, window: int = 5) -> Column:
    """array<string> of winnowed fingerprints for one document.

    Word k-grams -> md5 -> min per sliding window of ``window`` hashes ->
    distinct. Documents shorter than k words yield one truncated gram;
    documents with fewer than ``window`` grams yield one (global-min)
    fingerprint — every non-empty document gets >= 1 fingerprint.
    """
    col = F.col(text) if isinstance(text, str) else text
    grams = _bound(
        tx.tokens(col),
        lambda toks: F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        ),
    )
    hashes = F.transform(grams, F.md5)
    return F.array_distinct(
        _bound(
            hashes,
            lambda h: F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(h) - (window - 1), F.lit(1))),
                lambda j: F.array_min(F.slice(h, j, window)),
            ),
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    window: int = 5,
) -> DataFrame:
    """(id, fp) posting frame: one row per selected fingerprint per document."""
    # fan the scan out first: the rolling-hash winnow HOF is the expensive
    # per-row stage, and a small-SF single-file input would run it one-task
    df = ensure_parallelism(df)
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(winnow_fingerprint_col(text_col, k=k, window=window)).alias("fp"),
    )


def fingerprint_overlap_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    window: int = 5,
    min_shared: int = 2,
    max_fp_freq: int = 200,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowed fingerprints.

    The detection join runs on the winnowed subset only (expected density
    2/(window+1) of all grams). ``max_fp_freq`` drops fingerprints whose
    posting list exceeds the cap before the self-join — the same guard
    ``ngram_jaccard_pairs`` uses — so a boilerplate fingerprint shared by
    everything cannot detonate into a quadratic pair list; legitimate
    near-dup pairs share many fingerprints and survive the drop.
    """
    fps = winnow_fingerprints(df, id_col=id_col, text_col=text_col, k=k, window=window)
    # the WINNOW SELECTION stays md5-hex (oracle-load-bearing: identical
    # lexicographic mins on both engines); the detection join re-keys the
    # selected fingerprints to 8-byte xxhash64 so the frequency pass and
    # the self-join shuffle fixed-width longs instead of 32-char hex
    # strings (r14 optimization round — the line/gram fingerprint
    # discipline and its ~d^2/2^65 collision bound)
    fps = fps.select("id", F.xxhash64("fp").alias("fp"))
    rare = (
        fps.groupBy("fp")
        .agg(F.count("*").alias("df_freq"))
        .filter(F.col("df_freq") <= max_fp_freq)
        .select("fp")
    )
    posting = fps.join(rare, "fp")
    a = posting.alias("a")
    b = posting.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )
