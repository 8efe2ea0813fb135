"""Text-analysis column functions for large-scale corpus pipelines.

All pure Spark column expressions (JVM-side, whole-stage codegen) — these run
in the scan stage with zero shuffles, so they cost one pass over 100 TB and
nothing more. Each has an exact ANSI-SQL equivalent used by the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Per-language marker stopwords for the n-gram/stopword language-ID heuristic.
# Deliberately tiny + deterministic: language ID at corpus scale is a scoring
# pass, and the engine contract is the plumbing (scan-stage scoring), not a
# trained model (which would slot in as a pandas_udf).
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "die"),
    "es": ("el", "los", "que"),
    "fr": ("le", "les", "des"),
}

STOPWORDS = ("the", "a", "and", "of", "to", "in")


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (the BPE-ish regex split)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("long")


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> — the dedup unit.

    transform(sequence(...)) keeps this JVM-side; for a doc of w words it
    yields w-n+1 shingles.

    The tokenization is BOUND once per row before the shingle lambda runs:
    higher-order-function lambdas are interpreted per element and Catalyst
    does not CSE into them, so referencing the raw ``split(...)`` expression
    from inside the lambda re-tokenizes the document once per element_at —
    measured ~70x slower at sf0.1. Wrapping the token array in a
    single-element ``transform`` turns it into a bound lambda variable that
    the inner lambda reads for free, and ``slice`` replaces n element_at
    calls with one window copy.
    """
    return F.flatten(
        F.transform(
            F.array(tokens(text)),
            lambda toks: F.transform(
                # guard, not greatest(): sequence(0, -1) DESCENDS to [0, -1]
                # (Spark picks step -1 when start > stop), and the -1 index
                # made slice() throw on any doc shorter than n tokens —
                # short docs must yield an EMPTY shingle set instead
                F.when(
                    F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
                ).otherwise(F.expr("array()").cast("array<int>")),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            ),
        )
    )


def avg_token_length(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    t = F.trim(c)
    # total non-space chars / token count
    return F.length(F.regexp_replace(t, r"\s", "")) / token_count(t)


def stopword_ratio(text: Column | str, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    toks = tokens(text)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return n_stop / F.size(toks)


def quality_score(text: Column | str) -> Column:
    """Deterministic doc-quality heuristic in [0,1]: rewards mid-length docs
    with a sane stopword ratio — the shape of a C4/RefinedWeb-style filter."""
    n = token_count(text)
    sw = stopword_ratio(text)
    len_score = F.least(n / F.lit(50.0), F.lit(1.0))
    sw_score = F.lit(1.0) - F.least(F.abs(sw - F.lit(0.3)) * 2, F.lit(1.0))
    return F.round(len_score * 0.6 + sw_score * 0.4, 6)


def lang_score(text: Column | str, lang: str) -> Column:
    """Marker-stopword hit count for one language."""
    toks = tokens(text)
    return F.size(F.filter(toks, lambda t: t.isin(*LANG_MARKERS[lang]))).cast("long")


def lang_id(text: Column | str) -> Column:
    """Argmax over marker-language scores; 'und' (undetermined) when no
    marker hits — mirrors fastText-style ID with a trivial model."""
    scores = [(lang, lang_score(text, lang)) for lang in sorted(LANG_MARKERS)]
    best_score = F.greatest(*[s for _, s in scores])
    result = F.lit("und")
    # first language (alphabetical) wins ties — deterministic
    for lang, score in reversed(scores):
        result = F.when((score == best_score) & (best_score > 0), F.lit(lang)).otherwise(result)
    return result


def rolling_hash(text: Column | str, prefix_len: int = 64, base: int = 31, mod: int = 2147483647) -> Column:
    """Polynomial rolling hash over the first ``prefix_len`` characters:
    h = (h*base + codepoint) mod m — the classic Rabin-Karp fingerprint,
    computed as one JVM-side fold. Complements ``fingerprint`` (md5): the
    rolling form extends to windowed/streamed fingerprinting where the
    hash updates incrementally per character."""
    c = F.col(text) if isinstance(text, str) else text
    chars = F.split(F.substring(c, 1, prefix_len), "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * base + F.ascii(ch)) % mod,
    )


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.

    Stable across engines (md5 is md5 everywhere) — the exact-dedup key for
    content-hash dedup at scale."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.lower(F.trim(F.regexp_replace(c, r"\s+", " "))))


def hashed_token_weight(
    tok: Column, n_buckets: int = 4096, mix: int = 2654435761, scale: int = 8192
) -> Column:
    """Hashing-trick feature weight for one token, in [-0.5, 0.5).

    bucket = int(md5(token)[:6]) mod n_buckets (the fastText/vowpal 'hashing
    trick' — no vocabulary broadcast, collisions are the regularizer), then a
    deterministic Knuth-multiplicative weight per bucket stands in for a
    trained coefficient vector: a real model would broadcast a (tiny)
    n_buckets-long weight array and index it the same way. md5-prefix
    bucketing is engine-portable, so DuckDB verifies the exact assignment.
    All integer math stays < 2^44 — no ANSI overflow."""
    bucket = F.conv(F.substring(F.md5(tok), 1, 6), 16, 10).cast("long") % n_buckets
    return ((bucket * F.lit(mix)) % scale) / F.lit(float(scale)) - 0.5


def hashed_linear_logit(text: Column | str, n_buckets: int = 4096) -> Column:
    """fastText-style linear text classifier logit: mean hashed-bucket weight
    over the token bag. One transform + one aggregate fold per document —
    scan-stage scoring, zero shuffles, zero Python: classifier inference over
    100 TB costs exactly one pass."""
    ws = F.transform(tokens(text), lambda t: hashed_token_weight(t, n_buckets))
    return F.aggregate(ws, F.lit(0.0), lambda acc, x: acc + x) / F.size(ws)


# Masking rules for log-template mining, ordered most-specific first:
# each is (pattern, replacement). UUIDs before hex (a UUID contains hex
# runs); IPs before plain numbers (an IP contains digit runs); the number
# rule last sweeps up everything numeric that remains. Patterns stick to
# the regex subset Java (Spark) and RE2 (DuckDB) share, so the exact same
# masking is oracle-verifiable.
TEMPLATE_MASKS: tuple[tuple[str, str], ...] = (
    (
        r"\b[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
        r"-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\b",
        "<UUID>",
    ),
    (r"\b0x[0-9a-fA-F]+\b", "<HEX>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"-?\d+(\.\d+)?", "<NUM>"),
)


def log_template(message: Column | str) -> Column:
    """Collapse a log message to its template by masking variable tokens
    (UUIDs, hex ids, IPs, numbers) — the core of Drain-style log-template
    mining, expressed as a chain of JVM regexp_replace calls: template
    extraction over 100 TB of logs is one scan-stage pass, zero shuffles,
    zero Python. grouping the masked column then yields the template
    catalog (pattern count, examples, first/last seen)."""
    c = F.col(message) if isinstance(message, str) else message
    for pat, repl in TEMPLATE_MASKS:
        c = F.regexp_replace(c, pat, repl)
    return c


def template_masks_sql(expr: str) -> str:
    """The identical masking chain in portable SQL (DuckDB's regexp_replace
    needs the 'g' flag for global replacement; Spark's is global by
    default) — used by the oracle side of the template-mining queries."""
    for pat, repl in TEMPLATE_MASKS:
        # DuckDB standard strings pass backslashes through literally, so the
        # Java-compatible pattern embeds unchanged (both engines accept \b \d)
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr
