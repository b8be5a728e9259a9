"""Text analysis for training-data pipelines.

All pure column expressions (JVM-side, whole-stage codegen) — no
Python in the hot path. Token model: lowercase ``[a-z0-9]+`` runs,
which both Spark and any SQL oracle extract identically via
``regexp_extract_all``.

Operators: tokenization + token counting, quality scoring
(length/stopword/uniqueness ratios), language-ID scoring (marker-word
voting), document fingerprinting (prefix hash + shingle hashes).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from openmetrics_spark.functions.hashing import portable_hash60

# Small fixed marker lists per language (public stop-word heads).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "est", "pas", "un", "une"),
    "es": ("el", "la", "los", "y", "es", "no", "un", "una"),
}

STOPWORDS_EN = LANG_MARKERS["en"] + ("it", "for", "on", "with", "as", "this")


def tokens(text: Column | str) -> Column:
    """Array of lowercase alphanumeric tokens."""
    c = F.col(text) if isinstance(text, str) else text
    return F.expr(f"regexp_extract_all(lower({_name(c, text)}), '[a-z0-9]+', 0)")


def _name(c: Column, orig) -> str:
    # expression string for use inside F.expr; only plain column names
    # are passed in practice.
    if isinstance(orig, str):
        return orig
    raise ValueError("tokens() requires a plain column name")


def token_count(tok: Column) -> Column:
    return F.size(tok).cast("long")


def unique_token_count(tok: Column) -> Column:
    return F.size(F.array_distinct(tok)).cast("long")


def marker_hits(tok: Column, markers: tuple[str, ...]) -> Column:
    """How many tokens appear in the marker list."""
    lit = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tok, lambda t: F.array_contains(lit, t))).cast("long")


def quality_score(text_col: str, tok: Column) -> Column:
    """Heuristic quality in [0,1]: blend of stopword presence and
    token diversity (unique/total). Deliberately simple + deterministic
    so it is SQL-oracle checkable."""
    n = token_count(tok)
    uniq = unique_token_count(tok)
    stop = marker_hits(tok, STOPWORDS_EN)
    diversity = F.when(n > 0, uniq / n).otherwise(F.lit(0.0))
    stop_ratio = F.when(n > 0, stop / n).otherwise(F.lit(0.0))
    return F.round(0.5 * diversity + 0.5 * F.least(stop_ratio * 5, F.lit(1.0)), 6)


def fingerprint(text_col: str, prefix_tokens: int = 64) -> Column:
    """Document fingerprint: portable 60-bit hash of the first N
    tokens joined by a single space (canonicalized whitespace/case)."""
    tok = tokens(text_col)
    head = F.slice(tok, 1, prefix_tokens)
    return portable_hash60(F.array_join(head, " "))


# ---------------------------------------------------------------------------
# Repetition statistics (Gopher-style quality rules, Rae et al. 2021
# arXiv:2112.11446 Table A1) — repetitive documents are a dominant
# failure mode in web-scale pretraining corpora.
# ---------------------------------------------------------------------------


def ngrams(tok: Column, n: int) -> Column:
    """Array of space-joined token n-grams (empty when < n tokens)."""
    idx = F.when(
        F.size(tok) >= n, F.sequence(F.lit(1), F.size(tok) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.array_join(F.slice(tok, i, n), " "))


def dup_ngram_fraction(tok: Column, n: int = 2) -> Column:
    """Fraction of n-grams that are repeats of an earlier n-gram
    (1 - distinct/total); 0 for docs shorter than n tokens."""
    g = ngrams(tok, n)
    total = F.size(g)
    return F.round(
        F.when(
            total > 0, 1.0 - F.size(F.array_distinct(g)) / total
        ).otherwise(F.lit(0.0)),
        6,
    )


def mean_token_len(tok: Column) -> Column:
    """Mean token length in characters (0 for empty docs)."""
    total = F.aggregate(
        tok, F.lit(0).cast("long"), lambda s, x: s + F.length(x)
    )
    return F.round(
        F.when(F.size(tok) > 0, total / F.size(tok)).otherwise(F.lit(0.0)), 6
    )


# ---------------------------------------------------------------------------
# PII scrubbing — redact the machine-recognizable identifier shapes
# (emails, phone numbers, IPv4 addresses) before text ever reaches a
# training shard. Patterns stay in the regex subset Java and RE2
# interpret identically, so an SQL oracle can replay the scrub.
# ---------------------------------------------------------------------------

PII_EMAIL = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PII_IPV4 = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
# international-ish phone: optional +country, then 7+ digits with
# common separators; anchored on digits at both ends so plain prose
# numbers ("in 2021") never match.
PII_PHONE = r"\+?[0-9][0-9()\-\. ]{6,}[0-9]"


def pii_counts(c: Column) -> tuple[Column, Column, Column]:
    """(email, ipv4, phone) match counts for a text column."""
    return (
        F.regexp_count(c, F.lit(PII_EMAIL)),
        F.regexp_count(c, F.lit(PII_IPV4)),
        F.regexp_count(c, F.lit(PII_PHONE)),
    )


def scrub_pii(c: Column) -> Column:
    """Replace every email / IPv4 / phone match with a typed redaction
    token. Order matters: emails and IPs are scrubbed before phones so
    their digit runs can't be half-eaten by the phone pattern."""
    out = F.regexp_replace(c, PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_IPV4, "<IP>")
    return F.regexp_replace(out, PII_PHONE, "<PHONE>")
