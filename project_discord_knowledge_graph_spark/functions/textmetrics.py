"""Text-analysis column functions for large-scale corpus curation.

All native Catalyst expressions (no UDFs): language-ID heuristic,
quality scoring, token counting, and document fingerprinting — the
per-document text analytics a 100 TB training-data pipeline runs
before/alongside KG extraction.  Each has a DuckDB-oracle-checked
queries() entry in entry_queries.py.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# small deterministic stopword sets per language (heuristic lang-ID)
STOPWORDS = {
    "en": r"\b(the|and|of|to|a|in|is|it|you|that)\b",
    "es": r"\b(el|la|de|que|y|en|un|los|se|no)\b",
    "de": r"\b(der|die|und|das|ist|nicht|ein|ich|zu|mit)\b",
    "fr": r"\b(le|la|les|et|des|un|une|du|est|que)\b",
}
LANG_ORDER = ("en", "es", "de", "fr")


def stopword_hits(text: Column, lang: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(STOPWORDS[lang]), 1))


def lang_guess_expr(text: Column) -> Column:
    """argmax over stopword-hit counts, ties resolved in LANG_ORDER;
    zero hits everywhere -> 'und' (undetermined)."""
    counts = {lang: stopword_hits(text, lang) for lang in LANG_ORDER}
    best = F.greatest(*counts.values())
    expr = F.lit("und")
    for lang in reversed(LANG_ORDER):
        expr = F.when((counts[lang] == best) & (best > 0),
                      F.lit(lang)).otherwise(expr)
    return expr


def token_count_expr(text: Column) -> Column:
    """Whitespace tokenization count (size of split on \\s+)."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(text), r"\s+")))


def word_token_count_expr(text: Column) -> Column:
    """BPE-ish token estimate: word pieces + digits + punctuation
    counted separately (regex token classes)."""
    return F.size(F.regexp_extract_all(
        text, F.lit(r"([a-zA-Z]+|[0-9]+|[^\sa-zA-Z0-9])"), 1))


def punct_ratio_expr(text: Column) -> Column:
    npunct = F.length(text) - F.length(
        F.regexp_replace(text, r"[^\w\s]", ""))
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
        npunct / F.length(text))


def quality_score_expr(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword
    presence + punctuation sanity.  Deterministic, documented weights.
    """
    toks = token_count_expr(text)
    len_score = (
        F.when(toks < 5, F.lit(0.0))
        .when(toks < 20, F.lit(0.5))
        .when(toks <= 2000, F.lit(1.0))
        .otherwise(F.lit(0.7)))
    stop_score = F.when(stopword_hits(text, "en") > 0, F.lit(1.0)) \
                  .otherwise(F.lit(0.5))
    punct = punct_ratio_expr(text)
    punct_score = F.when(punct > 0.3, F.lit(0.0)) \
                   .when(punct > 0.1, F.lit(0.5)).otherwise(F.lit(1.0))
    return F.round(0.5 * len_score + 0.25 * stop_score + 0.25 * punct_score,
                   4)


def fingerprint_expr(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase
    text, first 16 hex chars (stable join key for exact dedup)."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.substring(F.md5(norm), 1, 16)
