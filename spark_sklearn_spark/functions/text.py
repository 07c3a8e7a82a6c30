"""Text column expressions: tokenization, counting, quality signals,
n-gram language scoring (SURVEY.md §2B text analysis; LLM-pipeline
'language-ID / quality scoring / token counting').

All pure `pyspark.sql.functions` expression trees — they inline into
whole-stage codegen wherever used, so a 100 TB documents scan pays no
interpreter crossings for its text features.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# A BPE-ish pre-tokenization split: word characters | single
# non-space symbols — the regex families GPT-style tokenizers apply
# before merges. Mirrors in DuckDB via regexp_extract_all.
TOKEN_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column | str) -> Column:
    """Whitespace tokens (the fixture's natural grain)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count(text: Column | str, bpe: bool = False) -> Column:
    """Token count: whitespace words, or BPE-ish regex pieces."""
    c = F.col(text) if isinstance(text, str) else text
    if bpe:
        return F.size(F.regexp_extract_all(c, F.lit(TOKEN_RE), 0))
    return F.size(tokens(c))


def stopword_ratio(text: Column | str, stopwords: tuple[str, ...] = ("a", "the")) -> Column:
    """Fraction of tokens that are stopwords — a standard quality
    signal for pretraining filters."""
    t = tokens(text)
    return F.size(F.filter(t, lambda w: w.isin(*stopwords))).cast("double") / F.size(t)


# Tiny per-language marker profiles (function-word heuristics). The
# fixture's documents share one synthetic vocabulary, so scores are
# discriminative only on real text — but the machinery (profile dot
# product per language, argmax) is the real n-gram-lite langid shape.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "a"),
    "de": ("der", "die", "und", "das"),
    "es": ("el", "la", "los", "que"),
    "fr": ("le", "la", "les", "et"),
    "zh": ("的", "了", "是", "在"),
}


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Per-language marker-hit counts (the scoring half of a
    heuristic language-ID; argmax with a fixed key order is the
    decision half)."""
    t = tokens(text)
    return {
        lang: F.size(F.filter(t, lambda w: w.isin(*marks)))
        for lang, marks in LANG_MARKERS.items()
    }
