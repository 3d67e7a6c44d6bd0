"""Text-analysis column expressions (all JVM-side built-ins).

Everything here is a pure ``pyspark.sql.functions`` composition — no Python
UDFs — so the hot path stays inside whole-stage codegen and scales linearly
with executors. These power the ``documents``-table text-analysis queries
(SURVEY §2b: token counting, quality scoring, language ID, fingerprinting).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tokenization spec shared with every oracle: lowercase, split on runs of
# non-alphabetic characters, drop empties. Deterministic and cheap.
TOKEN_SPLIT_RE = "[^a-z]+"

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Public-knowledge function words; order matters only for
# deterministic tie-breaking (first match wins ties).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una", "los", "por"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "ein", "nicht", "zu"),
    "fr": ("le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"),
    "zh": ("de", "le", "shi", "bu", "wo", "ni", "ta", "men", "zai", "you"),
}


def tokens(col: Column | str) -> Column:
    """Lowercased alphabetic tokens of a text column (empties removed)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def distinct_token_count(col: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(col)))


def whitespace_token_count(col: Column | str) -> Column:
    """Plain whitespace tokenization — the cheap "word count" used by LLM
    data pipelines as a first-pass length signal."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.filter(F.split(c, r"\s+"), lambda t: t != ""))


def char_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


def alpha_ratio(col: Column | str) -> Column:
    """Fraction of characters that are alphabetic — a quality signal."""
    c = F.col(col) if isinstance(col, str) else col
    n_alpha = F.length(F.regexp_replace(c, "[^a-zA-Z]", ""))
    return F.when(F.length(c) > 0, n_alpha / F.length(c)).otherwise(F.lit(0.0))


def stopword_count(col: Column | str, lang: str = "en") -> Column:
    stops = list(LANG_STOPWORDS[lang])
    return F.size(F.filter(tokens(col), lambda t: t.isin(*stops)))


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    n = token_count(col)
    return F.when(n > 0, stopword_count(col, lang) / n).otherwise(F.lit(0.0))


def mean_token_length(col: Column | str) -> Column:
    ts = tokens(col)
    total = F.aggregate(ts, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(ts) > 0, total.cast("double") / F.size(ts)).otherwise(
        F.lit(0.0)
    )


def quality_score(col: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic combining length, alphabetic
    ratio, and lexical diversity — the shape of score LLM pipelines use to
    filter low-quality documents.

    score = 0.4·min(tokens/100, 1) + 0.3·alpha_ratio + 0.3·distinct/total
    """
    n = token_count(col)
    length_part = F.least(n.cast("double") / F.lit(100.0), F.lit(1.0))
    diversity = F.when(
        n > 0, distinct_token_count(col).cast("double") / n
    ).otherwise(F.lit(0.0))
    return (
        F.lit(0.4) * length_part + F.lit(0.3) * alpha_ratio(col) + F.lit(0.3) * diversity
    )


def language_scores(col: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit counts (the language-ID signal)."""
    return {lang: stopword_count(col, lang) for lang in LANG_STOPWORDS}


def language_id(col: Column | str) -> Column:
    """Argmax language by stopword hits; 'und' (undetermined) when no
    stopword of any language occurs. Ties break in LANG_STOPWORDS order
    (deterministic)."""
    scores = language_scores(col)
    # Argmax via array_max over (score, -declaration_index, lang) structs:
    # highest score wins, ties resolve to the earliest language. Each score
    # expression appears exactly ONCE — a when/otherwise fold was measured
    # 5× slower because the nested branches re-inline the tokenizer
    # expression combinatorially.
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    score.alias("score"), F.lit(-i).alias("ord"), F.lit(lang).alias("lang")
                )
                for i, (lang, score) in enumerate(scores.items())
            ]
        )
    )
    return F.when(best.getField("score") > 0, best.getField("lang")).otherwise(
        F.lit("und")
    )


def normalized_text(col: Column | str) -> Column:
    """Dedup normalization: lowercase, strip non-alphanumerics to single
    spaces, trim — the canonical form for normalized-hash dedup."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalized_text(col))
