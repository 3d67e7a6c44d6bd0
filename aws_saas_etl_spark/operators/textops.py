"""Text-analysis queries over the ``documents`` table (SURVEY §2b).

All pure built-in expressions (see functions/text.py) — map-only plans with
no shuffle except the final aggregations; at 100 TB each is a single pass
over the text column with column pruning (only ``text`` + keys are read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_saas_etl_spark.catalog import ensure_parallelism, load_tables
from aws_saas_etl_spark.functions import text as T


def doc_text_stats(spark, sf_dir: str) -> DataFrame:
    """Per-document token/char statistics (token counting, SURVEY §2b)."""
    docs = ensure_parallelism(load_tables(spark, sf_dir).documents)
    return docs.select(
        "doc_id",
        T.char_count("text").alias("n_chars_computed"),
        T.token_count("text").alias("n_tokens"),
        T.distinct_token_count("text").alias("n_distinct_tokens"),
        T.whitespace_token_count("text").alias("n_ws_tokens"),
        F.round(T.mean_token_length("text"), 6).alias("mean_token_len"),
    )


def doc_quality_scores(spark, sf_dir: str) -> DataFrame:
    """Per-document quality signals + composite score (quality filtering)."""
    docs = ensure_parallelism(load_tables(spark, sf_dir).documents)
    return docs.select(
        "doc_id",
        F.round(T.alpha_ratio("text"), 6).alias("alpha_ratio"),
        F.round(T.stopword_ratio("text", "en"), 6).alias("stopword_ratio_en"),
        F.round(T.quality_score("text"), 6).alias("quality_score"),
    )


def doc_language_id(spark, sf_dir: str) -> DataFrame:
    """Stopword-argmax language ID vs the labeled ``lang`` column,
    aggregated into a (lang, lang_pred) confusion table."""
    docs = ensure_parallelism(load_tables(spark, sf_dir).documents)
    return (
        docs.select("lang", T.language_id("text").alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "lang_pred")
    )


def doc_fingerprints(spark, sf_dir: str) -> DataFrame:
    """Rolling/normalized document fingerprint (md5 of normalized text) —
    the join key for cheap cross-corpus dedup."""
    docs = ensure_parallelism(load_tables(spark, sf_dir).documents)
    return docs.select(
        "doc_id",
        T.fingerprint("text").alias("fingerprint"),
        F.sha2(T.normalized_text("text"), 256).alias("sha256_norm"),
    )


def doc_token_frequencies(spark, sf_dir: str, top_n: int = 20) -> DataFrame:
    """Corpus-level top-N token frequencies: explode → two-level aggregate.

    At scale the explode is map-side and the groupBy shuffles (token,
    count) partials only — the classic word-count plan.
    """
    docs = ensure_parallelism(load_tables(spark, sf_dir).documents)
    return (
        docs.select(F.explode(T.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(top_n)
    )
