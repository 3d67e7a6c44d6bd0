"""Reference-parity ETL operators (SURVEY §2a S1-S3, P1-P10, F1, U1).

The reference's two pipelines:

- demo path (reference app.py:141-189): read CSV → require ``comments``
  column → add ``comment_length = len(str(comments))`` → write CSV
- worker path (reference etl_core.py:17-82): read CSV → dropna(any) →
  pick text column (``review`` preferred over ``comments``,
  etl_core.py:53-58) → per-row sentiment → write CSV

Re-expressed as lazy DataFrame transforms: the whole pipeline is one
Catalyst plan — scan with column pruning, a handful of projections, no
Python in the loop (sentiment is a built-in expression; the Pandas-UDF
variant exists for API parity). At 100 TB these are embarrassingly
parallel map-only stages: zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_saas_etl_spark.catalog import ensure_parallelism, load_tables
from aws_saas_etl_spark.functions.sentiment import (
    sentiment_expr,
    sentiment_pandas_udf,
)


def require_column(df: DataFrame, column: str) -> DataFrame:
    """Schema validation (reference app.py:167-168): fail fast before
    execution if a required column is missing."""
    if column not in df.columns:
        raise ValueError(f"missing required column: {column!r}")
    return df


def pick_text_column(df: DataFrame, preferred: str = "review", fallback: str = "comments") -> str:
    """Dynamic target-column selection (reference etl_core.py:53-58)."""
    if preferred in df.columns:
        return preferred
    if fallback in df.columns:
        return fallback
    raise ValueError(f"neither {preferred!r} nor {fallback!r} present")


def drop_null_rows(df: DataFrame) -> DataFrame:
    """dropna(how='any') parity (reference etl_core.py:33)."""
    return df.na.drop("any")


def with_comment_length(df: DataFrame, column: str, out: str = "comment_length") -> DataFrame:
    """``comment_length = len(str(col))`` (reference app.py:171) — built-in
    cast + length, no UDF."""
    return df.withColumn(out, F.length(F.col(column).cast("string")))


def with_sentiment(df: DataFrame, column: str, out: str = "sentiment_result", use_udf: bool = False) -> DataFrame:
    """Sentiment enrichment (reference etl_core.py:60). ``use_udf=True``
    exercises the Arrow-vectorized Pandas UDF path; default is the pure
    built-in expression (faster, whole-stage codegen)."""
    expr = sentiment_pandas_udf(F.col(column)) if use_udf else sentiment_expr(column)
    return df.withColumn(out, expr)


def demo_etl_pipeline(df: DataFrame) -> DataFrame:
    """The reference demo job (app.py:165-174) as one lazy plan."""
    require_column(df, "comments")
    return with_comment_length(df, "comments")


def worker_etl_pipeline(df: DataFrame, use_udf: bool = False) -> DataFrame:
    """The reference AI-worker job (etl_core.py:17-82) as one lazy plan."""
    col = pick_text_column(df)
    return with_sentiment(drop_null_rows(df), col, use_udf=use_udf)


# --------------------------------------------------------------------------
# Registry-facing queries (documents table stands in for the uploaded CSVs;
# same shapes: free-text column + passthrough columns)
# --------------------------------------------------------------------------

def doc_comment_length(spark, sf_dir: str) -> DataFrame:
    """Demo-path parity on the documents fixture: dropna → cast → length."""
    docs = ensure_parallelism(load_tables(spark, sf_dir).documents)
    return (
        drop_null_rows(docs)
        .transform(lambda d: with_comment_length(d, "text"))
        .select("doc_id", "lang", "source", "n_chars", "comment_length")
    )


def doc_sentiment(spark, sf_dir: str) -> DataFrame:
    """Worker-path parity: sentiment via the built-in expression, counted
    per (lang, label) so the output is a compact contingency table."""
    docs = ensure_parallelism(load_tables(spark, sf_dir).documents)
    return (
        with_sentiment(drop_null_rows(docs), "text")
        .groupBy("lang", "sentiment_result")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "sentiment_result")
    )


def doc_sentiment_udf(spark, sf_dir: str) -> DataFrame:
    """Same result via the Arrow Pandas-UDF path (per-doc rows so the UDF
    output itself is verified value-by-value against the oracle)."""
    docs = ensure_parallelism(load_tables(spark, sf_dir).documents)
    return with_sentiment(drop_null_rows(docs), "text", use_udf=True).select(
        "doc_id", "sentiment_result"
    )
