"""Deterministic lexicon sentiment — the engine's version of the
reference's centerpiece UDF.

The reference calls AWS Comprehend once per row inside ``Series.apply``
(reference etl_core.py:36-60) — a synchronous network round-trip per row.
We freeze the semantics into a local, deterministic lexicon scorer and keep
the reference's contract verbatim:

- null/blank input → ``NEUTRAL``            (etl_core.py:38-39)
- input truncated to 4,900 chars            (etl_core.py:41-43)
- any per-value error → ``ERROR``           (etl_core.py:47-49)
- labels ∈ {POSITIVE, NEGATIVE, NEUTRAL, MIXED}  (reference README.md:26)

Two implementations with IDENTICAL semantics:

1. ``sentiment_expr`` — pure built-in column expression (JVM, codegen,
   zero Python in the hot path). **This is the production path.**
2. ``sentiment_pandas_udf`` — Arrow-vectorized Pandas UDF, demonstrating
   the reference's UDF surface (SURVEY §2a U1) the Spark-native way; it
   exists so the engine has a template for UDFs whose logic genuinely
   can't be expressed with built-ins.

Scoring spec (deterministic, shared with the DuckDB oracle):
  tokens  = lowercase alphabetic tokens of the first 4,900 chars
  p, n    = number of tokens in the positive / negative lexicon
  label   = NEUTRAL  if input null/blank or p == n == 0
            MIXED    if p > 0 and n > 0 and 2·min(p,n) >= max(p,n)
            POSITIVE if p > n else NEGATIVE
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from aws_saas_etl_spark.functions.text import TOKEN_SPLIT_RE

TRUNCATE_AT = 4900  # reference etl_core.py:43

POSITIVE_WORDS: tuple[str, ...] = (
    "fast", "small", "good", "great", "excellent", "love", "best",
    "win", "happy", "wonderful", "clean", "fresh",
)
NEGATIVE_WORDS: tuple[str, ...] = (
    "slow", "dup", "bad", "terrible", "worst", "hate", "fail",
    "error", "broken", "awful", "dirty", "stale",
)


def _counts_expr(col: Column) -> tuple[Column, Column]:
    toks = F.filter(
        F.split(F.lower(F.substring(col, 1, TRUNCATE_AT)), TOKEN_SPLIT_RE),
        lambda t: t != "",
    )
    p = F.size(F.filter(toks, lambda t: t.isin(*POSITIVE_WORDS)))
    n = F.size(F.filter(toks, lambda t: t.isin(*NEGATIVE_WORDS)))
    return p, n


def sentiment_expr(col: Column | str) -> Column:
    """Built-in-only sentiment label (production path)."""
    c = F.col(col) if isinstance(col, str) else col
    p, n = _counts_expr(c)
    blank = c.isNull() | (F.trim(c) == "")
    return (
        F.when(blank, F.lit("NEUTRAL"))
        .when(
            (p > 0) & (n > 0) & (F.least(p, n) * 2 >= F.greatest(p, n)),
            F.lit("MIXED"),
        )
        .when(p > n, F.lit("POSITIVE"))
        .when(n > p, F.lit("NEGATIVE"))
        .otherwise(F.lit("NEUTRAL"))
    )


def _score_one(text: object) -> str:
    """Scalar spec implementation (shared by the Pandas UDF)."""
    try:
        if text is None or (isinstance(text, float) and pd.isna(text)):
            return "NEUTRAL"
        s = str(text)
        if s.strip() == "":
            return "NEUTRAL"
        s = s[:TRUNCATE_AT].lower()
        import re

        toks = [t for t in re.split(TOKEN_SPLIT_RE, s) if t]
        p = sum(t in POSITIVE_WORDS for t in toks)
        n = sum(t in NEGATIVE_WORDS for t in toks)
        if p > 0 and n > 0 and 2 * min(p, n) >= max(p, n):
            return "MIXED"
        if p > n:
            return "POSITIVE"
        if n > p:
            return "NEGATIVE"
        return "NEUTRAL"
    except Exception:
        return "ERROR"  # per-value error sentinel, reference etl_core.py:47-49


# Type passed as an instance (not DDL string) so the UDF can be declared
# before any SparkSession exists.
@pandas_udf(StringType())
def sentiment_pandas_udf(texts: pd.Series) -> pd.Series:
    """Arrow-vectorized sentiment: one Python call per ~10k-row batch
    instead of the reference's one network call per row."""
    return texts.map(_score_one)


def register_sql_udf(spark: SparkSession, name: str = "sentiment") -> None:
    """Expose the scorer to ``spark.sql`` (registration, not a Catalyst
    extension)."""
    spark.udf.register(name, sentiment_pandas_udf)
