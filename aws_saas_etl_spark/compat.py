"""pandas-API migration layer: the reference's own pandas code, nearly
verbatim, on Spark.

The reference processes data as eager pandas (reference etl_core.py:17-82,
app.py:165-174). `pyspark.pandas` lets that code run distributed with the
same API — the drop-in first step of a migration, before rewriting to the
engine's native DataFrame operators. This module reproduces both reference
pipelines through the pandas API and is pinned equal to the native
operators in tests/test_compat.py, so a reference user can adopt the
engine in two stages:

  1. swap `import pandas as pd` for `df.pandas_api()` — this module shows
     the same dropna / column-probe / astype / apply calls working;
  2. move hot paths to the native operators (operators/etl.py), which
     replace the per-row `apply` (a row-at-a-time Python UDF under the
     hood — the reference's N-calls-for-N-rows shape, etl_core.py:60)
     with whole-stage-codegen expressions and Arrow-batched UDFs.

Stage 1 is API compatibility, NOT the scale path — `apply` here exists to
mirror the reference faithfully; every registry query uses the native
operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from aws_saas_etl_spark.functions.sentiment import _score_one


def worker_etl_pipeline_pandas_api(df: DataFrame) -> DataFrame:
    """The reference AI-worker pipeline (etl_core.py:17-82) via
    pyspark.pandas — same calls as the reference source:

      dropna()                       (etl_core.py:33)
      'review' if present else 'comments'  (etl_core.py:53-58)
      col.apply(get_sentiment)       (etl_core.py:60)
    """
    psdf = df.pandas_api()
    psdf = psdf.dropna()
    col = "review" if "review" in psdf.columns else "comments"
    psdf["sentiment_result"] = psdf[col].apply(_score_one)
    return psdf.to_spark()


def demo_etl_pipeline_pandas_api(df: DataFrame) -> DataFrame:
    """The reference demo job (app.py:165-174) via pyspark.pandas:
    require 'comments', then ``astype(str).apply(len)`` (app.py:171)."""
    psdf = df.pandas_api()
    if "comments" not in psdf.columns:
        raise ValueError("missing required column: 'comments'")
    # real pandas astype(str) renders NaN as the string 'nan' (so the
    # reference's len() yields 3); pyspark.pandas keeps NULL, which would
    # crash len(None) inside apply — fillna reproduces the reference's
    # behavior byte-for-byte
    psdf["comment_length"] = psdf["comments"].fillna("nan").astype(str).apply(len)
    return psdf.to_spark()
