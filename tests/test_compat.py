"""pandas-API compatibility layer vs the native operators: the reference's
literal pandas calls (via pyspark.pandas) must produce exactly what the
engine's native pipelines produce."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_saas_etl_spark.catalog import load_tables
from aws_saas_etl_spark.operators import etl
from tests.conftest import SF_SMOKE


def test_worker_pipeline_pandas_api_matches_native(spark):
    from aws_saas_etl_spark.compat import worker_etl_pipeline_pandas_api

    docs = (
        load_tables(spark, SF_SMOKE)
        .documents.select(
            F.col("doc_id"), F.col("text").alias("comments"), F.col("lang")
        )
    )
    via_pandas_api = {
        (r.doc_id, r.sentiment_result)
        for r in worker_etl_pipeline_pandas_api(docs).collect()
    }
    via_native = {
        (r.doc_id, r.sentiment_result)
        for r in etl.worker_etl_pipeline(docs).select(
            "doc_id", "sentiment_result"
        ).collect()
    }
    assert via_pandas_api == via_native


def test_demo_pipeline_pandas_api_matches_native(spark):
    from aws_saas_etl_spark.compat import demo_etl_pipeline_pandas_api

    docs = load_tables(spark, SF_SMOKE).documents.select(
        "doc_id", F.col("text").alias("comments")
    )
    via_pandas_api = {
        (r.doc_id, r.comment_length)
        for r in demo_etl_pipeline_pandas_api(docs).collect()
        if r.comments is not None
    }
    via_native = {
        (r.doc_id, r.comment_length)
        for r in etl.demo_etl_pipeline(docs).collect()
        if r.comments is not None
    }
    assert via_pandas_api == via_native


def test_demo_pipeline_pandas_api_null_comments_reference_quirk(spark):
    """Reference quirk pinned: pandas astype(str) renders NaN as 'nan', so
    the reference's len() gives 3 for NULL comments (app.py:171); the
    native operator returns NULL instead (engine semantics)."""
    from aws_saas_etl_spark.compat import demo_etl_pipeline_pandas_api

    df = spark.createDataFrame(
        [(1, "hello"), (2, None)], "doc_id BIGINT, comments STRING"
    )
    got = {r.doc_id: r.comment_length for r in demo_etl_pipeline_pandas_api(df).collect()}
    assert got == {1: 5, 2: 3}
    native = {r.doc_id: r.comment_length for r in etl.demo_etl_pipeline(df).collect()}
    assert native == {1: 5, 2: None}
