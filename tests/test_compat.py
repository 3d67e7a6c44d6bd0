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
    }
    via_native = {
        (r.doc_id, r.comment_length)
        for r in etl.demo_etl_pipeline(docs).collect()
    }
    assert via_pandas_api == via_native
