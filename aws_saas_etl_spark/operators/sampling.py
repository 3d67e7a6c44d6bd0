"""Deterministic corpus sampling / splitting over ``documents`` (SURVEY
§2b training-data pipeline ops).

A training pipeline must split and sample REPRODUCIBLY: the same document
lands in the same split on every run, on any cluster size, after any
repartition — so assignment is a pure function of the stable key, never
of ``rand()`` (whose value depends on partition layout) or of row order.

The bucket function is the first 60 bits of md5(key) mod 100 — engine-
neutral (the DuckDB oracle computes the identical bucket), uniform, and
cheap. At 100 TB this is a map-only pass: no shuffle to assign, and the
per-split/per-stratum aggregates shuffle only (group-key, counters).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aws_saas_etl_spark.catalog import ensure_parallelism, load_tables
from aws_saas_etl_spark.functions import num as N
from aws_saas_etl_spark.functions import text as T

# train/val/test = 80/10/10, assigned by hash bucket — fractions hold per
# corpus slice in expectation, membership is stable document-by-document.
SPLIT_TRAIN_PCT = 80
SPLIT_VAL_PCT = 10
SAMPLE_PCT = 20  # stratified-sample keep fraction


def hash_bucket(key: Column | str, n_buckets: int = 100) -> Column:
    """Deterministic uniform bucket in [0, n_buckets): first 60 bits of
    md5 of the key's string form, mod n_buckets. Engine-neutral — DuckDB's
    ``('0x' || substr(md5(k::VARCHAR), 1, 15))::BIGINT % n`` matches."""
    k = F.col(key) if isinstance(key, str) else key
    h = F.conv(F.substring(F.md5(k.cast("string")), 1, 15), 16, 10).cast("bigint")
    return (h % n_buckets).cast("int")


def split_label(key: Column | str) -> Column:
    """'train' / 'val' / 'test' assignment for a stable key."""
    b = hash_bucket(key)
    return (
        F.when(b < SPLIT_TRAIN_PCT, F.lit("train"))
        .when(b < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def train_val_test_split(spark, sf_dir: str) -> DataFrame:
    """Per-split corpus accounting: document and token counts plus the
    realized fraction (hash buckets give 80/10/10 in expectation; the
    realized share is what a pipeline audits before training)."""
    docs = ensure_parallelism(load_tables(spark, sf_dir).documents)
    tagged = docs.select(
        split_label("doc_id").alias("split"),
        T.token_count("text").alias("n_toks"),
    )
    n_total = docs.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        tagged.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
        )
        .crossJoin(F.broadcast(n_total))
        .select(
            "split",
            "n_docs",
            "n_tokens",
            N.dround(F.col("n_docs") / F.col("n_total") * 100, 4).alias("pct_docs"),
        )
        .orderBy("split")
    )


def stratified_sample_stats(spark, sf_dir: str) -> DataFrame:
    """Per-language stratified sampling audit: keep SAMPLE_PCT% of each
    language stratum by hash bucket (reproducible — no rand()), report
    kept counts and realized rate per stratum in one aggregate pass."""
    docs = ensure_parallelism(load_tables(spark, sf_dir).documents)
    kept = (hash_bucket("doc_id") < SAMPLE_PCT).cast("int")
    return (
        docs.select("lang", kept.alias("kept"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("kept").alias("n_sampled"),
        )
        .select(
            "lang",
            "n_total",
            "n_sampled",
            N.dround(F.col("n_sampled") / F.col("n_total") * 100, 4).alias(
                "sample_pct"
            ),
        )
        .orderBy("lang")
    )
