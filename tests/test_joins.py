"""Tests for skew-salted joins and bucketed (shuffle-free) joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_saas_etl_spark.operators.joins import (
    bucketed_join,
    salted_join,
    write_bucketed,
)
from aws_saas_etl_spark.plans import inspect as PI


def test_salted_join_matches_plain_join(spark):
    # skewed left: 80% of rows share key 1
    left = spark.createDataFrame(
        [(1, f"l{i}") for i in range(800)] + [(i, f"l{i}") for i in range(2, 202)],
        "k BIGINT, lv STRING",
    )
    right = spark.createDataFrame(
        [(i, f"r{i}") for i in range(1, 202)], "rk BIGINT, rv STRING"
    )
    plain = left.join(right, left.k == right.rk).select("k", "lv", "rv")
    salted = salted_join(left, right, "k", "rk").select("k", "lv", "rv")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_hot_key(spark):
    left = spark.createDataFrame([(1, i) for i in range(1000)], "k BIGINT, v BIGINT")
    right = spark.createDataFrame([(1, "x")], "rk BIGINT, rv STRING")
    out = salted_join(left, right, "k", "rk", n_salts=8)
    assert out.count() == 1000
    # salt column must not leak into the result
    assert "__salt" not in out.columns


def test_salted_join_left_outer_matches_plain(spark):
    # unmatched LEFT rows must appear exactly once (null-padded)
    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (99, "unmatched")], "k BIGINT, lv STRING"
    )
    right = spark.createDataFrame([(1, "r1"), (2, "r2")], "rk BIGINT, rv STRING")
    plain = left.join(right, left.k == right.rk, "left").select("k", "lv", "rv")
    salted = salted_join(left, right, "k", "rk", how="left").select("k", "lv", "rv")
    assert sorted(map(tuple, plain.collect()), key=str) == sorted(
        map(tuple, salted.collect()), key=str
    )


def test_salted_join_rejects_outer_joins(spark):
    import pytest

    left = spark.createDataFrame([(1, "a")], "k BIGINT, lv STRING")
    right = spark.createDataFrame([(1, "r")], "rk BIGINT, rv STRING")
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(left, right, "k", "rk", how=how)


def test_bucketed_join_has_no_shuffle(spark):
    left = spark.createDataFrame(
        [(i, i * 10) for i in range(1000)], "k BIGINT, lv BIGINT"
    )
    right = spark.createDataFrame(
        [(i, i * 100) for i in range(1000)], "k BIGINT, rv BIGINT"
    )
    write_bucketed(left, "b_left", "k", n_buckets=8, sort_key="k")
    write_bucketed(right, "b_right", "k", n_buckets=8, sort_key="k")
    # force the sort-merge path (tiny test tables would broadcast and hide
    # the property under test: bucket co-location eliminating the shuffle)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_left", "b_right", "k")
        assert joined.count() == 1000
        # co-located buckets: the sort-merge join needs no Exchange
        assert PI.count_shuffles(joined) == 0
        assert PI.count_sortmerge_joins(joined) == 1
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_left")
        spark.sql("DROP TABLE IF EXISTS b_right")
