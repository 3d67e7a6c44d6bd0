"""Property-based differential tests: the engine↔oracle parity kernels.

Every oracle comparison in the registry leans on three agreements between
Spark and DuckDB: decimal-rescale rounding (functions/num.py), the shared
tokenizer spec (functions/text.py ↔ oracles.toks), and hash-bucket
assignment (operators/sampling.py). A divergence in any of them is a
latent hash-mismatch that only fires at some other scale factor or data
distribution — exactly what hypothesis-generated inputs hunt. Each test
pushes a generated batch through BOTH engines and asserts bit-identical
results, with explicit .xx5 half-up boundary cases mixed in.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aws_saas_etl_spark.functions.num import (
    davg_rounded,
    davg_sql,
    dround,
    dround_sql,
    dsum_rounded,
    dsum_sql,
)

# money-scale doubles + adversarial exact .xx5 boundaries
_money = st.one_of(
    st.floats(
        min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
    ),
    st.integers(min_value=-10_000_00, max_value=10_000_00).map(
        lambda c: c / 100 + 0.005
    ),
)

_SETTINGS = dict(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@given(vals=st.lists(_money, min_size=1, max_size=30))
@settings(**_SETTINGS)
def test_dround_matches_duckdb(spark, vals):
    got = (
        spark.createDataFrame([(v,) for v in vals], "v DOUBLE")
        .select(dround(F.col("v"), 2).alias("r"))
        .collect()
    )
    con = duckdb.connect()
    want = [
        con.execute(f"SELECT {dround_sql('CAST(? AS DOUBLE)', 2)}", [v]).fetchone()[0]
        for v in vals
    ]
    assert [r["r"] for r in got] == want


@given(vals=st.lists(_money, min_size=1, max_size=30))
@settings(**_SETTINGS)
def test_dsum_davg_match_duckdb_any_order(spark, vals):
    """Sum/avg must be identical across engines AND across row orders —
    the order-independence the decimal accumulator exists to provide."""
    df = spark.createDataFrame([(v,) for v in vals], "v DOUBLE")
    got = df.agg(
        dsum_rounded(F.col("v"), 2).alias("s"),
        davg_rounded(F.col("v"), 4).alias("a"),
    ).collect()[0]
    got_rev = (
        spark.createDataFrame([(v,) for v in reversed(vals)], "v DOUBLE")
        .agg(
            dsum_rounded(F.col("v"), 2).alias("s"),
            davg_rounded(F.col("v"), 4).alias("a"),
        )
        .collect()[0]
    )
    assert (got["s"], got["a"]) == (got_rev["s"], got_rev["a"])

    con = duckdb.connect()
    con.execute("CREATE TABLE t (v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    want = con.execute(
        f"SELECT {dsum_sql('v', 2)} AS s, {davg_sql('v', 4)} AS a FROM t"
    ).fetchone()
    assert (got["s"], got["a"]) == want


_text = st.text(
    alphabet=st.characters(
        codec="ascii", categories=("L", "N", "P", "Z"), include_characters=" \t"
    ),
    max_size=200,
)


@given(texts=st.lists(_text, min_size=1, max_size=20))
@settings(**_SETTINGS)
def test_tokenizer_matches_duckdb(spark, texts):
    from aws_saas_etl_spark.functions.text import tokens
    from aws_saas_etl_spark.oracles import toks

    got = (
        spark.createDataFrame([(t,) for t in texts], "txt STRING")
        .select(tokens("txt").alias("tk"))
        .collect()
    )
    con = duckdb.connect()
    want = [
        con.execute(f"SELECT {toks('?')}", [t]).fetchone()[0] for t in texts
    ]
    assert [r["tk"] for r in got] == want


@given(keys=st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=30))
@settings(**_SETTINGS)
def test_hash_bucket_matches_duckdb(spark, keys):
    from aws_saas_etl_spark.operators.sampling import hash_bucket

    got = (
        spark.createDataFrame([(k,) for k in keys], "k BIGINT")
        .select(hash_bucket("k").alias("b"))
        .collect()
    )
    con = duckdb.connect()
    want = [
        con.execute(
            "SELECT ('0x' || substr(md5(CAST(? AS VARCHAR)), 1, 15))::BIGINT % 100",
            [k],
        ).fetchone()[0]
        for k in keys
    ]
    assert [r["b"] for r in got] == want


if __name__ == "__main__":  # pragma: no cover
    pytest.main([__file__, "-x", "-q"])
