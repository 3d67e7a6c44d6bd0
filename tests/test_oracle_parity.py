"""Differential tests: every registered Spark query vs its DuckDB oracle.

Emulates the driver's correctness gate (row count + schema + order-
insensitive value comparison) at sf0.001 so mismatches surface locally
before the driver runs at sf0.01.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from tests.conftest import SF_SMOKE


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def _assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(duck_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    )
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                assert x == pytest.approx(y, abs=1e-9), f"{name}.{col}[{i}]: {x} != {y}"
            else:
                assert (pd.isna(x) and pd.isna(y)) or x == y, (
                    f"{name}.{col}[{i}]: {x!r} != {y!r}"
                )


def _query_names():
    from aws_saas_etl_spark import registry

    return sorted(registry.queries().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, duck, name):
    from aws_saas_etl_spark import registry

    entry = registry._REGISTRY[name]
    spark_pdf = entry.fn(spark, SF_SMOKE).toPandas()
    if entry.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only check: query must at least run
        return
    duck_pdf = duck.execute(entry.oracle).df()
    _assert_frames_match(spark_pdf, duck_pdf, name)
