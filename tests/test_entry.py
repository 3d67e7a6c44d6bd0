"""Smoke tests for the driver contract module."""

from __future__ import annotations


def test_entry_returns_rows(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_every_query_has_registry_entry(spark):
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert len(qs) > 0
    assert set(oracles).issubset(set(qs))


def test_driver_window_rotation():
    """The driver's correctness gate samples the FIRST 50 names of
    queries(); pin that the round-3 window contains no already-proven
    query (wasted slot) and at most the known rows-only entries."""
    import json
    import os

    from aws_saas_etl_spark import registry

    names = list(registry.queries().keys())
    window = names[:50]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "CORRECTNESS_r02.json")) as f:
        r02 = json.load(f)
    proven = {n for n, v in r02.items() if v.get("hash_match")}
    assert not proven.intersection(window), "proven-green query wastes a window slot"
    rows_only = [n for n in window if n not in registry.oracle_sql()]
    assert rows_only == ["dedup_duplicate_clusters"]
