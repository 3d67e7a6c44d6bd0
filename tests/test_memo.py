"""memo.MemoDict: self-registration, tracing, and the clear_all reset —
the mechanism bench.py derives its cold/warm set from and
clear_session_memos purges (VERDICT r7 #4)."""

from __future__ import annotations

from aws_saas_etl_spark import memo


def test_memo_registry_and_tracing():
    m = memo.MemoDict("t_demo")
    assert m in memo.all_memos()
    # outside a track() window nothing records and nothing breaks
    m["a"] = 1
    assert m.get("a") == 1

    with memo.track() as touched:
        assert touched == []
        _ = m.get("missing")          # a READ traces too (warm consumers)
    assert touched == ["t_demo"]

    with memo.track() as touched2:
        m["b"] = 2
    assert touched2 == ["t_demo"]
    # nesting restores the outer trace
    with memo.track() as outer:
        with memo.track() as inner:
            m.get("b")
        assert inner == ["t_demo"]
        m.get("a")
    assert outer == ["t_demo"]


def test_clear_all_purges_every_registered_memo():
    ms = [memo.MemoDict(f"t_clear_{i}") for i in range(3)]
    for i, m in enumerate(ms):
        m[i] = i
    memo.clear_all()
    assert all(len(m) == 0 for m in ms)


def test_operator_caches_are_registered():
    """Every stored-artifact cache in the operator modules must be a
    registered MemoDict — a plain dict would silently escape the
    cold-path reset and the bench derivation."""
    from aws_saas_etl_spark.operators import curation, dedup, similarity

    names = {m.name for m in memo.all_memos()}
    for expected in (
        "shingle", "clusters", "base_labels", "ivf_centroids",
        "manifest", "pq_codebook",
    ):
        assert expected in names, expected
