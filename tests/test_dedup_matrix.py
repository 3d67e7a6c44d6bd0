"""source duplication matrix: exactness vs a quadratic python reference on
a constructed micro-corpus with planted within- and cross-source exact
duplicates — the non-vacuous gate ADVICE r7 asked for (the sf fixtures
contain zero sha256 dup groups, so the driver row alone proves nothing
about the pair join / ordering dedup / diagonal union)."""

from __future__ import annotations

import itertools

from aws_saas_etl_spark.operators.dedup import (
    duplication_matrix,
    source_duplication_matrix_planted,
)

# (text, source) micro-corpus: exercises every matrix path.
#   "alpha": 2 copies in s1 (diagonal s1), 1 in s2, 1 in s3
#            -> cross cells (s1,s2) (s1,s3) (s2,s3)
#   "beta" : 3 copies in s2 (diagonal s2), 1 in s1 -> cross (s1,s2) again
#   "gamma": unique to s3 -> contributes nothing
#   "delta": 2 copies in s3 and 2 in s1 -> diagonal s1+s3, cross (s1,s3)
CORPUS = [
    ("alpha", "s1"),
    ("alpha", "s1"),
    ("alpha", "s2"),
    ("alpha", "s3"),
    ("beta", "s2"),
    ("beta", "s2"),
    ("beta", "s2"),
    ("beta", "s1"),
    ("gamma", "s3"),
    ("delta", "s3"),
    ("delta", "s3"),
    ("delta", "s1"),
    ("delta", "s1"),
]


def _reference_matrix(rows):
    """Naive reference: group docs by exact text, then for every group
    count source-pair overlap doc-for-doc."""
    groups: dict[str, dict[str, int]] = {}
    for text, src in rows:
        groups.setdefault(text, {}).setdefault(src, 0)
        groups[text][src] += 1
    out: dict[tuple[str, str], list[int]] = {}
    for per_src in groups.values():
        for a, b in itertools.combinations(sorted(per_src), 2):
            cell = out.setdefault((a, b), [0, 0, 0])
            cell[0] += 1
            cell[1] += per_src[a]
            cell[2] += per_src[b]
        for src, nd in per_src.items():
            if nd >= 2:
                cell = out.setdefault((src, src), [0, 0, 0])
                cell[0] += 1
                cell[1] += nd
                cell[2] += nd
    return {
        (a, b, c[0], c[1], c[2]) for (a, b), c in out.items()
    }


def test_matrix_matches_quadratic_reference(spark):
    df = spark.createDataFrame(CORPUS, "text STRING, source STRING")
    got = {
        (r.source_a, r.source_b, r.n_shared_groups, r.n_docs_a, r.n_docs_b)
        for r in duplication_matrix(df).collect()
    }
    want = _reference_matrix(CORPUS)
    assert got == want
    # sanity on the construction itself: both matrix paths populated
    assert any(a == b for a, b, *_ in got), "diagonal path never produced a row"
    assert any(a != b for a, b, *_ in got), "cross path never produced a row"


def test_matrix_expected_cells_pinned(spark):
    """Pin the exact cells by hand (belt to the generated reference's
    braces) so a reference bug can't mask an operator bug."""
    df = spark.createDataFrame(CORPUS, "text STRING, source STRING")
    got = {
        (r.source_a, r.source_b): (r.n_shared_groups, r.n_docs_a, r.n_docs_b)
        for r in duplication_matrix(df).collect()
    }
    assert got == {
        # cross: alpha + beta share (s1,s2); alpha + delta share (s1,s3)
        ("s1", "s2"): (2, 3, 4),  # alpha 2|1 + beta 1|3
        ("s1", "s3"): (2, 4, 3),  # alpha 2|1 + delta 2|2
        ("s2", "s3"): (1, 1, 1),  # alpha only
        # diagonal: groups with >=2 copies inside one source
        ("s1", "s1"): (2, 4, 4),  # alpha(2) + delta(2)
        ("s2", "s2"): (1, 3, 3),  # beta(3)
        ("s3", "s3"): (1, 2, 2),  # delta(2)
    }


def test_planted_variant_is_nonvacuous_on_fixture(spark):
    """The registered planted query must emit rows on the real fixture
    (that's its whole reason to exist) with both paths populated."""
    rows = source_duplication_matrix_planted(spark, "/root/testdata/sf0.001").collect()
    assert rows, "planted matrix emitted nothing — the gate is vacuous again"
    cross = [r for r in rows if r.source_a != r.source_b]
    diag = [r for r in rows if r.source_a == r.source_b]
    assert cross and diag
    # every mirror cell pairs a source with its own mirror, doc-for-doc
    for r in cross:
        if r.source_a.startswith("mirror_"):
            assert r.source_a == f"mirror_{r.source_b}"
            assert r.n_docs_a == r.n_docs_b == r.n_shared_groups


def test_dedup_funnel_five_rungs(spark):
    """The funnel must emit 5 rows: monotone survivor counts down the
    hash rungs (a fuzzier hash can only merge more), the near-dup rung
    consistent with the cluster chain, and the span rung's token
    accounting equal to the coverage metric's sums with the unit switch
    marked."""
    from aws_saas_etl_spark.operators.dedup import dedup_funnel_report
    from aws_saas_etl_spark.operators.textops import doc_crossdoc_duplication
    from tests.conftest import SF_SMOKE

    rows = {r.stage: r for r in dedup_funnel_report(spark, SF_SMOKE).collect()}
    assert set(rows) == {
        "1_exact",
        "2_normalized",
        "3_token_bag",
        "4_near_dup",
        "5_span_tokens",
    }
    assert all(r.n_docs == r.n_groups + r.n_removed for r in rows.values())
    assert (
        rows["1_exact"].n_groups
        >= rows["2_normalized"].n_groups
        >= rows["3_token_bag"].n_groups
    )
    assert {r.unit for s, r in rows.items() if s != "5_span_tokens"} == {"docs"}
    span = rows["5_span_tokens"]
    assert span.unit == "tokens"
    cov = doc_crossdoc_duplication(spark, SF_SMOKE).groupBy().sum(
        "n_tokens", "dup_tokens"
    ).collect()[0]
    assert (span.n_docs, span.n_removed) == tuple(cov)
