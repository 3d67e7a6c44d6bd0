"""Similarity-search tests: ANN bucket scaling + recall vs brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_saas_etl_spark.operators.similarity import (
    LSH_BITS_MAX,
    LSH_BITS_MIN,
    ann_lsh_topk,
    knn_bruteforce,
    lsh_bits_for,
    lsh_bucket_expr,
)
from aws_saas_etl_spark.catalog import load_tables
from tests.conftest import SF_SMOKE


def test_lsh_bits_scale_with_corpus():
    # bucket count grows with the corpus so bucket SIZE stays ~flat
    assert lsh_bits_for(1_000) == LSH_BITS_MIN
    assert lsh_bits_for(10_000_000) > lsh_bits_for(200_000)
    assert lsh_bits_for(10**12) == LSH_BITS_MAX  # clamped
    # expected bucket size at the chosen width stays near target
    for n in (10**6, 10**8, 10**10):
        bits = lsh_bits_for(n)
        if bits < LSH_BITS_MAX:
            assert n / 2**bits <= 1024  # never coarser than target


def test_lsh_bits_matches_oracle_integer_characterization():
    """The ann_lsh_topk DuckDB twin derives the bit width as
    ``min {b in [4,24] : 1024·2^b >= n}`` (coalesced to 24) to avoid
    trusting cross-engine libm log2 rounding; pin that this integer form
    equals Python's float ceil(log2(n/1024)) clamp for every corpus size
    up to far beyond driver scales — including the exact power-of-two
    boundaries where a rounding slip would bite."""
    from aws_saas_etl_spark.operators.similarity import (
        LSH_TARGET_BUCKET_ROWS as T,
    )

    def sql_bits(n: int) -> int:
        for b in range(LSH_BITS_MIN, LSH_BITS_MAX + 1):
            if T * (1 << b) >= n:
                return b
        return LSH_BITS_MAX

    sizes = set(range(1, 5000))
    for b in range(LSH_BITS_MAX + 2):
        base = T * (1 << b)
        sizes.update((base - 1, base, base + 1))
    for n in sorted(sizes):
        assert lsh_bits_for(n) == sql_bits(n), n


def test_ivf_cells_matches_oracle_integer_characterization():
    """The ann_ivf_topk DuckDB twin derives n_cells as
    ``min {c in [2, 4096] : c·c >= n}`` (coalesced to 4096) to avoid
    trusting cross-engine libm sqrt rounding; pin that this integer form
    equals Python's ``max(2, min(4096, ceil(sqrt(n))))`` for every
    corpus size up to far beyond driver scales — including the exact
    perfect-square boundaries where a sqrt rounding slip would bite."""
    from aws_saas_etl_spark.operators.similarity import (
        IVF_CELLS_MAX,
        ivf_cells_for,
    )

    def sql_cells(n: int) -> int:
        for c in range(2, IVF_CELLS_MAX + 1):
            if c * c >= n:
                return c
        return IVF_CELLS_MAX

    sizes = set(range(1, 20000))
    for c in (2, 3, 1000, IVF_CELLS_MAX - 1, IVF_CELLS_MAX, IVF_CELLS_MAX + 5):
        sizes.update((c * c - 1, c * c, c * c + 1))
    for n in sorted(sizes):
        assert ivf_cells_for(n) == sql_cells(n), n


def test_ivf_nprobe_integer_ceil():
    """nprobe = max(2, ceil(n_cells/10)) via -(-n // 10): pin the integer
    form against the (n + 9) // 10 the oracle uses, for every legal
    n_cells."""
    from aws_saas_etl_spark.operators.similarity import (
        IVF_CELLS_MAX,
        IVF_NPROBE_DIV,
    )

    for n_cells in range(2, IVF_CELLS_MAX + 1):
        assert max(2, -(-n_cells // IVF_NPROBE_DIV)) == max(
            2, (n_cells + IVF_NPROBE_DIV - 1) // IVF_NPROBE_DIV
        )


def test_bucket_sizes_shrink_as_bits_grow(spark):
    emb = load_tables(spark, SF_SMOKE).embeddings
    def max_bucket(bits: int) -> int:
        return (
            emb.select(lsh_bucket_expr(F.col("embedding"), bits).alias("b"))
            .groupBy("b")
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
    assert max_bucket(6) > max_bucket(10)


def test_ann_recall_against_bruteforce(spark):
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_bruteforce(spark, SF_SMOKE).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_lsh_topk(spark, SF_SMOKE).collect()
    }
    # multi-probe LSH at the auto-selected width must recover a usable
    # fraction of the exact top-k on the smoke corpus
    assert len(approx & exact) / len(exact) >= 0.3


def test_ann_pair_ranked_once(spark):
    out = ann_lsh_topk(spark, SF_SMOKE).groupBy("query_id", "neighbor_id").count()
    assert out.agg(F.max("count")).collect()[0][0] == 1


def test_ivf_recall_against_bruteforce(spark):
    from aws_saas_etl_spark.operators.similarity import ann_ivf_topk

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_bruteforce(spark, SF_SMOKE).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_ivf_topk(spark, SF_SMOKE).collect()
    }
    assert len(approx & exact) / len(exact) >= 0.3


def test_ivf_cells_cover_corpus(spark):
    """Every corpus vector lands in exactly one cell, and the number of
    distinct cells matches the √n sizing."""
    from aws_saas_etl_spark.catalog import load_tables
    from aws_saas_etl_spark.operators.similarity import (
        _assign_cells,
        ivf_cells_for,
        ivf_fit_cells,
    )

    emb = load_tables(spark, SF_SMOKE).embeddings
    n = emb.count()
    cells = ivf_fit_cells(emb, ivf_cells_for(n))
    assigned = _assign_cells(emb.select("vec_id", "embedding"), cells)
    assert assigned.count() == n
    assert assigned.select("vec_id").distinct().count() == n
    assert cells.count() == ivf_cells_for(n)


def test_random_projection_unit_vectors(spark):
    """Projecting e_i must yield exactly rp_sign(i, j) in output dim j —
    pins both the weight formula and the element order."""
    from aws_saas_etl_spark.operators import similarity as S

    dim = S.EMBED_DIM
    rows = [(i, [1.0 if d == i else 0.0 for d in range(dim)]) for d, i in [(0, 0), (0, 17), (0, 63)]]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    df.createOrReplaceTempView("__rp_unit")
    from pyspark.sql import functions as F

    cols = [F.col("vec_id")]
    for j in range(S.RP_OUT_DIMS):
        acc = None
        for i in range(dim):
            s = S.rp_sign(i, j)
            if s == 0:
                continue
            t = F.col("embedding").getItem(i).cast("double")
            t = -t if s < 0 else t
            acc = t if acc is None else acc + t
        cols.append(acc.alias(f"p{j}"))
    got = {r.vec_id: r for r in df.select(*cols).collect()}
    for vec_id in (0, 17, 63):
        for j in range(S.RP_OUT_DIMS):
            assert got[vec_id][f"p{j}"] == float(S.rp_sign(vec_id, j)), (vec_id, j)


def test_random_projection_density(spark):
    """Achlioptas density: ~1/3 of weights nonzero, both signs present."""
    from aws_saas_etl_spark.operators import similarity as S

    weights = [
        S.rp_sign(i, j) for i in range(S.EMBED_DIM) for j in range(S.RP_OUT_DIMS)
    ]
    nonzero = sum(1 for w in weights if w != 0)
    assert 0.2 < nonzero / len(weights) < 0.45
    assert any(w > 0 for w in weights) and any(w < 0 for w in weights)


def test_label_principal_axis_invariants(spark):
    """applyInPandas eigen-kernel: unit-norm axis, non-negative explained
    variance that dominates random directions (Rayleigh maximality), and
    bit-stable reruns (fixed start vector + iteration count)."""
    import numpy as np

    from aws_saas_etl_spark.catalog import load_tables
    from aws_saas_etl_spark.operators.similarity import label_principal_axis
    from tests.conftest import SF_SMOKE

    rows = label_principal_axis(spark, SF_SMOKE).collect()
    assert rows
    again = label_principal_axis(spark, SF_SMOKE).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]

    emb = load_tables(spark, SF_SMOKE).embeddings.collect()
    by_label = {}
    for r in emb:
        by_label.setdefault(r.label, []).append(r.embedding)
    rng = np.random.RandomState(0)
    for r in rows:
        v = np.array([float(c) for c in r.axis.split(",")])
        assert abs(np.linalg.norm(v) - 1.0) < 1e-6
        x = np.stack(by_label[r.label]).astype(np.float64)
        xc = x - x.mean(axis=0)
        assert r.n_vectors == len(x)
        ray = float(v @ (xc.T @ (xc @ v))) / max(len(x) - 1, 1)
        assert abs(ray - r.explained_variance) < 1e-4
        for _ in range(5):
            u = rng.randn(x.shape[1])
            u /= np.linalg.norm(u)
            assert ray >= float(u @ (xc.T @ (xc @ u))) / max(len(x) - 1, 1) - 1e-9
        # in-row self-audit (VERDICT r8 #6): the emitted relative
        # eigen-residual must match an independent recompute and be
        # small after 50 power iterations on the real fixture
        cov_v = (xc.T @ (xc @ v)) / max(len(x) - 1, 1)
        resid = float(np.linalg.norm(cov_v - ray * v)) / ray
        # v here is rebuilt from the 6dp axis string, so allow string
        # truncation noise on the consistency check
        assert abs(resid - r.eigen_residual) < 5e-4, r.label
        # the isotropic fixture's top eigenvalues are near-degenerate
        # (random data), so 50 power iterations leave up to ~1e-2 —
        # the audit REPORTS it; the bound pins the convergence regime
        assert 0.0 <= r.eigen_residual < 0.05, (r.label, r.eigen_residual)


def test_hll_merge_self_audit(spark):
    """merge(per-segment sketches) must estimate within 5% of the exact
    global distinct, and every per-segment estimate within 5% of its
    exact count (the sketch-as-column merge invariant)."""
    from aws_saas_etl_spark.operators.sampling import customer_distinct_hll_merge
    from tests.conftest import SF_SMOKE

    rows = customer_distinct_hll_merge(spark, SF_SMOKE).collect()
    scopes = {r.scope for r in rows}
    assert "__ALL__" in scopes and len(scopes) >= 2
    for r in rows:
        assert r.rel_error < 0.05, (r.scope, r.rel_error)


def test_label_principal_axis_orthogonal_start_fallback():
    """If the data span is orthogonal to e_0 (first coordinate identically
    zero after centering), the kernel must fall back to an in-span start
    and still return the true principal axis, not e_0."""
    import numpy as np
    import pandas as pd

    from aws_saas_etl_spark.operators.similarity import principal_axis_kernel

    # variance only along dimension 1; coordinate 0 constant -> xc @ e0 == 0
    pdf = pd.DataFrame(
        {
            "label": [0] * 4,
            "embedding": [np.array([5.0, v, 0.0, 0.0]) for v in (-3, -1, 1, 3)],
        }
    )
    out = principal_axis_kernel(pdf)
    axis = np.array([float(c) for c in out["axis"].iloc[0].split(",")])
    assert abs(abs(axis[1]) - 1.0) < 1e-6  # principal axis is ±e_1
    assert abs(axis[0]) < 1e-6
    assert out["explained_variance"].iloc[0] > 0
    # sign normalization: first nonzero component positive
    nz = axis[np.abs(axis) > 1e-12]
    assert nz[0] > 0


def test_triplet_mining_invariants(spark):
    """Pins the mine's contract on the smoke corpus: the hard positive is
    the same-label minimum-cosine other (hand-recomputed from the knn
    pair space), the hard negative the different-label maximum, margins
    are their difference, and each anchor appears exactly once."""
    from aws_saas_etl_spark.catalog import load_tables
    from aws_saas_etl_spark.operators.similarity import (
        N_QUERY_VECS,
        cosine,
        embedding_triplet_mining,
    )
    from pyspark.sql import functions as F

    rows = embedding_triplet_mining(spark, SF_SMOKE).collect()
    assert len(rows) == N_QUERY_VECS
    assert len({r.anchor_id for r in rows}) == N_QUERY_VECS

    emb = load_tables(spark, SF_SMOKE).embeddings
    a = emb.where(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("aid"), F.col("label").alias("al"),
        F.col("embedding").alias("qe"))
    o = emb.select(F.col("vec_id").alias("oid"), F.col("label").alias("ol"),
                   F.col("embedding").alias("ce"))
    pairs = (o.crossJoin(a).where(F.col("oid") != F.col("aid"))
             .select("aid", "al", "oid", "ol",
                     F.round(cosine(F.col("qe"), F.col("ce")), 6).alias("s"))
             .collect())
    by_anchor = {}
    for p in pairs:
        by_anchor.setdefault(p.aid, []).append(p)
    for r in rows:
        ps = by_anchor[r.anchor_id]
        pos = sorted((p for p in ps if p.ol == r.label),
                     key=lambda p: (p.s, p.oid))
        neg = sorted((p for p in ps if p.ol != r.label),
                     key=lambda p: (-p.s, -p.oid))
        assert (r.hard_pos_id, r.pos_sim) == (pos[0].oid, pos[0].s)
        assert (r.hard_neg_id, r.neg_sim) == (neg[0].oid, neg[0].s)
        assert r.margin == round(r.pos_sim - r.neg_sim, 6)


def test_ivf_store_roundtrip_bit_exact_and_probe_identical(spark):
    """The persisted-index leg: centroids written through the manifest
    sink and read back must be BIT-identical to the in-session fit
    (doubles roundtrip parquet verbatim — the property the shared
    ANN_IVF_TOPK_SQL hash gate rests on), and the probe served from the
    stored table must equal ann_ivf_topk row for row."""
    from aws_saas_etl_spark.operators import similarity as S

    S._IVF_CACHE.clear()
    served = S.ann_ivf_store_roundtrip(spark, SF_SMOKE).collect()

    # the memo now holds the fitted table the roundtrip wrote; compare
    # the STORED bytes against it
    from aws_saas_etl_spark.catalog import load_tables as _lt
    from aws_saas_etl_spark.sources.custom import proc_dir, read_manifest_parquet

    emb = _lt(spark, SF_SMOKE).embeddings
    n_cells = S.ivf_cells_for(emb.count())
    (key,) = [k for k in S._IVF_CACHE if k[1] == SF_SMOKE]
    fitted = {r["cell"]: r["centroid"] for r in S._IVF_CACHE[key].collect()}
    stored = {
        r["cell"]: r["centroid"]
        for r in read_manifest_parquet(
            spark, proc_dir("ivf_index", SF_SMOKE, n_cells)
        ).collect()
    }
    assert fitted.keys() == stored.keys()
    for cell, cen in fitted.items():
        assert list(cen) == list(stored[cell]), cell  # exact, no tolerance

    in_session = S.ann_ivf_topk(spark, SF_SMOKE).collect()
    assert [tuple(r) for r in served] == [tuple(r) for r in in_session]


def test_ivf_incremental_append_serves_arrivals(spark):
    """Stale-index semantics: the fit sees only the base slice, yet
    arrivals (vec_id above the integer-rank cut) must be immediately
    searchable — at least one appears among some query's neighbors — and
    the served set must cover the same queries as the fresh-fit path."""
    from aws_saas_etl_spark.operators import similarity as S

    emb = load_tables(spark, SF_SMOKE).embeddings
    n = emb.count()
    cut_row = (
        emb.select("vec_id").orderBy("vec_id").limit(n - n // 10)
        .agg(F.max("vec_id")).first()
    )
    out = S.ann_ivf_incremental_append(spark, SF_SMOKE).collect()
    assert out, "stale-index probe returned nothing"
    arrivals_served = [r for r in out if r["neighbor_id"] > cut_row[0]]
    assert arrivals_served, "no arrival vector appeared as a neighbor"
    fresh = S.ann_ivf_topk(spark, SF_SMOKE).collect()
    assert {r["query_id"] for r in out} == {r["query_id"] for r in fresh}


def test_ivf_deletion_repair_forgets_deleted_vectors(spark):
    """Vector-side right-to-be-forgotten: no deleted vec_id may appear as
    a neighbor OR a query after the repair, and surviving queries must
    still be served (candidate promotion, not truncation, fills ranks)."""
    from aws_saas_etl_spark.operators import similarity as S

    out = S.ann_ivf_deletion_repair(spark, SF_SMOKE).collect()
    assert out
    assert all(r["neighbor_id"] % S.VEC_DELETION_MOD != 0 for r in out)
    assert all(r["query_id"] % S.VEC_DELETION_MOD != 0 for r in out)
    # a neighbor that replaced a deleted one: some rank is occupied by an
    # id absent from the unfiltered top-k at the same rank position
    full = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in S.ann_ivf_topk(spark, SF_SMOKE).collect()
    }
    assert any(
        full.get((r["query_id"], r["rank"])) != r["neighbor_id"] for r in out
    )


def test_lexical_indexed_equals_bruteforce_on_positive_overlap(spark):
    """The inverted-index retriever must agree EXACTLY with the
    brute-force scan wherever both are defined: indexed rows all carry
    positive jaccard (zero-overlap pairs are unreachable through an
    index), and for every query whose brute-force top-k is all-positive
    the two row sets are identical (same neighbors, scores, ranks)."""
    from aws_saas_etl_spark.operators.similarity import (
        doc_lexical_topk,
        doc_lexical_topk_indexed,
    )

    brute = {}
    for r in doc_lexical_topk(spark, SF_SMOKE).collect():
        brute.setdefault(r.query_id, []).append((r.neighbor_id, r.jaccard, r.rank))
    idx = {}
    for r in doc_lexical_topk_indexed(spark, SF_SMOKE).collect():
        assert r.jaccard > 0, (r.query_id, r.neighbor_id)
        idx.setdefault(r.query_id, []).append((r.neighbor_id, r.jaccard, r.rank))
    assert idx and set(idx) <= set(brute)
    compared = 0
    for q, rows in brute.items():
        if all(j > 0 for _, j, _ in rows):
            assert sorted(idx[q]) == sorted(rows), q
            compared += 1
    assert compared, "no all-positive query to compare"


def test_filtered_search_respects_predicate_and_promotes(spark):
    """Filtered vector search: every returned neighbor must carry the
    query's own label, queries are still served, and at least one
    returned neighbor is ABSENT from the unfiltered top-k at the same
    settings — the filter promotes deeper same-label candidates rather
    than merely post-filtering the unfiltered result list."""
    from aws_saas_etl_spark.operators import similarity as S

    emb = load_tables(spark, SF_SMOKE).embeddings
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    out = S.ann_ivf_filtered_topk(spark, SF_SMOKE).collect()
    assert out
    for r in out:
        assert r.label == labels[r.query_id], (r.query_id, r.neighbor_id)
        assert labels[r.neighbor_id] == labels[r.query_id]
    plain = {
        (r.query_id, r.neighbor_id)
        for r in S.ann_ivf_topk(spark, SF_SMOKE).collect()
    }
    assert any((r.query_id, r.neighbor_id) not in plain for r in out)
    # pre-filter branch = exact filtered ground truth; the post-filter
    # probe's hits must be a meaningful fraction of it (it can only
    # miss same-label vectors living in un-probed cells)
    exact_f = {
        (r.query_id, r.neighbor_id)
        for r in S.knn_filtered_bruteforce(spark, SF_SMOKE).collect()
    }
    got = {(r.query_id, r.neighbor_id) for r in out}
    assert exact_f, "pre-filter branch returned nothing"
    recall = len(got & exact_f) / len(exact_f)
    # measured 0.22 on the isotropic smoke fixture — labels are
    # uncorrelated with cells there, the documented worst case that
    # makes engines switch to the pre-filter branch; pin the floor
    assert recall >= 0.15, recall


def test_pq_incremental_append_serves_arrivals(spark):
    """Stale-codebook semantics (the PQ analog of the IVF append test):
    codebooks fitted on the base slice only, yet arrivals encode against
    them and must be immediately searchable — at least one arrival
    appears as a neighbor — and query coverage matches the fresh-fit
    PQ path."""
    from aws_saas_etl_spark.operators import similarity as S

    emb = load_tables(spark, SF_SMOKE).embeddings
    n = emb.count()
    cut_row = (
        emb.select("vec_id").orderBy("vec_id").limit(n - n // 10)
        .agg(F.max("vec_id")).first()
    )
    out = S.ann_pq_incremental_append(spark, SF_SMOKE).collect()
    assert out, "stale-codebook serving returned nothing"
    assert [r for r in out if r["neighbor_id"] > cut_row[0]], (
        "no arrival vector appeared as a neighbor"
    )
    fresh = S.ann_pq_adc_topk(spark, SF_SMOKE).collect()
    assert {r["query_id"] for r in out} == {r["query_id"] for r in fresh}


def test_pq_deletion_repair_forgets_deleted_vectors(spark):
    """PQ code-table right-to-be-forgotten: no deleted vec_id may appear
    as a neighbor OR a query after the repair; surviving queries are
    still served; and some rank is filled by a promoted survivor."""
    from aws_saas_etl_spark.operators import similarity as S

    out = S.ann_pq_deletion_repair(spark, SF_SMOKE).collect()
    assert out
    assert all(r["neighbor_id"] % S.VEC_DELETION_MOD != 0 for r in out)
    assert all(r["query_id"] % S.VEC_DELETION_MOD != 0 for r in out)
    full = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in S.ann_pq_adc_topk(spark, SF_SMOKE).collect()
    }
    assert any(
        full.get((r["query_id"], r["rank"])) != r["neighbor_id"] for r in out
    )


def _mixture_emb(spark, rng, n_clusters, per_cluster, dim, noise):
    """Deterministic mixture-of-Gaussians embedding frame in the
    ``embeddings`` table shape (vec_id, embedding). Cluster centers are
    unit-scale; points = center + N(0, noise²). vec_ids are striped
    across clusters so the first N_QUERY_VECS query ids cover many
    clusters."""
    import numpy as np

    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for j in range(per_cluster):
        for c in range(n_clusters):
            v = centers[c] + noise * rng.standard_normal(dim)
            rows.append((j * n_clusters + c, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")


def _numpy_exact_topk(rows, query_ids, k):
    """Exact cosine top-k reference (excluding self)."""
    import numpy as np

    ids = np.array([r[0] for r in rows])
    X = np.array([r[1] for r in rows])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    out = {}
    for q in query_ids:
        qi = int(np.where(ids == q)[0][0])
        sims = Xn @ Xn[qi]
        sims[qi] = -2.0
        top = ids[np.argsort(-sims, kind="stable")[:k]]
        out[q] = set(int(t) for t in top)
    return out


def _ivf_recall(spark, emb_df, n_cells, nprobe, k):
    from aws_saas_etl_spark.operators.similarity import (
        N_QUERY_VECS,
        _ivf_probe,
        ivf_fit_cells,
    )

    cells = ivf_fit_cells(emb_df, n_cells)
    approx = {}
    for r in _ivf_probe(emb_df, cells, nprobe, k).collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    rows = [(r.vec_id, list(r.embedding)) for r in emb_df.collect()]
    qids = [r[0] for r in rows if r[0] < N_QUERY_VECS]
    exact = _numpy_exact_topk(rows, qids, k)
    hits = sum(len(approx.get(q, set()) & exact[q]) for q in qids)
    return hits / (len(qids) * k)


def test_ivf_recall_bends_up_on_clustered_embeddings(spark):
    """VERDICT r7 #7: the fixture embeddings are i.i.d.-random
    (isotropic), where centroid routing carries no signal and recall is
    ~linear in the probed fraction (measured 0.42 @ 9%). On CLUSTERED
    data — the realistic regime IVF exists for — the same probe fraction
    must recall far more, because true neighbors share the query's cell.
    Pin the curve: recall ≥ 0.8 on a mixture of 16 Gaussians probing
    2/16 cells (12.5%), and strictly above the isotropic recall at the
    identical (n, dim, n_cells, nprobe) settings."""
    import numpy as np

    rng = np.random.default_rng(8)
    dim, n_clusters, per_cluster = 16, 16, 30
    clustered = _mixture_emb(spark, rng, n_clusters, per_cluster, dim, noise=0.08)
    recall_clustered = _ivf_recall(spark, clustered, n_cells=16, nprobe=2, k=10)

    n = n_clusters * per_cluster
    iso_rows = [
        (i, [float(x) for x in rng.standard_normal(dim)]) for i in range(n)
    ]
    isotropic = spark.createDataFrame(
        iso_rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    )
    recall_iso = _ivf_recall(spark, isotropic, n_cells=16, nprobe=2, k=10)

    assert recall_clustered >= 0.8, f"clustered recall {recall_clustered}"
    assert recall_clustered > recall_iso + 0.2, (recall_clustered, recall_iso)


def test_ivf_fit_validates_component_range(spark):
    """ADVICE r7: the quantized-integer fit silently diverges between
    engines if |x|·1e9 leaves BIGINT — the precondition must be CHECKED,
    not assumed. In-range fits work; an out-of-range frame raises."""
    import pytest as _pytest

    from aws_saas_etl_spark.operators.similarity import (
        IVF_MAX_ABS_COMPONENT,
        ivf_fit_cells,
    )

    ok = spark.createDataFrame(
        [(i, [float(i % 7), 1.0]) for i in range(20)],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    assert ivf_fit_cells(ok, 2).count() == 2

    bad = spark.createDataFrame(
        [(0, [0.5, 1.0]), (1, [IVF_MAX_ABS_COMPONENT * 3, 0.0])],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    with _pytest.raises(ValueError, match="exceeds"):
        ivf_fit_cells(bad, 1)


def test_fixture_embeddings_within_quant_bound(spark):
    """The sf fixtures must satisfy the validated |x| ≤ 8 precondition
    (they do by construction; this pins it so a fixture change surfaces
    loudly rather than as an engine divergence)."""
    from aws_saas_etl_spark.operators.similarity import IVF_MAX_ABS_COMPONENT

    emb = load_tables(spark, SF_SMOKE).embeddings
    m = emb.select(
        F.max(
            F.aggregate(
                F.col("embedding"),
                F.lit(0.0),
                lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
            )
        ).alias("m")
    ).first()["m"]
    assert m <= IVF_MAX_ABS_COMPONENT


def test_approx_distinct_parts_self_audit(spark):
    """VERDICT r7 #6: the HLL++ query must carry its own exact count and
    error bound. rsd=0.01, so rel_err ≤ 3·rsd on every group."""
    from aws_saas_etl_spark.operators.relational import approx_distinct_parts

    rows = approx_distinct_parts(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert set(r.asDict()) == {
            "l_returnflag", "approx_parts", "exact_parts", "n_rows", "rel_err"
        }
        assert r.rel_err <= 0.03, (r.l_returnflag, r.rel_err)
        assert r.exact_parts <= r.n_rows


def test_hybrid_rrf_fusion_semantics(spark):
    """RRF invariants on the real fixture (3-arm since r9): scores equal
    the replayed 1/(60+rank) arithmetic over the LSH, IVF, and lexical
    arms, agreement dominates — a neighbor returned by m arms outranks
    any returned by m−1 (m/(60+TOP_K) > (m−1)/(60+1) at TOP_K=5), and
    membership flags are consistent with the inputs."""
    from aws_saas_etl_spark.operators.similarity import (
        RRF_K,
        TOP_K,
        ann_hybrid_rrf,
        ann_ivf_topk,
        ann_lsh_topk,
        doc_lexical_topk,
    )

    arms = {
        "in_lsh": {
            (r.query_id, r.neighbor_id): r.rank
            for r in ann_lsh_topk(spark, SF_SMOKE).collect()
        },
        "in_ivf": {
            (r.query_id, r.neighbor_id): r.rank
            for r in ann_ivf_topk(spark, SF_SMOKE).collect()
        },
        "in_lex": {
            (r.query_id, r.neighbor_id): r.rank
            for r in doc_lexical_topk(spark, SF_SMOKE).collect()
        },
    }
    out = ann_hybrid_rrf(spark, SF_SMOKE).collect()
    assert out
    assert any(r.in_lsh + r.in_ivf + r.in_lex >= 2 for r in out), "no agreement rows"
    for r in out:
        key = (r.query_id, r.neighbor_id)
        expect = 0.0
        for flag, ranks in arms.items():
            assert getattr(r, flag) == (key in ranks), (flag, key)
            if key in ranks:
                expect += 1.0 / (RRF_K + ranks[key])
        expect = round(expect, 6)
        assert abs(r.rrf_score - expect) < 1e-9, (key, r.rrf_score, expect)
        assert r.fused_rank <= TOP_K
    # agreement dominance within each query: rows with more arms outrank
    # rows with fewer (m/(60+TOP_K) > (m−1)/(60+1) for TOP_K=5)
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for rows in by_q.values():
        by_m = {}
        for r in rows:
            by_m.setdefault(r.in_lsh + r.in_ivf + r.in_lex, []).append(r.fused_rank)
        ms = sorted(by_m)
        for hi, lo in zip(ms[1:], ms[:-1]):
            assert max(by_m[hi]) < min(by_m[lo])


def test_pq_codes_and_refined_recall(spark):
    """PQ/ADC invariants on the fixture: every vector gets exactly PQ_M
    codes in [0, PQ_K); the refined (ADC shortlist → exact re-rank)
    top-k recalls ≥ 0.5 of the brute-force truth even on the hard
    isotropic fixture (ADC alone measured 0.06 pre-normalization, 0.18
    raw — the shortlist+refine shape is what makes PQ serve)."""
    from aws_saas_etl_spark.catalog import load_tables
    from aws_saas_etl_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        _pq_argmin,
        _pq_codebooks_cached,
        _pq_subvectors,
        ann_pq_adc_topk,
    )

    emb = load_tables(spark, SF_SMOKE).embeddings
    n = emb.count()
    cb = _pq_codebooks_cached(spark, SF_SMOKE, emb)
    codes = _pq_argmin(_pq_subvectors(emb), cb).collect()
    assert len(codes) == n * PQ_M
    assert all(0 <= r.code < PQ_K for r in codes)

    exact = {
        (r.query_id, r.neighbor_id)
        for r in knn_bruteforce(spark, SF_SMOKE).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ann_pq_adc_topk(spark, SF_SMOKE).collect()
    }
    assert len(approx & exact) / len(exact) >= 0.5


def test_pq_refined_recall_high_on_clustered_embeddings(spark):
    """On clustered data (the regime PQ serves in production) the
    refined pipeline must recover nearly all true neighbors: the ADC
    shortlist keeps every same-cluster candidate (identical codes tie)
    and the exact re-rank orders them — pin recall ≥ 0.9 on the
    16-Gaussian mixture."""
    import numpy as np
    from pyspark.sql import Window

    from aws_saas_etl_spark.operators.similarity import (
        N_QUERY_VECS,
        PQ_REFINE,
        _l2sq,
        _pq_argmin,
        _pq_subvectors,
        cosine,
        pq_fit_codebooks,
    )

    rng = np.random.default_rng(8)
    emb = _mixture_emb(spark, rng, 16, 30, 64, noise=0.08)
    cb = pq_fit_codebooks(emb)
    codes = _pq_argmin(_pq_subvectors(emb), cb).select("vec_id", "m", "code")
    qsubs = _pq_subvectors(emb.where(F.col("vec_id") < N_QUERY_VECS)).select(
        F.col("vec_id").alias("query_id"), "m", "sub"
    )
    qtab = qsubs.join(F.broadcast(cb), "m").select(
        "query_id", "m", "code",
        F.floor(_l2sq(F.col("sub"), F.col("centroid")) * F.lit(1e9))
        .cast("long").alias("dint"),
    )
    adc_w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    shortlist = (
        codes.join(F.broadcast(qtab), ["m", "code"])
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("dint").alias("adc_dist"))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("adc_rank", F.row_number().over(adc_w))
        .where(F.col("adc_rank") <= PQ_REFINE)
    )
    nbrs = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    qv = emb.where(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    ref_w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    k = 10
    out = (
        shortlist.join(nbrs, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id", "neighbor_id",
            F.round(cosine(F.col("q_emb"), F.col("c_emb")), 6).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(ref_w))
        .where(F.col("rank") <= k)
    )
    approx = {}
    for r in out.collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    rows = [(r.vec_id, list(r.embedding)) for r in emb.collect()]
    qids = [r[0] for r in rows if r[0] < N_QUERY_VECS]
    exact = _numpy_exact_topk(rows, qids, k)
    recall = sum(len(approx.get(q, set()) & exact[q]) for q in qids) / (
        len(qids) * k
    )
    assert recall >= 0.9, recall


def test_residual_codes_cut_reconstruction_error_on_clustered(spark):
    """The precision-per-bit claim of residual IVF-PQ, measured directly:
    on clustered data the total squared reconstruction error of residual
    codes (û ≈ ĉ_cell + codeword) must be WELL below plain PQ's
    (û ≈ codeword) at the identical 4-bit budget — residuals concentrate
    in the noise ball once the coarse index has captured the clusters,
    so the same 16 codewords per subspace quantize a far smaller set."""
    import numpy as np

    from aws_saas_etl_spark.operators.similarity import (
        _assign_cells,
        _pq_argmin,
        _pq_fit_from_subs,
        _pq_subvectors,
        _subspace_slices,
        _l2sq,
        dot,
        ivf_cells_for,
        ivf_fit_cells,
        pq_fit_codebooks,
    )

    rng = np.random.default_rng(9)
    emb = _mixture_emb(spark, rng, 16, 30, 64, noise=0.08)

    def total_err(subs, cb):
        return (
            _pq_argmin(subs, cb)
            .join(cb, ["m", "code"])
            .agg(F.sum(_l2sq(F.col("sub"), F.col("centroid"))).alias("e"))
            .first()["e"]
        )

    plain_err = total_err(_pq_subvectors(emb), pq_fit_codebooks(emb))

    coarse = ivf_fit_cells(emb, ivf_cells_for(emb.count()))
    ncent = coarse.select(
        "cell",
        F.transform(
            "centroid",
            lambda x: x / F.sqrt(dot(F.col("centroid"), F.col("centroid"))),
        ).alias("nc"),
    )
    unit = F.transform(
        F.col("embedding"),
        lambda x: x.cast("double")
        / F.sqrt(dot(F.col("embedding"), F.col("embedding"))),
    )
    resid = (
        emb.select("vec_id", unit.alias("u"))
        .join(_assign_cells(emb, coarse).select("vec_id", "cell"), "vec_id")
        .join(F.broadcast(ncent), "cell")
        .select("vec_id", F.zip_with("u", "nc", lambda a, b: a - b).alias("r"))
    )
    rsubs = _subspace_slices(resid, "r")
    resid_err = total_err(rsubs, _pq_fit_from_subs(rsubs))

    # measured 91.4 vs 159.2 (0.57×) on this fixture — the 2-round Lloyd
    # and coarse-centroid estimation error keep it above the asymptotic
    # gap; pin the band, not the decimal
    assert resid_err < 0.75 * plain_err, (resid_err, plain_err)


def test_ivfpq_recall_matches_ivf_after_refine(spark):
    """IVF-PQ must not lose recall vs the plain IVF probe at equal
    nprobe: the probed cells bound both candidate sets, and the exact
    refine restores true ordering inside them — the PQ layer buys the
    64× memory cut for free after refine (measured: identical 0.44
    recall on the fixture). Allow a small slack for shortlist-cap
    boundary cases."""
    from aws_saas_etl_spark.operators.similarity import (
        ann_ivf_topk,
        ann_ivfpq_topk,
    )

    exact = {
        (r.query_id, r.neighbor_id)
        for r in knn_bruteforce(spark, SF_SMOKE).collect()
    }
    ivfpq = {
        (r.query_id, r.neighbor_id)
        for r in ann_ivfpq_topk(spark, SF_SMOKE).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in ann_ivf_topk(spark, SF_SMOKE).collect()
    }
    r_pq = len(exact & ivfpq) / len(exact)
    r_ivf = len(exact & ivf) / len(exact)
    assert r_pq >= r_ivf - 0.05, (r_pq, r_ivf)
    assert r_pq >= 0.3


def test_pq_store_roundtrip_bit_exact(spark):
    """Stored codebooks must be bit-identical to the fitted ones, and
    the stored-serving result identical to the in-session serving
    result (the ivf-store convention applied to the PQ artifact)."""
    from aws_saas_etl_spark.catalog import load_tables
    from aws_saas_etl_spark.operators import similarity as S

    emb = load_tables(spark, SF_SMOKE).embeddings
    fitted = {
        (r.m, r.code): tuple(r.centroid)
        for r in S._pq_codebooks_cached(spark, SF_SMOKE, emb).collect()
    }
    out = S.ann_pq_store_roundtrip(spark, SF_SMOKE).collect()
    from aws_saas_etl_spark.sources.custom import proc_dir, read_manifest_parquet

    path = proc_dir("pq_codebook", SF_SMOKE, S.PQ_M, S.PQ_K)
    stored = {
        (r.m, r.code): tuple(r.centroid)
        for r in read_manifest_parquet(spark, path).collect()
    }
    assert stored == fitted  # bit-exact doubles through parquet
    direct = S.ann_pq_adc_topk(spark, SF_SMOKE).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in direct]


def test_sq8_codes_and_near_exact_recall(spark):
    """SQ8 invariants: every code component in [−127, 127]; and because
    8-bit quantization of unit vectors barely perturbs the dot-product
    ordering, the refined top-k must recall ≥ 0.9 of brute force even on
    the isotropic fixture (the rung exists as the near-lossless 4× step
    the coarser rungs are measured against in the ladder report)."""
    from aws_saas_etl_spark.catalog import load_tables
    from aws_saas_etl_spark.operators.similarity import _sq8_codes, ann_sq8_topk

    emb = load_tables(spark, SF_SMOKE).embeddings
    codes = emb.select(_sq8_codes("embedding").alias("c8")).collect()
    assert all(all(-127 <= c <= 127 for c in r.c8) for r in codes)

    exact = {
        (r.query_id, r.neighbor_id)
        for r in knn_bruteforce(spark, SF_SMOKE).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ann_sq8_topk(spark, SF_SMOKE).collect()
    }
    assert len(approx & exact) / len(exact) >= 0.9


def test_bq_signature_and_refined_recall(spark):
    """BQ invariants: two sign words per vector, each in [0, 2^32); the
    Hamming shortlist + exact refine recalls ≥ 0.55 of brute force on
    the isotropic fixture (measured 0.70/0.68 — the sign sketch is
    SimHash with coordinate planes, so Hamming tracks angle even on
    random data, unlike PQ whose subspace distortion dominates there)."""
    from aws_saas_etl_spark.catalog import load_tables
    from aws_saas_etl_spark.operators.similarity import (
        _bq_sig_exprs,
        ann_bq_hamming_topk,
    )

    emb = load_tables(spark, SF_SMOKE).embeddings
    lo, hi = _bq_sig_exprs("embedding")
    sigs = emb.select(lo, hi).collect()
    assert all(0 <= r.sig_lo < 2**32 and 0 <= r.sig_hi < 2**32 for r in sigs)

    exact = {
        (r.query_id, r.neighbor_id)
        for r in knn_bruteforce(spark, SF_SMOKE).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ann_bq_hamming_topk(spark, SF_SMOKE).collect()
    }
    assert len(approx & exact) / len(exact) >= 0.55


def test_ladder_staleness_grid_invariants(spark):
    """The lifecycle × rung grid's load-bearing claims, pinned directly:
    per-row-code rungs (SQ8, BQ) serve IDENTICAL results fresh and stale
    (their append path is the same stateless encoder plus a store
    roundtrip — zero staleness by construction), and every hit count is
    bounded by the truth size. Full-result equality is additionally
    pinned for SQ8 (row-for-row), not just hit counts."""
    from aws_saas_etl_spark.operators.similarity import (
        ann_ladder_staleness_report,
        ann_sq8_incremental_append,
        ann_sq8_topk,
    )

    rows = ann_ladder_staleness_report(spark, SF_SMOKE).collect()
    assert rows
    cols = [
        "n_ivf_fresh_hits", "n_ivf_stale_hits",
        "n_sq_fresh_hits", "n_sq_stale_hits",
        "n_pq_fresh_hits", "n_pq_stale_hits",
        "n_ivfpq_fresh_hits", "n_ivfpq_stale_hits",
        "n_bq_fresh_hits", "n_bq_stale_hits",
    ]
    for r in rows:
        assert r["n_sq_stale_hits"] == r["n_sq_fresh_hits"]
        assert r["n_bq_stale_hits"] == r["n_bq_fresh_hits"]
        for c in cols:
            assert 0 <= r[c] <= r["n_truth"]

    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    fresh = sorted(ann_sq8_topk(spark, SF_SMOKE).collect(), key=key)
    stale = sorted(
        ann_sq8_incremental_append(spark, SF_SMOKE).collect(), key=key
    )
    assert [tuple(r) for r in fresh] == [tuple(r) for r in stale]


def test_filtered_switch_threshold_behavior(spark):
    """The selectivity switch's contract, pinned at both extremes and at
    the default: switch_scale=0 routes EVERY query to the post-filter
    branch and reproduces ann_ivf_filtered_topk row-for-row;
    switch_scale=1e9 routes everything pre and reproduces
    knn_filtered_bruteforce; the default above-average rule assigns each
    query to exactly one branch and exercises BOTH on the fixture."""
    from aws_saas_etl_spark.operators.similarity import (
        ann_filtered_switch_topk,
        ann_ivf_filtered_topk,
        knn_filtered_bruteforce,
    )

    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731

    def rows(df, drop_branch=False):
        out = [r.asDict() for r in df.collect()]
        for r in out:
            r.pop("branch", None) if drop_branch else None
        return sorted(out, key=key)

    all_post = ann_filtered_switch_topk(spark, SF_SMOKE, switch_scale=0.0)
    assert {r.branch for r in all_post.collect()} == {"post"}
    assert rows(all_post, True) == rows(ann_ivf_filtered_topk(spark, SF_SMOKE))

    all_pre = ann_filtered_switch_topk(spark, SF_SMOKE, switch_scale=1e9)
    assert {r.branch for r in all_pre.collect()} == {"pre"}
    assert rows(all_pre, True) == rows(knn_filtered_bruteforce(spark, SF_SMOKE))

    default = ann_filtered_switch_topk(spark, SF_SMOKE).collect()
    branches = {}
    for r in default:
        branches.setdefault(r.query_id, set()).add(r.branch)
    assert all(len(b) == 1 for b in branches.values())
    assert {b for s in branches.values() for b in s} == {"pre", "post"}


def test_lexical_lifecycle_exactness(spark):
    """Lexical postings are a per-row artifact: the append path (stored
    base + tokenized delta) must reproduce the fresh inverted index
    row-for-row, and the deletion repair must both drop every deleted
    doc from results and equal nothing less than the survivor rebuild
    (no deleted id on either side of any returned pair)."""
    from aws_saas_etl_spark.operators.similarity import (
        VEC_DELETION_MOD,
        doc_lexical_deletion_repair,
        doc_lexical_incremental_append,
        doc_lexical_topk_indexed,
    )

    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    fresh = sorted(doc_lexical_topk_indexed(spark, SF_SMOKE).collect(), key=key)
    appended = sorted(
        doc_lexical_incremental_append(spark, SF_SMOKE).collect(), key=key
    )
    assert [tuple(r) for r in fresh] == [tuple(r) for r in appended]

    repaired = doc_lexical_deletion_repair(spark, SF_SMOKE).collect()
    assert repaired
    for r in repaired:
        assert r.query_id % VEC_DELETION_MOD != 0
        assert r.neighbor_id % VEC_DELETION_MOD != 0


def test_lexical_pruning_drops_hot_tokens(spark):
    """The df-pruning knob must actually bite on the fixture (a corpus
    with no >10%-df token would make the gate vacuous), must remove
    every hot token from the served postings, and must keep the pruned
    result a real retrieval (non-empty, ranked per query)."""
    from aws_saas_etl_spark.operators.similarity import (
        DF_PRUNE_DIV,
        _lexical_postings,
        doc_lexical_topk_pruned,
    )

    postings, _ = _lexical_postings(spark, SF_SMOKE)
    n_docs = postings.select("doc_id").distinct().count()
    hot = (
        postings.groupBy("token")
        .count()
        .where(F.col("count") * DF_PRUNE_DIV > n_docs)
    )
    hot_tokens = {r["token"] for r in hot.collect()}
    assert hot_tokens, "fixture has no hot tokens — pruning gate is vacuous"

    out = doc_lexical_topk_pruned(spark, SF_SMOKE).collect()
    assert out
    ranks = {}
    for r in out:
        assert 0.0 <= r.jaccard <= 1.0
        ranks.setdefault(r.query_id, []).append(r.rank)
    assert all(rs == sorted(rs) and rs[0] == 1 for rs in ranks.values())

    # and the knob must CHANGE the ranking (measured True on the
    # fixture): hot tokens carry real intersection mass, so pruning
    # them re-orders the jaccard top-k — the signal/fan-out tradeoff
    # the operator exists to make
    from aws_saas_etl_spark.operators.similarity import (
        doc_lexical_topk_indexed,
    )

    unpruned = doc_lexical_topk_indexed(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, out)) != sorted(map(tuple, unpruned))


import pytest


@pytest.mark.slow
def test_sampled_staleness_report_equals_full_restricted(spark):
    """slow/opt-in since r14: the identical sampled ≡ full-restricted
    mechanism (filtering the session-cached truth + every arm by the
    md5-bucket predicate through the shared _hit_count_report) is
    covered always-on by the recall sibling below at half the cost; the
    staleness form adds only the arm list, which the predicate does not
    interact with.

    The sampled audit form (VERDICT r10 #3) must be EXACTLY the full
    decision table restricted to sampled query_ids: per-query rows are
    independent (truth, every arm, and the hit joins are all keyed by
    query_id), so the hash-stable query sample chooses WHICH rows exist
    and never changes a surviving row's counts. Covers BOTH registered
    fractions (50% and the r13 25% arm)."""
    import hashlib

    from aws_saas_etl_spark.operators.sampling import (
        AUDIT_SAMPLE_PCT,
        AUDIT_SAMPLE_PCT_LOW,
    )
    from aws_saas_etl_spark.operators.similarity import (
        ann_ladder_staleness_report,
        ann_ladder_staleness_report_sampled,
        ann_ladder_staleness_report_sampled25,
    )

    def bucket(qid: int) -> int:
        return int(hashlib.md5(str(qid).encode()).hexdigest()[:15], 16) % 100

    full = {
        r.query_id: tuple(r)
        for r in ann_ladder_staleness_report(spark, SF_SMOKE).collect()
    }
    for pct, fn in (
        (AUDIT_SAMPLE_PCT, ann_ladder_staleness_report_sampled),
        (AUDIT_SAMPLE_PCT_LOW, ann_ladder_staleness_report_sampled25),
    ):
        sampled = {r.query_id: tuple(r) for r in fn(spark, SF_SMOKE).collect()}
        expected = {q: t for q, t in full.items() if bucket(q) < pct}
        assert sampled == expected, pct
        # the fixture query set must exercise the sample both ways
        assert 0 < len(sampled) < len(full), pct


def test_sampled_recall_report_equals_full_restricted_queries(spark):
    """Same subset pin for the recall frontier's sampled forms — BOTH
    registered fractions of the r12 cost curve: per-query rows are
    independent, so each sampled report is EXACTLY the full report
    restricted to its sampled query_ids."""
    import hashlib

    from aws_saas_etl_spark.operators.sampling import (
        AUDIT_SAMPLE_PCT,
        AUDIT_SAMPLE_PCT_LOW,
    )
    from aws_saas_etl_spark.operators.similarity import (
        ann_ladder_recall_report,
        ann_ladder_recall_report_sampled,
        ann_ladder_recall_report_sampled25,
    )

    def bucket(qid: int) -> int:
        return int(hashlib.md5(str(qid).encode()).hexdigest()[:15], 16) % 100

    full = {
        r.query_id: tuple(r)
        for r in ann_ladder_recall_report(spark, SF_SMOKE).collect()
    }
    for pct, fn in (
        (AUDIT_SAMPLE_PCT, ann_ladder_recall_report_sampled),
        (AUDIT_SAMPLE_PCT_LOW, ann_ladder_recall_report_sampled25),
    ):
        sampled = {r.query_id: tuple(r) for r in fn(spark, SF_SMOKE).collect()}
        expected = {q: t for q, t in full.items() if bucket(q) < pct}
        assert sampled == expected, pct
        assert 0 < len(sampled) < len(full), pct
