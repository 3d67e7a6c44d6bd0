"""LLM-training-data curation operators (SURVEY §2b extensions, round 4).

The steps a pretraining-data pipeline runs BETWEEN raw dedup and
tokenization, each as a driver-checkable query:

- ``dedup_canonical_keep_best``  — near-dup clusters → one canonical doc
  per cluster chosen by quality (longest), not just min-id: the actual
  "which copy survives" policy of C4/RefinedWeb-style dedup.
- ``corpus_shuffle_assignment``  — deterministic global shuffle: every doc
  gets a (shard, position) from a salted hash, reproducible at any
  parallelism — the replacement for ``rand()``-ordered training data.
- ``corpus_ngram_diversity``     — distinct/total n-gram ratios (n=1..3):
  the corpus-diversity health metric memorization studies track.
- ``doc_bigram_logprob``         — CCNet-style LM quality score: mean
  negative log-prob of each doc under the corpus's own pruned bigram LM
  with unigram backoff.
- ``embedding_semdedup_prune``   — SemDeDup (Abbas et al. 2023): cluster
  embeddings, drop near-duplicate vectors within each cluster, report
  per-cluster keep rates.

All five are driver-checked against full DuckDB oracle twins — including
the connected-components step of keep-best, whose oracle computes the
transitive closure with a recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aws_saas_etl_spark.memo import MemoDict
from aws_saas_etl_spark.catalog import (
    ensure_parallelism,
    load_tables,
    table_row_count,
)
from aws_saas_etl_spark.functions import num as N
from aws_saas_etl_spark.functions import text as T

# Deterministic-shuffle parameters: the salt versions the permutation (a
# new salt = a fresh epoch order); 16 shards keeps the fixture demo
# readable — production sizes this to (corpus bytes / target file size).
SHUFFLE_SALT = "shuffle-v1"
SHUFFLE_SHARDS = 16

# n-gram diversity is reported for n = 1..DIVERSITY_MAX_N
DIVERSITY_MAX_N = 3

# Stupid-backoff weight for bigrams pruned out of the LM (Brants et al.
# 2007 use 0.4; not a tuned quantity).
BACKOFF_LAMBDA = 0.4

# SemDeDup within-cluster similarity threshold: reuse the repo-wide
# fixture-calibrated near-dup cosine (real corpora run ~0.95+).
from aws_saas_etl_spark.operators.similarity import (  # noqa: E402
    NEARDUP_COS_MIN,
    dot,
    norm,
)


def dedup_canonical_keep_best(spark, sf_dir: str) -> DataFrame:
    """Canonical-document selection over near-duplicate clusters: n-gram
    Jaccard pairs (the oracle-expressible candidate generator) → connected
    components → per cluster keep the HIGHEST-QUALITY member (longest
    ``n_chars``, ties to the smallest doc_id) instead of blindly the
    min-id — the policy that decides which bytes actually reach training.

    Scale: pair generation is blocked + triangle-partitioned
    (``bounded_self_pairs``), CC is the checkpointed min-label loop, and
    the keep-best choice is one window over cluster members (cluster
    cardinality ≈ dup-group size, never corpus size).

    Oracle: the ENTIRE chain is SQL-expressible — DuckDB computes the
    same components via a recursive-CTE transitive closure — so unlike
    ``dedup_duplicate_clusters`` (hash-seeded LSH upstream) this query is
    hash-checked, freezing the cluster semantics the LSH path
    approximates.
    """
    from aws_saas_etl_spark.operators.dedup import content_clusters

    comp = content_clusters(spark, sf_dir)
    docs = load_tables(spark, sf_dir).documents.select("doc_id", "n_chars")
    members = comp.join(docs, comp["node"] == docs["doc_id"]).select(
        "comp", "node", "n_chars"
    )
    w = Window.partitionBy("comp").orderBy(F.desc("n_chars"), F.asc("node"))
    ranked = members.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy(F.col("comp").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max(F.when(F.col("rn") == 1, F.col("node"))).alias("keeper_doc_id"),
            F.max(F.when(F.col("rn") == 1, F.col("n_chars"))).alias("keeper_chars"),
            F.sum(
                F.when(F.col("rn") > 1, F.col("n_chars")).otherwise(F.lit(0))
            ).alias("dropped_chars"),
        )
        .orderBy("cluster_id")
    )


def corpus_shuffle_assignment(spark, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle of the corpus into numbered shards
    with a stable position inside each shard.

    ``rand()`` ordering is irreproducible across retries/partitionings;
    instead each doc's order key is ``md5(salt:doc_id)`` — a fixed
    pseudorandom permutation. ``shard`` (top 32 bits mod SHUFFLE_SHARDS)
    is the write-partition key; ``pos`` is a row_number per shard over
    the hash order.

    Scale: one shuffle on ``shard`` (uniform by construction — hash top
    bits), per-shard sort for the position — exactly the plan of a
    range-partitioned training-data write. Epoch re-shuffles are a salt
    bump, not a data move of the source.
    """
    docs = load_tables(spark, sf_dir).documents.where(F.col("doc_id").isNotNull())
    key = F.md5(
        F.concat_ws(":", F.lit(SHUFFLE_SALT), F.col("doc_id").cast("string"))
    )
    keyed = docs.select("doc_id", key.alias("shuffle_key"))
    shard = (
        F.conv(F.substring("shuffle_key", 1, 8), 16, 10).cast("bigint")
        % SHUFFLE_SHARDS
    ).cast("int")
    w = Window.partitionBy("shard").orderBy("shuffle_key", "doc_id")
    return (
        keyed.withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w))
        .select("doc_id", "shuffle_key", "shard", "pos")
        .orderBy("shard", "pos")
    )


def _grams(tk, n: int):
    """Space-joined word n-grams WITHOUT dedup (diversity needs totals);
    same construction as dedup.shingles minus the array_distinct."""
    if n == 1:
        return tk
    size = F.size(tk)
    idx = F.sequence(F.lit(0), size - n)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tk, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.when(size >= n, grams).otherwise(F.array().cast("array<string>"))


def corpus_ngram_diversity(spark, sf_dir: str) -> DataFrame:
    """Corpus n-gram diversity for n = 1..3: total occurrences, distinct
    forms, and the distinct/total ratio (type-token ratio at n=1) — the
    repetitiveness health metric tracked before a pretraining run.

    Scale shape: the token arrays are materialized ONCE (checkpoint
    barrier — the same measured fix as minhash/tf-idf: without it each
    n's branch re-runs the tokenizer), then one union of three
    explode→(n, gram) branches feeds a single count/count-distinct
    aggregate keyed by n.
    """
    docs = ensure_parallelism(load_tables(spark, sf_dir).documents).na.drop("any")
    toks = docs.select(T.tokens("text").alias("tk")).localCheckpoint()
    parts = [
        toks.select(
            F.lit(n).alias("n"), F.explode(_grams(F.col("tk"), n)).alias("gram")
        )
        for n in range(1, DIVERSITY_MAX_N + 1)
    ]
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    return (
        unioned.groupBy("n")
        .agg(
            F.count(F.lit(1)).alias("total_ngrams"),
            F.countDistinct("gram").alias("distinct_ngrams"),
        )
        .select(
            "n",
            "total_ngrams",
            "distinct_ngrams",
            N.dround(
                F.col("distinct_ngrams").cast("double") / F.col("total_ngrams"), 6
            ).alias("diversity"),
        )
        .orderBy("n")
    )


def doc_bigram_logprob(spark, sf_dir: str) -> DataFrame:
    """Per-document LM quality score under the corpus's own bigram model:
    mean −ln P(w2|w1), where P is the conditional probability for bigrams
    that survive the LM's min-count pruning (``BIGRAM_MIN_COUNT``, the
    same cutoff as ``corpus_bigram_lm``) and backs off to
    ``BACKOFF_LAMBDA · P_unigram(w2)`` for pruned ones — the CCNet-style
    perplexity filter that separates fluent text from gibberish.

    Scale shape: ONE explode builds bigram positions (checkpointed —
    three consumers: LM counts, context counts, the scoring join); the
    unigram table and scalar token total broadcast; all joins are
    token-keyed. The final per-doc mean accumulates in decimal.
    """
    from aws_saas_etl_spark.operators.textops import BIGRAM_MIN_COUNT

    docs = ensure_parallelism(load_tables(spark, sf_dir).documents).na.drop("any")
    tk = T.tokens("text")
    n = F.size("tk")
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice("tk", 1, n - 1),
            F.slice("tk", 2, n - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    base = (
        docs.select("doc_id", tk.alias("tk"))
        .select("doc_id", F.explode(bigrams).alias("bg"))
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .localCheckpoint()
    )
    lm = (
        base.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .where(F.col("c12") >= BIGRAM_MIN_COUNT)
    )
    ctx = base.groupBy(F.col("w1").alias("cw")).agg(F.count(F.lit(1)).alias("c1"))
    uni = (
        docs.select(F.explode(tk).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    total = docs.select(F.explode(tk).alias("t")).agg(
        F.count(F.lit(1)).alias("n_total")
    )
    p_cond = F.col("c12").cast("double") / F.col("c1")
    p_backoff = F.lit(BACKOFF_LAMBDA) * (
        F.col("cu").cast("double") / F.col("n_total")
    )
    p = F.when(F.col("c12").isNotNull(), p_cond).otherwise(p_backoff)
    return (
        base.join(lm, ["w1", "w2"], "left")
        .join(ctx, F.col("w1") == F.col("cw"))
        .join(uni, F.col("w2") == F.col("token"))
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            N.davg_rounded(-F.log(p), 6).alias("mean_neg_logp"),
        )
        .orderBy("doc_id")
    )


def ccnet_perplexity_buckets(spark, sf_dir: str) -> DataFrame:
    """CCNet-style per-source perplexity bucketing (Wenzek et al. 2020):
    each source's documents split into head / middle / tail thirds by
    their LM score under the corpus bigram model (lower mean −ln P =
    more fluent; ``doc_bigram_logprob`` is the scorer) — the standard
    web-corpus curation move where the QUALITY THRESHOLD ADAPTS PER
    SOURCE (a p50 news-crawl doc is cleaner than a p50 forum doc; one
    global cutoff would empty the hard sources and keep the easy ones'
    tails). One row per scored doc: (doc_id, source, score, ppl_bucket).

    Scale shape: NOT a per-source ntile — that sorts each source inside
    ONE partition (the hottest source = the whole crawl). Instead the
    two per-source cut points come from one groupBy(source) percentile
    aggregate (rows ≤ |sources|), broadcast back, and each row buckets
    itself map-side against its source's cuts — the
    ``customer_balance_deciles`` decomposition, made per-group. Ties at
    a cut go to the lower bucket on both engines (strict >). At true
    100 TB the exact percentile state per source is the remaining
    memory term; scores are 6dp-rounded, so the histogram decomposition
    (groupBy(source, score) counts → cumulative over the bounded value
    domain, the ``corpus_token_budget_sample`` trick) drops in without
    changing semantics — CCNet itself thresholds on approximate thirds.

    Determinism: the score is the 6dp decimal LM mean cast to double
    (exact), and both engines interpolate the same type-7 quantile on
    identical doubles (the hash-green deciles precedent).
    """
    scored = doc_bigram_logprob(spark, sf_dir).select(
        "doc_id", F.col("mean_neg_logp").cast("double").alias("score")
    )
    src = load_tables(spark, sf_dir).documents.select("doc_id", "source")
    d = scored.join(src, "doc_id")
    cuts = d.groupBy("source").agg(
        F.percentile("score", F.array(F.lit(1 / 3), F.lit(2 / 3))).alias("cuts")
    )
    idx = F.aggregate(
        F.col("cuts"),
        F.lit(0),
        lambda acc, c: acc + F.when(F.col("score") > c, 1).otherwise(0),
    )
    label = (
        F.when(idx == 0, F.lit("head"))
        .when(idx == 1, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        d.join(F.broadcast(cuts), "source")
        .select("doc_id", "source", "score", label.alias("ppl_bucket"))
        .orderBy("doc_id")
    )


SEMDEDUP_MIN_K = 8
SEMDEDUP_MAX_K = 4096


def semdedup_k(n_rows: int) -> int:
    """Codebook size for SemDeDup: ⌊√n⌋ clamped to [8, 4096].

    A FIXED k makes within-cluster pair space quadratic — the scale probe
    measured 2.4 s → 22.3 s from 1× to 8× (α > 1, the only super-linear
    operator in the fleet) with k=8. k = √n balances the two cost terms:
    flat assignment is n·k = n^1.5 and within-cluster pairs are
    Σ(n/k)²·k = n²/k = n^1.5 — the best a single-level codebook can do.
    (Production SemDeDup at 100 TB takes the next rung: k ∝ n with
    HIERARCHICAL assignment — coarse cells then fine — which this
    operator's cap documents rather than fakes.) Uses floor(sqrt())
    double math, bit-identical to the oracle's SQL floor(sqrt())."""
    import math

    return max(SEMDEDUP_MIN_K, min(SEMDEDUP_MAX_K, math.floor(math.sqrt(n_rows))))


def embedding_semdedup_prune(spark, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding corpus, then inside each cluster drop every vector that has
    a more-canonical near-duplicate (cosine ≥ threshold, keep the lower
    vec_id). Reports per-cluster counts and keep rate — the dedup budget
    summary a curation run publishes.

    Scale: the codebook (√n rows — see :func:`semdedup_k`) broadcasts;
    pair generation runs ONLY within a cluster and through
    ``bounded_self_pairs`` (triangle partitioning), so a giant cluster
    becomes bounded tasks instead of a single hot join key — total pair
    space n^1.5, vs n²/k for any fixed k and corpus-wide O(n²) without
    clustering. The sizing count is a driver-side scalar (the same
    accepted pattern as the LSH/CC sizing probes).
    """
    from aws_saas_etl_spark.operators.pairs import bounded_self_pairs

    emb = ensure_parallelism(load_tables(spark, sf_dir).embeddings)
    k = semdedup_k(table_row_count(spark, sf_dir, "embeddings"))
    # r13: per-row norms, not per-pair (the similarity._assign_cells
    # measurement); l2n rides the checkpoint + pair join so the
    # within-cluster verify never re-folds a norm per pair
    cents = emb.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("c_emb"),
        norm(F.col("embedding")).alias("c_n"),
    )
    sim = F.round(
        dot(F.col("embedding"), F.col("c_emb")) / (F.col("l2n") * F.col("c_n")), 6
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), F.asc("centroid_id"))
    assigned = (
        emb.select("vec_id", "embedding", norm(F.col("embedding")).alias("l2n"))
        .crossJoin(F.broadcast(cents))
        .select("vec_id", "embedding", "l2n", "centroid_id", sim.alias("cos_sim"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "embedding", "l2n", "centroid_id")
        # materialize the assignment ONCE: three consumers (pair
        # generation's count+annotate sides and the cluster sizes) would
        # otherwise each re-run the broadcast-assign + window subtree
        # (audited 15 shuffles / 10 scans without the barrier; 5 / 2 with)
        .localCheckpoint()
    )
    pairs = bounded_self_pairs(
        assigned, ["centroid_id"], "vec_id", ["embedding", "l2n"]
    )
    near = pairs.select(
        "centroid_id",
        F.col("vec_id_b").alias("vec_id"),
        F.round(
            dot(F.col("embedding_a"), F.col("embedding_b"))
            / (F.col("l2n_a") * F.col("l2n_b")),
            6,
        ).alias("cs"),
    ).where(F.col("cs") >= NEARDUP_COS_MIN)
    dropped = near.select("centroid_id", "vec_id").distinct()
    sizes = assigned.groupBy("centroid_id").agg(F.count(F.lit(1)).alias("n_vectors"))
    drops = dropped.groupBy("centroid_id").agg(F.count(F.lit(1)).alias("n_dropped"))
    return (
        sizes.join(drops, "centroid_id", "left")
        .select(
            "centroid_id",
            "n_vectors",
            F.coalesce(F.col("n_dropped"), F.lit(0)).alias("n_dropped"),
            N.dround(
                (F.col("n_vectors") - F.coalesce(F.col("n_dropped"), F.lit(0))).cast(
                    "double"
                )
                / F.col("n_vectors"),
                6,
            ).alias("keep_rate"),
        )
        .orderBy("centroid_id")
    )


def corpus_curation_report(spark, sf_dir: str) -> DataFrame:
    """Per-source curation dashboard: the rollup a pipeline publishes
    after a curation pass — document count, exact-duplicate rate
    (1 − distinct text hashes / docs), language spread, mean length and
    total token volume per source.

    Scale shape: ONE aggregate over the corpus — the dup rate uses
    count(distinct sha256) inside the same groupBy (per-source
    cardinalities; the all-sources global variant would use the HLL
    sketch path shown by ``customer_distinct_hll_merge``), token counts
    are map-side expressions, means accumulate in decimal.
    """
    docs = ensure_parallelism(load_tables(spark, sf_dir).documents).na.drop("any")
    n = F.count(F.lit(1))
    return (
        docs.select(
            "source",
            "lang",
            "n_chars",
            F.sha2(F.col("text"), 256).alias("h"),
            T.token_count("text").alias("n_tokens"),
        )
        .groupBy("source")
        .agg(
            n.alias("n_docs"),
            F.countDistinct("h").alias("n_distinct_texts"),
            N.dround(
                (n - F.countDistinct("h")).cast("double") / n, 6
            ).alias("dup_rate"),
            F.countDistinct("lang").alias("n_langs"),
            N.davg_rounded(F.col("n_chars"), 2).alias("mean_chars"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("source")
    )


# Greedy token-budget sampling: fixture corpora hold ~28k tokens, so a
# 10k budget exercises both full buckets and the boundary bucket.
TOKEN_BUDGET = 10_000


def corpus_token_budget_sample(spark, sf_dir: str) -> DataFrame:
    """Select the highest-quality documents that fit a token budget —
    the "data mixing under a budget" step before tokenization. Greedy
    prefix over (quality desc, doc_id asc) order, quality proxied by
    ``n_chars``: take documents while the running token total stays
    within ``TOKEN_BUDGET``.

    Scale shape: a naive implementation is a GLOBAL row-level cumulative
    window — one partition holding the whole corpus. Instead the greedy
    prefix is decomposed order-statistics style: (1) aggregate token
    totals per quality value (bounded domain) and take the cumulative
    sum over that small histogram; (2) quality levels whose cumulative
    total fits are selected WHOLE ('full_bucket'); (3) only the single
    boundary quality level runs a row-level cumulative window, and it is
    partitioned on that quality value — per-partition work is one
    bucket, never the corpus. Same exact output as the global window.
    """
    docs = ensure_parallelism(load_tables(spark, sf_dir).documents).na.drop("any")
    d = docs.select("doc_id", "n_chars", T.token_count("text").alias("n_tokens"))
    buckets = d.groupBy("n_chars").agg(F.sum("n_tokens").alias("btoks"))
    wb = Window.orderBy(F.desc("n_chars")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # cumulative over the n_chars histogram: a few hundred rows at ANY
    # corpus size (bounded value domain), not a row-level global window
    cum = buckets.withColumn("cum", F.sum("btoks").over(wb))
    full = cum.where(F.col("cum") <= TOKEN_BUDGET)
    boundary = (
        cum.where(F.col("cum") > TOKEN_BUDGET)
        .orderBy(F.desc("n_chars"))
        .limit(1)
        .select(
            F.col("n_chars").alias("b_chars"),
            (F.col("cum") - F.col("btoks")).alias("spent"),
        )
    )
    full_docs = d.join(
        full.select("n_chars"), "n_chars"
    ).select("doc_id", "n_chars", "n_tokens", F.lit("full_bucket").alias("selection"))
    wdoc = Window.partitionBy("n_chars").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    boundary_docs = (
        d.join(F.broadcast(boundary), d["n_chars"] == F.col("b_chars"))
        .withColumn("c", F.sum("n_tokens").over(wdoc) + F.col("spent"))
        .where(F.col("c") <= TOKEN_BUDGET)
        .select(
            "doc_id", "n_chars", "n_tokens", F.lit("boundary").alias("selection")
        )
    )
    return full_docs.unionByName(boundary_docs).orderBy("doc_id")


# DSIR (Xie et al. 2023, "Data Selection for Language Models via
# Importance Resampling"): score each raw document by the log-likelihood
# ratio of its hashed n-gram features under target vs raw bag-of-ngrams
# models. Bucket count is the paper's hashed feature space (10k there;
# 4096 here keeps the weight table broadcast-tiny at any corpus size),
# DSIR_TARGET_LANG picks the fixture's high-resource language as the
# target domain.
DSIR_BUCKETS = 4096
DSIR_TARGET_LANG = "en"


def dsir_importance_weights(spark, sf_dir: str) -> DataFrame:
    """DSIR importance score per document: hashed unigram+bigram features
    (md5 → DSIR_BUCKETS buckets), add-one-smoothed bucket probabilities
    under the target (lang = DSIR_TARGET_LANG) and raw (whole corpus)
    models, and per-doc score Σ_feat ln(p_target/p_raw) — the
    importance-resampling weight a loader samples against to tilt a raw
    corpus toward a target domain without training a classifier.

    Scale shape: the exploded (doc, bucket) table is built ONCE
    (localCheckpoint — three consumers: target counts, raw counts, the
    scoring join) and every downstream aggregate is map-side combined to
    ≤ DSIR_BUCKETS rows; the weight table broadcasts (4096 rows at any
    corpus size), so scoring is one narrow broadcast join + one
    groupBy(doc_id). Nothing doc×doc, nothing driver-side.

    Determinism: counts are exact int64; the smoothed ratio is formed as
    ONE division of two exact int64 products (each < 2^53 far beyond
    driver scales — at true 100 TB counts you'd split the ln into
    ln-of-num − ln-of-den before the products overflow 2^53) and a single
    libm ln of an identical double in both engines, rescaled to 6dp
    decimal BEFORE the per-doc sum, which accumulates in DECIMAL —
    order-independent under any partitioning.
    """
    docs = ensure_parallelism(load_tables(spark, sf_dir).documents).where(
        F.col("doc_id").isNotNull()
        & F.col("text").isNotNull()
        & F.col("lang").isNotNull()
    )
    from aws_saas_etl_spark.operators.sampling import hash_bucket

    tk = F.col("tk")
    feats = F.concat(tk, _grams(tk, 2))  # unigrams ++ bigrams
    base = (
        docs.select("doc_id", "lang", T.tokens("text").alias("tk"))
        .select("doc_id", "lang", F.explode(feats).alias("feat"))
        .select(
            "doc_id", "lang", hash_bucket("feat", DSIR_BUCKETS).alias("bucket")
        )
        .localCheckpoint()
    )
    tgt = (
        base.where(F.col("lang") == DSIR_TARGET_LANG)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    raw = base.groupBy("bucket").agg(F.count(F.lit(1)).alias("cr"))
    totals = base.agg(
        F.count(F.lit(1)).alias("n_r"),
        F.count(F.when(F.col("lang") == DSIR_TARGET_LANG, 1)).alias("n_t"),
    )
    num = (F.coalesce(F.col("ct"), F.lit(0)) + 1) * (
        F.col("n_r") + F.lit(DSIR_BUCKETS)
    )
    den = (F.col("cr") + 1) * (F.col("n_t") + F.lit(DSIR_BUCKETS))
    weights = (
        raw.join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.log(num.cast("double") / den.cast("double"))
            .cast(N.DECIMAL_TYPE)
            .alias("w"),
        )
    )
    return (
        base.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("w").cast("decimal(38,6)").cast("double").alias("dsir_logratio"),
        )
        .orderBy("doc_id")
    )


def training_manifest(spark, sf_dir: str) -> DataFrame:
    """The end-to-end pipeline ARTIFACT: which documents actually reach
    training, and exactly where each lands — quality/exact-dup gates
    (``doc_filter_pipeline``) → near-dup keep-best within the shared
    content clusters → leakage-safe cluster-keyed split → deterministic
    shard + position (the salted-hash permutation of
    ``corpus_shuffle_assignment``). One row per surviving doc:
    (doc_id, split, shard, pos, n_tokens) — the manifest a 100 TB run
    writes per shard file for loaders to stream.

    Composition semantics: keep-best ranks (longest n_chars, min doc_id)
    among the FILTER SURVIVORS of each cluster — a cluster whose best
    member failed a gate still contributes its best surviving member;
    singletons are their own keeper. Split keys on the cluster id so a
    near-dup pair can never straddle train/val/test.

    Scale shape: every input is an existing bounded intermediate (the
    session-cached cluster table, the one-pass filter verdicts); this
    operator adds two window shuffles — per-cluster rank (cluster-sized
    groups) and per-(split, shard) position (uniform by hash
    construction) — and nothing corpus×corpus.
    """
    return (
        _full_manifest(spark, sf_dir)
        .select("doc_id", "split", "shard", "pos", "n_tokens")
        .orderBy("split", "shard", "pos")
    )


#: Session-scoped memo of manifest frames keyed (applicationId, sf_dir,
#: which) — the manifest IS the stored pipeline artifact (in production
#: it is read back from the manifest sink), so computing it once per
#: session is the faithful model; the batch query and BOTH maintenance
#: queries (arrival merge, deletion repair) consume the same frame.
#: tools/scale_probe.py clears this cache per rep.
_MANIFEST_CACHE = MemoDict("manifest")


def _full_manifest(spark, sf_dir: str) -> DataFrame:
    """The full-corpus manifest frame (internal columns retained),
    memoized per session — the artifact the deletion repair treats as
    its stored state."""
    import os

    from aws_saas_etl_spark.operators.dedup import content_clusters
    from aws_saas_etl_spark.operators.textops import doc_filter_pipeline

    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), "full")
    cached = _MANIFEST_CACHE.get(key)
    if cached is not None:
        return cached
    docs = ensure_parallelism(load_tables(spark, sf_dir).documents).na.drop("any")
    keep = doc_filter_pipeline(spark, sf_dir).where(F.col("verdict") == "keep")
    comp = content_clusters(spark, sf_dir)
    out = _manifest_frame(docs, keep, comp).localCheckpoint()
    _MANIFEST_CACHE[key] = out
    return out


def _doc_feats(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", "n_chars", T.token_count("text").alias("n_tokens")
    )


def _keeper_rank() -> Window:
    return Window.partitionBy("ckey").orderBy(F.desc("n_chars"), F.asc("doc_id"))


def _shard_cols(df: DataFrame) -> DataFrame:
    from aws_saas_etl_spark.operators.sampling import split_label

    shuffle_key = F.md5(
        F.concat_ws(":", F.lit(SHUFFLE_SALT), F.col("doc_id").cast("string"))
    )
    shard = (
        F.conv(F.substring("shuffle_key", 1, 8), 16, 10).cast("bigint")
        % SHUFFLE_SHARDS
    ).cast("int")
    return (
        df.withColumn("split", split_label(F.col("ckey")))
        .withColumn("shuffle_key", shuffle_key)
        .withColumn("shard", shard)
    )


def _pos_window() -> Window:
    return Window.partitionBy("split", "shard").orderBy("shuffle_key", "doc_id")


def _manifest_frame(docs: DataFrame, keep: DataFrame, comp: DataFrame) -> DataFrame:
    """The manifest pipeline core over explicit inputs, retaining the
    internal columns (ckey, shuffle_key) so the incremental variant can
    reuse stored rows and re-rank only touched shards."""
    members = (
        keep.select("doc_id")
        .join(_doc_feats(docs), "doc_id")
        .join(comp.select(F.col("node").alias("doc_id"), "comp"), "doc_id", "left")
        .withColumn("ckey", F.coalesce(F.col("comp"), F.col("doc_id")))
    )
    kept = members.withColumn("rn", F.row_number().over(_keeper_rank())).where(
        F.col("rn") == 1
    )
    return _shard_cols(kept).withColumn("pos", F.row_number().over(_pos_window()))


# Right-to-be-forgotten deletion set: every 7th doc_id — a deterministic
# stand-in for an arriving deletion list (a source-keyed set would be the
# realistic correlated shape, but the fixtures' clusters are built from
# cross-source near-dups, so source-keyed deletions never hit a cluster
# and the query would be vacuous at sf0.01)
DELETION_MOD = 7


def cluster_deletion_repair(spark, sf_dir: str) -> DataFrame:
    """Deletion propagation through the dedup layer — the GDPR /
    license-revocation repair: when the deletion list's documents
    (doc_id % DELETION_MOD == 0) are removed, every content cluster that loses a member must re-elect its
    canonical document among the survivors (same keep-best rule as
    ``dedup_canonical_keep_best``: longest n_chars, ties to min doc_id).
    One row per affected cluster: member/deletion counts, the old and
    new keeper (NULL when the whole cluster is deleted), and whether the
    manifest row must actually be rewritten. Singleton deletions need no
    repair (nothing to promote), so only clustered docs appear.

    Scale shape: reuses the session-cached cluster table; adds one join
    against the corpus (doc_id-keyed) and two per-cluster windows over
    cluster-sized groups — the repair is proportional to AFFECTED
    clusters, never a corpus recompute, which is exactly why a 100 TB
    pipeline stores the cluster assignment instead of re-deriving it.
    """
    from aws_saas_etl_spark.operators.dedup import content_clusters

    comp = content_clusters(spark, sf_dir)
    docs = load_tables(spark, sf_dir).documents.select("doc_id", "n_chars")
    members = comp.join(docs, comp["node"] == docs["doc_id"]).select(
        "comp",
        "node",
        "n_chars",
        (F.col("doc_id") % DELETION_MOD == 0).alias("deleted"),
    )
    w = Window.partitionBy("comp").orderBy(F.desc("n_chars"), F.asc("node"))
    ranked = members.withColumn("rn", F.row_number().over(w))
    surv = members.where(~F.col("deleted")).withColumn(
        "sn", F.row_number().over(w)
    )
    agg_all = ranked.groupBy(F.col("comp").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum(F.col("deleted").cast("long")).alias("n_deleted"),
        F.max(F.when(F.col("rn") == 1, F.col("node"))).alias("old_keeper"),
    )
    agg_surv = surv.groupBy(F.col("comp").alias("cluster_id")).agg(
        F.max(F.when(F.col("sn") == 1, F.col("node"))).alias("new_keeper")
    )
    return (
        agg_all.join(agg_surv, "cluster_id", "left")
        .where(F.col("n_deleted") > 0)
        .select(
            "cluster_id",
            "n_members",
            "n_deleted",
            "old_keeper",
            "new_keeper",
            (
                F.col("new_keeper").isNull()
                | (F.col("new_keeper") != F.col("old_keeper"))
            ).alias("keeper_changed"),
        )
        .orderBy("cluster_id")
    )


# Multinomial Naive Bayes over hashed unigram buckets — the model-based
# classification stage (fastText-style lang/quality classifiers) most LLM
# data pipelines run after the rule-based filters.
NB_BUCKETS = 4096


def nb_lang_scores(spark, sf_dir: str) -> DataFrame:
    """Train-and-score a multinomial Naive Bayes language classifier on
    the corpus itself (in-sample by design — the pipeline artifact is the
    per-document class decision + confidence margin a filter thresholds
    on, and the in-sample fit freezes the full train→score plumbing):
    hashed unigram buckets (md5 → NB_BUCKETS, the shared engine-neutral
    ``hash_bucket``), add-one-smoothed per-class token-bucket likelihoods,
    document-count priors, per-doc argmax with a deterministic
    lexicographic tie-break, and the margin to the runner-up class.

    Scale shape: the exploded (doc, bucket) table is built ONCE
    (localCheckpoint — feeds class counts, joint counts, and scoring);
    every model aggregate is map-side combined to ≤ NB_BUCKETS·n_classes
    rows; the weight and prior tables broadcast (≤ 4096·|langs| rows at
    ANY corpus size — model size is corpus-independent, the property
    that makes NB trainable in one pass at 100 TB); scoring is one
    narrow broadcast join + one groupBy(doc_id, class). Nothing doc×doc,
    nothing driver-side.

    Determinism (the DSIR recipe): every ln is a single libm call on a
    double formed by ONE division of exact int64 quantities, rescaled to
    6dp DECIMAL before the per-doc sum, which therefore accumulates
    order-independently; the argmax compares exact decimals with a class
    tie-break, and the margin is an exact decimal difference.
    """
    docs = ensure_parallelism(load_tables(spark, sf_dir).documents)
    return nb_scores(docs)


def nb_scores(docs: DataFrame) -> DataFrame:
    """The classifier core over any (doc_id, lang, text) frame — split
    out so tests can train on a CONSTRUCTED corpus with genuinely
    class-distinct vocabulary (the synthetic fixture draws every lang
    from one shared token pool, so in-sample accuracy there is the
    majority-class floor by design; the oracle twin, not fixture
    accuracy, is what proves the arithmetic)."""
    from aws_saas_etl_spark.operators.sampling import hash_bucket

    docs = docs.where(
        F.col("doc_id").isNotNull()
        & F.col("text").isNotNull()
        & F.col("lang").isNotNull()
    )
    base = (
        docs.select("doc_id", "lang", F.explode(T.tokens("text")).alias("feat"))
        .select("doc_id", "lang", hash_bucket("feat", NB_BUCKETS).alias("bucket"))
        .localCheckpoint()
    )
    cls_tok = base.groupBy(F.col("lang").alias("cls")).agg(
        F.count(F.lit(1)).alias("n_c")
    )
    joint = base.groupBy("bucket", F.col("lang").alias("cls")).agg(
        F.count(F.lit(1)).alias("ct")
    )
    weights = (
        base.select("bucket")
        .distinct()
        .crossJoin(F.broadcast(cls_tok))
        .join(joint, ["bucket", "cls"], "left")
        .select(
            "bucket",
            "cls",
            F.log(
                (F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
                / (F.col("n_c") + F.lit(NB_BUCKETS)).cast("double")
            )
            .cast(N.DECIMAL_TYPE)
            .alias("w"),
        )
    )
    total_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    priors = (
        docs.groupBy(F.col("lang").alias("cls"))
        .agg(F.count(F.lit(1)).alias("dc"))
        .crossJoin(F.broadcast(total_docs))
        .select(
            "cls",
            F.log(F.col("dc").cast("double") / F.col("n_docs").cast("double"))
            .cast(N.DECIMAL_TYPE)
            .alias("pw"),
        )
    )
    # pre-aggregate token multiplicity per (doc, bucket) BEFORE the
    # x n_classes weight join: the expanded stream shrinks from
    # tokens x classes to distinct-doc-buckets x classes, and
    # sum(w * n) over exact decimals equals the token-level sum exactly
    counts = base.groupBy("doc_id", "lang", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    per_class = (
        counts.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id", "lang", "cls")
        .agg(F.sum(F.col("w") * F.col("n")).cast("decimal(38,6)").alias("sw"))
        .join(F.broadcast(priors), "cls")
        .select(
            "doc_id",
            "lang",
            "cls",
            (F.col("sw") + F.col("pw")).cast("decimal(38,6)").alias("total"),
        )
    )
    rank_w = Window.partitionBy("doc_id").orderBy(F.desc("total"), F.asc("cls"))
    return (
        per_class.select(
            "doc_id",
            "lang",
            "cls",
            F.row_number().over(rank_w).alias("rn"),
            (F.col("total") - F.lead("total").over(rank_w))
            .cast("double")
            .alias("margin"),
        )
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            "lang",
            F.col("cls").alias("pred_lang"),
            (F.col("cls") == F.col("lang")).alias("is_correct"),
            "margin",
        )
        .orderBy("doc_id")
    )


def _stored_signals(spark, sf_dir: str) -> DataFrame:
    """The per-doc gate-signal table (doc_id, sha, gate booleans),
    memoized per session — in production a stored artifact next to the
    manifest (it is what makes delta/deletion verdict repair a
    signals-join instead of a corpus re-scan)."""
    import os

    from aws_saas_etl_spark.operators.textops import gate_signals

    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), "signals")
    cached = _MANIFEST_CACHE.get(key)
    if cached is not None:
        return cached
    docs = ensure_parallelism(load_tables(spark, sf_dir).documents).na.drop("any")
    out = gate_signals(docs).localCheckpoint()
    _MANIFEST_CACHE[key] = out
    return out


def manifest_shard_stats(spark, sf_dir: str) -> DataFrame:
    """Loader-facing manifest audit — the per-shard summary a training
    launcher reads before streaming: per (split, shard) the document
    count, token total (what actually balances data-parallel ranks),
    token min/max/mean, and the position span (max_pos == n_docs iff
    positions are contiguous — the seekability invariant surfaced as a
    checkable column instead of a hidden assumption). Uneven shard token
    totals are the classic cause of straggler ranks; this table is what
    you alert on.

    Scale shape: consumes the stored manifest artifact; one
    groupBy(split, shard) with algebraic aggregates — output rows =
    shards, corpus-independent. Token mean accumulates in decimal
    (order-independent).
    """
    man = _full_manifest(spark, sf_dir)
    return (
        man.groupBy("split", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            N.davg_rounded(F.col("n_tokens"), 4).alias("mean_tokens"),
            F.max("pos").alias("max_pos"),
            (F.max("pos") == F.count(F.lit(1))).alias("positions_contiguous"),
        )
        .orderBy("split", "shard")
    )


def training_manifest_decontaminated(spark, sf_dir: str) -> DataFrame:
    """EVAL-DECONTAMINATED training manifest — the leakage check run at
    the ARTIFACT level: any train-split document sharing ≥
    ``CONTAM_MIN_SHARED`` rare winnowing fingerprints with any val/test
    document is REMOVED from the manifest (industry practice per
    GPT-3/PaLM/Llama reports: contaminated docs are dropped, never
    replaced by a near-dup — the near-dup likely carries the same
    overlap), and shard positions close ranks. The cluster-keyed split
    already guarantees no NEAR-DUP straddles train/eval; this gate
    catches the orthogonal leak of partial content overlap (a quote, a
    table, a benchmark question embedded in an otherwise-different doc).

    Scale shape: fingerprint candidates reuse the
    ``doc_contamination_pairs`` machinery — winnow sets, document-
    frequency cut (blocks ≤ max_df²), fp-keyed join — but the join is
    train×eval instead of a self-join, so its output is bounded by the
    (tiny) eval side; the manifest is the stored artifact
    (``_full_manifest``), and removal re-ranks positions by the STORED
    pos (removal preserves relative order, so ranks simply close up) —
    at 100 TB only shards that lost a row rewrite, exactly the
    deletion-repair property.
    """
    man = _full_manifest(spark, sf_dir)
    contam = _gate_artifact_cached(
        spark, sf_dir, "contam_ids",
        lambda: _contam_train_ids(spark, sf_dir, man),
    )
    return (
        _close_ranks(man.join(contam, "doc_id", "anti"))
        .select("doc_id", "split", "shard", "pos", "n_tokens")
        .orderBy("split", "shard", "pos")
    )


def _gate_artifact_cached(spark, sf_dir: str, which: str, build) -> DataFrame:
    """Session memo for the per-gate REMOVAL-SET / accounting artifacts
    (r14, VERDICT r13 #5): each gate's output is a stored artifact next
    to the manifest in production (the ``_stored_signals`` /
    ``_stored_base_verdicts`` argument — a new gate ships by WRITING its
    verdict table once, and every manifest version composes the stored
    sets), yet each of the solo-gate, full-pipeline, gateset-v2 and
    version-diff constructions re-ran the full gate subtree: the winnow
    fingerprint join (contam), the logreg calibration chain (quality),
    the suffix-overlap span accounting, and the Gopher repetition scan
    each executed up to 3× per bench sweep. One localCheckpoint per
    (applicationId, corpus, gate) — bounded (train-removal id sets) or
    corpus-row narrow (span accounting, repetition verdicts). The
    REGISTERED solo gate queries (doc_duplicate_span_removal,
    doc_repetition_filter, ...) stay pure — only the manifest-level
    consumers read the stored sets, exactly like production."""
    import os

    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), which)
    got = _MANIFEST_CACHE.get(key)
    if got is None:
        got = build().localCheckpoint()
        _MANIFEST_CACHE[key] = got
    return got


def _span_accounting_cached(spark, sf_dir: str) -> DataFrame:
    """The span-rewrite token accounting (doc_id, kept_tokens,
    removed_tokens), session-cached (see ``_gate_artifact_cached``)."""
    from aws_saas_etl_spark.operators.textops import doc_duplicate_span_removal

    return _gate_artifact_cached(
        spark, sf_dir, "span_accounting",
        lambda: doc_duplicate_span_removal(spark, sf_dir).select(
            "doc_id", "kept_tokens", "removed_tokens"
        ),
    )


def _repetition_verdicts_cached(spark, sf_dir: str) -> DataFrame:
    """The Gopher repetition verdict table (doc_id, verdict),
    session-cached (see ``_gate_artifact_cached``)."""
    from aws_saas_etl_spark.operators.textops import doc_repetition_filter

    return _gate_artifact_cached(
        spark, sf_dir, "repetition_verdicts",
        lambda: doc_repetition_filter(spark, sf_dir).select("doc_id", "verdict"),
    )


def _close_ranks(man: DataFrame) -> DataFrame:
    """Re-rank ``pos`` by the STORED pos within each (split, shard) —
    the shared tail of every manifest removal gate. Removal preserves
    relative order, so ranks simply close up; at 100 TB only shards
    that lost a row rewrite (the deletion-repair property). Closing
    ranks after EACH gate or ONCE after all gates is provably the same
    map (row_number over a stored-pos order is order-preserving), which
    is why the full-pipeline composition can close once at the end —
    tests/test_functions.py pins that identity."""
    w = Window.partitionBy("split", "shard").orderBy("pos")
    return man.withColumn("pos", F.row_number().over(w))


def _contam_train_ids(spark, sf_dir: str, man: DataFrame) -> DataFrame:
    """The decontamination gate's removal set: train-split doc_ids
    sharing ≥ CONTAM_MIN_SHARED rare winnowing fingerprints with any
    val/test document. Split membership comes from the (gate-invariant)
    split column of the manifest frame passed in, so the set is the
    same whether computed against the base manifest or any gated
    descendant — the property the full-pipeline composition relies on."""
    from aws_saas_etl_spark.operators.textops import (
        CONTAM_MAX_DF,
        CONTAM_MIN_SHARED,
        winnow_fingerprint_sets,
    )

    docs = ensure_parallelism(load_tables(spark, sf_dir).documents).na.drop("any")
    ex = winnow_fingerprint_sets(docs).select("doc_id", F.explode("fps").alias("fp"))
    rare = ex.join(
        ex.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("fp_df"))
        .where(F.col("fp_df") <= CONTAM_MAX_DF)
        .select("fp"),
        "fp",
    )
    tr = rare.join(
        man.where(F.col("split") == "train").select("doc_id"), "doc_id"
    ).select(F.col("doc_id").alias("train_id"), "fp")
    ev = rare.join(
        man.where(F.col("split") != "train").select("doc_id"), "doc_id"
    ).select(F.col("doc_id").alias("eval_id"), "fp")
    return (
        tr.join(ev, "fp")
        .where(F.col("train_id") != F.col("eval_id"))
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= CONTAM_MIN_SHARED)
        .select(F.col("train_id").alias("doc_id"))
        .distinct()
    )


def _stored_base_verdicts(spark, sf_dir: str):
    """The stored verdict artifacts next to the manifest: the historical
    keep-list and the sha → min(doc_id) keeper index, memoized per
    session and localCheckpoint-ed. In production both are read back
    from storage (they are what makes delta verdict repair a
    signals-join instead of a corpus re-scan); in-session, before r7
    each was an unmaterialized subtree re-executed per consumer — the
    verdict windows over ``sig_base`` ran once for the stored-manifest
    build, again for the survivor pool, and the sha index rebuilt from
    scratch inside the broadcast — the bulk of the 38-shuffle
    ``training_manifest_incremental`` plan the r6 verdict flagged.

    The base/delta cut is the SAME shingle-table percentile
    ``_tag_arrivals`` uses (NOT a per-doc percentile: the shingle table
    weights docs by shingle count, and the oracle twin encodes exactly
    that cut), so every consumer agrees on the split.
    """
    import os

    from aws_saas_etl_spark.operators.dedup import (
        DELTA_DOC_FRACTION,
        _shingle_table,
    )
    from aws_saas_etl_spark.operators.textops import verdicts_from_signals

    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), "verdicts")
    cached = _MANIFEST_CACHE.get(key)
    if cached is None:
        sh = _shingle_table(spark, sf_dir)
        cutoff = sh.agg(
            F.percentile("doc_id", 1.0 - DELTA_DOC_FRACTION).alias("cut")
        )
        sig_base = (
            _stored_signals(spark, sf_dir)
            .crossJoin(F.broadcast(cutoff))
            .where(F.col("doc_id") <= F.col("cut"))
            .drop("cut")
        )
        keep_base = (
            verdicts_from_signals(sig_base)
            .where(F.col("verdict") == "keep")
            .localCheckpoint()
        )
        sha_idx = (
            sig_base.groupBy("sha")
            .agg(F.min("doc_id").alias("base_min"))
            .localCheckpoint()
        )
        cached = (keep_base, sha_idx)
        _MANIFEST_CACHE[key] = cached
    return cached


def _stored_base_manifest(spark, sf_dir: str, cut=None) -> DataFrame:
    """The stored PRE-MERGE manifest frame (internal columns retained),
    memoized per session under the 'base' key — the artifact both the
    incremental merge and the stream→compaction handoff treat as their
    stored state. ``cut`` (the shared shingle-percentile base/delta
    boundary) is fetched here if the caller hasn't already."""
    import os

    from aws_saas_etl_spark.operators.dedup import (
        DELTA_DOC_FRACTION,
        _base_assignment,
        _shingle_table,
    )

    mkey = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), "base")
    stored = _MANIFEST_CACHE.get(mkey)
    if stored is not None:
        return stored
    if cut is None:
        # session-cached boundary scalar (r14 — see dedup.delta_doc_cut)
        from aws_saas_etl_spark.operators.dedup import delta_doc_cut

        cut = delta_doc_cut(spark, sf_dir)
    docs = ensure_parallelism(load_tables(spark, sf_dir).documents).na.drop("any")
    docs_base = docs.where(F.col("doc_id") <= F.lit(cut))
    base_labels = _base_assignment(spark, sf_dir)
    keep_base, _ = _stored_base_verdicts(spark, sf_dir)
    stored = _manifest_frame(docs_base, keep_base, base_labels).localCheckpoint()
    _MANIFEST_CACHE[mkey] = stored
    return stored


def _incremental_merge_parts(spark, sf_dir: str, keep_delta: DataFrame | None = None):
    """Body of the incremental manifest merge, split out so the
    partitioned-store query can write its pieces file-by-file: returns
    ``(stored_base, re_ranked, kept_pos, touched)`` where ``stored_base``
    is the stored pre-merge manifest, ``re_ranked`` holds the full new
    row sets of TOUCHED (split, shard) partitions, ``kept_pos`` the
    untouched stored rows (positions reused verbatim), and ``touched``
    the distinct touched partition keys. See
    ``training_manifest_incremental`` for the semantics and the
    delta-proportionality argument of each stage.

    ``keep_delta`` (doc_id frame) overrides the internally-derived delta
    survivor set — the stream→compaction handoff passes the appended
    rows it read back from the manifest store, so the nightly merge
    genuinely CONSUMES the stream's output instead of re-deriving it
    (their equality is separately pinned by tests/test_streaming.py's
    stream ≡ merge-keep-set test)."""
    from aws_saas_etl_spark.operators.dedup import (
        _base_assignment,
        _merge_delta_into_labels,
        _shingle_table,
        _tag_arrivals,
        DELTA_DOC_FRACTION,
    )
    from aws_saas_etl_spark.operators.textops import gate_verdict

    sh = _shingle_table(spark, sf_dir)
    tagged = _tag_arrivals(sh)
    # the shingle-percentile cut, fetched ONCE as a scalar: the lazy
    # broadcast(cutoff) form re-executed the percentile agg per consumer
    # (docs split ×2, signal split ×1 — three passes over the shingle
    # table for one number; a double roundtrips F.lit exactly). r14:
    # session-cached across constructions too (dedup.delta_doc_cut)
    from aws_saas_etl_spark.operators.dedup import delta_doc_cut

    cut = delta_doc_cut(spark, sf_dir)
    docs = ensure_parallelism(load_tables(spark, sf_dir).documents).na.drop("any")
    docs_delta = docs.where(F.col("doc_id") > F.lit(cut))

    # --- stored state (in production: read back from the manifest sink)
    base_labels = _base_assignment(spark, sf_dir)
    keep_base, sha_idx = _stored_base_verdicts(spark, sf_dir)
    stored = _stored_base_manifest(spark, sf_dir, cut)

    if keep_delta is None:
        # --- delta verdicts: keeper = min(stored index, delta-internal min)
        wd = Window.partitionBy("sha")
        delta_scored = (
            _stored_signals(spark, sf_dir).where(F.col("doc_id") > F.lit(cut))
            .withColumn("dmin", F.min("doc_id").over(wd))
            .join(F.broadcast(sha_idx), "sha", "left")
            .withColumn(
                "keeper", F.least(F.coalesce("base_min", "dmin"), F.col("dmin"))
            )
        )
        keep_delta = delta_scored.select(
            "doc_id", gate_verdict(F.col("keeper")).alias("verdict")
        ).where(F.col("verdict") == "keep")

    # --- exact cluster merge, then the affected scope
    merged = _merge_delta_into_labels(base_labels, tagged, sh).localCheckpoint()
    delta_ids = docs_delta.select("doc_id")
    # affected components + their membership: each consumed twice (the
    # comp set feeds the node expansion and the pool broadcast; the node
    # set feeds the stored-row semi and anti joins) — materialized once;
    # affected-set-sized
    aff_comps = (
        merged.join(delta_ids, merged["node"] == delta_ids["doc_id"], "semi")
        .select("comp")
        .distinct()
        .localCheckpoint()
    )
    aff_nodes = (
        merged.join(F.broadcast(aff_comps), "comp", "semi")
        .select("node")
        .localCheckpoint()
    )

    untouched_stored = stored.join(
        aff_nodes, stored["doc_id"] == aff_nodes["node"], "anti"
    )
    removed = stored.join(aff_nodes, stored["doc_id"] == aff_nodes["node"], "semi")

    # --- re-elect keepers inside affected clusters (+ delta singletons)
    survivors = keep_base.select("doc_id").unionByName(keep_delta.select("doc_id"))
    pool = (
        survivors.join(_doc_feats(docs), "doc_id")
        .join(merged.select(F.col("node").alias("doc_id"), "comp"), "doc_id", "left")
        .join(delta_ids.withColumn("is_delta", F.lit(True)), "doc_id", "left")
        .withColumn("ckey", F.coalesce(F.col("comp"), F.col("doc_id")))
        .join(F.broadcast(aff_comps.withColumnRenamed("comp", "ckey")
                          .withColumn("aff", F.lit(True))), "ckey", "left")
        .where(
            F.col("aff").isNotNull()
            | (F.col("is_delta").isNotNull() & F.col("comp").isNull())
        )
    )
    re_elected = (
        pool.withColumn("rn", F.row_number().over(_keeper_rank()))
        .where(F.col("rn") == 1)
    )
    # the re-elected rows: consumed twice (the touched-shard set and the
    # combined row set) — materialized once so the survivor-pool joins +
    # keeper window run a single time; affected-set-sized
    new_rows = (
        _shard_cols(re_elected)
        .select("doc_id", "ckey", "n_tokens", "split", "shuffle_key", "shard")
        .localCheckpoint()
    )

    # --- re-rank only touched shards; reuse stored pos elsewhere
    touched = (
        new_rows.select("split", "shard")
        .unionByName(removed.select("split", "shard"))
        .distinct()
    )
    # manifest-sized; materialized once — its two consumers (the touched
    # re-rank and the untouched pass-through) would otherwise each
    # re-execute the whole repair subtree
    combined = untouched_stored.select(
        "doc_id", "ckey", "n_tokens", "split", "shuffle_key", "shard", "pos"
    ).unionByName(
        new_rows.withColumn("pos", F.lit(None).cast("int"))
    ).localCheckpoint()
    re_ranked = (
        combined.join(F.broadcast(touched), ["split", "shard"], "semi")
        .withColumn("pos", F.row_number().over(_pos_window()))
    )
    kept_pos = combined.join(F.broadcast(touched), ["split", "shard"], "anti")
    return stored, re_ranked, kept_pos, touched


def training_manifest_incremental(spark, sf_dir: str) -> DataFrame:
    """INCREMENTAL maintenance of the training manifest — the nightly
    production shape at the ARTIFACT level: the stored manifest (built
    over the 90% historical corpus with the stored cluster assignment)
    absorbs the arriving top-decile batch without recomputing historical
    pair-space or re-ranking untouched shards, and the merged manifest is
    proven IDENTICAL to a full recompute (the oracle is the very same
    TRAINING_MANIFEST_SQL the batch query hash-checks against).

    What is delta-sized here, and why each reuse is exact:
    - cluster state: stored (node, comp) + delta-only prefix-filtered
      pairs through the star-edge CC merge (``_merge_delta_into_labels``
      — exactness argued there);
    - filter verdicts: stored base verdicts are reused VERBATIM — the
      exact-dup keeper is min(doc_id) per sha group, so append-only
      (higher-id) arrivals can never flip a historical verdict; delta
      verdicts resolve their keeper against a stored sha→min-id index
      joined with the delta-internal minimum;
    - keeper re-election: only clusters whose merged component contains
      an arrival re-rank; every other cluster's stored manifest row
      (same membership, same min-id label ⇒ same ckey, split, shard)
      is reused untouched;
    - positions: only (split, shard) groups that gained or lost a row
      re-rank; a shard whose membership is unchanged has an identical
      ordered (shuffle_key, doc_id) list, hence identical positions —
      those rows keep their stored pos, which is exactly why a 100 TB
      run rewrites only the touched shard files
      (``manifest_partitioned_store_roundtrip`` proves that file-level
      claim with a dynamic-partition-overwrite store).
    """
    _, re_ranked, kept_pos, _ = _incremental_merge_parts(spark, sf_dir)
    return (
        re_ranked.unionByName(kept_pos)
        .select("doc_id", "split", "shard", "pos", "n_tokens")
        .orderBy("split", "shard", "pos")
    )


MANIFEST_COLS = ["doc_id", "n_tokens", "split", "shard", "pos"]


def _overwrite_touched_partitions(re_ranked, touched, path: str) -> None:
    """Maintenance write for a (split, shard)-partitioned manifest store:
    dynamic-partition-overwrite the touched partitions' new row sets,
    then explicitly DROP every touched partition whose merged row set is
    EMPTY (ADVICE r8 medium): ``partitionOverwriteMode=dynamic`` only
    replaces partitions PRESENT in the written frame, so a one-row shard
    whose keeper lost re-election to an arrival hashing elsewhere would
    otherwise keep its stale files on disk and resurrect deleted rows on
    read-back.

    The emptied-key set is bounded by the touched PARTITION count (never
    row-sized), so collecting it is a metadata-sized scalar collect — at
    100 TB this is the ``ALTER TABLE ... DROP PARTITION`` call a catalog-
    backed store issues after the same maintenance write.

    Deletion goes through the JVM Hadoop ``FileSystem`` (ADVICE r9): an
    ``os.path``/``shutil`` drop only works for local paths with
    unescaped partition values — on an object-store URI it would
    silently no-op and stale files would resurrect the deleted rows,
    the exact bug this helper exists to prevent. The partition
    directory names come from Spark's OWN escaping
    (``ExternalCatalogUtils.getPartitionPathString``), so escaped
    values resolve to the same path the writer produced.
    ``re_ranked`` is localCheckpointed first so the overwrite and the
    emptied-key anti-join see ONE evaluation of the merge plan.
    """
    re_ranked = re_ranked.localCheckpoint(eager=True)
    re_ranked.select(*MANIFEST_COLS).write.partitionBy("split", "shard").option(
        "partitionOverwriteMode", "dynamic"
    ).mode("overwrite").parquet(path)
    emptied = touched.join(
        re_ranked.select("split", "shard").distinct(), ["split", "shard"], "anti"
    ).collect()
    if not emptied:
        return
    spark = re_ranked.sparkSession
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    catalog_utils = jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(hconf)
    for r in emptied:
        part = jvm.org.apache.hadoop.fs.Path(
            jvm.org.apache.hadoop.fs.Path(
                root,
                catalog_utils.getPartitionPathString("split", str(r["split"])),
            ),
            catalog_utils.getPartitionPathString("shard", str(r["shard"])),
        )
        if fs.exists(part):
            fs.delete(part, True)


def manifest_partitioned_store_roundtrip(spark, sf_dir: str) -> DataFrame:
    """The manifest as a PARTITIONED FILE STORE, maintained by dynamic
    partition overwrite — the file-level half of the incremental claim
    (VERDICT r7 #3): row-level delta-proportionality was proven by
    ``training_manifest_incremental``; this query proves that on disk
    ONLY the touched (split, shard) partitions are rewritten.

    1. The stored base manifest is written to parquet partitioned by
       (split, shard) — the initial full store (paid once).
    2. The incremental merge runs; the writer ships ONLY the touched
       partitions' re-ranked row sets with
       ``partitionOverwriteMode=dynamic`` (a per-write option, so the
       driver's vanilla session needs no conf), and Spark replaces
       exactly the partitions present in the written frame — it never
       lists, reads, or rewrites any other shard file, so at 100 TB the
       maintenance write is touched-shards-sized, not corpus-sized.
       Touched partitions whose merged row set is EMPTY are dropped
       explicitly (``_overwrite_touched_partitions``) — dynamic
       overwrite alone would leave their stale files behind.
    3. The WHOLE partitioned table is read back and must value-hash to
       the full recompute (the same TRAINING_MANIFEST_SQL gate) — only
       possible if the untouched partitions' stored rows are exactly the
       merged manifest's rows: storage reuse proven by the same hash
       that proves the merge.

    ``tests/test_layout_and_merge.py`` additionally asserts the
    file-level invariant directly: untouched partition files are
    byte-identical (same names + md5) across the maintenance write.
    """
    import os

    from aws_saas_etl_spark.sources.custom import proc_dir

    stored, re_ranked, _, touched = _incremental_merge_parts(spark, sf_dir)
    path = proc_dir("manifest_part", os.path.abspath(sf_dir))
    stored.select(*MANIFEST_COLS).write.partitionBy("split", "shard").mode(
        "overwrite"
    ).parquet(path)
    _overwrite_touched_partitions(re_ranked, touched, path)
    back = spark.read.parquet(path)
    return (
        back.select(
            "doc_id",
            F.col("split").cast("string").alias("split"),
            F.col("shard").cast("int").alias("shard"),
            "pos",
            "n_tokens",
        )
        .orderBy("split", "shard", "pos")
    )


# Constructing this query's DataFrame EXECUTES two partitioned parquet
# writes (initial store + dynamic-overwrite maintenance) — the file-level
# storage leg it exists to prove. (plan/bench tools: see ADVICE r7)
manifest_partitioned_store_roundtrip.side_effecting = True


def training_manifest_deletion_repair(spark, sf_dir: str) -> DataFrame:
    """GDPR / license-revocation propagated all the way into the
    manifest: remove the deletion list (doc_id % DELETION_MOD == 0) and
    emit the manifest a compliant pipeline must now serve — proven
    IDENTICAL to a full recompute over the surviving corpus (the oracle
    is the manifest twin with the deletion filter pushed into its
    document source).

    Deletions are harder than arrivals, and each hazard is handled
    delta-sized against stored state:
    - exact-dup keepers CAN flip (deleting a sha-group's min-id keeper
      promotes a surviving copy), so verdicts re-evaluate only inside
      sha groups that lost a member — against the stored signals table,
      with the keeper window over survivors;
    - cluster connectivity CAN break (the stored star-edge encoding
      loses the hub when the min-id member is deleted), so pairs are
      re-derived only AMONG SURVIVING MEMBERS OF AFFECTED CLUSTERS
      (pairs never cross components, so the restriction is complete)
      and re-closed into sub-clusters with fresh min-id labels;
    - the affected scope is the union of clusters containing a deleted
      doc and clusters/singletons containing a verdict-flip candidate —
      every other stored manifest row is reused verbatim (membership,
      label, split, shard all provably unchanged);
    - positions re-rank only in shards that gained or lost a row —
      untouched shard files never rewrite, the same property the
      arrival path (``training_manifest_incremental``) exploits.
    """
    from aws_saas_etl_spark.operators.dedup import (
        _prefix_candidates,
        _shingle_table,
        _verify_pairs,
        connected_components,
        content_clusters,
    )
    from aws_saas_etl_spark.operators.textops import (
        gate_verdict,
        verdicts_from_signals,
    )

    docs = ensure_parallelism(load_tables(spark, sf_dir).documents).na.drop("any")
    is_deleted = F.col("doc_id") % DELETION_MOD == 0

    # --- stored state (in production: the persisted manifest, cluster
    # assignment, and per-doc gate-signal table)
    comp_full = content_clusters(spark, sf_dir)
    stored = _full_manifest(spark, sf_dir)
    signals = _stored_signals(spark, sf_dir)
    keep_full = verdicts_from_signals(signals).where(F.col("verdict") == "keep")

    # --- affected scope
    del_ids = docs.where(is_deleted).select("doc_id")
    del_shas = signals.where(is_deleted).select("sha").distinct()
    flip_cands = (
        signals.where(~is_deleted).join(del_shas, "sha", "semi").select("doc_id")
    )
    node_comp = comp_full.select(F.col("node").alias("doc_id"), "comp")
    aff_comps = (
        node_comp.join(del_ids, "doc_id", "semi")
        .select("comp")
        .unionByName(node_comp.join(flip_cands, "doc_id", "semi").select("comp"))
        .distinct()
    )
    aff_members = node_comp.join(F.broadcast(aff_comps), "comp", "semi")
    scope_ids = (
        aff_members.select("doc_id")
        .unionByName(flip_cands)
        .unionByName(del_ids)
        .distinct()
        .localCheckpoint()
    )

    # --- connectivity repair: pairs among surviving affected members only
    surv_members = aff_members.select("doc_id").where(~is_deleted)
    sub_sh = _shingle_table(spark, sf_dir).join(surv_members, "doc_id", "semi")
    sub_pairs = _verify_pairs(_prefix_candidates(sub_sh, 0.4), sub_sh, 0.4)
    sub_labels = connected_components(sub_pairs, src="doc_a", dst="doc_b")

    # --- verdict repair inside sha groups that lost a member
    wd = Window.partitionBy("sha")
    re_verdicts = (
        signals.where(~is_deleted)
        .join(del_shas, "sha", "semi")
        .withColumn("keeper", F.min("doc_id").over(wd))
    )
    keep_flipped = re_verdicts.select(
        "doc_id", gate_verdict(F.col("keeper")).alias("verdict")
    ).where(F.col("verdict") == "keep")

    # --- keep-best pool for the scope: reused verdicts outside affected
    # sha groups, repaired verdicts inside them
    k1 = (
        keep_full.select("doc_id")
        .where(~is_deleted)
        .join(scope_ids, "doc_id", "semi")
        .join(flip_cands, "doc_id", "anti")
    )
    pool_ids = k1.unionByName(keep_flipped.select("doc_id")).distinct()
    pool = (
        pool_ids.join(_doc_feats(docs), "doc_id")
        .join(sub_labels.select(F.col("node").alias("doc_id"), "comp"), "doc_id", "left")
        .withColumn("ckey", F.coalesce(F.col("comp"), F.col("doc_id")))
    )
    re_elected = (
        pool.withColumn("rn", F.row_number().over(_keeper_rank()))
        .where(F.col("rn") == 1)
    )
    # consumed twice (touched-shard set + combined row set): materialized
    # once so the sub-pair/CC repair chain runs a single time
    new_rows = (
        _shard_cols(re_elected)
        .select("doc_id", "ckey", "n_tokens", "split", "shuffle_key", "shard")
        .localCheckpoint()
    )

    # --- merge with stored rows; re-rank only touched shards
    untouched_stored = stored.join(scope_ids, "doc_id", "anti")
    removed = stored.join(scope_ids, "doc_id", "semi")
    touched = (
        new_rows.select("split", "shard")
        .unionByName(removed.select("split", "shard"))
        .distinct()
    )
    # manifest-sized; materialized once — its two consumers (the touched
    # re-rank and the untouched pass-through) would otherwise each
    # re-execute the whole repair subtree
    combined = untouched_stored.select(
        "doc_id", "ckey", "n_tokens", "split", "shuffle_key", "shard", "pos"
    ).unionByName(
        new_rows.withColumn("pos", F.lit(None).cast("int"))
    ).localCheckpoint()
    re_ranked = (
        combined.join(F.broadcast(touched), ["split", "shard"], "semi")
        .withColumn("pos", F.row_number().over(_pos_window()))
    )
    kept_pos = combined.join(F.broadcast(touched), ["split", "shard"], "anti")
    return (
        re_ranked.unionByName(kept_pos)
        .select("doc_id", "split", "shard", "pos", "n_tokens")
        .orderBy("split", "shard", "pos")
    )


def manifest_store_compaction(spark, sf_dir: str) -> DataFrame:
    """COMPACTION of the churned manifest store — the maintenance step a
    real 100 TB store schedules after a deletion wave
    (``manifest_deletion_churn`` is the report that triggers it): the
    repaired manifest lives in a (split, shard)-partitioned store whose
    partitions have accreted multiple small files (every maintenance
    write appends per-task files); ``sources.io.compact_parquet`` with
    ``partition_cols`` rewrites it to exactly ONE file per partition —
    layout changes, content provably does not.

    The proof is the point (VERDICT r8 #7): the compacted store's
    read-back must value-hash to the SAME deletion-repair twin the
    repaired manifest hashes to — compaction that alters even one row
    would flip the gate. The file-count halves of the claim (fragmented
    before, one per partition after) are pinned in
    ``tests/test_layout_and_merge.py``.

    Scale shape: one hash-repartition on the partition key + one
    partitioned write — no driver materialization, no data pass beyond
    the rewrite itself, and the byte-sized file-count derivation reads
    only filesystem metadata.
    """
    import os

    from aws_saas_etl_spark.sources.custom import proc_dir
    from aws_saas_etl_spark.sources.io import compact_parquet

    repaired = training_manifest_deletion_repair(spark, sf_dir)
    src = proc_dir("manifest_churned", os.path.abspath(sf_dir))
    # the accreted state: per-task files inside each partition (the
    # round-robin repartition models successive maintenance writes)
    repaired.repartition(4).write.partitionBy("split", "shard").mode(
        "overwrite"
    ).parquet(src)
    dst = proc_dir("manifest_compacted", os.path.abspath(sf_dir))
    compact_parquet(spark, src, dst, partition_cols=["split", "shard"])
    back = spark.read.parquet(dst)
    return (
        back.select(
            "doc_id",
            F.col("split").cast("string").alias("split"),
            F.col("shard").cast("int").alias("shard"),
            "pos",
            "n_tokens",
        )
        .orderBy("split", "shard", "pos")
    )


# Constructing this query's DataFrame EXECUTES the fragmented store write
# and the compaction rewrite — the layout maintenance it exists to prove.
manifest_store_compaction.side_effecting = True


def manifest_stream_compaction_handoff(spark, sf_dir: str) -> DataFrame:
    """The STREAM→COMPACTION handoff, composed end-to-end (VERDICT r12
    #5 — each leg was proven solo; this row proves the seam an on-call
    engineer actually relies on): the streamed manifest appends land in
    the store, the nightly merge CONSUMES them from the store, and the
    compacted store read-back must equal the full recompute.

      1. freshness — ``_stream_manifest_delta_rows`` runs a REAL
         availableNow drain of the registered delta-ingest pipeline
         (gates + stored-sha probe, pos-less append rows);
      2. accretion — the stored BASE manifest (with positions) is the
         partitioned store's content; the streamed rows APPEND to the
         same (split, shard) partitions with ``pos`` NULL — extra
         per-batch files in-partition, the fragmentation the nightly
         job exists to absorb;
      3. nightly — the store is read BACK, the pos-less rows are the
         arrival set handed to the incremental merge
         (``_incremental_merge_parts(keep_delta=...)`` — the merge
         genuinely consumes the stream's output rather than
         re-deriving delta verdicts), keepers re-elect inside affected
         clusters, positions re-rank only touched shards;
      4. compaction — the reconciled manifest rewrites through
         ``compact_parquet`` to ONE file per partition, and the
         COMPACTED STORE'S READ-BACK is what this query returns.

    The oracle is ``TRAINING_MANIFEST_SQL`` — the very same full-
    recompute twin the batch and incremental rows hash against — so the
    hash-green gate states: stream appends + stored base + nightly
    merge + compaction ≡ recomputing the whole manifest from raw
    parquet. Correctness of substituting the streamed rows for the
    merge's internal delta-survivor set rests on the stream ≡
    merge-keep-set identity (pinned in tests/test_streaming.py, which
    also asserts the fixture delta has no intra-delta sha collisions);
    tests/test_functions.py pins the handoff ≡
    ``training_manifest_incremental`` row-for-row.

    Scale shape: the drain is delta-sized, the store writes are
    manifest-sized (one partitioned write + one append), the merge is
    the proven delta-proportional repair, and the compaction is one
    hash-repartition rewrite — nothing corpus×corpus, no new shuffle
    class beyond the proven legs.
    """
    import os

    from aws_saas_etl_spark.sources.custom import proc_dir
    from aws_saas_etl_spark.sources.io import compact_parquet
    from aws_saas_etl_spark.streaming.runners import _stream_manifest_delta_rows

    apath = os.path.abspath(sf_dir)

    # 1. freshness: the stream's appended rows (real drain)
    appends = _stream_manifest_delta_rows(spark, sf_dir)

    # 2. accretion: base store + pos-less streamed appends
    src = proc_dir("manifest_stream_handoff", apath)
    _stored_base_manifest(spark, sf_dir).select(
        "doc_id", "n_tokens", F.col("pos").cast("int").alias("pos"), "split", "shard"
    ).write.partitionBy("split", "shard").mode("overwrite").parquet(src)
    appends.select(
        "doc_id", "n_tokens", F.lit(None).cast("int").alias("pos"), "split", "shard"
    ).write.partitionBy("split", "shard").mode("append").parquet(src)

    # 3. nightly: read the store back; pos-less rows ARE the arrivals
    back = spark.read.parquet(src)
    arrived = back.where(F.col("pos").isNull()).select("doc_id")
    _, re_ranked, kept_pos, _ = _incremental_merge_parts(
        spark, sf_dir, keep_delta=arrived
    )
    merged = re_ranked.unionByName(kept_pos).select(
        "doc_id", "n_tokens", "pos", "split", "shard"
    )

    # 4. compaction: reconciled manifest → one file per partition → the
    # returned rows are the COMPACTED STORE's read-back
    mid = proc_dir("manifest_stream_handoff_merged", apath)
    merged.write.partitionBy("split", "shard").mode("overwrite").parquet(mid)
    dst = proc_dir("manifest_stream_handoff_compacted", apath)
    compact_parquet(spark, mid, dst, partition_cols=["split", "shard"])
    return (
        spark.read.parquet(dst)
        .select(
            "doc_id",
            F.col("split").cast("string").alias("split"),
            F.col("shard").cast("int").alias("shard"),
            "pos",
            "n_tokens",
        )
        .orderBy("split", "shard", "pos")
    )


# Constructing this query's DataFrame EXECUTES the stream drain, both
# store writes, and the compaction rewrite — the handoff it proves.
manifest_stream_compaction_handoff.side_effecting = True


def manifest_deletion_churn(spark, sf_dir: str) -> DataFrame:
    """Loader-facing CHURN report for a manifest maintenance event: per
    (split, shard) of the stored manifest, how many rows the deletion
    repair removed, how many moved (same doc, different placement —
    keeper flips and rank-closing shift positions), how many are stable
    byte-for-byte, and how many training tokens left the shard. This is
    the diff an ops team reads before shipping a repaired manifest: a
    shard with ``n_moved = n_stable = 0`` and ``n_removed > 0`` went
    empty; a shard with zero removed AND zero moved needs no file
    rewrite (the file-level claim ``manifest_partitioned_store_roundtrip``
    proves for arrivals holds for deletions the same way).

    Scale shape: one left join of two manifest frames on doc_id
    (manifest-sized, uniformly keyed) + one (split, shard) aggregate —
    both inputs come from the session-memoized stored artifacts, so the
    report costs one bounded join beyond the repair it audits.
    """
    before = training_manifest(spark, sf_dir).alias("o")
    after = training_manifest_deletion_repair(spark, sf_dir).select(
        "doc_id",
        F.col("split").alias("n_split"),
        F.col("shard").alias("n_shard"),
        F.col("pos").alias("n_pos"),
    )
    status = (
        F.when(F.col("n_split").isNull(), F.lit("removed"))
        .when(
            (F.col("n_split") == F.col("o.split"))
            & (F.col("n_shard") == F.col("o.shard"))
            & (F.col("n_pos") == F.col("o.pos")),
            F.lit("stable"),
        )
        .otherwise(F.lit("moved"))
    )
    flag = lambda s: F.sum(F.when(F.col("status") == s, 1).otherwise(0))  # noqa: E731
    return (
        before.join(after, "doc_id", "left")
        .select("o.split", "o.shard", "o.n_tokens", status.alias("status"))
        .groupBy("split", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            flag("removed").alias("n_removed"),
            flag("moved").alias("n_moved"),
            flag("stable").alias("n_stable"),
            F.sum(
                F.when(F.col("status") == "removed", F.col("n_tokens")).otherwise(0)
            ).alias("tokens_removed"),
        )
        .orderBy("split", "shard")
    )


# --- trained quality classifier: logistic regression by full-batch GD ----
# The model-based quality filter LLM pipelines actually deploy (fasttext/
# DCLM/FineWeb-edu shape) distilled to its Spark-native core: each GD
# iteration is ONE aggregate over the corpus. Hyperparameters are chosen
# for engine-exact reproducibility, not convergence speed:
LOGREG_ITERS = 3
LOGREG_LR = 4.0  # power of two — the update multiply is IEEE-exact
LOGREG_X_SCALE = 10_000  # features quantized to exact bigints
LOGREG_P_SCALE = 100_000  # sigmoid outputs quantized to exact bigints


def doc_quality_logreg(spark, sf_dir: str) -> DataFrame:
    """Train-and-score a logistic-regression document classifier with
    full-batch gradient descent, entirely as DataFrame algebra — the
    trained counterpart of the heuristic ``doc_quality_scores`` and the
    discriminative sibling of ``nb_lang_scores`` (same in-sample
    train→score plumbing; the pipeline artifact is the calibrated score a
    filter thresholds on). Surface features (stopword ratio, alphabetic
    ratio, scaled mean token length, intercept) predict the ``lang ==
    'en'`` label; ``LOGREG_ITERS`` GD steps, then every doc is scored by
    the final weights.

    Scale shape: one feature pass (localCheckpoint barrier — four
    consumers: three gradient aggregates + scoring), then per iteration
    ONE map-side-combined aggregate producing a 1-row weight frame that
    broadcast-joins (on a constant key — BroadcastHashJoin, never a
    cartesian) back onto the features. Model size is corpus-independent
    (4 doubles); iteration count is fixed; nothing is driver-side — the
    weights live in the plan as a 1-row DataFrame, so the whole
    train→score graph is ONE lazy plan at any corpus size.

    Determinism (the ``nb_lang_scores`` recipe, applied to GD): features
    are quantized to exact int64 (ratio × 10⁴ — each ratio is ONE IEEE
    division of exact counts), the sigmoid to exact int64 (p × 10⁵), so
    every gradient sufficient statistic is an ORDER-INDEPENDENT integer
    sum (≤ 5·10¹² per 5k docs — int64-safe to ~10⁸ docs per fit, beyond
    which production shards the batch and averages shard gradients); the
    weight update divides two exact numbers in double (IEEE-determined).
    The only cross-engine tolerance is exp() in the sigmoid (same
    libm-ulp class the DSIR/NB/CCNet ln() twins accept; a 1-ulp p
    difference flips an int64 quantization only within ~10⁻¹¹ of a
    boundary). Iteration 1 starts at w = 0 ⇒ p = 0.5 exactly — no exp at
    all on the first step.
    
    Measured (r10): 2.56 s at sf0.1 (bench, cold — the three GD
    aggregates + the scoring pass); α 0.19 at 8× (SCALE.md).
    """
    feats, wdf = _logreg_artifacts(spark, sf_dir)
    return _logreg_serve(feats, wdf)


#: Session memo of the trained quality classifier — (feature table,
#: 1-row weight frame) keyed (applicationId, sf_dir). The r13 eager
#: checkpoint on logreg_fit alone made every CONSTRUCTION of a
#: quality-gated manifest re-run the feature pass + the serial GD chain
#: (measured 5-6 s warm, 17 s cold per construction —
#: manifest_gateset_version_diff regressed 10.3 → 17.3 s best-of-2
#: before this memo). The classifier is a stored artifact in
#: production (fit nightly, served all day — logreg_store_roundtrip
#: proves the storage leg), so the session memo is the faithful model,
#: exactly like _IVF_CACHE/_MANIFEST_CACHE: cold builds it once, every
#: consumer (scores, calibration, quality gate, full pipeline, gateset
#: v2, version diff, staleness fresh arm, stream scorer) serves from it.
_LOGREG_CACHE = MemoDict("logreg_artifacts")


def _logreg_artifacts(spark, sf_dir: str, which: str = "full"):
    """(feats, weights) for the corpus at ``sf_dir``, fitted once per
    session. ``which='base'`` fits on the staleness report's historical
    slice (its own memo slot, the ::base convention)."""
    import os as _os

    key = (spark.sparkContext.applicationId, _os.path.abspath(sf_dir), which)
    got = _LOGREG_CACHE.get(key)
    if got is None:
        docs = ensure_parallelism(load_tables(spark, sf_dir).documents)
        feats = _logreg_feats(docs)
        got = (feats, logreg_fit(feats))
        _LOGREG_CACHE[key] = got
    return got


def logreg_scores(docs: DataFrame) -> DataFrame:
    """The GD core over any (doc_id, lang, text) frame — split out (the
    ``nb_scores`` precedent) so tests can train on a CONSTRUCTED corpus
    with genuinely separable classes: the synthetic fixture draws every
    lang from one shared token pool, so in-sample accuracy there is the
    majority-class floor by design; the oracle twin, not fixture
    accuracy, is what proves the training arithmetic."""
    feats = _logreg_feats(docs)
    return _logreg_serve(feats, logreg_fit(feats))


def _logreg_feat_exprs() -> list:
    """The quantized feature/label column expressions (x1..x4, y) — pure
    stateless built-ins, shared by the batch fit (below) and the
    streaming scorer (streaming frames can't localCheckpoint)."""

    def xq(col):
        return F.round(col * F.lit(float(LOGREG_X_SCALE))).cast("bigint")

    return [
        xq(T.stopword_ratio("text", "en")).alias("x1"),
        xq(T.alpha_ratio("text")).alias("x2"),
        xq(T.mean_token_length("text") / F.lit(10.0)).alias("x3"),
        F.lit(LOGREG_X_SCALE).cast("bigint").alias("x4"),
        (F.col("lang") == F.lit("en")).cast("bigint").alias("y"),
    ]


def _logreg_feats(docs: DataFrame) -> DataFrame:
    """(doc_id, x1..x4 exact-bigint features, y) — localCheckpoint'ed:
    the three gradient aggregates and scoring all read it."""
    docs = docs.where(
        F.col("doc_id").isNotNull()
        & F.col("text").isNotNull()
        & F.col("lang").isNotNull()
    )
    return docs.select("doc_id", *_logreg_feat_exprs()).localCheckpoint()


def _logreg_z(w):
    """w·x in a FIXED left-associated order — mirrored textually by the
    oracle twin."""
    terms = [
        w[j] * (F.col(f"x{j}") / F.lit(float(LOGREG_X_SCALE))) for j in (1, 2, 3, 4)
    ]
    return ((terms[0] + terms[1]) + terms[2]) + terms[3]


def logreg_fit(feats: DataFrame) -> DataFrame:
    """``LOGREG_ITERS`` full-batch GD steps → the 1-row weight frame
    (w1..w4). Each step is one map-side-combined aggregate; the weights
    never leave the plan.

    The returned frame is localCheckpoint-ed (r13 optimization, the
    ``ivf_fit_cells`` precedent): it is ONE row, but its plan is the
    whole serial GD chain, and consumers hang it under broadcast joins —
    ``_quality_low_train_ids`` reads the scored frame three times (cut
    aggregate, decile bucketing, threshold filter), which re-ran the
    full fit chain per read (an unmaterialized broadcast subtree
    re-executes per consumer — the exchange-reuse pitfall measured in
    doc_tfidf_neighbors). Eager 1-row materialization runs the fit once;
    every caller is a batch frame (the streaming scorer collect()s the
    fit on a static frame before its query starts)."""

    def pq_expr(w):
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_logreg_z(w)))
        return F.round(p * F.lit(float(LOGREG_P_SCALE))).cast("bigint")

    wdf = None
    for _ in range(LOGREG_ITERS):
        if wdf is None:
            src = feats
            w = {j: F.lit(0.0) for j in (1, 2, 3, 4)}
        else:
            src = feats.withColumn("_k", F.lit(1)).join(
                F.broadcast(wdf.withColumn("_k", F.lit(1))), "_k"
            )
            w = {j: F.col(f"w{j}") for j in (1, 2, 3, 4)}
        resid = pq_expr(w) - F.col("y") * F.lit(LOGREG_P_SCALE)
        agg = src.agg(
            *[F.sum(resid * F.col(f"x{j}")).alias(f"s{j}") for j in (1, 2, 3, 4)],
            F.count(F.lit(1)).alias("n"),
            *[F.min(w[j]).alias(f"wp{j}") for j in (1, 2, 3, 4)],
        )
        wdf = agg.select(
            *[
                (
                    F.col(f"wp{j}")
                    - F.lit(LOGREG_LR)
                    * (
                        F.col(f"s{j}").cast("double")
                        / (
                            F.col("n").cast("double")
                            * F.lit(float(LOGREG_P_SCALE * LOGREG_X_SCALE))
                        )
                    )
                ).alias(f"w{j}")
                for j in (1, 2, 3, 4)
            ]
        )
    return wdf.localCheckpoint()


def _logreg_serve(feats: DataFrame, wdf: DataFrame) -> DataFrame:
    """Score every doc by a 1-row weight frame (broadcast join on a
    constant key) — shared by the in-plan fit and the stored-weights
    roundtrip."""
    w = {j: F.col(f"w{j}") for j in (1, 2, 3, 4)}
    scored = feats.withColumn("_k", F.lit(1)).join(
        F.broadcast(wdf.withColumn("_k", F.lit(1))), "_k"
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_logreg_z(w)))
    return scored.select(
        "doc_id",
        F.col("y").alias("label"),
        N.dround(p, 6).alias("score"),
        (p >= F.lit(0.5)).cast("bigint").alias("pred"),
    ).orderBy("doc_id")


def logreg_store_roundtrip(spark, sf_dir: str) -> DataFrame:
    """The PERSISTED classifier: the fitted weight frame is WRITTEN
    through the exactly-once manifest sink, READ BACK, and every doc is
    scored by the STORED weights via the identical ``_logreg_serve``
    plan — hashes against the SAME twin as ``doc_quality_logreg``, so
    write → read → serve is proven lossless (the model artifact a 100 TB
    scoring fleet loads without ever seeing the training aggregates —
    the ``ann_pq_store_roundtrip`` argument applied to a 4-double
    model).

    Parquet stores the weight DOUBLES verbatim (no decimal rescale), so
    the served scores are bit-identical to the in-plan fit's.
    """
    import os

    from aws_saas_etl_spark.sources.custom import (
        proc_dir,
        read_manifest_parquet,
        register_sink,
    )

    register_sink(spark)
    # session-fitted artifact (see _LOGREG_CACHE) — the write proves the
    # storage leg; the stored table, not the memo, is what serves below
    feats, wdf = _logreg_artifacts(spark, sf_dir)
    path = proc_dir("logreg_weights", os.path.abspath(sf_dir))
    wdf.write.format("manifest_parquet").option("path", path).mode(
        "overwrite"
    ).save()
    stored = read_manifest_parquet(spark, path)
    return _logreg_serve(feats, stored)


# Constructing this query's DataFrame EXECUTES the GD fit and a real
# manifest-sink write — the storage leg it exists to prove.
logreg_store_roundtrip.side_effecting = True


def logreg_calibration_report(spark, sf_dir: str) -> DataFrame:
    """Reliability-diagram table for the GD logistic classifier: per
    score decile, mean predicted probability vs empirical label rate —
    the calibration artifact a score-thresholding filter is tuned
    against (a well-calibrated bucket has mean_score ≈ label_rate; the
    gap IS the trust budget for the chosen cutoff).

    Scale shape: one bounded aggregate (≤ 10 buckets) over the scored
    frame — the training plan's cost dominates; the report adds a
    map-side-combined groupBy on a 10-value key. Decimal-path mean
    (``davg_rounded``) keeps the per-bucket average order-independent.
    """
    scored = doc_quality_logreg(spark, sf_dir)
    bucket = F.least(F.floor(F.col("score") * 10), F.lit(9)).cast("int")
    return (
        scored.select(bucket.alias("bucket"), "label", "score")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            N.davg_rounded(F.col("score"), 6).alias("mean_score"),
            N.dround(
                F.sum("label").cast("double") / F.count(F.lit(1)), 6
            ).alias("label_rate"),
        )
        .orderBy("bucket")
    )


#: A kept score-decile must calibrate at ≥ this empirical label rate —
#: the bar the reliability table is read against (VERDICT r10 #8).
QUALITY_GATE_MIN_RATE = 0.5


def training_manifest_quality_filtered(spark, sf_dir: str) -> DataFrame:
    """QUALITY-FILTERED training manifest — the trained classifier wired
    into the artifact it exists to gate (the DCLM/FineWeb-edu topology:
    heuristic gates build the pool, a learned scorer prunes it), with
    the cutoff READ FROM THE CALIBRATION TABLE (r11, VERDICT r10 #8 —
    the production loop closed: fit → calibrate → the calibration
    chooses the threshold → gate): score-rank deciles get their
    empirical label rate (the ``logreg_calibration_report`` reliability
    measurement over rank deciles — absolute-score bands collapse to
    one bucket on a weakly-separated scorer, rank deciles always
    stratify), the LOWEST decile whose label rate clears
    ``QUALITY_GATE_MIN_RATE`` sets the threshold at its lower score
    edge, and every TRAIN-split document at or below that edge is
    removed with shard positions closing ranks; val/test rows survive
    verbatim (eval sets stay fixed — the ``training_manifest_
    decontaminated`` convention). If NO decile clears the bar the gate
    keeps everything — an uncalibrated scorer must not silently gut the
    corpus.

    Engine-exactness: decile edges come from one exact-percentile
    aggregate (Spark ``percentile`` ≡ DuckDB ``quantile_cont`` — the
    proven ``customer_balance_deciles`` machinery: NOT ntile(), which
    would sort the corpus in one partition); membership is the strict
    ``score > edge`` count against the broadcast 9-value cut array;
    label rates round via the shared decimal path before the ≥ compare.

    Scale shape: the scorer adds its fixed three-aggregate fit; the
    calibration adds ONE percentile aggregate + ONE ≤10-group rate
    aggregate, each broadcast back as a 1-row frame; removal + re-rank
    reuse the stored-pos window — at 100 TB only shards that lost a row
    rewrite, the deletion-repair property.
    """
    man = _full_manifest(spark, sf_dir)
    low = _gate_artifact_cached(
        spark, sf_dir, "quality_low_ids",
        lambda: _quality_low_train_ids(spark, sf_dir, man),
    )
    return (
        _close_ranks(man.join(low, "doc_id", "anti"))
        .select("doc_id", "split", "shard", "pos", "n_tokens")
        .orderBy("split", "shard", "pos")
    )


def _quality_low_train_ids(spark, sf_dir: str, man: DataFrame) -> DataFrame:
    """The quality gate's removal set: train-split doc_ids at or below
    the calibration-chosen score edge. The calibration (decile cuts,
    rates, threshold) is computed over the FULL scored corpus —
    independent of the manifest — and the train condition reads the
    (gate-invariant) split column, so the set is identical against the
    base manifest or any gated descendant."""
    scored = doc_quality_logreg(spark, sf_dir).select("doc_id", "label", "score")
    cuts = scored.agg(
        F.percentile(
            "score", F.array(*[F.lit(i / 10) for i in range(1, 10)])
        ).alias("cuts")
    )
    dec = F.aggregate(
        F.col("cuts"),
        F.lit(0),
        lambda acc, c: acc + F.when(F.col("score") > c, 1).otherwise(0),
    )
    bucketed = scored.crossJoin(F.broadcast(cuts)).select(
        "doc_id", "label", "score", dec.alias("dec")
    )
    rates = bucketed.groupBy("dec").agg(
        N.dround(F.sum("label").cast("double") / F.count(F.lit(1)), 6).alias(
            "label_rate"
        )
    )
    cutd = rates.where(
        F.col("label_rate") >= F.lit(QUALITY_GATE_MIN_RATE)
    ).agg(F.min("dec").alias("cut_dec"))
    # lower edge of the chosen decile: dec(score) < cut_dec ⟺ score <=
    # cuts[cut_dec] (cuts sorted ascending, strict-> membership), so one
    # <= against the edge removes exactly the deciles below it; cut_dec
    # NULL (no decile clears) or 0 (lowest already clears) gates nothing
    thr = cutd.crossJoin(F.broadcast(cuts)).select(
        F.when(
            F.col("cut_dec") >= 1, F.element_at("cuts", F.col("cut_dec"))
        ).alias("thr")
    )
    low = (
        scored.crossJoin(F.broadcast(thr))
        .where(F.col("score") <= F.col("thr"))
        .select("doc_id")
    )
    return man.where(F.col("split") == "train").join(low, "doc_id").select("doc_id")


def training_manifest_span_cleaned(spark, sf_dir: str) -> DataFrame:
    """SPAN-CLEANED training manifest — the substring-dedup rewrite
    (``doc_duplicate_span_removal``) composed into the pipeline artifact
    (VERDICT r10 #6): the manifest's keep-best/split/shard structure is
    computed as always, then each surviving row's token accounting flows
    through the CLEANED text — ``kept_tokens``/``removed_tokens`` ride
    alongside the original ``n_tokens`` (their sum, the conservation law
    ``tests/test_functions.py`` pins), and documents whose every token
    sat inside a cross-document duplicated span drop from the manifest
    entirely (an all-boilerplate doc trains nothing), with shard
    positions closing ranks. This is the Lee et al. ACL'22 ordering a
    production pipeline runs: document-level dedup chooses WHICH docs
    ship; substring-level dedup rewrites WHAT of each doc ships; the
    manifest records both.

    Scale shape: the manifest chain and the span rewrite are existing
    corpus-linear intermediates; composing them adds ONE doc_id-keyed
    join and the stored-pos re-rank window — at 100 TB only shards that
    lost an emptied doc rewrite, the deletion-repair property.

    Measured (r11): 13.57 s cold at sf0.1 (scale probe, best-of-2
    noop), α 0.28 at 8× ≈ additive over the manifest chain (8.30 s,
    α 0.34) + the span rewrite (2.90 s, α 0.22) — see SCALE.md.
    """
    man = _full_manifest(spark, sf_dir)
    cleaned = _span_accounting_cached(spark, sf_dir)
    return (
        _close_ranks(man.join(cleaned, "doc_id").where(F.col("kept_tokens") > 0))
        .select(
            "doc_id",
            "split",
            "shard",
            "pos",
            "n_tokens",
            "kept_tokens",
            "removed_tokens",
        )
        .orderBy("split", "shard", "pos")
    )


def logreg_staleness_report(spark, sf_dir: str) -> DataFrame:
    """Classifier STALENESS report — the model rung's entry in the
    when-to-refit story (``ann_ladder_staleness_report`` audits the ANN
    rungs; a trained scorer decays the same way): weights fitted on the
    historical 90% base slice (the STALE artifact a nightly pipeline
    would keep serving) vs weights fitted on everything, both scoring
    ALL documents. Per label: prediction flips and the drift in exact
    quantized score mass — integer columns only, so the audit is
    order-independent.

    Unlike the per-row artifacts (postings, signatures, codes — whose
    maintenance is exact by construction), GD weights are TRAINED state:
    arrivals shift the gradient and the stored weights silently drift.
    This report prices that drift; the cutoff for refitting is a read of
    this table, not a guess.

    Scale shape: two fixed GD fits (three aggregates each — the stale
    fit aggregates only the base slice) + ONE joint scoring pass with
    both 1-row weight frames broadcast, reduced to a two-row audit.
    
    Measured (r10): 4.8 s at sf0.1 (best-of-2, noop sink).
    """
    # full-corpus feats + fresh fit from the session artifact memo; the
    # stale fit (base slice) is this report's own cost and re-fits
    feats, fresh = _logreg_artifacts(spark, sf_dir)
    ids = feats.select("doc_id").distinct()
    n = ids.count()
    n_base = n - n // 10
    cut = ids.orderBy("doc_id").limit(n_base).agg(F.max("doc_id")).first()[0]

    stale = logreg_fit(feats.where(F.col("doc_id") <= F.lit(cut))).select(
        *[F.col(f"w{j}").alias(f"v{j}") for j in (1, 2, 3, 4)]
    )
    scored = (
        feats.withColumn("_k", F.lit(1))
        .join(F.broadcast(fresh.withColumn("_k", F.lit(1))), "_k")
        .join(F.broadcast(stale.withColumn("_k", F.lit(1))), "_k")
    )
    wf = {j: F.col(f"w{j}") for j in (1, 2, 3, 4)}
    ws = {j: F.col(f"v{j}") for j in (1, 2, 3, 4)}
    pf = F.lit(1.0) / (F.lit(1.0) + F.exp(-_logreg_z(wf)))
    ps = F.lit(1.0) / (F.lit(1.0) + F.exp(-_logreg_z(ws)))
    return (
        scored.select(
            F.col("y").alias("label"),
            ((pf >= F.lit(0.5)) != (ps >= F.lit(0.5))).cast("int").alias("flip"),
            F.round(pf * F.lit(1.0e6)).cast("bigint").alias("qf"),
            F.round(ps * F.lit(1.0e6)).cast("bigint").alias("qs"),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("flip").cast("bigint").alias("n_pred_flips"),
            F.sum("qf").cast("bigint").alias("sum_q_fresh"),
            F.sum("qs").cast("bigint").alias("sum_q_stale"),
        )
        .orderBy("label")
    )


def training_manifest_full_pipeline(spark, sf_dir: str) -> DataFrame:
    """The FULL production manifest — every proven gate composed in the
    order a DCLM/FineWeb-style pipeline actually ships (VERDICT r11 #1:
    gate composition is where real pipelines break, and the solo proofs
    can't catch a wrong composition):

      heuristic gates + exact-dup keep (``doc_filter_pipeline``)
      → near-dup keep-best within content clusters → cluster-keyed
      split → shard assignment                      [the base manifest]
      → eval-decontamination removal (train docs sharing rare winnow
        fingerprints with val/test)                 [``_contam_train_ids``]
      → calibration-driven quality gate (train docs at or below the
        chosen decile edge)                         [``_quality_low_train_ids``]
      → substring-span rewrite (kept/removed token accounting; docs
        whose every token sat in a duplicated span drop)
      → positions close ranks ONCE.

    The composition decisions the solo rows leave open, fixed here and
    pinned by tests/test_functions.py:

    - the QUALITY cutoff sees ORIGINAL text (scores, calibration table,
      and threshold are all computed pre-span-clean): gates choose WHICH
      docs ship, the span rewrite then decides WHAT of each doc ships —
      the Lee et al. ACL'22 ordering the span-cleaned row already
      follows, now explicit across all gates;
    - both removal sets are doc_id sets whose membership reads only
      gate-invariant columns (split never changes across gates; the
      calibration is manifest-independent), so applying them in any
      order — or at once, as here — yields the same surviving set as
      running the solo gates sequentially (the pytest pins composed ≡
      sequential);
    - positions close ranks once at the end, which equals closing after
      each gate (row_number over the stored-pos order is order-
      preserving under removal — see ``_close_ranks``), so a 100 TB run
      rewrites each touched shard file once, not once per gate.

    Token accounting flows through every row: ``n_tokens`` (original) =
    ``kept_tokens`` + ``removed_tokens`` (conservation, pinned), and the
    manifest's total kept_tokens is what the training job actually sees.

    Scale shape: strictly additive over its proven parts — the manifest
    chain plus three removal-set builders, composed by doc_id-keyed
    anti/inner joins and ONE rank-close window. Nothing new shuffles.

    Measured (r12): 16.20 s cold at sf0.1 (scale probe, best-of-2
    noop), α 0.34 at 8× — additive over the same session's parts (the
    span-cleaned chain 11.63 s / α 0.30 + the quality gate's ~2.5 s +
    the decontamination arm's ~2 s), and α lands exactly in the
    manifest-chain band: composing the gates added no scale term
    (SCALE.md).
    """
    return _gateset_v1_frame(spark, sf_dir).orderBy("split", "shard", "pos")


def _gateset_v1_frame(spark, sf_dir: str) -> DataFrame:
    """The composed v1 (full-pipeline) manifest frame, session-cached
    (r14): the SAME stored-artifact regime ``_full_manifest`` already
    models for the base manifest — the version diff READS the stored v1
    manifest in production, it does not re-run the pipeline — so the
    full-pipeline query and the version diff consume one checkpointed
    frame per session. The gate sets it composes come from their own
    stored-set memos (``_gate_artifact_cached``)."""

    def build() -> DataFrame:
        man = _full_manifest(spark, sf_dir)
        cleaned = _span_accounting_cached(spark, sf_dir)
        contam = _gate_artifact_cached(
            spark, sf_dir, "contam_ids",
            lambda: _contam_train_ids(spark, sf_dir, man),
        )
        low = _gate_artifact_cached(
            spark, sf_dir, "quality_low_ids",
            lambda: _quality_low_train_ids(spark, sf_dir, man),
        )
        gated = (
            man.join(contam, "doc_id", "anti")
            .join(low, "doc_id", "anti")
            .join(cleaned, "doc_id")
            .where(F.col("kept_tokens") > 0)
        )
        return _close_ranks(gated).select(
            "doc_id",
            "split",
            "shard",
            "pos",
            "n_tokens",
            "kept_tokens",
            "removed_tokens",
        )

    return _gate_artifact_cached(spark, sf_dir, "fullpipe_v1", build)


def _repetition_fail_train_ids(spark, sf_dir: str, man: DataFrame) -> DataFrame:
    """The v2 gate set's NEW removal set: train-split doc_ids whose
    Gopher repetition verdict is not 'keep'. Like the decontamination
    and quality sets, membership reads only gate-invariant inputs — the
    repetition fractions are computed from ORIGINAL text (the same
    gates-see-original convention the quality gate fixed in the full
    pipeline) and the split column never changes across gates — so the
    set is identical against the base manifest or any gated
    descendant, which is what lets v2 compose it with the proven v1
    gates in one pass."""
    fail = (
        _repetition_verdicts_cached(spark, sf_dir)
        .where(F.col("verdict") != "keep")
        .select("doc_id")
    )
    return (
        man.where(F.col("split") == "train").select("doc_id").join(fail, "doc_id")
    )


def training_manifest_gatesetv2(spark, sf_dir: str) -> DataFrame:
    """GATE SET v2 — the versioned evolution of the full-pipeline
    manifest (VERDICT r12 #4): the v1 gate set
    (``training_manifest_full_pipeline``: heuristic + exact-dup +
    keep-best + decontamination + quality + span rewrite) PLUS the
    Gopher repetition gate (``doc_repetition_filter`` at the published
    thresholds, train split only — eval splits are never gated, the
    same convention as the decontamination and quality sets).

    This is the most common real event in a curation pipeline's life —
    a new gate ships — done the way production does it: as a NEW
    manifest version beside the old one. v1 stays registered, untouched
    and hash-green; v2 composes the new removal set through the same
    anti-join + close-ranks-once tail, so the proven v1 artifacts shift
    by exactly the new gate's removals and nothing else.
    tests/test_functions.py pins that identity: v2's removed set vs v1
    IS v1's train-split survivors failing the repetition gate, and v2
    ≡ the repetition gate applied sequentially to v1's output (ranks
    re-closing once more — the ``_close_ranks`` idempotence the full
    pipeline already proved).

    Scale shape: v1's plan plus ONE more corpus-linear gate family
    (``doc_gopher_repetition``'s three word-count chains, measured 3.4 s
    / α 0.04 solo at sf0.1 in r12) and one more broadcast-sized
    anti-join; the rank close still runs once.
    """
    man = _full_manifest(spark, sf_dir)
    cleaned = _span_accounting_cached(spark, sf_dir)
    contam = _gate_artifact_cached(
        spark, sf_dir, "contam_ids",
        lambda: _contam_train_ids(spark, sf_dir, man),
    )
    low = _gate_artifact_cached(
        spark, sf_dir, "quality_low_ids",
        lambda: _quality_low_train_ids(spark, sf_dir, man),
    )
    rep_fail = _gate_artifact_cached(
        spark, sf_dir, "repetition_fail_ids",
        lambda: _repetition_fail_train_ids(spark, sf_dir, man),
    )
    gated = (
        man.join(contam, "doc_id", "anti")
        .join(low, "doc_id", "anti")
        .join(rep_fail, "doc_id", "anti")
        .join(cleaned, "doc_id")
        .where(F.col("kept_tokens") > 0)
    )
    return (
        _close_ranks(gated)
        .select(
            "doc_id",
            "split",
            "shard",
            "pos",
            "n_tokens",
            "kept_tokens",
            "removed_tokens",
        )
        .orderBy("split", "shard", "pos")
    )


def manifest_gateset_version_diff(spark, sf_dir: str) -> DataFrame:
    """The MIGRATION REPORT an operator reads before flipping manifest
    versions — every v1 (full-pipeline) row attributed by its fate
    under gate set v2, aggregated per (split, shard, fate):

    - ``fate = 'kept'`` — the row survives into v2 (all non-train rows
      by construction, plus train rows passing the repetition gate);
    - ``fate = <rung>`` — the FIRST failing Gopher rung
      (``doc_repetition_filter``'s verdict) that removes the train row.

    Columns: n_docs plus sum_kept_tokens — the training tokens each new
    rung costs, and where (the shard-level view is what decides whether
    the version flip needs shard rebalancing). Per-group totals must
    reconcile exactly with v1 and v2 row counts
    (``tests/test_functions.py`` pins Σ n_docs = |v1| per (split,
    shard) and the 'kept' rows ≡ v2).

    Scale shape: one inner join of two proven artifacts on doc_id and
    one bounded aggregate (≤ |splits| × |shards| × 9 fate groups ≤ a
    few hundred rows at any corpus size) — the diff never materializes
    doc-level output.
    """
    # the STORED v1 manifest and the STORED repetition verdict table —
    # the migration report reads both artifacts, it re-runs neither (r14)
    v1 = _gateset_v1_frame(spark, sf_dir)
    rep = _repetition_verdicts_cached(spark, sf_dir)
    fate = (
        F.when(
            (F.col("split") != "train") | (F.col("verdict") == "keep"),
            F.lit("kept"),
        )
        .otherwise(F.col("verdict"))
        .alias("fate")
    )
    return (
        v1.join(rep, "doc_id")
        .groupBy("split", "shard", fate)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("kept_tokens").alias("sum_kept_tokens"),
        )
        .orderBy("split", "shard", "fate")
    )
