"""Iterative graph analytics over relational edges.

Second iterative-algorithm pattern alongside min-label connected
components (operators/dedup.py:connected_components): weighted PageRank
as repeated join + aggregate rounds with localCheckpoint lineage cuts —
the control shape every iterative Spark computation shares (fixed
per-round plan, driver loop, checkpointed state).

The reference has no graph surface at all; the driver's star schema
implies one naturally: the customer↔supplier trade graph induced by
lineitem (who buys through whom), the classic entity-importance input.

Convergence facts (measured on the sf0.1 trade graph — correcting an
earlier note that claimed 6≈12 iterations; that measurement never varied
the count because ``iters=PR_ITERS`` bound the default at def time):

- rank VALUES converge geometrically at rate ``damping`` (0.85/round):
  top rank grows 5.79 (6 iters) → 7.54 (12) → 8.31 (20) → 8.54 (30);
  6-decimal value convergence needs ~100 rounds.
- top-20 ORDER contains sub-1e-3 near-ties that keep swapping until ~30
  rounds; order is only stable once values nearly converge.
- per-round cost at sf0.1 on local[32] has a ~0.4 s floor of fixed stage
  overhead (irrelevant at cluster scale, where rounds are data-bound).

So exact fixpoint output is not a sensible default for a bounded-latency
query. The operator supports both industry shapes: a fixed iteration
budget (deterministic, bench-comparable — GraphX's default shape) and a
``tol``-based early exit probed at checkpoint boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_saas_etl_spark.catalog import load_tables

# Default iteration budget: deterministic bounded-cost approximation.
# Values at k iters undershoot the fixpoint by a factor ~damping^k of the
# remaining mass (see module docstring for the measured profile).
PR_ITERS = 6
PR_DAMPING = 0.85
# checkpoint cadence: each localCheckpoint is an eager job, but it caps
# lineage/plan-compile growth; every 3rd round measured cheapest at sf0.1
PR_CKPT_EVERY = 3
# contributions accumulate in DECIMAL: double sums across shuffle
# partitions are order-dependent, which would make ranks (and the
# resulting top-k ordering) flap between runs of an iterative algorithm
PR_DEC = "decimal(28,12)"


def pagerank(
    edges: DataFrame,
    iters: int | None = None,
    damping: float = PR_DAMPING,
    tol: float | None = None,
    all_nodes_have_in_edges: bool = False,
) -> DataFrame:
    """PageRank over a weighted directed edge list (src, dst, weight) →
    (node, rank).

    Per round: one join (ranks onto out-edges) + one aggregate
    (contributions per dst) — both shuffling on node id — plus, unless
    ``all_nodes_have_in_edges``, a left join against the node set so
    dangling/in-edge-less nodes keep receiving the teleport term. Callers
    whose edge construction guarantees every node an in-edge (e.g. a
    bipartite graph with both edge directions materialized) set the flag
    and save one join per round; output values are identical because the
    dropped branch only coalesces never-occurring NULLs.

    ``iters`` bounds the rounds (resolved from ``PR_ITERS`` at CALL time);
    ``tol`` adds an early exit: at each checkpoint boundary the max
    absolute rank change since the previous checkpoint is computed (one
    scalar aggregate over the small rank table) and iteration stops once
    it drops below ``tol``. Ranks checkpoint every ``PR_CKPT_EVERY``
    rounds so lineage (and plan compile time) stays flat in the iteration
    count.

    Scale: the edge table is normalized ONCE behind a checkpoint barrier
    pre-partitioned on src (checkpointed Datasets keep their output
    partitioning, so the per-round join co-locates against the big side);
    only the one-row-per-node rank table moves each round. Rounds are
    linear in |edges| — the 100 TB cost model of every BSP PageRank.
    """
    if iters is None:
        iters = PR_ITERS
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("out_w"))
    e = (
        edges.join(out_w, "src")
        .select("src", "dst", (F.col("weight") / F.col("out_w")).alias("share"))
        .repartition("src")
        .localCheckpoint()
    )
    if all_nodes_have_in_edges:
        nodes = e.select(F.col("src").alias("node")).distinct().localCheckpoint()
    else:
        nodes = (
            edges.select(F.col("src").alias("node"))
            .union(edges.select(F.col("dst").alias("node")))
            .distinct()
            .localCheckpoint()
        )
    ranks = nodes.select("node", F.lit(1.0).cast(PR_DEC).alias("rank"))
    prev_ckpt = ranks if tol is not None else None
    for i in range(iters):
        contribs = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum((F.col("rank") * F.col("share")).cast(PR_DEC)).alias("inflow"))
        )
        new_rank = (
            F.lit(1.0 - damping)
            + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0).cast(PR_DEC))
        ).cast(PR_DEC)
        if all_nodes_have_in_edges:
            ranks = contribs.select("node", new_rank.alias("rank"))
        else:
            ranks = nodes.join(contribs, "node", "left").select(
                "node", new_rank.alias("rank")
            )
        at_ckpt = (i + 1) % PR_CKPT_EVERY == 0 or i == iters - 1
        if at_ckpt:
            ranks = ranks.localCheckpoint()
            if tol is not None:
                # scalar convergence probe over the (small) rank table:
                # one inner join + max-abs aggregate, only at checkpoints
                delta = (
                    ranks.alias("a")
                    .join(prev_ckpt.alias("b"), "node")
                    .agg(
                        F.max(F.abs(F.col("a.rank") - F.col("b.rank"))).alias("d")
                    )
                    .collect()[0]["d"]
                )
                if delta is not None and float(delta) < tol:
                    break
                prev_ckpt = ranks
    return ranks


def supplier_pagerank(spark: SparkSession, sf_dir: str, top_k: int = 20) -> DataFrame:
    """Registry query: supplier importance in the customer→supplier trade
    graph. Edges: customer c → supplier s weighted by their lineitem
    count (via orders); plus the reverse s → c edges so rank circulates
    in the bipartite graph. Returns the top suppliers by rank after the
    default bounded iteration budget (``PR_ITERS`` — deterministic,
    run-to-run stable; see the module docstring for the measured
    value-convergence profile of deeper budgets).

    The symmetric bipartite construction gives EVERY node an in-edge
    (each c→s edge has its s→c mirror), so the dangling-node join is
    skipped — one join per round instead of two, byte-identical output.

    Value-hash-checked since round 4: the DuckDB oracle
    (``oracles._supplier_pagerank_sql``) replays the decimal update loop
    round-for-round as a recursive CTE, reproducing the bounded-iteration
    output bit-exactly — the loop is PINNED, not just rows-counted.
    Determinism and rank-sanity invariants additionally live in
    tests/test_functions.py.
    """
    t = load_tables(spark, sf_dir)
    trade = (
        t.lineitem.select("l_orderkey", "l_suppkey")
        .join(t.orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    # disjoint id spaces: customers negative, suppliers positive
    c2s = trade.select(
        (-F.col("o_custkey")).alias("src"),
        F.col("l_suppkey").alias("dst"),
        F.col("weight").cast("double").alias("weight"),
    )
    s2c = trade.select(
        F.col("l_suppkey").alias("src"),
        (-F.col("o_custkey")).alias("dst"),
        F.col("weight").cast("double").alias("weight"),
    )
    ranks = pagerank(c2s.unionByName(s2c), all_nodes_have_in_edges=True)
    return (
        ranks.where(F.col("node") > 0)
        .select(
            F.col("node").alias("s_suppkey"),
            F.col("rank").cast("decimal(38,6)").cast("double").alias("pagerank"),
        )
        .orderBy(F.desc("pagerank"), F.asc("s_suppkey"))
        .limit(top_k)
    )
