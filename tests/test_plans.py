"""Plan-shape tests: the scale properties the engine depends on.

Wrong plans are 100 TB bugs even when answers are right: a lost pushdown
re-reads the world; a lost broadcast shuffles a fact table; a lost
column-pruning reads 10× the bytes. Lock them in.
"""

from __future__ import annotations

from aws_saas_etl_spark.operators.relational import (
    local_supplier_volume,
    pricing_summary,
    shipping_priority,
)
from aws_saas_etl_spark.plans import inspect as PI
from tests.conftest import SF_SMOKE


def test_q1_pushes_shipdate_filter(spark):
    df = pricing_summary(spark, SF_SMOKE)
    PI.assert_filter_pushed(df, "l_shipdate")


def test_q1_prunes_unused_columns(spark):
    df = pricing_summary(spark, SF_SMOKE)
    lineitem_cols = {"l_quantity", "l_extendedprice", "l_discount", "l_tax"}
    PI.assert_scan_pruned(
        df,
        table_cols=lineitem_cols,
        must_not_read={"l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"},
    )


def test_q1_single_aggregation_shuffle(spark):
    # partial agg map-side -> one exchange on the grouping keys -> final agg
    df = pricing_summary(spark, SF_SMOKE)
    assert PI.count_shuffles(df) <= 2  # agg exchange + orderBy range exchange


def test_q3_broadcasts_dimension_side(spark):
    df = shipping_priority(spark, SF_SMOKE)
    assert PI.count_broadcast_joins(df) >= 1


def test_q5_broadcasts_bounded_dims(spark):
    df = local_supplier_volume(spark, SF_SMOKE)
    # region⋈nation, supplier, and the nation_in_region join are broadcast
    assert PI.count_broadcast_joins(df) >= 2


def test_q1_runs_in_wholestage_codegen(spark):
    df = pricing_summary(spark, SF_SMOKE)
    assert len(PI.wholestage_codegen_ids(df)) >= 1


def test_doc_queries_prune_text_table(spark):
    from aws_saas_etl_spark.operators.textops import doc_token_frequencies

    df = doc_token_frequencies(spark, SF_SMOKE)
    # token frequency needs only `text`; doc metadata must not be read
    PI.assert_scan_pruned(
        df,
        table_cols={"text"},
        must_not_read={"lang", "source", "n_chars", "doc_id"},
    )


def test_growing_dim_broadcast_is_threshold_driven(spark):
    """part/supplier joins carry NO forced broadcast hint: at tiny SF the
    size threshold still picks broadcast, but disabling the threshold must
    flip the plan to a shuffle join — proving the engine can fall back at
    sf100+ where a forced hint would OOM the driver."""
    from aws_saas_etl_spark.operators.relational import supplier_diversity_per_brand

    df = supplier_diversity_per_brand(spark, SF_SMOKE)
    assert PI.count_broadcast_joins(df) >= 1  # threshold-chosen at smoke SF

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df_big = supplier_diversity_per_brand(spark, SF_SMOKE)
        # No hint ⇒ the planner CAN choose shuffle when stats say too big.
        assert PI.count_broadcast_joins(df_big) == 0
        assert PI.count_sortmerge_joins(df_big) >= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_fixed_dims_still_hinted_under_disabled_threshold(spark):
    """region/nation (fixed 5/25 rows at ANY scale factor) keep their
    explicit hints: they must broadcast even with the threshold off."""
    from aws_saas_etl_spark.operators.relational import min_cost_supplier_per_nation

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = min_cost_supplier_per_nation(spark, SF_SMOKE)
        assert PI.count_broadcast_joins(df) >= 1  # nation hint survives
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_knn_broadcasts_query_side(spark):
    from aws_saas_etl_spark.operators.similarity import knn_bruteforce

    df = knn_bruteforce(spark, SF_SMOKE)
    plan = PI.physical_plan(df)
    assert "Broadcast" in plan  # query vectors broadcast, corpus streams


def test_market_share_pushes_ptype_filter(spark):
    from aws_saas_etl_spark.operators.relational import market_share_by_year

    df = market_share_by_year(spark, SF_SMOKE)
    PI.assert_filter_pushed(df, "p_type")


def test_exclusively_late_avoids_fact_self_join(spark):
    # The agg reformulation of Q21 must not re-shuffle lineitem for each
    # correlated EXISTS: the whole plan needs few exchanges, not the 5+ a
    # literal double-self-join would produce.
    from aws_saas_etl_spark.operators.relational import exclusively_late_suppliers

    df = exclusively_late_suppliers(spark, SF_SMOKE)
    assert PI.count_shuffles(df) <= 5


def test_resample_locf_bounded_window(spark):
    """The LOCF fill must run over the manufactured hourly grid (bounded
    by span÷step × users), never over raw events — the plan's window sits
    above the grid join, and events collapse through partial aggregation
    first (hash aggregate below the first exchange)."""
    from aws_saas_etl_spark.operators.events import events_resample_locf

    df = events_resample_locf(spark, SF_SMOKE)
    plan = PI.physical_plan(df)
    assert "Generate explode" in plan or "Generate" in plan  # sequence grid
    assert PI.count_shuffles(df) <= 6


def test_repetition_metrics_prunes_doc_metadata(spark):
    from aws_saas_etl_spark.operators.textops import doc_repetition_metrics

    df = doc_repetition_metrics(spark, SF_SMOKE)
    PI.assert_scan_pruned(
        df,
        table_cols={"doc_id", "text"},
        must_not_read=set(),
    )


def test_sequence_packing_no_global_window(spark):
    """Packing must cumsum per shard, not globally: no single-partition
    exchange (Exchange SinglePartition) may appear in the plan."""
    from aws_saas_etl_spark.operators.textops import doc_sequence_packing

    df = doc_sequence_packing(spark, SF_SMOKE)
    plan = PI.physical_plan(df)
    assert "SinglePartition" not in plan, plan


def test_per_group_sample_uses_window_group_limit(spark):
    """The per-group top-k-by-hash must run as WindowGroupLimit
    (Partial map-side + Final), never a full per-group sort: no executor
    may materialize a whole group at 100 TB."""
    from aws_saas_etl_spark.operators.sampling import events_per_type_sample

    df = events_per_type_sample(spark, SF_SMOKE)
    plan = PI.physical_plan(df)
    assert "WindowGroupLimit" in plan, plan
    assert "Partial" in plan.split("WindowGroupLimit", 1)[1] or plan.count(
        "WindowGroupLimit"
    ) >= 2


def test_deciles_have_no_global_sort(spark):
    """Quantile bucketing must not ntile-sort the table in one partition:
    the only single-partition stage is the 1-row percentile aggregate."""
    from aws_saas_etl_spark.operators.sampling import customer_balance_deciles

    df = customer_balance_deciles(spark, SF_SMOKE)
    plan = PI.physical_plan(df)
    assert " ntile(" not in plan.lower()  # no NTile window anywhere
    # the bucket assignment itself adds no exchange beyond the 1-row
    # percentile aggregate + final groupBy
    assert PI.count_shuffles(df) <= 4


def test_runtime_bloom_filter_injected_for_selective_join(spark):
    """Runtime row-level filtering — the 100 TB fact-scan pruner: when a
    dim side carries a selective filter and the fact side is large, Spark
    injects bloom_filter_agg on the dim and might_contain on the fact scan,
    so fact rows that cannot join die at the scan instead of shuffling.
    Local fixtures sit under the default 10 GB application-side threshold,
    so the test lowers it to 0 (prod keeps the default: injection arms
    itself exactly when the scan is big enough to matter)."""
    from aws_saas_etl_spark.catalog import load_tables
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        # force a shuffle join: broadcast joins don't need the runtime filter
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        t = load_tables(spark, SF_SMOKE)
        dim = t.orders.where(F.col("o_orderpriority") == "1-URGENT").select(
            "o_orderkey"
        )
        fact = t.lineitem.join(
            dim, F.col("l_orderkey") == F.col("o_orderkey")
        ).agg(F.sum("l_quantity").alias("sum_qty"))
        plan = fact._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan, "no bloom filter on creation side"
        assert "might_contain" in plan, "no runtime filter on application side"
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_table_profile_has_no_expand(spark):
    """Multi-column exact distinct must NOT plan as one Expand (rows ×
    n_distinct_cols — a 7× table blowup at 100 TB): each distinct column
    runs its own two-phase partial-dedup aggregate over a pruned
    single-column scan, broadcast back onto the stats row."""
    from aws_saas_etl_spark.operators.etl import table_profile

    df = table_profile(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan, "profiler re-introduced the multi-distinct Expand"
    assert plan.count("BroadcastNestedLoopJoin") >= 1  # 1-row stat joins


def test_pointintime_join_is_equi_keyed(spark):
    """The PIT interval join must extract user_id as the join key (hash or
    sort-merge with the interval test as residual) — never a
    BroadcastNestedLoopJoin/cartesian over the range predicate, which is
    the quadratic trap for interval joins at scale."""
    from aws_saas_etl_spark.operators.events import events_pointintime_join

    plan = (
        events_pointintime_join(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_partition_pruned_scan(spark):
    """The date-partitioned rollup's scan must carry PartitionFilters on
    event_date — whole directories skipped at planning, no file opened
    outside the trailing week. (STATIC pruning: the cutoff is a literal.)"""
    from aws_saas_etl_spark.operators.events import (
        events_partition_pruned_rollup,
    )

    df = events_partition_pruned_rollup(spark, SF_SMOKE)
    plan = PI.physical_plan(df)
    assert "PartitionFilters" in plan, plan
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
    assert "event_date" in pf and (">=" in pf), pf
    # and the rollup's values must match the flat-table path exactly
    from aws_saas_etl_spark.catalog import load_tables
    from pyspark.sql import functions as F

    ev = load_tables(spark, SF_SMOKE).events.na.drop(subset=["ts"])
    got = {(r.event_type, r.n_events) for r in df.collect()}
    last = ev.agg(F.max(F.to_date("ts"))).collect()[0][0]
    flat = {
        (r.event_type, r.n)
        for r in ev.where(
            F.to_date("ts") >= F.lit(last) - F.expr("INTERVAL 6 DAYS")
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == flat


def test_dynamic_partition_pruning_on_partitioned_events(spark):
    """DYNAMIC partition pruning on the same layout: when the date filter
    arrives through a JOINED dim (not a literal), Spark must inject a
    runtime dynamicpruning subquery into the fact scan's PartitionFilters
    — the mechanism that keeps star-schema joins from scanning every
    partition at 100 TB."""
    import os

    from pyspark.sql import functions as F

    from aws_saas_etl_spark.operators.events import (
        events_partition_pruned_rollup,
    )
    from aws_saas_etl_spark.sources.custom import proc_dir

    # ensure the partitioned copy exists (the rollup writes it once)
    events_partition_pruned_rollup(spark, SF_SMOKE).take(1)
    path = proc_dir("events_by_date", SF_SMOKE)
    part = spark.read.parquet(path)
    dim_path = os.path.join(proc_dir("events_date_dim", SF_SMOKE), "dim")
    if not os.path.exists(os.path.join(dim_path, "_SUCCESS")):
        dates = part.select("event_date").distinct()
        cut = dates.agg(F.max("event_date").alias("mx"))
        (
            dates.crossJoin(F.broadcast(cut))
            .select(
                "event_date",
                # a string-comparison predicate, not a bare boolean column:
                # PartitionPruning only fires when the dim side carries a
                # "likely selective" filter (comparison/In/like), and a
                # boolean attribute reference does not qualify
                F.when(
                    F.to_date("event_date")
                    >= F.to_date("mx") - F.expr("INTERVAL 6 DAYS"),
                    F.lit("recent"),
                )
                .otherwise(F.lit("old"))
                .alias("tag"),
            )
            .write.mode("overwrite")
            .parquet(dim_path)
        )
    dim = spark.read.parquet(dim_path).where(F.col("tag") == "recent")
    joined = part.join(dim.select("event_date"), "event_date").groupBy(
        "event_type"
    ).count()
    plan = PI.physical_plan(joined)
    assert "dynamicpruning" in plan.lower(), plan


def test_bucketed_join_has_no_join_side_exchange(spark):
    """The bucketed co-located join must read matching buckets directly:
    no Exchange between either table scan and the SortMergeJoin — the
    ONLY shuffle in the plan is the final aggregation's. The unbucketed
    twin of the same query needs join-side exchanges, pinning that the
    saving comes from the layout, not the query shape."""
    from pyspark.sql import functions as F

    from aws_saas_etl_spark.catalog import load_tables
    from aws_saas_etl_spark.functions.num import dsum_rounded
    from aws_saas_etl_spark.operators.relational import (
        bucketed_colocated_join,
    )

    df = bucketed_colocated_join(spark, SF_SMOKE)
    plan = PI.physical_plan(df)
    assert "SortMergeJoin" in plan, plan
    n_shuffles = plan.count("Exchange hashpartitioning")
    assert n_shuffles == 1, plan  # only the groupBy aggregation

    t = load_tables(spark, SF_SMOKE)
    plain = (
        t.lineitem.join(
            t.orders.hint("merge"),
            t.lineitem["l_orderkey"] == t.orders["o_orderkey"],
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum_rounded(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 2
            ).alias("revenue"),
        )
    )
    plain_shuffles = PI.physical_plan(plain).count("Exchange hashpartitioning")
    assert plain_shuffles >= 3, plain_shuffles  # both join sides + agg
    # same values either way: bucketing is layout, not semantics
    assert sorted(map(tuple, df.collect())) == sorted(
        map(tuple, plain.orderBy("o_orderpriority").collect())
    )
