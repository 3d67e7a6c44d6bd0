"""Data-quality validation + snapshot diff (pipeline trust operators).

The reference's only "validation" is one required-column check before the
ETL body (reference app.py:167-168, etl_core.py:61-63). A pipeline that
feeds a 100 TB training run needs the generalization: declarative
constraint checks (nulls, ranges, enum membership, referential
integrity) evaluated in bulk BEFORE data is trusted, and a CDC-style
snapshot diff that explains what changed between two loads.

Scale shapes:
- scalar constraints on one table fold into a SINGLE aggregate pass
  (count + conditional sums share the scan — no per-constraint rescans);
- referential checks are left-anti joins on the key (shuffle of keys
  only, AQE-broadcast when the parent's key set is small);
- the snapshot diff is one full-outer join on the primary key, the same
  join MERGE plans under the hood (operators/jobs.py:merge_upsert).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_saas_etl_spark.catalog import load_tables

VALID_ORDER_STATUS = ("O", "F", "P")


def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-violation report across the star schema: one row per
    declared constraint with checked/violation counts.

    Constraints (the standard expectation families):
      not_null, range (between), enum membership, uniqueness of a key,
      referential integrity child→parent.
    """
    t = load_tables(spark, sf_dir)
    li = t.lineitem
    # scalar constraints on lineitem share ONE scan/aggregate
    li_checks = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("l_quantity") < 1).cast("long")).alias("qty_low"),
        F.sum((F.col("l_quantity") > 50).cast("long")).alias("qty_high"),
        F.sum(
            ((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)).cast("long")
        ).alias("disc_range"),
        F.sum(F.col("l_shipdate").isNull().cast("long")).alias("ship_null"),
    )
    li_rows = li_checks.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("lineitem").alias("table_name"),
                    F.lit("l_quantity_min_1").alias("constraint_name"),
                    F.col("n").alias("n_checked"),
                    F.col("qty_low").alias("n_violations"),
                ),
                F.struct(
                    F.lit("lineitem").alias("table_name"),
                    F.lit("l_quantity_max_50").alias("constraint_name"),
                    F.col("n").alias("n_checked"),
                    F.col("qty_high").alias("n_violations"),
                ),
                F.struct(
                    F.lit("lineitem").alias("table_name"),
                    F.lit("l_discount_range").alias("constraint_name"),
                    F.col("n").alias("n_checked"),
                    F.col("disc_range").alias("n_violations"),
                ),
                F.struct(
                    F.lit("lineitem").alias("table_name"),
                    F.lit("l_shipdate_not_null").alias("constraint_name"),
                    F.col("n").alias("n_checked"),
                    F.col("ship_null").alias("n_violations"),
                ),
            )
        ).alias("e")
    ).select("e.*")

    orders = t.orders
    ord_checks = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("o_totalprice") <= 0).cast("long")).alias("price_pos"),
        F.sum(
            (~F.col("o_orderstatus").isin(*VALID_ORDER_STATUS)).cast("long")
        ).alias("status_enum"),
    )
    ord_rows = ord_checks.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("orders").alias("table_name"),
                    F.lit("o_totalprice_positive").alias("constraint_name"),
                    F.col("n").alias("n_checked"),
                    F.col("price_pos").alias("n_violations"),
                ),
                F.struct(
                    F.lit("orders").alias("table_name"),
                    F.lit("o_orderstatus_enum").alias("constraint_name"),
                    F.col("n").alias("n_checked"),
                    F.col("status_enum").alias("n_violations"),
                ),
            )
        ).alias("e")
    ).select("e.*")

    # uniqueness: primary-key duplicate count (rows beyond the first per key)
    dup_custkeys = (
        t.customer.groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.lit("customer").alias("table_name"),
            F.lit("c_custkey_unique").alias("constraint_name"),
            F.sum("c").alias("n_checked"),
            F.sum(F.col("c") - 1).alias("n_violations"),
        )
    )

    # referential integrity: child keys with no parent (left anti join —
    # only keys shuffle; AQE broadcasts the smaller distinct-key side).
    # The anti-join emits ONLY violations; n_checked comes from a separate
    # count of the child table, attached via a 1-row cross join.
    orphan_orders = orders.agg(
        F.lit("orders").alias("table_name"),
        F.lit("o_custkey_fk_customer").alias("constraint_name"),
        F.count(F.lit(1)).alias("n_checked"),
    ).crossJoin(
        orders.select("o_custkey")
        .join(
            t.customer.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )

    orphan_lineitems = t.lineitem.agg(
        F.lit("lineitem").alias("table_name"),
        F.lit("l_orderkey_fk_orders").alias("constraint_name"),
        F.count(F.lit(1)).alias("n_checked"),
    ).crossJoin(
        t.lineitem.select("l_orderkey")
        .join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )

    cols = ["table_name", "constraint_name", "n_checked", "n_violations"]
    report = (
        li_rows.select(cols)
        .unionByName(ord_rows.select(cols))
        .unionByName(dup_custkeys.select(cols))
        .unionByName(orphan_orders.select(cols))
        .unionByName(orphan_lineitems.select(cols))
    )
    return report.orderBy("table_name", "constraint_name")


# --- CDC snapshot diff ------------------------------------------------------

# Deterministic "next load" derived from orders so the oracle can rebuild
# it: every 13th key changes price (+10%), every 17th key is deleted,
# and every (13k+1)th key reappears under a fresh negative key.
DIFF_UPDATE_MOD = 13
DIFF_DELETE_MOD = 17


def _snapshot_b(orders: DataFrame) -> DataFrame:
    base = orders.where(F.col("o_orderkey") % DIFF_DELETE_MOD != 0)
    changed = F.when(
        F.col("o_orderkey") % DIFF_UPDATE_MOD == 0,
        F.col("o_totalprice") * F.lit(1.10),
    ).otherwise(F.col("o_totalprice"))
    inserts = orders.where(F.col("o_orderkey") % DIFF_UPDATE_MOD == 1).select(
        (-F.col("o_orderkey")).alias("o_orderkey"),
        "o_custkey",
        F.col("o_orderstatus"),
        "o_totalprice",
    )
    return base.select(
        "o_orderkey", "o_custkey", "o_orderstatus", changed.alias("o_totalprice")
    ).unionByName(inserts)


def orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC between two table snapshots: one full-outer join on the primary
    key classifies every key as inserted / deleted / updated / unchanged,
    aggregated into a per-class summary (count + absolute price delta).

    This is the read side of change capture when the source can't stream
    changes — diff two loads, then feed the classified rows to MERGE
    (operators/jobs.py). One shuffle on the key; no collect.
    """
    from aws_saas_etl_spark.functions.num import dsum_rounded

    orders = load_tables(spark, sf_dir).orders.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    b = _snapshot_b(orders)
    a = orders.alias("a")
    bb = b.alias("b")
    j = a.join(bb, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
    change = (
        F.when(F.col("a.o_orderkey").isNull(), F.lit("inserted"))
        .when(F.col("b.o_orderkey").isNull(), F.lit("deleted"))
        .when(
            F.col("a.o_totalprice") != F.col("b.o_totalprice"), F.lit("updated")
        )
        .otherwise(F.lit("unchanged"))
    )
    delta = F.abs(
        F.coalesce(F.col("b.o_totalprice"), F.lit(0.0))
        - F.coalesce(F.col("a.o_totalprice"), F.lit(0.0))
    )
    return (
        j.select(change.alias("change_type"), delta.alias("price_delta"))
        .groupBy("change_type")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            dsum_rounded(F.col("price_delta"), 2).alias("total_price_delta"),
        )
        .orderBy("change_type")
    )
