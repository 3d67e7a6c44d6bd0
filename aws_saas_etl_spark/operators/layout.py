"""Z-order (Morton) data layout — multi-dimensional clustering for scan
pruning (SURVEY §2b scale ops; the write-side companion of
``sources/io.py:compact_parquet``).

At 100 TB the dominant cost of a selective query is the scan, and the
dominant lever on the scan is LAYOUT: parquet files are skipped from their
footer min/max stats, which only works when rows with nearby key values sit
in the same files. A single-column sort clusters one dimension perfectly
and the others not at all; interleaving the bits of two (or more) grid
coordinates — the Z-order / Morton curve — gives every interleaved
dimension locality at once, which is exactly what Delta/Iceberg OPTIMIZE
ZORDER does. The curve math is pure integer bit ops (built-in expressions,
whole-stage codegen); the write is one range-repartition + in-partition
sort — a single shuffle, no driver materialization, any number of files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aws_saas_etl_spark.catalog import ensure_parallelism, load_tables

Z_BITS = 10  # bits kept per dimension: 2 dims → 20-bit z-value, 1M tiles
Z_GRID = 1 << Z_BITS


def z_value(x: Column, y: Column, bits: int = Z_BITS) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative
    integer columns: bit i of x lands at position 2i, bit i of y at 2i+1.

    Built as an explicit sum of ``2*bits`` disjoint-bit terms — each one
    shift+mask+shift, all JVM-side integer ops; the DuckDB oracle
    regenerates the identical term chain (disjoint bits make + and OR
    equivalent, and + is engine-neutral)."""
    xb = x.cast("bigint")
    yb = y.cast("bigint")
    acc = None
    for i in range(bits):
        tx = F.shiftleft(F.shiftrightunsigned(xb, i).bitwiseAND(F.lit(1)), 2 * i)
        ty = F.shiftleft(F.shiftrightunsigned(yb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        term = tx + ty
        acc = term if acc is None else acc + term
    return acc


def z_value_sql(x: str, y: str, bits: int = Z_BITS) -> str:
    """DuckDB twin of :func:`z_value` — same term chain, same fold order."""
    terms = []
    for i in range(bits):
        terms.append(f"(((CAST({x} AS BIGINT) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((CAST({y} AS BIGINT) >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def write_zordered(
    df: DataFrame, zcol: Column, path: str, n_files: int = 16
) -> None:
    """Write ``df`` clustered along the Z-curve: range-partition on the
    z-value (sampled range bounds → evenly sized files regardless of key
    skew), sort within each partition, drop the helper column. One
    shuffle; footer min/max stats of every interleaved dimension become
    selective, so later scans skip files/row-groups on EITHER dimension."""
    (
        df.withColumn("__z", zcol)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def orders_zorder_index(spark, sf_dir: str) -> DataFrame:
    """Registry query: the Z-order clustering key for ``orders`` on
    (customer, order-day) — the two columns selective order queries filter
    by. Emits the grid coordinates and the interleaved z-value per row,
    plus the coarse tile id (top 8 z-bits) a layout optimizer budgets
    files by. Map-only: one scan, no shuffle, pure integer built-ins.
    """
    orders = ensure_parallelism(load_tables(spark, sf_dir).orders)
    x = F.pmod(F.col("o_custkey"), F.lit(Z_GRID))
    y = F.pmod(
        F.datediff(F.to_date("o_orderdate"), F.to_date(F.lit("1970-01-01"))),
        F.lit(Z_GRID),
    )
    z = z_value(x, y)
    return orders.select(
        "o_orderkey",
        x.cast("bigint").alias("zx"),
        y.cast("bigint").alias("zy"),
        z.alias("zval"),
        F.shiftrightunsigned(z, 2 * Z_BITS - 8).alias("tile_id"),
    )
