"""Sources & sinks (SURVEY §2a S1-S7).

The reference reads/writes whole CSV objects on S3 with pandas
(reference etl_core.py:22-27, app.py:47-62). Here every format goes
through Spark's DataFrameReader/Writer, so the same call works on
``file://``, ``s3a://``, ``hdfs://``, ... and scans get predicate pushdown
+ column pruning (Parquet) and schema enforcement (explicit StructType).

Parquet is the engine's at-rest format (partitioned, splittable,
column-pruned); CSV/JSON exist for reference-parity ingestion and export.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
) -> DataFrame:
    """CSV scan (S1/S2 parity). Explicit ``schema`` is strongly preferred:
    inference costs an extra pass and yields nondeterministic widths.

    Reference behavior being replaced: whole-object GET + pandas read_csv
    with inferred dtypes (etl_core.py:22-27).
    """
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    single_file: bool = False,
) -> None:
    """CSV sink (S3 parity).

    ``single_file=True`` reproduces the reference's one-object output
    (app.py:53-62) via ``coalesce(1)`` — an intentional scale ceiling for
    API compatibility only. Operator paths always use the default
    many-part layout.
    """
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", str(header).lower()).csv(path)


def read_json(spark: SparkSession, path: str, schema: StructType | str | None = None) -> DataFrame:
    """JSON-lines scan — the format the reference UI claims but never
    implemented (reference templates/index.html:77; backend parses only
    CSV). Here it is real."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Parquet sink — the engine's at-rest format. ``partition_by`` yields
    directory partitioning (static + dynamic partition pruning on read)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """JDBC scan (S6 parity: the reference's Postgres metadata store,
    reference app.py:34-39). Spark pushes filters/projections to the
    database. Requires the JDBC driver jar on the classpath — callers in
    this container should use the Parquet-backed JobStore instead."""
    return spark.read.jdbc(url, table, properties=properties or {})
