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

from contextlib import contextmanager

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
    database. Requires the JDBC driver jar on the classpath; tested here
    against embedded Derby (bundled with Spark), the same code path a
    Postgres driver jar would take in production."""
    return spark.read.jdbc(url, table, properties=properties or {})


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    properties: dict[str, str] | None = None,
    column_types: str | None = None,
) -> None:
    """JDBC sink (S6 write side): each partition opens a connection and
    batch-inserts its rows — parallel across executors. For a metadata
    plane (small tables) this is fine; bulk data belongs in Parquet.

    ``column_types`` ("name TYPE, ...") overrides Spark's default DDL type
    mapping — e.g. Derby maps StringType to CLOB, which cannot be compared
    or pushed down; declare VARCHAR columns instead."""
    writer = df.write
    if column_types:
        writer = writer.option("createTableColumnTypes", column_types)
    writer.jdbc(url, table, mode=mode, properties=properties or {})


# --- Object-store (s3a) configuration -------------------------------------

# The reference's storage IS S3 (reference app.py:47-62, etl_core.py:22-27).
# Every reader/writer above is path-scheme-agnostic: pass "s3a://bucket/key"
# and the same code runs against object storage, provided the session was
# built with these settings and the hadoop-aws + aws-sdk jars are on the
# classpath (spark.jars.packages=org.apache.hadoop:hadoop-aws:<hadoop ver>).
# This container ships no hadoop-aws jar, so the integration test is gated;
# the config contract is pinned here and exercised by the gated test.
def s3a_conf(
    endpoint: str | None = None,
    path_style_access: bool = False,
    anonymous: bool = False,
) -> dict[str, str]:
    """Session config for s3a:// I/O (pass to ``get_spark(extra_conf=...)``).

    ``endpoint``/``path_style_access`` support S3-compatible stores
    (MinIO, localstack); ``anonymous`` reads public buckets without
    credentials. Defaults use the provider-chain (env vars, instance
    profile) exactly like the reference's boto3 client (app.py:41-45).
    """
    conf = {
        "spark.hadoop.fs.s3a.impl": "org.apache.hadoop.fs.s3a.S3AFileSystem",
        # Parquet-friendly: random-access reads instead of full-object GETs
        "spark.hadoop.fs.s3a.experimental.input.fadvise": "random",
        # commit via task-attempt directories, not O(n) S3 renames
        "spark.hadoop.fs.s3a.committer.name": "directory",
        "spark.sql.sources.commitProtocolClass": (
            "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
        ),
        "spark.sql.parquet.output.committer.class": (
            "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"
        ),
    }
    if endpoint:
        conf["spark.hadoop.fs.s3a.endpoint"] = endpoint
    if path_style_access:
        conf["spark.hadoop.fs.s3a.path.style.access"] = "true"
    if anonymous:
        conf["spark.hadoop.fs.s3a.aws.credentials.provider"] = (
            "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider"
        )
    return conf


# --- Small-file compaction --------------------------------------------------

TARGET_FILE_BYTES = 128 * 1024 * 1024  # the canonical HDFS/S3 target size


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
    partition_cols: list[str] | None = None,
) -> int:
    """Compact a small-file parquet directory into ~target-sized files,
    returning the output file count. Streaming sinks, per-batch upserts,
    and over-parallel writes all accrete kilobyte files; at 100 TB the
    resulting open/seek storm dominates scan time (and S3 LIST cost), so
    compaction is periodic maintenance, not an optimization.

    The file count derives from the ACTUAL on-disk byte size (Hadoop
    FileSystem listing — no data pass), and the rewrite is one
    round-robin repartition: even output sizes, a single narrow-input
    shuffle, no driver materialization. Row order is not preserved
    (parquet directories carry no order contract).

    With ``partition_cols`` the Hive layout is PRESERVED: rows hash-
    repartition on the partition key so each key lands wholly in one
    task, and the partitioned rewrite therefore emits exactly ONE file
    per partition directory — per-partition compaction, the maintenance
    a partitioned store schedules after deletion waves leave shrunken
    multi-file partitions behind (``manifest_store_compaction``).
    """
    import math

    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hconf = jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(src)
    fs = hpath.getFileSystem(hconf)
    total = fs.getContentSummary(hpath).getLength()
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src)
    if partition_cols:
        (
            df.repartition(n_files, *partition_cols)
            .write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(dst)
        )
    else:
        df.repartition(n_files).write.mode("overwrite").parquet(dst)
    it = fs.listFiles(jvm.org.apache.hadoop.fs.Path(dst), True)
    n_out = 0
    while it.hasNext():
        if it.next().getPath().getName().endswith(".parquet"):
            n_out += 1
    return n_out


# --- Partitioned writes (dynamic overwrite) ---------------------------------


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    dynamic: bool = True,
) -> None:
    """Hive-style partitioned parquet write. With ``dynamic=True`` an
    overwrite replaces ONLY the partitions present in ``df`` — the
    incremental-reload path (reprocess one day, leave the other 3 years
    of partitions untouched). Static overwrite (the Spark default) would
    silently truncate the whole table first — at 100 TB that is the
    difference between rewriting 100 GB and rewriting everything.

    Partition pruning on read (WHERE on a partition column skips whole
    directories) is plan-tested in tests/test_plans.py.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic" if dynamic else "static")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_csv_with_corrupt_capture(
    spark: SparkSession,
    path: str,
    schema_ddl: str,
    header: bool = True,
) -> DataFrame:
    """CSV scan that CAPTURES malformed rows instead of silently nulling
    or dropping them (S1 hardened): PERMISSIVE mode with an explicit
    ``_corrupt_record`` column holding each unparseable line verbatim.

    The reference fails the whole job on any surprise (app.py:187-189
    rolls back on the first exception); a 100 TB ingest can't — bad rows
    are quarantined to a side output (filter on ``_corrupt_record IS NOT
    NULL``) and the clean rows proceed. Spark requires the corrupt
    column declared in the schema; caching the raw scan around the two
    filters avoids the known re-parse pitfall where the corrupt column
    appears null after pushdown.

    CONTRACT: the returned DataFrame is ``.cache()``-ed (that is what
    makes the clean/quarantine split consistent) — the caller MUST call
    ``.unpersist()`` once both side outputs are materialized, or use the
    :func:`csv_with_corrupt_capture` context manager below, which
    unpersists on exit. In a long-lived session, un-released ingests
    accumulate cached partitions.
    """
    schema = f"{schema_ddl}, _corrupt_record STRING"
    return (
        spark.read.option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(schema)
        .csv(path)
        .cache()
    )


@contextmanager
def csv_with_corrupt_capture(
    spark: SparkSession,
    path: str,
    schema_ddl: str,
    header: bool = True,
):
    """Context-managed variant of :func:`read_csv_with_corrupt_capture`:
    yields the cached scan and guarantees ``unpersist()`` on exit, so the
    caller-must-unpersist contract can't be forgotten in long-lived
    sessions::

        with csv_with_corrupt_capture(spark, path, ddl) as raw:
            clean = raw.filter("_corrupt_record IS NULL").drop("_corrupt_record")
            bad   = raw.filter("_corrupt_record IS NOT NULL")
            ...  # materialize both side outputs here
    """
    df = read_csv_with_corrupt_capture(spark, path, schema_ddl, header=header)
    try:
        yield df
    finally:
        df.unpersist()
