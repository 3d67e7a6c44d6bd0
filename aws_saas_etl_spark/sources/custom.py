"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API).

The reference can only ingest what boto3 hands it as whole CSV objects
(reference app.py:47-50). Spark 4's Python DataSource API is the
engine-native extension point for everything else — paged REST APIs,
proprietary formats, synthetic generators — with real partition
planning: the driver plans N independent partitions, each executor
reads its own slice, and the scan parallelizes like any file source.

``SyntheticEventsDataSource`` is the deterministic reference
implementation: closed-form rows (no RNG state), so any slice can be
produced independently by any executor AND reproduced exactly by the
DuckDB oracle from ``generate_series`` — which is what makes a custom
source oracle-checkable at all.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

DEFAULT_PARTITIONS = 8
DEFAULT_ROWS_PER_PARTITION = 1000

SCHEMA_DDL = "event_id BIGINT, user_id BIGINT, value DOUBLE"


def _row(i: int) -> tuple[int, int, float]:
    """Closed-form row i — pure arithmetic, identical in SQL."""
    return (i, i % 97, round((i * 31) % 1000 / 10.0, 1))


class _Partition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_parts = int(options.get("partitions", DEFAULT_PARTITIONS))
        self.rows_per_part = int(
            options.get("rows_per_partition", DEFAULT_ROWS_PER_PARTITION)
        )

    def partitions(self):
        return [
            _Partition(p * self.rows_per_part, (p + 1) * self.rows_per_part)
            for p in range(self.n_parts)
        ]

    def read(self, partition: _Partition):
        for i in range(partition.start, partition.end):
            yield _row(i)


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticEventsReader(self.options)


def register(spark) -> None:
    """Idempotent registration on a session."""
    spark.dataSource.register(SyntheticEventsDataSource)


def custom_source_scan(spark, sf_dir: str):
    """Registry query: scan the custom Python source (8 partitions ×
    1000 rows planned driver-side, read executor-side) and aggregate —
    proving schema, options, partition planning, and values end to end
    against a ``generate_series`` oracle. ``sf_dir`` is unused: the
    source IS the data."""
    from pyspark.sql import functions as F

    from aws_saas_etl_spark.functions.num import dsum_rounded

    register(spark)
    df = spark.read.format("synthetic_events").load()
    return (
        df.groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("user_id").alias("n_users"),
            dsum_rounded(F.col("value"), 2).alias("total_value"),
        )
        .orderBy("user_bucket")
    )


# --------------------------------------------------------------------------
# Streaming variant: Spark 4 Python STREAMING data source
# (SimpleDataSourceStreamReader — offset tracking + replay, no JVM code)
# --------------------------------------------------------------------------

STREAM_BATCH_ROWS = 500
STREAM_TOTAL_ROWS = 2_000


class _SyntheticStreamReader:
    """Offset-tracked reads over the same closed-form rows as the batch
    source: offset = next row index; each micro-batch serves up to
    ``STREAM_BATCH_ROWS`` rows. ``readBetweenOffsets`` replays a
    committed range exactly (closed form ⇒ replay is re-computation, the
    property that makes the source exactly-once under checkpoint
    recovery)."""

    def initialOffset(self):
        return {"i": 0}

    def read(self, start):
        i = int(start["i"])
        end = min(i + STREAM_BATCH_ROWS, STREAM_TOTAL_ROWS)
        return iter([_row(j) for j in range(i, end)]), {"i": end}

    def readBetweenOffsets(self, start, end):
        return iter([_row(j) for j in range(int(start["i"]), int(end["i"]))])


class SyntheticEventsStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events_stream"

    def schema(self) -> str:
        return SCHEMA_DDL

    def simpleStreamReader(self, schema):
        from pyspark.sql.datasource import SimpleDataSourceStreamReader

        # mixin FIRST: SimpleDataSourceStreamReader's own methods raise
        # NOT_IMPLEMENTED and would shadow the mixin under the other order
        class _R(_SyntheticStreamReader, SimpleDataSourceStreamReader):
            pass

        return _R()


def register_stream(spark) -> None:
    """Idempotent registration on a session."""
    spark.dataSource.register(SyntheticEventsStreamDataSource)
