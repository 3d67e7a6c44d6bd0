"""Custom Python DataSource WRITER (manifest_parquet): commit, abort,
overwrite/append, and streaming batchId-keyed exactly-once semantics.

The reference's only sink is a whole-object S3 put (reference
app.py:53-62); the manifest-commit protocol here is the Spark-idiomatic
replacement — these tests pin the protocol's failure paths, which no
registry query can (the driver only sees successful runs).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from aws_saas_etl_spark.sources import custom


@pytest.fixture()
def sink_dir():
    path = tempfile.mkdtemp(prefix="test_manifest_sink_")
    yield path
    shutil.rmtree(path, ignore_errors=True)


def _events_df(spark):
    custom.register(spark)
    return spark.read.format("synthetic_events").load()


def test_batch_roundtrip_and_overwrite(spark, sink_dir):
    custom.register_sink(spark)
    df = _events_df(spark)
    df.write.format("manifest_parquet").option("path", sink_dir).mode(
        "overwrite"
    ).save()
    assert custom.read_manifest_parquet(spark, sink_dir).count() == 8000
    # overwrite replaces committed files instead of accumulating
    df.write.format("manifest_parquet").option("path", sink_dir).mode(
        "overwrite"
    ).save()
    back = custom.read_manifest_parquet(spark, sink_dir)
    assert back.count() == 8000
    assert back.agg(F.countDistinct("event_id")).collect()[0][0] == 8000
    # no stale data files beyond the manifest's list
    files = {f for f in os.listdir(sink_dir) if f.endswith(".parquet")}
    assert files == set(custom._read_manifest(sink_dir)["files"])


def test_batch_append_and_empty_partitions(spark, sink_dir):
    custom.register_sink(spark)
    _events_df(spark).write.format("manifest_parquet").option(
        "path", sink_dir
    ).mode("overwrite").save()
    # 5 rows over >5 partitions → empty partitions must not break commit
    spark.range(5).repartition(8).selectExpr(
        "id as event_id", "id as user_id", "cast(id as double) as value"
    ).write.format("manifest_parquet").option("path", sink_dir).mode(
        "append"
    ).save()
    assert custom.read_manifest_parquet(spark, sink_dir).count() == 8005


def test_abort_leaves_no_committed_state(spark, sink_dir):
    """A task failure mid-write must leave the sink exactly as it was:
    no manifest, no visible files, and (post-abort) no staged leftovers."""
    custom.register_sink(spark)

    @F.udf("double")
    def boom(v):
        raise RuntimeError("injected task failure")

    df = _events_df(spark).withColumn("value", boom("value"))
    with pytest.raises(Exception):
        df.write.format("manifest_parquet").option("path", sink_dir).mode(
            "overwrite"
        ).save()
    assert custom._read_manifest(sink_dir)["files"] == []
    assert (
        custom.read_manifest_parquet(spark, sink_dir, custom.SCHEMA_DDL).count()
        == 0
    )
    with pytest.raises(ValueError, match="no empty_schema"):
        custom.read_manifest_parquet(spark, sink_dir)
    leftovers = [f for f in os.listdir(sink_dir) if f.endswith(".parquet")]
    assert leftovers == []


def test_abort_preserves_previous_commit(spark, sink_dir):
    """A failed overwrite must not clobber the previously committed data
    (files are only swapped inside commit, which never runs on failure)."""
    custom.register_sink(spark)
    _events_df(spark).write.format("manifest_parquet").option(
        "path", sink_dir
    ).mode("overwrite").save()

    @F.udf("double")
    def boom(v):
        raise RuntimeError("injected task failure")

    df = _events_df(spark).withColumn("value", boom("value"))
    with pytest.raises(Exception):
        df.write.format("manifest_parquet").option("path", sink_dir).mode(
            "overwrite"
        ).save()
    assert custom.read_manifest_parquet(spark, sink_dir).count() == 8000


def test_stream_writer_exactly_once_on_replay(spark, sink_dir):
    """Replaying an epoch (checkpoint recovery re-runs the last committed
    micro-batch) must not double-count: the batchId-keyed manifest drops
    the duplicate files. Simulated by calling the writer protocol directly
    with the same batchId twice — the exact call sequence the engine makes
    on recovery."""
    import pyarrow as pa

    writer = custom.ManifestParquetStreamWriter({"path": sink_dir}, False)
    batch = pa.RecordBatch.from_pydict(
        {"event_id": [1, 2], "user_id": [1, 2], "value": [0.1, 0.2]}
    )
    msg = writer.write(iter([batch]))
    writer.commit([msg], batchId=0)
    assert custom._read_manifest(sink_dir)["batches"].keys() == {"0"}
    # replay of batch 0: stages fresh files, commit must drop them
    msg2 = writer.write(iter([batch]))
    writer.commit([msg2], batchId=0)
    m = custom._read_manifest(sink_dir)
    assert len(m["files"]) == 1
    assert custom.read_manifest_parquet(spark, sink_dir).count() == 2
    # staged duplicate physically removed
    assert os.listdir(os.path.join(sink_dir, "_staging")) == []


def test_commit_crash_before_manifest_swap_preserves_old_data(
    spark, sink_dir, monkeypatch
):
    """A crash DURING an overwrite commit — after staged files are renamed
    in but before the manifest swap — must leave the previous commit fully
    readable. Pins the crash-safe ordering (rename in → manifest swap →
    delete old): the old manifest still lists only files that exist, the
    half-committed new files are invisible orphans."""
    import pyarrow as pa

    custom.register_sink(spark)
    _events_df(spark).write.format("manifest_parquet").option(
        "path", sink_dir
    ).mode("overwrite").save()
    old_files = set(custom._read_manifest(sink_dir)["files"])

    def crash(path, manifest):
        raise OSError("injected crash before manifest swap")

    monkeypatch.setattr(custom, "_write_manifest_atomic", crash)
    writer = custom.ManifestParquetWriter({"path": sink_dir}, overwrite=True)
    batch = pa.RecordBatch.from_pydict(
        {"event_id": [1], "user_id": [1], "value": [0.5]}
    )
    msg = writer.write(iter([batch]))
    with pytest.raises(OSError, match="injected"):
        writer.commit([msg])
    monkeypatch.undo()
    # previous commit intact: manifest unchanged, every listed file present
    assert set(custom._read_manifest(sink_dir)["files"]) == old_files
    for name in old_files:
        assert os.path.exists(os.path.join(sink_dir, name))
    assert custom.read_manifest_parquet(spark, sink_dir).count() == 8000


def test_stream_writer_abort_removes_staged(spark, sink_dir):
    import pyarrow as pa

    writer = custom.ManifestParquetStreamWriter({"path": sink_dir}, False)
    batch = pa.RecordBatch.from_pydict(
        {"event_id": [1], "user_id": [1], "value": [0.5]}
    )
    msg = writer.write(iter([batch]))
    writer.abort([msg], batchId=0)
    assert custom._read_manifest(sink_dir)["files"] == []
    assert os.listdir(os.path.join(sink_dir, "_staging")) == []


def test_writer_requires_path(spark):
    custom.register_sink(spark)
    with pytest.raises(Exception, match="path"):
        _events_df(spark).write.format("manifest_parquet").mode(
            "overwrite"
        ).save()
