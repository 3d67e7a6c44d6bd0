"""Tests for sources/sinks (S1-S7) and the job metadata store (W1-W4)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from aws_saas_etl_spark.operators.jobs import JOB_EVENT_SCHEMA, JobStore
from aws_saas_etl_spark.sources import io as sio
from tests.conftest import SF_SMOKE


@pytest.fixture()
def workdir(tmp_path):
    return str(tmp_path)


def test_csv_roundtrip_with_schema(spark, workdir):
    df = spark.createDataFrame(
        [(1, "good fast text"), (2, "slow bad text")], "id BIGINT, comments STRING"
    )
    path = os.path.join(workdir, "csv_out")
    sio.write_csv(df, path)
    back = sio.read_csv(spark, path, schema="id BIGINT, comments STRING")
    assert sorted(r["comments"] for r in back.collect()) == [
        "good fast text",
        "slow bad text",
    ]


def test_csv_single_file_mode(spark, workdir):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    path = os.path.join(workdir, "single")
    sio.write_csv(df, path, single_file=True)
    parts = [f for f in os.listdir(path) if f.startswith("part-")]
    assert len(parts) == 1  # reference writes exactly one object (app.py:53-62)


def test_csv_infer_schema(spark, workdir):
    df = spark.createDataFrame([(1, 2.5, "x")], "a BIGINT, b DOUBLE, c STRING")
    path = os.path.join(workdir, "infer")
    sio.write_csv(df, path)
    back = sio.read_csv(spark, path)  # inference path (reference parity)
    assert dict(back.dtypes)["b"] == "double"


def test_json_roundtrip(spark, workdir):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id BIGINT, name STRING")
    path = os.path.join(workdir, "json_out")
    df.write.mode("overwrite").json(path)
    back = sio.read_json(spark, path, schema="id BIGINT, name STRING")
    assert back.count() == 2


def test_parquet_partitioned_write_prunes(spark, workdir):
    df = spark.createDataFrame(
        [(1, "en"), (2, "de"), (3, "en")], "id BIGINT, lang STRING"
    )
    path = os.path.join(workdir, "pq")
    sio.write_parquet(df, path, partition_by=["lang"])
    assert os.path.isdir(os.path.join(path, "lang=en"))
    back = sio.read_parquet(spark, path).where(F.col("lang") == "en")
    assert back.count() == 2
    # partition pruning: only the lang=en directory should be scanned
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "lang=de" not in plan


def test_jdbc_roundtrip_embedded_derby(spark, workdir):
    """S6 end-to-end over a real JDBC connection: Derby (bundled with
    Spark for the Hive metastore) stands in for the reference's Postgres
    (reference app.py:34-39) — same Spark JDBC code path, embedded."""
    url = f"jdbc:derby:{os.path.join(workdir, 'metadb')};create=true"
    props = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}
    df = spark.createDataFrame(
        [(1, "a.csv", "Pending"), (2, "b.csv", "Completed")],
        "id BIGINT, filename STRING, status STRING",
    )
    sio.write_jdbc(
        df,
        url,
        "jobs_meta",
        properties=props,
        column_types="filename VARCHAR(255), status VARCHAR(32)",
    )
    back = sio.read_jdbc(spark, url, "jobs_meta", properties=props)
    assert sorted(map(tuple, back.collect())) == [
        (1, "a.csv", "Pending"),
        (2, "b.csv", "Completed"),
    ]
    # filter pushdown: the predicate must reach the JDBC scan
    filtered = back.where(F.col("status") == "Pending")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert filtered.count() == 1
    assert "PushedFilters" in plan and "status" in plan


def test_s3a_conf_contract():
    """The s3a session config the engine documents for object-store I/O.
    (No hadoop-aws jar in this container; the live-read test below is
    gated on its presence.)"""
    conf = sio.s3a_conf(endpoint="http://localhost:9000", path_style_access=True)
    assert conf["spark.hadoop.fs.s3a.impl"].endswith("S3AFileSystem")
    assert conf["spark.hadoop.fs.s3a.endpoint"] == "http://localhost:9000"
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "true"


def _has_hadoop_aws() -> bool:
    import glob

    import pyspark

    jars = os.path.join(os.path.dirname(pyspark.__file__), "jars", "hadoop-aws*.jar")
    return bool(glob.glob(jars))


@pytest.mark.skipif(not _has_hadoop_aws(), reason="hadoop-aws jar not on classpath")
def test_s3a_read_smoke(spark):  # pragma: no cover - gated integration
    """With hadoop-aws present, the same read_parquet call works on s3a://
    paths; this smoke-reads a public bucket anonymously."""
    conf = sio.s3a_conf(anonymous=True)
    for k, v in conf.items():
        spark.conf.set(k, v)
    df = sio.read_parquet(spark, "s3a://ursa-labs-taxi-data/2019/06/data.parquet")
    assert len(df.schema) > 0


def test_jobstore_state_machine(spark, workdir):
    store = JobStore(spark, os.path.join(workdir, "jobs"))
    store.append(1, "sales_data_2024.csv", "Pending", user_id=10)
    store.append(1, "sales_data_2024.csv", "Processing", user_id=10)
    store.append(2, "other.csv", "Pending", user_id=11)
    store.append(
        1, "sales_data_2024.csv", "Completed", user_id=10,
        result_url="out/updates/data.csv",
    )

    cur = {r["job_id"]: r for r in store.current().collect()}
    assert cur[1]["status"] == "Completed"
    assert cur[1]["result_url"] == "out/updates/data.csv"
    assert cur[2]["status"] == "Pending"

    hist = [r["status"] for r in store.history(1).collect()]
    assert hist == ["Pending", "Processing", "Completed"]

    newest_first = [r["job_id"] for r in store.jobs_by_upload_desc().collect()]
    assert newest_first[0] == 1  # job 1's Completed event is the newest


def test_jobstore_rejects_bad_status(spark, workdir):
    store = JobStore(spark, os.path.join(workdir, "jobs2"))
    with pytest.raises(ValueError, match="invalid status"):
        store.append(1, "f.csv", "Exploded", user_id=1)


def test_jobstore_unique_guard(spark, workdir):
    store = JobStore(spark, os.path.join(workdir, "jobs3"))
    store.append(7, "f.csv", "Pending", user_id=1)
    with pytest.raises(ValueError, match="already exists"):
        store.assert_unique_job(7)
    store.assert_unique_job(8)  # unused id passes


def test_jobstore_empty_reads(spark, workdir):
    store = JobStore(spark, os.path.join(workdir, "jobs4"))
    assert store.current().count() == 0
    assert store.events().schema == JOB_EVENT_SCHEMA


def test_etl_pipeline_helpers(spark):
    from aws_saas_etl_spark.operators.etl import (
        demo_etl_pipeline,
        pick_text_column,
        worker_etl_pipeline,
    )

    df = spark.createDataFrame(
        [("great fast stuff", 1), (None, 2), ("slow dup mess", 3)],
        "comments STRING, id BIGINT",
    )
    out = demo_etl_pipeline(df).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["comment_length"] == len("great fast stuff")

    worker = {r["id"]: r for r in worker_etl_pipeline(df).collect()}
    assert 2 not in worker  # dropna removed the null row
    assert worker[1]["sentiment_result"] == "POSITIVE"
    assert worker[3]["sentiment_result"] == "NEGATIVE"

    # column probing prefers 'review' (reference etl_core.py:53-58)
    both = spark.createDataFrame([("r", "c")], "review STRING, comments STRING")
    assert pick_text_column(both) == "review"
    with pytest.raises(ValueError, match="missing required column"):
        demo_etl_pipeline(spark.createDataFrame([("x",)], "other STRING"))


def test_sentiment_contract_edge_cases(spark):
    """Reference contract: null/blank → NEUTRAL; 4900-char truncation
    (etl_core.py:38-43); labels from README.md:26."""
    from aws_saas_etl_spark.functions.sentiment import (
        sentiment_expr,
        sentiment_pandas_udf,
    )

    # A negative word pushed past the truncation point must be ignored.
    long_text = ("x " * 2460) + " slow slow slow"
    rows = [
        (1, None),
        (2, "   "),
        (3, "fast fast good"),
        (4, "slow dup bad"),
        (5, "fast slow"),
        (6, long_text),
    ]
    df = spark.createDataFrame(rows, "id BIGINT, t STRING")
    for col in [sentiment_expr("t"), sentiment_pandas_udf(F.col("t"))]:
        got = {r["id"]: r["s"] for r in df.select("id", col.alias("s")).collect()}
        assert got[1] == "NEUTRAL"
        assert got[2] == "NEUTRAL"
        assert got[3] == "POSITIVE"
        assert got[4] == "NEGATIVE"
        assert got[5] == "MIXED"
        assert got[6] == "NEUTRAL"  # negativity truncated away


def test_partitioned_write_prunes_partitions(spark, workdir):
    """Directory-partitioned parquet must let Spark prune non-matching
    partitions at planning time — the I/O-elision that makes a 100 TB
    date-partitioned table readable. The pruned scan reads only the
    matching partition directory (PartitionFilters, not a post-scan
    filter) and the other partitions' files never appear in the plan."""
    from aws_saas_etl_spark.catalog import load_tables
    from aws_saas_etl_spark.plans import inspect as PI

    ev = load_tables(spark, SF_SMOKE).events
    path = os.path.join(workdir, "events_by_type")
    sio.write_parquet(ev, path, partition_by=["event_type"])

    back = sio.read_parquet(spark, path).where(F.col("event_type") == "click")
    plan = PI.physical_plan(back)
    assert "PartitionFilters" in plan and "event_type" in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0], plan
    n_click = ev.where(F.col("event_type") == "click").count()
    assert back.count() == n_click


def test_orc_roundtrip(spark, workdir):
    """ORC source/sink parity: the third columnar format a lakehouse
    ingest meets; same reader/writer contract as parquet."""
    df = spark.range(50).withColumn("v", F.col("id") * 3)
    path = os.path.join(workdir, "orc_out")
    df.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.count() == 50
    assert sorted(r["v"] for r in back.collect())[:3] == [0, 3, 6]


def test_compact_parquet_reduces_file_count(spark, workdir):
    import os

    from aws_saas_etl_spark.sources import io as sio

    src = os.path.join(workdir, "shards")
    dst = os.path.join(workdir, "compacted")
    df = spark.range(10_000).withColumnRenamed("id", "k")
    df.repartition(32).write.mode("overwrite").parquet(src)
    n_in = sum(1 for f in os.listdir(src) if f.endswith(".parquet"))
    assert n_in == 32
    n_out = sio.compact_parquet(spark, src, dst, target_file_bytes=10**9)
    assert n_out == 1
    back = spark.read.parquet(dst)
    assert back.count() == 10_000
    assert back.agg({"k": "sum"}).collect()[0][0] == 10_000 * 9_999 // 2


def test_jobstore_time_travel(spark, tmp_path):
    """as_of_seq replays the append-only log to any historical state —
    the snapshot/time-travel read the latest-wins view gets for free."""
    from aws_saas_etl_spark.operators.jobs import JobStore

    store = JobStore(spark, str(tmp_path / "jobs_tt"))
    store.append(7, "a.csv", "Pending", user_id=1)
    seq_after_pending = store.events().agg({"seq": "max"}).collect()[0][0]
    store.append(7, "a.csv", "Processing", user_id=1)
    store.append(7, "a.csv", "Completed", user_id=1, result_url="s3://out/a")

    assert store.current().collect()[0].status == "Completed"
    past = store.current(as_of_seq=seq_after_pending).collect()
    assert len(past) == 1 and past[0].status == "Pending"
    # as-of before any append: empty state, not an error
    assert store.current(as_of_seq=seq_after_pending - 10**6).count() == 0


def test_write_partitioned_dynamic_overwrite(spark, tmp_path):
    """Dynamic partition overwrite replaces ONLY the partitions present in
    the incoming frame — the incremental-reload path; static overwrite
    would truncate the whole table."""
    from aws_saas_etl_spark.sources.io import write_partitioned

    path = str(tmp_path / "pt")
    full = spark.createDataFrame(
        [("2024-01-01", 1), ("2024-01-01", 2), ("2024-01-02", 3)], "day STRING, v INT"
    )
    write_partitioned(full, path, ["day"])
    # reprocess day 1 only: day 2 must survive untouched
    redo = spark.createDataFrame([("2024-01-01", 99)], "day STRING, v INT")
    write_partitioned(redo, path, ["day"])
    # partition-directory values are type-inferred on read (day= → DATE),
    # so compare through str
    got = {(str(r.day), r.v) for r in spark.read.parquet(path).collect()}
    assert got == {("2024-01-01", 99), ("2024-01-02", 3)}


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """mergeSchema reconciles files written before and after a column was
    added — the read-side half of schema evolution (old rows surface the
    new column as null)."""
    path = str(tmp_path / "evolve")
    spark.createDataFrame([(1, "a")], "id INT, name STRING").write.parquet(path)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id INT, name STRING, score DOUBLE"
    ).write.mode("append").parquet(path)
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r.id: r for r in merged.collect()}
    assert rows[1].score is None and rows[2].score == 9.5


def test_csv_corrupt_record_capture(spark, tmp_path):
    """Malformed CSV rows must be quarantined into _corrupt_record while
    clean rows parse — ingestion keeps going (unlike the reference's
    whole-job rollback, app.py:187-189)."""
    import os

    from aws_saas_etl_spark.sources.io import read_csv_with_corrupt_capture

    p = str(tmp_path / "dirty")
    os.makedirs(p)
    with open(os.path.join(p, "part.csv"), "w") as f:
        f.write("id,qty,price\n")
        f.write("1,5,10.5\n")
        f.write("2,not_a_number,extra,columns,here\n")
        f.write("3,7,2.25\n")
    df = read_csv_with_corrupt_capture(spark, p, "id BIGINT, qty BIGINT, price DOUBLE")
    clean = df.where("_corrupt_record IS NULL").select("id", "qty", "price")
    bad = df.where("_corrupt_record IS NOT NULL")
    assert sorted((r.id, r.qty, r.price) for r in clean.collect()) == [
        (1, 5, 10.5),
        (3, 7, 2.25),
    ]
    bad_rows = bad.collect()
    assert len(bad_rows) == 1
    assert "not_a_number" in bad_rows[0]._corrupt_record
    df.unpersist()
