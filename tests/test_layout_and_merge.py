"""Z-order layout + MERGE upsert tests: curve math, file clustering,
merge semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_saas_etl_spark.operators import layout
from aws_saas_etl_spark.operators.jobs import merge_upsert


def _z_ref(x: int, y: int, bits: int = layout.Z_BITS) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_z_value_matches_reference_interleave(spark):
    pts = [(0, 0), (1, 0), (0, 1), (3, 3), (1023, 0), (0, 1023), (513, 770)]
    df = spark.createDataFrame(pts, "x INT, y INT")
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", layout.z_value(F.col("x"), F.col("y")).alias("z")).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _z_ref(x, y), (x, y)
    # unit cases pin the bit convention: x → even bits, y → odd bits
    assert got[(1, 0)] == 1 and got[(0, 1)] == 2 and got[(3, 3)] == 15


def test_write_zordered_clusters_both_dimensions(spark, tmp_path):
    # 4096 rows on a 64x64 grid, deliberately written from a random row
    # order; after z-order layout a narrow filter on EITHER dimension
    # touches only a subset of the 16 files.
    n = 64
    rows = [(x, y, x * n + y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x INT, y INT, v INT").repartition(16)
    path = str(tmp_path / "zordered")
    layout.write_zordered(
        df, layout.z_value(F.col("x"), F.col("y"), bits=6), path, n_files=16
    )
    back = spark.read.parquet(path)
    total_files = back.select(F.input_file_name()).distinct().count()
    assert total_files == 16

    def files_touched(pred):
        return (
            back.where(pred).select(F.input_file_name()).distinct().count()
        )

    # a 1/8 band in x or in y should live in well under half the files
    assert files_touched(F.col("x") < 8) <= total_files // 2
    assert files_touched(F.col("y") < 8) <= total_files // 2


def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k INT, s STRING, v DOUBLE"
    )
    source = spark.createDataFrame(
        [(2, "B", 22.0), (9, "new", 90.0)], "k INT, s STRING, v DOUBLE"
    )
    got = {r.k: r for r in merge_upsert(target, source, "k").collect()}
    assert len(got) == 4
    assert got[1].merge_action == "kept" and got[1].s == "a"
    assert got[2].merge_action == "updated" and got[2].s == "B" and got[2].v == 22.0
    assert got[3].merge_action == "kept"
    assert got[9].merge_action == "inserted" and got[9].v == 90.0


def test_merge_upsert_rejects_schema_mismatch(spark):
    t = spark.createDataFrame([(1, "a")], "k INT, s STRING")
    s = spark.createDataFrame([(1,)], "k INT")
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(t, s, "k")


def test_merge_upsert_plan_is_single_shuffle_join(spark):
    # MERGE must stay one shuffle join — no window, no extra exchange.
    t = spark.range(1000).select(F.col("id").alias("k"), F.lit(1.0).alias("v"))
    s = spark.range(100).select(F.col("id").alias("k"), F.lit(2.0).alias("v"))
    plan = (
        merge_upsert(t, s, "k")._jdf.queryExecution().executedPlan().toString()
    )
    assert "FullOuter" in plan or "full_outer" in plan.lower()
    assert "Window" not in plan
