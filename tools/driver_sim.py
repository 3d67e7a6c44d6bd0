#!/usr/bin/env python
"""Simulate the driver's verify pass end-to-end.

Uses a VANILLA SparkSession (no engine configs — exactly what the driver
would build), imports ``__spark_entry__`` the way the driver does, then:
1. smoke: entry(spark) at sf0.001 → rows > 0, stable schema
2. correctness: every queries()[name] at sf0.01 vs oracle_sql()[name] in
   DuckDB — row count + column set + order-insensitive value comparison
   (columns sorted by name, rows sorted, floats compared exactly after the
   engine's own rounding — mirroring the driver's value hash).

Exit 0 = all match. Prints one line per query.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
# optional: restrict to named queries (substring match), e.g.
#   python tools/driver_sim.py /root/testdata/sf0.01 q1 minhash
ONLY = sys.argv[2:]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for a hash-like, order-insensitive comparison
    return df.astype(str).sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    smoke = e.entry(spark).collect()
    print(f"smoke: entry() -> {len(smoke)} rows")
    assert len(smoke) > 0

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failed = []
    n_run = 0
    for name in sorted(qs):
        if ONLY and not any(pat in name for pat in ONLY):
            continue
        n_run += 1
        spark_pdf = qs[name](spark, SF_DIR).toPandas()
        if name not in oracles:
            print(f"rows-only: {name} -> {len(spark_pdf)} rows")
            continue
        duck_pdf = con.execute(oracles[name]).df()
        status = "OK"
        if len(spark_pdf) != len(duck_pdf):
            status = f"ROWCOUNT {len(spark_pdf)} != {len(duck_pdf)}"
        elif sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
            status = f"COLUMNS {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
        else:
            a, b = norm(spark_pdf), norm(duck_pdf)
            if not a.equals(b):
                diff = (a != b).any(axis=1)
                status = f"VALUES mismatch rows e.g.\n{a[diff].head(3)}\nvs\n{b[diff].head(3)}"
        print(f"{'ok   ' if status == 'OK' else 'FAIL '}{name}: {status}")
        if status != "OK":
            failed.append(name)
    print(f"\n{n_run - len(failed)}/{n_run} queries verified, {len(failed)} failed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
