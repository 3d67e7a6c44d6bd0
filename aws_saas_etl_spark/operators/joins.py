"""Scale-critical join strategies: salting for skew, bucketing for
shuffle-free co-located joins.

These are the two techniques that keep fact-fact joins alive at 100 TB
when AQE alone isn't enough:

- **Salting** splits a pathologically hot key across N sub-partitions by
  appending a salt to the build side and exploding the probe side over
  all salts. Semantics are identical to the plain join; the shuffle skew
  disappears. (AQE skew-join splitting handles moderate skew
  automatically; salting is the explicit tool for extreme single-key
  skew, e.g. a null-ish default key holding 30% of a fact table.)
- **Bucketing** pre-shuffles a table ONCE at write time
  (``bucketBy(n, key)``); subsequent joins/aggregations on the bucket
  key read co-located buckets and skip the exchange entirely —
  Spark's answer to "reuse a partitioning across stages".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join, identical semantics to
    ``left.join(right, left[left_key] == right[right_key], how)`` for the
    SUPPORTED join types: inner, left, left_semi, left_anti.

    The (large, skewed) left side gets a random-but-deterministic salt in
    [0, n_salts); the (smaller) right side is replicated once per salt
    value. The shuffle key becomes (key, salt), so one hot key spreads
    over n_salts reducers.

    right/full outer joins are rejected: the right side is exploded once
    per salt, so an unmatched right row would surface n_salts duplicate
    null-padded rows, not one. Salting the other side instead (swap the
    arguments) is the correct construction for right-heavy skew.

    Salt must be deterministic for retries: derived from a hash of the
    whole left row, not rand().
    """
    norm = how.lower().replace("_", "")
    if norm not in {"inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti"}:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti joins, not "
            f"{how!r}: the salt-exploded right side would duplicate unmatched "
            "right rows under right/full outer semantics"
        )
    salt = (F.abs(F.xxhash64(*[F.col(c) for c in left.columns])) % n_salts).cast("int")
    salted_left = left.withColumn("__salt", salt)
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    salted_right = right.select("*", salts)
    out = salted_left.join(
        salted_right,
        (salted_left[left_key] == salted_right[right_key])
        & (salted_left["__salt"] == salted_right["__salt"]),
        how,
    )
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int = 16,
    sort_key: str | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by a join key —
    the one-time shuffle that every later join on that key skips."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_key)
    if sort_key:
        writer = writer.sortBy(sort_key)
    writer.saveAsTable(table)


def bucketed_join(spark, left_table: str, right_table: str, key: str) -> DataFrame:
    """Join two tables bucketed on the same key with the same bucket
    count: the plan has NO Exchange on either side (verified in tests)."""
    return spark.table(left_table).join(spark.table(right_table), key)
