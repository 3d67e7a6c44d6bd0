"""Bounded within-block self-pair generation (the shared scale guard for
every exact all-pairs operator: n-gram Jaccard, embedding near-dup,
fuzzy entity resolution).

Problem: a blocked self-join (`a JOIN b ON a.block = b.block AND a.id <
b.id`) is O(block²) inside each block. Blocking keys are data-dependent,
so ONE hot block (every doc the same language + length decade, one
dominant label, a common surname suffix) degenerates the whole stage: the
pair count explodes quadratically and, worse, lands in a single join key
— unbounded task memory at 100 TB no matter how many executors exist.

Fix: triangle partitioning (the 1-Bucket-Theta layout of Okcan &
Riedewald, "Processing Theta-Joins using MapReduce", SIGMOD 2011).
Each block of n rows is split into s = ceil(n / max_block_rows)
sub-buckets by hashing the row id; the unordered-pair space then factors
into s·(s+1)/2 bucket-pair cells, each at most max_block_rows² pairs.
A row in sub-bucket g is replicated to every cell it participates in —
as the LEFT of cells (g, q), q ≥ g, and the RIGHT of cells (p, g),
p ≤ g — so each unordered pair materializes in EXACTLY one cell:

- cross-bucket pair (x∈p, y∈q), p<q → only cell (p,q), x left, y right
- same-bucket pair → cell (g,g), deduped by id_left < id_right

The join key is (block, cell), so no single key ever exceeds
max_block_rows² pairs — bounded task memory and real parallelism across
a hot block — while the emitted pair set is IDENTICAL to the naive
blocked join (this is an exact rewrite, not an approximation; parity is
pinned by tests/test_pairs.py against the quadratic reference).

Cost: replication factor (s+1)/2 per side vs 1 for the naive join —
linear in data for a quadratic-in-data pair space, and s == 1 (zero
overhead, same single-copy join) for every block under the cap. The
reference has no analogue (its only join is one ORM FK lookup,
reference models.py:17); this guard exists for the driver's 100 TB
design point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Default per-sub-bucket row cap. Chosen so a worst-case cell
# (cap² = 4M candidate pairs, each a cheap length/threshold check before
# the expensive verify) stays well inside one task's memory and seconds
# of CPU; blocks under the cap pay zero overhead.
MAX_BLOCK_ROWS = 2_000


def bounded_self_pairs(
    df: DataFrame,
    block_cols: list[str],
    id_col: str,
    payload_cols: list[str],
    max_block_rows: int = MAX_BLOCK_ROWS,
) -> DataFrame:
    """All unordered within-block row pairs of ``df``, with no join key
    exceeding ``max_block_rows²`` candidate pairs.

    Returns columns: ``block_cols`` + ``{id_col}_a/_b`` +
    ``{payload}_a/_b`` for each payload, with ``id_a < id_b``. Symmetric
    downstream predicates (similarity, edit distance) apply unchanged.
    """
    # NULL-id rows can never satisfy id_a < id_b in the naive blocked join
    # this rewrites, but a NULL id WOULD slip through the cross-cell branch
    # below (NULL comparisons are not true, so neither dedup nor swap
    # fires) — drop them up front to keep the rewrite exact.
    df = df.where(F.col(id_col).isNotNull())
    counts = df.groupBy(*block_cols).agg(F.count(F.lit(1)).alias("_n"))
    s = F.greatest(F.ceil(F.col("_n") / F.lit(max_block_rows)).cast("int"), F.lit(1))
    g = F.pmod(F.xxhash64(F.col(id_col)), F.col("_s")).cast("int")
    # Shuffle barrier ABOVE the fully-annotated rows: both join sides (and
    # their differing explode projections) consume this one exchange, so
    # an expensive payload expression (hashed shingle arrays, embeddings)
    # is computed ONCE — not once per side. Same measured-100× lesson as
    # dedup.minhash_signatures: only exchange subtrees are reused; any
    # projection above a consumer fork is recomputed per consumer.
    d = (
        df.join(counts.select(*block_cols, s.alias("_s")), block_cols)
        .withColumn("_g", g)
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
    )

    def side(tag: str) -> DataFrame:
        cols = [F.col(c) for c in block_cols]
        cols += [F.col(id_col).alias(f"{id_col}_{tag}")]
        cols += [F.col(c).alias(f"{c}_{tag}") for c in payload_cols]
        return d.select(*cols, "_g", "_s")

    left = side("a").select(
        "*",
        F.col("_g").alias("_pp"),
        F.explode(F.sequence(F.col("_g"), F.col("_s") - 1)).alias("_qq"),
    )
    right = side("b").select(
        "*",
        F.explode(F.sequence(F.lit(0), F.col("_g"))).alias("_pp"),
        F.col("_g").alias("_qq"),
    )
    ida, idb = F.col(f"{id_col}_a"), F.col(f"{id_col}_b")
    joined = left.drop("_g", "_s").join(
        right.drop("_g", "_s"), [*block_cols, "_pp", "_qq"]
    )
    # same-cell pairs dedup by id order; cross-cell pairs are unique by
    # construction but may arrive id-unordered → normalize by swapping.
    joined = joined.where((F.col("_pp") < F.col("_qq")) | (ida < idb))
    swap = ida > idb
    out_cols = [F.col(c) for c in block_cols]
    for c in [id_col, *payload_cols]:
        ca, cb = F.col(f"{c}_a"), F.col(f"{c}_b")
        out_cols.append(F.when(swap, cb).otherwise(ca).alias(f"{c}_a"))
        out_cols.append(F.when(swap, ca).otherwise(cb).alias(f"{c}_b"))
    return joined.select(*out_cols)
