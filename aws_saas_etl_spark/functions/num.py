"""Order-independent numeric aggregation helpers.

Double-precision SUM depends on accumulation order, which depends on
partitioning and AQE scheduling — so a rounded double sum can flip its
last digit between runs and between engines (observed: a revenue sum
differing in the 2nd decimal at sf0.01 between Spark and DuckDB).

Fix: cast each addend to DECIMAL before summing. Per-row products are
deterministic IEEE doubles in both engines; the double→decimal cast is
deterministic; decimal addition is exact and order-independent — so the
rounded result is bit-identical everywhere, at any parallelism. This is
the default for every "money" aggregate in the engine.

DECIMAL(22,6): 16 integer digits (sums to 10^16) and 6 fractional digits
(inputs are prices ~1e5 with ~6 significant fractional digits).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DECIMAL_TYPE = "decimal(22,6)"


def dsum(col: Column) -> Column:
    """Exact, order-independent sum (decimal accumulator)."""
    return F.sum(col.cast(DECIMAL_TYPE))


def dsum_rounded(col: Column, r: int = 2) -> Column:
    """Round in DECIMAL (HALF_UP rescale), then convert to double.

    Rounding the double instead is engine-divergent at exact .xx5 sums:
    Spark's round() goes through the shortest decimal string of the double
    (285207.035 → .04) while DuckDB rounds the binary value (→ .03).
    Decimal rescale is HALF_UP in both engines.
    """
    return dsum(col).cast(f"decimal(38,{r})").cast("double")


def davg_rounded(col: Column, r: int = 4) -> Column:
    """Average fully in decimal: Spark divides the decimal(32,6) sum by the
    long count yielding **decimal(38,12)** (HALF_UP at scale 12 — verified
    empirically: 16 values averaging 0.2779495625 give quotient
    0.277949562500), then we rescale to ``r`` (HALF_UP) and emit double.
    The oracle twin reproduces the same two half-up roundings — scale-12
    quotient, then rescale to r — with exact integer arithmetic (DuckDB's
    decimal/int division degrades to double)."""
    q12 = dsum(col) / F.count(col)  # decimal(38,12), HALF_UP at scale 12
    return q12.cast(f"decimal(38,{r})").cast("double")


def dround(col: Column, r: int = 2) -> Column:
    """Engine-stable per-row rounding of a double.

    ``round(double, r)`` diverges between engines at exact .xx5 values
    (Spark rounds the shortest decimal string half-up; DuckDB rounds the
    binary value). Route through decimal instead: double → DECIMAL(22,6)
    (both engines land on the same scale-6 decimal for money-scale values,
    since the double's error ~1e-11 is far below the 5e-7 rounding step)
    → HALF_UP rescale to ``r`` → double. Pair with ``dround_sql``.
    """
    return col.cast(DECIMAL_TYPE).cast(f"decimal(38,{r})").cast("double")


def dec6_sql(expr: str) -> str:
    """DuckDB twin of Spark's ``CAST(double AS DECIMAL(22,6))``.

    The two engines round DIFFERENT inputs to scale 6: Spark converts
    via the double's SHORTEST DECIMAL STRING
    (java.math.BigDecimal(Double.toString(d)), then HALF_UP setScale),
    while DuckDB's direct cast rounds the BINARY value. For doubles
    within half an ulp of a .xxxxxx5 boundary the two disagree by one
    scale-6 unit — found by the r13 widened parity suite at
    536870912.5596035 (binary …4527 → DuckDB .559603; shortest string
    …035 → Spark HALF_UP .559604).

    Emulation: ``CAST(double AS VARCHAR)`` in DuckDB emits the same
    shortest-roundtrip digits Java does, and VARCHAR → DECIMAL rounds
    half-away-from-zero on the PLAIN-notation path — Spark's exact
    semantics. But DuckDB 1.0's VARCHAR→DECIMAL parse of EXPONENT
    notation mis-rounds tiny values ('5.9e-08' → 0.000001), so strings
    carrying an exponent are decomposed exactly instead: the ≤17-digit
    mantissa parses losslessly into DECIMAL(38,17), is scaled to an
    exact ×10¹⁷ HUGEINT, and one half-away-from-zero integer division
    lands it on the scale-6 grid (values below 10⁻⁷ round to zero
    outright, before the 10^(11−k) divisor could overflow). Fuzzed
    against BigDecimal(shortest-string).setScale(6, HALF_UP) over 55k
    adversarial doubles (boundary-hunting ±k.5·10⁻⁶ and …5·10⁻⁷
    shortest strings included): 0 mismatches. Kernel domain: |value| <
    10¹⁶ (DECIMAL(22,6) capacity — Spark NULLs above it, DuckDB
    errors; the fleet's inputs are money/score magnitudes ≤ 10⁶).
    For inputs that are already DECIMAL/INTEGER the string route is
    value-identical to the direct cast (exact digits, no exponent)."""
    s = f"CAST({expr} AS VARCHAR)"
    m = f"CAST(split_part({s}, 'e', 1) AS DECIMAL(38,17))"
    k = f"CAST(split_part({s}, 'e', 2) AS INTEGER)"
    big = f"CAST({m} * 100000000000000000 AS HUGEINT)"
    t = (
        f"(CASE WHEN {k} <= -8 THEN 0 "
        f"WHEN {k} <= 11 THEN "
        f"{_half_up_div(big, f'CAST(power(10, 11 - {k}) AS HUGEINT)')} "
        f"ELSE {big} * CAST(power(10, {k} - 11) AS HUGEINT) END)"
    )
    plain = (
        f"(CASE WHEN {t} < 0 THEN '-' ELSE '' END || "
        f"CAST(abs({t}) // 1000000 AS VARCHAR) || '.' || "
        f"lpad(CAST(abs({t}) % 1000000 AS VARCHAR), 6, '0'))"
    )
    return (
        f"(CASE WHEN contains({s}, 'e') THEN CAST({plain} AS DECIMAL(22,6)) "
        f"ELSE CAST({s} AS DECIMAL(22,6)) END)"
    )


def dround_sql(expr: str, r: int = 2) -> str:
    """DuckDB twin of :func:`dround` (string-routed scale-6 cast — see
    :func:`dec6_sql`)."""
    return f"CAST(round({dec6_sql(expr)}, {r}) AS DOUBLE)"


def dsum_sql(expr: str, r: int = 2) -> str:
    """DuckDB twin of dsum_rounded: round() on DECIMAL is half-away-from-
    zero — identical to Spark's HALF_UP rescale. Per-row casts are
    string-routed (see :func:`dec6_sql`)."""
    return f"CAST(round(sum({dec6_sql(expr)}), {r}) AS DOUBLE)"


def _half_up_div(a: str, n: str) -> str:
    """Integer round-half-away-from-zero division a/n (HUGEINT-safe)."""
    return (
        f"(CASE WHEN ({a}) >= 0 THEN (2*({a}) + ({n})) // (2*({n})) "
        f"ELSE -((2*(-({a})) + ({n})) // (2*({n}))) END)"
    )


def davg_sql(expr: str, r: int = 4) -> str:
    """DuckDB twin of davg_rounded: emulate Spark's ACTUAL decimal division
    — HALF_UP quotient at **scale 12** (Spark's decimal(32,6)/long result
    type is decimal(38,12)), then one HALF_UP rescale to r — with exact
    integer math. Rounding via an intermediate scale-6 quotient instead
    double-rounds and diverges (found by the hypothesis parity suite:
    avg 0.2779495625 → Spark 0.2779, scale-6 twin 0.2780).

    HUGEINT safety: the scale-6 sum is ≤1e16 in magnitude, so the scale-12
    integer is ≤1e28 and 2*a+n in the half-up division ≤2e28, far inside
    HUGEINT's ~1.7e38 range.
    """
    a6 = f"CAST(sum({dec6_sql(expr)}) * 1000000 AS HUGEINT)"
    a12 = f"(({a6}) * CAST(1000000 AS HUGEINT))"  # exact, scale 12
    q12 = _half_up_div(a12, f"count({expr})")  # quotient at scale 12
    h = 10 ** (12 - r)
    qr = _half_up_div(q12, str(h))  # rescaled to scale r
    return f"CAST({qr} AS DOUBLE) / {10**r}"
