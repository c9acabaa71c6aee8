"""Cross-engine-stable decimal rounding.

Spark's ``F.round`` and DuckDB's ``ROUND`` are NOT interchangeable on
doubles: Spark rounds the SHORTEST DECIMAL REPR of the double
(``BigDecimal.valueOf`` -> HALF_UP), DuckDB rounds the BINARY value.
They disagree whenever the shortest repr terminates in a half-tie at
the rounding scale — verified: ``F.round(0.285, 2)`` = 0.29 in Spark
vs ``ROUND(CAST(0.285 AS DOUBLE), 2)`` = 0.28 in DuckDB (the binary
double is 0.28499999999999998). Exact-arithmetic quotients (a decimal
sum divided by a count, products of small-integer ratios) routinely
produce such short-repr ties, so the emitted-floats policy (SCALE.md
"Cross-engine float determinism") must not round through either
engine's ROUND primitive.

``stable_round`` instead computes ``floor(x * 10^n + 0.5) / 10^n`` —
multiply, add, floor, divide are each IEEE-exact-or-identically-rounded
in both engines, so the result is bit-identical everywhere (half-ties
go toward +inf on both sides; the convention differs from HALF_UP for
negatives, which is fine — consistency, not convention, is the
requirement).

Domain guard: Spark's floor(double) returns BIGINT (NaN -> 0, inf ->
saturated) while DuckDB's floor(DOUBLE) propagates NaN/inf — so the
formula is wrapped in a pass-through guard, identical on both sides:
NULL, NaN, and |x| >= 2^53 / 10^n return x unchanged. Past that
threshold a double has no representable decimals at scale n anyway
(rounding is the identity), so the guard loses nothing while keeping
the Spark BIGINT floor far from overflow and NaN/inf semantics aligned
with the engines' own ROUND (propagate, never fabricate 0).

ALWAYS pair ``stable_round`` with ``stable_round_sql`` in the oracle —
never hand-inline the formula (the two must stay in lockstep; the
half-tie test in tests/test_cleaning_functions.py pins them together).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SAFE = float(2**53)


def stable_round(col: Column, n: int) -> Column:
    """Engine-stable round-half-up-toward-+inf at ``n`` decimals.
    NULL/NaN/|x| >= 2^53/10^n pass through unchanged (see module doc)."""
    s = float(10**n)
    limit = _SAFE / s
    rounded = F.floor(col * F.lit(s) + F.lit(0.5)) / F.lit(s)
    return F.when(
        col.isNull() | F.isnan(col) | (F.abs(col) >= F.lit(limit)), col
    ).otherwise(rounded)


def stable_round_sql(expr: str, n: int) -> str:
    """DuckDB twin of ``stable_round`` — same ops, same guard."""
    s = repr(float(10**n))
    limit = repr(_SAFE / float(10**n))
    return (
        f"(CASE WHEN ({expr}) IS NULL OR isnan({expr}) "
        f"OR abs({expr}) >= {limit} THEN ({expr}) "
        f"ELSE floor(({expr}) * {s} + 0.5) / {s} END)"
    )


def exact_dec_double_sql(expr: str) -> str:
    """Correctly-rounded DECIMAL -> DOUBLE cast for DuckDB oracles.

    DuckDB's direct ``CAST(DECIMAL(38,0) AS DOUBLE)`` is NOT correctly
    rounded once the value leaves BIGINT range: the HUGEINT conversion
    splits into 64-bit halves and double-rounds, so values in roughly
    the 2^64..2^75 band can land one ulp off (measured: ~9% of random
    66-bit integers; live example 22240711483861231690 ->
    2.224071148386123e+19, one ulp BELOW the correctly-rounded
    2.2240711483861234e+19 that Java BigDecimal (Spark) and Python
    produce; BIGINT-range values convert correctly). Exact accumulators
    reach that band quickly — the corr moments hit 2.2e19 at sf0.1 —
    so every oracle-side decimal->double cast of an unbounded sum must
    use this form. Routing through VARCHAR uses DuckDB's
    correctly-rounded string->double parser instead, making the cast
    bit-identical to Spark's at every magnitude — the scale-proof form
    for any oracle that casts an unbounded exact accumulator to double
    (SCALE.md "Cross-engine float determinism", divergence class 3).

    Spark needs no twin: its decimal->double goes through BigDecimal
    and is already correctly rounded.
    """
    return f"CAST(CAST(({expr}) AS VARCHAR) AS DOUBLE)"
