"""Cross-engine-stable decimal rounding.

Spark's ``F.round`` and DuckDB's ``ROUND`` are NOT interchangeable on
doubles: Spark rounds the SHORTEST DECIMAL REPR of the double
(``BigDecimal.valueOf`` -> HALF_UP), DuckDB rounds the BINARY value.
They disagree whenever the shortest repr terminates in a half-tie at
the rounding scale — verified: ``F.round(0.285, 2)`` = 0.29 in Spark
vs ``ROUND(CAST(0.285 AS DOUBLE), 2)`` = 0.28 in DuckDB (the binary
double is 0.28499999999999998). Exact-arithmetic quotients (a decimal
sum divided by a count) routinely produce such short-repr ties, so the
emitted-floats policy (SCALE.md "Cross-engine float determinism") must
not round through either engine's ROUND primitive.

``stable_round`` instead computes ``floor(x * 10^n + 0.5) / 10^n`` —
multiply, add, floor, divide are each IEEE-exact-or-identically-rounded
in both engines, so the result is bit-identical everywhere (half-ties
go toward +inf on both sides; the convention differs from HALF_UP for
negatives, which is fine — consistency, not convention, is the
requirement).

Domain bound: Spark's floor(double) returns BIGINT, so callers must
keep ``|x| * 10^n`` far below 2^63 — true for every bounded emitted
stat (scores, entropies, weights, log-likelihoods, means, variances).
Magnitude-unbounded libm outputs (e.g. perplexity = exp(-logp)) need a
documented saturation cap BEFORE rounding anyway: fixed-decimal
rounding of a 1e13-magnitude value has less quantum than the 2e-16
relative libm noise, so stability requires bounding the magnitude
first (see ``bigram_lm_doc_score``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stable_round(col: Column, n: int) -> Column:
    """Engine-stable round-half-up-toward-+inf at ``n`` decimals."""
    s = float(10**n)
    return F.floor(col * F.lit(s) + F.lit(0.5)) / F.lit(s)


def stable_round_sql(expr: str, n: int) -> str:
    """DuckDB twin of ``stable_round`` — same four IEEE ops."""
    s = repr(float(10**n))
    return f"(floor(({expr}) * {s} + 0.5) / {s})"
