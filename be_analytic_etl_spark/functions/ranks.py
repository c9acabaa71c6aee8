"""Exact-median rank selection over cumulative histogram counts.

The repo's medians are never percentile functions (Spark and DuckDB
interpolate differently); they are TWO-MIDDLE-RANK selections over a
bounded value histogram: with n rows, the median is
(value@rank_lo + value@rank_hi) / 2 where rank_lo = (n+1) div 2 and
rank_hi = n div 2 + 1 (equal when n is odd). Carrying the SUM
value@lo + value@hi (2x the median) keeps everything integer/decimal
exact until the caller's final division.

The division MUST be floor division: Spark's ``/`` on integers is
DOUBLE division, so ``(n+1)/2`` becomes x.5 at even n and a
``cum >= rank`` test silently selects the WRONG row — while DuckDB's
``//`` floors, so the engines disagree on even-sized groups by half a
unit of the value domain. Caught live in round 9 (sf0.001, even-sized
event types); this helper is the single source so the trap cannot
recur. DuckDB oracles write ``(n + 1) // 2`` / ``n // 2 + 1`` inline —
exact integer ops, nothing to stabilize.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def middle_ranks(n: Column) -> tuple[Column, Column]:
    """(rank_lo, rank_hi) = ((n+1) div 2, n div 2 + 1) as exact longs."""
    r_lo = F.floor((n + 1) / 2).cast("long")
    r_hi = F.floor(n / 2).cast("long") + 1
    return r_lo, r_hi
