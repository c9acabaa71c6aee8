"""Skew-mitigation join: salting for hot keys.

When one join key holds a disproportionate share of rows (the classic
power-law key at 100 TB), a hash join sends the whole hot key to one task
— the straggler that defines the stage's wall clock. AQE's skew-join
splitting (``spark.sql.adaptive.skewJoin.enabled``, on by default in this
engine's session) handles sort-merge cases at runtime; *salting* is the
explicit, planner-independent fix, and the only one available when the
skewed side feeds a subsequent same-key aggregation.

Mechanics: the skewed side gets a salt in ``[0, salt_n)`` derived from a
hash of its non-key columns (any spread works — the join result is
invariant to salt assignment); the other side is replicated ``salt_n``
times with every salt value; the join key becomes ``(key, salt)``, so the
hot key fans out across ``salt_n`` tasks. Replication multiplies the
small side's shuffle volume by ``salt_n`` — pick salt_n ≈ the straggler
ratio, not larger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    salt_n: int = 8,
    how: str = "inner",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Join ``skewed`` (the side with hot keys) to ``other`` on ``on``,
    spreading each key over ``salt_n`` tasks.

    ``how`` is restricted to inner/left (outer-on-the-replicated-side
    would emit its unmatched rows ``salt_n`` times). ``salt_cols``
    overrides the salt source (defaults to all non-key skewed columns;
    pass explicitly when those include unhashable types).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how!r}")
    if salt_cols is None:
        salt_cols = [c for c in skewed.columns if c not in on]
    if not salt_cols:
        raise ValueError("need at least one non-key column to derive the salt")

    l = skewed.withColumn(
        SALT, F.pmod(F.xxhash64(*salt_cols), F.lit(salt_n)).cast("int")
    )
    r = other.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(salt_n)]))
    )
    return l.join(r, [*on, SALT], how).drop(SALT)
