"""Upsert (MERGE INTO) and slowly-changing-dimension history, as pure
DataFrame transforms.

Spark without a table format (Delta/Iceberg) has no MERGE statement; the
engine-level semantics are still expressible as one full-outer join —
which is also exactly what those formats execute underneath. Provided
here so pipelines (e.g. the reference's repeated monthly re-ingest,
main.py's consolidate step) can apply incremental corrections instead of
full rewrites.

- ``merge_upsert``: updates overwrite matching target rows wholesale
  (presence-flag join, so a legitimate NULL in an update wins — no
  per-column COALESCE ambiguity), new keys are inserted, and an optional
  delete flag drops rows. One shuffle on the key for both sides.
- ``scd2_history``: versioned rows -> validity intervals via
  ``lead(valid_from)`` per key — the standard type-2 dimension build; one
  shuffle + one bounded window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    delete_col: str | None = None,
) -> DataFrame:
    """MERGE: matched keys take the update row (all columns), unmatched
    update keys are inserted, unmatched target rows pass through. If
    ``delete_col`` names a boolean column in ``updates``, true-flagged
    keys are removed instead.

    ``updates`` must be unique per key (standard MERGE contract — Delta
    raises on multiple matches; pre-aggregate upstream).
    """
    data_cols = [c for c in target.columns if c not in keys]
    upd_cols = set(updates.columns)
    missing = [c for c in data_cols if c not in upd_cols]
    if missing:
        raise ValueError(f"updates missing target columns: {missing}")

    t = target.select(
        *keys, *[F.col(c).alias(f"__t_{c}") for c in data_cols]
    )
    u = updates.select(
        *keys,
        *[F.col(c).alias(f"__u_{c}") for c in data_cols],
        F.lit(1).alias("__u"),
        *([F.col(delete_col).alias("__del_flag")] if delete_col else []),
    )
    j = t.join(u, keys, "full_outer")
    take_update = F.col("__u").isNotNull()
    out = j.select(
        *keys,
        *[
            F.when(take_update, F.col(f"__u_{c}"))
            .otherwise(F.col(f"__t_{c}"))
            .alias(c)
            for c in data_cols
        ],
        (
            F.coalesce(F.col("__del_flag"), F.lit(False))
            if delete_col
            else F.lit(False)
        ).alias("__del"),
    )
    return out.filter(~F.col("__del")).drop("__del")


def scd2_history(
    versions: DataFrame,
    keys: list[str],
    valid_from: str,
    current_flag: str = "is_current",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Build type-2 history: each version row gets ``valid_to`` = next
    version's ``valid_from`` (NULL on the latest => ``current_flag``).
    ``versions`` must be unique per (keys, valid_from)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(valid_from)
    nxt = F.lead(valid_from).over(w)
    return versions.select(
        *versions.columns,
        nxt.alias(valid_to),
        nxt.isNull().alias(current_flag),
    )
