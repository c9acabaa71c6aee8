"""As-of (point-in-time) join: each left row matched to the latest right
row at-or-before its timestamp, per key.

The classic time-series enrichment join (pandas ``merge_asof``, kdb+
``aj``, DuckDB/QuestDB ``ASOF JOIN``) — e.g. "attach the most recent
purchase before each click". Spark has no built-in as-of join; the naive
``l JOIN r ON key AND r.ts <= l.ts`` + max-per-row explodes into a range
join (every left row pairs with its entire right history — quadratic per
key at 100 TB).

This implementation is the **union + ordered-window carry** pattern: tag
both sides, union, then per key ``last(payload, ignorenulls=True)`` over
rows up to the current one. One shuffle on the key, state per row is one
struct, no range explosion — cost is a sort within each key partition,
identical to what any windowed aggregation already pays. Skewed keys are
handled by AQE the same as any window; the payload struct keeps the
shuffle narrow (only the carried right columns move).

Right-side rows must be unique per (key, ts) for deterministic output
(same contract as DuckDB's ASOF JOIN); pre-aggregate the right side
otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join. ``backward``: latest right with ``r.ts <= l.ts``;
    ``forward``: earliest right with ``r.ts >= l.ts``. Unmatched left rows
    keep NULL right columns (left-join semantics).

    ``tolerance_seconds`` (timestamps compared in seconds; plain numeric
    ts columns compared as-is) nulls matches further away than the bound.
    """
    from pyspark.sql import Window

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != right_ts]
    clash = [f"{c}{suffix}" for c in [right_ts, *right_cols] if f"{c}{suffix}" in left.columns]
    if clash:
        raise ValueError(f"suffixed right columns collide with left: {clash}")

    pay = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c).alias(c) for c in right_cols]
    )
    r = right.select(
        *on, F.col(right_ts).alias("__ts"), pay.alias("__pay"), F.lit(0).alias("__left")
    )
    pay_type = r.schema["__pay"].dataType
    lcols = [c for c in left.columns if c not in on]
    l = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(pay_type).alias("__pay"),
        F.lit(1).alias("__left"),
        *lcols,
    )
    r = r.select(*on, "__ts", "__pay", "__left", *[F.lit(None).cast(l.schema[c].dataType).alias(c) for c in lcols])

    # At equal ts the right row must sort before the left row to be visible
    # (<=); flip for allow_exact_matches=False. Forward direction reverses
    # the time order, so "before" in window order means "at-or-after" in
    # event time.
    side_order = F.col("__left") if allow_exact_matches else (1 - F.col("__left"))
    ts_order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, side_order.asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__pay", ignorenulls=True).over(w)

    out = (
        l.unionByName(r)
        .withColumn("__m", matched)
        .filter(F.col("__left") == 1)
    )
    if tolerance_seconds is not None:
        gap = F.abs(
            F.col("__ts").cast("double") - F.col("__m.__rts").cast("double")
        )
        out = out.withColumn(
            "__m", F.when(gap <= F.lit(float(tolerance_seconds)), F.col("__m"))
        )
    keep_left = [c for c in left.columns]
    return out.select(
        *keep_left,
        F.col("__m.__rts").alias(f"{right_ts}{suffix}"),
        *[F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
