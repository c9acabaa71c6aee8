"""Time-series regularization: gap-filling a sparse series onto a dense
per-key spine with forward-fill.

Training pipelines and metric stores both need "one row per (key, period)
even when nothing happened" — e.g. daily activity series per user where
silent days carry the last observation forward. Spark has no built-in
gap-fill; the idiomatic shape is:

1. per-key bounds (one groupBy -> one tiny row per key),
2. dense spine via ``sequence(min, max, interval)`` + ``explode`` —
   generated distributed, linear in output size, never materialized on
   the driver,
3. left join of actuals onto the spine on (key, period),
4. forward fill with ``last(col, ignorenulls=True)`` over the key's
   time order.

Scale: the spine join and the fill window shuffle on the key — same
partitioning, and AQE coalesces the two exchanges; per-key state in the
window is one row. Nothing here is proportional to the gap count on the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gapfill(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_cols: list[str],
    step: str = "1 day",
    mark_observed: str | None = "is_observed",
) -> DataFrame:
    """Densify ``df`` (one row per (keys, ts_col) — pre-aggregate upstream)
    onto a regular spine from each key's min to max ``ts_col`` with
    ``step`` spacing, forward-filling ``value_cols``.

    ``mark_observed`` names a boolean column flagging real vs synthesized
    rows (None to omit).
    """
    from pyspark.sql import Window

    bounds = df.groupBy(*keys).agg(
        F.min(ts_col).alias("__mn"), F.max(ts_col).alias("__mx")
    )
    spine = bounds.select(
        *keys,
        F.explode(
            F.sequence("__mn", "__mx", F.expr(f"INTERVAL {step}"))
        ).alias(ts_col),
    )
    actual = df.withColumn("__obs", F.lit(True))
    joined = spine.join(actual, [*keys, ts_col], "left")

    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = joined.select(
        *keys,
        ts_col,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
        F.coalesce("__obs", F.lit(False)).alias(mark_observed or "__obs"),
    )
    if mark_observed is None:
        out = out.drop("__obs")
    return out
