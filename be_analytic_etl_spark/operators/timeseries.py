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


def ewma_last(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Final exponentially-weighted moving average per key:
    ``s_1 = x_1;  s_t = alpha * x_t + (1 - alpha) * s_{t-1}``, folded in
    event order.

    EWMA's recurrence cannot be expressed as a window aggregate (each
    step rescales all previous history), so the idiomatic Spark shape is
    an ordered sequence fold per key: collect the key's ordered values
    (``array_sort`` over (order_cols..., value) structs — total order ⇒
    deterministic), then ``aggregate`` folds them JVM-side. The closed
    form ``α·Σ(1-α)^(t-i)·x_i`` would avoid the fold but overflows
    ``(1-α)^-t`` for long histories — the fold is numerically the right
    shape. The identical left-fold IEEE sequence is replayed by DuckDB's
    ``list_reduce`` (which also seeds with the first element), so results
    are bit-identical cross-engine.

    Scale: ONE shuffle on the key; per-key state is that key's value
    array (events-per-key bounded — same envelope as any per-key
    sessionization). For unbounded histories, pre-aggregate per coarse
    time bucket first or switch to the streaming twin
    (``applyInPandasWithState`` carrying one scalar per key).

    Returns ``(key_col, n_events, ewma)``.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    order_struct = F.struct(
        *[F.col(c) for c in order_cols], F.col(value_col).alias("__v")
    )
    per_key = df.groupBy(key_col).agg(
        F.array_sort(F.collect_list(order_struct)).alias("__evs")
    )
    vals = F.transform(F.col("__evs"), lambda s: s["__v"].cast("double"))
    fold = F.aggregate(
        F.expr("slice(__vals, 2, greatest(size(__vals) - 1, 0))"),
        F.element_at(F.col("__vals"), 1),
        lambda acc, x: F.lit(alpha) * x + F.lit(1.0 - alpha) * acc,
    )
    return (
        per_key.withColumn("__vals", vals)
        .select(
            key_col,
            F.size("__vals").alias("n_events"),
            fold.alias("ewma"),
        )
    )


def ewma_sql_twin(
    table: str,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.3,
) -> str:
    """DuckDB twin of :func:`ewma_last` — generated beside the operator so
    the fold expressions cannot drift. ``list_reduce`` seeds with the
    first list element, matching the ``s_1 = x_1`` initialization."""
    # bare float literals parse as DECIMAL in DuckDB; force doubles so the
    # fold multiplies double*double exactly like Spark's codegen
    a = f"CAST({alpha!r} AS DOUBLE)"
    b = f"CAST({1.0 - alpha!r} AS DOUBLE)"
    order = ", ".join(order_cols)
    return f"""
    SELECT {key_col},
           CAST(len(list({value_col})) AS INT) AS n_events,
           list_reduce(list(CAST({value_col} AS DOUBLE) ORDER BY {order}),
                       (acc, x) -> {a} * x + {b} * acc) AS ewma
    FROM {table}
    GROUP BY {key_col}
    """
