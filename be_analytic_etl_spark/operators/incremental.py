"""Incremental aggregate maintenance (materialized-view refresh without
re-scanning history).

The reference recomputes its consolidated aggregate view from scratch on
every run (one-shot ``python main.py`` + a CREATE VIEW over the full
table, /root/reference/main.py:630-637, README.md:119-213). At 100 TB
that full rescan is the single most expensive habit to break: a daily
delta is ~1/1000th of history, so refreshing an aggregate should cost
O(delta + |groups|), not O(history).

The classic fix: keep the aggregate's MERGEABLE partial state (count +
sums — the same (partial, merge, finalize) decomposition Spark's own
partial aggregation uses across shuffle boundaries) as a tiny state
table, fold each arriving partition into it with one key-join, and
finalize (avg = sum/n, etc.) only at read time.

Determinism: sums run in DECIMAL, so folding history-then-delta is
EXACTLY equal to one aggregation over the union — float addition order
cannot perturb the state. That is what makes the incremental path
substitutable for the full recompute (and lets the DuckDB oracle check
it with a plain GROUP BY over the whole table).

Cost model at scale: ``aggregate_partial`` is one shuffle of the DELTA
(map-side combined to |groups| rows before the wire); ``merge_states``
joins two |groups|-sized tables — broadcastable whenever the group count
is small, and never proportional to history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Exact-decimal accumulator type for the summed measures: wide enough
# that a 100 TB corpus of 18,2-scale measures cannot overflow.
_ACC = "decimal(32,2)"


def aggregate_partial(
    df: DataFrame, keys: list[str], measures: dict[str, str]
) -> DataFrame:
    """Reduce a partition of raw rows to mergeable per-key state.

    ``measures`` maps output-measure name -> source column; the state
    carries ``n_rows`` plus one exact DECIMAL sum per measure. One
    shuffle on ``keys`` with map-side partial aggregation.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.col(src).cast(_ACC)).alias(f"sum_{name}")
        for name, src in measures.items()
    ]
    return df.groupBy(*keys).agg(*aggs)


def merge_states(
    state: DataFrame | None, delta_state: DataFrame, keys: list[str]
) -> DataFrame:
    """Fold a new partition's partial state into the running state.

    Full-outer join on the group keys with NULL-SAFE equality
    (``eqNullSafe``): group keys are routinely nullable (``lang``,
    optional dimensions), and plain ``=`` would split the NULL-key group
    into two state rows forever — silently diverging from the
    from-scratch aggregation this module promises to be substitutable
    for. Counts and sums add (absent side contributes zero).
    |groups| x |groups| — independent of history size. ``state=None``
    bootstraps (first partition becomes the state).
    """
    if state is None:
        return delta_state
    sum_cols = [c for c in state.columns if c not in keys]
    if sum_cols != [c for c in delta_state.columns if c not in keys]:
        raise ValueError("state and delta_state schemas differ")
    from functools import reduce

    s = state.select(
        *[F.col(k).alias(f"__sk_{k}") for k in keys],
        *[F.col(c).alias(f"__s_{c}") for c in sum_cols],
    )
    d = delta_state.select(
        *[F.col(k).alias(f"__dk_{k}") for k in keys],
        *[F.col(c).alias(f"__d_{c}") for c in sum_cols],
    )
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"__sk_{k}").eqNullSafe(F.col(f"__dk_{k}")) for k in keys],
    )
    merged = s.join(d, cond, "full_outer")
    key_cols = [
        F.coalesce(F.col(f"__sk_{k}"), F.col(f"__dk_{k}")).alias(k) for k in keys
    ]
    zero = {
        "n_rows": F.lit(0).cast("long"),
    }
    out_cols = []
    for c in sum_cols:
        z = zero.get(c, F.lit(0).cast(_ACC))
        out_cols.append(
            (F.coalesce(F.col(f"__s_{c}"), z) + F.coalesce(F.col(f"__d_{c}"), z)).alias(c)
        )
    return merged.select(*key_cols, *out_cols)


def refresh_buckets(
    state: DataFrame,
    delta_partials: DataFrame,
    bucket_cols: list[str],
    affected: DataFrame | None = None,
) -> DataFrame:
    """Invalidation refresh (the continuous-aggregate / hypertable-rollup
    shape): REPLACE every bucket the delta touches with freshly computed
    partials, keep all other buckets untouched.

    Unlike the additive ``merge_states`` fold, this handles CORRECTIONS —
    a re-ingested partition whose rows update or delete earlier ones
    (the reference re-downloads whole monthly files on every run,
    /root/reference/main.py:347-369; this is the aggregate-level
    equivalent of that replace, without rescanning history).

    ``delta_partials`` must hold the COMPLETE recomputed state for every
    bucket it mentions (aggregate_partial over the full corrected
    partition). The affected-bucket set is |delta buckets| rows —
    broadcastable — so the refresh costs one anti join on the
    |groups|-sized state plus the delta aggregation: O(delta + groups),
    never O(history).

    ``affected``: the invalidated bucket keys. Defaults to the buckets
    present in ``delta_partials`` — sufficient when every touched bucket
    still has rows after the correction. A correction that retracts a
    bucket ENTIRELY leaves no delta row to infer it from, so the caller
    must pass the invalidated set explicitly (e.g. the re-ingested
    partition's full date range) or the stale aggregate survives. A
    caller-supplied set is always UNIONED with delta_partials' own
    buckets: an ``affected`` that under-covers the delta would otherwise
    keep the stale state row AND union in the recomputed one, yielding
    duplicate bucket rows.
    """
    delta_buckets = delta_partials.select(*bucket_cols).dropDuplicates()
    if affected is None:
        affected = delta_buckets
    else:
        affected = (
            affected.select(*bucket_cols)
            .unionByName(delta_buckets)
            .dropDuplicates()
        )
    from functools import reduce

    aff = affected.select(
        *[F.col(k).alias(f"__a_{k}") for k in bucket_cols]
    )
    cond = reduce(
        lambda a, b: a & b,
        [F.col(k).eqNullSafe(F.col(f"__a_{k}")) for k in bucket_cols],
    )
    # Null-safe anti join: a NULL bucket key must still invalidate its
    # stale state row, same rationale as merge_states.
    kept = state.join(F.broadcast(aff), cond, "left_anti")
    return kept.unionByName(delta_partials)


def finalize(state: DataFrame, keys: list[str], measures: list[str]) -> DataFrame:
    """Read-time finalization: per measure, a DOUBLE total and mean.

    The decimal total is cast to double FIRST and the mean is one double
    division (not decimal division, whose result scale/rounding rules are
    engine-specific) — so the incremental and from-scratch paths, and the
    SQL oracle, produce bit-identical doubles.
    """
    cols = [F.col("n_rows")]
    for name in measures:
        total = F.col(f"sum_{name}")
        cols.append(total.cast("double").alias(f"total_{name}"))
        cols.append(
            (total.cast("double") / F.col("n_rows")).alias(f"avg_{name}")
        )
    return state.select(*keys, *cols)
