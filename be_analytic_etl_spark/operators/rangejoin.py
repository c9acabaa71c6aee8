"""Range (interval-containment) join without a nested loop.

"Which interval(s) contain each point" — sensor readings to maintenance
windows, trades to quote validity spans, log lines to deploy windows.
Spark plans the naive ``p JOIN i ON p.ts BETWEEN i.start AND i.end`` as a
BroadcastNestedLoopJoin (or cartesian when neither side broadcasts):
every point × every interval — dead at scale.

The scale shape is **bucketization** (the same trick DuckDB's IEJoin and
Spark's own range-join hints in Databricks runtime exploit): quantize
time into fixed-width buckets; a point lands in exactly one bucket, an
interval explodes into the buckets it overlaps; an equi-join on
(keys..., bucket) finds every candidate pair exactly once per overlap
bucket — followed by the exact residual predicate. Pairs meet in at most
one shared bucket per point (the point's bucket), so no dedup is needed.

Cost: shuffle on (keys, bucket) — hash-partitioned, skew-safe under AQE;
interval replication = ceil(span / bucket_width), so pick the width near
the median interval span (wider -> fewer replicas but more residual
misses; narrower -> the opposite).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(ts: Column, width_s: int) -> Column:
    # integer-exact epoch quantization (unix_timestamp truncates to the
    # second; good for bucket routing — exactness lives in the residual).
    # .cast("timestamp"): unix_timestamp rejects TIMESTAMP_NTZ (driver
    # sessions read parquet ts as NTZ); no-op on LTZ, and bucket routing
    # only needs a consistent quantization, not an absolute epoch.
    return F.floor(F.unix_timestamp(ts.cast("timestamp")) / F.lit(width_s)).cast("long")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    keys: list[str] | None = None,
    bucket_width_seconds: int = 3600,
    end_inclusive: bool = False,
) -> DataFrame:
    """Inner-join each point row to every interval row whose
    ``[start_col, end_col)`` (or ``[..]`` when ``end_inclusive``) contains
    ``point_ts``, optionally also matching equality ``keys``.

    Output columns: all point columns + all interval columns (names must
    not collide — rename upstream).
    """
    keys = keys or []
    clash = set(points.columns) & set(intervals.columns) - set(keys)
    if clash:
        raise ValueError(f"column collision between sides: {sorted(clash)}")

    p = points.withColumn("__bkt", _bucket(F.col(point_ts), bucket_width_seconds))
    i = intervals.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                _bucket(F.col(start_col), bucket_width_seconds),
                _bucket(F.col(end_col), bucket_width_seconds),
            )
        ),
    )
    upper = (
        F.col(point_ts) <= F.col(end_col)
        if end_inclusive
        else F.col(point_ts) < F.col(end_col)
    )
    return (
        p.join(i, [*keys, "__bkt"])
        .filter((F.col(point_ts) >= F.col(start_col)) & upper)
        .drop("__bkt")
    )
