"""Z-order data layout: multi-column locality for file skipping.

The lakehouse OPTIMIZE ZORDER move (Morton, "A computer oriented
geodetic data base", IBM 1966; Delta/Iceberg table layout): interleave
the bits of several columns' values into one sort key, so sorting by it
co-locates rows that are close in ANY of the dimensions — per-file
min/max stats then prune files for predicates on any z-ordered column,
not just the leading sort column.

Everything here is exact integer bit math (shift/mask/or composed as a
constant-folded expression), so a SQL oracle replays the keys and the
skipping census bit-for-bit.

Scale shape: the z-value is a map-side expression; production layout is
``repartitionByRange(z)`` + per-file stats at write. The bucketed census
below is the local, engine-checkable stand-in: NTILE over the z-order
stands in for the range partitioner, and per-bucket min/max stands in
for file-footer stats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave_sql(x: str, y: str, bits: int) -> str:
    """Bit-interleave expression text (valid in both Spark SQL and
    DuckDB): x's bit i -> position 2i, y's bit i -> position 2i+1."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_value(x_col: str, y_col: str, bits: int = 16) -> Column:
    """Morton z-value of two non-negative integer columns, ``bits`` low
    bits each (values must fit; mask upstream if needed)."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    return F.expr(
        _interleave_sql(
            f"CAST({x_col} AS BIGINT)", f"CAST({y_col} AS BIGINT)", bits
        )
    )


def zorder_skipping_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
    n_buckets: int = 64,
    bits: int = 16,
) -> DataFrame:
    """Bucketed data-skipping census of the z-order layout: NTILE the
    z-sorted rows into ``n_buckets`` files-worth of buckets and emit each
    bucket's row count and per-dimension min/max — the footer stats a
    reader would prune on. A range predicate on EITHER dimension touches
    only buckets whose [min, max] overlaps it; compare against a
    single-column sort, where the non-leading dimension's spans cover
    everything and nothing prunes.
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    from pyspark.sql import Window

    z = zorder_value(x_col, y_col, bits).alias("__z")
    w = Window.orderBy(F.col("__z"), F.col(id_col))
    return (
        df.select(F.col(x_col), F.col(y_col), F.col(id_col), z)
        .withColumn("bucket", F.ntile(n_buckets).over(w))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min(x_col).alias("min_x"),
            F.max(x_col).alias("max_x"),
            F.min(y_col).alias("min_y"),
            F.max(y_col).alias("max_y"),
        )
    )
