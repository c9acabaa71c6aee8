"""Z-order data layout: multi-column locality for file skipping.

The lakehouse OPTIMIZE ZORDER move (Morton, "A computer oriented
geodetic data base", IBM 1966; Delta/Iceberg table layout): interleave
the bits of several columns' values into one sort key, so sorting by it
co-locates rows that are close in ANY of the dimensions — per-file
min/max stats then prune files for predicates on any z-ordered column,
not just the leading sort column.

The Morton key primitive itself lives in ``operators/profiling.py``
(``zorder_key`` / its ``zorder_sql`` twin — value-checked by
``ext_zorder``); this module adds the LAYOUT side: bucket the z-sorted
rows into files-worth of spans and emit the footer stats a reader
prunes on (``ext_zorder_skipping``).

Scale shape: the z-value is a map-side expression; production layout is
``repartitionByRange(z)`` + per-file stats at write. The bucketed census
below is the local, engine-checkable stand-in: NTILE over the z-order
stands in for the range partitioner, and per-bucket min/max stands in
for file-footer stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from be_analytic_etl_spark.operators.profiling import zorder_key


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

    z = zorder_key(x_col, y_col, bits).alias("__z")
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
