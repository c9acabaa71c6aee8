"""Dataset versioning ops: snapshot diff (added / deleted / changed /
unchanged between two versions of a keyed table) and curriculum
bucketing (quantile length buckets + deterministic per-bucket sampling).

100 TB notes:

- ``snapshot_diff`` is ONE full-outer sort-merge join on the key — the
  minimal-shuffle shape for a whole-table diff. Change detection compares
  the selected value columns directly (no row serialization); the output
  can stay row-level (for a CDC feed) or reduce to per-status counts.
  Both sides shuffle once on the same key; at 100 TB bucketed/partitioned
  versions of the same table diff with zero shuffle (see
  sources.sinks.write_bucketed_table).
- ``curriculum_buckets`` computes exact quantile thresholds of the length
  column (one aggregate whose state is the value multiset — fine for
  numeric lengths; swap in percentile_approx for true stream-scale) and
  then assigns buckets MAP-SIDE by comparing against the broadcast 1-row
  threshold frame — no global sort, no ntile's single-partition window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    v1: DataFrame,
    v2: DataFrame,
    key: str,
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff of two versions of a keyed table.

    Returns (key, status) with status in added/deleted/changed/unchanged.
    added = key only in v2; deleted = only in v1; changed = present in
    both with any compare_col differing (NULL-safe comparison).
    """
    a = v1.select(key, *compare_cols).alias("a")
    b = v2.select(key, *compare_cols).alias("b")
    joined = a.join(b, F.col(f"a.{key}") == F.col(f"b.{key}"), "full_outer")
    same: Column = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
    status = (
        F.when(F.col(f"a.{key}").isNull(), F.lit("added"))
        .when(F.col(f"b.{key}").isNull(), F.lit("deleted"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        F.coalesce(F.col(f"a.{key}"), F.col(f"b.{key}")).alias(key),
        status.alias("status"),
    )


def diff_summary(diff: DataFrame, key: str) -> DataFrame:
    """Reduce a snapshot_diff to per-status (n, key checksum)."""
    return diff.groupBy("status").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(key).alias("key_checksum"),
    )


def curriculum_buckets(
    df: DataFrame,
    length_col: Column | str,
    id_col: str = "doc_id",
    probs: tuple[float, ...] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Assign each row a curriculum bucket 0..len(probs) by exact quantile
    thresholds of ``length_col`` (bucket i = value in (q_i-1, q_i]).

    The thresholds reduce to ONE broadcast row; assignment is map-side
    (`sum(length > q_i)`), so the plan is agg + broadcast-join + project —
    no global sort. Exact `percentile` keeps the oracle twin byte-exact;
    a true 100 TB deployment swaps `F.percentile` for
    `F.percentile_approx` with no other change.
    """
    c = F.col(length_col) if isinstance(length_col, str) else length_col
    lens = df.select(F.col(id_col), c.cast("double").alias("__len"))
    qs = lens.agg(
        F.percentile("__len", F.array(*[F.lit(p) for p in probs])).alias("__qs")
    )
    bucket = F.lit(0)
    for i in range(len(probs)):
        bucket = bucket + F.when(F.col("__len") > F.col("__qs")[i], 1).otherwise(0)
    return lens.crossJoin(F.broadcast(qs)).select(
        id_col, F.col("__len").alias("length"), bucket.cast("int").alias("bucket")
    )


def dataset_manifest(
    df: DataFrame,
    group_cols: list[str],
    key_col: str = "doc_id",
    size_col: str | None = None,
) -> DataFrame:
    """Provenance manifest: per group, row count, optional size total, and
    an order-insensitive content checksum over the keys.

    The handoff record a training-data release ships next to its shards:
    a consumer re-derives the same manifest from what it received and
    diffs — catching dropped/duplicated rows without comparing data. The
    checksum is SUM(md5-head-60bit(key)) mod p, accumulated in
    DECIMAL(38,0) so partial-aggregate merge order (and engine) cannot
    perturb it; addition is commutative, so the checksum is independent
    of row order — exactly the property a distributed writer needs.

    One shuffle on ``group_cols`` with map-side partial aggregation;
    output is |groups| rows.
    """
    from be_analytic_etl_spark.operators.textstats import PORTABLE_P, portable_hash60

    h = portable_hash60(F.col(key_col).cast("string"))
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(h.cast("decimal(38,0)")) % F.lit(PORTABLE_P))
        .cast("long")
        .alias("key_checksum"),
    ]
    if size_col is not None:
        aggs.append(F.sum(size_col).cast("long").alias(f"sum_{size_col}"))
    return df.groupBy(*group_cols).agg(*aggs)
