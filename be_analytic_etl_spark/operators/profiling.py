"""Table profiling and multi-dimensional layout keys.

``profile``: the ANALYZE-TABLE primitive — per-column null rate, exact
distinct count, numeric min/max. One branch per column, unioned: each
branch scans ONLY its column (parquet column pruning) and its single
``countDistinct`` plans as a two-phase hash aggregate — no Expand. The
earlier one-agg-with-N-distincts formulation made Catalyst Expand every
row N+1 ways (a 6x row multiplication on a 5-column profile) before
aggregating; per-column branches shuffle only each column's distinct
values. Swap in ``approx_count_distinct`` for a one-pass sketch profile
at 100 TB if exactness is negotiable. Output is long format (one row per
column) so downstream quality checks can join on column name.

``zorder_key``: bit-interleaved Morton code over two integer columns.
Sorting/range-partitioning 100 TB by this key co-locates rows that are
close in BOTH dimensions, so min/max row-group statistics prune scans for
predicates on either column — the layout trick behind Delta/Iceberg
Z-ORDER, as a plain deterministic column expression (usable with
``repartitionByRange(zkey)`` + sortWithinPartitions before a parquet
write).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from be_analytic_etl_spark.functions.rounding import stable_round


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Long-format profile: (column, n_rows, n_null, n_distinct,
    min_value, max_value) with min/max as doubles for numeric columns,
    NULL otherwise."""
    numeric = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName()
        in ("byte", "short", "integer", "long", "float", "double", "decimal")
    }
    columns = columns or df.columns
    from functools import reduce

    branches = []
    for c in columns:
        branches.append(
            df.select(c).agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias("n_null"),
                F.countDistinct(c).alias("n_distinct"),
                (
                    F.min(c).cast("double")
                    if c in numeric
                    else F.lit(None).cast("double")
                ).alias("min_value"),
                (
                    F.max(c).cast("double")
                    if c in numeric
                    else F.lit(None).cast("double")
                ).alias("max_value"),
            ).select(
                F.lit(c).alias("column_name"),
                "n_rows",
                "n_null",
                "n_distinct",
                "min_value",
                "max_value",
            )
        )
    return reduce(lambda a, b: a.unionAll(b), branches)


def zorder_key(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Morton code: interleave the low ``bits`` bits of two non-negative
    integer columns (a's bit i -> position 2i, b's -> 2i+1). 2*bits <= 62."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    ca = (F.col(a) if isinstance(a, str) else a).cast("long")
    cb = (F.col(b) if isinstance(b, str) else b).cast("long")
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(ca, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        terms.append(
            F.shiftleft(F.shiftright(cb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def zorder_sql(a: str, b: str, bits: int = 16) -> str:
    """DuckDB twin of ``zorder_key`` (same bit ops)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def group_zscore_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    z: float = 3.0,
    sum_dec: str = "decimal(28,2)",
    sumsq_dec: str = "decimal(38,4)",
) -> DataFrame:
    """Per-group outlier census: rows whose squared deviation exceeds
    ``z² · variance`` of their group, via the textbook two-pass formula
    collapsed into one aggregate pass.

    Determinism discipline: SUM(x) and SUM(x²) are exact DECIMAL (the
    input's decimal content squared fits ``sumsq_dec``), so partial-agg
    merge order cannot perturb them; mean/variance/outlier threshold are
    then a fixed sequence of double ops both engines replay identically.
    The outlier test compares ``(x - mean)² > z²·var`` — no sqrt needed.

    The *emitted* ``mean_value``/``variance`` are additionally rounded
    (4 / 2 decimals): once SUM(x²) exceeds 2⁵³ the decimal→double cast
    rounds differently across engines, and the ``s2 − s1²/n``
    cancellation amplifies that last-ulp delta into the ~13th
    significant digit of the raw variance (observed driver-red round 4).
    Rounding keeps ≥1e4× margin over the ulp noise while the threshold
    comparison still uses full precision internally. The rounding is
    ``stable_round`` (floor-formula), NOT ``F.round``: the mean is an
    exact decimal quotient whose shortest repr can terminate in a
    half-tie, where Spark's and DuckDB's ROUND primitives disagree
    (``functions/rounding.py``).

    One shuffle on ``group_cols`` for the stats (partial map-side), one
    broadcast join back for the census (group stats are tiny by
    construction). Returns per-group ``(…group_cols, n, mean_value,
    variance, n_outliers)``.
    """
    x_dec = F.col(value_col).cast(sum_dec)
    xsq_dec = (F.col(value_col) * F.col(value_col)).cast(sumsq_dec)
    stats = df.groupBy(*group_cols).agg(
        F.count(value_col).alias("n"),
        F.sum(x_dec).cast("double").alias("__sum"),
        F.sum(xsq_dec).cast("double").alias("__sumsq"),
    )
    mean = F.col("__sum") / F.col("n")
    # n == 1 -> sample variance undefined: NULL-divide instead of /0
    # (ANSI double DIVIDE_BY_ZERO; the census then counts 0 outliers —
    # the NULL comparison is false in both engines). Oracle twin:
    # NULLIF(n - 1, 0).
    var = (F.col("__sumsq") - F.col("__sum") * F.col("__sum") / F.col("n")) / (
        F.when(F.col("n") > 1, F.col("n") - 1)
    )
    stats = stats.select(
        *group_cols,
        "n",
        mean.alias("mean_value"),
        var.alias("variance"),
    )
    dev = F.col(value_col) - F.col("mean_value")
    is_out = (dev * dev) > (F.lit(z * z) * F.col("variance"))
    return (
        df.join(F.broadcast(stats), group_cols)
        .groupBy(*group_cols)
        .agg(
            F.first("n").alias("n"),
            stable_round(F.first("mean_value"), 4).alias("mean_value"),
            stable_round(F.first("variance"), 2).alias("variance"),
            F.sum(F.when(is_out, 1).otherwise(0)).alias("n_outliers"),
        )
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    bins: int = 64,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Approximate quantiles from a fixed-bin histogram — the mergeable-
    sketch alternative to exact ``percentile()``, which needs a per-group
    sort of all values. Resolution is one bin width ((max-min)/bins); the
    estimate is the LOWER EDGE of the first bin whose cumulative count
    reaches ``ceil(q * n)`` (no interpolation — every arithmetic step is
    reproducible bit-for-bit by a SQL twin, so the sketch is
    oracle-checkable, unlike engine-specific t-digest/GK internals).

    Scale: pass 1 aggregates per-group (min, max, count) — tiny frame,
    broadcast back; pass 2 bins every row map-side and aggregates
    (group, bin) counts with partial aggregation. State per group is
    ``bins`` longs — mergeable across partitions/batches by addition,
    which is why this shape (not exact percentile) is what production
    metric pipelines ship at 100 TB.

    Returns ``(group_cols..., q, quantile_est, n)`` in long format.
    """
    from functools import reduce

    group_cols = group_cols or []
    gb = [F.col(c) for c in group_cols]
    v = F.col(value_col).cast("double")

    stats = df.groupBy(*gb).agg(
        F.min(v).alias("__mn"),
        F.max(v).alias("__mx"),
        F.count(v).alias("__n"),
    )
    if group_cols:
        # Null-safe equality: a NULL group key is a real group to
        # groupBy, and a plain equality join would silently drop it.
        s = F.broadcast(stats.select(
            *[F.col(c).alias(f"__g_{c}") for c in group_cols],
            "__mn", "__mx", "__n",
        ))
        cond = None
        for c in group_cols:
            t = df[c].eqNullSafe(F.col(f"__g_{c}"))
            cond = t if cond is None else cond & t
        joined = df.join(s, cond).drop(*[f"__g_{c}" for c in group_cols])
    else:
        joined = df.crossJoin(F.broadcast(stats))
    joined = joined.filter(v.isNotNull())
    width_term = (v - F.col("__mn")) / (F.col("__mx") - F.col("__mn"))
    bin_expr = F.when(F.col("__mx") == F.col("__mn"), F.lit(0)).otherwise(
        F.least(F.lit(bins - 1), F.floor(width_term * bins).cast("int"))
    )
    counts = (
        joined.select(*gb, F.col("__mn"), F.col("__mx"), F.col("__n"), bin_expr.alias("__bin"))
        .groupBy(*group_cols, "__mn", "__mx", "__n", "__bin")
        .agg(F.count(F.lit(1)).alias("__bc"))
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy("__bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.withColumn("__cum", F.sum("__bc").over(w))

    # ALL quantiles in one aggregation over the cumulative histogram —
    # conditional min per q — so the events scan + stats join + window
    # run once, not once per quantile.
    qaggs = [
        F.min(
            F.when(
                F.col("__cum") >= F.ceil(F.lit(q) * F.col("__n")), F.col("__bin")
            )
        ).alias(f"__qbin_{i}")
        for i, q in enumerate(quantiles)
    ]
    hit = cum.groupBy(*group_cols, "__mn", "__mx", "__n").agg(*qaggs)

    outs = []
    for i, q in enumerate(quantiles):
        est = F.when(F.col("__mx") == F.col("__mn"), F.col("__mn")).otherwise(
            F.col("__mn")
            + F.col(f"__qbin_{i}") * (F.col("__mx") - F.col("__mn")) / F.lit(bins)
        )
        outs.append(
            hit.select(
                *group_cols,
                F.lit(float(q)).alias("q"),
                est.alias("quantile_est"),
                F.col("__n").alias("n"),
            )
        )
    return reduce(lambda a, b: a.unionAll(b), outs)


def key_skew_profile(df: DataFrame, key_col: str, top_k: int = 10) -> DataFrame:
    """Join-key skew diagnostics: the pre-flight check before any big
    co-shuffled join or aggregation on ``key_col``.

    Returns the ``top_k`` heaviest keys with, on every row, the global
    context: ``(key, cnt, share, total_rows, n_keys, skew_factor)`` where
    ``skew_factor = max_cnt / mean_cnt`` — the straggler multiplier a
    plain hash partitioning would suffer (the direct input to choosing
    ``skew.salted_join``'s salt_n or trusting AQE's skew split).

    Scale: one (key)-shuffle with map-side partial aggregation; the
    per-key count frame reduces to a single stats row plus a TakeOrdered
    top-k (no global sort); everything after the first aggregation is
    control-plane-sized.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    stats = counts.agg(
        F.sum("cnt").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col("key")).limit(top_k)
    return top.crossJoin(F.broadcast(stats)).select(
        "key",
        "cnt",
        (F.col("cnt").cast("double") / F.col("total_rows")).alias("share"),
        "total_rows",
        "n_keys",
        (
            F.col("max_cnt").cast("double")
            / (F.col("total_rows").cast("double") / F.col("n_keys").cast("double"))
        ).alias("skew_factor"),
    )
