"""Robust location statistics (trimmed / winsorized means) at corpus
scale, computed from a bounded value histogram.

The textbook forms sort every row per group (rank, trim, average) — a
full per-group sort of the fact table. Here the corpus first collapses
to a per-(group, quantized-value) histogram: the only corpus-sized work
is ONE partial-aggregated groupBy, and the rank arithmetic runs on a
frame bounded by the number of DISTINCT quantized values (for a
currency column floored to whole units, <= the value range — fixed by
the domain, independent of row count; the roc_auc bounded-histogram
discipline). Trim boundaries are exact integer ranks over cumulative
counts, every accumulator is BIGINT/DECIMAL-exact, and each emitted
mean is one IEEE division — so both engines reproduce the result
bit-for-bit.

Semantics (Tukey; Dixon & Yuen 1974 for the winsorized form), on the
QUANTIZED values: with n rows and g = floor(n * trim) cut from each
tail,

- trimmed mean  = mean of ranks g+1 .. n-g;
- winsorized mean = as the trimmed mean but the g low ranks are
  REPLACED by the value at rank g+1 and the g high ranks by the value
  at rank n-g.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def robust_means(
    df: DataFrame,
    group_col: str,
    value_col: str,
    trim: float = 0.1,
) -> DataFrame:
    """Per-group (group, n, n_trimmed, lo_value, hi_value, trimmed_mean,
    winsorized_mean) — ``value_col`` must already be an exact integer
    (the caller quantizes, e.g. ``floor``).

    The per-group window below runs over the bounded histogram, not the
    corpus: partitions are (group), sized by distinct quantized values.
    """
    hist = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.col(group_col).alias("grp"), F.col(value_col).alias("__v")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    w = Window.partitionBy("grp").orderBy("__v")
    cum = hist.select(
        "grp",
        "__v",
        "__c",
        F.sum("__c").over(w).cast("long").alias("__cum"),
        F.sum("__c").over(Window.partitionBy("grp")).cast("long").alias("n"),
    )
    g = F.floor(F.col("n").cast("double") * trim).cast("long")
    lo_rank = F.col("__cum") - F.col("__c")  # ranks before this bucket
    kept = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("__cum"), F.col("n") - g)
        - F.greatest(lo_rank, g),
    )
    marked = cum.select(
        "grp",
        "n",
        g.alias("__g"),
        kept.alias("__kept"),
        (F.col("__v").cast("decimal(38,0)") * kept).alias("__vk"),
        # boundary values: smallest v whose cumulative count reaches
        # rank g+1 (low boundary) / rank n-g (high boundary)
        F.when(F.col("__cum") >= g + 1, F.col("__v")).alias("__vlo_c"),
        F.when(F.col("__cum") >= F.col("n") - g, F.col("__v")).alias("__vhi_c"),
    )
    agg = marked.groupBy("grp").agg(
        F.max("n").alias("n"),
        F.max("__g").cast("long").alias("__gg"),
        F.sum("__kept").cast("long").alias("n_trimmed"),
        F.sum("__vk").alias("__tsum"),
        F.min("__vlo_c").cast("long").alias("lo_value"),
        F.min("__vhi_c").cast("long").alias("hi_value"),
    )
    wsum = (
        F.col("__tsum")
        + F.col("__gg").cast("decimal(38,0)") * F.col("lo_value")
        + F.col("__gg").cast("decimal(38,0)") * F.col("hi_value")
    )
    return agg.select(
        "grp",
        "n",
        "n_trimmed",
        "lo_value",
        "hi_value",
        (F.col("__tsum").cast("double") / F.col("n_trimmed").cast("double"))
        .alias("trimmed_mean"),
        (wsum.cast("double") / F.col("n").cast("double")).alias(
            "winsorized_mean"
        ),
    )


def robust_means_sql(value_rows: str, trim: float = 0.1) -> str:
    """DuckDB twin of ``robust_means``: ``value_rows`` yields (grp, v)
    with v an exact integer. Kept beside the column form so the rank
    arithmetic can never drift. The trimmed/winsorized sums are
    unbounded exact accumulators -> exact_dec_double_sql per SCALE.md's
    audit convention."""
    from be_analytic_etl_spark.functions.rounding import exact_dec_double_sql

    tsum_d = exact_dec_double_sql("__tsum")
    wsum_d = exact_dec_double_sql(
        "__tsum + CAST(__gg AS DECIMAL(38,0)) * lo_value"
        " + CAST(__gg AS DECIMAL(38,0)) * hi_value"
    )
    return f"""
    rm_h AS (
        SELECT grp, v AS __v, CAST(COUNT(*) AS BIGINT) AS __c
        FROM ({value_rows}) WHERE v IS NOT NULL GROUP BY 1, 2
    ), rm_c AS (
        SELECT grp, __v, __c,
               CAST(SUM(__c) OVER (PARTITION BY grp ORDER BY __v) AS BIGINT)
                   AS __cum,
               CAST(SUM(__c) OVER (PARTITION BY grp) AS BIGINT) AS n
        FROM rm_h
    ), rm_m AS (
        SELECT grp, n,
               CAST(FLOOR(CAST(n AS DOUBLE) * {trim!r}) AS BIGINT) AS __g,
               GREATEST(0, LEAST(__cum, n - CAST(FLOOR(CAST(n AS DOUBLE) * {trim!r}) AS BIGINT))
                   - GREATEST(__cum - __c, CAST(FLOOR(CAST(n AS DOUBLE) * {trim!r}) AS BIGINT)))
                   AS __kept,
               __v, __cum, __c
        FROM rm_c
    ), rm_a AS (
        SELECT grp,
               MAX(n) AS n,
               CAST(MAX(__g) AS BIGINT) AS __gg,
               CAST(SUM(__kept) AS BIGINT) AS n_trimmed,
               SUM(CAST(__v AS DECIMAL(38,0)) * __kept) AS __tsum,
               CAST(MIN(CASE WHEN __cum >= __g + 1 THEN __v END) AS BIGINT)
                   AS lo_value,
               CAST(MIN(CASE WHEN __cum >= n - __g THEN __v END) AS BIGINT)
                   AS hi_value
        FROM rm_m GROUP BY grp
    )
    SELECT grp, n, n_trimmed, lo_value, hi_value,
           {tsum_d} / CAST(n_trimmed AS DOUBLE) AS trimmed_mean,
           {wsum_d} / CAST(n AS DOUBLE) AS winsorized_mean
    FROM rm_a
    """
