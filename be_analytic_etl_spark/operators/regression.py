"""Per-group isotonic regression (PAVA) via grouped ``applyInPandas``.

The one operator class where the Python boundary is the RIGHT tool:
pool-adjacent-violators is inherently sequential within a series (each
pooling step depends on the previous), so it cannot be expressed as
Column algebra or window functions — but it parallelizes perfectly
ACROSS groups, which is exactly what ``groupBy().applyInPandas`` gives:
one Arrow batch per group, Python only sees |group| rows, the shuffle
carries (group, x, y) once.

100 TB shape: the expensive part is the upstream reduction to one row
per (group, x) — native aggregation. The pandas stage then runs on
|groups| series whose lengths are bounded by the x-domain (days,
buckets), not the raw row count. State per task = one group's series.

Reference use: monotone calibration curves (quality score -> observed
accept rate), trend enforcement in per-day metrics, shard-size
monotonization before packing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _pava(y: list[float], w: list[float]) -> list[float]:
    """Pool-adjacent-violators: weighted least-squares monotone
    (nondecreasing) fit. Pure Python, O(n) amortized — runs per group
    inside the Arrow worker."""
    # blocks of (mean, weight, count), merged while decreasing
    means: list[float] = []
    weights: list[float] = []
    counts: list[int] = []
    for yi, wi in zip(y, w):
        means.append(yi)
        weights.append(wi)
        counts.append(1)
        while len(means) > 1 and means[-2] > means[-1]:
            m2, w2, c2 = means.pop(), weights.pop(), counts.pop()
            m1, w1, c1 = means.pop(), weights.pop(), counts.pop()
            wt = w1 + w2
            means.append((m1 * w1 + m2 * w2) / wt)
            weights.append(wt)
            counts.append(c1 + c2)
    out: list[float] = []
    for m, c in zip(means, counts):
        out.extend([m] * c)
    return out


def isotonic_fit(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    weight_col: str | None = None,
) -> DataFrame:
    """Fit y ≈ f(x) with f monotone nondecreasing, independently per group.

    Input must already be one row per (group, x) — reduce first with a
    native aggregation. Returns (group, x, y, y_iso), ordered arbitrarily.
    """
    schema = f"{group_col} string, {x_col} double, {y_col} double, y_iso double"

    def fit(pdf):
        pdf = pdf.sort_values(x_col).reset_index(drop=True)
        w = (
            pdf[weight_col].astype(float).tolist()
            if weight_col
            else [1.0] * len(pdf)
        )
        pdf = pdf[[group_col, x_col, y_col]].copy()
        pdf["y_iso"] = _pava(pdf[y_col].astype(float).tolist(), w)
        return pdf

    return (
        df.select(group_col, x_col, y_col, *([weight_col] if weight_col else []))
        .groupBy(group_col)
        .applyInPandas(fit, schema)
    )


def isotonic_fit_minimax(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_dec_col: str,
    max_group_rows: int = 512,
) -> DataFrame:
    """Isotonic (nondecreasing) L2 fit per group via the closed-form
    minimax identity ``y_iso[i] = max_{j<=i} min_{k>=i} mean(y[j..k])``
    (Robertson/Wright/Dykstra, "Order Restricted Statistical Inference",
    1988, Thm 1.4.4) — the same solution PAVA computes, as pure Column
    algebra with NO Python boundary.

    ``y_dec_col`` must be DECIMAL: segment means come from exact decimal
    prefix-sum differences cast to double once, then ONE IEEE division —
    so every segment mean, and hence the min/max lattice and the emitted
    ``y_iso``, is bit-identical in any engine (the discipline SCALE.md
    "Cross-engine float determinism" prescribes for decimal division).

    Cost is O(n^2) segments x O(n) positions per group — right for short
    per-group series (daily trends, calibration bins; n<=a few hundred)
    and as the value-checkable twin of the O(n) ``isotonic_fit`` PAVA
    path, which remains the long-series/production operator. The n^3
    work is confined inside each group; groups parallelize.

    Input contract (same as ``isotonic_fit``): ONE row per (group, x) —
    reduce first with a native aggregation. The prefix sum uses an
    explicit ROWS frame so it always aligns with the row_number
    positions; with duplicated x the tie order (and hence the output)
    would be nondeterministic.

    Returns (group, x, y, y_iso) with y = CAST(y_dec AS DOUBLE).

    ``max_group_rows`` (default 512) is ENFORCED at execution: a group
    larger than that raises instead of silently exploding into an
    O(n^3) row blowup — ``isotonic_fit`` (PAVA, O(n)) is the long-series
    path. The check rides the same window partitioning as the rank, so
    it costs no extra shuffle.
    """
    from pyspark.sql import Window, functions as F

    w = Window.partitionBy(group_col).orderBy(x_col)
    grp_n = F.count(F.lit(1)).over(Window.partitionBy(group_col))
    guarded_rn = F.when(
        grp_n <= F.lit(max_group_rows), F.row_number().over(w)
    ).otherwise(
        F.raise_error(
            F.format_string(
                "isotonic_fit_minimax: group has %s rows (> max_group_rows="
                + str(max_group_rows)
                + "); use isotonic_fit (PAVA) for long series",
                grp_n,
            )
        )
    )
    pos = df.select(
        group_col, F.col(x_col), F.col(y_dec_col).alias("__y")
    ).withColumn("__rn", guarded_rn).withColumn(
        "__s",
        F.sum("__y").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    a = pos.select(
        group_col,
        F.col("__rn").alias("__j"),
        (F.col("__s") - F.col("__y")).alias("__sjm1"),
    )
    b = pos.select(
        group_col, F.col("__rn").alias("__k"), F.col("__s").alias("__sk")
    )
    seg = (
        a.join(b, group_col)
        .filter(F.col("__j") <= F.col("__k"))
        .select(
            group_col,
            "__j",
            "__k",
            (
                (F.col("__sk") - F.col("__sjm1")).cast("double")
                / (F.col("__k") - F.col("__j") + 1).cast("double")
            ).alias("__m"),
        )
    )
    i = pos.select(
        group_col,
        F.col("__rn").alias("__i"),
        F.col(x_col),
        F.col("__y").cast("double").alias("y"),
    )
    inner = (
        i.select(group_col, "__i")
        .join(seg, group_col)
        .filter((F.col("__j") <= F.col("__i")) & (F.col("__k") >= F.col("__i")))
        .groupBy(group_col, "__i", "__j")
        .agg(F.min("__m").alias("__mn"))
    )
    fit = inner.groupBy(group_col, "__i").agg(F.max("__mn").alias("y_iso"))
    return i.join(fit, [group_col, "__i"]).select(
        group_col, x_col, "y", "y_iso"
    )
