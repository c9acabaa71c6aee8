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
