"""Evaluation statistics for curation classifiers at corpus scale.

Two estimators a training-data pipeline runs constantly but that are
easy to get wrong distributed:

- ``roc_auc``: ROC-AUC of a score against a binary label via the
  Mann–Whitney rank-sum identity. The naive form globally ranks every
  row (a full sort of the corpus); here the corpus is first collapsed
  to a per-distinct-score histogram — with scores quantized to 6
  decimals the histogram is bounded by 10^6 + 1 rows NO MATTER the
  corpus size, so the only corpus-sized work is one partial-aggregated
  groupBy and the rank-sum itself runs on control-plane-sized data.
  Ties are handled exactly (each positive at score s wins half a point
  against negatives AT s), and all accumulation is integer/decimal
  exact, so the single emitted double is one IEEE division both
  engines compute bit-identically.
- ``poisson_bootstrap_ci``: per-group bootstrap confidence interval
  for a mean in ONE pass over the data (Chamandy, Muralidharan,
  Najmi & Naidu, "Estimating uncertainty for massive data streams",
  Google TR 2012): instead of resampling n rows with replacement per
  replicate (impossible distributed — the replicate would need global
  coordination), each row independently draws a Poisson(1) weight per
  replicate. The fan-out is a constant ``n_reps`` map-side explode;
  the shuffle carries (group, rep) partial sums only. Weights come
  from the repo's portable md5 hash, so a SQL oracle replays the
  exact replicates; the interval is rank-based (2nd-smallest /
  2nd-largest replicate mean), not a percentile interpolation, so no
  engine-specific quantile semantics leak into the result.

Both estimators keep every accumulation exact (BIGINT / DECIMAL) and
emit doubles only through single divisions or ``stable_round`` — the
repo's cross-engine float discipline (SCALE.md).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from be_analytic_etl_spark.functions.rounding import stable_round
from be_analytic_etl_spark.operators.sampling import _U_DENOM
from be_analytic_etl_spark.operators.textstats import portable_hash60


def roc_auc(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """One-row DataFrame (n_pos, n_neg, auc) — Mann–Whitney AUC of
    ``score_col`` (an EXACT type: decimal or integer, so equal scores
    group exactly) against 0/1 ``label_col``.

    2U = Σ_s pos_s · (2·neg_below(s) + neg_s) accumulates in
    DECIMAL(38,0) (exact, merge-order-free); AUC = U / (pos·neg) is the
    single IEEE division. Degenerate corpora (one class absent) emit
    NULL — mirrored by the oracle's CASE, never a divide-by-zero
    (Spark NULL vs DuckDB ±inf divergence). NULL scores are EXCLUDED
    (a score that doesn't rank can't win pairs; keeping them would also
    diverge cross-engine — Spark windows order NULLS FIRST, DuckDB
    NULLS LAST) — the SQL twin filters identically.
    """
    df = df.filter(F.col(score_col).isNotNull())
    hist = df.groupBy(F.col(score_col).alias("__s")).agg(
        F.sum(F.col(label_col)).cast("long").alias("__pos"),
        (F.count(F.lit(1)) - F.sum(F.col(label_col))).cast("long").alias("__neg"),
    )
    # Bounded input (<= 10^6+1 distinct 6dp scores): the unpartitioned
    # window is control-plane work, same shape as quality_percentile.
    below = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = hist.select(
        "__pos",
        "__neg",
        F.coalesce(F.sum("__neg").over(below), F.lit(0))
        .cast("long")
        .alias("__neg_below"),
    )
    agg = ranked.agg(
        F.sum("__pos").cast("long").alias("n_pos"),
        F.sum("__neg").cast("long").alias("n_neg"),
        F.sum(
            F.col("__pos").cast("decimal(38,0)")
            * (F.lit(2) * F.col("__neg_below") + F.col("__neg")).cast("decimal(38,0)")
        ).alias("__u2"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.col("__u2").cast("double")
            / (
                F.lit(2.0)
                * F.col("n_pos").cast("double")
                * F.col("n_neg").cast("double")
            ),
        ).alias("auc"),
    )


def roc_auc_sql(score_rows: str) -> str:
    """DuckDB twin of ``roc_auc``: ``score_rows`` is a CTE body yielding
    (score, pos) rows with score already exact. Kept here so the rank-sum
    algebra can never drift from the column form."""
    from be_analytic_etl_spark.functions.rounding import exact_dec_double_sql

    u2d = exact_dec_double_sql("__u2")
    return f"""
    h AS (
        SELECT score AS __s, CAST(SUM(pos) AS BIGINT) AS __pos,
               CAST(COUNT(*) - SUM(pos) AS BIGINT) AS __neg
        FROM ({score_rows}) WHERE score IS NOT NULL GROUP BY score
    ), rk AS (
        SELECT __pos, __neg,
               CAST(coalesce(SUM(__neg) OVER (ORDER BY __s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS __neg_below
        FROM h
    ), a AS (
        SELECT CAST(SUM(__pos) AS BIGINT) AS n_pos,
               CAST(SUM(__neg) AS BIGINT) AS n_neg,
               SUM(CAST(__pos AS DECIMAL(38,0))
                   * CAST(2 * __neg_below + __neg AS DECIMAL(38,0))) AS __u2
        FROM rk
    )
    SELECT n_pos, n_neg,
           CASE WHEN n_pos > 0 AND n_neg > 0
                THEN {u2d}
                     / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
                ELSE NULL END AS auc
    FROM a
    """


def _poisson1_cdf(k_max: int = 5) -> list[float]:
    """P(X <= k) for X ~ Poisson(1), k = 0..k_max. Module-level floats
    embedded as literals on BOTH engine sides, so the inverse-CDF draw is
    deterministic by construction (P(X > 5) ~ 6e-4 truncates to 6)."""
    term = math.exp(-1.0)
    acc = term
    out = [acc]
    for k in range(1, k_max + 1):
        term = term / k
        acc = acc + term
        out.append(acc)
    return out


POISSON1_CDF = _poisson1_cdf()


def poisson1_weight(u: Column) -> Column:
    """Inverse-CDF Poisson(1) draw from a uniform ``u`` in (0, 1)."""
    expr = F.when(u < F.lit(POISSON1_CDF[0]), F.lit(0))
    for k in range(1, len(POISSON1_CDF)):
        expr = expr.when(u < F.lit(POISSON1_CDF[k]), F.lit(k))
    return expr.otherwise(F.lit(len(POISSON1_CDF)))


def poisson1_weight_sql(u_expr: str) -> str:
    """DuckDB twin of ``poisson1_weight`` — generated from the SAME
    threshold list, so the two can never drift."""
    branches = " ".join(
        f"WHEN ({u_expr}) < {c!r} THEN {k}" for k, c in enumerate(POISSON1_CDF)
    )
    return f"(CASE {branches} ELSE {len(POISSON1_CDF)} END)"


def bootstrap_u(id_col: str, rep_col: str, salt: str) -> Column:
    """Deterministic uniform in (0, 1) per (row, replicate) from the
    portable 60-bit md5 hash (both engines compute it identically)."""
    keyed = F.concat(
        F.col(id_col).cast("string"),
        F.lit(":"),
        F.col(rep_col).cast("string"),
        F.lit(f":{salt}"),
    )
    return portable_hash60(keyed).cast("double") / F.lit(_U_DENOM)


def bootstrap_u_sql(id_expr: str, rep_expr: str, salt: str) -> str:
    """DuckDB twin of ``bootstrap_u``."""
    key = f"CAST({id_expr} AS VARCHAR) || ':' || CAST({rep_expr} AS VARCHAR) || ':{salt}'"
    return (
        f"(CAST(CAST('0x' || substr(md5({key}), 1, 15) AS BIGINT) AS DOUBLE)"
        f" / {_U_DENOM!r})"
    )


def poisson_bootstrap_ci(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value_col: str,
    n_reps: int = 16,
    salt: str = "pboot",
) -> DataFrame:
    """Per-``group_col`` Poisson-bootstrap CI for mean(``value_col``):
    (group, n_reps, boot_mean, boot_lo, boot_hi).

    ``value_col`` must be an exact decimal (the caller quantizes — the
    repo's q6 convention) so weighted sums accumulate exactly; each
    replicate mean is ONE IEEE division then ``stable_round``. The
    interval is the 2nd-smallest / 2nd-largest replicate mean (~88% CI
    at 16 reps) — rank statistics, not engine-interpolated quantiles.
    Replicates whose total weight is 0 are dropped on both sides (at
    Poisson(1) that is p ~ e^-n per group — only conceivable for
    near-empty groups).
    """
    reserved = {
        "rep", "n_reps", "boot_mean", "boot_lo", "boot_hi",
        "__id", "__v", "__w", "__wv", "__wsum", "__rmean", "__rlo", "__rhi",
    }
    clobbered = reserved & {group_col, id_col, value_col}
    if clobbered:
        raise ValueError(
            f"poisson_bootstrap_ci: column(s) {sorted(clobbered)} collide "
            "with the operator's internals — rename before calling"
        )
    rep = df.select(
        F.col(group_col),
        F.col(id_col).alias("__id"),
        F.col(value_col).alias("__v"),
        F.explode(F.sequence(F.lit(0), F.lit(n_reps - 1))).alias("rep"),
    )
    w = poisson1_weight(bootstrap_u("__id", "rep", salt))
    per_rep = (
        rep.select(group_col, "rep", w.alias("__w"), F.col("__v"))
        .groupBy(group_col, "rep")
        .agg(
            F.sum(F.col("__w") * F.col("__v")).alias("__wv"),
            F.sum("__w").cast("long").alias("__wsum"),
        )
        .filter(F.col("__wsum") > 0)
    )
    rmean = per_rep.select(
        group_col,
        "rep",
        stable_round(
            F.col("__wv").cast("double") / F.col("__wsum").cast("double"), 6
        )
        .cast("decimal(18,6)")
        .alias("__rmean"),
    )
    lo = Window.partitionBy(group_col).orderBy("__rmean", "rep")
    hi = Window.partitionBy(group_col).orderBy(F.col("__rmean").desc(), F.col("rep").desc())
    ranked = rmean.select(
        group_col,
        "__rmean",
        F.row_number().over(lo).alias("__rlo"),
        F.row_number().over(hi).alias("__rhi"),
    )
    return ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_reps"),
        stable_round(
            F.sum("__rmean").cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("boot_mean"),
        F.max(F.when(F.col("__rlo") == 2, F.col("__rmean")))
        .cast("double")
        .alias("boot_lo"),
        F.max(F.when(F.col("__rhi") == 2, F.col("__rmean")))
        .cast("double")
        .alias("boot_hi"),
    )
