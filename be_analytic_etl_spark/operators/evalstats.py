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


def calibration_bins(
    df: DataFrame, score_col: str, label_col: str, n_bins: int = 10
) -> DataFrame:
    """Reliability-diagram bins for a [0,1] classifier score
    (Guo et al., ICML 2017): per equal-width bin,
    (bin, n, mean_conf, frac_pos, abs_gap).

    ``score_col`` must be an exact decimal in [0,1] (the caller's q6
    convention) so the bin assignment floor(score * n_bins) is exact
    integer arithmetic on BOTH engines — no float binning ambiguity at
    bin edges. The corpus-sized work is ONE partial-aggregated groupBy
    on the bin id (<= n_bins + 1 groups); everything after is
    control-plane. mean_conf and frac_pos are single IEEE divisions of
    exact accumulators (emitted raw, quality_percentile precedent);
    abs_gap is one subtraction of those two deterministic doubles.
    """
    b = F.least(
        F.floor(F.col(score_col) * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    hist = (
        df.filter(F.col(score_col).isNotNull())
        .groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(score_col).alias("__conf_sum"),
            F.sum(label_col).cast("long").alias("__pos"),
        )
    )
    mean_conf = F.col("__conf_sum").cast("double") / F.col("n").cast("double")
    frac_pos = F.col("__pos").cast("double") / F.col("n").cast("double")
    return hist.select(
        "bin",
        "n",
        mean_conf.alias("mean_conf"),
        frac_pos.alias("frac_pos"),
        F.abs(frac_pos - mean_conf).alias("abs_gap"),
    )


def calibration_bins_sql(score_rows: str, n_bins: int = 10) -> str:
    """DuckDB twin of ``calibration_bins``: ``score_rows`` yields
    (score, pos) with score an exact decimal. Returns a CTE chain whose
    final SELECT emits the bin table — kept beside the column form so
    the binning arithmetic can never drift."""
    from be_analytic_etl_spark.functions.rounding import exact_dec_double_sql

    # __conf_sum is an unbounded exact accumulator (SUM of
    # DECIMAL(18,6) grows with corpus rows) -> exact_dec_double_sql per
    # SCALE.md divergence class 3, matching __wgap/__pe_num handling.
    conf_dbl = exact_dec_double_sql("__conf_sum")
    return f"""
    cb_h AS (
        SELECT LEAST(CAST(FLOOR(score * {n_bins}) AS INTEGER), {n_bins - 1})
                   AS bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(score) AS __conf_sum,
               CAST(SUM(pos) AS BIGINT) AS __pos
        FROM ({score_rows}) WHERE score IS NOT NULL GROUP BY 1
    )
    SELECT bin, n,
           {conf_dbl} / CAST(n AS DOUBLE) AS mean_conf,
           CAST(__pos AS DOUBLE) / CAST(n AS DOUBLE) AS frac_pos,
           ABS(CAST(__pos AS DOUBLE) / CAST(n AS DOUBLE)
               - {conf_dbl} / CAST(n AS DOUBLE)) AS abs_gap
    FROM cb_h
    """


def expected_calibration_error(
    df: DataFrame, score_col: str, label_col: str, n_bins: int = 10
) -> DataFrame:
    """One-row (n, n_bins_used, ece, mce) — ECE = Σ (n_b/N)·|gap_b|,
    MCE = max_b |gap_b| (Naeini et al., AAAI 2015 formulation).

    Per-bin gaps are deterministic doubles (see ``calibration_bins``);
    each quantizes via ``stable_round`` to DECIMAL(18,6) BEFORE the
    weighted sum so the fold over bins is exact and merge-order-free
    (the repo's mixture_kl discipline) — ECE and MCE are then single
    IEEE divisions / casts of exact accumulators.
    """
    bins = calibration_bins(df, score_col, label_col, n_bins)
    gap6 = stable_round(F.col("abs_gap"), 6).cast("decimal(18,6)")
    agg = bins.agg(
        F.sum("n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_bins_used"),
        F.sum(F.col("n").cast("decimal(38,6)") * gap6).alias("__wgap"),
        F.max(gap6).alias("__mce"),
    )
    return agg.select(
        "n",
        "n_bins_used",
        (F.col("__wgap").cast("double") / F.col("n").cast("double")).alias("ece"),
        F.col("__mce").cast("double").alias("mce"),
    )


def expected_calibration_error_sql(score_rows: str, n_bins: int = 10) -> str:
    """DuckDB twin of ``expected_calibration_error``."""
    from be_analytic_etl_spark.functions.rounding import (
        exact_dec_double_sql,
        stable_round_sql,
    )

    bins = calibration_bins_sql(score_rows, n_bins)
    gap6 = (
        f"CAST({stable_round_sql('abs_gap', 6)} AS DECIMAL(18,6))"
    )
    # __wgap is an unbounded exact accumulator (n_b grows with the
    # corpus) -> exact_dec_double_sql per SCALE.md's audit convention.
    return f"""
    cb AS (WITH {bins}),
    ca AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS n_bins_used,
               SUM(CAST(n AS DECIMAL(38,6)) * {gap6}) AS __wgap,
               MAX({gap6}) AS __mce
        FROM cb
    )
    SELECT n, n_bins_used,
           {exact_dec_double_sql('__wgap')} / CAST(n AS DOUBLE) AS ece,
           CAST(__mce AS DOUBLE) AS mce
    FROM ca
    """


def cohens_kappa(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """One-row (n, n_labels, po, pe, kappa) — Cohen's kappa
    (Cohen, 1960) between two categorical raters.

    Corpus work = ONE partial-aggregated groupBy on the (a, b) label
    pair (<= |labels|^2 groups); margins and the chance-agreement fold
    run on label-count-sized frames. All accumulation is exact
    (BIGINT / DECIMAL(38,0)); po and pe are single IEEE divisions —
    pe's numerator Σ row_k·col_k is an unbounded exact product sum
    (second moment in n), so its decimal->double cast routes through
    the correctly-rounded path on the oracle side per SCALE.md.
    Degenerate corpora (pe = 1: both raters constant) emit NULL kappa
    — mirrored CASE on both sides, never 0/0.
    """
    cells = (
        df.groupBy(F.col(a_col).alias("__a"), F.col(b_col).alias("__b"))
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
        .localCheckpoint(eager=False)
    )
    rows = cells.groupBy("__a").agg(F.sum("__c").cast("long").alias("__ra"))
    cols = cells.groupBy("__b").agg(F.sum("__c").cast("long").alias("__cb"))
    pe_num = (
        rows.join(cols, rows["__a"] == cols["__b"])
        .agg(
            F.sum(
                F.col("__ra").cast("decimal(38,0)")
                * F.col("__cb").cast("decimal(38,0)")
            ).alias("__pe_num")
        )
    )
    base = cells.agg(
        F.sum("__c").cast("long").alias("n"),
        F.sum(F.when(F.col("__a") == F.col("__b"), F.col("__c")).otherwise(0))
        .cast("long")
        .alias("__diag"),
    )
    labels = (
        rows.select(F.col("__a").alias("__l"))
        .unionByName(cols.select(F.col("__b").alias("__l")))
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("n_labels"))
    )
    j = base.crossJoin(F.broadcast(pe_num)).crossJoin(F.broadcast(labels))
    nd = F.col("n").cast("double")
    po = F.col("__diag").cast("double") / nd
    pe = F.col("__pe_num").cast("double") / (nd * nd)
    return j.select(
        "n",
        "n_labels",
        po.alias("po"),
        pe.alias("pe"),
        F.when(pe < 1.0, (po - pe) / (F.lit(1.0) - pe)).alias("kappa"),
    )


def cohens_kappa_sql(rated_rows: str) -> str:
    """DuckDB twin of ``cohens_kappa``: ``rated_rows`` yields (a, b)."""
    from be_analytic_etl_spark.functions.rounding import exact_dec_double_sql

    pe_num_d = exact_dec_double_sql("__pe_num")
    return f"""
    ck_cells AS (
        SELECT a AS __a, b AS __b, CAST(COUNT(*) AS BIGINT) AS __c
        FROM ({rated_rows}) GROUP BY 1, 2
    ), ck_rows AS (
        SELECT __a, CAST(SUM(__c) AS BIGINT) AS __ra FROM ck_cells GROUP BY 1
    ), ck_cols AS (
        SELECT __b, CAST(SUM(__c) AS BIGINT) AS __cb FROM ck_cells GROUP BY 1
    ), ck_pe AS (
        SELECT SUM(CAST(__ra AS DECIMAL(38,0)) * CAST(__cb AS DECIMAL(38,0)))
                   AS __pe_num
        FROM ck_rows JOIN ck_cols ON __a = __b
    ), ck_base AS (
        SELECT CAST(SUM(__c) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN __a = __b THEN __c ELSE 0 END) AS BIGINT)
                   AS __diag
        FROM ck_cells
    ), ck_labels AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_labels FROM (
            SELECT __a AS __l FROM ck_rows
            UNION SELECT __b FROM ck_cols
        )
    )
    SELECT n, n_labels,
           CAST(__diag AS DOUBLE) / CAST(n AS DOUBLE) AS po,
           {pe_num_d} / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS pe,
           CASE WHEN {pe_num_d} / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) < 1.0
                THEN (CAST(__diag AS DOUBLE) / CAST(n AS DOUBLE)
                      - {pe_num_d} / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                     / (1.0 - {pe_num_d} / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                ELSE NULL END AS kappa
    FROM ck_base, ck_pe, ck_labels
    """
