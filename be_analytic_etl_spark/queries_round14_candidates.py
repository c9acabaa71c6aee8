"""STAGED round-14 candidate queries — implemented, oracle-twinned and
pytest-value-checked THIS round, registered NEXT round inside the r14
driver window (the staging discipline of queries_round13_candidates.py;
registration is three ``register()`` calls in a future
``queries_round14.py``). Imported by tests and tools only until then.

Candidates (new statistical surface with no registered sibling):

- ``ext_jarque_bera``: per-source normality panel for the quality-score
  distribution — exact central moments from integer micro-unit power
  sums (quality q6 * 1e6 fits BIGINT; x^4 sums stay inside
  DECIMAL(38,0) up to ~10^12 rows because q is [0,1]-bounded), then
  skewness / excess kurtosis / the Jarque-Bera statistic as expression
  TEXT shared verbatim by both engines (the ext_pacf discipline — no
  libm at all, sqrt is IEEE-exact).
- ``ext_pr_auc``: average precision (step-interpolated PR-AUC) of the
  quality score against the "substantial document" label — the
  precision-recall companion to ext_roc_auc, over the SAME bounded
  distinct-score histogram (<= 10^6+1 rows at 6dp quantization, the
  100 TB bound). Per-block terms DeltaTP * TP/PP are quantized at
  source (12dp -> DECIMAL(38,12)) so the cross-row summation is exact
  and merge-order-free; AP is one IEEE division at the end.
- ``ext_durbin_watson``: lag-1 residual autocorrelation diagnostic of
  the daily-revenue OLS trend — closed-form slope/intercept from exact
  BIGINT/HUGEINT-range sums (products only ever formed in DOUBLE with
  engine-shared text, so no decimal-width cliffs), residuals quantized
  to whole cents -> BIGINT (sub-cent precision is irrelevant to a
  ratio of 1e9-magnitude squares, and a 6dp decimal square overflows
  DuckDB's int64-backed DECIMAL(18,6) multiply) so the DW numerator
  and denominator are exact integer sums (Spark DECIMAL(38,0) /
  DuckDB HUGEINT) over the calendar-bounded daily frame; DW and the
  rho ~ 1 - DW/2 readout are single IEEE divisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from be_analytic_etl_spark.functions.rounding import (
    exact_dec_double_sql,
    stable_round,
    stable_round_sql,
)
from be_analytic_etl_spark.operators import textstats as T
from be_analytic_etl_spark.queries_extensions import _t
from be_analytic_etl_spark.queries_round8 import _DAILY_CENTS_SQL, _daily_cents

# ---------------------------------------------------------------------------
# Jarque-Bera normality panel (Jarque & Bera, Econ. Letters 1980)

#: IEEE tail over per-source double columns (nd, sd1..sd4 = exact power
#: sums of the micro-unit score), shared verbatim by both engines.
#: Central moments via the raw-moment expansion; skew/kurtosis are
#: scale-invariant so the 1e6 micro-unit factor cancels everywhere but
#: the mean readout.
_JB_M1 = "(sd1 / nd)"
_JB_M2 = f"(sd2 / nd - {_JB_M1} * {_JB_M1})"
_JB_M3 = (
    f"(sd3 / nd - 3e0 * {_JB_M1} * (sd2 / nd)"
    f" + 2e0 * {_JB_M1} * {_JB_M1} * {_JB_M1})"
)
_JB_M4 = (
    f"(sd4 / nd - 4e0 * {_JB_M1} * (sd3 / nd)"
    f" + 6e0 * {_JB_M1} * {_JB_M1} * (sd2 / nd)"
    f" - 3e0 * {_JB_M1} * {_JB_M1} * {_JB_M1} * {_JB_M1})"
)
_JB_SKEW = f"({_JB_M3} / ({_JB_M2} * sqrt({_JB_M2})))"
_JB_EXK = f"({_JB_M4} / ({_JB_M2} * {_JB_M2}) - 3e0)"
_JB_STAT = (
    f"((nd / 6e0) * ({_JB_SKEW} * {_JB_SKEW}"
    f" + {_JB_EXK} * {_JB_EXK} / 4e0))"
)
_JB_MEAN = f"({_JB_M1} * 1e-6)"


def ext_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    q6 = (
        stable_round(T.quality_score("text", round_to=None), 6)
        .cast("decimal(18,6)")
        .alias("q6")
    )
    x = (F.col("q6") * F.lit(1000000)).cast("long").alias("__x")
    xd = F.col("__x").cast("decimal(19,0)")
    per = (
        docs.select("source", q6)
        .select("source", x)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(xd).alias("s1"),
            F.sum(xd * xd).alias("s2"),
            F.sum(xd * xd * xd).alias("s3"),
            F.sum(xd * xd * xd * xd).alias("s4"),
        )
    )
    d = per.select(
        "source",
        "n_docs",
        F.col("n_docs").cast("double").alias("nd"),
        F.col("s1").cast("double").alias("sd1"),
        F.col("s2").cast("double").alias("sd2"),
        F.col("s3").cast("double").alias("sd3"),
        F.col("s4").cast("double").alias("sd4"),
    )
    ok = (F.col("n_docs") >= 2) & (F.expr(_JB_M2) > 0)
    return d.select(
        "source",
        "n_docs",
        F.when(
            F.col("n_docs") >= 1, stable_round(F.expr(_JB_MEAN), 12)
        ).alias("mean_q"),
        F.when(ok, stable_round(F.expr(_JB_SKEW), 6)).alias("skewness"),
        F.when(ok, stable_round(F.expr(_JB_EXK), 6)).alias("ex_kurtosis"),
        F.when(ok, stable_round(F.expr(_JB_STAT), 6)).alias("jb_stat"),
    )


def ext_jarque_bera_oracle() -> str:
    from be_analytic_etl_spark.queries_analytics import (
        _QSCORE_SQL,
        qscore_feature_ctes,
    )

    ok = f"(n_docs >= 2 AND {_JB_M2} > 0)"
    return f"""
    WITH {qscore_feature_ctes('source')}, sq AS (
        SELECT source,
               CAST({stable_round_sql(_QSCORE_SQL, 6)} AS DECIMAL(18,6)) AS q6
        FROM m
    ), mu AS (
        SELECT source, CAST(q6 * 1000000 AS BIGINT) AS __x FROM sq
    ), per AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               SUM(CAST(__x AS DECIMAL(19,0))) AS s1,
               SUM(CAST(__x AS DECIMAL(19,0)) * __x) AS s2,
               SUM(CAST(__x AS DECIMAL(19,0)) * __x * __x) AS s3,
               SUM(CAST(__x AS DECIMAL(19,0)) * __x * __x * __x) AS s4
        FROM mu GROUP BY source
    ), d AS (
        SELECT source, n_docs,
               CAST(n_docs AS DOUBLE) AS nd,
               {exact_dec_double_sql('s1')} AS sd1,
               {exact_dec_double_sql('s2')} AS sd2,
               {exact_dec_double_sql('s3')} AS sd3,
               {exact_dec_double_sql('s4')} AS sd4
        FROM per
    )
    SELECT source, n_docs,
           CASE WHEN n_docs >= 1
                THEN {stable_round_sql(_JB_MEAN, 12)} END AS mean_q,
           CASE WHEN {ok} THEN {stable_round_sql(_JB_SKEW, 6)} END
               AS skewness,
           CASE WHEN {ok} THEN {stable_round_sql(_JB_EXK, 6)} END
               AS ex_kurtosis,
           CASE WHEN {ok} THEN {stable_round_sql(_JB_STAT, 6)} END
               AS jb_stat
    FROM d
    """


# ---------------------------------------------------------------------------
# Average precision (PR-AUC) over the quantized-score histogram

_PR_LEN_THRESHOLD = 256  # the ext_roc_auc label, for direct comparability

#: per-distinct-score-block AP term: DeltaTP * precision at the block.
#: The division is the only IEEE op; quantized at source (12dp) so the
#: cross-block sum is an exact decimal fold.
_PR_TERM = "(CAST(__pos AS DOUBLE) * CAST(__tp AS DOUBLE) / CAST(__pp AS DOUBLE))"


def ext_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        stable_round(T.quality_score("text", round_to=None), 6)
        .cast("decimal(18,6)")
        .alias("score"),
        (T.char_count("text") >= _PR_LEN_THRESHOLD).cast("int").alias("pos"),
    ).filter(F.col("score").isNotNull())
    hist = scored.groupBy("score").agg(
        F.sum("pos").cast("long").alias("__pos"),
        (F.count(F.lit(1)) - F.sum("pos")).cast("long").alias("__neg"),
    )
    # Bounded input (<= 10^6+1 distinct 6dp scores): the unpartitioned
    # DESC window is control-plane work — the ext_roc_auc bound.
    w_desc = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.select(
        "__pos",
        "__neg",
        F.sum("__pos").over(w_desc).cast("long").alias("__tp"),
        F.sum(F.col("__pos") + F.col("__neg"))
        .over(w_desc)
        .cast("long")
        .alias("__pp"),
    )
    terms = cum.select(
        "__pos",
        "__neg",
        stable_round(F.expr(_PR_TERM), 12).cast("decimal(38,12)").alias("__term"),
    )
    agg = terms.agg(
        F.sum("__pos").cast("long").alias("n_pos"),
        F.sum("__neg").cast("long").alias("n_neg"),
        F.sum("__term").alias("__ap_sum"),
    )
    npd = F.col("n_pos").cast("double")
    nnd = F.col("n_neg").cast("double")
    return agg.select(
        "n_pos",
        "n_neg",
        F.when(
            F.col("n_pos") + F.col("n_neg") > 0,
            stable_round(npd / (npd + nnd), 12),
        ).alias("prevalence"),
        F.when(
            F.col("n_pos") > 0,
            stable_round(F.col("__ap_sum").cast("double") / npd, 6),
        ).alias("avg_precision"),
    )


def ext_pr_auc_oracle() -> str:
    from be_analytic_etl_spark.queries_analytics import (
        _QSCORE_SQL,
        qscore_feature_ctes,
    )

    prev = "(CAST(n_pos AS DOUBLE) / (CAST(n_pos AS DOUBLE) + CAST(n_neg AS DOUBLE)))"
    ap = f"({exact_dec_double_sql('__ap_sum')} / CAST(n_pos AS DOUBLE))"
    return f"""
    WITH {qscore_feature_ctes('doc_id')}, sq AS (
        SELECT CAST({stable_round_sql(_QSCORE_SQL, 6)} AS DECIMAL(18,6)) AS score,
               CASE WHEN n_chars >= {_PR_LEN_THRESHOLD} THEN 1 ELSE 0 END AS pos
        FROM m
    ), h AS (
        SELECT score, CAST(SUM(pos) AS BIGINT) AS __pos,
               CAST(COUNT(*) - SUM(pos) AS BIGINT) AS __neg
        FROM sq WHERE score IS NOT NULL GROUP BY score
    ), cum AS (
        SELECT __pos, __neg,
               CAST(SUM(__pos) OVER w AS BIGINT) AS __tp,
               CAST(SUM(__pos + __neg) OVER w AS BIGINT) AS __pp
        FROM h
        WINDOW w AS (ORDER BY score DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), terms AS (
        SELECT __pos, __neg,
               CAST({stable_round_sql(_PR_TERM, 12)} AS DECIMAL(38,12))
                   AS __term
        FROM cum
    ), a AS (
        SELECT CAST(SUM(__pos) AS BIGINT) AS n_pos,
               CAST(SUM(__neg) AS BIGINT) AS n_neg,
               SUM(__term) AS __ap_sum
        FROM terms
    )
    SELECT n_pos, n_neg,
           CASE WHEN n_pos + n_neg > 0
                THEN {stable_round_sql(prev, 12)} END AS prevalence,
           CASE WHEN n_pos > 0
                THEN {stable_round_sql(ap, 6)} END AS avg_precision
    FROM a
    """


# ---------------------------------------------------------------------------
# Durbin-Watson statistic of the daily-revenue OLS trend residuals

#: slope/intercept/residual as engine-shared expression TEXT over the
#: double columns (nd, std, sttd, syd, styd, tv, yv). Products are only
#: ever formed in DOUBLE — identical parse trees, no decimal-width
#: divergence between Spark's precision-capping and DuckDB's
#: width-addition rules.
_DW_NUME = "(nd * styd - std * syd)"
_DW_DENE = "(nd * sttd - std * std)"
_DW_B = f"({_DW_NUME} / {_DW_DENE})"
_DW_A = f"((syd - {_DW_B} * std) / nd)"
_DW_E = f"(yv - {_DW_A} - {_DW_B} * tv)"


def ext_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_cents(spark, sf_dir)
    idx = daily.select(
        "day",
        F.col("c").alias("y"),
        F.row_number().over(Window.orderBy("day")).cast("long").alias("t"),
    ).localCheckpoint(eager=False)
    td = F.col("t").cast("decimal(19,0)")
    yd = F.col("y").cast("decimal(19,0)")
    tot = idx.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(td).alias("st"),
        F.sum(td * td).alias("stt"),
        F.sum(yd).alias("sy"),
        F.sum(td * yd).alias("sty"),
    ).select(
        "n_days",
        F.col("n_days").cast("double").alias("nd"),
        F.col("st").cast("double").alias("std"),
        F.col("stt").cast("double").alias("sttd"),
        F.col("sy").cast("double").alias("syd"),
        F.col("sty").cast("double").alias("styd"),
    )
    j = idx.crossJoin(F.broadcast(tot)).select(
        "day",
        "n_days",
        "nd",
        "std",
        "sttd",
        "syd",
        "styd",
        F.col("t").cast("double").alias("tv"),
        F.col("y").cast("double").alias("yv"),
    )
    # residual only when the trend is determined (n >= 2 <=> dene > 0;
    # t is a dense 1..n index so dene = n^2(n^2-1)/12 > 0 exactly then).
    # Whole-cent quantization keeps the rounded value integral in
    # double well past 2^53/1e6 and the long cast exact on BOTH engines
    # (Spark truncates, DuckDB rounds — identical on integral values).
    e0 = F.when(
        F.col("n_days") >= 2, stable_round(F.expr(_DW_E), 0)
    ).cast("long")
    w_lag = Window.orderBy("day")
    r = j.select(
        "day",
        "n_days",
        "nd",
        "std",
        "sttd",
        "syd",
        "styd",
        e0.alias("__e"),
    ).select(
        "*",
        F.lag("__e", 1).over(w_lag).alias("__ep"),
    )
    ed = F.col("__e").cast("decimal(19,0)")
    diff = ed - F.col("__ep")
    fin = r.groupBy("n_days", "nd", "std", "sttd", "syd", "styd").agg(
        F.sum(diff * diff).alias("__num"),
        F.sum(ed * ed).alias("__den"),
    )
    num_d = F.col("__num").cast("double")
    den_d = F.col("__den").cast("double")
    ok = (F.col("n_days") >= 3) & (F.col("__den") > 0)
    return fin.select(
        "n_days",
        F.when(F.col("n_days") >= 2, stable_round(F.expr(_DW_B), 6)).alias(
            "slope_cents"
        ),
        F.when(F.col("n_days") >= 2, stable_round(F.expr(_DW_A), 6)).alias(
            "intercept_cents"
        ),
        F.when(ok, stable_round(num_d / den_d, 6)).alias("dw_stat"),
        F.when(ok, stable_round(F.lit(1.0) - num_d / den_d / F.lit(2.0), 6)).alias(
            "rho_lag1"
        ),
    )


def ext_durbin_watson_oracle() -> str:
    num_d = exact_dec_double_sql("__num")
    den_d = exact_dec_double_sql("__den")
    dw = f"({num_d} / {den_d})"
    ok = "(n_days >= 3 AND __den > 0)"
    return f"""
    WITH daily AS ({_DAILY_CENTS_SQL}),
    idx AS (
        SELECT day, c AS y,
               CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t
        FROM daily
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(COUNT(*) AS DOUBLE) AS nd,
               {exact_dec_double_sql('SUM(CAST(t AS DECIMAL(19,0)))')} AS std,
               {exact_dec_double_sql('SUM(CAST(t AS DECIMAL(19,0)) * t)')} AS sttd,
               {exact_dec_double_sql('SUM(CAST(y AS DECIMAL(19,0)))')} AS syd,
               {exact_dec_double_sql('SUM(CAST(t AS DECIMAL(19,0)) * y)')} AS styd
        FROM idx
    ), j AS (
        SELECT i.day, o.n_days, o.nd, o.std, o.sttd, o.syd, o.styd,
               CAST(i.t AS DOUBLE) AS tv, CAST(i.y AS DOUBLE) AS yv
        FROM idx i, tot o
    ), r AS (
        SELECT day, n_days, nd, std, sttd, syd, styd,
               CAST(CASE WHEN n_days >= 2
                         THEN {stable_round_sql(_DW_E, 0)} END
                    AS BIGINT) AS __e
        FROM j
    ), lagged AS (
        SELECT *, LAG(__e, 1) OVER (ORDER BY day) AS __ep FROM r
    ), fin AS (
        SELECT n_days, nd, std, sttd, syd, styd,
               SUM((CAST(__e AS HUGEINT) - __ep)
                   * (CAST(__e AS HUGEINT) - __ep)) AS __num,
               SUM(CAST(__e AS HUGEINT) * __e) AS __den
        FROM lagged
        GROUP BY n_days, nd, std, sttd, syd, styd
    )
    SELECT n_days,
           CASE WHEN n_days >= 2 THEN {stable_round_sql(_DW_B, 6)} END
               AS slope_cents,
           CASE WHEN n_days >= 2 THEN {stable_round_sql(_DW_A, 6)} END
               AS intercept_cents,
           CASE WHEN {ok} THEN {stable_round_sql(dw, 6)} END AS dw_stat,
           CASE WHEN {ok}
                THEN {stable_round_sql(f"(1e0 - {dw} / 2e0)", 6)} END
               AS rho_lag1
    FROM fin
    """
