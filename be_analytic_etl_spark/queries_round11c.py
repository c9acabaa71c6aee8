"""Round-11 extension queries, batch 2: the experiment-DESIGN panel
that completes the experimentation family (CUPED, permutation test,
growth accounting, SRM belongs here too):

- ``ext_effect_size_power``: Cohen's d / Hedges' g standardized effect
  size of the en-vs-rest quality contrast (Cohen 1988; Hedges 1981)
  with the large-sample SE of d and the 80%-power minimum detectable
  effect at alpha = 0.05 (two z constants host-quantized, as all
  engine-external constants are) — the DESIGN companion to
  ``ext_welch_ttest``'s inference.
- ``ext_srm_check``: sample-ratio-mismatch chi-square of the
  deterministic 90/5/5 hash split against its declared ratios
  (Fabijan et al., "Diagnosing sample ratio mismatch", KDD 2019) —
  the assignment-health gate every experiment pipeline runs first.
- ``ext_odds_ratio``: the 2x2 en x high-quality association panel:
  odds ratio, log-OR with its Woolf (1955) normal-approximation CI
  halfwidth, and relative risk — the epidemiology-style effect
  readout beside the chi-square family.
- ``ext_rater_agreement``: multi-rater agreement of three independent
  binary quality raters (length / token-count / sentence-mark rules):
  Fleiss' kappa (Fleiss 1971) and Cochran's Q (Cochran 1950) from ONE
  (n_pos x per-rater-totals) fold — the k-rater generalization of
  ``ext_cohens_kappa`` and the blocked-binary sibling of
  ``ext_friedman``.

Scale shapes: each query is ONE partial-aggregated corpus pass into a
1-row or <= 4-row moment/contingency frame; every statistic is then
closed-form algebra on that frame. No second scan, no sort, no
driver-side math on unbounded data.

Float discipline (SCALE.md): counts/sums exact BIGINT/DECIMAL; emitted
doubles are single fixed-order IEEE chains of exact operands quantized
at 6dp at the source; sqrt only (IEEE-exact) except the documented
log-OR ln, quantized at 6dp like every libm term; divisions guarded at
the DIVISION (``x / F.when(d > 0, d)``, oracle CASE/NULLIF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from be_analytic_etl_spark.functions.rounding import (
    stable_round,
    stable_round_sql,
)
from be_analytic_etl_spark.queries_extensions import _TOKS, _bucket_sql, _t
from be_analytic_etl_spark.queries_round9 import _q6, _q6_cte
from be_analytic_etl_spark.registry import register

# Host-quantized standard-normal quantiles (engine-external constants,
# embedded as identical literals in both plans): z_{0.975} and z_{0.8}.
_Z975 = 1.959964
_Z80 = 0.841621


# ---------------------------------------------------------------------------
# Cohen's d / Hedges' g + SE + minimum detectable effect, en vs rest.


def q_ext_effect_size_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    en = F.coalesce(F.col("lang") == "en", F.lit(False)).cast("int")
    scored = docs.select(en.alias("__en"), _q6())
    # two-stage fold (the welch_ttest shape): the per-group moment agg
    # keeps the large quality-score expression OUT of the conditional
    # aggregates — a single wide agg with 6 q6-carrying branches blows
    # the JIT method limit and falls out of codegen (measured: 9 s flat
    # vs 1 s; the fallback compile retry dominates at every SF).
    grouped = scored.groupBy("__en").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__q6").alias("__s"),
        F.sum(F.col("__q6") * F.col("__q6")).alias("__q"),
    )
    per = grouped.groupBy().agg(
        *[
            agg
            for g in (1, 0)
            for agg in (
                F.coalesce(
                    F.max(F.when(F.col("__en") == g, F.col("__n"))),
                    F.lit(0).cast("long"),
                ).alias(f"n{g}"),
                F.max(F.when(F.col("__en") == g, F.col("__s"))).alias(
                    f"s{g}"
                ),
                F.max(F.when(F.col("__en") == g, F.col("__q"))).alias(
                    f"q{g}"
                ),
            )
        ]
    )

    def stats(n, s, q):
        nd = F.col(n).cast("double")
        m = F.col(s).cast("double") / nd
        v = (F.col(q).cast("double") - nd * m * m) / (nd - F.lit(1.0))
        return nd, m, v

    n1, m1, v1 = stats("n1", "s1", "q1")
    n0, m0, v0 = stats("n0", "s0", "q0")
    dfree = n1 + n0 - F.lit(2.0)
    pooled = ((n1 - F.lit(1.0)) * v1 + (n0 - F.lit(1.0)) * v0) / dfree
    d = (m1 - m0) / F.sqrt(F.when(pooled > 0, pooled))
    g = d * (F.lit(1.0) - F.lit(3.0) / (F.lit(4.0) * dfree - F.lit(1.0)))
    se_d = F.sqrt(
        (n1 + n0) / (n1 * n0) + d * d / (F.lit(2.0) * (n1 + n0))
    )
    se2 = v1 / n1 + v0 / n0
    mde = F.lit(_Z975 + _Z80) * F.sqrt(F.when(se2 > 0, se2))
    ok = (F.col("n1") >= 2) & (F.col("n0") >= 2)
    return per.select(
        F.col("n1").alias("n_en"),
        F.col("n0").alias("n_rest"),
        F.when(ok, stable_round(m1 - m0, 6)).alias("mean_diff"),
        F.when(ok, stable_round(d, 6)).alias("cohens_d"),
        F.when(ok, stable_round(g, 6)).alias("hedges_g"),
        F.when(ok, stable_round(se_d, 6)).alias("se_d"),
        F.when(ok, stable_round(mde, 6)).alias("mde_80"),
    )


def _effect_size_oracle() -> str:
    def stats(n, s, q):
        nd = f"CAST({n} AS DOUBLE)"
        m = f"(CAST({s} AS DOUBLE) / {nd})"
        v = f"((CAST({q} AS DOUBLE) - {nd} * {m} * {m}) / ({nd} - 1.0))"
        return nd, m, v

    n1, m1, v1 = stats("n1", "s1", "q1")
    n0, m0, v0 = stats("n0", "s0", "q0")
    dfree = f"({n1} + {n0} - 2.0)"
    pooled = f"((({n1} - 1.0) * {v1} + ({n0} - 1.0) * {v0}) / {dfree})"
    d = f"(({m1} - {m0}) / sqrt(CASE WHEN {pooled} > 0 THEN {pooled} END))"
    g = f"({d} * (1.0 - 3.0 / (4.0 * {dfree} - 1.0)))"
    se_d = (
        f"sqrt(({n1} + {n0}) / ({n1} * {n0})"
        f" + {d} * {d} / (2.0 * ({n1} + {n0})))"
    )
    se2 = f"({v1} / {n1} + {v0} / {n0})"
    mde = f"({_Z975 + _Z80!r} * sqrt(CASE WHEN {se2} > 0 THEN {se2} END))"
    return f"""
    WITH {_q6_cte()}, scored AS (
        SELECT CASE WHEN COALESCE(lang = 'en', FALSE) THEN 1 ELSE 0 END
                   AS __en,
               __q6
        FROM sq
    ), per AS (
        SELECT COALESCE(CAST(SUM(__en) AS BIGINT), 0) AS n1,
               SUM(CASE WHEN __en = 1 THEN __q6 END) AS s1,
               SUM(CASE WHEN __en = 1 THEN __q6 * __q6 END) AS q1,
               COALESCE(CAST(SUM(1 - __en) AS BIGINT), 0) AS n0,
               SUM(CASE WHEN __en = 0 THEN __q6 END) AS s0,
               SUM(CASE WHEN __en = 0 THEN __q6 * __q6 END) AS q0
        FROM scored
    )
    SELECT n1 AS n_en, n0 AS n_rest,
           CASE WHEN n1 >= 2 AND n0 >= 2
                THEN {stable_round_sql(f"({m1} - {m0})", 6)} END AS mean_diff,
           CASE WHEN n1 >= 2 AND n0 >= 2
                THEN {stable_round_sql(d, 6)} END AS cohens_d,
           CASE WHEN n1 >= 2 AND n0 >= 2
                THEN {stable_round_sql(g, 6)} END AS hedges_g,
           CASE WHEN n1 >= 2 AND n0 >= 2
                THEN {stable_round_sql(se_d, 6)} END AS se_d,
           CASE WHEN n1 >= 2 AND n0 >= 2
                THEN {stable_round_sql(mde, 6)} END AS mde_80
    FROM per
    """


register(
    "ext_effect_size_power", q_ext_effect_size_power, _effect_size_oracle()
)


# ---------------------------------------------------------------------------
# Sample-ratio-mismatch: chi-square GOF of the 90/5/5 hash split.
# Expected counts are exact rationals n * {9000, 500, 500} / 10000; each
# (O-E)^2/E term is one fixed IEEE chain of exact integers (magnitude
# <= n: below the 6dp pass-through threshold up to ~9e9 rows, the
# ext_mood_median documented bound), and the 3-term fold is WITHIN one
# row — no cross-row double accumulation at all.

_SRM_MILLI = {"train": 9000, "val": 500, "test": 500}


def q_ext_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from be_analytic_etl_spark.operators.sampling import assign_split

    docs = _t(spark, sf_dir, "documents")
    tagged = docs.select(assign_split("doc_id").alias("__s"))
    per = tagged.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[
            F.sum(F.when(F.col("__s") == name, 1).otherwise(0))
            .cast("long")
            .alias(f"n_{name}")
            for name in _SRM_MILLI
        ],
    )

    def cell(name):
        ed = (F.col("n") * F.lit(_SRM_MILLI[name])).cast("double") / F.lit(
            10000.0
        )
        od = F.col(f"n_{name}").cast("double")
        return (od - ed) * (od - ed) / F.when(ed > 0, ed)

    chi2 = cell("train") + cell("val") + cell("test")
    return per.select(
        F.col("n").alias("n_docs"),
        "n_train",
        "n_val",
        "n_test",
        stable_round(chi2, 6).alias("srm_chi2"),
        F.lit(2).alias("df"),
    )


def _srm_oracle() -> str:
    def cell(name):
        ed = f"(CAST(n * {_SRM_MILLI[name]} AS DOUBLE) / 10000.0)"
        od = f"CAST(n_{name} AS DOUBLE)"
        return (
            f"(({od} - {ed}) * ({od} - {ed})"
            f" / (CASE WHEN {ed} > 0 THEN {ed} END))"
        )

    chi2 = f"({cell('train')} + {cell('val')} + {cell('test')})"
    b = _bucket_sql("split")
    return f"""
    WITH tagged AS (
        SELECT CASE WHEN {b} < 9000 THEN 'train'
                    WHEN {b} < 9500 THEN 'val'
                    ELSE 'test' END AS __s
        FROM documents
    ), per AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN __s = 'train' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_train,
               CAST(SUM(CASE WHEN __s = 'val' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_val,
               CAST(SUM(CASE WHEN __s = 'test' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_test
        FROM tagged
    )
    SELECT n AS n_docs, n_train, n_val, n_test,
           {stable_round_sql(chi2, 6)} AS srm_chi2,
           2 AS df
    FROM per
    """


register("ext_srm_check", q_ext_srm_check, _srm_oracle())


# ---------------------------------------------------------------------------
# 2x2 odds-ratio panel: en x high-quality (q6 >= 0.5).


def q_ext_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    en = F.coalesce(F.col("lang") == "en", F.lit(False))
    scored = docs.select(
        en.alias("__en"), (_q6() >= F.lit(0.5)).alias("__hi")
    )
    per = scored.groupBy().agg(
        *[
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)
            for name, cond in (
                ("a", F.col("__en") & F.col("__hi")),
                ("b", F.col("__en") & ~F.col("__hi")),
                ("c", ~F.col("__en") & F.col("__hi")),
                ("d", ~F.col("__en") & ~F.col("__hi")),
            )
        ]
    )
    ad_, bc_ = (
        F.col("a").cast("double") * F.col("d").cast("double"),
        F.col("b").cast("double") * F.col("c").cast("double"),
    )
    orr = ad_ / F.when(bc_ > 0, bc_)
    log_or = F.log(orr)
    inv_sum = sum(
        F.lit(1.0) / F.when(F.col(k) > 0, F.col(k)).cast("double")
        for k in ("a", "b", "c", "d")
    )
    ci = F.lit(_Z975) * F.sqrt(inv_sum)
    r1 = (F.col("a") + F.col("b")).cast("double")
    r0 = (F.col("c") + F.col("d")).cast("double")
    risk1 = F.col("a").cast("double") / F.when(r1 > 0, r1)
    risk0 = F.col("c").cast("double") / F.when(r0 > 0, r0)
    rr = risk1 / F.when(risk0 > 0, risk0)
    return per.select(
        F.col("a").alias("n_en_hi"),
        F.col("b").alias("n_en_lo"),
        F.col("c").alias("n_rest_hi"),
        F.col("d").alias("n_rest_lo"),
        stable_round(orr, 6).alias("odds_ratio"),
        F.when(orr > 0, stable_round(log_or, 6)).alias("log_or"),
        stable_round(ci, 6).alias("ci_log_halfwidth"),
        stable_round(rr, 6).alias("relative_risk"),
    )


def _odds_ratio_oracle() -> str:
    ad_ = "(CAST(a AS DOUBLE) * CAST(d AS DOUBLE))"
    bc_ = "(CAST(b AS DOUBLE) * CAST(c AS DOUBLE))"
    orr = f"({ad_} / (CASE WHEN {bc_} > 0 THEN {bc_} END))"
    inv = " + ".join(
        f"1.0 / CAST(CASE WHEN {k} > 0 THEN {k} END AS DOUBLE)"
        for k in "abcd"
    )
    ci = f"({_Z975!r} * sqrt({inv}))"
    r1 = "CAST(a + b AS DOUBLE)"
    r0 = "CAST(c + d AS DOUBLE)"
    risk1 = f"(CAST(a AS DOUBLE) / (CASE WHEN {r1} > 0 THEN {r1} END))"
    risk0 = f"(CAST(c AS DOUBLE) / (CASE WHEN {r0} > 0 THEN {r0} END))"
    rr = f"({risk1} / (CASE WHEN {risk0} > 0 THEN {risk0} END))"
    return f"""
    WITH {_q6_cte()}, scored AS (
        SELECT COALESCE(lang = 'en', FALSE) AS __en,
               (__q6 >= 0.5) AS __hi
        FROM sq
    ), per AS (
        SELECT CAST(SUM(CASE WHEN __en AND __hi THEN 1 ELSE 0 END)
                    AS BIGINT) AS a,
               CAST(SUM(CASE WHEN __en AND NOT __hi THEN 1 ELSE 0 END)
                    AS BIGINT) AS b,
               CAST(SUM(CASE WHEN NOT __en AND __hi THEN 1 ELSE 0 END)
                    AS BIGINT) AS c,
               CAST(SUM(CASE WHEN NOT __en AND NOT __hi THEN 1 ELSE 0 END)
                    AS BIGINT) AS d
        FROM scored
    )
    SELECT a AS n_en_hi, b AS n_en_lo, c AS n_rest_hi, d AS n_rest_lo,
           {stable_round_sql(orr, 6)} AS odds_ratio,
           CASE WHEN {orr} > 0
                THEN {stable_round_sql(f"ln({orr})", 6)} END AS log_or,
           {stable_round_sql(ci, 6)} AS ci_log_halfwidth,
           {stable_round_sql(rr, 6)} AS relative_risk
    FROM per
    """


register("ext_odds_ratio", q_ext_odds_ratio, _odds_ratio_oracle())


# ---------------------------------------------------------------------------
# Multi-rater agreement: Fleiss' kappa + Cochran's Q of three binary
# quality raters, from one (n_pos -> counts + per-rater totals) fold.
# With r = 3 raters and 2 categories, item agreement is
# P_i = (n_pos(n_pos-1) + (3-n_pos)(2-n_pos)) / 6 — a pure function of
# n_pos, so the whole corpus collapses to a <= 4-row histogram.


def q_ext_rater_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from be_analytic_etl_spark.operators.textstats import token_count

    txt = F.coalesce(F.col("text"), F.lit(""))
    r1 = (F.coalesce(F.col("n_chars"), F.lit(0)) >= 100).cast("int")
    docs = _t(spark, sf_dir, "documents")
    rated = docs.select(
        r1.alias("__r1"),
        (token_count("text") >= 20).cast("int").alias("__r2"),
        (F.instr(txt, ".") > 0).cast("int").alias("__r3"),
    ).select(
        "__r1",
        "__r2",
        "__r3",
        (F.col("__r1") + F.col("__r2") + F.col("__r3")).alias("__np"),
    )
    hist = rated.groupBy("__np").agg(
        F.count(F.lit(1)).cast("long").alias("__c"),
        F.sum("__r1").cast("long").alias("__t1"),
        F.sum("__r2").cast("long").alias("__t2"),
        F.sum("__r3").cast("long").alias("__t3"),
    )
    agree_w = F.col("__np") * (F.col("__np") - 1) + (
        F.lit(3) - F.col("__np")
    ) * (F.lit(2) - F.col("__np"))
    fold = hist.groupBy().agg(
        F.sum("__c").cast("long").alias("n_docs"),
        F.sum(F.col("__c") * agree_w).cast("long").alias("__aw"),
        F.sum(F.col("__c") * F.col("__np")).cast("long").alias("__s1"),
        F.sum(F.col("__c") * F.col("__np") * F.col("__np"))
        .cast("long")
        .alias("__s2"),
        F.sum("__t1").cast("long").alias("r1_pos"),
        F.sum("__t2").cast("long").alias("r2_pos"),
        F.sum("__t3").cast("long").alias("r3_pos"),
    )
    nd = F.col("n_docs").cast("double")
    pbar = F.col("__aw").cast("double") / (F.lit(6.0) * nd)
    p = F.col("__s1").cast("double") / (F.lit(3.0) * nd)
    pe = p * p + (F.lit(1.0) - p) * (F.lit(1.0) - p)
    kden = F.lit(1.0) - pe
    kappa = (pbar - pe) / F.when(kden > 0, kden)
    csq = sum(
        F.col(k).cast("double") * F.col(k).cast("double")
        for k in ("r1_pos", "r2_pos", "r3_pos")
    )
    t = F.col("__s1").cast("double")
    qden = F.lit(3.0) * t - F.col("__s2").cast("double")
    q = F.lit(2.0) * (F.lit(3.0) * csq - t * t) / F.when(qden > 0, qden)
    ok = F.col("n_docs") > 0
    return fold.select(
        "n_docs",
        "r1_pos",
        "r2_pos",
        "r3_pos",
        F.when(ok, stable_round(kappa, 6)).alias("fleiss_kappa"),
        F.when(ok, stable_round(q, 6)).alias("cochran_q"),
    )


def _rater_oracle() -> str:
    nd = "CAST(n_docs AS DOUBLE)"
    pbar = f"(CAST(__aw AS DOUBLE) / (6.0 * {nd}))"
    p = f"(CAST(__s1 AS DOUBLE) / (3.0 * {nd}))"
    pe = f"({p} * {p} + (1.0 - {p}) * (1.0 - {p}))"
    kden = f"(1.0 - {pe})"
    kappa = f"(({pbar} - {pe}) / (CASE WHEN {kden} > 0 THEN {kden} END))"
    csq = " + ".join(
        f"CAST({k} AS DOUBLE) * CAST({k} AS DOUBLE)"
        for k in ("r1_pos", "r2_pos", "r3_pos")
    )
    t = "CAST(__s1 AS DOUBLE)"
    qden = f"(3.0 * {t} - CAST(__s2 AS DOUBLE))"
    q = (
        f"(2.0 * (3.0 * ({csq}) - {t} * {t})"
        f" / (CASE WHEN {qden} > 0 THEN {qden} END))"
    )
    return f"""
    WITH rated AS (
        SELECT CASE WHEN COALESCE(n_chars, 0) >= 100 THEN 1 ELSE 0 END
                   AS r1,
               CASE WHEN len({_TOKS}) >= 20 THEN 1 ELSE 0 END AS r2,
               CASE WHEN instr(COALESCE(text, ''), '.') > 0 THEN 1 ELSE 0
                   END AS r3
        FROM documents
    ), rr AS (SELECT r1, r2, r3, r1 + r2 + r3 AS np FROM rated),
    hist AS (
        SELECT np, CAST(COUNT(*) AS BIGINT) AS c,
               CAST(SUM(r1) AS BIGINT) AS t1,
               CAST(SUM(r2) AS BIGINT) AS t2,
               CAST(SUM(r3) AS BIGINT) AS t3
        FROM rr GROUP BY 1
    ), fold AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n_docs,
               CAST(SUM(c * (np * (np - 1) + (3 - np) * (2 - np)))
                    AS BIGINT) AS __aw,
               CAST(SUM(c * np) AS BIGINT) AS __s1,
               CAST(SUM(c * np * np) AS BIGINT) AS __s2,
               CAST(SUM(t1) AS BIGINT) AS r1_pos,
               CAST(SUM(t2) AS BIGINT) AS r2_pos,
               CAST(SUM(t3) AS BIGINT) AS r3_pos
        FROM hist
    )
    SELECT n_docs, r1_pos, r2_pos, r3_pos,
           CASE WHEN n_docs > 0
                THEN {stable_round_sql(kappa, 6)} END AS fleiss_kappa,
           CASE WHEN n_docs > 0
                THEN {stable_round_sql(q, 6)} END AS cochran_q
    FROM fold
    """


register("ext_rater_agreement", q_ext_rater_agreement, _rater_oracle())
