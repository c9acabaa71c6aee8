"""Round-8 extension queries.

The mergeable-sketch and drift/monitoring gaps the round-7 window plan
named (registry.py "Round-8 window plan"), plus ranking-eval and
PII-audit companions to the existing eval family:

- ``ext_tdigest_quantiles``: deterministic t-digest-style quantile
  summary (Dunning & Ertl 2019 arcsine scale function) over the order
  value distribution — the planned "t-digest-style mergeable quantile
  sketch with a portable oracle". Host-quantized boundaries make the
  digest order-free and bit-identical cross-engine.
- ``ext_kmins_distinct``: k-mins cardinality sketch (Cohen, JCSS 1997)
  per event type + the merged ALL row — the mergeable distinct-count
  companion to HLL that a SQL oracle can replay exactly.
- ``ext_psi_drift``: Population Stability Index of each source's
  quality-score decile distribution vs the corpus blend — the
  binned-drift gauge production scorecards alarm on, beside the
  token-level ``ext_mixture_kl`` / ``ext_jensen_shannon``.
- ``ext_benford_digits``: first-significant-digit audit of order
  totals vs Benford's law (Benford 1938; Nigrini's fraud-screen usage)
  — a data-quality screen over any financial fact column.
- ``ext_cusum_changepoint``: Page's CUSUM (Biometrika 1954) over the
  daily revenue series — integer-exact single-changepoint location.
- ``ext_lift_curve``: cumulative gains / lift by score decile — the
  campaign-targeting read of the same classifier ``ext_roc_auc`` and
  ``ext_calibration_ece`` grade.
- ``ext_ndcg``: NDCG@10 of the exact cosine retrieval against the
  stored class labels (Järvelin & Kekäläinen, TOIS 2002) — the graded
  ranking metric beside the recall-style ANN evals.
- ``ext_pii_audit``: per-source PII incidence rates (emails / long
  digit runs) using the SAME patterns ``ext_redact`` scrubs with — the
  measurement half of the redaction pair.

Float discipline (SCALE.md, all five divergence classes checked):
corpus accumulations are BIGINT/DECIMAL exact; libm terms (ln) quantize
via ``stable_round`` to DECIMAL(18,6) BEFORE any sum; constants that
would need libm inside the engines (t-digest boundaries, Benford
expectations, DCG discounts) are quantized HOST-side and embedded as
identical literals in both plans; emitted doubles are single IEEE
divisions of exact integers/decimals or quantized at the source.
"""

from __future__ import annotations

import math
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from be_analytic_etl_spark.functions.rounding import stable_round, stable_round_sql
from be_analytic_etl_spark.operators import textstats as T
from be_analytic_etl_spark.queries_extensions import _dot_sql, _t
from be_analytic_etl_spark.registry import register

# ---------------------------------------------------------------------------
# t-digest-style quantile summary of the order value distribution.
_TD_DELTA = 32


def q_ext_tdigest_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from be_analytic_etl_spark.operators.sketches import tdigest_clusters

    orders = _t(spark, sf_dir, "orders")
    vals = orders.select(
        F.floor("o_totalprice").cast("long").alias("v")
    )
    return tdigest_clusters(vals, "v", delta=_TD_DELTA)


def _tdigest_oracle() -> str:
    from be_analytic_etl_spark.operators.sketches import tdigest_clusters_sql

    rows = "SELECT CAST(FLOOR(o_totalprice) AS BIGINT) AS v FROM orders"
    return "WITH " + tdigest_clusters_sql(rows, delta=_TD_DELTA).strip()


register("ext_tdigest_quantiles", q_ext_tdigest_quantiles, _tdigest_oracle())


# ---------------------------------------------------------------------------
# k-mins distinct-count sketch per event type + merged ALL row.
_KM_K = 64


def q_ext_kmins_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from be_analytic_etl_spark.operators.sketches import kmins_distinct

    events = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    return kmins_distinct(events, "event_type", "user_id", k=_KM_K)


def _kmins_oracle() -> str:
    from be_analytic_etl_spark.operators.sketches import kmins_distinct_sql

    rows = (
        "SELECT event_type AS scope, CAST(user_id AS VARCHAR) AS item"
        " FROM events WHERE user_id IS NOT NULL"
    )
    return "WITH " + kmins_distinct_sql(rows, k=_KM_K).strip()


register("ext_kmins_distinct", q_ext_kmins_distinct, _kmins_oracle())


# ---------------------------------------------------------------------------
# CUSUM changepoint over the daily event-revenue series (exact cents).


def q_ext_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from be_analytic_etl_spark.operators.timeseries import cusum_changepoint

    events = _t(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    return cusum_changepoint(
        events.select("ts", cents.alias("cents")), "ts", "cents"
    )


def _cusum_oracle() -> str:
    from be_analytic_etl_spark.operators.timeseries import cusum_changepoint_sql

    rows = (
        "SELECT CAST(ts AS DATE) AS day,"
        " CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents"
        " FROM events"
    )
    return "WITH " + cusum_changepoint_sql(rows).strip()


register("ext_cusum_changepoint", q_ext_cusum_changepoint, _cusum_oracle())


# ---------------------------------------------------------------------------
# Population Stability Index per source over quality-score deciles.
# PSI = sum_b (p_b - q_b) * ln(p_b / q_b) with Laplace-smoothed bin
# shares (so empty bins never hit ln 0). Corpus work = one
# partial-aggregated groupBy(source, bin); the |sources| x 10 grid and
# the fold are control-plane sized. p, q are exact-integer-ratio
# doubles; each ln term quantizes to DECIMAL(18,6) BEFORE the
# 10-term sum (the mixture_kl discipline).
_PSI_BINS = 10


def _psi_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    q6 = (
        stable_round(T.quality_score("text", round_to=None), 6)
        .cast("decimal(18,6)")
        .alias("score")
    )
    b = F.least(
        F.floor(F.col("score") * _PSI_BINS).cast("int"),
        F.lit(_PSI_BINS - 1),
    )
    return docs.select("source", q6).select("source", b.alias("bin"))


def q_ext_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    binned = _psi_scored(spark, sf_dir)
    sb = binned.groupBy("source", "bin").agg(
        F.count(F.lit(1)).cast("long").alias("__c_sb")
    )
    per_src = sb.groupBy("source").agg(
        F.sum("__c_sb").cast("long").alias("__n_s")
    )
    per_bin = sb.groupBy("bin").agg(
        F.sum("__c_sb").cast("long").alias("__c_b")
    )
    tot = per_src.agg(F.sum("__n_s").cast("long").alias("__n"))
    grid = per_src.select(
        "source",
        "__n_s",
        F.explode(F.sequence(F.lit(0), F.lit(_PSI_BINS - 1))).alias("bin"),
    )
    j = (
        grid.join(sb, ["source", "bin"], "left")
        .join(F.broadcast(per_bin), "bin", "left")
        .crossJoin(F.broadcast(tot))
        .fillna(0, subset=["__c_sb", "__c_b"])
    )
    p = (F.col("__c_sb") + 1).cast("double") / (
        F.col("__n_s") + _PSI_BINS
    ).cast("double")
    q = (F.col("__c_b") + 1).cast("double") / (
        F.col("__n") + _PSI_BINS
    ).cast("double")
    term = stable_round((p - q) * F.log(p / q), 6).cast("decimal(18,6)")
    return (
        j.groupBy("source")
        .agg(
            F.max("__n_s").alias("n_docs"),
            F.sum(term).alias("__psi"),
        )
        .select("source", "n_docs", F.col("__psi").cast("double").alias("psi"))
    )


def _psi_oracle() -> str:
    from be_analytic_etl_spark.queries_analytics import (
        _QSCORE_SQL,
        qscore_feature_ctes,
    )

    p = f"(CAST(__c_sb + 1 AS DOUBLE) / CAST(__n_s + {_PSI_BINS} AS DOUBLE))"
    q = f"(CAST(__c_b + 1 AS DOUBLE) / CAST(__n + {_PSI_BINS} AS DOUBLE))"
    term = stable_round_sql(f"({p} - {q}) * ln({p} / {q})", 6)
    return f"""
    WITH {qscore_feature_ctes('source')}, sc AS (
        SELECT source,
               LEAST(CAST(FLOOR(
                   CAST({stable_round_sql(_QSCORE_SQL, 6)} AS DECIMAL(18,6))
                   * {_PSI_BINS}) AS INTEGER), {_PSI_BINS - 1}) AS bin
        FROM m
    ), sb AS (
        SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS __c_sb
        FROM sc GROUP BY 1, 2
    ), per_src AS (
        SELECT source, CAST(SUM(__c_sb) AS BIGINT) AS __n_s
        FROM sb GROUP BY 1
    ), per_bin AS (
        SELECT bin, CAST(SUM(__c_sb) AS BIGINT) AS __c_b FROM sb GROUP BY 1
    ), tot AS (SELECT CAST(SUM(__n_s) AS BIGINT) AS __n FROM per_src),
    grid AS (
        SELECT s.source, s.__n_s, CAST(r.b AS INTEGER) AS bin
        FROM per_src s, range(0, {_PSI_BINS}) r(b)
    ), j AS (
        SELECT g.source, g.__n_s,
               COALESCE(sb.__c_sb, 0) AS __c_sb,
               COALESCE(pb.__c_b, 0) AS __c_b,
               t.__n
        FROM grid g
        LEFT JOIN sb ON sb.source = g.source AND sb.bin = g.bin
        LEFT JOIN per_bin pb ON pb.bin = g.bin
        CROSS JOIN tot t
    )
    SELECT source, MAX(__n_s) AS n_docs,
           CAST(SUM(CAST({term} AS DECIMAL(18,6))) AS DOUBLE) AS psi
    FROM j GROUP BY source
    """


register("ext_psi_drift", q_ext_psi_drift, _psi_oracle())


# ---------------------------------------------------------------------------
# Benford first-significant-digit audit of order totals. Expected
# shares log10(1 + 1/d) are HOST-quantized to 6dp and embedded as
# identical double literals in both plans — no engine libm. freq is an
# exact-count ratio (one IEEE division); abs_dev quantizes at the
# source.
_BENFORD_P6 = [
    math.floor(math.log10(1.0 + 1.0 / d) * 1_000_000 + 0.5) / 1_000_000
    for d in range(1, 10)
]


def q_ext_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    v = F.floor("o_totalprice").cast("long")
    digits = (
        orders.select(v.alias("__v"))
        .filter(F.col("__v") >= 1)
        .select(
            F.substring(F.col("__v").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
    )
    counts = digits.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    tot = digits.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    grid = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    expected = F.element_at(
        F.array(*[F.lit(p) for p in _BENFORD_P6]), F.col("digit")
    )
    j = (
        grid.join(counts, "digit", "left")
        .fillna(0, subset=["cnt"])
        .crossJoin(F.broadcast(tot))
    )
    freq = F.col("cnt").cast("double") / F.col("__n").cast("double")
    return j.select(
        "digit",
        "cnt",
        freq.alias("freq"),
        expected.alias("expected"),
        stable_round(F.abs(freq - expected), 6).alias("abs_dev"),
    ).orderBy("digit")


def _benford_oracle() -> str:
    arr = "[" + ", ".join(repr(p) for p in _BENFORD_P6) + "]"
    freq = "(CAST(cnt AS DOUBLE) / CAST(__n AS DOUBLE))"
    dev = stable_round_sql(f"ABS({freq} - {arr}[digit])", 6)
    return f"""
    WITH d AS (
        SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                   AS VARCHAR), 1, 1) AS INTEGER) AS digit
        FROM orders WHERE FLOOR(o_totalprice) >= 1
    ), c AS (
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS cnt FROM d GROUP BY 1
    ), t AS (SELECT CAST(COUNT(*) AS BIGINT) AS __n FROM d),
    g AS (SELECT CAST(r.dg AS INTEGER) AS digit FROM range(1, 10) r(dg))
    SELECT g.digit, COALESCE(c.cnt, 0) AS cnt,
           CAST(COALESCE(c.cnt, 0) AS DOUBLE) / CAST(t.__n AS DOUBLE) AS freq,
           {arr}[g.digit] AS expected,
           {stable_round_sql(f"ABS(CAST(COALESCE(c.cnt, 0) AS DOUBLE) / CAST(t.__n AS DOUBLE) - {arr}[g.digit])", 6)}
               AS abs_dev
    FROM g LEFT JOIN c ON c.digit = g.digit CROSS JOIN t
    """


register("ext_benford_digits", q_ext_benford_digits, _benford_oracle())


# ---------------------------------------------------------------------------
# Cumulative gains / lift by quality-score decile — the targeting read
# of the calibration classifier. All accumulations are exact counts;
# gain and lift are single IEEE divisions of exact BIGINT products
# (cum_pos * n <= n^2 < 2^63 up to ~3e9 rows; beyond that the products
# move to DECIMAL — documented in SCALE.md).


def q_ext_lift_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from be_analytic_etl_spark.queries_round7 import _scored

    sc = _scored(spark, sf_dir)
    b = F.least(
        F.floor(F.col("score") * _PSI_BINS).cast("int"), F.lit(_PSI_BINS - 1)
    )
    bins = (
        sc.filter(F.col("score").isNotNull())
        .groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_b"),
            F.sum("pos").cast("long").alias("pos_b"),
        )
    )
    w_desc = Window.orderBy(F.col("bin").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy()
    cum = bins.select(
        "bin",
        "n_b",
        "pos_b",
        F.sum("n_b").over(w_desc).cast("long").alias("cum_n"),
        F.sum("pos_b").over(w_desc).cast("long").alias("cum_pos"),
        F.sum("n_b").over(w_all).cast("long").alias("__n"),
        F.sum("pos_b").over(w_all).cast("long").alias("__pos"),
    )
    gain = F.when(
        F.col("__pos") > 0,
        F.col("cum_pos").cast("double") / F.col("__pos").cast("double"),
    )
    lift = F.when(
        (F.col("__pos") > 0) & (F.col("cum_n") > 0),
        (F.col("cum_pos") * F.col("__n")).cast("double")
        / (F.col("cum_n") * F.col("__pos")).cast("double"),
    )
    return cum.select(
        "bin", "n_b", "pos_b", "cum_n", "cum_pos",
        gain.alias("gain"), lift.alias("lift"),
    )


def _lift_oracle() -> str:
    from be_analytic_etl_spark.queries_round7 import _scored_sql

    return f"""
    {_scored_sql()}, lb AS (
        SELECT LEAST(CAST(FLOOR(score * {_PSI_BINS}) AS INTEGER),
                     {_PSI_BINS - 1}) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n_b,
               CAST(SUM(pos) AS BIGINT) AS pos_b
        FROM sc WHERE score IS NOT NULL GROUP BY 1
    ), lc AS (
        SELECT bin, n_b, pos_b,
               CAST(SUM(n_b) OVER (ORDER BY bin DESC) AS BIGINT) AS cum_n,
               CAST(SUM(pos_b) OVER (ORDER BY bin DESC) AS BIGINT) AS cum_pos,
               CAST(SUM(n_b) OVER () AS BIGINT) AS __n,
               CAST(SUM(pos_b) OVER () AS BIGINT) AS __pos
        FROM lb
    )
    SELECT bin, n_b, pos_b, cum_n, cum_pos,
           CASE WHEN __pos > 0
                THEN CAST(cum_pos AS DOUBLE) / CAST(__pos AS DOUBLE)
                END AS gain,
           CASE WHEN __pos > 0 AND cum_n > 0
                THEN CAST(cum_pos * __n AS DOUBLE)
                     / CAST(cum_n * __pos AS DOUBLE) END AS lift
    FROM lc
    """


register("ext_lift_curve", q_ext_lift_curve, _lift_oracle())


# ---------------------------------------------------------------------------
# NDCG@10 of the exact cosine retrieval against stored class labels.
# DCG discounts 1/log2(i+1) and their prefix sums (the IDCG table) are
# HOST-quantized 6dp decimals embedded identically in both plans; DCG
# accumulates as an exact DECIMAL sum of at most k terms; n_rel is an
# exact count; ndcg is one IEEE division of two exact decimals.
_NDCG_K = 10
_NDCG_W6 = [
    Decimal(
        math.floor(1_000_000 / math.log2(i + 1) + 0.5)
    ) / Decimal(1_000_000)
    for i in range(1, _NDCG_K + 1)
]
_NDCG_PREFIX = [sum(_NDCG_W6[: r + 1], Decimal(0)) for r in range(_NDCG_K)]


def q_ext_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from be_analytic_etl_spark.operators import similarity as S

    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    topk = S.brute_force_topk(emb, probes, k=_NDCG_K, round_to=None)
    qlab = emb.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("__ql")
    )
    nlab = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("__nl")
    )
    j = topk.join(F.broadcast(qlab), "query_id").join(
        F.broadcast(nlab), "neighbor_id"
    )
    warr = F.array(
        *[F.lit(w).cast("decimal(18,6)") for w in _NDCG_W6]
    )
    rel = F.col("__nl").eqNullSafe(F.col("__ql")).cast("int")
    per = j.groupBy("query_id").agg(
        F.max("__ql").alias("__ql"),
        F.sum(
            rel.cast("decimal(18,6)") * F.element_at(warr, F.col("rank"))
        ).alias("__dcg"),
    )
    lc = emb.groupBy("label").agg(F.count(F.lit(1)).cast("long").alias("__cl"))
    parr = F.array(
        *[F.lit(p).cast("decimal(18,6)") for p in _NDCG_PREFIX]
    )
    withrel = per.join(
        F.broadcast(lc), per.__ql.eqNullSafe(lc.label), "left"
    ).select(
        "query_id",
        "__dcg",
        (F.coalesce(F.col("__cl"), F.lit(1)) - 1).cast("long").alias("n_rel"),
    )
    idcg = F.element_at(
        parr, F.least(F.lit(_NDCG_K), F.col("n_rel")).cast("int")
    )
    return withrel.select(
        "query_id",
        "n_rel",
        F.col("__dcg").cast("double").alias("dcg"),
        F.when(F.col("n_rel") >= 1, idcg.cast("double")).alias("idcg"),
        F.when(
            F.col("n_rel") >= 1,
            F.col("__dcg").cast("double") / idcg.cast("double"),
        ).alias("ndcg"),
    )


def _ndcg_oracle() -> str:
    wlist = ", ".join(
        f"({i + 1}, CAST({w} AS DECIMAL(18,6)))"
        for i, w in enumerate(_NDCG_W6)
    )
    plist = ", ".join(
        f"({r + 1}, CAST({p} AS DECIMAL(18,6)))"
        for r, p in enumerate(_NDCG_PREFIX)
    )
    return f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qv, label AS ql
        FROM embeddings WHERE vec_id % 100 = 0
    ), scored AS (
        SELECT q.query_id, q.ql, e.vec_id AS neighbor_id, e.label AS nl,
               CASE WHEN sqrt({_dot_sql("q.qv", "q.qv")}) = 0
                         OR sqrt({_dot_sql("e.embedding", "e.embedding")}) = 0
                    THEN 0.0
                    ELSE {_dot_sql("q.qv", "e.embedding")}
                         / (sqrt({_dot_sql("q.qv", "q.qv")})
                            * sqrt({_dot_sql("e.embedding", "e.embedding")})) END
                   AS cos_sim
        FROM embeddings e, q
        WHERE e.vec_id <> q.query_id
    ), ranked AS (
        SELECT query_id, ql, nl,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rank
        FROM scored
    ), w (rank, disc) AS (VALUES {wlist}),
    pre (r, idcg) AS (VALUES {plist}),
    dcg AS (
        SELECT query_id, MAX(ql) AS ql,
               SUM(CAST(CASE WHEN nl IS NOT DISTINCT FROM ql THEN 1 ELSE 0 END
                        AS DECIMAL(18,6)) * w.disc) AS __dcg
        FROM ranked JOIN w USING (rank)
        WHERE rank <= {_NDCG_K}
        GROUP BY query_id
    ), lc AS (
        SELECT label, CAST(COUNT(*) AS BIGINT) AS __cl
        FROM embeddings GROUP BY 1
    ), wr AS (
        SELECT d.query_id, d.__dcg,
               CAST(COALESCE(lc.__cl, 1) - 1 AS BIGINT) AS n_rel
        FROM dcg d LEFT JOIN lc ON d.ql IS NOT DISTINCT FROM lc.label
    )
    SELECT wr.query_id, wr.n_rel,
           CAST(wr.__dcg AS DOUBLE) AS dcg,
           CASE WHEN wr.n_rel >= 1 THEN CAST(pre.idcg AS DOUBLE) END AS idcg,
           CASE WHEN wr.n_rel >= 1
                THEN CAST(wr.__dcg AS DOUBLE) / CAST(pre.idcg AS DOUBLE)
                END AS ndcg
    FROM wr LEFT JOIN pre ON pre.r = LEAST({_NDCG_K}, wr.n_rel)
    """


register("ext_ndcg", q_ext_ndcg, _ndcg_oracle())


# ---------------------------------------------------------------------------
# Per-source PII incidence audit — the measurement half of ext_redact's
# scrub, sharing its exact REDACT_PATTERNS so the two can never drift.
# PII is synthesized deterministically onto every third document so the
# counters are exercised on known ground truth. One narrow regexp pass;
# one partial-aggregated groupBy(source).
_PII_EMAIL = T.REDACT_PATTERNS[0][0]
_PII_NUM = T.REDACT_PATTERNS[1][0]


def q_ext_pii_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    salt = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.lit(" reach u"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example or 555"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 7, "0"),
        ),
    ).otherwise(F.lit(""))
    t = F.concat(F.coalesce(F.col("text"), F.lit("")), salt)
    emails = F.size(F.regexp_extract_all(t, F.lit(_PII_EMAIL), F.lit(0)))
    nums = F.size(F.regexp_extract_all(t, F.lit(_PII_NUM), F.lit(0)))
    per_doc = docs.select(
        "source",
        emails.cast("long").alias("__e"),
        nums.cast("long").alias("__m"),
    )
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(((F.col("__e") + F.col("__m")) > 0).cast("int"))
        .cast("long")
        .alias("pii_docs"),
        F.sum("__e").cast("long").alias("n_emails"),
        F.sum("__m").cast("long").alias("n_numbers"),
    )
    return agg.select(
        "source",
        "n_docs",
        "pii_docs",
        "n_emails",
        "n_numbers",
        (
            (F.col("n_emails") + F.col("n_numbers")).cast("double")
            / F.col("n_docs").cast("double")
        ).alias("pii_per_doc"),
    )


def _pii_oracle() -> str:
    return f"""
    WITH s AS (
        SELECT source,
               coalesce(text, '')
                 || CASE WHEN doc_id % 3 = 0
                         THEN ' reach u' || CAST(doc_id AS VARCHAR)
                              || '@mail.example or 555'
                              || lpad(CAST(doc_id % 10000 AS VARCHAR), 7, '0')
                         ELSE '' END AS t
        FROM documents
    ), c AS (
        SELECT source,
               CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS BIGINT)
                   AS __e,
               CAST(len(regexp_extract_all(t, '{_PII_NUM}')) AS BIGINT) AS __m
        FROM s
    ), a AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN __e + __m > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS pii_docs,
               CAST(SUM(__e) AS BIGINT) AS n_emails,
               CAST(SUM(__m) AS BIGINT) AS n_numbers
        FROM c GROUP BY source
    )
    SELECT source, n_docs, pii_docs, n_emails, n_numbers,
           CAST(n_emails + n_numbers AS DOUBLE) / CAST(n_docs AS DOUBLE)
               AS pii_per_doc
    FROM a
    """


register("ext_pii_audit", q_ext_pii_audit, _pii_oracle())
