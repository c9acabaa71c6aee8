"""Round-6 extension queries.

Three additions that close remaining gaps in the training-data story:

- ``ext_doremi_weights``: DoReMi-style domain mixture reweighting
  (Xie et al., NeurIPS 2023) — per-source excess loss -> tempered
  softmax -> uniform-smoothed mixture weights, the step that turns
  per-domain quality diagnostics into actual sampling weights.
- ``ext_markov_transitions``: first-order Markov transition matrix
  over per-user event sequences — the behavioral sequence model the
  funnel/sessionize/retention family doesn't capture.
- ``ext_span_corruption``: T5-style span-corruption mask planning
  (Raffel et al., JMLR 2020) — deterministic, hash-seeded span starts
  per document, emitted as mask statistics a tensorizer can replay.

Cross-engine determinism follows the repo's proven disciplines: libm
``exp`` outputs quantize to DECIMAL(18,6) via ``stable_round`` before
any sum (bm25/dsir precedent), per-doc double losses sum as exact
decimals (isotonic precedent), and single IEEE divisions of exact
integers emit raw (quality_percentile precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from be_analytic_etl_spark.functions.rounding import stable_round, stable_round_sql
from be_analytic_etl_spark.operators import textstats as T
from be_analytic_etl_spark.queries_extensions import _t, _TOKS
from be_analytic_etl_spark.registry import register

# ---------------------------------------------------------------------------
# DoReMi domain reweighting: sources whose documents score WORSE than the
# best-scoring source (higher excess loss) get UPweighted so the next
# training round spends proportionally more gradient there — the
# one-step, reference-model-free reading of Xie et al. (NeurIPS 2023).
# Loss proxy = 1 - quality_score (single-sourced from textstats; any
# per-doc loss column drops in unchanged). Plan: one documents scan ->
# per-source partial agg (decimal-exact loss sums) -> two broadcast
# scalar folds (min loss, softmax normalizer) over the |sources|-row
# frame. Nothing after the first agg touches more than |sources| rows,
# so the 100 TB cost is the scan + one shuffle of (source, loss) pairs.
#
# Float discipline: per-doc losses sum as DECIMAL(18,6); mean = ONE
# IEEE division; exp(excess/tau) is libm so it quantizes to
# DECIMAL(18,6) via stable_round BEFORE the normalizer sum; tau = 0.25
# (division by a power of two is exact); smoothing literals are written
# identically on both sides. Emitted doubles stable_round at source.
_DOREMI_TAU = 0.25
_DOREMI_SMOOTH = 0.2


def q_ext_doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    loss = (F.lit(1.0) - T.quality_score("text", round_to=None)).cast(
        "decimal(18,6)"
    )
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(loss).alias("__loss_dec"),
    )
    stats = per.select(
        "source",
        "n_docs",
        (
            F.col("__loss_dec").cast("double") / F.col("n_docs").cast("double")
        ).alias("__mean_loss"),
    )
    tot = stats.agg(
        F.min("__mean_loss").alias("__min_loss"),
        F.count(F.lit(1)).cast("long").alias("__k"),
    )
    e = stats.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "__mean_loss",
        "__k",
        (F.col("__mean_loss") - F.col("__min_loss")).alias("__excess"),
    )
    e = e.select(
        "source",
        "n_docs",
        "__mean_loss",
        "__k",
        "__excess",
        stable_round(F.exp(F.col("__excess") / F.lit(_DOREMI_TAU)), 6)
        .cast("decimal(18,6)")
        .alias("__expterm"),
    )
    z = e.agg(F.sum("__expterm").alias("__z"))
    return e.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        stable_round(F.col("__mean_loss"), 6).alias("mean_loss"),
        stable_round(F.col("__excess"), 6).alias("excess_loss"),
        stable_round(
            F.lit(1.0 - _DOREMI_SMOOTH)
            * (F.col("__expterm").cast("double") / F.col("__z").cast("double"))
            + F.lit(_DOREMI_SMOOTH) / F.col("__k").cast("double"),
            6,
        ).alias("weight"),
    )


def _doremi_oracle() -> str:
    from be_analytic_etl_spark.queries_analytics import (
        _QSCORE_SQL,
        qscore_feature_ctes,
    )

    expterm = stable_round_sql(f"exp(excess / {_DOREMI_TAU})", 6)
    weight = stable_round_sql(
        f"{1.0 - _DOREMI_SMOOTH} * (CAST(expterm AS DOUBLE) / CAST(z AS DOUBLE))"
        f" + {_DOREMI_SMOOTH} / CAST(k AS DOUBLE)",
        6,
    )
    return f"""
    WITH {qscore_feature_ctes("doc_id, source")}, q AS (
        SELECT source, CAST(1.0 - ({_QSCORE_SQL}) AS DECIMAL(18,6)) AS loss
        FROM m
    ), per AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(loss) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_loss
        FROM q GROUP BY source
    ), tot AS (
        SELECT MIN(mean_loss) AS min_loss, CAST(COUNT(*) AS BIGINT) AS k
        FROM per
    ), e AS (
        SELECT source, n_docs, mean_loss, k, mean_loss - min_loss AS excess
        FROM per CROSS JOIN tot
    ), e2 AS (
        SELECT source, n_docs, mean_loss, k, excess,
               CAST({expterm} AS DECIMAL(18,6)) AS expterm
        FROM e
    ), zc AS (
        SELECT SUM(expterm) AS z FROM e2
    )
    SELECT source, n_docs,
           {stable_round_sql("mean_loss", 6)} AS mean_loss,
           {stable_round_sql("excess", 6)} AS excess_loss,
           {weight} AS weight
    FROM e2 CROSS JOIN zc
    """


register("ext_doremi_weights", q_ext_doremi_weights, _doremi_oracle())


# ---------------------------------------------------------------------------
# First-order Markov transition matrix over per-user event sequences —
# the behavioral sequence model (what follows what, with what
# probability) that funnel/sessionize/retention don't capture. LEAD
# over (user_id ORDER BY ts, event_id) pairs each event with its
# successor — the event_id tiebreak makes same-timestamp order
# deterministic, so the matrix replays exactly in any engine. ONE
# shuffle on user_id for the window (per-user state is the sequence
# length — bounded; a pathological hot user splits under AQE skew
# handling), then a tiny (|types|^2)-row count shuffle. Row-normalized
# probabilities are single IEEE divisions of exact counts (emitted
# raw, quality_percentile precedent).
def q_ext_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        ev.select(
            F.col("event_type").alias("src_type"),
            F.lead("event_type").over(w).alias("dst_type"),
        )
        .filter(F.col("dst_type").isNotNull())
        .groupBy("src_type", "dst_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )
    tot = tr.groupBy("src_type").agg(
        F.sum("n_transitions").cast("long").alias("__row_total")
    )
    return tr.join(F.broadcast(tot), "src_type").select(
        "src_type",
        "dst_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.col("__row_total").cast("double")
        ).alias("prob"),
    )


register(
    "ext_markov_transitions",
    q_ext_markov_transitions,
    """
    WITH seq AS (
        SELECT event_type AS src_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS dst_type
        FROM events
    ), tr AS (
        SELECT src_type, dst_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
        FROM seq WHERE dst_type IS NOT NULL
        GROUP BY src_type, dst_type
    )
    SELECT src_type, dst_type, n_transitions,
           CAST(n_transitions AS DOUBLE)
               / CAST(SUM(n_transitions) OVER (PARTITION BY src_type) AS DOUBLE)
               AS prob
    FROM tr
    """,
)


# ---------------------------------------------------------------------------
# T5 span corruption mask planning: every 8th token position (phase
# hash-seeded per doc, so the mask pattern differs across docs but
# replays bit-identically) starts a 3-token masked span, clipped at the
# doc end. Pure map-side integer expressions over the token sequence —
# no shuffle at all until the (optional) corpus aggregate; a tensorizer
# consumes (doc_id, span starts) downstream. Mask ratio is ONE IEEE
# division of exact integers (emitted raw, quality_percentile
# precedent).
_SPAN_PERIOD = 8
_SPAN_LEN = 3


def q_ext_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    n = F.size(T.tokenize(F.col("text")))
    off = T.portable_hash60(
        F.concat(F.col("doc_id").cast("string"), F.lit("|span"))
    ) % F.lit(_SPAN_PERIOD)
    base = docs.select(
        "doc_id", n.cast("long").alias("n_tokens"), off.alias("__off")
    ).filter(F.col("n_tokens") >= 1)
    starts = F.expr(
        f"filter(sequence(CAST(0 AS BIGINT), n_tokens - 1),"
        f" i -> i % {_SPAN_PERIOD} = __off)"
    )
    withs = base.select("doc_id", "n_tokens", starts.alias("__starts"))
    return withs.select(
        "doc_id",
        "n_tokens",
        F.size("__starts").cast("long").alias("n_spans"),
        F.expr(
            f"aggregate(__starts, CAST(0 AS BIGINT),"
            f" (a, i) -> a + least(CAST({_SPAN_LEN} AS BIGINT), n_tokens - i))"
        ).alias("n_masked"),
    ).select(
        "doc_id",
        "n_tokens",
        "n_spans",
        "n_masked",
        (
            F.col("n_masked").cast("double") / F.col("n_tokens").cast("double")
        ).alias("mask_ratio"),
    )


register(
    "ext_span_corruption",
    q_ext_span_corruption,
    f"""
    WITH tok AS (
        SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
               CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|span'),
                                   1, 15) AS BIGINT) % {_SPAN_PERIOD} AS off
        FROM documents
    ), s AS (
        SELECT doc_id, n_tokens,
               list_filter(range(0, n_tokens),
                           i -> i % {_SPAN_PERIOD} = off) AS starts
        FROM tok WHERE n_tokens >= 1
    )
    SELECT doc_id, n_tokens,
           CAST(len(starts) AS BIGINT) AS n_spans,
           list_reduce(
               [CAST(0 AS BIGINT)]
                   || list_transform(starts,
                                     i -> least(CAST({_SPAN_LEN} AS BIGINT),
                                                n_tokens - i)),
               (x, y) -> x + y) AS n_masked,
           CAST(list_reduce(
               [CAST(0 AS BIGINT)]
                   || list_transform(starts,
                                     i -> least(CAST({_SPAN_LEN} AS BIGINT),
                                                n_tokens - i)),
               (x, y) -> x + y) AS DOUBLE) / CAST(n_tokens AS DOUBLE)
               AS mask_ratio
    FROM s
    """,
)
