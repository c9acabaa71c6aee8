"""Analytics-extension queries: stratified sampling, graph triangle census,
statistical outlier detection, and n-gram frequency — the exploratory /
data-quality layer of a training-data pipeline, each with a DuckDB twin.

Determinism follows the module-wide playbook: portable md5-head hashing for
anything sampled, exact DECIMAL accumulation for anything summed, and a
fixed double-op sequence (replayed verbatim in the oracle SQL) for derived
statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from be_analytic_etl_spark.functions.rounding import stable_round, stable_round_sql
from be_analytic_etl_spark.operators.graph import triangle_count
from be_analytic_etl_spark.operators.profiling import group_zscore_outliers
from be_analytic_etl_spark.operators.sampling import (
    SPLIT_BUCKETS,
    hash_bucket,
    stratified_sample_exact,
)
from be_analytic_etl_spark.operators.textstats import tokenize
from be_analytic_etl_spark.queries_extensions import _TOKS, _t
from be_analytic_etl_spark.registry import register


# ---------------------------------------------------------------------------
# Exact-count stratified sample: ceil(20%) of documents per language,
# chosen by portable key-hash rank (stable across runs/retries/engines).
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return stratified_sample_exact(
        docs, strata=["lang"], fraction=0.2, key_col="doc_id"
    ).select("doc_id", "lang", "source")


register(
    "ext_stratified_sample",
    q_stratified_sample,
    """
    SELECT doc_id, lang, source
    FROM (
        SELECT doc_id, lang, source,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                 || '|strat'), 1, 15) AS BIGINT), doc_id
               ) AS rk,
               CAST(ceil(0.2 * COUNT(*) OVER (PARTITION BY lang)) AS BIGINT)
                   AS quota
        FROM documents
    )
    WHERE rk <= quota
    """,
)


# ---------------------------------------------------------------------------
# Triangle census over the supplier co-purchase graph (suppliers sharing an
# order are adjacent). The raw co-occurrence graph on the synthetic data is
# near-complete, so edges are deterministically hash-thinned to 5% first —
# the same portable-bucket discipline as deterministic_sample, replicated
# in the oracle. Scale: the thinning is a map-side filter; the triangle
# join inherits compact-forward's wedge bound (operators/graph.py).
_TRI_KEEP = SPLIT_BUCKETS // 20  # 5% of edges


def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey").distinct()
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(
            F.col("a.l_suppkey").alias("s"),
            F.col("b.l_suppkey").alias("d"),
        )
        # thin BEFORE distinct: the keep-decision is a pure function of the
        # pair, so filtering raw co-occurrences first shrinks the distinct's
        # shuffle by the keep ratio (20x) without changing the edge set
        .filter(
            hash_bucket(
                F.concat_ws("|", F.col("s"), F.col("d")), salt="tri"
            )
            < F.lit(_TRI_KEEP)
        )
        .distinct()
    )
    return triangle_count(edges)


register(
    "ext_triangles",
    q_triangles,
    f"""
    WITH pairs AS (
        SELECT DISTINCT a.l_suppkey AS s, b.l_suppkey AS d
        FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) a
        JOIN (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    ),
    e AS (
        SELECT s, d FROM pairs
        WHERE CAST('0x' || substr(md5(CAST(s AS VARCHAR) || '|'
                   || CAST(d AS VARCHAR) || '|tri'), 1, 15) AS BIGINT)
              % {SPLIT_BUCKETS} < {_TRI_KEEP}
    )
    SELECT COUNT(*) AS n_triangles
    FROM e e1
    JOIN e e2 ON e1.d = e2.s
    JOIN e e3 ON e3.s = e1.s AND e3.d = e2.d
    """,
)


# ---------------------------------------------------------------------------
# Per-group z-score outlier census on lineitem prices. Exact decimal
# SUM/SUM(x²), then a fixed double sequence for mean/variance/threshold —
# the oracle replays the identical expression tree.
def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return group_zscore_outliers(
        li, ["l_returnflag", "l_linestatus"], "l_extendedprice", z=2.0
    )


_sr_mean = stable_round_sql("MIN(d.mean_value)", 4)
_sr_var = stable_round_sql("MIN(d.variance)", 2)

register(
    "ext_zscore_outliers",
    q_zscore_outliers,
    f"""
    WITH stats AS (
        SELECT l_returnflag, l_linestatus,
               COUNT(l_extendedprice) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE)
                   AS s1,
               CAST(SUM(CAST(l_extendedprice * l_extendedprice
                             AS DECIMAL(38,4))) AS DOUBLE) AS s2
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    ),
    derived AS (
        SELECT l_returnflag, l_linestatus, n,
               s1 / n AS mean_value,
               (s2 - s1 * s1 / n) / NULLIF(n - 1, 0) AS variance
        FROM stats
    )
    SELECT d.l_returnflag, d.l_linestatus,
           MIN(d.n) AS n,
           -- Emit rounded stats: the raw doubles carry engine-specific
           -- last-ulp noise from the >2^53 decimal->double cast amplified
           -- by the s2 - s1^2/n cancellation (driver-red round 4). The
           -- floor-formula, not ROUND (engines' ROUND primitives disagree
           -- on shortest-repr half-ties — functions/rounding.py). The
           -- outlier threshold below still uses full precision.
           {_sr_mean} AS mean_value,
           {_sr_var} AS variance,
           -- CAST: DuckDB SUM(int) is HUGEINT; Spark's is BIGINT.
           CAST(SUM(CASE WHEN (l.l_extendedprice - d.mean_value)
                         * (l.l_extendedprice - d.mean_value)
                        > 4.0 * d.variance THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM lineitem l
    JOIN derived d USING (l_returnflag, l_linestatus)
    GROUP BY d.l_returnflag, d.l_linestatus
    """,
)


# ---------------------------------------------------------------------------
# Top-20 bigrams over the corpus: tokenize -> adjacent pairs -> count ->
# deterministic top-k (count DESC, bigram ASC — total order, so LIMIT is
# hash-stable). Scale: bigram generation is map-side; ONE shuffle for the
# count (partial agg collapses duplicates per partition first); top-k is a
# TakeOrdered, never a global sort.
def q_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").withColumn("__toks", tokenize("text"))
    bigrams = docs.select(
        F.explode(
            F.when(
                F.size("__toks") >= 2,
                F.expr(
                    "transform(sequence(0, size(__toks) - 2), "
                    "i -> concat(__toks[i], ' ', __toks[i + 1]))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


register(
    "ext_bigram_topk",
    q_bigram_topk,
    f"""
    WITH toks AS (SELECT {_TOKS} AS t FROM documents),
    bigrams AS (
        SELECT unnest(list_transform(range(0, greatest(len(t) - 1, 0)),
                                     i -> t[i + 1] || ' ' || t[i + 2]))
               AS bigram
        FROM toks
    )
    SELECT bigram, COUNT(*) AS n
    FROM bigrams
    GROUP BY bigram
    ORDER BY n DESC, bigram ASC
    LIMIT 20
    """,
)


# ---------------------------------------------------------------------------
# Aligned-chunk exact substring dedup census (Lee et al. 2022, fixed-chunk
# restriction). The oracle rebuilds the identical chunking with DuckDB list
# slicing and replays the first-occurrence window.
def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from be_analytic_etl_spark.operators.dedup import chunk_dedup_stats

    docs = _t(spark, sf_dir, "documents")
    return chunk_dedup_stats(docs, "doc_id", "text", chunk_tokens=10)


register(
    "ext_chunk_dedup",
    q_chunk_dedup,
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    chunks AS (
        SELECT doc_id, (u).idx AS idx, (u).chunk AS chunk
        FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       range(0, CAST(ceil(len(t) / 10.0) AS BIGINT)),
                       i -> {{'idx': i,
                             'chunk': array_to_string(
                                 list_slice(t, i * 10 + 1, i * 10 + 10), ' ')}}))
                       AS u
            FROM toks WHERE len(t) > 0
        )
    ),
    marked AS (
        SELECT doc_id, idx,
               CASE WHEN ROW_NUMBER() OVER (
                        PARTITION BY md5(chunk) ORDER BY doc_id, idx) = 1
                    THEN 1 ELSE 0 END AS keep
        FROM chunks
    ),
    stats AS (
        SELECT doc_id, CAST(COUNT(*) AS INT) AS n_chunks,
               CAST(SUM(keep) AS INT) AS n_kept,
               CAST(COUNT(*) - SUM(keep) AS DOUBLE) / COUNT(*) AS dup_ratio
        FROM marked GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(s.n_chunks, 0) AS n_chunks,
           COALESCE(s.n_kept, 0) AS n_kept,
           COALESCE(s.dup_ratio, 0.0) AS dup_ratio
    FROM documents d LEFT JOIN stats s USING (doc_id)
    """,
)


# ---------------------------------------------------------------------------
# URL canonicalization (crawl-dedup preprocessing). The synthetic corpus
# has no URL column, so one is synthesized deterministically from
# (doc_id, lang, source) — mixed-case scheme/host, default port, utm_*
# tracking params, unsorted query, fragment — then canonicalized and
# grouped per host. Map-only until the per-host count's single shuffle.
def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from be_analytic_etl_spark.operators.urls import canonical_url

    docs = _t(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("HTTPS://WWW.Example-"),
        F.col("source"),
        F.lit(".COM:443/Docs/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("/?utm_source=feed&ref="),
        F.col("lang"),
        F.lit("&id="),
        F.col("doc_id").cast("string"),
        F.lit("&utm_campaign=x#frag-"),
        F.col("source"),
    )
    urls = docs.select(F.col("doc_id"), raw.alias("url"))
    canon = urls.select("doc_id", canonical_url("url").alias("url_canon"))
    host = F.regexp_extract("url_canon", r"^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)
    return canon.groupBy(host.alias("host")).agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.min("url_canon").alias("sample_url"),
    )


from be_analytic_etl_spark.operators.urls import canonical_url_sql  # noqa: E402

_RAW_URL_SQL = (
    "'HTTPS://WWW.Example-' || source || '.COM:443/Docs/' || lang || '/' "
    "|| CAST(doc_id AS VARCHAR) || '/?utm_source=feed&ref=' || lang "
    "|| '&id=' || CAST(doc_id AS VARCHAR) || '&utm_campaign=x#frag-' || source"
)

register(
    "ext_url_normalize",
    q_url_normalize,
    f"""
    WITH canon AS (
        SELECT doc_id, {canonical_url_sql(_RAW_URL_SQL)} AS url_canon
        FROM documents
    )
    SELECT regexp_extract(url_canon, '^[a-z][a-z0-9+.-]*://([^/?#]*)', 1)
               AS host,
           COUNT(*) AS n_urls,
           MIN(url_canon) AS sample_url
    FROM canon
    GROUP BY host
    """,
)


# ---------------------------------------------------------------------------
# Per-user EWMA of purchase values — the recurrence is an ordered fold per
# key (see operators/timeseries.py::ewma_last); the oracle replays the
# same left fold with list_reduce, bit-identically.
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from be_analytic_etl_spark.operators.timeseries import ewma_last

    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return ewma_last(ev, "user_id", ["ts", "event_id"], "value", alpha=0.3)


def _ewma_oracle() -> str:
    from be_analytic_etl_spark.operators.timeseries import ewma_sql_twin

    return ewma_sql_twin(
        "(SELECT * FROM events WHERE event_type = 'purchase')",
        "user_id",
        ["ts", "event_id"],
        "value",
        alpha=0.3,
    )


register("ext_ewma", q_ewma, _ewma_oracle())


# ---------------------------------------------------------------------------
# Data-quality constraint audit over the orders table (deequ/dbt-style):
# null-ness, key uniqueness, value domain, range, and referential
# integrity in one report. All row-local rules share ONE aggregate pass;
# uniqueness is one groupBy; the FK check is a broadcast anti join.
def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from be_analytic_etl_spark.operators import quality as Q

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    rules = [
        Q.not_null("o_orderkey_not_null", "o_orderkey"),
        Q.not_null("o_custkey_not_null", "o_custkey"),
        Q.unique("o_orderkey_unique", "o_orderkey"),
        Q.in_set(
            "o_orderstatus_domain", "o_orderstatus", "F", "O", "P"
        ),
        Q.in_range("o_totalprice_range", "o_totalprice", 0.0, 600000.0),
        Q.matches("o_orderpriority_shape", "o_orderpriority", "^[1-5]-[A-Z ]+$"),
        Q.foreign_key("o_custkey_fk_customer", "o_custkey", customer, "c_custkey"),
    ]
    return Q.constraint_audit(orders, rules)


register(
    "ext_dq_audit",
    q_dq_audit,
    """
    SELECT 'o_orderkey_not_null' AS rule,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violations
    FROM orders
    UNION ALL
    SELECT 'o_custkey_not_null',
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_orderkey_unique',
           CAST(SUM(extra) AS BIGINT)
    FROM (SELECT COUNT(*) - 1 AS extra FROM orders GROUP BY o_orderkey)
    UNION ALL
    SELECT 'o_orderstatus_domain',
           CAST(SUM(CASE WHEN o_orderstatus IS NULL
                           OR o_orderstatus NOT IN ('F', 'O', 'P')
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice_range',
           CAST(SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0.0
                           OR o_totalprice > 600000.0
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority_shape',
           CAST(SUM(CASE WHEN o_orderpriority IS NULL
                           OR NOT regexp_matches(o_orderpriority,
                                                 '^[1-5]-[A-Z ]+$')
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_custkey_fk_customer',
           CAST(COUNT(*) AS BIGINT)
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    """,
)


# ---------------------------------------------------------------------------
# Hierarchy expansion vs a recursive CTE: a binary-tree org chart is
# synthesized over suppliers (parent = suppkey div 2), expanded to every
# (node, ancestor, depth) by level-synchronous joins, and checked against
# DuckDB's WITH RECURSIVE — the one query family SQL engines express
# natively and Spark must iterate.
def q_ancestors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from be_analytic_etl_spark.operators.hierarchy import transitive_ancestors

    supp = _t(spark, sf_dir, "supplier")
    edges = supp.filter(F.col("s_suppkey") >= 2).select(
        F.col("s_suppkey").alias("child"),
        F.expr("s_suppkey div 2").alias("parent"),
    )
    return transitive_ancestors(edges)


register(
    "ext_ancestors",
    q_ancestors,
    """
    WITH RECURSIVE anc AS (
        SELECT s_suppkey AS node, s_suppkey // 2 AS ancestor, 1 AS depth
        FROM supplier WHERE s_suppkey >= 2
        UNION ALL
        SELECT a.node, a.ancestor // 2, a.depth + 1
        FROM anc a WHERE a.ancestor >= 2
    )
    SELECT node, ancestor, depth FROM anc
    """,
)


# ---------------------------------------------------------------------------
# Corpus health report: one grouped pass composing token stats, quality
# scoring, and language-ID agreement per labeled language — the dashboard
# query a corpus curator runs after every pipeline stage. Determinism:
# token sums are BIGINT; mean quality quantizes each row to 6dp DECIMAL
# before summing (doubles summed raw would be merge-order-dependent);
# agreement share is an exact integer division.
def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from be_analytic_etl_spark.operators import textstats as T

    docs = _t(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        T.token_count("text").alias("__nt"),
        stable_round(T.quality_score("text", round_to=None), 6)
        .cast("decimal(18,6)")
        .alias("__q6"),
        (T.lang_id("text") == F.col("lang")).cast("int").alias("__match"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__nt").cast("long").alias("sum_tokens"),
        (F.sum("__nt").cast("double") / F.count(F.lit(1))).alias("mean_tokens"),
        (F.sum("__match").cast("double") / F.count(F.lit(1))).alias(
            "langid_agreement"
        ),
        (F.sum("__q6").cast("double") / F.count(F.lit(1))).alias("mean_quality"),
    )


#: quality_score(round_to=None) as one DuckDB expression over the m-CTE
#: columns (n_tokens, n_chars, n_punct, n_stop) — shared by every
#: quality-scoring oracle (corpus report, token budget, percentile).
_QSCORE_SQL = (
    "least(CAST(n_tokens AS DOUBLE) / 20.0, 1.0) "
    "* greatest(0.0, 1.0 - (CASE WHEN n_chars = 0 THEN 0.0 "
    "ELSE CAST(n_punct AS DOUBLE) / n_chars END) * 5.0) "
    "* (CASE WHEN (CASE WHEN n_tokens = 0 THEN 0.0 "
    "ELSE CAST(n_stop AS DOUBLE) / n_tokens END) BETWEEN 0.01 AND 0.6 "
    "THEN 1.0 ELSE 0.5 END)"
)


def qscore_feature_ctes(key_cols: str, extra_exprs: str = "") -> str:
    """The tok/m CTE block computing ``_QSCORE_SQL``'s inputs
    (n_tokens, n_chars, n_punct, n_stop) per documents row — the single
    source every quality-scoring oracle embeds, so the feature
    definitions can never drift from ``textstats.quality_score``.

    ``key_cols``: leading columns carried through (e.g. "doc_id, lang").
    ``extra_exprs``: additional m-level select items, ", "-prefixed
    (e.g. ", toks" when the caller also needs the token list).
    """
    from be_analytic_etl_spark.queries_extensions import _STOP_SQL

    return f"""tok AS (
        SELECT {key_cols}, coalesce(text, '') AS t, {_TOKS} AS toks
        FROM documents
    ), m AS (
        SELECT {key_cols}{extra_exprs},
               CAST(len(toks) AS INTEGER) AS n_tokens,
               CAST(length(t) AS INTEGER) AS n_chars,
               length(t) - length(regexp_replace(t, '[.,;:!?]', '', 'g'))
                   AS n_punct,
               len(list_filter(toks, x -> list_contains({_STOP_SQL}, lower(x))))
                   AS n_stop
        FROM tok
    )"""


def _corpus_report_oracle() -> str:
    from be_analytic_etl_spark.operators import textstats as T

    langs = sorted(T.LANG_MARKERS)
    score_cols = []
    for lang in langs:
        markers = ",".join(f"'{m}'" for m in T.LANG_MARKERS[lang])
        score_cols.append(
            f"len(list_filter(toks, x -> list_contains([{markers}], lower(x)))) AS s_{lang}"
        )
    mx = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    chain = "CASE WHEN " + mx + " = 0 THEN 'und' "
    for lang in langs:
        chain += f"WHEN s_{lang} = {mx} THEN '{lang}' "
    chain += "ELSE 'und' END"
    return f"""
    WITH {qscore_feature_ctes("lang", ", toks, " + ", ".join(score_cols))}, r AS (
        SELECT lang, n_tokens,
               CASE WHEN {chain} = lang THEN 1 ELSE 0 END AS is_match,
               CAST({stable_round_sql(_QSCORE_SQL, 6)} AS DECIMAL(18,6)) AS q6
        FROM m
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS mean_tokens,
           CAST(SUM(is_match) AS DOUBLE) / COUNT(*) AS langid_agreement,
           CAST(SUM(q6) AS DOUBLE) / COUNT(*) AS mean_quality
    FROM r
    GROUP BY lang
    """


register("ext_corpus_report", q_corpus_report, _corpus_report_oracle())


# ---------------------------------------------------------------------------
# Pairwise Pearson correlation matrix over the fact table's numeric
# columns — the feature-stats pass of a profiling pipeline. Built-in
# F.corr/DuckDB corr() accumulate doubles in engine-specific orders (not
# cross-checkable); instead each column is quantized exactly (x100 — all
# four have <= 2 decimal places; Pearson r is invariant to linear
# scaling), the moments (n, Σx, Σx², Σxy) accumulate as integers in
# DECIMAL(38,0) (exact, merge-order-free) in ONE partial-aggregated pass,
# and the textbook formula runs as a fixed double-op sequence replayed
# verbatim in the oracle. Scale: one scan, one single-row aggregate — the
# matrix itself is |cols|²-sized control-plane data.
_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_CORR_PAIRS = [
    (a, b)
    for i, a in enumerate(_CORR_COLS)
    for b in _CORR_COLS[i + 1 :]
]


def q_ext_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # correlations are over JOINTLY FINITE rows: a NaN/Infinity in any
    # measure (NaN-poisoned batch) would overflow the ANSI cents cast —
    # and n must count the same rows the moments saw (oracle twin:
    # isfinite() conjunction in WHERE)
    finite = None
    for c in _CORR_COLS:
        cond = ~F.isnan(F.col(c)) & (F.abs(F.col(c)) < F.lit(float("inf")))
        finite = cond if finite is None else (finite & cond)
    li = li.filter(finite)

    def qz(c: str) -> F.Column:
        return F.round(F.col(c) * 100).cast("bigint")

    aggs = [F.count(F.lit(1)).alias("n")]
    for c in _CORR_COLS:
        aggs.append(F.sum(qz(c).cast("decimal(38,0)")).alias(f"s_{c}"))
        aggs.append(
            F.sum((qz(c) * qz(c)).cast("decimal(38,0)")).alias(f"s2_{c}_{c}")
        )
    for a, b in _CORR_PAIRS:
        aggs.append(
            F.sum((qz(a) * qz(b)).cast("decimal(38,0)")).alias(f"s2_{a}_{b}")
        )
    m = li.agg(*aggs)

    def corr_expr(a: str, b: str) -> F.Column:
        nd = F.col("n").cast("double")
        sa = F.col(f"s_{a}").cast("double")
        sb = F.col(f"s_{b}").cast("double")
        sab = F.col(f"s2_{a}_{b}").cast("double")
        saa = F.col(f"s2_{a}_{a}").cast("double")
        sbb = F.col(f"s2_{b}_{b}").cast("double")
        # Degenerate guard (ANSI double DIVIDE_BY_ZERO on a 1-row /
        # constant-column corpus: zero variance makes the denominator
        # sqrt(0)): correlation is undefined there — emit NULL.
        return F.when(
            (nd * saa - sa * sa > 0) & (nd * sbb - sb * sb > 0),
            (nd * sab - sa * sb)
            / (F.sqrt(nd * saa - sa * sa) * F.sqrt(nd * sbb - sb * sb)),
        )

    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    corr_expr(a, b).alias("corr"),
                )
                for a, b in _CORR_PAIRS
            ]
        )
    ).alias("r")
    return m.select(rows).select("r.col_a", "r.col_b", "r.corr")


def _corr_matrix_oracle() -> str:
    def qz(c: str) -> str:
        return f"CAST(round({c} * 100) AS BIGINT)"

    moments = ["COUNT(*) AS n"]
    for c in _CORR_COLS:
        moments.append(f"SUM(CAST({qz(c)} AS DECIMAL(38,0))) AS s_{c}")
        moments.append(
            f"SUM(CAST({qz(c)} * {qz(c)} AS DECIMAL(38,0))) AS s2_{c}_{c}"
        )
    for a, b in _CORR_PAIRS:
        moments.append(
            f"SUM(CAST({qz(a)} * {qz(b)} AS DECIMAL(38,0))) AS s2_{a}_{b}"
        )
    # Moments exceed 2^53 from sf0.1 up, where DuckDB's direct
    # DECIMAL->DOUBLE cast mis-rounds by an ulp (exact_dec_double_sql
    # docstring has the live example from this very query); the VARCHAR
    # route keeps both engines correctly rounded at every magnitude.
    from be_analytic_etl_spark.functions.rounding import exact_dec_double_sql

    def dd(name: str) -> str:
        return exact_dec_double_sql(name)

    branches = []
    for a, b in _CORR_PAIRS:
        # degenerate guard mirrored from the Spark side (zero variance)
        var_a = (
            f"(CAST(n AS DOUBLE) * {dd(f's2_{a}_{a}')}"
            f" - {dd(f's_{a}')} * {dd(f's_{a}')})"
        )
        var_b = (
            f"(CAST(n AS DOUBLE) * {dd(f's2_{b}_{b}')}"
            f" - {dd(f's_{b}')} * {dd(f's_{b}')})"
        )
        branches.append(
            f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
            f"CASE WHEN {var_a} > 0 AND {var_b} > 0 THEN "
            f"(CAST(n AS DOUBLE) * {dd(f's2_{a}_{b}')}"
            f" - {dd(f's_{a}')} * {dd(f's_{b}')}) / "
            f"(sqrt({var_a}) * sqrt({var_b})) END AS corr "
            f"FROM m"
        )
    return (
        "WITH m AS (SELECT " + ", ".join(moments) + " FROM lineitem WHERE "
        + " AND ".join(f"isfinite({c})" for c in _CORR_COLS) + ")\n"
        + "\nUNION ALL\n".join(branches)
    )


register("ext_corr_matrix", q_ext_corr_matrix, _corr_matrix_oracle())


# ---------------------------------------------------------------------------
# Native recursive CTE (Spark 4's WITH RECURSIVE) — the same ancestor
# expansion ext_ancestors computes with the iterative operator
# (operators/hierarchy.py), but expressed declaratively and executed by
# the engine's own recursion (UnionLoop). Registering BOTH forms keeps the
# operator as the scale path (explicit per-round checkpointing, bounded
# rounds) while proving the engine supports the SQL-standard surface a
# reference user would write first.
def q_recursive_cte_ancestors(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "supplier").createOrReplaceTempView("__rcte_supplier")
    return spark.sql(
        """
        WITH RECURSIVE anc AS (
            SELECT s_suppkey AS node, s_suppkey DIV 2 AS ancestor, 1 AS depth
            FROM __rcte_supplier WHERE s_suppkey >= 2
            UNION ALL
            SELECT node, ancestor DIV 2, depth + 1 FROM anc WHERE ancestor >= 2
        )
        SELECT node, ancestor, depth FROM anc
        """
    )


register(
    "recursive_cte_ancestors",
    q_recursive_cte_ancestors,
    """
    WITH RECURSIVE anc AS (
        SELECT s_suppkey AS node, s_suppkey // 2 AS ancestor, 1 AS depth
        FROM supplier WHERE s_suppkey >= 2
        UNION ALL
        SELECT a.node, a.ancestor // 2, a.depth + 1
        FROM anc a WHERE a.ancestor >= 2
    )
    SELECT node, ancestor, depth FROM anc
    """,
)
