"""Degenerate-corpus robustness gate: EVERY registered query must run
(possibly to an empty / NULL-gated result) on a 1-row version of every
table, under the driver's ANSI-on session.

Why this exists: Spark 4 ANSI mode throws DIVIDE_BY_ZERO for DOUBLE
division too (not just integral/decimal), and codegen's subexpression
elimination can hoist a division shared by several CASE branches out of
the lazy branch — so an output-gated `when(ok, x / d)` still crashes
when `d` is 0 on a degenerate group. Round 10 found six such crashes
(ext_cvm, ext_hellinger, ext_zscore_outliers, ext_corr_matrix,
ext_ks_test, ext_gpd_tail) that the fixed testdata can never trigger:
each statistic's complement group (rest-of-corpus, second source,
exceedance set) is nonempty at every SF, but empty on a 1-row table.
The fix idiom is to guard the DIVISION itself (`x / F.when(d > 0, d)`,
oracle twin NULLIF) rather than only the output.

Explicit plan-time preconditions (a clear ValueError instead of a
nonsense result) are allowed and pinned below."""

from __future__ import annotations

import pytest

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

#: queries that legitimately REFUSE tiny inputs, with the message bit
#: that proves the refusal is the documented precondition, not a crash.
PRECONDITIONS = {
    "ext_kmeans": "rows",
    "ext_pq_ann": "PQ codebook needs",
    "ext_ivf_pq_ann": "PQ codebook needs",
}

#: additionally allowed on fully EMPTY tables: every model-fit operator
#: that trains on seed vectors (coarse quantizer / codebook / k-means)
#: refuses with a clear message instead of producing a nonsense model.
EMPTY_PRECONDITIONS = {
    **PRECONDITIONS,
    "ext_ivf_pq_ann": "IVF coarse quantizer needs",
    "ext_ivf_ann": "IVF coarse quantizer needs",
    "ext_semdedup": "IVF coarse quantizer needs",
    "ext_semantic_neardup": "IVF coarse quantizer needs",
    "ext_semantic_neardup_multiprobe": "IVF coarse quantizer needs",
}


def _crash_census(spark, data_dir, preconditions, workers=8):
    """Run every registered query against ``data_dir`` and collect the
    crash census. The queries are INDEPENDENT jobs, so a small thread
    pool overlaps them (optimization guide §2.6): each run here is
    driver/latency-bound micro-work on a poisoned micro-table, and the
    serial form made these five gates the suite's top-5 cost (1141 s of
    the 2665 s quiet r14 wall; threaded: ~1.8x less — saturates there
    on driver-side session locks regardless of pool size). Semantics
    identical — same queries, same exception classification, same
    deterministic order (pool.map preserves input order)."""
    from concurrent.futures import ThreadPoolExecutor

    from be_analytic_etl_spark.registry import QUERIES

    def probe(item):
        name, fn = item
        try:
            fn(spark, data_dir).collect()
        except ValueError as e:
            if preconditions.get(name, "\x00") not in str(e):
                return (name, f"ValueError: {e}")
        except Exception as e:  # noqa: BLE001 - we want the census
            return (name, str(e).splitlines()[0][:100])
        return None

    with ThreadPoolExecutor(max_workers=workers) as pool:
        return [c for c in pool.map(probe, list(QUERIES.items())) if c]


@pytest.fixture(scope="module")
def one_row_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("degen_one_row"))
    for t in TABLES:
        (
            spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
            .limit(1)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{d}/{t}.parquet")
        )
    return d


def test_every_query_survives_one_row_tables(spark, one_row_dir):
    crashes = _crash_census(spark, one_row_dir, PRECONDITIONS)
    assert not crashes, f"{len(crashes)} queries crash on 1-row tables: {crashes}"


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("degen_empty"))
    for t in TABLES:
        (
            spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
            .limit(0)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{d}/{t}.parquet")
        )
    return d


def test_every_query_survives_empty_tables(spark, empty_dir):
    """An empty upstream batch (a backfill window with no data, a brand
    new source) must produce an empty / NULL-gated result or a clear
    model-fit precondition error — never an UNABLE_TO_INFER_SCHEMA,
    NULL-typed literal, empty-map lookup, or driver-side ZeroDivision."""
    crashes = _crash_census(spark, empty_dir, EMPTY_PRECONDITIONS)
    assert not crashes, f"{len(crashes)} queries crash on empty tables: {crashes}"


#: non-key columns are NULLed in the poisoned-batch gate; keys stay so
#: joins/groupings still engage (a fully-NULL key row is just dropped).
_KEY_COLS = {
    "doc_id", "vec_id", "event_id", "o_orderkey", "l_orderkey",
    "l_linenumber", "n_nationkey", "r_regionkey", "c_custkey",
    "s_suppkey", "p_partkey",
}


@pytest.fixture(scope="module")
def null_poisoned_dir(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    d = str(tmp_path_factory.mktemp("degen_null"))
    for t in TABLES:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet").limit(3)
        types = dict(df.dtypes)
        cols = [
            F.col(c) if c in _KEY_COLS
            else F.lit(None).cast(types[c]).alias(c)
            for c in df.columns
        ]
        (
            df.select(cols)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{d}/{t}.parquet")
        )
    return d


def test_every_query_survives_null_poisoned_tables(spark, null_poisoned_dir):
    """A NULL-poisoned batch (rows present, every non-key value NULL —
    a upstream-schema-drift shape) found four more crash classes in
    round 10: NULL vectors reaching the driver-side centroid/codebook
    float() loop, three zero-total divisions (source gini, dup
    inflation, temperature weights — the last REACHABLE on real data
    via one empty-text domain), and a NULL region bucket cast in the
    TSV fixture. All must yield empty/NULL-gated results or the pinned
    model-fit preconditions."""
    crashes = _crash_census(spark, null_poisoned_dir, EMPTY_PRECONDITIONS)
    assert not crashes, (
        f"{len(crashes)} queries crash on NULL-poisoned tables: {crashes}"
    )


@pytest.fixture(scope="module")
def nan_poisoned_dir(spark, tmp_path_factory):
    """Real rows, but ~25% of every DOUBLE column replaced with NaN or
    Infinity — the sensor-glitch / bad-upstream-math shape. ANSI casts
    of non-finite doubles to DECIMAL/BIGINT throw, so any query that
    quantizes a measure must survive these rows."""
    from pyspark.sql import functions as F

    d = str(tmp_path_factory.mktemp("degen_nan"))
    for t in TABLES:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet").limit(50)
        types = dict(df.dtypes)
        cols = []
        for c in df.columns:
            if types[c] == "double":
                cols.append(
                    F.when(F.rand(7) < 0.15, F.lit(float("nan")))
                    .when(F.rand(11) < 0.1, F.lit(float("inf")))
                    .otherwise(F.col(c))
                    .alias(c)
                )
            else:
                cols.append(F.col(c))
        (
            df.select(cols)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{d}/{t}.parquet")
        )
    return d


def test_every_query_survives_nan_poisoned_tables(spark, nan_poisoned_dir):
    """Round 10 found two crashes here: Infinity overflowing
    ext_corr_matrix's cents BIGINT cast (now filtered to jointly-finite
    rows, oracle-mirrored with isfinite()) and ext_welch_ttest's zero
    pooled SE (two all-tied groups — a DATA shape, reachable on real
    corpora, now a NULL-safe divide)."""
    crashes = _crash_census(spark, nan_poisoned_dir, EMPTY_PRECONDITIONS)
    assert not crashes, (
        f"{len(crashes)} queries crash on NaN-poisoned tables: {crashes}"
    )


def test_single_language_tied_documents(spark, tmp_path):
    """The shape that caught ext_cvm/ext_hellinger live: one language,
    one source, all scores tied — every complement group empty."""
    from be_analytic_etl_spark.registry import QUERIES

    d = str(tmp_path / "degen_tied")
    rows = [(i, "word " * 4, "en", "web", 100) for i in range(5)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    for name in (
        "ext_cvm",
        "ext_hellinger",
        "ext_wasserstein",
        "ext_ks_test",
        "ext_kruskal_wallis",
        "ext_mood_median",
        "ext_cliffs_delta",
        "ext_mann_whitney",
    ):
        out = QUERIES[name](spark, d).collect()  # must not raise
        assert out is not None


#: the adversarial string classes of VERDICT r10 ask #5: empty,
#: whitespace-only, a 1 MB single token, embedded NULs, replacement
#: chars (mojibake — parquet STRING cannot hold actually-invalid UTF-8,
#: so U+FFFD is the on-disk shape invalid bytes decay to), combining
#: marks / zero-width joiners / emoji, bidi control characters, and one
#: normal control row.
_ADVERSARIAL_STRINGS = [
    "",
    " \t\n\r  ",
    "x" * 1_000_000,
    "\x00\x00a\x00b",
    # vertical tab + form feed: Java regex \s matches \x0B, RE2's does
    # not — the divergence class ADVICE r11 #2 flagged; every paired
    # pattern now spells whitespace explicitly (textstats.WS_CHARS)
    "ver\x0btical\x0b tab\x0c body. text\x0b",
    "���",
    "é" * 500 + " ‍​ " + "\U0001f980" * 100,
    "‮ right-to-left ‭ mixed ⁦dir⁩",
    "word word word",
]

#: per-table key column used to spread the adversarial cases across rows.
_STRING_KEYS = {
    "region": "r_regionkey", "nation": "n_nationkey",
    "customer": "c_custkey", "supplier": "s_suppkey", "part": "p_partkey",
    "orders": "o_orderkey", "lineitem": "l_orderkey", "events": "event_id",
    "documents": "doc_id", "embeddings": "vec_id",
}


@pytest.fixture(scope="module")
def string_poisoned_dir(spark, tmp_path_factory):
    """Real rows, every non-key STRING column replaced by one of the
    adversarial strings (rotating by key) — the upstream-drift shapes a
    tokenizer/regex path meets at 100 TB: a scraper emitting empty or
    whitespace bodies, an un-split megabyte token, NUL-bearing or
    mojibake text, bidi-spoofed content."""
    from pyspark.sql import functions as F

    d = str(tmp_path_factory.mktemp("degen_strings"))
    n = len(_ADVERSARIAL_STRINGS)
    cases = F.array(*[F.lit(s) for s in _ADVERSARIAL_STRINGS])
    for t in TABLES:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet").limit(
            24
        )
        types = dict(df.dtypes)
        key = F.coalesce(F.col(_STRING_KEYS[t]), F.lit(0))
        cols = []
        for i, c in enumerate(df.columns):
            if types[c] == "string" and c not in _KEY_COLS:
                # rotate the case per (row, column) so every column
                # meets every class across the 24 rows
                cols.append(
                    F.element_at(cases, (F.pmod(key + i, F.lit(n)) + 1).cast("int"))
                    .alias(c)
                )
            else:
                cols.append(F.col(c))
        (
            df.select(cols)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{d}/{t}.parquet")
        )
    return d


def test_every_query_survives_string_poisoned_tables(
    spark, string_poisoned_dir
):
    """The fifth gate (VERDICT r10 ask #5): every registered query must
    run to an empty / NULL-gated / nonsense-but-typed result on
    adversarial STRING inputs — never a regex blowup, tokenizer crash,
    cast error, or ANSI arithmetic throw triggered by a degenerate
    text/lang/event_type domain."""
    crashes = _crash_census(spark, string_poisoned_dir, EMPTY_PRECONDITIONS)
    assert not crashes, (
        f"{len(crashes)} queries crash on string-poisoned tables: {crashes}"
    )
