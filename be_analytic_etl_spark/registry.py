"""Query registry: every operator from SURVEY.md §2 (+ scale extensions)
as a named (PySpark query, DuckDB oracle SQL) pair.

``QUERIES[name](spark, sf_dir) -> DataFrame`` and ``ORACLE_SQL[name]`` is
the ANSI-SQL twin DuckDB runs on the same parquet tables. Names in both
results are aligned column-for-column (the driver sorts columns by name
before hashing). Queries without an oracle entry are non-SQL-expressible
and get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from be_analytic_etl_spark.plans.flagship import (
    flagship_orders,
    flagship_orders_oracle_sql,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, fn: Callable[[SparkSession, str], DataFrame], sql: str | None) -> None:
    # Duplicate names are a hard error: a silent overwrite would shadow
    # a driver-proven query with a different implementation while its
    # green history kept reporting the OLD semantics (caught live in
    # round 9 — three new queries collided with r5/r7 names and
    # silently replaced them).
    if name in QUERIES:
        raise ValueError(f"query {name!r} is already registered")
    QUERIES[name] = fn
    if sql is not None:
        ORACLE_SQL[name] = sql


register("flagship_mom_pivot", flagship_orders, flagship_orders_oracle_sql())

# Operator-coverage queries are registered on import:
from be_analytic_etl_spark import queries_reference  # noqa: E402,F401
from be_analytic_etl_spark import queries_joins  # noqa: E402,F401
from be_analytic_etl_spark import queries_extensions  # noqa: E402,F401
from be_analytic_etl_spark import queries_analytics  # noqa: E402,F401
from be_analytic_etl_spark import queries_round5  # noqa: E402,F401
from be_analytic_etl_spark import queries_curation  # noqa: E402,F401
from be_analytic_etl_spark import queries_storage  # noqa: E402,F401
from be_analytic_etl_spark import queries_textprep  # noqa: E402,F401
from be_analytic_etl_spark import queries_versioning  # noqa: E402,F401
from be_analytic_etl_spark import queries_sqlsurface  # noqa: E402,F401
from be_analytic_etl_spark import queries_round6  # noqa: E402,F401
from be_analytic_etl_spark import queries_round7  # noqa: E402,F401
from be_analytic_etl_spark import queries_round8  # noqa: E402,F401
from be_analytic_etl_spark import queries_round9  # noqa: E402,F401
from be_analytic_etl_spark import queries_round10  # noqa: E402,F401
from be_analytic_etl_spark import queries_round10b  # noqa: E402,F401
from be_analytic_etl_spark import queries_round10c  # noqa: E402,F401
from be_analytic_etl_spark import queries_round11  # noqa: E402,F401
from be_analytic_etl_spark import queries_round11b  # noqa: E402,F401
from be_analytic_etl_spark import queries_round11c  # noqa: E402,F401
from be_analytic_etl_spark import queries_round11d  # noqa: E402,F401
from be_analytic_etl_spark import queries_round12  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Driver-window ordering. The round driver verifies the FIRST 50 registered
# queries against the DuckDB oracle; everything after the window is only
# locally gated (tests/test_registry_oracle.py). This block is GENERATED:
# run `python tools/rotate_window.py --apply` after a round's
# CORRECTNESS_r{N}.json lands — never hand-edit. Round-12 rotation
# (from CORRECTNESS_r01-r11; round 11 left 273/273 ever-checked green,
# zero reds): the 3 round-12 never-checked additions first
# (ext_entity_resolution / ext_pacf / ext_anova_two_way), then the SS2
# core forced on its 2-round cadence (last checked r10), then the
# oldest greens — the remaining 41-query r6 cohort, which exactly fills
# the window and clears the 5-round staleness boundary on schedule.
# Every new window member was pre-proven against tools/verify_driver.py
# at sf0.001 AND sf0.01 AND sf0.1 (strict 17g) plus the SIX
# degenerate-corpus gates (1-row / empty / NULL-poisoned / NaN-poisoned
# / tied-language / adversarial-strings — the last of which caught the
# entity-resolution levenshtein flood pre-freeze) before the window
# froze. The rotation tool FAILS if any registered query would exceed
# 5 rounds unchecked, and hard-fails past the 288-query capacity
# ceiling.
_DRIVER_WINDOW_PRIORITY = [
    "ext_entity_resolution",
    "ext_pacf",
    "ext_anova_two_way",
    "flagship_mom_pivot",
    "groupby_avg",
    "lag_mom_variation",
    "conditional_pivot",
    "ingest_e2e",
    "ingest_finalize",
    "ext_topk_per_group",
    "ext_distinct_ngrams",
    "ext_pmi_collocations",
    "ext_matryoshka_recall",
    "ext_knn_label_agreement",
    "ext_source_gini",
    "ext_dup_inflation",
    "ext_windowed_hll",
    "ext_pack_efficiency",
    "ext_frequent_spans",
    "ext_label_balance",
    "ext_retention",
    "ext_dau_wau",
    "ext_multimodal_resize",
    "rest_tsv_source",
    "ext_udtf_sentences",
    "ext_isotonic_minimax",
    "ext_isotonic_trend",
    "ext_snapshot_diff",
    "ext_curriculum_sample",
    "ext_incremental_agg",
    "ext_decontaminate",
    "ext_rollup_refresh",
    "ext_dataset_manifest",
    "ext_manifest_drift",
    "pipe_syntax_revenue",
    "sql_table_function",
    "ext_doremi_weights",
    "ext_markov_transitions",
    "ext_span_corruption",
    "ext_ngram_novelty",
    "ext_mixture_kl",
    "ext_k_anonymity",
    "ext_roc_auc",
    "ext_poisson_bootstrap",
    "having_countdistinct",
    "unpivot_measures",
    "union_distinct",
    "dense_id",
    "dense_id_scale",
    "csv_roundtrip",
]

# ---------------------------------------------------------------------------
# REGISTRY CAPACITY POLICY (round 10; VERDICT r9 ask #3).
#
# The driver checks 50 queries per round; the SS2 core re-enters every
# 2 rounds (6 checks / 2 rounds = 3 slots/round average); every other
# query must be re-checked within MAX_STALE_ROUNDS = 5 rounds. The
# sustainable ceiling is therefore (50 - 3) * 6 + 6 = 288 registered
# queries — NOT the naive 50 * 6 = 300, which ignores the core
# cadence. This is both derived and MEASURED: the self-organizing
# steady-state simulation in tests/test_rotation.py::
# test_capacity_ceiling_is_exact is stable at N = 288 and violates the
# freshness invariant at N = 289; the forward simulation from the real
# correctness history (test_real_history_trajectory_is_sustainable)
# proves the current registry rotates indefinitely at zero growth.
# tools/rotate_window.py hard-fails (before --apply) past the ceiling.
#
# Policy at the ceiling, in order of preference:
#   1. RETIRE/MERGE near-duplicate read-path queries — each merged
#      pair frees one slot. EXECUTED in round 11 (VERDICT r10 ask #1):
#      ext_tdigest_quantiles + ext_tdigest_read -> ext_tdigest_panel,
#      ext_simhash + ext_simhash_neardup -> ext_simhash_panel,
#      ext_hll_distinct + ext_hll_union -> ext_hll_panel,
#      ext_pipeline + ext_pipeline_spec -> ext_pipeline_e2e
#      (queries_round11.py; parents kept as unregistered helpers pinned
#      by tests/test_round11_merges.py + test_pipeline_composer.py).
#      Next merge candidates if the ceiling binds again: the kmins /
#      windowed-HLL distinct pair, the zorder write/skipping pair.
#   2. SLOW GROWTH: prefer extending an existing query's readout
#      (extra columns) over registering a sibling query.
#   3. NEVER weaken an invariant: MAX_STALE_ROUNDS stays 5 (the judge
#      gate), WINDOW stays 50 (the driver contract), the core cadence
#      stays 2 (round-4 judge ruling). A policy that quietly relaxes
#      verification to fit more queries is worse than fewer queries.
#
# Per-round window plan stays mechanical (r5-r10 precedent): new
# queries rank first (never-checked), the SS2 core force-enters on its
# cadence, remaining slots take the oldest greens; the freshness gate
# aborts the apply if any query would exceed 5 rounds unchecked.
# Every addition must pass the three-SF verify sweep
# (tools/verify_driver.py at sf0.001/sf0.01/sf0.1, strict 17g) BEFORE
# the window freezes — several divergence classes only trigger at
# sf0.01+ data magnitudes (SCALE.md). Check new names against the live
# registry FIRST — register() hard-errors on duplicates.


def _reorder_for_driver_window() -> None:
    prioritized = [n for n in _DRIVER_WINDOW_PRIORITY if n in QUERIES]
    in_priority = set(prioritized)
    order = prioritized + [n for n in QUERIES if n not in in_priority]
    for d in (QUERIES, ORACLE_SQL):
        snapshot = dict(d)
        d.clear()
        d.update({n: snapshot[n] for n in order if n in snapshot})


_reorder_for_driver_window()
