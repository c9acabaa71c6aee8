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

# ---------------------------------------------------------------------------
# Driver-window ordering. The round driver verifies the FIRST 50 registered
# queries against the DuckDB oracle; everything after the window is only
# locally gated (tests/test_registry_oracle.py). Round-5 rotation
# (computed by tools/rotate_window.py from CORRECTNESS_r01-r04): rounds
# 1-4 proved 108/109 ever-checked queries green; this window holds the
# one remaining red (ext_zscore_outliers, float-ulp — fixed) plus 49 of
# the 60 never-driver-checked queries, ranked never-checked-first.
_DRIVER_WINDOW_PRIORITY = [
    # 1: the round-4 red (float-ulp fragility, fixed this round: rounded
    # emitted mean/variance on both sides)
    "ext_zscore_outliers",
    # 2: never-driver-checked — deferred relational variants first (the
    # reference-adjacent TPC-H-shaped surface), then the round-3/4 ext_*
    # additions, then storage/format round-trips.
    "returned_revenue",
    "market_share",
    "window_suite",
    "min_cost_supplier",
    "grouping_sets",
    "forecast_revenue",
    "sole_blame_supplier",
    "nation_profit",
    "important_parts",
    "supplier_variety",
    "volume_suppliers",
    "ext_freq_spectrum",
    "ext_skew_profile",
    "ext_embedding_stats",
    "ext_bigram_lm",
    "ext_lsh_tuning",
    "recursive_cte_ancestors",
    "ext_dup_survivorship",
    "ext_mixture_sample",
    "ext_containment",
    "ext_quality_bins",
    "ext_rolling_median",
    "ext_per_key_sample",
    "ext_lm_score",
    "ext_semdedup",
    "ext_pq_ann",
    "ext_ivf_pq_ann",
    "ext_window_dedup",
    "ext_frequent_pairs",
    "ext_mad_outliers",
    "ext_c4_filter",
    "ext_char_entropy",
    "ext_paragraph_dedup",
    "ext_chunk_text",
    "ext_multimodal_frames",
    "orc_roundtrip",
    "partitioned_prune",
    "bucketed_join",
    "xml_roundtrip",
    "schema_evolution",
    "binaryfile_roundtrip",
    "ext_text_normalize",
    "ext_line_dedup",
    "ext_corpus_shuffle",
    "ext_temperature_weights",
    "ext_quality_classifier",
    "ext_variant_json",
    "ext_preference_pairs",
    "ext_pipeline_spec",
]

# ROUND-6 ROTATION PLAN: the remaining never-driver-checked queries
# (rest_tsv_source ext_snapshot_diff ext_curriculum_sample ext_isotonic_trend
# ext_udtf_sentences ext_incremental_agg ext_decontaminate
# ext_rollup_refresh ext_dataset_manifest ext_manifest_drift
# pipe_syntax_revenue sql_table_function, plus anything added in round 5)
# go first, then the oldest r1 greens for re-confirmation — the SS2
# reference core (flagship_mom_pivot, ingest_e2e, ingest_finalize,
# groupby_avg, conditional_pivot, lag_mom_variation) must re-enter the
# window by round 6 so the headline surface never goes two rounds
# unverified. tools/rotate_window.py computes the exact list.


def _reorder_for_driver_window() -> None:
    prioritized = [n for n in _DRIVER_WINDOW_PRIORITY if n in QUERIES]
    in_priority = set(prioritized)
    order = prioritized + [n for n in QUERIES if n not in in_priority]
    for d in (QUERIES, ORACLE_SQL):
        snapshot = dict(d)
        d.clear()
        d.update({n: snapshot[n] for n in order if n in snapshot})


_reorder_for_driver_window()
