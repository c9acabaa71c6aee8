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
from be_analytic_etl_spark import queries_round6  # noqa: E402,F401
from be_analytic_etl_spark import queries_round7  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Driver-window ordering. The round driver verifies the FIRST 50 registered
# queries against the DuckDB oracle; everything after the window is only
# locally gated (tests/test_registry_oracle.py). This block is GENERATED:
# run `python tools/rotate_window.py --apply` after a round's
# CORRECTNESS_r{N}.json lands — never hand-edit. Round-6 rotation
# (from CORRECTNESS_r01-r05; round 5 closed 158/158 ever-checked green):
# all 44 never-driver-checked queries — the 36-query backlog plus the
# eight round-6 additions (ext_doremi_weights / ext_markov_transitions
# / ext_span_corruption / ext_ngram_novelty / ext_mixture_kl /
# ext_k_anonymity / ext_roc_auc / ext_poisson_bootstrap — registered
# in-window so they are checked the round they land) — plus the six
# SS2 reference-core queries (stale since r3/r4; the tool force-enters
# them whenever they would go two rounds unverified): exactly 50.
# After this round every query in the 202-query registry has a driver
# row. Every window member was pre-proven this round against
# tools/verify_driver.py at sf0.001 AND sf0.01 AND sf0.1 (strict 17g).
_DRIVER_WINDOW_PRIORITY = [
    "ext_pack_sequences",
    "ext_bm25_topk",
    "ext_rrf_fusion",
    "ext_token_budget_sample",
    "ext_dsir_sample",
    "ext_hll_union",
    "ext_quality_percentile",
    "ext_zorder_skipping",
    "ext_hard_negatives",
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
    "ext_isotonic_trend",
    "ext_udtf_sentences",
    "ext_isotonic_minimax",
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
    "flagship_mom_pivot",
    "groupby_avg",
    "lag_mom_variation",
    "conditional_pivot",
    "ingest_e2e",
    "ingest_finalize",
]

# Round-7 window plan (written ahead, r5/r6 precedent): with the
# never-checked backlog at ZERO after this round, the r7 window is
# almost entirely free — rotate_window ranks any new r7 queries first
# (never-checked), the SS2 core is NOT yet stale (checked r6; forced
# again in r8), and the remaining slots fill with the oldest greens
# (the r1 cohort: ext_token_stats, ext_lang_id, ext_exact_dedup,
# ext_minhash_sig, ...). That leaves room for up to ~45 additions in
# round 7 — candidates, in priority order: calibration-bin reliability
# + ECE for the quality classifier (evalstats sibling of roc_auc),
# Cohen's-kappa rater agreement, space-saving heavy hitters,
# winsorized/trimmed robust stats, streaming twins for the eval
# family, and an exact-substring dedup variant (suffix-window rolling
# hash). Every addition must pass the three-SF verify sweep
# (tools/verify_driver.py at sf0.001/sf0.01/sf0.1) BEFORE the window
# freezes — the sf0.1 leg exists because two divergence classes only
# trigger at sf0.1 magnitudes (SCALE.md, round-6 sweep findings).


def _reorder_for_driver_window() -> None:
    prioritized = [n for n in _DRIVER_WINDOW_PRIORITY if n in QUERIES]
    in_priority = set(prioritized)
    order = prioritized + [n for n in QUERIES if n not in in_priority]
    for d in (QUERIES, ORACLE_SQL):
        snapshot = dict(d)
        d.clear()
        d.update({n: snapshot[n] for n in order if n in snapshot})


_reorder_for_driver_window()
