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
# locally gated (tests/test_registry_oracle.py). Rounds 1-3 left all ext_*
# queries outside the window, so order the registry by verification debt:
#   1. queries that have been driver-checked but never green (4 r1 reds,
#      3 r3 reds fixed this round);
#   2. sessionize (green r2, red r3 on an NTZ session delta, fixed);
#   3. every never-driver-checked ext_* query (the LLM-pipeline surface);
#   4. the 3 most distinctive never-checked relational shapes;
#   5. everything already driver-green (r1-r3), then the 8 deferred
#      join+agg variants of proven-green shapes — next round's rotation.
_DRIVER_WINDOW_PRIORITY = [
    # 1: checked-but-never-green
    "ext_simhash",
    "ext_simhash_neardup",
    "ext_lsh_ann",
    "ext_multimodal_features",
    "ingest_e2e",
    "ingest_finalize",
    "json_extract",
    # 2: regressed-then-fixed
    "sessionize",
    # 3: never-checked ext_* — headline dedup/similarity/pipeline ops first
    "ext_dedup_groups",
    "ext_pipeline",
    "ext_leakage_safe_split",
    "ext_semantic_neardup",
    "ext_incremental_dedup",
    "ext_chunk_dedup",
    "ext_pack_shards",
    "ext_contamination",
    "ext_cross_source_overlap",
    "ext_hash_split",
    "ext_stratified_sample",
    "ext_weighted_sample",
    "ext_tfidf",
    "ext_vocab_topk",
    "ext_bigram_topk",
    "ext_oov_rate",
    "ext_repetition",
    "ext_redact",
    "ext_url_normalize",
    "ext_asof_join",
    "ext_range_join",
    "ext_salted_join",
    "ext_merge_upsert",
    "ext_scd2",
    "ext_gapfill",
    "ext_ewma",
    "ext_hll_distinct",
    "ext_countmin",
    "ext_bloom_join",
    "ext_kmeans",
    "ext_profile",
    "ext_zorder",
    "ext_zscore_outliers",
    "ext_dq_audit",
    "ext_corr_matrix",
    "ext_corpus_report",
    "ext_pagerank",
    "ext_triangles",
    "ext_ancestors",
    # 4: round-4 additions with the most novel machinery (multi-probe
    # blocking, recall estimation, sketch quantiles). Still outside the
    # window after round 4: ext_freq_spectrum, ext_skew_profile,
    # ext_embedding_stats, ext_bigram_lm, grouping_sets, window_suite,
    # forecast_revenue, plus the 8 deferred join+agg variants — rotate
    # them in next round in place of whatever goes green here.
    "ext_semantic_neardup_multiprobe",
    "ext_lsh_recall",
    "ext_histogram_quantiles",
]

# ROUND-5 ROTATION PLAN (apply at round-5 start, after CORRECTNESS_r04
# confirms this window green): replace the then-driver-proven entries
# above with the never-driver-checked set — the round-3 additions
# (ext_dup_survivorship ext_mixture_sample ext_containment
# ext_quality_bins ext_rolling_median ext_per_key_sample ext_lm_score
# ext_semdedup ext_pq_ann ext_window_dedup ext_frequent_pairs
# ext_mad_outliers ext_c4_filter ext_char_entropy ext_paragraph_dedup
# ext_chunk_text ext_multimodal_frames ext_freq_spectrum ext_skew_profile
# ext_embedding_stats ext_bigram_lm ext_lsh_tuning orc_roundtrip
# partitioned_prune bucketed_join), the round-4 additions
# (ext_text_normalize ext_line_dedup ext_corpus_shuffle
# ext_temperature_weights ext_snapshot_diff ext_curriculum_sample
# ext_quality_classifier ext_variant_json xml_roundtrip rest_tsv_source),
# and the deferred relational variants (returned_revenue market_share
# window_suite min_cost_supplier grouping_sets forecast_revenue
# sole_blame_supplier nation_profit important_parts supplier_variety
# volume_suppliers), plus the late round-4 additions
# (ext_preference_pairs ext_pipeline_spec schema_evolution
# ext_isotonic_trend ext_udtf_sentences ext_incremental_agg
# ext_decontaminate ext_rollup_refresh ext_dataset_manifest
# ext_manifest_drift binaryfile_roundtrip
# recursive_cte_ancestors pipe_syntax_revenue sql_table_function)
# — ~56 entries; tools/rotate_window.py computes the final list from
# CORRECTNESS history.


def _reorder_for_driver_window() -> None:
    prioritized = [n for n in _DRIVER_WINDOW_PRIORITY if n in QUERIES]
    in_priority = set(prioritized)
    order = prioritized + [n for n in QUERIES if n not in in_priority]
    for d in (QUERIES, ORACLE_SQL):
        snapshot = dict(d)
        d.clear()
        d.update({n: snapshot[n] for n in order if n in snapshot})


_reorder_for_driver_window()
