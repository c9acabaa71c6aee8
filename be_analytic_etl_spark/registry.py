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
from be_analytic_etl_spark import queries_round8  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Driver-window ordering. The round driver verifies the FIRST 50 registered
# queries against the DuckDB oracle; everything after the window is only
# locally gated (tests/test_registry_oracle.py). This block is GENERATED:
# run `python tools/rotate_window.py --apply` after a round's
# CORRECTNESS_r{N}.json lands — never hand-edit. Round-7 rotation
# (from CORRECTNESS_r01-r06; round 6 reached 202/202 ever-checked
# green, zero reds): the 14 round-7 additions (never-checked — eval
# stats ext_reliability_bins/ext_calibration_ece/ext_cohens_kappa/
# ext_welch_ttest/ext_ks_test/ext_chi2_independence/
# ext_mutual_information/ext_spearman_corr, tail diagnostics
# ext_hill_tail/ext_gpd_tail, drift ext_jensen_shannon, sketch
# ext_heavy_hitters, rank-stats ext_robust_stats, dedup
# ext_substring_dedup), then the 13
# r1-stale greens the round-6 verdict routed here (ext_token_stats ...
# ext_first_per_key — 5 rounds without a driver row), then the oldest
# (r3) greens to fill. The SS2 core is NOT stale (checked r6; the tool
# force-enters it in r8). Every window member was pre-proven this
# round against tools/verify_driver.py at sf0.001 AND sf0.01 AND
# sf0.1 (strict 17g).
_DRIVER_WINDOW_PRIORITY = [
    "ext_reliability_bins",
    "ext_calibration_ece",
    "ext_cohens_kappa",
    "ext_heavy_hitters",
    "ext_robust_stats",
    "ext_substring_dedup",
    "ext_welch_ttest",
    "ext_ks_test",
    "ext_chi2_independence",
    "ext_mutual_information",
    "ext_spearman_corr",
    "ext_hill_tail",
    "ext_gpd_tail",
    "ext_jensen_shannon",
    "ext_token_stats",
    "ext_bpe_fingerprint",
    "ext_lang_id",
    "ext_exact_dedup",
    "ext_minhash_sig",
    "ext_minhash_lsh_neardup",
    "ext_ngram_jaccard",
    "ext_cosine_topk",
    "ext_cosine_neardup",
    "ext_ivf_ann",
    "ext_strip_zeros",
    "ext_multimodal_meta",
    "ext_first_per_key",
    "having_countdistinct",
    "unpivot_measures",
    "union_distinct",
    "dense_id",
    "dense_id_scale",
    "csv_roundtrip",
    "jdbc_roundtrip",
    "topk_revenue",
    "semi_anti_customers",
    "br_number_parse",
    "classify_extract",
    "pattern_row_filter",
    "date_roundtrip",
    "scalar_math",
    "pricing_summary",
    "star_join_broadcast",
    "fact_join_revenue",
    "region_revenue",
    "rollup_revenue",
    "topn_per_group",
    "sliding_window",
    "events_enrich",
    "tumbling_window",
]

# Round-8 window plan (written ahead, r5–r7 precedent): the rotation
# is again mechanical — any new r8 queries rank first (never-checked),
# the six SS2-core queries force-enter (last checked r6, two rounds
# old by r8), and the remaining ~slots fill with the oldest greens
# (the rest of the r3 cohort, then r4). Budget new-query count =
# 50 − (reds + never-checked backlog + 6 core). Candidates for r8:
# streaming twins registered behind batch equivalents where
# SQL-expressible, a t-digest-style mergeable quantile sketch with a
# portable oracle, and any gap the r7 verdict names. Every addition must pass the
# three-SF verify sweep (tools/verify_driver.py at
# sf0.001/sf0.01/sf0.1, strict 17g) BEFORE the window freezes — two
# divergence classes only trigger at sf0.1 magnitudes (SCALE.md).


def _reorder_for_driver_window() -> None:
    prioritized = [n for n in _DRIVER_WINDOW_PRIORITY if n in QUERIES]
    in_priority = set(prioritized)
    order = prioritized + [n for n in QUERIES if n not in in_priority]
    for d in (QUERIES, ORACLE_SQL):
        snapshot = dict(d)
        d.clear()
        d.update({n: snapshot[n] for n in order if n in snapshot})


_reorder_for_driver_window()
