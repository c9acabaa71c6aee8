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
# CORRECTNESS_r{N}.json lands — never hand-edit. Round-11 rotation
# (from CORRECTNESS_r01-r10; round 10 left 262/262 ever-checked green,
# zero reds): the 19 round-11 never-checked entries first — the four
# MERGED panels (ext_tdigest_panel / ext_simhash_panel / ext_hll_panel
# / ext_pipeline_e2e, each replacing a retired pair per the capacity
# policy) and the 15 round-11 additions (event-history/time-series
# panel ext_survival_curve .. ext_session_paths; experiment-design
# panel ext_effect_size_power .. ext_rater_agreement; curation/
# embedding/concentration panel ext_gopher_rules .. ext_hhi) — then
# the mandatory 23-query r5 cohort (at the 5-round staleness boundary;
# ext_pipeline_spec left it by retirement), then the oldest r6 greens
# in the remaining 8 slots (draining the r6 cohort early so the r12
# window keeps free slots). The SS2 core was checked in r10 (1 round
# old — not forced this round). Every new window member was pre-proven
# against tools/verify_driver.py at sf0.001 AND sf0.01 AND sf0.1
# (strict 17g) plus the five degenerate-corpus gates before the window
# froze. The rotation tool FAILS if any registered query would exceed
# 5 rounds unchecked, and hard-fails past the 288-query capacity
# ceiling.
_DRIVER_WINDOW_PRIORITY = [
    "ext_tdigest_panel",
    "ext_simhash_panel",
    "ext_hll_panel",
    "ext_pipeline_e2e",
    "ext_survival_curve",
    "ext_inter_arrival",
    "ext_binseg_changepoint",
    "ext_ljung_box",
    "ext_session_paths",
    "ext_effect_size_power",
    "ext_srm_check",
    "ext_odds_ratio",
    "ext_rater_agreement",
    "ext_gopher_rules",
    "ext_negative_sampling",
    "ext_capture_recapture",
    "ext_mattr",
    "ext_random_projection",
    "ext_hhi",
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
    "ext_pack_sequences",
    "ext_bm25_topk",
    "ext_rrf_fusion",
    "ext_token_budget_sample",
    "ext_dsir_sample",
    "ext_quality_percentile",
    "ext_zorder_skipping",
    "ext_hard_negatives",
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
