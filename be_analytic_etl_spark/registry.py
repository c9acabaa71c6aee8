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
# CORRECTNESS_r{N}.json lands — never hand-edit. Round-8 rotation
# (from CORRECTNESS_r01-r07; round 7 stayed 216/216 ever-checked
# green, zero reds): the 17 round-8 additions (never-checked —
# sketches ext_tdigest_quantiles/ext_tdigest_read/ext_kmins_distinct,
# time-series ext_cusum_changepoint/ext_mann_kendall/ext_acf/
# ext_dow_seasonality, drift/eval ext_psi_drift/ext_benford_digits/
# ext_lift_curve/ext_ndcg/ext_anova_f/ext_class_separation, text
# ext_zipf_fit/ext_burstiness/ext_token_fertility, privacy
# ext_pii_audit), then the six SS2-core queries (last checked r6 — the
# automated two-round force-entry), then the oldest greens (the
# remaining r3 cohort) to fill. Every new window member was pre-proven
# this round against tools/verify_driver.py at sf0.001 AND sf0.01 AND
# sf0.1 (strict 17g); the full re-frozen window was swept at sf0.1.
_DRIVER_WINDOW_PRIORITY = [
    "ext_tdigest_quantiles",
    "ext_kmins_distinct",
    "ext_cusum_changepoint",
    "ext_psi_drift",
    "ext_benford_digits",
    "ext_lift_curve",
    "ext_ndcg",
    "ext_pii_audit",
    "ext_mann_kendall",
    "ext_acf",
    "ext_anova_f",
    "ext_dow_seasonality",
    "ext_tdigest_read",
    "ext_zipf_fit",
    "ext_burstiness",
    "ext_token_fertility",
    "ext_class_separation",
    "flagship_mom_pivot",
    "groupby_avg",
    "lag_mom_variation",
    "conditional_pivot",
    "ingest_e2e",
    "ingest_finalize",
    "late_shipment_priority",
    "nation_trade_flow",
    "large_orders",
    "rolling_metrics",
    "percentile_stats",
    "funnel",
    "cohort_retention",
    "click_attribution",
    "small_quantity_revenue",
    "cube_revenue",
    "set_ops",
    "fuzzy_match",
    "session_window_batch",
    "jsonl_roundtrip",
    "custdist",
    "promo_revenue",
    "top_supplier",
    "disjunctive_parts",
    "idle_rich_customers",
    "sessionize",
    "json_extract",
    "ext_simhash",
    "ext_simhash_neardup",
    "ext_lsh_ann",
    "ext_multimodal_features",
    "ext_redact",
    "ext_vocab_topk",
]

# Round-9 window plan (written ahead, r5–r8 precedent): the rotation
# stays mechanical — any new r9 queries rank first (never-checked),
# the SS2 core re-enters when two rounds stale (checked r8 via this
# window, so it re-enters in r10 unless a red appears), and the
# remaining slots fill with the oldest greens (the r4 cohort next).
# Budget new-query count = 50 − (reds + never-checked backlog +
# forced core). Candidates for r9: anything the r8 verdict names
# first; then remaining eval/monitoring gaps (e.g. rank-based effect
# sizes, seasonal decomposition) and further streaming twins. Every
# addition must pass the three-SF verify sweep (tools/verify_driver.py
# at sf0.001/sf0.01/sf0.1, strict 17g) BEFORE the window freezes —
# three divergence classes only trigger at sf0.01+ data magnitudes
# (SCALE.md; class 6 — raw double->decimal casts of irrational values —
# was caught at sf0.01 this round).


def _reorder_for_driver_window() -> None:
    prioritized = [n for n in _DRIVER_WINDOW_PRIORITY if n in QUERIES]
    in_priority = set(prioritized)
    order = prioritized + [n for n in QUERIES if n not in in_priority]
    for d in (QUERIES, ORACLE_SQL):
        snapshot = dict(d)
        d.clear()
        d.update({n: snapshot[n] for n in order if n in snapshot})


_reorder_for_driver_window()
