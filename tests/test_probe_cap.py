"""Exact-eval probe convention: every oracle that draws the brute-force
probe set must carry BOTH the modulus and the id cap (the cap bounds the
deliberately-exact baselines to PROBE_CAP_ID/PROBE_MODULUS probes, i.e.
O(1000 x N) total exact work at any corpus size — SCALE.md)."""

from __future__ import annotations

from be_analytic_etl_spark.operators.similarity import (
    PROBE_CAP_ID,
    PROBE_MODULUS,
    PROBE_WHERE_SQL,
)
from be_analytic_etl_spark.registry import ORACLE_SQL


def test_probe_where_sql_matches_constants():
    assert PROBE_WHERE_SQL == (
        f"vec_id % {PROBE_MODULUS} = 0 AND vec_id < {PROBE_CAP_ID}"
    )
    assert PROBE_MODULUS == 100 and PROBE_CAP_ID == 100_000


def test_every_probe_oracle_is_capped():
    uncapped = [
        name
        for name, sql in ORACLE_SQL.items()
        if f"vec_id % {PROBE_MODULUS}" in sql
        and f"vec_id < {PROBE_CAP_ID}" not in sql
    ]
    assert uncapped == [], uncapped
    # the convention is actually in use (guards against a silent rename
    # making this test vacuous)
    assert any(
        f"vec_id % {PROBE_MODULUS}" in sql for sql in ORACLE_SQL.values()
    )


def test_probe_oracles_interpolate_the_shared_predicate():
    """Since round 10 the oracles interpolate PROBE_WHERE_SQL instead of
    hand-copying the literal (advisor r9): the 8 exact-eval baselines
    must each contain the rendered shared predicate verbatim, so a
    constant change propagates to every oracle in one edit."""
    expected = {
        "ext_cosine_topk", "ext_lsh_ann", "ext_ivf_ann", "ext_pq_ann",
        "ext_ivf_pq_ann", "ext_hard_negatives", "ext_matryoshka_recall",
        "ext_ndcg",
    }
    carrying = {
        name for name, sql in ORACLE_SQL.items() if PROBE_WHERE_SQL in sql
    }
    assert expected <= carrying, expected - carrying
