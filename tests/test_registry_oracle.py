"""Run every registered query against its DuckDB oracle (driver-style gate).

This mirrors the driver's CORRECTNESS check at a smaller SF so regressions
surface locally before a round ends.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, assert_matches_oracle


def _pairs():
    from be_analytic_etl_spark.registry import ORACLE_SQL, QUERIES

    return sorted((name, QUERIES[name], ORACLE_SQL.get(name)) for name in QUERIES)


def test_every_query_matches_oracle(spark, duck):
    """Whole-registry oracle gate, threaded: the per-query Spark-vs-
    DuckDB comparisons are independent, so a small pool overlaps them
    (optimization guide §2.6 — the serial parametrized form cost 431 s
    of the 2665 s quiet suite wall; the census form reports EVERY
    mismatching query in one failure instead of -x stopping at the
    first). Each worker compares through its own DuckDB cursor
    (connections are not safe for concurrent execute)."""
    from concurrent.futures import ThreadPoolExecutor

    def check(pair):
        name, fn, sql = pair
        try:
            df = fn(spark, SF_DIR)
            if sql is None:
                # rows-only check for non-SQL-expressible ops
                assert df.count() >= 0
                return None
            cur = duck.cursor()
            try:
                assert_matches_oracle(df, cur, sql)
            finally:
                cur.close()
        except Exception as e:  # noqa: BLE001 - census, not first-failure
            return (name, f"{type(e).__name__}: {str(e)[:200]}")
        return None

    with ThreadPoolExecutor(max_workers=8) as pool:
        failures = [f for f in pool.map(check, _pairs()) if f]
    assert not failures, (
        f"{len(failures)} queries mismatch their oracle: {failures}"
    )


def test_driver_window_queries_all_have_oracles():
    """The driver oracle-checks the FIRST 50 registered queries; a
    window slot spent on a rows-only query wastes a verification slot.
    Every window query must have a value-checking oracle."""
    from be_analytic_etl_spark.registry import ORACLE_SQL, QUERIES

    window = list(QUERIES)[:50]
    missing = [n for n in window if n not in ORACLE_SQL]
    assert not missing, f"window queries without oracles: {missing}"


def test_registry_has_no_rows_only_queries():
    """EVERY registered query is value-checked — grouped PAVA, the one
    historic exception, gained a closed-form-equality oracle in round 6
    (ext_isotonic_trend emits the minimax fit + a PAVA-agreement flag).
    A registration that forgets its oracle should fail here, not
    silently downgrade to the driver's weaker rows-only check."""
    from be_analytic_etl_spark.registry import ORACLE_SQL, QUERIES

    rows_only = [n for n in QUERIES if n not in ORACLE_SQL]
    assert rows_only == [], rows_only
