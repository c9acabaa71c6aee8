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


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(spark, duck, name, fn, sql):
    df = fn(spark, SF_DIR)
    if sql is None:
        # rows-only check for non-SQL-expressible ops
        assert df.count() >= 0
        return
    assert_matches_oracle(df, duck, sql)
