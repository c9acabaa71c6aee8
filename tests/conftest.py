"""Shared test fixtures: one SparkSession per test run, DuckDB oracle helper."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    from be_analytic_etl_spark.session import get_spark

    s = get_spark("be-analytic-etl-spark-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def _normalize_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        # absorb last-ulp float differences between engines
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_normalize_cell(x) for x in v)
    return v


def rows_key(rows, columns):
    """Order-insensitive, column-name-sorted canonical form (driver-style)."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for r in rows:
        out.append(tuple(_normalize_cell(r[i]) for i in order))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def assert_matches_oracle(spark_df, duck_con, sql, check_schema_names=True):
    """Mimic the driver's compare: row count, column names, values."""
    spark_rows = spark_df.collect()
    spark_cols = spark_df.columns
    res = duck_con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert len(spark_rows) == len(duck_rows), (
        f"row count: spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )
    if check_schema_names:
        assert sorted(spark_cols) == sorted(duck_cols), (
            f"columns: spark={sorted(spark_cols)} duckdb={sorted(duck_cols)}"
        )
    sk = rows_key([tuple(r) for r in spark_rows], spark_cols)
    dk = rows_key(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(sk, dk) if a != b]
    assert not mismatches, f"value mismatch (first 3): {mismatches[:3]}"
