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
