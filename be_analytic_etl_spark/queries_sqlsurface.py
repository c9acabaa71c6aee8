"""Spark 4 SQL-surface queries: pipe syntax and SQL table functions.

The reference's users consume everything through SQL (pgAdmin views,
/root/reference/README.md:119-219). Spark 4 grew that surface two ways
this family exercises end-to-end against standard-SQL oracles:

- **pipe syntax** (`FROM t |> WHERE ... |> AGGREGATE ...`): the
  linear-dataflow spelling of a query plan. Spark parses it into the
  same logical plan as the nested form — same optimization, same
  execution — so the oracle stays plain ANSI SQL.
- **SQL table functions** (`CREATE FUNCTION ... RETURNS TABLE ...`):
  parameterized views; inlined at analysis time like SQL scalar UDFs
  (functions/sqludf.py), so predicates prune through the function body.
"""

from __future__ import annotations

from be_analytic_etl_spark.registry import register
from pyspark.sql import DataFrame, SparkSession

from be_analytic_etl_spark.queries_extensions import _t


def q_pipe_syntax_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("__pipe_lineitem")
    return spark.sql(
        """
        FROM __pipe_lineitem
        |> WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
        |> AGGREGATE
             CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
                  AS DOUBLE) AS revenue
           GROUP BY l_returnflag, l_linestatus
        |> ORDER BY l_returnflag, l_linestatus
        """
    )


register(
    "pipe_syntax_revenue",
    q_pipe_syntax_revenue,
    """
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
                AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)


def q_sql_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized view: customers of one market segment above a balance
    floor, as a SQL table function invoked with literal arguments."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("__tf_customer")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION segment_customers(
            seg STRING, min_bal DOUBLE)
        RETURNS TABLE(c_custkey BIGINT, c_name STRING, c_acctbal DOUBLE)
        RETURN SELECT c_custkey, c_name, c_acctbal
               FROM __tf_customer
               WHERE c_mktsegment = seg AND c_acctbal >= min_bal
        """
    )
    return spark.sql(
        "SELECT * FROM segment_customers('BUILDING', 5000.0) ORDER BY c_custkey"
    )


register(
    "sql_table_function",
    q_sql_table_function,
    """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_mktsegment = 'BUILDING' AND c_acctbal >= 5000.0
    ORDER BY c_custkey
    """,
)
