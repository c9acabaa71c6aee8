"""be_analytic_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capability surface of the reference
pipeline Giomelox/Be-Analytic-ETL (messy public tabular data -> clean /
normalize / unpivot -> consolidated typed fact table -> JDBC/CSV load ->
windowed + pivoted analytical queries), built Spark-first:

- DataFrame / Spark SQL declarative plans (Catalyst + Tungsten optimize);
- native column expressions for every scalar cleaning op (whole-stage
  codegen preserved — no row-at-a-time Python UDFs in the hot path);
- partition-aware operators designed for multi-executor clusters even
  though tests run on ``local[*]``;
- scale-out extensions beyond the reference surface: exact + fuzzy
  deduplication (MinHash-LSH, SimHash), similarity search over embedding
  columns, text statistics, sessionization, multimodal binary-column
  plumbing.

Nothing in this package is copied from the reference; reference file:line
citations in docstrings identify the *behavior* being matched.
"""

from be_analytic_etl_spark.session import get_spark, stop_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "stop_spark", "__version__"]
