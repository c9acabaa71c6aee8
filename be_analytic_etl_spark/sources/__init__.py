"""Source connectors: parquet star-schema loader, messy CSV/ODS ingest."""

from be_analytic_etl_spark.sources.tables import load_table

__all__ = ["load_table"]
