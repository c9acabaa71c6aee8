"""Source connectors: parquet star-schema loader, messy CSV/ODS ingest,
REST manifest control plane, CSV/JDBC/bucketed-table sinks."""

from be_analytic_etl_spark.sources.manifest import (
    download,
    find_dataset_id,
    list_resources,
    resources_to_manifest,
)
from be_analytic_etl_spark.sources.sinks import (
    write_bucketed_table,
    write_partitioned,
    read_jsonl,
    write_csv,
    write_jdbc,
    write_jsonl,
)
from be_analytic_etl_spark.sources.tables import TABLES, install_views, load_table

__all__ = [
    "load_table",
    "install_views",
    "TABLES",
    "find_dataset_id",
    "list_resources",
    "download",
    "resources_to_manifest",
    "read_jsonl",
    "write_csv",
    "write_jdbc",
    "write_jsonl",
    "write_bucketed_table",
    "write_partitioned",
]
