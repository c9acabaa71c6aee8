"""Parquet table loader for the star-schema test tables.

Handles one physical-format quirk: ``events.parquet`` stores ``ts`` as
INT64 TIMESTAMP(NANOS), which Spark 4 rejects by default
(PARQUET_TYPE_ILLEGAL). We read nanos as long via the legacy conf and
convert to a microsecond TimestampType with integer division (truncation —
the same conversion DuckDB applies when casting TIMESTAMP_NS to
TIMESTAMP, so both engines see identical microsecond values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_table(
    spark: SparkSession, sf_dir: str, name: str, *, spread: bool = False
) -> DataFrame:
    """Load a test table. ``spread=True`` repartitions an under-partitioned
    scan up to the session's default parallelism — for per-row compute-heavy
    consumers (shingling, hashing, embedding math) a single-row-group file
    otherwise serializes the whole pipeline onto one core. At real scale
    inputs arrive pre-split (many files / row groups) and the repartition is
    a no-op; the shuffle it costs here is proportional to the small input,
    while the compute it parallelizes is the dominant term.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if spread:
        target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target)
    return df


#: The full star-schema + corpus catalog (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def install_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> None:
    """Register every table as a temp view so the engine is usable from
    plain ``spark.sql`` — the reference's pgAdmin workflow
    (/root/reference/README.md:119-219 runs SQL against Postgres views)
    mapped onto the Spark catalog. Views are lazy: nothing is scanned
    until a query runs, and Catalyst prunes/pushes down through them.
    """
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
