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


#: Lazy-plan memo: (applicationId, sf_dir, name, spread) -> DataFrame.
#: A DataFrame is an analyzed LOGICAL PLAN, not data — reusing it skips
#: the per-call file listing + parquet footer/schema read + plan
#: (re)analysis that every ``spark.read.parquet`` pays on the driver
#: (optimization guide §7.3: driver metadata work). No results or blocks
#: are cached; every action on the memoized frame still recomputes from
#: the parquet files. Keyed by applicationId so a restarted session
#: never sees another JVM's plan objects, and by the source file's
#: (mtime_ns, size) so a rewritten file invalidates the entry.
_TABLE_MEMO: dict[tuple, DataFrame] = {}


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
    import os as _os

    # The (mtime_ns, size) stat guards against a table file rewritten at
    # the same path within one application: the memoized plan snapshots
    # the parquet file index, so serving it over a changed file would
    # read stale/deleted data (r13 advice item 3). Stat of one path is
    # ~1 us — negligible next to the listing+footer read the memo skips.
    try:
        st = _os.stat(f"{sf_dir}/{name}.parquet")
        stat_sig = (st.st_mtime_ns, st.st_size)
    except OSError:
        stat_sig = None
    key = (spark.sparkContext.applicationId, sf_dir, name, spread, stat_sig)
    if _os.environ.get("SPARK_GRAFT_TABLE_MEMO", "1") != "0":
        hit = _TABLE_MEMO.get(key)
        if hit is not None:
            return hit
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if spread:
        target = spark.sparkContext.defaultParallelism
        if _scan_partition_estimate(spark, f"{sf_dir}/{name}.parquet") < target:
            df = df.repartition(target)
    if _os.environ.get("SPARK_GRAFT_TABLE_MEMO", "1") != "0":
        if len(_TABLE_MEMO) > 256:  # tests churn tmp dirs; don't grow unbounded
            _TABLE_MEMO.clear()
        _TABLE_MEMO[key] = df
    return df


def _scan_partition_estimate(spark: SparkSession, path: str) -> int:
    """Estimate the scan's task count with Spark's own maxSplitBytes
    arithmetic: ``bytes / min(maxPartitionBytes, max(openCostInBytes,
    bytes / defaultParallelism))`` (FilePartition packing, SPARK-24914) —
    so the estimate tracks actual scan parallelism instead of the
    conservative bytes/maxPartitionBytes floor, which under-counted
    splittable mid-size files and triggered repartitions the real scan
    does not need (r13 advice item 4). Replaces the old
    ``df.rdd.getNumPartitions()`` probe, which converted the plan to an RDD
    on the driver (~0.1 s of py4j + conversion per call, paid by every
    documents/embeddings query). Falls back to a huge count (no repartition)
    if the path isn't a local file/dir — pre-split cluster inputs need no
    spreading."""
    import math
    import os as _os
    import re

    try:
        if _os.path.isfile(path):
            bytes_ = _os.path.getsize(path)
        elif _os.path.isdir(path):
            # Recursive walk: a nested/hive-partitioned layout would
            # otherwise sum 0 bytes and force a repartition shuffle on
            # every load (r13 advice item 4).
            bytes_ = 0
            for root, dirs, files in _os.walk(path):
                dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
                bytes_ += sum(
                    _os.path.getsize(_os.path.join(root, f))
                    for f in files
                    if not f.startswith((".", "_"))
                )
        else:
            return 1 << 30
    except OSError:
        return 1 << 30
    def _size_conf(key: str, default: int) -> int:
        raw = spark.conf.get(key, f"{default}b")
        m = re.fullmatch(r"(\d+)\s*([kmgt]?)b?", raw.strip().lower())
        if not m:
            return default
        return int(m.group(1)) * 1024 ** ("", "k", "m", "g", "t").index(m.group(2))

    max_pb = _size_conf("spark.sql.files.maxPartitionBytes", 134217728)
    open_cost = _size_conf("spark.sql.files.openCostInBytes", 4194304)
    par = max(1, spark.sparkContext.defaultParallelism)
    split = min(max_pb, max(open_cost, bytes_ // par or 1))
    return max(1, math.ceil(bytes_ / split))


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
