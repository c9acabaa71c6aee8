"""Storage-layout queries: ORC round-trip, partitioned-write partition
pruning, and bucketed (shuffle-free) joins.

The reference's storage surface is CSV + Postgres
(/root/reference/main.py:738-744, connect_postgre.py:209-321); a 100 TB
Spark deployment adds the columnar layouts that make scans cheap:

- ORC as the second columnar format (round-tripped and value-checked
  against the parquet original);
- Hive-style partitioned layout, where a filter on the partition column
  prunes directories before any IO (`PartitionFilters` in the scan, 1/5
  of the files read);
- bucketed tables, where both join sides are pre-hashed into the same
  bucket count on the join key so the sort-merge join runs with NO
  shuffle exchange — the layout a nightly 100 TB fact/dim co-location
  would use.

Each query materializes the layout under /tmp (tagged by SF so scale
factors never collide) and returns an aggregate the DuckDB oracle
computes from the original parquet — proving the layout preserves values
exactly, not just that the write succeeded.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from be_analytic_etl_spark.queries_extensions import _t
from be_analytic_etl_spark.registry import register


def _tag(sf_dir: str) -> str:
    return os.path.basename(sf_dir.rstrip("/")).replace(".", "_")


# ---------------------------------------------------------------------------
# ORC round-trip: project + filter lineitem -> ORC -> re-read -> aggregate.
# The projection/filter happen BEFORE the write so the ORC file carries
# only the 3 needed columns — the same scan-minimizing shape a 100 TB
# format migration would use.

def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") < 10).select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    path = f"/tmp/spark_graft_orc_{_tag(sf_dir)}"
    li.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )


register(
    "orc_roundtrip",
    q_orc_roundtrip,
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM lineitem WHERE l_quantity < 10 GROUP BY l_returnflag
    """,
)


# ---------------------------------------------------------------------------
# Partitioned write + partition-pruned read. The re-read filters on the
# partition column: Catalyst resolves it against directory names
# (PartitionFilters), so only 1 of 5 directories is ever listed/read —
# the layout that turns a 100 TB scan into a 20 TB one for free.
# tests/test_storage.py pins the PartitionFilters plan shape.

def q_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from be_analytic_etl_spark.sources.sinks import write_partitioned

    orders = _t(spark, sf_dir, "orders")
    path = f"/tmp/spark_graft_part_{_tag(sf_dir)}"
    sel = orders.select(
        "o_orderkey", "o_orderdate", "o_totalprice", "o_orderpriority"
    )
    write_partitioned(sel, path, partition_cols=["o_orderpriority"])
    # Explicit schema: an EMPTY input writes zero partition directories
    # and schema INFERENCE would fail (UNABLE_TO_INFER_SCHEMA); partition
    # discovery (and the pruned PartitionFilters plan shape pinned by
    # tests/test_storage.py) is unaffected by a user-supplied schema.
    back = spark.read.schema(sel.schema).parquet(path)
    return (
        back.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


register(
    "partitioned_prune",
    q_partitioned_prune,
    """
    SELECT date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders WHERE o_orderpriority = '1-URGENT'
    GROUP BY 1
    """,
)


# ---------------------------------------------------------------------------
# Bucketed join: customer and orders both bucketed 8 ways on custkey via
# external-path saveAsTable, then joined. Both sides report the same
# HashClusteredDistribution-compatible bucketing, so the sort-merge join
# has NO shuffle exchange on either side (pinned by tests/test_storage.py)
# — the co-located layout for a recurring 100 TB fact/dim join.

def bucketize(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    n_buckets: int = 8,
) -> None:
    from be_analytic_etl_spark.sources.sinks import write_bucketed_table

    df.sparkSession.sql(f"DROP TABLE IF EXISTS {table}")
    write_bucketed_table(
        df, table, buckets=n_buckets, bucket_cols=[key], sort_cols=[key], path=path
    )


def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    tag = _tag(sf_dir)
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    bucketize(cust, f"graft_cust_b_{tag}", f"/tmp/spark_graft_bkt_cust_{tag}", "c_custkey")
    bucketize(
        orders, f"graft_orders_b_{tag}", f"/tmp/spark_graft_bkt_orders_{tag}", "o_custkey"
    )
    c = spark.table(f"graft_cust_b_{tag}")
    o = spark.table(f"graft_orders_b_{tag}")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


register(
    "bucketed_join",
    q_bucketed_join,
    """
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
)


# ---------------------------------------------------------------------------
# XML round-trip (Spark 4's built-in XML source — new surface the
# reference's CSV/Postgres stack lacks). supplier -> XML (rowTag) ->
# re-read with an EXPLICIT schema (inference on XML is a second full scan;
# at 100 TB the schema is always declared) -> aggregate; the oracle
# computes the same aggregate from the parquet original, proving the
# XML writer/reader preserve values exactly. Doubles survive because the
# writer emits Java shortest round-trip representations.

def q_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # XML 1.0 cannot represent control characters (legal chars are tab/
    # LF/CR and >= 0x20): a NUL-bearing upstream string makes the writer
    # throw WstxIOException and abort the job (string-poisoned gate), so
    # the sink boundary strips them — clean text passes byte-identical.
    xml_safe = F.regexp_replace(
        "s_name", r"[\x00-\x08\x0B\x0C\x0E-\x1F]", ""
    ).alias("s_name")
    sup = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 0)
        .select("s_suppkey", xml_safe, "s_nationkey", "s_acctbal")
    )
    path = f"/tmp/spark_graft_xml_{_tag(sf_dir)}"
    (
        sup.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "suppliers")
        .option("rowTag", "supplier")
        .save(path)
    )
    back = (
        spark.read.format("xml")
        .option("rowTag", "supplier")
        .schema("s_suppkey bigint, s_name string, s_nationkey bigint, s_acctbal double")
        .load(path)
    )
    return back.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum(F.col("s_acctbal").cast("decimal(18,2)")).cast("double").alias("sum_bal"),
        F.min("s_name").alias("first_name"),
    )


register(
    "xml_roundtrip",
    q_xml_roundtrip,
    """
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
           MIN(s_name) AS first_name
    FROM supplier WHERE s_acctbal > 0
    GROUP BY s_nationkey
    """,
)


# ---------------------------------------------------------------------------
# Custom Python DataSource (Spark 4): the reference's driver-side
# download loop (main.py:347-389) as a real Spark source — one
# InputPartition per resource URL, fetch/decode/split running executor-
# side. The query materializes per-region TSV fixtures from nation,
# reads them back through format("rest_tsv") over file:// URLs (same
# code path as http), parses, and aggregates; the oracle computes the
# same result from the parquet original. The 25-row driver collect is
# control-plane fixture writing, not a data funnel.

def q_rest_tsv_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from be_analytic_etl_spark.sources.datasource import register_rest_tsv

    nation = _t(spark, sf_dir, "nation")
    rows = sorted(
        # a NULL region/name row has no bucket file to land in — skip it
        # when building the fixture, like any manifest-driven ingest
        # skips malformed resources (NULL-poisoned-batch gate)
        nation.filter("n_regionkey IS NOT NULL AND n_name IS NOT NULL")
        .select("n_nationkey", "n_name", "n_regionkey")
        .collect(),
        key=lambda r: r.n_nationkey,
    )
    base = f"/tmp/spark_graft_resttsv_{_tag(sf_dir)}"
    os.makedirs(base, exist_ok=True)
    paths: dict[int, str] = {}
    for rk in sorted({r.n_regionkey for r in rows}):
        p = f"{base}/r{rk}.tsv"
        with open(p, "w", encoding="utf-8") as f:
            for r in rows:
                if r.n_regionkey == rk:
                    # TSV framing cannot carry raw tab/newline: a name
                    # containing them shifts the key field and the ANSI
                    # ''->BIGINT cast crashes the read (string-poisoned
                    # gate) — the standard TSV escape maps them to ' '
                    # at the writer, mirrored in the oracle's
                    # regexp_replace; clean names pass byte-identical.
                    name = re.sub(r"[\t\n\r]", " ", r.n_name)
                    f.write(f"{name}\t{r.n_nationkey}\n")
        paths[rk] = p
    register_rest_tsv(spark)
    if not paths:
        # EMPTY manifest: zero resources to fetch — the source's `urls`
        # contract correctly refuses a blank option, so short-circuit to
        # the empty result frame with the output schema.
        return spark.createDataFrame(
            [], "region_bucket int, n_lines long, key_sum long, first_name string"
        )
    df = (
        spark.read.format("rest_tsv")
        .option("urls", ",".join(f"file://{p}" for p in paths.values()))
        .load()
    )
    parsed = df.select(
        F.regexp_extract("url", r"r(\d+)\.tsv$", 1).cast("int").alias("region_bucket"),
        F.split_part(F.col("line"), F.lit("\t"), F.lit(1)).alias("name"),
        F.split_part(F.col("line"), F.lit("\t"), F.lit(2)).cast("long").alias("key"),
    )
    return parsed.groupBy("region_bucket").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("key").alias("key_sum"),
        F.min("name").alias("first_name"),
    )


register(
    "rest_tsv_source",
    q_rest_tsv_source,
    """
    SELECT CAST(n_regionkey AS INTEGER) AS region_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
           -- the TSV writer's framing escape (tab/newline -> space)
           MIN(regexp_replace(n_name, '[\\t\\n\\r]', ' ', 'g')) AS first_name
    FROM nation
    -- mirror the Spark fixture builder's NULL skip: a NULL region/name
    -- row has no bucket file, so the oracle must not emit a NULL bucket
    WHERE n_regionkey IS NOT NULL AND n_name IS NOT NULL
    GROUP BY n_regionkey
    """,
)


# ---------------------------------------------------------------------------
# Schema evolution: v1 parquet files lack a column that v2 files carry
# (the normal state of a long-lived 100 TB lake). mergeSchema unions the
# footers at read time; v1 rows surface NULL for the new column and the
# aggregate handles them explicitly. The oracle reproduces the same
# semantics from the original table.

def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    path = f"/tmp/spark_graft_evo_{_tag(sf_dir)}"
    v1 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    v2 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_orderpriority", "o_totalprice",
        F.col("o_orderstatus").alias("status_v2"),
    )
    v1.write.mode("overwrite").parquet(f"{path}/v1")
    v2.write.mode("overwrite").parquet(f"{path}/v2")
    back = spark.read.option("mergeSchema", "true").parquet(f"{path}/v1", f"{path}/v2")
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("status_v2").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_legacy_rows"),
        F.count("status_v2").cast("bigint").alias("n_evolved_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )


register(
    "schema_evolution",
    q_schema_evolution,
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_legacy_rows,
           CAST(SUM(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_evolved_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders GROUP BY o_orderpriority
    """,
)


# ---------------------------------------------------------------------------
# binaryfile_roundtrip: the `binaryFile` source — THE ingestion path for an
# image/audio corpus into opaque binary columns (multimodal.py's input
# shape). A deterministic per-doc .bin fixture is materialized under /tmp
# (driver-side: |fixture| = 1/10 of docs, control-plane sized), read back
# as (path, length, content), and value-proven against the original text:
# byte length and md5 must match DuckDB's view of the same documents. At
# 100 TB the same reader scans an object-store prefix with
# pathGlobFilter/recursiveFileLookup, one task per file group.


def q_binaryfile_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    docs = _t(spark, sf_dir, "documents")
    path = f"/tmp/spark_graft_binfiles_{_tag(sf_dir)}"
    # Wipe-then-write, the directory-level equivalent of the other
    # fixtures' .mode("overwrite"): binaryFile scans the WHOLE directory,
    # so stale files from an earlier fixture generation would surface as
    # extra rows the oracle lacks.
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    # Fixture write: one .bin per sampled doc (driver-side loop is fixture
    # construction, like jdbc_roundtrip's embedded Derby — the measured
    # path is the distributed binaryFile scan below).
    sample = docs.filter(F.col("doc_id") % 10 == 0).select("doc_id", "text")
    for r in sample.collect():
        with open(os.path.join(path, f"{r['doc_id']}.bin"), "wb") as f:
            f.write((r["text"] or "").encode("utf-8"))
    bf = spark.read.format("binaryFile").load(path)
    return bf.select(
        # try_cast: a non-matching filename extracts '' which ANSI cast
        # would throw on; NULL doc_id is the right answer for strays
        F.regexp_extract(F.col("path"), r"(\d+)\.bin$", 1)
        .try_cast("long")
        .alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.md5(F.col("content")).alias("md5"),
    )


register(
    "binaryfile_roundtrip",
    q_binaryfile_roundtrip,
    """
    SELECT doc_id,
           CAST(octet_length(CAST(coalesce(text, '') AS BLOB)) AS BIGINT)
               AS n_bytes,
           md5(coalesce(text, '')) AS md5
    FROM documents WHERE doc_id % 10 = 0
    """,
)
