"""Storage-layout queries: the plan properties the layouts exist for.

- partitioned_prune must show a non-empty PartitionFilters in the scan
  (directory pruning before IO);
- bucketed_join must read both sides bucketed and sort-merge-join them
  with NO per-side shuffle (the only exchange left is the final group-by).
"""

from __future__ import annotations

from be_analytic_etl_spark.registry import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partition_pruning_reaches_scan(spark):
    df = QUERIES["partitioned_prune"](spark, SF_DIR)
    plan = plan_of(df)
    assert "PartitionFilters: [" in plan, plan
    # the filter must be ON the partition column, inside PartitionFilters
    seg = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "o_orderpriority" in seg, plan
    # and must NOT survive as a post-scan data filter
    assert "PushedFilters: [IsNotNull(o_orderpriority), EqualTo(o_orderpriority" not in plan


def test_bucketed_join_has_no_per_side_shuffle(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = QUERIES["bucketed_join"](spark, SF_DIR)
        plan = plan_of(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan, plan
    assert "Bucketed: true" in plan, plan
    # exactly one exchange: the final group-by; neither join side shuffles
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_orc_roundtrip_reads_orc(spark):
    df = QUERIES["orc_roundtrip"](spark, SF_DIR)
    plan = plan_of(df)
    assert "Format: ORC" in plan or "orc" in plan.lower(), plan
