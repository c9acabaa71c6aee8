"""Snapshot diff + curriculum bucketing: semantics and plan shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from be_analytic_etl_spark.operators import versioning as V
from be_analytic_etl_spark.registry import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_snapshot_diff_statuses(spark):
    v1 = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double"
    )
    v2 = spark.createDataFrame(
        [(2, 20.0), (3, 99.0), (4, 40.0)], "k long, v double"
    )
    rows = {r.k: r.status for r in V.snapshot_diff(v1, v2, "k", ["v"]).collect()}
    assert rows == {1: "deleted", 2: "unchanged", 3: "changed", 4: "added"}


def test_snapshot_diff_null_safe_compare(spark):
    v1 = spark.createDataFrame([(1, None), (2, None)], "k long, v string")
    v2 = spark.createDataFrame([(1, None), (2, "x")], "k long, v string")
    rows = {r.k: r.status for r in V.snapshot_diff(v1, v2, "k", ["v"]).collect()}
    assert rows == {1: "unchanged", 2: "changed"}


def test_curriculum_buckets_are_quartiles(spark):
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.col("id").cast("double").alias("ln")
    )
    out = V.curriculum_buckets(df, "ln", id_col="doc_id")
    per = {r.bucket: r.n for r in out.groupBy("bucket").agg(F.count("*").alias("n")).collect()}
    # 0..99: quartile thresholds at 24.75/49.5/74.25 -> 25/25/25/25
    assert per == {0: 25, 1: 25, 2: 25, 3: 25}


def test_curriculum_assignment_is_broadcast_not_sort(spark):
    plan = plan_of(QUERIES["ext_curriculum_sample"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    # no global sort / single-partition window anywhere in the assignment
    assert "rangepartitioning" not in plan, plan


def test_snapshot_diff_single_join_no_extra_exchange(spark):
    plan = plan_of(QUERIES["ext_snapshot_diff"](spark, SF_DIR))
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") == 1, plan
