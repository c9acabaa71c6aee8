"""Round-6 additions: DoReMi mixture weights, ordered funnel, span
corruption — semantic properties plus the plan shapes the 100 TB design
depends on."""

from __future__ import annotations

from pyspark.sql import functions as F

from be_analytic_etl_spark.registry import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_doremi_weights_form_a_smoothed_distribution(spark):
    rows = QUERIES["ext_doremi_weights"](spark, SF_DIR).collect()
    k = len(rows)
    assert k >= 2
    # a (rounded) probability distribution: positive, sums to 1 within
    # k half-ulps of the 6dp rounding
    total = sum(r["weight"] for r in rows)
    assert abs(total - 1.0) <= k * 5e-7, total
    for r in rows:
        # uniform smoothing floors every domain at smooth/k
        assert r["weight"] >= 0.2 / k - 5e-7, r
        assert r["excess_loss"] >= 0.0
    # the worst (highest excess loss) source gets the largest weight
    worst = max(rows, key=lambda r: r["excess_loss"])
    assert worst["weight"] == max(r["weight"] for r in rows)


def test_doremi_plan_broadcasts_scalar_folds(spark):
    """After the per-source agg everything is |sources| rows: the min/z
    folds must broadcast, never shuffle-join."""
    plan = plan_of(QUERIES["ext_doremi_weights"](spark, SF_DIR))
    assert "SortMergeJoin" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_funnel_counts_are_ordered_and_strictly_sequential(spark):
    rows = {r["step"]: r for r in QUERIES["ext_funnel"](spark, SF_DIR).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["n_users"] >= rows[2]["n_users"] >= rows[3]["n_users"]
    assert rows[1]["conv_from_prev"] == 1.0 == rows[1]["conv_from_first"]
    for i in (2, 3):
        assert 0.0 <= rows[i]["conv_from_prev"] <= 1.0
        assert 0.0 <= rows[i]["conv_from_first"] <= 1.0


def test_funnel_requires_strict_temporal_order(spark):
    """A user whose click precedes every view must not convert."""
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", "view"),
            (1, "2024-01-01 11:00:00", "click"),
            (1, "2024-01-01 12:00:00", "purchase"),
            (2, "2024-01-01 11:00:00", "view"),
            (2, "2024-01-01 10:00:00", "click"),  # click BEFORE view
        ],
        "user_id long, ts_s string, event_type string",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "event_type")
    u1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    u2 = (
        ev.filter(F.col("event_type") == "click")
        .join(u1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    assert {r["user_id"] for r in u2.collect()} == {1}


def test_span_corruption_is_map_only_and_deterministic(spark):
    df = QUERIES["ext_span_corruption"](spark, SF_DIR)
    plan = plan_of(df)
    # pure map-side: no key shuffle anywhere (the loader's round-robin
    # spread of the single-row-group test parquet is the one allowed
    # Exchange — it carries no grouping semantics)
    assert "hashpartitioning" not in plan, plan
    assert "rangepartitioning" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    rows = df.collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_masked"] <= r["n_tokens"]
        assert r["n_spans"] <= r["n_tokens"] // 8 + 1
        assert abs(r["mask_ratio"] - r["n_masked"] / r["n_tokens"]) == 0.0
    # replay: same inputs -> bit-identical mask plan
    again = {r["doc_id"]: (r["n_spans"], r["n_masked"]) for r in df.collect()}
    assert again == {r["doc_id"]: (r["n_spans"], r["n_masked"]) for r in rows}
