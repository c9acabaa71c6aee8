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


def test_markov_rows_are_probability_distributions(spark):
    rows = QUERIES["ext_markov_transitions"](spark, SF_DIR).collect()
    assert rows
    by_src = {}
    for r in rows:
        assert r["n_transitions"] >= 1
        assert 0.0 < r["prob"] <= 1.0
        by_src.setdefault(r["src_type"], []).append(r["prob"])
    # each source row of the matrix sums to exactly 1 (exact counts /
    # one division each; the sum of d_i/N reconstructs N/N)
    for src, probs in by_src.items():
        assert abs(sum(probs) - 1.0) < 1e-12, (src, sum(probs))


def test_markov_successor_pairing_is_order_deterministic(spark):
    """Same-timestamp events order by event_id, so the transition pairs
    are a pure function of the data, not of partitioning."""
    ev = spark.createDataFrame(
        [
            (10, "2024-01-01 10:00:00", "a", 1),
            (10, "2024-01-01 10:00:00", "b", 2),  # same ts: id breaks tie
            (10, "2024-01-01 11:00:00", "c", 3),
            (20, "2024-01-01 09:00:00", "b", 4),
        ],
        "user_id long, ts_s string, event_type string, event_id long",
    ).select(
        "user_id", F.to_timestamp("ts_s").alias("ts"), "event_type", "event_id"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    got = {
        (r["event_type"], r["nxt"])
        for r in ev.select(
            "event_type", F.lead("event_type").over(w).alias("nxt")
        ).collect()
        if r["nxt"] is not None
    }
    assert got == {("a", "b"), ("b", "c")}


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
