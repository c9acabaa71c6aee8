"""Incremental aggregate maintenance == from-scratch aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from be_analytic_etl_spark.operators import incremental as I

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders(spark):
    from be_analytic_etl_spark.sources import load_table

    return load_table(spark, SF_DIR, "orders").cache()


def _full(orders, keys):
    return (
        orders.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(32,2)"))
            .cast("double")
            .alias("total_totalprice"),
        )
    )


@pytest.mark.parametrize("n_chunks", [1, 3, 7])
def test_fold_order_invariant(spark, orders, n_chunks):
    keys = ["o_orderpriority"]
    measures = {"totalprice": "o_totalprice"}
    state = None
    for i in range(n_chunks):
        chunk = orders.filter(F.col("o_orderkey") % n_chunks == i)
        state = I.merge_states(
            state, I.aggregate_partial(chunk, keys, measures), keys
        )
    got = {
        r["o_orderpriority"]: (r["n_rows"], r["total_totalprice"], r["avg_totalprice"])
        for r in I.finalize(state, keys, ["totalprice"]).collect()
    }
    want = {
        r["o_orderpriority"]: (r["n_rows"], r["total_totalprice"])
        for r in _full(orders, keys).collect()
    }
    assert set(got) == set(want)
    for k, (n, total) in want.items():
        gn, gtotal, gavg = got[k]
        assert gn == n
        # decimal accumulation: EXACT equality regardless of fold order
        assert gtotal == total
        assert gavg == total / n


def test_empty_delta_is_identity(spark, orders):
    keys = ["o_orderpriority"]
    measures = {"totalprice": "o_totalprice"}
    base = I.aggregate_partial(orders, keys, measures)
    empty = I.aggregate_partial(orders.filter(F.lit(False)), keys, measures)
    merged = I.merge_states(base, empty, keys)
    a = {tuple(r) for r in base.collect()}
    b = {tuple(r) for r in merged.collect()}
    assert a == b


def test_schema_mismatch_raises(spark, orders):
    keys = ["o_orderpriority"]
    s1 = I.aggregate_partial(orders, keys, {"totalprice": "o_totalprice"})
    s2 = I.aggregate_partial(orders, keys, {"cust": "o_custkey"})
    with pytest.raises(ValueError, match="schemas differ"):
        I.merge_states(s1, s2, keys)


def test_refresh_buckets_replaces_only_touched(spark, orders):
    keys = ["o_orderpriority"]
    measures = {"totalprice": "o_totalprice"}
    month = F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month")
    bkeys = ["month", *keys]

    state = I.aggregate_partial(orders.select(month, "*"), bkeys, measures)

    # correction: drop half the rows of months >= 1997 (an update+delete mix
    # the additive fold cannot express) and recompute those buckets only
    corrected = orders.filter(F.col("o_orderdate") >= "1997-01-01").filter(
        F.col("o_orderkey") % 2 == 0
    )
    delta = I.aggregate_partial(corrected.select(month, "*"), bkeys, measures)
    refreshed = I.refresh_buckets(state, delta, ["month"])

    full = orders.filter(
        (F.col("o_orderdate") < "1997-01-01")
        | (F.col("o_orderkey") % 2 == 0)
    )
    want = I.aggregate_partial(full.select(month, "*"), bkeys, measures)

    g = {(r["month"], r["o_orderpriority"]): (r["n_rows"], r["sum_totalprice"])
         for r in refreshed.collect()}
    w = {(r["month"], r["o_orderpriority"]): (r["n_rows"], r["sum_totalprice"])
         for r in want.collect()}
    assert g == w


def test_refresh_buckets_explicit_retraction(spark, orders):
    """A correction that empties a bucket entirely must pass the
    invalidated set explicitly; the refreshed state then drops it."""
    keys = ["o_orderpriority"]
    measures = {"totalprice": "o_totalprice"}
    month = F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month")
    bkeys = ["month", *keys]

    state = I.aggregate_partial(orders.select(month, "*"), bkeys, measures)
    # retract EVERYTHING from 1997 onward: corrected partition is empty
    corrected = orders.filter(F.lit(False))
    delta = I.aggregate_partial(corrected.select(month, "*"), bkeys, measures)
    affected = (
        orders.filter(F.col("o_orderdate") >= "1997-01-01")
        .select(month)
        .dropDuplicates()
    )
    refreshed = I.refresh_buckets(state, delta, ["month"], affected=affected)

    want = I.aggregate_partial(
        orders.filter(F.col("o_orderdate") < "1997-01-01").select(month, "*"),
        bkeys,
        measures,
    )
    g = {tuple(r) for r in refreshed.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w

    # ... and WITHOUT the explicit set, the stale buckets survive
    # (the documented default-inference limitation)
    stale = I.refresh_buckets(state, delta, ["month"])
    assert stale.count() == state.count()


def test_merge_states_null_key_group_merges(spark):
    """ADVICE r4: a NULL group key must fold into ONE state row (plain
    ``=`` join equality would split it into two forever)."""
    state = spark.createDataFrame(
        [(None, 1, "10.00"), ("en", 2, "7.00")],
        "lang string, n_rows long, sum_v string",
    ).withColumn("sum_v", F.col("sum_v").cast("decimal(32,2)"))
    delta = spark.createDataFrame(
        [(None, 1, "5.00"), ("de", 3, "1.00")],
        "lang string, n_rows long, sum_v string",
    ).withColumn("sum_v", F.col("sum_v").cast("decimal(32,2)"))
    out = {
        r["lang"]: (r["n_rows"], str(r["sum_v"]))
        for r in I.merge_states(state, delta, ["lang"]).collect()
    }
    assert out[None] == (2, "15.00"), out
    assert out["en"] == (2, "7.00")
    assert out["de"] == (3, "1.00")
    assert len(out) == 3


def test_refresh_buckets_undercovering_affected_no_duplicates(spark):
    """ADVICE r4: an ``affected`` set that omits a bucket present in the
    delta must not leave both the stale and the recomputed row."""
    state = spark.createDataFrame(
        [("2024-01", 5), ("2024-02", 7), ("2024-03", 9)],
        "bucket string, n_rows long",
    )
    delta = spark.createDataFrame(
        [("2024-02", 70), ("2024-03", 90)], "bucket string, n_rows long"
    )
    # caller claims only 2024-02 is affected — under-covers the delta
    affected = spark.createDataFrame([("2024-02",)], "bucket string")
    out = I.refresh_buckets(state, delta, ["bucket"], affected=affected)
    rows = {r["bucket"]: r["n_rows"] for r in out.collect()}
    assert out.count() == 3, "no duplicate bucket rows"
    assert rows == {"2024-01": 5, "2024-02": 70, "2024-03": 90}


def test_refresh_buckets_null_bucket_invalidates(spark):
    """A NULL bucket key in the state must still be replaced when the
    delta recomputes it (null-safe anti join)."""
    state = spark.createDataFrame(
        [(None, 5), ("2024-02", 7)], "bucket string, n_rows long"
    )
    delta = spark.createDataFrame([(None, 50)], "bucket string, n_rows long")
    out = I.refresh_buckets(state, delta, ["bucket"])
    rows = {r["bucket"]: r["n_rows"] for r in out.collect()}
    assert rows == {None: 50, "2024-02": 7}
    assert out.count() == 2
