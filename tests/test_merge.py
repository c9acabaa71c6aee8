"""MERGE/SCD2 semantics pinned on tiny hand-built tables."""

from __future__ import annotations

from be_analytic_etl_spark.operators.merge import merge_upsert, scd2_history


def test_merge_update_insert_delete_and_null_wins(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "name", "bal"]
    )
    updates = spark.createDataFrame(
        [
            (2, "B2", None, False),  # update: NULL bal must WIN (not coalesce)
            (3, "c", 30.0, True),  # delete
            (9, "new", 0.0, False),  # insert
        ],
        "k long, name string, bal double, is_del boolean",
    )
    out = {
        r["k"]: (r["name"], r["bal"])
        for r in merge_upsert(target, updates, ["k"], delete_col="is_del").collect()
    }
    assert out == {1: ("a", 10.0), 2: ("B2", None), 9: ("new", 0.0)}


def test_merge_missing_update_column_raises(spark):
    target = spark.createDataFrame([(1, "a")], ["k", "name"])
    updates = spark.createDataFrame([(1,)], ["k"])
    try:
        merge_upsert(target, updates, ["k"])
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "missing target columns" in str(e)


def test_scd2_intervals_and_current_flag(spark):
    v = spark.createDataFrame(
        [(1, 10, "x"), (1, 20, "y"), (2, 5, "z")], ["k", "valid_from", "state"]
    )
    rows = {
        (r["k"], r["valid_from"]): (r["valid_to"], r["is_current"])
        for r in scd2_history(v, ["k"], "valid_from").collect()
    }
    assert rows == {
        (1, 10): (20, False),
        (1, 20): (None, True),
        (2, 5): (None, True),
    }
