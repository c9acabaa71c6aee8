"""Gap-fill edge cases: gaps synthesized + forward-filled, single-point
keys, observed flag."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from be_analytic_etl_spark.operators.timeseries import gapfill


def test_gapfill_densifies_and_ffills(spark):
    d = dt.datetime
    rows = [
        ("a", d(2024, 1, 1), 10.0),
        ("a", d(2024, 1, 4), 40.0),  # 2 missing days in between
        ("b", d(2024, 1, 2), 7.0),  # single point -> spine of 1
    ]
    df = spark.createDataFrame(rows, ["k", "day", "v"])
    out = gapfill(df, ["k"], "day", ["v"], step="1 day")
    got = {
        (r["k"], r["day"].day): (r["v"], r["is_observed"]) for r in out.collect()
    }
    assert got == {
        ("a", 1): (10.0, True),
        ("a", 2): (10.0, False),
        ("a", 3): (10.0, False),
        ("a", 4): (40.0, True),
        ("b", 2): (7.0, True),
    }


def test_gapfill_hourly_step(spark):
    d = dt.datetime
    df = spark.createDataFrame(
        [("a", d(2024, 1, 1, 0), 1.0), ("a", d(2024, 1, 1, 3), 2.0)],
        ["k", "ts", "v"],
    )
    out = gapfill(df, ["k"], "ts", ["v"], step="1 hour")
    assert out.count() == 4
    assert out.filter(~F.col("is_observed")).count() == 2
