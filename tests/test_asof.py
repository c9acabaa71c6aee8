"""As-of join tests against pandas ``merge_asof`` (the de-facto reference
semantics) plus hand-pinned edge cases the registered oracle can't vary
(direction, exact-match exclusion, tolerance)."""

from __future__ import annotations

import pandas as pd

from be_analytic_etl_spark.operators.asof import asof_join

LEFT = [
    # key, ts, lval
    ("a", 10, 1),
    ("a", 20, 2),
    ("a", 20, 3),  # duplicate left ts: both get the same match
    ("a", 35, 4),
    ("b", 5, 5),  # before any right row -> null
    ("c", 50, 6),  # key with no right rows at all
]
RIGHT = [
    # key, ts, rval
    ("a", 10, 100),
    ("a", 30, 300),
    ("b", 7, 700),
]


def _spark_asof(spark, **kw):
    l = spark.createDataFrame(LEFT, ["k", "ts", "lval"])
    r = spark.createDataFrame(RIGHT, ["k", "ts", "rval"])
    out = asof_join(l, r, on=["k"], right_cols=["rval"], **kw)
    return {
        (row["k"], row["ts"], row["lval"]): (row["ts_r"], row["rval_r"])
        for row in out.collect()
    }


def _pandas_asof(**kw):
    l = pd.DataFrame(LEFT, columns=["k", "ts", "lval"]).sort_values("ts")
    r = pd.DataFrame(RIGHT, columns=["k", "ts", "rval"]).sort_values("ts")
    m = pd.merge_asof(l, r, on="ts", by="k", suffixes=("", "_r"), **kw)
    # merge_asof drops the matched right ts; recompute it is overkill —
    # compare rval only.
    return {
        (row.k, row.ts, row.lval): None if pd.isna(row.rval) else int(row.rval)
        for row in m.itertuples()
    }


def test_backward_matches_pandas(spark):
    ours = {k: v[1] for k, v in _spark_asof(spark).items()}
    assert ours == _pandas_asof(direction="backward")


def test_forward_matches_pandas(spark):
    ours = {k: v[1] for k, v in _spark_asof(spark, direction="forward").items()}
    assert ours == _pandas_asof(direction="forward")


def test_exact_match_excluded(spark):
    ours = {
        k: v[1] for k, v in _spark_asof(spark, allow_exact_matches=False).items()
    }
    assert ours == _pandas_asof(direction="backward", allow_exact_matches=False)
    # the ts=10 left row must NOT see the ts=10 right row
    assert ours[("a", 10, 1)] is None


def test_tolerance_nulls_stale_matches(spark):
    ours = _spark_asof(spark, tolerance_seconds=6)
    # a@20 matched r@10: gap 10 > 6 -> nulled; a@35 matched r@30: gap 5 ok
    assert ours[("a", 20, 2)] == (None, None)
    assert ours[("a", 35, 4)] == (30, 300)


def test_matched_right_ts_exposed(spark):
    ours = _spark_asof(spark)
    assert ours[("a", 35, 4)] == (30, 300)
    assert ours[("a", 20, 2)] == (10, 100)
    assert ours[("c", 50, 6)] == (None, None)
