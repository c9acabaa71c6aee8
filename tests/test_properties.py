"""Property-based tests (hypothesis): random inputs against independent
reference implementations — the operator contracts must hold on inputs no
hand-written fixture would think of.

Each example runs a real Spark job, so example counts are kept small;
shrinking still gives minimal counterexamples on failure.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

KEYS = st.sampled_from(["a", "b", "c"])
TS = st.integers(min_value=0, max_value=50)


@st.composite
def asof_case(draw):
    left = draw(
        st.lists(st.tuples(KEYS, TS, st.integers(0, 999)), min_size=1, max_size=20)
    )
    right_raw = draw(
        st.lists(st.tuples(KEYS, TS, st.integers(0, 999)), min_size=1, max_size=20)
    )
    # dedup right per (key, ts): the operator's uniqueness contract
    right = list({(k, t): (k, t, v) for k, t, v in right_raw}.values())
    return left, right


@given(case=asof_case(), direction=st.sampled_from(["backward", "forward"]))
@settings(**SETTINGS)
def test_asof_join_matches_pandas_on_random_frames(spark, case, direction):
    from be_analytic_etl_spark.operators.asof import asof_join

    left, right = case
    # unique left row id so duplicated (k, ts) left rows stay distinct
    lpd = pd.DataFrame(
        [(k, t, v, i) for i, (k, t, v) in enumerate(left)],
        columns=["k", "ts", "lval", "rowid"],
    ).sort_values("ts", kind="stable")
    rpd = pd.DataFrame(right, columns=["k", "ts", "rval"]).sort_values(
        "ts", kind="stable"
    )
    want = {
        int(r.rowid): None if pd.isna(r.rval) else int(r.rval)
        for r in pd.merge_asof(
            lpd, rpd, on="ts", by="k", direction=direction, suffixes=("", "_r")
        ).itertuples()
    }

    l = spark.createDataFrame(lpd)
    r = spark.createDataFrame(rpd)
    out = asof_join(l, r, on=["k"], right_cols=["rval"], direction=direction)
    got = {int(row["rowid"]): row["rval_r"] for row in out.collect()}
    assert got == want


@st.composite
def merge_case(draw):
    tkeys = draw(st.lists(st.integers(0, 30), min_size=1, max_size=15, unique=True))
    ukeys = draw(st.lists(st.integers(0, 40), min_size=1, max_size=15, unique=True))
    target = [(k, f"t{k}", float(k)) for k in tkeys]
    updates = [
        (k, f"u{k}", None if k % 3 == 0 else float(k * 2), k % 5 == 0)
        for k in ukeys
    ]
    return target, updates


@given(case=merge_case())
@settings(**SETTINGS)
def test_merge_upsert_laws(spark, case):
    from be_analytic_etl_spark.operators.merge import merge_upsert

    target_rows, update_rows = case
    target = spark.createDataFrame(target_rows, "k long, name string, bal double")
    updates = spark.createDataFrame(
        update_rows, "k long, name string, bal double, is_del boolean"
    )
    out = merge_upsert(target, updates, ["k"], delete_col="is_del")
    got = {r["k"]: (r["name"], r["bal"]) for r in out.collect()}

    # independent python reference
    want = {k: (n, b) for k, n, b in target_rows}
    for k, n, b, d in update_rows:
        if d:
            want.pop(k, None)
        else:
            want[k] = (n, b)
    assert got == want

    # idempotence: applying the same (non-delete) updates again is a no-op
    upd2 = updates.filter("not is_del")
    once = merge_upsert(target, upd2, ["k"], delete_col="is_del")
    twice = merge_upsert(once, upd2, ["k"], delete_col="is_del")
    assert twice.exceptAll(once).count() == 0 and once.exceptAll(twice).count() == 0


@given(
    nums=st.lists(
        st.tuples(st.integers(0, 10**9), st.integers(0, 99)),
        min_size=1,
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_br_number_parse_roundtrip(spark, nums):
    """BR-locale strings built from random (int, cents) pairs parse to
    exactly int + cents/100 (both are exact decimal-string -> double
    conversions, so equality is exact)."""
    from pyspark.sql import functions as F

    from be_analytic_etl_spark.functions import br_number_to_double

    def br(n: int, c: int) -> str:
        return f"{n:,}".replace(",", ".") + f",{c:02d}"

    rows = [(i, br(n, c), float(f"{n}.{c:02d}")) for i, (n, c) in enumerate(nums)]
    df = spark.createDataFrame(rows, "i long, raw string, want double")
    got = df.select("i", br_number_to_double("raw").alias("got"), "want").collect()
    for r in got:
        assert r["got"] == r["want"], (r["i"], r["got"], r["want"])
