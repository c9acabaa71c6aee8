"""Unit tests for the declarative constraint audit."""

from __future__ import annotations

import pytest

from be_analytic_etl_spark.operators import quality as Q


def test_constraint_audit_counts_planted_violations(spark):
    rows = [
        (1, "A", 10.0, "ok-1"),
        (2, "B", -5.0, "ok-2"),      # range violation
        (2, "A", 20.0, "bad"),       # dup id + pattern violation
        (None, "Z", 30.0, "ok-3"),   # null id + domain violation
        (4, "A", None, "ok-4"),      # null value -> range violation
    ]
    df = spark.createDataFrame(rows, "id long, cat string, val double, tag string")
    ref = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    rules = [
        Q.not_null("id_not_null", "id"),
        Q.unique("id_unique", "id"),
        Q.in_set("cat_domain", "cat", "A", "B"),
        Q.in_range("val_range", "val", 0.0, 100.0),
        Q.matches("tag_shape", "tag", r"^ok-\d$"),
        Q.foreign_key("id_fk", "id", ref, "id"),
    ]
    out = {r["rule"]: r["n_violations"] for r in Q.constraint_audit(df, rules).collect()}
    assert out == {
        "id_not_null": 1,
        "id_unique": 1,   # one extra row beyond the first for id=2
        "cat_domain": 1,
        "val_range": 2,   # -5.0 and NULL
        "tag_shape": 1,
        "id_fk": 2,       # id=4 is absent from ref; the NULL id never matches
    }


def test_constraint_audit_clean_table_is_all_zero(spark):
    df = spark.createDataFrame([(1, "A"), (2, "B")], "id long, cat string")
    rules = [
        Q.not_null("id_nn", "id"),
        Q.unique("id_u", "id"),
        Q.in_set("cat_dom", "cat", "A", "B"),
    ]
    out = Q.constraint_audit(df, rules).collect()
    assert {r["rule"] for r in out} == {"id_nn", "id_u", "cat_dom"}
    assert all(r["n_violations"] == 0 for r in out)


def test_constraint_audit_rejects_unknown_kind(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        Q.constraint_audit(df, [Q.Rule("x", "nope", col="id")])
