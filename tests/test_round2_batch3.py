"""Round-2 batch-3 operators: repetition stats, IVF cell assignment,
exact-decimal correlation, JSONL round-trip."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


# --- repetition_stats -------------------------------------------------------


def _py_repetition(text: str, n: int = 2):
    toks = text.split()
    grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    n_tokens, n_distinct = len(toks), len(set(toks))
    dup = 0.0 if n_tokens == 0 else 1.0 - n_distinct / n_tokens
    if grams:
        from collections import Counter

        top = Counter(grams).most_common(1)[0][1]
        top_frac = top / len(grams)
    else:
        top, top_frac = 0, 0.0
    return n_tokens, n_distinct, dup, len(grams), top, top_frac


@pytest.mark.parametrize(
    "text",
    [
        "a b a b a b a b",          # one dominant bigram
        "x",                        # shorter than the n-gram
        "",                         # empty
        "u v w x y z",              # all unique
        "spam spam spam spam",      # fully repeated
    ],
)
def test_repetition_stats_matches_pure_python(spark, text):
    from be_analytic_etl_spark.operators.textstats import repetition_stats

    df = spark.createDataFrame([(1, text)], "doc_id INT, text STRING")
    row = repetition_stats(df).collect()[0]
    exp = _py_repetition(text)
    got = (
        row["n_tokens"],
        row["n_distinct_tokens"],
        row["dup_token_frac"],
        row["n_grams"],
        row["top_gram_cnt"],
        row["top_gram_frac"],
    )
    assert got == exp, (text, got, exp)


def test_repetition_flags_degenerate_docs(spark):
    from be_analytic_etl_spark.operators.textstats import repetition_stats

    df = spark.createDataFrame(
        [(1, "the same line " * 50), (2, " ".join(f"w{i}" for i in range(150)))],
        "doc_id INT, text STRING",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert rows[1]["dup_token_frac"] > 0.9
    assert rows[1]["top_gram_frac"] > 0.3
    assert rows[2]["dup_token_frac"] == 0.0
    assert rows[2]["top_gram_frac"] < 0.05


# --- assign_cells -----------------------------------------------------------


def test_assign_cells_properties(spark):
    from be_analytic_etl_spark.operators import similarity as S

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    n_cells = 8
    out = S.assign_cells(emb, n_cells=n_cells).cache()
    cells = [r["cell"] for r in out.select("cell").distinct().collect()]
    assert all(0 <= c < n_cells for c in cells)
    # every input row keeps exactly one assignment
    assert out.count() == emb.count()
    # a centroid's own vector is maximally similar to itself -> own cell
    cent_ids = [r["vec_id"] for r in emb.orderBy("vec_id").limit(n_cells).collect()]
    own = {
        r["vec_id"]: r["cell"]
        for r in out.filter(F.col("vec_id").isin(cent_ids)).collect()
    }
    for i, vid in enumerate(sorted(own)):
        assert own[vid] == i, own


def test_semantic_neardup_pairs_are_actually_similar(spark):
    from be_analytic_etl_spark.registry import QUERIES

    rows = QUERIES["ext_semantic_neardup"](spark, SF_DIR).collect()
    assert rows, "expected at least one near-dup pair at sf0.001"
    for r in rows:
        assert r["cos_sim"] >= 0.35
        assert r["id_a"] < r["id_b"]


# --- corr matrix ------------------------------------------------------------


def test_corr_matrix_matches_numpy(spark):
    import numpy as np

    from be_analytic_etl_spark.registry import QUERIES

    got = {
        (r["col_a"], r["col_b"]): r["corr"]
        for r in QUERIES["ext_corr_matrix"](spark, SF_DIR).collect()
    }
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF_DIR}/lineitem.parquet")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    data = {c: np.asarray(tbl[c]) for c in cols}
    for (a, b), v in got.items():
        ref = float(np.corrcoef(data[a], data[b])[0, 1])
        assert math.isclose(v, ref, rel_tol=1e-9), (a, b, v, ref)


# --- jsonl round-trip -------------------------------------------------------


def test_jsonl_roundtrip_preserves_types_and_values(spark):
    from be_analytic_etl_spark.registry import QUERIES

    df = QUERIES["jsonl_roundtrip"](spark, SF_DIR)
    schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert schema == {
        "event_type": "string",
        "n_events": "bigint",
        "n_users": "bigint",
        "sum_value": "double",
    }
    rows = df.collect()
    assert rows and all(r["n_events"] > 0 for r in rows)


def test_multiprobe_assign_is_superset_and_improves_recall(spark):
    """n_assign=2 (IVF multi-probe): every single-assign cell is among the
    top-2, so each vector's multi-assign rows contain its single-assign
    row; and the near-dup pair set can only grow (boundary pairs join)."""
    from be_analytic_etl_spark.operators import similarity as S
    from be_analytic_etl_spark.registry import QUERIES

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    single = {
        (r["vec_id"], r["cell"])
        for r in S.assign_cells(emb, n_cells=8).select("vec_id", "cell").collect()
    }
    multi = {
        (r["vec_id"], r["cell"])
        for r in S.assign_cells(emb, n_cells=8, n_assign=2)
        .select("vec_id", "cell")
        .collect()
    }
    assert single <= multi
    assert len(multi) == 2 * len(single)

    pairs_single = {
        (r["id_a"], r["id_b"])
        for r in QUERIES["ext_semantic_neardup"](spark, SF_DIR).collect()
    }
    pairs_multi = {
        (r["id_a"], r["id_b"])
        for r in QUERIES["ext_semantic_neardup_multiprobe"](spark, SF_DIR).collect()
    }
    assert pairs_single <= pairs_multi
