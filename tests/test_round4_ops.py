"""Round-4 operators: frequency spectrum, histogram quantiles, LSH recall.

The registry oracle pins cross-engine values; these pin the SEMANTICS —
mass conservation, sketch error bounds, estimator sanity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_freq_spectrum_conserves_mass_and_vocab(spark):
    from be_analytic_etl_spark.operators.textstats import (
        token_frequency_spectrum,
        tokenize,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    spec = token_frequency_spectrum(docs).cache()
    got = spec.agg(
        F.sum("token_mass").alias("mass"), F.sum("n_types").alias("vocab")
    ).first()
    total_tokens = docs.select(
        F.sum(F.size(tokenize("text"))).alias("n")
    ).first()["n"]
    vocab = (
        docs.select(F.explode(tokenize("text")).alias("t")).distinct().count()
    )
    assert got["mass"] == total_tokens
    assert got["vocab"] == vocab
    # spectrum is keyed by freq: no duplicate freq rows
    assert spec.count() == spec.select("freq").distinct().count()


def test_histogram_quantiles_within_one_bin_of_exact(spark):
    from be_analytic_etl_spark.operators.profiling import histogram_quantiles

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    bins = 64
    est = {
        (r["event_type"], r["q"]): r["quantile_est"]
        for r in histogram_quantiles(
            ev, "value", group_cols=["event_type"], bins=bins
        ).collect()
    }
    exact = {
        r["event_type"]: (r["p50"], r["p90"], r["vmin"], r["vmax"])
        for r in ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.9)").alias("p90"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
        .collect()
    }
    for etype, (p50, p90, vmin, vmax) in exact.items():
        width = (vmax - vmin) / bins
        assert abs(est[(etype, 0.5)] - p50) <= width + 1e-9, etype
        assert abs(est[(etype, 0.9)] - p90) <= width + 1e-9, etype


def test_lsh_recall_estimator_sanity(spark):
    from be_analytic_etl_spark.operators.dedup import lsh_recall_estimate

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    row = lsh_recall_estimate(
        docs, sample_buckets=1000, num_hashes=8, bands=4, shingle_n=3,
        jaccard_threshold=0.6, portable=True,
    ).first()
    assert row["n_hit"] <= row["n_truth"]
    assert row["n_hit"] <= row["n_cand"]
    assert 0.0 <= row["recall"] <= 1.0
    assert 0.0 <= row["candidate_precision"] <= 1.0
    assert row["n_sample"] > 0
    # with 4 bands of 2 hashes at threshold 0.6, candidate recall on a
    # same-corpus sample should be high — a collapsed estimator (0 cand)
    # would be a banding bug
    assert row["n_cand"] > 0


def test_histogram_quantiles_keeps_null_group(spark):
    import pandas as pd

    from be_analytic_etl_spark.operators.profiling import histogram_quantiles

    df = spark.createDataFrame(
        pd.DataFrame(
            {"g": ["a", "a", None, None], "v": [1.0, 3.0, 10.0, 30.0]}
        )
    )
    rows = histogram_quantiles(
        df, "v", group_cols=["g"], bins=4, quantiles=(0.5,)
    ).collect()
    got = {r["g"]: r["quantile_est"] for r in rows}
    assert None in got, "NULL group key must survive the stats join"
    assert got[None] == 10.0  # ceil(0.5*2)=1st order stat's bin lower edge
    assert got["a"] == 1.0


def test_multiprobe_null_vector_gets_null_cell(spark):
    from pyspark.sql import Row, functions as F

    from be_analytic_etl_spark.operators import similarity as S

    emb = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[1.0, 0.0]),
            Row(vec_id=2, embedding=[0.0, 1.0]),
            Row(vec_id=3, embedding=None),
        ],
        "vec_id long, embedding array<double>",
    )
    out = S.assign_cells(emb, n_cells=2, n_assign=2)
    null_cells = [
        r["cell"] for r in out.filter(F.col("vec_id") == 3).collect()
    ]
    assert null_cells == [None], null_cells


def test_lsh_tuning_curve_is_monotone_in_bands(spark):
    """With band counts forming a divisibility chain (1|2|4|8), a
    coarser-banding candidate (longer slices match) is always a
    finer-banding candidate (its sub-slices match) — so n_cand, n_hit,
    and recall must be non-decreasing in bands."""
    from be_analytic_etl_spark.operators.dedup import lsh_band_tuning

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = sorted(
        lsh_band_tuning(
            docs, sample_buckets=1000, num_hashes=8, band_options=(1, 2, 4, 8),
            shingle_n=3, jaccard_threshold=0.6,
        ).collect(),
        key=lambda r: r["bands"],
    )
    assert [r["bands"] * r["rows_per_band"] for r in rows] == [8] * 4
    assert len({r["n_truth"] for r in rows}) == 1
    for prev, nxt in zip(rows, rows[1:]):
        assert nxt["n_cand"] >= prev["n_cand"]
        assert nxt["n_hit"] >= prev["n_hit"]
        assert nxt["recall"] >= prev["recall"]
