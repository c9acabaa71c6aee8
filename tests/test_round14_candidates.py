"""STAGED round-14 candidates (queries_round14_candidates.py): each
must already match its DuckDB oracle at sf0.001 — the same dress
rehearsal the r13 candidates got one round before registration — plus
brute-force property mirrors and the five poisoned corpora, so r14
registration is three register() calls and a window slot."""

from __future__ import annotations

import math

# registry first (circular-import discipline)
from be_analytic_etl_spark import registry  # noqa: F401

SF_DIR = "/root/testdata/sf0.001"


def test_staged_candidates_match_their_oracles(spark, duck):
    from tests.conftest import assert_matches_oracle

    from be_analytic_etl_spark.queries_round14_candidates import (
        ext_durbin_watson,
        ext_durbin_watson_oracle,
        ext_jarque_bera,
        ext_jarque_bera_oracle,
        ext_pr_auc,
        ext_pr_auc_oracle,
    )

    for fn, sql in [
        (ext_jarque_bera, ext_jarque_bera_oracle()),
        (ext_pr_auc, ext_pr_auc_oracle()),
        (ext_durbin_watson, ext_durbin_watson_oracle()),
    ]:
        assert_matches_oracle(fn(spark, SF_DIR), duck, sql)


def _micro_scores(spark):
    """(source, micro-unit q6) pairs recomputed through the engine's own
    scoring column (the property tests verify the MOMENT ALGEBRA, not
    the score definition — that is pinned elsewhere)."""
    from pyspark.sql import functions as F

    from be_analytic_etl_spark.functions.rounding import stable_round
    from be_analytic_etl_spark.operators import textstats as T
    from be_analytic_etl_spark.queries_extensions import _t

    q6 = (
        stable_round(T.quality_score("text", round_to=None), 6)
        .cast("decimal(18,6)")
        .alias("q6")
    )
    rows = (
        _t(spark, SF_DIR, "documents")
        .select("source", q6)
        .select("source", (F.col("q6") * 1000000).cast("long").alias("x"))
        .collect()
    )
    return [(r["source"], r["x"]) for r in rows if r["x"] is not None]


def test_jarque_bera_matches_numpy_moments(spark):
    import numpy as np

    from be_analytic_etl_spark.queries_round14_candidates import ext_jarque_bera

    got = {r["source"]: r for r in ext_jarque_bera(spark, SF_DIR).collect()}
    by_src: dict[str, list[int]] = {}
    for s, x in _micro_scores(spark):
        by_src.setdefault(s, []).append(x)
    assert set(got) == set(by_src)
    for s, xs in by_src.items():
        a = np.asarray(xs, dtype=np.float64)
        n = len(a)
        r = got[s]
        assert r["n_docs"] == n
        assert math.isclose(r["mean_q"], a.mean() * 1e-6, rel_tol=1e-9)
        m2 = ((a - a.mean()) ** 2).mean()
        if n < 2 or m2 <= 0:
            assert r["skewness"] is None and r["jb_stat"] is None
            continue
        skew = ((a - a.mean()) ** 3).mean() / m2**1.5
        exk = ((a - a.mean()) ** 4).mean() / m2**2 - 3.0
        jb = n / 6.0 * (skew**2 + exk**2 / 4.0)
        assert math.isclose(r["skewness"], skew, rel_tol=0, abs_tol=1e-5)
        assert math.isclose(r["ex_kurtosis"], exk, rel_tol=0, abs_tol=1e-5)
        assert math.isclose(r["jb_stat"], jb, rel_tol=1e-4, abs_tol=1e-4)


def test_pr_auc_matches_python_stepfold(spark):
    """AP recomputed by an explicit descending block fold over the
    (score, label) pairs — the textbook sum of DeltaRecall * Precision
    at each distinct threshold."""
    from pyspark.sql import functions as F

    from be_analytic_etl_spark.functions.rounding import stable_round
    from be_analytic_etl_spark.operators import textstats as T
    from be_analytic_etl_spark.queries_extensions import _t
    from be_analytic_etl_spark.queries_round14_candidates import (
        _PR_LEN_THRESHOLD,
        ext_pr_auc,
    )

    q6 = (
        stable_round(T.quality_score("text", round_to=None), 6)
        .cast("decimal(18,6)")
        .alias("score")
    )
    rows = (
        _t(spark, SF_DIR, "documents")
        .select(
            q6, (T.char_count("text") >= _PR_LEN_THRESHOLD).cast("int").alias("pos")
        )
        .collect()
    )
    pairs = [(float(r["score"]), r["pos"]) for r in rows if r["score"] is not None]
    blocks: dict[float, list[int]] = {}
    for s, p in pairs:
        blocks.setdefault(s, []).append(p)
    tp = pp = 0
    ap_sum = 0.0
    n_pos = sum(p for _, p in pairs)
    for s in sorted(blocks, reverse=True):
        bp = sum(blocks[s])
        tp += bp
        pp += len(blocks[s])
        ap_sum += bp * tp / pp
    got = ext_pr_auc(spark, SF_DIR).first()
    assert got["n_pos"] == n_pos
    assert got["n_neg"] == len(pairs) - n_pos
    if n_pos:
        assert math.isclose(got["avg_precision"], ap_sum / n_pos, abs_tol=1e-5)
        # AP of a non-degenerate ranking sits in (0, 1]
        assert 0.0 < got["avg_precision"] <= 1.0
    else:
        assert got["avg_precision"] is None


def test_durbin_watson_matches_python_ols(spark):
    import duckdb

    from be_analytic_etl_spark.queries_round14_candidates import (
        ext_durbin_watson,
    )

    daily = duckdb.sql(
        f"""
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS c
        FROM '{SF_DIR}/events.parquet'
        WHERE ts IS NOT NULL AND value IS NOT NULL
        GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    ys = [float(c) for _, c in daily]
    n = len(ys)
    ts = list(range(1, n + 1))
    sx, sy = sum(ts), sum(ys)
    sxx = sum(t * t for t in ts)
    sxy = sum(t * y for t, y in zip(ts, ys))
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n
    e = [round(y - a - b * t) for t, y in zip(ts, ys)]
    num = sum((e[i] - e[i - 1]) ** 2 for i in range(1, n))
    den = sum(v * v for v in e)
    got = ext_durbin_watson(spark, SF_DIR).first()
    assert got["n_days"] == n
    assert math.isclose(got["slope_cents"], b, rel_tol=1e-6, abs_tol=1e-5)
    assert math.isclose(got["intercept_cents"], a, rel_tol=1e-6, abs_tol=1e-4)
    assert den > 0
    assert math.isclose(got["dw_stat"], num / den, abs_tol=1e-5)
    assert math.isclose(got["rho_lag1"], 1 - num / den / 2, abs_tol=1e-5)
    # DW lives in [0, 4] by construction
    assert 0.0 <= got["dw_stat"] <= 4.0


# Pre-registration degenerate hardening (the staged-candidate
# discipline: the adversarial gates only iterate the REGISTRY, so run
# the five poisoned corpora against the candidates NOW). Fixtures
# imported by reference from the gate module.
from tests.test_degenerate_corpora import (  # noqa: E402,F401
    empty_dir,
    nan_poisoned_dir,
    null_poisoned_dir,
    one_row_dir,
    string_poisoned_dir,
)


def _candidates():
    from be_analytic_etl_spark.queries_round14_candidates import (
        ext_durbin_watson,
        ext_jarque_bera,
        ext_pr_auc,
    )

    return [ext_jarque_bera, ext_pr_auc, ext_durbin_watson]


def test_candidates_survive_one_row(spark, one_row_dir):
    for fn in _candidates():
        assert fn(spark, one_row_dir).collect() is not None


def test_candidates_survive_empty(spark, empty_dir):
    for fn in _candidates():
        assert fn(spark, empty_dir).collect() is not None


def test_candidates_survive_null_poisoned(spark, null_poisoned_dir):
    for fn in _candidates():
        assert fn(spark, null_poisoned_dir).collect() is not None


def test_candidates_survive_nan_poisoned(spark, nan_poisoned_dir):
    for fn in _candidates():
        assert fn(spark, nan_poisoned_dir).collect() is not None


def test_candidates_survive_string_poisoned(spark, string_poisoned_dir):
    for fn in _candidates():
        assert fn(spark, string_poisoned_dir).collect() is not None
