"""Property-based end-to-end checks for the round-11 panels: run the
REGISTERED queries on randomized synthetic parquet corpora and compare
against naive brute-force recomputation (materialized MATTR windows,
direct Kaplan-Meier / Nelson-Aalen loops, exhaustive changepoint
search, numpy-free Ljung-Box, textbook Fleiss/Cochran). Same harness
as tests/test_round9_property.py / test_round10_property.py."""

from __future__ import annotations

import datetime
import math
import random
from collections import Counter, defaultdict

import pytest

from tests.test_round10_property import _write_daily
from tests.test_round9_property import _write_documents_langs


def _run(spark, name, sf_dir):
    from be_analytic_etl_spark.registry import QUERIES

    return QUERIES[name](spark, sf_dir).collect()


def _write_events(spark, path: str, rows) -> None:
    """rows: (user_id, ts_str, event_type, value)"""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (i, ts, u, et, v, None)
            for i, (u, ts, et, v) in enumerate(rows)
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _write_docs_text(spark, path: str, rows) -> None:
    """rows: (doc_id, text, lang) — raw text controlled by the test."""
    df = spark.createDataFrame(
        [(i, t, lg, "web", len(t)) for i, t, lg in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


@pytest.mark.parametrize("seed", [60, 61, 62])
def test_mattr_matches_materialized_windows(spark, tmp_path, seed):
    """The windowless MATTR (closed-form per-occurrence contribution
    from one LAG pass) vs literally materializing every 25-token window
    and counting distinct types."""
    rng = random.Random(seed)
    vocab = ["a", "bb", "ccc", "dd", "e", "ffff", "g", "hh"]
    rows = []
    for i in range(rng.randint(2, 8)):
        n = rng.choice([0, 5, 24, 25, 26, 40, 90])
        text = " ".join(rng.choice(vocab) for _ in range(n))
        rows.append((i, text, rng.choice(["en", "fr"])))
    sf_dir = str(tmp_path / f"sf_mattr{seed}")
    _write_docs_text(spark, sf_dir, rows)
    out = {r["lang"]: r for r in _run(spark, "ext_mattr", sf_dir)}
    w = 25
    per_lang = defaultdict(lambda: [0, 0, 0])  # docs, windows, distinct_sum
    for _, text, lg in rows:
        toks = text.split()
        per_lang[lg][0] += 1
        n = len(toks)
        for s in range(max(0, n - w + 1)):
            per_lang[lg][1] += 1
            per_lang[lg][2] += len(set(toks[s : s + w]))
    for lg, (nd, nw, ds) in per_lang.items():
        row = out[lg]
        assert row["n_docs"] == nd
        assert row["n_windows"] == nw
        if nw == 0:
            assert row["mattr"] is None
        else:
            assert row["mattr"] == pytest.approx(ds / (w * nw), abs=1e-9)


@pytest.mark.parametrize("seed", [63, 64, 65])
def test_survival_curve_matches_direct_km(spark, tmp_path, seed):
    """The histogram-based survival panel vs a direct per-user loop:
    durations, censoring at the corpus horizon, at-risk counts, KM
    factors, and the Nelson-Aalen cumulative hazard."""
    rng = random.Random(seed)
    start = datetime.date(2024, 1, 1)
    rows = []
    users = {}
    for u in range(rng.randint(1, 12)):
        f = rng.randint(0, 20)
        l = f + rng.choice([0, 0, 1, 3, 10])
        users[u] = (f, l)
        for d in {f, l, rng.randint(f, l)}:
            rows.append(
                (
                    u,
                    f"{start + datetime.timedelta(days=d)} 09:00:00",
                    "view",
                    1.0,
                )
            )
    sf_dir = str(tmp_path / f"sf_km{seed}")
    _write_events(spark, sf_dir, rows)
    out = sorted(
        _run(spark, "ext_survival_curve", sf_dir), key=lambda r: r["t_days"]
    )
    horizon = max(l for _, l in users.values())
    durs = []
    for f, l in users.values():
        if l < horizon:
            durs.append((l - f, 1))
        else:
            durs.append((horizon - f, 0))
    hist = Counter(durs)
    ts = sorted({t for t, _ in durs})
    assert [r["t_days"] for r in out] == ts
    na = 0.0
    for r in out:
        t = r["t_days"]
        d = hist[(t, 1)]
        c = hist[(t, 0)]
        n_risk = sum(cnt for (tt, _), cnt in hist.items() if tt >= t)
        assert (r["d_events"], r["c_censored"], r["n_risk"]) == (d, c, n_risk)
        assert r["km_factor"] == pytest.approx((n_risk - d) / n_risk, abs=1e-9)
        na += d / n_risk
        assert r["na_cum_hazard"] == pytest.approx(na, abs=1e-8)


@pytest.mark.parametrize("seed", [66, 67, 68])
def test_binseg_changepoint_matches_exhaustive_search(spark, tmp_path, seed):
    """The prefix-sum binseg split vs exhaustively evaluating every
    split's explained-variance share on the raw series."""
    rng = random.Random(seed)
    start = datetime.date(2024, 5, 1)
    n = rng.randint(2, 30)
    shift = rng.choice([0, 10000])
    rows = [
        (
            str(start + datetime.timedelta(days=i)),
            rng.randint(0, 5000) + (shift if i > n // 2 else 0),
        )
        for i in range(n)
    ]
    sf_dir = str(tmp_path / f"sf_bs{seed}")
    _write_daily(spark, sf_dir, rows)
    out = _run(spark, "ext_binseg_changepoint", sf_dir)
    cs = [c for _, c in rows]
    tot = sum(cs)
    q = sum(c * c for c in cs)
    sse = q - tot * tot / n
    best = None
    for i in range(1, n):
        left, right = cs[:i], cs[i:]
        gain = (
            sum(left) ** 2 / len(left)
            + sum(right) ** 2 / len(right)
            - tot * tot / n
        )
        score = gain / sse if sse > 0 else None
        key = (round(score, 12) if score is not None else None, rows[i - 1][0])
        if best is None or (
            key[0] is not None
            and (best[0] is None or key[0] > best[0])
        ):
            best = (key[0], rows[i - 1][0], len(left), len(right))
    row = out[0]
    assert str(row["split_day"]) == best[1]
    assert (row["n_left"], row["n_right"]) == (best[2], best[3])
    if best[0] is not None:
        assert row["var_explained"] == pytest.approx(best[0], abs=1e-9)


@pytest.mark.parametrize("seed", [69, 70])
def test_ljung_box_matches_direct_formula(spark, tmp_path, seed):
    """The scaled-deviation Ljung-Box Q vs the direct acf loop on the
    raw daily series."""
    rng = random.Random(seed)
    start = datetime.date(2024, 7, 1)
    n = rng.randint(3, 40)
    rows = [
        (str(start + datetime.timedelta(days=i)), rng.randint(100, 9000))
        for i in range(n)
    ]
    sf_dir = str(tmp_path / f"sf_lb{seed}")
    _write_daily(spark, sf_dir, rows)
    out = _run(spark, "ext_ljung_box", sf_dir)
    cs = [c for _, c in rows]
    mean = sum(cs) / n
    den = sum((c - mean) ** 2 for c in cs)
    if den == 0:
        assert out == [] or out[0]["q_stat"] is None
        return
    q = 0.0
    max_lag = 0
    for k in range(1, min(7, n - 1) + 1):
        rho = (
            sum((cs[i] - mean) * (cs[i + k] - mean) for i in range(n - k))
            / den
        )
        q += rho * rho / (n - k)
        max_lag = k
    q *= n * (n + 2)
    row = out[0]
    assert row["n_days"] == n and row["max_lag"] == max_lag
    assert row["q_stat"] == pytest.approx(q, abs=1e-4)


@pytest.mark.parametrize("seed", [71, 72])
def test_rater_agreement_matches_textbook(spark, tmp_path, seed):
    """The n_pos-histogram Fleiss kappa + Cochran Q vs the textbook
    per-item formulas on the raw rater matrix."""
    rng = random.Random(seed)
    rows = []
    for i in range(rng.randint(2, 40)):
        n_toks = rng.choice([1, 5, 19, 20, 30])
        body = " ".join("tok" for _ in range(n_toks))
        if rng.random() < 0.5:
            body += "."
        if rng.random() < 0.5:
            body += " pad" * 30  # push n_chars over 100
        rows.append((i, body, "en"))
    sf_dir = str(tmp_path / f"sf_ra{seed}")
    _write_docs_text(spark, sf_dir, rows)
    out = _run(spark, "ext_rater_agreement", sf_dir)[0]
    mat = []
    for _, text, _ in rows:
        r1 = 1 if len(text) >= 100 else 0
        r2 = 1 if len(text.split()) >= 20 else 0
        r3 = 1 if "." in text else 0
        mat.append((r1, r2, r3))
    n = len(mat)
    assert out["n_docs"] == n
    assert (out["r1_pos"], out["r2_pos"], out["r3_pos"]) == tuple(
        sum(m[j] for m in mat) for j in range(3)
    )
    # Fleiss
    p_i = [
        (
            sum(m) * (sum(m) - 1)
            + (3 - sum(m)) * (2 - sum(m))
        )
        / 6
        for m in mat
    ]
    pbar = sum(p_i) / n
    p = sum(sum(m) for m in mat) / (3 * n)
    pe = p * p + (1 - p) * (1 - p)
    if 1 - pe > 0:
        assert out["fleiss_kappa"] == pytest.approx(
            (pbar - pe) / (1 - pe), abs=1e-6
        )
    else:
        assert out["fleiss_kappa"] is None
    # Cochran
    cj = [sum(m[j] for m in mat) for j in range(3)]
    t = sum(cj)
    ri2 = sum(sum(m) ** 2 for m in mat)
    qden = 3 * t - ri2
    if qden > 0:
        qq = 2 * (3 * sum(c * c for c in cj) - t * t) / qden
        assert out["cochran_q"] == pytest.approx(qq, abs=1e-6)
    else:
        assert out["cochran_q"] is None


@pytest.mark.parametrize("seed", [73, 74])
def test_capture_recapture_matches_direct_sets(spark, tmp_path, seed):
    """The flag-fold estimators vs direct vocabulary set algebra."""
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(rng.randint(2, 20)):
        text = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 15)))
        rows.append((i, text, "en"))
    sf_dir = str(tmp_path / f"sf_cr{seed}")
    _write_docs_text(spark, sf_dir, rows)
    out = _run(spark, "ext_capture_recapture", sf_dir)[0]
    even = set()
    odd = set()
    for i, text, _ in rows:
        (even if i % 2 == 0 else odd).update(text.split())
    n1, n2, m = len(even), len(odd), len(even & odd)
    assert (out["vocab_even"], out["vocab_odd"], out["vocab_both"]) == (
        n1, n2, m,
    )
    assert out["vocab_observed"] == len(even | odd)
    if m > 0:
        assert out["lp_estimate"] == pytest.approx(n1 * n2 / m, abs=1e-6)
    else:
        assert out["lp_estimate"] is None
    assert out["chapman_estimate"] == pytest.approx(
        (n1 + 1) * (n2 + 1) / (m + 1) - 1, abs=1e-6
    )
