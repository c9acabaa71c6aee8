"""Property-based end-to-end checks for the round-10 k-sample panel:
run the REGISTERED queries on randomized synthetic parquet corpora and
compare against naive brute-force recomputation (full midrank sorts,
O(n^2)/O(n_a*n_b) pair loops, step-function CDF integrals). Same
harness as tests/test_round9_property.py — this pins the
bounded-histogram rank algebra on edge shapes the fixed testdata can't
produce (single group, all-tied values, even/odd sizes)."""

from __future__ import annotations

import math
import random
from collections import Counter, defaultdict

import pytest

from tests.test_round9_property import (
    _collected_scores,
    _write_documents_langs,
)


def _run(spark, name, sf_dir):
    from be_analytic_etl_spark.registry import QUERIES

    return QUERIES[name](spark, sf_dir).collect()


def _rand_corpus(rng, groups):
    """(group, 'web', n_chars) rows with n_chars <= 120: the synthetic
    'word '*k text saturates quality_score at 0.5 once k >= 20 tokens
    (n_chars >= 100), so SMALL n keeps the score distribution varied —
    with ~100 the saturation value still appears as a heavy tie."""
    rows = []
    for g in groups:
        size = rng.randint(1, 30)
        if rng.random() < 0.3:
            rows += [(g, "web", 100)] * size  # one score value: max ties
        else:
            rows += [(g, "web", rng.randint(0, 120)) for _ in range(size)]
    return rows


def _midranks(vals):
    cnt = Counter(vals)
    ranks, below = {}, 0
    for v in sorted(cnt):
        ranks[v] = below + (cnt[v] + 1) / 2
        below += cnt[v]
    return ranks


@pytest.mark.parametrize("seed", [20, 21, 22])
def test_kruskal_wallis_on_random_corpus(spark, tmp_path, seed):
    """Registered KW (source-grouped histogram rank algebra) vs the
    textbook H = 12/(n(n+1)) * sum n_s (meanrank_s - (n+1)/2)^2 with
    midranks from a full sort, plus the tie correction."""
    rng = random.Random(seed)
    # group lives in `source` here: vary lang-free corpora via sources
    groups = ["web", "books", "ALL", "s4"][: rng.choice([1, 2, 4])]
    rows = [(lg, src, n) for src in groups for lg, _, n in _rand_corpus(rng, ["en"])]
    sf_dir = str(tmp_path / f"sf_kw{seed}")
    _write_documents_langs(spark, sf_dir, rows)

    import be_analytic_etl_spark.registry  # noqa: F401
    from be_analytic_etl_spark.queries_round9 import _q6
    from be_analytic_etl_spark.sources import load_table

    scored = [
        (r["source"], float(r["__q6"]))
        for r in load_table(spark, sf_dir, "documents")
        .select("source", _q6())
        .collect()
    ]
    out = _run(spark, "ext_kruskal_wallis", sf_dir)[0]
    n = len(scored)
    k = len({s for s, _ in scored})
    assert (out["n"], out["k"]) == (n, k)
    ranks = _midranks([q for _, q in scored])
    by = defaultdict(list)
    for s, q in scored:
        by[s].append(q)
    if k < 2 or n <= 1:
        assert out["h_stat"] is None
        return
    h = (12.0 / (n * (n + 1))) * sum(
        len(xs) * (sum(ranks[q] for q in xs) / len(xs) - (n + 1) / 2) ** 2
        for xs in by.values()
    )
    assert out["h_stat"] == pytest.approx(h, abs=1e-5)
    t3 = sum(t**3 - t for t in Counter(q for _, q in scored).values())
    corr = 1.0 - t3 / (n**3 - n)
    if corr > 0:
        assert out["h_tie_corrected"] == pytest.approx(h / corr, abs=1e-5)
    else:
        assert out["h_tie_corrected"] is None


@pytest.mark.parametrize("seed", [30, 31, 32])
def test_cvm_on_random_corpus(spark, tmp_path, seed):
    """Registered two-sample CvM vs the step-CDF definition
    T = n1*n2/N * sum_v (g_v/N) (F1(v) - F2(v))^2 over distinct pooled
    values — including the single-language degenerate (NULL)."""
    rng = random.Random(seed)
    langs = ["en", "fr", "zh"][: rng.choice([1, 2, 3])]
    rows = _rand_corpus(rng, langs)
    sf_dir = str(tmp_path / f"sf_cvm{seed}")
    _write_documents_langs(spark, sf_dir, rows)

    scores = _collected_scores(spark, sf_dir)
    out = _run(spark, "ext_cvm", sf_dir)[0]
    xs = sorted(q for lg, _, q in scores if lg == "en")
    ys = sorted(q for lg, _, q in scores if lg != "en")
    n1, n2 = len(xs), len(ys)
    assert (out["n_en"], out["n_rest"]) == (n1, n2)
    if n1 == 0 or n2 == 0:
        assert out["cvm_t"] is None
        return
    pooled = Counter(q for _, _, q in scores)
    nn = n1 + n2
    acc = 0.0
    c1 = c2 = 0
    for v in sorted(pooled):
        c1 += sum(1 for x in xs if x == v)
        c2 += sum(1 for y in ys if y == v)
        d = c1 / n1 - c2 / n2
        acc += (pooled[v] / nn) * d * d
    t = n1 * n2 * acc / nn
    assert out["cvm_t"] == pytest.approx(t, abs=1e-5)


@pytest.mark.parametrize("seed", [40, 41, 42])
def test_wasserstein_on_random_corpus(spark, tmp_path, seed):
    """Registered per-lang W1 (exact decimal CDF-gap integral) vs the
    brute step-function integral over the sorted pooled support."""
    rng = random.Random(seed)
    langs = ["en", "fr", "zh"][: rng.choice([1, 2, 3])]
    rows = _rand_corpus(rng, langs)
    sf_dir = str(tmp_path / f"sf_w1{seed}")
    _write_documents_langs(spark, sf_dir, rows)

    scores = _collected_scores(spark, sf_dir)
    out = {r["lang"]: r for r in _run(spark, "ext_wasserstein", sf_dir)}
    vals = sorted({q for _, _, q in scores})
    if len(vals) < 2:
        # single-point score domain: no CDF gap rows exist, and the
        # query (and its oracle, identically) emit ZERO rows
        assert out == {}
        return
    for lg in {l_ for l_, _, _ in scores}:
        xs = [q for l_, _, q in scores if l_ == lg]
        ys = [q for l_, _, q in scores if l_ != lg]
        r = out[lg]
        assert r["n_lang"] == len(xs)
        if not ys:
            assert r["wasserstein_1"] is None
            continue
        w1 = 0.0
        for a, b in zip(vals, vals[1:]):
            fl = sum(1 for x in xs if x <= a) / len(xs)
            fr = sum(1 for y in ys if y <= a) / len(ys)
            w1 += abs(fl - fr) * (b - a)
        assert r["wasserstein_1"] == pytest.approx(w1, abs=1e-6)


@pytest.mark.parametrize("seed", [50, 51, 52])
def test_jonckheere_on_random_corpus(spark, tmp_path, seed):
    """Registered JT (dense-grid double-cumulative algebra) vs direct
    pair counting over ordered length buckets: 2J = sum over bucket
    pairs a<b of (2*#(x<y) + #(x==y)), plus the documented
    tie-uncorrected normal moments."""
    rng = random.Random(seed)
    # DECOUPLE the bucket driver (the n_chars COLUMN, spread over the
    # 0..5 length buckets) from the score driver (the text, short
    # enough that quality_score varies): _write_documents_langs ties
    # text to n_chars, so write directly here.
    rows = [
        (i, "word " * rng.randint(1, 24), "en", "web", rng.randint(5, 2600))
        for i in range(rng.randint(2, 60))
    ]
    sf_dir = str(tmp_path / f"sf_jt{seed}")
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    import be_analytic_etl_spark.registry  # noqa: F401
    from be_analytic_etl_spark.queries_round9 import _q6
    from be_analytic_etl_spark.queries_round10 import _JT_LEN_DIV, _JT_LEN_MAX
    from be_analytic_etl_spark.sources import load_table

    scored = [
        (min(r["n_chars"] // _JT_LEN_DIV, _JT_LEN_MAX), float(r["__q6"]))
        for r in load_table(spark, sf_dir, "documents")
        .select("n_chars", _q6())
        .collect()
    ]
    out = _run(spark, "ext_jonckheere", sf_dir)[0]
    by = defaultdict(list)
    for b, q in scored:
        by[b].append(q)
    bks = sorted(by)
    j2 = sum(
        2 * (x < y) + (x == y)
        for i, a in enumerate(bks)
        for b in bks[i + 1 :]
        for x in by[a]
        for y in by[b]
    )
    n = len(scored)
    assert (out["n"], out["k"], out["j2"]) == (n, len(bks), j2)
    s2 = sum(len(v) ** 2 for v in by.values())
    s3 = sum(len(v) ** 2 * (2 * len(v) + 3) for v in by.values())
    e4 = n * n - s2
    var72 = n * n * (2 * n + 3) - s3
    if len(bks) >= 2 and var72 > 0:
        z = (2 * j2 - e4) / (4 * math.sqrt(var72 / 72))
        assert out["z_stat"] == pytest.approx(z, abs=1e-5)
    else:
        assert out["z_stat"] is None
