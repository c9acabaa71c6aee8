"""Property-based end-to-end checks: run the REGISTERED round-9 queries
on randomized synthetic parquet corpora (written to tmp dirs shaped like
a testdata sf dir) and compare against naive brute-force recomputation.
This exercises the exact code path the driver runs — including the
histogram windows and the two-middle-rank selection — on edge shapes the
fixed testdata can't produce (single source, all-tied values, even/odd
group sizes)."""

from __future__ import annotations

import random

import pytest

SOURCES = ["web", "books", "ALL_TIES", "s4"]


def _write_documents(spark, path: str, rows: list[tuple[str, int]]) -> None:
    df = spark.createDataFrame(
        [
            (i, "word " * max(1, n // 5), "en", src, n)
            for i, (src, n) in enumerate(rows)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cliffs_delta_registered_query_on_random_corpus(spark, tmp_path, seed):
    from be_analytic_etl_spark.registry import QUERIES

    rng = random.Random(seed)
    n_src = rng.choice([1, 2, 4])
    rows = []
    for s in SOURCES[:n_src]:
        size = rng.randint(1, 40)
        if s == "ALL_TIES":
            rows += [(s, 100)] * size  # one value, maximal ties
        else:
            rows += [(s, rng.randint(0, 30)) for _ in range(size)]
    sf_dir = str(tmp_path / f"sf_rand{seed}")
    _write_documents(spark, sf_dir, rows)

    out = {
        r["source"]: r
        for r in QUERIES["ext_cliffs_delta"](spark, sf_dir).collect()
    }
    assert set(out) == {s for s, _ in rows}
    n_total = len(rows)
    for s in out:
        xs = [v for src, v in rows if src == s]
        ys = [v for src, v in rows if src != s]
        wins = sum(1 for x in xs for y in ys if x > y)
        losses = sum(1 for x in xs for y in ys if x < y)
        ties = sum(1 for x in xs for y in ys if x == y)
        assert out[s]["n_docs"] == len(xs)
        assert out[s]["wins"] == wins and out[s]["ties"] == ties
        if len(xs) == n_total:  # single source: delta undefined -> NULL
            assert out[s]["cliffs_delta"] is None
        else:
            assert out[s]["cliffs_delta"] == pytest.approx(
                (wins - losses) / (len(xs) * len(ys))
            )


@pytest.mark.parametrize("n_days", [1, 2, 7, 8])
def test_theil_sen_and_runs_on_tiny_calendars(spark, tmp_path, n_days):
    """Even/odd pair counts, two-day and one-day calendars: the median
    selection and the runs degenerate guards must hold on the real
    registered queries."""
    from be_analytic_etl_spark.registry import QUERIES

    rng = random.Random(n_days)
    rows = []
    eid = 0
    for d in range(1, n_days + 1):
        for _ in range(rng.randint(1, 3)):
            rows.append(
                (eid, f"2024-03-{d:02d} 12:00:00", 1, "click",
                 round(rng.uniform(1, 50), 2), "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value", "props",
    )
    sf_dir = str(tmp_path / f"sf_cal{n_days}")
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")

    # brute-force daily cents
    from collections import defaultdict

    daily = defaultdict(int)
    for _, ts, _, _, v, _ in rows:
        daily[ts[:10]] += round(v * 100)
    days = sorted(daily)

    if n_days >= 2:
        ts_out = QUERIES["ext_theil_sen"](spark, sf_dir).collect()[0]
        slopes = sorted(
            (daily[db] - daily[da]) / (int(db[8:]) - int(da[8:]))
            for i, da in enumerate(days)
            for db in days[i + 1 :]
        )
        np = len(slopes)
        want = (slopes[(np + 1) // 2 - 1] + slopes[np // 2]) / 2
        assert ts_out["n_pairs"] == np
        assert ts_out["theil_sen_slope"] == pytest.approx(want)

    runs_out = QUERIES["ext_runs_test"](spark, sf_dir).collect()[0]
    cs = sorted(daily.values())
    med2 = cs[(len(cs) + 1) // 2 - 1] + cs[len(cs) // 2]
    signs = [1 if 2 * daily[d] > med2 else 0 for d in days if 2 * daily[d] != med2]
    assert runs_out["n_used"] == len(signs)
    if len(signs) == 0:
        assert runs_out["z_stat"] is None
    else:
        assert runs_out["runs"] == 1 + sum(
            1 for a, b in zip(signs, signs[1:]) if a != b
        )


@pytest.mark.parametrize("seed", [3, 4])
def test_gini_lorenz_kendall_on_random_corpus(spark, tmp_path, seed):
    """Registered Gini / Lorenz / tau-b on randomized corpora vs naive
    recomputation (token counts derive from the synthesized text, so
    the brute force re-tokenizes the same way)."""
    from be_analytic_etl_spark.registry import QUERIES

    rng = random.Random(seed)
    n = rng.randint(12, 60)
    rows = [(SOURCES[i % 3], rng.randint(0, 40) * 5) for i in range(n)]
    sf_dir = str(tmp_path / f"sf_glk{seed}")
    _write_documents(spark, sf_dir, rows)

    # text is "word " * max(1, n_chars // 5) -> token count is exactly
    # max(1, n_chars // 5)
    toks = sorted(max(1, nc // 5) for _, nc in rows)
    tot = sum(toks)
    gini_bf = 2 * sum((i + 1) * x for i, x in enumerate(toks)) / (n * tot) - (
        n + 1
    ) / n
    g = QUERIES["ext_gini_tokens"](spark, sf_dir).collect()[0]
    assert g["n_docs"] == n and g["total_tokens"] == tot
    assert g["gini"] == pytest.approx(gini_bf)

    lor = sorted(
        QUERIES["ext_token_lorenz"](spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    for r in lor:
        rank = n * r["decile"] // 10
        want = sum(toks[:rank]) / tot
        assert r["rank"] == rank
        assert r["cum_token_share"] == pytest.approx(want)


@pytest.mark.parametrize("seed", [5, 6])
def test_mcnemar_counts_on_random_corpus(spark, tmp_path, seed):
    """The registered McNemar disagreement cells must satisfy the
    marginal identities n_01, n_10 >= 0, n_01 + n_10 <= n, and the chi2
    formula — on corpora random enough that both gates actually fire
    both ways."""
    from be_analytic_etl_spark.registry import QUERIES

    rng = random.Random(seed)
    rows = [(SOURCES[i % 2], rng.randint(5, 2000)) for i in range(40)]
    sf_dir = str(tmp_path / f"sf_mc{seed}")
    _write_documents(spark, sf_dir, rows)
    out = QUERIES["ext_mcnemar"](spark, sf_dir).collect()[0]
    assert out["n_docs"] == 40
    assert 0 <= out["n_01"] + out["n_10"] <= 40
    b, c = out["n_01"], out["n_10"]
    if b + c:
        assert out["mcnemar_chi2"] == pytest.approx((b - c) ** 2 / (b + c))
    else:
        assert out["mcnemar_chi2"] is None
