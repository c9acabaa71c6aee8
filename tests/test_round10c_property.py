"""Property-based checks for RFM segmentation and Chao1 on randomized
corpora: heavy value ties around quartile boundaries (the type-1
threshold + strictly-greater scoring must agree with a full-sort
replay) and skewed token frequency profiles (f1/f2 edge cases,
including f2 = 0 where the bias-corrected Chao1 form is load-bearing)."""

from __future__ import annotations

import random
from collections import Counter, defaultdict
from datetime import datetime, timedelta

import pytest


@pytest.mark.parametrize("seed", [90, 91, 92])
def test_rfm_on_random_orders(spark, tmp_path, seed):
    from be_analytic_etl_spark.registry import QUERIES

    rng = random.Random(seed)
    base = datetime(2024, 1, 1)
    rows = []
    okey = 0
    for cust in range(1, rng.randint(2, 25)):
        for _ in range(rng.randint(1, 6)):
            okey += 1
            # coarse price + date grids -> heavy quartile-boundary ties
            rows.append(
                (
                    okey,
                    cust,
                    "O",
                    float(rng.choice([10, 10, 20, 50, 100])),
                    base + timedelta(days=rng.randint(0, 10)),
                    "1-URGENT",
                )
            )
    sf_dir = str(tmp_path / f"rfm{seed}")
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/orders.parquet")

    per = {}
    dmax = max(r[4].date() for r in rows)
    by = defaultdict(list)
    for r in rows:
        by[r[1]].append(r)
    for ck, rs in by.items():
        last = max(r[4].date() for r in rs)
        c = sum(round(r[3] * 100) for r in rs)
        per[ck] = ((dmax - last).days, len(rs), c, c - c % 100)

    def thresholds(vals):
        s = sorted(vals)
        n = len(s)
        return [s[-(-k * n // 4) - 1] for k in (1, 2, 3)]

    rq = thresholds([v[0] for v in per.values()])
    fq = thresholds([v[1] for v in per.values()])
    mq = thresholds([v[3] for v in per.values()])
    seg = defaultdict(lambda: [0, 0])
    for rec, freq, c, dollars in per.values():
        key = (
            1 + sum(rec > t for t in rq),
            1 + sum(freq > t for t in fq),
            1 + sum(dollars > t for t in mq),
        )
        seg[key][0] += 1
        seg[key][1] += c
    got = {
        (r["recency_score"], r["frequency_score"], r["monetary_score"]): (
            r["n_customers"],
            r["revenue_cents"],
        )
        for r in QUERIES["ext_rfm_segments"](spark, sf_dir).collect()
    }
    assert got == {k: tuple(v) for k, v in seg.items()}
    # every customer lands in exactly one segment
    assert sum(v[0] for v in seg.values()) == len(per)


@pytest.mark.parametrize("seed", [100, 101, 102])
def test_chao1_on_random_corpus(spark, tmp_path, seed):
    from be_analytic_etl_spark.registry import QUERIES

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(rng.randint(1, 40))]
    texts = []
    for _ in range(rng.randint(1, 30)):
        k = rng.randint(1, 12)
        texts.append(" ".join(rng.choice(vocab) for _ in range(k)))
    sf_dir = str(tmp_path / f"chao{seed}")
    spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    cnt = Counter()
    for t in texts:
        cnt.update(t.split())
    ff = Counter(cnt.values())
    v, n = len(cnt), sum(cnt.values())
    f1, f2 = ff.get(1, 0), ff.get(2, 0)
    out = QUERIES["ext_chao1_vocab"](spark, sf_dir).collect()[0]
    assert (out["vocab_size"], out["total_tokens"], out["f1"], out["f2"]) == (
        v,
        n,
        f1,
        f2,
    )
    assert out["chao1"] == pytest.approx(  # emitted at 6dp (stable_round)
        v + f1 * (f1 - 1) / (2 * (f2 + 1)), abs=1e-6
    )
    assert out["chao1"] >= v  # lower-bound estimator dominates observed V
    assert out["gt_coverage"] == pytest.approx(1 - f1 / n, abs=1e-9)
