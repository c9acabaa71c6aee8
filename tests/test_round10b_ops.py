"""Round-10 batch 2 (event-sequence analytics + vocabulary panel):
independent brute-force cross-checks on sf0.001. Each test replays the
semantics the NAIVE way — per-user sorted event walks in Python, a
full RFM quartile sort, a Counter-based frequency-of-frequencies — and
compares against the registered distributed query."""

from __future__ import annotations

from collections import Counter, defaultdict
from datetime import timedelta

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _q(spark, name):
    from be_analytic_etl_spark.registry import QUERIES

    return QUERIES[name](spark, SF_DIR)


@pytest.fixture(scope="module")
def events(spark):
    """[(user_id, ts, event_id, event_type, value)] sorted per user by
    (ts, event_id) — the deterministic order every sequence query uses."""
    from be_analytic_etl_spark.sources import load_table

    rows = (
        load_table(spark, SF_DIR, "events")
        .filter("ts IS NOT NULL AND user_id IS NOT NULL")
        .select("user_id", "ts", "event_id", "event_type", "value")
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(
            (r["ts"], r["event_id"], r["event_type"], r["value"])
        )
    for seq in by_user.values():
        seq.sort(key=lambda t: (t[0], t[1]))
    return by_user


def test_funnel_matches_bruteforce(spark, events):
    out = _q(spark, "ext_funnel").collect()[0]
    n1 = n2 = n3 = 0
    for seq in events.values():
        t1 = min((ts for ts, _, ty, _v in seq if ty == "view"), default=None)
        if t1 is None:
            continue
        n1 += 1
        lim = t1 + timedelta(days=7)
        t2 = min(
            (ts for ts, _, ty, _v in seq if ty == "click" and t1 < ts <= lim),
            default=None,
        )
        if t2 is None:
            continue
        n2 += 1
        t3 = min(
            (ts for ts, _, ty, _v in seq if ty == "purchase" and t2 < ts <= lim),
            default=None,
        )
        if t3 is not None:
            n3 += 1
    assert (out["step1_users"], out["step2_users"], out["step3_users"]) == (
        n1,
        n2,
        n3,
    )
    assert out["conv_step2"] == pytest.approx(n2 / n1, abs=1e-9)
    assert out["conv_total"] == pytest.approx(n3 / n1, abs=1e-9)


def test_attribution_matches_bruteforce(spark, events):
    rows = {r["channel"]: r for r in _q(spark, "ext_attribution").collect()}
    purchases = Counter()
    cents = Counter()
    for seq in events.values():
        last_touch = None
        for _ts, _eid, ty, val in seq:
            if ty == "purchase":
                if val is not None:
                    ch = last_touch or "(none)"
                    purchases[ch] += 1
                    cents[ch] += round(val * 100)
            else:
                last_touch = ty
    assert {c: r["purchases"] for c, r in rows.items()} == dict(purchases)
    assert {c: r["revenue_cents"] for c, r in rows.items()} == dict(cents)
    total = sum(cents.values())
    for c, r in rows.items():
        assert r["revenue_share"] == pytest.approx(cents[c] / total, abs=1e-9)
    assert sum(r["revenue_share"] for r in rows.values()) == pytest.approx(
        1.0, abs=1e-9
    )


def test_rfm_matches_bruteforce(spark):
    from be_analytic_etl_spark.sources import load_table

    orders = (
        load_table(spark, SF_DIR, "orders")
        .filter("o_orderdate IS NOT NULL AND o_custkey IS NOT NULL")
        .select("o_custkey", "o_orderdate", "o_totalprice")
        .collect()
    )
    per = {}
    dmax = max(r["o_orderdate"].date() for r in orders)
    by_cust = defaultdict(list)
    for r in orders:
        by_cust[r["o_custkey"]].append(r)
    for ck, rs in by_cust.items():
        last = max(r["o_orderdate"].date() for r in rs)
        c = sum(round(r["o_totalprice"] * 100) for r in rs)
        per[ck] = ((dmax - last).days, len(rs), c, c - c % 100)

    def thresholds(vals):
        s = sorted(vals)
        n = len(s)
        # type-1 quartile: smallest value whose cum count reaches ceil(kn/4)
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
    rows = _q(spark, "ext_rfm_segments").collect()
    got = {
        (r["recency_score"], r["frequency_score"], r["monetary_score"]): (
            r["n_customers"],
            r["revenue_cents"],
        )
        for r in rows
    }
    assert got == {k: tuple(v) for k, v in seg.items()}
    for r in rows:
        assert r["avg_revenue_cents"] == pytest.approx(
            r["revenue_cents"] / r["n_customers"], abs=1e-6
        )


def test_chao1_matches_bruteforce(spark):
    from be_analytic_etl_spark.sources import load_table

    texts = [
        r["text"]
        for r in load_table(spark, SF_DIR, "documents").select("text").collect()
    ]
    cnt = Counter()
    for t in texts:
        t = (t or "").strip()
        if t:
            cnt.update(t.split())
    ff = Counter(cnt.values())
    v, n = len(cnt), sum(cnt.values())
    f1, f2 = ff.get(1, 0), ff.get(2, 0)
    out = _q(spark, "ext_chao1_vocab").collect()[0]
    assert (out["vocab_size"], out["total_tokens"]) == (v, n)
    assert (out["f1"], out["f2"]) == (f1, f2)
    assert out["chao1"] == pytest.approx(  # emitted at 6dp (stable_round)
        v + f1 * (f1 - 1) / (2 * (f2 + 1)), abs=1e-6
    )
    assert out["gt_coverage"] == pytest.approx(1 - f1 / n, abs=1e-9)
    # Chao1 is a lower-bound ESTIMATE above the observed vocabulary
    assert out["chao1"] >= v
    assert 0.0 <= out["gt_coverage"] <= 1.0
