"""Property-based end-to-end checks for the event-sequence queries:
randomized event corpora with DELIBERATE timestamp collisions (several
events on the same (user, ts)), so the (ts, event_id) deterministic
tiebreak in attribution and the strict-inequality funnel windows are
exercised on shapes the fixed testdata rarely produces."""

from __future__ import annotations

import random
from collections import Counter, defaultdict
from datetime import datetime, timedelta

import pytest

TYPES = ["view", "click", "purchase", "signup", "error"]


def _write_events(spark, path: str, rows) -> None:
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _rand_events(rng, n_users: int, n_events: int):
    base = datetime(2024, 1, 1)
    rows = []
    for eid in range(n_events):
        # coarse time grid -> frequent exact-timestamp collisions
        ts = base + timedelta(hours=rng.randint(0, 200))
        rows.append(
            (
                eid,
                ts,
                rng.randint(1, n_users),
                rng.choice(TYPES),
                round(rng.uniform(0.5, 200.0), 2),
            )
        )
    return rows


@pytest.mark.parametrize("seed", [60, 61, 62])
def test_funnel_on_random_events(spark, tmp_path, seed):
    from be_analytic_etl_spark.registry import QUERIES

    rng = random.Random(seed)
    rows = _rand_events(rng, n_users=rng.randint(1, 12), n_events=rng.randint(1, 120))
    sf_dir = str(tmp_path / f"ev{seed}")
    _write_events(spark, sf_dir, rows)

    by_user = defaultdict(list)
    for eid, ts, uid, ty, v in rows:
        by_user[uid].append((ts, eid, ty))
    n1 = n2 = n3 = 0
    for seq in by_user.values():
        t1 = min((ts for ts, _, ty in seq if ty == "view"), default=None)
        if t1 is None:
            continue
        n1 += 1
        lim = t1 + timedelta(days=7)
        t2 = min(
            (ts for ts, _, ty in seq if ty == "click" and t1 < ts <= lim),
            default=None,
        )
        if t2 is None:
            continue
        n2 += 1
        if any(ty == "purchase" and t2 < ts <= lim for ts, _, ty in seq):
            n3 += 1
    out = QUERIES["ext_funnel"](spark, sf_dir).collect()[0]
    assert (out["step1_users"], out["step2_users"], out["step3_users"]) == (
        n1,
        n2,
        n3,
    )


@pytest.mark.parametrize("seed", [70, 71, 72])
def test_attribution_on_random_events(spark, tmp_path, seed):
    """Last-touch attribution replayed as a per-user walk in the exact
    (ts, event_id) order — the tiebreak is load-bearing here because the
    coarse time grid makes same-timestamp runs common."""
    from be_analytic_etl_spark.registry import QUERIES

    rng = random.Random(seed)
    rows = _rand_events(rng, n_users=rng.randint(1, 10), n_events=rng.randint(1, 150))
    sf_dir = str(tmp_path / f"at{seed}")
    _write_events(spark, sf_dir, rows)

    by_user = defaultdict(list)
    for eid, ts, uid, ty, v in rows:
        by_user[uid].append((ts, eid, ty, v))
    purchases = Counter()
    cents = Counter()
    for seq in by_user.values():
        seq.sort(key=lambda t: (t[0], t[1]))
        last = None
        for _ts, _eid, ty, v in seq:
            if ty == "purchase":
                ch = last or "(none)"
                purchases[ch] += 1
                # mirror the DECIMAL(18,2) cents quantization
                cents[ch] += round(v * 100)
            else:
                last = ty
    got = {
        r["channel"]: (r["purchases"], r["revenue_cents"])
        for r in QUERIES["ext_attribution"](spark, sf_dir).collect()
    }
    assert got == {c: (purchases[c], cents[c]) for c in purchases}


@pytest.mark.parametrize("seed", [80, 81, 82])
def test_growth_accounting_on_random_events(spark, tmp_path, seed):
    from be_analytic_etl_spark.registry import QUERIES

    rng = random.Random(seed)
    rows = _rand_events(rng, n_users=rng.randint(1, 8), n_events=rng.randint(1, 100))
    sf_dir = str(tmp_path / f"ga{seed}")
    _write_events(spark, sf_dir, rows)

    user_days = defaultdict(set)
    for _eid, ts, uid, _ty, _v in rows:
        user_days[uid].add(ts.date())
    days = defaultdict(set)
    for u, ds in user_days.items():
        for d in ds:
            days[d].add(u)
    out = {r["day"]: r for r in QUERIES["ext_growth_accounting"](spark, sf_dir).collect()}
    # full-outer churn attribution (ADVICE r10): days with zero activity
    # but nonzero churn (quiet gap day, day after the horizon) appear too
    churn_days = {
        d + timedelta(days=1)
        for u, ds in user_days.items()
        for d in ds
        if (d + timedelta(days=1)) not in ds
    }
    assert set(out) == set(days) | churn_days
    for d, r in out.items():
        users = days.get(d, set())
        assert r["dau"] == len(users)
        assert r["dau"] == r["new_users"] + r["retained"] + r["resurrected"]
        assert r["new_users"] == sum(1 for u in users if min(user_days[u]) == d)
        assert r["retained"] == sum(
            1 for u in users if (d - timedelta(days=1)) in user_days[u]
        )
        prev = d - timedelta(days=1)
        assert r["churned"] == sum(
            1
            for u, ds in user_days.items()
            if prev in ds and d not in ds
        )
