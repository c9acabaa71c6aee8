"""tools/rotate_window.py: the window ranking and the freshness
invariant (no query may exceed MAX_STALE_ROUNDS without a driver check)
over synthetic correctness histories — no Spark needed."""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "rotate_window",
    os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "tools", "rotate_window.py"
    ),
)
rotate_window = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_spec and rotate_window)

compute_window = rotate_window.compute_window
WINDOW = rotate_window.WINDOW
MAX_STALE = rotate_window.MAX_STALE_ROUNDS
SS2_CORE = rotate_window.SS2_CORE


def _green():
    return {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}


def _red():
    return {"rows_match": True, "schema_match": True, "hash_match": False, "err": None}


def test_ranking_order_reds_then_new_then_core_then_oldest():
    names = ["red_q", "new_q", *SS2_CORE, *[f"g{i}" for i in range(60)]]
    history = [
        # round 1: everything but new_q checked green
        (1, {n: _green() for n in names if n != "new_q"}),
        # round 2: red_q goes red; core re-checked green
        (2, {"red_q": _red(), **{n: _green() for n in SS2_CORE}}),
        # round 3: a fresh slice of greens re-checked (g0..g29)
        (3, {f"g{i}": _green() for i in range(30)}),
    ]
    window, stats = compute_window(names, history)
    assert stats["next_round"] == 4
    # red first; new (never-checked) next; SS2 core (last checked r2,
    # two rounds stale by r4) forced in; then oldest greens (g30..g59,
    # last green r1) before the r3 cohort.
    assert window[0] == "red_q"
    assert window[1] == "new_q"
    assert window[2:8] == SS2_CORE
    assert set(window[8:38]) == {f"g{i}" for i in range(30, 60)}
    assert stats["reds"] == ["red_q"]
    assert stats["never_checked"] == ["new_q"]
    assert stats["forced_core"] == SS2_CORE


def test_freshness_invariant_trips_when_registry_outgrows_cadence():
    # More queries than WINDOW * MAX_STALE can cycle: with one query
    # last checked at round 1 and enough younger-but-still-stale
    # queries to fill the window, the invariant must fire.
    n_total = WINDOW + 5
    names = [f"q{i}" for i in range(n_total)]
    history = [
        (1, {"q0": _green()}),
        # round 2: everything else checked green -> by round 2+MAX_STALE+1
        # they all outrank nothing; q0 is oldest so it lands IN the
        # window — no violation.
        (2, {n: _green() for n in names[1:]}),
    ]
    window, stats = compute_window(names, history)
    assert "q0" in window and stats["overstale"] == []

    # Now make the later round re-check ONLY q0 (so the other 54 share
    # round-1 checks) and advance time far enough that the 4 losers of
    # the 50-slot cut would exceed the staleness bound.
    history = [
        (1, {n: _green() for n in names[1:]}),
        (1 + MAX_STALE, {"q0": _green()}),
    ]
    window, stats = compute_window(names, history)
    # next_round = 2 + MAX_STALE; the 54 round-1 queries would be
    # (1 + MAX_STALE) rounds stale, only 50 fit.
    assert len(stats["overstale"]) == n_total - 1 - WINDOW
    for name, last in stats["overstale"]:
        assert name != "q0" and last == 1


def test_never_checked_counts_as_overstale_if_cut():
    # A never-checked query left outside the window is itself a
    # freshness violation (it has no last check at all).
    names = [f"q{i}" for i in range(WINDOW)] + ["brand_new"]
    # fill the window with reds so brand_new loses the cut
    history = [(6, {f"q{i}": _red() for i in range(WINDOW)})]
    window, stats = compute_window(names, history)
    assert "brand_new" not in window
    assert ("brand_new", None) in stats["overstale"]


def _simulate_steady_state(n_total, warmup=15, n_rounds=60):
    """Warm up compute_window from a cold start (alignment artifacts are
    expected while it self-organizes), then return the first steady-state
    violation round, or None if stable for n_rounds."""
    names = list(SS2_CORE) + [f"q{i}" for i in range(n_total - len(SS2_CORE))]
    history, rnd = [(1, {n: _green() for n in names[:WINDOW]})], 1
    for step in range(warmup + n_rounds):
        window, stats = compute_window(names, history)
        if step >= warmup and stats["overstale"]:
            return rnd + 1
        rnd += 1
        history.append((rnd, {n: _green() for n in window}))
    return None


def test_capacity_ceiling_is_exact():
    # The registry capacity policy (registry.py): the sustainable
    # ceiling is (WINDOW - core/2) * (MAX_STALE + 1) + core = 288, NOT
    # the naive WINDOW * (MAX_STALE + 1) = 300 — the SS2 core's 2-round
    # cadence consumes 3 slots/round. Stable at the ceiling, violated
    # one past it.
    cap = rotate_window.capacity()
    assert cap == (WINDOW - len(SS2_CORE) // 2) * (MAX_STALE + 1) + len(SS2_CORE)
    assert _simulate_steady_state(cap) is None
    assert _simulate_steady_state(cap + 1) is not None


def test_real_history_trajectory_is_sustainable():
    # Forward-simulate the ACTUAL repo correctness history with the
    # ACTUAL registry: at zero growth the rotation must hold the
    # freshness invariant indefinitely (25 rounds >> one full cycle).
    # This is the test that catches a real registry state that has
    # painted itself into a corner even while each individual round's
    # gate passed.
    from be_analytic_etl_spark.registry import QUERIES

    names = list(QUERIES)
    assert len(names) <= rotate_window.capacity()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    history = rotate_window.load_history(repo)
    rnd = max(r for r, _ in history)
    for _ in range(25):
        window, stats = compute_window(names, history)
        assert stats["overstale"] == [], (
            f"real-history rotation violates freshness at simulated "
            f"round {rnd + 1}: {stats['overstale'][:5]}"
        )
        rnd += 1
        history.append((rnd, {n: _green() for n in window}))
