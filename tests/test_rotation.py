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
