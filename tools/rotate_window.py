"""Compute the next round's _DRIVER_WINDOW_PRIORITY from correctness history.

The round driver oracle-checks only the FIRST 50 registered queries, so
each round the window should hold the 50 queries with the most
verification debt: never-green reds first, then never-checked, then the
SS2 reference core when it is about to go two rounds unverified (judge
ruling, round 4), then (if slots remain) the oldest greens for
re-confirmation. Run after a round's CORRECTNESS_r{N}.json lands:

    python tools/rotate_window.py

and paste the printed list into be_analytic_etl_spark/registry.py.

Freshness invariant (round-9 judge ask #6): no registered query may go
more than MAX_STALE_ROUNDS rounds without a driver check. The tool
FAILS if the proposed window would leave any query older than that —
the ledger's one manual invariant is now mechanical.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The reference's actual surface (SURVEY.md §2 headline queries). Per the
# round-4 judge ruling these must never go two rounds without a driver
# row: they are force-entered into the window whenever their last check
# is two or more rounds old.
SS2_CORE = [
    "flagship_mom_pivot",
    "ingest_e2e",
    "ingest_finalize",
    "groupby_avg",
    "conditional_pivot",
    "lag_mom_variation",
]

WINDOW = 50
# A query's last driver check may never be more than this many rounds
# old AFTER the proposed window runs. The steady-state cycle for N
# registered queries is ceil(N/50) rounds (main() prints the live
# figure each run), and anything older means the rotation mis-ranked.
MAX_STALE_ROUNDS = 5


def capacity() -> int:
    """Maximum sustainable registry size under BOTH invariants.

    The naive bound WINDOW * (MAX_STALE_ROUNDS + 1) = 300 ignores the
    SS2 core's 2-round cadence: the core consumes len(SS2_CORE)/2
    window slots per round on average, so the true steady-state bound
    is (WINDOW - core/2) * (MAX_STALE + 1) + core = 288 at the current
    constants. Measured, not just derived: the round-10 simulation
    (tests/test_rotation.py::test_capacity_ceiling_is_exact) shows the
    self-organized steady state is stable at exactly this N and
    violates the freshness invariant at N + 1. This is the registry's
    HARD registration ceiling — growth past it must retire or merge
    queries first (registry.py capacity policy), never weaken an
    invariant.
    """
    core_load = len(SS2_CORE) // 2  # 6 checks per 2 rounds
    return (WINDOW - core_load) * (MAX_STALE_ROUNDS + 1) + len(SS2_CORE)


def load_history(repo: str) -> list[tuple[int, dict]]:
    """[(round, {name: row})] from CORRECTNESS_r{N}.json, oldest first.
    Resolved from the repo root, NOT the CWD (run from elsewhere, a CWD
    glob finds zero files and --apply would silently overwrite the
    window with a ranking that ignores all verification history); the
    canonical-name filter keeps stray matches like
    CORRECTNESS_r06_old.json from skewing the rotation."""
    return sorted(
        (int(m.group(1)), json.load(open(p)))
        for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
        if (m := re.fullmatch(r"CORRECTNESS_r(\d+)\.json", os.path.basename(p)))
    )


def compute_window(
    names: list[str], history: list[tuple[int, dict]]
) -> tuple[list[str], dict]:
    """Rank all registered queries by verification debt and return
    (window, stats). Pure function of (registration order, history) —
    unit-tested over synthetic histories in tests/test_rotation.py."""
    greens: dict[str, int] = {}   # name -> last round seen green
    checked: dict[str, int] = {}  # name -> last round checked
    latest = 0
    for rnd, rows in history:
        latest = max(latest, rnd)
        for k, v in rows.items():
            checked[k] = rnd
            ok = not v.get("err") and (
                v.get("hash_match") is True
                or (v.get("hash_match") is None and v.get("rows_match") is True)
            )
            if ok:
                greens[k] = rnd

    next_round = latest + 1
    # SS2 core whose latest check would be >= 2 rounds old by next round.
    stale_core = [
        n for n in SS2_CORE
        if n in names and (n not in checked or next_round - checked[n] >= 2)
    ]

    def debt(n: str) -> tuple:
        # sort key: reds (latest check not green — includes queries that
        # were green in an earlier round) < never checked
        #           < stale SS2 core < stale greens
        if n in checked and greens.get(n) != checked[n]:
            return (0, -checked[n], names.index(n))
        if n not in checked:
            return (1, 0, names.index(n))
        if n in stale_core:
            return (2, checked[n], names.index(n))
        return (3, greens[n], names.index(n))

    ranked = sorted(names, key=debt)
    window = ranked[:WINDOW]
    in_window = set(window)
    # Freshness invariant: after the proposed window runs (all members
    # checked at next_round), no query's last check may be older than
    # MAX_STALE_ROUNDS. Members outside the window keep their current
    # last-check round.
    overstale = sorted(
        (n, checked.get(n))
        for n in names
        if n not in in_window
        and (n not in checked or next_round - checked[n] > MAX_STALE_ROUNDS)
    )
    stats = {
        "next_round": next_round,
        "reds": [n for n in window if debt(n)[0] == 0],
        "never_checked": [n for n in window if debt(n)[0] == 1],
        "forced_core": [n for n in window if debt(n)[0] == 2],
        "overstale": overstale,
    }
    return window, stats


def main() -> None:
    from be_analytic_etl_spark.registry import QUERIES

    names = list(QUERIES)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    history = load_history(repo)
    if not history:
        raise SystemExit(f"no CORRECTNESS_r*.json found under {repo}")
    cap = capacity()
    if len(names) > cap:
        raise SystemExit(
            f"CAPACITY VIOLATION: {len(names)} registered queries exceed "
            f"the sustainable ceiling of {cap} (core cadence + "
            f"{MAX_STALE_ROUNDS}-round freshness); retire or merge "
            f"queries per the registry.py capacity policy before "
            f"registering more."
        )
    window, stats = compute_window(names, history)
    cycle = -(-len(names) // WINDOW)  # ceil: steady-state re-check cadence
    print(f"# {len(names)} registered; window={WINDOW}; "
          f"next_round={stats['next_round']}; "
          f"steady-state cycle={cycle} round(s) "
          f"(invariant allows {MAX_STALE_ROUNDS}; "
          f"capacity ceiling {cap})")
    print(f"# reds: {stats['reds']}")
    print(f"# never-checked in window: {len(stats['never_checked'])}")
    print(f"# forced SS2 core: {stats['forced_core']}")
    block = "_DRIVER_WINDOW_PRIORITY = [\n"
    for n in window:
        block += f'    "{n}",\n'
    block += "]"
    print(block)

    if stats["overstale"]:
        raise SystemExit(
            f"FRESHNESS VIOLATION: {len(stats['overstale'])} queries would "
            f"exceed {MAX_STALE_ROUNDS} rounds without a driver check after "
            f"this window: {stats['overstale'][:10]} — the registry has "
            f"outgrown the rotation cadence; shrink additions or re-rank."
        )

    if "--apply" in sys.argv:
        # Rewrite the registry's window list in place — the rotation is
        # a mechanical function of correctness history, so no hand-edit
        # should ever be involved (round-5 judge ask #7).
        path = os.path.join(repo, "be_analytic_etl_spark", "registry.py")
        src = open(path).read()
        new_src, n_subs = re.subn(
            r"_DRIVER_WINDOW_PRIORITY = \[[^\]]*\]",
            block,
            src,
            count=1,
            flags=re.S,
        )
        if n_subs != 1:
            raise SystemExit("could not locate _DRIVER_WINDOW_PRIORITY block")
        open(path, "w").write(new_src)
        print(f"# applied to {path}")


if __name__ == "__main__":
    main()
