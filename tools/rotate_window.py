"""Compute the next round's _DRIVER_WINDOW_PRIORITY from correctness history.

The round driver oracle-checks only the FIRST 50 registered queries, so
each round the window should hold the 50 queries with the most
verification debt: never-green reds first, then never-checked, then the
SS2 reference core when it is about to go two rounds unverified (judge
ruling, round 4), then (if slots remain) the oldest greens for
re-confirmation. Run after a round's CORRECTNESS_r{N}.json lands:

    python tools/rotate_window.py

and paste the printed list into be_analytic_etl_spark/registry.py.
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


def main() -> None:
    from be_analytic_etl_spark.registry import QUERIES

    names = list(QUERIES)
    greens: dict[str, int] = {}   # name -> last round seen green
    checked: dict[str, int] = {}  # name -> last round checked
    latest = 0
    # Resolve history from the repo root (where registry.py also lives),
    # NOT the CWD: run from elsewhere, a CWD glob finds zero files and
    # --apply would silently overwrite the window with a ranking that
    # ignores all verification history.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # Same canonical-name filter as bench.py: stray glob matches like
    # CORRECTNESS_r06_old.json must not abort (or skew) the rotation.
    history = sorted(
        (int(m.group(1)), p)
        for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
        if (m := re.fullmatch(r"CORRECTNESS_r(\d+)\.json", os.path.basename(p)))
    )
    if not history:
        raise SystemExit(f"no CORRECTNESS_r*.json found under {repo}")
    for rnd, f in history:
        latest = max(latest, rnd)
        for k, v in json.load(open(f)).items():
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
        # sort key: reds (checked, never green) < never checked
        #           < stale SS2 core < stale greens
        if n in checked and n not in greens:
            return (0, -checked[n], names.index(n))
        if n not in checked:
            return (1, 0, names.index(n))
        if n in stale_core:
            return (2, checked[n], names.index(n))
        return (3, greens[n], names.index(n))

    ranked = sorted(names, key=debt)
    window = ranked[:50]
    print(f"# {len(names)} registered; window=50; next_round={next_round}")
    print(f"# reds: {[n for n in window if debt(n)[0] == 0]}")
    print(f"# never-checked in window: {len([n for n in window if debt(n)[0] == 1])}")
    print(f"# forced SS2 core: {[n for n in window if debt(n)[0] == 2]}")
    block = "_DRIVER_WINDOW_PRIORITY = [\n"
    for n in window:
        block += f'    "{n}",\n'
    block += "]"
    print(block)

    if "--apply" in sys.argv:
        # Rewrite the registry's window list in place — the rotation is
        # a mechanical function of correctness history, so no hand-edit
        # should ever be involved (round-5 judge ask #7).
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "be_analytic_etl_spark",
            "registry.py",
        )
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
