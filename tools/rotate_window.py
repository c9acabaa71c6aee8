"""Compute the next round's _DRIVER_WINDOW_PRIORITY from correctness history.

The round driver oracle-checks only the FIRST 50 registered queries, so
each round the window should hold the 50 queries with the most
verification debt: never-green reds first, then never-checked, then (if
slots remain) the oldest greens for re-confirmation. Run after a round's
CORRECTNESS_r{N}.json lands:

    python tools/rotate_window.py

and paste the printed list into be_analytic_etl_spark/registry.py.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from be_analytic_etl_spark.registry import QUERIES

    names = list(QUERIES)
    greens: dict[str, int] = {}   # name -> last round seen green
    checked: dict[str, int] = {}  # name -> last round checked
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(f.split("_r")[1].split(".")[0])
        for k, v in json.load(open(f)).items():
            checked[k] = rnd
            ok = not v.get("err") and (
                v.get("hash_match") is True
                or (v.get("hash_match") is None and v.get("rows_match") is True)
            )
            if ok:
                greens[k] = rnd

    def debt(n: str) -> tuple:
        # sort key: reds (checked, never green) < never checked < stale greens
        if n in checked and n not in greens:
            return (0, -checked[n], names.index(n))
        if n not in checked:
            return (1, 0, names.index(n))
        return (2, greens[n], names.index(n))

    ranked = sorted(names, key=debt)
    window = ranked[:50]
    print(f"# {len(names)} registered; window=50")
    print(f"# reds: {[n for n in window if debt(n)[0] == 0]}")
    print(f"# never-checked in window: {len([n for n in window if debt(n)[0] == 1])}")
    print("_DRIVER_WINDOW_PRIORITY = [")
    for n in window:
        print(f'    "{n}",')
    print("]")


if __name__ == "__main__":
    main()
