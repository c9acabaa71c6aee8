"""Optimization probe: isolated timing + plan capture per query.

For each named query, in THIS fresh JVM:
  - capture ``.explain("formatted")`` to plans/$SPARK_GRAFT_PLAN_DIR/<name>_<tag>.txt
  - time N noop-sink runs (same cached_scope discipline as bench.py),
    report each run and the min.

Usage:
    python tools/opt_probe.py [--tag before|after] [--runs N] [--no-plan] q1 q2 ...

Run on a QUIET host. The explain capture happens BEFORE the timed runs
so codegen/planning warmup from the capture benefits run 1 like the
bench warmup does.
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    tag = "before"
    runs = 5
    plan = True
    names = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--tag":
            tag = args[i + 1]
            i += 2
        elif a == "--runs":
            runs = int(args[i + 1])
            i += 2
        elif a == "--no-plan":
            plan = False
            i += 1
        else:
            names.append(a)
            i += 1

    from be_analytic_etl_spark.registry import QUERIES
    from be_analytic_etl_spark.session import cached_scope, get_spark

    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark("opt-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    plan_dir = os.environ.get("SPARK_GRAFT_PLAN_DIR", "plans/r14")
    os.makedirs(plan_dir, exist_ok=True)
    for name in names:
        if plan:
            df = QUERIES[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(f"{plan_dir}/{name}_{tag}.txt", "w") as fh:
                fh.write(buf.getvalue())
        times = []
        for r in range(runs):
            t0 = time.perf_counter()
            with cached_scope(spark):
                df = QUERIES[name](spark, SF_DIR)
                df.write.mode("overwrite").format("noop").save()
            times.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: min={min(times)} runs={times}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
