"""Whale-key probe for SCALE.md: every per-user window/groupBy query
must survive a corpus where ONE user owns 90% of all events — the
hot-partition shape a 100 TB event log always contains (bots, service
accounts, test rigs). A per-user window serializes each key onto one
task, so a whale key turns a parallel stage into single-core work on
its share of rows; this probe measures that degradation on the REAL
queries (uniform sf0.01 corpus vs the same rows with 90% of user_ids
collapsed onto one whale) so the wall-clock cost of the worst key
distribution is a recorded number, not a hope.

Run on a QUIET host:  python tools/skew_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SKEW_PROBE_SF_DIR", "/root/testdata/sf0.01")
QUERIES_UNDER_TEST = [
    "ext_attribution",
    "ext_session_paths",
    "sessionize",
    "ext_funnel",
    "ext_growth_accounting",
    "ext_survival_curve",
    "ext_inter_arrival",
    "ext_rfm_segments",
]


def main() -> None:
    from pyspark.sql import functions as F

    from be_analytic_etl_spark.registry import QUERIES
    from be_analytic_etl_spark.session import get_spark

    spark = get_spark()
    skew_dir = "/tmp/spark_graft_skew_" + os.path.basename(BASE.rstrip("/"))
    ev = spark.read.parquet(f"{BASE}/events.parquet")
    (
        ev.withColumn(
            "user_id",
            F.when(F.pmod(F.col("event_id"), F.lit(10)) < 9, F.lit(1)).otherwise(
                F.col("user_id")
            ),
        )
        .coalesce(4)
        .write.mode("overwrite")
        .parquet(f"{skew_dir}/events.parquet")
    )
    for t in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split():
        src = f"{BASE}/{t}.parquet"
        dst = f"{skew_dir}/{t}.parquet"
        if not os.path.exists(dst):
            spark.read.parquet(src).write.mode("overwrite").parquet(dst)

    def bench(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.time() - t0)
        return best

    print("| query | uniform | 90% whale | ratio |")
    print("|---|---|---|---|")
    for name in QUERIES_UNDER_TEST:
        u = bench(name, BASE)
        s = bench(name, skew_dir)
        print(f"| {name} | {u:.2f}s | {s:.2f}s | {s / u:.1f}x |")

    # the (user, day) sub-key spine (operators/sessions.py, VERDICT r11
    # ask #5): same readout, whale-resistant decomposition — probe both
    # formulations on both corpora so the spine's cost/benefit at the
    # hot-key corpus is a recorded number
    from be_analytic_etl_spark.operators.sessions import sessionize_events

    def bench_sessionize(sf_dir: str, spine: str | None) -> float:
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            sessionize_events(ev, spine=spine).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.time() - t0)
        return best

    print("| sessionize form | uniform | 90% whale | ratio |")
    print("|---|---|---|---|")
    for spine in (None, "day"):
        u = bench_sessionize(BASE, spine)
        s = bench_sessionize(skew_dir, spine)
        label = "plain per-user" if spine is None else f"spine={spine}"
        print(f"| {label} | {u:.2f}s | {s:.2f}s | {s / u:.1f}x |")
    spark.stop()


if __name__ == "__main__":
    main()
