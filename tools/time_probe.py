"""Timestamp-pathology probe for SCALE.md: the event-history family
(retention / dau-wau / survival / inter-arrival / sessionize / windowed
aggs / gap-fill) assumes a sane calendar. That is a DATA property, not a
structural one — upstream parser drift produces three classic
degenerate calendars this probe measures against the REAL queries on
the REAL sf0.01 corpus:

* ``one_instant``  — every event lands on ONE timestamp (a parser that
  swallowed the time column and emitted its default). Collapses every
  day/window group into a single hot group and makes every ordering a
  total tie.
* ``sparse_wide``  — the 30-day range stretched x600 to ~49 sparse
  years (epoch-seconds read as epoch-millis class of drift). Blows up
  anything that ENUMERATES the calendar rather than the observed days.
* ``epoch_outliers`` — a clean calendar plus ~0.2% of rows drifted to
  epoch zero (1970-01-01, the NULL-parse default) and ~0.2% to
  2100-01-01 (overflow). Stretches per-key min..max spans by decades
  on the poisoned keys only.

The known cliff is ``gapfill``'s per-key ``sequence(min, max)`` spine —
one drifted row per key synthesizes ~20k rows (epoch zero) to ~2.9M
rows (year 9999) for that key. The mitigation is mechanical and
opt-in: ``gapfill(clamp_bounds=(lo, hi))`` drops rows outside the
declared calendar window before bounds are computed (drifted
timestamps are upstream poison, not data); the probe reports the
clamped variant side by side. Observed-day designs (sessionize's day
spine, retention's groupBy day) are structurally immune — the probe
exists to prove that empirically, per query.

Run on a QUIET host:  python tools/time_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("TIME_PROBE_SF_DIR", "/root/testdata/sf0.01")

#: event-history queries under test (registered names)
QUERIES_UNDER_TEST = [
    "ext_gapfill",
    "ext_retention",
    "ext_dau_wau",
    "ext_survival_curve",
    "ext_inter_arrival",
    "sessionize",
    "cohort_retention",
    "ext_windowed_hll",
    "ext_session_paths",
    "tumbling_window",
]


def _write_variants(spark) -> dict[str, str]:
    """Materialize the three pathological event tables (+ passthrough
    copies of every other table) and return {variant: sf_dir}."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{BASE}/events.parquet")
    min_us = ev.agg(F.min(F.unix_micros(F.col("ts").cast("timestamp")))).first()[0]

    variants = {
        "one_instant": ev.withColumn(
            "ts", F.lit("2024-01-15 12:00:00").cast("timestamp")
        ),
        "sparse_wide": ev.withColumn(
            "ts",
            F.timestamp_micros(
                F.lit(min_us)
                + (F.unix_micros(F.col("ts").cast("timestamp")) - F.lit(min_us))
                * F.lit(600)
            ),
        ),
        "epoch_outliers": ev.withColumn(
            "ts",
            F.when(
                F.col("event_id") % 500 == 0,
                F.lit("1970-01-01 00:00:00").cast("timestamp"),
            )
            .when(
                F.col("event_id") % 500 == 1,
                F.lit("2100-01-01 00:00:00").cast("timestamp"),
            )
            .otherwise(F.col("ts")),
        ),
    }
    dirs = {}
    others = (
        "region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split()
    for vname, vdf in variants.items():
        d = f"/tmp/spark_graft_time_{vname}_" + os.path.basename(BASE.rstrip("/"))
        vdf.coalesce(4).write.mode("overwrite").parquet(f"{d}/events.parquet")
        for t in others:
            dst = f"{d}/{t}.parquet"
            if not os.path.exists(dst):
                spark.read.parquet(f"{BASE}/{t}.parquet").write.mode(
                    "overwrite"
                ).parquet(dst)
        dirs[vname] = d
    return dirs


def main() -> None:
    from pyspark.sql import functions as F

    from be_analytic_etl_spark.operators.timeseries import gapfill
    from be_analytic_etl_spark.registry import QUERIES
    from be_analytic_etl_spark.session import get_spark

    spark = get_spark()
    dirs = _write_variants(spark)

    def bench(fn, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return best

    order = ["one_instant", "sparse_wide", "epoch_outliers"]
    print("| query | clean | " + " | ".join(order) + " | worst ratio |")
    print("|---|---|---|---|---|---|")
    for name in QUERIES_UNDER_TEST:
        base_t = bench(QUERIES[name], BASE)
        row = [base_t]
        for v in order:
            row.append(bench(QUERIES[name], dirs[v]))
        worst = max(row[1:]) / base_t
        cells = " | ".join(f"{t:.2f}s" for t in row)
        print(f"| {name} | {cells} | {worst:.1f}x |")

    # the mitigation, same readout as the registered ext_gapfill but
    # clamped to the declared 2024 calendar window
    def gapfill_clamped(spark, sf_dir):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        daily = (
            ev.filter(F.col("event_type") == "view")
            .groupBy("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
            .agg(F.sum("value").alias("daily_value"))
        )
        return gapfill(
            daily,
            ["user_id"],
            "day",
            ["daily_value"],
            step="1 day",
            clamp_bounds=("2024-01-01", "2025-01-01"),
        )

    base_t = bench(gapfill_clamped, BASE)
    row = [base_t] + [bench(gapfill_clamped, dirs[v]) for v in order]
    worst = max(row[1:]) / base_t
    cells = " | ".join(f"{t:.2f}s" for t in row)
    print(f"| ext_gapfill (clamp_bounds) | {cells} | {worst:.1f}x |")
    spark.stop()


if __name__ == "__main__":
    main()
