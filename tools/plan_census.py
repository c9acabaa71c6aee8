"""Full-registry plan census for the optimization round: for EVERY query,
time the Python-side plan BUILD (py4j/driver cost, includes any
control-plane jobs the builder runs) and count physical-plan nodes from
``explain("formatted")`` text: parquet scans, exchanges, sorts, join
strategies, Python-boundary nodes.

Pure driver work (no query execution beyond builders' own control-plane
actions). Output: TSV to stdout, sorted by scan count desc.

Usage: python tools/plan_census.py [out.tsv]
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from be_analytic_etl_spark.registry import QUERIES
    from be_analytic_etl_spark.session import cached_scope, get_spark

    spark = get_spark("plan-census")
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    passes = int(os.environ.get("CENSUS_PASSES", "1"))
    rows = []
    for name in QUERIES:
        try:
            builds = []
            for _ in range(passes):
                with cached_scope(spark):
                    t0 = time.perf_counter()
                    df = QUERIES[name](spark, SF_DIR)
                    builds.append(time.perf_counter() - t0)
                    t0 = time.perf_counter()
                    txt = df._jdf.queryExecution().explainString(mode)
                    t_explain = time.perf_counter() - t0
            t_build = min(builds)
        except Exception as e:
            rows.append((name, -1.0, -1.0, -1, -1, -1, -1, -1, -1, str(e)[:60]))
            continue
        n_scan = len(re.findall(r"Scan parquet", txt))
        n_exch = len(re.findall(r"\bExchange\b", txt)) - len(
            re.findall(r"BroadcastExchange|ReusedExchange", txt)
        )
        n_bcast = len(re.findall(r"BroadcastExchange", txt))
        n_sort = len(re.findall(r"\+- Sort\b|^Sort\b", txt, re.M))
        n_smj = len(re.findall(r"SortMergeJoin", txt))
        n_py = len(re.findall(r"BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas", txt))
        n_mem = len(re.findall(r"InMemoryRelation", txt))
        rows.append(
            (name, round(t_build, 3), round(t_explain, 3), n_scan, n_exch,
             n_bcast, n_sort, n_smj, n_py, f"inmem={n_mem}")
        )

    rows.sort(key=lambda r: (-r[3], -r[1]))
    out = sys.argv[1] if len(sys.argv) > 1 else None
    fh = open(out, "w") if out else sys.stdout
    print("name\tbuild_s\texplain_s\tscans\texch\tbcast\tsort\tsmj\tpynodes\tnote", file=fh)
    for r in rows:
        print("\t".join(str(x) for x in r), file=fh)
    if out:
        fh.close()
    spark.stop()


if __name__ == "__main__":
    main()
