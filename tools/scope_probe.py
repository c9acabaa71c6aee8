"""Scope-cardinality probe for SCALE.md: the scope-grouped query family
(per-source / per-lang panels) treats the |scopes|-row frame as control
plane — bounded, broadcastable, crossJoin-able. That assumption is a
DATA property, not a structural one: an upstream drift that makes
``source`` or ``lang`` near-unique per document (a crawl that stamps
the shard URL into `source`, a lang-ID regression emitting raw scores)
turns every "bounded" frame corpus-sized. This probe measures the real
queries on the REAL sf0.01 corpus vs the same rows with `source` made
unique per document and `lang` spread to one per ~2 docs — the
hot-partition probe's sibling for group-cardinality.

Run on a QUIET host:  python tools/scope_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SCOPE_PROBE_SF_DIR", "/root/testdata/sf0.01")

#: scope-grouped queries whose per-scope frame the explosion bloats;
#: the staged fdr_bh_panel joins via its module (m_tests = |sources|).
QUERIES_UNDER_TEST = [
    "ext_anova_f",
    "ext_anova_two_way",
    "ext_psi_drift",
    "ext_hellinger",
    "ext_wasserstein",
    "ext_mixture_sample",
    "ext_doremi_weights",
    "ext_hll_panel",
    "ext_cross_source_overlap",
]


def main() -> None:
    from pyspark.sql import functions as F

    from be_analytic_etl_spark.registry import QUERIES
    from be_analytic_etl_spark.queries_round13_candidates import fdr_bh_panel
    from be_analytic_etl_spark.session import get_spark

    spark = get_spark()
    ex_dir = "/tmp/spark_graft_scopes_" + os.path.basename(BASE.rstrip("/"))
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    (
        docs.withColumn(
            "source", F.concat(F.lit("src_"), F.col("doc_id").cast("string"))
        )
        .withColumn(
            "lang",
            F.concat(
                F.lit("l"), (F.col("doc_id") / 2).cast("long").cast("string")
            ),
        )
        .coalesce(4)
        .write.mode("overwrite")
        .parquet(f"{ex_dir}/documents.parquet")
    )
    for t in (
        "region nation customer supplier part orders lineitem "
        "events embeddings"
    ).split():
        dst = f"{ex_dir}/{t}.parquet"
        if not os.path.exists(dst):
            spark.read.parquet(f"{BASE}/{t}.parquet").write.mode(
                "overwrite"
            ).parquet(dst)

    def bench(fn, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return best

    print("| query | ~5 scopes | 500 sources / 250 langs | ratio |")
    print("|---|---|---|---|")
    for name in QUERIES_UNDER_TEST:
        u = bench(QUERIES[name], BASE)
        s = bench(QUERIES[name], ex_dir)
        print(f"| {name} | {u:.2f}s | {s:.2f}s | {s / u:.1f}x |")
    u = bench(fdr_bh_panel, BASE)
    s = bench(fdr_bh_panel, ex_dir)
    print(f"| fdr_bh_panel (staged) | {u:.2f}s | {s:.2f}s | {s / u:.1f}x |")
    spark.stop()


if __name__ == "__main__":
    main()
