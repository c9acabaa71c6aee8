"""Round-11 registry merges: each merged panel must carry BOTH parents'
readouts verbatim — these tests pin the merged query against the (now
unregistered) parent helpers, so the merge can never silently lose or
alter a leg. The pipeline parity lives in test_pipeline_composer.py."""

from __future__ import annotations

from collections import Counter

from be_analytic_etl_spark.registry import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_tdigest_panel_carries_both_parent_readouts(spark):
    from be_analytic_etl_spark.queries_round8 import (
        q_ext_tdigest_quantiles,
        q_ext_tdigest_read,
    )

    panel = {r["cluster"]: r for r in QUERIES["ext_tdigest_panel"](spark, SF_DIR).collect()}
    # write leg: the digest clusters are emitted verbatim
    clusters = q_ext_tdigest_quantiles(spark, SF_DIR).collect()
    assert len(clusters) == len(panel) > 0
    for c in clusters:
        p = panel[c["cluster"]]
        assert (p["weight"], p["centroid"], p["v_min"], p["v_max"]) == (
            c["weight"], c["centroid"], c["v_min"], c["v_max"]
        )
    # read leg: each quantile's (rank, exact, error) folds onto exactly
    # one owning cluster; totals must reconcile with the parent's rows
    reads = q_ext_tdigest_read(spark, SF_DIR).collect()
    assert sum(p["n_q_owned"] for p in panel.values()) == len(reads) == 7
    assert sum(p["rank_sum"] for p in panel.values()) == sum(r["rank"] for r in reads)
    assert sum(p["exact_sum"] for p in panel.values()) == sum(
        r["exact_value"] for r in reads
    )
    worst = max(r["abs_err"] for r in reads)
    assert max(
        p["err_max"] for p in panel.values() if p["err_max"] is not None
    ) == worst


def test_simhash_panel_carries_both_parent_readouts(spark):
    from be_analytic_etl_spark.queries_extensions import (
        q_ext_simhash,
        q_ext_simhash_neardup,
    )

    panel = {r["doc_id"]: r for r in QUERIES["ext_simhash_panel"](spark, SF_DIR).collect()}
    # fingerprint leg: every doc's simhash verbatim
    fps = q_ext_simhash(spark, SF_DIR).collect()
    assert len(fps) == len(panel) > 0
    assert all(panel[r["doc_id"]]["simhash"] == r["simhash"] for r in fps)
    # pair leg: symmetric fold of the parent's pairs
    pairs = q_ext_simhash_neardup(spark, SF_DIR).collect()
    n = Counter()
    mn: dict[int, int] = {}
    for p in pairs:
        for d in (p["id_a"], p["id_b"]):
            n[d] += 1
            mn[d] = min(mn.get(d, 99), p["hamming"])
    for doc_id, row in panel.items():
        assert row["n_partners"] == n.get(doc_id, 0)
        assert row["min_hamming"] == mn.get(doc_id)


def test_hll_panel_carries_both_parent_readouts(spark):
    from pyspark.sql import functions as F

    from be_analytic_etl_spark.queries_round5 import q_ext_hll_union

    panel = {r["scope"]: r for r in QUERIES["ext_hll_panel"](spark, SF_DIR).collect()}
    # rollup leg: per-source + merged-ALL estimates verbatim
    union = q_ext_hll_union(spark, SF_DIR).collect()
    assert len(union) == len(panel) > 1
    for u in union:
        p = panel[u["scope"]]
        assert (p["hll_estimate"], p["n_registers_used"]) == (
            u["hll_estimate"], u["n_registers_used"]
        )
    # exact leg: the error-visibility counts match a direct distinct
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    per = {
        r["source"]: r["n"]
        for r in docs.groupBy("source")
        .agg(F.countDistinct("text").alias("n"))
        .collect()
    }
    assert panel["ALL"]["exact_distinct"] == docs.select("text").distinct().count()
    for s, cnt in per.items():
        assert panel[s]["exact_distinct"] == cnt


def test_retired_parents_still_match_their_oracles(spark, duck):
    """The retired pair members keep their own DuckDB value checks HERE
    (they left the driver registry at the merge, not the test suite) —
    so the sketch write/read/rollup twins can never silently rot while
    only the merged panels are driver-checked."""
    from tests.conftest import assert_matches_oracle

    from be_analytic_etl_spark.queries_extensions import (
        _hll_oracle,
        q_ext_hll_distinct,
    )
    from be_analytic_etl_spark.queries_round5 import (
        _hll_union_oracle,
        q_ext_hll_union,
    )
    from be_analytic_etl_spark.queries_round8 import (
        _tdigest_oracle,
        _tdigest_read_oracle,
        q_ext_tdigest_quantiles,
        q_ext_tdigest_read,
    )

    for fn, sql in [
        (q_ext_tdigest_quantiles, _tdigest_oracle()),
        (q_ext_tdigest_read, _tdigest_read_oracle()),
        (q_ext_hll_distinct, _hll_oracle()),
        (q_ext_hll_union, _hll_union_oracle()),
    ]:
        assert_matches_oracle(fn(spark, SF_DIR), duck, sql)
