"""Round-2 batch-4 operators: incremental dedup, shard packing, OOV rate."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_incremental_dedup_classifies_three_ways(spark):
    from be_analytic_etl_spark.operators.dedup import incremental_dedup_status

    base = "the quick brown fox jumps over the lazy dog again and again today"
    old = spark.createDataFrame(
        [(1, base), (2, "completely different historical content here")],
        "doc_id INT, text STRING",
    )
    new = spark.createDataFrame(
        [
            (10, base),                                   # exact copy
            (11, base.replace("today", "tomorrow")),      # near copy
            (12, "entirely novel words nobody wrote before"),  # unique
        ],
        "doc_id INT, text STRING",
    )
    got = {
        r["doc_id"]: r["status"]
        for r in incremental_dedup_status(
            new, old, num_hashes=8, bands=4, jaccard_threshold=0.5
        ).collect()
    }
    assert got == {10: "exact_dup", 11: "near_dup", 12: "unique"}, got


def test_incremental_dedup_whitespace_normalized_exact(spark):
    from be_analytic_etl_spark.operators.dedup import incremental_dedup_status

    old = spark.createDataFrame([(1, "Hello   World")], "doc_id INT, text STRING")
    new = spark.createDataFrame([(2, "  hello world ")], "doc_id INT, text STRING")
    got = incremental_dedup_status(new, old).collect()
    assert got[0]["status"] == "exact_dup"


def test_pack_shards_matches_sequential_packing(spark):
    from be_analytic_etl_spark.operators.sampling import pack_shards

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from be_analytic_etl_spark.operators.textstats import token_count

    sized = docs.select("doc_id", token_count("text").alias("n_tokens"))
    budget, buckets = 256, 4
    out = pack_shards(sized, token_budget=budget, n_buckets=buckets).collect()
    assert len(out) == sized.count()

    # recompute the packing per bucket in pure Python over the same order
    import hashlib

    def h60(key: int) -> int:
        return int(hashlib.md5(f"{key}|pack".encode()).hexdigest()[:15], 16)

    by_doc = {r["doc_id"]: r for r in out}
    rows = sorted(
        ((h60(r["doc_id"]), r["doc_id"], r["n_tokens"]) for r in out),
    )
    running = {}
    for h, doc_id, n in rows:
        b = h % buckets
        start = running.get(b, 0)
        running[b] = start + n
        exp_shard = start // budget
        got = by_doc[doc_id]
        assert got["bucket"] == b and got["shard"] == exp_shard, (doc_id, got)


def test_pack_shards_fill_levels(spark):
    """Every shard except each bucket's tail must be filled past the
    budget's start boundary (contiguous packing leaves no empty shards)."""
    from be_analytic_etl_spark.operators.sampling import pack_shards
    from be_analytic_etl_spark.operators.textstats import token_count

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sized = docs.select("doc_id", token_count("text").alias("n_tokens"))
    per_shard = (
        pack_shards(sized, token_budget=256, n_buckets=4)
        .groupBy("bucket", "shard")
        .agg(F.sum("n_tokens").alias("tok"))
        .collect()
    )
    max_shard = {}
    for r in per_shard:
        max_shard[r["bucket"]] = max(max_shard.get(r["bucket"], -1), r["shard"])
    shards = {(r["bucket"], r["shard"]) for r in per_shard}
    for b, top in max_shard.items():
        assert shards.issuperset({(b, s) for s in range(top + 1)}), "gap in shards"


def test_oov_rate_bounds_and_common_vocab(spark):
    from be_analytic_etl_spark.registry import QUERIES

    rows = QUERIES["ext_oov_rate"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["oov_rate"] <= 1.0
        assert r["n_oov"] <= r["n_tokens"]
    # synthetic docs draw from a tiny vocabulary: the top-100 vocab should
    # cover nearly everything
    mean_rate = sum(r["oov_rate"] for r in rows) / len(rows)
    assert mean_rate < 0.2, mean_rate
