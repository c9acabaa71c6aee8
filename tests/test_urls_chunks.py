"""Unit tests for URL canonicalization and aligned-chunk dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from be_analytic_etl_spark.operators.dedup import chunk_dedup_stats
from be_analytic_etl_spark.operators.urls import canonical_url


def _canon(spark, url):
    df = spark.createDataFrame([(url,)], "u string")
    return df.select(canonical_url("u").alias("c")).collect()[0]["c"]


def test_canonical_url_rules(spark):
    # case, default port, fragment, utm params, param sort, trailing slash
    assert (
        _canon(spark, "HTTPS://WWW.Site.COM:443/A/B/?b=2&utm_source=x&a=1#frag")
        == "https://www.site.com/A/B?a=1&b=2"
    )
    assert _canon(spark, "http://Host.com:80/") == "http://host.com/"
    # non-default port survives; path case preserved
    assert _canon(spark, "http://host.com:8080/P") == "http://host.com:8080/P"
    # empty path -> /
    assert _canon(spark, "https://host.com") == "https://host.com/"
    # all params tracking -> no query at all
    assert _canon(spark, "https://h.co/x?utm_a=1&utm_b=2") == "https://h.co/x"
    # malformed: lowercased passthrough
    assert _canon(spark, "  Not A URL  ") == "not a url"


def test_canonical_url_idempotent(spark):
    df = spark.createDataFrame(
        [("HTTPS://A.B:443/p/?utm_x=1&z=2&a=3#f",)], "u string"
    )
    once = df.select(canonical_url("u").alias("c"))
    twice = once.select(canonical_url("c").alias("c"))
    assert once.collect() == twice.collect()


def test_chunk_dedup_stats_known(spark):
    # 10-token chunks; doc 1 repeats doc 0's first chunk exactly, doc 2 is
    # unique, doc 3 is empty.
    c0 = " ".join(f"w{i}" for i in range(10))
    c1 = " ".join(f"x{i}" for i in range(10))
    c2 = " ".join(f"y{i}" for i in range(5))  # partial chunk
    rows = [
        (0, f"{c0} {c1}"),  # chunks: c0, c1 -> both first
        (1, f"{c0} {c2}"),  # c0 dup, c2 first
        (2, c2),  # dup of doc 1's second chunk
        (3, ""),  # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in chunk_dedup_stats(df, "doc_id", "text").collect()}
    assert (out[0]["n_chunks"], out[0]["n_kept"]) == (2, 2)
    assert (out[1]["n_chunks"], out[1]["n_kept"]) == (2, 1)
    assert out[1]["dup_ratio"] == 0.5
    assert (out[2]["n_chunks"], out[2]["n_kept"]) == (1, 0)
    assert (out[3]["n_chunks"], out[3]["n_kept"], out[3]["dup_ratio"]) == (0, 0, 0.0)


def test_chunk_dedup_first_occurrence_is_by_id_then_idx(spark):
    c = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame(
        [(5, c), (2, c)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in chunk_dedup_stats(df, "doc_id", "text").collect()}
    assert out[2]["n_kept"] == 1  # lower id wins
    assert out[5]["n_kept"] == 0
