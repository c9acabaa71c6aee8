"""Multimodal plumbing tests: binary columns, metadata, mapInPandas shapes.

The decode kernel is stubbed (no image/audio libs here) — what's tested is
everything Spark-side: schemas, Arrow batch iteration, 1:N fan-out,
deterministic feature parity with a driver-side reference, and that the
features feed the similarity operators unchanged.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from be_analytic_etl_spark.operators import multimodal as M

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def items(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)
    return M.synthesize_binary_items(docs, payload_repeat=8).cache()


def test_metadata_is_jvm_side(items):
    meta = M.attach_binary_metadata(items)
    rows = meta.select("item_id", "payload", "n_bytes", "sha256").collect()
    assert rows
    for r in rows:
        raw = bytes(r["payload"])
        assert r["n_bytes"] == len(raw)
        assert r["sha256"] == hashlib.sha256(raw).hexdigest()
    # metadata must not require Python execution: plan has no mapInPandas
    plan = meta._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan


def test_featurize_schema_and_determinism(items):
    out = M.featurize_binary(items, dim=12)
    assert out.schema.simpleString() == (
        "struct<item_id:bigint,modality:string,n_bytes:int,"
        "sha256:string,feature:array<float>>"
    )
    rows = {r["item_id"]: r for r in out.collect()}
    raw_rows = {r["item_id"]: bytes(r["payload"]) for r in items.collect()}
    assert set(rows) == set(raw_rows)
    for item_id, r in rows.items():
        raw = raw_rows[item_id]
        assert r["sha256"] == hashlib.sha256(raw).hexdigest()
        assert len(r["feature"]) == 12
        expect = M._fake_feature(raw, 12)
        got = list(r["feature"])
        assert got == pytest.approx(expect, abs=1e-6)  # float32 storage
    # repartitioning must not change results (partition-independence)
    repart = M.featurize_binary(items.repartition(7), dim=12)
    again = {r["item_id"]: list(r["feature"]) for r in repart.collect()}
    for item_id in rows:
        assert again[item_id] == list(rows[item_id]["feature"])


def test_real_decoder_is_stubbed(items):
    with pytest.raises(Exception) as exc_info:
        M.featurize_binary(items, kernel="decode").collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_portable_kernel_matches_driver_reference(items):
    out = M.featurize_binary(items, dim=6, kernel="portable")
    rows = {r["item_id"]: list(r["feature"]) for r in out.collect()}
    raw_rows = {r["item_id"]: bytes(r["payload"]) for r in items.collect()}
    for item_id, feat in rows.items():
        expect = M._portable_feature(raw_rows[item_id], 6)
        assert feat == pytest.approx(expect, abs=1e-6)
        assert all(-1.0 <= f < 1.0 for f in feat)


def test_frame_sampling_fanout(items):
    frames = M.sample_frames(items, every_n_bytes=256, max_frames=4)
    pdf = frames.toPandas()
    assert set(pdf.columns) == {"item_id", "frame_idx", "frame_sha256"}
    per_item = pdf.groupby("item_id").size()
    assert (per_item >= 1).all() and (per_item <= 4).all()
    # frame hash must equal the driver-side slice hash
    raw = {r["item_id"]: bytes(r["payload"]) for r in items.collect()}
    for _, row in pdf.iterrows():
        chunk = raw[row["item_id"]][row["frame_idx"] * 256 : (row["frame_idx"] + 1) * 256]
        assert row["frame_sha256"] == hashlib.sha256(chunk).hexdigest()


def test_features_feed_similarity_search(spark, items):
    from be_analytic_etl_spark.operators import similarity as S

    feats = M.featurize_binary(items, dim=8).select(
        F.col("item_id").alias("vec_id"), F.col("feature").alias("embedding")
    )
    queries = feats.limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    topk = S.brute_force_topk(feats, queries, k=3).collect()
    assert len(topk) == 6
    for r in topk:
        assert r["neighbor_id"] != r["query_id"]
        assert -1.0 <= r["cos_sim"] <= 1.0


def test_resize_portable_kernel_matches_driver_reference(items):
    """resize_binary's portable kernel: checksum of the first w*h hex
    chars of the repeated md5 seed — recomputable on the driver."""
    out = {r["item_id"]: r for r in M.resize_binary(items, width=4, height=8).collect()}
    raw = {r["item_id"]: bytes(r["payload"]) for r in items.collect()}
    assert set(out) == set(raw)
    for item_id, r in out.items():
        assert (r["out_w"], r["out_h"]) == (4, 8)
        assert r["src_bytes"] == len(raw[item_id])
        seed = hashlib.md5(raw[item_id]).hexdigest()
        resized = (seed * 1)[:32]  # 4*8 = 32 chars = one seed repetition
        assert r["resized_md5"] == hashlib.md5(resized.encode()).hexdigest()


def test_resize_decode_kernel_is_stubbed(items):
    import pytest

    with pytest.raises(Exception, match="NotImplementedError|decode"):
        M.resize_binary(items, kernel="decode").collect()


def test_resize_rejects_unknown_kernel(items):
    import pytest

    with pytest.raises(ValueError):
        M.resize_binary(items, kernel="bilinear")
