"""Stateful streaming operators vs their batch twins.

The bounded stream is the static events table split into 3 parquet files
consumed one file per micro-batch (maxFilesPerTrigger=1), so every
processor crosses state between at least 3 batches — the cross-batch
fold is exactly what these tests pin.

The transformWithState path needs protobuf (absent in this sandbox) and
the RocksDB state store provider; its twin test skips unless
``HAS_TWS_PROTO``. The applyInPandasWithState fallback — identical
semantics — is what runs green here.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from be_analytic_etl_spark.streaming import (
    read_events_stream,
    stream_running_totals,
    stream_topk_per_user,
)
from be_analytic_etl_spark.streaming.stateful import HAS_TWS_PROTO

SF_DIR = "/root/testdata/sf0.001"

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


@pytest.fixture(scope="module")
def events_batch(spark):
    from be_analytic_etl_spark.sources import load_table

    return load_table(spark, SF_DIR, "events").cache()


@pytest.fixture(scope="module")
def events_multibatch_dir(spark, events_batch, tmp_path_factory):
    d = tmp_path_factory.mktemp("events_3batches")
    events_batch.repartitionByRange(3, "event_id").write.parquet(
        str(d / "part0"), mode="overwrite"
    )
    # One flat directory of plain files (file streams don't recurse by
    # default), one file per micro-batch with maxFilesPerTrigger=1.
    import glob
    import shutil

    files = sorted(glob.glob(str(d / "part0" / "*.parquet")))
    assert len(files) == 3
    for i, f in enumerate(files):
        shutil.copy(f, str(d / f"batch_{i}.parquet"))
    shutil.rmtree(str(d / "part0"))
    return str(d)


def _run(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert not q.isActive
    return spark.table(name)


def _check_running_totals(spark, got, events_batch):
    # Multiple batches really happened: some user must have >1 emission.
    emissions = got.groupBy("user_id").count()
    assert emissions.filter(F.col("count") > 1).count() > 0

    # n_events is monotone per key -> final row = max(n_events) per user.
    final = (
        got.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
            ),
        )
        .filter("rn = 1")
        .select("user_id", "n_events", "sum_value")
    )
    want = events_batch.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
    )
    f = {r["user_id"]: (r["n_events"], r["sum_value"]) for r in final.collect()}
    w = {r["user_id"]: (r["n_events"], r["sum_value"]) for r in want.collect()}
    assert set(f) == set(w)
    for uid, (n, s) in w.items():
        assert f[uid][0] == n
        assert f[uid][1] == pytest.approx(s, abs=1e-4)


def _check_topk(spark, got, events_batch, k):
    # Final leaderboard per user = rows at that user's max n_seen.
    # (pandas-side: self-joining a memory-sink view trips conflicting-ref
    # analysis, and the emitted result is test-sized anyway)
    gp = got.toPandas()
    final_pdf = gp[gp["n_seen"] == gp.groupby("user_id")["n_seen"].transform("max")]
    want = (
        events_batch.withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.col("value").desc(), F.col("event_id").asc()
                )
            ),
        )
        .filter(F.col("rank") <= k)
        .select("user_id", "rank", "event_id", F.col("value").cast("double"))
    )
    f = {
        (r.user_id, r.rank): (r.event_id, r.value)
        for r in final_pdf.itertuples(index=False)
    }
    w = {(r["user_id"], r["rank"]): (r["event_id"], r["value"]) for r in want.collect()}
    assert set(f) == set(w)
    for key, (eid, val) in w.items():
        assert f[key][0] == eid
        assert f[key][1] == pytest.approx(val, rel=1e-9)


def test_running_totals_matches_batch(spark, events_batch, events_multibatch_dir):
    stream = read_events_stream(spark, events_multibatch_dir)
    got = _run(
        spark, stream_running_totals(stream, api="apiws"), "t_running"
    ).cache()
    _check_running_totals(spark, got, events_batch)


def test_topk_matches_batch(spark, events_batch, events_multibatch_dir):
    k = 3
    stream = read_events_stream(spark, events_multibatch_dir)
    got = _run(spark, stream_topk_per_user(stream, k=k, api="apiws"), "t_topk").cache()
    _check_topk(spark, got, events_batch, k)


@pytest.mark.skipif(
    not HAS_TWS_PROTO,
    reason="transformWithState needs protobuf (absent in sandbox; no pip)",
)
def test_tws_running_totals_matches_batch(spark, events_batch, events_multibatch_dir):
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB)
    try:
        stream = read_events_stream(spark, events_multibatch_dir)
        got = _run(
            spark, stream_running_totals(stream, api="tws"), "t_tws_running"
        ).cache()
        _check_running_totals(spark, got, events_batch)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_stream_upsert_parquet_latest_per_key(
    spark, events_batch, events_multibatch_dir, tmp_path
):
    from be_analytic_etl_spark.streaming.jobs import stream_upsert_parquet

    stream = read_events_stream(spark, events_multibatch_dir)
    out = str(tmp_path / "latest_events")
    q = stream_upsert_parquet(
        stream,
        out,
        keys=["user_id"],
        order_col="ts",
        tiebreak_col="event_id",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)
    assert not q.isActive

    got = spark.read.parquet(out)
    want = (
        events_batch.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.col("ts").desc(), F.col("event_id").desc()
                )
            ),
        )
        .filter("rn = 1")
        .drop("rn")
    )
    g = {r["user_id"]: (r["event_id"], r["ts"]) for r in got.collect()}
    w = {r["user_id"]: (r["event_id"], r["ts"]) for r in want.collect()}
    assert g == w


def test_stream_upsert_parquet_resumes_from_checkpoint(
    spark, events_batch, tmp_path
):
    """Second availableNow run from the same checkpoint applies only the
    newly arrived file, and the table still converges to latest-per-key
    over ALL data — the restartable CDC-apply contract."""
    from be_analytic_etl_spark.streaming.jobs import stream_upsert_parquet

    src = tmp_path / "arrivals"
    src.mkdir()
    out = str(tmp_path / "latest")
    ckpt = str(tmp_path / "ckpt")

    half_a = events_batch.filter(F.col("event_id") % 2 == 0)
    half_b = events_batch.filter(F.col("event_id") % 2 == 1)

    def arrive(df, name):
        df.coalesce(1).write.parquet(str(tmp_path / ("stage_" + name)))
        import glob
        import shutil

        f = glob.glob(str(tmp_path / ("stage_" + name) / "*.parquet"))[0]
        shutil.copy(f, str(src / f"{name}.parquet"))

    def run_once():
        stream = read_events_stream(spark, str(src))
        q = stream_upsert_parquet(
            stream, out, keys=["user_id"], checkpoint_dir=ckpt
        )
        q.awaitTermination(180)
        assert not q.isActive

    arrive(half_a, "a")
    run_once()
    n_after_first = spark.read.parquet(out).count()

    arrive(half_b, "b")
    run_once()

    got = {r["user_id"]: r["event_id"] for r in spark.read.parquet(out).collect()}
    want = {
        r["user_id"]: r["event_id"]
        for r in events_batch.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.col("ts").desc(), F.col("event_id").desc()
                )
            ),
        )
        .filter("rn = 1")
        .collect()
    }
    assert got == want
    # the first run really ran on half the data (not replayed wholesale)
    assert n_after_first <= len(want)


def test_stream_upsert_batch_wins_exact_tie(spark, tmp_path):
    """A correction re-sent with identical (ts, event_id) but changed
    payload must deterministically beat the stored row on every apply."""
    from pyspark.sql.types import Row

    from be_analytic_etl_spark.streaming.jobs import stream_upsert_parquet

    src = tmp_path / "arrivals"
    src.mkdir()
    out = str(tmp_path / "latest")
    ckpt = str(tmp_path / "ckpt")
    schema = "event_id long, ts timestamp, user_id long, value double"
    import datetime

    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def arrive(rows, name):
        df = spark.createDataFrame(rows, schema)
        stage = str(tmp_path / ("stage_" + name))
        df.coalesce(1).write.parquet(stage)
        import glob
        import shutil

        shutil.copy(glob.glob(stage + "/*.parquet")[0], str(src / f"{name}.parquet"))

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = stream_upsert_parquet(stream, out, keys=["user_id"], checkpoint_dir=ckpt)
        q.awaitTermination(120)
        assert not q.isActive

    arrive([Row(event_id=1, ts=ts, user_id=7, value=1.0)], "a")
    run_once()
    # same key, same ts, same event_id — corrected payload
    arrive([Row(event_id=1, ts=ts, user_id=7, value=2.0)], "b")
    run_once()
    got = spark.read.parquet(out).collect()
    assert len(got) == 1 and got[0]["value"] == 2.0


def test_stream_heavy_hitter_candidates_superset_of_batch(
    spark, events_batch, events_multibatch_dir
):
    """Per-shard MG candidates after the stream drains must be a
    SUPERSET of the exact global heavy hitters (count*k > n) — the same
    guarantee the batch sketch phase gives — with MG lower bounds that
    never exceed the true counts."""
    from be_analytic_etl_spark.streaming.stateful import (
        stream_heavy_hitter_candidates,
    )

    k, n_shards = 16, 4
    item = F.when(F.col("value") < F.lit(100.0), F.col("event_type")).otherwise(
        F.concat(F.lit("u"), (F.col("user_id") % 500).cast("string"))
    )

    stream = read_events_stream(spark, events_multibatch_dir).select(
        item.alias("item")
    )
    got = _run(
        spark,
        stream_heavy_hitter_candidates(stream, k=k, n_shards=n_shards),
        "t_hh",
    ).cache()

    # final state per shard = rows at that shard's max shard_n
    final = (
        got.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("shard", "item").orderBy(
                    F.col("shard_n").desc(), F.col("count_lb").desc()
                )
            ),
        )
        .filter("rn = 1")
        .select("item", "count_lb")
    )
    cands = {r["item"]: r["count_lb"] for r in final.collect()}

    counts = {
        r["item"]: r["cnt"]
        for r in events_batch.select(item.alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    n = sum(counts.values())
    hitters = {i for i, c in counts.items() if c * k > n}
    assert hitters, "fixture must produce at least one heavy hitter"
    assert hitters <= set(cands)
    for i, lb in cands.items():
        assert lb <= counts[i]
