"""Custom Python DataSource (rest_tsv): partitioning, encoding fallback,
newline handling — the executor-side rewrite of the reference's
driver-side download loop (main.py:347-389)."""

from __future__ import annotations

import pytest

from be_analytic_etl_spark.sources.datasource import (
    DEFAULT_ENCODINGS,
    _decode_with_fallback,
    register_rest_tsv,
)


def test_decode_fallback_order():
    # latin-1 bytes that are invalid utf-8: 'ç' = 0xE7
    raw = "A\tREGIÃO ç".encode("latin-1")
    assert _decode_with_fallback(raw, DEFAULT_ENCODINGS) == "A\tREGIÃO ç"
    # clean ascii decodes on the first probe
    assert _decode_with_fallback(b"plain", DEFAULT_ENCODINGS) == "plain"


def test_decode_fallback_exhausted():
    with pytest.raises(ValueError):
        _decode_with_fallback(b"\xff\xfe\x00\xd8", ("utf-8", "ascii"))


def test_rest_tsv_reads_files_one_partition_per_url(spark, tmp_path):
    enc_file = tmp_path / "latin.tsv"
    enc_file.write_bytes("SÃO PAULO\t7\nREGIÃO\t9".encode("latin-1"))
    crlf_file = tmp_path / "crlf.tsv"
    crlf_file.write_bytes(b"a\t1\r\nb\t2\r\n")
    register_rest_tsv(spark)
    df = (
        spark.read.format("rest_tsv")
        .option("urls", f"file://{enc_file},file://{crlf_file}")
        .load()
    )
    rows = {(r.url.rsplit("/", 1)[-1], r.line_no): r.line for r in df.collect()}
    assert rows[("latin.tsv", 0)] == "SÃO PAULO\t7"
    assert rows[("latin.tsv", 1)] == "REGIÃO\t9"
    # \r\n never leaks into the line content
    assert rows[("crlf.tsv", 0)] == "a\t1" and rows[("crlf.tsv", 1)] == "b\t2"
    assert df.rdd.getNumPartitions() == 2


def test_rest_tsv_requires_urls(spark):
    register_rest_tsv(spark)
    with pytest.raises(Exception):
        spark.read.format("rest_tsv").load().collect()


def test_rest_tsv_stream_tails_appends(spark, tmp_path):
    """simpleStreamReader: offset = lines consumed; appended lines arrive
    in the next run from the same checkpoint, already-consumed lines do
    not repeat (the append-only-feed exactly-once contract)."""
    feed = tmp_path / "feed.tsv"
    feed.write_bytes(b"a\t1\nb\t2\n")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    register_rest_tsv(spark)

    def run_once():
        # file sink (not memory): the point is checkpointed offset
        # recovery across restarts, which memory sinks don't support
        q = (
            spark.readStream.format("rest_tsv")
            .option("url", f"file://{feed}")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert not q.isActive
        return {(r.line_no, r.line) for r in spark.read.parquet(out).collect()}

    first = run_once()
    assert first == {(0, "a\t1"), (1, "b\t2")}

    feed.write_bytes(b"a\t1\nb\t2\nc\t3\n")  # append one line
    second = run_once()
    # second run emitted ONLY the appended line; sink now holds all three
    assert second == {(0, "a\t1"), (1, "b\t2"), (2, "c\t3")}
    # ... and exactly three rows (a replayed prefix would duplicate 0/1)
    assert spark.read.parquet(out).count() == 3
