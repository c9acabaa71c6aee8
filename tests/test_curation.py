"""Curation operators: plan-shape + semantic unit tests.

C4/Gopher gate, char-class entropy, paragraph dedup + reassembly, token
chunking, frame sampling — the plan properties that must hold at 100 TB
(map-only gates, let-bound expression trees, no unkeyed shuffles) plus
value semantics the oracle gate can't isolate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from be_analytic_etl_spark.operators import curation as C
from be_analytic_etl_spark.registry import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- plan shapes -----------------------------------------------------------


def _no_keyed_shuffle(plan: str) -> bool:
    # load_table(spread=True) adds a RoundRobin spread over the
    # single-row-group testdata; only keyed exchanges indicate a real
    # shuffle in the operator itself.
    return "hashpartitioning" not in plan and "rangepartitioning" not in plan


def test_c4_filter_is_map_only(spark):
    plan = plan_of(QUERIES["ext_c4_filter"](spark, SF_DIR))
    assert _no_keyed_shuffle(plan), plan


def test_chunk_text_is_map_only(spark):
    plan = plan_of(QUERIES["ext_chunk_text"](spark, SF_DIR))
    assert _no_keyed_shuffle(plan), plan
    assert "Generate" in plan, plan  # the posexplode fan-out


def test_char_entropy_counts_are_let_bound(spark):
    """The 36 replace-counts must appear once (array construction), not
    re-inlined into total/entropy/max — the CollapseProject blowup the
    engine's `let` exists to prevent."""
    spark.conf.set("spark.sql.debug.maxToStringFields", "10000")
    df = QUERIES["ext_char_entropy"](spark, SF_DIR)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    n_replace = plan.count("replace(")
    assert n_replace <= len(C.ENTROPY_ALPHABET) + 5, f"{n_replace} replace() sites"


def test_paragraph_dedup_shuffles_hash_not_text(spark):
    """The wide exchange must partition on part_md5, never the paragraph."""
    df = QUERIES["ext_paragraph_dedup"](spark, SF_DIR)
    plan = plan_of(df)
    assert "hashpartitioning(part_md5" in plan, plan


# --- semantics -------------------------------------------------------------


def test_c4_rules_fire_individually(spark):
    rows = [
        (1, "The cat sat on the mat and it was good."),  # keeps
        (2, "short."),  # word count
        (3, "the " + "word " * 30),  # no terminal punct
        (4, "The @@ ## $$ %% ^^ && cat sat on the mat %%%% @@@@ ####."),  # symbols
        (5, "Lorem ipsum dolor sit amet and the rest of it is here."),  # boilerplate
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in C.c4_quality_flags(df).collect()}
    assert out[1]["keep"]
    assert not out[2]["flag_word_count"] and not out[2]["keep"]
    assert not out[3]["flag_terminal_punct"] and not out[3]["keep"]
    assert not out[4]["flag_symbol_ratio"] and not out[4]["keep"]
    assert not out[5]["flag_no_boilerplate"] and not out[5]["keep"]


def test_char_entropy_values(spark):
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "ab"), (3, "???"), (4, None)], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", C.char_class_entropy("text").alias("e")
        ).select("doc_id", "e.*").collect()
    }
    assert out[1]["entropy_bits"] == 0.0 and out[1]["top_char_frac"] == 1.0
    assert abs(out[2]["entropy_bits"] - 1.0) < 1e-12
    assert out[3]["n_alnum"] == 0 and out[3]["entropy_bits"] == 0.0
    assert out[4]["n_alnum"] == 0


def test_paragraph_dedup_keeps_first_occurrence(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha. beta. gamma"),
            (2, "beta. delta"),  # beta already seen in doc 1
            (3, "beta. beta"),  # fully duplicate doc
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in C.paragraph_dedup(df).collect()}
    assert out[1]["n_parts"] == 3 and out[1]["n_kept"] == 3
    assert out[2]["n_parts"] == 2 and out[2]["n_kept"] == 1
    assert out[3]["n_parts"] == 2 and out[3]["n_kept"] == 0
    assert out[3]["kept_ratio"] == 0.0
    # doc 2 rebuilds to exactly "delta"
    import hashlib

    assert out[2]["rebuilt_md5"] == hashlib.md5(b"delta").hexdigest()
    assert out[3]["rebuilt_md5"] == hashlib.md5(b"").hexdigest()


def test_chunk_tokens_window_arithmetic(spark):
    text = " ".join(f"t{i}" for i in range(50))
    df = spark.createDataFrame([(1, text), (2, ""), (3, "one two")], ["doc_id", "text"])
    rows = C.chunk_tokens(df).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    d1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [r["start_tok"] for r in d1] == [0, 24, 48]
    assert [r["n_chunk_toks"] for r in d1] == [32, 26, 2]
    assert 2 not in by_doc  # empty doc -> no chunks
    assert [r["n_chunk_toks"] for r in by_doc[3]] == [2]


def test_frame_sampling_count_matches_payload_size(spark):
    from be_analytic_etl_spark.operators import multimodal as M

    docs = spark.createDataFrame(
        [(1, "x" * 3000), (2, "y" * 10), (3, "z" * 20000)], ["doc_id", "text"]
    )
    items = M.synthesize_binary_items(docs, payload_repeat=1)
    counts = {
        r["item_id"]: r["n"]
        for r in M.sample_frames(items.select("item_id", "payload"))
        .groupBy("item_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert counts[1] == 2  # 3000 // 1024
    assert counts[2] == 1  # below one frame -> still 1
    assert counts[3] == 8  # capped at max_frames


def test_redact_patterns_bounded_and_correct(spark):
    """The RFC-bounded email pattern (round-11 ReDoS fix) must still
    redact normal emails and long digit runs, and must stay LINEAR on
    an adversarial email-alphabet megabyte run — the unbounded form
    re-consumed the rest of the run at every failed position (O(n^2),
    a live hang in the string-poisoned gate)."""
    import time

    from be_analytic_etl_spark.operators.textstats import redact_pii

    rows = [
        (0, "reach me at jane.doe+spam@sub.example.co.uk today"),
        (1, "account 123456789 and a short 12345"),
        (2, "x" * 1_000_000),  # email-alphabet run, no @ — must be fast
        (3, "a" * 70 + "@example.com"),  # local part past the RFC cap
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    t0 = time.time()
    got = {r["id"]: r["r"] for r in df.select("id", redact_pii("text").alias("r")).collect()}
    elapsed = time.time() - t0
    assert got[0] == "reach me at <EMAIL> today"
    assert got[1] == "account <NUM> and a short 12345"
    assert got[2] == "x" * 1_000_000
    # >64-char local part: the RFC-bounded pattern redacts the trailing
    # 64 chars + domain; the 6-char overflow prefix survives (documented)
    assert got[3].endswith("<EMAIL>") and got[3].startswith("aaaaaa")
    assert "@" not in got[3]
    assert elapsed < 30, f"redaction no longer linear: {elapsed:.1f}s"
