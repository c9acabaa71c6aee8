"""Round-4 curation queries: C4/Gopher quality gate, character entropy,
paragraph-level corpus dedup with reassembly, sliding-window token
chunking, and video-style frame sampling over binary payloads.

Same cross-engine determinism rules as queries_extensions.py: regex
constructs restricted to the Java-regex/RE2 intersection, identical IEEE
double op order between the Spark expression and its DuckDB twin, md5/
sha256 over identical byte sequences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from be_analytic_etl_spark.functions.rounding import stable_round, stable_round_sql
from be_analytic_etl_spark.operators import curation as C
from be_analytic_etl_spark.operators import textstats as T
from be_analytic_etl_spark.queries_extensions import _STOP_SQL, _t, _TOKS
from be_analytic_etl_spark.registry import register

# ---------------------------------------------------------------------------
# C4/Gopher-style quality gate. Map-only: every rule is a native Column
# expression over one scan of `documents`; the per-rule flags let the
# oracle value-check each rule independently, not just the final verdict.

#: ORDINARY_CLASS with the single-quote doubled for embedding in a DuckDB
#: string literal.
_ORDINARY_SQL = C.ORDINARY_CLASS.replace("'", "''")
_BOILER_SQL = " AND ".join(
    f"NOT contains(low, '{m}')" for m in C.BOILERPLATE_MARKERS
)


def q_ext_c4_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.c4_quality_flags(_t(spark, sf_dir, "documents"))


register(
    "ext_c4_filter",
    q_ext_c4_filter,
    f"""
    WITH base AS (
        SELECT doc_id,
               coalesce(text, '') AS t,
               lower(coalesce(text, '')) AS low,
               {_TOKS} AS toks
        FROM documents
    ), m AS (
        SELECT doc_id, t, low, toks,
               len(toks) AS n_words,
               length(regexp_replace(t, '{T.WS_CLASS}', '', 'g')) AS n_nonspace,
               length(t) AS n_chars,
               length(regexp_replace(t, '{_ORDINARY_SQL}', '', 'g')) AS n_symbols
        FROM base
    ), r AS (
        SELECT doc_id, n_words,
               CASE WHEN n_words > 0
                    THEN CAST(n_nonspace AS DOUBLE) / n_words ELSE 0.0 END
                   AS mean_word_len,
               CASE WHEN n_chars > 0
                    THEN CAST(n_symbols AS DOUBLE) / n_chars ELSE 0.0 END
                   AS symbol_ratio,
               (n_words BETWEEN {C.MIN_WORDS} AND {C.MAX_WORDS}) AS flag_word_count,
               regexp_matches(t, '[.!?]{T.WS_CLASS}*$') AS flag_terminal_punct,
               len(list_filter(toks, x -> list_contains({_STOP_SQL}, lower(x)))) > 0
                   AS flag_has_stopword,
               ({_BOILER_SQL}) AS flag_no_boilerplate
        FROM m
    )
    SELECT doc_id, n_words, mean_word_len, symbol_ratio,
           flag_word_count,
           (mean_word_len BETWEEN {C.MIN_MEAN_WORD_LEN} AND {C.MAX_MEAN_WORD_LEN})
               AS flag_mean_word_len,
           flag_terminal_punct,
           (symbol_ratio < {C.MAX_SYMBOL_RATIO}) AS flag_symbol_ratio,
           flag_has_stopword, flag_no_boilerplate,
           (flag_word_count
            AND (mean_word_len BETWEEN {C.MIN_MEAN_WORD_LEN} AND {C.MAX_MEAN_WORD_LEN})
            AND flag_terminal_punct
            AND (symbol_ratio < {C.MAX_SYMBOL_RATIO})
            AND flag_has_stopword AND flag_no_boilerplate) AS keep
    FROM r
    """,
)


# ---------------------------------------------------------------------------
# Character-class entropy. The 36 replace-count passes and the fixed
# summation order are shared between engines via curation.ENTROPY_ALPHABET
# / char_entropy_sql_exprs; the log2-derived entropy is emitted rounded
# (libm ulp differences survive any op-order discipline).

def q_ext_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    # Two-step select: the struct is aliased once and field-accessed in the
    # parent project; CollapseProject keeps the split (the alias is
    # non-cheap and referenced 3x), so the 36-count array is evaluated once.
    return docs.select(
        "doc_id", C.char_class_entropy("text").alias("__e")
    ).select(
        "doc_id",
        F.col("__e.n_alnum").alias("n_alnum"),
        # log2 is libm: JVM vs DuckDB differ in the last ulp for some
        # arguments, so the entropy sum is not bit-comparable however
        # fixed the op order. Round the emitted double (6 decimals on a
        # <=5.17-bit entropy leaves ~5e3x margin over the ulp noise).
        # top_char_frac is a pure IEEE division of exact counts —
        # deterministic, no rounding needed.
        stable_round(F.col("__e.entropy_bits"), 6).alias("entropy_bits"),
        F.col("__e.top_char_frac").alias("top_char_frac"),
    )


def _char_entropy_oracle() -> str:
    x = C.char_entropy_sql_exprs("text")
    return f"""
    WITH base AS (
        SELECT doc_id, {x['n']} AS n, text FROM documents
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_alnum,
           {stable_round_sql(x['entropy'], 6)} AS entropy_bits,
           {x['top']} AS top_char_frac
    FROM base
    """


register("ext_char_entropy", q_ext_char_entropy, _char_entropy_oracle())


# ---------------------------------------------------------------------------
# Paragraph-level corpus dedup + reassembly (Dolma/CCNet pass).

def q_ext_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.paragraph_dedup(_t(spark, sf_dir, "documents"))


register(
    "ext_paragraph_dedup",
    q_ext_paragraph_dedup,
    """
    WITH parts AS (
        SELECT doc_id, u.e.pos AS pos, u.e.part AS part,
               md5(u.e.part) AS part_md5
        FROM (SELECT doc_id,
                     string_split(coalesce(text, ''), '. ') AS toks
              FROM documents),
             unnest(list_apply(toks, (x, i) -> struct_pack(pos := i - 1, part := x))) u(e)
    ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY part_md5 ORDER BY doc_id, pos) AS rk
        FROM parts
    ), rebuilt AS (
        SELECT doc_id, count(*) AS n_kept,
               string_agg(part, '. ' ORDER BY pos) AS rebuilt
        FROM ranked WHERE rk = 1 GROUP BY doc_id
    ), totals AS (
        SELECT doc_id, count(*) AS n_parts FROM parts GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(t.n_parts AS BIGINT) AS n_parts,
           CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(coalesce(r.n_kept, 0) AS DOUBLE) / t.n_parts AS kept_ratio,
           md5(coalesce(r.rebuilt, '')) AS rebuilt_md5
    FROM totals t LEFT JOIN rebuilt r USING (doc_id)
    """,
)


# ---------------------------------------------------------------------------
# Sliding-window token chunking (RAG / context packing). Map-only fan-out.

def q_ext_chunk_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.chunk_tokens(_t(spark, sf_dir, "documents"))


register(
    "ext_chunk_text",
    q_ext_chunk_text,
    f"""
    WITH base AS (
        SELECT doc_id, {_TOKS} AS toks FROM documents
    ), st AS (
        SELECT doc_id, toks, u.s AS start_tok
        FROM base,
             unnest(CASE WHEN len(toks) > 0
                         THEN generate_series(0, len(toks) - 1, {C.CHUNK_STRIDE})
                         ELSE CAST([] AS BIGINT[]) END) u(s)
    )
    SELECT doc_id,
           CAST(start_tok // {C.CHUNK_STRIDE} AS INTEGER) AS chunk_idx,
           CAST(start_tok AS INTEGER) AS start_tok,
           CAST(len(list_slice(toks, start_tok + 1, start_tok + {C.CHUNK_SIZE}))
                AS INTEGER) AS n_chunk_toks,
           md5(array_to_string(list_slice(toks, start_tok + 1, start_tok + {C.CHUNK_SIZE}), ' '))
               AS chunk_md5
    FROM st
    """,
)


# ---------------------------------------------------------------------------
# Frame sampling over binary payloads (video-sampler plumbing: 1:N
# mapInPandas fan-out, sha256 per byte-slice). The query restricts itself
# to ASCII payloads IN BOTH ENGINES (octet_length == char length) so the
# oracle's VARCHAR substring is byte-exact; the operator itself is
# byte-oriented and has no such restriction.

def q_ext_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from be_analytic_etl_spark.operators import multimodal as M

    docs = _t(spark, sf_dir, "documents").filter(
        F.length("text") == F.octet_length("text")
    )
    items = M.synthesize_binary_items(docs, payload_repeat=8)
    return M.sample_frames(items.select("item_id", "payload"))


register(
    "ext_multimodal_frames",
    q_ext_multimodal_frames,
    """
    WITH items AS (
        SELECT doc_id AS item_id, repeat(coalesce(text, ''), 8) AS payload
        FROM documents
        WHERE octet_length(encode(text)) = length(text)
    ), sized AS (
        SELECT item_id, payload,
               least(8, greatest(1, octet_length(encode(payload)) // 1024)) AS n
        FROM items
    )
    SELECT item_id,
           CAST(j AS INTEGER) AS frame_idx,
           sha256(substring(payload, CAST(j * 1024 + 1 AS BIGINT), 1024)) AS frame_sha256
    FROM sized, range(0, 8) r(j)
    WHERE j < n
    """,
)


# ---------------------------------------------------------------------------
# Resize plumbing (the remaining multimodal verb: decode -> resize ->
# re-encode): portable kernel emits a checksum of the deterministic
# "resized" stand-in, value-checked by the oracle. md5 hashes utf-8 on
# both sides, so no ASCII restriction needed (unlike the byte-substring
# frames oracle).

_RESIZE_W = 16
_RESIZE_H = 16


def q_ext_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from be_analytic_etl_spark.operators import multimodal as M

    docs = _t(spark, sf_dir, "documents")
    items = M.synthesize_binary_items(docs, payload_repeat=8)
    return M.resize_binary(items, width=_RESIZE_W, height=_RESIZE_H)


register(
    "ext_multimodal_resize",
    q_ext_multimodal_resize,
    f"""
    WITH items AS (
        SELECT doc_id AS item_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                    ELSE 'video' END AS modality,
               repeat(coalesce(text, ''), 8) AS payload
        FROM documents
    )
    SELECT item_id, modality,
           CAST(octet_length(CAST(payload AS BLOB)) AS INTEGER) AS src_bytes,
           CAST({_RESIZE_W} AS INTEGER) AS out_w,
           CAST({_RESIZE_H} AS INTEGER) AS out_h,
           md5(substr(repeat(md5(payload), {-(-_RESIZE_W * _RESIZE_H // 32)}),
                      1, {_RESIZE_W * _RESIZE_H})) AS resized_md5
    FROM items
    """,
)
