"""Corpus-curation operators: C4/Gopher-style quality gating, character
entropy, paragraph-level corpus dedup with document reassembly, and
sliding-window token chunking (the RAG/pretraining chunker).

These extend the engine beyond the reference's cleaning surface
(/root/reference/main.py:202-518 stops at cell-level tidy) with the
document-level gates a 100 TB training-data pipeline runs first:

- ``c4_quality_flags``: rule flags in the spirit of C4 (Raffel et al.
  2020, "Exploring the Limits of Transfer Learning", §2.2) and Gopher
  (Rae et al. 2021, appendix A1.1): word-count bounds, mean-word-length
  bounds, terminal punctuation, symbol ratio, stopword presence,
  boilerplate markers. All native Column exprs — map-only, no shuffle,
  predicate-pushdown-friendly.
- ``char_class_entropy``: Shannon entropy of the letter/digit unigram
  distribution. Computed with 36 ``replace``-count passes instead of an
  explode + (doc, char) groupBy: a fixed 36x constant beats a shuffle
  whose row count equals total corpus characters. Low entropy flags
  mass-produced / templated text.
- ``paragraph_dedup``: corpus-wide first-occurrence paragraph dedup
  (the Dolma/CCNet paragraph-level pass): explode paragraphs, keep the
  first (doc_id, pos) occurrence of each distinct paragraph, reassemble
  surviving paragraphs in order. Shuffles carry (md5, doc_id, pos) —
  never whole documents twice.
- ``chunk_tokens``: fixed-size token windows with overlap (stride <
  size), the standard RAG-indexing / pretraining-packing chunker.
  Map-only fan-out, no shuffle.
"""

from __future__ import annotations

import string
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from be_analytic_etl_spark.operators.textstats import (
    STOPWORDS,
    WS_CHARS,
    WS_CLASS,
    token_count,
    tokenize,
)

# ---------------------------------------------------------------------------
# C4 / Gopher quality gate

#: Characters counted as "ordinary" by the symbol-ratio rule. Everything
#: outside this class is a symbol. Restricted to constructs Java regex and
#: RE2 treat identically so the DuckDB oracle can replicate it verbatim —
#: whitespace is spelled out via WS_CHARS because Java's \s includes
#: vertical tab and RE2's does not (ADVICE r11 #2).
ORDINARY_CLASS = "[A-Za-z0-9" + WS_CHARS + ".,;:!?'\"-]"

#: Rule thresholds (C4 uses >=3 sentences & >=5 words/line; Gopher uses
#: 50..100k words, mean word length 3..10; these are the same shape, tuned
#: loose enough that the synthetic corpus exercises both outcomes).
MIN_WORDS = 5
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 2.0
MAX_MEAN_WORD_LEN = 12.0
MAX_SYMBOL_RATIO = 0.1
BOILERPLATE_MARKERS = ["lorem ipsum", "javascript required", "terms of use"]


def c4_quality_flags(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document C4/Gopher-style rule flags plus the conjunction `keep`.

    Every rule is a named boolean column so downstream audits can count
    per-rule rejection rates (the operating signal quality teams actually
    watch) instead of a single opaque verdict.
    """
    c = F.coalesce(F.col(text_col), F.lit(""))
    low = F.lower(c)
    n_words = token_count(text_col)
    n_nonspace = F.length(F.regexp_replace(c, WS_CLASS, ""))
    n_chars = F.length(c)
    n_symbols = F.length(F.regexp_replace(c, ORDINARY_CLASS, ""))
    toks = tokenize(text_col)
    has_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS))) > 0
    flag_boiler = reduce(
        lambda a, b: a & b, [~low.contains(m) for m in BOILERPLATE_MARKERS]
    )
    # Staged selects: the measures become column attributes before the
    # flags reference them (a `between` references its input twice —
    # CollapseProject would otherwise inline the split/regexp tree at
    # every reference site).
    measured = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.when(n_words > 0, n_nonspace.cast("double") / n_words)
        .otherwise(F.lit(0.0))
        .alias("mean_word_len"),
        F.when(n_chars > 0, n_symbols.cast("double") / n_chars)
        .otherwise(F.lit(0.0))
        .alias("symbol_ratio"),
        c.rlike("[.!?]" + WS_CLASS + "*$").alias("flag_terminal_punct"),
        has_stop.alias("flag_has_stopword"),
        flag_boiler.alias("flag_no_boilerplate"),
    )
    flagged = measured.select(
        "*",
        F.col("n_words").between(MIN_WORDS, MAX_WORDS).alias("flag_word_count"),
        F.col("mean_word_len")
        .between(MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN)
        .alias("flag_mean_word_len"),
        (F.col("symbol_ratio") < MAX_SYMBOL_RATIO).alias("flag_symbol_ratio"),
    )
    return flagged.select(
        id_col,
        "n_words",
        "mean_word_len",
        "symbol_ratio",
        "flag_word_count",
        "flag_mean_word_len",
        "flag_terminal_punct",
        "flag_symbol_ratio",
        "flag_has_stopword",
        "flag_no_boilerplate",
        (
            F.col("flag_word_count")
            & F.col("flag_mean_word_len")
            & F.col("flag_terminal_punct")
            & F.col("flag_symbol_ratio")
            & F.col("flag_has_stopword")
            & F.col("flag_no_boilerplate")
        ).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Character-class entropy

ENTROPY_ALPHABET = list(string.ascii_lowercase) + list(string.digits)


def _char_counts(low: Column) -> list[Column]:
    return [
        F.length(low) - F.length(F.replace(low, F.lit(ch), F.lit("")))
        for ch in ENTROPY_ALPHABET
    ]


def char_class_entropy(col: Column | str) -> Column:
    """Shannon entropy (bits) of the a-z0-9 unigram distribution of
    ``lower(col)``, plus the modal-character fraction, as a struct
    ``(n_alnum, entropy_bits, top_char_frac)``.

    The 36 replace-count passes are evaluated ONCE into a let-bound array
    (cleaning.let — Column trees have no sharing, and CollapseProject
    would otherwise inline each count ~4x: into the total, the entropy
    term, and the max). The entropy fold adds terms in fixed alphabet
    order with a 0.0 seed — IEEE-identical to the SQL twin's left-assoc
    chain, so the double is comparable across engines.
    """
    from be_analytic_etl_spark.functions.cleaning import let

    c = F.col(col) if isinstance(col, str) else col
    low = F.lower(F.coalesce(c, F.lit("")))

    def with_counts(arr: Column) -> Column:
        total = F.aggregate(arr, F.lit(0), lambda a, x: a + x)

        def with_n(n: Column) -> Column:
            term = lambda cnt: F.when(  # noqa: E731
                cnt > 0, -(cnt.cast("double") / n) * F.log2(cnt.cast("double") / n)
            ).otherwise(F.lit(0.0))
            entropy = F.when(
                n > 0, F.aggregate(arr, F.lit(0.0), lambda a, x: a + term(x))
            ).otherwise(F.lit(0.0))
            top = F.when(n > 0, F.array_max(arr).cast("double") / n).otherwise(
                F.lit(0.0)
            )
            return F.struct(
                n.cast("long").alias("n_alnum"),
                entropy.alias("entropy_bits"),
                top.alias("top_char_frac"),
            )

        return let(total.cast("double"), with_n)

    return let(F.array(*_char_counts(low)), with_counts)


def char_entropy_sql_exprs(text_expr: str) -> dict[str, str]:
    """DuckDB twins of ``char_class_entropy`` with the same op order."""
    low = f"lower(coalesce({text_expr}, ''))"
    counts = [
        f"(length({low}) - length(replace({low}, '{ch}', '')))"
        for ch in ENTROPY_ALPHABET
    ]
    n = "CAST((" + " + ".join(counts) + ") AS DOUBLE)"
    terms = [
        f"(CASE WHEN {cnt} > 0 THEN -(CAST({cnt} AS DOUBLE) / n) * log2(CAST({cnt} AS DOUBLE) / n) ELSE 0.0 END)"
        for cnt in counts
    ]
    return {
        "n": n,
        "entropy": "(CASE WHEN n > 0 THEN (" + " + ".join(terms) + ") ELSE 0.0 END)",
        "top": (
            "(CASE WHEN n > 0 THEN CAST(greatest("
            + ", ".join(counts)
            + ") AS DOUBLE) / n ELSE 0.0 END)"
        ),
    }


# ---------------------------------------------------------------------------
# Paragraph-level corpus dedup

PARAGRAPH_SEP = ". "


def explode_paragraphs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per paragraph: (id, pos, part, part_md5). The separator is a
    literal (escaped for Spark's regex split) so both engines split
    identically, trailing empties included."""
    import re

    parts = F.split(F.coalesce(F.col(text_col), F.lit("")), re.escape(PARAGRAPH_SEP))
    return docs.select(
        F.col(id_col), F.posexplode(parts).alias("pos", "part")
    ).withColumn("part_md5", F.md5(F.col("part").cast("binary")))


def paragraph_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-wide paragraph dedup with reassembly (Dolma/CCNet shape).

    Keeps the first occurrence of every distinct paragraph — "first" =
    smallest (doc_id, pos) — and rebuilds each document from its surviving
    paragraphs in original order. Output: one row per input document with
    ``n_parts``, ``n_kept``, ``kept_ratio`` and the md5 of the rebuilt
    text (documents whose every paragraph was seen earlier keep an empty
    rebuilt text, they are not dropped).

    Scale: the wide shuffle partitions on the 32-hex part_md5 (never the
    paragraph text as key); the reassembly groupBy partitions on doc_id.
    Both are standard hash exchanges with map-side combine.
    """
    parts = explode_paragraphs(docs, id_col, text_col)
    w = Window.partitionBy("part_md5").orderBy(F.col(id_col), F.col("pos"))
    ranked = parts.withColumn("rk", F.row_number().over(w))
    kept = ranked.filter(F.col("rk") == 1)
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            PARAGRAPH_SEP,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "part"))),
                lambda s: s["part"],
            ),
        ).alias("rebuilt"),
    )
    totals = parts.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_parts"))
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            "n_parts",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            (
                F.coalesce(F.col("n_kept"), F.lit(0)).cast("double")
                / F.col("n_parts")
            ).alias("kept_ratio"),
            F.md5(F.coalesce(F.col("rebuilt"), F.lit("")).cast("binary")).alias(
                "rebuilt_md5"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Sliding-window token chunking

CHUNK_SIZE = 32
CHUNK_STRIDE = 24


def chunk_tokens(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = CHUNK_SIZE,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """Overlapping fixed-size token chunks (stride < chunk_size overlaps
    by chunk_size - stride tokens) — the RAG-indexing / context-packing
    chunker. Map-only fan-out: tokens are split, windowed and hashed
    without any exchange; at 100 TB this runs entirely inside the scan
    stage."""
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    toks = tokenize(text_col)
    n = F.size(toks)
    starts = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))).otherwise(
        F.array().cast("array<int>")
    )
    out = docs.select(F.col(id_col), toks.alias("__toks"), F.posexplode(starts))
    chunk = F.slice(F.col("__toks"), F.col("col") + 1, chunk_size)
    return out.select(
        F.col(id_col),
        F.col("pos").cast("int").alias("chunk_idx"),
        F.col("col").cast("int").alias("start_tok"),
        F.size(chunk).cast("int").alias("n_chunk_toks"),
        F.md5(F.concat_ws(" ", chunk).cast("binary")).alias("chunk_md5"),
    )
