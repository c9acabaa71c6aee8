"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Designed for the 100 TB training-data case:

- **Exact** dedup is a hash groupBy on the text (or its md5 — cheaper
  shuffle payload at scale: 16 bytes instead of the document).
- **MinHash-LSH**: shingle -> k minhashes (higher-order array expressions,
  all JVM-side) -> band buckets -> shuffle only on (band, band_hash) ->
  candidate pairs within buckets -> exact Jaccard verification. The
  shuffle never carries full documents, only (doc_id, signature).
- **SimHash**: one explode + one groupBy with 64 conditional sums — two
  shuffles on doc_id, constant memory per doc.
- **n-gram Jaccard** is the exact verifier, also exposed standalone with
  configurable blocking.

Skew guard: LSH buckets larger than ``max_bucket`` are dropped (a bucket
with thousands of docs is a degenerate hash collision — at scale it would
produce a quadratic pair explosion; the docs it contains are still covered
by their other bands).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from be_analytic_etl_spark.operators.textstats import normalize_text, tokenize, word_ngrams


# --- exact -----------------------------------------------------------------


def exact_dedup(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """R6 twin: drop exact duplicates over ``cols`` (default: all)."""
    return df.dropDuplicates(cols) if cols else df.dropDuplicates()


def exact_dedup_keep_min(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Group identical texts, keep the smallest id as the canonical doc.

    Shuffles on md5(text) (16-byte key) rather than the document itself.
    """
    fp = F.md5(F.col(text_col).cast("binary")).alias("__fp")
    return (
        df.select(fp, F.col(id_col))
        .groupBy("__fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .drop("__fp")
    )


# --- MinHash ---------------------------------------------------------------


def portable_hash64(col: Column, seed: Column) -> Column:
    """Seeded 60-bit hash both Spark and DuckDB can compute identically:
    first 15 hex chars of md5(seed || '|' || value), parsed base-16.

    DuckDB twin: ``CAST('0x' || substr(md5(seed || '|' || v), 1, 15) AS BIGINT)``.
    Used for oracle-checked variants; the scale path uses xxhash64 (no md5
    per shingle)."""
    payload = F.concat(seed.cast("string"), F.lit("|"), col)
    return F.conv(F.substring(F.md5(payload.cast("binary")), 1, 15), 16, 10).cast("long")


def fast_hash64(col: Column, seed: Column) -> Column:
    """xxhash64 seeded via an extra hashed slot — the scale-path hash."""
    return F.xxhash64(col, seed)


def minhash_signature(
    col: Column | str, num_hashes: int = 32, shingle_n: int = 3, portable: bool = False
) -> Column:
    """k-minhash signature (array<long>) over word n-gram shingles.

    sig[i] = min over shingles of hash_i(shingle). Pure array expressions —
    no UDF, no Python boundary. ``portable=True`` swaps xxhash64 for the
    md5-derived hash so a SQL oracle can replicate the signature bit-for-bit.
    """
    shingles = word_ngrams(col, shingle_n)
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    h = portable_hash64 if portable else fast_hash64
    return F.transform(
        seeds,
        lambda seed: F.array_min(F.transform(shingles, lambda sh: h(sh, seed))),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.7,
    max_bucket: int = 1000,
    portable: bool = False,
    round_to: int | None = 4,
) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH with exact-Jaccard verification.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signature(F.col(text_col), num_hashes, shingle_n, portable=portable)
    docs = df.select(
        F.col(id_col).alias("__id"),
        word_ngrams(F.col(text_col), shingle_n).alias("__shingles"),
        sig.alias("__sig"),
    )

    band_idx = F.sequence(F.lit(0), F.lit(bands - 1))
    banded = docs.select(
        "__id",
        "__shingles",
        F.explode(
            F.transform(
                band_idx,
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(",", F.slice("__sig", b * rows_per_band + 1, rows_per_band)),
                        b,
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("__id", "__shingles", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    # Skew guard: drop degenerate buckets before the self-join.
    bucket_sizes = banded.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("n"))
    banded = banded.join(
        bucket_sizes.filter(F.col("n") <= max_bucket).select("band", "bucket"),
        ["band", "bucket"],
    )

    left = banded.select(
        F.col("band"), F.col("bucket"), F.col("__id").alias("id_a"), F.col("__shingles").alias("sh_a")
    )
    right = banded.select(
        F.col("band"), F.col("bucket"), F.col("__id").alias("id_b"), F.col("__shingles").alias("sh_b")
    )
    cand = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )

    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.when(union == 0, F.lit(0.0)).otherwise(inter.cast("double") / union)
    jac = F.round(jac, round_to) if round_to is not None else jac
    return (
        cand.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --- SimHash ---------------------------------------------------------------


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document.

    explode tokens -> hash once per token -> 64 conditional sums in ONE
    groupBy (partial agg map-side) -> reassemble bits. Returns
    (id_col, simhash long).
    """
    toks = df.select(
        F.col(id_col), F.explode_outer(tokenize(F.col(text_col))).alias("__tok")
    ).withColumn("__h", F.xxhash64("__tok"))
    bit_sums = [
        F.sum(
            F.when(F.col("__tok").isNull(), F.lit(0))
            .when(F.shiftright(F.col("__h"), i).bitwiseAND(F.lit(1)) == 1, F.lit(1))
            .otherwise(F.lit(-1))
        ).alias(f"__b{i}")
        for i in range(64)
    ]
    agg = toks.groupBy(id_col).agg(*bit_sums)
    sim = F.lit(0).cast("long")
    for i in range(64):
        sim = sim + F.when(F.col(f"__b{i}") > 0, F.lit(1).cast("long") * (2**i if i < 63 else -(2**63))).otherwise(F.lit(0).cast("long"))
    return agg.select(F.col(id_col), sim.alias("simhash"))


def simhash_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64 bits into 4x16-bit chunks
    (pigeonhole: hamming<=3 pairs share at least one exact chunk), bucket-join
    on chunks, verify true hamming distance."""
    sh = simhash(df, text_col, id_col)
    chunks = sh.select(
        F.col(id_col).alias("__id"),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_id"),
                        F.shiftright(F.col("simhash"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("__id", "simhash", F.col("c.chunk_id").alias("chunk_id"), F.col("c.chunk").alias("chunk"))
    left = chunks.select("chunk_id", "chunk", F.col("__id").alias("id_a"), F.col("simhash").alias("sh_a"))
    right = chunks.select("chunk_id", "chunk", F.col("__id").alias("id_b"), F.col("simhash").alias("sh_b"))
    cand = (
        left.join(right, ["chunk_id", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


# --- n-gram Jaccard (exact, blocked) --------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: list[str] | None = None,
    *,
    shingle_n: int = 3,
    threshold: float = 0.5,
    round_to: int | None = 4,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs within blocks.

    ``block_cols`` keys the self-join (at scale: LSH buckets or cheap keys
    like (lang, length-bucket)); without blocking this is a cross join —
    only for small candidate sets.
    """
    sh = df.select(
        *(block_cols or []),
        F.col(id_col).alias("__id"),
        word_ngrams(F.col(text_col), shingle_n).alias("__sh"),
    )
    join_keys = block_cols or []
    left = sh.select(*join_keys, F.col("__id").alias("id_a"), F.col("__sh").alias("sh_a"))
    right = sh.select(*join_keys, F.col("__id").alias("id_b"), F.col("__sh").alias("sh_b"))
    cand = (
        left.join(right, join_keys) if join_keys else left.crossJoin(right)
    ).filter(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.when(union == 0, F.lit(0.0)).otherwise(inter.cast("double") / union)
    jac = F.round(jac, round_to) if round_to is not None else jac
    return (
        cand.select(*join_keys, "id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
