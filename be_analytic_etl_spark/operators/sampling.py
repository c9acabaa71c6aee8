"""Deterministic hash-based sampling and dataset splits.

The standard discipline for training-data pipelines: assign every record a
bucket from a keyed content hash, then derive samples and train/val/test
splits from bucket ranges. Unlike ``df.sample()`` / ``rand()`` (seeded per
task attempt — speculative execution or a retried stage can change the
sample), a key hash is a pure map-only column expression that is stable
across runs, retries, cluster sizes, AND engines — re-sharding 100 TB
never moves a document between splits, which is what prevents train/test
leakage over pipeline re-runs.

Hashing uses the engine's portable md5-head hash (same base as minhash /
simhash) so the assignment is replicable bit-for-bit by a SQL oracle;
salts give independent bucketings from the same key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from be_analytic_etl_spark.operators.textstats import portable_hash60

#: Bucket space for all sampling/split assignments (fraction resolution 1e-4).
SPLIT_BUCKETS = 10_000


def hash_bucket(col: Column | str, salt: str = "") -> Column:
    """Deterministic bucket in [0, SPLIT_BUCKETS) from a key column.

    DuckDB twin: ``CAST('0x' || substr(md5(CAST(key AS VARCHAR) || '|salt'),
    1, 15) AS BIGINT) % 10000``.
    """
    c = F.col(col) if isinstance(col, str) else col
    keyed = F.concat(c.cast("string"), F.lit(f"|{salt}"))
    return portable_hash60(keyed) % F.lit(SPLIT_BUCKETS)


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep ~``fraction`` of rows by key-hash threshold (map-only filter —
    pushes into the scan, no shuffle, stable under re-runs)."""
    threshold = int(round(fraction * SPLIT_BUCKETS))
    return df.filter(hash_bucket(key_col, salt) < threshold)


def assign_split(
    col: Column | str,
    splits: list[tuple[str, float]] | None = None,
    salt: str = "split",
) -> Column:
    """Split label ('train'/'val'/'test' by default) from cumulative
    bucket-range thresholds; weights must sum to 1.0."""
    splits = splits or [("train", 0.9), ("val", 0.05), ("test", 0.05)]
    total = sum(w for _, w in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1.0, got {total}")
    b = hash_bucket(col, salt)
    expr = None
    acc = 0.0
    for name, w in splits[:-1]:
        acc += w
        cond = b < int(round(acc * SPLIT_BUCKETS))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(splits[-1][0])
    return last if expr is None else expr.otherwise(last)


#: Denominator mapping the 60-bit hash to u in (0, 1): 2^60 + 1.
_U_DENOM = 1_152_921_504_606_846_977.0


def es_sample_key(key: Column | str, weight: Column | str, salt: str = "wsample") -> Column:
    """Efraimidis–Spirakis weighted-sampling key: ``u^(1/w)`` with
    ``u = (hash60(key|salt) + 1) / (2^60 + 1)`` — taking the top-k by this
    key draws a weighted random sample without replacement (Efraimidis &
    Spirakis, "Weighted random sampling with a reservoir", IPL 2006),
    deterministic across runs, retries, and engines (same md5-derived u).

    A distributed one-pass weighted reservoir: per-partition top-k heaps
    merge associatively (TakeOrdered / window top-k), so no global sort
    and no driver-side state beyond k rows per stratum.
    """
    k = F.col(key) if isinstance(key, str) else key
    w = F.col(weight) if isinstance(weight, str) else weight
    keyed = F.concat(k.cast("string"), F.lit(f"|{salt}"))
    u = (portable_hash60(keyed) + F.lit(1)).cast("double") / F.lit(_U_DENOM)
    return F.pow(u, F.lit(1.0) / w.cast("double"))


def weighted_sample_topk(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    strata: list[str] | None = None,
    salt: str = "wsample",
) -> DataFrame:
    """Weighted sample of ``k`` rows (per stratum if ``strata`` given).
    Rows with non-positive weight are excluded. Ties broken by key for
    full determinism."""
    from pyspark.sql import Window

    es = es_sample_key(key_col, weight_col, salt).alias("__es")
    base = df.filter(F.col(weight_col) > 0).select("*", es)
    if strata:
        w = Window.partitionBy(*strata).orderBy(F.col("__es").desc(), F.col(key_col))
        return (
            base.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__es", "__rn")
        )
    return base.orderBy(F.col("__es").desc(), F.col(key_col)).limit(k).drop("__es")


def stratified_sample_exact(
    df: DataFrame,
    strata: list[str],
    fraction: float,
    key_col: str,
    salt: str = "strat",
) -> DataFrame:
    """Exact-count stratified sample: ``ceil(fraction * n_g)`` rows from
    every stratum ``g``, chosen by ranking the portable key hash inside the
    stratum (deterministic across runs, retries, and engines — the same
    discipline as ``deterministic_sample``, but with a per-stratum count
    guarantee that a plain hash threshold only hits in expectation).

    DuckDB twin: rank with ``ROW_NUMBER() OVER (PARTITION BY strata ORDER
    BY md5-head-hash, key)`` against ``CEIL(fraction * COUNT(*) OVER
    (PARTITION BY strata))``.

    Scale: ONE shuffle on the strata columns (rank and per-stratum count
    share the same window partitioning → one Exchange). Low-cardinality
    strata put each stratum on one task; for heavy skew, pre-aggregate the
    per-stratum counts (tiny) and broadcast them, then rank inside salted
    sub-buckets and take per-bucket quotas — same output, bounded tasks.
    """
    from pyspark.sql import Window

    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    h = portable_hash60(
        F.concat(F.col(key_col).cast("string"), F.lit(f"|{salt}"))
    )
    w = Window.partitionBy(*strata)
    rank = F.row_number().over(w.orderBy(h, F.col(key_col)))
    quota = F.ceil(F.lit(fraction) * F.count(F.lit(1)).over(w))
    return (
        df.withColumn("__rk", rank)
        .withColumn("__q", quota)
        .filter(F.col("__rk") <= F.col("__q"))
        .drop("__rk", "__q")
    )


def pack_shards(
    df: DataFrame,
    *,
    key_col: str = "doc_id",
    size_col: str = "n_tokens",
    token_budget: int = 4096,
    n_buckets: int = 8,
    salt: str = "pack",
) -> DataFrame:
    """Token-budget shard assignment — the "pack documents into ~B-token
    training shards" step of an LLM data pipeline, deterministic across
    runs/retries/engines.

    Documents are hash-scattered into ``n_buckets`` independent packing
    streams (so packing parallelizes — one global stream would serialize
    the cumulative sum), ordered inside each bucket by (key hash, key),
    and assigned shard = floor(start_offset / token_budget) where
    start_offset is the running token total before the document. A
    document straddling a boundary counts toward the shard it starts in —
    contiguous streaming packing, the standard approximation (exact
    bin-packing is NP-hard and order-unstable).

    Returns per-document (key, bucket, shard, n_tokens). Scale: ONE
    shuffle on bucket (the window partitioning); per-bucket state is a
    running sum. More buckets = more parallelism and slightly more
    under-filled tail shards (one per bucket).
    """
    from pyspark.sql import Window

    from be_analytic_etl_spark.operators.textstats import portable_hash60

    key = F.col(key_col)
    h = portable_hash60(F.concat(key.cast("string"), F.lit(f"|{salt}")))
    base = df.select(
        key, F.col(size_col), h.alias("__h"), (h % n_buckets).alias("bucket")
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("__h", key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum(size_col).over(w) - F.col(size_col)
    return base.select(
        key_col,
        "bucket",
        F.floor(start / token_budget).cast("int").alias("shard"),
        F.col(size_col),
    )


def pack_sequences(
    df: DataFrame,
    *,
    key_col: str = "doc_id",
    size_col: str = "n_tokens",
    seq_len: int = 512,
    n_buckets: int = 8,
    salt: str = "seqpack",
) -> DataFrame:
    """Concat-and-chunk sequence packing — the GPT/T5 pretraining step
    that concatenates documents in a deterministic order and chops the
    stream into fixed ``seq_len``-token training examples, documents
    SPLITTING across example boundaries (unlike ``pack_shards``, which
    assigns whole documents to ~budget-sized shards).

    Emits one row per (document, example) overlap: ``(key, bucket,
    example_idx, doc_offset, example_offset, n_seg_tokens)`` — enough for
    a writer to materialize example tensors by slicing each document's
    tokens [doc_offset, doc_offset + n_seg_tokens) into the example at
    example_offset. Example identity is (bucket, example_idx).

    Determinism + scale: documents hash-scatter into ``n_buckets``
    independent packing streams (a single global stream would serialize
    the cumulative sum) and order by (key hash, key) inside the bucket —
    the ``pack_shards`` discipline. ONE shuffle on bucket; the boundary
    fan-out is a map-side explode of at most ceil(doc_len/seq_len)+1
    rows. All arithmetic is exact integer (``div``, not double floor
    division — stream offsets exceed 2^53 long before 100 TB does).
    Zero-token documents are excluded (they occupy no stream positions).
    """
    from pyspark.sql import Window

    from be_analytic_etl_spark.operators.textstats import portable_hash60

    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    key = F.col(key_col)
    h = portable_hash60(F.concat(key.cast("string"), F.lit(f"|{salt}")))
    base = df.filter(F.col(size_col) > 0).select(
        key, F.col(size_col), h.alias("__h"), (h % n_buckets).alias("bucket")
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("__h", key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(size_col).over(w).cast("long") - F.col(size_col)).alias(
        "__start"
    )
    staged = base.select(key_col, "bucket", size_col, start)
    first_ex = F.expr(f"__start div {seq_len}")
    last_ex = F.expr(f"(__start + {size_col} - 1) div {seq_len}")
    exploded = staged.withColumn(
        "example_idx", F.explode(F.sequence(first_ex, last_ex))
    )
    ex_start = F.col("example_idx") * seq_len  # stream offset of the example
    seg_start = F.greatest(ex_start - F.col("__start"), F.lit(0).cast("long"))
    seg_end = F.least(
        ex_start + seq_len - F.col("__start"), F.col(size_col).cast("long")
    )
    example_offset = F.greatest(F.col("__start") - ex_start, F.lit(0).cast("long"))
    return exploded.select(
        key_col,
        "bucket",
        F.col("example_idx").cast("long").alias("example_idx"),
        seg_start.cast("int").alias("doc_offset"),
        example_offset.cast("int").alias("example_offset"),
        (seg_end - seg_start).cast("int").alias("n_seg_tokens"),
    )


def mixture_plan(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float],
    cost_col: str,
    budget_fraction: float,
) -> DataFrame:
    """Per-group keep-fraction plan for *mixture sampling*: downsample each
    group (language / source / domain) so the kept corpus approaches
    ``budget_fraction`` of the total cost (tokens / chars / bytes) split
    across groups by the target ``weights`` — the Pile/Dolma-style recipe
    where a training mix is specified as proportions, not row counts.

    ``frac(g) = min(1, (budget_fraction * total_cost) * w(g) / cost(g))``
    — a group below its target allotment is kept whole (frac capped at 1;
    the shortfall is NOT redistributed, matching fixed-weight mixtures).

    Returns one row per group: ``(group, group_cost, target_frac,
    threshold)`` where ``threshold`` is the ``hash_bucket`` cutoff. The
    plan is k-groups sized (control plane); at 100 TB it is an aggregate of
    the fact table joined back by broadcast — no collect, no shuffle of
    the fact side beyond one partial-agg pass.
    """
    w_expr = None
    for name, w in weights.items():
        cond = F.col(group_col) == name
        w_expr = F.when(cond, F.lit(w)) if w_expr is None else w_expr.when(cond, F.lit(w))
    w_expr = w_expr.otherwise(F.lit(0.0))

    per = df.groupBy(group_col).agg(F.sum(cost_col).alias("group_cost"))
    tot = df.agg(F.sum(cost_col).alias("__total_cost"))
    frac = F.least(
        F.lit(1.0),
        ((F.lit(budget_fraction) * F.col("__total_cost")) * w_expr)
        / F.col("group_cost"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .withColumn("target_frac", frac)
        .withColumn(
            "threshold", F.floor(F.col("target_frac") * SPLIT_BUCKETS).cast("long")
        )
        .drop("__total_cost")
    )


def mixture_sample(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float],
    cost_col: str,
    budget_fraction: float,
    key_col: str,
    salt: str = "mix",
) -> DataFrame:
    """Apply a ``mixture_plan``: keep a row when its key-hash bucket falls
    under its group's threshold. Deterministic (same hash discipline as
    ``deterministic_sample`` — re-runs and retries never move a document in
    or out of the mix), and map-only on the fact side after a broadcast
    join of the k-row plan."""
    plan = mixture_plan(df, group_col, weights, cost_col, budget_fraction)
    return (
        df.join(F.broadcast(plan), group_col)
        .filter(hash_bucket(key_col, salt) < F.col("threshold"))
    )


def token_budget_sample(
    df: DataFrame,
    *,
    group_col: str,
    rank_col: str,
    cost_col: str,
    id_col: str,
    budget: int,
) -> DataFrame:
    """Greedy per-group budgeted selection: rank rows inside each group
    by ``rank_col`` desc (ties by ``id_col``), keep a row while the
    cumulative cost of the rows BEFORE it is under ``budget`` — the
    "best docs until the token budget fills" recipe for assembling a
    fixed-size training slice per source/domain. The boundary row may
    overshoot the budget (deterministic fill-then-stop convention; an
    exact-knapsack cut would make selection depend on lookahead).

    Adds ``sel_rank`` (1-based rank within the group) and ``cum_cost``
    (inclusive running cost). Callers pass an engine-stable ``rank_col``
    (integer, decimal, or a ``stable_round``-ed double) so the ordering
    replays identically in the SQL oracle.

    Scale: ONE shuffle on ``group_col`` — the rank and the exclusive
    prefix sum share the same window partitioning, so Catalyst plans a
    single Exchange + WindowExec; the filter is map-side after it. For
    very hot groups, pre-aggregate per-(group, rank-band) costs to skip
    whole bands before the row-level window.
    """
    from pyspark.sql import Window

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    clobbered = {"sel_rank", "cum_cost", "__prior"} & set(df.columns)
    if clobbered:
        # same contract as topk_per_group's 'rank' guard: never silently
        # overwrite a caller's column
        raise ValueError(
            f"token_budget_sample would overwrite existing column(s) "
            f"{sorted(clobbered)}; rename them first"
        )
    w = Window.partitionBy(group_col).orderBy(
        F.col(rank_col).desc(), F.col(id_col)
    )
    prior = F.coalesce(
        F.sum(cost_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    ).cast("long")
    return (
        df.withColumn("sel_rank", F.row_number().over(w))
        .withColumn("__prior", prior)
        .filter(F.col("__prior") < budget)
        .withColumn(
            "cum_cost", (F.col("__prior") + F.col(cost_col)).cast("long")
        )
        .drop("__prior")
    )


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    id_col: str,
    k: int,
    salt_n: int = 8,
) -> DataFrame:
    """Skew-proof EXACT per-group top-k (largest ``order_col``, ties by
    ``id_col``): phase 1 takes the top-k within (group, salt) sub-buckets
    — so even a power-law hot group never concentrates on one task and
    per-task window state is bounded — phase 2 re-ranks the <= k*salt_n
    survivors per group. Exact because any global top-k row is
    necessarily top-k within whichever sub-bucket holds it; the result
    is therefore invariant to the salt assignment (xxhash64, the cheap
    non-portable path — no oracle ever needs to replay it).

    The plain single-window top-k is the right plan when no group is
    hot; this is the explicit skew fix, same spirit as
    ``skew.salted_join``. Adds ``rank`` (1-based). ``id_col`` values
    must be unique within each group — (order_col desc, id_col) is the
    total order both phases (and any oracle) rank by; duplicate ids
    with equal order values would make the surviving payload rows
    arbitrary.
    """
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if salt_n <= 0:
        raise ValueError(f"salt_n must be positive, got {salt_n}")
    if "rank" in df.columns:
        raise ValueError("input already has a 'rank' column — rename it")
    orig = list(df.columns)
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_n))
    w1 = Window.partitionBy(*group_cols, "__salt").orderBy(
        F.col(order_col).desc(), F.col(id_col)
    )
    w2 = Window.partitionBy(*group_cols).orderBy(
        F.col(order_col).desc(), F.col(id_col)
    )
    return (
        df.select(*orig, salt.alias("__salt"))
        .select(*orig, "__salt", F.row_number().over(w1).alias("__r1"))
        .filter(F.col("__r1") <= k)
        .select(*orig, F.row_number().over(w2).alias("rank"))
        .filter(F.col("rank") <= k)
    )
