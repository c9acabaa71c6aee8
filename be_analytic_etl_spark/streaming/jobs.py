"""Structured Streaming jobs: the streaming twins of the batch event queries.

The reference is strictly batch (SURVEY.md §2.7 — one-shot
``python main.py``, ``/root/reference/Dockerfile:7``), so streaming is an
engine extension: the same event analytics (tumbling-window aggregation,
gap-based sessionization) expressed over an unbounded source with
watermark-driven late-data handling and state cleanup.

Design notes (scale):
- Watermarks bound state: the tumbling agg keeps only open windows newer
  than the watermark; session windows are merged and evicted on watermark
  advance. Without them state grows without bound on an unbounded stream.
- ``session_window`` is Spark's native gap-based session operator — the
  same semantics as the batch cumulative-flag formulation in
  ``queries_reference.q_sessionize`` (lag > gap starts a new session), but
  implemented with mergeable session state, so it scales to unbounded
  input. Equivalence of the two formulations is asserted in
  tests/test_streaming.py by running this pipeline on a bounded stream and
  comparing to the batch query.
- Output mode "append" + watermark means results are emitted exactly once
  per finalized window — the at-scale pattern for downstream sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def _events_schema(ts_type: str) -> str:
    return (
        f"event_id long, ts {ts_type}, user_id long, "
        "event_type string, value double, props string"
    )


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-based event stream (each parquet file is a micro-batch).

    File streams need an explicit schema, but the events table has shipped
    in two physical formats (INT64 TIMESTAMP(NANOS), which Spark 4 only
    reads as long under the nanosAsLong legacy conf, and plain
    TIMESTAMP(MICROS) with NTZ semantics) — so probe the static footer
    once (metadata-only batch read) and mirror exactly what the batch
    loader (sources/tables.py) produces, keeping stream and batch twins
    on identical timestamps.

    In production this would be a Kafka/Kinesis source; the transformation
    pipeline below is source-agnostic.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        ts_type = dict(spark.read.parquet(path).dtypes).get("ts", "timestamp")
    except Exception:
        # Watch directory may be empty at stream start (files arrive
        # later) — no footer to probe, so assume the modern layout.
        ts_type = "timestamp"
    if ts_type == "bigint":
        raw = (
            spark.readStream.schema(_events_schema("long"))
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path)
        )
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    raw = (
        spark.readStream.schema(_events_schema(ts_type))
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
    if ts_type == "timestamp_ntz":
        # Watermarks require TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
        # on NTZ); reinterpret in the session tz — UTC in this engine, so
        # wall-clock values are unchanged vs the batch twin.
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def stream_tumbling_agg(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregation per event_type.

    Streaming twin of ``queries_reference.q_tumbling_window`` (same
    decimal-exact sum). State per open window; closed windows emitted once
    (append mode) and evicted.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based sessionization with native session windows.

    Streaming twin of ``queries_reference.q_sessionize``: a session is a
    maximal run of a user's events with inter-event gaps <= ``gap``. Session
    state merges as events arrive and is finalized when the watermark passes
    session end + gap.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select("user_id", "n_events", "session_start", "session_end")
    )


def stream_sliding_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked SLIDING-window aggregation per event_type: each event
    lands in window/slide overlapping windows (Spark expands it once into
    its window set — no self-join). State per open window, bounded by the
    watermark; append mode emits each window exactly once on close.
    Batch twin: ``queries_reference.q_sliding_window`` (value-checked
    against DuckDB's explicit window-expansion formulation)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_enrich(events: DataFrame, dim: DataFrame, key: str = "user_id") -> DataFrame:
    """Stream-static enrichment join: every micro-batch joins against the
    (slowly-changing) static dimension — Spark re-plans the static side per
    batch, so a broadcast dim costs no stream-side shuffle and no state.
    The canonical shape for joining a 100 TB/day event stream with a user /
    document dimension table."""
    return events.join(F.broadcast(dim), key, "left")


def stream_dedup_first(
    events: DataFrame,
    key_col: str = "user_id",
    watermark: str = "2 hours",
    state_ttl_ms: int = 60 * 60 * 1000,
) -> DataFrame:
    """Streaming exact dedup: emit only the FIRST event per key.

    The custom-stateful-operator pattern (``applyInPandasWithState``) the
    built-in windows can't express: per-key state is a single "already
    emitted" flag; within a micro-batch the winner is min(ts, event_id),
    across batches first-seen wins — the dedup contract of a streaming
    training-data pipeline (keep the first copy of a document, drop later
    repeats).

    State is bounded: each key's flag is evicted by EVENT-TIME TIMEOUT once
    the watermark passes its timeout (``state_ttl_ms`` past the watermark at
    emit time). After eviction a very-late duplicate would re-emit — the
    standard watermark trade-off, same as late data beyond any watermark.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = f"{key_col} long, ts timestamp, event_id long, value double"

    def first_per_key(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        best = None
        for pdf in pdfs:
            if state.exists or pdf.empty:
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            cand = pdf.iloc[0]
            if best is None or (cand["ts"], cand["event_id"]) < (
                best["ts"],
                best["event_id"],
            ):
                best = cand
        if not state.exists and best is not None:
            state.update((True,))
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + state_ttl_ms)
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "ts": [best["ts"]],
                    "event_id": [best["event_id"]],
                    "value": [best["value"]],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            first_per_key,
            outputStructType=out_schema,
            stateStructType="seen boolean",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, timeout_sec: int = 120
) -> None:
    """Drive a bounded file stream to completion into an in-memory table
    (test/debug harness; production uses a real sink + checkpoint)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)


def stream_attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    watermark: str = "2 hours",
    horizon_minutes: int = 30,
) -> DataFrame:
    """Stream-stream inner join: each purchase attributed to the click(s)
    it followed within ``horizon_minutes``, per user.

    THE canonical two-unbounded-sides join. Both sides carry watermarks
    and the join condition time-bounds purchase_ts against click_ts, which
    is what lets Spark evict buffered click state once the watermark
    passes ``click_ts + horizon`` (without the bound, both sides' state
    grows forever). Append mode emits each matched pair exactly once.

    Batch twin: ``queries_reference.q_click_attribution`` (the same
    semantics through operators/rangejoin.py, DuckDB-oracled); bounded
    equivalence asserted in tests/test_streaming.py.
    """
    c = clicks.select(
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            < F.col("click_ts") + F.expr(f"INTERVAL {horizon_minutes} MINUTES")
        )
    )
    return c.join(p, cond, "inner").select(
        "user_id", "click_id", "click_ts", "purchase_id", "purchase_ts", "purchase_value"
    )


def stream_dedup_within_watermark(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("user_id", "event_type"),
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Built-in streaming dedup with bounded state
    (``dropDuplicatesWithinWatermark``): keeps one row per key and holds
    each key's dedup state only until the watermark passes — the zero-
    custom-code alternative to ``stream_dedup_first`` when "first copy
    wins" ordering doesn't matter, only at-most-once-per-key-per-window.

    State size is O(distinct keys within the watermark horizon), not
    O(all keys ever) — the property that lets a 100 TB/day stream dedup
    run forever. Duplicates separated by more than the watermark can both
    emit (the documented trade of any watermark-bounded operator).
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def stream_upsert_parquet(
    stream_df: DataFrame,
    path: str,
    keys: list[str],
    order_col: str = "ts",
    tiebreak_col: str = "event_id",
    checkpoint_dir: str | None = None,
):
    """CDC-apply: maintain an EVENT-TIME latest-row-per-key parquet table
    off a stream.

    The canonical ``foreachBatch`` pattern — the stream's exactly-once
    batch boundary plus an idempotent conditional merge gives an upsert
    sink without any sink-side dedup state:

    1. within the micro-batch, last-wins per key (``order_col`` desc,
       ``tiebreak_col`` desc — deterministic under replay);
    2. CONDITIONAL merge: union table + batch winners, keep the max by
       (order, tiebreak) per key. An unconditional MERGE (last BATCH
       wins) would let an out-of-order late arrival overwrite a newer
       stored row — the Delta equivalent is
       ``WHEN MATCHED AND s.ts > t.ts THEN UPDATE``. One window over
       |table| + |batch| rows, same shuffle cost as the join form;
    3. rewrite the table.

    The read-modify-overwrite here materializes the merge result
    (``localCheckpoint``) before overwriting the directory it was read
    from — the local-FS stand-in for what a transactional table format
    does natively; swap step 2-3 for the format's conditional MERGE on a
    real deployment and the stream code is unchanged. Batch replays
    after a crash re-apply the same rows; keep-max is idempotent, so the
    table converges.

    Returns the started StreamingQuery (caller awaits termination).
    """
    from pyspark.sql.window import Window

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        # __src breaks exact (order, tiebreak) ties in favor of the BATCH
        # row: a correction re-sent with identical keys but changed
        # payload must win deterministically on every replay, or the
        # table flips between old/new payload across recoveries.
        w = Window.partitionBy(*keys).orderBy(
            F.col(order_col).desc(),
            F.col(tiebreak_col).desc(),
            F.col("__src").desc(),
        )

        def keep_latest(df: DataFrame) -> DataFrame:
            return (
                df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn", "__src")
            )

        latest = keep_latest(batch.withColumn("__src", F.lit(1)))
        # Explicit existence probe, not try/except around the whole
        # read+merge: a blanket except would treat ANY transient read or
        # merge failure as "first batch" and overwrite the table with just
        # this batch's keys. Real failures must propagate so checkpoint
        # recovery retries the batch.
        jvm = spark.sparkContext._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        if fs.exists(hpath):
            prev = (
                spark.read.parquet(path)
                .select(*latest.columns)
                .withColumn("__src", F.lit(0))
            )
            merged = keep_latest(prev.unionByName(latest.withColumn("__src", F.lit(1))))
        else:
            merged = latest
        # Materialize BEFORE overwriting the input directory (reading and
        # overwriting the same path in one lazy plan would race itself).
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(path)

    writer = stream_df.writeStream.foreachBatch(apply_batch).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.trigger(availableNow=True).start()


def stream_eval_histogram(events: DataFrame, n_bins: int = 10) -> DataFrame:
    """Streaming twin of the evalstats reliability substrate
    (``operators/evalstats.calibration_bins`` / ``roc_auc``): maintain
    the bounded per-bin (n, conf_sum, pos) histogram incrementally as
    events arrive.

    Both batch estimators reduce the corpus to a bounded histogram and
    run the statistic on that control-plane frame — which is exactly
    the state a stream can keep: one unwatermarked global groupBy on
    the bin id, O(n_bins) state forever, emitted in complete mode.
    ECE / AUC reads are then a constant-size fold over the sink — the
    stream never holds a row of the corpus.

    The "score" here is the event value folded to [0, 1) by its
    fractional part and the label is the conversion-ish event type —
    the same (score, label) shape the batch query feeds.

    The fold is computed in exact DECIMAL(18,2) arithmetic, NOT on the
    raw double: cents at bin edges are not exactly representable as
    doubles (2.30 - floor(2.30) = 0.29999999999999982, which floors
    into bin 2 instead of the decimal convention's bin 3), so the
    double form would disagree with the batch evalstats exact-decimal
    binning on every x.10/x.20/... value. Casting to DECIMAL(18,2)
    first makes the subtraction, the *n_bins scale-up, and the floor
    all exact.
    """
    v2 = F.col("value").cast("decimal(18,2)")
    score = (v2 - F.floor(v2).cast("decimal(18,2)")).cast("decimal(18,6)")
    b = F.least(F.floor(score * n_bins).cast("int"), F.lit(n_bins - 1))
    pos = F.col("event_type").isin("purchase", "signup").cast("int")
    return (
        events.filter(F.col("value").isNotNull())
        .groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(score.cast("decimal(18,6)")).alias("conf_sum"),
            F.sum(pos).cast("long").alias("n_pos"),
        )
    )


def stream_kmins_sketch(events: DataFrame, k: int = 64) -> DataFrame:
    """Streaming twin of ``sketches.kmins_distinct``'s sketch phase:
    maintain the per-(event_type, slot) k-mins minima incrementally as
    events arrive.

    The batch sketch is ONE partial-aggregated min per (group, slot) —
    exactly the state a stream can keep: an unwatermarked global groupBy
    on a bounded key domain (|event types| x k rows, forever), emitted
    in complete mode. min() is the k-mins merge, so every micro-batch
    update IS the sketch merge; the cardinality read
    ((k-1) * p / sum(theta)) is a constant-size fold over the sink, and
    sketches from independent streams union by the same elementwise min.
    Hashes are the portable affine family, so the streamed state is
    bit-identical to the batch sketch on the same data.
    """
    from be_analytic_etl_spark.operators.dedup import portable_affine_params
    from be_analytic_etl_spark.operators.textstats import (
        PORTABLE_P,
        portable_base_hash,
    )

    params = portable_affine_params(k)
    parr = F.array(
        *[
            F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
            for a, b in params
        ]
    )
    base = portable_base_hash(F.col("user_id").cast("string"))
    slots = (
        events.filter(F.col("user_id").isNotNull())
        .select(F.col("event_type").alias("scope"), base.alias("__h"))
        .select(
            "scope",
            F.posexplode(
                F.transform(
                    parr,
                    lambda pr: (F.col("__h") * pr["a"] + pr["b"])
                    % PORTABLE_P,
                )
            ).alias("slot", "__hi"),
        )
    )
    return slots.groupBy("scope", "slot").agg(
        F.min("__hi").cast("long").alias("theta")
    )


def stream_daily_cents(events: DataFrame) -> DataFrame:
    """Streaming twin of the round-8 daily-cents substrate (the bounded
    frame behind CUSUM / Mann-Kendall / ACF / day-of-week seasonality):
    maintain per-day exact-cent totals incrementally.

    The batch diagnostics all collapse the corpus to (day, cents) in one
    partial-aggregated groupBy — which is exactly the state a stream can
    keep: an unwatermarked global groupBy on the CALENDAR-bounded day
    key, complete mode, exact BIGINT cents (the DECIMAL(18,2) fold, so
    bin-edge cents stay exact — same discipline as
    ``stream_eval_histogram``). Every statistic in the family is then a
    constant-size fold over the sink, identical to its batch form
    because the substrate is bit-identical.
    """
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    return (
        events.filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(cents).cast("long").alias("cents"))
    )


def stream_unit_hist(events: DataFrame) -> DataFrame:
    """Streaming twin of the robust-stats substrate (the bounded
    per-(event_type, whole-unit value) histogram behind the round-9
    median / MAD / 3-MAD outlier audit and operators/robust.py's
    trimmed/winsorized means): maintain the counts incrementally.

    The batch queries all collapse the corpus to (type, floor(value),
    count) in one partial-aggregated groupBy — exactly the state a
    stream can keep: an unwatermarked global groupBy on a value-domain-
    bounded key (|types| x |units| rows, fixed by the currency domain,
    independent of event count), complete mode. COUNT is the histogram
    merge, so micro-batch boundaries cannot change the state, and every
    rank statistic (two-middle-rank medians, MAD, trim boundaries,
    outlier rates) is a constant-size fold over the sink — identical to
    its batch form because the substrate is bit-identical.
    """
    unit = F.floor(F.col("value")).cast("long")
    return (
        events.filter(F.col("value").isNotNull())
        .groupBy(F.col("event_type").alias("scope"), unit.alias("unit"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def read_documents_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-based documents stream (each parquet file is a micro-batch)
    — the text-corpus counterpart of ``read_events_stream`` for
    streaming quality monitoring. File streams need an explicit schema;
    the documents table has a single stable physical layout, mirrored
    verbatim from the batch loader."""
    return (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_quality_bins(docs: DataFrame, n_bins: int = 10) -> DataFrame:
    """Streaming twin of the PSI drift substrate (queries_round8
    ``_psi_scored`` + the (source, bin) fold input): maintain
    per-(source, quality-score-decile) counts incrementally.

    The quality score is native map-only expressions, so it streams
    as-is; the state is an unwatermarked global groupBy on the
    |sources| x n_bins bounded grid, complete mode. COUNT is the
    histogram merge, so micro-batch boundaries cannot change the state,
    and the PSI read itself (``queries_round8.psi_from_binned`` —
    Laplace-smoothed grid fold) runs unchanged over the sink: the
    streamed scorecard is bit-identical to the batch drift gauge on the
    same data.
    """
    from be_analytic_etl_spark.functions.rounding import stable_round
    from be_analytic_etl_spark.operators import textstats as T

    q6 = (
        stable_round(T.quality_score("text", round_to=None), 6)
        .cast("decimal(18,6)")
        .alias("score")
    )
    b = F.least(
        F.floor(F.col("score") * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    return (
        docs.select("source", q6)
        .select("source", b.alias("bin"))
        .groupBy("source", "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def stream_lang_bins(docs: DataFrame, n_bins: int = 10) -> DataFrame:
    """Streaming twin of the Hellinger substrate (queries_round10
    ``q_ext_hellinger``'s cells frame): per-(lang, quality-score-decile)
    counts, incrementally maintained on the |langs| x n_bins bounded
    grid (complete mode, same discipline as ``stream_quality_bins``).
    COUNT is the histogram merge, so the streamed state is
    bit-identical to the batch cells frame and
    ``queries_round10.hellinger_from_cells`` runs unchanged over it."""
    from be_analytic_etl_spark.functions.rounding import stable_round
    from be_analytic_etl_spark.operators import textstats as T

    q6 = (
        stable_round(T.quality_score("text", round_to=None), 6)
        .cast("decimal(18,6)")
        .alias("score")
    )
    b = F.least(
        F.floor(F.col("score") * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    return (
        docs.select("lang", q6)
        .select("lang", b.alias("bin"))
        .groupBy("lang", "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def stream_pii_counts(docs: DataFrame) -> DataFrame:
    """Streaming twin of the PII-audit substrate (queries_round8
    ``ext_pii_audit``): maintain per-source document / PII-document /
    email / long-digit-run counts incrementally — streaming privacy
    monitoring over an arriving corpus.

    The regexp feature extraction is map-only and uses the SAME shared
    ``textstats.REDACT_PATTERNS`` the batch audit and the scrubber use
    (the three surfaces can never drift); the state is an unwatermarked
    global groupBy on the |sources|-bounded key, complete mode. SUM and
    COUNT are the merge, so micro-batch boundaries cannot change the
    state, and the per-source incidence rates are one-division folds
    over the sink — bit-identical to the batch audit on the same data
    (including the audit's deterministic doc_id-salted PII seeds, so
    the pin test compares substrate to substrate exactly).
    """
    from be_analytic_etl_spark.operators import textstats as T

    email_pat, num_pat = T.REDACT_PATTERNS[0][0], T.REDACT_PATTERNS[1][0]
    salt = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.lit(" reach u"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example or 555"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 7, "0"),
        ),
    ).otherwise(F.lit(""))
    t = F.concat(F.coalesce(F.col("text"), F.lit("")), salt)
    emails = F.size(F.regexp_extract_all(t, F.lit(email_pat), F.lit(0)))
    nums = F.size(F.regexp_extract_all(t, F.lit(num_pat), F.lit(0)))
    per_doc = docs.select(
        "source",
        emails.cast("long").alias("__e"),
        nums.cast("long").alias("__m"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(((F.col("__e") + F.col("__m")) > 0).cast("int"))
        .cast("long")
        .alias("pii_docs"),
        F.sum("__e").cast("long").alias("n_emails"),
        F.sum("__m").cast("long").alias("n_numbers"),
    )


def stream_user_day(events: DataFrame) -> DataFrame:
    """Streaming twin of the growth-accounting substrate
    (queries_round10c ``ext_growth_accounting``'s distinct (user, day)
    frame): maintain per-(user, day) presence incrementally.

    The batch decomposition collapses events to DISTINCT (user_id, day)
    and everything else — LAG/LEAD per user, the daily new/retained/
    resurrected/churned counts, the full-outer churn attribution — is a
    fold over that frame. Presence is exactly what a stream can keep:
    an unwatermarked global groupBy on (user_id, day), complete mode;
    COUNT-as-presence is the merge, so micro-batch boundaries cannot
    change the state, and ``growth_accounting_from_ud`` runs UNCHANGED
    over the sink — bit-identical to batch because the substrate is.
    State is |users| x |active days| rows — the same cardinality the
    batch shuffle materializes.
    """
    return (
        events.filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def stream_funnel_events(events: DataFrame) -> DataFrame:
    """Streaming twin of the funnel substrate (queries_round10b
    ``ext_funnel``): maintain the distinct (user_id, event_type, ts)
    step-event multiset incrementally, pruned to the three funnel step
    types.

    The funnel's 7-day window re-anchors on the user's EARLIEST view:
    a late-arriving earlier view moves the window and can resurrect a
    click that was previously outside it, so NO fixed-size per-user
    summary (first-touch times, per-day minima) reproduces the batch
    semantics — the exact step-event times are the minimal sufficient
    state, and keeping them as an unwatermarked (user, type, ts)
    groupBy (complete mode, COUNT as multiplicity) is precisely the
    streaming-distinct shape. ``funnel_from_events`` then runs
    UNCHANGED over the sink (multiplicity is irrelevant to MIN folds),
    bit-identical to batch. State is bounded by the distinct step-event
    count — the same rows the batch scan feeds the three conditional-
    min aggregations.
    """
    from be_analytic_etl_spark.queries_round10b import _FUNNEL_STEPS

    return (
        events.filter(
            F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("event_type").isin(*_FUNNEL_STEPS)
        )
        .groupBy("user_id", "event_type", "ts")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


GAPS_SCHEMA = "user_id long, gap_s long"


def stream_user_gaps(events: DataFrame, api: str = "auto") -> DataFrame:
    """Streaming twin of the inter-arrival substrate (queries_round11b
    ``ext_inter_arrival``): per-user consecutive event gaps via
    ``applyInPandasWithState``.

    State per user is ONE long — the last seen event's microsecond
    timestamp — so live state is O(users), not O(events) (the batch
    LAG shuffles every event; the stream never re-touches history).
    Each arriving event appends exactly one gap row (its distance to
    the previous event), and ``inter_arrival_hist_from_gaps`` runs
    UNCHANGED over the append sink, bit-identical to batch because the
    gap multiset is.

    Ordering contract: the per-user feed must be non-decreasing in
    (ts, event_id) ACROSS micro-batches (the replay / append-only-log
    shape every event-time state machine assumes); within a batch rows
    are sorted before folding, so any batch slicing of an ordered feed
    yields the same gaps — pinned against the batch readout in
    tests/test_streaming.py. An out-of-order production feed needs the
    watermark + re-sort front end first (stream_dedup_within_watermark's
    discipline); the gap fold itself is deliberately kept exact.

    ``api``: "tws" | "apiws" | "auto" — the transformWithState twin
    (stateful.UserGapsProcessor) runs where protobuf exists, same
    semantics (the stateful module's two-API front-door discipline).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from be_analytic_etl_spark.streaming.stateful import (
        HAS_TWS_PROTO,
        UserGapsProcessor,
    )

    def fold(key, pdfs, state):
        import pandas as pd

        frames = [pdf[["us", "event_id"]] for pdf in pdfs if len(pdf)]
        if not frames:
            return
        batch = pd.concat(frames).sort_values(["us", "event_id"])
        prev = None
        if state.exists:
            (prev,) = state.get
            prev = int(prev)
        gaps: list[int] = []
        for u in batch["us"]:
            u = int(u)
            if prev is not None:
                # `DIV 1000000` twin: non-negative by the ordering
                # contract, so floor == truncate
                gaps.append((u - prev) // 1_000_000)
            prev = u
        state.update((prev,))
        if gaps:
            yield pd.DataFrame(
                {"user_id": [key[0]] * len(gaps), "gap_s": gaps}
            )

    prepped = events.filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    ).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
    )
    if api == "tws" or (api == "auto" and HAS_TWS_PROTO):
        return prepped.groupBy("user_id").transformWithStateInPandas(
            UserGapsProcessor(),
            outputStructType=GAPS_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )
    return prepped.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=GAPS_SCHEMA,
        stateStructType="last_us long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
