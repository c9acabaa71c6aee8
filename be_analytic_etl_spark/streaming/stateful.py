"""Arbitrary stateful streaming: per-key state machines over a stream.

The reference is strictly batch (SURVEY.md §2.7), so this is an engine
extension: live per-entity aggregates a training-data/metrics pipeline
maintains off an event firehose. Two operators, each with two
implementations behind one front door:

- **transformWithState** (Spark 4's typed-state API, the successor to
  ``applyInPandasWithState``): named state slots (ValueState/ListState/
  MapState) map to separate RocksDB column families, TTL is native
  per-slot, and per-key timers exist. This is the at-scale path — but its
  Python<->JVM state protocol rides on ``protobuf``, which this sandbox
  lacks (no pip). Capability-gated via ``HAS_TWS_PROTO``.
- **applyInPandasWithState** fallback with identical semantics — runs
  everywhere PySpark does. Tests pin the fallback's cross-batch
  behavior; the TWS twins run where protobuf exists (skip-marked test).

Both are Arrow-batched (pandas in/out): the Python boundary is per
key-batch, never per row. State per key is O(1) (a counter pair, a
capped leaderboard) — 1e9 live keys is tens of GB across the cluster's
state stores, shardable and bounded, where the batch-window equivalent
would re-shuffle all history every run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

try:  # TWS state protocol needs protobuf at runtime (sandbox lacks it)
    from pyspark.sql.streaming.proto import StateMessage_pb2  # noqa: F401

    HAS_TWS_PROTO = True
except ImportError:
    HAS_TWS_PROTO = False

from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

RUNNING_TOTALS_SCHEMA = "user_id long, n_events long, sum_value double"
TOPK_SCHEMA = "user_id long, n_seen long, rank int, event_id long, value double"


def _fold_topk(pairs, pdf, k):
    """Fold a batch's top-k (value desc, event_id asc) into a leaderboard.

    Explicit two-key sort, not nlargest: nlargest keeps ties by arrival
    order, which would diverge from the batch twin's (value desc,
    event_id asc) row_number whenever ties cross the k boundary.
    """
    batch_top = pdf.sort_values(
        ["value", "event_id"], ascending=[False, True]
    ).head(k)
    pairs.extend(
        zip(
            (float(v) for v in batch_top["value"]),
            (int(i) for i in batch_top["event_id"]),
        )
    )
    pairs.sort(key=lambda p: (-p[0], p[1]))
    return pairs[:k]


class RunningTotalsProcessor(StatefulProcessor):
    """transformWithState processor: per-key running (count, sum).

    State: one ValueState row ``n long, s double`` per key (optionally
    TTL'd so idle keys age out of the store). The per-batch reduction
    happens in pandas BEFORE touching state, so state I/O is O(1) per key
    per batch regardless of batch size.
    """

    def __init__(self, ttl_ms: int | None = None) -> None:
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", "n long, s double", self._ttl_ms)

    def handleInputRows(self, key, rows, timerValues):  # noqa: N802 (API name)
        import pandas as pd

        n, s = 0, 0.0
        for pdf in rows:
            if len(pdf):
                n += int(len(pdf))
                s += float(pdf["value"].sum())
        if n == 0:
            return
        if self._totals.exists():
            prev_n, prev_s = self._totals.get()
            n, s = n + int(prev_n), s + float(prev_s)
        self._totals.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 6)]}
        )

    def close(self) -> None:
        pass


class TopKPerKeyProcessor(StatefulProcessor):
    """transformWithState processor: per-key top-k (by value) across batches.

    State: ONE ValueState holding the current top-k arrays — k is small
    and fixed, so one value row beats a ListState the store would have to
    append/scan (ListState is the right slot when the collection is
    unbounded; a capped leaderboard is not). Each batch folds only its
    own top-k into the leaderboard instead of re-ranking history.
    """

    def __init__(self, k: int = 3) -> None:
        self._k = k

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._top = handle.getValueState(
            "topk", "vals array<double>, ids array<long>, n_seen long"
        )

    def handleInputRows(self, key, rows, timerValues):  # noqa: N802
        import pandas as pd

        pairs: list[tuple[float, int]] = []
        n_seen = 0
        if self._top.exists():
            vals, ids, n_seen = self._top.get()
            pairs = list(zip([float(v) for v in vals], [int(i) for i in ids]))
            n_seen = int(n_seen)
        n_new = 0
        for pdf in rows:
            if len(pdf):
                n_new += int(len(pdf))
                pairs = _fold_topk(pairs, pdf, self._k)
        if n_new == 0:
            return
        n_seen += n_new
        self._top.update(([p[0] for p in pairs], [p[1] for p in pairs], n_seen))
        yield _leaderboard_pdf(key[0], n_seen, pairs)

    def close(self) -> None:
        pass


def _leaderboard_pdf(uid, n_seen, pairs):
    import pandas as pd

    # n_seen is strictly monotone per key: the row set with the key's max
    # n_seen IS its final leaderboard (lets a test — or an idempotent
    # sink upsert — pick the latest emission).
    return pd.DataFrame(
        {
            "user_id": [uid] * len(pairs),
            "n_seen": [n_seen] * len(pairs),
            "rank": list(range(1, len(pairs) + 1)),
            "event_id": [p[1] for p in pairs],
            "value": [p[0] for p in pairs],
        }
    )


def stream_running_totals(
    events: DataFrame, ttl_ms: int | None = None, api: str = "auto"
) -> DataFrame:
    """Maintain live per-user (count, sum) over an event stream.

    Update output mode: each micro-batch emits the new cumulative row for
    every key it touched (keys without new events emit nothing — no
    per-key scan of the state store per batch). The streaming twin of
    ``SELECT user_id, COUNT(*), SUM(value) ... GROUP BY user_id`` over
    the stream's prefix.

    ``api``: "tws" | "apiws" | "auto" (tws when protobuf is available).
    """
    if api == "tws" or (api == "auto" and HAS_TWS_PROTO):
        return events.groupBy("user_id").transformWithStateInPandas(
            RunningTotalsProcessor(ttl_ms),
            outputStructType=RUNNING_TOTALS_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )

    def fold(key, pdfs, state):
        import pandas as pd

        n, s = 0, 0.0
        for pdf in pdfs:
            if len(pdf):
                n += int(len(pdf))
                s += float(pdf["value"].sum())
        if n == 0:
            return
        if state.exists:
            prev_n, prev_s = state.get
            n, s = n + int(prev_n), s + float(prev_s)
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 6)]}
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType="n long, s double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_topk_per_user(events: DataFrame, k: int = 3, api: str = "auto") -> DataFrame:
    """Live per-user top-k leaderboard over an event stream.

    Update mode re-emits a key's full (tiny) leaderboard whenever it
    changes; state per key is exactly k (value, id) pairs plus a seen
    counter.
    """
    if api == "tws" or (api == "auto" and HAS_TWS_PROTO):
        return events.groupBy("user_id").transformWithStateInPandas(
            TopKPerKeyProcessor(k),
            outputStructType=TOPK_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )

    def fold(key, pdfs, state):
        pairs: list[tuple[float, int]] = []
        n_seen = 0
        if state.exists:
            vals, ids, n_seen = state.get
            pairs = list(zip([float(v) for v in vals], [int(i) for i in ids]))
            n_seen = int(n_seen)
        n_new = 0
        for pdf in pdfs:
            if len(pdf):
                n_new += int(len(pdf))
                pairs = _fold_topk(pairs, pdf, k)
        if n_new == 0:
            return
        n_seen += n_new
        state.update(([p[0] for p in pairs], [p[1] for p in pairs], n_seen))
        yield _leaderboard_pdf(key[0], n_seen, pairs)

    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=TOPK_SCHEMA,
        stateStructType="vals array<double>, ids array<long>, n_seen long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HH_SCHEMA = "shard int, item string, count_lb long, shard_n long"


def _mg_fold(counts: dict, vc, k: int) -> dict:
    """Merge a batch's exact value_counts into an MG summary of size <= k,
    in vocabulary slices of <= k items (add a slice's counts; subtract
    the (k+1)-th largest; keep positives — each slice's exact counts
    are a trivial MG summary, so every step is the mergeable-summaries
    reduce, same rule as the batch ``sketches.misra_gries_candidates``).
    Slicing keeps the live dict at <= 2k counters regardless of the
    batch's vocabulary size."""
    items = vc.index.to_list()
    cs = vc.to_list()
    for start in range(0, len(items), k):
        for item, c in zip(items[start : start + k], cs[start : start + k]):
            counts[item] = counts.get(item, 0) + int(c)
        if len(counts) > k:
            kth = sorted(counts.values(), reverse=True)[k]
            counts = {i: c - kth for i, c in counts.items() if c > kth}
    return counts


def stream_heavy_hitter_candidates(
    items: DataFrame, k: int = 16, n_shards: int = 8
) -> DataFrame:
    """Live heavy-hitter candidate tracking over an item stream — the
    streaming twin of ``sketches.heavy_hitters_exact``'s phase 1.

    Items shard by their portable hash (``pmod(hash, n_shards)``), so a
    given item's rows all land in ONE shard: an MG summary with k
    counters per shard retains every item whose GLOBAL count exceeds
    n/k (count > n/k >= n_shard/k, and per-shard MG never evicts an
    item with count > n_shard/k). Global state is exactly
    n_shards x k counters — constant, like the batch phase's
    per-partition state. Update mode re-emits a shard's (tiny)
    candidate table whenever it changes; ``count_lb`` is the MG lower
    bound (undercounts by at most n_shard/k). The exact-recount phase
    stays batch (or a second keyed stream over the candidate set).
    """
    import pandas as pd

    from be_analytic_etl_spark.operators.textstats import portable_hash60
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fold(key, pdfs, state):
        counts: dict = {}
        n = 0
        if state.exists:
            its, cs, n = state.get
            counts = dict(zip(list(its), [int(c) for c in cs]))
            n = int(n)
        n_new = 0
        for pdf in pdfs:
            if len(pdf):
                n_new += int(len(pdf))
                counts = _mg_fold(counts, pdf["item"].value_counts(), k)
        if n_new == 0:
            return
        n += n_new
        state.update((list(counts.keys()), list(counts.values()), n))
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(counts),
                "item": list(counts.keys()),
                "count_lb": list(counts.values()),
                "shard_n": [n] * len(counts),
            }
        )

    sharded = items.select(
        F.pmod(portable_hash60(F.col("item").cast("string")), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
        F.col("item").cast("string").alias("item"),
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        fold,
        outputStructType=HH_SCHEMA,
        stateStructType="items array<string>, counts array<long>, n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class UserGapsProcessor(StatefulProcessor):
    """transformWithState twin of ``jobs.stream_user_gaps``'s fallback:
    per-user consecutive event gaps with ONE ValueState long (the last
    event's microsecond timestamp). Same ordering contract as the
    fallback (per-user feed non-decreasing in (us, event_id) across
    batches; in-batch rows sorted before folding); emits one gap row
    per arriving event after the first.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._last = handle.getValueState("last_us", "last_us long")

    def handleInputRows(self, key, rows, timerValues):  # noqa: N802 (API name)
        import pandas as pd

        frames = [pdf[["us", "event_id"]] for pdf in rows if len(pdf)]
        if not frames:
            return
        batch = pd.concat(frames).sort_values(["us", "event_id"])
        prev = None
        if self._last.exists():
            (prev,) = self._last.get()
            prev = int(prev)
        gaps: list[int] = []
        for u in batch["us"]:
            u = int(u)
            if prev is not None:
                gaps.append((u - prev) // 1_000_000)
            prev = u
        self._last.update((prev,))
        if gaps:
            yield pd.DataFrame(
                {"user_id": [key[0]] * len(gaps), "gap_s": gaps}
            )

    def close(self) -> None:
        pass
