from be_analytic_etl_spark.streaming.jobs import (
    read_events_stream,
    stream_attribution_join,
    stream_dedup_first,
    stream_daily_cents,
    stream_unit_hist,
    stream_dedup_within_watermark,
    stream_enrich,
    stream_eval_histogram,
    stream_kmins_sketch,
    stream_sessionize,
    stream_sliding_agg,
    stream_tumbling_agg,
)
from be_analytic_etl_spark.streaming.stateful import (
    stream_heavy_hitter_candidates,
    stream_running_totals,
    stream_topk_per_user,
)

__all__ = [
    "stream_eval_histogram",
    "stream_kmins_sketch",
    "stream_heavy_hitter_candidates",
    "stream_running_totals",
    "stream_topk_per_user",
    "read_events_stream",
    "stream_attribution_join",
    "stream_tumbling_agg",
    "stream_sliding_agg",
    "stream_sessionize",
    "stream_enrich",
    "stream_dedup_first",
    "stream_dedup_within_watermark",
    "stream_daily_cents",
    "stream_unit_hist",
]
