from .ops import (
    daily_shares_from_counts,
    events_stream,
    stream_daily_type_counts,
    stream_dedup_within_watermark,
    stream_session_window,
    stream_sliding_counts,
    stream_transition_counts,
    stream_tumbling_counts,
    run_to_memory,
)

__all__ = [
    "daily_shares_from_counts",
    "events_stream",
    "stream_daily_type_counts",
    "stream_dedup_within_watermark",
    "stream_session_window",
    "stream_sliding_counts",
    "stream_transition_counts",
    "stream_tumbling_counts",
    "run_to_memory",
]
