from .ops import (
    events_stream,
    stream_dedup_within_watermark,
    stream_session_window,
    stream_sliding_counts,
    stream_transition_counts,
    stream_tumbling_counts,
    run_to_memory,
)

__all__ = [
    "events_stream",
    "stream_dedup_within_watermark",
    "stream_session_window",
    "stream_sliding_counts",
    "stream_transition_counts",
    "stream_tumbling_counts",
    "run_to_memory",
]
