from .jobs import (  # noqa: F401
    stream_events,
    streaming_tumbling_counts,
    streaming_sliding_counts,
    streaming_session_counts,
    streaming_dedup_within_watermark,
    run_available_now,
)
