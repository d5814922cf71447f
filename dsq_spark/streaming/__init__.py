from dsq_spark.streaming.ops import (  # noqa: F401
    read_events_stream,
    session_windows,
    sliding_window_counts,
    tumbling_window_agg,
)
