"""Event-time and streaming operators (SURVEY.md §2.6).

Watermarks, windows, streaming dedup, the foreachBatch sink variant,
observe()-based metrics, and message delay levels — everything the
reference delegates to Flink's runtime, re-expressed on Structured
Streaming.
"""

from rocketmq_flink_spark.streaming.metrics import (
    ThroughputListener,
    observe_throughput,
)
from rocketmq_flink_spark.streaming.ops import (
    MSG_DELAY_LEVEL_SECONDS,
    delivery_time,
    filter_deliverable,
    session_window_agg,
    sliding_window_agg,
    streaming_dedup,
    tumbling_window_agg,
    with_event_time,
    with_processing_time_lag,
)
from rocketmq_flink_spark.streaming.sink import write_stream_foreach_batch
from rocketmq_flink_spark.streaming.stateful import sessionize_with_state

__all__ = [
    "MSG_DELAY_LEVEL_SECONDS",
    "ThroughputListener",
    "delivery_time",
    "filter_deliverable",
    "observe_throughput",
    "session_window_agg",
    "sessionize_with_state",
    "sliding_window_agg",
    "streaming_dedup",
    "tumbling_window_agg",
    "with_event_time",
    "with_processing_time_lag",
    "write_stream_foreach_batch",
]
