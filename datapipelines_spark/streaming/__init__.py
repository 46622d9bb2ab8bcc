from datapipelines_spark.streaming.windows import (
    read_events_stream,
    tumbling_counts,
    sliding_counts,
    session_aggregate,
)
from datapipelines_spark.streaming.stateful import user_running_stats

__all__ = [
    "read_events_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_aggregate",
    "user_running_stats",
]
