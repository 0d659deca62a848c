from distributed_computing_platform_mapreduce_spark.streaming.windows import (
    sessionized_stream,
    sliding_counts_stream,
    stream_events,
    tumbling_counts_stream,
)

__all__ = [
    "stream_events",
    "tumbling_counts_stream",
    "sliding_counts_stream",
    "sessionized_stream",
]
