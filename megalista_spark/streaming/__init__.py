from megalista_spark.streaming.events import (
    stream_session_window_stats,
    stream_sink_foreach_batch,
    stream_tumbling_rollup,
)

__all__ = [
    "stream_session_window_stats",
    "stream_sink_foreach_batch",
    "stream_tumbling_rollup",
]
