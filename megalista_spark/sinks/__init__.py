from megalista_spark.sinks.executor import SinkExecutor, SinkResult, BATCH_SIZES
from megalista_spark.sinks.transports import (
    DryRunTransport,
    MockTransport,
    Transport,
    TransportError,
)

__all__ = [
    "SinkExecutor",
    "SinkResult",
    "BATCH_SIZES",
    "DryRunTransport",
    "MockTransport",
    "Transport",
    "TransportError",
]
