from megalista_spark.models.execution import (
    AccountConfig,
    Batch,
    Destination,
    DestinationType,
    Execution,
    Source,
    SourceType,
    TransactionalType,
)

__all__ = [
    "AccountConfig",
    "Batch",
    "Destination",
    "DestinationType",
    "Execution",
    "Source",
    "SourceType",
    "TransactionalType",
]
