from megalista_spark.schema.registry import (
    ColumnSpec,
    DestinationSchema,
    SCHEMAS,
    SchemaValidationError,
    aggregate_custom_variables,
    get_schema,
)

__all__ = [
    "ColumnSpec",
    "DestinationSchema",
    "SCHEMAS",
    "SchemaValidationError",
    "aggregate_custom_variables",
    "get_schema",
]
