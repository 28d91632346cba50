from megalista_spark.sources.data_source import (
    ControlTable,
    DataSource,
    FileDataSource,
    get_data_source,
)
from megalista_spark.sources.config_json import load_executions_from_json

__all__ = [
    "ControlTable",
    "DataSource",
    "FileDataSource",
    "get_data_source",
    "load_executions_from_json",
]
