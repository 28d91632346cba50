"""JSON column decoding (reference D6: BigQuery JSON columns parsed to
dict / list-of-dict, big_query_data_source.py:211-225).

Spark-first: ``from_json`` with an explicit schema (scalar), or
``transform(col, x -> from_json(x, schema))`` for repeated JSON. Schema may
be inferred from a sample when not provided (driver-side, one pass over a
small sample — never infer on the full 100 TB scan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def decode_json_column(
    df: DataFrame,
    column: str,
    schema: T.DataType | str | None = None,
    sample_rows: int = 100,
) -> DataFrame:
    """Replace a JSON-string column with its parsed struct/array.

    Without an explicit schema, infer from up to ``sample_rows`` non-null
    values via ``schema_of_json`` on a driver-collected sample.
    """
    if schema is None:
        sample = [
            r[0]
            for r in df.select(column).where(F.col(column).isNotNull()).limit(sample_rows).collect()
        ]
        if not sample:
            return df
        # use the longest sample as the most field-complete witness
        witness = max(sample, key=len)
        schema = df.sparkSession.range(1).select(
            F.schema_of_json(F.lit(witness)).alias("s")
        ).first()["s"]
    return df.withColumn(column, F.from_json(F.col(column), schema))


def decode_repeated_json(df: DataFrame, column: str, element_schema: T.DataType | str) -> DataFrame:
    """array<json-string> → array<struct> (the REPEATED JSON case)."""
    return df.withColumn(
        column,
        F.transform(F.col(column), lambda x: F.from_json(x, element_schema)),
    )
