"""SQL surface: register the engine's tables as temp views so users can
run arbitrary ``spark.sql`` over them — the relational capabilities
(joins, windows, rollup/cube, set ops, percentiles) are Spark built-ins
exposed through the same session the operators run on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def register_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Create a temp view per test table (events ts normalized to a real
    timestamp). Returns the DataFrames keyed by name."""
    out: dict[str, DataFrame] = {}
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for name in TABLES:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events" and dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-shot: register views and run a SQL query."""
    register_tables(spark, sf_dir)
    return spark.sql(query)
