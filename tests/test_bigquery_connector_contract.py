"""Executable BigQuery read contract WITHOUT the connector jar
(VERDICT r6 item 5): register a fake Python Data Source under the
``bigquery`` format name (PySpark 4 Python Data Source API) that echoes
every option it receives back as rows, then drive the REAL read path —
``BigQueryDataSource.read_raw`` / ``retrieve_data`` — and assert the
exact options + pushed dedup query that the spark-bigquery connector
would receive. Reference parity: big_query_data_source.py:58-148 (table
read, transactional LEFT-JOIN dedup shipped to BQ).
"""

from __future__ import annotations

import pytest

from megalista_spark.models.execution import Source, SourceType, TransactionalType
from megalista_spark.sources.data_source import BigQueryDataSource


def _norm(sql: str) -> str:
    return " ".join(sql.split()).replace(" ,", ",").replace(", ", ",").lower()


class _FakeBqClient:
    def __init__(self):
        self.queries = []

    def query(self, sql):
        self.queries.append(sql)

        class _R:
            def result(self):
                return []

        return _R()


@pytest.fixture(scope="module")
def fake_bigquery(spark):
    """Register the echoing fake under the connector's format name."""
    from pyspark.sql.datasource import DataSource, DataSourceReader

    class _EchoReader(DataSourceReader):
        def __init__(self, options):
            self._options = dict(options)

        def read(self, partition):
            for k, v in self._options.items():
                yield (str(k), str(v))

    class FakeBigQuery(DataSource):
        @classmethod
        def name(cls):
            return "bigquery"

        def schema(self):
            return "option_key string, option_value string"

        def reader(self, schema):
            return _EchoReader(self.options)

    spark.dataSource.register(FakeBigQuery)
    return spark


def _options_of(df) -> dict:
    # Spark's DSv2 option map is case-insensitive (keys arrive lowercased)
    return {r.option_key.lower(): r.option_value for r in df.collect()}


def test_plain_table_read_reaches_connector(fake_bigquery, spark):
    src = Source("s1", SourceType.BIG_QUERY, ("ds1", "conv"))
    got = _options_of(BigQueryDataSource(spark, src).read_raw())
    assert got["table"] == "ds1.conv"
    assert "query" not in got


def test_bq_side_dedup_query_ships_in_options(fake_bigquery, spark):
    """dedup_in_bq + transactional: the LEFT-JOIN dedup SQL must ship as
    the connector ``query`` option with the query-mode requirements
    (viewsEnabled + materializationDataset), and retrieve_data must NOT
    add a Spark-side anti-join on top (BQ already excluded uploaded
    rows)."""
    src = Source("s1", SourceType.BIG_QUERY, ("ds1", "conv"))
    ds = BigQueryDataSource(
        spark, src, ops_dataset="ops", dedup_in_bq=True, bq_client=_FakeBqClient()
    )
    df = ds.retrieve_data(schema=None, transactional_type=TransactionalType.GCLID_TIME)
    # the control table the pushed LEFT JOIN references was ensured first
    # (idempotent DDL, 15-day partition expiry — reference
    # big_query_data_source.py:119-127), or the first run would fail
    # with table-not-found
    assert any(
        "CREATE TABLE IF NOT EXISTS `ops.conv_uploaded`" in q
        for q in ds.bq_client.queries
    )
    # plan is the bare fake scan — no join node (dedup happened in BQ)
    assert "Join" not in df._jdf.queryExecution().optimizedPlan().toString()
    got = _options_of(df)
    assert got["viewsenabled"] == "true"
    assert got["materializationdataset"] == "ops"
    assert _norm(got["query"]) == _norm(
        "SELECT data.* FROM `ds1.conv` AS data "
        "LEFT JOIN `ops.conv_uploaded` AS uploaded USING(gclid, time) "
        "WHERE uploaded.gclid IS NULL"
    )


def test_non_transactional_dedup_in_bq_reads_plain_table(fake_bigquery, spark):
    src = Source("s1", SourceType.BIG_QUERY, ("ds1", "conv"))
    ds = BigQueryDataSource(
        spark, src, ops_dataset="ops", dedup_in_bq=True, bq_client=_FakeBqClient()
    )
    got = _options_of(
        ds.retrieve_data(
            schema=None, transactional_type=TransactionalType.NOT_TRANSACTIONAL
        )
    )
    assert got["table"] == "ds1.conv"
    assert "query" not in got


def test_literal_schema_columns_push_into_dedup_query(fake_bigquery, spark):
    """An all-literal schema contract pushes its column list server-side
    so only contract columns cross the Storage API."""
    src = Source("s1", SourceType.BIG_QUERY, ("ds1", "conv"))
    ds = BigQueryDataSource(
        spark, src, ops_dataset="ops", dedup_in_bq=True, bq_client=_FakeBqClient()
    )
    got = _options_of(
        ds.read_raw(TransactionalType.GCLID_TIME, ["gclid", "time", "amount"])
    )
    assert _norm(got["query"]).startswith(
        _norm("SELECT data.gclid, data.time, data.amount FROM `ds1.conv`")
    )
