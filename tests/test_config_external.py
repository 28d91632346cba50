"""Sheets/Firestore config parsing (injected fetchers) + CLI + eraser hook."""

from __future__ import annotations

import json

from megalista_spark.models.execution import AccountConfig, DestinationType, SourceType
from megalista_spark.sinks.executor import SinkExecutor
from megalista_spark.sinks.transports import MockTransport
from megalista_spark.sources.config_external import (
    load_executions_from_sheet,
    parse_firestore_documents,
)

ACCOUNT = AccountConfig(google_ads_account_id="123")


def test_sheet_config_only_yes_schedules():
    ranges = {
        "SourcesRange": [["src1", "FILE", "PARQUET", "/data/src1"]],
        "DestinationsRange": [["d1", "ADS_OFFLINE_CONVERSION", "action"]],
        "SchedulesRange": [
            ["YES", "src1", "d1"],
            ["NO", "src1", "d1"],
        ],
    }
    execs = load_executions_from_sheet(
        "sheet-id", ACCOUNT, fetch_values=lambda sid, rng: ranges[rng]
    )
    assert len(execs) == 1
    e = execs[0]
    assert e.source.source_type == SourceType.FILE
    assert e.source.path == "/data/src1"
    assert e.destination.destination_type == DestinationType.ADS_OFFLINE_CONVERSION


def test_firestore_config_active_filter():
    docs = [
        {
            "active": "yes",
            "source_name": "s",
            "source_type": "BIG_QUERY",
            "dataset": "ds",
            "table": "t",
            "destination_name": "d",
            "destination_type": "GA_4_MEASUREMENT_PROTOCOL",
            "metadata": ["web", "secret", "mid"],
        },
        {"active": "no", "source_name": "x", "source_type": "FILE",
         "destination_name": "d", "destination_type": "GA_DATA_IMPORT"},
    ]
    execs = parse_firestore_documents(ACCOUNT, docs)
    assert len(execs) == 1
    assert execs[0].source.path == "ds.t"
    assert execs[0].destination.metadata == ("web", "secret", "mid")


def test_cli_main(spark, tmp_path, capsys):
    from megalista_spark.__main__ import main

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("g1", "2020-04-09T14:13:55.000000", "1.5")], ["gclid", "time", "amount"]
    ).write.parquet(src)
    cfg = {
        "Sources": [{"Name": "s", "Type": "FILE", "FileType": "PARQUET", "Path": src}],
        "Destinations": [{"Name": "d", "Type": "ADS_OFFLINE_CONVERSION", "Metadata": []}],
        "Connections": [{"Enabled": True, "Source": "s", "Destination": "d"}],
    }
    cfg_path = tmp_path / "c.json"
    cfg_path.write_text(json.dumps(cfg))
    code = main(["--config", str(cfg_path)])
    out = json.loads(capsys.readouterr().out)
    assert code == 0
    assert out[0]["rows_uploaded"] == 1


class EraseRecordingTransport(MockTransport):
    def __init__(self):
        super().__init__()
        self.erase_calls = 0

    def before_run(self, context):
        self.erase_calls += 1


def test_before_run_called_once(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], ["k"])
    t = EraseRecordingTransport()
    result = SinkExecutor(t, batch_size=2, max_parallelism=4).run(df)
    assert result.success.count() == 10
    assert t.erase_calls == 1  # once per run, not per partition/chunk


def test_reference_sample_config_parses_unchanged():
    """A reference user's config.json loads as-is (switchability claim)."""
    import os

    sample = "/root/reference/cloud_config/configuration_sample.json"
    if not os.path.exists(sample):
        import pytest

        pytest.skip("reference not mounted")
    from megalista_spark.sources.config_json import load_executions_from_json

    execs = load_executions_from_json(sample)
    assert len(execs) == 2
    assert execs[0].destination.destination_type.value == "ADS_OFFLINE_CONVERSION"
    assert execs[0].source.path == "my_source_dataset.my_offline_conversions_table"
    assert execs[1].destination.metadata == ("GA_Property_ID", "1")
