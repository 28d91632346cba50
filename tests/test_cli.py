"""CLI option parity: config-plane dispatch priority (reference
primary_execution_source.py:55-75) and the end-to-end `python -m
megalista_spark` run shape (reference main.py:53-121)."""

from __future__ import annotations

import json

import pytest

from megalista_spark.__main__ import build_parser, main, select_config_channel


def _args(argv):
    return build_parser().parse_args(argv)


def test_dispatch_priority_matches_reference():
    # Sheets > Firestore > JSON URL > local file
    assert select_config_channel(
        _args(["--setup_sheet_id", "s", "--setup_firestore_collection", "f",
               "--setup_json_url", "u", "--config", "c"])
    ) == "sheets"
    assert select_config_channel(
        _args(["--setup_firestore_collection", "f", "--config", "c"])
    ) == "firestore"
    assert select_config_channel(
        _args(["--setup_json_url", "u", "--config", "c"])
    ) == "json_url"
    assert select_config_channel(_args(["--config", "c"])) == "json_file"
    with pytest.raises(SystemExit):
        select_config_channel(_args([]))


def test_unavailable_channels_fail_cleanly():
    with pytest.raises(SystemExit, match="Sheets client"):
        main(["--setup_sheet_id", "abc"])
    with pytest.raises(SystemExit, match="Firestore client"):
        main(["--setup_firestore_collection", "col"])


def test_cli_end_to_end_dry_run(spark, tmp_path):
    src = str(tmp_path / "conv")
    spark.createDataFrame(
        [(f"g{i}", "2024-03-01T12:00:00.000000", "10.0") for i in range(7)],
        ["gclid", "time", "amount"],
    ).write.parquet(src)
    cfg = {
        "GoogleAdsAccountId": "123-456-7890",
        "Sources": [
            {"Name": "conv", "Type": "FILE", "FileType": "PARQUET", "Path": src}
        ],
        "Destinations": [
            {"Name": "oc", "Type": "ADS_OFFLINE_CONVERSION",
             "Metadata": ["conv_name"]}
        ],
        "Connections": [
            {"Enabled": True, "Source": "conv", "Destination": "oc"}
        ],
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    # via file URL — exercises the json_url channel end to end too
    rc = main(["--setup_json_url", cfg_path.as_uri(), "--dry-run"])
    assert rc == 0
