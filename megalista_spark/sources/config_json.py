"""JSON execution-config source.

Parity with the reference's JsonExecutionSource
(/root/reference/megalista_dataflow/sources/json_execution_source.py:40-97)
and its sample shape (cloud_config/configuration_sample.json):

{
  "GoogleAdsAccountId": "...", "GoogleAdsMCC": false, "AppId": "...",
  "GoogleAnalyticsAccountId": "...", "CampaignManagerProfileId": "...",
  "Sources": [{"Name": ..., "Type": "BIG_QUERY"|"FILE", ...metadata}],
  "Destinations": [{"Name": ..., "Type": ..., "Metadata": [...]}],
  "Connections": [{"Enabled": true, "Source": ..., "Destination": ...}]
}

The config plane is tiny — it stays driver-side as dataclasses; only the
data plane becomes DataFrames.
"""

from __future__ import annotations

import json
from typing import Any

from megalista_spark.models.execution import (
    AccountConfig,
    Destination,
    DestinationType,
    Execution,
    Source,
    SourceType,
)


def _source_metadata(src: dict[str, Any]) -> tuple[str, ...]:
    if str(src.get("Type", "")).upper() == "BIG_QUERY":
        return (src.get("Dataset", ""), src.get("Table", ""))
    # FILE sources: [file_type, path]
    return (src.get("FileType", src.get("Format", "PARQUET")), src.get("Path", ""))


def parse_config(config: dict[str, Any]) -> list[Execution]:
    account = AccountConfig(
        google_ads_account_id=str(config.get("GoogleAdsAccountId", "")),
        mcc=bool(config.get("GoogleAdsMCC", False)),
        google_analytics_account_id=str(config.get("GoogleAnalyticsAccountId", "")),
        campaign_manager_profile_id=str(config.get("CampaignManagerProfileId", "")),
        app_id=str(config.get("AppId", "")),
    )
    sources = {
        s["Name"].strip(): Source(
            name=s["Name"],
            source_type=SourceType[str(s["Type"]).upper()],
            metadata=_source_metadata(s),
        )
        for s in config.get("Sources", [])
    }
    destinations = {
        d["Name"].strip(): Destination(
            name=d["Name"],
            destination_type=DestinationType[str(d["Type"]).upper()],
            metadata=tuple(str(m) for m in d.get("Metadata", [])),
        )
        for d in config.get("Destinations", [])
    }
    executions = []
    for conn in config.get("Connections", []):
        if not conn.get("Enabled", True):
            continue
        executions.append(
            Execution(
                account_config=account,
                source=sources[conn["Source"].strip()],
                destination=destinations[conn["Destination"].strip()],
            )
        )
    return executions


def load_executions_from_json(path: str) -> list[Execution]:
    with open(path) as f:
        return parse_config(json.load(f))
