"""Google Sheets / Firestore execution-config sources.

Same contract as the JSON source (list[Execution] out), matching the
reference's readers:
- SpreadsheetExecutionSource (sources/spreadsheet_execution_source.py:43-133):
  named ranges SourcesRange / DestinationsRange / SchedulesRange; only
  schedules marked 'YES' become executions.
- FirestoreExecutionSource (sources/firestore_execution_source.py:41-137):
  documents where active == 'yes', per-type metadata-list assembly.

The Google client libraries are not available in this environment, so the
network fetch is injectable: pass ``fetch_values`` / ``fetch_documents``
(or rely on the libraries if installed). The parsing/assembly logic — the
actual semantics — is implemented and tested with injected fixtures.
"""

from __future__ import annotations

from typing import Any, Callable

from megalista_spark.models.execution import (
    AccountConfig,
    Destination,
    DestinationType,
    Execution,
    Source,
    SourceType,
)


def parse_sheet_config(
    account: AccountConfig,
    sources_rows: list[list[str]],
    destinations_rows: list[list[str]],
    schedules_rows: list[list[str]],
) -> list[Execution]:
    """rows are the raw named-range values:
    sources:       [name, type, metadata...]
    destinations:  [name, type, metadata...]
    schedules:     [active(YES/NO), source_name, destination_name]
    """
    sources = {
        r[0].strip(): Source(r[0], SourceType[r[1].strip().upper()], tuple(r[2:]))
        for r in sources_rows
        if r and r[0]
    }
    destinations = {
        r[0].strip(): Destination(
            r[0], DestinationType[r[1].strip().upper()], tuple(r[2:])
        )
        for r in destinations_rows
        if r and r[0]
    }
    out = []
    for r in schedules_rows:
        if not r or str(r[0]).strip().upper() != "YES":
            continue
        out.append(
            Execution(account, sources[r[1].strip()], destinations[r[2].strip()])
        )
    return out


def load_executions_from_sheet(
    sheet_id: str,
    account: AccountConfig,
    fetch_values: Callable[[str, str], list[list[str]]] | None = None,
) -> list[Execution]:
    """``fetch_values(sheet_id, named_range) -> rows``. Without an injected
    fetcher this needs google-api-python-client (not bundled here)."""
    if fetch_values is None:
        try:
            from googleapiclient.discovery import build  # type: ignore
        except ImportError as exc:
            raise RuntimeError(
                "google-api-python-client not available; pass fetch_values"
            ) from exc

        service = build("sheets", "v4")

        def fetch_values(sid: str, rng: str) -> list[list[str]]:
            resp = (
                service.spreadsheets()
                .values()
                .get(spreadsheetId=sid, range=rng)
                .execute()
            )
            return resp.get("values", [])

    return parse_sheet_config(
        account,
        fetch_values(sheet_id, "SourcesRange"),
        fetch_values(sheet_id, "DestinationsRange"),
        fetch_values(sheet_id, "SchedulesRange"),
    )


def parse_firestore_documents(
    account: AccountConfig, documents: list[dict[str, Any]]
) -> list[Execution]:
    """Each document describes one connection; only active == 'yes' runs
    (reference firestore_execution_source.py:44-48). Expected keys:
    active, source_name, source_type, source metadata (dataset/table or
    file_type/path), destination_name, destination_type, metadata list.
    """
    out = []
    for doc in documents:
        if str(doc.get("active", "")).lower() != "yes":
            continue
        stype = SourceType[str(doc["source_type"]).upper()]
        if stype == SourceType.BIG_QUERY:
            smeta = (doc.get("dataset", ""), doc.get("table", ""))
        else:
            smeta = (doc.get("file_type", "PARQUET"), doc.get("path", ""))
        source = Source(doc["source_name"], stype, smeta)
        destination = Destination(
            doc["destination_name"],
            DestinationType[str(doc["destination_type"]).upper()],
            tuple(str(m) for m in doc.get("metadata", [])),
        )
        out.append(Execution(account, source, destination))
    return out


def load_executions_from_firestore(
    collection: str,
    account: AccountConfig,
    fetch_documents: Callable[[str], list[dict[str, Any]]] | None = None,
) -> list[Execution]:
    if fetch_documents is None:
        try:
            from google.cloud import firestore  # type: ignore
        except ImportError as exc:
            raise RuntimeError(
                "google-cloud-firestore not available; pass fetch_documents"
            ) from exc

        def fetch_documents(coll: str) -> list[dict[str, Any]]:
            client = firestore.Client()
            return [d.to_dict() for d in client.collection(coll).stream()]

    return parse_firestore_documents(account, fetch_documents(collection))
