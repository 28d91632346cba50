"""Recorded-fixture round-trips through the LIVE adapter code paths
(VERDICT r6 item 6): real-shaped API responses (from the published
google-ads partial-failure sample and the GA4 MP / standard Google API
error envelope) replayed end-to-end —

    parquet source → retrieve_data (anti-join dedup) →
    SinkExecutor.for_destination(<live transport>) → run →
    control_table.append(success) → rerun retrieve_data

— asserting the idempotent-rerun contract through
``GoogleAdsConversionsTransport`` and ``GA4MeasurementProtocolTransport``
rather than a test Transport. Reference parity:
google_ads_offline_conversions_uploader.py:131-161 (partial-failure
success filter), google_analytics_4_measurement_protocol.py:125-135
(204-accept), data_sources/file/file_data_source.py (transactional
control table).

All fakes are module-level (they pickle into executor workers).
"""

from __future__ import annotations

import json
import os
from types import SimpleNamespace

from megalista_spark.models.execution import (
    AccountConfig,
    Destination,
    DestinationType,
    Execution,
    Source,
    SourceType,
    TransactionalType,
)
from megalista_spark.sinks.adapters import (
    GA4MeasurementProtocolTransport,
    GoogleAdsConversionsTransport,
)
from megalista_spark.sinks.executor import SinkExecutor
from megalista_spark.sources.data_source import get_data_source

ACCOUNT = AccountConfig("123-45567-890", False, "ga_account_id", "", "")
SOURCE = Source("orig1", SourceType.BIG_QUERY, ("dt1", "buyers"))


def _execution(dtype, metadata):
    return Execution(ACCOUNT, SOURCE, Destination("dest1", dtype, tuple(metadata)))


# ---------------------------------------------------------------- fixtures
#
# UploadClickConversionsResponse, partial-failure shape per the google-ads
# docs' published partial-failure sample: results has the SAME cardinality
# as the request's conversions, failed operations come back as EMPTY
# ClickConversionResult messages (gclid unset), and partial_failure_error
# is a google.rpc.Status whose details pack one GoogleAdsFailure carrying
# per-operation errors with the operation index in
# location.field_path_elements[0].index.

ADS_FAIL_GCLIDS = {"gclid-2", "gclid-4"}


def _ads_partial_failure_response(conversions):
    results, errors = [], []
    for i, conv in enumerate(conversions):
        if conv["gclid"] in ADS_FAIL_GCLIDS:
            results.append(SimpleNamespace(gclid=None))  # empty result message
            errors.append(
                SimpleNamespace(
                    error_code=SimpleNamespace(conversion_upload_error="CLICK_NOT_FOUND"),
                    message="The click associated with the given identifier or "
                    "iOS URL parameter is not found.",
                    trigger=SimpleNamespace(string_value=conv["gclid"]),
                    location=SimpleNamespace(
                        field_path_elements=[
                            SimpleNamespace(field_name="conversions", index=i)
                        ]
                    ),
                )
            )
        else:
            results.append(
                SimpleNamespace(
                    gclid=conv["gclid"],
                    conversion_action=conv["conversion_action"],
                    conversion_date_time=conv["conversion_date_time"],
                )
            )
    pf = None
    if errors:
        pf = SimpleNamespace(
            code=3,  # INVALID_ARGUMENT
            message="Partial failure occurred.",
            details=[
                SimpleNamespace(
                    type_url="type.googleapis.com/"
                    "google.ads.googleads.v21.errors.GoogleAdsFailure",
                    # pre-unpacked GoogleAdsFailure (the live path carries
                    # serialized bytes here; adapters accept both)
                    value=SimpleNamespace(
                        errors=errors, request_id="recorded-fixture-0001"
                    ),
                )
            ],
        )
    return SimpleNamespace(results=results, partial_failure_error=pf)


class _GaqlService:
    def search_stream(self, customer_id, query):
        row = SimpleNamespace(
            conversion_action=SimpleNamespace(
                resource_name="customers/12345567890/conversionActions/987"
            )
        )
        return [SimpleNamespace(results=[row])]


class _PartialFailureUploadService:
    def upload_click_conversions(self, request):
        return _ads_partial_failure_response(request["conversions"])


class _AcceptAllUploadService:
    def upload_click_conversions(self, request):
        return SimpleNamespace(
            results=[
                SimpleNamespace(gclid=c["gclid"]) for c in request["conversions"]
            ],
            partial_failure_error=None,
        )


class PartialFailureFactory:
    def get(self, service_name, login_customer_id):
        if service_name == "GoogleAdsService":
            return _GaqlService()
        return _PartialFailureUploadService()


class AcceptAllFactory:
    def get(self, service_name, login_customer_id):
        if service_name == "GoogleAdsService":
            return _GaqlService()
        return _AcceptAllUploadService()


# GA4 MP: accepted events answer HTTP 204 with an empty body; the failure
# fixture is the standard Google API error envelope (code/message/status)
# on a 500 — the shape a transient backend error serves.

GA4_FAIL_CLIENT_IDS = {"client-bad-1", "client-bad-2"}
GA4_ERROR_BODY = json.dumps(
    {"error": {"code": 500, "message": "Internal error encountered.", "status": "INTERNAL"}}
).encode()


class GA4RecordedHttpPost:
    def __init__(self, fail_client_ids=frozenset()):
        self.fail_client_ids = frozenset(fail_client_ids)

    def __call__(self, url, body):
        assert url.startswith("https://www.google-analytics.com/mp/collect")
        assert "api_secret=secret-1" in url and "measurement_id=G-12345" in url
        payload = json.loads(body.decode("utf-8"))
        if payload["client_id"] in self.fail_client_ids:
            return 500, GA4_ERROR_BODY
        return 204, b""


# -------------------------------------------------------------- the tests


def _file_source(tmp_path, name):
    return Source("f1", SourceType.FILE, ("parquet", os.path.join(str(tmp_path), name)))


def test_ads_conversions_partial_failure_roundtrip(spark, tmp_path):
    src = _file_source(tmp_path, "conversions.parquet")
    rows = [
        (f"gclid-{i}", f"2020-04-09T14:13:0{i}.0005", str(100 + i)) for i in range(1, 6)
    ]
    spark.createDataFrame(rows, ["gclid", "time", "amount"]).write.parquet(src.path)

    ds = get_data_source(spark, src)
    pending = ds.retrieve_data(None, TransactionalType.GCLID_TIME)
    assert pending.count() == 5

    execution = _execution(DestinationType.ADS_OFFLINE_CONVERSION, ["conv_name"])
    t1 = GoogleAdsConversionsTransport(execution, PartialFailureFactory())
    result = SinkExecutor.for_destination(
        t1, DestinationType.ADS_OFFLINE_CONVERSION
    ).run(pending)
    ok = {r["gclid"] for r in result.success.collect()}
    assert ok == {"gclid-1", "gclid-3", "gclid-5"}
    # partial failure is row-level rejection, not a chunk error
    assert result.errors.count() == 0

    ctrl = ds.control_table(TransactionalType.GCLID_TIME)
    ctrl.append(result.success)
    remaining = ds.retrieve_data(None, TransactionalType.GCLID_TIME)
    assert {r["gclid"] for r in remaining.collect()} == ADS_FAIL_GCLIDS

    # retry run: backend accepts everything → control table completes →
    # a third read is empty (idempotent rerun through the live adapter)
    t2 = GoogleAdsConversionsTransport(execution, AcceptAllFactory())
    result2 = SinkExecutor.for_destination(
        t2, DestinationType.ADS_OFFLINE_CONVERSION
    ).run(remaining)
    assert {r["gclid"] for r in result2.success.collect()} == ADS_FAIL_GCLIDS
    ctrl.append(result2.success)
    assert ds.retrieve_data(None, TransactionalType.GCLID_TIME).count() == 0


def test_ga4_mp_roundtrip(spark, tmp_path):
    src = _file_source(tmp_path, "ga4_events.parquet")
    rows = [
        ("u-1", "client-ok-1", "purchase"),
        ("u-2", "client-bad-1", "purchase"),
        ("u-3", "client-ok-2", "signup"),
        ("u-4", "client-bad-2", "signup"),
    ]
    spark.createDataFrame(rows, ["uuid", "client_id", "name"]).write.parquet(src.path)

    ds = get_data_source(spark, src)
    pending = ds.retrieve_data(None, TransactionalType.UUID)
    assert pending.count() == 4

    execution = _execution(
        DestinationType.GA_4_MEASUREMENT_PROTOCOL,
        ["secret-1", "true", "false", "false", "", "G-12345"],
    )
    t1 = GA4MeasurementProtocolTransport(
        execution, http_post=GA4RecordedHttpPost(GA4_FAIL_CLIENT_IDS)
    )
    result = SinkExecutor.for_destination(
        t1, DestinationType.GA_4_MEASUREMENT_PROTOCOL
    ).run(pending)
    assert {r["uuid"] for r in result.success.collect()} == {"u-1", "u-3"}

    ctrl = ds.control_table(TransactionalType.UUID)
    ctrl.append(result.success)
    remaining = ds.retrieve_data(None, TransactionalType.UUID)
    assert {r["uuid"] for r in remaining.collect()} == {"u-2", "u-4"}

    t2 = GA4MeasurementProtocolTransport(execution, http_post=GA4RecordedHttpPost())
    result2 = SinkExecutor.for_destination(
        t2, DestinationType.GA_4_MEASUREMENT_PROTOCOL
    ).run(remaining)
    assert result2.success.count() == 2
    ctrl.append(result2.success)
    assert ds.retrieve_data(None, TransactionalType.UUID).count() == 0
