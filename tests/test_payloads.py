"""Payload-builder golden tests — the executable spec from the reference's
mocked-API uploader tests (SURVEY §5 pattern 2)."""

from __future__ import annotations

import pytest

from megalista_spark.sinks.payloads import (
    ads_customer_match_operation,
    ads_offline_conversion,
    appsflyer_event,
    cm_conversion,
    format_date,
    ga4_measurement_protocol_event,
    ga_data_import_csv,
    ga_measurement_protocol_hit,
    timestamp_micros,
)


def test_format_date_golden():
    # reference google_ads_offline_conversions_uploader_test.py asserts
    # '2020-04-09 14:13:55-03:00' for this input (America/Sao_Paulo)
    assert format_date("2020-04-09T14:13:55.0005") == "2020-04-09 14:13:55-03:00"


def test_ads_offline_conversion_payload():
    row = {"gclid": "g1", "time": "2020-04-09T14:13:55.0005", "amount": "123.45"}
    p = ads_offline_conversion(row, "actions/123")
    assert p == {
        "conversion_action": "actions/123",
        "gclid": "g1",
        "conversion_date_time": "2020-04-09 14:13:55-03:00",
        "conversion_value": 123.45,
    }


def test_ads_offline_conversion_external_attribution_and_consent():
    row = {
        "gclid": "g1",
        "time": "2020-04-09T14:13:55.0005",
        "amount": "1",
        "external_attribution_credit": "0.3",
        "external_attribution_model": "mymodel",
        "consent_ad_user_data": "GRANTED",
    }
    p = ads_offline_conversion(row, "a")
    assert p["external_attribution_data"] == {
        "external_attribution_credit": 0.3,
        "external_attribution_model": "mymodel",
    }
    assert p["consent"] == {"ad_user_data": "GRANTED"}


def test_customer_match_contact_info_operation():
    row = {
        "hashed_email": "he",
        "hashed_phone_number": "hp",
        "address_info": {"hashed_first_name": "hf"},
    }
    op = ads_customer_match_operation(row, "CONTACT_INFO")
    assert op == {
        "create": {
            "user_identifiers": [
                {"hashed_email": "he"},
                {"hashed_phone_number": "hp"},
                {"address_info": {"hashed_first_name": "hf"}},
            ]
        }
    }


def test_cm_conversion_identifier_priority_and_custom_vars():
    row = {
        "uuid": "u",
        "gclid": "g1",
        "mobileDeviceId": "m1",  # gclid wins (priority order)
        "value": 10,
        "quantity": 2,
        "timestamp": "2020-04-09T14:13:55.000",
        "customVariables": [{"type": "U1", "value": "123"}],
    }
    p = cm_conversion(row, "fa", "fc")
    assert p["gclid"] == "g1" and "mobileDeviceId" not in p
    assert p["quantity"] == 2 and p["value"] == 10
    assert p["timestampMicros"] == timestamp_micros("2020-04-09T14:13:55.000")
    assert p["customVariables"] == [
        {"type": "U1", "value": "123", "kind": "dfareporting#customFloodlightVariable"}
    ]


def test_cm_conversion_defaults():
    p = cm_conversion({"uuid": "u", "dclid": "d1"}, "fa", "fc", now_micros=999)
    assert p["quantity"] == 1
    assert p["dclid"] == "d1"
    assert p["timestampMicros"] == 999
    assert p["ordinal"] == "999"


def test_ga_mp_hit():
    row = {
        "uuid": "u",
        "client_id": "c1",
        "event_category": "cat",
        "event_action": "act",
        "cd12": "x",
        "junk": "dropped",
    }
    hit = ga_measurement_protocol_hit(row, "UA-1")
    assert "v=1" in hit and "tid=UA-1" in hit and "cid=c1" in hit
    assert "ec=cat" in hit and "ea=act" in hit and "cd12=x" in hit
    assert "junk" not in hit


def test_ga4_event_exactly_one_of():
    with pytest.raises(ValueError):
        ga4_measurement_protocol_event({"app_instance_id": "a", "client_id": "c"})
    with pytest.raises(ValueError):
        ga4_measurement_protocol_event({"name": "evt"})
    p = ga4_measurement_protocol_event(
        {"client_id": "c", "name": "purchase", "value": "9.9", "uuid": "u", "blank": ""}
    )
    assert p["client_id"] == "c"
    assert p["events"][0]["name"] == "purchase"
    # reserved keys AND empty strings excluded (reference _validate_param)
    assert p["events"][0]["params"] == {"value": "9.9"}
    assert p["nonPersonalizedAds"] is False  # reference's literal key (:91)
    assert "timestamp_micros" not in p


def test_ga4_event_timestamp_and_user_properties():
    # timestamp_micros forwarded as int (reference :126-127)
    p = ga4_measurement_protocol_event(
        {"client_id": "c", "name": "evt", "timestamp_micros": "1700000000000000"}
    )
    assert p["timestamp_micros"] == 1700000000000000
    assert "timestamp_micros" not in p["events"][0]["params"]
    # user-property mode (reference :104-105)
    up = ga4_measurement_protocol_event(
        {"client_id": "c", "ltv": "9.9"}, is_user_property=True
    )
    assert up["userProperties"] == {"ltv": {"value": "9.9"}}
    assert up["events"] == {"name": "user_property_addition_event", "params": {}}


def test_ga_data_import_csv():
    rows = [{"cd1": "a", "cd2": None}, {"cd1": "b", "cd2": "c"}]
    assert ga_data_import_csv(rows) == "ga:cd1,ga:cd2\na,\nb,c"


def test_appsflyer_event():
    row = {
        "uuid": "u",
        "appsflyer_id": "af1",
        "event_eventName": "purchase",
        "device_ids_idfa": "idfa1",
        "device_ids_oaid": None,
    }
    p = appsflyer_event(row, "app1")
    assert p["appsflyer_id"] == "af1"
    assert p["eventName"] == "purchase"
    assert p["app_id"] == "app1"
    assert p["device_ids"] == {"idfa": "idfa1"}
