"""Per-destination payload builders — pure functions from row dicts to the
request shapes the reference's uploaders send (their mocked-API unit tests
assert these exact dicts; see SURVEY §5 pattern 2).

Builders run at the sink boundary (inside the transport, per chunk), so the
relational plan stays columnar until the last step. Each cites the
reference uploader it mirrors.
"""

from __future__ import annotations

import datetime as dt
import re
from typing import Any
from urllib.parse import urlencode
from zoneinfo import ZoneInfo

Row = dict[str, Any]

# reference uploaders/utils.py:29 — hardcoded; configurable here with the
# same default for parity.
DEFAULT_TIMEZONE = "America/Sao_Paulo"

_TS_FORMATS = ("%Y-%m-%dT%H:%M:%S.%f", "%Y-%m-%dT%H:%M:%S", "%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S")


def parse_timestamp(value: Any) -> dt.datetime:
    if isinstance(value, dt.datetime):
        return value
    s = str(value)
    for fmt in _TS_FORMATS:
        try:
            return dt.datetime.strptime(s, fmt)
        except ValueError:
            continue
    raise ValueError(f"unparseable timestamp: {value!r}")


def format_date(value: Any, tz: str = DEFAULT_TIMEZONE) -> str:
    """'YYYY-MM-DD HH:MM:SS±HH:MM' — reference format_date
    (uploaders/utils.py:27-58): naive input localized to tz, rendered with
    a colon-separated offset. Golden: '2020-04-09T14:13:55.0005' →
    '2020-04-09 14:13:55-03:00'."""
    d = parse_timestamp(value)
    if d.tzinfo is None:
        d = d.replace(tzinfo=ZoneInfo(tz))
    out = d.strftime("%Y-%m-%d %H:%M:%S%z")
    return out[:-2] + ":" + out[-2:]


def timestamp_micros(value: Any) -> int:
    """reference get_timestamp_micros (uploaders/utils.py:60-66)."""
    d = parse_timestamp(value)
    if d.tzinfo is None:
        d = d.replace(tzinfo=dt.timezone.utc)
    return int(d.timestamp() * 1_000_000)


# ------------------------------------------------------------- Google Ads


def ads_offline_conversion(row: Row, conversion_action: str, tz: str = DEFAULT_TIMEZONE) -> Row:
    """reference google_ads_offline_conversions_uploader.py:101-137."""
    payload: Row = {
        "conversion_action": conversion_action,
        "gclid": row["gclid"],
        "conversion_date_time": format_date(row["time"], tz),
        "conversion_value": float(str(row["amount"])),
    }
    if row.get("external_attribution_credit") and row.get("external_attribution_model"):
        payload["external_attribution_data"] = {
            "external_attribution_credit": float(str(row["external_attribution_credit"])),
            "external_attribution_model": row["external_attribution_model"],
        }
    consent = _consent(row)
    if consent:
        payload["consent"] = consent
    return payload


def ads_call_conversion(row: Row, conversion_action: str, tz: str = DEFAULT_TIMEZONE) -> Row:
    """reference google_ads_offline_conversions_calls_uploader.py:90-126."""
    return {
        "conversion_action": conversion_action,
        "caller_id": row["caller_id"],
        "call_start_date_time": format_date(row["call_time"], tz),
        "conversion_date_time": format_date(row["time"], tz),
        "conversion_value": float(str(row["amount"])),
    }


def ads_conversion_adjustment(
    row: Row, conversion_action: str, key: str = "gclid", tz: str = DEFAULT_TIMEZONE
) -> Row:
    """reference google_ads_offline_conversion_adjustments_uploader.py:96-148
    — RESTATEMENT adjustments keyed by gclid or order_id."""
    payload: Row = {
        "conversion_action": conversion_action,
        "adjustment_type": "RESTATEMENT",
        "adjustment_date_time": format_date(row["time"], tz),
    }
    if key == "gclid":
        payload["gclid_date_time_pair"] = {
            "gclid": row["gclid"],
            "conversion_date_time": format_date(row["conversion_time"], tz),
        }
    else:
        payload["order_id"] = row["order_id"]
    if row.get("amount") is not None:
        payload["restatement_value"] = {"adjusted_value": float(str(row["amount"]))}
    return payload


def ads_customer_match_operation(row: Row, upload_key_type: str) -> Row:
    """reference customer_match/*_uploader.py get_row_keys → one
    user_identifiers operation per row."""
    identifiers: list[Row] = []
    if upload_key_type == "CONTACT_INFO":
        for k, field in (
            ("hashed_email", "hashed_email"),
            ("hashed_phone_number", "hashed_phone_number"),
        ):
            if row.get(k):
                identifiers.append({field: row[k]})
        if row.get("address_info"):
            identifiers.append({"address_info": row["address_info"]})
    elif upload_key_type == "MOBILE_ADVERTISING_ID":
        if row.get("mobile_id"):
            identifiers.append({"mobile_id": row["mobile_id"]})
    elif upload_key_type == "CRM_ID":
        if row.get("third_party_user_id"):
            identifiers.append({"third_party_user_id": row["third_party_user_id"]})
    return {"create": {"user_identifiers": identifiers}}


def _consent(row: Row) -> Row:
    consent: Row = {}
    if row.get("consent_ad_user_data"):
        consent["ad_user_data"] = row["consent_ad_user_data"]
    if row.get("consent_ad_personalization"):
        consent["ad_personalization"] = row["consent_ad_personalization"]
    return consent


# ------------------------------------------------- Campaign Manager (CM360)


def cm_conversion(
    row: Row,
    floodlight_activity_id: str,
    floodlight_configuration_id: str,
    now_micros: int | None = None,
) -> Row:
    """reference campaign_manager_conversion_uploader.py:84-133 —
    identifier priority gclid > encryptedUserId > mobileDeviceId > matchId
    > dclid; quantity default 1; ordinal/timestamp default now."""
    payload: Row = {
        "floodlightActivityId": floodlight_activity_id,
        "floodlightConfigurationId": floodlight_configuration_id,
        "quantity": int(row["quantity"]) if row.get("quantity") is not None else 1,
    }
    if row.get("value") is not None:
        payload["value"] = row["value"]
    for key in ("gclid", "encryptedUserId", "mobileDeviceId", "matchId", "dclid"):
        if row.get(key):
            payload[key] = row[key]
            break
    ts = (
        timestamp_micros(row["timestamp"])
        if row.get("timestamp")
        else (now_micros if now_micros is not None else timestamp_micros(dt.datetime.now(dt.timezone.utc)))
    )
    payload["timestampMicros"] = ts
    payload["ordinal"] = str(row.get("ordinal") or ts)
    if row.get("customVariables"):
        payload["customVariables"] = [
            {"type": cv["type"], "value": cv["value"], "kind": "dfareporting#customFloodlightVariable"}
            for cv in row["customVariables"]
        ]
    return payload


# --------------------------------------------- Google Analytics (UA MP / GA4)

_GA_PASSTHROUGH = re.compile(r"^(c[dm]\d+|p(a|r\d*[a-z]+)|t[irast]|cu)$")


def ga_measurement_protocol_hit(row: Row, tracking_id: str, hit_type: str = "event") -> str:
    """reference google_analytics_measurement_protocol.py:38-96 — row dict →
    URL-encoded MP hit. Regex passthrough of custom dim/metric, product,
    transaction and currency params."""
    params: dict[str, Any] = {"v": 1, "tid": tracking_id, "t": hit_type, "ni": 1}
    if row.get("client_id"):
        params["cid"] = row["client_id"]
    if row.get("user_id"):
        params["uid"] = row["user_id"]
    if hit_type == "event":
        params["ec"] = row.get("event_category")
        params["ea"] = row.get("event_action")
        if row.get("event_label") is not None:
            params["el"] = row["event_label"]
        if row.get("event_value") is not None:
            params["ev"] = row["event_value"]
    if row.get("campaign_source"):
        params["cs"] = row["campaign_source"]
    if row.get("campaign_medium"):
        params["cm"] = row["campaign_medium"]
    for k, v in row.items():
        if _GA_PASSTHROUGH.match(k) and v is not None:
            params[k] = v
    return urlencode({k: v for k, v in params.items() if v is not None})


GA4_RESERVED = {"uuid", "app_instance_id", "client_id", "user_id", "timestamp_micros"}


def _ga4_param_ok(k: str, v: Any, reserved: set[str]) -> bool:
    # reference _validate_param: drops reserved keys, None AND empty string
    return k not in reserved and v is not None and v != ""


def ga4_measurement_protocol_event(
    row: Row, non_personalized_ads: bool = False, is_user_property: bool = False
) -> Row:
    """reference google_analytics_4_measurement_protocol.py:37-135 — event
    mode: exactly one of app_instance_id/client_id; all non-reserved
    columns become event params. User-property mode maps non-reserved
    columns to userProperties and attaches the reference's fixed
    user_property_addition_event. ``nonPersonalizedAds`` mirrors the
    reference's literal key (:91); ``timestamp_micros`` is forwarded as
    int when present (:126-127) so uploaded events keep their event time."""
    has_app, has_client = bool(row.get("app_instance_id")), bool(row.get("client_id"))
    if has_app == has_client:
        raise ValueError("exactly one of app_instance_id or client_id must be set")
    payload: Row = {"nonPersonalizedAds": non_personalized_ads}
    if is_user_property:
        payload["userProperties"] = {
            k: {"value": v} for k, v in row.items() if _ga4_param_ok(k, v, GA4_RESERVED)
        }
        payload["events"] = {"name": "user_property_addition_event", "params": {}}
    else:
        reserved = GA4_RESERVED | {"name"}
        payload["events"] = [
            {
                "name": row.get("name"),
                "params": {k: v for k, v in row.items() if _ga4_param_ok(k, v, reserved)},
            }
        ]
    if has_app:
        payload["app_instance_id"] = row["app_instance_id"]
    else:
        payload["client_id"] = row["client_id"]
    if row.get("user_id"):
        payload["user_id"] = row["user_id"]
    if row.get("timestamp_micros"):
        payload["timestamp_micros"] = int(str(row["timestamp_micros"]))
    return payload


def ga_data_import_csv(rows: list[Row]) -> str:
    """reference google_analytics_data_import_uploader.py:116-137 — dict
    rows → 'ga:'-prefixed header + comma-joined lines, None → ''."""
    if not rows:
        return ""
    keys = list(rows[0].keys())
    header = ",".join(f"ga:{k}" for k in keys)
    lines = [",".join("" if r.get(k) is None else str(r[k]) for k in keys) for r in rows]
    return "\n".join([header, *lines])


# ----------------------------------------------------------------- AppsFlyer


def appsflyer_event(row: Row, app_id: str) -> Row:
    """reference appsflyer_s2s_uploader_async.py:52-80 — S2S event body."""
    payload: Row = {
        "appsflyer_id": row["appsflyer_id"],
        "eventName": row.get("event_eventName"),
        "eventValue": row.get("event_eventValue") or "",
        "app_id": app_id,
    }
    if row.get("customer_user_id"):
        payload["customer_user_id"] = row["customer_user_id"]
    if row.get("ip"):
        payload["ip"] = row["ip"]
    if row.get("event_eventTime"):
        payload["eventTime"] = row["event_eventTime"]
    if row.get("event_eventCurrency"):
        payload["eventCurrency"] = row["event_eventCurrency"]
    device_ids = {
        k.removeprefix("device_ids_"): v
        for k, v in row.items()
        if k.startswith("device_ids_") and v
    }
    if device_ids:
        payload["device_ids"] = device_ids
    return payload


# ------------------------------------------------------------------- DV360


def dv_customer_match_contact(row: Row) -> Row:
    """reference display_video/customer_match/contact_info_uploader.py:25-74."""
    contact: Row = {}
    if row.get("hashedEmails"):
        contact["hashedEmails"] = [row["hashedEmails"]]
    if row.get("hashedPhoneNumbers"):
        contact["hashedPhoneNumbers"] = [row["hashedPhoneNumbers"]]
    if row.get("hashedFirstName"):
        contact["hashedFirstName"] = row["hashedFirstName"]
    if row.get("hashedLastName"):
        contact["hashedLastName"] = row["hashedLastName"]
    if row.get("countryCode"):
        contact["countryCode"] = row["countryCode"]
    if row.get("zipCodes"):
        contact["zipCodes"] = [row["zipCodes"]]
    return contact
