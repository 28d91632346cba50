"""PII hashing / normalization as native Spark SQL expressions.

Byte-for-byte parity with the reference mappers:
- hash_field = sha256(field.strip().lower())  — reference
  mappers/abstract_list_pii_hashing_mapper.py:22-31
- normalize_email: lowercase; strip dots from the local part only for
  gmail.com / googlemail.com domains; malformed emails (no '@') untouched —
  abstract_list_pii_hashing_mapper.py:89-121
- Ads shaping (hashed_email / hashed_phone_number / address_info /
  mobile_id / third_party_user_id) — mappers/ads_user_list_pii_hashing_mapper.py:26-79
- DV360 flat camelCase shaping — mappers/dv_user_list_pii_hashing_mapper.py:25-68

Everything is a Column expression (JVM-side, whole-stage codegen) — no
Python UDFs. Golden SHA-256 vectors from the reference's tests are asserted
in tests/test_hashing.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _lower_trim(col: Column) -> Column:
    return F.lower(F.trim(col))


def hash_field(col: Column, hash_enabled: bool = True) -> Column:
    """sha256(strip().lower()); pass-through (trimmed) when hashing is off.

    The reference strips/lowers *before* hashing and returns the raw field
    (stripped) when the destination's hash toggle is 'false'
    (abstract_list_pii_hashing_mapper.py:22-31,53-63).
    """
    if not hash_enabled:
        return F.trim(col)
    return F.sha2(_lower_trim(col), 256)


# local part of a gmail address: everything before '@'; domain after.
_GMAIL_DOMAIN = r"^(gmail|googlemail)\.com$"


def normalize_email(col: Column) -> Column:
    """Lowercase; for gmail/googlemail domains, strip dots in the local part.

    Malformed values (no '@') are returned unchanged (reference returns the
    raw input on parse failure, abstract_list_pii_hashing_mapper.py:113-121).
    """
    lowered = F.lower(F.trim(col))
    local = F.substring_index(lowered, "@", 1)
    domain = F.substring_index(lowered, "@", -1)
    is_email = lowered.contains("@")
    is_gmail = domain.rlike(_GMAIL_DOMAIN)
    normalized_local = F.when(is_gmail, F.regexp_replace(local, r"\.", "")).otherwise(
        local
    )
    return F.when(is_email, F.concat(normalized_local, F.lit("@"), domain)).otherwise(
        col
    )


def hash_email(col: Column, hash_enabled: bool = True) -> Column:
    """normalize then hash — the composition the reference applies to emails."""
    if not hash_enabled:
        return F.trim(col)
    return F.sha2(F.trim(normalize_email(col)), 256)


def normalize_phone(col: Column) -> Column:
    """The reference hashes phones as-is after strip/lower (no E.164
    re-formatting) — parity means we do the same."""
    return _lower_trim(col)


_ADDRESS_FIELDS = (
    "mailing_address_first_name",
    "mailing_address_last_name",
    "mailing_address_country",
    "mailing_address_zip",
)


def _present(df_cols: list[str], name: str) -> bool:
    return name in df_cols


def ads_pii_expressions(
    df: DataFrame,
    hash_enabled: bool = True,
    address_fields: tuple[str, str, str, str] = _ADDRESS_FIELDS,
) -> DataFrame:
    """Google Ads customer-match PII shaping.

    Reference mappers/ads_user_list_pii_hashing_mapper.py:26-79:
    - email → hashed_email (normalized + hashed)
    - phone → hashed_phone_number
    - address: only when ALL FOUR of first/last/country/zip are present →
      nested ``address_info`` struct; first/last hashed, country/zip NOT
      hashed (ads_user_list_pii_hashing_mapper.py:42-58)
    - mobile_device_id → mobile_id (NOT hashed)
    - user_id → third_party_user_id (hashed)
    Non-PII columns pass through untouched.
    """
    cols = df.columns
    out = df
    if _present(cols, "email"):
        out = out.withColumn("hashed_email", hash_email(F.col("email"), hash_enabled))
        out = out.drop("email")
    if _present(cols, "phone"):
        out = out.withColumn(
            "hashed_phone_number", hash_field(F.col("phone"), hash_enabled)
        )
        out = out.drop("phone")
    first, last, country, zipc = address_fields
    if all(_present(cols, c) for c in address_fields):
        all_present = (
            F.col(first).isNotNull()
            & (F.trim(F.col(first)) != "")
            & F.col(last).isNotNull()
            & (F.trim(F.col(last)) != "")
            & F.col(country).isNotNull()
            & (F.trim(F.col(country)) != "")
            & F.col(zipc).isNotNull()
            & (F.trim(F.col(zipc)) != "")
        )
        out = out.withColumn(
            "address_info",
            F.when(
                all_present,
                F.struct(
                    hash_field(F.col(first), hash_enabled).alias("hashed_first_name"),
                    hash_field(F.col(last), hash_enabled).alias("hashed_last_name"),
                    F.trim(F.col(country)).alias("country_code"),
                    F.trim(F.col(zipc)).alias("postal_code"),
                ),
            ),
        ).drop(*address_fields)
    if _present(cols, "mobile_device_id"):
        out = out.withColumnRenamed("mobile_device_id", "mobile_id")
    if _present(cols, "user_id"):
        out = out.withColumn(
            "third_party_user_id", hash_field(F.col("user_id"), hash_enabled)
        ).drop("user_id")
    return out


def dv_pii_expressions(df: DataFrame, hash_enabled: bool = True) -> DataFrame:
    """DV360 customer-match shaping — flat camelCase output.

    Reference mappers/dv_user_list_pii_hashing_mapper.py:25-68:
    hashedEmails, hashedPhoneNumbers, hashedFirstName, hashedLastName,
    countryCode, zipCodes, mobileDeviceIds. Country/zip not hashed.
    """
    cols = df.columns
    out = df
    if "email" in cols:
        out = out.withColumn(
            "hashedEmails", hash_email(F.col("email"), hash_enabled)
        ).drop("email")
    if "phone" in cols:
        out = out.withColumn(
            "hashedPhoneNumbers", hash_field(F.col("phone"), hash_enabled)
        ).drop("phone")
    renames = {
        "mailing_address_first_name": ("hashedFirstName", True),
        "mailing_address_last_name": ("hashedLastName", True),
        "mailing_address_country_name": ("countryCode", False),
        "mailing_address_country": ("countryCode", False),
        "mailing_address_zip_name": ("zipCodes", False),
        "mailing_address_zip": ("zipCodes", False),
    }
    for src, (dst, hashed) in renames.items():
        if src in out.columns and dst not in out.columns:
            expr = hash_field(F.col(src), hash_enabled) if hashed else F.trim(F.col(src))
            out = out.withColumn(dst, expr).drop(src)
    if "mobile_device_id" in cols:
        out = out.withColumnRenamed("mobile_device_id", "mobileDeviceIds")
    return out
