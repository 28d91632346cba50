from megalista_spark.functions.hashing import (
    ads_pii_expressions,
    dv_pii_expressions,
    hash_field,
    normalize_email,
    normalize_phone,
)
from megalista_spark.functions.dates import (
    format_date,
    timestamp_micros,
    convert_datetime_tz,
)
from megalista_spark.functions.text import only_numbers, trim_col

__all__ = [
    "ads_pii_expressions",
    "dv_pii_expressions",
    "hash_field",
    "normalize_email",
    "normalize_phone",
    "format_date",
    "timestamp_micros",
    "convert_datetime_tz",
    "only_numbers",
    "trim_col",
]
