"""Date/time scalar functions (reference uploaders/utils.py:27-109).

All native Spark expressions — timezone math runs JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The reference hardcodes America/Sao_Paulo (uploaders/utils.py:29).
# Kept as the parity default but configurable.
DEFAULT_TIMEZONE = "America/Sao_Paulo"

# Reference parse format '%Y-%m-%dT%H:%M:%S.%f' (uploaders/utils.py:54)
_INPUT_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def parse_reference_timestamp(col: Column) -> Column:
    """Parse the reference's '%Y-%m-%dT%H:%M:%S.%f' strings (fractional part
    of variable length) into a timestamp. Falls back to a plain cast for
    values already in timestamp-compatible form."""
    return F.coalesce(
        F.to_timestamp(col, _INPUT_FMT),
        F.to_timestamp(col, "yyyy-MM-dd'T'HH:mm:ss.SSS"),
        F.to_timestamp(col, "yyyy-MM-dd'T'HH:mm:ss.S"),
        F.to_timestamp(col),
        col.cast("timestamp"),
    )


def format_date(col: Column, tz: str = DEFAULT_TIMEZONE) -> Column:
    """'YYYY-MM-DD HH:MM:SS±HH:MM' in the target timezone.

    Reference format_date (uploaders/utils.py:27-58): parse, localize to
    America/Sao_Paulo, emit with a colon-separated UTC offset. The input is
    interpreted as a wall-clock time in ``tz`` (the reference localizes a
    naive datetime).
    """
    ts = parse_reference_timestamp(col)
    # Spark session TZ is UTC; the naive input is wall-clock in `tz`.
    # to_utc_timestamp(ts, tz) gives the corresponding UTC instant; we then
    # render it back in `tz` with the offset suffix.
    utc_instant = F.to_utc_timestamp(ts, tz)
    local = F.from_utc_timestamp(utc_instant, tz)
    # offset = local wall clock minus the UTC instant, rendered ±HH:MM
    diff_sec = F.unix_timestamp(local) - F.unix_timestamp(utc_instant)
    sign = F.when(diff_sec < 0, F.lit("-")).otherwise(F.lit("+"))
    abs_sec = F.abs(diff_sec)
    hh = F.lpad((abs_sec / 3600).cast("int").cast("string"), 2, "0")
    mm = F.lpad(((abs_sec % 3600) / 60).cast("int").cast("string"), 2, "0")
    return F.concat(
        F.date_format(local, "yyyy-MM-dd HH:mm:ss"), sign, hh, F.lit(":"), mm
    )


def timestamp_micros(col: Column) -> Column:
    """Microseconds since epoch (reference get_timestamp_micros,
    uploaders/utils.py:60-66 — floor(ts * 1e6))."""
    # cast: no-op for TimestampType, value-preserving for TIMESTAMP_NTZ
    # under a UTC session zone (unix_micros rejects NTZ inputs)
    return F.unix_micros(parse_reference_timestamp(col).cast("timestamp"))


def convert_datetime_tz(col: Column, from_tz: str, to_tz: str) -> Column:
    """Reinterpret a naive timestamp from one tz to another
    (reference convert_datetime_tz, uploaders/utils.py:107-109)."""
    return F.from_utc_timestamp(F.to_utc_timestamp(col, from_tz), to_tz)
