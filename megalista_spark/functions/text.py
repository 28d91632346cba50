"""Small text scalar helpers (reference utils/utils.py:18-28)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def only_numbers(col: Column) -> Column:
    """Strip every non-digit (reference filter_text_only_numbers,
    utils/utils.py:18-20)."""
    return F.regexp_replace(col, r"[^0-9]", "")


def trim_col(col: Column) -> Column:
    """Whitespace-trim (reference trim/trim_items_array, utils/utils.py:22-28)."""
    return F.trim(col)
