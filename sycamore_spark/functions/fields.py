"""Dotted-path field access over hybrid typed/JSON columns.

Reference parity: ``field_to_value`` dotted lookup on dynamic dicts
(reference: lib/sycamore/sycamore/data/document.py:318). Spark-first version:
if the path resolves through typed (struct) columns use a native column
reference (prunable, pushable); if it descends into a JSON string column use
``get_json_object`` on the remainder of the path; if it descends into a
Spark 4 VariantType column use ``variant_get`` on the binary-encoded value
(parse once with ``parse_properties_variant``, then every downstream dotted
access skips JSON string re-parsing — the modern engine shape for the
reference's open ``properties`` dict).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType

try:  # Spark >= 4 only
    from pyspark.sql.types import VariantType
except ImportError:  # pragma: no cover
    VariantType = None


def field_expr(df: DataFrame, field: str) -> Column:
    """Resolve a dotted path like ``properties.entity.location`` to a Column.

    Walks the DataFrame schema as far as typed structs go; if the walk lands
    on a StringType column with path segments remaining, the remainder is
    extracted with ``get_json_object`` (JSON-encoded open properties).
    """
    parts = field.split(".")
    schema = df.schema
    prefix: list[str] = []
    dtype = None
    for i, part in enumerate(parts):
        if not isinstance(schema, StructType) or part not in schema.fieldNames():
            break
        prefix.append(part)
        dtype = schema[part].dataType
        schema = dtype
    else:
        return F.col(field)

    if prefix and isinstance(dtype, StringType):
        rest = parts[len(prefix):]
        if rest:
            return F.get_json_object(F.col(".".join(prefix)), "$." + ".".join(rest))
    if prefix and VariantType is not None and isinstance(dtype, VariantType):
        rest = parts[len(prefix):]
        if rest:
            # extract as string for parity with the get_json_object path;
            # callers cast to the target type exactly as before
            return F.variant_get(F.col(".".join(prefix)), "$." + ".".join(rest), "string")
    # Fall back to a plain column reference; Spark raises a clear error if absent.
    return F.col(field)


def parse_properties_variant(df: DataFrame, col: str = "properties") -> DataFrame:
    """Parse a JSON-string open-properties column into Spark 4 VariantType
    ONCE; every later dotted access compiles to ``variant_get`` over the
    binary encoding instead of re-parsing the JSON string per expression —
    the right trade whenever more than one property is read downstream.
    No-op (with a clear error from parse_json) on non-string input."""
    from sycamore_spark import compat

    compat.require("variant")
    return df.withColumn(col, F.parse_json(F.col(col)))
