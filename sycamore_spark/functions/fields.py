"""Dotted-path field access over hybrid typed/JSON columns.

Reference parity: ``field_to_value`` dotted lookup on dynamic dicts
(reference: lib/sycamore/sycamore/data/document.py:318). Spark-first version:
if the path resolves through typed (struct) columns use a native column
reference (prunable, pushable); if it descends into a JSON string column use
``get_json_object`` on the remainder of the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType


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
    # Fall back to a plain column reference; Spark raises a clear error if absent.
    return F.col(field)
