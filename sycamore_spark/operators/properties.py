"""Property promotion: move fields between the open JSON properties column
and typed top-level columns.

Reference context: properties are an open dict on every Document
(reference: data/document.py — dotted access document.py:318); SURVEY.md
§1.4 maps that to a two-tier scheme — promoted typed columns for known
schema + a JSON string remainder. These helpers are the tier-crossing:

- ``promote_properties``: one native ``from_json`` parse against a declared
  SchemaV2/StructType, fanned out to typed columns. After promotion,
  filters/joins/aggs on those fields are ordinary Catalyst expressions —
  pushdown, pruning, codegen — instead of repeated get_json_object calls.
- ``demote_properties``: fold typed columns back into the JSON remainder
  (for sinks that expect the open dict shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def _as_struct_type(schema) -> StructType:
    if isinstance(schema, StructType):
        return schema
    from sycamore_spark.data.schema2 import SchemaV2, to_struct_type

    if isinstance(schema, SchemaV2):
        return to_struct_type(schema)
    raise TypeError(f"expected SchemaV2 or StructType, got {type(schema)}")


def promote_properties(
    df: DataFrame,
    schema,
    props_col: str = "properties",
    prefix: str = "",
    drop_promoted: bool = False,
) -> DataFrame:
    """Parse ``props_col`` (JSON string) once against ``schema`` and add a
    typed column per schema field (optionally ``prefix``ed). With
    ``drop_promoted`` the promoted keys are removed from the JSON remainder
    so the two tiers stay disjoint."""
    from pyspark.sql.types import ArrayType, StructType as _St

    st = _as_struct_type(schema)
    parsed = F.from_json(F.coalesce(F.col(props_col), F.lit("{}")), st)
    # JSON that stores values as strings ("42") nulls out under a typed
    # from_json; fall back to a string-map parse + cast for leaf fields
    as_map = F.from_json(F.coalesce(F.col(props_col), F.lit("{}")), "map<string,string>")
    out = df
    for f in st.fields:
        col = parsed[f.name]
        if not isinstance(f.dataType, (ArrayType, _St)):
            col = F.coalesce(col, as_map[f.name].cast(f.dataType))
        out = out.withColumn(f"{prefix}{f.name}", col)
    if drop_promoted:
        names = [f.name for f in st.fields]
        remainder = F.map_filter(
            F.from_json(F.coalesce(F.col(props_col), F.lit("{}")), "map<string,string>"),
            lambda k, _: ~k.isin(names),
        )
        out = out.withColumn(props_col, F.to_json(remainder))
    return out


def demote_properties(
    df: DataFrame,
    cols: list[str],
    props_col: str = "properties",
    drop_cols: bool = True,
) -> DataFrame:
    """Fold typed columns back into the JSON properties remainder;
    existing JSON keys of the same name are overwritten."""
    existing = F.from_json(F.coalesce(F.col(props_col), F.lit("{}")), "map<string,string>")
    added = F.map_from_arrays(
        F.array(*[F.lit(c) for c in cols]),
        F.array(*[F.col(c).cast("string") for c in cols]),
    )
    merged = F.map_concat(
        F.map_filter(existing, lambda k, _: ~k.isin(cols)),
        F.map_filter(added, lambda _, v: v.isNotNull()),
    )
    out = df.withColumn(props_col, F.to_json(merged))
    return out.drop(*cols) if drop_cols else out
