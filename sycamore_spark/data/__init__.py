from sycamore_spark.data.schema import DOC_SCHEMA, ELEMENT_SCHEMA, empty_docs, docs_from_rows
from sycamore_spark.data.schema2 import Schema, SchemaV2, NamedProperty, Property, to_struct_type
from sycamore_spark.data.table import Table, TableCell, TABLE_SCHEMA

__all__ = [
    "DOC_SCHEMA", "ELEMENT_SCHEMA", "empty_docs", "docs_from_rows",
    "Schema", "SchemaV2", "NamedProperty", "Property", "to_struct_type",
    "Table", "TableCell", "TABLE_SCHEMA",
]
