from sycamore_spark.data.schema import DOC_SCHEMA, ELEMENT_SCHEMA, empty_docs, docs_from_rows

__all__ = ["DOC_SCHEMA", "ELEMENT_SCHEMA", "empty_docs", "docs_from_rows"]
