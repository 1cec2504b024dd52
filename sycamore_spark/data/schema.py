"""Canonical typed document schema.

Reference parity: ``Document`` is a schemaless UserDict pickled per row
(reference: lib/sycamore/sycamore/data/document.py:31,280-288) and
``Element`` a chunk of one (data/element.py:14). The single biggest
architectural change in this rebuild (SURVEY.md §1.2): documents live in
typed Arrow/Tungsten columns, not opaque pickles — so Catalyst can prune,
push down, and codegen over them. The open-ended ``properties`` dict is kept
as a JSON string column (dotted-path access via functions/fields.py); known
properties can be promoted to typed columns per pipeline.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Element: same shape as Document minus identity fields; element_index orders
# elements within a document (reference: element.py:28).
ELEMENT_SCHEMA = StructType([
    StructField("element_index", IntegerType()),
    StructField("type", StringType()),
    StructField("text_representation", StringType()),
    StructField("binary_representation", BinaryType()),
    StructField("bbox", ArrayType(DoubleType())),     # (x1, y1, x2, y2)
    StructField("page_number", IntegerType()),
    StructField("embedding", ArrayType(FloatType())),
    StructField("properties", StringType()),          # JSON object
])

DOC_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("parent_id", StringType()),
    StructField("type", StringType()),
    StructField("text_representation", StringType()),
    StructField("binary_representation", BinaryType()),
    StructField("bbox", ArrayType(DoubleType())),
    StructField("shingles", ArrayType(LongType())),
    StructField("embedding", ArrayType(FloatType())),
    StructField("properties", StringType()),          # JSON object
    StructField("elements", ArrayType(ELEMENT_SCHEMA)),
])

_DOC_FIELDS = [f.name for f in DOC_SCHEMA.fields]
_ELEMENT_FIELDS = [f.name for f in ELEMENT_SCHEMA.fields]


def make_element(**kwargs) -> dict:
    el = {k: None for k in _ELEMENT_FIELDS}
    props = kwargs.pop("properties", None)
    if isinstance(props, dict):
        props = json.dumps(props, sort_keys=True)
    el.update(kwargs)
    el["properties"] = props
    return el


def make_doc(**kwargs) -> dict:
    doc = {k: None for k in _DOC_FIELDS}
    props = kwargs.pop("properties", None)
    if isinstance(props, dict):
        props = json.dumps(props, sort_keys=True)
    elements = kwargs.pop("elements", None)
    if elements is not None:
        elements = [make_element(**e) if isinstance(e, dict) else e for e in elements]
        for i, el in enumerate(elements):
            if isinstance(el, dict) and el.get("element_index") is None:
                el["element_index"] = i
    doc.update(kwargs)
    doc["properties"] = props
    doc["elements"] = elements
    if doc["doc_id"] is None:
        doc["doc_id"] = str(uuid.uuid4())
    return doc


def docs_from_rows(spark: SparkSession, rows: list[dict]) -> DataFrame:
    """In-memory scan (reference: reader.py:194 ``docset from docs``)."""
    return spark.createDataFrame([make_doc(**r) for r in rows], schema=DOC_SCHEMA)


def empty_docs(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], schema=DOC_SCHEMA)
