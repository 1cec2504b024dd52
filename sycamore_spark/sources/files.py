"""File scans producing canonical DOC_SCHEMA documents.

Reference parity: ``BinaryScan`` (reference: lib/sycamore/sycamore/connectors/
file/file_scan.py:156 — one Document per file with binary_representation,
properties.path, extension filter, optional JSON-manifest metadata join),
``JsonScan`` (file_scan.py:291), ``JsonDocumentScan`` (file_scan.py:398),
manifest reader (file_scan.py:39, reader.py:94).

Spark-first: ``spark.read.format("binaryFile")`` is a distributed scan with
partition-parallel file reads and pathGlobFilter pushdown — the reference
lists paths on the driver. The manifest join is a broadcast join on path.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sycamore_spark.data.schema import DOC_SCHEMA


def _to_doc_shape(df: DataFrame, binary: bool) -> DataFrame:
    props = F.to_json(F.struct(
        F.col("path"),
        F.element_at(F.split(F.col("path"), r"\."), -1).alias("filetype"),
        F.col("length").cast("string").alias("size"),
    ))
    return df.select(
        F.md5(F.col("path")).alias("doc_id"),
        F.lit(None).cast("string").alias("parent_id"),
        F.element_at(F.split(F.col("path"), r"\."), -1).alias("type"),
        (F.col("content").cast("string") if not binary else F.lit(None).cast("string")).alias("text_representation"),
        (F.col("content") if binary else F.lit(None).cast("binary")).alias("binary_representation"),
        F.lit(None).cast("array<double>").alias("bbox"),
        F.lit(None).cast("array<bigint>").alias("shingles"),
        F.lit(None).cast("array<float>").alias("embedding"),
        props.alias("properties"),
        F.lit(None).cast(DOC_SCHEMA["elements"].dataType).alias("elements"),
    )


def binary_scan(
    spark: SparkSession,
    paths: str | list[str],
    binary_format: str | None = None,
    manifest_path: str | None = None,
) -> DataFrame:
    """Read files as one Document per file (binary_representation = bytes).

    ``binary_format``: extension filter, e.g. 'pdf' → pathGlobFilter=*.pdf
    (reference BinaryScan's filter_paths_by_extension).
    ``manifest_path``: JSON file of {path: {metadata...}} merged into
    properties via broadcast join (reference: file_scan.py:39 JsonManifest).
    """
    reader = spark.read.format("binaryFile")
    if binary_format:
        reader = reader.option("pathGlobFilter", f"*.{binary_format}")
    df = _to_doc_shape(reader.load(paths), binary=True)
    if manifest_path:
        manifest = json.loads(spark.sparkContext.wholeTextFiles(manifest_path).values().first())
        rows = [(k, json.dumps(v, sort_keys=True)) for k, v in manifest.items()]
        mdf = spark.createDataFrame(rows, "m_path string, m_props string")
        path_col = F.get_json_object(F.col("properties"), "$.path")
        df = (
            df.join(F.broadcast(mdf), path_col == F.col("m_path"), "left")
            .withColumn(
                "properties",
                F.when(F.col("m_props").isNull(), F.col("properties")).otherwise(
                    F.to_json(F.map_concat(
                        F.from_json("properties", "map<string,string>"),
                        F.from_json("m_props", "map<string,string>"),
                    ))
                ),
            )
            .drop("m_path", "m_props")
        )
    return df


def text_scan(spark: SparkSession, paths: str | list[str], glob: str | None = None) -> DataFrame:
    """Read text files as Documents with text_representation populated."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return _to_doc_shape(reader.load(paths), binary=False)


def json_scan(spark: SparkSession, paths: str | list[str], doc_id_field: str | None = None) -> DataFrame:
    """JSON/JSONL records → Documents: whole record into properties, text
    fields concatenated (reference JsonScan puts the record in properties)."""
    raw = spark.read.json(paths)
    doc_id = F.md5(F.to_json(F.struct(*raw.columns))) if doc_id_field is None else F.col(doc_id_field).cast("string")
    text = F.coalesce(*[F.col(c).cast("string") for c in raw.columns
                        if dict(raw.dtypes)[c] == "string"], F.lit(""))
    return raw.select(
        doc_id.alias("doc_id"),
        F.lit(None).cast("string").alias("parent_id"),
        F.lit("json").alias("type"),
        text.alias("text_representation"),
        F.lit(None).cast("binary").alias("binary_representation"),
        F.lit(None).cast("array<double>").alias("bbox"),
        F.lit(None).cast("array<bigint>").alias("shingles"),
        F.lit(None).cast("array<float>").alias("embedding"),
        F.to_json(F.struct(*raw.columns)).alias("properties"),
        F.lit(None).cast(DOC_SCHEMA["elements"].dataType).alias("elements"),
    )


def json_document_scan(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """JSON already in Document shape (reference: JsonDocumentScan)."""
    return spark.read.schema(DOC_SCHEMA).json(paths)
