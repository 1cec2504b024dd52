"""Reference-named reader/writer facade sugar (reader.py): pandas/arrow
in-memory scans, json_document, manifest, and the write-side db protocol
hook (reference reader.py pandas/arrow/json_document scans + manifest
metadata provider, writer.py BaseDBWriter entry)."""

import json

import pandas as pd
import pyarrow as pa
import pytest

from sycamore_spark.reader import DocSetReader, DocSetWriter


def test_pandas_and_arrow_scans(spark):
    rd = DocSetReader(spark)
    assert rd.pandas(pd.DataFrame({"a": [1, 2]})).to_df().count() == 2
    assert rd.arrow(pa.table({"a": [1, 2, 3]})).to_df().count() == 3


def test_json_document_alias(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        json.dumps({"doc_id": "d1", "type": "text", "text_representation": "hello"})
        + "\n"
    )
    rd = DocSetReader(spark)
    rows = rd.json_document(str(p)).to_df().collect()
    assert [r.doc_id for r in rows] == ["d1"]


def test_manifest_scan_merges_properties(spark, tmp_path):
    f = tmp_path / "a.txt"
    f.write_bytes(b"payload")
    manifest = tmp_path / "manifest.json"
    # binaryFile reports file: URIs — manifest keys must match that form
    manifest.write_text(json.dumps({f"file:{f}": {"source": "unit"}}))
    rd = DocSetReader(spark)
    rows = rd.manifest(str(tmp_path), str(manifest), binary_format="txt").to_df().collect()
    assert len(rows) == 1
    props = json.loads(rows[0].properties)
    assert props["source"] == "unit"


def test_writer_db_protocol_hook(spark, tmp_path):
    from sycamore_spark.connectors import (
        JsonlDirClient,
        JsonlDirClientParams,
        JsonlDirTargetParams,
    )
    from sycamore_spark.docset import DocSet

    df = spark.createDataFrame([("d1", "hello")], "doc_id string, text string")
    w = DocSetWriter(DocSet(df))
    record_fn = lambda row: {"doc_id": row["doc_id"], "text": row["text"]}  # noqa: E731
    w.db(
        JsonlDirClient,
        JsonlDirClientParams(str(tmp_path)),
        JsonlDirTargetParams("out"),
        record_fn,
    )
    written = []
    for p in (tmp_path / "out").glob("*.jsonl"):
        written += [json.loads(line) for line in p.read_text().splitlines()]
    assert written == [{"doc_id": "d1", "text": "hello"}]


def test_docset_show_reference_options(spark, capsys):
    """DocSet.show option parity (reference docset.py:68-145): element
    collapse/slice, <n bytes> binary masking, <n floats> embeddings,
    <k chars> text truncation."""
    import io

    from sycamore_spark.data.schema import docs_from_rows
    from sycamore_spark.docset import DocSet

    ds = DocSet(docs_from_rows(spark, [{
        "doc_id": "d1",
        "text_representation": "x" * 150,
        "binary_representation": b"\x00" * 32,
        "embedding": [0.0] * 8,
        "elements": [
            {"text_representation": "e" * 150, "binary_representation": b"\x01" * 7},
            {"text_representation": "second"},
        ],
    }]))
    buf = io.StringIO()
    ds.show(stream=buf)
    out = buf.getvalue()
    assert "<50 chars>" in out            # text truncated at 100 (pprint may wrap)
    assert "<32 bytes>" in out and "<7 bytes>" in out
    assert "<8 floats>" in out
    buf2 = io.StringIO()
    ds.show(show_elements=False, stream=buf2)
    assert "<2 elements>" in buf2.getvalue()
    buf3 = io.StringIO()
    ds.show(num_elements=1, truncate_content=False, show_binary=True, stream=buf3)
    o3 = buf3.getvalue()
    assert "second" not in o3 and "x" * 150 in o3
