"""Partitioners: parse raw file bytes/text into structured elements.

Reference parity: ``Partition`` transform with pluggable partitioners
(reference: lib/sycamore/sycamore/transforms/partition.py:390) —
``HtmlPartitioner`` (partition.py:38) and the DETR-based ``ArynPartitioner``
(partition.py:165, detr_partitioner.py). The DETR/OCR model path needs
torch + model weights that are deliberately absent here: ``ArynPartitioner``
raises NotImplementedError at call time with the real Spark plumbing
(schema, batching, per-task dispatch) in place and tested via the
deterministic partitioners.

Partitioning is per-row and stateless → Arrow-batched mapInPandas, the same
physical shape model inference would use.
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterable
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame


class _HtmlExtractor(HTMLParser):
    """Minimal stdlib HTML → elements (bs4 is not available in this
    container; the reference uses BeautifulSoup)."""

    BLOCK = {"p", "li", "td", "th", "pre", "blockquote"}
    HEAD = {"h1", "h2", "h3", "h4", "h5", "h6", "title"}

    def __init__(self):
        super().__init__()
        self.elements: list[tuple[str, str]] = []
        self._stack: list[str] = []
        self._buf: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in self.BLOCK or tag in self.HEAD:
            self._flush()
            self._stack.append(tag)

    def handle_endtag(self, tag):
        if self._stack and self._stack[-1] == tag:
            self._flush(tag)
            self._stack.pop()

    def handle_data(self, data):
        if self._stack and data.strip():
            self._buf.append(data)

    def _flush(self, tag: str | None = None):
        if self._buf and tag:
            text = re.sub(r"\s+", " ", " ".join(self._buf)).strip()
            if text:
                kind = ("title" if tag in ("h1", "title")
                        else "heading" if tag in self.HEAD
                        else "list-item" if tag == "li" else "text")
                self.elements.append((kind, text))
        self._buf = []


def _html_elements(html: str) -> list[dict]:
    p = _HtmlExtractor()
    try:
        p.feed(html)
    except Exception:
        return [_element(0, "text", re.sub(r"<[^>]+>", " ", html))]
    return [_element(i, kind, text) for i, (kind, text) in enumerate(p.elements)]


def _text_elements(text: str) -> list[dict]:
    """Paragraph partitioner: split on blank lines."""
    paras = [p.strip() for p in re.split(r"\n\s*\n", text or "") if p.strip()]
    return [_element(i, "text", p) for i, p in enumerate(paras)]


def _element(i: int, kind: str, text: str) -> dict:
    return {
        "element_index": i, "type": kind, "text_representation": text,
        "binary_representation": None, "bbox": None, "page_number": 1,
        "embedding": None, "properties": None,
    }


class HtmlPartitioner:
    def __call__(self, row: dict) -> list[dict]:
        raw = row.get("binary_representation")
        html = (bytes(raw).decode("utf-8", "replace") if raw is not None
                else row.get("text_representation") or "")
        return _html_elements(html)


class TextPartitioner:
    def __call__(self, row: dict) -> list[dict]:
        raw = row.get("binary_representation")
        text = (bytes(raw).decode("utf-8", "replace") if raw is not None
                else row.get("text_representation") or "")
        return _text_elements(text)


class ArynPartitioner:
    """DETR layout-analysis partitioner (reference: partition.py:165,
    detr_partitioner.py:779). Model inference is STUBBED in this container:
    torch/weights unavailable. The operator participates in the same
    mapInPandas plumbing; calling it raises."""

    def __call__(self, row: dict) -> list[dict]:
        raise NotImplementedError(
            "ArynPartitioner requires the DETR model stack (torch + weights), "
            "not available in this environment. Use HtmlPartitioner/"
            "TextPartitioner, or plug a remote partitioning service here."
        )


def partition(df: DataFrame, partitioner) -> DataFrame:
    """Apply a partitioner to each document, filling ``elements``
    (reference: docset.partition, docset.py:295)."""
    schema = df.schema

    def run(it: Iterable[pd.DataFrame]):
        for pdf in it:
            rows = pdf.to_dict("records")
            for row in rows:
                row["elements"] = partitioner(row)
                if row.get("properties"):
                    props = json.loads(row["properties"])
                else:
                    props = {}
                props["_partitioned"] = "true"
                row["properties"] = json.dumps(props, sort_keys=True)
            yield pd.DataFrame(rows, columns=pdf.columns)

    return df.mapInPandas(run, schema=schema)
