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


_TABLE_RE = re.compile(r"<table\b.*?</table>", re.S | re.I)


def _parse_fragment(html: str) -> list[tuple[str, str]]:
    p = _HtmlExtractor()
    try:
        p.feed(html)
    except Exception:
        text = re.sub(r"<[^>]+>", " ", html).strip()
        return [("text", text)] if text else []
    return p.elements


def _html_elements(html: str, extract_tables: bool = False) -> list[dict]:
    if not extract_tables:
        els = _parse_fragment(html)
        if not els:
            return [_element(0, "text", re.sub(r"<[^>]+>", " ", html))]
        return [_element(i, kind, text) for i, (kind, text) in enumerate(els)]

    # table mode (reference HtmlPartitioner extract_tables, partition.py:38):
    # <table> regions become structured 'table' elements (parsed through the
    # Table model, emitted as CSV text), interleaved in document order with
    # the surrounding prose elements
    from sycamore_spark.data.table import Table

    out: list[tuple[str, str]] = []
    pos = 0
    for m in _TABLE_RE.finditer(html):
        out.extend(_parse_fragment(html[pos:m.start()]))
        try:
            out.append(("table", Table.from_html(m.group(0)).to_csv()))
        except Exception:
            out.append(("table", re.sub(r"<[^>]+>", " ", m.group(0)).strip()))
        pos = m.end()
    out.extend(_parse_fragment(html[pos:]))
    return [_element(i, kind, text) for i, (kind, text) in enumerate(out)]


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
    def __init__(self, extract_tables: bool = False):
        self.extract_tables = extract_tables

    def __call__(self, row: dict) -> list[dict]:
        raw = row.get("binary_representation")
        html = (bytes(raw).decode("utf-8", "replace") if raw is not None
                else row.get("text_representation") or "")
        return _html_elements(html, extract_tables=self.extract_tables)


class TextractTableExtractor:
    """AWS Textract table extraction seam (reference
    transforms/extract_table.py:32 TextractTableExtractor) — a live cloud
    service client; gated in this container. Use
    ``HtmlPartitioner(extract_tables=True)`` for the native path."""

    def __init__(self, **params):
        self.params = params

    def __call__(self, row: dict) -> list[dict]:
        raise NotImplementedError(
            "TextractTableExtractor requires AWS Textract credentials and "
            "network access; wire boto3/textractor here in deployment."
        )


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
            "TextPartitioner/FakeLayoutPartitioner, or plug a remote "
            "partitioning service here."
        )


class FakeLayoutPartitioner:
    """Deterministic layout-simulation partitioner: the contract test double
    for the DETR path. Produces the element taxonomy a real layout model
    emits — Page-header / Title / Text / table / Page-footer plus sub-minimum
    noise boxes — with bboxes derived (stably) from the content hash, so the
    downstream bbox transforms (mark_bbox_preset, merge_marked, TableMerger)
    can be exercised end-to-end with hash-stable output.

    Implements ``partition_batch`` — the batched-inference contract
    (one model call per Arrow batch, reference detr_partitioner's batch
    inference loop) — rather than the per-row ``__call__``.
    """

    def __init__(self, max_pages: int = 3):
        self.max_pages = max_pages

    def partition_batch(self, pdf: pd.DataFrame) -> list[list[dict]]:
        import hashlib

        out: list[list[dict]] = []
        for row in pdf.to_dict("records"):
            raw = row.get("binary_representation")
            text = (bytes(raw).decode("utf-8", "replace") if raw is not None
                    else row.get("text_representation") or "")
            h = int.from_bytes(hashlib.md5(text.encode()).digest()[:4], "big")
            words = text.split() or ["empty"]
            n_pages = 1 + h % self.max_pages
            els: list[dict] = []
            per_page = max(1, len(words) // (n_pages * 3))
            w = 0
            for page in range(1, n_pages + 1):
                ph = (h + page) % 97 / 970.0  # 0..0.1 jitter

                def add(kind, text_val, bbox):
                    els.append({**_element(len(els), kind, text_val),
                                "page_number": page, "bbox": bbox})

                add("Page-header", f"p{page} header", [0.1, 0.01, 0.9, 0.04])
                add("Title" if page == 1 else "Section-header",
                    " ".join(words[w:w + 3]) or "untitled",
                    [0.1, 0.06, 0.9, 0.06 + 0.03 + ph / 10])
                for b in range(3):
                    chunk = " ".join(words[w:w + per_page]) or f"blank {page}-{b}"
                    w += per_page
                    y0 = 0.12 + b * 0.2 + ph / 20
                    add("Text", chunk, [0.1, y0, 0.9, y0 + 0.15])
                # sub-minimum-area noise box (dropped by mark_drop_tiny)
                add("Text", "speck", [0.5, 0.5, 0.5005, 0.5005])
                add("table", f"table on page {page}: " + " ".join(words[w:w + 4]),
                    [0.1, 0.78, 0.9, 0.92])
                add("Page-footer", f"page {page}", [0.4, 0.97, 0.6, 0.99])
            out.append(els)
        return out


def partition(df: DataFrame, partitioner) -> DataFrame:
    """Apply a partitioner to each document, filling ``elements``
    (reference: docset.partition, docset.py:295).

    Partitioner contract: either per-row ``__call__(row) -> list[element]``
    or batched ``partition_batch(pdf) -> list[list[element]]`` (one entry per
    row — the shape real model inference uses: one forward pass per Arrow
    batch). ``partition_batch`` wins when both exist."""
    schema = df.schema
    batch_fn = getattr(partitioner, "partition_batch", None)

    def run(it: Iterable[pd.DataFrame]):
        for pdf in it:
            rows = pdf.to_dict("records")
            if batch_fn is not None:
                all_els = batch_fn(pdf)
                if len(all_els) != len(rows):
                    raise ValueError(
                        f"partition_batch returned {len(all_els)} element lists "
                        f"for {len(rows)} rows — the contract is one per row"
                    )
            else:
                all_els = [partitioner(row) for row in rows]
            for row, els in zip(rows, all_els):
                row["elements"] = els
                if row.get("properties"):
                    props = json.loads(row["properties"])
                else:
                    props = {}
                props["_partitioned"] = "true"
                row["properties"] = json.dumps(props, sort_keys=True)
            yield pd.DataFrame(rows, columns=pdf.columns)

    return df.mapInPandas(run, schema=schema)
