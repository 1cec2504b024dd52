"""Extracted-table data model: spanning cells, HTML round-trip, CSV/pandas.

Reference parity: ``TableCell`` (content, rows, cols, is_header, bbox,
properties — spans must be contiguous) and ``Table`` (cells sorted by
(min row, min col); ``from_html`` table.py:203, ``to_pandas`` :305 with the
header-prefix + first-cell-only rendering rules, ``to_csv`` :370,
``to_html`` :389) — reference: lib/sycamore/sycamore/data/table.py.
The implementation here is original (stdlib HTMLParser + the documented
rendering rules), not a port of the reference code.

Spark representation (SURVEY.md §1.1): a table is an
``array<struct<content string, rows array<int>, cols array<int>,
is_header boolean, bbox array<double>>>`` column on an element;
``cells_to_table``/``table_to_cells`` convert between that row shape and
this model inside pandas UDFs.
"""

from __future__ import annotations

import csv
import io
from dataclasses import dataclass, field
from html.parser import HTMLParser
from typing import Any, Optional

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

TABLE_CELL_SCHEMA = StructType(
    [
        StructField("content", StringType()),
        StructField("rows", ArrayType(IntegerType())),
        StructField("cols", ArrayType(IntegerType())),
        StructField("is_header", BooleanType()),
        StructField("bbox", ArrayType(DoubleType())),
    ]
)
TABLE_SCHEMA = ArrayType(TABLE_CELL_SCHEMA)


@dataclass
class TableCell:
    content: str
    rows: list[int]
    cols: list[int]
    is_header: bool = False
    bbox: Optional[tuple[float, float, float, float]] = None
    properties: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self):
        self.rows = sorted(self.rows)
        self.cols = sorted(self.cols)
        for seq, what in ((self.rows, "rows"), (self.cols, "cols")):
            if any(b - a != 1 for a, b in zip(seq, seq[1:])):
                raise ValueError(f"Found non-contiguous {what} in {self}.")

    def to_dict(self) -> dict[str, Any]:
        d: dict[str, Any] = {"content": self.content, "rows": self.rows, "cols": self.cols}
        if self.is_header:
            d["is_header"] = True
        if self.bbox is not None:
            d["bbox"] = list(self.bbox)
        if self.properties:
            d["properties"] = self.properties
        return d

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "TableCell":
        return cls(
            content=d["content"],
            rows=list(d["rows"]),
            cols=list(d["cols"]),
            is_header=bool(d.get("is_header", False)),
            bbox=tuple(d["bbox"]) if d.get("bbox") else None,
            properties=dict(d.get("properties") or {}),
        )


class Table:
    def __init__(self, cells: list[TableCell], caption: Optional[str] = None):
        self.cells = sorted(cells, key=lambda c: (min(c.rows), min(c.cols)))
        self.caption = caption

    @property
    def num_rows(self) -> int:
        return 1 + max((r for c in self.cells for r in c.rows), default=-1)

    @property
    def num_cols(self) -> int:
        return 1 + max((k for c in self.cells for k in c.cols), default=-1)

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, Table)
            and self.caption == other.caption
            and [c.to_dict() for c in self.cells] == [c.to_dict() for c in other.cells]
        )

    # -- conversions --------------------------------------------------------

    def _grid(self) -> tuple[list[list[Optional[str]]], int]:
        """Materialize the (lossy) rectangular grid per the reference's
        rendering rules (table.py:290-360): a leading run of header rows is
        the 'header prefix'; header content is duplicated across its column
        span (so every column gets a qualified header) but blanked in later
        rows of a row span; body cells render content only at their top-left
        coordinate, '' elsewhere."""
        header_rows = sorted({r for c in self.cells if c.is_header for r in c.rows})
        max_header_prefix_row = -1
        for i, r in enumerate(header_rows):
            if r != i:
                break
            max_header_prefix_row = i

        grid: list[list[Optional[str]]] = [
            [None] * self.num_cols for _ in range(self.num_rows)
        ]
        for cell in self.cells:
            if cell.is_header and cell.rows[0] <= max_header_prefix_row:
                for k in cell.cols:
                    grid[cell.rows[0]][k] = cell.content
                    for r in cell.rows[1:]:
                        grid[r][k] = ""
            else:
                for r in cell.rows:
                    for k in cell.cols:
                        grid[r][k] = cell.content if (r == cell.rows[0] and k == cell.cols[0]) else ""
        return grid, max_header_prefix_row

    def column_headers(self) -> list[str]:
        """Per-column flattened headers, multi-row joined with ' | '
        (dedup preserving order, reference table.py:355-360)."""
        grid, hmax = self._grid()
        headers = []
        for k in range(self.num_cols):
            seen: dict[str, None] = {}
            for r in range(hmax + 1):
                v = grid[r][k]
                if v not in (None, ""):
                    seen.setdefault(v)
            headers.append(" | ".join(seen))
        return headers

    def to_pandas(self):
        from pandas import DataFrame

        grid, hmax = self._grid()
        body = grid[hmax + 1 :]
        return DataFrame(body, columns=self.column_headers() if hmax >= 0 else None)

    def to_csv(self, **kwargs) -> str:
        has_header = any(0 in c.rows for c in self.cells if c.is_header)
        opts = {"index": False, "header": has_header}
        opts.update(kwargs)
        return self.to_pandas().to_csv(**opts)

    def to_html(self) -> str:
        """Emit th/td with rowspan/colspan at each cell's top-left slot."""
        out = io.StringIO()
        out.write("<table>")
        if self.caption:
            out.write(f"<caption>{_esc(self.caption)}</caption>")
        by_start: dict[int, list[TableCell]] = {}
        for c in self.cells:
            by_start.setdefault(c.rows[0], []).append(c)
        for r in range(self.num_rows):
            out.write("<tr>")
            for c in sorted(by_start.get(r, []), key=lambda c: c.cols[0]):
                tag = "th" if c.is_header else "td"
                attrs = ""
                if len(c.rows) > 1:
                    attrs += f' rowspan="{len(c.rows)}"'
                if len(c.cols) > 1:
                    attrs += f' colspan="{len(c.cols)}"'
                out.write(f"<{tag}{attrs}>{_esc(c.content)}</{tag}>")
            out.write("</tr>")
        out.write("</table>")
        return out.getvalue()

    @classmethod
    def from_html(cls, html: str) -> "Table":
        parser = _TableHTMLParser()
        parser.feed(html)
        parser.close()
        if parser.cells is None:
            raise ValueError("No <table> found in HTML")
        return cls(parser.cells, caption=parser.caption)

    # -- Spark row shape ----------------------------------------------------

    def to_spark_rows(self) -> list[dict[str, Any]]:
        return [
            {
                "content": c.content,
                "rows": c.rows,
                "cols": c.cols,
                "is_header": c.is_header,
                "bbox": list(c.bbox) if c.bbox else None,
            }
            for c in self.cells
        ]

    @classmethod
    def from_spark_rows(cls, rows: list[dict[str, Any]], caption: str | None = None) -> "Table":
        return cls(
            [
                TableCell(
                    content=r["content"] or "",
                    rows=list(r["rows"]),
                    cols=list(r["cols"]),
                    is_header=bool(r.get("is_header")),
                    bbox=tuple(r["bbox"]) if r.get("bbox") else None,
                )
                for r in rows
            ],
            caption=caption,
        )


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


class _TableHTMLParser(HTMLParser):
    """First-<table> parser with rowspan/colspan occupancy tracking;
    th or thead-membership marks headers."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.cells: Optional[list[TableCell]] = None
        self.caption: Optional[str] = None
        self._done = False
        self._in_table = False
        self._in_thead = False
        self._in_caption = False
        self._in_cell = False
        self._cell_is_th = False
        self._row = -1
        self._text: list[str] = []
        self._span: tuple[int, int] = (1, 1)
        self._occupied: set[tuple[int, int]] = set()

    def handle_starttag(self, tag, attrs):
        if self._done:
            return
        a = dict(attrs)
        if tag == "table":
            if self._in_table:
                return  # nested tables: treat inner markup as text-free
            self._in_table = True
            self.cells = []
            return
        if not self._in_table:
            return
        if tag == "thead":
            self._in_thead = True
        elif tag == "caption":
            self._in_caption = True
            self._text = []
        elif tag == "tr":
            self._row += 1
        elif tag in ("td", "th"):
            self._in_cell = True
            self._cell_is_th = tag == "th"
            self._text = []
            try:
                rs = max(1, int(a.get("rowspan", 1)))
            except ValueError:
                rs = 1
            try:
                cs = max(1, int(a.get("colspan", 1)))
            except ValueError:
                cs = 1
            self._span = (rs, cs)

    def handle_endtag(self, tag):
        if self._done or not self._in_table:
            return
        if tag == "table":
            self._in_table = False
            self._done = True
        elif tag == "thead":
            self._in_thead = False
        elif tag == "caption":
            self._in_caption = False
            self.caption = "".join(self._text).strip() or None
        elif tag in ("td", "th") and self._in_cell:
            self._in_cell = False
            row = max(self._row, 0)
            col = 0
            while (row, col) in self._occupied:
                col += 1
            rs, cs = self._span
            rows = list(range(row, row + rs))
            cols = list(range(col, col + cs))
            for r in rows:
                for k in cols:
                    self._occupied.add((r, k))
            assert self.cells is not None
            self.cells.append(
                TableCell(
                    content="".join(self._text).strip(),
                    rows=rows,
                    cols=cols,
                    is_header=self._cell_is_th or self._in_thead,
                )
            )

    def handle_data(self, data):
        if (self._in_cell or self._in_caption) and not self._done:
            self._text.append(data)
