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


# ---------------------------------------------------------------------------
# Tree-edit-distance table similarity (reference: data/table.py:490-587
# to_tree/TableTree/ted_score). The reference delegates the distance to the
# apted package; here the ordered-tree edit distance is the classic
# Zhang-Shasha keyroot dynamic program (public algorithm), implemented from
# the paper's recurrences — same unit costs (insert/delete 1, rename 0/1).
# ---------------------------------------------------------------------------


class TableTree:
    """Ordered tree node for TED: <table> -> <tr> rows -> <td>/<th> leaves."""

    def __init__(
        self,
        tag: str,
        colspan: Optional[int] = None,
        rowspan: Optional[int] = None,
        text: Optional[str] = None,
        children: Optional[list["TableTree"]] = None,
    ):
        self.tag = tag
        self.colspan = colspan
        self.rowspan = rowspan
        self.text = text
        self.children = children if children is not None else []

    def label(self) -> tuple:
        return (self.tag, self.colspan, self.rowspan, self.text)

    def get_size(self) -> int:
        return 1 + sum(c.get_size() for c in self.children)


def table_to_tree(table: "Table") -> TableTree:
    """Mirror of the reference's Table.to_tree row-grouping: a new <tr> opens
    whenever a cell's first row index advances; spanning cells sit in the row
    where they start (reference data/table.py:490-514)."""
    root = TableTree(tag="table")
    if not table.cells:
        return root
    curr_row = 0
    row = TableTree(tag="tr")
    root.children.append(row)
    for cell in table.cells:
        if cell.rows[0] > curr_row:
            curr_row = cell.rows[0]
            row = TableTree(tag="tr")
            root.children.append(row)
        row.children.append(
            TableTree(
                tag="th" if cell.is_header else "td",
                rowspan=len(cell.rows),
                colspan=len(cell.cols),
                text=cell.content,
            )
        )
    return root


def _tree_edit_distance(t1: TableTree, t2: TableTree) -> int:
    """Zhang-Shasha ordered tree edit distance, unit costs."""

    def postorder(root: TableTree) -> list[TableTree]:
        out: list[TableTree] = []
        stack: list[tuple[TableTree, bool]] = [(root, False)]
        while stack:
            node, visited = stack.pop()
            if visited:
                out.append(node)
            else:
                stack.append((node, True))
                for c in reversed(node.children):
                    stack.append((c, False))
        return out

    def leftmosts(order: list[TableTree]) -> list[int]:
        idx = {id(n): i for i, n in enumerate(order)}
        lm = []
        for n in order:
            m = n
            while m.children:
                m = m.children[0]
            lm.append(idx[id(m)])
        return lm

    def keyroots(lm: list[int]) -> list[int]:
        last: dict[int, int] = {}
        for i, v in enumerate(lm):
            last[v] = i  # highest postorder index per leftmost-leaf value
        return sorted(last.values())

    a, b = postorder(t1), postorder(t2)
    la, lb = leftmosts(a), leftmosts(b)
    ka, kb = keyroots(la), keyroots(lb)
    n, m = len(a), len(b)
    td = [[0] * m for _ in range(n)]

    def rename(x: TableTree, y: TableTree) -> int:
        return 0 if x.label() == y.label() else 1

    for i in ka:
        for j in kb:
            # forest distance over postorder ranges [la[i]..i] x [lb[j]..j]
            ioff, joff = la[i] - 1, lb[j] - 1
            rows_, cols_ = i - la[i] + 2, j - lb[j] + 2
            fd = [[0] * cols_ for _ in range(rows_)]
            for x in range(1, rows_):
                fd[x][0] = fd[x - 1][0] + 1
            for y in range(1, cols_):
                fd[0][y] = fd[0][y - 1] + 1
            for x in range(1, rows_):
                for y in range(1, cols_):
                    ai, bj = x + ioff, y + joff
                    if la[ai] == la[i] and lb[bj] == lb[j]:
                        fd[x][y] = min(
                            fd[x - 1][y] + 1,
                            fd[x][y - 1] + 1,
                            fd[x - 1][y - 1] + rename(a[ai], b[bj]),
                        )
                        td[ai][bj] = fd[x][y]
                    else:
                        fd[x][y] = min(
                            fd[x - 1][y] + 1,
                            fd[x][y - 1] + 1,
                            fd[la[ai] - 1 - ioff][lb[bj] - 1 - joff] + td[ai][bj],
                        )
    return td[n - 1][m - 1]


def ted_score(table1: "Table", table2: "Table") -> float:
    """TEDS similarity in [0, 1]: 1 - dist / max(|T1|, |T2|, 1)
    (reference data/table.py:571-587)."""
    tt1, tt2 = table_to_tree(table1), table_to_tree(table2)
    dist = _tree_edit_distance(tt1, tt2)
    return 1.0 - float(dist) / max(tt1.get_size(), tt2.get_size(), 1)
