"""Document-structure transforms over the ``elements`` array column.

Reference parity (SURVEY.md §2.9): Explode (transforms/explode.py:10-65),
spread_properties (transforms/spread_properties.py:8), Merge
(transforms/merge_elements.py), SplitElements (transforms/split_elements.py:12),
regex_replace (transforms/regex_replace.py:16), markdown
(transforms/markdown.py:8-54), bbox marks (transforms/bbox_merge.py,
transforms/mark_misc.py), AssignDocProperties
(transforms/assign_doc_properties.py:8).

Everything is per-document (embarrassingly parallel — zero shuffle). Array
manipulations use native higher-order functions where the logic is
expressible (filter/map/spread/marks); the stateful within-doc folds
(greedy merge, recursive split) use Arrow-batched pandas transforms, which
is the idiomatic Spark shape for per-row imperative logic.
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable, Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType

from sycamore_spark.data.schema import DOC_SCHEMA

# Reference preset (regex_replace.py COALESCE_WHITESPACE).
COALESCE_WHITESPACE = [(r"\s+", " "), (r"^ ", ""), (r" $", "")]


# ---------------------------------------------------------------------------
# Explode / unexplode
# ---------------------------------------------------------------------------

def explode_elements(df: DataFrame) -> DataFrame:
    """Promote each element to a top-level child document; parents are kept
    with their elements cleared (reference: transforms/explode.py:41-55 —
    children get parent_id, inherit the parent's properties).

    SINGLE pass: each input row generates ``[parent] ++ children`` through
    one explode. The earlier parents-UNION-children form referenced df from
    two branches, recomputing the whole upstream lineage once per branch —
    in a composed pipeline (doc_etl_e2e) that doubled every upstream stage."""
    none_elements = F.lit(None).cast(DOC_SCHEMA["elements"].dataType)
    parent = F.struct(
        F.col("doc_id").alias("doc_id"),
        F.col("parent_id").alias("parent_id"),
        F.col("type").alias("type"),
        F.col("text_representation").alias("text_representation"),
        F.col("binary_representation").alias("binary_representation"),
        F.col("bbox").alias("bbox"),
        F.col("shingles").alias("shingles"),
        F.col("embedding").cast(DOC_SCHEMA["embedding"].dataType).alias("embedding"),
        F.col("properties").alias("properties"),
        none_elements.alias("elements"),
    )

    def child(el):
        return F.struct(
            F.concat(F.col("doc_id"), F.lit("-el"), el["element_index"]).alias("doc_id"),
            F.col("doc_id").alias("parent_id"),
            el["type"].alias("type"),
            el["text_representation"].alias("text_representation"),
            el["binary_representation"].alias("binary_representation"),
            el["bbox"].alias("bbox"),
            F.lit(None).cast(DOC_SCHEMA["shingles"].dataType).alias("shingles"),
            el["embedding"].cast(DOC_SCHEMA["embedding"].dataType).alias("embedding"),
            F.coalesce(el["properties"], F.col("properties")).alias("properties"),
            none_elements.alias("elements"),
        )

    rows = F.concat(
        F.array(parent),
        F.coalesce(
            F.transform(F.col("elements"), child),
            F.array().cast(ArrayType(DOC_SCHEMA)),
        ),
    )
    return df.select(F.explode(rows).alias("_d")).select("_d.*")


def unexplode_elements(df: DataFrame) -> DataFrame:
    """Inverse of ``explode_elements``: reassemble parent documents with
    their children back in the ``elements`` array — the engine's equivalent
    of the reference's ``HierarchicalDocument`` doc-with-children shape
    (reference: data/document.py:421; explode's un-doing has no reference
    twin, Ray pipelines are one-way).

    Children are matched by ``parent_id``; their position comes from the
    ``-el<N>`` doc_id suffix explode minted. One groupBy shuffle (bounded by
    per-doc element counts) + one join; ``sort_array`` orders the collected
    structs by their leading element_index field, so no per-group sort pass.
    ``page_number`` is not a top-level child column and is rebuilt as null —
    spread it into properties before exploding if it must round-trip."""
    el_type = DOC_SCHEMA["elements"].dataType.elementType
    parents = df.filter(F.col("parent_id").isNull())
    children = df.filter(F.col("parent_id").isNotNull())
    el = F.struct(
        F.regexp_extract(F.col("doc_id"), r"-el(\d+)$", 1).cast("int").alias("element_index"),
        F.col("type").alias("type"),
        F.col("text_representation").alias("text_representation"),
        F.col("binary_representation").alias("binary_representation"),
        F.col("bbox").alias("bbox"),
        F.lit(None).cast("int").alias("page_number"),
        F.col("embedding").alias("embedding"),
        F.col("properties").alias("properties"),
    ).cast(el_type)
    rebuilt = children.groupBy(F.col("parent_id").alias("_pid")).agg(
        F.sort_array(F.collect_list(el)).alias("_els")
    )
    out = (
        parents.drop("elements")
        .join(rebuilt, parents["doc_id"] == rebuilt["_pid"], "left")
        .withColumn("elements", F.col("_els"))
        .drop("_pid", "_els")
    )
    return out.select(*[f.name for f in DOC_SCHEMA.fields])


def filter_elements(df: DataFrame, predicate: Callable[[Column], Column]) -> DataFrame:
    """Keep elements matching a per-element Column predicate
    (reference: docset.py:1186)."""
    return df.withColumn("elements", F.filter(F.col("elements"), predicate))


def map_elements(df: DataFrame, fn: Callable[[Column], Column]) -> DataFrame:
    """Element-wise struct rewrite via transform() (reference: docset.py:1315)."""
    return df.withColumn("elements", F.transform(F.col("elements"), fn))


# ---------------------------------------------------------------------------
# Property plumbing
# ---------------------------------------------------------------------------

def spread_properties(df: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Copy doc-level properties onto each element
    (reference: transforms/spread_properties.py:8). JSON-object merge of the
    doc properties (optionally restricted to ``keys``) into each element's
    properties; element keys win on conflict, matching the reference's
    update-into-copy order."""
    doc_props = F.from_json(F.coalesce(F.col("properties"), F.lit("{}")), "map<string,string>")
    if keys is not None:
        doc_props = F.map_filter(doc_props, lambda k, _: k.isin(keys))

    def merge(el: Column) -> Column:
        el_props = F.from_json(el["properties"], "map<string,string>")
        merged = F.when(
            el["properties"].isNull(), F.to_json(doc_props)
        ).otherwise(F.to_json(F.map_concat(
            F.map_filter(doc_props, lambda k, _: ~F.array_contains(F.map_keys(el_props), k)),
            el_props,
        )))
        return el.withField("properties", merged)

    return df.withColumn("elements", F.transform(F.col("elements"), merge))


def assign_doc_properties(df: DataFrame, element_type: str, property_name: str) -> DataFrame:
    """Lift the first matching element's property up to the document
    (reference: transforms/assign_doc_properties.py:8)."""
    first_el = F.element_at(
        F.filter(F.col("elements"), lambda e: e["type"] == element_type), 1
    )
    lifted = F.get_json_object(first_el["properties"], f"$.{property_name}")
    doc_props = F.from_json(F.coalesce(F.col("properties"), F.lit("{}")), "map<string,string>")
    new_props = F.when(lifted.isNull(), F.col("properties")).otherwise(
        F.to_json(F.map_concat(
            F.map_filter(doc_props, lambda k, _: k != F.lit(property_name)),
            F.create_map(F.lit(property_name), lifted),
        ))
    )
    return df.withColumn("properties", new_props)


# ---------------------------------------------------------------------------
# Text normalization
# ---------------------------------------------------------------------------

def regex_replace(df: DataFrame, spec: list[tuple[str, str]], element_level: bool = True) -> DataFrame:
    """Chained regexp_replace over doc text and (optionally) element texts
    (reference: transforms/regex_replace.py:16 applies to all elements)."""
    def apply_all(col: Column) -> Column:
        for pat, repl in spec:
            col = F.regexp_replace(col, pat, repl)
        return col

    out = df.withColumn("text_representation", apply_all(F.col("text_representation")))
    if element_level and "elements" in df.columns:
        out = out.withColumn(
            "elements",
            F.transform(
                F.col("elements"),
                lambda e: e.withField("text_representation", apply_all(e["text_representation"])),
            ),
        )
    return out


# ---------------------------------------------------------------------------
# Markdown rendering
# ---------------------------------------------------------------------------

def render_markdown(df: DataFrame, out_col: str = "text_representation") -> DataFrame:
    """Render elements to one markdown string per doc (reference:
    transforms/markdown.py:8-54 — headers → '#', list items → '-', tables
    passed through). Native: transform + array_join, elements in
    element_index order."""
    els = F.array_sort(
        F.col("elements"),
        lambda a, b: F.when(a["element_index"] < b["element_index"], -1)
        .when(a["element_index"] > b["element_index"], 1).otherwise(0),
    )
    rendered = F.transform(
        els,
        lambda e: F.when(e["type"] == "title", F.concat(F.lit("# "), e["text_representation"]))
        .when(e["type"] == "heading", F.concat(F.lit("## "), e["text_representation"]))
        .when(e["type"] == "list-item", F.concat(F.lit("- "), e["text_representation"]))
        .otherwise(F.coalesce(e["text_representation"], F.lit(""))),
    )
    return df.withColumn(out_col, F.array_join(rendered, "\n\n"))


# ---------------------------------------------------------------------------
# Bbox / structural marks (reference: bbox_merge.py, mark_misc.py)
# ---------------------------------------------------------------------------

def _set_mark(e: Column, key: str) -> Column:
    props = F.from_json(F.coalesce(e["properties"], F.lit("{}")), "map<string,string>")
    return e.withField("properties", F.to_json(F.map_concat(
        F.map_filter(props, lambda k, _: k != F.lit(key)),
        F.create_map(F.lit(key), F.lit("true")),
    )))


def sort_by_page_bbox(df: DataFrame) -> DataFrame:
    """Order elements by (page, y1, x1) (reference: bbox_merge.py:106
    SortByPageBbox)."""
    def cmp(a: Column, b: Column) -> Column:
        ka = F.array(a["page_number"].cast("double"), F.coalesce(a["bbox"][1], F.lit(0.0)),
                     F.coalesce(a["bbox"][0], F.lit(0.0)))
        kb = F.array(b["page_number"].cast("double"), F.coalesce(b["bbox"][1], F.lit(0.0)),
                     F.coalesce(b["bbox"][0], F.lit(0.0)))
        return F.when(ka < kb, -1).when(ka > kb, 1).otherwise(0)

    return df.withColumn("elements", F.array_sort(F.col("elements"), cmp))


def mark_drop_header_footer(df: DataFrame, top: float = 0.05, bottom: float = 0.95) -> DataFrame:
    """Mark elements fully inside the top/bottom page margins with
    _drop=true (reference: mark_misc.py MarkDropHeaderFooter)."""
    return df.withColumn(
        "elements",
        F.transform(
            F.col("elements"),
            lambda e: F.when(
                (e["bbox"].isNotNull()) & ((e["bbox"][3] <= top) | (e["bbox"][1] >= bottom)),
                _set_mark(e, "_drop"),
            ).otherwise(e),
        ),
    )


def mark_drop_tiny(df: DataFrame, min_area: float = 1e-4) -> DataFrame:
    """Mark elements with bbox area below threshold (mark_misc.py MarkDropTiny)."""
    area = lambda e: (e["bbox"][2] - e["bbox"][0]) * (e["bbox"][3] - e["bbox"][1])  # noqa: E731
    return df.withColumn(
        "elements",
        F.transform(
            F.col("elements"),
            lambda e: F.when(e["bbox"].isNotNull() & (area(e) < min_area), _set_mark(e, "_drop")).otherwise(e),
        ),
    )


def mark_break_page(df: DataFrame) -> DataFrame:
    """Mark first element of each new page with _break (mark_misc.py MarkBreakPage)."""
    def mark(e: Column, i: Column) -> Column:
        # element_at is 1-based and rejects 0 under ANSI; clamp and re-guard
        # with i > 0 (SQL AND does not short-circuit reliably).
        prev = F.element_at(F.col("elements"), F.greatest(i, F.lit(1)))
        return F.when((i > 0) & (e["page_number"] != prev["page_number"]), _set_mark(e, "_break")).otherwise(e)

    # two-arg transform gives (element, index)
    return df.withColumn("elements", F.transform(F.col("elements"), mark))


def mark_break_by_tokens(df: DataFrame, limit: int = 512) -> DataFrame:
    """Mark _break wherever the running token total would exceed ``limit``,
    resetting the counter at each break (reference: mark_misc.py:83-120
    MarkBreakByTokens — pre-existing _break marks also reset the count).

    Implemented as a native ``aggregate`` fold over the elements array (the
    accumulator carries the running count and the per-element mark list), so
    the whole stateful scan stays JVM-side."""
    els = F.col("elements")

    def tok(e: Column) -> Column:
        t = F.trim(F.coalesce(e["text_representation"], F.lit("")))
        return F.when(t == "", 0).otherwise(F.size(F.split(t, r"\s+")))

    def has_break(e: Column) -> Column:
        return F.coalesce(
            F.get_json_object(e["properties"], "$._break") == F.lit("true"), F.lit(False)
        )

    zero = F.struct(
        F.lit(0).alias("toks"), F.array().cast("array<boolean>").alias("marks")
    )

    def step(acc: Column, e: Column) -> Column:
        n = tok(e)
        brk = has_break(e) | (acc["toks"] + n > limit)
        return F.struct(
            F.when(brk, n).otherwise(acc["toks"] + n).alias("toks"),
            F.concat(acc["marks"], F.array(brk)).alias("marks"),
        )

    with_marks = df.withColumn("_marks", F.aggregate(els, zero, step)["marks"])
    out = with_marks.withColumn(
        "elements",
        F.transform(
            F.col("elements"),
            lambda e, i: F.when(F.element_at(F.col("_marks"), i + 1), _set_mark(e, "_break")).otherwise(e),
        ),
    )
    return out.drop("_marks")


def mark_break_by_column(df: DataFrame, full_width_ratio: float = 0.8) -> DataFrame:
    """Mark _break where column layout changes to full-width (reference:
    bbox_merge.py:176 MarkBreakByColumn). The reference infers per-row
    column indices; this keeps the operative rule — an element wider than
    ``full_width_ratio`` × the page's used width following a narrower
    (column) element starts a new chunk — entirely in native expressions."""
    els = F.col("elements")
    width = lambda e: F.coalesce(e["bbox"][2] - e["bbox"][0], F.lit(0.0))  # noqa: E731
    used = F.aggregate(
        els,
        F.struct(F.lit(1.0).alias("xmin"), F.lit(0.0).alias("xmax")),
        lambda acc, e: F.struct(
            F.least(acc["xmin"], F.coalesce(e["bbox"][0], acc["xmin"])).alias("xmin"),
            F.greatest(acc["xmax"], F.coalesce(e["bbox"][2], acc["xmax"])).alias("xmax"),
        ),
    )
    full = F.when(used["xmin"] < used["xmax"], (used["xmax"] - used["xmin"]) * full_width_ratio).otherwise(
        F.lit(full_width_ratio)
    )
    tagged = df.withColumn("_full", full)
    out = tagged.withColumn(
        "elements",
        F.transform(
            F.col("elements"),
            lambda e, i: F.when(
                (i > 0)
                & (width(e) > F.col("_full"))
                & (width(F.element_at(F.col("elements"), F.greatest(i, F.lit(1)))) <= F.col("_full")),
                _set_mark(e, "_break"),
            ).otherwise(e),
        ),
    )
    return out.drop("_full")


def mark_bbox_preset(df: DataFrame, token_limit: int = 512) -> DataFrame:
    """The reference's standard marking pipeline (mark_misc.py:126
    MarkBboxPreset → docset.mark_bbox_preset): sort by page/bbox, drop tiny,
    drop header/footer, break on page, column, and token budget."""
    out = sort_by_page_bbox(df)
    out = mark_drop_tiny(out)
    out = mark_drop_header_footer(out)
    out = mark_break_page(out)
    out = mark_break_by_column(out)
    return mark_break_by_tokens(out, token_limit)


def drop_marked(df: DataFrame) -> DataFrame:
    """Remove elements marked _drop=true."""
    return df.withColumn(
        "elements",
        F.filter(
            F.col("elements"),
            lambda e: F.coalesce(
                F.get_json_object(e["properties"], "$._drop") != F.lit("true"), F.lit(True)
            ),
        ),
    )


# ---------------------------------------------------------------------------
# Merge / split (stateful per-doc folds → Arrow-batched pandas)
# ---------------------------------------------------------------------------

def _token_len(text: str | None) -> int:
    return len(text.split()) if text else 0


def merge_greedy_text(
    df: DataFrame, max_tokens: int = 512, merge_across_pages: bool = True
) -> DataFrame:
    """GreedyTextElementMerger (reference: merge_elements.py:58): pack
    consecutive elements into chunks under a token budget; oversized
    elements become their own chunk. Reference-parity details: the merge
    test charges ONE separator token per join (``tok1 + 1 + tok2 >
    max_tokens``, the newline the texts are joined with); a chunk that
    actually merged >1 elements becomes type "Section" while singleton
    chunks keep their element untouched; ``merge_across_pages=False``
    never merges across a page boundary. Per-doc fold in pandas (stateful
    within a row only — still embarrassingly parallel)."""
    def run(it: Iterable[pd.DataFrame]):
        for pdf in it:
            out_rows = []
            for row in pdf.to_dict("records"):
                els = row.get("elements")
                els = [] if els is None or len(els) == 0 else [dict(e) for e in els]
                merged, cur, cur_tokens = [], [], 0
                for e in sorted(els, key=lambda x: (x.get("element_index") or 0)):
                    t = _token_len(e.get("text_representation"))
                    page_break = (
                        not merge_across_pages
                        and cur
                        and e.get("page_number") != cur[-1].get("page_number")
                    )
                    if cur and (cur_tokens + 1 + t > max_tokens or page_break):
                        merged.append(_combine(cur, len(merged), merged_type="Section"))
                        cur, cur_tokens = [], 0
                    cur_tokens = t if not cur else cur_tokens + 1 + t
                    cur.append(e)
                if cur:
                    merged.append(_combine(cur, len(merged), merged_type="Section"))
                row["elements"] = merged
                out_rows.append(row)
            yield pd.DataFrame(out_rows, columns=pdf.columns)

    return df.mapInPandas(run, schema=df.schema)


def _combine(group: list[dict], index: int, merged_type: str | None = None) -> dict:
    """Merge a run of elements (reference merge_elements.py merge()):
    texts newline-joined, binaries concatenated, bbox unioned, properties
    first-wins with the distinct ``page_numbers`` collected (sorted here
    — the reference's list(set(...)) order is unspecified). A singleton
    run keeps its element's type; a real merge takes ``merged_type``
    when given (GreedyText -> "Section")."""
    texts = [e.get("text_representation") or "" for e in group]
    first = group[0]
    bboxes = [e.get("bbox") for e in group if e.get("bbox") is not None]
    bbox = None
    if bboxes:
        bbox = [min(b[0] for b in bboxes), min(b[1] for b in bboxes),
                max(b[2] for b in bboxes), max(b[3] for b in bboxes)]
    bins = [e.get("binary_representation") for e in group
            if e.get("binary_representation") is not None]
    props: dict = {}
    pages = sorted({e.get("page_number") for e in group if e.get("page_number") is not None})
    for e in group:
        for k, v in json.loads(e.get("properties") or "{}").items():
            if k not in props:
                props[k] = v
    if len(pages) > 0:
        props["page_numbers"] = pages
    return {
        "element_index": index,
        "type": (merged_type or first.get("type")) if len(group) > 1 else first.get("type"),
        "text_representation": "\n".join(t for t in texts if t),
        "binary_representation": b"".join(bytes(b) for b in bins) if bins else None,
        "bbox": bbox,
        "page_number": first.get("page_number"),
        "embedding": None,
        "properties": json.dumps(props) if props else first.get("properties"),
    }


def _fold_elements(df: DataFrame, fold_fn) -> DataFrame:
    """Run a per-document elements-list rewrite (list[dict] -> list[dict])
    as one Arrow-batched pandas stage, preserving the doc schema."""

    def run(it: Iterable[pd.DataFrame]):
        for pdf in it:
            out_rows = []
            for row in pdf.to_dict("records"):
                els = row.get("elements")
                els = [] if els is None or len(els) == 0 else [dict(e) for e in els]
                row["elements"] = fold_fn(sorted(els, key=lambda x: (x.get("element_index") or 0)))
                out_rows.append(row)
            yield pd.DataFrame(out_rows, columns=pdf.columns)

    return df.mapInPandas(run, schema=df.schema)


def merge_marked(df: DataFrame) -> DataFrame:
    """MarkedMerger (reference: merge_elements.py:347): honor _drop / _break
    marks left by the bbox/mark transforms — drop dropped elements, merge
    runs between breaks (text joined with newlines, bbox unioned,
    first-wins properties, page_numbers collected)."""

    def fold(els: list[dict]) -> list[dict]:
        merged: list[dict] = []
        cur: list[dict] = []

        def flush():
            if cur:
                c = _combine(cur, len(merged))
                c["type"] = "Text"  # reference MarkedMerger emits type Text
                merged.append(c)
                cur.clear()

        for e in els:
            props = json.loads(e.get("properties") or "{}")
            if props.get("_drop") == "true":
                continue
            if props.get("_break") == "true":
                flush()
            cur.append(e)
        flush()
        return merged

    return _fold_elements(df, fold)


def merge_greedy_section(df: DataFrame, max_tokens: int = 512, merge_across_pages: bool = True) -> DataFrame:
    """GreedySectionMerger (reference: merge_elements.py:155): within the
    token budget, merge adjacent Text+Text, Section-header+table (→
    'Section-header+table'), and Image followed by Texts (→ 'Image+Text'),
    optionally never across pages."""

    def can_merge(a: dict, b: dict, toks: int) -> str | None:
        ta, tb = a.get("type"), b.get("type")
        if ta is None or tb is None:
            return None
        if not merge_across_pages and a.get("page_number") != b.get("page_number"):
            return None
        if toks + 1 + _token_len(b.get("text_representation")) > max_tokens:
            return None
        if ta == "Text" and tb == "Text":
            return "Text"
        if ta == "Section-header" and tb == "table":
            return "Section-header+table"
        if ta in ("Image", "Image+Text") and tb == "Text":
            return "Image+Text"
        return None

    def fold(els: list[dict]) -> list[dict]:
        merged: list[dict] = []
        cur: list[dict] = []
        cur_type: str | None = None
        cur_toks = 0

        def flush():
            nonlocal cur_type, cur_toks
            if cur:
                c = _combine(cur, len(merged))
                c["type"] = cur_type or c["type"]
                merged.append(c)
            cur.clear()
            cur_type, cur_toks = None, 0

        for e in els:
            if not cur:
                cur.append(e)
                cur_type = e.get("type")
                cur_toks = _token_len(e.get("text_representation"))
                continue
            probe = dict(e)
            head = dict(cur[0])
            head["type"] = cur_type
            t = can_merge(head, probe, cur_toks)
            if t is None:
                flush()
                cur.append(e)
                cur_type = e.get("type")
                cur_toks = _token_len(e.get("text_representation"))
            else:
                cur.append(e)
                cur_type = t
                cur_toks += 1 + _token_len(e.get("text_representation"))
        flush()
        return merged

    return _fold_elements(df, fold)


def merge_header_augment(df: DataFrame) -> DataFrame:
    """HeaderAugmenterMerger (reference: merge_elements.py:620): carry the
    most recent Section-header/Title forward, prefixing it onto each
    following element's text (and recording it under properties._header)."""

    def fold(els: list[dict]) -> list[dict]:
        header: str | None = None
        out = []
        for e in els:
            e = dict(e)
            if e.get("type") in ("Section-header", "Title", "title", "heading"):
                header = e.get("text_representation")
            elif header:
                props = json.loads(e.get("properties") or "{}")
                props["_header"] = header
                e["properties"] = json.dumps(props)
                t = e.get("text_representation")
                e["text_representation"] = f"{header}\n{t}" if t else header
            out.append(e)
        return out

    return _fold_elements(df, fold)


_TABLE_HEADER_SOURCE_TYPES = ("Text", "Title", "Page-header", "Section-header", "Caption")


def _el_page(e: dict) -> int | None:
    if e.get("page_number") is not None:
        return e["page_number"]
    props = json.loads(e.get("properties") or "{}")
    return props.get("page_number")


def _merge_two_table_elements(a: dict, b: dict) -> dict:
    """Merge one continuation table into its predecessor (reference
    TableMerger.merge, merge_elements.py:506-582): cells concatenated with
    b's row indices offset by a's row count, text joined with a newline,
    titles joined with ' / ', bbox kept from the first table, page_numbers
    unioned, other properties first-wins when not None."""
    pa = json.loads(a.get("properties") or "{}")
    pb = json.loads(b.get("properties") or "{}")

    cells_a = pa.get("table_cells")
    cells_b = pb.get("table_cells")
    merged_cells = cells_a
    if cells_a is not None and cells_b is not None:
        offset = 1 + max((r for c in cells_a for r in c["rows"]), default=-1)
        merged_cells = list(cells_a) + [
            {**c, "rows": [r + offset for r in c["rows"]]} for c in cells_b
        ]
    elif cells_b is not None:
        merged_cells = cells_b

    props: dict = {}
    pages = set()
    for src in (pa, pb):
        for k, v in src.items():
            if k == "page_number" and v is not None:
                pages.add(v)
            if props.get(k) is None:
                props[k] = v
    for e in (a, b):
        if _el_page(e) is not None:
            pages.add(_el_page(e))
    if pages:
        props["page_numbers"] = sorted(pages)
    title_a = pa.get("title") or ""
    title_b = pb.get("title") or ""
    merged_title = f"{title_a} / {title_b}".strip(" / ")
    props["title"] = merged_title or None
    if merged_cells is not None:
        props["table_cells"] = merged_cells

    ta, tb = a.get("text_representation"), b.get("text_representation")
    text = ta if tb is None else (tb if ta is None else f"{ta}\n{tb}")
    ba, bb = a.get("binary_representation"), b.get("binary_representation")
    binary = ba if bb is None else (bb if ba is None else bytes(ba) + bytes(bb))

    return {
        "element_index": a.get("element_index"),
        "type": "table",
        "text_representation": text,
        "binary_representation": binary,
        "bbox": a.get("bbox") or b.get("bbox"),
        "page_number": a.get("page_number"),
        "embedding": None,
        "properties": json.dumps(props),
    }


def merge_tables(
    df: DataFrame,
    regex_pattern: str | None = None,
    llm_factory=None,
    prompt: str | None = None,
) -> DataFrame:
    """TableMerger (reference: merge_elements.py:424-582):

    1. ``regex_pattern``: any non-table text element on a page whose text
       matches becomes that page's table header; it is prefixed onto each
       table's text and appended to its title (customTableHeaderAdditionFilter,
       :584-611; later matches on a page win, as in the reference dict).
    2. ``llm_factory``+``prompt``: per table (after the first, paired with
       the previous table's text — LLMTextQueryAgent table_cont,
       llm_query.py:66-125), the completion is stored under
       ``properties.table_continuation``.
    3. Consecutive tables whose continuation contains 'true' are merged
       (cells row-offset, text newline-joined). Non-table elements keep
       their order; surviving tables are appended after them, as in the
       reference (merge_elements.py:487-497).

    Tables carry their cell grid as ``properties.table_cells`` (the
    ``Table.to_spark_rows`` dict shape).
    """
    pat = re.compile(regex_pattern) if regex_pattern else None

    def fold_doc(els: list[dict], llm) -> list[dict]:
        tables = [e for e in els if (e.get("type") or "").lower() == "table"]
        if not tables:
            return els

        if pat is not None:
            page_headers: dict = {}
            for e in els:
                if e.get("type") not in _TABLE_HEADER_SOURCE_TYPES:
                    continue
                txt = (e.get("text_representation") or "").strip()
                if txt and pat.search(txt):
                    page_headers[_el_page(e)] = txt + " "
            if page_headers:
                for e in els:
                    if (e.get("type") or "").lower() != "table":
                        continue
                    hdr = page_headers.get(_el_page(e), "")
                    if not hdr:
                        continue
                    e["text_representation"] = hdr + (e.get("text_representation") or "")
                    props = json.loads(e.get("properties") or "{}")
                    props["title"] = f"{props['title']}\n{hdr}" if props.get("title") else hdr
                    e["properties"] = json.dumps(props)

        if llm is not None and prompt is not None and len(tables) >= 2:
            prompts = []
            prev = None
            for t in tables:
                text = t.get("text_representation") or ""
                if prev is None:
                    prompts.append(f"{prompt}\n{text}")
                else:
                    prompts.append(
                        f"{prompt}\nELEMENT 1: \n\n{prev}\n\nELEMENT 2: \n{text}"
                    )
                prev = text
            responses = llm.generate_batch(prompts)
            for t, resp in zip(tables, responses):
                props = json.loads(t.get("properties") or "{}")
                props["table_continuation"] = resp
                t["properties"] = json.dumps(props)

        others = [e for e in els if (e.get("type") or "").lower() != "table"]
        new_tables = [tables[0]]

        def _flag(el: dict, value: bool) -> dict:
            # reference overwrites the LLM's raw reply with the boolean
            # outcome after merging (merge_elements.py:492-496)
            props = json.loads(el.get("properties") or "{}")
            props["table_continuation"] = value
            el["properties"] = json.dumps(props)
            return el

        for t in tables[1:]:
            cont = json.loads(t.get("properties") or "{}").get("table_continuation") or ""
            if "true" in str(cont).lower():
                new_tables[-1] = _flag(_merge_two_table_elements(new_tables[-1], t), True)
            else:
                new_tables.append(_flag(t, False))
        out = others + new_tables
        for i, e in enumerate(out):
            e["element_index"] = i
        return out

    def run(it: Iterable[pd.DataFrame]):
        llm = llm_factory() if llm_factory is not None else None
        for pdf in it:
            out_rows = []
            for row in pdf.to_dict("records"):
                els = row.get("elements")
                els = [] if els is None or len(els) == 0 else [dict(e) for e in els]
                row["elements"] = fold_doc(
                    sorted(els, key=lambda x: (x.get("element_index") or 0)), llm
                )
                out_rows.append(row)
            yield pd.DataFrame(out_rows, columns=pdf.columns)

    return df.mapInPandas(run, schema=df.schema)


def _split_boundary(txt: str) -> int:
    """Split index for one binary division (reference split_elements.py
    split_one:148-188): scan OUTWARD from the midpoint, at most half//2
    steps (stay near the middle — a sentence end far away must not win
    over a comma nearby), testing both frontier chars per precedence
    level (.!? > ; > () > : > , > whitespace); remember the first hit per
    level, stop early on a sentence ender; the highest-precedence hit + 1
    is the cut (fallback: one past the midpoint)."""
    half = len(txt) // 2
    left, right = half, half + 1
    predicates = [
        lambda c: c in ".!?",
        lambda c: c == ";",
        lambda c: c in "()",
        lambda c: c == ":",
        lambda c: c == ",",
        str.isspace,
    ]
    results: list[int | None] = [None] * len(predicates)
    for _ in range(half // 2):
        if left < 0 or right >= len(txt):
            break
        lchar, rchar = txt[left], txt[right]
        go = True
        for ii, pred in enumerate(predicates):
            if pred(lchar):
                if results[ii] is None:
                    results[ii] = left
                go = ii != 0
                break
            if pred(rchar):
                if results[ii] is None:
                    results[ii] = right
                go = ii != 0
                break
        if not go:
            break
        left -= 1
        right += 1
    for res in results:
        if res is not None:
            return res + 1
    return half + 1


def split_elements(df: DataFrame, max_tokens: int = 512, max_depth: int = 20) -> DataFrame:
    """SplitElements (reference: split_elements.py:12 split_one):
    recursively binary-split any element over the token budget at the
    best boundary NEAR THE MIDPOINT (outward scan with the reference's
    punctuation precedence), keeping the halves verbatim (no whitespace
    trimming — concatenating the splits reproduces the original text)
    and re-encoding each half as its binary representation, exactly as
    the reference's add_binary path does. Recursion is depth-capped at
    ``max_depth`` (the reference raises RecursionError; here the
    oversized piece is kept whole). The reference's table-specific
    newline-seeking branch belongs to the gated table partitioner."""
    def split_text(text: str, depth: int = 0) -> list[str]:
        if not text or _token_len(text) <= max_tokens or depth > max_depth:
            return [text]
        idx = _split_boundary(text)
        if idx <= 0 or idx >= len(text):
            return [text]
        return split_text(text[:idx], depth + 1) + split_text(text[idx:], depth + 1)

    def run(it: Iterable[pd.DataFrame]):
        for pdf in it:
            out_rows = []
            for row in pdf.to_dict("records"):
                els = row.get("elements")
                els = [] if els is None or len(els) == 0 else [dict(e) for e in els]
                new_els = []
                for e in sorted(els, key=lambda x: (x.get("element_index") or 0)):
                    text = e.get("text_representation")
                    if text and _token_len(text) > max_tokens:
                        for part in split_text(text):
                            ne = dict(e)
                            ne["text_representation"] = part
                            # reference add_binary: each half re-encoded
                            ne["binary_representation"] = part.encode("utf-8")
                            ne["element_index"] = len(new_els)
                            new_els.append(ne)
                    else:
                        ne = dict(e)
                        ne["element_index"] = len(new_els)
                        new_els.append(ne)
                row["elements"] = new_els
                out_rows.append(row)
            yield pd.DataFrame(out_rows, columns=pdf.columns)

    return df.mapInPandas(run, schema=df.schema)


# ---------------------------------------------------------------------------
# Document structure (reference: transforms/extract_document_structure.py)
# ---------------------------------------------------------------------------

_HEADER_TYPES = ("Section-header", "Title", "title", "heading")


def assign_sections(df: DataFrame, header_types: tuple = _HEADER_TYPES) -> DataFrame:
    """Tag every element with its section: a running section index that
    increments at each header element, plus the header's text, written into
    element properties (_section_idx/_section_title). Native aggregate fold
    — the JVM-side building block of the reference's section hierarchy
    construction (extract_document_structure.py; HierarchicalDocument
    document.py:421)."""
    els = F.col("elements")
    is_header = lambda e: e["type"].isin(*[F.lit(t) for t in header_types])  # noqa: E731

    zero = F.struct(
        F.lit(0).alias("idx"),
        F.lit("").alias("title"),
        F.array().cast("array<struct<idx:int,title:string>>").alias("tags"),
    )

    def step(acc: Column, e: Column) -> Column:
        new_idx = F.when(is_header(e), acc["idx"] + 1).otherwise(acc["idx"])
        new_title = F.when(is_header(e), F.coalesce(e["text_representation"], F.lit(""))).otherwise(acc["title"])
        tag = F.struct(new_idx.alias("idx"), new_title.alias("title"))
        return F.struct(
            new_idx.alias("idx"),
            new_title.alias("title"),
            F.concat(acc["tags"], F.array(tag)).alias("tags"),
        )

    with_tags = df.withColumn("_sec", F.aggregate(els, zero, step)["tags"])
    out = with_tags.withColumn(
        "elements",
        F.transform(
            F.col("elements"),
            lambda e, i: e.withField(
                "properties",
                F.to_json(
                    F.map_concat(
                        F.map_filter(
                            F.from_json(F.coalesce(e["properties"], F.lit("{}")), "map<string,string>"),
                            lambda k, _: ~k.isin("_section_idx", "_section_title"),
                        ),
                        F.create_map(
                            F.lit("_section_idx"),
                            F.element_at(F.col("_sec"), i + 1)["idx"].cast("string"),
                            F.lit("_section_title"),
                            F.element_at(F.col("_sec"), i + 1)["title"],
                        ),
                    )
                ),
            ),
        ),
    )
    return out.drop("_sec")


def extract_document_structure(df: DataFrame, header_types: tuple = _HEADER_TYPES) -> DataFrame:
    """Section hierarchy as a nested column: ``sections`` =
    array<struct<section_idx, title, elements>> — elements grouped under
    their section in element order (the Spark shape for the reference's
    HierarchicalDocument children tree, SURVEY.md §1.1)."""
    tagged = assign_sections(df, header_types)
    els = F.col("elements")
    sec_of = lambda e: F.get_json_object(e["properties"], "$._section_idx").cast("int")  # noqa: E731
    title_of = lambda e: F.get_json_object(e["properties"], "$._section_title")  # noqa: E731
    idxs = F.array_distinct(F.transform(els, sec_of))
    sections = F.transform(
        idxs,
        lambda si: F.struct(
            si.alias("section_idx"),
            F.element_at(
                F.transform(F.filter(els, lambda e: sec_of(e) == si), title_of), 1
            ).alias("title"),
            F.filter(els, lambda e: sec_of(e) == si).alias("elements"),
        ),
    )
    return tagged.withColumn("sections", sections)


# ---------------------------------------------------------------------------
# XY-Cut reading-order sort (reference: utils/xycut.py, utils/bbox_sort.py,
# utils/element_sort.py)
# ---------------------------------------------------------------------------

def _xycut_bbox(e: dict) -> tuple:
    b = e.get("bbox")
    if b is not None and len(b) == 4:
        return tuple(b)
    return (1.0, 1.0, 1.0, 1.0)  # reference get_bbox: max values sort at end


def _xycut_events(elems: list[dict], axis: int) -> list[tuple]:
    """Begin/end event sweep list, sorted with CLOSE (0) before OPEN (1)
    at equal coordinates (reference make_begin_end); the third slot is
    the element's list index — a deterministic tie-break where the
    reference would compare raw Element objects."""
    bel = []
    for idx, e in enumerate(elems):
        b = _xycut_bbox(e)
        aa, bb = b[axis], b[axis + 2]
        if bb < aa:
            aa, bb = bb, aa
        bel.append((aa, 1, idx))  # OPEN
        bel.append((bb, 0, idx))  # CLOSE
    bel.sort()
    return bel


def _xycut_widest(bel: list[tuple]) -> tuple[float, int | None]:
    """Widest zero-overlap gap along one axis (reference widest_cut /
    gen_overlap): whenever the open-interval count returns to zero with a
    later event remaining, the distance to that event is a candidate cut
    width. Ties keep the FIRST (earliest) gap."""
    best: tuple[float, int | None] = (-1.0, None)
    if len(bel) <= 2:  # one element: no cut exists
        return best
    count = 0
    n = len(bel)
    for ii, (coord, isopen, idx) in enumerate(bel):
        if isopen:
            count += 1
        else:
            count -= 1
            if count == 0 and ii + 1 < n:
                width = bel[ii + 1][0] - coord
                if width > best[0]:
                    best = (width, idx)
    return best


def _xycut_cleave(elems: list[dict]) -> list[list[dict]] | None:
    """Binary split across the widest gap (reference choose_axis +
    cleave_elems): the axis with the wider zero-overlap gap wins (ties
    prefer the vertical cut, mirroring ``if xw < yw``); elements are
    emitted in close-event order along that axis and the segment breaks
    after the cut element. None = no cut on either axis."""
    if len(elems) < 2:
        return None
    xw, xi = _xycut_widest(_xycut_events(elems, 0))
    yw, yi = _xycut_widest(_xycut_events(elems, 1))
    if max(xw, yw) < 0.0:
        return None
    if xw < yw:
        order, cut = _xycut_events(elems, 1), yi
    else:
        order, cut = _xycut_events(elems, 0), xi
    segs: list[list[dict]] = [[]]
    for _, isopen, idx in order:
        if not isopen:
            segs[-1].append(elems[idx])
            if idx == cut:
                segs.append([])
    if not segs[-1]:
        segs.pop()
    return segs


def _xycut_rec(items: list[dict]) -> list[dict]:
    segs = _xycut_cleave(items)
    if segs is None or len(segs) == 1:
        return list(items)  # leaf keeps the parent's close-event order
    out: list[dict] = []
    for s in segs:
        out.extend(_xycut_rec(s))
    return out


def _xycut(items: list[dict]) -> list[dict]:
    """Recursive X-Y cut in the reference's exact shape (utils/xycut.py
    xycut_sort_page / divide_node / cleave_elems): sweep begin/end events
    per axis, binary-split across the WIDEST whitespace gap (not every
    gap), recurse into each side, and — when the top-level pass finds no
    cut anywhere — fall back to the default column-aware bbox sorter,
    exactly as the reference falls back to bbox_sort_page. Deterministic
    tie-breaks (event index) where the reference's tuple sort would
    compare raw Element objects."""
    if len(items) < 2:
        return list(items)
    segs = _xycut_cleave(items)
    if segs is None or len(segs) == 1:
        return _bbox_page_order(items)
    out: list[dict] = []
    for s in segs:
        out.extend(_xycut_rec(s))
    return out


def xycut_sort_elements(df: DataFrame) -> DataFrame:
    """Reorder each document's elements into X-Y-cut reading order
    (per page; elements without a bbox keep their relative order at the
    end of their page) and reassign ``element_index`` to the new order.
    Per-doc Arrow-batched pass — layout sorting a billion pages is
    embarrassingly parallel."""
    def run(it: Iterable[pd.DataFrame]):
        for pdf in it:
            out_rows = []
            for row in pdf.to_dict("records"):
                els = row.get("elements")
                els = [] if els is None or len(els) == 0 else [dict(e) for e in els]
                pages: dict = {}
                for e in sorted(els, key=lambda x: (x.get("element_index") or 0)):
                    pages.setdefault(e.get("page_number") or 1, []).append(e)
                ordered: list[dict] = []
                for pno in sorted(pages):
                    page = pages[pno]
                    with_box = [e for e in page if e.get("bbox") is not None]
                    no_box = [e for e in page if e.get("bbox") is None]
                    ordered.extend(_xycut(with_box))
                    ordered.extend(no_box)
                for i, e in enumerate(ordered):
                    e["element_index"] = i
                row["elements"] = ordered
                out_rows.append(row)
            yield pd.DataFrame(out_rows, columns=pdf.columns)

    return df.mapInPandas(run, schema=df.schema)


def reorder_elements(df: DataFrame, key) -> DataFrame:
    """Reorder each document's elements by a Python ``key`` function over
    the element dict, reassigning ``element_index`` (reference
    functions/elements.py:8 reorder_elements — comparator/key sort on the
    in-row element list). Per-doc Arrow-batched; embarrassingly parallel."""
    def run(it: Iterable[pd.DataFrame]):
        for pdf in it:
            out_rows = []
            for row in pdf.to_dict("records"):
                els = row.get("elements")
                els = [] if els is None or len(els) == 0 else [dict(e) for e in els]
                els.sort(key=key)
                for i, e in enumerate(els):
                    e["element_index"] = i
                row["elements"] = els
                out_rows.append(row)
            yield pd.DataFrame(out_rows, columns=pdf.columns)

    return df.mapInPandas(run, schema=df.schema)


def _bbox_page_order(page: list[dict], left_to_right: bool = True) -> list[dict]:
    """Column-aware page ordering (reference utils/bbox_sort.py
    bbox_sort_page semantics, original implementation): sort vertically,
    tag each element full/left/right by width and position, promote
    left/right pairs that share a y-band to two-column sections, and
    re-sort each two-column section column-first. Falls back gracefully
    when bboxes are missing (treated as (0,0) keys, reference parity)."""
    def box(e):
        b = e.get("bbox")  # Arrow hands back numpy arrays: no bool()
        return tuple(b) if b is not None and len(b) == 4 else (0.0, 0.0, 0.0, 0.0)

    def vkey(e):
        b = box(e)
        return (b[1], b[0] if left_to_right else -b[0])

    def hkey(e):
        b = box(e)
        q = int(5 * b[0])  # quantized column bucket, then top
        return (q if left_to_right else -q, b[1])

    page = sorted(page, key=vkey)

    def tag(e):
        b = e.get("bbox")
        if b is None or len(b) != 4:
            return None
        width = b[2] - b[0]
        if width > 0.6 or e.get("type") == "Page-footer":
            return "full"
        if width < 0.1 or width >= 0.45:
            return None
        if b[2] < 0.5:
            return "left"
        if b[0] > 0.5:
            return "right"
        return None

    tags = [tag(e) for e in page]
    # tag_two_columns parity: a 'left' element whose y-band also holds a
    # 'right' element retags EVERY band member to '2col' — including
    # 'full' and untagged ones (a figure spanning both columns belongs to
    # the two-column section it interrupts)
    for i, e in enumerate(page):
        if tags[i] != "left":
            continue
        top, bot = box(e)[1], box(e)[3]
        band = [
            j for j, o in enumerate(page)
            if box(o)[1] < bot and box(o)[3] > top
        ]
        if any(tags[j] == "right" for j in band):
            for j in band:
                tags[j] = "2col"
    # bbox_sort_based_on_tags parity: a 2col section starts at its first
    # '2col' tag and closes only at the next 'full'/'2col' TAG TRANSITION
    # — interior None/left/right tags do not break the run
    out = list(page)
    lidx, ltag = 0, (tags[0] if tags else None)
    for idx, t in enumerate(tags):
        if t in ("full", "2col") and t != ltag:
            if ltag == "2col":
                out[lidx:idx] = sorted(out[lidx:idx], key=hkey)
            lidx, ltag = idx, t
    if ltag == "2col":
        out[lidx:] = sorted(out[lidx:], key=hkey)
    return out


def bbox_sort_elements(df: DataFrame, left_to_right: bool = True) -> DataFrame:
    """Reorder each document's elements with the reference's DEFAULT page
    sorter (utils/bbox_sort.py via utils/element_sort.py sort_document):
    per page, vertical order with two-column sections detected and read
    column-first. ``xycut_sort_elements`` is the recursive-cut
    alternative; this is the tag-based one the reference applies when no
    mode is given. Per-doc Arrow-batched; reassigns element_index."""
    def run(it: Iterable[pd.DataFrame]):
        for pdf in it:
            out_rows = []
            for row in pdf.to_dict("records"):
                els = row.get("elements")
                els = [] if els is None or len(els) == 0 else [dict(e) for e in els]
                pages: dict = {}
                for e in sorted(els, key=lambda x: (x.get("element_index") or 0)):
                    pages.setdefault(e.get("page_number") or 0, []).append(e)
                ordered: list[dict] = []
                for pno in sorted(pages):
                    ordered.extend(_bbox_page_order(pages[pno], left_to_right))
                for i, e in enumerate(ordered):
                    e["element_index"] = i
                row["elements"] = ordered
                out_rows.append(row)
            yield pd.DataFrame(out_rows, columns=pdf.columns)

    return df.mapInPandas(run, schema=df.schema)


# ---------------------------------------------------------------------------
# Page rotation normalization (reference utils/rotation.py:34-77,
# table_structure/extract.py:42-74,203-263)
# ---------------------------------------------------------------------------

def rot_bbox_expr(bbox: Column, quad: Column) -> Column:
    """Rotate a normalized ``[x1, y1, x2, y2]`` bbox ``quad`` * 90 degrees
    counterclockwise about the page center (0.5, 0.5) — the closed form of
    the reference's rot_xy-both-corners + min/max re-normalization
    (utils/rotation.py rot_tuple). Pure Column arithmetic; ``quad`` may be
    any integer column (taken mod 4, Python semantics for negatives)."""
    x1, y1, x2, y2 = (bbox[i] for i in range(4))
    q = F.pmod(quad, F.lit(4))
    one = F.lit(1.0)
    return (
        F.when(q == 1, F.array(y1, one - x2, y2, one - x1))
        .when(q == 2, F.array(one - x2, one - y2, one - x1, one - y1))
        .when(q == 3, F.array(one - y2, x1, one - y1, x2))
        .otherwise(bbox)
    )


def detect_quad_expr(mean_vx: Column, mean_vy: Column, thres: float = 0.8) -> Column:
    """Quadrant rotation implied by an average direction vector
    (reference utils/rotation.py quad_rotation): 0 when the mean is
    shorter than ``thres`` (mixed directions cancel), else the phase
    rounded to the nearest quarter turn. Note the reference uses Python
    round (half-even); this uses Spark round (half-up) — they differ only
    for a mean vector at exactly 45 degrees, where "nearest quarter turn"
    is ill-defined anyway."""
    import math

    mag = F.sqrt(mean_vx * mean_vx + mean_vy * mean_vy)
    quad = F.pmod(
        F.round(F.atan2(mean_vy, mean_vx) * F.lit(2.0 / math.pi)).cast("int"), F.lit(4)
    )
    return F.when(mag < F.lit(float(thres)), F.lit(0)).otherwise(quad)


def normalize_rotation(
    df: DataFrame,
    doc_col: str = "doc_id",
    bbox_col: str = "bbox",
    vx_col: str = "vx",
    vy_col: str = "vy",
    thres: float = 0.8,
    out_col: str = "bbox_upright",
    quad_col: str = "rotation_quad",
) -> DataFrame:
    """Detect each page's quadrant rotation from its elements' text
    direction vectors and rotate every bbox back upright — the
    reference's table-extraction pre-pass (table_structure/extract.py:203:
    ``quad = quad_rotation(average_vector(tokens));
    rotated_table(element, -quad)``) applied per document over an
    exploded (doc, element) frame.

    Reference-parity details: each direction vector is normalized to unit
    length BEFORE averaging (utils/rotation.py VectorMean via
    vector_mean_attr_norm — a long line of small tokens must not outvote
    rotation direction by magnitude), and the un-rotation is by -quad mod
    4. One window shuffle on ``doc_col``; the rotation itself is pure
    Column arithmetic. Adds ``quad_col`` (the detected rotation) and
    ``out_col`` (the upright bbox)."""
    from pyspark.sql.window import Window

    vx, vy = F.col(vx_col), F.col(vy_col)
    ln = F.sqrt(vx * vx + vy * vy)
    uvx = F.when(ln > 0, vx / ln).otherwise(vx)
    uvy = F.when(ln > 0, vy / ln).otherwise(vy)
    w = Window.partitionBy(doc_col)
    quad = detect_quad_expr(F.avg(uvx).over(w), F.avg(uvy).over(w), thres)
    out = df.withColumn(quad_col, quad)
    inv = F.pmod(F.lit(4) - F.col(quad_col), F.lit(4))
    return out.withColumn(out_col, rot_bbox_expr(F.col(bbox_col), inv))


def to_html_tables(
    df: DataFrame,
    wrap_in_html: bool = True,
) -> DataFrame:
    """One output document per table element, carrying the table's HTML
    rendering — the reference's ``to_html_tables`` + ``html_table_filename_fn``
    (reference utils/html_utils.py:8-34): each extracted table becomes a
    standalone doc inheriting the parent's ``path`` and ``page_number``
    properties plus a 0-based ``table_num`` (enumerated over TABLE elements
    only, in element order), and a derived filename
    ``{basename_without_ext}_table_{table_num}.html``.

    A table element must carry ``table_cells`` in its properties JSON (the
    repo-wide cell convention: content/rows/cols/is_header); like the
    reference, an untyped table is an error, not a silent skip. HTML comes
    from data/table.py ``Table.to_html`` — identical DOM to the reference's
    renderer, without bs4 pretty-print whitespace (documented divergence;
    parsers see the same tree). ``wrap_in_html`` adds the reference's
    ``<html><body>`` shell.

    Scale shape: posexplode + filter + ONE per-doc window for table_num
    (partition = doc, tiny), then an Arrow-batched render UDF; no other
    shuffle, and non-table elements are dropped before any Python runs.
    """
    from pyspark.sql.window import Window

    els = df.select(
        "doc_id",
        F.get_json_object("properties", "$.path").alias("_path"),
        F.get_json_object("properties", "$.page_number").alias("_doc_page"),
        F.posexplode("elements").alias("_pos", "_el"),
    ).filter(F.col("_el")["type"] == "table")
    w = Window.partitionBy("doc_id").orderBy("_pos")
    els = els.withColumn("_table_num", F.row_number().over(w) - 1)

    @F.pandas_udf("string")
    def render(props: pd.Series) -> pd.Series:
        from sycamore_spark.data.table import Table

        out = []
        for p in props:
            d = json.loads(p) if p else {}
            cells = d.get("table_cells")
            if cells is None:
                raise ValueError(
                    "table element without table_cells: cannot render HTML "
                    "(reference html_utils.to_html_tables raises here too)"
                )
            html = Table.from_spark_rows(cells, caption=d.get("caption")).to_html()
            if wrap_in_html:
                html = f"<html><body>{html}</body></html>"
            out.append(html)
        return pd.Series(out)

    name = F.element_at(F.split(F.col("_path"), "/"), -1)
    base = F.when(
        name.contains("."), F.regexp_replace(name, r"\.[^.]*$", "")
    ).otherwise(F.lit(""))
    page = F.coalesce(
        F.col("_el")["page_number"].cast("bigint"),
        F.col("_doc_page").cast("bigint"),
    )
    return els.select(
        F.col("doc_id").alias("parent_id"),
        render(F.col("_el")["properties"]).alias("text_representation"),
        F.col("_path").alias("path"),
        page.alias("page_number"),
        F.col("_table_num").cast("bigint").alias("table_num"),
        F.concat(base, F.lit("_table_"), F.col("_table_num"), F.lit(".html")).alias(
            "filename"
        ),
    )
