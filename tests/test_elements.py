"""Elements-array ETL semantics (reference test model: test_explode.py,
test_merge_elements.py, test_split_elements.py, test_markdown.py)."""

import json

from pyspark.sql import functions as F

from sycamore_spark.data.schema import docs_from_rows
from sycamore_spark.operators import elements as E


def _docs(spark):
    return docs_from_rows(spark, [
        dict(doc_id="d1", type="pdf", properties={"src": "s1"}, elements=[
            dict(type="title", text_representation="The Title", bbox=[0.1, 0.02, 0.9, 0.04], page_number=1),
            dict(type="text", text_representation="hello world", bbox=[0.1, 0.2, 0.9, 0.4], page_number=1),
            dict(type="text", text_representation="tiny", bbox=[0.1, 0.5, 0.1001, 0.5001], page_number=1),
            dict(type="list-item", text_representation="item one", bbox=[0.1, 0.1, 0.9, 0.3], page_number=2),
        ]),
        dict(doc_id="d2", type="pdf", elements=[]),
    ])


def test_explode_elements(spark):
    out = E.explode_elements(_docs(spark))
    rows = out.collect()
    children = [r for r in rows if r.parent_id is not None]
    parents = [r for r in rows if r.parent_id is None]
    assert len(parents) == 2 and len(children) == 4
    assert all(c.parent_id == "d1" for c in children)
    # children inherit parent properties when element has none
    assert json.loads(children[0].properties)["src"] == "s1"


def test_spread_properties(spark):
    out = E.spread_properties(_docs(spark))
    els = out.filter(F.col("doc_id") == "d1").collect()[0].elements
    for el in els:
        assert json.loads(el.properties)["src"] == "s1"


def test_filter_and_map_elements(spark):
    out = E.filter_elements(_docs(spark), lambda e: e["type"] == "text")
    assert len(out.filter(F.col("doc_id") == "d1").collect()[0].elements) == 2
    out = E.map_elements(_docs(spark), lambda e: e.withField("type", F.lit("x")))
    assert {el.type for el in out.filter(F.col("doc_id") == "d1").collect()[0].elements} == {"x"}


def test_regex_replace(spark):
    df = docs_from_rows(spark, [dict(doc_id="d", text_representation="a   b\t c", elements=[
        dict(type="text", text_representation="x   y"),
    ])])
    out = E.regex_replace(df, E.COALESCE_WHITESPACE).collect()[0]
    assert out.text_representation == "a b c"
    assert out.elements[0].text_representation == "x y"


def test_render_markdown(spark):
    out = E.render_markdown(_docs(spark)).filter(F.col("doc_id") == "d1").collect()[0]
    assert out.text_representation.startswith("# The Title")
    assert "- item one" in out.text_representation


def test_mark_drop_tiny_and_drop_marked(spark):
    out = E.drop_marked(E.mark_drop_tiny(_docs(spark)))
    texts = [el.text_representation for el in out.filter(F.col("doc_id") == "d1").collect()[0].elements]
    assert "tiny" not in texts and "hello world" in texts


def test_mark_drop_header_footer(spark):
    out = E.drop_marked(E.mark_drop_header_footer(_docs(spark)))
    texts = [el.text_representation for el in out.filter(F.col("doc_id") == "d1").collect()[0].elements]
    assert "The Title" not in texts  # y2=0.04 <= 0.05 margin


def test_sort_by_page_bbox_and_break(spark):
    out = E.mark_break_page(E.sort_by_page_bbox(_docs(spark)))
    els = out.filter(F.col("doc_id") == "d1").collect()[0].elements
    assert els[-1].page_number == 2
    assert json.loads(els[-1].properties or "{}").get("_break") == "true"


def test_merge_greedy_text(spark):
    df = docs_from_rows(spark, [dict(doc_id="d", elements=[
        dict(type="text", text_representation="one two three"),
        dict(type="text", text_representation="four five"),
        dict(type="text", text_representation="six seven eight nine ten eleven"),
    ])])
    # reference token accounting: 3 + 1 (separator) + 2 = 6 fits a 6-token
    # budget; 5 would not (merge_elements.py:85 charges the newline)
    out = E.merge_greedy_text(df, max_tokens=6).collect()[0]
    texts = [e.text_representation for e in out.elements]
    assert texts[0] == "one two three\nfour five"
    assert len(out.elements) == 2
    assert out.elements[0].type == "Section"      # real merge
    assert out.elements[1].type == "text"         # singleton untouched
    strict = E.merge_greedy_text(df, max_tokens=5).collect()[0]
    assert len(strict.elements) == 3              # separator token counted


def test_split_elements(spark):
    long_text = ("word " * 30).strip() + ". " + ("tail " * 30).strip()
    df = docs_from_rows(spark, [dict(doc_id="d", elements=[
        dict(type="text", text_representation=long_text),
    ])])
    out = E.split_elements(df, max_tokens=40).collect()[0]
    assert len(out.elements) >= 2
    joined = " ".join(e.text_representation for e in out.elements)
    assert "tail" in joined and "word" in joined


def test_assign_doc_properties(spark):
    df = docs_from_rows(spark, [dict(doc_id="d", properties={"a": "1"}, elements=[
        dict(type="table", text_representation="t", properties={"caption": "Table 1"}),
    ])])
    out = E.assign_doc_properties(df, "table", "caption").collect()[0]
    assert json.loads(out.properties)["caption"] == "Table 1"
    assert json.loads(out.properties)["a"] == "1"


def test_unexplode_roundtrips_explode(spark):
    from sycamore_spark.data.schema import DOC_SCHEMA
    from sycamore_spark.operators.elements import explode_elements, unexplode_elements

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in DOC_SCHEMA.fields)
    els = [
        {
            "element_index": i,
            "type": "text",
            "text_representation": f"chunk {i}",
            "binary_representation": None,
            "bbox": [0.1, 0.1 * i, 0.9, 0.1 * i + 0.05],
            "page_number": 1,
            "embedding": None,
            "properties": '{"k": "v"}',
        }
        for i in range(12)
    ]
    df = spark.createDataFrame(
        [("p1", None, "doc", "full text", None, None, None, None, '{"src": "s"}', els),
         ("p2", None, "doc", "other", None, None, None, None, None, els[:3])],
        fields,
    )
    back = unexplode_elements(explode_elements(df))
    rows = {r["doc_id"]: r for r in back.collect()}
    assert set(rows) == {"p1", "p2"}
    got = [e["text_representation"] for e in rows["p1"]["elements"]]
    assert got == [f"chunk {i}" for i in range(12)]  # element_index order kept
    assert [e["element_index"] for e in rows["p2"]["elements"]] == [0, 1, 2]
    assert rows["p1"]["properties"] == '{"src": "s"}'  # parent row untouched
    assert rows["p1"]["elements"][3]["bbox"] == [0.1, 0.30000000000000004, 0.9, 0.35000000000000003]


def test_unexplode_parent_without_children_keeps_null_elements(spark):
    from sycamore_spark.data.schema import DOC_SCHEMA
    from sycamore_spark.operators.elements import unexplode_elements

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in DOC_SCHEMA.fields)
    df = spark.createDataFrame(
        [("lonely", None, "doc", "t", None, None, None, None, None, None)], fields
    )
    out = unexplode_elements(df).collect()
    assert out[0]["doc_id"] == "lonely" and out[0]["elements"] is None


def _box_doc(spark, boxes):
    from sycamore_spark.data.schema import DOC_SCHEMA

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in DOC_SCHEMA.fields)
    els = [
        {"element_index": i, "type": "text", "text_representation": f"e{i}",
         "binary_representation": None, "bbox": list(map(float, b)),
         "page_number": 1, "embedding": None, "properties": None}
        for i, b in enumerate(boxes)
    ]
    return spark.createDataFrame(
        [("d1", None, "doc", None, None, None, None, None, None, els)], fields)


def test_xycut_two_column_reading_order(spark):
    from sycamore_spark.operators.elements import xycut_sort_elements

    # staggered 2-column layout: no horizontal gap spans both columns,
    # so the vertical cut fires first -> left column fully, then right
    boxes = [
        [0.55, 0.15, 0.95, 0.35],  # right r1
        [0.05, 0.00, 0.45, 0.20],  # left r1
        [0.55, 0.40, 0.95, 0.60],  # right r2
        [0.05, 0.25, 0.45, 0.45],  # left r2
    ]
    out = xycut_sort_elements(_box_doc(spark, boxes)).collect()[0]["elements"]
    assert [e["text_representation"] for e in out] == ["e1", "e3", "e0", "e2"]
    assert [e["element_index"] for e in out] == [0, 1, 2, 3]


def test_xycut_aligned_rows_read_row_major(spark):
    from sycamore_spark.operators.elements import xycut_sort_elements

    # aligned rows: horizontal gaps span the page -> row-major order
    boxes = [
        [0.55, 0.00, 0.95, 0.10],  # row1 right
        [0.05, 0.00, 0.45, 0.10],  # row1 left
        [0.05, 0.50, 0.45, 0.60],  # row2 left
    ]
    out = xycut_sort_elements(_box_doc(spark, boxes)).collect()[0]["elements"]
    assert [e["text_representation"] for e in out] == ["e1", "e0", "e2"]


def test_reorder_elements_by_key(spark):
    from sycamore_spark.operators.elements import reorder_elements

    df = _box_doc(spark, [[0.0, 0.9, 1.0, 1.0], [0.0, 0.1, 1.0, 0.2]])
    out = reorder_elements(df, key=lambda e: e["bbox"][1]).collect()[0]["elements"]
    assert [e["text_representation"] for e in out] == ["e1", "e0"]
    assert [e["element_index"] for e in out] == [0, 1]


def test_bbox_sort_two_column_sections(spark):
    # page: full-width title, then 2-column body (L1 R1 L2 R2 interleaved
    # vertically), then full-width footer. bbox sort must read the body
    # column-first: L1 L2 R1 R2.
    from sycamore_spark.operators.elements import bbox_sort_elements

    boxes = {
        "title": [0.05, 0.05, 0.95, 0.12],
        "L1": [0.08, 0.20, 0.45, 0.40],
        "R1": [0.55, 0.22, 0.92, 0.42],
        "L2": [0.08, 0.45, 0.45, 0.65],
        "R2": [0.55, 0.47, 0.92, 0.67],
        "footer": [0.05, 0.90, 0.95, 0.97],
    }
    els = [
        {"element_index": i, "type": "text", "text_representation": k,
         "binary_representation": None, "bbox": v, "page_number": 1,
         "embedding": None, "properties": None}
        for i, (k, v) in enumerate(boxes.items())
    ]
    df = spark.createDataFrame(
        [(1, els)],
        "doc_id long, elements array<struct<element_index int, type string, "
        "text_representation string, binary_representation binary, "
        "bbox array<double>, page_number int, embedding array<float>, properties string>>",
    )
    out = bbox_sort_elements(df).collect()[0]["elements"]
    order = [e["text_representation"] for e in out]
    assert order == ["title", "L1", "L2", "R1", "R2", "footer"]
    assert [e["element_index"] for e in out] == list(range(6))


def test_bbox_sort_single_column_unchanged(spark):
    from sycamore_spark.operators.elements import bbox_sort_elements

    els = [
        {"element_index": i, "type": "text", "text_representation": f"p{i}",
         "binary_representation": None, "bbox": [0.1, 0.1 * i, 0.9, 0.1 * i + 0.08],
         "page_number": 1, "embedding": None, "properties": None}
        for i in (2, 0, 1)
    ]
    df = spark.createDataFrame(
        [(1, els)],
        "doc_id long, elements array<struct<element_index int, type string, "
        "text_representation string, binary_representation binary, "
        "bbox array<double>, page_number int, embedding array<float>, properties string>>",
    )
    out = bbox_sort_elements(df).collect()[0]["elements"]
    # full-width rows: pure vertical order by y (p0 has index 1 originally)
    assert [e["text_representation"] for e in out] == ["p0", "p1", "p2"]


def test_bbox_sort_full_width_element_inside_two_column_band(spark):
    """Reference-parity case (ADVICE r5): a full-width figure whose y-band
    overlaps a left/right pair is retagged '2col' WITH the band (reference
    tag_two_columns retags every band member), and the 2col section runs
    through it to the next 'full' transition — so the left column reads
    first (L1 L2), then the figure (quantized col 1), then the right
    column (R1 R2)."""
    from sycamore_spark.operators.elements import bbox_sort_elements

    boxes = {
        "title": [0.10, 0.05, 0.90, 0.10],
        "L1": [0.10, 0.15, 0.45, 0.30],
        "R1": [0.55, 0.15, 0.90, 0.30],
        "fig": [0.20, 0.20, 0.85, 0.25],   # width 0.65 -> 'full', overlaps the band
        "L2": [0.10, 0.35, 0.45, 0.50],
        "R2": [0.55, 0.35, 0.90, 0.50],
        "footer": [0.10, 0.90, 0.90, 0.95],
    }
    els = [
        {"element_index": i, "type": "text", "text_representation": k,
         "binary_representation": None, "bbox": v, "page_number": 1,
         "embedding": None, "properties": None}
        for i, (k, v) in enumerate(boxes.items())
    ]
    df = spark.createDataFrame(
        [(1, els)],
        "doc_id long, elements array<struct<element_index int, type string, "
        "text_representation string, binary_representation binary, "
        "bbox array<double>, page_number int, embedding array<float>, properties string>>",
    )
    out = bbox_sort_elements(df).collect()[0]["elements"]
    order = [e["text_representation"] for e in out]
    # hkey = (int(5*left), top): L1/L2 col 0, fig col 1, R1/R2 col 2
    assert order == ["title", "L1", "L2", "fig", "R1", "R2", "footer"]


def test_xycut_widest_gap_wins_over_axis_preference(spark):
    """Reference semantics (utils/xycut.py choose_axis): the WIDEST
    whitespace gap picks the cut axis. Here the vertical gap (0.3) beats
    the narrow horizontal gap (0.05), so the page reads column-first —
    an always-split-on-y implementation would read row-major instead."""
    from sycamore_spark.operators.elements import xycut_sort_elements

    boxes = {
        "L1": [0.0, 0.00, 0.2, 0.40],
        "R1": [0.5, 0.00, 0.7, 0.40],
        "L2": [0.0, 0.45, 0.2, 0.90],
        "R2": [0.5, 0.45, 0.7, 0.90],
    }
    els = [
        {"element_index": i, "type": "text", "text_representation": k,
         "binary_representation": None, "bbox": v, "page_number": 1,
         "embedding": None, "properties": None}
        for i, (k, v) in enumerate(boxes.items())
    ]
    df = spark.createDataFrame(
        [(1, els)],
        "doc_id long, elements array<struct<element_index int, type string, "
        "text_representation string, binary_representation binary, "
        "bbox array<double>, page_number int, embedding array<float>, properties string>>",
    )
    out = xycut_sort_elements(df).collect()[0]["elements"]
    assert [e["text_representation"] for e in out] == ["L1", "L2", "R1", "R2"]


def test_split_elements_reference_boundary_semantics(spark):
    """Reference split_one parity: the outward midpoint scan must prefer a
    NEARBY comma over a FAR sentence end (scan radius half//2), halves are
    kept verbatim (concatenation reproduces the text), and each half's
    binary is the re-encoded text (add_binary)."""
    # sentence '.' only near the start; ',' sits exactly mid-text
    left = "alpha beta gamma. " + "pad " * 20
    text = (left + "middle, " + "tail " * 21).strip()
    df = docs_from_rows(spark, [dict(doc_id="d", elements=[
        dict(type="text", text_representation=text),
    ])])
    out = E.split_elements(df, max_tokens=30).collect()[0]
    parts = [e.text_representation for e in out.elements]
    assert "".join(parts) == text  # verbatim halves, no trimming
    assert any(p.endswith("middle,") for p in parts)  # cut right after the comma
    for e in out.elements:
        assert bytes(e.binary_representation) == e.text_representation.encode()


def _el(i, typ, props=None, page=None):
    return {
        "element_index": i,
        "type": typ,
        "text_representation": f"e{i}",
        "binary_representation": None,
        "bbox": None,
        "page_number": page,
        "embedding": None,
        "properties": props,
    }


def test_to_html_tables_renders_and_enumerates(spark):
    import json as _json

    from sycamore_spark.data.schema import DOC_SCHEMA
    from sycamore_spark.operators.elements import to_html_tables

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in DOC_SCHEMA.fields)
    cells = [
        {"content": "h&1", "rows": [0], "cols": [0], "is_header": True, "bbox": None},
        {"content": "h<2", "rows": [0], "cols": [1], "is_header": True, "bbox": None},
        {"content": "a", "rows": [1], "cols": [0], "is_header": False, "bbox": None},
        {"content": "b", "rows": [1, 2], "cols": [1], "is_header": False, "bbox": None},
    ]
    tprops = _json.dumps({"table_cells": cells})
    els = [
        _el(0, "text"),
        _el(1, "table", tprops, page=3),
        _el(2, "text"),
        _el(3, "table", tprops),  # no element page -> falls back to doc page
    ]
    df = spark.createDataFrame(
        [("d1", None, "doc", "t", None, None, None, None,
          '{"path": "/data/reports/q3.final.pdf", "page_number": 9}', els)],
        fields,
    )
    out = sorted(to_html_tables(df).collect(), key=lambda r: r.table_num)
    assert [r.table_num for r in out] == [0, 1]  # tables only, 0-based
    expect = (
        "<html><body><table>"
        "<tr><th>h&amp;1</th><th>h&lt;2</th></tr>"
        '<tr><td>a</td><td rowspan="2">b</td></tr>'
        "<tr></tr>"
        "</table></body></html>"
    )
    assert out[0].text_representation == expect
    # filename strips ONLY the last extension, like the reference's
    # ".".join(name.split(".")[:-1])
    assert out[0].filename == "q3.final_table_0.html"
    assert out[1].filename == "q3.final_table_1.html"
    assert out[0].page_number == 3      # element page wins
    assert out[1].page_number == 9      # doc-properties fallback
    assert out[0].parent_id == "d1"
    assert out[0].path == "/data/reports/q3.final.pdf"


def test_to_html_tables_missing_cells_raises_and_no_wrap(spark):
    import json as _json

    import pytest
    from pyspark.errors import PythonException

    from sycamore_spark.data.schema import DOC_SCHEMA
    from sycamore_spark.operators.elements import to_html_tables

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in DOC_SCHEMA.fields)
    df = spark.createDataFrame(
        [("d1", None, "doc", "t", None, None, None, None,
          '{"path": "noext"}',
          [_el(0, "table", '{"caption": "only"}')])],
        fields,
    )
    with pytest.raises(PythonException, match="table_cells"):
        to_html_tables(df).collect()

    cells = [{"content": "x", "rows": [0], "cols": [0], "is_header": False,
              "bbox": None}]
    df2 = spark.createDataFrame(
        [("d2", None, "doc", "t", None, None, None, None,
          '{"path": "noext"}',
          [_el(0, "table", _json.dumps({"table_cells": cells,
                                        "caption": "Cap"}))])],
        fields,
    )
    row = to_html_tables(df2, wrap_in_html=False).collect()[0]
    assert row.text_representation == (
        "<table><caption>Cap</caption><tr><td>x</td></tr></table>"
    )
    # reference filename_fn: extension-less name -> empty base
    assert row.filename == "_table_0.html"
