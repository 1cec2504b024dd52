"""Merge variants + token/column break marks (reference:
transforms/merge_elements.py, mark_misc.py, bbox_merge.py)."""

import json

import pytest
from pyspark.sql import functions as F

from sycamore_spark.data.schema import DOC_SCHEMA
from sycamore_spark.operators import elements as ops


def el(i, text, typ="Text", page=1, bbox=None, props=None):
    return {
        "element_index": i,
        "type": typ,
        "text_representation": text,
        "binary_representation": None,
        "bbox": bbox,
        "page_number": page,
        "embedding": None,
        "properties": json.dumps(props) if props else None,
    }


ELS_TYPE = DOC_SCHEMA["elements"].dataType


def mk(spark, els):
    return spark.createDataFrame(
        [("d1", els)],
        f"doc_id string, elements {ELS_TYPE.simpleString()}",
    )


def get_els(df):
    return [r.asDict(recursive=True) for r in df.collect()[0]["elements"]]


def test_mark_break_by_tokens(spark):
    # 3 elements of 4 tokens each, limit 7: e2 exceeds (4+4>7) -> break,
    # reset to 4; e3 exceeds again -> break.
    els = [el(i, "a b c d") for i in range(3)]
    out = get_els(ops.mark_break_by_tokens(mk(spark, els), limit=7))
    marks = [json.loads(e["properties"] or "{}").get("_break") for e in out]
    assert marks == [None, "true", "true"]


def test_mark_break_by_tokens_respects_existing(spark):
    els = [el(0, "a b"), el(1, "c d", props={"_break": "true"}), el(2, "e f")]
    out = get_els(ops.mark_break_by_tokens(mk(spark, els), limit=100))
    marks = [json.loads(e["properties"] or "{}").get("_break") for e in out]
    # existing break kept, counter reset → no spurious marks after
    assert marks == [None, "true", None]


def test_mark_break_by_column(spark):
    els = [
        el(0, "col", bbox=[0.1, 0.1, 0.45, 0.2]),
        el(1, "col", bbox=[0.55, 0.1, 0.9, 0.2]),
        el(2, "full width", bbox=[0.1, 0.3, 0.9, 0.4]),
    ]
    out = get_els(ops.mark_break_by_column(mk(spark, els)))
    marks = [json.loads(e["properties"] or "{}").get("_break") for e in out]
    assert marks == [None, None, "true"]


def test_merge_marked(spark):
    els = [
        el(0, "a"),
        el(1, "dropme", props={"_drop": "true"}),
        el(2, "b"),
        el(3, "c", props={"_break": "true"}),
        el(4, "d"),
    ]
    out = get_els(ops.merge_marked(mk(spark, els)))
    assert [e["text_representation"] for e in out] == ["a\nb", "c\nd"]
    assert [e["element_index"] for e in out] == [0, 1]


def test_merge_greedy_section_rules(spark):
    els = [
        el(0, "t1"),
        el(1, "t2"),
        el(2, "hdr", typ="Section-header"),
        el(3, "tbl", typ="table"),
        el(4, "img", typ="Image"),
        el(5, "cap1"),
        el(6, "cap2"),
    ]
    out = get_els(ops.merge_greedy_section(mk(spark, els), max_tokens=100))
    assert [(e["type"], e["text_representation"]) for e in out] == [
        ("Text", "t1\nt2"),
        ("Section-header+table", "hdr\ntbl"),
        ("Image+Text", "img\ncap1\ncap2"),
    ]


def test_merge_greedy_section_page_boundary(spark):
    els = [el(0, "t1", page=1), el(1, "t2", page=2)]
    out = get_els(ops.merge_greedy_section(mk(spark, els), merge_across_pages=False))
    assert len(out) == 2


def test_merge_header_augment(spark):
    els = [el(0, "Intro", typ="Section-header"), el(1, "body a"), el(2, "body b")]
    out = get_els(ops.merge_header_augment(mk(spark, els)))
    assert out[1]["text_representation"] == "Intro\nbody a"
    assert json.loads(out[2]["properties"])["_header"] == "Intro"


def test_mark_bbox_preset_pipeline(spark):
    els = [
        el(0, "tiny", bbox=[0.5, 0.5, 0.5001, 0.5001]),
        el(1, "header text", bbox=[0.1, 0.01, 0.9, 0.03]),
        el(2, "body " * 5, bbox=[0.1, 0.2, 0.9, 0.3]),
        el(3, "more " * 5, bbox=[0.1, 0.4, 0.9, 0.5]),
    ]
    df = ops.mark_bbox_preset(mk(spark, els), token_limit=6)
    out = get_els(ops.merge_marked(df))
    # tiny + header/footer dropped; token budget splits the two body els
    texts = [e["text_representation"] for e in out]
    assert len(out) == 2 and "tiny" not in " ".join(texts) and "header" not in " ".join(texts)


# -- TableMerger (reference merge_elements.py:424-611) ----------------------


def _table_el(i, text, page, cells=None, title=None, cont=None):
    props = {"page_number": page}
    if cells is not None:
        props["table_cells"] = cells
    if title is not None:
        props["title"] = title
    if cont is not None:
        props["table_continuation"] = cont
    return el(i, text, typ="table", page=page, props=props)


def _cells(rows):
    """rows: list of list of content strings, row 0 headers."""
    out = []
    for r, row in enumerate(rows):
        for c, content in enumerate(row):
            out.append(
                {"content": content, "rows": [r], "cols": [c], "is_header": r == 0, "bbox": None}
            )
    return out


def test_table_merger_regex_header_addition(spark):
    els = [
        el(0, "Table 1: Quarterly results", typ="Caption", page=1),
        _table_el(1, "q1 data", page=1),
        el(2, "plain prose", typ="Text", page=2),
        _table_el(3, "q2 data", page=2, title="Existing"),
    ]
    df = mk(spark, els)
    out = get_els(ops.merge_tables(df, regex_pattern=r"Table \d+"))
    tables = [e for e in out if e["type"] == "table"]
    # page-2 table has no matching caption on its page -> untouched text
    assert tables[1]["text_representation"] == "q2 data"
    assert tables[0]["text_representation"] == "Table 1: Quarterly results q1 data"
    p0 = json.loads(tables[0]["properties"])
    assert p0["title"] == "Table 1: Quarterly results "
    p1 = json.loads(tables[1]["properties"])
    assert p1["title"] == "Existing"


def test_table_merger_continuation_merge(spark):
    c1 = _cells([["h1", "h2"], ["a", "b"]])
    c2 = _cells([["c", "d"], ["e", "f"]])
    els = [
        _table_el(0, "part one", page=1, cells=c1, title="T1"),
        el(1, "between", typ="Text", page=1),
        _table_el(2, "part two", page=2, cells=c2, title="T2", cont="true"),
        _table_el(3, "unrelated", page=3, cells=None, cont="false"),
    ]
    df = mk(spark, els)
    out = get_els(ops.merge_tables(df))
    types = [e["type"] for e in out]
    # non-tables keep order first, surviving tables appended (reference order)
    assert types == ["Text", "table", "table"]
    merged = out[1]
    assert merged["text_representation"] == "part one\npart two"
    props = json.loads(merged["properties"])
    assert props["title"] == "T1 / T2"
    assert props["page_numbers"] == [1, 2]
    cells = props["table_cells"]
    # second table's rows offset by first table's 2 rows
    assert [c["rows"] for c in cells] == [[0], [0], [1], [1], [2], [2], [3], [3]]
    assert cells[4]["content"] == "c"
    # continuation flags: merged -> true, standalone -> false semantics kept
    assert out[2]["text_representation"] == "unrelated"


def test_table_merger_llm_continuation(spark):
    from sycamore_spark.llm.client import LLM

    class ContLLM(LLM):
        def generate_batch(self, prompts):
            # first table prompt has no ELEMENT pair; second is a continuation
            return ["false" if "ELEMENT 1" not in p else "true" for p in prompts]

    els = [
        _table_el(0, "alpha", page=1, cells=_cells([["x"]])),
        _table_el(1, "beta", page=2, cells=_cells([["y"]])),
    ]
    df = mk(spark, els)
    out = get_els(ops.merge_tables(df, llm_factory=ContLLM, prompt="continuation?"))
    tables = [e for e in out if e["type"] == "table"]
    assert len(tables) == 1
    assert tables[0]["text_representation"] == "alpha\nbeta"
    cells = json.loads(tables[0]["properties"])["table_cells"]
    assert [c["rows"] for c in cells] == [[0], [1]]


def test_table_merger_no_tables_is_identity(spark):
    els = [el(0, "a"), el(1, "b")]
    out = get_els(ops.merge_tables(mk(spark, els), regex_pattern=r"Table \d+"))
    assert [e["text_representation"] for e in out] == ["a", "b"]
