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
