"""Page-level document ops (reference utils/pdf_utils.py:
flatten_selected_pages validation parity, select_pages renumbering,
split_pdf fan-out, promote_title first-wins argmax)."""

import json

import pytest
from pyspark.sql import functions as F

from sycamore_spark.operators.pages import (
    flatten_selected_pages,
    promote_title,
    select_pages,
    split_pages,
)


def _docs(spark, n_pages=5, with_title=False):
    rows = []
    for doc_id in ["a", "b"]:
        els = []
        for p in range(1, n_pages + 1):
            els.append(
                {
                    "element_index": p - 1,
                    "type": "Title" if (with_title and p == 1) else "text",
                    "text_representation": f"{doc_id}-page{p}",
                    "page_number": p,
                    "properties": None,
                }
            )
        rows.append((doc_id, None, els))
    return spark.createDataFrame(
        rows,
        "doc_id string, properties string, elements array<struct<"
        "element_index int, type string, text_representation string, "
        "page_number int, properties string>>",
    )


def test_flatten_selected_pages_reference_parity():
    # reference docstring examples (pdf_utils.py:99-110)
    assert flatten_selected_pages([1, 2, 3], 10) == ([1, 2, 3], {})
    assert flatten_selected_pages([[1, 3], 5], 10) == ([1, 2, 3, 5], {4: 5})
    assert flatten_selected_pages([2, 1, [4, 6]], 10) == (
        [2, 1, 4, 5, 6],
        {1: 2, 2: 1, 3: 4, 4: 5, 5: 6},
    )
    with pytest.raises(ValueError, match="a <= b"):
        flatten_selected_pages([[3, 1]], 10)
    with pytest.raises(ValueError, match="overlapping"):
        flatten_selected_pages([1, [1, 2]], 10)
    with pytest.raises(ValueError, match="at most 2"):
        flatten_selected_pages([3], 2)
    with pytest.raises(ValueError, match="2-element"):
        flatten_selected_pages([[1, 2, 3]], 10)


def test_select_pages_renumbers_and_records_remap(spark):
    out = select_pages(_docs(spark), [2, [4, 5]], page_count=5)
    rows = {r.doc_id: r for r in out.collect()}
    a = rows["a"]
    got = [(e.page_number, e.text_representation) for e in a.elements]
    # page 2 -> 1, page 4 -> 2, page 5 -> 3; pages 1 and 3 dropped
    assert got == [(1, "a-page2"), (2, "a-page4"), (3, "a-page5")]
    assert json.loads(a.properties)["remapped_pages"] == '{"1": 2, "2": 4, "3": 5}'


def test_select_pages_binary_seam(spark):
    df = _docs(spark).withColumn("binary_representation", F.encode("doc_id", "utf-8"))
    calls = []

    def fake_rewrite(binary, page_list):
        calls.append(page_list)
        return binary + b":" + ",".join(map(str, page_list)).encode()

    out = select_pages(df, [1], page_count=5, binary_fn=fake_rewrite).collect()
    assert {bytes(r.binary_representation) for r in out} == {b"a:1", b"b:1"}


def test_split_pages_children(spark):
    out = split_pages(_docs(spark), num_pages=2)
    rows = sorted(
        (r for r in out.collect() if r.parent_id == "a"),
        key=lambda r: r._split_index,
    )
    assert [r.doc_id for r in rows] == ["a-pg0", "a-pg1", "a-pg2"]
    # chunk 1 = pages 3,4 renumbered to 1,2
    got = [(e.page_number, e.text_representation) for e in rows[1].elements]
    assert got == [(1, "a-page3"), (2, "a-page4")]
    p = json.loads(rows[1].properties)
    assert p["_original_id"] == "a" and p["_split_index"] == "1"
    assert json.loads(p["remapped_pages"]) == {"1": 3, "2": 4}
    assert json.loads(json.loads(rows[0].properties)["remapped_pages"]) == {}
    # chunk 2 = page 5 only; remap bounded by the page count (the reference
    # passes [[start, min(pc, start+num_pages-1)]] to flatten_selected_pages)
    assert [e.text_representation for e in rows[2].elements] == ["a-page5"]
    assert json.loads(json.loads(rows[2].properties)["remapped_pages"]) == {"1": 5}


def _font_docs(spark, spec):
    """spec: list of (type, page, font_size or None)."""
    els = [
        {
            "element_index": i,
            "type": t,
            "text_representation": f"e{i}",
            "page_number": p,
            "properties": json.dumps({"font_size": f}) if f is not None else None,
        }
        for i, (t, p, f) in enumerate(spec)
    ]
    return spark.createDataFrame(
        [("d", None, els)],
        "doc_id string, properties string, elements array<struct<"
        "element_index int, type string, text_representation string, "
        "page_number int, properties string>>",
    )


def test_promote_title_first_wins_on_max_font(spark):
    df = _font_docs(
        spark,
        [
            ("Caption", 1, 12.0),
            ("Section-header", 1, 14.0),  # first at the max -> promoted
            ("Section-header", 1, 14.0),
            ("text", 1, 99.0),  # not a candidate
            ("Section-header", 2, 50.0),  # wrong page
        ],
    )
    out = promote_title(df).collect()[0]
    assert [e.type for e in out.elements] == [
        "Caption", "Title", "Section-header", "text", "Section-header"
    ]


def test_promote_title_noop_with_existing_title_or_no_candidates(spark):
    df = _font_docs(spark, [("Title", 1, None), ("Section-header", 1, 20.0)])
    out = promote_title(df).collect()[0]
    assert [e.type for e in out.elements] == ["Title", "Section-header"]
    df2 = _font_docs(spark, [("text", 1, 10.0), ("Section-header", 1, None)])
    out2 = promote_title(df2).collect()[0]  # candidates lack font_size -> no-op
    assert [e.type for e in out2.elements] == ["text", "Section-header"]


def test_docset_fluent_pages(spark):
    from sycamore_spark.docset import DocSet

    ds = DocSet(_docs(spark))
    assert ds.select_pages([1]).to_df().count() == 2
    assert ds.split_pages(2).to_df().count() == 6
    assert ds.promote_title().to_df().count() == 2


def test_split_pages_composes_with_downstream_stages(spark):
    """Children must stay DOC-shaped (code-review finding: the split select
    dropped text/binary/shingles/embedding, breaking .sketch()/.explode())."""
    from sycamore_spark.data.schema import docs_from_rows
    from sycamore_spark.docset import DocSet
    from sycamore_spark.operators.pages import split_pages

    df = docs_from_rows(spark, [{
        "doc_id": "d1", "type": "pdf", "text_representation": "whole doc",
        "elements": [
            {"text_representation": "p1", "page_number": 1},
            {"text_representation": "p2", "page_number": 2},
        ],
    }])
    out = split_pages(df, num_pages=1)
    assert "text_representation" in out.columns and "binary_representation" in out.columns
    # the review's failure scenario: a downstream standard stage
    sk = DocSet(out.drop("_split_index")).sketch().to_df().collect()
    assert all(r.shingles is not None for r in sk)
    assert {r.type for r in sk} == {"pdf"}  # inherited
    assert all(r.binary_representation is None for r in sk)  # gated seam
