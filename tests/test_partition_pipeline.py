"""Partitioner contract (per-row + batched) and the e2e layout pipeline:
binary -> partition -> bbox marks -> merge -> TableMerger -> explode
(reference pipeline shape: examples/bench.py partition+marks+merge)."""

import json

from pyspark.sql import functions as F

from sycamore_spark.data.schema import DOC_SCHEMA
from sycamore_spark.operators import elements as ops
from sycamore_spark.operators.partition import (
    FakeLayoutPartitioner,
    HtmlPartitioner,
    partition,
)

_FIELDS = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in DOC_SCHEMA.fields)


def _docs_df(spark, texts):
    rows = [
        (f"d{i}", None, "doc", None, t.encode("utf-8"), None, None, None, None, None)
        for i, t in enumerate(texts)
    ]
    return spark.createDataFrame(rows, _FIELDS)


def test_partition_batch_contract(spark):
    """partition() must feed the whole Arrow batch to partition_batch and
    align results row-by-row."""
    texts = [f"document number {i} with some words " * 4 for i in range(6)]
    out = partition(_docs_df(spark, texts), FakeLayoutPartitioner()).collect()
    assert len(out) == 6
    for r in out:
        els = r["elements"]
        assert len(els) >= 6  # at least one full page of layout elements
        assert json.loads(r["properties"])["_partitioned"] == "true"
        # contract: element types are the layout taxonomy, bboxes in [0,1]
        types = {e["type"] for e in els}
        assert {"Page-header", "Text", "table", "Page-footer"} <= types
        for e in els:
            x1, y1, x2, y2 = e["bbox"]
            assert 0 <= x1 <= x2 <= 1 and 0 <= y1 <= y2 <= 1


def test_partition_batch_row_count_mismatch_raises(spark):
    class Broken:
        def partition_batch(self, pdf):
            return [[]]  # always one list, regardless of batch size

    import pytest

    with pytest.raises(Exception, match="one per row"):
        # one partition so the whole 3-row batch reaches partition_batch
        partition(_docs_df(spark, ["a", "b", "c"]).coalesce(1), Broken()).collect()


def test_per_row_partitioner_still_works(spark):
    out = partition(
        _docs_df(spark, ["<html><h1>T</h1><p>body text</p></html>"]), HtmlPartitioner()
    ).collect()
    els = out[0]["elements"]
    assert [e["type"] for e in els] == ["title", "text"]


def test_e2e_layout_pipeline_hash_stable(spark):
    """binary -> FakeLayout partition -> header/footer+tiny marks + page
    breaks -> merge_marked -> explode; headers/footers and noise boxes are
    gone, one merged chunk per page, output deterministic across runs."""
    texts = [f"alpha bravo charlie delta echo {i} " * 6 for i in range(4)]

    def run_once(top_margin):
        df = partition(_docs_df(spark, texts), FakeLayoutPartitioner())
        df = ops.sort_by_page_bbox(df)
        df = ops.mark_drop_header_footer(df, top=top_margin)
        df = ops.mark_drop_tiny(df)
        df = ops.mark_break_page(df)
        df = ops.merge_marked(df)
        exploded = ops.explode_elements(df).filter(F.col("parent_id").isNotNull())
        rows = exploded.select("parent_id", "type", "text_representation").collect()
        return sorted((r["parent_id"], r["type"], r["text_representation"]) for r in rows)

    first, second = run_once(0.05), run_once(0.05)
    assert first == second  # hash-stable
    texts_out = [t for _, _, t in first]
    assert not any("header" in t for t in texts_out if t)
    assert not any("speck" in (t or "") for t in texts_out)
    # page headers carry the _break AND are dropped -> the break is swallowed
    # with them (faithful to the reference MarkedMerger drop-before-break
    # order): exactly one merged chunk per doc
    assert {d for d, _, _ in first} == {f"d{i}" for i in range(4)}
    assert len(first) == 4

    # keep the headers (top margin 0) and the per-page breaks survive:
    # one merged chunk per page per doc
    kept = run_once(0.0)
    pages = {
        r["doc_id"]: max(e["page_number"] for e in r["elements"])
        for r in partition(_docs_df(spark, texts), FakeLayoutPartitioner()).collect()
    }
    per_doc = {}
    for d, _, _ in kept:
        per_doc[d] = per_doc.get(d, 0) + 1
    assert per_doc == pages


def test_e2e_table_merger_on_layout_output(spark):
    """TableMerger consumes the partitioner's layout output directly: the
    per-page caption regex lands on each table's text/title."""
    texts = ["alpha bravo charlie delta echo " * 8]
    df = partition(_docs_df(spark, texts), FakeLayoutPartitioner())
    df = ops.sort_by_page_bbox(df)
    out = ops.merge_tables(df, regex_pattern=r"^p\d+ header$")
    els = out.collect()[0]["elements"]
    tables = [e for e in els if e["type"] == "table"]
    assert tables, "layout fake always emits tables"
    for t in tables:
        page = t["page_number"]
        assert t["text_representation"].startswith(f"p{page} header ")
        assert json.loads(t["properties"])["title"] == f"p{page} header "


def test_html_partitioner_extract_tables(spark):
    html = (
        "<html><h1>Report</h1><p>Before the table.</p>"
        "<table><tr><th>name</th><th>qty</th></tr>"
        "<tr><td>apples</td><td>3</td></tr>"
        "<tr><td>pears</td><td>5</td></tr></table>"
        "<p>After the table.</p></html>"
    )
    df = _docs_df(spark, [html])
    out = partition(df, HtmlPartitioner(extract_tables=True)).collect()
    els = out[0]["elements"]
    kinds = [e["type"] for e in els]
    assert "table" in kinds
    table_el = next(e for e in els if e["type"] == "table")
    assert "apples" in table_el["text_representation"] and "3" in table_el["text_representation"]
    # document order preserved: table between the surrounding prose
    assert kinds.index("table") > kinds.index("title")
    # default mode unchanged: no table elements
    plain = partition(df, HtmlPartitioner()).collect()[0]["elements"]
    assert all(e["type"] != "table" for e in plain)
