"""llm_map_elements / summarize_images / extract_table_properties +
document-structure extraction (reference: base_llm.py LLMMapElements,
summarize_images.py, extract_table_properties.py,
extract_document_structure.py)."""

import json

import pytest
from pyspark.sql import functions as F

from sycamore_spark.llm.client import MockLLM
from sycamore_spark.llm.map import (
    extract_table_properties,
    llm_map_elements,
    summarize_images,
)
from sycamore_spark.operators.elements import assign_sections, extract_document_structure


def el(i, text, typ="Text", props=None):
    return {
        "element_index": i,
        "type": typ,
        "text_representation": text,
        "binary_representation": None,
        "bbox": None,
        "page_number": 1,
        "embedding": None,
        "properties": json.dumps(props) if props else None,
    }


ELS_DDL = (
    "array<struct<element_index int, type string, text_representation string, "
    "binary_representation binary, bbox array<double>, page_number int, "
    "embedding array<float>, properties string>>"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (
            "d1",
            [
                el(0, "Intro", typ="Section-header"),
                el(1, "body one"),
                el(2, "img-bytes", typ="Image"),
                el(3, "Methods", typ="Section-header"),
                el(4, "a,b\n1,2", typ="table"),
                el(5, "body two"),
            ],
        ),
        ("d2", [el(0, "no headers here")]),
    ]
    return spark.createDataFrame(rows, f"doc_id string, elements {ELS_DDL}")


def echo_factory():
    def factory():
        return MockLLM([(r"Context: (\S+)", lambda m: f"desc:{m.group(1)}"),
                        (r"Table: (\S+)", lambda m: json.dumps({"first": m.group(1)}))])

    return factory


def props_of(e):
    return json.loads(e["properties"] or "{}")


def test_summarize_images_only_touches_images(spark, docs):
    out = summarize_images(docs, echo_factory()).collect()
    d1 = {e["element_index"]: e.asDict() for e in out[0]["elements"] if out[0]["doc_id"] == "d1"}
    rows = {r["doc_id"]: r for r in out}
    els = {e["element_index"]: props_of(e) for e in rows["d1"]["elements"]}
    assert els[2].get("summary") == "desc:img-bytes"
    assert "summary" not in els[1]


def test_extract_table_properties(spark, docs):
    out = {r["doc_id"]: r for r in extract_table_properties(docs, echo_factory()).collect()}
    els = {e["element_index"]: props_of(e) for e in out["d1"]["elements"]}
    assert json.loads(els[4]["table_kv"]) == {"first": "a,b"}


def test_llm_map_elements_generic(spark, docs):
    out = llm_map_elements(
        docs, "len {{ elt.text_representation }}", "n", lambda: MockLLM([(r"len (.*)", lambda m: str(len(m.group(1))))])
    ).collect()
    rows = {r["doc_id"]: r for r in out}
    els = {e["element_index"]: props_of(e) for e in rows["d2"]["elements"]}
    assert els[0]["n"] == str(len("no headers here"))


def test_assign_sections(spark, docs):
    out = {r["doc_id"]: r for r in assign_sections(docs).collect()}
    tags = [(props_of(e)["_section_idx"], props_of(e)["_section_title"]) for e in out["d1"]["elements"]]
    assert tags == [("1", "Intro"), ("1", "Intro"), ("1", "Intro"),
                    ("2", "Methods"), ("2", "Methods"), ("2", "Methods")]
    d2 = [props_of(e)["_section_idx"] for e in out["d2"]["elements"]]
    assert d2 == ["0"]


def test_extract_document_structure(spark, docs):
    out = {r["doc_id"]: r for r in extract_document_structure(docs).collect()}
    secs = out["d1"]["sections"]
    assert [s["section_idx"] for s in secs] == [1, 2]
    assert [s["title"] for s in secs] == ["Intro", "Methods"]
    assert [len(s["elements"]) for s in secs] == [3, 3]
    assert [s["section_idx"] for s in out["d2"]["sections"]] == [0]
