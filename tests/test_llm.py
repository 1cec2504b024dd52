"""LLM stage semantics with deterministic mocks (reference test model:
MockLLM in tests/unit/test_docset.py:44-100)."""

from pyspark.sql import functions as F

from sycamore_spark.llm import MockLLM, extract_entity, llm_filter, llm_map, summarize_data, summarize_docs
from sycamore_spark.llm.client import ScoringMockLLM
from sycamore_spark.llm.map import llm_cluster_entity


def _docs(spark):
    return spark.createDataFrame([
        (1, "spark spark spark is great"),
        (2, "spark is fine"),
        (3, "nothing relevant here"),
    ], "doc_id int, text_representation string")


def test_llm_map_renders_and_maps(spark):
    out = llm_map(
        _docs(spark), "Echo: {{ doc.doc_id }}", "reply",
        lambda: MockLLM([(r"Echo: (\d+)", lambda m: f"id={m.group(1)}")]),
    ).collect()
    assert {r.doc_id: r.reply for r in out} == {1: "id=1", 2: "id=2", 3: "id=3"}


def test_llm_map_validate_gives_null_after_retries(spark):
    out = llm_map(
        _docs(spark), "say {{ doc.doc_id }}", "reply",
        lambda: MockLLM([(r"say 1", "ok")]),
        validate=lambda r: r == "ok", max_tries=2,
    ).collect()
    got = {r.doc_id: r.reply for r in out}
    assert got[1] == "ok" and got[2] is None and got[3] is None


def test_llm_filter_threshold(spark):
    out = llm_filter(_docs(spark), "about spark?", lambda: ScoringMockLLM("spark"), threshold=2)
    assert {r.doc_id for r in out.collect()} == {1}
    out = llm_filter(_docs(spark), "about spark?", lambda: ScoringMockLLM("spark"), threshold=1)
    assert {r.doc_id for r in out.collect()} == {1, 2}


def test_extract_entity_merges_into_properties(spark):
    import json

    df = _docs(spark).withColumn("properties", F.lit('{"x": "1"}'))
    out = extract_entity(
        df, "topic", lambda: MockLLM([(r"Text: .*spark.*", "Spark"), (r".*", "Other")]),
    ).collect()
    props = {r.doc_id: json.loads(r.properties) for r in out}
    assert props[1]["topic"] == "Spark" and props[1]["x"] == "1"
    assert props[3]["topic"] == "Other"


def test_summarize_docs(spark):
    out = summarize_docs(_docs(spark), lambda: MockLLM([(r"Summarize", "SUM")])).collect()
    assert all(r.summary == "SUM" for r in out)


def test_summarize_data_single_answer(spark):
    out = summarize_data(spark, _docs(spark), "what?", lambda: MockLLM([(r"Question: what\?", "42")]))
    assert out.collect()[0].answer == "42"


def test_llm_cluster_entity(spark):
    llm = lambda: MockLLM([  # noqa: E731
        (r"return a JSON array", '["tech", "other"]'),
        (r"Assign the text.*spark", "tech"),
        (r"Assign the text", "other"),
    ])
    out = llm_cluster_entity(_docs(spark), llm)
    got = {r.doc_id: r.cluster_label for r in out.collect()}
    assert got[1] == "tech" and got[3] == "other"


def test_render_fallback_simple_placeholders():
    from sycamore_spark.llm.map import _render_fallback

    out = _render_fallback("Say {{ doc.title }} and {{name}}.", {"title": "T", "name": "N"})
    assert out == "Say T and N."


def test_render_fallback_rejects_complex_templates():
    import pytest

    from sycamore_spark.llm.map import _render_fallback

    with pytest.raises(RuntimeError, match="jinja2"):
        _render_fallback("{% for e in doc.elements %}{{ e }}{% endfor %}", {})


def _query_doc_df(spark):
    import json as _json

    from sycamore_spark.data.schema import DOC_SCHEMA

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in DOC_SCHEMA.fields)
    els = [
        {"element_index": 0, "type": "Text", "text_representation": "alpha body",
         "binary_representation": None, "bbox": None, "page_number": 1,
         "embedding": None, "properties": None},
        {"element_index": 1, "type": "table", "text_representation": "t1 cells",
         "binary_representation": None, "bbox": None, "page_number": 1,
         "embedding": None, "properties": None},
        {"element_index": 2, "type": "table", "text_representation": "t2 cells",
         "binary_representation": None, "bbox": None, "page_number": 2,
         "embedding": None, "properties": None},
    ]
    return spark.createDataFrame(
        [("d1", None, "doc", "whole doc", None, None, None, None, _json.dumps({"k": "v"}), els)],
        fields,
    )


def test_llm_query_per_element_with_type_and_cap(spark):
    import json as _json

    from sycamore_spark.llm.map import llm_query

    class EchoLLM:
        def generate_batch(self, prompts):
            return [f"R:{p.splitlines()[-1]}" for p in prompts]

    out = llm_query(
        _query_doc_df(spark), "Q?", EchoLLM, element_type="table", number_of_elements=1
    ).collect()[0]
    els = out["elements"]
    props = [(_json.loads(e["properties"] or "{}")).get("llm_response") for e in els]
    assert props == [None, "R:t1 cells", None]  # only first table queried


def test_llm_query_document_level_accumulates(spark):
    import json as _json

    from sycamore_spark.llm.map import llm_query

    class CaptureLLM:
        def generate_batch(self, prompts):
            return [p.replace("\n", "|") for p in prompts]

    out = llm_query(
        _query_doc_df(spark), "Q?", CaptureLLM, per_element=False, element_type="table"
    ).collect()[0]
    resp = _json.loads(out["properties"])["llm_response"]
    assert resp == "Q?|t1 cells|t2 cells"
    assert _json.loads(out["properties"])["k"] == "v"  # existing props kept


def test_llm_generate_group_and_clustering(spark):
    import json as _json

    from sycamore_spark.docset import DocSet

    class GroupLLM:
        def generate(self, prompt):
            return _json.dumps(["fruit", "dairy"])

        def generate_batch(self, prompts):
            return ["fruit" if "banana" in p or "orange" in p else "dairy" for p in prompts]

    ds = DocSet(spark.createDataFrame(
        [("1", "banana"), ("2", "milk"), ("3", "orange")], "id string, text_representation string"
    ))
    groups = ds.llm_generate_group(GroupLLM)
    assert groups == ["fruit", "dairy"]
    out = {r["id"]: r["cluster_label"] for r in ds.llm_clustering(GroupLLM, groups).take_all()}
    assert out == {"1": "fruit", "2": "dairy", "3": "fruit"}


def test_assign_clusters_nearest_centroid(spark):
    from sycamore_spark.operators.clustering import assign_clusters

    df = spark.createDataFrame(
        [(1, [0.0, 0.1]), (2, [5.0, 5.2]), (3, [0.2, -0.1])],
        "id long, embedding array<double>",
    )
    out = {r["id"]: r["cluster"] for r in assign_clusters(df, [[0.0, 0.0], [5.0, 5.0]]).collect()}
    assert out == {1: 0, 2: 1, 3: 0}
