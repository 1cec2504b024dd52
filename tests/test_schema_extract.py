"""SchemaV2 model + LLM schema inference / property extraction
(reference: schema.py, transforms/extract_schema.py)."""

import json

import pytest
from pyspark.sql import functions as F

from sycamore_spark.data import schema2 as s2
from sycamore_spark.llm.client import MockLLM
from sycamore_spark.llm.extract import (
    extract_json,
    extract_properties,
    extract_properties_typed,
    infer_schema,
)


def make_schema():
    return s2.SchemaV2.model_validate(
        {
            "properties": [
                {"name": "title", "type": {"type": "string"}},
                {
                    "name": "year",
                    "type": {
                        "type": "int",
                        "default": 0,
                        "validators": [{"type": "range", "min": 1900, "max": 2100}],
                    },
                },
                {
                    "name": "meta",
                    "type": {
                        "type": "object",
                        "properties": [
                            {"name": "lang", "type": {"type": "choice", "choices": ["en", "de"]}},
                            {"name": "score", "type": {"type": "float"}},
                        ],
                    },
                },
                {"name": "tags", "type": {"type": "array", "item_type": {"type": "string"}}},
            ]
        }
    )


def test_flatten_and_render():
    sch = make_schema()
    flat = sch.flatten()
    assert [p.name for p in flat.properties] == ["title", "year", "meta.lang", "meta.score"]
    rendered = json.loads(sch.render())
    assert rendered["properties"][0]["name"] == "title"


def test_to_struct_type():
    st = s2.to_struct_type(make_schema())
    assert st["year"].dataType.typeName() == "long"
    assert st["meta"].dataType["lang"].dataType.typeName() == "string"
    assert st["tags"].dataType.typeName() == "array"


def test_validators():
    sch = {p.name: p.type for p in make_schema().properties}
    assert sch["year"].validate_value(1999)
    assert not sch["year"].validate_value(1492)
    rx = s2.RegexValidator(regex=r"\d{4}-\d{2}")
    assert rx.validate_property("2024-05")
    assert not rx.validate_property("nope")
    choice = sch["meta"].properties[0].type
    assert choice.validate_value("en") and not choice.validate_value("fr")


def test_extract_json_tolerant():
    assert extract_json('{"a": 1}') == {"a": 1}
    assert extract_json('```json\n{"a": 2}\n```') == {"a": 2}
    assert extract_json('noise {"a": {"b": 3}} trailing') == {"a": {"b": 3}}
    assert extract_json("no json here") is None


def test_infer_schema(spark):
    df = spark.createDataFrame([(1, "Report 2021"), (2, "Report 2022")], "id long, text string")
    reply = json.dumps(
        {"properties": [{"name": "year", "type": "int"}, {"name": "kind", "type": "string"}]}
    )
    sch = infer_schema(df, lambda: MockLLM([(r"Infer a JSON schema", reply)]), sample=2)
    assert [p.name for p in sch.properties] == ["year", "kind"]
    assert sch.properties[0].type.type == s2.DataType.INT


def make_llm_factory():
    # Extracts "title=X year=N" from the document text; first try returns
    # year+10000 (fails range validator) unless the prompt carries the
    # constraint, exercising the retry loop. Returned as a closure so
    # cloudpickle ships it by value (a top-level test function would be
    # pickled by module reference, which executors can't import).
    def factory():
        def reply(m):
            retry = "Constraints:" in m.string
            title, year = m.group(1), int(m.group(2))
            return json.dumps({"title": title, "year": year if retry else year + 10000})

        return MockLLM([(r"Document: title=(\w+) year=(\d+)", reply)])

    return factory


llm_factory = make_llm_factory()


def test_extract_properties_retry(spark):
    df = spark.createDataFrame(
        [(1, "title=alpha year=1984"), (2, "title=beta year=2001")], "id long, text string"
    )
    out = extract_properties(df, make_schema(), llm_factory, max_tries=2)
    rows = {r["id"]: json.loads(r["properties_json"]) for r in out.collect()}
    assert rows[1]["title"] == "alpha" and rows[1]["year"] == 1984
    assert rows[2]["year"] == 2001


def test_extract_properties_default_on_failure(spark):
    df = spark.createDataFrame([(1, "title=x year=1984")], "id long, text string")
    out = extract_properties(df, make_schema(), llm_factory, max_tries=1)
    got = json.loads(out.collect()[0]["properties_json"])
    # single try, invalid year (11984) → default 0
    assert got["year"] == 0


def test_extract_typed(spark):
    df = spark.createDataFrame(
        [(1, "title=alpha year=1984")], "id long, text string"
    )
    out = extract_properties_typed(df, make_schema(), llm_factory)
    row = out.select(F.col("properties.year").alias("y"), F.col("properties.title").alias("t")).collect()[0]
    assert row["y"] == 1984 and row["t"] == "alpha"


def test_infer_schema_per_doc_and_merge(spark):
    import json as _json

    from sycamore_spark.llm.extract import infer_schema_per_doc, merge_schemas

    class SchemaLLM:
        """Returns title+author for every doc, plus a doc-specific field."""

        def generate_batch(self, prompts):
            out = []
            for p in prompts:
                extra = "pages" if "alpha" in p else "isbn"
                out.append(_json.dumps({"properties": [
                    {"name": "title", "type": "string"},
                    {"name": "author", "type": "string"},
                    {"name": extra, "type": "int"},
                ]}))
            return out

    df = spark.createDataFrame(
        [(1, "alpha doc"), (2, "beta doc"), (3, "alpha again")], "doc_id long, text string"
    )
    with_schema = infer_schema_per_doc(df, SchemaLLM)
    schemas = {r["doc_id"]: _json.loads(r["_schema"]) for r in with_schema.collect()}
    assert schemas[1] == ["author", "pages", "title"]
    assert schemas[2] == ["author", "isbn", "title"]

    union = merge_schemas(with_schema, "union").collect()[0]["fields"]
    assert union == ["author", "isbn", "pages", "title"]
    inter = merge_schemas(with_schema, "intersection").collect()[0]["fields"]
    assert inter == ["author", "title"]
    freq = merge_schemas(with_schema, "frequency", min_occurrence_ratio=0.6).collect()[0]["fields"]
    assert freq == ["author", "pages", "title"]  # pages in 2/3 docs


def test_extract_batch_schema_stamps_every_doc(spark):
    import json as _json

    from sycamore_spark.docset import DocSet

    class OneSchemaLLM:
        def generate(self, prompt):
            return _json.dumps({"properties": [
                {"name": "title", "type": "string"}, {"name": "year", "type": "int"},
            ]})

    ds = DocSet(spark.createDataFrame(
        [("1", "a"), ("2", "b"), ("3", "c")], "id string, text_representation string"
    ))
    out = ds.extract_batch_schema(OneSchemaLLM).take_all()
    assert all(_json.loads(r["_schema"]) == ["title", "year"] for r in out)


def test_attribute_values_exact_and_fuzzy(spark):
    from sycamore_spark.llm.extract import attribute_values

    rows = [
        (1, "Berlin", [
            {"element_index": 0, "text_representation": "weather report for today"},
            {"element_index": 1, "text_representation": "the capital is Berlin indeed"},
        ]),
        (2, "Munchen", [  # misspelled in the element -> fuzzy only
            {"element_index": 0, "text_representation": "the city of Muenchen is nice"},
        ]),
        (3, "nowhere", [
            {"element_index": 0, "text_representation": "totally unrelated"},
        ]),
    ]
    schema = ("id int, val string, elements array<struct<element_index:int,"
              "text_representation:string>>")
    df = spark.createDataFrame(rows, schema)

    exact = {r.id: r for r in
             attribute_values(df, ["val"], id_col="id", fuzzy=False).collect()}
    assert exact[1].element_index == 1 and exact[1].score_micros == 1_000_000
    assert exact[1].start == 15 and exact[1].end == 21
    assert 2 not in exact and 3 not in exact  # no verbatim match, fuzzy off

    fz = {r.id: r for r in
          attribute_values(df, ["val"], id_col="id", fuzzy=True).collect()}
    assert fz[2].element_index == 0 and 0 < fz[2].score_micros < 1_000_000
    assert fz[1].score_micros == 1_000_000  # exact still wins when present
