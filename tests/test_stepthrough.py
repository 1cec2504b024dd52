"""Step-through extraction (llm/stepthrough.py) vs the reference's
property_extraction strategy semantics (strategy.py TakeFirstTrimSchema,
OneElementAtATime/NPagesAtATime/BatchElements; extract.py Extract loop)."""

import json
import re

from pyspark.sql import functions as F

from sycamore_spark.data.schema2 import DataType, NamedProperty, Property, SchemaV2
from sycamore_spark.llm.client import MockLLM
from sycamore_spark.llm.stepthrough import (
    batch_elements,
    extract_doc,
    extract_stepthrough,
    fixed_size_schema_partition,
    n_pages_at_a_time,
    no_schema_splitting,
    one_element_at_a_time,
    take_first_trim,
)

SCHEMA = SchemaV2(properties=[
    NamedProperty(name="alpha", type=Property(type=DataType.STRING)),
    NamedProperty(name="beta", type=Property(type=DataType.STRING)),
    NamedProperty(name="tags", type=Property(type=DataType.ARRAY)),
    NamedProperty(name="flag", type=Property(type=DataType.BOOL)),
])


def field_echo_llm():
    """Deterministic extractor: answers ONLY the requested fields, reading
    name=value tokens out of the batch text (';'-separated values become
    arrays, true/false become bools)."""

    def reply(m):
        wanted = [f.strip() for f in m.group(1).split(",") if f.strip()]
        text = m.group(2)
        out = {}
        for name in wanted:
            vals = re.findall(rf"\b{name}=([^\s]+)", text)
            if not vals:
                continue
            v = vals[0]
            if ";" in v:
                out[name] = v.split(";")
            elif v in ("true", "false"):
                out[name] = v == "true"
            else:
                out[name] = v
        return json.dumps(out)

    return MockLLM([(r"fields \[([^\]]*)\].*?Text: (.*)", reply)])


def make_els(texts, pages=None):
    return [
        {"element_index": i, "text_representation": t,
         "page_number": (pages or [1] * len(texts))[i]}
        for i, t in enumerate(texts)
    ]


def test_steppers_match_reference_shapes():
    els = make_els(["a", "b", "c", "d", "e"], pages=[1, 1, 2, 3, 3])
    assert [len(b) for b in one_element_at_a_time()(els)] == [1] * 5
    assert [[e["element_index"] for e in b] for b in batch_elements(2)(els)] == [
        [0, 1], [2, 3], [4]]
    # NPagesAtATime: cutoff = first page + n (reference strategy.py:29-41)
    assert [[e["element_index"] for e in b] for b in n_pages_at_a_time(1)(els)] == [
        [0, 1], [2], [3, 4]]
    assert [[e["element_index"] for e in b] for b in n_pages_at_a_time(2)(els)] == [
        [0, 1, 2], [3, 4]]
    assert list(n_pages_at_a_time(1)([])) == []


def test_take_first_trim_semantics():
    remaining = list(SCHEMA.properties)
    fields, remaining, done = take_first_trim(
        remaining, {}, {"alpha": "A1", "tags": ["t2", "t1"], "flag": False})
    assert fields == {"alpha": "A1", "tags": ["t1", "t2"], "flag": False}
    # alpha trimmed; beta/tags/flag still asked (array never trims, bool sticky)
    assert [np.name for np in remaining] == ["beta", "tags", "flag"]
    fields, remaining, done = take_first_trim(
        remaining, fields, {"alpha": "WRONG", "beta": "B1", "tags": ["t2", "t3"],
                            "flag": True})
    # take-first: alpha untouched even if a later batch re-answers it
    assert fields["alpha"] == "A1" and fields["beta"] == "B1"
    assert fields["tags"] == ["t1", "t2", "t3"]  # concat + dedup + sort
    assert fields["flag"] is True  # sticky flip false -> true
    # a false->true flip trims IMMEDIATELY (reference strategy.py:130-132)
    assert [np.name for np in remaining] == ["tags"] and not done
    fields, remaining, done = take_first_trim(remaining, fields, {})
    assert [np.name for np in remaining] == ["tags"] and not done


def test_take_first_trim_bool_absent_key_keeps_asking():
    # An already-true bool whose key is ABSENT from a batch's output stays
    # in the schema (reference trims only when the key appears: nf not None
    # at strategy.py:114); a later batch that mentions it (any value) trims.
    remaining = [np for np in SCHEMA.properties if np.name == "flag"]
    fields, remaining, done = take_first_trim(remaining, {}, {"flag": True})
    # first sighting: value taken, kept in schema for its own batch
    assert fields == {"flag": True}
    assert [np.name for np in remaining] == ["flag"] and not done
    fields, remaining, done = take_first_trim(remaining, fields, {})
    # absent from new: reference keeps asking even though already true
    assert [np.name for np in remaining] == ["flag"] and not done
    fields, remaining, done = take_first_trim(remaining, fields, {"flag": False})
    # mentioned again while already true: keep True, trim now
    assert fields == {"flag": True} and remaining == [] and done


def test_extract_doc_trims_prompts_and_early_stops():
    prompts = []

    def spy_prompt(remaining, texts):
        from sycamore_spark.llm.stepthrough import _render_prompt

        p = _render_prompt(remaining, texts)
        prompts.append([np.name for np in remaining])
        return p

    els = make_els(["alpha=A9 tags=t1;t9 flag=false",
                    "alpha=WRONG beta=B9 tags=t3 flag=true",
                    "beta=NEVER-ASKED"])
    out = extract_doc(els, [SCHEMA], one_element_at_a_time(), field_echo_llm(),
                      prompt_fn=spy_prompt)
    assert out == {"alpha": "A9", "beta": "B9", "flag": True,
                   "tags": ["t1", "t3", "t9"]}
    # batch 2 no longer asks for alpha (trimmed); batch 3 no longer asks
    # for flag — the false->true flip during batch 2 trims immediately
    # (reference strategy.py:130-132; call-count parity)
    assert prompts == [["alpha", "beta", "tags", "flag"],
                       ["beta", "tags", "flag"],
                       ["tags"]]


def test_schema_partition_stitches_and_fills():
    parts = fixed_size_schema_partition(2)(SCHEMA)
    assert [len(p.properties) for p in parts] == [2, 2]
    els = make_els(["alpha=A1 tags=t1"])
    out = extract_doc(els, parts, one_element_at_a_time(), field_echo_llm())
    # missing fields filled: beta -> None, flag -> None, array found
    assert out == {"alpha": "A1", "beta": None, "tags": ["t1"], "flag": None}
    assert no_schema_splitting(SCHEMA) == [SCHEMA]


def test_extract_stepthrough_distributed(spark):
    # executor-shipped closure: define the factory inside the test (module
    # isn't importable on workers — established conftest gotcha)
    def local_factory():
        def reply(m):
            wanted = [f.strip() for f in m.group(1).split(",") if f.strip()]
            text = m.group(2)
            out = {}
            for name in wanted:
                vals = re.findall(rf"\b{name}=([^\s]+)", text)
                if not vals:
                    continue
                v = vals[0]
                out[name] = v.split(";") if ";" in v else (
                    v == "true" if v in ("true", "false") else v)
            return json.dumps(out)

        return MockLLM([(r"fields \[([^\]]*)\].*?Text: (.*)", reply)])

    df = spark.createDataFrame(
        [(str(i),) for i in range(6)], "doc_id string"
    ).withColumn(
        "elements",
        F.array(
            F.struct(
                F.lit(0).alias("element_index"),
                F.concat(F.lit("alpha=A"), F.col("doc_id"), F.lit(" tags=t1;t9")).alias("text_representation"),
                F.lit(1).alias("page_number"),
            ),
            F.struct(
                F.lit(1).alias("element_index"),
                F.when(F.col("doc_id").cast("int") % 2 == 0,
                       F.concat(F.lit("beta=B"), F.col("doc_id"), F.lit(" tags=t3 flag=true")))
                .otherwise(F.lit("tags=t3")).alias("text_representation"),
                F.lit(2).alias("page_number"),
            ),
        ),
    )
    out = extract_stepthrough(df, SCHEMA, local_factory,
                              stepper=batch_elements(1)).collect()
    for r in sorted(out, key=lambda r: int(r.doc_id)):
        e = json.loads(r.entity)
        assert e["alpha"] == f"A{r.doc_id}"
        assert e["tags"] == ["t1", "t3", "t9"]
        if int(r.doc_id) % 2 == 0:
            assert e["beta"] == f"B{r.doc_id}" and e["flag"] is True
        else:
            assert e["beta"] is None and e["flag"] is None


def test_take_first_trim_nested_objects():
    """OBJECT properties recurse: subfields merge under the same rules, the
    remaining schema keeps only unsatisfied subfields, and the object trims
    once every subfield is satisfied (reference zip_traverse walk +
    drop-empty-objects pass)."""
    nested = SchemaV2(properties=[
        NamedProperty(name="title", type=Property(type=DataType.STRING)),
        NamedProperty(name="address", type=Property(type=DataType.OBJECT, properties=[
            NamedProperty(name="city", type=Property(type=DataType.STRING)),
            NamedProperty(name="zip", type=Property(type=DataType.STRING)),
        ])),
    ])
    remaining = list(nested.properties)
    fields, remaining, done = take_first_trim(
        remaining, {}, {"title": "T", "address": {"city": "Oslo"}})
    assert fields == {"title": "T", "address": {"city": "Oslo"}}
    # title trimmed; address survives with ONLY zip left
    assert [np.name for np in remaining] == ["address"]
    assert [p.name for p in remaining[0].type.properties] == ["zip"]
    from sycamore_spark.llm.stepthrough import _prop_names

    assert _prop_names(remaining) == ["address.zip"]
    fields, remaining, done = take_first_trim(
        remaining, fields, {"address": {"city": "DECOY", "zip": "0150"}})
    # take-first inside the object: city untouched; zip lands; object trims
    assert fields["address"] == {"city": "Oslo", "zip": "0150"}
    assert remaining == [] and done
    # fill shape: a never-found object fills as a nested all-null dict
    from sycamore_spark.llm.stepthrough import _fill_missing

    assert _fill_missing(nested, {"title": "T"}) == {
        "title": "T", "address": {"city": None, "zip": None}}
