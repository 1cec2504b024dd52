"""Multi-step summarization + graph extraction (reference:
transforms/summarize.py, extract_graph_*.py)."""

import json

import pytest
from pyspark.sql import functions as F

from sycamore_spark.llm.client import MockLLM
from sycamore_spark.llm.summarize import (
    _leaf_groups,
    collect_to_summary_doc,
    summarize_docset_hierarchical,
    summarize_multistep,
)
from sycamore_spark.operators import graph as g


def sum_factory():
    # "summary" = S(<n inputs>) so tests can observe the fold structure
    def factory():
        def reply(m):
            body = m.group(1)
            return "S(" + str(body.count("\n") + 1) + ")"

        return MockLLM([(r"Text: (.*)", reply)])

    return factory


def test_leaf_groups():
    assert _leaf_groups(["aa", "bb", "cc"], 5) == ["aa\nbb", "cc"]
    assert _leaf_groups(["aaaaaa"], 3) == ["aaaaaa"]
    assert _leaf_groups([], 5) == []


def test_summarize_multistep(spark):
    rows = [
        (1, [{"text_representation": "x" * 40} for _ in range(4)]),
        (2, [{"text_representation": "short"}]),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, elements array<struct<text_representation string>>"
    )
    out = summarize_multistep(df, sum_factory(), max_tokens=90)
    got = {r["doc_id"]: r["summary"] for r in out.collect()}
    # doc 1: 4x40 chars → leaves of 2 elements (80 <= 90) → 2 summaries → 1
    assert got[1] == "S(2)"
    assert got[2] == "S(1)"


def test_collect_to_summary_doc(spark):
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "y"), (3, "b", "z")], "id long, grp string, text string"
    )
    out = collect_to_summary_doc(df, group_key="grp", fields=["id", "text"])
    got = {r["key"]: sorted(s["id"] for s in r["sub_docs"]) for r in out.collect()}
    assert got == {"a": [1, 2], "b": [3]}
    glob = collect_to_summary_doc(df, fields=["id"]).collect()[0]
    assert sorted(s["id"] for s in glob["sub_docs"]) == [1, 2, 3]


def test_summarize_docset_hierarchical(spark):
    df = spark.createDataFrame([(i, f"doc number {i}") for i in range(23)], "id long, text string")
    out = summarize_docset_hierarchical(df, sum_factory(), text_col="text", fanin=5)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["summary"].startswith("S(")


def graph_factory():
    # Entities: every capitalized word; relationships: consecutive pairs.
    def factory():
        import re

        def ents(m):
            words = re.findall(r"\b[A-Z][a-z]+\b", m.group(1))
            return json.dumps([{"name": w, "type": "PERSON"} for w in words])

        def rels(m):
            words = re.findall(r"\b[A-Z][a-z]+\b", m.group(1))
            return json.dumps(
                [{"src": a, "dst": b, "type": "KNOWS"} for a, b in zip(words, words[1:])]
            )

        return MockLLM(
            [
                (r"Extract entities.*Document: (.*)", ents),
                (r"Extract relationships.*Document: (.*)", rels),
            ]
        )

    return factory


def test_extract_graph(spark):
    df = spark.createDataFrame(
        [(1, "Alice met Bob"), (2, "bob saw Carol"), (3, "Alice again")],
        "doc_id long, text string",
    )
    nodes, edges = g.extract_graph(df, graph_factory(), ["PERSON"], ["KNOWS"])
    n = {r["norm_name"]: r for r in nodes.collect()}
    # 'Bob' (doc 1) and 'Carol' (doc 2); doc 2's 'bob' is lowercase in text so
    # the mock only sees capitalized words → Bob once, Alice twice
    assert n["alice"]["n_mentions"] == 2
    assert set(n) == {"alice", "bob", "carol"}
    e = edges.collect()
    # doc1: Alice->Bob; doc3: none (single entity); doc2: Carol alone → no edge
    assert len(e) == 1
    assert e[0]["src_id"] == n["alice"]["node_id"] and e[0]["dst_id"] == n["bob"]["node_id"]


def test_resolve_dedup_stable_ids(spark):
    m = spark.createDataFrame(
        [(1, "Foo", "ORG"), (2, " foo ", "ORG"), (3, "Foo", "PERSON")],
        "doc_id long, name string, type string",
    )
    nodes = g.resolve_graph_entities(m).collect()
    assert len(nodes) == 2  # same name, different type → distinct nodes
    ids = {(r["norm_name"], r["type"]): r["node_id"] for r in nodes}
    assert len(set(ids.values())) == 2


def test_fluent_graph_and_infer_schema(spark):
    import json as _json

    from sycamore_spark.docset import DocSet

    class TermLLM:
        def generate(self, prompt):
            return _json.dumps({"properties": [{"name": "topic", "type": "string"}]})

        def generate_batch(self, prompts):
            out = []
            for p in prompts:
                # emit one entity mention per doc text word over 5 chars
                import re

                words = sorted(set(re.findall(r"[a-z]{6,}", p)))
                out.append(_json.dumps([{"name": w, "type": "TERM"} for w in words]))
            return out

    ds = DocSet(spark.createDataFrame(
        [("1", "quantum mechanics paper"), ("2", "quantum computing survey")],
        "doc_id string, text string",
    ))
    mentions = ds.extract_graph_entities(TermLLM, ["TERM"])
    nodes = mentions.resolve_graph_entities().take_all()
    names = sorted(r["canonical"] for r in nodes)
    assert "quantum" in names and len(names) >= 3

    class SchemaLLM:
        def generate_batch(self, prompts):
            return [_json.dumps({"properties": [
                {"name": "topic"}, {"name": "year" if "survey" in p else "venue"},
            ]}) for p in prompts]

    merged = ds.infer_schema(SchemaLLM, mode="intersection", text_col="text").take_all()
    assert merged[0]["fields"] == ["topic"]


def test_pagerank_triangle_and_star(spark):
    from pyspark.sql import functions as F
    from sycamore_spark.operators.graph import pagerank

    # symmetric triangle: all nodes equal by symmetry
    tri = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("c", "a"), ("a", "c")],
        "src string, dst string",
    )
    r = {x.node: x.rank_micros for x in pagerank(tri, iterations=3).collect()}
    assert len(set(r.values())) == 1
    # star: hub receives from all leaves -> strictly higher rank
    star_half = [("hub", f"l{i}") for i in range(6)]
    star = spark.createDataFrame(
        star_half + [(b, a) for a, b in star_half], "src string, dst string"
    )
    s = {x.node: x.rank_micros for x in pagerank(star, iterations=3).collect()}
    assert s["hub"] > max(v for k, v in s.items() if k != "hub")
    # deterministic across partitioning (integer arithmetic)
    s2 = {x.node: x.rank_micros for x in pagerank(star.repartition(7), iterations=3).collect()}
    assert s == s2


def test_rank_normalize_bounds_and_groups(spark):
    from pyspark.sql import functions as F
    from sycamore_spark.operators.textstats import normalize_by_rank

    df = spark.range(100).selectExpr("id", "id % 2 AS g", "cast(id AS double) AS score")
    out = normalize_by_rank(df, "score", ["g"]).collect()
    assert all(0.0 <= r.pct_rank <= 1.0 for r in out)
    for g in (0, 1):
        vals = [r for r in out if r.g == g]
        assert min(r.pct_rank for r in vals) == 0.0
        assert max(r.pct_rank for r in vals) == 1.0
    # tied scores share a rank (SQL percent_rank semantics): all-equal group
    tied = spark.range(10).selectExpr("id", "1 AS g", "cast(7 AS double) AS score")
    tout = normalize_by_rank(tied, "score", ["g"]).collect()
    assert {r.pct_rank for r in tout} == {0.0}
