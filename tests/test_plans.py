"""Logical-plan layer: plan building, validation, execution, processors,
caching, codegen, planners (reference test model: tests/unit/query/)."""

import json
import math

import pytest

from sycamore_spark.llm.client import MockLLM, ScoringMockLLM
from sycamore_spark.plans import logical as L
from sycamore_spark.plans.executor import PlanExecutor, plan_to_script
from sycamore_spark.plans.planner import LlmPlanner, RuleBasedPlanner
from sycamore_spark.plans import processors as P

SF = "/root/testdata/sf0.001"


def _plan_topk():
    return L.LogicalPlan(query="top event types", result_node=2, nodes={
        0: L.QueryDatabase(node_id=0, table="events"),
        1: L.BasicFilter(node_id=1, field="value", start=5.0, end=50.0, range_filter=True, inputs=[0]),
        2: L.TopK(node_id=2, field="event_type", K=3, inputs=[1]),
    })


def test_plan_validation_catches_errors():
    plan = L.LogicalPlan(result_node=9, nodes={0: L.QueryDatabase(node_id=0)})
    assert plan.validate_plan()
    bad = L.LogicalPlan(result_node=0, nodes={0: L.BasicFilter(node_id=0, field="x", query="y")})
    assert any("source" in e for e in bad.validate_plan())
    assert not _plan_topk().validate_plan()


def test_plan_execute_topk(spark):
    out = PlanExecutor(spark, SF).execute(_plan_topk())
    rows = out.collect()
    assert len(rows) == 3 and rows[0]["count"] >= rows[-1]["count"]


def test_plan_execute_count_and_math(spark):
    plan = L.LogicalPlan(query="", result_node=3, nodes={
        0: L.QueryDatabase(node_id=0, table="events"),
        1: L.Count(node_id=1, inputs=[0]),
        2: L.Count(node_id=2, distinct_field="user_id", inputs=[0]),
        3: L.Math(node_id=3, operation="divide", inputs=[1, 2]),
    })
    got = PlanExecutor(spark, SF).execute(plan)
    assert got > 1  # events per user


def test_math_divide_by_zero_nan(spark):
    ex = PlanExecutor(spark, SF)
    assert math.isnan(ex._op_Math(L.Math(node_id=0, operation="divide"), [1, 0]))


def test_plan_groupby_collect(spark):
    plan = L.LogicalPlan(query="", result_node=2, nodes={
        0: L.QueryDatabase(node_id=0, table="nation"),
        1: L.GroupBy(node_id=1, field="n_regionkey", inputs=[0]),
        2: L.AggregateCollect(node_id=2, collect_field="n_name", inputs=[1]),
    })
    rows = PlanExecutor(spark, SF).execute(plan).collect()
    assert len(rows) == 5 and all("," in r.collected for r in rows)


def test_plan_llm_filter_and_summarize(spark):
    plan = L.LogicalPlan(query="", result_node=2, nodes={
        0: L.QueryDatabase(node_id=0, table="documents"),
        1: L.LlmFilter(node_id=1, field="text", question="spark?", threshold=2, inputs=[0]),
        2: L.SummarizeData(node_id=2, question="what?", field="text", inputs=[1]),
    })
    # rules (not a subclass) so cloudpickle ships the mock by value
    mock = lambda: MockLLM([  # noqa: E731
        (r"\AQuestion:", "ANSWER"),
        (r"Document: (.*)\nAnswer", lambda m: str(min(5, m.group(1).lower().count("spark")))),
    ])
    ex = PlanExecutor(spark, SF, llm_factory=mock)
    out = ex.execute(plan)
    assert out.collect()[0].answer == "ANSWER"


def test_subtree_caching(spark, tmp_path):
    plan = _plan_topk()
    ex = PlanExecutor(spark, SF, cache_dir=str(tmp_path))
    r1 = sorted(tuple(r) for r in ex.execute(plan).collect())
    cached = list(tmp_path.iterdir())
    assert cached  # subtree results parquet'd by content hash
    r2 = sorted(tuple(r) for r in PlanExecutor(spark, SF, cache_dir=str(tmp_path)).execute(plan).collect())
    assert r1 == r2


def test_cache_key_stable_and_sensitive():
    p1, p2 = _plan_topk(), _plan_topk()
    assert p1.nodes[2].cache_key(p1) == p2.nodes[2].cache_key(p2)
    p3 = _plan_topk()
    p3.nodes[1] = p3.nodes[1].model_copy(update={"end": 60.0})
    assert p1.nodes[2].cache_key(p1) != p3.nodes[2].cache_key(p3)


def test_limit_llm_operations_processor():
    plan = L.LogicalPlan(query="", result_node=1, nodes={
        0: L.QueryDatabase(node_id=0, table="documents"),
        1: L.LlmFilter(node_id=1, question="q", inputs=[0]),
    })
    out = P.limit_llm_operations(plan, max_rows=50)
    filt = out.nodes[1]
    lim = out.nodes[filt.inputs[0]]
    assert lim.node_type == "Limit" and lim.num_records == 50


def test_remove_vector_search_for_analytics():
    plan = L.LogicalPlan(query="how many?", result_node=1, nodes={
        0: L.QueryVectorDatabase(node_id=0, query_vector=[0.0] * 4, k=5),
        1: L.Count(node_id=1, inputs=[0]),
    })
    out = P.remove_vector_search_for_analytics(plan)
    assert out.nodes[0].node_type == "QueryDatabase"
    count = out.nodes[1]
    assert out.nodes[count.inputs[0]].node_type == "LlmFilter"


def test_query_vector_database_filter_expr(spark):
    """Plan-level filtered vector search (reference opensearch_filter,
    query_database.py:104): the predicate restricts the corpus BEFORE
    ranking, so every hit qualifies and top-k fills from qualifying rows
    ranked below the unfiltered cut."""
    from sycamore_spark.plans.executor import PlanExecutor

    qv = [0.1] * 64
    plan = L.LogicalPlan(query="", result_node=0, nodes={
        0: L.QueryVectorDatabase(node_id=0, query_vector=qv, k=5,
                                 filter_expr="label % 2 = 1"),
    })
    out = PlanExecutor(spark, SF).execute(plan)
    rows = out.collect()
    assert len(rows) == 5 and all(r.label % 2 == 1 for r in rows)
    # unfiltered top-5 differs (some even-label neighbors rank higher)
    plain = L.LogicalPlan(query="", result_node=0, nodes={
        0: L.QueryVectorDatabase(node_id=0, query_vector=qv, k=5),
    })
    plain_ids = {r.vec_id for r in PlanExecutor(spark, SF).execute(plain).collect()}
    assert plain_ids != {r.vec_id for r in rows}


def test_only_retrieval_strips_tail():
    plan = L.LogicalPlan(query="", result_node=2, nodes={
        0: L.QueryDatabase(node_id=0),
        1: L.Sort(node_id=1, field="x", inputs=[0]),
        2: L.SummarizeData(node_id=2, question="q", inputs=[1]),
    })
    assert P.only_retrieval(plan).result_node == 0


def test_codegen_executes(spark):
    script = plan_to_script(_plan_topk())
    env = {"spark": spark, "sf_dir": SF}
    exec(script, env)
    rows = env["result"].collect()
    assert len(rows) == 3


def test_llm_planner_roundtrip(spark):
    plan_json = json.dumps({
        "result_node": 1,
        "nodes": {
            "0": {"node_type": "QueryDatabase", "node_id": 0, "table": "part"},
            "1": {"node_type": "TopK", "node_id": 1, "field": "p_brand", "K": 2, "inputs": [0]},
        },
    })
    planner = LlmPlanner(MockLLM([(r"query plan", plan_json)]))
    plan = planner.plan("top 2 brands")
    rows = PlanExecutor(spark, SF).execute(plan).collect()
    assert len(rows) == 2


def test_rule_based_planner(spark):
    plan = RuleBasedPlanner().plan("how many distinct user_id", table="events")
    got = PlanExecutor(spark, SF).execute(plan)
    assert isinstance(got, int) and got > 0
    plan = RuleBasedPlanner().plan("top 3 event_type", table="events")
    assert len(PlanExecutor(spark, SF).execute(plan).collect()) == 3


def test_planner_prompt_examples_are_valid_plans():
    """The few-shot examples embedded in the planner prompt must themselves
    be valid plans: JSON-round-trippable through from_dict and clean under
    validate_plan (a broken example teaches the LLM broken plans)."""
    import json

    from sycamore_spark.plans.planner import _default_examples, render_examples

    examples = _default_examples()
    assert len(examples) >= 2
    rendered = render_examples(examples)
    for ex in examples:
        blob = {
            "query": ex.plan.query,
            "result_node": ex.plan.result_node,
            "nodes": {nid: n.model_dump() for nid, n in ex.plan.nodes.items()},
        }
        plan2 = L.LogicalPlan.from_dict(json.loads(json.dumps(blob)))
        assert plan2.validate_plan() == []
        assert plan2.result_node == ex.plan.result_node
    # the prompt text actually carries the examples + guidelines
    from sycamore_spark.plans.planner import PLANNER_GUIDELINES, operator_docs

    assert "EXAMPLE 1:" in rendered and "EXAMPLE 2:" in rendered
    assert "EXACT field names" in PLANNER_GUIDELINES
    docs = operator_docs()
    for op in ("QueryDatabase", "LlmFilter", "TopK", "Math", "SummarizeData"):
        assert op in docs


def test_planner_examples_cover_every_operator_and_reference_shapes():
    """Reference parity (planner_prompt.py:106-354): the few-shot set covers
    every reference example SHAPE and, beyond it, every logical operator in
    NODE_TYPES appears in at least one worked plan, each clean under
    processors.validate."""
    from sycamore_spark.plans import processors
    from sycamore_spark.plans.planner import _default_examples

    examples = _default_examples()
    used = {n.node_type for ex in examples for n in ex.plan.nodes.values()}
    assert used == set(L.NODE_TYPES), sorted(set(L.NODE_TYPES) - used)
    for ex in examples:
        processors.validate(ex.plan)  # raises on an invalid example
    # the reference's nine example shapes, as (sorted node-type tuples)
    shapes = {
        tuple(sorted(n.node_type for n in ex.plan.nodes.values()))
        for ex in examples
    }
    assert ("QueryDatabase",) in shapes  # pushdown-only scan (ref ex1/ex3)
    assert ("Count", "QueryDatabase") in shapes  # scan+count (ref ex2/ex4)
    assert ("LlmExtractEntity", "QueryDatabase", "TopK") in shapes  # ref ex5
    assert (
        "BasicFilter", "Count", "Count", "Math", "QueryDatabase",
    ) in shapes  # percent (ref ex6)
    assert ("LlmFilter", "QueryVectorDatabase") in shapes  # ref ex7/ex8
    assert ("Limit", "QueryDatabase", "Sort") in shapes  # ref ex9
