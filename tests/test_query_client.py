"""QueryClient NL entry point (reference: query/client.py lifecycle B)."""

import json

import pytest
from pyspark.sql import DataFrame

from sycamore_spark.llm.client import MockLLM
from sycamore_spark.plans.client import QueryClient, QueryResult
from sycamore_spark.plans.planner import LlmPlanner

SF = "/root/testdata/sf0.001"


def test_rule_based_topk(spark):
    client = QueryClient(spark, SF)
    res = client.query("top 3 event_type", table="events")
    assert isinstance(res, QueryResult)
    rows = res.result.collect()
    assert len(rows) == 3
    assert res.plan.nodes[1].node_type == "TopK"


def test_rule_based_count(spark):
    client = QueryClient(spark, SF)
    res = client.query("how many distinct user_id", table="events")
    assert isinstance(res.result, int) and res.result > 0


def test_schema_fetch(spark):
    client = QueryClient(spark, SF)
    schema = client.get_schema("events")
    assert "event_type (string)" in schema and "e.g." in schema


def test_llm_planner_path_with_codegen(spark):
    canned = json.dumps(
        {
            "query": "q",
            "result_node": 1,
            "nodes": {
                "0": {"node_type": "QueryDatabase", "node_id": 0, "table": "nation"},
                "1": {"node_type": "Limit", "node_id": 1, "num_records": 5, "inputs": [0]},
            },
        }
    )
    planner = LlmPlanner(MockLLM([(r"query plan", canned)]))
    client = QueryClient(spark, SF, planner=planner)
    res = client.query("first five nations", codegen=True)
    assert isinstance(res.result, DataFrame) and res.result.count() == 5
    assert "limit(5)" in (res.code or "")
    assert "load_table" in res.code


def test_to_str(spark):
    client = QueryClient(spark, SF)
    res = client.query("top 2 o_orderpriority", table="orders")
    s = res.to_str()
    assert "key" in s
