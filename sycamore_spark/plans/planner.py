"""Planners: natural-language question → LogicalPlan.

Reference parity: ``LlmPlanner`` renders operator docstrings + few-shot
examples + the index schema into a prompt, calls the LLM at temperature 0,
parses JSON into a LogicalPlan (reference: lib/sycamore/sycamore/query/
planner.py:97-114, planner_prompt.py). The LLM sits behind the same client
seam as every other LLM stage, so a MockLLM returning a canned JSON plan
tests the whole path; a RuleBasedPlanner covers common question shapes
deterministically (test planner per SURVEY.md §7 step 5).
"""

from __future__ import annotations

import json
import re
from typing import Callable, Optional

from sycamore_spark.llm.client import LLM
from sycamore_spark.plans import logical as L

PLANNER_PROMPT = """You are a query planner. Given a question, emit a JSON
LogicalPlan: {{"query": str, "result_node": int, "nodes": {{id: node}}}}.
Each node has node_type, node_id, inputs (list of input node ids) and
type-specific fields. Available operators:

{operator_docs}

Data schema:
{schema}

Question: {question}
Respond with ONLY the JSON plan."""


def operator_docs() -> str:
    """Operator docstrings as planner prompt material (the reference builds
    its prompt from operator usage() docstrings, planner_prompt.py)."""
    parts = []
    for name, cls in L.NODE_TYPES.items():
        fields = [f for f in cls.model_fields if f not in ("node_type", "node_id", "description", "inputs")]
        doc = ((cls.__doc__ or "").strip().splitlines() or [""])[0]
        parts.append(f"- {name}({', '.join(fields)}): {doc}")
    return "\n".join(parts)


class LlmPlanner:
    def __init__(self, llm: LLM, schema: str = ""):
        self.llm = llm
        self.schema = schema

    def plan(self, question: str) -> L.LogicalPlan:
        prompt = PLANNER_PROMPT.format(
            operator_docs=operator_docs(), schema=self.schema, question=question
        )
        reply = self.llm.generate(prompt)
        m = re.search(r"\{.*\}", reply, flags=re.DOTALL)
        if not m:
            raise ValueError(f"planner returned no JSON: {reply[:200]}")
        plan = L.LogicalPlan.from_dict(json.loads(m.group(0)))
        plan = plan.model_copy(update={"query": question})
        return plan


class RuleBasedPlanner:
    """Deterministic planner for common question shapes — the test-mode
    planner (SURVEY.md §7 step 5 'rule-based test planner first')."""

    def plan(self, question: str, table: str = "documents") -> L.LogicalPlan:
        q = question.lower()
        nodes: dict[int, L.Node] = {0: L.QueryDatabase(node_id=0, table=table)}
        result = 0

        m = re.search(r"how many (?:distinct )?(\w+)", q)
        if m and "how many" in q:
            distinct = "distinct" in q
            nodes[1] = L.Count(node_id=1, inputs=[0],
                               distinct_field=m.group(1) if distinct else None)
            result = 1
        elif (m := re.search(r"top (\d+) (\w+)", q)):
            nodes[1] = L.TopK(node_id=1, field=m.group(2), K=int(m.group(1)), inputs=[0])
            result = 1
        elif (m := re.search(r"(\w+) contains? ['\"]?(\w+)", q)):
            nodes[1] = L.BasicFilter(node_id=1, field=m.group(1), query=m.group(2), inputs=[0])
            result = 1
        else:
            nodes[1] = L.SummarizeData(node_id=1, question=question, inputs=[0])
            result = 1
        return L.LogicalPlan(query=question, nodes=nodes, result_node=result)
