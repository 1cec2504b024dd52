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
from dataclasses import dataclass
from typing import Callable, Optional

from sycamore_spark.llm.client import LLM
from sycamore_spark.plans import logical as L

# Numbered guidelines mirror the reference's PLANNER_SYSTEM_PROMPT
# (planner_prompt.py:23-44): strict-JSON output, exact field names, filter
# pushdown into the first (scan) node, null for absent optionals.
PLANNER_GUIDELINES = """You are a helpful agent that translates the user's
question into a query plan, using a predefined set of query operators.
Please adhere to the following guidelines when generating a plan:

1. Return your answer as a JSON dictionary containing a query plan in the
   format shown below: {"query": str, "result_node": int, "nodes": {id: node}}.
   Each node has node_type, node_id, description, inputs (list of input
   node ids), and its type-specific fields.
2. Do not return any information except a single JSON object — no text
   before or after the json block, no repetition of the question.
3. Only use the query operators described below.
4. Only use EXACT field names from the DATA_SCHEMA described below and
   fields created by LlmExtractEntity. A new field created by
   LlmExtractEntity is nested under properties: if it is called "state",
   later operators must reference "properties.state". A dataset produced by
   TopK only has "properties.key" and "properties.count"; reference only
   those. DO NOT USE ANY OTHER FIELD NAMES.
5. If an optional field does not have a value, put null in its place.
6. The first node of each plan MUST be QueryDatabase, QueryVectorDatabase,
   or DataLoader. Push every filter you can into that first node so later
   operators see as little data as possible. A QueryVectorDatabase scan is
   approximate — always follow it with an LlmFilter to make the final
   results exact.
7. Prefer exact operators (BasicFilter, Count, TopK, Math) over LLM
   operators (LlmFilter, LlmExtractEntity, LLMClustering) whenever the
   question can be answered from existing fields — LLM operators are the
   expensive path."""

PLANNER_PROMPT = """{guidelines}

OPERATORS:
{operator_docs}

{examples}DATA_SCHEMA:
{schema}

Question: {question}
Respond with ONLY the JSON plan."""


def operator_docs(detailed: bool = True) -> str:
    """Operator documentation as planner prompt material (the reference
    builds its prompt from operator usage() docstrings + field descriptions,
    planner_prompt.py). ``detailed`` adds per-field descriptions from the
    pydantic model, not just the signature line."""
    parts = []
    for name, cls in L.NODE_TYPES.items():
        fields = {
            f: info
            for f, info in cls.model_fields.items()
            if f not in ("node_type", "node_id", "description", "inputs")
        }
        doc = (cls.__doc__ or "").strip()
        first_line = (doc.splitlines() or [""])[0]
        parts.append(f"- {name}({', '.join(fields)}): {first_line}")
        if detailed:
            for f, info in fields.items():
                desc = info.description or ""
                ann = getattr(info.annotation, "__name__", str(info.annotation))
                parts.append(f"    {f} ({ann}){': ' + desc if desc else ''}")
    return "\n".join(parts)


@dataclass
class PlannerExample:
    """One few-shot example: a schema + a worked plan (reference
    planner_prompt.py PlannerExample)."""

    schema: str
    plan: "L.LogicalPlan"


def _default_examples() -> list[PlannerExample]:
    """Built-in few-shot examples over the synthetic tables — the same
    filter-pushdown and exact-over-LLM patterns the reference's NTSB /
    financial examples teach."""
    ex1 = L.LogicalPlan(
        query="How many error events were there?",
        result_node=1,
        nodes={
            0: L.QueryDatabase(
                node_id=0,
                description="Scan events filtered to errors (pushdown)",
                table="events",
                filter_expr="event_type = 'error'",
            ),
            1: L.Count(node_id=1, description="Count the filtered events", inputs=[0]),
        },
    )
    ex2 = L.LogicalPlan(
        query="Top 3 languages among long documents",
        result_node=2,
        nodes={
            0: L.QueryDatabase(
                node_id=0, description="Scan documents", table="documents"
            ),
            1: L.BasicFilter(
                node_id=1, description="Keep long documents",
                field="n_chars", range_filter=True, start=1000, inputs=[0],
            ),
            2: L.TopK(
                node_id=2, description="Most common languages",
                field="lang", K=3, descending=True, inputs=[1],
            ),
        },
    )
    return [
        PlannerExample(
            schema="events(event_id long, ts timestamp, user_id long, event_type string, value double)",
            plan=ex1,
        ),
        PlannerExample(
            schema="documents(doc_id long, text string, lang string, n_chars int)",
            plan=ex2,
        ),
    ]


def render_examples(examples: list[PlannerExample]) -> str:
    if not examples:
        return ""
    blocks = []
    for i, ex in enumerate(examples, 1):
        plan_dict = {
            "query": ex.plan.query,
            "result_node": ex.plan.result_node,
            "nodes": {nid: n.model_dump() for nid, n in ex.plan.nodes.items()},
        }
        blocks.append(
            f"EXAMPLE {i}:\nDATA_SCHEMA:\n{ex.schema}\n"
            f"Question: {ex.plan.query}\nAnswer:\n"
            + json.dumps(plan_dict, indent=1)
        )
    return "\n\n".join(blocks) + "\n\n"


class LlmPlanner:
    def __init__(self, llm: LLM, schema: str = "",
                 examples: Optional[list[PlannerExample]] = None):
        self.llm = llm
        self.schema = schema
        self.examples = _default_examples() if examples is None else examples

    def plan(self, question: str) -> L.LogicalPlan:
        prompt = PLANNER_PROMPT.format(
            guidelines=PLANNER_GUIDELINES,
            operator_docs=operator_docs(),
            examples=render_examples(self.examples),
            schema=self.schema,
            question=question,
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
