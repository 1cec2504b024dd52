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


_EVENTS_SCHEMA = (
    "events(event_id long, ts timestamp, user_id long, event_type string, value double)"
)
_DOCS_SCHEMA = "documents(doc_id long, text string, lang string, source string, n_chars int)"
_ORDERS_SCHEMA = (
    "orders(o_orderkey long, o_custkey long, o_orderdate date, "
    "o_orderpriority string, o_totalprice double, o_clerk string)"
)
_CUSTOMER_SCHEMA = "customer(c_custkey long, c_name string, c_acctbal double, c_mktsegment string)"
_EMB_SCHEMA = "embeddings(vec_id long, embedding array<float>, label int)"


def _default_examples() -> list[PlannerExample]:
    """Built-in few-shot examples over the synthetic tables. One example per
    plan SHAPE in the reference's validated example set (reference:
    query/planner_prompt.py:106-354 — pushdown-only scan, scan+count,
    compound-predicate pushdown, count-distinct, extract-entity+topk,
    percent-via-two-counts+math, vector-scan+llm-filter x2, sort+limit),
    plus coverage examples so every logical operator in ``L.NODE_TYPES``
    appears in at least one worked plan (FieldIn, GroupBy/AggregateCount/
    AggregateCollect, KMeanClustering, LLMClustering, Unroll, SummarizeData,
    DataLoader). Each plan passes ``processors.validate`` (asserted in
    tests/test_plans.py)."""
    # 1. pushdown-only scan (reference ex1: match_phrase into the scan)
    ex_scan = L.LogicalPlan(
        query="Were there any error events?",
        result_node=0,
        nodes={
            0: L.QueryDatabase(
                node_id=0,
                description="Scan events filtered to errors (pushdown)",
                table="events",
                filter_expr="event_type = 'error'",
            ),
        },
    )
    # 2. filtered scan + count-distinct (reference ex2/ex4)
    ex_count = L.LogicalPlan(
        query="How many web-source documents mention spark?",
        result_node=1,
        nodes={
            0: L.QueryDatabase(
                node_id=0,
                description="Scan documents from the web source mentioning spark",
                table="documents",
                filter_expr="source = 'web' AND text LIKE '%spark%'",
            ),
            1: L.Count(
                node_id=1,
                description="Count distinct matching documents",
                distinct_field="doc_id",
                inputs=[0],
            ),
        },
    )
    # 3. compound predicate pushed into one scan (reference ex3:
    #    date range + match + phrase in a single bool query)
    ex_compound = L.LogicalPlan(
        query=(
            "Show urgent orders placed between 1995-01-01 and 1996-12-31 "
            "handled by clerk 42"
        ),
        result_node=0,
        nodes={
            0: L.QueryDatabase(
                node_id=0,
                description="Scan orders with the full compound filter pushed down",
                table="orders",
                filter_expr=(
                    "o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31' "
                    "AND o_orderpriority = '1-URGENT' AND o_clerk LIKE '%42%'"
                ),
            ),
        },
    )
    # 4. extract-entity then top-k (reference ex5: pilots)
    ex_extract_topk = L.LogicalPlan(
        query="Which 5 topics appear in the most documents?",
        result_node=2,
        nodes={
            0: L.QueryDatabase(node_id=0, description="Scan documents", table="documents"),
            1: L.LlmExtractEntity(
                node_id=1,
                description="Extract the main topic of each document",
                entity="topic",
                field="text",
                inputs=[0],
            ),
            2: L.TopK(
                node_id=2,
                description="Return the 5 most common topics",
                field="properties.topic",
                K=5,
                descending=True,
                unique_field="doc_id",
                inputs=[1],
            ),
        },
    )
    # 5. percent = filtered count / total count via Math (reference ex6)
    ex_percent = L.LogicalPlan(
        query="What fraction of events occurred in 2024?",
        result_node=4,
        nodes={
            0: L.QueryDatabase(node_id=0, description="Scan all events", table="events"),
            1: L.Count(node_id=1, description="Total events", inputs=[0]),
            2: L.BasicFilter(
                node_id=2,
                description="Keep events in 2024",
                field="ts",
                range_filter=True,
                is_date=True,
                start="2024-01-01",
                end="2024-12-31",
                inputs=[0],
            ),
            3: L.Count(node_id=3, description="Events in 2024", inputs=[2]),
            4: L.Math(
                node_id=4,
                description="Divide the 2024 count by the total",
                operation="divide",
                inputs=[3, 1],
            ),
        },
    )
    # 6/7. approximate vector retrieval + exactness LlmFilter
    #      (reference ex7/ex8: vector scan is approximate, always follow
    #      with an LlmFilter)
    ex_vector = L.LogicalPlan(
        query="Were there any documents about sudden weather changes?",
        result_node=1,
        nodes={
            0: L.QueryVectorDatabase(
                node_id=0,
                description="Vector-retrieve candidates about sudden weather changes",
                table="embeddings",
                k=10,
            ),
            1: L.LlmFilter(
                node_id=1,
                description="Keep only documents truly about sudden weather changes",
                question="Is this document about sudden weather changes?",
                field="text",
                inputs=[0],
            ),
        },
    )
    ex_vector_filtered = L.LogicalPlan(
        query="Show label-3 items similar to the query vector",
        result_node=1,
        nodes={
            0: L.QueryVectorDatabase(
                node_id=0,
                description="Filtered vector search: rank only label-3 rows",
                table="embeddings",
                k=10,
                filter_expr="label = 3",
            ),
            1: L.LlmFilter(
                node_id=1,
                description="Keep only truly relevant results",
                question="Is this item relevant to the query?",
                field="text",
                inputs=[0],
            ),
        },
    )
    # 8. sort + limit (reference ex9: highest revenue)
    ex_sort_limit = L.LogicalPlan(
        query="Which 2 customers have the highest account balance?",
        result_node=2,
        nodes={
            0: L.QueryDatabase(node_id=0, description="Scan customers", table="customer"),
            1: L.Sort(
                node_id=1,
                description="Sort by account balance, largest first",
                field="c_acctbal",
                descending=True,
                default_value=0,
                inputs=[0],
            ),
            2: L.Limit(
                node_id=2,
                description="Keep the top 2 customers",
                num_records=2,
                inputs=[1],
            ),
        },
    )
    # 9. range filter + top-k (exact-over-LLM: answerable from fields alone)
    ex_filter_topk = L.LogicalPlan(
        query="Top 3 languages among long documents",
        result_node=2,
        nodes={
            0: L.QueryDatabase(node_id=0, description="Scan documents", table="documents"),
            1: L.BasicFilter(
                node_id=1,
                description="Keep long documents",
                field="n_chars",
                range_filter=True,
                start=1000,
                inputs=[0],
            ),
            2: L.TopK(
                node_id=2,
                description="Most common languages",
                field="lang",
                K=3,
                descending=True,
                inputs=[1],
            ),
        },
    )
    # 10. semi-join across two scans (FieldIn)
    ex_field_in = L.LogicalPlan(
        query="Show events generated by customers with urgent orders",
        result_node=2,
        nodes={
            0: L.QueryDatabase(node_id=0, description="Scan events", table="events"),
            1: L.QueryDatabase(
                node_id=1,
                description="Scan urgent orders (pushdown)",
                table="orders",
                filter_expr="o_orderpriority = '1-URGENT'",
            ),
            2: L.FieldIn(
                node_id=2,
                description="Keep events whose user placed an urgent order",
                field="user_id",
                other_field="o_custkey",
                inputs=[0, 1],
            ),
        },
    )
    # 11. group-by count
    ex_groupby = L.LogicalPlan(
        query="How many events of each type were there?",
        result_node=2,
        nodes={
            0: L.QueryDatabase(node_id=0, description="Scan events", table="events"),
            1: L.GroupBy(node_id=1, description="Group by event type", field="event_type", inputs=[0]),
            2: L.AggregateCount(node_id=2, description="Count per type", inputs=[1]),
        },
    )
    # 12. group-by collect
    ex_collect = L.LogicalPlan(
        query="List the document ids per language",
        result_node=2,
        nodes={
            0: L.QueryDatabase(node_id=0, description="Scan documents", table="documents"),
            1: L.GroupBy(node_id=1, description="Group by language", field="lang", inputs=[0]),
            2: L.AggregateCollect(
                node_id=2,
                description="Collect doc ids per language",
                collect_field="doc_id",
                inputs=[1],
            ),
        },
    )
    # 13. k-means over the embedding column
    ex_kmeans = L.LogicalPlan(
        query="Cluster the embeddings into 8 groups",
        result_node=1,
        nodes={
            0: L.QueryDatabase(node_id=0, description="Scan embeddings", table="embeddings"),
            1: L.KMeanClustering(
                node_id=1,
                description="Assign each vector to one of 8 k-means clusters",
                K=8,
                vec_col="embedding",
                inputs=[0],
            ),
        },
    )
    # 14. LLM clustering of free text
    ex_llm_cluster = L.LogicalPlan(
        query="Group the documents into 5 thematic categories",
        result_node=1,
        nodes={
            0: L.QueryDatabase(node_id=0, description="Scan documents", table="documents"),
            1: L.LLMClustering(
                node_id=1,
                description="LLM-assign each document to one of 5 themes",
                field="text",
                instruction="Group the documents into 5 thematic categories",
                num_groups=5,
                inputs=[0],
            ),
        },
    )
    # 15. unroll a delimited field then top-k
    ex_unroll = L.LogicalPlan(
        query="What are the 10 most common words in German documents?",
        result_node=2,
        nodes={
            0: L.QueryDatabase(
                node_id=0,
                description="Scan German documents (pushdown)",
                table="documents",
                filter_expr="lang = 'de'",
            ),
            1: L.Unroll(
                node_id=1,
                description="One row per word",
                field="text",
                delimiter=" ",
                inputs=[0],
            ),
            2: L.TopK(node_id=2, description="Most common words", field="text", K=10, inputs=[1]),
        },
    )
    # 16. summarize a filtered doc set with one LLM call
    ex_summarize = L.LogicalPlan(
        query="Summarize what the error events say",
        result_node=1,
        nodes={
            0: L.QueryDatabase(
                node_id=0,
                description="Scan error events (pushdown)",
                table="events",
                filter_expr="event_type = 'error'",
            ),
            1: L.SummarizeData(
                node_id=1,
                description="Summarize the error events",
                question="Summarize what the error events say",
                field="text",
                inputs=[0],
            ),
        },
    )
    # 17. load a prior materialized extract
    ex_loader = L.LogicalPlan(
        query="How many rows are in the materialized extract?",
        result_node=1,
        nodes={
            0: L.DataLoader(
                node_id=0,
                description="Load the materialized parquet extract",
                path="/tmp/extract",
            ),
            1: L.Count(node_id=1, description="Count the loaded rows", inputs=[0]),
        },
    )
    return [
        PlannerExample(schema=_EVENTS_SCHEMA, plan=ex_scan),
        PlannerExample(schema=_DOCS_SCHEMA, plan=ex_count),
        PlannerExample(schema=_ORDERS_SCHEMA, plan=ex_compound),
        PlannerExample(schema=_DOCS_SCHEMA, plan=ex_extract_topk),
        PlannerExample(schema=_EVENTS_SCHEMA, plan=ex_percent),
        PlannerExample(schema=_EMB_SCHEMA, plan=ex_vector),
        PlannerExample(schema=_EMB_SCHEMA, plan=ex_vector_filtered),
        PlannerExample(schema=_CUSTOMER_SCHEMA, plan=ex_sort_limit),
        PlannerExample(schema=_DOCS_SCHEMA, plan=ex_filter_topk),
        PlannerExample(schema=f"{_EVENTS_SCHEMA}\n{_ORDERS_SCHEMA}", plan=ex_field_in),
        PlannerExample(schema=_EVENTS_SCHEMA, plan=ex_groupby),
        PlannerExample(schema=_DOCS_SCHEMA, plan=ex_collect),
        PlannerExample(schema=_EMB_SCHEMA, plan=ex_kmeans),
        PlannerExample(schema=_DOCS_SCHEMA, plan=ex_llm_cluster),
        PlannerExample(schema=_DOCS_SCHEMA, plan=ex_unroll),
        PlannerExample(schema=_EVENTS_SCHEMA, plan=ex_summarize),
        PlannerExample(schema=_DOCS_SCHEMA, plan=ex_loader),
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
