"""Logical query plan: the LLM-planned operator DAG.

Reference parity: pydantic ``LogicalPlan`` with ``nodes: {id: Node}``,
``result_node``, per-node ``inputs`` (reference: lib/sycamore/sycamore/query/
logical_plan.py:188-231; node registry :30-58; cache keys :131-148) and the
operator set under query/operators/* registered in ALL_OPERATORS
(query/strategy.py:20-32). Docstrings double as planner prompt material,
exactly like the reference's ``usage()`` blocks.
"""

from __future__ import annotations

import hashlib
import json
from typing import Any, Literal, Optional, Union

from pydantic import BaseModel, Field


class Node(BaseModel):
    """Base logical operator (reference: query/logical_plan.py Node)."""

    node_type: str
    node_id: int
    description: Optional[str] = None
    inputs: list[int] = Field(default_factory=list)

    def cache_key(self, plan: "LogicalPlan") -> str:
        """Content hash over this node and its input subtree
        (reference: logical_plan.py:141-148)."""
        payload = self.model_dump(exclude={"description"})
        payload["_inputs"] = [plan.nodes[i].cache_key(plan) for i in self.inputs]
        return hashlib.sha256(json.dumps(payload, sort_keys=True, default=str).encode()).hexdigest()


class QueryDatabase(Node):
    """Scan a table, optionally with a pushed-down filter expression
    (reference: query/operators/query_database.py:10 — 'use the query
    parameter to filter at the source'; Catalyst pushes our native filters
    into the parquet scan automatically)."""

    node_type: Literal["QueryDatabase"] = "QueryDatabase"
    table: str = "documents"
    filter_expr: Optional[str] = None  # SQL boolean expression


class QueryVectorDatabase(Node):
    """kNN retrieval over the embeddings table (reference:
    query_database.py QueryVectorDatabase → OpenSearch kNN; here brute-force
    or IVF cosine top-k in-engine). ``filter_expr`` is the reference's
    ``opensearch_filter`` (query_database.py:104) as a SQL predicate:
    filtered vector search, applied to the corpus BEFORE ranking
    (pre-filter-then-rank — the top-k is exact over qualifying rows, same
    contract as operators/similarity prefilter=)."""

    node_type: Literal["QueryVectorDatabase"] = "QueryVectorDatabase"
    table: str = "embeddings"
    query_vector: Optional[list[float]] = None
    k: int = 10
    filter_expr: Optional[str] = None


class DataLoader(Node):
    """Load a materialized parquet directory (reference: DataLoader)."""

    node_type: Literal["DataLoader"] = "DataLoader"
    path: str = ""


class BasicFilter(Node):
    """Match (substring/equality) or range filter on a field
    (reference: query/operators/basic_filter.py:6)."""

    node_type: Literal["BasicFilter"] = "BasicFilter"
    field: str = ""
    query: Optional[Any] = None           # match mode
    start: Optional[Any] = None           # range mode
    end: Optional[Any] = None
    range_filter: bool = False
    is_date: bool = False


class LlmFilter(Node):
    """LLM scores each doc 0-5 against question; keep >= threshold
    (reference: query/operators/llm_filter.py:6)."""

    node_type: Literal["LlmFilter"] = "LlmFilter"
    field: str = "text_representation"
    question: str = ""
    threshold: int = 3


class LlmExtractEntity(Node):
    """LLM extracts a named entity into a new field (reference:
    query/operators/llm_extract_entity.py:6)."""

    node_type: Literal["LlmExtractEntity"] = "LlmExtractEntity"
    entity: str = ""
    field: str = "text_representation"


class Count(Node):
    """Count rows or distinct values of a field (reference:
    query/operators/count.py:6). Produces a scalar."""

    node_type: Literal["Count"] = "Count"
    distinct_field: Optional[str] = None


class Sort(Node):
    node_type: Literal["Sort"] = "Sort"
    field: str = ""
    descending: bool = False
    default_value: Optional[Any] = None


class Limit(Node):
    node_type: Literal["Limit"] = "Limit"
    num_records: int = 10


class TopK(Node):
    """Group by field, count, keep K largest/smallest groups
    (reference: query/operators/top_k.py:9)."""

    node_type: Literal["TopK"] = "TopK"
    field: str = ""
    K: int = 10
    descending: bool = True
    unique_field: Optional[str] = None


class FieldIn(Node):
    """Semi-join: keep rows of input 0 whose field is in input 1's field
    (reference: query/operators/field_in.py:4)."""

    node_type: Literal["FieldIn"] = "FieldIn"
    field: str = ""
    other_field: str = ""


class GroupBy(Node):
    node_type: Literal["GroupBy"] = "GroupBy"
    field: str = ""


class AggregateCount(Node):
    """Count per group; follows GroupBy (reference: query/operators/groupby.py:15)."""

    node_type: Literal["AggregateCount"] = "AggregateCount"


class AggregateCollect(Node):
    """Collect values per group (reference: groupby.py:25)."""

    node_type: Literal["AggregateCollect"] = "AggregateCollect"
    collect_field: str = ""


class KMeanClustering(Node):
    node_type: Literal["KMeanClustering"] = "KMeanClustering"
    K: int = 8
    vec_col: str = "embedding"


class LLMClustering(Node):
    node_type: Literal["LLMClustering"] = "LLMClustering"
    field: str = "text_representation"
    instruction: str = ""
    num_groups: int = 5


class Unroll(Node):
    node_type: Literal["Unroll"] = "Unroll"
    field: str = ""
    delimiter: str = " "


class Math(Node):
    """Scalar arithmetic between two scalar inputs (reference:
    query/operators/math.py:6; div-by-zero → NaN per operations.py:48-71)."""

    node_type: Literal["Math"] = "Math"
    operation: Literal["add", "subtract", "multiply", "divide"] = "add"


class SummarizeData(Node):
    """Answer a question over the input docs with one LLM call
    (reference: query/operators/summarize_data.py:7)."""

    node_type: Literal["SummarizeData"] = "SummarizeData"
    question: str = ""
    field: str = "text_representation"


NODE_TYPES: dict[str, type[Node]] = {
    c.model_fields["node_type"].default: c
    for c in (
        QueryDatabase, QueryVectorDatabase, DataLoader, BasicFilter, LlmFilter,
        LlmExtractEntity, Count, Sort, Limit, TopK, FieldIn, GroupBy,
        AggregateCount, AggregateCollect, KMeanClustering, LLMClustering,
        Unroll, Math, SummarizeData,
    )
}


class LogicalPlan(BaseModel):
    """Operator DAG (reference: logical_plan.py:188-231)."""

    query: str = ""
    nodes: dict[int, Node] = Field(default_factory=dict)
    result_node: int = 0

    @classmethod
    def from_dict(cls, data: dict) -> "LogicalPlan":
        """Deserialize with node_type dispatch (reference:
        logical_plan.py:150-158 deserialization via registry)."""
        nodes = {}
        for nid, nd in data.get("nodes", {}).items():
            cls_ = NODE_TYPES[nd["node_type"]]
            nodes[int(nid)] = cls_(**nd)
        return cls(query=data.get("query", ""), nodes=nodes, result_node=int(data["result_node"]))

    def validate_plan(self) -> list[str]:
        """Structural checks (reference: DefaultPlanValidator,
        query/strategy.py:48-70)."""
        errors = []
        if self.result_node not in self.nodes:
            errors.append(f"result_node {self.result_node} not in nodes")
        for nid, n in self.nodes.items():
            if n.node_id != nid:
                errors.append(f"node {nid}: node_id mismatch")
            for i in n.inputs:
                if i not in self.nodes:
                    errors.append(f"node {nid}: missing input {i}")
            if isinstance(n, (BasicFilter, Sort, TopK, Unroll)) and not n.field:
                errors.append(f"node {nid}: {n.node_type} requires field")
            if isinstance(n, Math) and len(n.inputs) != 2:
                errors.append(f"node {nid}: Math requires 2 inputs")
        roots = [n for n in self.nodes.values() if not n.inputs]
        if not any(isinstance(r, (QueryDatabase, QueryVectorDatabase, DataLoader)) for r in roots):
            errors.append("plan has no source node (RequireQueryDatabase, strategy.py:281)")
        return errors
