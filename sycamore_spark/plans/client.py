"""QueryClient: the natural-language query entry point (lifecycle B).

Reference parity: ``SycamoreQueryClient.query(question, index)`` — fetch
schema by sampling the index, LLM-plan, run plan processors, execute with
subtree caching, return a result carrying the plan for tracing (reference:
lib/sycamore/sycamore/query/client.py:240; schema fetch query/schema.py:
39-52; result query/result.py:23).

Spark-first: the "index" is any table the engine can load; schema fetch is
``df.schema`` (typed, free) plus sampled example values for the planner
prompt — no service round-trip.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional

from pyspark.sql import SparkSession

from sycamore_spark.llm.client import LLM, MockLLM
from sycamore_spark.plans import logical as L
from sycamore_spark.plans import processors as P
from sycamore_spark.plans.executor import PlanExecutor
from sycamore_spark.plans.planner import LlmPlanner, RuleBasedPlanner
from sycamore_spark.sources.tables import load_table

DEFAULT_PROCESSORS = (P.validate, P.limit_llm_operations)


@dataclass
class QueryResult:
    """reference: query/result.py:23 SycamoreQueryResult."""

    question: str
    plan: L.LogicalPlan
    result: Any
    code: Optional[str] = None

    def to_str(self) -> str:
        from pyspark.sql import DataFrame

        if isinstance(self.result, DataFrame):
            return "\n".join(str(r.asDict()) for r in self.result.limit(20).collect())
        return str(self.result)


class QueryClient:
    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        llm_factory: Optional[Callable[[], LLM]] = None,
        planner=None,
        processors=DEFAULT_PROCESSORS,
        cache_dir: Optional[str] = None,
    ):
        self.spark = spark
        self.sf_dir = sf_dir
        self.llm_factory = llm_factory or (lambda: MockLLM())
        self.planner = planner
        self.processors = list(processors)
        self.cache_dir = cache_dir

    def get_schema(self, table: str, sample: int = 3) -> str:
        """Typed schema + sampled example values for planner prompting
        (reference samples the OpenSearch index, query/schema.py:39)."""
        df = load_table(self.spark, self.sf_dir, table)
        lines = []
        examples = df.limit(sample).collect()
        for f in df.schema.fields:
            vals = ", ".join(repr(r[f.name])[:40] for r in examples)
            lines.append(f"{f.name} ({f.dataType.simpleString()}): e.g. {vals}")
        return "\n".join(lines)

    def plan(self, question: str, table: str = "documents") -> L.LogicalPlan:
        planner = self.planner or RuleBasedPlanner()
        try:
            plan = planner.plan(question, table)
        except TypeError:
            # LlmPlanner signature takes only the question (schema was
            # bound at construction)
            plan = planner.plan(question)
        for proc in self.processors:
            plan = proc(plan)
        return plan

    def query(self, question: str, table: str = "documents", codegen: bool = False) -> QueryResult:
        """plan → process → execute (with sha256 subtree caching when
        cache_dir is set); ``codegen=True`` also emits equivalent PySpark
        source (reference codegen mode, sycamore_executor.py:316-345)."""
        plan = self.plan(question, table)
        executor = PlanExecutor(
            self.spark, self.sf_dir, llm_factory=self.llm_factory, cache_dir=self.cache_dir
        )
        result = executor.execute(plan)
        code = None
        if codegen:
            from sycamore_spark.plans.executor import plan_to_script

            code = plan_to_script(plan)
        return QueryResult(question=question, plan=plan, result=result, code=code)
