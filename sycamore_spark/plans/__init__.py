from sycamore_spark.plans.logical import LogicalPlan, NODE_TYPES
from sycamore_spark.plans.executor import PlanExecutor

__all__ = ["LogicalPlan", "NODE_TYPES", "PlanExecutor"]
