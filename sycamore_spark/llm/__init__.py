from sycamore_spark.llm.client import LLM, MockLLM
from sycamore_spark.llm.map import llm_map, llm_filter, extract_entity, summarize_docs, summarize_data

__all__ = ["LLM", "MockLLM", "llm_map", "llm_filter", "extract_entity", "summarize_docs", "summarize_data"]
