from sycamore_spark.llm.client import LLM, MockLLM
from sycamore_spark.llm.map import llm_map, llm_filter, extract_entity, summarize_docs, summarize_data
from sycamore_spark.llm.extract import extract_properties, extract_properties_typed, infer_schema
from sycamore_spark.llm.summarize import (
    collect_to_summary_doc,
    summarize_docset_hierarchical,
    summarize_multistep,
)

__all__ = [
    "LLM", "MockLLM", "llm_map", "llm_filter", "extract_entity", "summarize_docs",
    "summarize_data", "extract_properties", "extract_properties_typed", "infer_schema",
    "collect_to_summary_doc", "summarize_docset_hierarchical", "summarize_multistep",
]
