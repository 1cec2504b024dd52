"""Retrieval-as-dataflow: execute a DataFrame of queries against a search
backend.

Reference parity: ``OpenSearchQuery``/``OpenSearchQueryResult`` documents
flow through a ``Query`` transform that maps each query row through a
``QueryExecutor`` (reference: lib/sycamore/sycamore/transforms/query.py:
14-70; data/document.py:482,539). The OpenSearch executor needs a live
service — it keeps the exact seam and raises ImportError without
``opensearchpy``; ``LocalQueryExecutor`` retrieves against a broadcast
in-memory corpus so the dataflow shape is testable hermetically.

Spark-first: the query table is just a DataFrame; execution is one
iterator-style ``mapInPandas`` stage (client/corpus initialized once per
task), results land as an ``array<struct<doc_id, score, text>>`` hits
column — typed, explodable, joinable.
"""

from __future__ import annotations

import re
from abc import ABC, abstractmethod
from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

HIT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("score", DoubleType()),
        StructField("text", StringType()),
    ]
)


class QueryExecutor(ABC):
    @abstractmethod
    def query(self, query: dict) -> list[dict]:
        """query dict → list of hit dicts (doc_id, score, text)."""

    def __call__(self, query: dict) -> list[dict]:
        return self.query(query)


class LocalQueryExecutor(QueryExecutor):
    """Deterministic term-overlap retrieval over an in-memory corpus
    ({doc_id: text}); score = |query∩doc| / |query| on lowercased tokens."""

    def __init__(self, corpus: dict[str, str], k: int = 10):
        self.corpus = corpus
        self.k = k

    def query(self, query: dict) -> list[dict]:
        terms = set(re.findall(r"\w+", str(query.get("query", "")).lower()))
        if not terms:
            return []
        scored = []
        for doc_id, text in self.corpus.items():
            toks = set(re.findall(r"\w+", (text or "").lower()))
            score = len(terms & toks) / len(terms)
            if score > 0:
                scored.append({"doc_id": str(doc_id), "score": score, "text": text})
        scored.sort(key=lambda h: (-h["score"], h["doc_id"]))
        return scored[: self.k]


class OpenSearchQueryExecutor(QueryExecutor):
    """reference: transforms/query.py:24-46 — needs opensearchpy + a live
    cluster; the seam raises here."""

    def __init__(self, os_client_args: dict):
        import opensearchpy  # noqa: F401 — absent in this container

        self._args = os_client_args

    def query(self, query: dict) -> list[dict]:  # pragma: no cover
        raise NotImplementedError("requires a live OpenSearch cluster")


def run_queries(
    df: DataFrame,
    executor_factory,
    query_col: str = "query",
    out_col: str = "hits",
) -> DataFrame:
    """Execute each query row, attaching a typed hits array. The executor
    is built once per task (iterator mapInPandas) — connection setup /
    corpus broadcast amortizes across the whole partition."""
    out_schema = StructType(list(df.schema.fields)).add(out_col, ArrayType(HIT_SCHEMA))
    names = [f.name for f in out_schema.fields]

    def run(it: Iterable[pd.DataFrame]):
        executor = executor_factory()
        for pdf in it:
            pdf = pdf.copy()
            pdf[out_col] = [executor({"query": q}) for q in pdf[query_col]]
            yield pdf[names]

    return df.mapInPandas(run, schema=out_schema)
