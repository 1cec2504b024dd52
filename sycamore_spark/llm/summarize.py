"""Summarization strategies beyond the per-doc one-step map.

Reference parity:
- ``MultiStepDocumentSummarizer`` — per-document tree-fold: leaves pack
  consecutive elements under a token budget, rounds of summaries-of-
  summaries until one remains (reference: lib/sycamore/sycamore/transforms/
  summarize.py:234-410).
- ``CollectToSummaryDoc`` — aggregate docs into one SummaryDocument with
  ``sub_docs`` (summarize.py:637; SummaryDocument :26).
- Whole-docset hierarchical summarization — the reference folds via its
  Reduce aggregation; here it's driver-driven rounds of distributed
  groupBy+LLM stages (SURVEY.md §2.9 'hierarchical fold = iterative
  groupBy+agg rounds driven from driver').

Scale notes: the per-doc fold is row-local (embarrassingly parallel, one
mapInPandas stage, LLM batched across all leaves of all docs in the Arrow
batch). The docset fold shuffles only round results — round r has
ceil(n/fanin^r) rows — so the reduction tree is log_fanin(n) stages with
geometrically shrinking data.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from sycamore_spark.llm.client import LLM

LLMFactory = Callable[[], LLM]


def _leaf_groups(texts: list[str], max_tokens: int) -> list[str]:
    """Pack consecutive element texts into groups under the (character
    proxy) token budget; a single oversized element becomes its own group,
    truncated at prompt time."""
    groups: list[str] = []
    cur: list[str] = []
    size = 0
    for t in texts:
        t = t or ""
        if cur and size + len(t) > max_tokens:
            groups.append("\n".join(cur))
            cur, size = [], 0
        cur.append(t)
        size += len(t)
    if cur:
        groups.append("\n".join(cur))
    return groups


def summarize_multistep(
    df: DataFrame,
    llm_factory: LLMFactory,
    elements_col: str = "elements",
    text_field: str = "text_representation",
    out_col: str = "summary",
    max_tokens: int = 2000,
    question: str | None = None,
    max_rounds: int = 8,
) -> DataFrame:
    """Per-document hierarchical summary over its elements
    (summarize.py:234: rounds of group-summaries until one remains). One
    mapInPandas stage; each LLM round is batched across every document in
    the Arrow batch, so the call count per round is sum over docs of
    ceil(n_groups), not one call per doc per group."""
    q = f" with respect to the question: {question}" if question else ""
    out_schema = StructType(list(df.schema.fields)).add(out_col, StringType())
    names = [f.name for f in out_schema.fields]

    def run(it: Iterable[pd.DataFrame]):
        llm = llm_factory()

        def prompt(text: str) -> str:
            return f"Summarize the following text{q}.\nText: {text[: max_tokens * 4]}"

        for pdf in it:
            # state per doc: list of current-round texts
            states: list[list[str]] = []
            for elements in pdf[elements_col]:
                elements = [] if elements is None else list(elements)
                texts = [
                    (e.get(text_field) if isinstance(e, dict) else e[text_field]) or ""
                    for e in elements
                ]
                states.append(texts if texts else [""])
            for round_no in range(max_rounds):
                jobs: list[tuple[int, str]] = []
                for i, texts in enumerate(states):
                    if len(texts) > 1 or round_no == 0:
                        for g in _leaf_groups(texts, max_tokens):
                            jobs.append((i, g))
                if not jobs:
                    break
                replies = llm.generate_batch([prompt(g) for _i, g in jobs])
                next_states: dict[int, list[str]] = {}
                for (i, _g), r in zip(jobs, replies):
                    next_states.setdefault(i, []).append(r)
                states = [next_states.get(i, texts) for i, texts in enumerate(states)]
                if all(len(s) == 1 for s in states):
                    break
            pdf = pdf.copy()
            pdf[out_col] = [s[0] if s else "" for s in states]
            yield pdf[names]

    return df.mapInPandas(run, schema=out_schema)


def collect_to_summary_doc(
    df: DataFrame,
    group_key=None,
    fields: list[str] | None = None,
    out_col: str = "sub_docs",
) -> DataFrame:
    """Aggregate docs into summary rows carrying ``sub_docs``
    (array<struct>) — CollectToSummaryDoc (summarize.py:637) as a native
    collect_list of structs."""
    cols = fields or df.columns
    sub = F.collect_list(F.struct(*[F.col(c) for c in cols])).alias(out_col)
    if group_key is None:
        return df.groupBy().agg(sub)
    key = F.col(group_key) if isinstance(group_key, str) else group_key
    return df.groupBy(key.alias("key")).agg(sub)


def summarize_docset_hierarchical(
    df: DataFrame,
    llm_factory: LLMFactory,
    text_col: str = "text",
    fanin: int = 10,
    question: str | None = None,
    max_rounds: int = 12,
    stable_id: str | None = None,
) -> DataFrame:
    """Whole-docset fold: driver-driven rounds; round r groups every
    ``fanin`` summaries, LLM-summarizes each group distributedly, and stops
    at one row. Data volume shrinks by ``fanin``× per round, so the shuffle
    cost is dominated by round 0 over the raw docs.

    With ``stable_id`` (an integral column), grouping is ``id mod
    ceil(n/fanin)`` and each group's texts concatenate in sorted order, so
    the entire fold is a pure function of the input data — reproducible
    across runs/partitionings (and replayable by an external oracle).
    Without it, a runtime row id seeds the groups (uniform spread, no
    global sort, but partition-dependent)."""
    from sycamore_spark.llm.map import llm_map

    q = f" with respect to the question: {question}" if question else ""
    idx0 = (
        F.col(stable_id).cast("long") if stable_id else F.monotonically_increasing_id()
    )
    cur = df.select(F.col(text_col).alias("text"), idx0.alias("idx"))
    for round_no in range(max_rounds):
        n = cur.count()
        if n <= 1:
            break
        ngroups = (n + fanin - 1) // fanin
        grp = F.pmod(F.col("idx"), ngroups) if stable_id else F.pmod(F.hash("idx"), ngroups)
        grouped = (
            cur.withColumn("grp", grp)
            .groupBy("grp")
            .agg(F.array_join(F.array_sort(F.collect_list("text")), "\n---\n").alias("text"))
        )
        summarized = llm_map(
            grouped,
            f"Summarize the following texts into one summary{q}.\nText: {{{{ doc.text }}}}",
            "text2",
            llm_factory,
        )
        cur = summarized.select(F.col("text2").alias("text"), F.col("grp").alias("idx"))
    return cur.select(F.col("text").alias("summary"))
