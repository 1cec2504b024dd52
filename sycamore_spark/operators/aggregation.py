"""Custom aggregation frame: explicit partial + final user aggregations.

Reference parity: ``Aggregation`` with ``zero_factory`` / ``accumulate(docs)``
/ ``combine(a, b)`` / ``finalize`` (reference: lib/sycamore/sycamore/
transforms/aggregation.py:173-218), executed on Ray as an ``AggregateFnV2``
(aggregation.py:41-125); ``Reduce`` collects sub-docs then applies a
reduce_fn (aggregation.py:221-252). The reference's local mode deliberately
splits and randomly swaps partials to flush non-commutative user aggs
(aggregation.py:144-162) — here that lives in ``check_aggregation_laws``.

Spark-first execution (designed for 100 TB):
- Phase 1 (map-side combine): ``mapInPandas`` folds every input partition
  down to ONE partial row per group key per partition via ``accumulate``.
  Only these partials — not the input rows — cross the shuffle, exactly like
  Spark's built-in partial aggregation.
- Phase 2: ``groupBy(key).applyInPandas`` merges partials with ``combine``
  and emits ``finalize``'s row. Each group's state is a single accumulator,
  so the reducer holds O(groups-per-task) state, never the raw rows.
- Partial state crosses the shuffle as pickled bytes in a binary column —
  opaque engine-internal transport, same role as Ray's serialized
  accumulator dicts (aggregation.py:60).

``Reduce`` is the exception: it semantically needs every row of the group in
one place (reference sorts sub_docs then calls reduce_fn), so its shuffle is
O(rows); prefer a real Aggregation (or DocSet.groupby().agg built-ins) for
anything large.
"""

from __future__ import annotations

import pickle
import random
from collections.abc import Callable, Iterable
from typing import Any, Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

Doc = dict[str, Any]


class Aggregation:
    """User aggregation as zero/accumulate/combine/finalize over dict-docs.

    ``combine`` must be commutative and associative with ``zero`` as
    identity, and ``accumulate`` order-independent — same contract the
    reference states (transforms/aggregation.py:146-152).
    """

    def __init__(
        self,
        name: str,
        accumulate_docs: Optional[Callable[[list[Doc]], Doc]] = None,
        combine_partials: Optional[Callable[[Doc, Doc], Doc]] = None,
        finalize: Optional[Callable[[Doc], Doc]] = None,
        zero_factory: Optional[Callable[[], Doc]] = None,
        accumulate_batch: Optional[Callable[[pd.DataFrame], Doc]] = None,
    ):
        self.name = name
        self._accumulate = accumulate_docs
        self._combine = combine_partials
        self._finalize = finalize
        self._zero_factory = zero_factory
        self._accumulate_batch = accumulate_batch

    def accumulate(self, docs: list[Doc]) -> Doc:
        if self._accumulate is not None:
            return self._accumulate(docs)
        if self._accumulate_batch is not None:
            return self._accumulate_batch(pd.DataFrame(docs))
        raise NotImplementedError("accumulate is not implemented in base aggregation")

    def accumulate_batch(self, pdf: pd.DataFrame) -> Doc:
        """Vectorized fast path: accumulate a whole pandas batch at once.
        Spark-side extension over the reference's per-doc-list contract —
        the executor prefers this when provided (columnar in, no dict
        materialization)."""
        if self._accumulate_batch is not None:
            return self._accumulate_batch(pdf)
        return self.accumulate(pdf.to_dict("records"))

    def combine(self, p1: Doc, p2: Doc) -> Doc:
        if self._combine is not None:
            return self._combine(p1, p2)
        raise NotImplementedError("combine is not implemented in base aggregation")

    def finalize(self, p: Doc) -> Doc:
        if self._finalize is not None:
            return self._finalize(p)
        return p

    def zero(self) -> Doc:
        if self._zero_factory is not None:
            return self._zero_factory()
        return {}


class Reduce(Aggregation):
    """Groupwise reduce: collect the group's docs, sort by doc_id, apply
    reduce_fn (reference: aggregation.py:221-252)."""

    def __init__(self, reduce_fn: Callable[[list[Doc]], Doc], sort_key: str = "doc_id"):
        super().__init__(name="reduce")
        self.reduce_fn = reduce_fn
        self.sort_key = sort_key

    def accumulate(self, docs: list[Doc]) -> Doc:
        return {"sub_docs": list(docs)}

    def combine(self, p1: Doc, p2: Doc) -> Doc:
        return {"sub_docs": p1.get("sub_docs", []) + p2.get("sub_docs", [])}

    def finalize(self, p: Doc) -> Doc:
        subs = sorted(p.get("sub_docs", []), key=lambda d: str(d.get(self.sort_key) or ""))
        return self.reduce_fn(subs)

    def zero(self) -> Doc:
        return {"sub_docs": []}


_SINGLE_GROUP = "__single_group__"


def run_aggregation(
    df: DataFrame,
    agg: Aggregation,
    out_schema: StructType | str,
    group_key: Column | str | None = None,
    key_col_name: str = "key",
) -> DataFrame:
    """Execute ``agg`` over ``df``, optionally grouped by ``group_key``.

    Output schema is ``key_col_name`` (string, present when group_key given)
    plus the user's ``out_schema`` fields from ``finalize``'s dict. Group
    keys are stringified, matching the reference's string group keys
    (aggregation.py:19 ``group_key_fn -> str``).
    """
    if isinstance(out_schema, str):
        out_schema = StructType.fromDDL(out_schema)

    grouped = group_key is not None
    if grouped:
        key = F.col(group_key) if isinstance(group_key, str) else group_key
        work = df.withColumn("__key", key.cast("string"))
    else:
        work = df.withColumn("__key", F.lit(_SINGLE_GROUP))

    data_cols = [c for c in df.columns]

    def partial_accumulate(it: Iterable[pd.DataFrame]):
        # Stream batches, folding each (key, batch-chunk) partial into a
        # running per-key accumulator so partition-level state is one
        # accumulator per key regardless of partition size.
        state: dict[str, Doc] = {}
        for pdf in it:
            for k, grp in pdf.groupby("__key", sort=False, dropna=False):
                part = agg.accumulate_batch(grp[data_cols])
                state[k] = agg.combine(state[k], part) if k in state else part
        if state:
            yield pd.DataFrame(
                {"__key": list(state), "__partial": [pickle.dumps(v) for v in state.values()]}
            )

    partials = work.mapInPandas(
        partial_accumulate, schema="__key string, __partial binary"
    )

    out_fields = [f.name for f in out_schema.fields]
    full_schema = out_schema
    if grouped:
        merged = StructType.fromDDL(f"{key_col_name} string")
        for f in out_schema.fields:
            merged = merged.add(f)
        full_schema = merged

    def combine_finalize(pdf: pd.DataFrame) -> pd.DataFrame:
        acc: Doc | None = None
        for blob in pdf["__partial"]:
            p = pickle.loads(blob)
            acc = p if acc is None else agg.combine(acc, p)
        row = agg.finalize(acc if acc is not None else agg.zero())
        out = {name: [row.get(name)] for name in out_fields}
        if grouped:
            out = {key_col_name: [pdf["__key"].iloc[0]], **out}
        return pd.DataFrame(out)

    return partials.groupBy("__key").applyInPandas(combine_finalize, schema=full_schema)


def check_aggregation_laws(agg: Aggregation, docs: list[Doc], seed: int = 0) -> Doc:
    """Test helper mirroring the reference's local-mode commutativity probe
    (aggregation.py:144-162): split the docs, accumulate both halves,
    randomly swap, combine, finalize. Non-commutative aggs yield unstable
    results across seeds; callers assert equality over several seeds."""
    rng = random.Random(seed)
    half = len(docs) // 2
    a = agg.accumulate(docs[:half]) if half else agg.zero()
    b = agg.accumulate(docs[half:]) if len(docs) - half else agg.zero()
    if rng.random() < 0.5:
        a, b = b, a
    return agg.finalize(agg.combine(a, b))
