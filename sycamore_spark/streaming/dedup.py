"""Streaming deduplication: the exact-dedup operator's Structured Streaming
twin (batch: operators/dedup.py exact_dedup; the reference has no streaming
runtime — SURVEY.md §2.11 scale headroom).

Two modes, both built on Spark's stateful ``dropDuplicates``:

- unbounded: ``dropDuplicates`` on the content fingerprint — state grows
  with distinct keys forever; right when the key space is bounded.
- watermarked: ``dropDuplicatesWithinWatermark`` — duplicates are only
  suppressed within the watermark horizon and state for expired keys is
  dropped, which is the only shape that survives an unbounded 100 TB/day
  feed (state is O(keys-per-horizon), not O(keys-ever)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sycamore_spark.functions import text as T


def dedup_stream(
    events: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "1 hour",
    fingerprint_col: str = "fingerprint",
) -> DataFrame:
    """Drop rows whose normalized-text fingerprint was already seen.

    With ``ts_col`` set, duplicates are suppressed within the ``watermark``
    horizon and per-key state expires with it (dropDuplicatesWithinWatermark);
    without it, state is global and unbounded."""
    from sycamore_spark.functions.time import as_event_time

    out = events.withColumn(fingerprint_col, T.fingerprint(F.col(text_col)))
    if ts_col is not None:
        from sycamore_spark import compat

        compat.require("stream_dedup_watermark")
        out = as_event_time(out, ts_col)  # watermark rejects TIMESTAMP_NTZ
        return out.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            [fingerprint_col]
        )
    return out.dropDuplicates([fingerprint_col])


def dedup_stream_vs_corpus(
    stream: DataFrame,
    corpus: DataFrame,
    key_col: str,
) -> DataFrame:
    """Continuous incremental dedup: drop stream rows whose ``key_col``
    already exists in the STATIC corpus — the streaming twin of
    ``operators.dedup.incremental_dedup`` (the crawl-ingest shape: new
    pages flow in, anything already in the training corpus is discarded
    before it costs a byte downstream).

    Spark executes a stream-static left-anti join by re-probing the static
    side per micro-batch — no streaming state at all (the corpus is the
    state, and it lives in parquet). Pair with ``dedup_stream`` after this
    join to also suppress duplicates WITHIN the stream. At 100 TB keep the
    corpus side bucketed on the key so each micro-batch probe is a
    co-located join, or swap in the Bloom-prefilter (dedup.build_bloom) as
    a foreachBatch pre-filter when corpus re-reads dominate.
    """
    return stream.join(
        corpus.select(F.col(key_col)).distinct(), key_col, "left_anti"
    )
