"""Streaming corpus-stats maintenance.

Continuous ingest keeps the corpus's summary statistics current WITHOUT
ever rescanning history: each micro-batch's additive state
(operators/incremental.py corpus_stats) is merged into a persisted state
table via ``foreachBatch``. Because the state is associative (decimal
sums, counts, min/max), the final state is INDEPENDENT of micro-batch
boundaries — ingesting the corpus in 1 batch or 50 yields bit-identical
statistics, which is exactly what the oracle gate checks against a
full-table recompute.

State handling: the state table is kilobytes (one row per group), so each
batch reads it, merges, cuts lineage with an eager ``localCheckpoint``
(the overwrite below deletes the files the plan would otherwise re-read),
and atomically overwrites. Restart safety comes from the streaming
checkpoint: a replayed batch re-merges its contribution, so pair this
with an idempotent upstream (e.g. the self-deduplicating corpus sink in
streaming/ingest.py) or a batch-id high-water mark for exactly-once
state. At cluster scale the same pattern targets a transactional table
(Delta/Iceberg MERGE) instead of parquet overwrite.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from sycamore_spark.operators.incremental import corpus_stats, merge_stats


def maintain_stats_stream(
    stream: DataFrame,
    group_cols: list[str],
    value_col: str,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start a foreachBatch query folding each micro-batch's additive
    stats state into ``state_dir``. Returns the StreamingQuery (caller
    awaits). Read the final state with ``spark.read.parquet(state_dir)``
    and derive mean/stddev via ``finalize_stats``."""

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        new = corpus_stats(batch_df, group_cols, value_col)
        if os.path.exists(os.path.join(state_dir, "_SUCCESS")):
            old = spark.read.parquet(state_dir)
            merged = merge_stats(old, new, group_cols)
        else:
            merged = new
        # eager checkpoint: the write below overwrites the very files the
        # merged plan reads, so cut lineage first (state is kilobytes)
        merged.localCheckpoint(eager=True).coalesce(1).write.mode("overwrite").parquet(
            state_dir
        )

    writer = (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
