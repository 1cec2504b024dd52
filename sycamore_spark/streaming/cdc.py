"""Streaming CDC snapshot maintenance.

A change feed (upserts + deletes with a total-ordering sequence) folds
into a continuously-maintained snapshot table WITHOUT rescanning history:
each micro-batch merges latest-wins into the persisted state via
``foreachBatch`` — the streaming half of ``operators/cdc.py``.

Correctness properties, both oracle-gated:

- **Batch-boundary independence**: latest-wins merge is associative over
  sequence order, so ingesting the feed in 1 batch or 50 yields the
  identical snapshot (the ``maintain_stats_stream`` discipline applied to
  MERGE instead of additive sums).
- **Tombstones**: the state retains winning deletes (``keep_deletes``),
  so a late-arriving lower-sequence update cannot resurrect a deleted
  key across batches; the returned live view filters them out.

Restart safety: the same checkpoint-scoped ``_hwm_batch`` high-water mark
as ``streaming/stats.py`` — a replayed batch (state overwrite committed,
checkpoint commit lost) is skipped, making the fold idempotent. At
cluster scale the overwrite becomes a transactional MERGE INTO
(Delta/Iceberg); the logic is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from sycamore_spark.operators.cdc import apply_changes


def maintain_snapshot_stream(
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
    state_dir: str,
    checkpoint_dir: str,
    op_col: str = "op",
    delete_op: str = "D",
    available_now: bool = True,
):
    """Start a foreachBatch query folding each micro-batch of the change
    stream into the snapshot at ``state_dir``. Returns the
    StreamingQuery (caller awaits). Read the LIVE snapshot with
    ``read_snapshot`` (filters tombstones and bookkeeping)."""

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        spark = batch_df.sparkSession
        if os.path.exists(os.path.join(state_dir, "_SUCCESS")):
            old = spark.read.parquet(state_dir)
            if "_hwm_batch" in old.columns:
                hwm, hwm_ckpt = old.agg(F.max("_hwm_batch"), F.max("_hwm_ckpt")).first()
                if hwm is not None and hwm_ckpt == checkpoint_dir and batch_id <= hwm:
                    return  # replayed batch: already merged
                old = old.drop("_hwm_batch", "_hwm_ckpt")
            merged = apply_changes(
                old, batch_df, key_cols, seq_col,
                op_col=op_col, delete_op=delete_op, keep_deletes=True,
            )
        else:
            merged = apply_changes(
                batch_df.limit(0), batch_df, key_cols, seq_col,
                op_col=op_col, delete_op=delete_op, keep_deletes=True,
            )
        merged = merged.withColumn("_hwm_batch", F.lit(batch_id).cast("long")).withColumn(
            "_hwm_ckpt", F.lit(checkpoint_dir)
        )
        merged.localCheckpoint(eager=True).coalesce(1).write.mode("overwrite").parquet(
            state_dir
        )

    writer = (
        changes.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_snapshot(spark, state_dir: str, op_col: str = "op", delete_op: str = "D") -> DataFrame:
    """The live snapshot: tombstones and bookkeeping columns removed."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(state_dir)
    return df.filter(F.col(op_col) != F.lit(delete_op)).drop("_hwm_batch", "_hwm_ckpt")
