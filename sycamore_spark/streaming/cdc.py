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

Scale design (the 100 TB path): the snapshot is laid out as
``n_buckets`` key-hash partitions (``_bucket = pmod(xxhash64(keys),
n)``).  Each micro-batch computes the set of buckets its keys touch
(bounded collect: at most ``n_buckets`` rows), reads ONLY those buckets
back (partition pruning on the ``_bucket`` directory column), merges the
batch into them, and rewrites ONLY those buckets via dynamic partition
overwrite.  Work per batch is proportional to the touched slice of the
snapshot, not the whole table — the parquet-native analogue of a
transactional MERGE INTO (Delta/Iceberg), which is the drop-in upgrade
at cluster scale.

All state-dir probes and the high-water-mark sidecar go through the
Hadoop FS API (``materialize._fs_exists`` etc.), so ``hdfs://`` /
``s3a://`` / ``file://`` state dirs behave identically to local paths —
a driver-local ``os.path`` probe would silently take the no-prior-state
branch on every batch for URI schemes and discard the snapshot.

Restart safety: a checkpoint-scoped high-water mark in the ``_hwm``
sidecar (written AFTER the state commit) — a replayed batch (state write
committed, checkpoint commit lost) is skipped; and because latest-wins
merge of an already-folded batch is content-idempotent, even the
crash-between-state-and-hwm window re-merges to the identical snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sycamore_spark.materialize import _fs_exists, _fs_read_text, _fs_write_text
from sycamore_spark.operators.cdc import apply_changes

_BUCKET = "_bucket"


def _bucket_expr(key_cols: list[str], n_buckets: int):
    return F.pmod(F.xxhash64(*key_cols), F.lit(n_buckets)).cast("int")


def _read_hwm(spark, state_dir: str) -> tuple[str, int] | None:
    path = state_dir.rstrip("/") + "/_hwm"
    if not _fs_exists(spark, path):
        return None
    ckpt, _, bid = _fs_read_text(spark, path).rpartition("\n")
    return ckpt, int(bid)


def maintain_snapshot_stream(
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
    state_dir: str,
    checkpoint_dir: str,
    op_col: str = "op",
    delete_op: str = "D",
    available_now: bool = True,
    n_buckets: int = 16,
):
    """Start a foreachBatch query folding each micro-batch of the change
    stream into the bucketed snapshot at ``state_dir``. Returns the
    StreamingQuery (caller awaits). Read the LIVE snapshot with
    ``read_snapshot`` (filters tombstones and bookkeeping).

    ``n_buckets`` fixes the snapshot's key-hash layout; every batch
    touches (reads + rewrites) only the buckets containing its keys.
    Size it so one bucket fits an executor comfortably at the target
    scale; it must stay constant for the lifetime of ``state_dir``."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.withColumn(_BUCKET, _bucket_expr(key_cols, n_buckets))
        # bounded collect: at most n_buckets rows
        touched = [r[0] for r in batch_df.select(_BUCKET).distinct().collect()]
        if not touched:
            return  # empty batch: nothing to merge, HWM unchanged is fine
        # the _hwm sidecar (written after each state commit) is the
        # prior-state marker: dynamic partition overwrite does NOT write a
        # root _SUCCESS file, so probing _SUCCESS would silently take the
        # no-prior-state branch on every batch after the first
        hwm = _read_hwm(spark, state_dir)
        if hwm is not None:
            if hwm[0] == checkpoint_dir and batch_id <= hwm[1]:
                return  # replayed batch: already merged
            old = spark.read.parquet(state_dir).filter(F.col(_BUCKET).isin(touched))
            merged = apply_changes(
                old, batch_df, key_cols, seq_col,
                op_col=op_col, delete_op=delete_op, keep_deletes=True,
            )
        else:
            merged = apply_changes(
                batch_df.limit(0), batch_df, key_cols, seq_col,
                op_col=op_col, delete_op=delete_op, keep_deletes=True,
            )
        # cut lineage first: the dynamic overwrite below replaces the very
        # bucket files the merged plan reads
        (
            merged.localCheckpoint(eager=True)
            .repartition(len(touched), _BUCKET)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(_BUCKET)
            .parquet(state_dir)
        )
        _fs_write_text(
            spark, state_dir.rstrip("/") + "/_hwm", f"{checkpoint_dir}\n{batch_id}"
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
    df = spark.read.parquet(state_dir)
    return df.filter(F.col(op_col) != F.lit(delete_op)).drop(
        _BUCKET, "_hwm_batch", "_hwm_ckpt"
    )
