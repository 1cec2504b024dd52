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
and atomically overwrites. Restart safety: the state carries a
``_hwm_batch`` high-water mark (the last folded batch id); a fold with
``batch_id <= _hwm_batch`` is a replay — Structured Streaming re-runs a
batch whose state overwrite committed but whose checkpoint commit didn't
— and is skipped, making the fold idempotent (exactly-once state) by
default. At cluster scale the same pattern targets a transactional table
(Delta/Iceberg MERGE) instead of parquet overwrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from sycamore_spark.materialize import _fs_exists
from sycamore_spark.operators.incremental import corpus_stats, merge_stats


def maintain_stats_stream(
    stream: DataFrame,
    group_cols: list[str],
    value_col: str,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    n_state_partitions: int = 1,
):
    """Start a foreachBatch query folding each micro-batch's additive
    stats state into ``state_dir``. Returns the StreamingQuery (caller
    awaits). Read the final state with ``spark.read.parquet(state_dir)``
    and derive mean/stddev via ``finalize_stats``."""

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        spark = batch_df.sparkSession
        # Hadoop-FS probe: works for hdfs:// / s3a:// / file:// state dirs,
        # where a driver-local os.path check is always False and would make
        # every batch overwrite the state with its own contribution alone
        if _fs_exists(spark, state_dir.rstrip("/") + "/_SUCCESS"):
            old = spark.read.parquet(state_dir)
            if "_hwm_batch" in old.columns:
                hwm, hwm_ckpt = old.agg(
                    F.max("_hwm_batch"), F.max("_hwm_ckpt")
                ).first()
                # batch ids are only monotonic WITHIN one checkpoint
                # lineage — a different checkpoint dir restarts at 0 and
                # must fold, so the mark is scoped to the checkpoint
                if hwm is not None and hwm_ckpt == checkpoint_dir and batch_id <= hwm:
                    return  # replayed batch: contribution already folded
                old = old.drop("_hwm_batch", "_hwm_ckpt")
            merged = merge_stats(old, corpus_stats(batch_df, group_cols, value_col), group_cols)
        else:
            merged = corpus_stats(batch_df, group_cols, value_col)
        merged = merged.withColumn("_hwm_batch", F.lit(batch_id).cast("long")).withColumn(
            "_hwm_ckpt", F.lit(checkpoint_dir)
        )
        # eager checkpoint: the write below overwrites the very files the
        # merged plan reads, so cut lineage first (state is one row per
        # group — n_state_partitions > 1 only matters for very wide group
        # domains, where a single-task write would bottleneck)
        merged.localCheckpoint(eager=True).repartition(n_state_partitions).write.mode(
            "overwrite"
        ).parquet(state_dir)

    writer = (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
