"""Streaming quality-filter monitoring.

Continuous ingest keeps per-group quality-filter acceptance counters
current without rescanning history — the ops dashboard for a training-data
intake pipeline ("what fraction of yesterday's crawl passed Gopher rule
X?"). Each micro-batch runs the caller's flag builder (any batch
DataFrame -> boolean-flag frame: ``gopher_filter``, ``c4_clean``, a
composition) and folds the per-group counts into a persisted additive
state via ``foreachBatch`` — the ``streaming/stats.py`` pattern with pure
bigint counter states.

Because the counters are additive, the final state is INDEPENDENT of
micro-batch boundaries: ingesting in 1 batch or 50 yields identical
counts, which is exactly what the oracle gate checks against a full-table
batch recompute. Same restart-safety contract as stats.py: a
``_hwm_batch``/``_hwm_ckpt`` high-water mark makes replayed batches
(state overwrite committed, checkpoint commit lost) no-ops, so the fold
is idempotent. At cluster scale the parquet overwrite becomes a
transactional MERGE (Delta/Iceberg); the state is one row per group
either way.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from sycamore_spark.materialize import _fs_exists


def maintain_quality_stream(
    stream: DataFrame,
    group_cols: list[str],
    flags_builder: Callable[[DataFrame], DataFrame],
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    n_state_partitions: int = 1,
):
    """Start a foreachBatch query folding per-group quality counters into
    ``state_dir``: ``n_docs`` plus one ``n_<flag>`` column per BOOLEAN
    column that ``flags_builder`` emits (non-boolean columns other than
    ``group_cols`` are ignored). Returns the StreamingQuery (caller
    awaits); read the final state with ``spark.read.parquet(state_dir)``."""

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F
        from pyspark.sql.types import BooleanType

        spark = batch_df.sparkSession
        flags = flags_builder(batch_df)
        flag_cols = [
            f.name
            for f in flags.schema.fields
            if isinstance(f.dataType, BooleanType) and f.name not in group_cols
        ]
        contrib = flags.groupBy(*group_cols).agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            *[
                F.sum(F.col(c).cast("long")).cast("long").alias(f"n_{c}")
                for c in flag_cols
            ],
        )
        counters = ["n_docs"] + [f"n_{c}" for c in flag_cols]
        if _fs_exists(spark, state_dir.rstrip("/") + "/_SUCCESS"):
            old = spark.read.parquet(state_dir)
            if "_hwm_batch" in old.columns:
                hwm, hwm_ckpt = old.agg(
                    F.max("_hwm_batch"), F.max("_hwm_ckpt")
                ).first()
                if hwm is not None and hwm_ckpt == checkpoint_dir and batch_id <= hwm:
                    return  # replayed batch: contribution already folded
                old = old.drop("_hwm_batch", "_hwm_ckpt")
            merged = (
                old.alias("o")
                .join(contrib.alias("c"), group_cols, "full_outer")
                .select(
                    *[F.col(g) for g in group_cols],
                    *[
                        (
                            F.coalesce(F.col(f"o.{c}"), F.lit(0))
                            + F.coalesce(F.col(f"c.{c}"), F.lit(0))
                        ).cast("long").alias(c)
                        for c in counters
                    ],
                )
            )
        else:
            merged = contrib
        merged = merged.withColumn(
            "_hwm_batch", F.lit(batch_id).cast("long")
        ).withColumn("_hwm_ckpt", F.lit(checkpoint_dir))
        # eager cut: the overwrite below deletes the files the merged plan
        # would re-read (state is one row per group)
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
