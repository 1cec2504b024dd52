"""Parallelism repair for Python-heavy stages.

Catalyst sizes scan partitions for JVM throughput
(``spark.sql.files.maxPartitionBytes`` = 128 MB), which is correct for
codegen'd expressions but wrong for Arrow/pandas stages whose per-row cost
is dominated by Python: a 5 MB single-row-group parquet file loads as ONE
partition, so a per-doc pandas UDF runs on one core while 31 idle. At
cluster scale the input is thousands of files and this never bites; on a
laptop or a small extract it silently serializes the slowest stages (this
repo's table_ted bench query spent 2.1 s of its 2.4 s in exactly this
trap).

``fan_out`` widens ONLY when the input is narrower than the session's
parallelism — a no-op on well-partitioned cluster inputs, so operators can
apply it unconditionally before expensive Python stages. It uses
round-robin ``repartition(n)`` (not coalesce, which cannot widen; not
``rebalance``, which is AQE-hint-only) — one narrow-ish shuffle of rows
that are about to each cost milliseconds of Python anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to the session's default parallelism (or
    ``min_partitions``) if and only if it currently has fewer partitions.
    Cheap insurance before a per-row Python stage; no-op at cluster scale."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def lineage_cut(df: DataFrame, checkpoint_dir: str | None = None, eager: bool = True) -> DataFrame:
    """Truncate ``df``'s lineage at an iteration boundary.

    Iterative operators (label propagation, PageRank) grow their logical
    plan every round; without a cut, planning cost grows quadratically and
    the DAG eventually overflows. Two cuts exist with different durability:

    - ``checkpoint_dir is None`` -> ``localCheckpoint``: blocks are kept in
      executor storage. Fast (no FS write) but VOLATILE — on a real cluster
      an executor loss mid-propagation recomputes from a truncated lineage
      that no longer exists, failing the job. Right for local mode and
      tests only.
    - ``checkpoint_dir`` set -> durable ``checkpoint()`` to that directory
      (HDFS/S3A/local path; ``sparkContext.setCheckpointDir`` is applied
      idempotently). Survives executor loss — the required mode for long
      iterative jobs on a multi-executor cluster.

    Results are identical either way; only failure-recovery behavior
    differs (unit-tested both paths in ``tests/test_checkpointing.py``).
    """
    if checkpoint_dir is not None:
        sc = df.sparkSession.sparkContext
        sc.setCheckpointDir(checkpoint_dir)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
