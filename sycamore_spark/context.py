"""SparkSession construction with scale-aware defaults.

Reference parity: ``sycamore.init()`` builds a ``Context`` holding exec mode +
rewrite rules (reference: lib/sycamore/sycamore/context.py:175). Here the
"context" is a SparkSession tuned for the workload shape this engine runs:
wide scans, shuffle-heavy dedup joins, and Arrow-batched pandas stages.

Settings are chosen for 100 TB-scale behavior, not just local tests:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting) so the
  same plan survives a 1000x scale-up without retuning shuffle.partitions.
- auto broadcast threshold raised: dimension tables (region/nation/supplier)
  stay broadcast even at sf100, eliminating shuffles on the probe side.
- Arrow enabled for every pandas_udf / mapInPandas exchange.
- UTC session timezone so timestamp semantics match naive-UTC parquet data
  (and the DuckDB oracle) everywhere.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def init(
    app_name: str = "sycamore-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with engine defaults.

    In local mode we size shuffle partitions to core count; on a real cluster
    AQE coalesces the (higher) initial partition number down to data size, so
    leaving ``shuffle_partitions`` unset and relying on
    ``spark.sql.adaptive.coalescePartitions`` is the intended production mode.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        # Test data stores TIMESTAMP(NANOS) which Spark's vectorized reader
        # rejects; read as long and convert in the loader (sources/tables.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
