"""fan_out parallelism repair (functions/partitioning.py)."""

from sycamore_spark.functions.partitioning import fan_out


def test_fan_out_widens_narrow_input(spark):
    df = spark.range(1000).coalesce(1)
    out = fan_out(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert out.count() == 1000


def test_fan_out_noop_on_wide_input(spark):
    wide = spark.range(1000).repartition(spark.sparkContext.defaultParallelism + 4)
    assert fan_out(wide) is wide  # no extra shuffle inserted


def test_fan_out_explicit_target(spark):
    df = spark.range(100).coalesce(1)
    assert fan_out(df, min_partitions=7).rdd.getNumPartitions() == 7


def test_distributed_rank_matches_global_row_number(spark):
    """The two-pass range-partitioned rank equals the single-task global
    row_number on a strict total order, independent of input partitioning."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from sycamore_spark.functions.partitioning import distributed_rank

    df = spark.range(0, 997).select(
        F.col("id"), ((F.col("id") * 131) % 97).alias("v")
    )
    order = [F.col("v").desc(), F.col("id").asc()]
    expect = {
        r.id: r.rk
        for r in df.withColumn("rk", F.row_number().over(Window.orderBy(*order))).collect()
    }
    for parts in (1, 7, 64):
        got = {
            r.id: r._rank
            for r in distributed_rank(df.repartition(parts), order).collect()
        }
        assert got == expect


def test_distributed_cumsum_matches_global_window(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from sycamore_spark.functions.partitioning import distributed_cumsum

    df = spark.range(0, 500).select(
        F.col("id"), ((F.col("id") * 7) % 23 + 1).alias("v")
    )
    w = Window.orderBy(F.col("id").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    expect = {r.id: r.c for r in df.withColumn("c", F.sum("v").over(w)).collect()}
    for parts in (1, 9, 64):
        got = {
            r.id: r._cumsum
            for r in distributed_cumsum(
                df.repartition(parts), [F.col("id").asc()], "v"
            ).collect()
        }
        assert got == expect


def test_distributed_rank_consistent_with_exchange_reuse_off(spark):
    """The ranged frame feeds two consumers; with exchange reuse disabled
    each branch would otherwise re-sample range boundaries independently
    and ranks could silently disagree. The lazy lineage cut pins both to
    one RDD (ADVICE r12)."""
    from pyspark.sql import functions as F

    from sycamore_spark.functions.partitioning import (
        distributed_cumsum,
        distributed_rank,
    )

    old = spark.conf.get("spark.sql.exchange.reuse", "true")
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try:
        df = spark.range(5000).select(
            F.col("id"), (F.col("id") * 37 % 5000).alias("k")
        ).repartition(13)
        ranks = distributed_rank(df, [F.col("k").asc(), F.col("id").asc()])
        got = {r.k: r._rank for r in ranks.collect()}
        assert sorted(got.values()) == list(range(1, 5001))
        # strict order on k (a permutation) -> rank == k+1
        assert all(got[k] == k + 1 for k in list(got)[:100])
        sums = distributed_cumsum(
            df.withColumn("v", F.lit(2)), [F.col("k").asc(), F.col("id").asc()], "v"
        )
        s = {r.k: r._cumsum for r in sums.collect()}
        assert all(s[k] == 2 * (k + 1) for k in list(s)[:100])
    finally:
        spark.conf.set("spark.sql.exchange.reuse", old)
