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
