"""Z-order layout (operators/layout.py): Morton key correctness and the
span-localization property that makes min/max pruning work."""

from pyspark.sql import functions as F

from sycamore_spark.operators.layout import cluster_by_zorder, quantile_bucket, zorder_key


def _morton2(a: int, b: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_reference_interleave(spark):
    df = spark.createDataFrame(
        [(a, b) for a in (0, 1, 5, 130, 255) for b in (0, 3, 77, 254)], "a long, b long"
    )
    got = df.select("a", "b", zorder_key(["a", "b"], bits=8).alias("z")).collect()
    for r in got:
        assert r.z == _morton2(r.a, r.b)


def test_zorder_key_rejects_overflow(spark):
    import pytest

    with pytest.raises(ValueError):
        zorder_key(["a", "b"], bits=32)


def test_cluster_by_zorder_localizes_both_dimensions(spark):
    # 64x64 uniform grid -> 16 partitions; a z-range of 1/16 of the curve
    # is a sub-square spanning ~1/4 of EACH dimension. A single-column sort
    # would localize one dimension and leave the other spanning ~full range.
    df = spark.createDataFrame(
        [(x, y) for x in range(64) for y in range(64)], "x long, y long"
    )
    out = cluster_by_zorder(df, ["x", "y"], bits=6, n_partitions=16)
    spans = (
        out.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    nonempty = [r for r in spans if r.n > 0]
    assert len(nonempty) >= 8
    # every partition bounds BOTH dims well below the global span of 63
    assert max(r.sx for r in nonempty) <= 32
    assert max(r.sy for r in nonempty) <= 32


def test_quantile_bucket_equi_depth_on_skew(spark):
    # heavily skewed values: bucket ids must still be ~equi-depth
    df = spark.range(4096).selectExpr("cast(id * id AS double) AS v")
    out = df.select(quantile_bucket(df, "v", bits=3).alias("bkt"))
    counts = [r.n for r in out.groupBy("bkt").agg(F.count("*").alias("n")).collect()]
    assert len(counts) == 8 and max(counts) == min(counts) == 512


def test_zorder_key_exact_above_2_53(spark):
    # float-division bit extraction silently corrupts keys >= 2^53; the
    # shiftright formulation must reproduce the exact Python interleave
    from sycamore_spark.operators.layout import zorder_key

    big = (1 << 60) + 12345  # needs exact integer arithmetic
    df = spark.createDataFrame([(big,)], ["a"])
    got = df.select(zorder_key(["a"], bits=63).alias("z")).first()["z"]
    expect = sum(((big >> i) & 1) << i for i in range(63))
    assert got == expect == big & ((1 << 63) - 1)
