"""brute_force_topk driver-collect guard (operators/similarity.py).

The query side is collected to the driver by contract; the max_queries
guard must raise BEFORE the collect on oversized query sets, and the
normal path must stay exact."""

import pytest

from sycamore_spark.operators.similarity import brute_force_topk


def _frame(spark, n, dim=4):
    return spark.createDataFrame(
        [(i, [float(i + j) for j in range(dim)]) for i in range(n)],
        ["vec_id", "embedding"],
    )


def test_guard_fires_on_oversized_query_set(spark):
    q = _frame(spark, 12)
    c = _frame(spark, 5)
    with pytest.raises(ValueError, match="max_queries"):
        brute_force_topk(q, c, k=2, max_queries=10)


def test_within_cap_still_exact(spark):
    q = spark.createDataFrame([(0, [1.0, 0.0])], ["vec_id", "embedding"])
    c = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])], ["vec_id", "embedding"]
    )
    rows = brute_force_topk(q, c, k=2, max_queries=10).collect()
    assert [r.neighbor_id for r in rows] == [1, 3]
