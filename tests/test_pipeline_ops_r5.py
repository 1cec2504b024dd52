"""Round-5 operator batch: CDC merge, triangle count, robust scaling,
curriculum ordering, rolling active users, containment near-dup,
Misra-Gries heavy hitters, MMR diversification."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_apply_changes_latest_wins_and_deletes(spark):
    from sycamore_spark.operators.cdc import apply_changes

    base = spark.createDataFrame(
        [(1, "v1", -1, "U"), (2, "v2", -1, "U"), (3, "v3", -1, "U")],
        "k long, v string, seq long, op string",
    )
    changes = spark.createDataFrame(
        [(1, "v1b", 10, "U"), (1, "v1c", 20, "U"),   # two updates: latest wins
         (2, None, 15, "D"),                          # delete key 2
         (4, "v4", 5, "U")],                          # insert new key
        "k long, v string, seq long, op string",
    )
    out = {r.k: r.v for r in apply_changes(base, changes, ["k"], "seq").collect()}
    assert out == {1: "v1c", 3: "v3", 4: "v4"}


def test_apply_changes_delete_then_reinsert(spark):
    from sycamore_spark.operators.cdc import apply_changes

    base = spark.createDataFrame([(1, "a", -1, "U")], "k long, v string, seq long, op string")
    changes = spark.createDataFrame(
        [(1, None, 5, "D"), (1, "back", 9, "U")], "k long, v string, seq long, op string"
    )
    out = {r.k: r.v for r in apply_changes(base, changes, ["k"], "seq").collect()}
    assert out == {1: "back"}


def test_scd2_history_versions(spark):
    from sycamore_spark.operators.cdc import scd2_history

    changes = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 20), (1, "c", 30), (2, "x", 5)],
        "k long, v string, seq long",
    )
    rows = {(r.k, r.seq): r for r in scd2_history(changes, ["k"], "seq").collect()}
    assert rows[(1, 10)].valid_to_seq == 20 and rows[(1, 10)].is_current == 0
    assert rows[(1, 20)].valid_to_seq == 30
    assert rows[(1, 30)].valid_to_seq is None and rows[(1, 30)].is_current == 1
    assert rows[(2, 5)].is_current == 1


def test_triangle_count(spark):
    from sycamore_spark.operators.graph import triangle_count

    # K4 has 4 triangles; edges given in mixed orientation + a duplicate
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (1, 4), (2, 3), (4, 2), (3, 4), (5, 6)],
        ["src", "dst"],
    )
    assert triangle_count(edges).first()["n_triangles"] == 4


def test_robust_scale_median_iqr(spark):
    from sycamore_spark.operators.profiling import robust_scale

    # values 0..8: median 4, q25 2, q75 6 -> IQR 4; v=8 -> (8-4)/4 = 1.0
    df = spark.createDataFrame([(float(i), "g") for i in range(9)], "v double, g string")
    out = {r.v: r.scaled_micros for r in robust_scale(df, "v", ["g"]).collect()}
    assert out[8.0] == 1_000_000 and out[4.0] == 0 and out[0.0] == -1_000_000


def test_robust_scale_zero_iqr_null(spark):
    from sycamore_spark.operators.profiling import robust_scale

    df = spark.createDataFrame([(5.0,)] * 6, "v double")
    assert all(r.scaled_micros is None for r in robust_scale(df, "v").collect())


def test_curriculum_order_interleaves_tiers(spark):
    from sycamore_spark.operators.sampling import curriculum_order

    df = spark.createDataFrame([(i, float(i)) for i in range(12)], "doc_id long, score double")
    out = curriculum_order(df, "score", n_buckets=3)
    by_rank = [r.doc_id for r in out.orderBy("curriculum_rank").collect()]
    # tiers of 4: [0..3], [4..7], [8..11]; rank order walks pos-major
    assert by_rank == [0, 4, 8, 1, 5, 9, 2, 6, 10, 3, 7, 11]
    # every consecutive window of 3 sees all three tiers
    for w in range(0, 12, 3):
        assert {d // 4 for d in by_rank[w:w + 3]} == {0, 1, 2}


def test_active_users_windows(spark):
    from sycamore_spark.operators.events import active_users

    rows = [
        (1, "2024-01-01 10:00:00"), (2, "2024-01-01 11:00:00"),
        (1, "2024-01-02 09:00:00"),
        (3, "2024-01-08 09:00:00"),  # day 8: user 2 (jan 1) outside 7d window
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = {r.day: (r.au_1, r.au_7) for r in active_users(df, windows=(1, 7)).collect()}
    assert out["2024-01-01"] == (2, 2)
    assert out["2024-01-02"] == (1, 2)
    # jan 8: dau = {3}; trailing 7d = jan 2..8 -> users {1, 3}
    assert out["2024-01-08"] == (1, 2)
    assert "2024-01-05" not in out  # no activity -> no row


def test_containment_asymmetric(spark):
    from sycamore_spark.operators.dedup import containment_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),  # contains 1
            (3, "iota kappa"),
        ],
        ["doc_id", "text"],
    )
    out = {(r.id_a, r.id_b): r.containment for r in
           containment_pairs(docs, "doc_id", "text", threshold=0.9).collect()}
    assert out == {(1, 2): 1.0}  # 1 in 2, but NOT 2 in 1 (3/8 < 0.9)


def test_frequent_tokens_exact_above_threshold(spark):
    from sycamore_spark.operators.sketches import frequent_tokens

    # 60 'hot', 30 'warm', 10 singletons -> n=100; k=5 -> keep cnt > 20
    text = " ".join(["hot"] * 60 + ["warm"] * 30 + [f"rare{i}" for i in range(10)])
    df = spark.createDataFrame([(text[: len(text) // 2],), (text[len(text) // 2:],)], ["text"])
    n = df.select(F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))).count()
    got = {r.token: r.cnt for r in frequent_tokens(df, "text", k=5).collect()}
    exact = {"hot": 60, "warm": 30}  # counts may differ by the split point
    for tok, cnt in got.items():
        assert cnt * 5 > n
    assert set(got) == {t for t, c in exact.items() if c * 5 > n} or "hot" in got


def test_frequent_tokens_partitioning_independent(spark):
    from sycamore_spark.operators.sketches import frequent_tokens

    rows = [(f"common word{i % 37}",) for i in range(500)]
    df = spark.createDataFrame(rows, ["text"])
    a = sorted(map(tuple, frequent_tokens(df.repartition(2), "text", k=10).collect()))
    b = sorted(map(tuple, frequent_tokens(df.repartition(16), "text", k=10).collect()))
    assert a == b
    assert ("common", 500) in a


def test_mmr_prefers_diverse_over_redundant(spark):
    from sycamore_spark.operators.similarity import mmr_rerank

    # candidates: two near-identical high-relevance vectors + one distinct
    cands = spark.createDataFrame(
        [
            ("q", 1, 1_000_000, [1.0, 0.0]),
            ("q", 2, 990_000, [1.0, 0.01]),   # redundant with 1
            ("q", 3, 800_000, [0.0, 1.0]),    # diverse
        ],
        ["query_id", "doc_id", "rel_micros", "embedding"],
    )
    out = [r.doc_id for r in
           mmr_rerank(cands, k=3, lambda_pct=50).orderBy("mmr_rank").collect()]
    assert out[0] == 1          # pure relevance first
    assert out[1] == 3          # diversity beats the redundant #2
    assert out[2] == 2


def test_mmr_deterministic_ties_by_id(spark):
    from sycamore_spark.operators.similarity import mmr_rerank

    cands = spark.createDataFrame(
        [("q", i, 500_000, [1.0, 0.0]) for i in (5, 3, 9)],
        ["query_id", "doc_id", "rel_micros", "embedding"],
    )
    out = [r.doc_id for r in mmr_rerank(cands, k=3).orderBy("mmr_rank").collect()]
    assert out == [3, 5, 9]


def test_containment_lsh_matches_exact(spark):
    """The size-stratified LSH route must reproduce the exact baseline on
    a corpus with asymmetric sizes (ratio up to ~5, inside the default
    max_gap envelope), template noise, and both directions tested."""
    import random

    from sycamore_spark.operators.dedup import containment_lsh_pairs, containment_pairs

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(400)]
    rows = []
    # 10 template clusters: one big doc, one contained subset (~ratio 3-5),
    # one near-miss (half overlap)
    for c in range(10):
        big = rng.sample(vocab, 60)
        small = big[: rng.randint(12, 20)]
        miss = big[:30] + rng.sample(vocab, 30)
        rows += [
            (c * 10 + 1, " ".join(big)),
            (c * 10 + 2, " ".join(small)),
            (c * 10 + 3, " ".join(miss)),
        ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    exact = {tuple(r) for r in containment_pairs(docs, "doc_id", "text", 0.95).collect()}
    lsh = {tuple(r) for r in containment_lsh_pairs(docs, "doc_id", "text", 0.95).collect()}
    assert lsh == exact
    assert len(exact) >= 10  # every cluster's (small -> big) pair is found
