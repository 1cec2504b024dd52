"""Seeded randomized cross-checks for the round-5 operators: each compares
the distributed implementation against an independent brute-force Python
computation on small random inputs (the property layer for ops whose
kernels are Spark-bound and so can't run under per-example hypothesis)."""

import itertools
import random

import numpy as np
from pyspark.sql import functions as F


def test_frequent_tokens_matches_exact_counter(spark):
    from collections import Counter

    from sycamore_spark.operators.sketches import frequent_tokens

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(50)]
    # zipf-ish: low ids much more frequent
    stream = [vocab[min(int(rng.expovariate(0.12)), 49)] for _ in range(5000)]
    docs = [" ".join(stream[i:i + 50]) for i in range(0, 5000, 50)]
    df = spark.createDataFrame([(d,) for d in docs], ["text"])
    for k in (5, 20):
        got = {r.token: r.cnt for r in frequent_tokens(df.repartition(7), "text", k=k).collect()}
        exact = Counter(stream)
        expect = {t: c for t, c in exact.items() if c * k > len(stream)}
        assert got == expect


def test_containment_matches_bruteforce(spark):
    from sycamore_spark.operators.dedup import containment_pairs

    rng = random.Random(11)
    vocab = [f"t{i}" for i in range(30)]
    docs = []
    for i in range(25):
        n = rng.randint(2, 12)
        docs.append((i, " ".join(rng.sample(vocab, n))))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    t = 0.7
    got = {(r.id_a, r.id_b) for r in
           containment_pairs(df, "doc_id", "text", threshold=t).collect()}
    sets = {i: set(txt.split()) for i, txt in docs}
    expect = {
        (a, b)
        for a, b in itertools.permutations(sets, 2)
        if len(sets[a] & sets[b]) / len(sets[a]) >= t
    }
    assert got == expect


def test_curriculum_is_interleaved_permutation(spark):
    from sycamore_spark.operators.sampling import curriculum_order

    rng = random.Random(3)
    rows = [(i, float(rng.randint(0, 20))) for i in range(97)]  # dup scores
    df = spark.createDataFrame(rows, "doc_id long, score double")
    out = curriculum_order(df, "score", n_buckets=5).collect()
    ranks = sorted(r.curriculum_rank for r in out)
    assert ranks == list(range(1, 98))  # a permutation
    # recompute tiers independently and check every 5-window hits >=4 tiers
    order = sorted(rows, key=lambda r: (r[1], r[0]))
    tier_of = {}
    n, nb = len(order), 5
    sizes = [(n + nb - 1 - i) // nb for i in range(nb)]  # ntile: early get extras
    idx = 0
    for t, sz in enumerate(sizes):
        for _ in range(sz):
            tier_of[order[idx][0]] = t
            idx += 1
    by_rank = [r.doc_id for r in sorted(out, key=lambda r: r.curriculum_rank)]
    full_windows = len(by_rank) // 5
    for w in range(full_windows - 1):
        tiers = {tier_of[d] for d in by_rank[w * 5:(w + 1) * 5]}
        assert len(tiers) == 5


def test_trend_fit_matches_polyfit(spark):
    from sycamore_spark.operators.timeseries import trend_fit

    rng = np.random.RandomState(5)
    for _ in range(3):
        xs = rng.randint(0, 100, size=40)
        ys = np.round(2.5 * xs + rng.normal(0, 10, size=40), 3)
        df = spark.createDataFrame(
            [(int(x), float(y)) for x, y in zip(xs, ys)], "x long, y double"
        )
        r = trend_fit(df, "x", "y").first()
        slope, intercept = np.polyfit(xs.astype(float), ys, 1)
        assert abs(r.slope_micros / 1e6 - slope) < 1e-3
        assert abs(r.intercept_micros / 1e6 - intercept) < 1e-1


def test_triangle_count_matches_bruteforce(spark):
    from sycamore_spark.operators.graph import triangle_count

    rng = random.Random(13)
    edges = {(rng.randint(0, 14), rng.randint(0, 14)) for _ in range(60)}
    df = spark.createDataFrame(list(edges), ["src", "dst"])
    und = {frozenset(e) for e in edges if e[0] != e[1]}
    adj = {}
    for e in und:
        a, b = sorted(e)
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expect = sum(
        1 for a, b, c in itertools.combinations(sorted(adj), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    assert triangle_count(df).first()["n_triangles"] == expect


def test_mmr_matches_reference_greedy(spark):
    from sycamore_spark.operators.similarity import mmr_rerank

    rng = np.random.RandomState(17)
    rows, vecs = [], {}
    for i in range(12):
        v = rng.randn(6).astype(np.float32)
        vecs[i] = v
        rows.append(("q", i, int(rng.randint(0, 1_000_000)), [float(x) for x in v]))
    df = spark.createDataFrame(rows, ["query_id", "doc_id", "rel_micros", "embedding"])
    got = [r.doc_id for r in mmr_rerank(df, k=5, lambda_pct=60, quantize_scale=1024.0)
           .orderBy("mmr_rank").collect()]

    # independent greedy replay with the same quantization
    M = np.floor(np.vstack([vecs[i] for i in range(12)]).astype(np.float64) * 1024.0 + 0.5)
    G = M @ M.T
    nrm = np.sqrt(np.diag(G))
    sim = np.floor(G / np.outer(nrm, nrm) * 1e6 + 0.5).astype(np.int64)
    rel = {r[1]: r[2] for r in rows}
    sel, avail = [], list(range(12))
    for _ in range(5):
        best, bs = None, None
        for i in avail:
            pen = max((int(sim[i, j]) for j in sel), default=0)
            s = 60 * rel[i] - 40 * pen
            if bs is None or s > bs:
                best, bs = i, s
        sel.append(best)
        avail.remove(best)
    assert got == sel


def test_curriculum_matches_windowed_ntile_spec(spark):
    """The arithmetic-rank implementation must equal the windowed spec
    (ntile tier -> per-tier row_number -> orderBy(pos, tier)) exactly,
    including non-divisible N and N < n_buckets."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from sycamore_spark.operators.sampling import curriculum_order

    rng = random.Random(11)
    for n_rows, nb in ((53, 7), (40, 8), (5, 10), (1, 3)):
        rows = [(i, float(rng.randint(0, 9))) for i in range(n_rows)]
        df = spark.createDataFrame(rows, "doc_id long, score double")
        got = {
            r.doc_id: r.curriculum_rank
            for r in curriculum_order(df, "score", n_buckets=nb).collect()
        }
        order = [F.col("score").asc(), F.col("doc_id").asc()]
        tier = F.ntile(nb).over(Window.orderBy(*order)) - F.lit(1)
        spec = df.withColumn("_tier", tier)
        spec = spec.withColumn(
            "_pos", F.row_number().over(Window.partitionBy("_tier").orderBy(*order)) - F.lit(1)
        ).withColumn(
            "curriculum_rank",
            F.row_number().over(Window.orderBy(F.col("_pos").asc(), F.col("_tier").asc())),
        )
        want = {r.doc_id: r.curriculum_rank for r in spec.collect()}
        assert got == want, (n_rows, nb)
