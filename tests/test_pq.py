"""Product quantization (operators/similarity.py pq_train/pq_encode/pq_topk):
integer-exact encode + ADC scoring vs a per-row numpy replica."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sycamore_spark.operators.similarity import pq_encode, pq_topk, pq_train


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.RandomState(3)
    X = rng.rand(60, 16).astype("float32")
    return spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(60)],
        "vec_id bigint, embedding array<float>",
    ), X


def ref_encode(x, books, scale=1024.0):
    xq = np.floor(np.asarray(x, dtype=float) * scale + 0.5).astype(np.int64)
    sub = len(books[0][0])
    codes = []
    for s, b in enumerate(books):
        B = np.array(b, dtype=np.int64)
        d2 = ((B - xq[s * sub:(s + 1) * sub]) ** 2).sum(axis=1)
        codes.append(int(d2.argmin()))
    return codes


def test_pq_encode_matches_replica(vec_df):
    df, X = vec_df
    books = pq_train(df, m=4, subk=8, seed=5)
    assert len(books) == 4 and len(books[0]) == 8 and len(books[0][0]) == 4
    got = {r.vec_id: list(r.pq_codes) for r in pq_encode(df, books).collect()}
    for i in range(60):
        assert got[i] == ref_encode(X[i], books)


def test_pq_topk_is_exact_adc(vec_df):
    df, X = vec_df
    books = pq_train(df, m=4, subk=8, seed=5)
    enc = pq_encode(df, books)
    q = X[0]
    top = pq_topk(q, enc, books, k=5).collect()
    # replica: LUT + code-sum per row, ties by id
    qq = np.floor(np.asarray(q, dtype=float) * 1024.0 + 0.5).astype(np.int64)
    sub = 4
    luts = []
    for s, b in enumerate(books):
        B = np.array(b, dtype=np.int64)
        luts.append(((B - qq[s * sub:(s + 1) * sub]) ** 2).sum(axis=1))
    scores = {}
    for i in range(60):
        codes = ref_encode(X[i], books)
        scores[i] = int(sum(luts[s][c] for s, c in enumerate(codes)))
    want = sorted(scores, key=lambda i: (scores[i], i))[:5]
    assert [r.vec_id for r in top] == want
    assert [r.adc_dist for r in top] == [scores[i] for i in want]
    # the query's own row has ADC distance == quantization error, ranked first
    assert top[0].vec_id == 0 or scores[0] > top[0].adc_dist - 1


def test_pq_dim_guard(vec_df):
    df, _ = vec_df
    with pytest.raises(ValueError):
        pq_train(df, m=5)
