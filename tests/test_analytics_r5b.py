"""Round-5 batch 2: OLS trend, seasonal residuals, join-size estimation,
vocab coverage, HLL trailing active users."""

from pyspark.sql import functions as F


def test_trend_fit_exact_line(spark):
    from sycamore_spark.operators.timeseries import trend_fit

    # y = 2x + 3 exactly -> slope 2.0, intercept 3.0
    df = spark.createDataFrame([(x, 2.0 * x + 3.0, "g") for x in range(10)],
                               "x long, y double, g string")
    r = trend_fit(df, "x", "y", ["g"]).first()
    assert r.n == 10 and r.slope_micros == 2_000_000 and r.intercept_micros == 3_000_000


def test_trend_fit_constant_x_null(spark):
    from sycamore_spark.operators.timeseries import trend_fit

    df = spark.createDataFrame([(5, 1.0), (5, 2.0)], "x long, y double")
    r = trend_fit(df, "x", "y").first()
    assert r.slope_micros is None and r.intercept_micros is None


def test_seasonal_residuals_same_hour_yesterday(spark):
    from sycamore_spark.operators.timeseries import seasonal_residuals

    rows = [
        ("2024-01-01 09:30:00", 10.0), ("2024-01-01 09:45:00", 20.0),  # mean 15
        ("2024-01-02 09:10:00", 40.0),                                  # resid 40-15=25
        ("2024-01-02 11:00:00", 7.0),                                   # no prior season
    ]
    df = spark.createDataFrame(rows, "ts string, value double").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = {r.bucket: r for r in seasonal_residuals(df, "ts", "value").collect()}
    by_resid = [r.resid_micros for r in out.values()]
    assert 25_000_000 in by_resid
    assert sum(1 for r in by_resid if r is None) == 2  # day-1 bucket + 11:00 bucket


def test_seasonal_residuals_skips_gaps(spark):
    # a lag() would wrongly pair day-3 with day-1 when day-2 is missing;
    # the join yields NULL instead
    from sycamore_spark.operators.timeseries import seasonal_residuals

    rows = [("2024-01-01 09:00:00", 10.0), ("2024-01-03 09:00:00", 99.0)]
    df = spark.createDataFrame(rows, "ts string, value double").withColumn(
        "ts", F.to_timestamp("ts")
    )
    assert all(r.resid_micros is None for r in seasonal_residuals(df, "ts", "value").collect())


def test_join_size_estimate_matches_real_join(spark):
    from sycamore_spark.operators.profiling import join_size_estimate

    a = spark.createDataFrame([(k,) for k in [1, 1, 1, 2, 3]], "k long")
    b = spark.createDataFrame([(k,) for k in [1, 1, 2, 4]], "k long")
    r = join_size_estimate(a, b, ["k"]).first()
    real = a.join(b, "k").count()
    assert r.rows_out == real == 7
    assert r.matched_keys == 2 and r.max_key_rows == 6


def test_vocab_coverage_oov_fraction(spark):
    from sycamore_spark.operators.textstats import vocab_coverage

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "zorp blee the")], ["doc_id", "text"]
    )
    vocab = spark.createDataFrame([("the",), ("cat",), ("sat",)], ["token"])
    out = {r.doc_id: r for r in vocab_coverage(docs, vocab).collect()}
    assert out[1].n_oov == 0 and out[1].oov_frac == 0.0
    assert out[2].n_tokens == 3 and out[2].n_oov == 2
    assert abs(out[2].oov_frac - 0.666667) < 1e-9


def test_hll_active_users_tracks_exact(spark):
    from sycamore_spark.operators.events import active_users
    from sycamore_spark.operators.sketches import approx_active_users_hll

    rows = [(u, f"2024-01-{1 + (u * 7 + d) % 9:02d} 10:00:00")
            for u in range(200) for d in range(3)]
    df = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    exact = {r.day: (r.au_1, r.au_7) for r in active_users(df, windows=(1, 7)).collect()}
    approx = {r.day: (r.approx_au_1, r.approx_au_7)
              for r in approx_active_users_hll(df, windows=(1, 7)).collect()}
    assert set(exact) == set(approx)
    for day, (e1, e7) in exact.items():
        a1, a7 = approx[day]
        assert abs(a1 - e1) <= max(3, 0.05 * e1)
        assert abs(a7 - e7) <= max(3, 0.05 * e7)


def test_pmi_collocations_finds_fixed_phrase(spark):
    from sycamore_spark.operators.textstats import pmi_collocations

    # "new york" always adjacent; filler words shuffled independently
    import random

    rng = random.Random(2)
    filler = ["the", "a", "of", "to", "in"]
    docs = []
    for i in range(40):
        words = []
        for _ in range(10):
            words.extend(["new", "york"] if rng.random() < 0.3
                         else [rng.choice(filler)])
        docs.append((i, " ".join(words)))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = pmi_collocations(df, min_count=5, top_k=5).collect()
    assert (out[0].w1, out[0].w2) == ("new", "york")
    assert out[0].pmi_micros > 0


def test_kcore_peels_tendrils(spark):
    from sycamore_spark.operators.graph import kcore

    # K4 core {1,2,3,4} + a chain 4-5-6 that must peel away at k=2
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = {r.node: r.degree for r in kcore(df, k=2).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_order_independent(spark):
    import itertools
    import random

    from sycamore_spark.operators.graph import kcore

    rng = random.Random(5)
    edges = list({(rng.randint(0, 19), rng.randint(0, 19)) for _ in range(60)})
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node for r in kcore(df, k=3, rounds=12).collect()}
    # brute-force fixpoint
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = {n for e in und for n in e}
    while True:
        deg = {n: sum(1 for e in und if n in e) for n in nodes}
        drop = {n for n in nodes if deg[n] < 3}
        if not drop:
            break
        nodes -= drop
        und = {e for e in und if e[0] in nodes and e[1] in nodes}
    assert got == nodes


def test_csv_orc_roundtrip(spark, tmp_path):
    import sycamore_spark as ss
    from sycamore_spark.docset import DocSet

    df = spark.createDataFrame(
        [(1, "hello world", 11), (2, "spark, \"quoted\"", 15)],
        "doc_id long, text string, n bigint",
    )
    ds = DocSet(df)
    ds.write.csv(f"{tmp_path}/c")
    ds.write.orc(f"{tmp_path}/o")
    back_csv = ss.read(spark).csv(f"{tmp_path}/c", schema=df.schema).to_df()
    back_orc = ss.read(spark).orc(f"{tmp_path}/o").to_df()
    want = sorted(map(tuple, df.collect()))
    assert sorted(map(tuple, back_csv.collect())) == want
    assert sorted(map(tuple, back_orc.collect())) == want


def test_semantic_chunk_splits_on_topic_shift(spark):
    from sycamore_spark.operators.standardize import semantic_chunk

    topic_a = " ".join(["alpha beta gamma delta"] * 16)   # 64 tokens: blocks 0,1
    topic_b = " ".join(["omega psi chi phi"] * 16)        # 64 tokens: blocks 2,3
    df = spark.createDataFrame([(1, topic_a + " " + topic_b)], ["doc_id", "text"])
    out = {r.block: r for r in semantic_chunk(df, block_tokens=32).collect()}
    assert len(out) == 4
    assert out[0].chunk_id == out[1].chunk_id          # same topic -> same chunk
    assert out[2].chunk_id == out[1].chunk_id + 1      # boundary at topic shift
    assert out[3].chunk_id == out[2].chunk_id
    assert out[1].cos_prev_micros == 1_000_000         # identical blocks
    assert out[2].cos_prev_micros < 600_000            # disjoint vocab


def test_semantic_chunk_single_block_doc(spark):
    from sycamore_spark.operators.standardize import semantic_chunk

    df = spark.createDataFrame([(1, "just a few words here")], ["doc_id", "text"])
    rows = semantic_chunk(df, block_tokens=32).collect()
    assert len(rows) == 1 and rows[0].chunk_id == 0 and rows[0].cos_prev_micros is None
