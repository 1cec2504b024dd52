"""End-to-end fluent DocSet pipeline — the reference's canonical ETL chain
(reference examples/bench.py: partition → regex_replace → marks → merge →
spread_properties → split → explode → sketch → embed) through the fluent
delegates, on the canonical doc schema."""

import json

import pytest
from pyspark.sql import functions as F

from sycamore_spark.data.schema import DOC_SCHEMA
from sycamore_spark.docset import DocSet
from sycamore_spark.llm.client import MockLLM
from sycamore_spark.operators.partition import TextPartitioner


@pytest.fixture(scope="module")
def raw_docs(spark):
    texts = [
        "Heading One\n\nthe quick brown fox jumps over the lazy dog. " * 3,
        "Another Doc\n\npack my box with five dozen liquor jugs today. " * 2,
    ]
    rows = [
        {
            "doc_id": f"d{i}",
            "parent_id": None,
            "type": "text",
            "text_representation": t,
            "binary_representation": None,
            "bbox": None,
            "shingles": None,
            "embedding": None,
            "properties": json.dumps({"source": "unit"}),
            "elements": None,
        }
        for i, t in enumerate(texts)
    ]
    return DocSet(spark.createDataFrame(rows, DOC_SCHEMA))


def test_etl_chain(spark, raw_docs):
    out = (
        raw_docs.partition(TextPartitioner())
        .regex_replace([(r"\s+", " ")])
        .merge(strategy="greedy", max_tokens=12)
        .spread_properties(["source"])
        .split_elements(max_tokens=10)
        .explode()
    )
    df = out.to_df()
    children = df.filter(F.col("parent_id").isNotNull())
    assert children.count() > 2
    # children inherited the spread property
    props = json.loads(children.take(1)[0]["properties"])
    assert props.get("source") == "unit"
    # every child respects the split budget
    n_tokens = children.select(F.size(F.split(F.trim("text_representation"), r"\s+")).alias("n"))
    assert n_tokens.agg(F.max("n")).collect()[0][0] <= 10


def test_sketch_embed_rerank(spark, raw_docs):
    ds = (
        raw_docs.augment_text("{doc_id}: {text_representation}")
        .sketch(num_perm=16)
        .embed(dim=16)
    )
    df = ds.to_df()
    assert df.select(F.size("shingles")).take(1)[0][0] == 16
    assert df.select(F.size("embedding")).take(1)[0][0] == 16
    ranked = ds.rerank("quick brown fox", limit=1).to_df().collect()
    assert ranked[0]["doc_id"] == "d0"


def test_llm_delegates(spark, raw_docs):
    out = raw_docs.llm_map(
        "Echo: {{ doc.doc_id }}", "echo", lambda: MockLLM([(r"Echo: (\S+)", lambda m: m.group(1))])
    )
    got = {r["doc_id"]: r["echo"] for r in out.to_df().collect()}
    assert got == {"d0": "d0", "d1": "d1"}


def test_standardize_delegate(spark):
    df = spark.createDataFrame([(1, "from TX with love")], "id long, note string")
    out = DocSet(df).standardize("note", kind="us_state").to_df().collect()
    assert out[0]["note"] == "from Texas with love"


def test_sampling_sketch_delegates(spark):
    df = spark.range(600).selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 3 = 0 THEN 'web' ELSE 'books' END AS source",
        "cast(id % 101 AS double) AS score",
    )
    ds = DocSet(df)
    capped = ds.cap_per_group("source", 50)
    per = {r.source: r.n for r in capped.to_df().groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per == {"web": 50, "books": 50}
    shuffled = ds.corpus_shuffle(4).to_df()
    assert {"shard", "pos"} <= set(shuffled.columns) and shuffled.count() == 600
    est = ds.approx_distinct("doc_id", ["source"]).to_df().collect()
    exact = {r.source: r.n for r in df.groupBy("source").agg(F.countDistinct("doc_id").alias("n")).collect()}
    for r in est:
        assert abs(r.approx_doc_id_distinct - exact[r.source]) <= 0.05 * exact[r.source]
    q = ds.approx_quantiles("score", [0.5], ["source"]).to_df().collect()
    assert all(30 <= r.approx_q5 <= 70 for r in q)
    ov = ds.overlap_with("doc_id", "source", "web", "books").to_df().collect()[0]
    assert ov.approx_intersection <= 10  # disjoint ids


def test_session2b_delegates(spark):
    df = spark.range(200).selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 2 = 0 THEN 'a b c code' ELSE 'x y z prose' END AS text_representation",
        "CASE WHEN id % 2 = 0 THEN 'code' ELSE 'prose' END AS lang",
        "cast(id AS double) AS score",
        "id % 256 AS d1",
        "(id * 7) % 256 AS d2",
    )
    ds = DocSet(df)
    normed = ds.normalize_by_rank("score").to_df()
    assert "pct_rank" in normed.columns
    stats = ds.corpus_stats(["lang"], "score").to_df()
    assert {"n", "sum", "sum_sq", "min", "max"} <= set(stats.columns)
    from sycamore_spark.operators.classify import nb_train
    tm, lm = nb_train(df, "lang", "text_representation")
    pred = ds.classify(tm, lm).to_df()
    assert pred.count() == 200
    z = ds.cluster_zorder(["d1", "d2"], bits=8, n_partitions=4).to_df()
    assert z.count() == 200 and "_z" not in z.columns


def test_session2c_delegates(spark):
    import datetime as dt

    base = dt.datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [(i, base + dt.timedelta(minutes=30 * i), float(i % 11),
          "a" if i % 2 == 0 else "b", " ".join(f"t{j}" for j in range(i % 20)))
         for i in range(1, 120)],
        "doc_id long, ts timestamp, score double, side string, text_representation string",
    )
    ds = DocSet(df)
    assert ds.top_per_group("side", "score", 3, tiebreak_col="doc_id").to_df().count() == 6
    h = ds.histogram("score", 0.0, 11.0, 4).to_df()
    assert h.agg(F.sum("n")).collect()[0][0] == 119
    c = ds.clip_outliers("score", ["side"], 0.1, 0.9, out_col="w").to_df()
    assert c.count() == 119 and "w" in c.columns
    t = ds.truncate_tokens(5).to_df()
    assert t.agg(F.max("n_tokens_kept")).collect()[0][0] == 5
    r = ds.resample("ts", "side", "score", 3600, id_col="doc_id").to_df()
    assert {"bucket_ts", "filled"} <= set(r.columns)
    d = ds.divergence_between("side", "a", "b").to_df().collect()[0]
    assert d.vocab > 0


def test_session2d_delegates(spark):
    df = spark.range(100).selectExpr(
        "id AS doc_id", "cast(id AS double) AS score",
        "'mail a@b.co here' AS text_representation",
    )
    ds = DocSet(df)
    b = ds.bucket_by_quantiles("score", 4).to_df()
    assert b.filter("qbucket BETWEEN 0 AND 3").count() == 100
    p = ds.pattern_counts().to_df().collect()
    assert all(r.emails == 1 for r in p)
    v = {r.rule: r.ok for r in ds.validate({"pos": "doc_id >= 0"}).to_df().collect()}
    assert v == {"pos": 1}


def test_round5_fluent_surface(spark):
    from pyspark.sql import functions as F

    from sycamore_spark.docset import DocSet

    docs = DocSet(spark.createDataFrame(
        [(i, f"w{i % 7} common text here", float(i)) for i in range(30)],
        "doc_id long, text string, score double",
    ))
    assert "curriculum_rank" in docs.curriculum_order("score").to_df().columns
    assert "scaled_micros" in docs.robust_scale("score").to_df().columns
    assert {"block", "chunk_id"} <= set(docs.semantic_chunk().to_df().columns)
    assert docs.frequent_tokens(k=3).to_df().columns == ["token", "cnt"]
    base = DocSet(spark.createDataFrame([(1, "a", -1, "U")], "k long, v string, seq long, op string"))
    ch = DocSet(spark.createDataFrame([(1, "b", 5, "U")], "k long, v string, seq long, op string"))
    assert base.apply_changes(ch, ["k"], "seq").to_df().first().v == "b"
    assert "is_current" in ch.scd2_history(["k"], "seq").to_df().columns
