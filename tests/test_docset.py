"""DocSet relational-surface semantics (reference test model:
tests/unit/test_docset.py, test_sort.py, test_basics.py, test_grouped_data.py)."""

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from sycamore_spark.docset import DocSet


def _people(spark):
    return DocSet(spark.createDataFrame(
        [("a", "Alice", 34, "NY"), ("b", "Bob", 25, "SF"), ("c", "Carol", None, "NY"),
         ("d", "Dave", 41, "LA"), ("e", "Eve", 25, None)],
        "id string, name string, age int, city string",
    ))


def test_match_filter_substring_case_insensitive(spark):
    ds = _people(spark)
    assert {r.id for r in ds.match_filter("name", "ali").take_all()} == {"a"}
    assert {r.id for r in ds.match_filter("name", "ALI").take_all()} == {"a"}
    # non-string query → equality
    assert {r.id for r in ds.match_filter("age", 25).take_all()} == {"b", "e"}


def test_range_filter_inclusive(spark):
    ds = _people(spark)
    assert {r.id for r in ds.range_filter("age", 25, 34).take_all()} == {"a", "b", "e"}
    # open-ended
    assert {r.id for r in ds.range_filter("age", 35, None).take_all()} == {"d"}


def test_sort_drops_missing_unless_default(spark):
    ds = _people(spark)
    # Reference semantics: docs missing the sort key are dropped (docset.py:1408).
    ids = [r.id for r in ds.sort("age").take_all()]
    assert "c" not in ids and ids[0] in {"b", "e"}
    # with default, kept and placed by the default value
    ids = [r.id for r in ds.sort("age", default_val=0).take_all()]
    assert ids[0] == "c"


def test_field_in_semi_join(spark):
    ds = _people(spark)
    other = DocSet(spark.createDataFrame([("NY",), ("LA",)], "c string"))
    assert {r.id for r in ds.field_in("city", other, "c").take_all()} == {"a", "c", "d"}


def test_groupby_count_and_unique(spark):
    ds = _people(spark)
    rows = {r.key: r["count"] for r in ds.groupby_count("city").take_all()}
    assert rows == {"NY": 2, "SF": 1, "LA": 1}  # null key dropped
    rows = {r.key: r["count"] for r in ds.groupby_count("city", unique_field="age").take_all()}
    assert rows["NY"] == 1  # Carol's null age not counted distinct... Alice only


def test_top_k_deterministic_tiebreak(spark):
    ds = DocSet(spark.createDataFrame([("x",), ("x",), ("y",), ("y",), ("z",)], "v string"))
    rows = [(r.key, r["count"]) for r in ds.top_k("v", k=2).take_all()]
    assert rows == [("x", 2), ("y", 2)]  # count desc, key asc


def test_unroll_and_term_frequency(spark):
    ds = DocSet(spark.createDataFrame([("1", "a b a"), ("2", "b c")], "id string, text string"))
    un = ds.unroll("text", " ")
    assert un.count() == 5
    tf = {r.token: r.freq for r in ds.term_frequency("text").take_all()}
    assert tf == {"a": 2, "b": 2, "c": 1}


def test_unroll_dotted_struct_field(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(id="1", properties=Row(tags="a b", kind="k1")), Row(id="2", properties=Row(tags="c", kind="k2"))]
    )
    out = DocSet(df).unroll("properties.tags", " ").take_all()
    got = sorted((r["id"], r["properties"]["tags"], r["properties"]["kind"]) for r in out)
    assert got == [("1", "a", "k1"), ("1", "b", "k1"), ("2", "c", "k2")]


def test_unroll_dotted_non_struct_raises(spark):
    import pytest

    ds = DocSet(spark.createDataFrame([("1", '{"x": "a b"}')], "id string, properties string"))
    with pytest.raises(ValueError, match="struct"):
        ds.unroll("properties.x")


def test_union_limit_sample_distinct(spark):
    ds = _people(spark)
    assert ds.union(ds).count() == 10
    assert ds.limit(2).count() == 2
    assert ds.union(ds).drop_duplicates("id").count() == 5
    assert 0 <= ds.random_sample(0.5, seed=1).count() <= 5


def test_grouped_collect_and_reduce(spark):
    ds = _people(spark)
    got = {r.city: r.collected for r in ds.drop_if_missing("city").groupby("city")
           .collect("name", joined=True).take_all()}
    assert set(got["NY"].split(", ")) == {"Alice", "Carol"}

    schema = StructType([StructField("city", StringType()), StructField("n", LongType())])

    def reducer(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame([{"city": pdf["city"].iloc[0], "n": len(pdf)}])

    got = {r.city: r.n for r in ds.drop_if_missing("city").groupby("city").reduce(reducer, schema).take_all()}
    assert got == {"NY": 2, "SF": 1, "LA": 1}


def test_rank_within(spark):
    ds = _people(spark)
    rows = {(r.city, r.name): r["rank"] for r in
            ds.drop_if_missing("city").drop_if_missing("age")
            .rank_within("city", "age", descending=True, tiebreak_field="id").take_all()}
    assert rows[("NY", "Alice")] == 1


def test_materialize_use_stored(spark, tmp_path):
    ds = _people(spark)
    p = str(tmp_path / "mat")
    m1 = ds.materialize(p)
    assert m1.count() == 5
    # USE_STORED must reuse without recompute (same contents)
    m2 = DocSet(spark.range(0).toDF("id")).materialize(p, source_mode="USE_STORED")
    assert m2.count() == 5


def test_map_and_flat_map(spark):
    ds = DocSet(spark.createDataFrame([(1,), (2,)], "v int"))
    assert sorted(r.v for r in ds.map(lambda r: {"v": r["v"] * 10}).take_all()) == [10, 20]
    assert ds.flat_map(lambda r: [r, r]).count() == 4


def test_filter_callable_runs_rowwise(spark):
    ds = _people(spark)
    out = ds.filter(lambda row: row["city"] == "NY")
    assert {r.id for r in out.take_all()} == {"a", "c"}


def test_json_field_access(spark):
    ds = DocSet(spark.createDataFrame([("1", '{"a": {"b": 7}}')], "id string, properties string"))
    assert ds.to_df().select(ds.field("properties.a.b").cast("int").alias("x")).collect()[0].x == 7


def test_window_stats(spark):
    from sycamore_spark.docset import DocSet

    rows = [(1, "a", 1.0), (2, "a", 2.0), (3, "a", 3.0), (4, "a", 4.0), (5, "b", 10.0)]
    df = spark.createDataFrame(rows, "id int, grp string, value double")
    out = {r.id: r for r in
           DocSet(df).window_stats("grp", "id", "value", ma_rows=2).to_df().collect()}
    assert out[1].prev_value is None and out[2].prev_value == 1.0
    assert out[1].next_value == 2.0 and out[4].next_value is None
    assert out[4].running_sum == 10.0  # 1+2+3+4
    assert out[3].moving_avg == 2.5    # (2+3)/2
    assert out[5].prev_value is None and out[5].running_sum == 10.0


def test_key_skew_profile(spark):
    from sycamore_spark.operators.profiling import key_skew_profile

    rows = [("hot",)] * 80 + [("warm",)] * 15 + [("cold",)] * 5
    df = spark.createDataFrame(rows, "k string")
    out = key_skew_profile(df, "k", top_n=2).collect()
    assert [r.key for r in out] == ["hot", "warm"]
    assert out[0].cnt == 80 and abs(out[0].share - 0.8) < 1e-12
    assert abs(out[0].skew_ratio - 2.4) < 1e-12  # 80 / (100/3 keys)


def test_corpus_diff_statuses(spark):
    from sycamore_spark.operators.profiling import corpus_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id int, fp string")
    new = spark.createDataFrame(
        [(1, "a"), (2, "B2"), (4, "d")], "id int, fp string")
    out = {r.id: r.status for r in corpus_diff(old, new, "id", "fp").collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_fluent_round4_delegates(spark):
    from pyspark.sql import functions as F

    from sycamore_spark.docset import DocSet

    docs = DocSet(spark.createDataFrame(
        [(i, f"doc text number {i}") for i in range(40)],
        "doc_id int, text_representation string"))

    assert docs.weighted_sample(F.lit(1.0)).count() == 40
    splits = docs.split_by_group("doc_id", {"train": 0.5, "test": 0.5})
    assert set(r.split for r in splits.to_df().select("split").distinct().collect()) <= {"train", "test"}
    scored = docs.bm25(["doc"]).to_df()
    assert scored.count() == 40 and "bm25_micros" in scored.columns
    kw = docs.tfidf_terms(k=2).to_df()
    assert kw.groupBy("doc_id").count().filter("count > 2").count() == 0
    skew = docs.key_skew("text_representation", top_n=3).to_df()
    assert skew.count() == 3

    old = DocSet(spark.createDataFrame([(1, "a")], "doc_id int, fingerprint string"))
    new = DocSet(spark.createDataFrame([(1, "b"), (2, "c")], "doc_id int, fingerprint string"))
    d = {r.doc_id: r.status for r in new.diff_against(old).to_df().collect()}
    assert d == {1: "changed", 2: "added"}

    corpus = DocSet(spark.createDataFrame([(i,) for i in range(20)], "doc_id int"))
    batch = DocSet(spark.createDataFrame([(i,) for i in range(15, 25)], "doc_id int"))
    kept = batch.dedup_against(corpus, key_col="doc_id", nbits=1 << 12)
    assert {r.doc_id for r in kept.to_df().collect()} == {20, 21, 22, 23, 24}

    emb = DocSet(spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
        "doc_id int, embedding array<double>"))
    sd = emb.semantic_dedup([[1.0, 0.0], [0.0, 1.0]], threshold=0.99).to_df()
    assert {(r.doc_id, r.keep) for r in sd.collect()} == {(1, True), (2, False), (3, True)}


def test_docset_fluent_curation_wrappers(spark):
    """Round-10 fluent additions: dsir_select / soft_dedup / decontaminate /
    winnow_pairs wrap their operators with DocSet in/out."""
    import sycamore_spark as ss

    docs = ss.DocSet(
        spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon zeta eta theta"),
                (2, "alpha beta gamma delta epsilon zeta eta iota"),
                (3, "totally different words in this one here now"),
            ],
            "doc_id long, text string",
        )
    )
    target = ss.DocSet(
        spark.createDataFrame(
            [(9, "alpha beta gamma delta epsilon zeta eta theta")],
            "doc_id long, text string",
        )
    )
    top = docs.dsir_select(target, 2).to_df().collect()
    assert {r.doc_id for r in top} <= {1, 2} and len(top) == 2

    pairs = ss.DocSet(
        spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    )
    sd = {r.doc_id: r for r in docs.soft_dedup(pairs).to_df().collect()}
    assert sd[1].cluster_size == 2 and sd[3].cluster_size == 1

    clean = {r.doc_id: r for r in docs.decontaminate(target, min_len=4).to_df().collect()}
    assert clean[3].n_tokens_after == clean[3].n_tokens_before
    assert clean[1].n_tokens_after < clean[1].n_tokens_before

    wp = docs.winnow_pairs(min_shared=1).to_df().collect()
    assert {(r.id_a, r.id_b) for r in wp} == {(1, 2)}
