"""Text analysis + embedding stage semantics."""

import math

import pytest
from pyspark.sql import functions as F

from sycamore_spark.operators import clustering, embed, textstats


def _docs(spark):
    return spark.createDataFrame([
        (1, "the cat and the dog are in the house"),
        (2, "der Hund und die Katze ist hier"),
        (3, "xyzzy qwerty!!!! @@@@ ####"),
    ], "doc_id int, text string")


def test_text_stats(spark):
    rows = {r.doc_id: r for r in textstats.text_stats(_docs(spark)).collect()}
    assert rows[1].n_tokens == 9
    assert rows[1].distinct_tokens == 7
    assert rows[1].n_chars_obs == len("the cat and the dog are in the house")


def test_lang_id(spark):
    rows = {r.doc_id: r.lang_pred for r in textstats.language_id(_docs(spark)).collect()}
    assert rows[1] == "en"
    assert rows[2] == "de"
    assert rows[3] == "und"


def test_quality_orders_prose_above_garbage(spark):
    rows = {r.doc_id: r.quality_score for r in textstats.quality(_docs(spark)).collect()}
    assert rows[1] > rows[3]


def test_fingerprint_whitespace_invariant(spark):
    df = spark.createDataFrame([(1, "a  b\tc"), (2, " A b C")], "doc_id int, text string")
    fps = [r.fingerprint for r in textstats.fingerprints(df).collect()]
    assert fps[0] == fps[1]


def test_hashing_embedding_unit_norm_deterministic(spark):
    df = _docs(spark).withColumnRenamed("text", "text_representation")
    out1 = embed.embed(df, dim=16).collect()
    out2 = embed.embed(df, dim=16).collect()
    v1 = {r.doc_id: r.embedding for r in out1}
    v2 = {r.doc_id: r.embedding for r in out2}
    assert v1 == v2
    assert math.isclose(sum(x * x for x in v1[1]), 1.0, rel_tol=1e-5)


def test_embed_skips_existing(spark):
    df = spark.createDataFrame([(1, "hello", [9.0] * 4)],
                               "doc_id int, text_representation string, embedding array<float>")
    out = embed.embed(df, dim=4).collect()[0]
    assert out.embedding == [9.0] * 4


def test_embed_elements(spark):
    from sycamore_spark.data.schema import docs_from_rows

    df = docs_from_rows(spark, [dict(doc_id="d", elements=[
        dict(type="text", text_representation="hello world"),
    ])])
    el = embed.embed_elements(df, dim=8).collect()[0].elements[0]
    assert len(el.embedding) == 8


def test_kmeans_separates_clusters(spark):
    rows = [(i, [10.0 + i * 0.01, 0.0]) for i in range(10)] + \
           [(100 + i, [0.0, 10.0 + i * 0.01]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    out = clustering.kmeans(df, k=2, seed=7)
    clusters = {r.vec_id: r.cluster for r in out.collect()}
    left = {clusters[i] for i in range(10)}
    right = {clusters[100 + i] for i in range(10)}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_rerank_puts_matching_doc_first(spark):
    df = spark.createDataFrame([
        (1, "spark query engine performance"),
        (2, "cooking pasta with tomato sauce"),
    ], "doc_id int, text_representation string")
    out = clustering.rerank(df, query="spark engine").collect()
    assert out[0].doc_id == 1


def test_repetition_stats(spark):
    from sycamore_spark.operators.textstats import repetition_stats

    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "w x y z"), (3, "solo")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    # doc1 bigrams: [a b, b a, a b, b a, a b] -> 5 total, 2 distinct, top=3
    assert got[1]["n_bigrams"] == 5 and got[1]["distinct_bigrams"] == 2
    assert got[1]["dup_bigram_frac"] == pytest.approx(3 / 5)
    assert got[1]["top_bigram_frac"] == pytest.approx(3 / 5)
    assert got[2]["dup_bigram_frac"] == 0.0
    assert got[3]["n_bigrams"] == 0 and got[3]["top_bigram_frac"] == 0.0


def test_ngram_contamination(spark):
    from sycamore_spark.operators.textstats import ngram_contamination

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "totally clean document here"), (3, "xy")],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame([(99, "quick brown fox")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in ngram_contamination(docs, probes, n=3).collect()}
    assert got[1]["n_ngrams"] == 3 and got[1]["contaminated_ngrams"] == 1
    assert got[1]["contamination_frac"] == pytest.approx(1 / 3)
    assert got[2]["contaminated_ngrams"] == 0
    assert got[3]["n_ngrams"] == 0 and got[3]["contamination_frac"] == 0.0


# -- byte-level rolling-hash shingles (reference shinglesCalc parity) --------


def _reference_shingles(data: bytes, window=17, number=16):
    """Independent check implementation: literal per-byte sliding RK hash
    with scramble, from the documented semantics."""
    P = 36028797018963913
    seen = set()
    for start in range(len(data) - window + 1):
        h = 0
        for ch in data[start : start + window]:
            h = (h * 256 + ch) % P
        seen.add(((h * 6364136223846793005) + 9223372036854775783) & 0x7FFFFFFFFFFFFFFF)
    ary = sorted(seen)
    if not ary:
        return [0] * number
    if len(ary) < number:
        copies = (number + len(ary) - 1) // len(ary)
        ary = sorted(ary * copies)
    return ary[:number]


def test_char_shingles_matches_reference_formula():
    import random

    from sycamore_spark.functions.text import char_shingles_py

    rng = random.Random(11)
    for trial in range(50):
        n = rng.randint(0, 200)
        data = bytes(rng.randrange(256) for _ in range(n))
        assert char_shingles_py(data) == _reference_shingles(data), (trial, n)


def test_char_shingles_column_and_dist(spark):
    from pyspark.sql import functions as F

    from sycamore_spark.functions.text import char_shingles, char_shingles_py, shingles_dist

    df = spark.createDataFrame(
        [("a", "the quick brown fox jumps over the lazy dog"),
         ("b", "the quick brown fox jumps over the lazy cat"),
         ("c", "short")],
        "id string, text string",
    )
    got = {r["id"]: r["sh"] for r in df.select("id", char_shingles(F.col("text")).alias("sh")).collect()}
    assert got["a"] == char_shingles_py("the quick brown fox jumps over the lazy dog".encode())
    assert got["c"] == [0] * 16  # under the 17-byte window
    assert shingles_dist(got["a"], got["a"]) == 0.0
    d_ab = shingles_dist(got["a"], got["b"])
    assert 0.0 < d_ab < 1.0  # similar but not identical


def test_remove_repeated_lines(spark):
    from sycamore_spark.operators.textstats import remove_repeated_lines

    rows = [
        (1, "intro one\nCOMMON FOOTER LINE HERE\nunique tail 1"),
        (2, "intro two\nCOMMON FOOTER LINE HERE\nunique tail 2"),
        (3, "intro three\nCOMMON FOOTER LINE HERE\nunique tail 3"),
        (4, "COMMON FOOTER LINE HERE"),  # becomes empty
        (5, "short\nok"),  # short lines always kept, even if repeated
        (6, "short\nok"),
        (7, "short\nok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.text for r in remove_repeated_lines(df, max_docs=2).collect()}
    assert out[1] == "intro one\nunique tail 1"
    assert out[4] == ""  # all-boilerplate doc survives as empty
    assert out[5] == "short\nok"  # below min_len: kept despite 3 occurrences
    assert len(out) == 7


def test_quantile_filter_semantics(spark):
    from sycamore_spark.operators.textstats import filter_by_quantile, quantile_stats

    df = spark.createDataFrame(
        [(i, "a" if i < 100 else "b", float(i)) for i in range(200)],
        "id long, grp string, v double",
    )
    # per-group thresholds: P90 of 0..99 is 89.1, of 100..199 is 189.1
    thr = {r.grp: r.q9 for r in quantile_stats(df, "v", ["grp"], (0.9,)).collect()}
    assert abs(thr["a"] - 89.1) < 1e-9 and abs(thr["b"] - 189.1) < 1e-9
    out = filter_by_quantile(df, "v", 0.9, ["grp"]).collect()
    assert sorted(r.id for r in out) == list(range(90, 100)) + list(range(190, 200))
    # keep='below' flips the tail
    low = filter_by_quantile(df, "v", 0.1, ["grp"], keep="below").collect()
    assert sorted(r.id for r in low) == list(range(0, 10)) + list(range(100, 110))
    # ungrouped path
    g = filter_by_quantile(df, "v", 0.95).collect()
    assert len(g) == 10 and min(r.id for r in g) == 190


def test_remove_repeated_lines_null_passthrough_column(spark):
    """A NULL in a passthrough column must not lose the document's text:
    the regroup keys on doc_id only and re-attaches other columns from the
    original frame (null-unsafe equality was the r3 advisor finding)."""
    from sycamore_spark.operators.textstats import remove_repeated_lines

    rows = [
        (1, None, "intro one\nCOMMON FOOTER LINE HERE\nunique tail 1"),
        (2, "web", "intro two\nCOMMON FOOTER LINE HERE\nunique tail 2"),
        (3, None, "intro three\nCOMMON FOOTER LINE HERE\nunique tail 3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.doc_id: (r.source, r.text) for r in remove_repeated_lines(df, max_docs=2).collect()}
    assert out[1] == (None, "intro one\nunique tail 1")
    assert out[2] == ("web", "intro two\nunique tail 2")
    assert out[3] == (None, "intro three\nunique tail 3")


def test_quantile_stats_weird_column_names_and_q1(spark):
    """Backtick-needing column names and q=1.0 both work (r3 advisor: the
    f-string percentile() broke on 'value col' and q1.0 aliases)."""
    from sycamore_spark.operators.textstats import quantile_stats

    df = spark.createDataFrame(
        [(float(i),) for i in range(101)], ["value col"]
    )
    out = quantile_stats(df, "value col", quantiles=(0.5, 1.0)).collect()[0]
    assert out["q5"] == 50.0
    assert out["q1_0"] == 100.0


def test_ngram_lm_score_fluent_vs_gibberish(spark):
    from sycamore_spark.operators import textstats

    fluent = "the cat sat on the mat and the cat sat on the rug"
    docs = [(1, fluent), (2, fluent), (3, "zq xv qp wk jm zq bn vz")]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = {r.doc_id: r for r in textstats.ngram_lm_score(df).collect()}
    # repeated fluent bigrams are high-probability; unique gibberish is not
    assert out[1].avg_logprob > out[3].avg_logprob
    assert out[1].avg_logprob == out[2].avg_logprob  # identical docs, identical score
    assert out[1].n_bigrams == 12
    # single-word docs produce no row
    one = spark.createDataFrame([(9, "word")], "doc_id int, text string")
    assert textstats.ngram_lm_score(one).count() == 0


def test_clip_outliers_bounds_and_passthrough(spark):
    from pyspark.sql import functions as F
    from sycamore_spark.operators.textstats import clip_outliers

    df = spark.range(1000).selectExpr(
        "id", "id % 2 AS g", "cast(CASE WHEN id = 0 THEN 1e9 ELSE id % 100 END AS double) AS v"
    )
    out = clip_outliers(df, "v", ["g"], 0.01, 0.99, out_col="w")
    rows = out.collect()
    assert max(r.w for r in rows) < 1e6  # the wild value got clipped
    # interior values untouched
    mid = [r for r in rows if 10 <= r.v <= 90]
    assert all(r.w == r.v for r in mid)
    assert out.count() == 1000


def test_truncate_tokens_budget_and_identity(spark):
    from pyspark.sql import functions as F
    from sycamore_spark.operators.textstats import truncate_tokens

    df = spark.createDataFrame(
        [(1, "a b c"), (2, " ".join(f"w{i}" for i in range(50))), (3, "  leading  spaces kept ")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in truncate_tokens(df, "text", 10, out_col="cut").collect()}
    assert out[1].cut == "a b c" and out[1].n_tokens_kept == 3
    assert out[2].cut == " ".join(f"w{i}" for i in range(10)) and out[2].n_tokens_kept == 10
    # under budget: byte-identical passthrough, whitespace preserved
    assert out[3].cut == "  leading  spaces kept "


def test_bucket_by_quantiles_equi_depth(spark):
    from pyspark.sql import functions as F
    from sycamore_spark.operators.textstats import bucket_by_quantiles

    df = spark.range(400).selectExpr("id", "id % 2 AS g", "cast(id AS double) AS v")
    out = bucket_by_quantiles(df, "v", 4, ["g"])
    counts = {(r.g, r.qbucket): r.n for r in out.groupBy("g", "qbucket").agg(F.count("*").alias("n")).collect()}
    assert set(b for (_, b) in counts) == {0, 1, 2, 3}
    assert all(45 <= n <= 55 for n in counts.values())  # ~200/4 per group
    # monotone: higher value never lands in a lower bucket
    rows = sorted(out.filter("g = 0").collect(), key=lambda r: r.v)
    buckets = [r.qbucket for r in rows]
    assert buckets == sorted(buckets)


def test_pattern_counts(spark):
    from sycamore_spark.operators.textstats import pattern_counts

    df = spark.createDataFrame(
        [(1, "mail a@b.co and c@d.org, see https://x.y/z from 10.0.0.1"),
         (2, "no signals here"),
         (3, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in pattern_counts(df).collect()}
    assert (got[1].emails, got[1].urls, got[1].ips) == (2, 1, 1)
    assert (got[2].emails, got[2].urls, got[2].ips, got[2].phones) == (0, 0, 0, 0)
    assert got[3].emails is None  # null text propagates, not a crash


def test_script_ratios(spark):
    from sycamore_spark.operators.textstats import script_ratios

    df = spark.createDataFrame(
        [(1, "abcd"), (2, "世界世界"), (3, "12 34"), (4, ""), (5, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in script_ratios(df).collect()}
    assert got[1].latin_frac == 1.0 and got[1].cjk_frac == 0.0
    assert got[2].cjk_frac == 1.0
    assert got[3].digit_frac == 0.8 and got[3].space_frac == 0.2
    assert got[4].latin_frac == 0.0 and got[4].n_chars == 0
    assert got[5].n_chars is None  # null text propagates


def test_zipf_stats_slope_and_hapax(spark):
    """A perfect Zipf corpus (freq ~ C/rank) fits slope ~= -1; hapax ratio
    counts singleton types exactly."""
    from sycamore_spark.operators import textstats

    rows = []
    # 20 types with freq = 240 // rank (Zipfian); 10 singleton types
    for r in range(1, 21):
        rows += [(f"w{r:02d}",)] * (240 // r)
    rows += [(f"rare{i}",) for i in range(10)]
    docs = spark.createDataFrame(
        [(1, "en", " ".join(w for (w,) in rows))], "doc_id long, lang string, text string"
    )
    out = textstats.zipf_stats(docs, "lang", top_n=20).collect()
    assert len(out) == 1
    r = out[0]
    assert r.vocab_size == 30
    assert abs(r.hapax_ratio - 10 / 30) < 1e-12
    assert -1.12 < r.zipf_slope < -0.88


def test_paragraph_lm_filter_cuts_gibberish_window(spark):
    """A doc whose middle 10-token window is shuffled gibberish loses
    exactly that window; fluent docs pass intact."""
    from sycamore_spark.operators import textstats

    fluent = "the cat sat on the mat and then the cat"
    gib = "zq xv qq vx zz qv xz vq zx xq"
    docs = spark.createDataFrame(
        [(i, f"{fluent} {gib} {fluent}") for i in range(3)]
        + [(10 + i, f"{fluent} {fluent} {fluent}") for i in range(9)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in textstats.paragraph_lm_filter(docs, window=10).collect()}
    for i in range(3):
        assert out[i].n_windows == 3 and out[i].n_kept == 2
        assert out[i].clean_text == f"{fluent} {fluent}"
    for i in range(10, 19):
        assert out[i].n_kept == out[i].n_windows == 3


def test_paragraph_lm_filter_short_windows_kept(spark):
    from sycamore_spark.operators import textstats

    docs = spark.createDataFrame(
        [(1, "solo"), (2, "")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in textstats.paragraph_lm_filter(docs, window=10).collect()}
    assert out[1].n_kept == 1 and out[1].clean_text == "solo"
    assert out[2].n_windows == 1


def test_paragraph_lm_filter_null_text_passes_through(spark):
    """NULL text must not drop the document (the remove_token_spans null
    contract): it yields one empty kept window."""
    from sycamore_spark.operators import textstats

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, None)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in textstats.paragraph_lm_filter(docs, window=10).collect()}
    assert set(out) == {1, 2}
    assert out[2].n_windows == 1 and out[2].n_kept == 1
    assert out[2].clean_text == ""
