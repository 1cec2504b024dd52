"""Empty-input hardening: every operator must return an empty (or
well-defined) result on an empty frame, not crash — partitions ARE empty
routinely at scale (empty date partitions, filtered-out sources)."""

from pyspark.sql import functions as F


def _empty(spark, schema):
    return spark.createDataFrame([], schema)


def test_dedup_family_empty(spark):
    from sycamore_spark.operators import dedup

    docs = _empty(spark, "doc_id int, text string")
    assert dedup.exact_dedup(docs, "doc_id", "text").count() == 0
    assert dedup.jaccard_similar_pairs(docs, "doc_id", "text", threshold=0.9).count() == 0
    emb = _empty(spark, "vec_id int, embedding array<double>")
    out = dedup.semantic_dedup(emb, "vec_id", "embedding", [[1.0, 0.0], [0.0, 1.0]],
                               threshold=0.9, quantize_scale=512)
    assert out.count() == 0
    corpus = spark.createDataFrame([(1, "a")], "id int, text string")
    assert dedup.incremental_dedup(docs.select(F.col("doc_id").alias("id"),
                                               "text"), corpus, "text").count() == 0


def test_profiling_sampling_empty(spark):
    from sycamore_spark.operators.monitor import ewma_by_key
    from sycamore_spark.operators.profiling import corpus_diff, key_skew_profile
    from sycamore_spark.operators.sampling import group_aware_split, mixture_plan

    ev = _empty(spark, "k string, t int, v double")
    assert key_skew_profile(ev, "k").count() == 0
    assert ewma_by_key(ev, "k", "t", "v").count() == 0
    assert mixture_plan(ev, "k", {"a": 0.5, "b": 0.5}).count() == 0
    assert group_aware_split(ev, "k", {"train": 0.8, "test": 0.2}).count() == 0
    snap = _empty(spark, "id int, fp string")
    assert corpus_diff(snap, snap, "id", "fp").count() == 0


def test_retrieval_eval_empty(spark):
    from sycamore_spark.evaluation import retrieval_metrics
    from sycamore_spark.operators.retrieval import bm25_scores, tfidf_topk_terms

    docs = _empty(spark, "doc_id int, text string")
    assert bm25_scores(docs, ["term"], "doc_id", "text").count() == 0
    assert tfidf_topk_terms(docs, "doc_id", "text").count() == 0
    res = _empty(spark, "query_id string, rank int, rel int")
    assert retrieval_metrics(res).count() == 0


def test_textstats_elements_empty(spark):
    from sycamore_spark.llm.extract import attribute_values
    from sycamore_spark.operators import textstats
    from sycamore_spark.operators.elements import xycut_sort_elements

    docs = _empty(spark, "doc_id int, text string")
    assert textstats.ngram_lm_score(docs).count() == 0
    els = _empty(
        spark,
        "doc_id int, val string, elements array<struct<element_index:int,"
        "text_representation:string>>",
    )
    assert attribute_values(els, ["val"], id_col="doc_id").count() == 0
    from sycamore_spark.data.schema import DOC_SCHEMA
    assert xycut_sort_elements(_empty(spark, DOC_SCHEMA)).count() == 0


def test_null_text_behavior(spark):
    """Null text must not crash; rows with null keys/text drop out of
    text-keyed operators deterministically."""
    from pyspark.sql import functions as F

    from sycamore_spark.operators import textstats
    from sycamore_spark.operators.retrieval import tfidf_topk_terms
    from sycamore_spark.operators.sampling import weighted_hash_sample

    df = spark.createDataFrame(
        [(1, "real text here with words"), (2, None), (3, "")],
        "doc_id int, text string")

    lm = textstats.ngram_lm_score(df)
    assert {r.doc_id for r in lm.collect()} == {1}  # null/empty: no bigrams

    tf = tfidf_topk_terms(df, "doc_id", "text", k=3)
    assert 2 not in {r.doc_id for r in tf.collect()}

    # NB: F.least() SKIPS nulls (returns the non-null arm), so a
    # least(length(text), cap) weight treats null text as weight 1 — use a
    # null-propagating expression when null text must drop out
    w = (F.length("text").cast("double") / 100.0)
    ws = weighted_hash_sample(df, "doc_id", w)
    assert 2 not in {r.doc_id for r in ws.collect()}  # null weight -> dropped


def test_ewma_null_values(spark):
    from sycamore_spark.operators.monitor import ewma_by_key

    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, None), ("a", 3, 3.0)],
        "k string, t int, v double")
    # nulls inside a key's history: pandas float64 makes them NaN; the
    # fold propagates NaN — callers should filter nulls first, and the
    # operator must not crash
    out = ewma_by_key(df.filter("v is not null"), "k", "t", "v", alpha=0.5).collect()
    assert out[0].ewma == 2.0 and out[0].n == 2


def test_session2_operators_empty(spark):
    from sycamore_spark.operators.graph import pagerank
    from sycamore_spark.operators.joins import bloom_join
    from sycamore_spark.operators.sampling import cap_per_group, corpus_shuffle
    from sycamore_spark.operators.sketches import (
        hll_distinct,
        kll_quantiles,
        theta_overlap,
    )
    from sycamore_spark.operators.textstats import normalize_by_rank

    docs = _empty(spark, "doc_id bigint, source string, score double")
    assert cap_per_group(docs, "source", "doc_id", 5).count() == 0
    assert corpus_shuffle(docs, "doc_id", 4).count() == 0
    assert normalize_by_rank(docs, "score", ["source"]).count() == 0
    assert hll_distinct(docs, "doc_id", ["source"]).count() == 0
    assert kll_quantiles(docs, "score", [0.5], ["source"]).count() == 0
    # global (no group) sketch aggs over empty input yield one row of
    # empty-sketch estimates rather than crashing
    row = theta_overlap(docs, "doc_id", "source", "a", "b").collect()
    assert len(row) == 1
    edges = _empty(spark, "src string, dst string")
    assert pagerank(edges, iterations=2).count() == 0
    small = spark.createDataFrame([(1,)], "k bigint")
    big = _empty(spark, "k bigint, payload string")
    assert bloom_join(big, small, "k").count() == 0
    # empty BUILD side: filter rejects everything, result still exact
    assert bloom_join(small, big, "k").count() == 0


def test_round5_operators_empty(spark):
    from sycamore_spark.operators.cdc import apply_changes, scd2_history
    from sycamore_spark.operators.dedup import containment_pairs
    from sycamore_spark.operators.events import active_users
    from sycamore_spark.operators.graph import kcore, triangle_count
    from sycamore_spark.operators.profiling import join_size_estimate, robust_scale
    from sycamore_spark.operators.sampling import curriculum_order
    from sycamore_spark.operators.sketches import frequent_tokens
    from sycamore_spark.operators.standardize import semantic_chunk
    from sycamore_spark.operators.timeseries import seasonal_residuals, trend_fit

    docs = _empty(spark, "doc_id long, text string")
    ev = _empty(spark, "user_id long, ts timestamp, value double")
    ch = _empty(spark, "k long, v string, seq long, op string")
    ed = _empty(spark, "src long, dst long")

    assert apply_changes(ch, ch, ["k"], "seq").count() == 0
    assert scd2_history(ch, ["k"], "seq").count() == 0
    assert triangle_count(ed).first()["n_triangles"] == 0
    assert kcore(ed, k=2, rounds=3).count() == 0
    assert robust_scale(_empty(spark, "v double"), "v").count() == 0
    assert curriculum_order(docs, "doc_id").count() == 0
    assert active_users(ev, "ts", "user_id").count() == 0
    assert containment_pairs(docs, "doc_id", "text").count() == 0
    assert frequent_tokens(docs, "text", k=5).count() == 0
    assert semantic_chunk(docs).count() == 0
    # keyless aggregate: one row with n=0 and NULL fits (SQL semantics)
    tr = trend_fit(_empty(spark, "x long, y double"), "x", "y").first()
    assert tr.n == 0 and tr.slope_micros is None
    assert seasonal_residuals(ev, "ts", "value").count() == 0
    est = join_size_estimate(ed, ed, ["src"]).first()
    assert est.matched_keys == 0 and est.rows_out is None


def test_round5_mmr_and_oov_empty(spark):
    from sycamore_spark.operators.similarity import mmr_rerank
    from sycamore_spark.operators.textstats import pmi_collocations, vocab_coverage

    cands = _empty(spark, "query_id string, doc_id long, rel_micros long, embedding array<double>")
    assert mmr_rerank(cands, k=3).count() == 0
    docs = _empty(spark, "doc_id long, text string")
    vocab = _empty(spark, "token string")
    assert vocab_coverage(docs, vocab).count() == 0
    assert pmi_collocations(docs).count() == 0


def test_round6_operators_empty(spark):
    from pyspark.sql import functions as F

    from sycamore_spark.evaluation import attach_subtasks, expand_formulas
    from sycamore_spark.operators.dedup import containment_lsh_pairs, duplicate_spans
    from sycamore_spark.operators.elements import normalize_rotation
    from sycamore_spark.operators.retrieval import best_snippets, bm25_scores_multi
    from sycamore_spark.operators.sampling import temperature_mixture
    from sycamore_spark.operators.web import canonical_urls, url_dedup

    docs = _empty(spark, "doc_id long, text string")
    qs = _empty(spark, "query_id long, query string")
    urls = _empty(spark, "doc_id long, url string")
    geo = _empty(spark, "doc_id long, bbox array<double>, vx double, vy double")

    assert containment_lsh_pairs(docs, "doc_id", "text").count() == 0
    assert duplicate_spans(docs, "doc_id", "text").count() == 0
    assert normalize_rotation(geo).count() == 0
    assert bm25_scores_multi(docs, qs).count() == 0
    assert best_snippets(docs, qs).count() == 0
    assert temperature_mixture(docs, "text").count() == 0
    assert canonical_urls(urls, "url").count() == 0
    assert url_dedup(urls, "url").count() == 0
    # empty question set through the subtask pipeline
    q0 = _empty(spark, "qid long, question string, subtasks_reqd boolean, "
                       "filters map<string,string>, task_id string")
    f0 = expand_formulas(q0, {"T": {"formulas": ["A = B"], "instructions": "i"}})
    assert f0.count() == 0
    assert attach_subtasks(f0, {"B": "find b. "}, filters_col="filters").count() == 0


def test_round9_operators_empty(spark):
    from sycamore_spark.operators.profiling import categorical_divergence
    from sycamore_spark.operators.retrieval import rrf_fuse
    from sycamore_spark.operators.sampling import sequence_pack
    from sycamore_spark.operators.similarity import check_cell_balance, ivf_pq_topk_multi

    docs = _empty(spark, "doc_id long, n_tokens long")
    assert sequence_pack(docs, "n_tokens", seq_len=8, order_col="doc_id").count() == 0
    # all-zero-token input: every row drops, no explode errors
    zeros = spark.createDataFrame([(1, 0), (2, 0)], "doc_id long, n_tokens long")
    assert sequence_pack(zeros, "n_tokens", seq_len=8, order_col="doc_id").count() == 0

    cells = _empty(spark, "vec_id long, cell_id int")
    assert check_cell_balance(cells) == 0.0  # no warning, no crash
    row = categorical_divergence(cells, cells, "cell_id").collect()[0]
    # empty-vs-empty: one row of nulls (corpus_divergence's empty contract)
    assert row.n_keys is None and row.kl_ab_nanos is None

    ranked = _empty(spark, "query_id long, vec_id long, rank int")
    assert rrf_fuse([ranked, ranked]).count() == 0

    # empty QUERY side through batch IVF-PQ: no probes -> empty result
    enc = _empty(spark, "vec_id long, cell_id int, pq_codes array<int>")
    q0 = _empty(spark, "query_id long, embedding array<double>")
    books = [[[0, 0], [1, 1]], [[0, 0], [1, 1]]]
    cents = [[0, 0, 0, 0]]
    out = ivf_pq_topk_multi(q0, enc, cents, books, k=3)
    assert out.count() == 0


def test_round10_session3_operators_empty(spark):
    from sycamore_spark.operators import textstats
    from sycamore_spark.operators.dedup import (
        contamination_spans,
        remove_token_spans,
        soft_dedup,
        split_leakage,
        winnowing_fingerprints,
        winnowing_overlap_pairs,
    )
    from sycamore_spark.operators.sampling import dsir_importance, dsir_select

    docs = _empty(spark, "doc_id long, text string")
    probe = spark.createDataFrame([(9, "a b c d e")], "doc_id long, text string")
    pairs = _empty(spark, "id_a long, id_b long")
    spans = _empty(spark, "doc_id long, span_start long, span_end long, n_hit_grams long")

    # empty corpus everywhere
    assert dsir_importance(docs, probe).count() == 0
    assert dsir_select(docs, probe, 5).count() == 0
    assert contamination_spans(docs, probe, min_len=4).count() == 0
    assert remove_token_spans(docs, spans).count() == 0
    assert winnowing_fingerprints(docs).count() == 0
    assert winnowing_overlap_pairs(docs).count() == 0
    assert soft_dedup(docs, pairs, "doc_id").count() == 0
    assert textstats.zipf_stats(_empty(spark, "doc_id long, lang string, text string"), "lang").count() == 0
    assert textstats.paragraph_lm_filter(docs).count() == 0

    # empty probe / empty pairs against a real corpus
    corpus = spark.createDataFrame(
        [(1, "one two three four five six")], "doc_id long, text string"
    )
    assert contamination_spans(corpus, docs, min_len=4).count() == 0
    cleaned = remove_token_spans(corpus, spans).collect()[0]
    assert cleaned.n_tokens_after == cleaned.n_tokens_before == 6
    sd = soft_dedup(corpus, pairs, "doc_id").collect()[0]
    assert sd.cluster_size == 1 and sd.kept
    split = corpus.withColumn("split", F.lit("train"))
    assert split_leakage(split, pairs, "split").count() == 0
    # empty target corpus: every raw weight is computable (target counts 0)
    w = dsir_importance(corpus, docs).collect()
    assert len(w) == 1 and w[0].n_features == 11


def test_round12_ops_on_empty_inputs(spark):
    from sycamore_spark.operators.calibrate import isotonic_apply, isotonic_fit
    from sycamore_spark.operators.sampling import bin_pack
    from sycamore_spark.operators.storesync import (
        assign_piece_ids,
        load_keys,
        store_sync,
        sync_stats,
    )

    esrc = _empty(spark, "doc_id string, mtime long")
    edest = _empty(spark, "doc_id string, parent_id string, doc_mtime long")
    emd = _empty(spark, "doc_id string, mtime long, sync_key string")
    assert store_sync(esrc, edest, emd).count() == 0
    assert sync_stats(store_sync(esrc, edest, emd)).count() == 0
    # empty source, live dest: every dest group purges
    dest = spark.createDataFrame(
        [("x1", None, 5)], "doc_id string, parent_id string, doc_mtime long"
    )
    plan = store_sync(esrc, dest, emd).collect()
    assert len(plan) == 1 and plan[0].status == "only_in_os"

    epieces = _empty(spark, "parent_id string, pos long, payload string")
    assert assign_piece_ids(epieces).count() == 0
    assert load_keys(
        assign_piece_ids(epieces).withColumn("mtime", F.lit(1).cast("long"))
    ).count() == 0

    edocs = _empty(spark, "id long, sz long")
    assert bin_pack(edocs, "sz", 128, "id").count() == 0

    ecal = _empty(spark, "score long, label long")
    model = isotonic_fit(ecal, "score", "label")
    assert model.count() == 0
    # empty model applied to live scores: calibrated is NULL (no steps)
    live = spark.createDataFrame([(1, 10)], "id long, score long")
    out = isotonic_apply(live, model, "score").collect()
    assert len(out) == 1 and out[0].calibrated_micros is None


def test_round13_session2_ops_on_empty_inputs(spark):
    """Every session-2 operator returns an empty (or contractual) frame on
    empty input instead of raising."""
    from sycamore_spark.operators.dedup import (
        embedding_decontaminate, instruction_pool_filter,
    )
    from sycamore_spark.operators.retrieval import maxsim_scores
    from sycamore_spark.operators.sampling import (
        anneal_schedule, doremi_weights, rho_select,
    )
    from sycamore_spark.operators.textstats import blocklist_match

    edocs = _empty(spark, "doc_id long, text string")
    esrc = _empty(spark, "doc_id long, text string, source string")
    live = spark.createDataFrame([(1, "some words here")], "doc_id long, text string")

    assert rho_select(edocs, edocs).count() == 0
    assert rho_select(live, edocs).count() == 0  # V=0 ref model still scores
    assert doremi_weights(esrc).count() == 0
    assert blocklist_match(edocs, ["bad"]).count() == 0
    assert instruction_pool_filter(edocs, live).count() == 0
    # empty POOL admits the whole batch (seed bootstrap)
    assert instruction_pool_filter(live, edocs).count() == 1

    evec = _empty(spark, "vec_id long, embedding array<double>")
    lvec = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    assert embedding_decontaminate(evec, lvec).count() == 0

    eplan = _empty(spark, "g string, w double")
    assert anneal_schedule(eplan, eplan, "g", "w", steps=3, anneal_start=1).count() == 0
    eq = _empty(spark, "query_id long, text string")
    assert maxsim_scores(eq, live).count() == 0
    assert maxsim_scores(live.withColumnRenamed("doc_id", "query_id"), edocs).count() == 0
