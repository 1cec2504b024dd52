"""Round-6 additions: page rotation normalization (reference
utils/rotation.py) and the evaluation subtask executor
(reference evaluation/subtasks.py)."""

import math

import pytest
from pyspark.sql import functions as F


def test_rot_bbox_expr_quads(spark):
    from sycamore_spark.operators.elements import rot_bbox_expr

    df = spark.createDataFrame([([0.1, 0.2, 0.4, 0.5],)], "bbox array<double>")
    got = {
        q: df.select(rot_bbox_expr(F.col("bbox"), F.lit(q)).alias("r")).first().r
        for q in (0, 1, 2, 3, 4, -1)
    }
    # reference rot_xy: q1 (x,y)->(y,1-x); q2 ->(1-x,1-y); q3 ->(1-y,x)
    assert got[0] == [0.1, 0.2, 0.4, 0.5]
    assert got[1] == pytest.approx([0.2, 0.6, 0.5, 0.9])
    assert got[2] == pytest.approx([0.6, 0.5, 0.9, 0.8])
    assert got[3] == pytest.approx([0.5, 0.1, 0.8, 0.4])
    assert got[4] == got[0]
    assert got[-1] == got[3]  # python-mod semantics for negatives


def test_rot_bbox_expr_roundtrip(spark):
    from sycamore_spark.operators.elements import rot_bbox_expr

    df = spark.createDataFrame([([0.12, 0.3, 0.77, 0.61],)], "bbox array<double>")
    for q in (1, 2, 3):
        back = df.select(
            rot_bbox_expr(rot_bbox_expr(F.col("bbox"), F.lit(q)), F.lit((4 - q) % 4)).alias("r")
        ).first().r
        assert back == pytest.approx([0.12, 0.3, 0.77, 0.61])


def test_normalize_rotation_detects_and_restores(spark):
    from sycamore_spark.operators.elements import normalize_rotation, rot_bbox_expr

    rows = []
    for doc in range(8):
        quad = doc % 4
        for e in range(5):
            jit = ((doc * 3 + e) % 11 - 5) / 50.0  # +-0.1 rad
            ang = quad * math.pi / 2 + jit
            rows.append((doc, e, [0.1, 0.1 + e * 0.15, 0.4, 0.2 + e * 0.15],
                         math.cos(ang), math.sin(ang)))
    df = spark.createDataFrame(rows, "doc_id long, e int, up array<double>, vx double, vy double")
    scanned = df.select(
        "doc_id", "e", "vx", "vy",
        rot_bbox_expr(F.col("up"), (F.col("doc_id") % 4).cast("int")).alias("bbox"),
        F.col("up"),
    )
    out = normalize_rotation(scanned)
    rws = out.collect()
    assert all(r.rotation_quad == r.doc_id % 4 for r in rws)
    for r in rws:
        assert list(r.bbox_upright) == pytest.approx(list(r.up))


def test_normalize_rotation_mixed_directions_no_rotation(spark):
    from sycamore_spark.operators.elements import normalize_rotation

    # opposing vectors cancel: |mean| < thres -> quad 0, bbox untouched
    rows = [(1, 0, [0.1, 0.1, 0.5, 0.3], 1.0, 0.0), (1, 1, [0.1, 0.4, 0.5, 0.6], -1.0, 0.0)]
    df = spark.createDataFrame(rows, "doc_id long, e int, bbox array<double>, vx double, vy double")
    out = normalize_rotation(df).collect()
    assert all(r.rotation_quad == 0 for r in out)
    assert all(list(r.bbox_upright) == list(r.bbox) for r in out)


def test_subtask_pipeline_matches_reference_shape(spark):
    """Mirror reference subtasks.py semantics: subtasks_reqd gate, task
    fan-out to formulas (empty formulas -> one empty row), term matching
    in formula text, template substitution from filters, literal query
    suffix."""
    from sycamore_spark.evaluation import (
        attach_subtasks, expand_formulas, keyword_task_case,
    )

    data = {
        "task_descriptions": {"REV": "revenue analysis", "AST": "asset analysis"},
        "task_formulas": {
            "REV": {"formulas": ["NETREV = GROSSREV - RETURNS"], "instructions": "Use {year}. "},
            "AST": {"formulas": [], "instructions": "Assets only. "},
        },
        "subtask_instructions": {
            "GROSSREV": "Find gross revenue in {year}. ",
            "RETURNS": "Find returns in {year}. ",
        },
    }
    qs = spark.createDataFrame(
        [
            (1, "What is the revenue this year?", True, {"year": "2021"}),
            (2, "What is the asset base this year?", True, {"year": "2022"}),
            (3, "What is the revenue this year?", False, {"year": "2023"}),  # not reqd
            (4, "What about the weather?", True, {"year": "2024"}),          # no task
        ],
        "qid long, question string, subtasks_reqd boolean, filters map<string,string>",
    )
    qs = qs.withColumn(
        "task_id", keyword_task_case(data["task_descriptions"], F.col("question"))
    ).filter(F.col("task_id").isNotNull())
    formulas = expand_formulas(qs, data["task_formulas"])
    frows = {(r.qid, r.formula_index): (r.formula, r.instructions) for r in formulas.collect()}
    # q1 -> REV formula; q2 -> AST empty-formula row (reference lines 67-72);
    # q3 dropped by subtasks_reqd; q4 dropped by task identification
    assert frows == {
        (1, 0): ("NETREV = GROSSREV - RETURNS", "Use {year}. "),
        (2, 0): ("", "Assets only. "),
    }
    subs = attach_subtasks(formulas, data["subtask_instructions"], filters_col="filters")
    srows = {(r.qid, r.term): r.subtask for r in subs.collect()}
    assert srows == {
        (1, "GROSSREV"): "Find gross revenue in 2021. Return only the code GROSSREV "
                         "alongside the amount found and no additional information.",
        (1, "RETURNS"): "Find returns in 2021. Return only the code RETURNS "
                        "alongside the amount found and no additional information.",
    }


def test_bm25_multi_agrees_with_single(spark):
    from sycamore_spark.operators.retrieval import bm25_scores, bm25_scores_multi

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple cherry"),
            (2, "banana cherry durian"),
            (3, "apple apple apple"),
            (4, "elderberry fig"),
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(10, "apple banana apple"), (11, "fig")], "query_id long, query string"
    )
    multi = {
        (r.query_id, r.doc_id): r.bm25_micros
        for r in bm25_scores_multi(docs, queries).collect()
    }
    # per-query equivalence with the single-query op (which takes a term SET)
    for qid, terms in ((10, ["apple", "banana"]), (11, ["fig"])):
        single = {r.doc_id: r.bm25_micros for r in bm25_scores(docs, terms).collect()}
        got = {d: s for (q, d), s in multi.items() if q == qid}
        assert got == single, qid


def test_bm25_multi_topk(spark):
    from sycamore_spark.operators.retrieval import bm25_scores_multi

    docs = spark.createDataFrame(
        [(i, "term " * (i + 1)) for i in range(6)], "doc_id long, text string"
    )
    out = bm25_scores_multi(
        docs, spark.createDataFrame([(1, "term")], "query_id long, query string"), k=3
    ).collect()
    assert len(out) == 3


def test_duplicate_spans_exact(spark):
    """Lee-et-al n-gram span dedup: overlapping dup grams merge to one
    maximal span; the corpus-wide first occurrence is canonical; unique
    docs produce nothing."""
    from sycamore_spark.operators.dedup import duplicate_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j k l unique1 unique2"),
            (2, "x y a b c d e f g h i j other words here now"),
            (3, "no repeats in this document at all whatsoever ok"),
        ],
        "doc_id long, text string",
    )
    out = sorted(tuple(r) for r in duplicate_spans(docs, min_len=8).collect())
    # shared run "a b .. j" (10 tokens): doc1 tokens 0..9 (canonical,
    # smaller (doc,pos)), doc2 tokens 2..11
    assert out == [(1, 0, 10, 3, 1), (2, 2, 12, 3, 0)]


def test_duplicate_spans_two_islands(spark):
    from sycamore_spark.operators.dedup import duplicate_spans

    shared1 = "p q r s t u v w"        # 8 tokens
    shared2 = "h i j k l m n o"        # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, shared1 + " gapone gaptwo gapthree " + shared2),
            (2, shared1 + " totally different middle content here " + shared2),
        ],
        "doc_id long, text string",
    )
    out = sorted(tuple(r) for r in duplicate_spans(docs, min_len=8).collect())
    # each doc: two separate islands of exactly one gram each
    assert out == [
        (1, 0, 8, 1, 1), (1, 11, 19, 1, 1),
        (2, 0, 8, 1, 0), (2, 13, 21, 1, 0),
    ]


def test_url_canonicalization_variants_collide(spark):
    from sycamore_spark.operators.web import canonical_urls, url_dedup

    urls = [
        (1, "HTTP://WWW.Example.COM:80/a/b/?b=2&utm_source=x&a=1#frag"),
        (2, "http://example.com/a/b?a=1&b=2"),
        (3, "https://example.com/a/b?a=1&b=2"),     # different scheme: distinct
        (4, "example.com/a/b?a=1&b=2"),             # schemeless -> http
        (5, "http://shop.example.co.uk:8080/"),
    ]
    df = spark.createDataFrame(urls, "doc_id long, url string")
    got = {r.doc_id: (r.canonical_url, r.domain) for r in canonical_urls(df, "url").collect()}
    assert got[1] == ("http://example.com/a/b?a=1&b=2", "example.com")
    assert got[2] == got[1]
    assert got[4] == got[1]
    assert got[3][0] == "https://example.com/a/b?a=1&b=2"
    assert got[5] == ("http://shop.example.co.uk:8080", "example.co.uk")
    kept = sorted(r.doc_id for r in url_dedup(df, "url").collect())
    assert kept == [1, 3, 5]  # 2 and 4 collapse into 1 (min id wins)


def test_registered_domain_heuristics(spark):
    from pyspark.sql import functions as F

    from sycamore_spark.operators.web import registered_domain_expr

    df = spark.createDataFrame(
        [("a.b.example.com",), ("example.co.uk",), ("localhost",),
         ("https://deep.sub.gov.au/x",), ("example.company",)],
        "h string",
    )
    got = [r.d for r in df.select(registered_domain_expr(F.col("h")).alias("d")).collect()]
    # .company is a long TLD: two labels, no three-label rule
    assert got == ["example.com", "example.co.uk", "localhost", "sub.gov.au", "example.company"]


def test_subtask_task_identification_via_llm_seam(spark):
    """The reference identifies the task with an LLM
    (subtasks.py:47); here the same seam runs through llm_map with a
    MockLLM whose rules answer the task-identification prompt — the
    downstream formula fan-out only sees the task-id column, so the
    keyword CASE and the LLM route are interchangeable."""
    from sycamore_spark.evaluation import expand_formulas
    from sycamore_spark.llm.client import MockLLM
    from sycamore_spark.llm.map import llm_map

    qs = spark.createDataFrame(
        [(1, "What was net revenue last quarter?", True),
         (2, "List the asset classes held.", True)],
        "qid long, question string, subtasks_reqd boolean",
    )
    factory = lambda: MockLLM(rules=[(r"revenue", "REV"), (r"asset", "AST")])  # noqa: E731
    tagged = llm_map(
        qs,
        "Identify the task for: {{ doc.question }}",
        "task_id",
        factory,
    )
    out = expand_formulas(
        tagged,
        {"REV": {"formulas": ["NETREV = GROSSREV - RETURNS"], "instructions": "i1"},
         "AST": {"formulas": ["TOTAST = CURAST + FIXAST"], "instructions": "i2"}},
    )
    got = {(r.qid, r.formula): r.instructions for r in out.collect()}
    assert got == {
        (1, "NETREV = GROSSREV - RETURNS"): "i1",
        (2, "TOTAST = CURAST + FIXAST"): "i2",
    }


def test_predicate_dsl_compile(spark):
    """Reference utils/predicates.py grammar compiled to Columns: type
    ops, the inverted `like` quirk, compound AND/OR, and compile-time
    SyntaxError for invalid expressions."""
    import pytest as _pytest

    from sycamore_spark.functions.filters import compile_predicate

    df = spark.createDataFrame(
        [("click", 10.0, True), ("view", 60.0, False), ("purchase", 99.0, True)],
        "t string, v double, b boolean",
    )

    def n(c):
        return df.filter(c).count()

    assert n(compile_predicate("x > 50.0", F.col("v"), "float")) == 2
    assert n(compile_predicate("x == 'click'", F.col("t"), "string")) == 1
    # inverted like: column must be a substring of the literal
    assert n(compile_predicate("x like 'super-click-stream'", F.col("t"), "string")) == 1
    assert n(compile_predicate(
        "(x like 'view-purchase') AND (x != 'view')", F.col("t"), "string")) == 1
    assert n(compile_predicate(
        "(x == 'click') OR (x == 'view')", F.col("t"), "string")) == 2
    assert n(compile_predicate("x == True", F.col("b"), "bool")) == 2
    for bad in ("y > 1", "x >", "x ~ 1", "(x == 'a') NAND (x == 'b')", "x is 'a'"):
        with _pytest.raises(SyntaxError):
            compile_predicate(bad, F.col("t"), "string")


def test_temperature_mixture_plan(spark):
    from sycamore_spark.operators.sampling import temperature_mixture

    df = spark.createDataFrame(
        [(i, "hi" if i < 90 else "lo") for i in range(100)], "id long, lang string"
    )
    out = {r.stratum: r for r in temperature_mixture(df, "lang", alpha=0.5).collect()}
    # closed form: keep_j = sqrt(n_min / n_j); scarcest stratum keeps all
    assert out["lo"].keep_fraction == 1.0 and out["lo"].expected_rows == 10
    assert out["hi"].keep_micros == 333333  # sqrt(10/90) = 1/3
    assert out["hi"].expected_rows == 30
    # alpha=1 keeps the natural mixture (everything)
    nat = {r.stratum: r.keep_fraction for r in temperature_mixture(df, "lang", alpha=1.0).collect()}
    assert nat == {"hi": 1.0, "lo": 1.0}
    # alpha=0 equalizes counts
    uni = {r.stratum: r.expected_rows for r in temperature_mixture(df, "lang", alpha=0.0).collect()}
    assert uni == {"hi": 10, "lo": 10}


def test_best_snippets_picks_densest_window(spark):
    from sycamore_spark.operators.retrieval import best_snippets

    docs = spark.createDataFrame(
        [(1, "x x x apple x x x x x x x apple banana apple x x"),
         (2, "no fruit words here at all")],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame([(7, "apple banana")], "query_id long, query string")
    out = best_snippets(docs, qs, window=5).collect()
    assert len(out) == 1  # doc 2 matches nothing
    r = out[0]
    # densest 5-token window starts at the 2nd apple (pos 11): apple banana apple
    assert (r.query_id, r.doc_id, r.snippet_start, r.hits) == (7, 1, 11, 3)
    assert r.snippet == "apple banana apple x x"


def test_bm25_multi_max_df_prunes_ubiquitous_terms(spark):
    """max_df drops query terms above the df threshold BEFORE scoring:
    a stopword present in every doc contributes nothing; rare terms score;
    keep_rank without k emits ranks over the full result."""
    from sycamore_spark.operators.retrieval import bm25_scores_multi

    docs = spark.createDataFrame(
        [(i, "the common filler rare%d" % (i % 2)) for i in range(6)],
        "doc_id bigint, text string",
    )
    qs = spark.createDataFrame(
        [(1, "the rare0"), (2, "the rare1")], "query_id bigint, query string"
    )
    exact = bm25_scores_multi(docs, qs).collect()
    assert {r.doc_id for r in exact} == set(range(6))  # 'the' matches all
    pruned = bm25_scores_multi(docs, qs, max_df=4).collect()
    # 'the' (df=6) pruned; each query matches only its rare half
    got = {(r.query_id, r.doc_id) for r in pruned}
    assert got == {(1, d) for d in (0, 2, 4)} | {(2, d) for d in (1, 3, 5)}
    ranked = bm25_scores_multi(docs, qs, max_df=4, keep_rank=True).collect()
    assert {r.rank for r in ranked} == {1, 2, 3}  # honored without k
