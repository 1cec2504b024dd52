"""BM25 lexical retrieval scoring (operators/retrieval.py)."""

import math

from sycamore_spark.operators.retrieval import bm25_scores


def _bm25_reference(docs, terms, k1=1.2, b=0.75):
    """Plain-Python Lucene BM25 over {id: text}, in integer micros."""
    toks = {i: t.lower().split() for i, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for term in terms:
        df = sum(1 for v in toks.values() if term in v)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for i, v in toks.items():
            tf = v.count(term)
            if tf == 0:
                continue
            dl = len(v)
            c = idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
            out[i] = out.get(i, 0) + math.floor(c * 1_000_000 + 0.5)
    return out


def test_bm25_matches_reference_formula(spark):
    docs = {
        1: "spark shuffle join broadcast join",
        2: "spark filter scan",
        3: "join join join hash table",
        4: "unrelated text entirely",
        5: "hash partition shuffle",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {r.doc_id: r.bm25_micros for r in bm25_scores(df, ["join", "hash"]).collect()}
    assert got == _bm25_reference(docs, ["join", "hash"])
    # only matching docs appear
    assert 4 not in got and 2 not in got


def test_bm25_rare_term_outscores_common(spark):
    """idf ordering: a doc matching a rare term beats a doc matching a
    ubiquitous one at equal tf/dl."""
    rows = [(i, "common filler words here") for i in range(20)]
    rows += [(100, "rare common filler here"), (101, "common filler also here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.bm25_micros for r in bm25_scores(df, ["rare", "common"]).collect()}
    assert got[100] > got[101]


def test_bm25_case_insensitive_and_empty_terms(spark):
    df = spark.createDataFrame([(1, "Hash JOIN plan")], "doc_id long, text string")
    got = {r.doc_id: r.bm25_micros for r in bm25_scores(df, ["HASH", "Join"]).collect()}
    assert 1 in got and got[1] > 0


def test_tfidf_topk_terms(spark):
    from sycamore_spark.operators.retrieval import tfidf_topk_terms

    docs = [
        (1, "apple apple banana common"),
        (2, "banana cherry common"),
        (3, "cherry durian common"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = tfidf_topk_terms(df, "doc_id", "text", k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.term))
    # doc 1: 'apple' (tf=2, df=1) must outrank everything
    assert sorted(by_doc[1])[0] == (1, "apple")
    # 'common' appears everywhere -> lowest idf, never rank 1
    assert all(terms[0][1] != "common" for terms in map(sorted, by_doc.values()))
    assert all(len(v) == 2 for v in by_doc.values())


def test_phrase_search_counts_and_positions(spark):
    from sycamore_spark.operators.retrieval import phrase_search

    docs = [
        (1, "the quick brown fox jumps"),          # 1 hit at 1
        (2, "quick brown quick brown fox"),        # 2 hits (0, 2)
        (3, "brown quick fox"),                    # reversed order: no hit
        (4, "quick"),                              # shorter than phrase
        (5, "QUICK Brown tail"),                   # case-insensitive hit at 0
        (6, ""),                                   # empty doc
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.n_hits, r.first_pos)
           for r in phrase_search(df, "Quick BROWN").collect()}
    assert got == {1: (1, 1), 2: (2, 0), 5: (1, 0)}


def test_phrase_search_overlapping_and_single_token(spark):
    from sycamore_spark.operators.retrieval import phrase_search

    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "b a b")], "doc_id long, text string"
    )
    # overlapping starts each count: "a a" in "a a a a" -> starts 0,1,2
    got = {r.doc_id: (r.n_hits, r.first_pos)
           for r in phrase_search(df, "a a").collect()}
    assert got == {1: (3, 0)}
    # single-token phrase degrades to term positions
    got1 = {r.doc_id: (r.n_hits, r.first_pos)
            for r in phrase_search(df, "a").collect()}
    assert got1 == {1: (4, 0), 2: (1, 1)}
    # empty phrase rejected
    import pytest

    with pytest.raises(ValueError):
        phrase_search(df, "   ")


def test_build_inverted_index_postings(spark):
    from sycamore_spark.operators.retrieval import build_inverted_index

    docs = [
        (1, "apple apple banana"),
        (2, "apple banana banana"),
        (3, "apple cherry"),
        (4, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = build_inverted_index(df).collect()
    by_term = {}
    for r in rows:
        by_term.setdefault(r.term, []).append((r.rank, r.doc_id, r.tf, r.df))
    # apple: df=3; doc 1 (tf=2) ranks first, then 2 and 3 (tf=1, id asc)
    assert sorted(by_term["apple"]) == [(1, 1, 2, 3), (2, 2, 1, 3), (3, 3, 1, 3)]
    # banana: doc 2 (tf=2) beats doc 1
    assert sorted(by_term["banana"]) == [(1, 2, 2, 2), (2, 1, 1, 2)]
    assert sorted(by_term["cherry"]) == [(1, 3, 1, 1)]
    assert "" not in by_term  # empty doc contributes nothing

    # min_df prunes hapax terms; top_docs prunes postings
    pruned = build_inverted_index(df, min_df=2, top_docs=1).collect()
    got = {(r.term, r.doc_id) for r in pruned}
    assert got == {("apple", 1), ("banana", 2)}


def test_maxsim_late_interaction(spark):
    """MaxSim ranks the morphologically-closest doc first (subword
    trigram vectors give partial credit for 'worlds'~'world',
    'sparkly'~'spark'); exact token matches score a full 1e6 each."""
    from sycamore_spark.operators.retrieval import maxsim_scores

    q = spark.createDataFrame(
        [(0, "hello world"), (1, "spark tables")], "query_id long, text string"
    )
    d = spark.createDataFrame(
        [
            (10, "hello worlds and more"),
            (11, "sparkly table data"),
            (12, "unrelated zq xv"),
        ],
        "doc_id long, text string",
    )
    out = {(r.query_id, r.rank): r for r in maxsim_scores(q, d, top_k=3).collect()}
    assert out[(0, 1)].doc_id == 10  # exact 'hello' + 'world'~'worlds'
    assert out[(0, 1)].maxsim_micros > 1_900_000  # ~1.0 + ~0.94
    assert out[(1, 1)].doc_id == 11
    assert out[(0, 3)].doc_id == 12 and out[(0, 3)].maxsim_micros < 600_000


def test_qlm_dirichlet_semantics(spark):
    """Query likelihood with Dirichlet smoothing: exact hand-computed
    score on a tiny corpus; OOV query terms drop; shorter matching doc
    beats longer with equal tf (length normalization)."""
    import math

    from sycamore_spark.operators.retrieval import qlm_scores

    docs = spark.createDataFrame(
        [(1, "cat dog"), (2, "cat dog bird fish frog newt"), (3, "bird bird")],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame([(0, "cat zzz-oov")], "query_id long, query string")
    out = {r.doc_id: r.qlm_micros for r in qlm_scores(docs, qs, mu=10.0).collect()}
    # |C| = 10 tokens, cf(cat) = 2; matched term: ln(1 + tf*10/(10*2))
    # doc length term (nq = 1 after the OOV drop): ln(10/(dl+10))
    def score(tf, dl):
        return (
            math.floor(math.log(1 + tf * 10 / (10 * 2)) * 1e6 + 0.5)
            + math.floor(math.log(10 / (dl + 10)) * 1e6 + 0.5)
        )

    assert out == {1: score(1, 2), 2: score(1, 6)}
    assert out[1] > out[2]  # same tf, shorter doc wins


def test_rm3_expansion_semantics(spark):
    """RM3: original terms always kept with weight >= orig_weight/|q|;
    expansion terms come from feedback docs' vocabulary, weighted by the
    relevance model; disjoint-vocabulary docs contribute nothing."""
    from sycamore_spark.operators.retrieval import rm3_expand

    docs = spark.createDataFrame(
        [
            (1, "cats love tuna fish"),
            (2, "cats chase mice often"),
            (3, "quantum flux capacitor hums"),
        ],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame([(0, "cats")], "query_id long, query string")
    out = rm3_expand(docs, qs, mu=10.0, fb_docs=2, fb_terms=3).collect()
    orig = [r for r in out if r.is_original == 1]
    exp = [r for r in out if r.is_original == 0]
    assert [r.term for r in orig] == ["cats"]
    # original term also appears in feedback docs -> weight > 0.5 * 1.0
    assert orig[0].weight_micros > 500_000
    # expansion terms only from the two feedback docs (1, 2), never doc 3
    fb_vocab = {"love", "tuna", "fish", "chase", "mice", "often", "cats"}
    assert exp and all(r.term in fb_vocab - {"cats"} for r in exp)
    assert all(0 < r.weight_micros < 500_000 for r in exp)
