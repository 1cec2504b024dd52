"""Retrieval-metrics semantics on hand-built rankings."""

import math

from sycamore_spark.evaluation import retrieval_metrics


def test_retrieval_metrics_known_values(spark):
    # query A: relevant at ranks 1 and 3 (of 4); query B: nothing relevant
    rows = [
        ("A", 1, 1), ("A", 2, 0), ("A", 3, 1), ("A", 4, 0),
        ("B", 1, 0), ("B", 2, 0),
    ]
    df = spark.createDataFrame(rows, "query_id string, rank int, rel int")
    out = {r.query_id: r for r in retrieval_metrics(df, k=10).collect()}

    a = out["A"]
    assert a.n_retrieved == 4 and a.n_relevant == 2 and a.hits_at_k == 2
    assert a.mrr_micros == 1_000_000  # first relevant at rank 1
    # DCG = 1/log2(2) + 1/log2(4) = 1.0 + 0.5; IDCG = 1/log2(2) + 1/log2(3)
    assert a.dcg_micros == 1_000_000 + 500_000
    expected_idcg = 1_000_000 + math.floor(1_000_000 * math.log(2) / math.log(4) + 0.5)
    assert a.idcg_micros == 1_000_000 + math.floor(1_000_000 * math.log(2) / math.log(3) + 0.5)
    assert abs(a.ndcg - a.dcg_micros / a.idcg_micros) < 1e-15

    b = out["B"]
    assert b.n_relevant == 0 and b.mrr_micros == 0 and b.ndcg == 0.0


def test_retrieval_metrics_k_cutoff(spark):
    # relevant doc at rank 11 is outside k=10: counts toward n_relevant
    # but not hits/dcg
    rows = [("Q", i, 1 if i == 11 else 0) for i in range(1, 12)]
    df = spark.createDataFrame(rows, "query_id string, rank int, rel int")
    r = retrieval_metrics(df, k=10).collect()[0]
    assert r.n_relevant == 1 and r.hits_at_k == 0 and r.dcg_micros == 0
    assert r.mrr_micros == math.floor(1_000_000 / 11 + 0.5)
    assert r.idcg_micros == 1_000_000  # ideal puts it at rank 1
    assert r.ndcg == 0.0


def test_rouge_n_clipped_counts(spark):
    from sycamore_spark.evaluation import rouge_n_scores

    df = spark.createDataFrame(
        [(1, "the cat sat on the mat", "the cat lay on the mat")],
        ["doc_id", "gen", "ref"],
    )
    r1 = rouge_n_scores(df, "gen", "ref", n=1).first()
    # clipped unigram matches: the:2 cat:1 on:1 mat:1 = 5 of 6
    assert (r1.match_1, r1.gen_n, r1.ref_n) == (5, 6, 6)
    assert r1.recall_micros == 833333 and r1.f1_micros == 833333
    r2 = rouge_n_scores(df, "gen", "ref", n=2).first()
    # shared bigrams: the_cat, on_the, the_mat = 3 of 5
    assert (r2.match_2, r2.gen_n, r2.ref_n) == (3, 5, 5)
    assert r2.f1_micros == 600000


def test_rouge_disjoint_and_identical(spark):
    from sycamore_spark.evaluation import rouge_n_scores

    df = spark.createDataFrame(
        [(1, "a b c", "x y z"), (2, "same words here", "same words here")],
        ["doc_id", "gen", "ref"],
    )
    out = {r.doc_id: r for r in rouge_n_scores(df, "gen", "ref", n=1).collect()}
    assert out[1].f1_micros == 0
    assert out[2].f1_micros == 1_000_000


def test_cer_and_wer_known_values(spark):
    from sycamore_spark.evaluation import cer_scores, wer_scores

    df = spark.createDataFrame(
        [(1, "the cat sat", "the cot sat"),      # 1 char sub; 1 word sub
         (2, "a b c d", "a b c"),                # 1 word deletion
         (3, "", "anything")],
        ["doc_id", "ref", "hyp"],
    )
    c = {r.doc_id: r for r in cer_scores(df, "ref", "hyp").collect()}
    assert c[1].edit_distance == 1 and c[1].cer_micros == round(1 / 11 * 1e6)
    assert c[3].cer_micros is None
    w = {r.doc_id: r for r in wer_scores(df, "ref", "hyp").collect()}
    assert w[1].word_distance == 1 and w[1].wer_micros == 333333
    assert w[2].word_distance == 1 and w[2].ref_words == 4 and w[2].wer_micros == 250000


def test_rouge_l_known_values(spark):
    """Hand-checked LCS values: reordering breaks contiguity but not
    subsequence matches; identical -> F1 = 1e6; disjoint -> 0; empty
    reference -> NULL recall (mirrors rouge_n NULL semantics)."""
    from sycamore_spark.evaluation import rouge_l_scores

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat", "the cat sat on the mat"),
            (2, "police killed the gunman", "the gunman police killed"),
            (3, "a b c", "x y z"),
            (4, "a b", ""),
        ],
        "doc_id long, gen string, ref string",
    )
    out = {r.doc_id: r for r in rouge_l_scores(df, "gen", "ref").collect()}
    assert out[1].lcs_len == 6 and out[1].f1_micros == 1_000_000
    # LCS("police killed the gunman", "the gunman police killed") = 2
    # ("police killed" or "the gunman" as subsequences)
    assert out[2].lcs_len == 2 and out[2].f1_micros == 500_000
    assert out[3].lcs_len == 0 and out[3].f1_micros == 0
    # empty ref string tokenizes to [''] (one empty token), no match
    assert out[4].lcs_len == 0 and out[4].ref_n == 1


def test_lcs_len_reference(spark):
    """_lcs_len against a brute-force subsequence check on random pairs."""
    import itertools
    import random

    from sycamore_spark.evaluation import _lcs_len

    rnd = random.Random(7)

    def brute(a, b):
        best = 0
        for r in range(len(a), 0, -1):
            for combo in itertools.combinations(range(len(a)), r):
                sub = [a[i] for i in combo]
                it = iter(b)
                if all(x in it for x in sub):
                    return r
        return best

    for _ in range(40):
        a = [rnd.choice("abc") for _ in range(rnd.randint(0, 7))]
        b = [rnd.choice("abc") for _ in range(rnd.randint(0, 7))]
        assert _lcs_len(a, b) == brute(a, b), (a, b)
