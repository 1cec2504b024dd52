"""BPE tokenizer training/encoding vs a pure-Python canonical reference
(Sennrich-style: count adjacent pairs over word types weighted by frequency,
merge the argmax greedily left-to-right, repeat)."""

from collections import Counter

import pytest

from sycamore_spark.operators.bpe import bpe_encode, bpe_train, word_frequencies


def python_bpe(texts, num_merges):
    wf = Counter()
    for t in texts:
        for w in t.strip().lower().split():
            wf[w] += 1
    vocab = {tuple(w): f for w, f in wf.items()}
    merges = []
    for rnd in range(1, num_merges + 1):
        pairs = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rnd, a, b, a + b, cnt))
        nxt = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            nxt[key] = nxt.get(key, 0) + f
        vocab = nxt
    return merges, vocab


def python_encode(text, merges):
    toks = []
    for w in text.strip().lower().split():
        syms = list(w)
        for _, a, b, _, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        toks.extend(syms)
    return toks


CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "low lower lowest newer newest wider widest",
    "aaaaa aaa aa a banana bandana",  # repeated-symbol runs: the greedy edge
    "mississippi mississippi river",
    "",
    "   ",
]


@pytest.fixture()
def corpus_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def test_word_frequencies(spark, corpus_df):
    got = {r.w: r.f for r in word_frequencies(corpus_df).collect()}
    want = Counter(w for t in CORPUS for w in t.strip().lower().split())
    assert got == dict(want)


def test_bpe_train_matches_canonical_reference(spark, corpus_df):
    want, _ = python_bpe(CORPUS, 12)
    got = bpe_train(corpus_df, num_merges=12, cut_every=3)
    assert [(m["round"], m["left"], m["right"], m["merged"], m["pair_count"]) for m in got] == want


def test_bpe_train_repeated_symbol_runs(spark):
    # "aaaaa": canonical greedy gives [aa, aa, a] after merging (a,a) —
    # the double-space layout must reproduce that, not [aa, a, aa]-style
    # shared-delimiter grouping (which diverges in later pair counts).
    df = spark.createDataFrame([(0, "aaaaa aaaa aaa")], "doc_id long, text string")
    want, _ = python_bpe(["aaaaa aaaa aaa"], 3)
    got = bpe_train(df, num_merges=3)
    assert [(m["round"], m["left"], m["right"], m["merged"], m["pair_count"]) for m in got] == want


def test_bpe_train_early_stop(spark):
    df = spark.createDataFrame([(0, "a b c a b")], "doc_id long, text string")
    got = bpe_train(df, num_merges=10)
    assert got == []  # all words are single symbols: no pairs, round 1 stops


def test_bpe_encode_matches_canonical_reference(spark, corpus_df):
    merges = bpe_train(corpus_df, num_merges=10)
    got = {r.doc_id: (r.bpe_tokens, r.words) for r in bpe_encode(corpus_df, merges).collect()}
    py_merges, _ = python_bpe(CORPUS, 10)
    assert len(py_merges) == 10
    for i, t in enumerate(CORPUS):
        toks = python_encode(t, py_merges)
        assert got[i] == (len(toks), len(t.strip().lower().split())), (i, t)


def test_bpe_encode_no_merges_counts_chars(spark, corpus_df):
    got = {r.doc_id: r.bpe_tokens for r in bpe_encode(corpus_df, []).collect()}
    for i, t in enumerate(CORPUS):
        assert got[i] == sum(len(w) for w in t.strip().lower().split())


def test_bpe_train_rejects_bad_args(spark, corpus_df):
    with pytest.raises(ValueError):
        bpe_train(corpus_df, num_merges=0)


def test_tokenizer_fertility_groups(spark):
    """Fertility = subword tokens per word, per group: with zero merges
    every char is a token, so fertility = chars/words exactly; a group
    with no words gets NULL."""
    from sycamore_spark.operators.bpe import tokenizer_fertility

    df = spark.createDataFrame(
        [
            (1, "ab cd", "en"),    # 4 chars / 2 words
            (2, "abc", "en"),      # 3 chars / 1 word
            (3, "xy", "fr"),       # 2 chars / 1 word
            (4, "   ", "zz"),      # no words
        ],
        "doc_id long, text string, lang string",
    )
    out = {r.lang: r for r in tokenizer_fertility(df, [], "lang").collect()}
    assert out["en"].bpe_tokens == 7 and out["en"].words == 3
    assert out["en"].fertility_micros == int(7 / 3 * 1e6 + 0.5)
    assert out["fr"].fertility_micros == 2_000_000
    assert out["zz"].words == 0 and out["zz"].fertility_micros is None
