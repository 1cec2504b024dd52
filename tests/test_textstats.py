

def test_gopher_filter_rules(spark):
    """Gopher/MassiveText quality-filter composition: each rule trips on a
    doc crafted to violate exactly it; a clean prose doc passes all."""
    from sycamore_spark.operators.textstats import gopher_filter

    # unique filler words -> every bigram distinct; stopword phrase once
    prose = "the be to of and that have with " + " ".join(
        f"word{i} item{i} thing{i}" for i in range(20)
    )
    docs = [
        (0, prose),                                     # clean: keep
        (1, "short text"),                              # too few words
        (2, " ".join(["antidisestablishmentarianism"] * 60)),  # mean word len high + no stopwords
        (3, prose + " " + "#" * 0 + " ".join(["#"] * 30)),     # symbol ratio
        (4, "\n".join(["- bullet line of the and to be"] * 20)),  # bullets
        (5, "\n".join([("we have that to be of " + str(i) + "...") for i in range(20)])),  # ellipsis ends
        (6, prose + " " + " ".join(["123456"] * 40)),   # alpha-word frac low
        (7, " ".join([f"w{i} x{i} y{i}" for i in range(40)])),  # no gopher stopwords
        (8, "\n".join(["the same line to be of and that have with more words here"] * 20)),  # dup lines+bigrams
        (9, " ".join(["the be to of"] * 40)),           # top/dup-bigram repetition
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in gopher_filter(df, min_words=20).collect()}
    assert out[0].gopher_keep
    assert not out[1].ok_word_count and not out[1].gopher_keep
    assert not out[2].ok_mean_word_len and not out[2].gopher_keep
    assert not out[3].ok_symbol_ratio and not out[3].gopher_keep
    assert not out[4].ok_bullet_lines and not out[4].gopher_keep
    assert not out[5].ok_ellipsis_lines and not out[5].gopher_keep
    assert not out[6].ok_alpha_words and not out[6].gopher_keep
    assert not out[7].ok_stopwords and not out[7].gopher_keep
    assert not out[8].ok_dup_lines and not out[8].gopher_keep
    assert not out[9].ok_top_bigram and not out[9].gopher_keep


def test_gopher_filter_empty_and_single_word(spark):
    from sycamore_spark.operators.textstats import gopher_filter

    df = spark.createDataFrame([(1, ""), (2, "word")], "doc_id long, text string")
    out = {r.doc_id: r for r in gopher_filter(df).collect()}
    assert not out[1].gopher_keep and not out[2].gopher_keep


def test_c4_clean_line_and_page_rules(spark):
    """C4 (Raffel 2020 §2.2): line keep = terminal punct + >=5 words + no
    badword; page keep = >=3 sentences and no '{' / 'lorem ipsum'."""
    from sycamore_spark.operators.textstats import c4_clean

    good = "\n".join([
        "this line has five good words.",
        "another proper sentence lives right here!",
        "does this one also count as kept?",
        "short line.",                       # <5 words -> dropped
        "no terminal punctuation on this line",  # dropped
        "the javascript menu requires scripts enabled.",  # badword -> dropped
    ])
    docs = [
        (0, good),                                    # keep: 3 lines survive
        (1, good + "\nsee the { code block here."),   # '{' -> page dropped
        (2, good.replace("words.", "words") ),        # still 2 sentences? no: line1 dropped -> 2 sentences -> dropped
        (3, "Lorem Ipsum dolor sit amet consectetur adipiscing elit."),  # marker (case-insensitive)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in c4_clean(df).collect()}
    assert out[0].c4_keep and out[0].n_lines_kept == 3 and out[0].n_sentences == 3
    assert not out[1].c4_keep          # page marker
    assert out[2].n_sentences == 2 and not out[2].c4_keep
    assert not out[3].c4_keep          # lorem ipsum, case-insensitive
    assert "javascript" not in out[0].c4_text
    assert "short line." not in out[0].c4_text


def test_c4_clean_quote_terminal_and_empty(spark):
    from sycamore_spark.operators.textstats import c4_clean

    df = spark.createDataFrame(
        [(1, 'he said "this is a fine quote."\nshe replied with many words too!\nthird sentence goes right here now.'),
         (2, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in c4_clean(df).collect()}
    assert out[1].c4_keep and out[1].n_lines_kept == 3
    assert not out[2].c4_keep and out[2].n_lines_kept == 0


def test_gopher_repetition_char_fractions(spark):
    """Hand-checked Gopher Table-A1 char-fraction semantics."""
    from sycamore_spark.operators.textstats import gopher_repetition

    # doc 1: "a b c a b c d" -> stream "a b c a b c d", len 13
    #   top2gram: "a b" x2 (chars 3*2=6) -> 6/13; dup 5-grams: none repeated
    # doc 2: all-identical tokens -> every n-gram duplicated, full coverage
    docs = [
        (1, "a b c a b c d"),
        (2, "x x x x x x x x x x x x"),  # 12 tokens, stream len 23
        (3, "p q r s t u v w"),          # all unique -> all zeros
        (4, "line one is here\nline two is here\nline one is here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in gopher_repetition(df).collect()}
    assert out[1].top2gram_char_frac == round(6 / 13, 6)
    # "a b c" x2 -> 2*5/13; "a b c a" once, "b c a b" once...
    assert out[1].top3gram_char_frac == round(10 / 13, 6)
    assert out[1].dup5gram_char_frac == 0.0
    assert out[2].dup5gram_char_frac == 1.0  # full stream covered
    assert out[2].dup10gram_char_frac == 1.0
    assert out[2].top2gram_char_frac == round(11 * 3 / 23, 6)
    assert out[3].top2gram_char_frac > 0  # most frequent has count 1 but chars count
    assert out[3].dup5gram_char_frac == 0.0
    # doc 4: 3 lines, one duplicated once: dup_line_frac=1/3; char frac =
    # 16 chars of the second occurrence / 50 text chars
    assert out[4].dup_line_frac == round(1 / 3, 6)
    assert out[4].dup_line_char_frac == round(16 / len(docs[3][1]), 6)


def test_gopher_repetition_paragraphs_and_empty(spark):
    from sycamore_spark.operators.textstats import gopher_repetition

    txt = "para one here\n\npara two here\n\npara one here"
    df = spark.createDataFrame([(1, txt), (2, "solo")], "doc_id long, text string")
    out = {r.doc_id: r for r in gopher_repetition(df).collect()}
    assert out[1].dup_para_frac == round(1 / 3, 6)
    assert out[1].dup_para_char_frac == round(13 / len(txt), 6)
    assert out[2].dup_para_frac == 0.0 and out[2].dup5gram_char_frac == 0.0


def test_gopher_repetition_randomized_vs_python_reference(spark):
    """Differential test on random corpora: the distributed pipeline's
    char fractions equal a direct pure-Python computation of the Gopher
    Table-A1 definitions (top-gram chars, union-of-spans coverage)."""
    import random

    from sycamore_spark.operators.textstats import gopher_repetition

    rnd = random.Random(42)
    docs = []
    for i in range(30):
        n = rnd.randint(1, 60)
        toks = [f"w{rnd.randint(0, rnd.choice([3, 8, 30]))}" for _ in range(n)]
        docs.append((i, " ".join(toks)))

    def ref(text):
        toks = text.lower().split()
        starts, off = [], 0
        for t in toks:
            starts.append(off)
            off += len(t) + 1
        total = max(off - 1, 1)
        out = {}
        for n in range(2, 11):
            grams = {}
            for j in range(len(toks) - n + 1):
                g = " ".join(toks[j : j + n])
                s = starts[j]
                e = starts[j + n - 1] + len(toks[j + n - 1])
                grams.setdefault(g, []).append((s, e))
            if n <= 4:
                top = 0
                for g, occ in grams.items():
                    top = max(top, len(occ) * len(g))
                out[f"top{n}gram_char_frac"] = round(top / total, 6) if grams else 0.0
            else:
                spans = sorted(
                    sp for occ in grams.values() if len(occ) > 1 for sp in occ
                )
                cov, mx = 0, -1
                for s, e in spans:
                    cov += max(0, e - max(s, mx))
                    mx = max(mx, e)
                out[f"dup{n}gram_char_frac"] = round(cov / total, 6)
        return out

    got = {r.doc_id: r.asDict() for r in gopher_repetition(
        spark.createDataFrame(docs, "doc_id long, text string").repartition(7)
    ).collect()}
    for i, text in docs:
        want = ref(text)
        for k, v in want.items():
            assert got[i][k] == v, (i, k, got[i][k], v, text)


def test_blocklist_match_vs_bruteforce(spark):
    """AC automaton counts == exhaustive substring scan on random texts
    over a tiny alphabet (dense overlaps, nested patterns, shared
    prefixes/suffixes); edge contracts: empty list, empty phrase."""
    import random

    import pytest

    from sycamore_spark.operators.textstats import blocklist_match

    phrases = ["ab", "aba", "ba", "aa", "b", "abab"]
    rnd = random.Random(11)
    docs = [(i, "".join(rnd.choice("ab") for _ in range(rnd.randint(0, 40))))
            for i in range(25)]
    out = {}
    for r in blocklist_match(
        spark.createDataFrame(docs, "doc_id long, text string").repartition(5),
        phrases,
    ).collect():
        out[(r.doc_id, r.phrase)] = r.n_matches
    for i, t in docs:
        for p in phrases:
            want = sum(1 for j in range(len(t) - len(p) + 1) if t[j:j + len(p)] == p)
            assert out.get((i, p), 0) == want, (i, p, t)
    empty = blocklist_match(
        spark.createDataFrame(docs, "doc_id long, text string"), []
    )
    assert empty.count() == 0 and empty.columns == ["doc_id", "phrase", "n_matches"]
    with pytest.raises(ValueError):
        blocklist_match(spark.createDataFrame(docs, "doc_id long, text string"), ["ok", ""])
