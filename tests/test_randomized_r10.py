"""Randomized cross-checks for the round-10 session-3 operators:
brute-force references computed in plain Python on small random inputs
(seeded — deterministic)."""

import hashlib
import random

from pyspark.sql import functions as F


def _winnow_brute(tokens, k, w):
    grams = [
        hashlib.md5("\x1f".join(tokens[i : i + k]).encode()).hexdigest()
        for i in range(len(tokens) - k + 1)
    ]
    sel = set()
    for s in range(0, len(grams) - w + 1):
        win = grams[s : s + w]
        mn = min(win)
        pos = max(i for i, g in enumerate(win) if g == mn) + s
        sel.add((pos, mn))
    return sel


def test_winnowing_randomized_matches_bruteforce_and_guarantee(spark):
    """Random corpora with planted shared runs: the Spark sketch equals the
    per-doc brute force AND any >= w+k-1 shared run shares a hash."""
    from sycamore_spark.operators.dedup import winnowing_fingerprints

    rng = random.Random(7)
    vocab = [f"v{i}" for i in range(30)]
    k, w = 3, 4
    run = [rng.choice(vocab) for _ in range(k + w - 1)]  # minimal guaranteed run
    corpus = {}
    planted = []
    for d in range(14):
        toks = [rng.choice(vocab) for _ in range(rng.randint(k, 25))]
        if d % 4 == 0 and len(toks) >= 1:
            at = rng.randint(0, len(toks))
            toks = toks[:at] + run + toks[at:]
            planted.append(d)
        corpus[d] = toks
    docs = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in corpus.items()], "doc_id long, text string"
    )
    got = {}
    for r in winnowing_fingerprints(docs, k=k, w=w).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.gh))
    for d, toks in corpus.items():
        assert got.get(d, set()) == _winnow_brute(toks, k, w), d
    hashes = {d: {h for _, h in s} for d, s in got.items()}
    for a in planted:
        for b in planted:
            if a < b:
                assert hashes[a] & hashes[b], (a, b)


def test_remove_token_spans_arithmetic_randomized(spark):
    """contamination_spans yields disjoint maximal spans; removal token
    arithmetic: n_after = n_before - sum(span lengths). Verified on random
    corpora with randomly planted probe phrases."""
    from sycamore_spark.operators.dedup import (
        contamination_spans,
        remove_token_spans,
    )

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(40)]
    probe = [rng.choice(vocab) for _ in range(9)]
    rows = []
    for d in range(15):
        toks = [rng.choice(vocab) for _ in range(rng.randint(4, 30))]
        if d % 3 == 1:
            at = rng.randint(0, len(toks))
            toks = toks[:at] + probe + toks[at:]
        rows.append((d, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    probes = spark.createDataFrame([(99, " ".join(probe))], "doc_id long, text string")
    spans = contamination_spans(docs, probes, min_len=4)
    by_doc = {}
    for r in spans.collect():
        by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    for d, sp in by_doc.items():
        sp.sort()
        for (s1, e1), (s2, e2) in zip(sp, sp[1:]):
            assert e1 < s2, (d, sp)  # disjoint, non-adjacent (maximal)
    cleaned = {r.doc_id: r for r in remove_token_spans(docs, spans).collect()}
    for d, r in cleaned.items():
        cut = sum(e - s for s, e in by_doc.get(d, []))
        assert r.n_tokens_after == r.n_tokens_before - cut, d
        assert len(r.clean_text.split()) == r.n_tokens_after or r.clean_text == ""


def test_soft_dedup_expected_copies_tracks_cluster_count(spark):
    """Across random cluster layouts the deterministic kept-count per
    cluster is 0..size, singletons always kept, and the md5 selection is
    reproducible across partitionings."""
    from sycamore_spark.operators.dedup import soft_dedup

    rng = random.Random(5)
    rows, pairs, next_id = [], [], 0
    sizes = [rng.randint(1, 8) for _ in range(12)]
    for sz in sizes:
        ids = list(range(next_id, next_id + sz))
        next_id += sz
        rows += [(i, f"text {i}") for i in ids]
        pairs += [(ids[0], j) for j in ids[1:]]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pdf = spark.createDataFrame(pairs or [(0, 0)], "id_a long, id_b long")
    if not pairs:
        pdf = pdf.filter(F.col("id_a") != F.col("id_a"))
    out = soft_dedup(docs, pdf, "doc_id").collect()
    by_comp = {}
    for r in out:
        by_comp.setdefault(r.component, []).append(r)
    assert sum(len(v) for v in by_comp.values()) == sum(sizes)
    for comp, members in by_comp.items():
        sz = members[0].cluster_size
        assert len(members) == sz
        kept = sum(1 for m in members if m.kept)
        if sz == 1:
            assert kept == 1
        assert 0 <= kept <= sz
    again = soft_dedup(docs.repartition(9), pdf.coalesce(1), "doc_id").collect()
    assert sorted((r.doc_id, r.kept) for r in again) == sorted(
        (r.doc_id, r.kept) for r in out
    )


def test_dsir_weight_is_exact_bigint_dot_product(spark):
    """The Spark weight equals a plain-Python recomputation of the hashed
    bucket counts and integer-micro log-ratios on random corpora."""
    import math

    from sycamore_spark.operators.sampling import dsir_importance

    rng = random.Random(3)
    vocab = [f"tok{i}" for i in range(25)]
    B = 64

    def feats(toks):
        out = list(toks) + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        return [f for f in out if f]

    def bucket(f):
        return int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % B

    raw = {d: [rng.choice(vocab) for _ in range(rng.randint(1, 15))] for d in range(12)}
    tgt = {100 + d: [rng.choice(vocab) for _ in range(rng.randint(2, 10))] for d in range(4)}
    raw_df = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in raw.items()], "doc_id long, text string"
    )
    tgt_df = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in tgt.items()], "doc_id long, text string"
    )
    rb, tb = {}, {}
    for t in raw.values():
        for f in feats(t):
            b = bucket(f)
            rb[b] = rb.get(b, 0) + 1
    for t in tgt.values():
        for f in feats(t):
            b = bucket(f)
            tb[b] = tb.get(b, 0) + 1
    nr, nt = sum(rb.values()), sum(tb.values())
    lr = {
        b: math.floor(
            math.log(((tb.get(b, 0) + 1.0) * (nr + float(B))) / ((c + 1.0) * (nt + float(B))))
            * 1_000_000.0
            + 0.5
        )
        for b, c in rb.items()
    }
    expect = {}
    for d, t in raw.items():
        fs = feats(t)
        expect[d] = (len(fs), sum(lr[bucket(f)] for f in fs))
    got = {
        r.doc_id: (r.n_features, r.weight_micros)
        for r in dsir_importance(raw_df, tgt_df, n_buckets=B).collect()
    }
    assert got == expect


def test_zipf_stats_partitioning_and_order_invariant(spark):
    from sycamore_spark.operators.textstats import zipf_stats

    rng = random.Random(13)
    vocab = [f"z{i}" for i in range(60)]
    rows = [
        (d, "en" if d % 2 else "de", " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 40))))
        for d in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    a = sorted(map(tuple, zipf_stats(docs, "lang", top_n=30).collect()))
    shuffled = spark.createDataFrame(list(reversed(rows)), "doc_id long, lang string, text string")
    b = sorted(map(tuple, zipf_stats(shuffled.repartition(7), "lang", top_n=30).collect()))
    assert a == b


def test_paragraph_filter_reassembly_arithmetic_randomized(spark):
    """clean_text is exactly the concatenation of n_kept whole original
    windows in order, verified by an independent greedy reconstruction:
    the walk must consume the ENTIRE clean text using original windows,
    and the number it consumes must equal n_kept."""
    from sycamore_spark.operators.textstats import paragraph_lm_filter

    rng = random.Random(17)
    vocab = [f"p{i}" for i in range(15)]
    rows = [
        (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 47))))
        for d in range(25)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    P = 7
    out = {r.doc_id: r for r in paragraph_lm_filter(docs, window=P).collect()}
    texts = dict(rows)
    assert set(out) == set(texts)
    for d, r in out.items():
        toks = texts[d].split()
        wins = [toks[i : i + P] for i in range(0, len(toks), P)]
        assert r.n_windows == len(wins)
        assert 0 <= r.n_kept <= r.n_windows
        clean = r.clean_text.split() if r.clean_text else []
        # independent reconstruction: walk the original windows in order,
        # consuming clean greedily; every token of clean MUST be accounted
        # for by whole windows, and the consumed count MUST equal n_kept
        j, consumed = 0, 0
        for w in wins:
            if clean[j : j + len(w)] == w:
                j += len(w)
                consumed += 1
        assert j == len(clean), d       # nothing in clean outside whole windows
        assert consumed >= r.n_kept, d  # greedy can over-count on ambiguity,
        # but never under-counts: each kept window matches at its position
        assert len(clean) <= len(toks)


def test_paragraph_filter_string_doc_ids(spark):
    """Regression for the numeric-pack bug: string doc ids must still be
    scored and filtered (a silent all-kept no-op is the failure mode)."""
    from sycamore_spark.operators.textstats import paragraph_lm_filter

    fluent = "the cat sat on the mat and then the cat"
    gib = "zq xv qq vx zz qv xz vq zx xq"
    docs = spark.createDataFrame(
        [(f"doc-{i}", f"{fluent} {gib} {fluent}") for i in range(3)]
        + [(f"doc-{10 + i}", f"{fluent} {fluent} {fluent}") for i in range(9)],
        "doc_id string, text string",
    )
    out = {r.doc_id: r for r in paragraph_lm_filter(docs, window=10).collect()}
    for i in range(3):
        assert out[f"doc-{i}"].n_kept == 2, "gibberish window must be CUT"
    for i in range(10, 19):
        assert out[f"doc-{i}"].n_kept == 3


def test_paragraph_dedup_invariants_randomized(spark):
    """Randomized corpus with planted shared paragraphs: (a) token
    accounting — n_tokens_after + 20*full_removed_windows (+ tail sizes)
    == n_tokens_before; (b) clean_text is the original token sequence
    minus whole removed windows (subsequence by window walk); (c) the
    union corpus with NO shared paragraphs removes nothing."""
    from sycamore_spark.operators.dedup import paragraph_dedup

    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(40)]
    shared = " ".join(rng.choice(vocab) for _ in range(6))  # one full window
    rows = []
    for d in range(30):
        own = " ".join(rng.choice(vocab) for _ in range(rng.randint(6, 40)))
        # plant the shared paragraph at a window boundary in half the docs
        rows.append((d, f"{shared} {own}" if d % 2 == 0 else own))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    P = 6
    out = {r.doc_id: r for r in paragraph_dedup(docs, window=P, threshold=0.9).collect()}
    texts = dict(rows)
    assert set(out) == set(texts)
    n_cut_total = 0
    for d, r in out.items():
        toks = texts[d].split()
        wins = [toks[i : i + P] for i in range(0, len(toks), P)]
        assert r.n_windows == len(wins)
        assert r.n_tokens_before == len(toks)
        clean = r.clean_text.split() if r.clean_text else []
        assert r.n_tokens_after == len(clean)
        # the clean text must be reconstructible by dropping exactly
        # n_removed whole windows from the original window sequence
        kept_concat = []
        dropped = 0
        j = 0
        for w in wins:
            if clean[j : j + len(w)] == w:
                kept_concat.extend(w)
                j += len(w)
            else:
                dropped += 1
        assert j == len(clean), d
        assert dropped == r.n_removed, d
        n_cut_total += r.n_removed
    # the planted window dedups: at least 13 of the 15 planted copies cut
    # (the smallest-keyed occurrence survives; randomness may align one
    # more window)
    assert n_cut_total >= 13
    docs1 = {r.doc_id: r for r in paragraph_dedup(
        spark.createDataFrame([(d, t) for d, t in rows if d % 2 == 1],
                              "doc_id long, text string"),
        window=P, threshold=0.9).collect()}
    # rng-vocab own-text windows are essentially never >=90% jaccard dups
    assert sum(r.n_removed for r in docs1.values()) == 0
