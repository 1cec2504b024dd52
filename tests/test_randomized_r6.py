"""Randomized cross-checks for round-6 operators: brute-force references
computed in plain Python on small random inputs (seeded — deterministic)."""

import math
import random

from pyspark.sql import functions as F


def test_duplicate_spans_matches_bruteforce(spark):
    from sycamore_spark.operators.dedup import duplicate_spans

    rng = random.Random(42)
    vocab = [f"t{i}" for i in range(50)]
    shared = [rng.choice(vocab) for _ in range(12)]
    corpus = {}
    for d in range(12):
        toks = [rng.choice(vocab) for _ in range(rng.randint(5, 30))]
        if d % 3 == 0:  # plant the shared run at a random offset
            at = rng.randint(0, len(toks))
            toks = toks[:at] + shared + toks[at:]
        corpus[d] = toks
    L = 6

    # brute-force reference: positions whose L-gram occurs >1 times corpus-wide
    from collections import defaultdict
    occ = defaultdict(list)
    for d, toks in corpus.items():
        for p in range(len(toks) - L + 1):
            occ[tuple(toks[p:p + L])].append((d, p))
    marked = defaultdict(list)
    canon_of = {}
    for g, sites in occ.items():
        if len(sites) > 1:
            cn = min(sites)
            for d, p in sites:
                marked[d].append((p, (d, p) == cn))
    expect = set()
    for d, plist in marked.items():
        plist.sort()
        start, end, ngr, can = plist[0][0], plist[0][0] + L, 1, plist[0][1]
        for p, is_c in plist[1:]:
            if p <= end:  # overlap/adjacent-within-window -> same island
                end = p + L
                ngr += 1
                can = can or is_c
            else:
                expect.add((d, start, end, ngr, int(can)))
                start, end, ngr, can = p, p + L, 1, is_c
        expect.add((d, start, end, ngr, int(can)))

    df = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in corpus.items()], "doc_id long, text string"
    )
    got = {tuple(r) for r in duplicate_spans(df, min_len=L).collect()}
    assert got == expect


def test_containment_lsh_random_corpus(spark):
    from sycamore_spark.operators.dedup import containment_lsh_pairs, containment_pairs

    rng = random.Random(9)
    vocab = [f"w{i}" for i in range(300)]
    rows = []
    for d in range(60):
        base = rng.sample(vocab, rng.randint(10, 80))
        rows.append((d, " ".join(base)))
        if d % 4 == 0:  # planted containment at varying size ratios
            sub = base[: max(4, len(base) // rng.choice((1, 2, 4)))]
            rows.append((1000 + d, " ".join(sub)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for t in (0.8, 0.95):
        exact = {tuple(r) for r in containment_pairs(df, "doc_id", "text", t).collect()}
        lsh = {tuple(r) for r in containment_lsh_pairs(df, "doc_id", "text", t).collect()}
        assert lsh == exact, t


def test_url_canonicalization_idempotent(spark):
    from sycamore_spark.operators.web import canonicalize_url_expr

    rng = random.Random(5)
    urls = []
    for _ in range(60):
        scheme = rng.choice(["http", "HTTPS", "https", ""])
        host = rng.choice(["WWW.", "", "www."]) + rng.choice(
            ["Alpha.COM", "beta.co.uk", "Gamma.Example.org"]
        )
        port = rng.choice(["", ":80", ":443", ":8080"])
        path = rng.choice(["", "/A/b", "/A/b/", "/x"])
        q = rng.choice(["", "?b=2&a=1", "?utm_source=z&a=1", "?gclid=1"])
        frag = rng.choice(["", "#f"])
        urls.append((f"{scheme}{'://' if scheme else ''}{host}{port}{path}{q}{frag}",))
    df = spark.createDataFrame(urls, "url string")
    once = canonicalize_url_expr(F.col("url")).alias("c1")
    out = df.select(F.col("url"), once)
    twice = out.select(
        "url", "c1", canonicalize_url_expr(F.col("c1")).alias("c2")
    ).collect()
    for r in twice:
        assert r.c1 == r.c2, r.url  # canonicalization is a projection


def test_normalize_rotation_random_roundtrip(spark):
    from sycamore_spark.operators.elements import normalize_rotation, rot_bbox_expr

    rng = random.Random(3)
    rows = []
    for doc in range(20):
        quad = rng.randint(0, 3)
        for e in range(rng.randint(3, 8)):
            x1, y1 = rng.uniform(0.0, 0.6), rng.uniform(0.0, 0.6)
            bb = [x1, y1, x1 + rng.uniform(0.05, 0.39), y1 + rng.uniform(0.05, 0.39)]
            ang = quad * math.pi / 2 + rng.uniform(-0.3, 0.3)
            rows.append((doc, quad, bb, math.cos(ang), math.sin(ang)))
    df = spark.createDataFrame(
        rows, "doc_id long, quad int, up array<double>, vx double, vy double"
    )
    scanned = df.select(
        "doc_id", "quad", "up", "vx", "vy",
        rot_bbox_expr(F.col("up"), F.col("quad")).alias("bbox"),
    )
    out = normalize_rotation(scanned).collect()
    for r in out:
        assert r.rotation_quad == r.quad
        assert all(abs(a - b) < 1e-12 for a, b in zip(r.bbox_upright, r.up))
