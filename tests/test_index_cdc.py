"""Maintained inverted index (retrieval.py bucketed_postings +
index_apply_changes) — the lexical twin of the ANN store CDC: postings
bucketed by term hash so a term's df/rank recompute never leaves its
bucket; a document delta rewrites only the touched buckets."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from sycamore_spark.operators.retrieval import (
    bucketed_postings,
    index_apply_changes,
)

NB = 8


def _docs(spark):
    rows = [
        (1, "alpha beta beta"),
        (2, "alpha gamma"),
        (3, "delta delta delta"),
        (4, "beta gamma delta"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _rebuild(spark, df):
    return {
        (r.term, r.df, r.rank, r.doc_id, r.tf)
        for r in bucketed_postings(df, n_buckets=NB)
        .select("term", "df", "rank", "doc_id", "tf").collect()
    }


def test_index_apply_changes_equals_rebuild(spark, tmp_path):
    """delete + edit + insert folded into the bucketed store must be
    indistinguishable from a full rebuild of the merged corpus — df and
    impact rank included (a delete PROMOTES lower-ranked postings, an
    edit can demote its own doc)."""
    root = str(tmp_path / "idx")
    docs = _docs(spark)
    bucketed_postings(docs, n_buckets=NB).write.partitionBy("bkt").parquet(root)
    delta = spark.createDataFrame(
        [
            (1, None, "D"),                      # alpha df drops, beta rank shifts
            (3, "delta epsilon", "U"),           # tf(delta) 3 -> 1, new term epsilon
            (5, "beta beta beta zeta", "I"),     # new top-ranked beta posting
        ],
        "doc_id bigint, text string, op string",
    )
    n = index_apply_changes(spark, root, delta, n_buckets=NB)
    assert n >= 1
    got = {
        (r.term, r.df, r.rank, r.doc_id, r.tf)
        for r in spark.read.parquet(root)
        .select("term", "df", "rank", "doc_id", "tf").collect()
    }
    merged = spark.createDataFrame(
        [(2, "alpha gamma"), (3, "delta epsilon"), (4, "beta gamma delta"),
         (5, "beta beta beta zeta")],
        "doc_id bigint, text string",
    )
    assert got == _rebuild(spark, merged)
    # the fold promoted doc 5 to beta's rank 1 and recomputed df = 2 for alpha
    by = {(r.term, r.doc_id): (r.df, r.rank) for r in spark.read.parquet(root).collect()}
    assert by[("beta", 5)][1] == 1 and by[("alpha", 2)][0] == 1


def test_index_apply_changes_touches_only_needed_buckets(spark, tmp_path):
    """A delta touching term X must not rewrite buckets holding only
    other terms — the files' mtimes prove it."""
    root = str(tmp_path / "idx2")
    docs = _docs(spark)
    bucketed_postings(docs, n_buckets=NB).write.partitionBy("bkt").parquet(root)
    tb = {
        r.term: r.b for r in spark.createDataFrame(
            [("alpha",), ("beta",), ("gamma",), ("delta",)], "term string"
        ).select("term", F.pmod(F.xxhash64("term"), F.lit(NB)).cast("int").alias("b"))
        .collect()
    }
    # pick a term whose bucket holds no other corpus term
    lone = next(t for t in tb if list(tb.values()).count(tb[t]) == 1)
    others = {b for t, b in tb.items() if t != lone}
    pre = {
        f: os.path.getmtime(f)
        for b in others - {tb[lone]}
        for f in glob.glob(f"{root}/bkt={b}/*.parquet")
    }
    # doc 6 contains ONLY the lone term -> only its bucket rewrites
    delta = spark.createDataFrame(
        [(6, f"{lone} {lone}", "I")], "doc_id bigint, text string, op string"
    )
    assert index_apply_changes(spark, root, delta, n_buckets=NB) == 1
    post = {
        f: os.path.getmtime(f)
        for b in others - {tb[lone]}
        for f in glob.glob(f"{root}/bkt={b}/*.parquet")
    }
    assert post == pre
    got = {(r.doc_id, r.tf, r.rank) for r in
           spark.read.parquet(root).filter(F.col("term") == lone).collect()}
    assert (6, 2, 1) in got


def test_index_apply_changes_is_content_idempotent(spark, tmp_path):
    """Re-applying the SAME batch (the crash-between-state-and-hwm replay
    window of streaming/index.py) must converge to the identical store:
    the fold deletes the postings it already wrote and re-derives them."""
    root = str(tmp_path / "idx4")
    bucketed_postings(_docs(spark), n_buckets=NB).write.partitionBy("bkt").parquet(root)
    delta = spark.createDataFrame(
        [(1, None, "D"), (5, "beta zeta", "I")],
        "doc_id bigint, text string, op string",
    )
    index_apply_changes(spark, root, delta, n_buckets=NB)
    once = {
        (r.term, r.df, r.rank, r.doc_id, r.tf)
        for r in spark.read.parquet(root)
        .select("term", "df", "rank", "doc_id", "tf").collect()
    }
    index_apply_changes(spark, root, delta, n_buckets=NB)
    twice = {
        (r.term, r.df, r.rank, r.doc_id, r.tf)
        for r in spark.read.parquet(root)
        .select("term", "df", "rank", "doc_id", "tf").collect()
    }
    assert once == twice


def test_bm25_from_index_equals_raw_text_scoring(spark, tmp_path):
    """Serving from the maintained store pair must agree BIT-FOR-BIT with
    bm25_scores_multi over the raw text (identical integer-micro
    arithmetic; postings carry tf/df, norms carry dl/corpus stats)."""
    from sycamore_spark.operators.retrieval import (
        bm25_from_index, bm25_scores_multi, doc_norms,
    )

    docs = _docs(spark)
    idx = str(tmp_path / "sidx")
    nrm = str(tmp_path / "snrm")
    bucketed_postings(docs, n_buckets=NB).write.partitionBy("bkt").parquet(idx)
    doc_norms(docs, n_buckets=NB).write.partitionBy("nbkt").parquet(nrm)
    qdf = spark.createDataFrame(
        [(1, "beta delta"), (2, "alpha missingterm")], "query_id bigint, query string"
    )
    want = {
        (r.query_id, r.doc_id, r.bm25_micros)
        for r in bm25_scores_multi(docs, qdf).collect()
    }
    got = {
        (r.query_id, r.doc_id, r.bm25_micros)
        for r in bm25_from_index(spark, idx, nrm, qdf, n_buckets=NB).collect()
    }
    assert got == want and got


def test_norms_apply_changes_equals_rebuild(spark, tmp_path):
    from sycamore_spark.operators.retrieval import doc_norms, norms_apply_changes

    nrm = str(tmp_path / "nrm2")
    doc_norms(_docs(spark), n_buckets=NB).write.partitionBy("nbkt").parquet(nrm)
    delta = spark.createDataFrame(
        [(1, None, "D"), (3, "delta epsilon", "U"), (5, "beta beta", "I")],
        "doc_id bigint, text string, op string",
    )
    assert norms_apply_changes(spark, nrm, delta, n_buckets=NB) >= 1
    got = {(r.doc_id, r.dl) for r in spark.read.parquet(nrm).collect()}
    merged = spark.createDataFrame(
        [(2, "alpha gamma"), (3, "delta epsilon"), (4, "beta gamma delta"),
         (5, "beta beta")],
        "doc_id bigint, text string",
    )
    want = {(r.doc_id, r.dl) for r in doc_norms(merged, n_buckets=NB).collect()}
    assert got == want


def test_rebucket_postings_preserves_content_and_old_layout(spark, tmp_path):
    """Re-bucketing the versioned store must change file PLACEMENT only:
    identical posting rows at the new granularity, old layout intact for
    concurrent readers, single-marker atomic swap."""
    from sycamore_spark.operators.retrieval import rebucket_postings
    from sycamore_spark.operators.similarity import (
        ann_store_current_dir, ann_store_publish, ann_store_versions,
    )

    root = str(tmp_path / "rebkt")
    docs = _docs(spark)
    posts = bucketed_postings(docs, n_buckets=2)
    assert ann_store_publish(spark, root, posts, cell_col="bkt") == 0
    before = {(r.term, r.df, r.rank, r.doc_id, r.tf) for r in
              spark.read.parquet(ann_store_current_dir(spark, root))
              .select("term", "df", "rank", "doc_id", "tf").collect()}
    assert rebucket_postings(spark, root, n_buckets=16) == 1
    cur = ann_store_current_dir(spark, root)
    assert cur.endswith("/v=1")
    after = {(r.term, r.df, r.rank, r.doc_id, r.tf) for r in
             spark.read.parquet(cur)
             .select("term", "df", "rank", "doc_id", "tf").collect()}
    assert after == before
    assert ann_store_versions(spark, root)["committed"] == [0, 1]
    # new placement really is at the new granularity
    bkts = {r.bkt for r in spark.read.parquet(cur).select("bkt").distinct().collect()}
    assert bkts - {0, 1}  # some bucket beyond the old 2-bucket space


def test_bm25_from_index_rejects_empty_queries(spark, tmp_path):
    from sycamore_spark.operators.retrieval import bm25_from_index, doc_norms

    idx = str(tmp_path / "eidx")
    nrm = str(tmp_path / "enrm")
    docs = _docs(spark)
    bucketed_postings(docs, n_buckets=NB).write.partitionBy("bkt").parquet(idx)
    doc_norms(docs, n_buckets=NB).write.partitionBy("nbkt").parquet(nrm)
    empty_q = spark.createDataFrame([(1, "   ")], "query_id bigint, query string")
    with pytest.raises(ValueError, match="no terms"):
        bm25_from_index(spark, idx, nrm, empty_q, n_buckets=NB)


def test_index_apply_changes_empty_and_dup_guards(spark, tmp_path):
    root = str(tmp_path / "idx3")
    docs = spark.createDataFrame([(9, "omega")], "doc_id bigint, text string")
    bucketed_postings(docs, n_buckets=NB).write.partitionBy("bkt").parquet(root)
    # deleting the only doc of a bucket removes its directory
    delta = spark.createDataFrame(
        [(9, None, "D")], "doc_id bigint, text string, op string"
    )
    assert index_apply_changes(spark, root, delta, n_buckets=NB) == 1
    assert not glob.glob(f"{root}/bkt=*")
    # duplicate ids rejected loudly (same contract as the ANN store)
    dup = spark.createDataFrame(
        [(1, "a", "U"), (1, "b", "U")], "doc_id bigint, text string, op string"
    )
    with pytest.raises(ValueError, match="duplicate doc_id"):
        index_apply_changes(spark, root, dup, n_buckets=NB)


def test_index_apply_changes_hot_bucket_delta(spark, tmp_path):
    """Zipf-skewed delta: EVERY new posting hashes to one bucket (the
    realistic 100 TB worst case — all edits landing on one shard). The
    fold must still equal a from-scratch rebuild, touch exactly that
    bucket for the insert-only case, and parallelize within the hot
    bucket (tools/skewstress.py measures the wall-time A/B)."""
    root = str(tmp_path / "idxhot")
    docs = _docs(spark)
    bucketed_postings(docs, n_buckets=NB).write.partitionBy("bkt").parquet(root)
    # synthesize tokens that all hash to one bucket with the index's own
    # expression
    cand = spark.range(0, 20_000).select(
        F.concat(F.lit("hot"), F.col("id")).alias("term"),
        F.pmod(F.xxhash64(F.concat(F.lit("hot"), F.col("id"))), F.lit(NB))
        .cast("int").alias("bkt"),
    )
    picked = cand.filter(F.col("bkt") == 3).limit(40).collect()
    toks = [r.term for r in picked]
    assert len(toks) == 40
    rows = [
        (100 + i, " ".join(toks[(i * (j + 7) + j) % len(toks)] for j in range(6)), "I")
        for i in range(25)
    ]
    delta = spark.createDataFrame(rows, "doc_id bigint, text string, op string")
    touched = index_apply_changes(spark, root, delta, n_buckets=NB)
    assert touched == 1  # insert-only hot delta rewrites exactly one bucket
    merged = docs.unionByName(
        spark.createDataFrame([(r[0], r[1]) for r in rows], "doc_id bigint, text string")
    )
    got = {
        (r.term, r.df, r.rank, r.doc_id, r.tf)
        for r in spark.read.parquet(root)
        .select("term", "df", "rank", "doc_id", "tf").collect()
    }
    assert got == _rebuild(spark, merged)


def test_norms_from_postings_equals_doc_norms(spark):
    """r13: dl derived from the postings frame (sum of tf per doc) must
    equal the from-text doc_norms build exactly, bucket column included —
    the derivation that replaces the second corpus tokenize in the
    bm25_serve/hybrid_serve/stream_index_cdc builds. Zero-token docs carry
    no row on either path."""
    from sycamore_spark.operators.retrieval import doc_norms, norms_from_postings

    docs = _docs(spark).unionByName(
        spark.createDataFrame([(9, "   ")], "doc_id bigint, text string")
    )
    want = {
        (r.doc_id, r.dl, r.nbkt)
        for r in doc_norms(docs, n_buckets=NB).collect()
    }
    got = {
        (r.doc_id, r.dl, r.nbkt)
        for r in norms_from_postings(
            bucketed_postings(docs, n_buckets=NB), n_buckets=NB
        ).collect()
    }
    assert got == want and len(got) == 4  # the all-whitespace doc has no row


def test_apply_changes_prepared_equals_default(spark, tmp_path):
    """r13: prepared=True (caller already checkpointed + dup-validated the
    delta) must produce byte-identical stores to the default path for both
    the postings and the norms fold."""
    from sycamore_spark.operators.retrieval import doc_norms, norms_apply_changes

    docs = _docs(spark)
    delta = spark.createDataFrame(
        [(1, None, "D"), (3, "delta epsilon", "U"), (5, "zeta zeta", "I")],
        "doc_id bigint, text string, op string",
    )
    stores = {}
    for mode in ("default", "prepared"):
        idx = str(tmp_path / f"idx-{mode}")
        nrm = str(tmp_path / f"nrm-{mode}")
        bucketed_postings(docs, n_buckets=NB).write.partitionBy("bkt").parquet(idx)
        doc_norms(docs, n_buckets=NB).write.partitionBy("nbkt").parquet(nrm)
        d = delta.localCheckpoint(eager=True) if mode == "prepared" else delta
        prepared = mode == "prepared"
        index_apply_changes(spark, idx, d, n_buckets=NB, prepared=prepared)
        norms_apply_changes(spark, nrm, d, n_buckets=NB, prepared=prepared)
        stores[mode] = (
            {
                (r.term, r.df, r.rank, r.doc_id, r.tf)
                for r in spark.read.parquet(idx)
                .select("term", "df", "rank", "doc_id", "tf").collect()
            },
            {
                (r.doc_id, r.dl)
                for r in spark.read.parquet(nrm).select("doc_id", "dl").collect()
            },
        )
    assert stores["default"] == stores["prepared"]


def test_overlap_jobs_order_and_errors(spark):
    """r13: overlap_jobs returns results in call order and propagates a
    failing thunk's exception."""
    from sycamore_spark.functions.partitioning import overlap_jobs

    a, b, c = overlap_jobs(
        lambda: spark.range(10).count(),
        lambda: "plain",
        lambda: spark.range(3).count(),
    )
    assert (a, b, c) == (10, "plain", 3)

    with pytest.raises(ValueError, match="boom"):
        overlap_jobs(
            lambda: spark.range(5).count(),
            lambda: (_ for _ in ()).throw(ValueError("boom")),
        )
