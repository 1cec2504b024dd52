"""Clustering + reranking model stages.

Reference parity: ``kmeans``/``clustering`` over the embedding column
(reference: docset.py:1042-1095, transforms/clustering.py:1-74 — random
init, torch cdist assignment, Ray aggregate centroid update) and ``rerank``
(docset.py:1364-1394, transforms/similarity.py — cross-encoder similarity
scoring then sort). Spark-first: MLlib KMeans (distributed, seeded) and a
pluggable scorer whose default is the deterministic hashing-embedding cosine
(model-free); HF cross-encoders slot in through the same mapInPandas shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sycamore_spark.functions import vectors as V
from sycamore_spark.operators.embed import hashing_embedding_expr


def kmeans(df: DataFrame, vec_col: str = "embedding", k: int = 8, seed: int = 42,
           out_col: str = "cluster") -> DataFrame:
    """Assign a cluster id per row with MLlib KMeans (reference:
    docset.py:1042 kmeans + clustering assignment)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.withColumn("_features", array_to_vector(V.as_double(F.col(vec_col))))
    # KMeans iterates over its input ~maxIter times; without an explicit
    # persist every iteration re-reads the source (MLlib warns about this).
    feat.persist()
    try:
        model = KMeans(k=k, seed=seed, featuresCol="_features", predictionCol=out_col).fit(feat)
        return model.transform(feat).drop("_features")
    finally:
        feat.unpersist()


def rerank(df: DataFrame, query: str, text_col: str = "text_representation",
           score_col: str = "score", limit: int | None = None, dim: int = 64,
           hash_fn=None, exact_counts: bool = False) -> DataFrame:
    """Score rows against a query and sort descending (reference rerank
    propagates the max element score then sorts; here the doc text is
    scored directly). Default scorer: cosine of hashing embeddings —
    deterministic, no model download. ``hash_fn`` forwards to the embedder
    (md5 variant makes scores cross-engine replicable)."""
    if exact_counts:
        return _rerank_exact(df, query, text_col, score_col, limit, dim, hash_fn)
    qv = hashing_embedding_expr(F.lit(query), dim, hash_fn=hash_fn)
    # both vectors are l2-normalized, so cosine == dot product; computing
    # the full cosine would reference each (expensive, CSE-blocked)
    # embedding expression several times
    dot = F.aggregate(
        F.zip_with(hashing_embedding_expr(F.col(text_col), dim, hash_fn=hash_fn), qv, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = df.withColumn(score_col, dot)
    out = scored.orderBy(F.col(score_col).desc())
    return out.limit(limit) if limit is not None else out


def _rerank_exact(df, query, text_col, score_col, limit, dim, hash_fn):
    """Integer-exact cosine: the SAME hashing-trick score, but derived from
    exact bigint bucket counts — cosine = dot / (sqrt(|a|^2) * sqrt(|b|^2))
    with every input an integer, so the double result is bit-identical on
    any engine (no fp32 normalization in the accumulation path). The query
    side is a driver-side constant: only its nonzero buckets appear in the
    expression."""
    import hashlib

    from sycamore_spark.functions import text as T

    def _py_hash60(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)

    q_tokens = query.strip().lower().split()
    q_counts: dict[int, int] = {}
    for t in q_tokens:
        b = _py_hash60(t) % dim
        q_counts[b] = q_counts.get(b, 0) + 1
    nb2 = sum(c * c for c in q_counts.values())

    h = hash_fn or (lambda t: F.xxhash64(t))
    buckets = F.transform(T.tokens(F.col(text_col)), lambda t: F.pmod(h(t), F.lit(dim)))

    def bucket_count(i: int):
        return F.size(F.filter(buckets, lambda b: b == i)).cast("long")

    # na2 = sum of squared counts over ALL buckets = fold over bucket list of
    # pairwise equality... cheaper: group equal buckets via aggregate of sorted
    # counts — use the algebraic identity sum_i c_i^2 = sum over token pairs
    # [b_x == b_y], computed as one fold over distinct buckets present.
    distinct_buckets = F.array_distinct(buckets)
    na2 = F.aggregate(
        distinct_buckets,
        F.lit(0).cast("long"),
        lambda acc, i: acc + F.pow(F.size(F.filter(buckets, lambda b: b == i)), 2).cast("long"),
    )
    dot = None
    for b, c in sorted(q_counts.items()):
        term = bucket_count(b) * F.lit(c)
        dot = term if dot is None else dot + term
    score = F.when(
        (na2 > 0) & F.lit(nb2 > 0),
        dot.cast("double") / (F.sqrt(na2.cast("double")) * F.lit(float(nb2) ** 0.5)),
    ).otherwise(F.lit(0.0))
    out = df.withColumn(score_col, score).orderBy(F.col(score_col).desc())
    return out.limit(limit) if limit is not None else out


def assign_clusters(df: DataFrame, centroids, vec_col: str = "embedding",
                    out_col: str = "cluster",
                    quantize_scale: float | None = None) -> DataFrame:
    """Assign each row to its nearest given centroid (reference
    docset.clustering, docset.py:1082 — per-doc KMeans.closest there; one
    vectorized argmin matmul per Arrow batch here).

    ``quantize_scale=s`` switches to the integer-exact formulation: both
    vectors and centroids are quantized with ``floor(x*s + 0.5)`` (the
    cross-engine-deterministic IEEE rounding pattern — see
    tests/test_rounding_seam.py), after which every distance is an exact
    integer in float64, so the argmin (ties -> lowest index) is
    bit-identical on any engine and summation order — replayable as a SQL
    oracle."""
    from pyspark.sql.types import IntegerType

    C = np.asarray(centroids, dtype=np.float64)
    if quantize_scale is not None:
        s = float(quantize_scale)
        C = np.floor(C * s + 0.5)
    c_norm2 = (C**2).sum(axis=1)

    @F.pandas_udf(IntegerType())
    def _closest(v: pd.Series) -> pd.Series:
        m = np.vstack(v.to_numpy())
        if quantize_scale is not None:
            m = np.floor(m * float(quantize_scale) + 0.5)
        # -2*q.C + |C|^2 drops the per-row |q|^2 constant: argmin-invariant,
        # and with quantized integer values every term is exact in float64.
        d = -2.0 * (m @ C.T) + c_norm2
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    return df.withColumn(out_col, _closest(V.as_double(F.col(vec_col))))


def prototypicality_filter(
    df: DataFrame,
    centroids,
    drop_frac: float = 0.25,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cluster_col: str = "cluster",
    quantize_scale: float = 1024.0,
) -> DataFrame:
    """D4-style prototype pruning (Tirumala et al. 2023, "D4: Improving
    LLM Pretraining via Document De-Duplication and Diversification"):
    after SemDeDup removes near-duplicates, the points CLOSEST to their
    cluster centroid — the most "prototypical", most redundant with the
    cluster's center of mass — are dropped, keeping each cluster's
    diverse tail. Composes with ``semantic_dedup`` (run it first) and
    ``cap_per_group`` (hard cap vs fractional prune).

    Per cluster: ``n_drop = floor(drop_frac * cluster_n)`` rows with the
    smallest centroid distance are marked ``kept = false`` (distance
    ties broken by id, so the surviving set is identical on every run
    and partitioning). Returns the input plus (cluster, dist_q,
    proto_rank, cluster_n, kept) — filter ``kept`` for the pruned
    corpus, or feed ``proto_rank / cluster_n`` downstream as a
    redundancy score.

    Integer-exact cross-engine contract: vectors and centroids are
    quantized with ``floor(x*s + 0.5)`` (the assign_clusters /
    tests/test_rounding_seam.py pattern), so ``dist_q = |q|^2 - 2 q.c +
    |c|^2`` is an exact integer in float64 and the per-cluster ranking
    replays bit-identically in SQL (the same argmin-vs-least identity
    the kmeans oracle uses: under first-wins ties the assigned
    centroid's distance still equals the least distance).

    Scale shape: one Arrow assignment pass (mapInPandas — real output
    columns, evaluated once even when a downstream plan both filters and
    projects; the ivf_pq_encode discipline), then ONE window exchange on
    the cluster id. Cluster counts are corpus-scale balanced by
    construction (k-means cells), so the window has no pathological key.
    """
    from pyspark.sql.types import LongType, StructField, StructType
    from pyspark.sql.window import Window

    clash = {cluster_col, "dist_q", "proto_rank", "cluster_n", "kept"} & set(
        df.columns
    )
    if clash:
        raise ValueError(
            f"prototypicality_filter: input already has column(s) "
            f"{sorted(clash)}, which collide with the columns this op "
            "appends — a duplicate field name in the mapInPandas output "
            "schema fails (or silently misbinds) only downstream; rename or "
            "drop them first"
        )
    C = np.asarray(centroids, dtype=np.float64)
    s = float(quantize_scale)
    Cq = np.floor(C * s + 0.5)
    c_norm2 = (Cq**2).sum(axis=1)

    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(cluster_col, LongType()), StructField("dist_q", LongType())]
    )

    def run(it):
        for pdf in it:
            if len(pdf) == 0:
                pdf[cluster_col] = pd.Series([], dtype="int64")
                pdf["dist_q"] = pd.Series([], dtype="int64")
                yield pdf
                continue
            m = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            mq = np.floor(m * s + 0.5)
            d = -2.0 * (mq @ Cq.T) + c_norm2
            cl = d.argmin(axis=1)
            dist = (mq**2).sum(axis=1) + d[np.arange(len(cl)), cl]
            pdf = pdf.copy()
            pdf[cluster_col] = cl.astype(np.int64)
            pdf["dist_q"] = dist.astype(np.int64)
            yield pdf

    assigned = df.mapInPandas(run, out_schema)
    w = Window.partitionBy(cluster_col)
    w_rank = w.orderBy(F.col("dist_q").asc(), F.col(id_col).asc())
    return (
        assigned.withColumn("proto_rank", F.row_number().over(w_rank).cast("long"))
        .withColumn("cluster_n", F.count(F.lit(1)).over(w).cast("long"))
        .withColumn(
            "kept",
            F.col("proto_rank") > F.floor(F.lit(float(drop_frac)) * F.col("cluster_n")),
        )
    )
