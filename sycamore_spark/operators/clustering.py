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
           score_col: str = "score", limit: int | None = None, dim: int = 64) -> DataFrame:
    """Score rows against a query and sort descending (reference rerank
    propagates the max element score then sorts; here the doc text is
    scored directly). Default scorer: cosine of hashing embeddings —
    deterministic, no model download."""
    qv = hashing_embedding_expr(F.lit(query), dim)
    # both vectors are l2-normalized, so cosine == dot product; computing
    # the full cosine would reference each (expensive, CSE-blocked)
    # embedding expression several times
    dot = F.aggregate(
        F.zip_with(hashing_embedding_expr(F.col(text_col), dim), qv, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = df.withColumn(score_col, dot)
    out = scored.orderBy(F.col(score_col).desc())
    return out.limit(limit) if limit is not None else out


def assign_clusters(df: DataFrame, centroids, vec_col: str = "embedding",
                    out_col: str = "cluster") -> DataFrame:
    """Assign each row to its nearest given centroid (reference
    docset.clustering, docset.py:1082 — per-doc KMeans.closest there; one
    vectorized argmin matmul per Arrow batch here)."""
    from pyspark.sql.types import IntegerType

    C = np.asarray(centroids, dtype=np.float64)
    c_norm2 = (C**2).sum(axis=1)

    @F.pandas_udf(IntegerType())
    def _closest(v: pd.Series) -> pd.Series:
        m = np.vstack(v.to_numpy())
        d = -2.0 * (m @ C.T) + c_norm2
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    return df.withColumn(out_col, _closest(V.as_double(F.col(vec_col))))
