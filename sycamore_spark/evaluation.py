"""Distributed retrieval-quality evaluation.

The reference ships an evaluation package (``evaluation/`` — QA pipelines,
document-retrieval metrics) that runs driver-side over collected results.
This is its Spark-native counterpart: per-query ranking metrics computed as
one window + one aggregation over a (query, rank, relevance) results table,
so evaluating a million-query sweep is the same plan as evaluating ten.

Cross-engine determinism: every rank-discounted gain is quantized to
integer micros BEFORE the per-query sum (the bm25 pattern — bigint
addition is associative), MRR is emitted as micros of the reciprocal rank,
and NDCG is the IEEE quotient of two exact bigint sums. ``log2`` is
computed as ``ln(rank + 1) / LN2`` with the same inlined double constant
on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

LN2 = 0.6931471805599453  # inline the same IEEE double on both engines


def retrieval_metrics(
    df: DataFrame,
    query_col: str = "query_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    k: int = 10,
) -> DataFrame:
    """Per-query ranking metrics over a results table with one row per
    (query, retrieved doc): ``rank_col`` 1-based retrieval rank,
    ``rel_col`` binary or graded relevance.

    Returns per query: ``n_retrieved``, ``n_relevant``, ``hits_at_k``,
    ``mrr_micros`` (floor(1e6 / first-relevant-rank)), ``dcg_micros`` /
    ``idcg_micros`` (rank-discounted gains at k, ideal ordering by
    relevance desc with rank asc tie-break), and ``ndcg`` (0.0 when there
    are no relevant docs).

    Plan shape: one window (ideal ordering) + one hash aggregation on the
    query id. Both scale with queries x k, never with the corpus.
    """
    rel = F.col(rel_col).cast("double")
    rank = F.col(rank_col).cast("double")
    w = Window.partitionBy(query_col).orderBy(
        F.col(rel_col).desc(), F.col(rank_col).asc()
    )
    irank = F.row_number().over(w).cast("double")
    gain = F.when(
        (F.col(rank_col) <= k) & (rel > 0),
        F.floor(rel * F.lit(1_000_000.0) * F.lit(LN2) / F.log(rank + F.lit(1.0)) + F.lit(0.5)),
    ).otherwise(F.lit(0)).cast("long")
    igain = F.when(
        (irank <= k) & (rel > 0),
        F.floor(rel * F.lit(1_000_000.0) * F.lit(LN2) / F.log(irank + F.lit(1.0)) + F.lit(0.5)),
    ).otherwise(F.lit(0)).cast("long")
    staged = df.select(
        F.col(query_col).alias("_q"),
        F.col(rank_col).alias("_rank"),
        rel.alias("_rel"),
        gain.alias("_gain"),
        igain.alias("_igain"),
    )
    first_rel = F.min(F.when(F.col("_rel") > 0, F.col("_rank")))
    out = staged.groupBy(F.col("_q").alias(query_col)).agg(
        F.count(F.lit(1)).alias("n_retrieved"),
        F.sum(F.when(F.col("_rel") > 0, 1).otherwise(0)).cast("bigint").alias("n_relevant"),
        F.sum(F.when((F.col("_rel") > 0) & (F.col("_rank") <= k), 1).otherwise(0))
        .cast("bigint").alias("hits_at_k"),
        F.coalesce(
            F.floor(F.lit(1_000_000.0) / first_rel.cast("double") + F.lit(0.5)).cast("long"),
            F.lit(0).cast("long"),
        ).alias("mrr_micros"),
        F.sum("_gain").alias("dcg_micros"),
        F.sum("_igain").alias("idcg_micros"),
    )
    ndcg = F.when(
        F.col("idcg_micros") > 0,
        F.col("dcg_micros").cast("double") / F.col("idcg_micros").cast("double"),
    ).otherwise(F.lit(0.0))
    return out.withColumn("ndcg", ndcg)
