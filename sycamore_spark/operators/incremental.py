"""Incremental corpus-stats maintenance: additive aggregate states.

A 100 TB corpus's summary statistics (per-source counts, token sums,
min/max, variance) should never be recomputed from scratch when a crawl
batch lands. Count/sum/min/max (and sum-of-squares for variance) form a
MERGEABLE state: stats(old ∪ delta) == merge(stats(old), stats(delta)),
so each snapshot persists a kilobyte state table and ingest folds the new
batch's state in — exactly how Spark's own partial aggregation works
across partitions, lifted to work across JOBS.

Exactness discipline: sums are carried in DECIMAL (exact, associative),
never double (whose addition order — and therefore whose value — differs
between the merge path and a full recompute). That makes
``merge_stats(stats(a), stats(b))`` BIT-IDENTICAL to ``stats(a union b)``
— the property the oracle gate checks, and the property that lets a
pipeline audit incremental state against a periodic full recompute.

Same trick scales to the sketch states in operators/sketches.py (HLL /
KLL / theta are the mergeable states for distinct / quantiles / overlap);
this module covers the exact additive ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SUM = "decimal(28,3)"   # value sums: exact, re-mergeable
_SQ = "decimal(38,6)"    # sum-of-squares: exact for values < ~1e12


def corpus_stats(df: DataFrame, group_cols: list[str], value_col: str) -> DataFrame:
    """Per-group additive state over ``value_col``: (n, sum, sum_sq, min,
    max), sums in exact decimal. One hash aggregate; the output is the
    thing you persist per snapshot/partition."""
    v = F.col(value_col).cast("decimal(18,3)")
    return df.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).cast(_SUM).alias("sum"),
        F.sum((v * v).cast("decimal(30,6)")).cast(_SQ).alias("sum_sq"),
        F.min(F.col(value_col)).alias("min"),
        F.max(F.col(value_col)).alias("max"),
    )


def merge_stats(a: DataFrame, b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Fold two state tables into one — bit-identical to computing
    ``corpus_stats`` over the concatenated raw data (decimal sums are
    associative; count/min/max trivially so). Cost: a union of two
    kilobyte tables + one tiny aggregate — the raw corpus is not read."""
    return (
        a.unionByName(b)
        .groupBy(*[F.col(c) for c in group_cols])
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum").cast(_SUM).alias("sum"),
            F.sum("sum_sq").cast(_SQ).alias("sum_sq"),
            F.min("min").alias("min"),
            F.max("max").alias("max"),
        )
    )


def finalize_stats(stats: DataFrame) -> DataFrame:
    """Derive reporting columns from a state table: mean and population
    stddev as doubles (derived AFTER all merging, so the exact state stays
    the source of truth)."""
    n = F.col("n").cast("double")
    mean = F.col("sum").cast("double") / n
    var = F.col("sum_sq").cast("double") / n - mean * mean
    return stats.select(
        "*",
        mean.alias("mean"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("stddev"),
    )
