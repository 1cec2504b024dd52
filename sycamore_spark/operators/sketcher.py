"""Sketching + near-dup uniquify.

Reference parity: ``Sketcher`` writes shingle sketches into ``doc.shingles``
(reference: transforms/sketcher.py:29); ``SketchUniquify`` then drops
near-duplicate docs by sketch distance (sketcher.py:64). Here the sketch is
the 64-perm MinHash signature (operators/dedup.py) and uniquify keeps the
lowest-id member of each near-dup pair set — a distributed join + anti-join
instead of the reference's driver-side distance scan."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sycamore_spark.operators import dedup


def sketch(df: DataFrame, id_col: str = "doc_id", text_col: str = "text_representation",
           num_perm: int = 64, shingle_k: int = 3) -> DataFrame:
    """Attach the minhash signature as ``shingles`` (array<bigint>)."""
    sig = dedup.minhash_signature(df, id_col, text_col, num_perm, shingle_k).select(
        F.col("_id").alias(id_col), F.col("_sig").alias("shingles")
    )
    return df.drop("shingles").join(sig, id_col)


def sketch_uniquify(df: DataFrame, id_col: str = "doc_id", text_col: str = "text_representation",
                    threshold: float = 0.8, num_perm: int = 64, bands: int = 32,
                    shingle_k: int = 3) -> DataFrame:
    """Drop near-duplicates, keeping the smallest id of each duplicate group
    (union-find-free approximation: a row is dropped iff it appears as the
    *larger* id of some qualifying pair — same keep-first-seen semantics as
    the reference's sequential scan for pairwise clusters)."""
    pairs = dedup.minhash_lsh_pairs(df, id_col, text_col, threshold, num_perm, bands, shingle_k)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")
