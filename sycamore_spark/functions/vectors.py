"""Vector expressions over array<float>/array<double> embedding columns.

Native higher-order functions (zip_with/aggregate) keep the arithmetic
JVM-side and deterministic: sequential left-fold summation in double
precision, which matches DuckDB's list_cosine_similarity evaluation order —
important for oracle hash-parity on scores.

At 100 TB these are the brute-force baseline; the scale path blocks the
corpus first (LSH buckets or IVF cells, operators/similarity.py) so each
comparison list is small, then applies these same expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    a, b = as_double(a), as_double(b)
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a: Column, b: Column) -> Column:
    a, b = as_double(a), as_double(b)
    d = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.sqrt(F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x))
