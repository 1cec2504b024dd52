"""Multi-dimensional data layout: Z-order (Morton) clustering for scan
pruning.

A 100 TB table is pruned by file-level min/max statistics. Sorting by ONE
column localizes only that column; queries filtering on a second dimension
still touch every file. Interleaving the bits of several dimensions into
one Morton key and range-partitioning on it bounds EVERY participating
dimension's span within each output file — the layout trick behind
Delta/Iceberg ``OPTIMIZE ZORDER BY`` — so multi-predicate scans skip most
files.

The Morton key here is built from pure integer arithmetic — bit i of a
column is ``shiftright(x, i) % 2``, which for non-negative BIGINTs equals
the ANSI ``(x // 2^i) % 2`` the oracle replays in DuckDB, and is exact for
ALL 63-bit inputs (an earlier float-division formulation silently corrupted
keys for inputs >= 2^53). Inputs must be NON-NEGATIVE integers already
quantized to ``bits`` bits; quantize continuous or skewed columns first
(``quantile_bucket`` below gives equi-depth buckets, which also fixes the
classic Z-order failure on skewed value ranges).

The cluster step is one ``repartitionByRange`` shuffle on the key plus a
partition-local sort — exactly what a sort-by-one-column rewrite costs;
only the KEY differs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 8) -> Column:
    """Morton-interleave ``bits`` low bits of each column (non-negative
    integers) into one BIGINT. With k columns, bit i of column j lands at
    position ``i*k + j``. len(cols)*bits must fit in 63 bits."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    k = len(cs)
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds a signed BIGINT")
    z = F.lit(0).cast("long")
    for j, c in enumerate(cs):
        cl = c.cast("long")
        for i in range(bits):
            # integer bit extraction: exact for any non-negative BIGINT
            # (float division breaks silently at 2^53)
            bit = F.shiftright(cl, i) % F.lit(2)
            z = z + bit * F.lit(1 << (i * k + j))
    return z


def quantile_bucket(df: DataFrame, col: str, bits: int = 8) -> Column:
    """Equi-depth bucket id (0 .. 2^bits - 1) for ``col`` — rank space, not
    value space, so skewed columns spread evenly across the Z-curve.

    Scale shape: ONE exact-percentile aggregate computes the 2^bits - 1
    split points (driver-bounded: the split list, never the data), and the
    returned column is a sum of threshold comparisons — no global window
    anywhere, so this is safe to call on a corpus-scale input (an earlier
    ntile formulation funneled every row through a single window task).
    Ties at a split point go to the higher bucket; heavy ties can leave
    lower buckets short (rank semantics can't split equal values).

    EAGER, unlike a plain Column factory: it runs one Spark job at call
    time to collect the splits — callers composing plans lazily must
    call this only when the input is ready to execute. The returned
    column is a 2^bits - 1 term sum of comparisons, so expression size
    (and plan-compile time) grows with ``bits``: the default 8 (255
    terms) is cheap, but well beyond ~12 bits the expression tree
    itself becomes the cost — above that, delegate to the join-based
    twin ``textstats.bucket_by_quantiles``, which keeps splits as a
    DataFrame (lazy, groupable, reusable on other tables). At 100 TB
    either works — swap the exact percentile for a KLL sketch if one
    pass matters."""
    if bits > 12:
        raise ValueError(
            f"quantile_bucket: bits={bits} compiles a {(1 << bits) - 1}-term "
            "comparison expression — use textstats.bucket_by_quantiles "
            "(join-based, lazy) above 12 bits"
        )
    n = 1 << bits
    qs = [i / n for i in range(1, n)]
    row = df.agg(
        *[F.percentile(F.col(col), F.lit(q)).alias(f"q{i}") for i, q in enumerate(qs)]
    ).first()
    if row[0] is None:  # empty (or all-NULL) input: single bucket 0
        return F.lit(0).cast("long")
    v = F.col(col).cast("double")
    return sum(
        (F.when(v >= F.lit(float(row[i])), 1).otherwise(0) for i in range(len(qs))),
        F.lit(0),
    ).cast("long")


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    n_partitions: int | None = None,
    key_col: str | None = None,
) -> DataFrame:
    """Rewrite ``df`` so rows are range-partitioned and sorted by the
    Morton key of ``cols`` (already-quantized non-negative ints). Every
    output partition then spans a compact hyper-rectangle in ALL listed
    dimensions — write it out and min/max stats prune multi-predicate
    scans. ``key_col`` keeps the key in the output (else it's dropped)."""
    z = zorder_key(cols, bits)
    tagged = df.withColumn(key_col or "_z", z)
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    out = tagged.repartitionByRange(n, F.col(key_col or "_z")).sortWithinPartitions(
        F.col(key_col or "_z")
    )
    return out if key_col else out.drop("_z")
