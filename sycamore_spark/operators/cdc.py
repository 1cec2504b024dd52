"""Change-data-capture merge: latest-wins snapshots and SCD2 history.

A corpus that ingests continuously is maintained as (base snapshot +
change feed), not rebuilt — the ``MERGE INTO`` / DLT ``apply_changes``
shape. Two operators cover the two standard materializations:

- ``apply_changes`` — the NEW SNAPSHOT: per key, the highest-sequence row
  wins; a delete op removes the key. One union + one window per merge —
  the minimal distributed shape (no driver state, no per-key loops), and
  the window shuffle keys on the merge key exactly like the MERGE's own
  shuffle would.
- ``scd2_history`` — the AUDIT TABLE (slowly-changing-dimension type 2):
  every change becomes a versioned row with ``valid_from_seq`` /
  ``valid_to_seq`` (exclusive, NULL while current) and an ``is_current``
  flag. One lag/lead window per key.

Determinism: callers supply a total-ordering ``seq_col`` (CDC log offset,
commit LSN, event id). Ties are impossible by contract when the sequence
is unique per key; base rows participate with whatever sequence the
snapshot recorded (use a sentinel lower than every change to make changes
always win). At 100 TB both operators are one hash-partitioned window
over (key) — skew on a hot key is an AQE skew case, and the change feed
is normally << the base so AQE picks a broadcast for it in the union-free
join variant; this union form keeps semantics engine-exact instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
    keep_deletes: bool = False,
) -> DataFrame:
    """Merge a change feed into a base snapshot, producing the new
    snapshot: per key the row with the highest ``seq_col`` wins, and wins
    of ``delete_op`` drop the key entirely. ``base`` must carry the same
    columns (give it a constant ``op`` != delete_op and a ``seq_col``
    below every change's). Returns the surviving rows minus the
    bookkeeping rank column.

    ``keep_deletes=True`` retains winning delete rows as TOMBSTONES
    instead of dropping them — required whenever the output is itself the
    base of a LATER merge (incremental/streaming maintenance): without
    the tombstone, a late-arriving lower-sequence update would resurrect
    a deleted key. Readers filter ``op != delete_op`` for the live view."""
    merged = base.unionByName(changes)
    w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
    ranked = merged.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    if not keep_deletes:
        ranked = ranked.filter(F.col(op_col) != F.lit(delete_op))
    return ranked.drop("_rn")


def scd2_history(
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
) -> DataFrame:
    """Version every change row SCD2-style: ``valid_from_seq`` = its own
    sequence, ``valid_to_seq`` = the NEXT change's sequence for the key
    (exclusive; NULL while current), ``is_current`` = 1 on the latest
    version. Pure window transform — the input rows are preserved."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).asc())
    nxt = F.lead(F.col(seq_col)).over(w)
    return (
        changes.withColumn("valid_from_seq", F.col(seq_col))
        .withColumn("valid_to_seq", nxt)
        .withColumn("is_current", F.col("valid_to_seq").isNull().cast("bigint"))
    )
