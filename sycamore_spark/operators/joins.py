"""Join strategies beyond the built-ins: as-of joins and skew salting.

The reference has no hash/sort-merge/as-of/interval join machinery at all
(SURVEY.md §2.3 — ``native Spark joins are a superset``); these add the two
join shapes a 100 TB event/training pipeline actually needs on top of the
wrapper's plain ``join``:

- ``asof_join`` — for each left row, the latest right row at-or-before its
  timestamp per key (classic event-attribution / feature-lookup join).
  Implemented with the union+window technique: tag both sides, union, one
  window over (key ORDER BY ts, tag) carrying the last right-side values
  forward. ONE shuffle total, no range-explosion, no per-key driver work —
  strictly better at scale than the broadcast-and-filter or
  cross-join-and-rank formulations.
- ``salted_join`` — hot-key mitigation when AQE's skew splitting isn't
  enough (or is disabled): the build side is replicated ``salt`` ways, the
  probe side scatters uniformly across replicas, so one hot key spreads
  over ``salt`` tasks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _warn_literal_keys(df: DataFrame, keys: list[str], op: str) -> None:
    """Warn when a join/window key column is defined as a bare literal in
    the frame's optimized plan — a constant key hashes every row to ONE
    partition, so the downstream per-key window is a single task at any
    scale. Plan-text probe only: analysis, no Spark job."""
    import re
    import warnings

    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:
        return
    lit_re = r"(?:-?\d+(?:\.\d+)?|true|false|null|\"[^\"]*\")"
    for k in keys:
        if re.search(rf"(?<![\w.#]){lit_re} AS {re.escape(k)}#\d+", plan):
            warnings.warn(
                f"{op}: key column {k!r} is a literal — every row hashes to "
                f"one partition and the per-key window becomes a single task "
                f"processing the entire input. Use a real key, or for a "
                f"global lookup against a driver-bounded side compile it to "
                f"a literal expression (calibrate._step_lookup_tree).",
                stacklevel=3,
            )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    strict: bool = False,
    direction: str = "backward",
) -> DataFrame:
    """As-of join (pandas ``merge_asof`` parity): each left row gets the
    nearest right row within the same ``on`` key(s) — ``backward`` (the
    greatest ``right_ts`` <= ``left_ts``; < when ``strict``),
    ``forward`` (the least ``right_ts`` >= ``left_ts``; > when
    ``strict``), or ``nearest`` (smaller absolute gap, ties to the
    backward side). Right columns come back suffixed, null when no
    qualifying right row exists.

    All directions share the same scale shape: one union + one (or for
    ``nearest``, two) ordered window pass(es) per key — never a range
    self-join. Right rows should be unique per (key, ts) — pre-aggregate
    if not; with duplicates the row sorting last (by the right frame's
    column order) wins deterministically only if a tiebreak column
    orders them.

    CARDINALITY CONTRACT: the ``on`` keys must partition the data with
    corpus-appropriate cardinality — the per-key window is a single task,
    so a constant (or near-constant) key funnels BOTH sides through one
    task no matter how partitioned the plan looks (the r12
    ``isotonic_apply`` defect: ``on=lit(1)`` → ``Exchange
    hashpartitioning(_k, 200)`` with every row in one partition). A key
    column defined as a bare literal raises a warning here; for a
    global (keyless) as-of against a driver-bounded right side, compile
    the lookup to a literal expression instead (see
    ``calibrate._step_lookup_tree``).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    if direction == "nearest" and strict:
        raise ValueError("strict is not defined for direction='nearest'")
    keys = [on] if isinstance(on, str) else list(on)
    _warn_literal_keys(left, keys, "asof_join")
    right_cols = right_cols or [c for c in right.columns if c not in keys + [right_ts]]

    l_tag = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias(f"_r_{right_ts}"),
    )
    r_tag = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_tag.schema["_lrow"].dataType).alias("_lrow"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        F.col(right_ts).alias(f"_r_{right_ts}"),
    )
    unioned = l_tag.unionByName(r_tag)

    # Backward pass: right rows sort before left rows at equal ts
    # (inclusive); strict flips the order so a same-ts right row is NOT
    # visible. Forward pass mirrors it over the following frame.
    carry_cols = right_cols + [right_ts]
    parts = [F.col(k) for k in keys]
    bwd_order = [F.col("_ts").asc(), F.col("_is_left").asc() if not strict else F.col("_is_left").desc()]
    w_bwd = (
        Window.partitionBy(*parts).orderBy(*bwd_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward inclusive: the right row at equal ts must fall INSIDE the
    # [current, following] frame of the left row -> left sorts first
    fwd_order = [F.col("_ts").asc(), F.col("_is_left").desc() if not strict else F.col("_is_left").asc()]
    w_fwd = (
        Window.partitionBy(*parts).orderBy(*fwd_order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )

    carried = unioned
    if direction in ("backward", "nearest"):
        carried = carried.select(
            "*",
            *[
                F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w_bwd).alias(f"_bwd_{c}")
                for c in carry_cols
            ],
        )
    if direction in ("forward", "nearest"):
        carried = carried.select(
            "*",
            *[
                F.first(F.col(f"_r_{c}"), ignorenulls=True).over(w_fwd).alias(f"_fwd_{c}")
                for c in carry_cols
            ],
        )
    if direction == "backward":
        pick = {c: F.col(f"_bwd_{c}") for c in carry_cols}
    elif direction == "forward":
        pick = {c: F.col(f"_fwd_{c}") for c in carry_cols}
    else:
        # numeric gap comparison that also works for TIMESTAMP_NTZ (which
        # cannot cast to double — the round-2 lesson)
        def _num(c, dtype):
            if dtype.simpleString().startswith("timestamp"):
                return F.unix_micros(c.cast("timestamp")).cast("double")
            return c.cast("double")

        bts = _num(F.col(f"_bwd_{right_ts}"), right.schema[right_ts].dataType)
        fts = _num(F.col(f"_fwd_{right_ts}"), right.schema[right_ts].dataType)
        lt = _num(F.col("_ts"), left.schema[left_ts].dataType)
        use_bwd = F.when(F.col(f"_bwd_{right_ts}").isNull(), F.lit(False)).otherwise(
            F.col(f"_fwd_{right_ts}").isNull() | ((lt - bts) <= (fts - lt))
        )
        pick = {
            c: F.when(use_bwd, F.col(f"_bwd_{c}")).otherwise(F.col(f"_fwd_{c}"))
            for c in carry_cols
        }
    out = carried.filter(F.col("_is_left") == 1).select(
        *[F.col("_lrow")[c].alias(c) for c in left.columns],
        *[pick[c].alias(f"{c}{suffix}") for c in carry_cols],
    )
    return out


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    on: str | list[str] | None = None,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join (``start <= ts < end``), optionally also on
    equality key(s).

    Scale path: a naive theta-join is a cartesian/broadcast-nested-loop; at
    100 TB that's unrunnable. Instead each interval is exploded to the
    coarse time buckets it overlaps and each point maps to its one bucket,
    turning the theta-join into an EQUI-join on (keys…, bucket) followed by
    a cheap residual range filter. Work scales with
    intervals × (duration/bucket) — pick ``bucket_seconds`` near the median
    interval length."""
    from sycamore_spark.functions.time import epoch_seconds_d

    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))

    p = points.withColumn("_b", F.floor(epoch_seconds_d(points, point_ts) / bucket_seconds).cast("long"))
    i = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(epoch_seconds_d(intervals, start_col) / bucket_seconds).cast("long"),
                # end is exclusive: a zero-length or bucket-aligned end
                # doesn't spill into the next bucket
                F.floor(
                    (epoch_seconds_d(intervals, end_col) - F.lit(1e-9)) / bucket_seconds
                ).cast("long"),
            )
        ),
    )
    joined = p.join(i, on=keys + ["_b"], how=how).filter(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col))
    )
    return joined.drop("_b")


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
    probe_id: str | None = None,
) -> DataFrame:
    """Equi-join with hot-key salting: the build (smaller/skew-victim) side
    is replicated ``salt`` times, the probe side scatters each row to one
    replica by a deterministic row hash, so a single hot key occupies
    ``salt`` tasks instead of one. Join key must be a single column; extend
    with composite structs if needed.

    ``probe_id``: a row-unique probe column to salt on; without one the salt
    hashes all probe columns, which scatters unevenly when the probe has few
    distinct rows. Outer-on-build joins (right/full) are rejected — unmatched
    build rows would be emitted ``salt`` times.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched build-side "
            f"rows {salt}x; only inner/left/left_semi/left_anti are safe"
        )
    salt_src = [F.col(probe_id)] if probe_id else [F.col(c) for c in probe.columns]
    probe_s = probe.withColumn(
        "_salt",
        F.pmod(F.hash(*salt_src), F.lit(salt)),
    )
    build_s = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = probe_s.join(build_s, on=[on, "_salt"], how=how)
    return out.drop("_salt")


def bloom_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str | None = None,
    how: str = "inner",
    nbits: int = 1 << 20,
    nhashes: int = 5,
) -> DataFrame:
    """Runtime-filter join: a Bloom filter over the small side's join keys
    prefilters the big side BEFORE its shuffle, so only matching rows (plus
    the false-positive epsilon) ever move — the explicit form of the
    runtime row-group filters engines inject when the dimension side is
    selective but too big to broadcast. The exact join afterwards removes
    every false positive, so the result is IDENTICAL to the plain join.

    Only ``inner`` and ``left_semi`` are accepted: prefiltering the probe
    side is semantics-preserving exactly when unmatched probe rows are
    dropped anyway. Join-key dtypes must match across sides (the filter
    hashes raw column values on both).

    Scale shape: the build is one bounded bit_or shuffle (<= nbits/64
    rows) + a bitmap-sized collect broadcast into an Arrow probe; the
    fact-table scan then carries a ~fp-rate-selective filter into its
    exchange. Size nbits ~ 10x expected distinct keys for ~1%% FP.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(
            f"bloom_join supports how='inner'|'left_semi', got {how!r}: "
            "prefiltering the probe side drops unmatched probe rows"
        )
    from pyspark.sql.types import BooleanType

    from sycamore_spark.operators.dedup import _bloom_positions, build_bloom

    small_key = small_key or big_key
    bitmap = build_bloom(small, small_key, nbits=nbits, nhashes=nhashes)

    @F.pandas_udf(BooleanType())
    def _maybe(pos: pd.Series) -> pd.Series:
        m = np.vstack(pos.to_numpy()).astype(np.int64)
        hit = (bitmap[m >> 6] >> (m & 63).astype(np.uint64)) & np.uint64(1)
        return pd.Series(hit.all(axis=1).astype(bool))

    pref = big.filter(_maybe(_bloom_positions(F.col(big_key), nbits, nhashes)))
    if how == "left_semi":
        return pref.join(
            small.select(F.col(small_key).alias("_bk")).distinct(),
            pref[big_key] == F.col("_bk"),
            "left_semi",
        )
    return pref.join(small, pref[big_key] == small[small_key], "inner")


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int = 2,
    how: str = "inner",
) -> DataFrame:
    """Entity-resolution join on edit distance: pairs whose
    ``levenshtein(left_col, right_col) <= max_distance``, WITHOUT the
    all-pairs cross join. Blocking is length-banding, which is COMPLETE:
    an edit distance of d bounds the length difference by d, so with
    bucket width d+1 every qualifying pair is at most one bucket apart —
    the right side fans out to its bucket +-1 (3x one side, no recall
    loss, no alphabet assumptions). The equi-join on the bucket replaces
    the quadratic theta-join; exact levenshtein verifies candidates.

    At 100 TB add a second blocking key (normalized token set, phonetic
    code) to shrink bands further — the band join is the complete
    fallback. Only inner/left_semi semantics (a distance join has no
    meaningful outer form here)."""
    if how not in ("inner", "left_semi"):
        raise ValueError(f"fuzzy_join supports inner|left_semi, got {how!r}")
    d = int(max_distance)
    width = d + 1
    lb = left.withColumn("_fbk", F.floor(F.length(F.col(left_col)) / width).cast("long"))
    rbk = F.floor(F.length(F.col(right_col)) / width).cast("long")
    rb = right.withColumn(
        "_fbk", F.explode(F.array(rbk - F.lit(1), rbk, rbk + F.lit(1)))
    )
    cand = lb.join(rb, "_fbk")
    matched = cand.filter(
        F.levenshtein(F.col(left_col), F.col(right_col)) <= F.lit(d)
    ).drop("_fbk")
    if how == "left_semi":
        return left.join(
            matched.select(F.col(left_col).alias("_mk")).distinct(),
            F.col(left_col) == F.col("_mk"),
            "left_semi",
        )
    return matched
