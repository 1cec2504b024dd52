"""Mergeable sketch aggregations — the 100 TB path for distinct counts,
quantiles, and set overlaps.

Exact ``countDistinct`` / ``percentile`` / set-intersection joins are the
CORRECTNESS oracles of this repo, but none of them is what you run on a
100 TB corpus: exact distinct needs a full shuffle of every key, exact
percentiles need a global sort, and exact set overlap needs a join of both
sides. Sketches replace all three with one streaming pass producing a
small mergeable state (per partition, per day, per source …) that
re-aggregates WITHOUT rescanning the data:

- **HLL** (``hll_sketch_agg``): distinct-count states merge by register
  max, so rollups (daily -> monthly -> all-time) re-aggregate kilobyte
  states under the SAME error bound as sketching the raw union. (Merged
  and directly-built sketches are not bit-identical — DataSketches HLL
  promotes sparse coupon lists to dense registers at different points —
  so equality assertions are wrong; bound assertions are right.)
- **KLL** (``kll_sketch_agg_double``): mergeable quantile sketch with a
  provable rank-error bound — the scale twin of this repo's exact
  ``percentile`` operators (textstats.quantile_stats).
- **Theta** (``theta_sketch_agg``): supports union/intersection/difference
  estimates — cross-corpus overlap analytics (shared users, shared docs)
  without joining the raw tables.

Everything here is a native JVM aggregate (no Python in the hot path);
one shuffle per groupBy, kilobytes per group after the partial aggregate.

The oracle gates for these operators emit EXACT values (hash-checked
against DuckDB) alongside sketch-vs-exact error-bound assertions folded to
booleans — the honest way to gate approximate operators on a hash oracle.

Reference parity note: the reference has no sketch surface (its
``count_distinct`` is exact-only, lib/sycamore docset.py count_distinct);
this module is part of the beyond-reference scale suite, like
operators/dedup.py and operators/sampling.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_distinct(
    df: DataFrame, key: str, group_cols: list[str] | None = None, lg_k: int = 12
) -> DataFrame:
    """Approximate distinct ``key`` count per group as one streaming
    aggregate (relative error ~1.04/sqrt(2^lg_k); ~1.6% at lg_k=12 for a
    4 KB register array). Unlike ``approx_count_distinct`` this keeps the
    full HLL state mergeable — pair with ``hll_rollup``."""
    gb = df.groupBy(*[F.col(c) for c in (group_cols or [])])
    return gb.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(F.col(key), F.lit(lg_k))).alias(
            f"approx_{key}_distinct"
        )
    )


def hll_sketches(
    df: DataFrame, key: str, group_cols: list[str], lg_k: int = 12,
    sketch_col: str = "hll",
) -> DataFrame:
    """Materialize per-group HLL states (binary, ~2^lg_k bytes each) — the
    thing you persist per day/source partition so later rollups never
    rescan the raw 100 TB."""
    return df.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.hll_sketch_agg(F.col(key), F.lit(lg_k)).alias(sketch_col)
    )


def hll_rollup(
    sketches: DataFrame, group_cols: list[str], sketch_col: str = "hll",
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Re-aggregate stored HLL states to a coarser grouping (day->month,
    source->corpus) by register-max union — same error bound as building
    the coarse sketch from raw data, at the cost of reading kilobytes
    instead of terabytes. (Not bit-identical to a direct build: sparse->
    dense promotion differs; the ESTIMATE carries the same guarantee.)"""
    return (
        sketches.groupBy(*[F.col(c) for c in group_cols])
        .agg(F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col))).alias(out_col))
    )


def kll_quantiles(
    df: DataFrame,
    value_col: str,
    probs: list[float],
    group_cols: list[str] | None = None,
    k: int = 200,
) -> DataFrame:
    """Approximate per-group quantiles from one mergeable KLL sketch pass
    (normalized rank error ~1.65% at k=200). The 100 TB replacement for
    textstats.quantile_stats' exact global-sort ``percentile``: one narrow
    aggregate, kilobyte state, provable rank bound."""
    gb = df.groupBy(*[F.col(c) for c in (group_cols or [])])
    sk = F.kll_sketch_agg_double(F.col(value_col).cast("double"), F.lit(k))
    return gb.agg(
        *[
            F.kll_sketch_get_quantile_double(sk, F.lit(float(p))).alias(
                "approx_q" + str(p).replace("0.", "").rstrip("0")
            )
            for p in probs
        ]
    )


def theta_overlap(
    df: DataFrame, key: str, side_col: str, side_a: str, side_b: str,
    lg_k: int = 12,
) -> DataFrame:
    """Set-overlap cardinalities between two slices of one table (users
    active in both event types, docs shared by two sources, …) WITHOUT
    joining raw rows: two theta sketches built in one pass over the data,
    then |A|, |B|, |A u B|, |A n B| estimated from the kilobyte states.
    Returns a single row; at 100 TB this is one scan + a constant-size
    reduce, vs an exact semi-join's full shuffle of both sides."""
    a = F.theta_sketch_agg(
        F.when(F.col(side_col) == side_a, F.col(key)), F.lit(lg_k)
    )
    b = F.theta_sketch_agg(
        F.when(F.col(side_col) == side_b, F.col(key)), F.lit(lg_k)
    )
    sk = df.agg(a.alias("_a"), b.alias("_b"))
    return sk.select(
        F.theta_sketch_estimate(F.col("_a")).alias("approx_a"),
        F.theta_sketch_estimate(F.col("_b")).alias("approx_b"),
        F.theta_sketch_estimate(F.theta_union(F.col("_a"), F.col("_b"))).alias(
            "approx_union"
        ),
        F.theta_sketch_estimate(F.theta_intersection(F.col("_a"), F.col("_b"))).alias(
            "approx_intersection"
        ),
        F.theta_sketch_estimate(F.theta_difference(F.col("_a"), F.col("_b"))).alias(
            "approx_a_minus_b"
        ),
    )


def frequent_tokens(
    df: DataFrame,
    text_col: str,
    k: int = 100,
    id_col: str | None = None,
) -> DataFrame:
    """Exact heavy hitters — every token with global count strictly above
    ``n/k`` — found WITHOUT shuffling the full token stream. Returns
    (token, cnt) with exact counts.

    Two-phase Misra-Gries prefilter + exact verify:

    1. each partition runs Misra-Gries with k counters over its own token
       stream inside one Arrow stage (no shuffle): any token with
       partition count > n_p/(k+1) survives its partition's summary, so
       by pigeonhole the UNION of partition candidates contains every
       token with GLOBAL count > n/k — a superset guarantee that holds
       for ANY partitioning;
    2. exact counts for candidates only: the token stream is semi-joined
       against the (≤ k · n_partitions row) candidate set before the
       count — the only shuffle carries candidate tokens, not the corpus
       vocabulary — and the final filter ``cnt * k > n`` uses the exact
       counts, so the OUTPUT is exact and partitioning-independent even
       though the intermediate sketch is not.

    This is the 100 TB replacement for ``GROUP BY token ORDER BY count``
    top-frequency queries whose full-vocabulary shuffle dominates corpus
    scans. For multiset item columns pass any text; tokens are lowercased
    whitespace splits (``functions.text.tokens``).
    """
    import pandas as pd

    from sycamore_spark.functions import text as T

    toks = df.select(F.explode(T.tokens(F.col(text_col))).alias("token"))

    def _mg(it):
        state: dict[str, int] = {}
        for pdf in it:
            for tok, c in pdf["token"].value_counts().items():
                if tok in state or len(state) < k:
                    state[tok] = state.get(tok, 0) + int(c)
                else:
                    # batch decrement: remove the largest d that empties
                    # at least one counter (equivalent to d unit MG steps)
                    d = min(min(state.values()), int(c))
                    state = {t: v - d for t, v in state.items() if v > d}
                    if int(c) > d:
                        state[tok] = int(c) - d
        if state:
            yield pd.DataFrame({"token": list(state.keys())})

    cand = toks.mapInPandas(_mg, schema="token string").distinct()
    n_total = toks.count()
    exact = (
        toks.join(cand, "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * F.lit(k) > F.lit(n_total))
    )
    return exact.select("token", "cnt")


def approx_active_users_hll(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    windows: tuple[int, ...] = (1, 7, 28),
    lg_k: int = 12,
) -> DataFrame:
    """Trailing-window distinct users from MERGEABLE daily HLL states —
    the 100 TB twin of ``operators.events.active_users``: the exact
    version dedups and explodes (user, day) pairs, this one scans the
    events ONCE into one kilobyte sketch per day and every trailing
    window is a register-wise union of ≤ W daily states. Day N+1 never
    rescans history, and the same states roll up to weekly/monthly
    reports for free.

    Returns (day string, windows' approx counts). Estimates carry HLL
    error (~1.6% at lg_k=12) — gate with error-bound checks against the
    exact twin, never estimate equality (merged and direct states are
    not bit-identical)."""
    from sycamore_spark.functions.time import epoch_micros

    us = epoch_micros(F.col(ts_col))
    day = ((us - F.pmod(us, F.lit(86_400_000_000))) / F.lit(86_400_000_000)).cast("long")
    daily = (
        events.select(day.alias("_day"), F.col(user_col).alias("_u"))
        .groupBy("_day")
        .agg(F.hll_sketch_agg(F.col("_u"), F.lit(lg_k)).alias("_sk"))
    )
    spine = daily.select(F.col("_day").alias("_d"))
    # each day's state contributes to the trailing windows of the next
    # max(windows) days — a W-bounded explode of kilobyte sketches
    w_max = max(windows)
    contrib = daily.select(
        "_sk",
        F.col("_day").alias("_src"),
        F.explode(F.sequence(F.col("_day"), F.col("_day") + F.lit(w_max - 1))).alias("_d"),
    ).join(spine, "_d")
    aggs = [
        F.hll_sketch_estimate(
            F.hll_union_agg(
                F.when(F.col("_d") - F.col("_src") < F.lit(w), F.col("_sk")), F.lit(True)
            )
        ).alias(f"approx_au_{w}")
        for w in sorted(windows)
    ]
    out = contrib.groupBy("_d").agg(*aggs)
    return out.select(
        F.date_format(
            F.timestamp_micros((F.col("_d") * F.lit(86_400_000_000)).cast("long")),
            "yyyy-MM-dd",
        ).alias("day"),
        *[f"approx_au_{w}" for w in sorted(windows)],
    )
