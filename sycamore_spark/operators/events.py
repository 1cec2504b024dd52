"""Product-analytics operators over an event stream: funnels, cohort
retention, interval coverage.

The engine's event surface beyond windows/sessionization — the three
queries every event warehouse runs, shaped for 100 TB:

- ``funnel_counts``: ordered-step conversion. One narrowing join+agg per
  step (all keyed on the user — AQE reuses the partitioning), never a
  per-user Python pass; step count is small and static, data is not.
- ``cohort_retention``: first-activity cohort x activity-period matrix.
  Two hash aggregates and one broadcast-back join.
- ``interval_union_length``: total covered time of overlapping intervals
  per key (session coverage, uptime). The classic sweep — sort by start
  within key, an island forms whenever a start exceeds the running max
  of prior ends — expressed as two windows + one aggregate. Integer
  epoch-micros arithmetic end-to-end, so results replay exactly in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sycamore_spark.functions.time import epoch_micros


def funnel_counts(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
) -> DataFrame:
    """Strict-order funnel: for each prefix of ``steps``, how many users
    completed it in order (each step strictly after the previous one's
    FIRST qualifying occurrence — the standard first-touch funnel).
    Returns (step_index, step, users) with users monotonically
    non-increasing."""
    ts = epoch_micros(F.col(ts_col))
    ev = df.select(F.col(user_col).alias("_u"), F.col(event_col).alias("_e"), ts.alias("_t"))
    reached = (
        ev.filter(F.col("_e") == steps[0])
        .groupBy("_u")
        .agg(F.min("_t").alias("_prev"))
    )
    counts = [reached.count()]
    for step in steps[1:]:
        nxt = (
            ev.filter(F.col("_e") == step)
            .join(reached, "_u")
            .filter(F.col("_t") > F.col("_prev"))
            .groupBy("_u")
            .agg(F.min("_t").alias("_prev"))
        )
        reached = nxt
        counts.append(reached.count())
    spark = df.sparkSession
    return spark.createDataFrame(
        [(i, s, int(c)) for i, (s, c) in enumerate(zip(steps, counts))],
        "step_index long, step string, users long",
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = 7 * 24 * 3600,
) -> DataFrame:
    """Cohort x period retention counts: users bucketed by their FIRST
    activity period; for every (cohort, offset) the distinct users active
    ``offset`` periods later. Periods are integer epoch divisions (exact).
    Returns (cohort, offset, users)."""
    per_us = int(period_seconds) * 1_000_000
    period = F.floor(epoch_micros(F.col(ts_col)) / F.lit(per_us)).cast("long")
    acts = df.select(F.col(user_col).alias("_u"), period.alias("_p")).distinct()
    first = acts.groupBy("_u").agg(F.min("_p").alias("_cohort"))
    return (
        acts.join(first, "_u")
        .groupBy(F.col("_cohort").alias("cohort"), (F.col("_p") - F.col("_cohort")).alias("offset"))
        .agg(F.countDistinct("_u").alias("users"))
    )


def interval_union_length(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Total covered micros of the union of (possibly overlapping)
    [start, end] intervals per key. Sweep as windows: running max of
    prior ends (exclusive), an island starts where start exceeds it,
    island ids by prefix sum, covered = max(end) - min(start) per island,
    summed per key. Returns (key_col, covered_micros, n_islands)."""
    s, e = epoch_micros(F.col(start_col)), epoch_micros(F.col(end_col))
    base = df.select(F.col(key_col).alias("_k"), s.alias("_s"), e.alias("_e"))
    w_order = Window.partitionBy("_k").orderBy(F.col("_s").asc(), F.col("_e").asc())
    prev_max = F.max("_e").over(w_order.rowsBetween(Window.unboundedPreceding, -1))
    flagged = base.withColumn(
        "_new", F.when(prev_max.isNull() | (F.col("_s") > prev_max), 1).otherwise(0)
    )
    island = F.sum("_new").over(w_order.rowsBetween(Window.unboundedPreceding, 0))
    spans = (
        flagged.withColumn("_i", island)
        .groupBy("_k", "_i")
        .agg((F.max("_e") - F.min("_s")).alias("_len"))
    )
    return spans.groupBy(F.col("_k").alias(key_col)).agg(
        F.sum("_len").cast("bigint").alias("covered_micros"),
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
    )


def event_transitions(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """First-order transition matrix over per-key event sequences: counts
    and row-normalized probabilities of (prev_event -> next_event) — the
    Markov summary behind next-action prediction and anomalous-flow
    detection. One lag window per key + one hash aggregate; probability
    is an exact division of two counts (same IEEE double everywhere).
    Returns (prev_event, next_event, n, p)."""
    order = [F.col(ts_col).asc()] + ([F.col(tiebreak_col).asc()] if tiebreak_col else [])
    w = Window.partitionBy(F.col(key_col)).orderBy(*order)
    pairs = (
        df.withColumn("_prev", F.lag(F.col(event_col)).over(w))
        .filter(F.col("_prev").isNotNull())
        .groupBy(F.col("_prev").alias("prev_event"), F.col(event_col).alias("next_event"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_tot = Window.partitionBy("prev_event")
    return pairs.withColumn(
        "p", F.col("n").cast("double") / F.sum("n").over(w_tot).cast("double")
    )


def frequent_paths(
    df: DataFrame,
    length: int = 3,
    key_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    tiebreak_col: str | None = None,
    top_k: int | None = None,
) -> DataFrame:
    """Frequent ordered event paths of ``length`` consecutive steps per
    key (the flow-mining extension of ``event_transitions``): lag windows
    build each row's trailing path, one hash aggregate counts them.
    Returns (step_0..step_{n-1}, n), optionally only the global top_k
    (ties broken by path order for determinism)."""
    order = [F.col(ts_col).asc()] + ([F.col(tiebreak_col).asc()] if tiebreak_col else [])
    w = Window.partitionBy(F.col(key_col)).orderBy(*order)
    cols = {f"step_{length - 1}": F.col(event_col)}
    for i in range(1, length):
        cols[f"step_{length - 1 - i}"] = F.lag(F.col(event_col), i).over(w)
    tagged = df.select(*[c.alias(n) for n, c in cols.items()])
    complete = tagged.dropna(subset=[f"step_{i}" for i in range(length)])
    out = complete.groupBy(*[f"step_{i}" for i in range(length)]).agg(
        F.count(F.lit(1)).alias("n")
    )
    if top_k:
        rank_w = Window.orderBy(
            F.col("n").desc(), *[F.col(f"step_{i}").asc() for i in range(length)]
        )
        out = (
            out.withColumn("_rk", F.row_number().over(rank_w))
            .filter(F.col("_rk") <= top_k)
            .drop("_rk")
        )
    return out


def active_users(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    windows: tuple[int, ...] = (1, 7, 28),
) -> DataFrame:
    """Rolling active-user counts — DAU/WAU/MAU and stickiness, the
    product-health metrics every event pipeline reports. For each day d
    and window W, counts DISTINCT users active in [d-W+1, d]. Returns one
    row per observed day: (day string, au_1, au_7, au_28, ...).

    Exact distinct-over-trailing-window without a window-function distinct
    (Spark has none): dedup to (user, day) pairs first, then each pair
    CONTRIBUTES to the W days it keeps the user active for (a sequence
    explode — fan-out bounded by max(windows), ~28x on kilobyte rows,
    orders of magnitude below the raw event count the first dedup
    removed), then one count-distinct per (day, window). Two shuffles
    total (pair dedup + final agg) regardless of window count; days with
    no activity are absent by construction (report joins a calendar spine
    when gaps matter). At extreme user counts swap the exact distinct for
    the HLL sketch (operators/sketches.py) — states merge across days."""
    from sycamore_spark.functions.time import epoch_micros

    # integer day number: subtract the remainder first so the double
    # division is over an exact multiple (bit-exact vs DuckDB's `//`)
    us = epoch_micros(F.col(ts_col))
    day = ((us - F.pmod(us, F.lit(86_400_000_000))) / F.lit(86_400_000_000)).cast("long")
    pairs = events.select(
        day.alias("_day"), F.col(user_col).alias("_user")
    ).distinct()
    observed = pairs.select("_day").distinct()
    w_max = max(windows)
    contrib = pairs.select(
        "_user",
        F.explode(
            F.sequence(F.col("_day"), F.col("_day") + F.lit(w_max - 1))
        ).alias("_d"),
        F.col("_day").alias("_src_day"),
    )
    # keep only observed days (trailing windows of days nobody was active
    # on aren't rows in the report)
    contrib = contrib.join(observed.withColumnRenamed("_day", "_d"), "_d")
    aggs = [
        F.count_distinct(
            F.when(F.col("_d") - F.col("_src_day") < F.lit(w), F.col("_user"))
        ).alias(f"au_{w}")
        for w in sorted(windows)
    ]
    out = contrib.groupBy("_d").agg(*aggs)
    return out.select(
        F.date_format(
            F.timestamp_micros((F.col("_d") * F.lit(86_400_000_000)).cast("long")), "yyyy-MM-dd"
        ).alias("day"),
        *[f"au_{w}" for w in sorted(windows)],
    ).orderBy("day")
