"""Automated physical-plan audit over every queries() entry.

For each query, renders the formatted plan and flags the anti-patterns that
matter at 100 TB:

- CartesianProduct / BroadcastNestedLoopJoin (quadratic joins)
- BatchEvalPython (row-at-a-time Python UDF — everything should be Arrow)
- shuffle count (Exchange nodes) — the scale currency
- whether parquet scans carry PushedFilters when the query filters

Usage: python tools/plan_audit.py [sf_dir] [query ...]
Prints one line per query + a summary; exits 1 if a NEW red flag appears
(allowlist below documents the deliberate exceptions).
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402
import sycamore_spark as ss  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
ONLY = set(sys.argv[2:])

# Deliberate exceptions, each documented in PERF.md / module docstrings.
ALLOW_BNL = {
    "dedup_embedding",  # documented all-pairs oracle baseline; LSH twin is the scale path
    "ann_ivf",          # 10x8 centroid-routing crossJoin (constant-size)
    "nb_classify",      # label-model expansion: build side = one row per class
                        # (bounded, kilobytes) + vocab/total scalars; streamed
                        # O(n x |labels|) — the standard NB scoring shape
    "domain_classifier",  # same NB scoring shape (2-row label model), composed
                          # with hash-sampled training — see nb_classify
    "edu_select",  # same NB scoring shape (2-row label model), composed with
                   # the llm_map-annotated seed (FineWeb-Edu distillation)
}
ALLOW_CARTESIAN = {"ann_ivf"}  # same tiny routing join


def audit(name: str, df) -> dict:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    flags = []
    if "CartesianProduct" in plan and name not in ALLOW_CARTESIAN:
        flags.append("CARTESIAN")
    # count by unique operator id — AQE renders the tree twice but the
    # numbered operator detail section once
    n_bnl = len(set(re.findall(r"\((\d+)\) BroadcastNestedLoopJoin", plan)))
    if n_bnl and name not in ALLOW_BNL:
        # Scalar-broadcast shape: a crossJoin against a ONE-ROW frame (a
        # global keyless aggregate) is how Spark executes scalar subqueries
        # — O(n) streamed against a single broadcast row, fine at any
        # scale. The formatted plan shows each such aggregate as a
        # HashAggregate with "Keys: []" (partial + final = 2 ops per
        # scalar). Only flag BNLs beyond what those scalars account for.
        n_scalar_aggs = len(re.findall(r"Keys: \[\]", plan)) // 2
        if n_bnl > n_scalar_aggs:
            flags.append("BNL")
    if "BatchEvalPython" in plan:
        flags.append("ROW_PY_UDF")
    n_exchange = len(re.findall(r"\bExchange\b", plan))
    n_arrow = len(re.findall(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan))
    n_scan = len(re.findall(r"Scan parquet", plan))
    pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
    return {
        "flags": flags,
        "exchanges": n_exchange,
        "arrow_stages": n_arrow,
        "parquet_scans": n_scan,
        "pushed_filter_scans": pushed,
    }


def main() -> None:
    spark = ss.init(app_name="plan-audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    bad = []
    rows = []
    for name, fn in entry.queries().items():
        if ONLY and name not in ONLY:
            continue
        try:
            df = fn(spark, SF_DIR)
        except Exception as e:  # a query that cannot build is its own red flag
            bad.append(name)
            print(f"ERR   {name}: {type(e).__name__}: {str(e)[:120]}")
            continue
        a = audit(name, df)
        mark = "FLAG " if a["flags"] else "ok   "
        if a["flags"]:
            bad.append(name)
        rows.append((name, a))
        print(
            f"{mark} {name:24s} exch={a['exchanges']:2d} arrow={a['arrow_stages']} "
            f"scans={a['parquet_scans']} pushed={a['pushed_filter_scans']}"
            + (f"  {','.join(a['flags'])}" if a["flags"] else "")
        )
    n = len(rows)
    if n:
        le1 = sum(1 for _, a in rows if a["exchanges"] <= 1)
        print(
            f"\n{n} queries audited: {le1} with <=1 shuffle, "
            f"{sum(1 for _, a in rows if a['flags'])} flagged"
        )
    if bad:
        print(f"FLAGGED: {bad}")
        sys.exit(1)
    spark.stop()


if __name__ == "__main__":
    main()
