"""Automated physical-plan audit over every queries() entry.

For each query, renders the formatted plan and flags the anti-patterns that
matter at 100 TB:

- CartesianProduct / BroadcastNestedLoopJoin (quadratic joins)
- BatchEvalPython (row-at-a-time Python UDF — everything should be Arrow)
- shuffle count (Exchange nodes) — the scale currency
- whether parquet scans carry PushedFilters when the query filters
- CONSTANT-KEY partitioning: an Exchange hashpartitioning or a Window
  partition spec whose key is a literal (or a column defined as a bare
  literal upstream) — the whole input funnels through ONE task while the
  plan still "looks partitioned" (the r12 isotonic_apply escape:
  ``asof_join(on=lit(1))`` sailed through 280/0 because the Window *was*
  partitioned, just by a constant)

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
    "calibrated_select",  # same NB scoring shape (2-row label model),
                          # composed with the seed-fit binned-isotonic
                          # calibration (zero-shuffle compiled apply)
}
ALLOW_CARTESIAN = {"ann_ivf"}  # same tiny routing join
# Queries allowed a literal-keyed hashpartitioning/Window — currently none;
# a seed-sized single-task fold (isotonic_fit's repartition(1)) renders as
# SinglePartition, not a constant hash key, so it does not trip this.
ALLOW_CONST_KEY: set[str] = set()


def _balanced_args(plan: str, start: int) -> str:
    """Return the argument text of the call whose '(' is at ``start``,
    respecting nested parentheses."""
    depth = 0
    for i in range(start, len(plan)):
        if plan[i] == "(":
            depth += 1
        elif plan[i] == ")":
            depth -= 1
            if depth == 0:
                return plan[start + 1 : i]
    return plan[start + 1 :]


_LIT = r"(?:-?\d+(?:\.\d+)?[LD]?|true|false|null)"


def constant_key_partitionings(plan: str) -> list[str]:
    """Find hashpartitioning / Window partition specs keyed by a literal —
    directly (``hashpartitioning(1, 200)``) or through a column some
    upstream Project defines as a bare literal (``1 AS _k#10`` then
    ``hashpartitioning(_k#10, 200)``). Either way every row hashes to one
    partition: a single-task stage disguised as a partitioned one."""
    lit_cols = {
        m.group(1)
        for m in re.finditer(rf"(?<![\w.#]){_LIT} AS (\w+#\d+)", plan)
    }
    hits = []
    for m in re.finditer(r"\b(hashpartitioning|windowspecdefinition)\(", plan):
        kind = m.group(1)
        args = _balanced_args(plan, m.end() - 1)
        # split on top-level commas only
        parts, depth, cur = [], 0, []
        for ch in args:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                parts.append("".join(cur).strip())
                cur = []
            else:
                cur.append(ch)
        parts.append("".join(cur).strip())
        if kind == "hashpartitioning":
            keys = parts[:-1]  # last arg is numPartitions
        else:
            # windowspecdefinition(partCols..., orderSpecs..., frame):
            # partition keys are the leading args before any ordering spec
            keys = []
            for p in parts:
                if re.search(r"\b(ASC|DESC)\b", p) or p.startswith(
                    "specifiedwindowframe"
                ):
                    break
                keys.append(p)
        # a composite key with one real column still distributes — the
        # single-task funnel needs EVERY partition key constant
        if keys and all(re.fullmatch(_LIT, k) or k in lit_cols for k in keys):
            hits.append(f"{kind}({', '.join(keys)})")
    return hits


def audit(name: str, df) -> dict:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    flags = []
    const_keys = constant_key_partitionings(plan)
    if const_keys and name not in ALLOW_CONST_KEY:
        flags.append("CONST_KEY")
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
        "const_keys": const_keys,
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
