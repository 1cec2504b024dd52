#!/usr/bin/env python
"""Rewrite the QUERIES dict order so driver sampling collects the most
evidence: never-driver-checked queries first, then stalest greens.

The external driver samples the FIRST ~50 entries of ``QUERIES`` (dict
order) each round and records rows in CORRECTNESS_r{N}.json. This tool
reorders the dict literal in __spark_entry__.py to put (1) queries with
no driver row ever, then (2) queries whose last green is oldest, then
(3) the rest — preserving relative order within each class. Run at the
START of a round, verify with check_parity, commit.

    python tools/rotate_queries.py            # rewrite in place
    python tools/rotate_queries.py --dry-run  # show the would-be first 50
"""

from __future__ import annotations

import glob
import json
import re
import sys

ENTRY = "__spark_entry__.py"


def last_green() -> dict[str, int]:
    out: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        n = int(re.search(r"r(\d+)", path).group(1))
        for k, row in json.load(open(path)).items():
            if row.get("err") is None and row.get("rows_match") is True:
                out[k] = max(out.get(k, 0), n)
    return out


def main() -> None:
    src = open(ENTRY).read()
    m = re.search(r"^QUERIES\s*[:=].*?^\}", src, re.M | re.S)
    block = m.group(0)
    keys = re.findall(r'^\s*"([^"]+)":', block, re.M)
    vals = dict(re.findall(r'^\s*"([^"]+)":\s*([^,]+),', block, re.M))
    green = last_green()
    never = [k for k in keys if k not in green]
    stale = sorted((k for k in keys if k in green), key=lambda k: (green[k], keys.index(k)))
    fill = stale[: max(0, 50 - len(never))]
    rest = [k for k in keys if k not in set(never) | set(fill)]
    order = never + fill + rest
    assert sorted(order) == sorted(keys)
    if "--dry-run" in sys.argv:
        print(f"{len(never)} never-checked; first 50 would be:")
        for k in order[:50]:
            print(" ", k, "(never)" if k not in green else f"(r{green[k]})")
        return
    lines = ["QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {"]
    lines.append("    # -- never driver-checked: sampled first --")
    lines += [f'    "{k}": {vals[k]},' for k in never]
    if fill:
        lines.append("    # -- stalest driver greens --")
        lines += [f'    "{k}": {vals[k]},' for k in fill]
    lines.append("    # -- fresher greens (rotate next round) --")
    lines += [f'    "{k}": {vals[k]},' for k in rest]
    lines.append("}")
    open(ENTRY, "w").write(src.replace(block, "\n".join(lines)))
    print(f"reordered: {len(never)} never + {len(fill)} stale in the first 50")


if __name__ == "__main__":
    main()
