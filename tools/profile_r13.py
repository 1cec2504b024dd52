"""Round-13 optimization profiler: warm per-query timings + formatted plans.

Usage:
    python tools/profile_r13.py [--reps N] [--plans DIR] [--suffix _before] q1 q2 ...

Times each named query with the bench methodology (cold run pays codegen
JIT, warm runs are the steady-state number), brackets the sweep with the
fixed-work calibration probe from bench.py so the record carries its own
host-drift signal, and optionally writes each query's `.explain("formatted")`
physical plan to DIR/<name><suffix>.txt (the judge-checkable plan evidence).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
import sycamore_spark as ss  # noqa: E402
from bench import calibration_probe  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def formatted_plan(df) -> str:
    jqe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jqe.explainString(mode)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3, help="runs per query (first is cold)")
    ap.add_argument("--plans", default=None, help="directory for formatted plans")
    ap.add_argument("--suffix", default="_before", help="plan filename suffix")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = ss.init(app_name="profile-r13")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    qs["groupby_count"](spark, SF_DIR).collect()  # session warmup
    calibration_probe(spark)
    probe_pre = calibration_probe(spark)

    out: dict[str, object] = {}
    for name in args.names:
        fn = qs[name]
        times = []
        df = None
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name}#run{i}")
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.collect()
            times.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = times
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            path = os.path.join(args.plans, f"{name}{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(formatted_plan(df))

    probe_post = calibration_probe(spark)
    record = {
        "sf_dir": SF_DIR,
        "probe_pre": probe_pre,
        "probe_post": probe_post,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "times": out,
    }
    print(json.dumps(record))
    spark.stop()


if __name__ == "__main__":
    main()
