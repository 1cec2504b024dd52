"""Deterministic job/stage/task-count proxy for per-change A/B measurement.

This host's ambient CPU baseline drifts hourly (PERF.md), so wall-clock A/Bs
are unreliable; Spark job/stage/task counts are host-independent and catch
redundant-action regressions (lineage re-runs, per-fold materialization jobs)
that wall time hides in noise.

Usage: python tools/jobcount.py [--sf DIR] q1 q2 ...

Prints one JSON line per query: {"name", "jobs", "stages", "tasks", "sec"}.
Each query runs in the SAME session sequentially; counts are deltas of the
statusTracker's job-id list, with stage/task totals summed over those jobs.
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = ss.init(app_name="jobcount")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    qs["groupby_count"](spark, args.sf).collect()  # session warmup
    tracker = spark.sparkContext.statusTracker()

    def total_jobs() -> int:
        # DAGScheduler's job-id counter: counts EVERY submitted job,
        # including foreachBatch jobs running under a streaming query's
        # job group (invisible to getJobIdsForGroup(None))
        return int(spark.sparkContext._jsc.sc().dagScheduler().nextJobId())

    for name in args.names:
        before = set(tracker.getJobIdsForGroup(None))
        all_before = total_jobs()
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        qs[name](spark, args.sf).collect()
        sec = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        all_jobs = total_jobs() - all_before
        new_ids = sorted(set(tracker.getJobIdsForGroup(None)) - before)
        stages = 0
        tasks = 0
        for jid in new_ids:
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None and si.numCompletedTasks > 0:
                    stages += 1
                    tasks += si.numTasks
        print(json.dumps({
            "name": name, "jobs_all": all_jobs, "jobs": len(new_ids),
            "stages": stages, "tasks": tasks, "sec": sec,
        }), flush=True)


if __name__ == "__main__":
    main()
