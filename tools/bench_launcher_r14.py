"""Pre-registered calm-probe bench protocol for round 14 (the r13 judge's
measurement-hygiene ask): a persistent Spark session probes every 80 s;
after 3 consecutive probes <= 0.30 s the full bench fires. The FIRST
completed run that passes the pre-registered acceptance rule is the
committed record — no post-hoc minimum selection.

Acceptance rule (registered in OPTIMIZATION_r14.md BEFORE any run):
  A. the run completed (JSON line emitted), and
  B. no mid-run slam: at most 2 of the 180 r13-committed per-query values
     regress by more than 3x in this run (the documented host-slam
     signature is 5+ untouched slots inflating 3-19x), and
  C. probe_pre <= 0.45 (fresh-JVM JIT allowance per the r13 decay
     experiment; the three launcher probes <= 0.30 are the real gate).
If a run fails the rule it is recorded as rejected with the reason and
the loop continues. First pass wins.
"""

import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

# Slam reference: the repo-committed full 200-query r13 record (183 slots
# >0.3 s) rather than the driver's compact 5-slot tail -- rule B needs
# breadth to see a mid-run slam.
R13Q = json.load(open("/root/repo/bench_out.json"))["queries"]

import sycamore_spark as ss  # noqa: E402

spark = ss.init(app_name="probe-launcher-r14")
spark.sparkContext.setLogLevel("ERROR")


def probe():
    t0 = time.perf_counter()
    spark.range(0, 20_000_000, 1, 32).selectExpr(
        "sum(id * 2654435761 % 1000003) AS s"
    ).collect()
    return round(time.perf_counter() - t0, 3)


probe()  # JIT warmup
attempt = 0
calm = 0
log = open("/tmp/bench_launcher_r14.log", "a")


def say(msg):
    log.write(f"{time.strftime('%H:%M:%S')} {msg}\n")
    log.flush()


while True:
    p = probe()
    calm = calm + 1 if p <= 0.30 else 0
    say(f"probe={p} calm={calm}")
    if calm < 3:
        time.sleep(80)
        continue
    calm = 0
    attempt += 1
    say(f"firing bench attempt {attempt}")
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    # Redirect the FULL per-query record (the stdout line is the compact
    # 5-slowest summary; rule B needs all ~200 slots).
    full_path = f"/tmp/bench_r14_attempt{attempt}.json"
    env["SPARK_GRAFT_BENCH_OUT"] = full_path
    out = subprocess.run(
        [sys.executable, "/root/repo/bench.py"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
    )
    line = None
    for ln in (out.stdout or "").splitlines():
        if ln.startswith('{"metric"'):
            line = ln
    if line is None or not os.path.exists(full_path):
        say(f"attempt {attempt}: NO JSON (rc={out.returncode}) — rejected A")
        continue
    rec = json.load(open(full_path))
    slams = [
        (k, v, R13Q[k]) for k, v in rec["queries"].items()
        if k in R13Q and R13Q[k] > 0.3 and v > 3 * R13Q[k]
    ]
    ppre = rec["calibration"]["probe_sec_pre"]
    say(f"attempt {attempt}: total={rec['value']} probe_pre={ppre} slams={len(slams)} {slams[:5]}")
    if len(slams) > 2:
        say(f"attempt {attempt}: rejected B (mid-run slam)")
        continue
    if ppre > 0.45:
        say(f"attempt {attempt}: rejected C (probe_pre {ppre})")
        continue
    say(f"attempt {attempt}: ACCEPTED — committed record")
    json.dump(rec, open("/tmp/bench_r14_ACCEPTED.json", "w"))
    json.dump(rec, open("/root/repo/bench_out.json", "w"))
    break
say("launcher done")
