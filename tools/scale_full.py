#!/usr/bin/env python
"""Full-registry sf1 sweep: every registered query once (plus a second
run for the headline set, min kept) at sf1, AND the same single-pass
sweep at sf0.1 in the SAME session/conditions — so the per-query ratios
the artifact implies share measurement conditions (the r5 artifact's
sf0.1 denominators came from the concurrent bench and overstated e.g.
q_fuzzy_name_match 21x vs its matched 17x output growth). The breadth
companion to tools/scale_run.py's depth sweep (which stays the
apples-to-apples solo min-of-3 record). Writes scale_full_results.json
with both sweeps and matched ratios."""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import HEADLINE
from hive_json_spark.registry import QUERIES
from hive_json_spark.session import get_spark

SF1_DIR = os.path.join(REPO, "_scaledata", "sf1")
SF01_DIR = "/root/testdata/sf0.1"
spark = get_spark("hive-json-spark-scale-full")
spark.sparkContext.setLogLevel("ERROR")
QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
n = spark.sparkContext.defaultParallelism
spark.range(0, n * 4, 1, n).mapInPandas(lambda it: it, "id long").write.format("noop").mode("overwrite").save()

def sweep(label: str, sf_dir: str) -> dict:
    timings = {}
    for name in sorted(QUERIES):
        runs = 2 if name in HEADLINE else 1
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
            spark.catalog.clearCache()
        timings[name] = round(best, 3)
        print(f"{label} {name}: {timings[name]}", flush=True)
    return timings


def _cpu_ticks():
    v = [int(x) for x in open("/proc/stat").readline().split()[1:]]
    return v[7], sum(v)


def _steal_sample(win: float = 2.0) -> float:
    a = _cpu_ticks()
    time.sleep(win)
    b = _cpu_ticks()
    return 100 * (b[0] - a[0]) / max(b[1] - a[1], 1)


# whole-run steal provenance (r10): the r10 first sweep's worst "ratios"
# (q_power_iteration 18.7, q_survivorship 18.0) dissolved to 4.6 / 8.8 in
# matched solo re-measures — co-tenant bursts during one leg read as scale
# regressions. Stamp the record so a dirty sweep is never mistaken for one,
# and pre-wait (bounded) for a quiet window before the first leg.
_deadline = time.time() + float(os.environ.get("SPARK_GRAFT_SWEEP_WAIT_S", "600"))
while time.time() < _deadline:
    if os.getloadavg()[0] < 1.0 and _steal_sample() <= 0.5:
        break
    time.sleep(10)
_steal0 = _cpu_ticks()
t01 = sweep("sf0.1", SF01_DIR)
t1 = sweep("sf1", SF1_DIR)
_steal1 = _cpu_ticks()
steal_pct = round(
    100 * (_steal1[0] - _steal0[0]) / max(_steal1[1] - _steal0[1], 1), 2
)
import subprocess

sha = subprocess.run(
    ["git", "rev-parse", "HEAD"], capture_output=True, text=True, cwd=REPO
).stdout.strip()
dirty = subprocess.run(
    ["git", "status", "--porcelain", "--", "hive_json_spark", "bench.py"],
    capture_output=True, text=True, cwd=REPO,
).stdout.strip()
out = {
    "provenance": "both sweeps same session, same single-pass conditions "
                  "(2 runs min-kept for HEADLINE); ratios are matched",
    "n_queries": len(t1),
    "sf0.1": {"total": round(sum(t01.values()), 3), "queries": t01},
    "sf1": {"total": round(sum(t1.values()), 3), "queries": t1},
    "ratio_sf1_over_sf0.1": {
        q: round(t1[q] / max(t01[q], 1e-9), 2) for q in t1
    },
    "load_avg": [round(x, 2) for x in os.getloadavg()],
    "cpu_steal_pct": steal_pct,
    "engine_git_sha": sha + ("-dirty" if dirty else ""),
}
json.dump(out, open(os.path.join(REPO, "scale_full_results.json"), "w"), indent=1, sort_keys=True)
print("TOTAL sf0.1", out["sf0.1"]["total"], "sf1", out["sf1"]["total"],
      "steal", steal_pct, flush=True)
