#!/usr/bin/env python
"""Full-registry sf1 sweep: every registered query once (plus a second
run for the headline set, min kept) at sf1 — the breadth companion to
tools/scale_run.py's depth sweep. Writes scale_full_results.json."""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import HEADLINE
from hive_json_spark.registry import QUERIES
from hive_json_spark.session import get_spark

sf_dir = os.path.join(REPO, "_scaledata", "sf1")
spark = get_spark("hive-json-spark-scale-full")
spark.sparkContext.setLogLevel("ERROR")
QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
n = spark.sparkContext.defaultParallelism
spark.range(0, n * 4, 1, n).mapInPandas(lambda it: it, "id long").write.format("noop").mode("overwrite").save()

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
    print(f"sf1 {name}: {timings[name]}", flush=True)

out = {
    "sf": 1.0,
    "n_queries": len(timings),
    "total": round(sum(timings.values()), 3),
    "queries": timings,
    "load_avg": [round(x, 2) for x in os.getloadavg()],
}
json.dump(out, open(os.path.join(REPO, "scale_full_results.json"), "w"), indent=1, sort_keys=True)
print("TOTAL", out["total"], flush=True)
