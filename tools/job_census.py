"""Per-query Spark JOB census (the r10 wishlist tool): how many
driver-blocking actions each registry entry launches for one execution.

Stage counts (bench_detail telemetry) measure plan width; JOB counts
measure fixed cost — every job is at least one driver-blocking
round trip (~0.25-0.4 s on this box for tiny jobs), so a query whose
wall is dominated by job count is fixed-overhead-bound, not data-bound.
The census makes that visible in review instead of by profiling: a
build-round regression that adds a stray count()/collect() shows up as
a +1 in this table.

Usage: python tools/job_census.py [q_a,q_b,... | all] [out.json]

Runs each query once (noop sink) inside its own job group and reports
{query: {"jobs": N, "wall": s}}. Single-run walls are noisy (±30%) —
use min_measure for timing; the JOB COUNT is deterministic for a fixed
sf (dispatch probes may branch on scale).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from hive_json_spark.registry import QUERIES
    from hive_json_spark.session import get_spark

    names = list(QUERIES) if which == "all" else which.split(",")

    spark = get_spark("job-census")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    QUERIES["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    n = sc.defaultParallelism
    spark.range(0, n * 4, 1, n).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    tracker = sc.statusTracker()
    out = {}
    for name in names:
        group = f"census-{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        err = None
        try:
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:  # keep the census going; record the failure
            err = f"{type(e).__name__}: {e}"[:200]
        wall = round(time.perf_counter() - t0, 3)
        sc.setJobGroup(None, None)
        jobs = len(tracker.getJobIdsForGroup(group))
        out[name] = {"jobs": jobs, "wall": wall}
        if err:
            out[name]["err"] = err
        print(json.dumps({name: out[name]}), flush=True)
        spark.catalog.clearCache()
    ranked = sorted(out.items(), key=lambda kv: -kv[1]["jobs"])
    print(json.dumps({"top_by_jobs": ranked[:25]}, indent=1))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    return 1 if any("err" in v for v in out.values()) else 0


if __name__ == "__main__":
    raise SystemExit(main())
