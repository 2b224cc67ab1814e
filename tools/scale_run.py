#!/usr/bin/env python
"""Scaling harness: run the headline set + slowest registry queries at
sf0.1 (driver testdata) and sf1 (tools/gen_scaledata.py output, 10x),
solo, warm, min-of-N, load-avg recorded — the measured evidence behind
SCALE.md's 100 TB arguments. Writes scale_results.json.

Usage: python tools/scale_run.py [--runs 3] [--only q1,q2,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# r4 bench_detail slowest + verdict watch-list, deduped against HEADLINE
SLOWEST = [
    "q_dedup_method_eval", "q_doc_novelty", "q_ann_recall",
    "q_zorder_layout", "q_mad_outliers", "q_rrf_fusion", "q_kmeans_lloyd",
    "q_bfs_hops", "q_survivorship", "q_pq_recall", "q_mmr_rerank",
    "q_substring_dup", "q22_global_sales_opportunity",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--only", default="")
    ap.add_argument("--sf1-dir", default=os.path.join(REPO, "_scaledata", "sf1"))
    args = ap.parse_args()

    from bench import HEADLINE
    from hive_json_spark.registry import QUERIES
    from hive_json_spark.session import get_spark

    names = HEADLINE + [q for q in SLOWEST if q not in HEADLINE]
    if args.only:
        names = [n for n in args.only.split(",") if n in QUERIES]

    spark = get_spark("hive-json-spark-scale")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: codegen + python worker pool
    QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.1").write.format(
        "noop"
    ).mode("overwrite").save()
    n = spark.sparkContext.defaultParallelism
    spark.range(0, n * 4, 1, n).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    results: dict[str, dict] = {}
    for sf_label, sf_dir in (("sf0.1", "/root/testdata/sf0.1"), ("sf1", args.sf1_dir)):
        timings = {}
        for name in names:
            best = None
            for _ in range(args.runs):
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                el = time.perf_counter() - t0
                best = el if best is None else min(best, el)
                spark.catalog.clearCache()
            timings[name] = round(best, 3)
            print(f"{sf_label} {name}: {timings[name]}", flush=True)
        results[sf_label] = {
            "queries": timings,
            "load_avg": [round(x, 2) for x in os.getloadavg()],
        }

    ratios = {
        q: round(results["sf1"]["queries"][q] / max(results["sf0.1"]["queries"][q], 1e-9), 2)
        for q in names
    }
    out = {
        "runs": args.runs,
        "names": names,
        "sf0.1": results["sf0.1"],
        "sf1": results["sf1"],
        "ratio_sf1_over_sf0.1": ratios,
    }
    path = os.path.join(REPO, "scale_results.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(ratios, sort_keys=True), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
