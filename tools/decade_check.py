#!/usr/bin/env python
"""sf10 decade spot-check (r5 verdict ask #6): run the five worst-ratio
sf1 queries at sf1 AND sf10 (tools/gen_scaledata.py --sf 10 --tables
documents,customer,lineitem), solo, warm, min-of-N, matched conditions —
confirming the census fixes hold when the data term fully dominates
(sf10 is where e.g. the 2048-row block probe first trips on the real
generator ratios). Writes decade_results.json.

Usage: python tools/decade_check.py [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# the five worst sf1/sf0.1 ratios from scale_results.json (r5)
WORST = [
    "q_dedup_clusters",      # 12.2x — dense-output residual
    "q_survivorship",        # 10.5x — linear row growth under one window
    "q_fuzzy_name_match",    # census fix (FastSS edit-distance pairs)
    "q_ngram_jaccard_pairs", # census fix (pair-volume dispatch, r6)
    "q_zorder_layout",       # 6.9x — ingest-time layout cost
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--only", default="")
    ap.add_argument("--corpus", default="", help='"" (small-vocab) or "zipf-"')
    ap.add_argument(
        "--out",
        default="",
        help="output filename (default decade_results[_zipf].json); use a "
        "distinct name for --only subsets so the full census is not clobbered",
    )
    args = ap.parse_args()

    from hive_json_spark.registry import QUERIES
    from hive_json_spark.session import get_spark

    names = [n for n in (args.only.split(",") if args.only else WORST) if n in QUERIES]
    spark = get_spark("hive-json-spark-decade")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q_dedup_exact"](
        spark, os.path.join(REPO, "_scaledata", f"{args.corpus}sf1")
    ).write.format("noop").mode("overwrite").save()

    results: dict[str, dict] = {}
    for sf_label in ("sf1", "sf10"):
        sf_dir = os.path.join(REPO, "_scaledata", f"{args.corpus}{sf_label}")
        stats = {}
        for name in names:
            best, rows = None, None
            for _ in range(args.runs):
                t0 = time.perf_counter()
                rows = QUERIES[name](spark, sf_dir).count()
                el = time.perf_counter() - t0
                best = el if best is None else min(best, el)
                spark.catalog.clearCache()
            stats[name] = {"sec": round(best, 3), "rows": rows}
            print(f"{sf_label} {name}: {stats[name]}", flush=True)
        results[sf_label] = stats
        results[f"{sf_label}_load_avg"] = [round(x, 2) for x in os.getloadavg()]

    out = {
        "runs": args.runs,
        "corpus": args.corpus or "small-vocab",
        "queries": {
            q: {
                "sf1": results["sf1"][q],
                "sf10": results["sf10"][q],
                "ratio": round(
                    results["sf10"][q]["sec"] / max(results["sf1"][q]["sec"], 1e-9), 2
                ),
                "rows_ratio": round(
                    results["sf10"][q]["rows"] / max(results["sf1"][q]["rows"], 1), 2
                ),
            }
            for q in names
        },
        "load_avg_sf1": results["sf1_load_avg"],
        "load_avg_sf10": results["sf10_load_avg"],
    }
    suffix = "_zipf" if args.corpus else ""
    out_name = args.out or f"decade_results{suffix}.json"
    with open(os.path.join(REPO, out_name), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({q: (v["ratio"], v["rows_ratio"]) for q, v in out["queries"].items()}, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
