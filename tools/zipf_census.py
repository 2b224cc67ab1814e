#!/usr/bin/env python
"""Zipfian-corpus census of the dedup/similarity family (r5 verdict ask):
run each family query at zipf-sf0.1 and zipf-sf1 (tools/gen_scaledata.py
--vocab zipf), SOLO, warm, min-of-N with MATCHED measurement conditions
for numerator and denominator, and record the OUTPUT ROW COUNT at both
scales — the pair-output density evidence the saturated small-vocab
corpus could not provide (93% of its same-block pairs clear J >= 0.5,
so every pair output was dense regardless of algorithm; the Zipf corpus
is sparse: ~0.003% of same-block pairs clear the same threshold).

Writes zipf_census.json: per query {sf0.1: {sec, rows}, sf1: {sec, rows},
ratio, rows_ratio}.

Usage: python tools/zipf_census.py [--runs 3] [--only q1,q2,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# the dedup/similarity family over the documents/customer text columns
# (embedding/audio queries excluded: their tables are vocabulary-free)
FAMILY = [
    "q_dedup_exact",
    "q_minhash_dedup_pairs",
    "q_simhash_pairs",
    "q_ngram_jaccard_pairs",
    "q_setsim_prefix_join",
    "q_substring_dup",
    "q_winnow_dup",
    "q_dedup_clusters",
    "q_sorted_neighborhood",
    "q_fuzzy_name_match",
    "q_incremental_dedup",
    "q_dedup_method_eval",
    "q_survivorship",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--only", default="")
    ap.add_argument("--data", default=os.path.join(REPO, "_scaledata"))
    args = ap.parse_args()

    from hive_json_spark.registry import QUERIES
    from hive_json_spark.session import get_spark

    names = [n for n in (args.only.split(",") if args.only else FAMILY) if n in QUERIES]

    spark = get_spark("hive-json-spark-zipf-census")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: codegen + python worker pool
    zdir01 = os.path.join(args.data, "zipf-sf0.1")
    QUERIES["q_dedup_exact"](spark, zdir01).write.format("noop").mode(
        "overwrite"
    ).save()
    n = spark.sparkContext.defaultParallelism
    spark.range(0, n * 4, 1, n).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    results: dict[str, dict] = {}
    for sf_label, sf_dir in (("sf0.1", zdir01), ("sf1", os.path.join(args.data, "zipf-sf1"))):
        stats = {}
        for name in names:
            best, rows = None, None
            for _ in range(args.runs):
                t0 = time.perf_counter()
                # count() = one fused action that also yields the output
                # volume (pair density); same action at both scales
                rows = QUERIES[name](spark, sf_dir).count()
                el = time.perf_counter() - t0
                best = el if best is None else min(best, el)
                spark.catalog.clearCache()
            stats[name] = {"sec": round(best, 3), "rows": rows}
            print(f"{sf_label} {name}: {stats[name]}", flush=True)
        results[sf_label] = stats
        results[f"{sf_label}_load_avg"] = [round(x, 2) for x in os.getloadavg()]

    table = {
        q: {
            "sf0.1": results["sf0.1"][q],
            "sf1": results["sf1"][q],
            "ratio": round(
                results["sf1"][q]["sec"] / max(results["sf0.1"][q]["sec"], 1e-9), 2
            ),
            "rows_ratio": round(
                results["sf1"][q]["rows"] / max(results["sf0.1"][q]["rows"], 1), 2
            ),
        }
        for q in names
    }
    out = {
        "runs": args.runs,
        "corpus": "zipf (50k-word Zipf(1.07) vocab, non-sequential name keys)",
        "queries": table,
        "load_avg_sf0.1": results["sf0.1_load_avg"],
        "load_avg_sf1": results["sf1_load_avg"],
    }
    path = os.path.join(REPO, "zipf_census.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({q: (v["ratio"], v["rows_ratio"]) for q, v in table.items()}, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
