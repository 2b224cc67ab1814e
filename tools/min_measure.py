"""Min-of-N in-session re-measure for small-delta triage.

Usage: python tools/min_measure.py q_a[,q_b,...] [runs=5]

Runs each named registry query ``runs`` times in ONE warmed session
(noop sink, clearCache between queries like bench.py) and prints the
per-query MIN plus all samples — the protocol for judging sub-second
optimization deltas that solo_measure's single attempt cannot resolve
(measured ±30% attempt-to-attempt variance on 1-3 s queries even at
steal 0%).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    names = sys.argv[1].split(",")
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from hive_json_spark.registry import QUERIES
    from hive_json_spark.session import get_spark

    spark = get_spark("min-measure")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    n = spark.sparkContext.defaultParallelism
    spark.range(0, n * 4, 1, n).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    out = {}
    for name in names:
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        out[name] = {"min": min(samples), "samples": samples}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"mins": {k: v["min"] for k, v in out.items()}}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
