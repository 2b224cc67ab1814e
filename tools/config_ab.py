"""Config A/B harness (guide §1.2 step 3, §9): measure candidate Spark
settings against the engine's default session on a named query set.

The §9 candidates (zstd shuffle codec, preferSortMergeJoin=false, …)
move shuffle/join costs that are below the ±2% noise floor at sf0.1, so
this tool is meant to run at sf1 (tools/gen_scaledata.py) where shuffle
volumes make the effect resolvable. Each variant runs in its OWN
subprocess/session (static confs like the IO codec cannot change at
runtime) with the same warmup + min-of-N protocol as min_measure.

Usage:
  python tools/config_ab.py q_a,q_b [runs] [--conf k=v ...]
With no --conf: baseline. The caller A/Bs by running twice,
back-to-back, and comparing mins (host variance demands matched runs).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    confs: dict[str, str] = {}
    rest: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--conf":
            k, _, v = next(it).partition("=")
            confs[k] = v
        else:
            rest.append(a)
    names = rest[0].split(",")
    runs = int(rest[1]) if len(rest) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from hive_json_spark.registry import QUERIES
    from hive_json_spark.session import get_spark

    spark = get_spark("config-ab", extra_conf=confs or None)
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in confs.items():
        got = spark.conf.get(k, None)
        if got != v:
            print(f"WARNING: {k} wanted {v!r} got {got!r} (stale session?)",
                  file=sys.stderr)
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
        out[name] = min(samples)
        print(json.dumps({name: {"min": out[name], "samples": samples}}), flush=True)
    print(json.dumps({"conf": confs, "mins": out, "total": round(sum(out.values()), 3)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
