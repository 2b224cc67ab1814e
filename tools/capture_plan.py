"""Capture .explain("formatted") for named registry queries into files.

Usage: python tools/capture_plan.py <outdir> <suffix> q_a[,q_b,...]

Writes <outdir>/<query>_<suffix>.txt for each query. The formatted plan is
taken from the DataFrame the registry function returns (static explain —
AdaptiveSparkPlan isFinalPlan=false), which is the committed-evidence
convention PLANS.md uses. Queries that execute eagerly inside their builder
(driver loops over bounded frames) still return a final DataFrame; its plan
plus the builder's documented job inventory is the evidence."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)

    from hive_json_spark.registry import QUERIES
    from hive_json_spark.session import get_spark

    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
