"""One-off profiler: break a q_stream_* entry's wall time into stage /
stream / finalize segments so the round-8 trim targets the real cost.
Usage: python tools/profile_stream.py [entry ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hive_json_spark.registry import QUERIES
from hive_json_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"


def main():
    spark = get_spark("hive-json-spark-profile-stream")
    names = sys.argv[1:] or [
        "q_stream_topk_final",
        "q_stream_rollup_final",
        "q_stream_merge_snapshot",
        "q_stream_cms_cells",
        "q_stream_psi_final",
        "q_stream_session_final",
        "q_stream_join_pairs",
    ]
    # warm the session (non-streaming) so JVM/codegen startup isn't billed
    QUERIES["q1_pricing_summary"](spark, SF_DIR).collect()
    for name in names:
        for run in range(2):
            spark.catalog.clearCache()
            t0 = time.time()
            df = QUERIES[name](spark, SF_DIR)
            n = df.count()
            print(f"{name} run{run}: {time.time()-t0:.2f}s rows={n}", flush=True)


if __name__ == "__main__":
    main()
