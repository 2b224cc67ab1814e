"""Streaming state-growth census (r8, verdict ask #3).

The batch operators have a decade census; this measures the STREAMING
family's state bounds at sf0.1 -> sf1 (10x events / changelog rows):

- topk/cms:   versioned parquet state (streaming/state.py) — rows must
              track KEY cardinality (users / depth*width cells), never
              stream volume.
- merge:      bucketed snapshot — rows must track LIVE keys (last change
              an upsert), never changelog volume.
- session:    the engine's own state store (session_window aggregation,
              APPEND mode) — per-batch numRowsTotal must track OPEN
              sessions (gap/watermark eviction), never events seen.

Reference anchor: the accumulator-as-state mapping (SURVEY §2 streaming
row) — the reference's only state is its schema accumulator
(JsonSchemaFinder.java:239-245), bounded by the RESULT, not the input;
these tables prove the same property for every streaming sink here.

Usage: python tools/stream_state_census.py [out.json]
Writes stream_state_census.json at the repo root by default.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SCALES = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "_scaledata/sf1"),
}


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _stage(df, src: str, n_files: int, by=None, range_by=None):
    if range_by is not None:
        rep = df.repartitionByRange(n_files, F.col(range_by))
    elif by is not None:
        rep = df.repartition(n_files, by)
    else:
        rep = df.repartition(n_files)
    rep.write.mode("overwrite").parquet(src)
    spark = df.sparkSession
    return (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )


def census_topk(spark, sf_dir: str) -> dict:
    from hive_json_spark.sources import load_table
    from hive_json_spark.streaming.topk import streaming_topk

    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    n_keys = ev.select("user_id").distinct().count()
    tmp = tempfile.mkdtemp(prefix="census_topk_")
    t0 = time.time()
    q = streaming_topk(_stage(ev, f"{tmp}/src", 2), "user_id", f"{tmp}/state", f"{tmp}/ckpt", k=10)
    q.awaitTermination()
    rows = spark.read.parquet(f"{tmp}/state/counts").count()
    out = {
        "events": n_events,
        "distinct_keys": n_keys,
        "state_rows": rows,
        "state_bytes": _dir_bytes(f"{tmp}/state/counts"),
        "sec": round(time.time() - t0, 2),
    }
    shutil.rmtree(tmp, ignore_errors=True)
    return out


def census_cms(spark, sf_dir: str) -> dict:
    from hive_json_spark.sources import load_table
    from hive_json_spark.streaming.cms import streaming_cms

    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    tmp = tempfile.mkdtemp(prefix="census_cms_")
    t0 = time.time()
    q = streaming_cms(_stage(ev, f"{tmp}/src", 2), "user_id", f"{tmp}/state", f"{tmp}/ckpt", depth=4, width=512)
    q.awaitTermination()
    from hive_json_spark.streaming.state import latest_version

    v = latest_version(spark, f"{tmp}/state")
    rows = spark.read.parquet(f"{tmp}/state/v={v}").count()
    out = {
        "events": n_events,
        "cell_bound": 4 * 512,
        "state_rows": rows,
        "state_bytes": _dir_bytes(f"{tmp}/state/v={v}"),
        "sec": round(time.time() - t0, 2),
    }
    shutil.rmtree(tmp, ignore_errors=True)
    return out


def census_merge(spark, sf_dir: str) -> dict:
    from hive_json_spark.sources import load_table
    from hive_json_spark.streaming.merge import streaming_merge_upsert

    chg = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
        "o_totalprice",
        "o_orderdate",
    )
    n_changes = chg.count()
    from pyspark.sql import Window

    live = (
        chg.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("o_custkey").orderBy(F.col("o_orderkey").desc())
            ),
        )
        .filter((F.col("rn") == 1) & (F.col("op") == "U"))
        .count()
    )
    tmp = tempfile.mkdtemp(prefix="census_merge_")
    t0 = time.time()
    q = streaming_merge_upsert(
        _stage(chg, f"{tmp}/src", 2, by=F.pmod(F.hash("o_custkey"), F.lit(8))),
        key_col="o_custkey",
        op_col="op",
        seq_col="o_orderkey",
        payload_cols=["o_totalprice", "o_orderdate"],
        out_dir=f"{tmp}/state",
        checkpoint_dir=f"{tmp}/ckpt",
        n_buckets=8,
    )
    q.awaitTermination()
    rows = spark.read.parquet(f"{tmp}/state").count()
    out = {
        "changelog_rows": n_changes,
        "live_keys": live,
        "snapshot_rows": rows,
        "snapshot_bytes": _dir_bytes(f"{tmp}/state"),
        "sec": round(time.time() - t0, 2),
    }
    shutil.rmtree(tmp, ignore_errors=True)
    return out


def census_session(spark, sf_dir: str, n_slices: int = 4) -> dict:
    """APPEND-mode session windows over a time-sliced stream: the state
    store holds only OPEN sessions — per-batch numRowsTotal (from
    recentProgress stateOperators) proves gap/watermark eviction. The
    slices are written sequentially with forced ascending mtimes so no
    row ever arrives behind the watermark."""
    from hive_json_spark.sources import load_table
    from hive_json_spark.streaming.infer_stream import session_window_counts

    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    tmp = tempfile.mkdtemp(prefix="census_session_")
    src = f"{tmp}/src"
    bounds = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    lo, hi = bounds["lo"], bounds["hi"]
    span = hi - lo
    cuts = [lo + span * i / n_slices for i in range(1, n_slices)]
    import glob

    prev = None
    files: list = []
    for i, cut in enumerate(list(cuts) + [None]):
        part = ev
        if prev is not None:
            part = part.filter(F.col("ts") > F.lit(prev))
        if cut is not None:
            part = part.filter(F.col("ts") <= F.lit(cut))
        part.coalesce(1).write.mode("append").parquet(src)
        prev = cut
        # glob-difference, not mtime, decides write order: sequential
        # coalesce(1) writes can land in the same mtime granule, and an
        # mtime sort would then break ties arbitrarily — stamping a later
        # time-slice as older and dropping its predecessor's rows behind
        # the advanced watermark (the same hazard q_stream_session_final
        # pins against)
        files.extend(
            p for p in sorted(glob.glob(f"{src}/part-*")) if p not in set(files)
        )
    base = os.path.getmtime(files[-1])
    # ascending mtimes in write order
    for j, p in enumerate(files):
        os.utime(p, (base - 3600 * (len(files) - j), base - 3600 * (len(files) - j)))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out_df = session_window_counts(stream, gap="30 minutes", watermark="1 hour")
    t0 = time.time()
    q = (
        out_df.writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    per_batch = []
    emitted = 0
    for p in q.recentProgress:
        d = json.loads(p.json)
        ops = d.get("stateOperators") or []
        if ops:
            per_batch.append(
                {
                    "batch": d["batchId"],
                    "input_rows": d["numInputRows"],
                    "state_rows": ops[0].get("numRowsTotal"),
                    "state_bytes": ops[0].get("memoryUsedBytes"),
                }
            )
            emitted += sum(o.get("numRowsUpdated", 0) for o in ops)
    total_sessions = (
        spark.read.parquet(src)
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .count()
        .count()
    )
    out = {
        "events": n_events,
        "total_sessions": total_sessions,
        "max_state_rows": max((b["state_rows"] or 0) for b in per_batch),
        "max_state_bytes": max((b["state_bytes"] or 0) for b in per_batch),
        "per_batch": per_batch,
        "sec": round(time.time() - t0, 2),
    }
    shutil.rmtree(tmp, ignore_errors=True)
    return out


def main() -> int:
    from hive_json_spark.session import get_spark

    spark = get_spark("stream-state-census")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    results: dict = {"load_avg_start": list(os.getloadavg())}
    for label, sf_dir in SCALES.items():
        if not os.path.exists(sf_dir):
            print(f"skip {label}: {sf_dir} missing", file=sys.stderr)
            continue
        results[label] = {
            "topk": census_topk(spark, sf_dir),
            "cms": census_cms(spark, sf_dir),
            "merge": census_merge(spark, sf_dir),
            "session": census_session(spark, sf_dir),
        }
        print(f"{label}: done", file=sys.stderr)
    results["load_avg_end"] = list(os.getloadavg())
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "stream_state_census.json"
    )
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1, default=str)
    print(json.dumps({k: v for k, v in results.items() if k.startswith("sf")}, indent=1, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
