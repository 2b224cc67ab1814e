"""Streaming top-k: maintain the k most frequent keys of an unbounded
stream, updated every micro-batch — the continuous counterpart of the
batch heavy-hitter surface (`operators/sketch.py`, `q_heavy_hitters`).

State is the cumulative per-key count table kept as VERSIONED parquet
(`streaming/state.py`): the KEY-cardinality is the state bound, not the
stream volume; the top-k view is re-derived from it each batch (a k-row
TakeOrderedAndProject over the counts table, never over the stream).

Replay safety: foreachBatch is at-least-once, so each applied batch
commits the merged counts as `counts/v=<batch_id>`; a re-delivered batch
whose id is <= the committed version only re-derives the view. The
write-new-then-prune protocol keeps a committed copy on stable storage at
every instant (the r6 localCheckpoint variant could lose the only state
copy if an executor died while the in-place overwrite was deleting the
old files), and the merge plan reads the previous version's live files —
no driver collect at any cardinality.

100 TB note: for vocabularies too large to keep exact (per-shingle
counts), compose with the batch two-phase candidate pass — keep exact
counts only for keys that were ever locally heavy in some batch, which is
the classic lossy-counting trade documented at the call site; for
key spaces like users/domains/event-types the exact table is small and
this operator is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from hive_json_spark.streaming.state import commit_version, latest_version, read_state


def streaming_topk(
    stream: DataFrame,
    key_col: str,
    out_dir: str,
    checkpoint_dir: str,
    k: int = 10,
):
    """Start an availableNow stream maintaining ``<out_dir>/counts`` (full
    per-key counts, versioned, replay-idempotent) and ``<out_dir>/topk``
    (the k most frequent keys, count-desc then key-asc for a total
    deterministic order). Returns the StreamingQuery."""
    counts_dir = f"{out_dir}/counts"
    topk_dir = f"{out_dir}/topk"

    def _write_view(spark) -> None:
        top = (
            read_state(spark, counts_dir)
            .select("key", "n")
            .orderBy(F.col("n").desc(), F.col("key").asc())
            .limit(k)
        )
        top.coalesce(1).write.mode("overwrite").parquet(topk_dir)

    def update(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        last = latest_version(spark, counts_dir)
        if last is not None and batch_id <= last:
            # replayed batch: state already includes it — refresh the view
            _write_view(spark)
            return
        part = batch_df.groupBy(F.col(key_col).alias("key")).agg(
            F.count("*").alias("n")
        )
        existing = read_state(spark, counts_dir)  # None, version, or flat
        merged = (
            existing.select("key", "n")
            .unionByName(part)
            .groupBy("key")
            .agg(F.sum("n").alias("n"))
            if existing is not None
            else part
        )
        commit_version(merged, counts_dir, batch_id)
        _write_view(spark)

    return (
        stream.writeStream.foreachBatch(update)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
