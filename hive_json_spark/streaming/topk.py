"""Streaming top-k: maintain the k most frequent keys of an unbounded
stream, updated every micro-batch — the continuous counterpart of the
batch heavy-hitter surface (`operators/sketch.py`, `q_heavy_hitters`).

State is the cumulative per-key count table kept as parquet — the
KEY-cardinality is the state bound, not the stream volume; the top-k view
is re-derived from it each batch (a k-row TakeOrderedAndProject over the
counts table, never over the stream).

Replay safety: same protocol as `streaming/drift.py` — foreachBatch is
at-least-once and read-add-overwrite is not naturally idempotent, so each
counts overwrite carries the applied ``_batch_id`` atomically; a
re-delivered batch skips the add and only re-derives the view.

100 TB note: for vocabularies too large to keep exact (per-shingle
counts), compose with the batch two-phase candidate pass — keep exact
counts only for keys that were ever locally heavy in some batch, which is
the classic lossy-counting trade documented at the call site; for
key spaces like users/domains/event-types the exact table is small and
this operator is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.utils import AnalysisException


def streaming_topk(
    stream: DataFrame,
    key_col: str,
    out_dir: str,
    checkpoint_dir: str,
    k: int = 10,
):
    """Start an availableNow stream maintaining ``<out_dir>/counts`` (full
    per-key counts, replay-idempotent) and ``<out_dir>/topk`` (the k most
    frequent keys, count-desc then key-asc for a total deterministic
    order). Returns the StreamingQuery."""
    counts_dir = f"{out_dir}/counts"
    topk_dir = f"{out_dir}/topk"

    def _write_view(spark) -> None:
        top = (
            spark.read.parquet(counts_dir)
            .select("key", "n")
            .orderBy(F.col("n").desc(), F.col("key").asc())
            .limit(k)
        )
        top.coalesce(1).write.mode("overwrite").parquet(topk_dir)

    def update(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        part = batch_df.groupBy(F.col(key_col).alias("key")).agg(
            F.count("*").alias("n")
        )
        try:
            existing = spark.read.parquet(counts_dir)
        except AnalysisException:
            existing, last = None, None
        else:
            # pre-protocol state (no _batch_id column) keeps its counts
            last = (
                existing.agg(F.max("_batch_id")).collect()[0][0]
                if "_batch_id" in existing.columns
                else None
            )
        if last is not None and batch_id <= last:
            # replayed batch: state already includes it — refresh the view
            # only, never delete-and-rewrite identical counts (a crash
            # between delete and write would destroy the only state copy)
            _write_view(spark)
            return
        if existing is not None:
            merged = (
                existing.select("key", "n")
                .unionByName(part)
                .groupBy("key")
                .agg(F.sum("n").alias("n"))
            )
        else:
            merged = part
        # localCheckpoint (eager) materializes the merged counts on the
        # executors and truncates lineage off the parquet files that the
        # overwrite below is about to delete — the read→overwrite-same-path
        # cycle breaks WITHOUT routing the state through the driver (a
        # collect here would be unbounded for a high-cardinality key).
        merged = merged.localCheckpoint()
        merged.withColumn(
            "_batch_id", F.lit(batch_id).cast("bigint")
        ).write.mode("overwrite").parquet(counts_dir)
        _write_view(spark)

    return (
        stream.writeStream.foreachBatch(update)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
