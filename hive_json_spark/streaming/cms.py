"""Streaming count-min sketch: maintain the ``depth x width`` cell table
of an unbounded key stream, updated every micro-batch — the continuous
counterpart of ``operators/sketch.py:count_min_sketch`` and the state
shape that makes heavy-key monitoring feasible when even the exact
streaming_topk counts table outgrows its key-cardinality bound.

State is the cell table (<= depth*width rows, KB-sized no matter the
stream volume), kept as VERSIONED parquet (`streaming/state.py`). CMS
cells are plain counts — MERGEABLE — so each batch's partial sketch folds
in with one cell-wise sum: the associativity that makes the batch
operator shuffle-light is exactly what makes the streaming fold correct
under any batch slicing.

Replay safety: each applied batch commits the merged cells as
``v=<batch_id>``; a re-delivered batch whose id is <= the committed
version is a no-op. Write-new-then-prune keeps a committed copy on disk
at every instant and lets the merge plan read the previous version's
files directly — the r6 collect-then-rewrite (needed to dodge the
in-place overwrite race) is gone, along with its slow driver-built
LocalTableScan write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from hive_json_spark.operators.sketch import count_min_sketch
from hive_json_spark.streaming.state import commit_version, latest_version, read_state


def streaming_cms(
    stream: DataFrame,
    key_col: str,
    out_dir: str,
    checkpoint_dir: str,
    depth: int = 4,
    width: int = 512,
):
    """Start an availableNow stream folding per-batch CMS partials into
    the versioned cell table at ``out_dir``. Returns the StreamingQuery;
    callers ``awaitTermination()``. The resulting table answers point
    queries via ``operators/sketch.py:cms_estimate`` with the same hash
    family."""

    def update(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        last = latest_version(spark, out_dir)
        if last is not None and batch_id <= last:
            return  # re-delivered batch: cells already include it
        part = count_min_sketch(batch_df, key_col, depth=depth, width=width)
        existing = read_state(spark, out_dir)
        merged = (
            existing.select("j", "bucket", "n")
            .unionByName(part)
            .groupBy("j", "bucket")
            .agg(F.sum("n").alias("n"))
            if existing is not None
            else part
        )
        # <= depth*width rows by construction — one file is the right shape
        commit_version(merged.coalesce(1), out_dir, batch_id)

    return (
        stream.writeStream.foreachBatch(update)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
