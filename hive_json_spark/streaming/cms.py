"""Streaming count-min sketch: maintain the ``depth x width`` cell table
of an unbounded key stream, updated every micro-batch — the continuous
counterpart of ``operators/sketch.py:count_min_sketch`` and the state
shape that makes heavy-key monitoring feasible when even the exact
streaming_topk counts table outgrows its key-cardinality bound.

State is the cell table (<= depth*width rows, KB-sized no matter the
stream volume). CMS cells are plain counts — MERGEABLE — so each batch's
partial sketch folds in with one cell-wise sum: the associativity that
makes the batch operator shuffle-light is exactly what makes the
streaming fold correct under any batch slicing.

Replay safety: foreachBatch is at-least-once and read-add-overwrite is
not naturally idempotent, so every overwrite carries the applied
``_batch_id`` atomically with the cells (the drift.py protocol); a
re-delivered batch whose id is already applied is a no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.utils import AnalysisException

from hive_json_spark.operators.sketch import count_min_sketch


def streaming_cms(
    stream: DataFrame,
    key_col: str,
    out_dir: str,
    checkpoint_dir: str,
    depth: int = 4,
    width: int = 512,
):
    """Start an availableNow stream folding per-batch CMS partials into
    the cell table at ``out_dir``. Returns the StreamingQuery; callers
    ``awaitTermination()``. The resulting table answers point queries via
    ``operators/sketch.py:cms_estimate`` with the same hash family."""

    def update(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        part = count_min_sketch(batch_df, key_col, depth=depth, width=width)
        try:
            existing = spark.read.parquet(out_dir)
        except AnalysisException:
            existing, last = None, None
        else:
            last = (
                existing.agg(F.max("_batch_id")).collect()[0][0]
                if "_batch_id" in existing.columns
                else None
            )
        if last is not None and batch_id <= last:
            return  # re-delivered batch: cells already include it
        if existing is not None:
            merged = (
                existing.select("j", "bucket", "n")
                .unionByName(part)
                .groupBy("j", "bucket")
                .agg(F.sum("n").alias("n"))
            )
        else:
            merged = part
        # collect BEFORE the overwrite so the lazy self-read never races
        # the rewrite; <= depth*width rows — driver-sized by construction
        schema = merged.schema
        rows = merged.collect()
        applied = max(batch_id, last) if last is not None else batch_id
        spark.createDataFrame(rows, schema).withColumn(
            "_batch_id", F.lit(applied).cast("bigint")
        ).coalesce(1).write.mode("overwrite").parquet(out_dir)

    return (
        stream.writeStream.foreachBatch(update)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
