"""Continuous rollup: a time-bucketed aggregate table maintained
incrementally from a stream (the "hypertable continuous aggregate"
pattern, rebuilt on Structured Streaming + dynamic partition overwrite).

Each micro-batch:
1. aggregates only its own rows into (day, keys) partials;
2. reads back only the day partitions it touches (partition pruning —
   the rollup table may hold years, the batch touches a day or two);
3. re-aggregates existing + partial and overwrites just those partitions
   (``partitionOverwriteMode=dynamic``).

State never lives in the streaming engine — the rollup table IS the
state, so restarts are safe wherever the checkpoint restarts the source:
re-aggregating a replayed batch is idempotent per partition because the
merge reads current truth before writing.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.utils import AnalysisException


def continuous_rollup(
    stream: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    value_col: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 day",
):
    """Start an availableNow stream maintaining the rollup at ``out_dir``.

    Returns the StreamingQuery; callers ``awaitTermination()`` it. Swap the
    trigger for continuous operation.
    """

    def upsert(batch_df: DataFrame, _batch_id: int) -> None:
        spark = batch_df.sparkSession
        part = (
            batch_df.groupBy(F.window(ts_col, window).alias("w"), *key_cols)
            .agg(F.count("*").alias("n"), F.sum(value_col).alias("total"))
            .select(
                F.col("w.start").cast("date").alias("day"),
                *key_cols,
                "n",
                "total",
            )
        )
        days = [r["day"] for r in part.select("day").distinct().collect()]
        if not days:
            return
        try:
            existing = spark.read.parquet(out_dir).filter(F.col("day").isin(days))
            merged = (
                existing.select(part.columns)
                .unionByName(part)
                .groupBy("day", *key_cols)
                .agg(F.sum("n").alias("n"), F.sum("total").alias("total"))
            )
        except AnalysisException:  # first batch: table does not exist yet
            merged = part
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        try:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            merged.write.mode("overwrite").partitionBy("day").parquet(out_dir)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
