"""Streaming distribution-drift monitor: maintain the population
stability index of a categorical stream against a fixed reference
distribution, updated every micro-batch — the continuous version of
`q_distribution_drift` (queries_quality.py).

State is the cumulative per-category count table (|categories| rows —
KB-sized no matter how large the stream), kept as VERSIONED parquet
(`streaming/state.py`). Each batch commits the |categories|-row counts as
a new version and rewrites the derived psi table — O(k) IO per batch
regardless of stream volume.

Replay safety: foreachBatch is at-least-once — after a crash between the
counts commit and the offset commit, the engine re-delivers the same
batch. The version directory name carries the applied batch id, so a
re-delivered batch whose id is already committed skips the add and only
recomputes the derived psi table. Write-new-then-prune keeps a committed
counts copy on stable storage at every instant (the old in-place
overwrite had a delete-then-write crash window), and the merge reads the
previous version's live files — no driver collect, any category type.

Identity caveat: batch ids restart at 0 per checkpoint lineage, so an
``out_dir`` is bound to ONE logical stream — restarting the same stream
with a lost/fresh checkpoint is handled (the early batches are replays of
applied data), but pointing a genuinely NEW stream at an existing
``out_dir`` would misread its first batches as replays. New logical
streams get new out_dirs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from hive_json_spark.streaming.state import commit_version, latest_version, read_state


def streaming_psi(
    stream: DataFrame,
    category_col: str,
    ref: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
):
    """Start an availableNow stream maintaining ``<out_dir>/counts`` and
    ``<out_dir>/psi`` from a categorical stream vs the reference frame's
    distribution of the same column. Returns the StreamingQuery.

    The psi table holds one row per category seen in EITHER side:
    (category, p_ref, p_cur, psi_term) with the standard
    (p_cur - p_ref) * ln(p_cur / p_ref) terms; categories absent from one
    side get a null psi_term (PSI is undefined at zero support — callers
    alert on nulls separately, the usual practice).
    """
    counts_dir = f"{out_dir}/counts"
    psi_dir = f"{out_dir}/psi"
    ref_counts = (
        ref.groupBy(F.col(category_col).alias("category"))
        .agg(F.count("*").alias("n_ref"))
    )

    def _write_psi(spark) -> None:
        cur = read_state(spark, counts_dir).select("category", "n")
        joined = ref_counts.join(cur, "category", "full_outer")
        p_ref = F.col("n_ref") / F.sum("n_ref").over(Window.partitionBy())
        p_cur = F.col("n") / F.sum("n").over(Window.partitionBy())
        psi = joined.select(
            "category",
            F.round(p_ref, 6).alias("p_ref"),
            F.round(p_cur, 6).alias("p_cur"),
            F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias("psi_term"),
        )
        psi.coalesce(1).write.mode("overwrite").parquet(psi_dir)

    def update(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        last = latest_version(spark, counts_dir)
        if last is not None and batch_id <= last:
            # re-delivered batch: counts already include it — re-derive the
            # psi view only
            _write_psi(spark)
            return
        part = (
            batch_df.groupBy(F.col(category_col).alias("category"))
            .agg(F.count("*").alias("n"))
        )
        existing = read_state(spark, counts_dir)  # None, version, or flat
        merged = (
            existing.select("category", "n")
            .unionByName(part)
            .groupBy("category")
            .agg(F.sum("n").alias("n"))
            if existing is not None
            else part
        )
        # |categories| rows — one file is the right shape
        commit_version(merged.coalesce(1), counts_dir, batch_id)
        _write_psi(spark)

    return (
        stream.writeStream.foreachBatch(update)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
