"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition if the input has fewer partitions than the cluster has
    cores. Small single-row-group files (or a single .gz) arrive as one
    partition and would serialize compute-heavy per-row operators onto one
    core; at real scale inputs are already well-partitioned and this is a
    no-op. The round-robin shuffle moves only the projected columns."""
    if df.isStreaming:
        # partition counts are per-micro-batch on a stream (and .rdd is
        # illegal there); the source's own partitioning governs
        return df
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(target // 2, 2):
        return df.repartition(target)
    return df
