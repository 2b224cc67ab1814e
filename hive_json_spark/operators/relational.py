"""Relational operator layer: the query surface the reference lacks
(SURVEY §2 "explicitly absent" table), declared Spark-first.

Everything composes DataFrames and leans on Catalyst — predicate pushdown,
column pruning, join selection, and AQE come for free because these helpers
never leave the declarative plan. The helpers encode the *scale* decisions:

- dimension joins broadcast explicitly (no shuffle of the fact table's key);
- top-k uses sort+limit (Spark's TakeOrderedAndProject — O(k) per
  partition, no full sort);
- per-group top-k uses a window rank with a deterministic tiebreak column
  so results are stable under any partitioning;
- semi/anti joins use the dedicated join types (no distinct-aggregate
  detour, and they enable broadcast + null-aware optimizations).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def broadcast_join(
    fact: DataFrame, dim: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """Join a big fact table to a small dimension, broadcasting the dim.

    At 100 TB the fact side must never shuffle for a dimension join;
    ``F.broadcast`` pins the strategy instead of trusting the size
    estimator (which sees only file sizes, not post-filter sizes).
    """
    return fact.join(F.broadcast(dim), on, how)


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Global top-k: orderBy+limit compiles to TakeOrderedAndProject —
    each partition keeps k rows, the driver merges; no global sort."""
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Per-group top-k via row_number. ``order_by`` must be a total order
    (include a unique tiebreak key) for deterministic distributed results."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    return left.join(right, on, "left_anti")


def exact_dedup(df: DataFrame, keys: Sequence[str], keep_min_of: str) -> DataFrame:
    """Exact deduplication keeping the minimum ``keep_min_of`` per key group.

    Aggregation (not window) form: map-side partial min → one shuffle on the
    content key, which AQE can coalesce/skew-split. Returns the surviving
    ``keep_min_of`` values with their keys.
    """
    return df.groupBy(*keys).agg(F.min(keep_min_of).alias(keep_min_of))


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
    order_tiebreak: str,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap from the
    previous event exceeds ``gap_seconds``. One shuffle on the user key;
    state is a running sum inside the window — no Python, no iteration.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    gap = F.col(ts_col).cast("double") - F.lag(F.col(ts_col).cast("double")).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn("session_seq", F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ))


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigating equi-join for the extreme hot-key case.

    The skewed side gets a uniform random salt in [0, n_salts); the other
    side is replicated n_salts× (one row per salt value), and the join key
    becomes (key..., salt) — so one celebrity key spreads across n_salts
    tasks instead of melting one executor. AQE's skew-join split handles
    moderate skew on its own; reach for this when a single key dominates
    (null-heavy foreign keys, power-law graphs) or when AQE is off.

    Cost model: replicates the *other* side n_salts× — use with a small or
    pre-filtered right side, or combine with broadcast when it fits.
    """
    salted_left = skewed.withColumn("_salt", (F.rand(42) * n_salts).cast("int"))
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    salted_right = other.withColumn("_salt", salts)
    out = salted_left.join(salted_right, [*on, "_salt"], how)
    return out.drop("_salt")
