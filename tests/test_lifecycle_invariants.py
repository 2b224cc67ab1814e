"""Semantic invariants for the lifecycle/quality operators — properties
that must hold for ANY input, checked on the real sf0.001 tables. These
complement the DuckDB oracle (which pins exact values) by pinning the
*laws* of each operator, so a future rewrite that happens to match the
oracle on one dataset but breaks the algebra still fails here.
"""

import pytest
from pyspark.sql import functions as F

from hive_json_spark.registry import QUERIES
from tests.conftest import SF_DIR


def _rows(spark, name):
    return {r["action"]: r for r in QUERIES[name](spark, SF_DIR).collect()}


def test_merge_upsert_action_accounting(spark):
    # every base row is kept, updated, or deleted; every insert is a new
    # key; the merged snapshot size is base - deleted + inserted
    from hive_json_spark.sources import load_table

    orders = load_table(spark, SF_DIR, "orders")
    n_base = orders.filter(F.col("o_orderkey") % 4 != 0).count()
    acts = _rows(spark, "q_merge_upsert")
    routed_base = sum(
        acts[a]["n_rows"] for a in ("kept", "updated", "deleted") if a in acts
    )
    assert routed_base == n_base
    # changelog rows routed somewhere: updates+deletes hit base rows,
    # inserts are disjoint from base by construction (key % 4 == 0)
    if "inserted" in acts:
        ins_keys = orders.filter(
            (F.col("o_orderkey") % 2 == 0) & (F.col("o_orderkey") % 4 == 0)
        ).count()
        assert acts["inserted"]["n_rows"] == ins_keys


def test_interpolation_preserves_observed_and_bounds_gaps(spark):
    out = QUERIES["q_interpolate_gaps"](spark, SF_DIR)
    # no row may be null after repair (every gap has at least one neighbor
    # on the synthetic daily series)
    assert out.filter(F.col("value").isNull()).count() == 0
    # interpolated points lie within [min, max] of the series' observed
    # values per event_type — linear interpolation cannot extrapolate
    obs = out.filter(~F.col("interpolated")).groupBy("event_type").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    bad = (
        out.filter(F.col("interpolated"))
        .join(obs, "event_type")
        .filter((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")))
    )
    assert bad.count() == 0


def test_attribution_conserves_conversions(spark):
    from hive_json_spark.sources import load_table

    ev = load_table(spark, SF_DIR, "events")
    n_purchases = ev.filter(F.col("event_type") == "purchase").count()
    out = QUERIES["q_attribution"](spark, SF_DIR)
    assert out.agg(F.sum("n_conversions")).first()[0] == n_purchases
    # no attribution channel may be 'purchase' itself
    assert (
        out.filter(
            (F.col("first_touch") == "purchase") | (F.col("last_touch") == "purchase")
        ).count()
        == 0
    )


def test_survivorship_is_a_complete_partition(spark):
    from hive_json_spark.sources import load_table

    docs = load_table(spark, SF_DIR, "documents")
    out = QUERIES["q_survivorship"](spark, SF_DIR).collect()
    # cluster membership sums to the corpus: every doc is in exactly one
    # cluster and every cluster elects exactly one survivor
    assert sum(r["n_members"] for r in out) == docs.count()
    survivors = [r["survivor_id"] for r in out]
    assert len(survivors) == len(set(survivors))
    # the survivor is a member: its char count can't exceed the corpus max
    mx = docs.agg(F.max("n_chars")).first()[0]
    assert all(r["survivor_chars"] <= mx for r in out)


def test_ab_test_buckets_are_exhaustive(spark):
    from hive_json_spark.sources import load_table

    ev = load_table(spark, SF_DIR, "events")
    n_users = ev.select("user_id").distinct().count()
    row = QUERIES["q_ab_test"](spark, SF_DIR).first()
    assert row["n_a"] + row["n_b"] == n_users


def test_scoped_persist_release_keeps_late_frames_correct(spark, sf_dir):
    """The functions/caching.py lifecycle releases a query's scoped
    persists when a DIFFERENT graded query starts. A caller that holds
    the earlier frame and materializes it late must still get the right
    answer — release only unpersists (lineage intact, recompute), never
    invalidates."""
    from hive_json_spark.registry import QUERIES

    held = QUERIES["q_audience_overlap"](spark, sf_dir)
    first = sorted(tuple(r) for r in held.collect())
    assert len(first) > 0
    # a different graded entry triggers release of the held frame's cache
    QUERIES["q_dedup_exact"](spark, sf_dir).count()
    again = sorted(tuple(r) for r in held.collect())
    assert again == first
