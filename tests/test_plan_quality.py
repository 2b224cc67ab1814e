"""Plan-quality regression tests: pin the physical-plan properties that
make these queries scale (SCALE.md). A refactor that silently drops a
pushdown, un-broadcasts a dimension, or turns top-k into a global sort
fails here — before it fails at 100 TB.
"""

import pytest

from hive_json_spark.registry import QUERIES
from tests.conftest import SF_DIR


def plan_of(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_pushes_filter_and_prunes_columns(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # 11-column table, 7-column read: projection reached the scan
    read = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_orderkey" not in read and "l_partkey" not in read


def test_q5_broadcasts_all_dimensions(spark):
    plan = plan_of(spark, "q5_region_revenue")
    # region/nation/customer/supplier joins all broadcast; only
    # orders⋈lineitem and the final agg may shuffle
    assert plan.count("BroadcastHashJoin") >= 4
    assert plan.count("Exchange hashpartitioning") <= 3


def test_topk_is_take_ordered_not_global_sort(spark):
    plan = plan_of(spark, "q_topk_orders")
    assert "TakeOrderedAndProject" in plan
    assert "Sort [" not in plan  # no full sort node


def test_running_window_single_exchange(spark):
    # three window functions over the same spec: exactly one shuffle
    plan = plan_of(spark, "q_running_events")
    assert plan.count("Exchange hashpartitioning") == 1


def test_q18_semi_join_broadcasts_qualifying_keys(spark):
    plan = plan_of(spark, "q18_big_orders")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_scalar_pack_stays_in_codegen(spark):
    # a pure projection: no exchange, whole-stage codegen covers the plan
    plan = plan_of(spark, "q_scalar_pack")
    assert "Exchange" not in plan
    # "*(n)" marks operators fused into a WholeStageCodegen stage
    assert plan.lstrip().startswith("*(1)")


def test_q21_window_stats_add_no_exchange(spark):
    # per-order supplier counts come from window collect_set over the
    # join's existing orderkey partitioning: no agg + join-back, so the
    # whole query needs at most the two join-input exchanges
    plan = plan_of(spark, "q21_suppliers_kept_waiting")
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "TakeOrderedAndProject" in plan


def test_decontaminate_split_filters_push_below_kernel(spark):
    # the train/test split predicates must reach the parquet scan, NOT
    # sit above the Arrow gram kernel (each side explodes only its split)
    plan = plan_of(spark, "q_decontaminate")
    assert plan.count("ArrowEvalPython") == 2
    assert plan.count("(doc_id") >= 2 and "% 10)" in plan  # DataFilters at the scans
    assert "BroadcastHashJoin" in plan  # benchmark grams broadcast


def test_tfidf_postings_cached_once(spark):
    # tf/dl/df all read the pinned postings frame instead of re-exploding
    # the corpus (InMemoryTableScan per consumer, single cached explode)
    plan = plan_of(spark, "q_tfidf_topk")
    assert plan.count("InMemoryTableScan") >= 3
    assert "TakeOrderedAndProject" in plan


def test_window_suite_shares_one_exchange(spark):
    # eight window functions over two frames + a second order key, all on
    # the same o_custkey partitioning: exactly one shuffle
    plan = plan_of(spark, "q_window_suite")
    assert plan.count("Exchange hashpartitioning") == 1


def test_bloom_probes_are_broadcast_joins(spark):
    # the three Bloom probe joins + nothing else touching the left side:
    # every probe is a broadcast hash join (left scan never shuffles until
    # after pruning), and the bloom build is a single-digit exchange count.
    # clearCache first: a bloom persisted by an earlier test inflates the
    # printed plan with the cached build's subtree under every probe
    spark.catalog.clearCache()
    plan = plan_of(spark, "q_bloom_semi_join")
    assert plan.count("BroadcastHashJoin") >= 3
    assert plan.count("Exchange hashpartitioning") <= 7


def test_scalar_pack2_stays_in_codegen(spark):
    plan = plan_of(spark, "q_scalar_pack2")
    assert "Exchange" not in plan
    assert plan.lstrip().startswith("*(1)")
