"""Per-query Spark JOB budget gate (r10 — the census follow-up).

``tools/job_census.py`` made per-query driver-blocking job counts a
review artifact; this test makes them a GATE, the way test_plan_quality
pins scan/exchange budgets: a build-round change that adds a stray
``count()``/``collect()``/checkpoint to a headline query now fails the
suite as a +1 against the budget instead of needing a re-census.

Scope: the 28 headline-bench queries (the driver's primary metric — a
fixed-cost regression there moves the graded number directly) plus the
census's top job-count tail entries (r11, the verdict ask: the fixed-
cost class is where iterative/multi-arm queries regress silently).
Budgets are the STEADY-STATE counts measured at the suite's own config
(sf0.01, 4 cores, 4 shuffle partitions; job geometry depends on AQE
plan shape, so budgets from another scale would not transfer). Each
query runs once un-counted first: first-touch side effects (bucketed-
warehouse build for q_bucketed_join, first-read footer jobs for
q_from_json_agg) legitimately add jobs that say nothing about the
query's own plan.

Budgets are exact current values, asserted as ``<=``: a regression
fails loudly; an improvement leaves slack and should ratchet the table
down in the same commit that earns it.
"""

from __future__ import annotations

import pytest

from hive_json_spark.registry import QUERIES
from tests.conftest import SF_DIR

# steady-state driver-blocking jobs per execution at sf0.01 / 4 cores /
# 4 shuffle partitions (second run of two, tools/job_census.py protocol,
# reproduced 2/2 on 2026-08-18 — ratcheted down in the r11 footer-schema
# commit: the per-read parquet schema-inference job is gone from every
# entry, q5's six reads included)
JOB_BUDGETS = {
    "q1_pricing_summary": 2,
    "q3_shipping_priority": 4,
    "q5_region_revenue": 7,
    "q_audio_pitch": 2,
    "q_bm25_topk": 6,
    "q_brand_part_stats": 3,
    "q_bucketed_join": 2,
    "q_cms_topk": 7,
    "q_dedup_clusters": 7,
    "q_dedup_exact": 2,
    "q_distinct_agg": 3,
    "q_doc_fingerprint": 2,
    "q_doc_novelty": 3,
    "q_from_json_agg": 2,
    "q_gif_decode": 2,
    "q_heavy_hitters": 6,
    "q_infer_props_schema": 1,
    "q_minhash_dedup_pairs": 6,
    "q_rollup_lineitem": 2,
    "q_running_events": 2,
    "q_sessionize_events": 2,
    "q_setsim_prefix_join": 14,
    "q_shred_props": 3,
    "q_similarity_bruteforce": 4,
    "q_text_profile": 2,
    # +1 r11: the pre-tokenize spread exchange (a measured 2.1x at sf1
    # for one extra AQE stage job; see OPTIMIZATION_r11.md)
    "q_token_entropy": 6,
    "q_top3_orders_per_customer": 2,
    "q_zorder_layout": 14,
    # non-headline top job-count entries (r11 extension — iterative or
    # multi-probe queries whose fixed cost dwarfs their compute; counts
    # are k-round loops, so a +1 here means a per-round action crept in).
    # q_dedup_method_eval's five thread-spawned arm jobs escape the job
    # group; its count covers the serial spine only (stable 2/2).
    "q_bfs_hops": 35,
    "q_mad_outliers": 23,
    "q_kmeans_lloyd": 23,
    "q_pagerank_events": 23,
    "q_fk_integrity": 10,
    "q_hll_intersect": 18,
    "q_dedup_method_eval": 6,
}


def _run(spark, name: str) -> None:
    QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()


@pytest.mark.parametrize("name", sorted(JOB_BUDGETS), ids=sorted(JOB_BUDGETS))
def test_headline_job_budget(spark, name):
    sc = spark.sparkContext
    _run(spark, name)  # warm-up: absorb first-touch side-effect jobs
    spark.catalog.clearCache()
    group = f"job-budget-{name}"
    sc.setJobGroup(group, name)
    try:
        _run(spark, name)
    finally:
        sc.setJobGroup(None, None)
    jobs = len(sc.statusTracker().getJobIdsForGroup(group))
    spark.catalog.clearCache()
    budget = JOB_BUDGETS[name]
    assert jobs <= budget, (
        f"{name} launched {jobs} driver-blocking jobs (budget {budget}): "
        "a stray action/checkpoint crept into the query path — run "
        "`python tools/job_census.py {name}` to localize it, or ratchet "
        "the budget with the adjudication in OPTIMIZATION_r10.md terms"
    )
