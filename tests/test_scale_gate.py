"""Opt-in scale-regression gate (r8, verdict ask #7).

The r5-r7 censuses each caught a Trap-class scale regression by MANUAL
measurement (single-row-group one-core kernels, re-evaluated scan-side
expressions, non-evictable checkpoint accumulation). This gate automates
the detector: the top-cost registry queries must keep their
sf0.01 -> sf0.1 (10x data) wall-clock ratio at or below
``max(12, output-row ratio)`` — a trapped kernel (work serialized onto
one core, a re-run corpus scan, a quadratic that lost its dispatch)
blows past that envelope immediately, while healthy distributed plans
sit well under it (fixed overhead dominates at sf0.01, so measured
healthy ratios are ~1-6).

Opt-in: `python -m pytest -m scale tests/test_scale_gate.py` — timing
asserts don't belong in the default correctness suite (they need a
quiet, solo box; see SCALE.md "CI-style invocation").
"""

from __future__ import annotations

import os
import time

import pytest

pytestmark = pytest.mark.scale

# the standing top-cost non-streaming queries (bench_detail.json ranking;
# refresh the list when the ranking materially changes)
TOP_COST = [
    "q_setsim_prefix_join",
    "q_mad_outliers",
    "q_dedup_method_eval",
    "q_ann_recall",
    "q_fuzzy_name_match",
]

RATIO_FLOOR = 12.0
SMALL = "/root/testdata/sf0.01"
BIG = "/root/testdata/sf0.1"


def _best_of(fn, runs: int = 2) -> tuple[float, int]:
    best, rows = None, 0
    for _ in range(runs):
        t0 = time.perf_counter()
        rows = fn().count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, rows


@pytest.mark.parametrize("name", TOP_COST)
def test_cost_ratio_within_envelope(spark, name):
    from hive_json_spark.registry import QUERIES

    spark.catalog.clearCache()
    t_small, rows_small = _best_of(lambda: QUERIES[name](spark, SMALL))
    spark.catalog.clearCache()
    t_big, rows_big = _best_of(lambda: QUERIES[name](spark, BIG))
    # floor the denominator: sub-200ms sf0.01 runs are pure fixed overhead
    # and make the ratio meaninglessly twitchy
    ratio = t_big / max(t_small, 0.2)
    out_ratio = rows_big / max(rows_small, 1)
    envelope = max(RATIO_FLOOR, out_ratio)
    assert ratio <= envelope, (
        f"{name}: sf0.01->sf0.1 wall ratio {ratio:.1f} exceeds "
        f"max({RATIO_FLOOR}, output ratio {out_ratio:.1f}) — "
        f"{t_small:.2f}s -> {t_big:.2f}s for {rows_small} -> {rows_big} rows; "
        "Trap-class scale regression (see SCALE.md round-7 traps)"
    )


# --- zipf-vocabulary leg (r9, verdict ask #6) --------------------------------
# The two census traps that actually fired (the FastSS variant-join blowup,
# the setsim tokenize re-evaluation) only showed on ZIPFIAN vocabulary —
# the uniform corpus' 31-token vocab saturates similarity and hides them.
# Same envelope, 10x leg zipf-sf0.1 -> zipf-sf1 (tools/gen_scaledata.py
# --vocab zipf; regenerate the dirs if absent — they are gitignored).

ZIPF_SMALL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "_scaledata",
    "zipf-sf0.1",
)
ZIPF_BIG = ZIPF_SMALL.replace("zipf-sf0.1", "zipf-sf1")

# r10 (verdict ask #6): the dense-output family joins the zipf leg —
# q_dedup_clusters (13.3x uniform sf1 ratio) and q_ngram_jaccard_pairs
# (21.8x, output-driven) were the remaining >10x sweep entries with no
# zipf envelope; the max(12, output-ratio) envelope absorbs their
# legitimately output-bound growth while still catching a lost dispatch.
ZIPF_QUERIES = [
    "q_setsim_prefix_join",
    "q_fuzzy_name_match",
    "q_dedup_clusters",
    "q_ngram_jaccard_pairs",
]

# Per-entry envelope floors where the default is provably too thin.
# q_fuzzy_name_match: the legs straddle the naive/FastSS arm flip (15 k
# vs 150 k rows around the 50 k dispatch), so the ratio is really the
# ARM-cost ratio and every strict improvement to the small (naive) leg
# raises it. History of the same cause: r10 footer row-count probe
# (~10.0 -> 11.2, floor 12 -> 18); r11 spread-the-probe-side fix — the
# naive arm's broadcast-join + 1.8M levenshteins ran in ONE task on the
# single-row-group scan, now parallel (solo sf0.1 min-of-5
# 2.17 -> 0.37 s; suite-config legs measured 2.04 -> 1.06 s small,
# ~20.4 s big, ratio 19.3). 24 keeps ~25% headroom over the measured
# legitimate ratio while still failing the trap class this gate exists
# for (the r5 variant-join blowup measured ~95x; a 2x regression of the
# big leg alone reads ~39 and trips 24).
ZIPF_FLOORS = {"q_fuzzy_name_match": 24.0}


@pytest.mark.parametrize("name", ZIPF_QUERIES)
def test_zipf_cost_ratio_within_envelope(spark, name):
    from hive_json_spark.registry import QUERIES

    if not (os.path.exists(ZIPF_SMALL) and os.path.exists(ZIPF_BIG)):
        pytest.skip(
            "zipf corpora absent; generate with "
            "`python tools/gen_scaledata.py --sf 0.1 --vocab zipf "
            "--tables documents,customer` (and --sf 1)"
        )
    # size shuffle partitions to the leg, not to the suite's sf0.01
    # default (4): zipf-sf1's fuzzy variant join sorts ~24M rows, and 4
    # partitions force ~95MB per-task sorts that spill — a harness
    # sizing artifact that read as a +25% ratio (13.0 -> 10.5 at 32).
    # A real session at this volume carries a real partition count.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        spark.catalog.clearCache()
        t_small, rows_small = _best_of(lambda: QUERIES[name](spark, ZIPF_SMALL))
        spark.catalog.clearCache()
        t_big, rows_big = _best_of(lambda: QUERIES[name](spark, ZIPF_BIG))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    ratio = t_big / max(t_small, 0.2)
    out_ratio = rows_big / max(rows_small, 1)
    floor = ZIPF_FLOORS.get(name, RATIO_FLOOR)
    envelope = max(floor, out_ratio)
    assert ratio <= envelope, (
        f"{name}: zipf-sf0.1->zipf-sf1 wall ratio {ratio:.1f} exceeds "
        f"max({floor}, output ratio {out_ratio:.1f}) — "
        f"{t_small:.2f}s -> {t_big:.2f}s for {rows_small} -> {rows_big} rows; "
        "Zipf-vocabulary Trap-class scale regression (SCALE.md r8 census)"
    )
