"""Differential fuzzing for the two-phase distributive skyline: random
small point sets (heavy ties in both dimensions, duplicate points,
single-point and all-equal corners) must match a brute-force O(n²)
domination check — the formulation the oracle can't afford at scale.
"""

import random

import pytest

import __spark_entry__ as entry_mod

QUERY = entry_mod.queries()["q_pareto_skyline"]


def brute_force(points):
    out = {}
    for p in points:
        dominated = any(
            (q[0] >= p[0] and q[1] >= p[1]) and (q[0] > p[0] or q[1] > p[1])
            for q in points
        )
        if not dominated:
            out[p] = out.get(p, 0) + 1
    return {(x, y, n) for (x, y), n in out.items()}


@pytest.mark.parametrize("seed", range(10))
def test_skyline_matches_bruteforce(spark, tmp_path, seed):
    rnd = random.Random(seed)
    n = rnd.choice([1, 2, rnd.randint(3, 30), rnd.randint(40, 300)])
    # small domains force ties and duplicates across hash buckets
    xs = rnd.choice([2, 5, 1000])
    ys = rnd.choice([1, 3, 50])
    points = [
        (float(rnd.randint(1, xs)), float(rnd.randint(1, ys))) for _ in range(n)
    ]
    sf_dir = str(tmp_path / f"sky{seed}")
    spark.createDataFrame(
        [(x, y) for x, y in points], "l_extendedprice double, l_quantity double"
    ).coalesce(1).write.parquet(f"{sf_dir}/lineitem.parquet")

    got = {
        (r["price"], r["qty"], r["n"]) for r in QUERY(spark, sf_dir).collect()
    }
    assert got == brute_force(points), f"seed={seed} n={n}"
