"""Differential fuzzing for the z-order boundary-cell NTILE decomposition.

q_zorder_layout replaces a global ``NTILE OVER (ORDER BY z)`` with per-cell
prefix math plus a per-row tiebreak restricted to boundary-straddling cells.
The bug surface is exactly the decomposition's edge cases: a single giant
cell spanning several buckets, fewer rows than buckets (base = 0), totals
divisible / not divisible by the group count, and collapsed key ranges
(max == min). Random small tables hit those shapes; DuckDB runs the
literal one-line NTILE oracle over the same parquet.
"""

import random

import duckdb
import pytest

import __spark_entry__ as entry_mod

ORACLE = entry_mod.oracle_sql()["q_zorder_layout"]
QUERY = entry_mod.queries()["q_zorder_layout"]


def gen_rows(seed: int):
    rnd = random.Random(seed)
    n = rnd.choice([1, 3, rnd.randint(4, 40), rnd.randint(50, 400)])
    # small key ranges force heavy duplicates → giant z-cells that straddle
    # multiple NTILE boundaries; occasionally collapse a range entirely
    pk_hi = rnd.choice([1, 2, 5, 50, 10**6])
    sk_hi = rnd.choice([1, 2, 5, 50, 10**4])
    rows = [
        (
            i + 1,  # l_orderkey
            rnd.randint(1, 7),  # l_linenumber
            rnd.randint(1, pk_hi),  # l_partkey
            rnd.randint(1, sk_hi),  # l_suppkey
        )
        for i in range(n)
    ]
    return rows


@pytest.mark.parametrize("seed", range(12))
def test_zorder_matches_duckdb_on_random_tables(spark, tmp_path, seed):
    rows = gen_rows(seed)
    df = spark.createDataFrame(
        rows, "l_orderkey bigint, l_linenumber int, l_partkey bigint, l_suppkey bigint"
    )
    sf_dir = str(tmp_path / f"zfuzz{seed}")
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/lineitem.parquet")

    sdf = QUERY(spark, sf_dir)
    cols = sorted(sdf.columns)
    srows = sorted(tuple(str(r[c]) for c in cols) for r in sdf.collect())

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf_dir}/lineitem.parquet/*.parquet')"
    )
    res = con.execute(ORACLE)
    names = [d[0] for d in res.description]
    idx = [names.index(c) for c in cols]
    drows = sorted(tuple(str(row[i]) for i in idx) for row in res.fetchall())

    assert srows == drows, f"seed={seed} rows={len(rows)}"
