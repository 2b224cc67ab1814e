"""Local replica of the driver's t2 gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB over the same parquet, compare
row count, column names, and order-insensitive values.

Kept strict (exact string compare after normalization, float tolerance
1e-6 relative) so driver-side hash mismatches surface here first.
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    return con


def normalize(rows, colnames):
    """Rows → sorted list of tuples with floats rounded for comparison."""
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(f"{v:.6g}")
            elif v.__class__.__name__ == "Decimal":
                vals.append(f"{float(v):.6g}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_cols = sorted(sdf.columns)
    spark_rows = [[row[c] for c in spark_cols] for row in sdf.collect()]

    res = duck.execute(ORACLES[name])
    duck_names = [d[0] for d in res.description]
    assert sorted(duck_names) == spark_cols, (
        f"column mismatch: spark={spark_cols} duck={sorted(duck_names)}"
    )
    duck_rows_raw = res.fetchall()
    idx = [duck_names.index(c) for c in spark_cols]
    duck_rows = [[row[i] for i in idx] for row in duck_rows_raw]

    assert len(spark_rows) == len(duck_rows), (
        f"row count: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    assert normalize(spark_rows, spark_cols) == normalize(duck_rows, spark_cols)


def test_queries_without_oracle_run(spark):
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
