"""Local replica of the driver's t2 gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB over the same parquet, compare
row count, column names, and order-insensitive values.

Kept strict (exact string compare after normalization; floats at 17
significant digits, i.e. bit-exact for doubles) so driver-side hash
mismatches surface here first. Round 1 lesson: a 6-sig-digit compare
let a cent flip on a 7-digit money value (q11) pass locally and fail
the driver — every rounded aggregate must be summation-order-free
(integer-unit sums), and this gate now proves it at full precision.
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
                elif v == 0.0:
                    vals.append("0")  # canonicalize -0.0 vs 0.0
                else:
                    vals.append(f"{v:.17g}")
            elif v.__class__.__name__ == "Decimal":
                f = float(v)
                vals.append("0" if f == 0.0 else f"{f:.17g}")
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


# --- partition-count perturbation (cross-run determinism) --------------------
#
# The q11 lesson: a rounded double aggregate can pass an oracle compare under
# one partitioning and flip a digit under another (the driver runs a different
# local[N] / shuffle layout than this suite). Every query result must be a
# pure function of the data — so rerun a sample of rounded-aggregate queries
# under several shuffle-partition settings and require bit-identical
# normalized output. This directly exercises the integer-unit rule in
# functions/exact.py: long sums are commutative, double sums are not.

PERTURB_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q9_product_type_profit",
    "q11_important_parts",
    "q_stats_agg",
    "q_running_events",
    "q_rolling_time_window",
    "q_sessionize_events",
    "q_winsorize",
    "q_time_rollup",
    "q8_market_share",
    # ln()-sum queries: per-term integer micro-nat rounding must make the
    # entropy/cross-entropy sums order-free too
    "q_token_entropy",
    "q_unigram_logloss",
    "q_tfidf_topk",
    "q_bm25_topk",
    "q_mad_outliers",
    "q_pareto_skyline",
    # exact-integer-moment statistics: normal equations / contingency terms
    # / sequential folds must all be partition-order-free
    "q_group_regression",
    "q_chi_square",
    "q_ewma_daily",
    "q_spearman_corr",
    # integer-space rounding in the similarity join verify step
    "q_setsim_prefix_join",
    # rank-derived doubles (1/(60+r)) + ln-sum BM25 arm must be layout-free
    "q_rrf_fusion",
    # integer-scaled CUSUM argmax with |S| ties broken on day
    "q_cusum_changepoint",
    # holistic-turned-distributive: running integer weight sums over the
    # distinct-value frame must be layout-free
    "q_weighted_median",
    # iterative micro-unit probability fold: per-term rounding must make
    # every step's sum order-free
    "q_markov_absorption",
    # 3-round integer-lattice Lloyd: argmin/update cascade must be layout-free
    "q_kmeans_lloyd",
    # nano-nat ln-sum running product (the BM25 rule on a survival curve)
    "q_kaplan_meier",
    # two-phase exact rank decomposition of Σi·xi must be layout-free
    "q_gini_revenue",
]


@pytest.mark.parametrize("name", PERTURB_QUERIES)
def test_partition_count_invariance(spark, name):
    results = []
    original = spark.conf.get("spark.sql.shuffle.partitions")
    original_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        # vary partition count (AQE on), then disable AQE entirely — the
        # driver's environment may differ in both dimensions
        for n_part, aqe in (("2", "true"), ("7", "true"), ("32", "true"), ("32", "false")):
            spark.conf.set("spark.sql.shuffle.partitions", n_part)
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            sdf = QUERIES[name](spark, SF_DIR)
            cols = sorted(sdf.columns)
            rows = [[row[c] for c in cols] for row in sdf.collect()]
            results.append(normalize(rows, cols))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", original)
        spark.conf.set("spark.sql.adaptive.enabled", original_aqe)
    assert all(r == results[0] for r in results), (
        f"{name}: result varies with shuffle partition count / AQE setting"
    )
