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

import duckdb
import pytest

import __spark_entry__ as entry_mod

from tests.conftest import SF_DIR

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
    """Rows → sorted list of tuples, each value tagged with its type KIND.

    Type-strict (round-2 lesson): the old version coerced Decimal → float,
    so a Spark decimal(26,4) column vs a DuckDB DOUBLE column compared
    equal locally and then failed the driver's hash (q_time_rollup shipped
    red exactly this way).  Now a value's kind (int / float / decimal /
    bool / str / ...) is part of the comparison, so a cross-engine type
    drift fails HERE first.  Decimal is normalized scale-insensitively
    (Decimal('18829.9000') == Decimal('18829.90')) but never equals the
    float form — registry queries must emit the SAME kind on both engines.
    """
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, bool):
                vals.append(f"bool:{v}")
            elif isinstance(v, float):
                if math.isnan(v):
                    vals.append("f:NaN")
                elif v == 0.0:
                    vals.append("f:0")  # canonicalize -0.0 vs 0.0
                else:
                    vals.append(f"f:{v:.17g}")
            elif isinstance(v, int):
                vals.append(f"i:{v}")
            elif v.__class__.__name__ == "Decimal":
                # scale-insensitive decimal repr; still distinct from float
                norm = v.normalize()
                vals.append("d:0" if norm == 0 else f"d:{norm}")
            elif v is None:
                vals.append("null")
            else:
                vals.append(f"{type(v).__name__}:{v}")
        out.append(tuple(vals))
    return sorted(out)


def decimal_columns(rows, colnames):
    """Column names whose values include any Decimal (driver-hash hazard)."""
    hit = set()
    for row in rows:
        for c, v in zip(colnames, row):
            if v.__class__.__name__ == "Decimal":
                hit.add(c)
    return sorted(hit)


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
    # No registry query may emit a Decimal column from either engine: the
    # driver's value-hash is repr-sensitive, and decimal scale/typing is the
    # one place Spark and DuckDB legitimately diverge (Spark types
    # `SUM(bigint)/100.0` as decimal(26,4); DuckDB as DOUBLE).  Any money/
    # ratio output must be CAST ... AS DOUBLE on both sides.
    spark_dec = decimal_columns(spark_rows, spark_cols)
    duck_dec = decimal_columns(duck_rows, spark_cols)
    assert not spark_dec and not duck_dec, (
        f"Decimal output columns (driver-hash hazard): "
        f"spark={spark_dec} duck={duck_dec} — cast to DOUBLE on both sides"
    )
    assert normalize(spark_rows, spark_cols) == normalize(duck_rows, spark_cols)


def test_gate_is_type_strict():
    """The gate itself must reject the decimal-vs-double class that shipped
    q_time_rollup red in round 2: same numeric value, different kind."""
    from decimal import Decimal

    dec_rows = [[Decimal("18829.9000")]]
    dbl_rows = [[18829.9]]
    assert normalize(dec_rows, ["v"]) != normalize(dbl_rows, ["v"])
    # and the Decimal ban trips on either side
    assert decimal_columns(dec_rows, ["v"]) == ["v"]
    assert decimal_columns(dbl_rows, ["v"]) == []
    # scale-insensitive within the decimal kind (not a false alarm source)
    assert normalize([[Decimal("1.50")]], ["v"]) == normalize([[Decimal("1.5")]], ["v"])
    # int vs float is also a kind mismatch now
    assert normalize([[3]], ["v"]) != normalize([[3.0]], ["v"])


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
    # interpolated exact percentiles: bracketing + lower+frac*(upper-lower)
    # must be identical under any partitioning and on both dispatch paths
    "q_percentiles",
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
    # exact int64 moment sums per lag feed one Pearson formula
    "q_acf_daily",
    # collect_set + array_sort must be layout-free (bare collect_list isn't)
    "q_listagg",
    # two-level rank decomposition (bucket offset + within-bucket row_number)
    "q_equidepth_bins",
    # centroid AVG is a double sum; ranking must ride the ROUNDED cosine
    "q_embedding_outliers",
    # GEMM top-1: per-row fixed-order dot products, argmax on rounded sims
    "q_mutual_nn",
    # decimal(38,0) moment sums are order-free by exactness
    "q_corr_matrix",
    # µs×cents integer weighting
    "q_twap_user",
    # integer-cent cumulative class boundaries over a total order
    "q_abc_parts",
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
