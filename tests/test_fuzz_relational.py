"""Differential fuzzing: seeded random filter+group+aggregate queries built
twice from one spec — once as a DataFrame plan, once as SQL for DuckDB —
must agree exactly. Complements the hand-written oracle suite with shapes
nobody thought to write.
"""

import math
import random

import duckdb
import pytest

from pyspark.sql import Window, functions as F

from tests.conftest import SF_DIR

GROUP_COLS = ["l_returnflag", "l_linestatus", "l_linenumber"]
NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
AGGS = [
    ("sum", F.sum, "SUM"),
    ("min", F.min, "MIN"),
    ("max", F.max, "MAX"),
    ("avg", F.avg, "AVG"),
]
FILTERS = [
    # (spark_condition_builder, sql_text)
    (lambda: F.col("l_quantity") > 25, "l_quantity > 25"),
    (lambda: F.col("l_discount") <= 0.05, "l_discount <= 0.05"),
    (lambda: F.col("l_returnflag") == "R", "l_returnflag = 'R'"),
    (lambda: F.col("l_extendedprice").between(10000, 50000), "l_extendedprice BETWEEN 10000 AND 50000"),
    (lambda: F.col("l_linenumber") % 2 == 0, "l_linenumber % 2 = 0"),
    (lambda: F.col("l_shipdate") < F.lit("1997-06-01").cast("timestamp"), "l_shipdate < TIMESTAMP '1997-06-01 00:00:00'"),
]


def make_spec(seed: int):
    rnd = random.Random(seed)
    n_filters = rnd.randint(0, 3)
    filters = rnd.sample(FILTERS, n_filters)
    group = rnd.sample(GROUP_COLS, rnd.randint(1, 2))
    aggs = [
        (rnd.choice(AGGS), rnd.choice(NUM_COLS), i)
        for i in range(rnd.randint(1, 3))
    ]
    return filters, group, aggs


def run_spec(spark, duck, seed: int):
    filters, group, aggs = make_spec(seed)

    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    conds_sql = []
    for build, sql in filters:
        df = df.filter(build())
        conds_sql.append(sql)
    agg_cols, agg_sqls = [], []
    for (name, fn, sql_fn), col, i in aggs:
        alias = f"a{i}_{name}_{col}"
        agg_cols.append(F.round(fn(col), 4).alias(alias))
        agg_sqls.append(f"ROUND({sql_fn}({col}), 4) AS {alias}")
    agg_cols.append(F.count("*").alias("n"))
    agg_sqls.append("CAST(COUNT(*) AS BIGINT) AS n")
    sdf = df.groupBy(*group).agg(*agg_cols)

    where = f"WHERE {' AND '.join(conds_sql)}" if conds_sql else ""
    sql = (
        f"SELECT {', '.join(group)}, {', '.join(agg_sqls)} "
        f"FROM lineitem {where} GROUP BY {', '.join(group)}"
    )
    cols = sorted(sdf.columns)
    spark_rows = sorted(
        tuple(_norm(row[c]) for c in cols) for row in sdf.collect()
    )
    res = duck.execute(sql)
    names = [d[0] for d in res.description]
    idx = [names.index(c) for c in cols]
    duck_rows = sorted(tuple(_norm(r[i]) for i in idx) for r in res.fetchall())
    assert spark_rows == duck_rows, f"seed={seed} sql={sql}"


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.6g}"
    return str(v)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF_DIR}/orders.parquet')"
    )
    return con


@pytest.mark.parametrize("seed", range(30))
def test_random_agg_query_matches_duckdb(spark, duck, seed):
    run_spec(spark, duck, seed)


JOIN_GROUP_COLS = ["l_returnflag", "o_orderstatus", "o_orderpriority"]


@pytest.mark.parametrize("seed", range(100, 115))
def test_random_join_query_matches_duckdb(spark, duck, seed):
    rnd = random.Random(seed)
    filters = rnd.sample(FILTERS, rnd.randint(0, 2))
    group = rnd.sample(JOIN_GROUP_COLS, rnd.randint(1, 2))
    aggs = [(rnd.choice(AGGS), rnd.choice(NUM_COLS), i) for i in range(rnd.randint(1, 2))]

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    conds_sql = []
    for build, sql in filters:
        li = li.filter(build())
        conds_sql.append(sql)
    df = li.join(orders, li.l_orderkey == orders.o_orderkey)
    agg_cols, agg_sqls = [], []
    for (name, fn, sql_fn), col, i in aggs:
        alias = f"a{i}_{name}_{col}"
        agg_cols.append(F.round(fn(col), 4).alias(alias))
        agg_sqls.append(f"ROUND({sql_fn}({col}), 4) AS {alias}")
    agg_cols.append(F.count("*").alias("n"))
    agg_sqls.append("CAST(COUNT(*) AS BIGINT) AS n")
    sdf = df.groupBy(*group).agg(*agg_cols)

    where = f"WHERE {' AND '.join(conds_sql)}" if conds_sql else ""
    sql = (
        f"SELECT {', '.join(group)}, {', '.join(agg_sqls)} FROM "
        f"(SELECT * FROM lineitem {where}) l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        f"GROUP BY {', '.join(group)}"
    )
    cols = sorted(sdf.columns)
    spark_rows = sorted(tuple(_norm(row[c]) for c in cols) for row in sdf.collect())
    res = duck.execute(sql)
    names = [d[0] for d in res.description]
    idx = [names.index(c) for c in cols]
    duck_rows = sorted(tuple(_norm(r[i]) for i in idx) for r in res.fetchall())
    assert spark_rows == duck_rows, f"seed={seed} sql={sql}"


WIN_FUNCS = [
    ("row_number", lambda w: F.row_number().over(w), "ROW_NUMBER() OVER w"),
    ("rank", lambda w: F.rank().over(w), "RANK() OVER w"),
    ("dense_rank", lambda w: F.dense_rank().over(w), "DENSE_RANK() OVER w"),
    ("lag", lambda w: F.coalesce(F.lag("l_quantity").over(w), F.lit(-1.0)), "COALESCE(LAG(l_quantity) OVER w, -1.0)"),
    ("lead", lambda w: F.coalesce(F.lead("l_quantity").over(w), F.lit(-1.0)), "COALESCE(LEAD(l_quantity) OVER w, -1.0)"),
    ("runsum", lambda w: F.round(F.sum("l_extendedprice").over(
        w.rowsBetween(Window.unboundedPreceding, 0)), 4),
     "ROUND(SUM(l_extendedprice) OVER (PARTITION BY l_returnflag ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)"),
]


@pytest.mark.parametrize("seed", range(200, 215))
def test_random_window_query_matches_duckdb(spark, duck, seed):
    rnd = random.Random(seed)
    picked = rnd.sample(WIN_FUNCS, rnd.randint(1, 3))
    # (orderkey, linenumber) is NOT unique in the corpus; ordering by every
    # column the query can observe makes any remaining ties full duplicates,
    # whose relative order cannot change the output multiset
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )

    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").filter(
        F.col("l_orderkey") % 7 == 0
    )
    sel = [F.col("l_orderkey"), F.col("l_linenumber"), F.col("l_quantity"), F.col("l_extendedprice")]
    sql_cols = ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"]
    for name, fn, sql in picked:
        sel.append(fn(w).alias(name))
        sql_cols.append(f"{sql} AS {name}")
    sdf = df.select(*sel)
    sql = (
        f"SELECT {', '.join(sql_cols)} FROM lineitem WHERE l_orderkey % 7 = 0 "
        f"WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice)"
    )
    cols = sorted(sdf.columns)
    spark_rows = sorted(tuple(_norm(row[c]) for c in cols) for row in sdf.collect())
    res = duck.execute(sql)
    names = [d[0] for d in res.description]
    idx = [names.index(c) for c in cols]
    duck_rows = sorted(tuple(_norm(r[i]) for i in idx) for r in res.fetchall())
    assert spark_rows == duck_rows, f"seed={seed}"


@pytest.mark.parametrize("seed", range(300, 310))
def test_random_asof_join_matches_duckdb(spark, seed):
    """Random (key, ts, value) tables: our carry-forward asof_join must
    equal DuckDB's native ASOF LEFT JOIN on every draw."""
    import duckdb as _duck

    from hive_json_spark.operators.relational import asof_join

    rnd = random.Random(seed)
    keys = ["a", "b", "c"]
    left_rows = [
        (i, rnd.choice(keys), rnd.randrange(0, 1000))
        for i in range(rnd.randrange(30, 60))
    ]
    # right side: unique (key, ts) pairs so both engines pick the same row
    right_pairs = {(rnd.choice(keys), rnd.randrange(0, 1000)) for _ in range(25)}
    right_rows = [(k, ts, rnd.randrange(0, 10**6)) for k, ts in right_pairs]

    left = spark.createDataFrame(left_rows, "lid bigint, k string, ts bigint")
    right = spark.createDataFrame(right_rows, "k string, ts bigint, rv bigint")
    got = {
        r.lid: r.rv
        for r in asof_join(left, right, ["k"], "ts", "ts", ["rv"]).collect()
    }

    con = _duck.connect()
    con.execute("CREATE TABLE l(lid BIGINT, k VARCHAR, ts BIGINT)")
    con.executemany("INSERT INTO l VALUES (?, ?, ?)", left_rows)
    con.execute("CREATE TABLE r(k VARCHAR, ts BIGINT, rv BIGINT)")
    con.executemany("INSERT INTO r VALUES (?, ?, ?)", right_rows)
    expected = dict(
        con.execute(
            "SELECT l.lid, r.rv FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.ts >= r.ts"
        ).fetchall()
    )
    assert got == expected, f"seed={seed}"


@pytest.mark.parametrize("seed", range(400, 415))
def test_random_rollup_cube_matches_duckdb(spark, duck, seed):
    """Multi-level aggregation fuzz: random ROLLUP / CUBE / GROUPING SETS
    over random group keys and aggregates — the same SQL text runs on
    Spark and DuckDB (both speak the ANSI syntax), so every grouping-set
    expansion NULL pattern is compared exactly."""
    rnd = random.Random(seed)
    group = rnd.sample(GROUP_COLS, 2)
    mode = rnd.choice(["ROLLUP", "CUBE", "SETS"])
    if mode == "SETS":
        candidates = [f"({group[0]}, {group[1]})", f"({group[0]})", f"({group[1]})", "()"]
        sets = rnd.sample(candidates, rnd.randint(2, 4))
        group_by = f"GROUPING SETS ({', '.join(sets)})"
    else:
        group_by = f"{mode}({group[0]}, {group[1]})"
    aggs = [(rnd.choice(AGGS), rnd.choice(NUM_COLS), i) for i in range(rnd.randint(1, 2))]
    agg_sqls = [
        f"ROUND({sql_fn}({col}), 4) AS a{i}_{name}_{col}"
        for (name, _fn, sql_fn), col, i in aggs
    ]
    agg_sqls.append("CAST(COUNT(*) AS BIGINT) AS n")
    filters = rnd.sample(FILTERS, rnd.randint(0, 2))
    where = f"WHERE {' AND '.join(sql for _b, sql in filters)}" if filters else ""
    sql = (
        f"SELECT {', '.join(group)}, {', '.join(agg_sqls)} "
        f"FROM lineitem {where} GROUP BY {group_by}"
    )

    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").createOrReplaceTempView("lineitem")
    sdf = spark.sql(sql)
    cols = sorted(sdf.columns)
    spark_rows = sorted(tuple(_norm(row[c]) for c in cols) for row in sdf.collect())
    res = duck.execute(sql)
    names = [d[0] for d in res.description]
    idx = [names.index(c) for c in cols]
    duck_rows = sorted(tuple(_norm(r[i]) for i in idx) for r in res.fetchall())
    assert spark_rows == duck_rows, f"seed={seed} sql={sql}"


SETOP_PROJECTIONS = [
    "l_returnflag",
    "l_linestatus",
    "l_linenumber",
    "CAST(l_quantity AS BIGINT) AS qty",
]


@pytest.mark.parametrize("seed", range(500, 510))
def test_random_set_ops_match_duckdb(spark, duck, seed):
    """Set-operation fuzz: UNION / INTERSECT / EXCEPT (+ ALL variants)
    between two randomly filtered projections of lineitem — identical SQL
    text on both engines, bag/set semantics compared exactly."""
    rnd = random.Random(seed)
    proj = ", ".join(rnd.sample(SETOP_PROJECTIONS, 2))
    op = rnd.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
    f1, f2 = rnd.sample(FILTERS, 2)
    sql = (
        f"SELECT {proj} FROM lineitem WHERE {f1[1]} "
        f"{op} "
        f"SELECT {proj} FROM lineitem WHERE {f2[1]}"
    )
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").createOrReplaceTempView("lineitem")
    sdf = spark.sql(sql)
    cols = sorted(sdf.columns)
    spark_rows = sorted(tuple(_norm(row[c]) for c in cols) for row in sdf.collect())
    res = duck.execute(sql)
    names = [d[0] for d in res.description]
    idx = [names.index(c) for c in cols]
    duck_rows = sorted(tuple(_norm(r[i]) for i in idx) for r in res.fetchall())
    assert spark_rows == duck_rows, f"seed={seed} sql={sql}"


def _gen_scalar_expr(rnd, depth):
    """Random numeric expression as (spark Column, sql text), dialect-safe:
    division guarded, unary functions domain-restricted, identical operator
    semantics on Spark and DuckDB."""
    leaves = [
        (lambda: F.col("l_quantity"), "l_quantity"),
        (lambda: F.col("l_extendedprice"), "l_extendedprice"),
        (lambda: F.col("l_discount"), "l_discount"),
        (lambda: F.col("l_tax"), "l_tax"),
        (lambda: F.lit(2.5), "2.5"),
        (lambda: F.lit(7.0), "7.0"),
    ]
    if depth == 0:
        c, s = rnd.choice(leaves)
        return c(), s
    kind = rnd.choice(["add", "sub", "mul", "div", "least", "greatest", "unary", "case"])
    a_c, a_s = _gen_scalar_expr(rnd, depth - 1)
    if kind == "unary":
        fn = rnd.choice(["abs", "floor", "ceil", "sqrt_abs", "ln1p_abs"])
        if fn == "abs":
            return F.abs(a_c), f"abs({a_s})"
        if fn == "floor":
            return F.floor(a_c).cast("double"), f"CAST(floor({a_s}) AS DOUBLE)"
        if fn == "ceil":
            return F.ceil(a_c).cast("double"), f"CAST(ceil({a_s}) AS DOUBLE)"
        if fn == "sqrt_abs":
            return F.sqrt(F.abs(a_c)), f"sqrt(abs({a_s}))"
        return F.log(F.abs(a_c) + 1.0), f"ln(abs({a_s}) + 1.0)"
    b_c, b_s = _gen_scalar_expr(rnd, depth - 1)
    if kind == "add":
        return a_c + b_c, f"({a_s} + {b_s})"
    if kind == "sub":
        return a_c - b_c, f"({a_s} - {b_s})"
    if kind == "mul":
        return a_c * b_c, f"({a_s} * {b_s})"
    if kind == "div":
        return a_c / (F.abs(b_c) + 1.0), f"({a_s} / (abs({b_s}) + 1.0))"
    if kind == "least":
        return F.least(a_c, b_c), f"least({a_s}, {b_s})"
    if kind == "greatest":
        return F.greatest(a_c, b_c), f"greatest({a_s}, {b_s})"
    cond_c, cond_s = F.col("l_quantity") > 25, "l_quantity > 25"
    return (
        F.when(cond_c, a_c).otherwise(b_c),
        f"CASE WHEN {cond_s} THEN {a_s} ELSE {b_s} END",
    )


@pytest.mark.parametrize("seed", range(600, 615))
def test_random_scalar_exprs_match_duckdb(spark, duck, seed):
    """Scalar-expression fuzz: random arithmetic / conditional / guarded
    math expression trees (depth ≤ 3) projected per-row, built once as a
    DataFrame Column tree and once as SQL for DuckDB. Exercises IEEE
    double semantics, CASE, least/greatest null-safety, and cast behavior
    across dialects."""
    rnd = random.Random(seed)
    exprs = [_gen_scalar_expr(rnd, rnd.randint(1, 3)) for _ in range(3)]
    flt = rnd.choice(FILTERS)

    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").filter(flt[0]())
    sdf = df.select(
        "l_orderkey",
        "l_linenumber",
        *[F.round(c, 4).alias(f"e{i}") for i, (c, _) in enumerate(exprs)],
    )
    sel = ", ".join(f"ROUND({s}, 4) AS e{i}" for i, (_, s) in enumerate(exprs))
    sql = (
        f"SELECT l_orderkey, l_linenumber, {sel} "
        f"FROM lineitem WHERE {flt[1]}"
    )
    # Key-matched compare with one-unit-in-last-rounded-place tolerance on
    # the ROUND(double, 4) projections: when the unrounded double lands
    # EXACTLY on a .xxxx5 half boundary, Spark rounds its shortest decimal
    # string HALF_UP while DuckDB rounds the binary value — both are
    # defensible IEEE behaviours and the divergence is inherent to the
    # generated expression, not an engine bug (round-2 verdict: seed 609 at
    # sf0.01 hit 37.87575 → 37.8758 vs 37.8757).  Exact values still must
    # match to 1e-4; anything beyond one ulp-at-rounded-precision fails.
    ecols = [f"e{i}" for i in range(len(exprs))]
    spark_map = {
        (row["l_orderkey"], row["l_linenumber"]): [row[c] for c in ecols]
        for row in sdf.collect()
    }
    res = duck.execute(sql)
    names = [d[0] for d in res.description]
    kidx = [names.index("l_orderkey"), names.index("l_linenumber")]
    eidx = [names.index(c) for c in ecols]
    duck_map = {
        (r[kidx[0]], r[kidx[1]]): [r[i] for i in eidx] for r in res.fetchall()
    }
    assert spark_map.keys() == duck_map.keys(), f"seed={seed} sql={sql}"
    for key, svals in spark_map.items():
        dvals = duck_map[key]
        for c, sv, dv in zip(ecols, svals, dvals):
            if sv is None or dv is None:
                assert sv is None and dv is None, f"seed={seed} {key} {c}: {sv} vs {dv}"
            elif math.isnan(sv) or math.isnan(dv):
                assert math.isnan(sv) and math.isnan(dv), f"seed={seed} {key} {c}: {sv} vs {dv}"
            elif math.isinf(sv) or math.isinf(dv):
                assert sv == dv, f"seed={seed} {key} {c}: {sv} vs {dv}"
            else:
                assert abs(sv - dv) <= 1.000001e-4 + abs(sv) * 1e-12, (
                    f"seed={seed} {key} {c}: {sv} vs {dv} sql={sql}"
                )


@pytest.mark.parametrize("seed", range(700, 710))
def test_random_ignore_nulls_carry_matches_duckdb(spark, duck, seed):
    """IGNORE-NULLS first/last carries over randomized null masks, value
    columns, and frame directions — the attribution/interpolation idiom
    (queries_quality.py) under fuzz."""
    rnd = random.Random(seed)
    m = rnd.randint(2, 5)
    val = rnd.choice(["l_quantity", "l_extendedprice"])
    func, sqlfunc = rnd.choice(
        [(F.first, "first_value"), (F.last, "last_value")]
    )
    back = rnd.random() < 0.5
    order = ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"]
    w = Window.partitionBy("l_returnflag").orderBy(*order)
    w = (
        w.rowsBetween(Window.unboundedPreceding, -1)
        if back
        else w.rowsBetween(1, Window.unboundedFollowing)
    )
    frame_sql = (
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"
        if back
        else "ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING"
    )
    masked = F.when(F.col("l_linenumber") % m != 0, F.col(val))
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").filter(
        F.col("l_orderkey") % 7 == 0
    )
    sdf = df.select(
        *order, func(masked, ignorenulls=True).over(w).alias("carry")
    )
    sql = (
        f"SELECT {', '.join(order)}, "
        f"{sqlfunc}(CASE WHEN l_linenumber % {m} <> 0 THEN {val} END IGNORE NULLS) "
        f"OVER (PARTITION BY l_returnflag ORDER BY {', '.join(order)} {frame_sql}) AS carry "
        f"FROM lineitem WHERE l_orderkey % 7 = 0"
    )
    cols = sorted(sdf.columns)
    spark_rows = sorted(tuple(_norm(row[c]) for c in cols) for row in sdf.collect())
    res = duck.execute(sql)
    names = [d[0] for d in res.description]
    idx = [names.index(c) for c in cols]
    duck_rows = sorted(tuple(_norm(r[i]) for i in idx) for r in res.fetchall())
    assert spark_rows == duck_rows, f"seed={seed}"


@pytest.mark.parametrize("seed", range(800, 810))
def test_random_full_outer_join_matches_duckdb(spark, duck, seed):
    """Full-outer joins of two randomly-filtered aggregates — the CDC
    merge shape (q_merge_upsert) under fuzz: unmatched-left,
    unmatched-right, and matched rows all appear with correct nulls."""
    rnd = random.Random(seed)
    a_mod, a_r = rnd.randint(2, 5), 0
    b_mod, b_r = rnd.randint(2, 5), 1
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    left = (
        orders.filter(F.col("o_orderkey") % a_mod == a_r)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_a"))
    )
    right = (
        orders.filter(F.col("o_orderkey") % b_mod == b_r)
        .groupBy(F.col("o_custkey").alias("ck"))
        .agg(F.count("*").alias("n_b"))
    )
    sdf = left.join(right, left.o_custkey == right.ck, "full_outer").select(
        F.coalesce("o_custkey", "ck").alias("custkey"), "n_a", "n_b"
    )
    sql = f"""
    SELECT COALESCE(a.o_custkey, b.o_custkey) AS custkey, a.n_a, b.n_b
    FROM (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_a FROM orders
          WHERE o_orderkey % {a_mod} = {a_r} GROUP BY o_custkey) a
    FULL OUTER JOIN
         (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_b FROM orders
          WHERE o_orderkey % {b_mod} = {b_r} GROUP BY o_custkey) b
      ON a.o_custkey = b.o_custkey
    """
    cols = sorted(sdf.columns)
    spark_rows = sorted(tuple(_norm(row[c]) for c in cols) for row in sdf.collect())
    res = duck.execute(sql)
    names = [d[0] for d in res.description]
    idx = [names.index(c) for c in cols]
    duck_rows = sorted(tuple(_norm(r[i]) for i in idx) for r in res.fetchall())
    assert spark_rows == duck_rows, f"seed={seed}"


@pytest.mark.parametrize("seed", range(900, 910))
def test_random_ordered_agg_matches_duckdb(spark, duck, seed):
    """Ordered string aggregation under randomized order keys, payload
    columns, and delimiters — q_top_paths' total-order collect idiom:
    Spark's array_sort(collect_list(struct)) must equal DuckDB's native
    string_agg(... ORDER BY) exactly."""
    rnd = random.Random(seed)
    okeys = rnd.choice(
        [("o_orderdate", "o_orderkey"), ("o_totalprice", "o_orderkey")]
    )
    val = rnd.choice(["o_orderstatus", "o_orderpriority"])
    delim = rnd.choice(["|", ">", ","])
    mod = rnd.randint(7, 13)
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
        F.col("o_custkey") % mod == 0
    )
    sdf = orders.groupBy("o_custkey").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(*okeys, val))),
                lambda s: s[val],
            ),
            delim,
        ).alias("agg_str")
    )
    sql = (
        f"SELECT o_custkey, string_agg({val}, '{delim}' "
        f"ORDER BY {', '.join(okeys)}) AS agg_str "
        f"FROM orders WHERE o_custkey % {mod} = 0 GROUP BY o_custkey"
    )
    cols = sorted(sdf.columns)
    spark_rows = sorted(tuple(_norm(row[c]) for c in cols) for row in sdf.collect())
    res = duck.execute(sql)
    names = [d[0] for d in res.description]
    idx = [names.index(c) for c in cols]
    duck_rows = sorted(tuple(_norm(r[i]) for i in idx) for r in res.fetchall())
    assert spark_rows == duck_rows, f"seed={seed}"


@pytest.mark.parametrize("seed", range(1000, 1010))
def test_random_grouped_percentile_matches_duckdb(spark, duck, seed):
    """Exact interpolated percentiles at random probabilities and group
    keys — Spark percentile() vs DuckDB percentile_cont(): linear
    interpolation between order statistics must agree to 6 significant
    digits for arbitrary p."""
    rnd = random.Random(seed)
    p = round(rnd.uniform(0.05, 0.95), 3)
    grp = rnd.choice(["l_returnflag", "l_linestatus"])
    val = rnd.choice(["l_quantity", "l_extendedprice", "l_discount"])
    mod = rnd.randint(3, 9)
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").filter(
        F.col("l_orderkey") % mod == 0
    )
    sdf = df.groupBy(grp).agg(
        F.round(F.percentile(val, F.lit(p)), 6).alias("pct")
    )
    sql = (
        f"SELECT {grp}, ROUND(percentile_cont({p}) WITHIN GROUP (ORDER BY {val}), 6)"
        f" AS pct FROM lineitem WHERE l_orderkey % {mod} = 0 GROUP BY {grp}"
    )
    cols = sorted(sdf.columns)
    spark_rows = sorted(tuple(_norm(row[c]) for c in cols) for row in sdf.collect())
    res = duck.execute(sql)
    names = [d[0] for d in res.description]
    idx = [names.index(c) for c in cols]
    duck_rows = sorted(tuple(_norm(r[i]) for i in idx) for r in res.fetchall())
    assert spark_rows == duck_rows, f"seed={seed} p={p}"


# date-expression pairs with identical semantics in both engines; the
# divergent ones (dayofweek numbering) are handled by the engine's scalar
# pack with explicit mappings, not fuzzed blind
DATE_EXPRS = [
    ("m_trunc", lambda c: F.date_trunc("month", c).cast("date"),
     "CAST(date_trunc('month', {c}) AS DATE)"),
    ("y_trunc", lambda c: F.date_trunc("year", c).cast("date"),
     "CAST(date_trunc('year', {c}) AS DATE)"),
    ("plus_d", lambda c: F.date_add(c.cast("date"), 17),
     "CAST({c} AS DATE) + 17"),
    ("lday", lambda c: F.last_day(c),
     "last_day(CAST({c} AS DATE))"),
    ("mth", lambda c: F.month(c).cast("bigint"), "CAST(month({c}) AS BIGINT)"),
    ("qtr", lambda c: F.quarter(c).cast("bigint"), "CAST(quarter({c}) AS BIGINT)"),
    ("yr", lambda c: F.year(c).cast("bigint"), "CAST(year({c}) AS BIGINT)"),
]


@pytest.mark.parametrize("seed", range(1100, 1110))
def test_random_date_exprs_match_duckdb(spark, duck, seed):
    rnd = random.Random(seed)
    picked = rnd.sample(DATE_EXPRS, rnd.randint(2, 4))
    mod = rnd.randint(3, 9)
    df = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
        F.col("o_orderkey") % mod == 0
    )
    sel = [F.col("o_orderkey")]
    sql_cols = ["o_orderkey"]
    for name, fn, sql_t in picked:
        sel.append(fn(F.col("o_orderdate")).alias(name))
        sql_cols.append(sql_t.format(c="o_orderdate") + f" AS {name}")
    sdf = df.select(*sel)
    sql = (
        f"SELECT {', '.join(sql_cols)} FROM orders WHERE o_orderkey % {mod} = 0"
    )
    cols = sorted(sdf.columns)
    spark_rows = sorted(tuple(_norm(row[c]) for c in cols) for row in sdf.collect())
    res = duck.execute(sql)
    names = [d[0] for d in res.description]
    idx = [names.index(c) for c in cols]
    duck_rows = sorted(tuple(_norm(r[i]) for i in idx) for r in res.fetchall())
    assert spark_rows == duck_rows, f"seed={seed}"
