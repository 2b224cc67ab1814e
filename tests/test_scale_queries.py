"""Physical-plan and operator tests for the scale-infrastructure queries
(queries_scale.py): the oracle-parity suite proves these produce the right
ANSWERS; this file pins that they produce them through the right PLANS."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_join_exchange(spark):
    """The whole point of bucketBy: the sort-merge join of two tables
    bucketed on the join key must not shuffle either side. The only
    Exchange allowed in the plan is the final aggregation's."""
    from hive_json_spark.queries_scale import bucketed_table

    orders = bucketed_table(spark, SF_DIR, "orders", "o_orderkey")
    li = bucketed_table(spark, SF_DIR, "lineitem", "l_orderkey")
    joined = (
        orders.hint("merge")
        .join(li, orders.o_orderkey == li.l_orderkey)
        .select("o_orderkey", "l_quantity")
    )
    plan = _plan(joined)
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan, plan


def test_bucketed_join_matches_plain_join(spark):
    from hive_json_spark.queries_scale import bucketed_table

    orders = bucketed_table(spark, SF_DIR, "orders", "o_orderkey")
    li = bucketed_table(spark, SF_DIR, "lineitem", "l_orderkey")
    n_bucketed = orders.join(li, orders.o_orderkey == li.l_orderkey).count()
    plain_o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    plain_l = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    n_plain = plain_o.join(plain_l, plain_o.o_orderkey == plain_l.l_orderkey).count()
    assert n_bucketed == n_plain


def test_salted_join_equals_plain_join(spark):
    """Salting must repartition work, not change results — row-for-row."""
    from hive_json_spark.operators.relational import salted_join

    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select(F.col("l_suppkey").alias("suppkey"), "l_orderkey", "l_linenumber")
    )
    sup = spark.read.parquet(f"{SF_DIR}/supplier.parquet").select(
        F.col("s_suppkey").alias("suppkey"), "s_name"
    )
    salted = salted_join(li, sup, ["suppkey"], n_salts=4)
    plain = li.join(sup, ["suppkey"])
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_heavy_hitters_equals_naive_groupby(spark):
    """The two-phase candidate/verify pass must equal the full groupBy for
    any threshold — including one low enough that every token qualifies
    (max candidate pressure) and one high enough that none do."""
    from hive_json_spark.functions.text import tokens
    from hive_json_spark.operators.sketch import heavy_hitters

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = docs.select(F.explode(tokens("text")).alias("token"))

    for min_count in (1, 50, 10**9):
        hh = {
            (r["token"], r["n"])
            for r in heavy_hitters(docs, "text", min_count=min_count).collect()
        }
        naive = {
            (r["token"], r["n"])
            for r in toks.groupBy("token")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") >= min_count)
            .collect()
        }
        assert hh == naive, f"min_count={min_count}"


def test_heavy_hitters_empty_corpus(spark):
    from hive_json_spark.operators.sketch import heavy_hitters

    empty = spark.createDataFrame([], "doc_id bigint, text string")
    out = heavy_hitters(empty, "text", freq_threshold=0.01)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["token", "n", "freq_ppm"]


def test_zorder_groups_are_clustered_in_both_dims(spark):
    """A z-ordered layout must bound BOTH dimensions per file group: the
    mean per-group extent in qx and qy should each be well under the full
    quantized range (a single-column sort would leave the other dimension's
    extent at ~full range in every group)."""
    from hive_json_spark.registry import QUERIES

    rows = QUERIES["q_zorder_layout"](spark, SF_DIR).collect()
    assert len(rows) == 16
    span_x = sum(r["max_qx"] - r["min_qx"] for r in rows) / len(rows)
    span_y = sum(r["max_qy"] - r["min_qy"] for r in rows) / len(rows)
    # full range is 0..1023; z-clustering should cut the mean bounding box
    # materially on both axes simultaneously
    assert span_x < 900, span_x
    assert span_y < 900, span_y


def test_token_entropy_bounds(spark):
    """0 <= H <= ln(distinct_tokens): uniform distribution is the max."""
    import math

    from hive_json_spark.registry import QUERIES

    rows = QUERIES["q_token_entropy"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # tolerance: per-term micro-nat rounding contributes up to
        # 0.5e-6 * distinct_tokens of drift past the exact bound
        assert -1e-4 <= r["token_entropy"] <= math.log(r["distinct_tokens"]) + 1e-4


def test_incremental_agg_merge_rejects_unknown_combiner(spark):
    from hive_json_spark.operators.relational import incremental_agg_merge

    df = spark.createDataFrame([(1, 2)], "k int, v bigint")
    with pytest.raises(ValueError, match="unknown combiner"):
        incremental_agg_merge(df, df, ["k"], {"v": "avg"})


def test_incremental_agg_merge_three_way_associative(spark):
    """Merging (A+B)+C must equal A+(B+C) must equal one-shot — partials
    are a commutative monoid under the spec."""
    from hive_json_spark.operators.relational import incremental_agg_merge

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")

    def part(pred):
        return orders.filter(pred).groupBy("o_orderpriority").agg(
            F.count("*").alias("n"), F.min("o_totalprice").alias("lo")
        )

    k = F.col("o_orderkey") % 3
    a, b, c = part(k == 0), part(k == 1), part(k == 2)
    spec = {"n": "sum", "lo": "min"}
    left = incremental_agg_merge(
        incremental_agg_merge(a, b, ["o_orderpriority"], spec), c,
        ["o_orderpriority"], spec)
    right = incremental_agg_merge(
        a, incremental_agg_merge(b, c, ["o_orderpriority"], spec),
        ["o_orderpriority"], spec)
    full = orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"), F.min("o_totalprice").alias("lo"))
    norm = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert norm(left) == norm(right) == norm(full)


def test_heavy_hitters_keeps_unicode_whitespace_tokens(spark):
    """Candidate tokenization must match tokens() (ASCII \\s): a token
    containing a non-breaking space is ONE token on the JVM side, and the
    Python candidate kernel must not fragment it — else a true heavy
    hitter silently disappears."""
    from hive_json_spark.operators.sketch import heavy_hitters

    token = "foo bar"  # NBSP inside — not ASCII whitespace
    docs = spark.createDataFrame(
        [(i, f"{token} other words here") for i in range(20)],
        "doc_id bigint, text string",
    )
    out = {r["token"]: r["n"] for r in heavy_hitters(docs, "text", min_count=10).collect()}
    assert out.get(token) == 20, out
