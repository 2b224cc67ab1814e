"""Data-quality auditing and sequence/lifecycle analytics: the queries a
warehouse team runs to trust and segment a corpus — activity streaks
(gaps-and-islands), slowly-changing-dimension builds, referential-integrity
audits, RFM segmentation, and adjacent-pair (one-step-BPE) statistics.

The reference (`/root/reference` hortonworks/hive-json) has no analog —
its surface ends at schema inference + shredding (`JsonSchemaFinder.java:227-254`,
`JsonShredder.java:92-109`); these extend the engine per SURVEY §2's
"absent from reference" table and the LLM-pipeline mandate.

Scale rules shared with the rest of the registry: windows partition on a
real key wherever possible (the two single-partition ntile windows below
document their approx_percentile scale path), every tiebreak is total, and
everything stays inside whole-stage codegen — no Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from hive_json_spark.functions.text import tokens
from hive_json_spark.sources import load_table

QUERIES = {}
ORACLES = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --- gaps and islands: per-user activity streaks -----------------------------

@query(
    "q_activity_streaks",
    """
    WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    isl AS (
      SELECT user_id, d,
             d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS INT)
               AS grp
      FROM days),
    streaks AS (
      SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len
      FROM isl GROUP BY user_id, grp)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(MAX(len) AS BIGINT) AS max_streak,
           CAST(SUM(len) AS BIGINT) AS active_days
    FROM streaks GROUP BY user_id
    """,
)
def q_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive-calendar-day activity streaks per user
    (the retention/engagement primitive). The island id is the classic
    ``date - row_number()`` trick — constant within a run of consecutive
    days, strictly monotone across gaps — so streaks fall out of two
    hash aggregations and one window, all partitioned by user_id: ONE
    shuffle key end-to-end, no self-join, no sequential scan. At 100 TB
    the distinct-day pre-agg is the big reducer (events → user-days);
    everything after is user-cardinality sized.
    """
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn("grp", F.date_sub(F.col("d"), F.row_number().over(w)))
    streaks = isl.groupBy("user_id", "grp").agg(F.count("*").alias("len"))
    return streaks.groupBy("user_id").agg(
        F.count("*").alias("n_streaks"),
        F.max("len").alias("max_streak"),
        F.sum("len").alias("active_days"),
    )


# --- SCD type 2 build from a change log --------------------------------------

@query(
    "q_scd2_status",
    """
    WITH ordered AS (
      SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
             LAG(o_orderstatus) OVER w AS prev_status
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
    changes AS (
      SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey FROM ordered
      WHERE prev_status IS NULL OR prev_status != o_orderstatus)
    SELECT o_custkey, o_orderstatus AS status, o_orderdate AS valid_from,
           LEAD(o_orderdate) OVER w2 AS valid_to,
           CASE WHEN LEAD(o_orderdate) OVER w2 IS NULL THEN TRUE ELSE FALSE END
             AS is_current
    FROM changes
    WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_scd2_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build: collapse the per-customer
    order-status change log into validity intervals (valid_from / valid_to /
    is_current) — the dimension-table maintenance primitive behind
    point-in-time joins (see q_asof_join for the consumer side).

    Change detection (LAG), interval close (LEAD), and the filter between
    them all share ONE window partitioning on o_custkey — Spark plans a
    single sort+shuffle and reuses it for both window functions. The
    (o_orderdate, o_orderkey) compound order makes same-day changes
    deterministic. At 100 TB this is exactly the MERGE-free SCD2 rebuild
    pattern: pure window math, no self-join against the previous snapshot.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changes = (
        orders.select(
            "o_custkey",
            "o_orderstatus",
            "o_orderdate",
            "o_orderkey",
            F.lag("o_orderstatus").over(w).alias("prev_status"),
        )
        .filter(
            F.col("prev_status").isNull()
            | (F.col("prev_status") != F.col("o_orderstatus"))
        )
        .drop("prev_status")
    )
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    valid_to = F.lead("o_orderdate").over(w2)
    return changes.select(
        "o_custkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderdate").alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


# --- referential-integrity audit ---------------------------------------------

_FK_EDGES = (
    # (name, child table, child key, parent table, parent key)
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
)

_SMALL_PARENTS = {"region", "nation", "customer"}  # always broadcastable dims

@query(
    "q_fk_integrity",
    """
    SELECT * FROM (
    """
    + "\nUNION ALL\n".join(
        f"""
    SELECT '{name}' AS fk,
           CAST((SELECT COUNT(*) FROM {child}) AS BIGINT) AS n_child,
           CAST((SELECT COUNT(*) FROM {child} c
                 WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                                   WHERE p.{pkey} = c.{ckey})) AS BIGINT)
             AS n_orphans
        """
        for name, child, ckey, parent, pkey in _FK_EDGES
    )
    + ") t",
)
def q_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan-row counts for every foreign-key
    edge in the star schema (the "can I trust my joins" pre-flight every
    warehouse load runs). Each edge is ONE scan of the child: a left outer
    join against the parent's key column with total and null-parent counts
    taken in the same global aggregate (never a count job + an anti-join
    job re-reading the child). Dimension parents are force-broadcast; fact
    parents (orders at 100 TB) are left to AQE, which picks broadcast when
    the pruned key column fits and a shuffle join when it doesn't — the
    parent is projected to its key before the join either way.
    """
    parts = []
    for name, child, ckey, parent, pkey in _FK_EDGES:
        c = load_table(spark, sf_dir, child).select(ckey)
        p = load_table(spark, sf_dir, parent).select(pkey)
        if parent in _SMALL_PARENTS:
            p = F.broadcast(p)
        joined = c.join(p, c[ckey] == p[pkey], "left_outer")
        parts.append(
            joined.agg(
                F.lit(name).alias("fk"),
                F.count("*").alias("n_child"),
                F.count(F.when(p[pkey].isNull(), 1)).alias("n_orphans"),
            )
        )
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out


# --- RFM customer segmentation -----------------------------------------------

@query(
    "q_rfm_segments",
    """
    WITH rfm AS (
      SELECT o_custkey, MAX(o_orderdate) AS last_order,
             CAST(COUNT(*) AS BIGINT) AS freq,
             SUM(o_totalprice) AS monetary
      FROM orders GROUP BY o_custkey),
    scored AS (
      SELECT o_custkey,
             ntile(5) OVER (ORDER BY last_order, o_custkey) AS r,
             ntile(5) OVER (ORDER BY freq, o_custkey) AS f,
             ntile(5) OVER (ORDER BY monetary, o_custkey) AS m
      FROM rfm)
    SELECT r, f, m, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM scored GROUP BY r, f, m
    """,
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: score every customer 1-5 on recency / frequency /
    monetary via ntile, then count the segment grid — the classic
    marketing-analytics rollup. The per-customer pre-agg does the heavy
    reduction first (orders → customers); ties break on o_custkey so
    quintile assignment is total-ordered and engine-independent.

    NOTE the three exact ntiles are single-partition windows over the
    *customer* aggregate (already ~1/10,000th of the fact table). The
    100 TB path swaps exact ntile for approx_percentile boundaries +
    range binning, the same trade q_equidepth_bins documents.
    """
    orders = load_table(spark, sf_dir, "orders")
    rfm = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("freq"),
        F.sum("o_totalprice").alias("monetary"),
    )
    scored = rfm.select(
        "o_custkey",
        F.ntile(5).over(Window.orderBy("last_order", "o_custkey")).alias("r"),
        F.ntile(5).over(Window.orderBy("freq", "o_custkey")).alias("f"),
        F.ntile(5).over(Window.orderBy("monetary", "o_custkey")).alias("m"),
    )
    return scored.groupBy("r", "f", "m").agg(F.count("*").alias("n_customers"))


# --- sweep-line interval concurrency -----------------------------------------

@query(
    "q_max_concurrency",
    """
    WITH pts AS (
      SELECT event_type, ts AS t, 1 AS delta FROM events
      UNION ALL
      SELECT event_type, ts + INTERVAL 15 MINUTE, -1 FROM events),
    run AS (
      SELECT event_type,
             SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta) AS cur
      FROM pts)
    SELECT event_type, CAST(MAX(cur) AS BIGINT) AS max_concurrent
    FROM run GROUP BY event_type
    """,
)
def q_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line max concurrency: treat each event as a 15-minute interval
    and find the peak number of simultaneously-open intervals per event
    type — the capacity-planning / concurrent-sessions primitive that a
    naive interval self-join computes in O(n²) and this plan in one sort.
    Each interval becomes a +1/−1 delta point; a running sum ordered by
    (t, delta) — ends before starts on ties, giving half-open [t, t+15)
    semantics — is the live count, and MAX finishes it. One shuffle on
    event_type; peak cardinality is 2× events, all inside codegen.
    """
    ev = load_table(spark, sf_dir, "events")
    starts = ev.select("event_type", F.col("ts").alias("t"), F.lit(1).alias("delta"))
    ends = ev.select(
        "event_type",
        (F.col("ts") + F.expr("INTERVAL 15 MINUTES")).alias("t"),
        F.lit(-1).alias("delta"),
    )
    pts = starts.unionByName(ends)
    w = Window.partitionBy("event_type").orderBy("t", "delta")
    run = pts.select("event_type", F.sum("delta").over(w).alias("cur"))
    return run.groupBy("event_type").agg(F.max("cur").alias("max_concurrent"))


# --- triangle counting on the transition graph -------------------------------

@query(
    "q_triangle_count",
    """
    WITH seq AS (
      SELECT event_type AS u,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS v
      FROM events),
    ed AS (SELECT DISTINCT LEAST(u,v) AS a, GREATEST(u,v) AS b
           FROM seq WHERE v IS NOT NULL AND u != v)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM ed e1
    JOIN ed e2 ON e1.b = e2.a
    JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the undirected event-type transition graph —
    the graph-cohesion metric (clustering coefficient numerator). Edges
    are canonicalized LEAST/GREATEST so each undirected edge exists once
    with a < b; counting ordered wedges a<b<c via two joins then counts
    each triangle exactly once — no ×6 overcount, no post-dedup.

    Scale shape: the wedge join is the quadratic step; on big graphs the
    standard mitigation is degree-ordering (orient edges low-degree →
    high-degree before the wedge join) which this canonical a<b ordering
    approximates; the node-type graph here is small, the *pattern* — a
    distributed multi-way self-join with canonical orientation — is what
    the engine pins.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("u"), F.lead("event_type").over(w).alias("v")
    ).filter(F.col("v").isNotNull() & (F.col("u") != F.col("v")))
    ed = seq.select(
        F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
    ).distinct()
    e1 = ed.alias("e1")
    e2 = ed.alias("e2")
    e3 = ed.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(e3, (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")))
    )
    return tri.agg(F.count("*").alias("n_triangles"))


# --- adjacent-pair counts (one BPE merge step) -------------------------------

@query(
    "q_bpe_pair_step",
    """
    WITH toks AS (
      SELECT list_filter(string_split_regex(text, '\\s+'), t -> t != '') AS l
      FROM documents),
    pairs AS (
      SELECT unnest(l[1:len(l)-1]) AS a, unnest(l[2:len(l)]) AS b
      FROM toks WHERE len(l) >= 2)
    SELECT a, b, CAST(COUNT(*) AS BIGINT) AS freq
    FROM pairs GROUP BY a, b
    ORDER BY freq DESC, a, b LIMIT 20
    """,
)
def q_bpe_pair_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE-training merge step: count adjacent token pairs across the
    corpus and take the top candidates — the inner loop of tokenizer
    training, run here at token (not byte) granularity. The pair stream is
    two aligned slices zipped and exploded; the explode pipelines straight
    into a partial aggregate, so the shuffle carries (pair, partial count)
    — vocabulary², not corpus, sized. Top-k is TakeOrderedAndProject with
    a (a, b) tiebreak. A full BPE trainer is this query in a loop with the
    winning pair folded back into the token stream.
    """
    from hive_json_spark.operators.relational import top_k

    docs = load_table(spark, sf_dir, "documents")
    l = tokens("text")
    pair = F.explode(
        F.arrays_zip(
            F.slice(l, 1, F.size(l) - 1).alias("a"),
            F.slice(l, 2, F.size(l) - 1).alias("b"),
        )
    )
    pairs = docs.filter(F.size(l) >= 2).select(pair.alias("p")).select(
        F.col("p.a").alias("a"), F.col("p.b").alias("b")
    )
    counts = pairs.groupBy("a", "b").agg(F.count("*").alias("freq"))
    return top_k(counts, [F.col("freq").desc(), F.col("a"), F.col("b")], 20)
