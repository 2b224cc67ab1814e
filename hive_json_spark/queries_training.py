"""Training-data assembly operators: the step after cleaning/dedup where a
corpus becomes model input — sequence packing, domain-mixture resampling,
curriculum staging — plus the iterative/sketch operators a 100 TB pipeline
leans on (k-means step, PageRank, mergeable HLL sketches) and the remaining
collection-function surface (map / higher-order / URL packs).

The reference (`/root/reference` hortonworks/hive-json) has no analog for any
of these — its surface ends at schema inference + shredding
(`JsonSchemaFinder.java:227-254`, `JsonShredder.java:92-109`); these rows
extend the engine the way SURVEY §2's "absent from reference" table and the
LLM-pipeline mandate describe.

Scale notes per query live in the docstrings; the common rules:
every sampling decision is a DETERMINISTIC hash of a stable id (never
``rand()``), every argmin/top-k has a total-order tiebreak, and everything
except the declared HOF packs stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from hive_json_spark.functions.text import quality_score, tokens
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


# --- sequence packing --------------------------------------------------------

PACK_BUDGET = 128  # tokens per training sequence

@query(
    "q_sequence_pack",
    f"""
    WITH toks AS (
      SELECT source, doc_id,
             CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x != ''))
                  AS BIGINT) AS n_tok
      FROM documents),
    packed AS (
      SELECT source, doc_id, n_tok,
             CAST(FLOOR((SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id)
                         - n_tok) / {PACK_BUDGET}.0) AS BIGINT) AS seq_id
      FROM toks)
    SELECT source, seq_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS seq_tokens,
           ROUND(SUM(n_tok) / {PACK_BUDGET}.0, 4) AS fill_ratio
    FROM packed GROUP BY source, seq_id
    """,
)
def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assemble documents into fixed-token-budget training
    sequences (contiguous fill in stable doc_id order, documents may straddle
    a boundary — the "concat then chop" packing used for LLM pretraining).

    The bin id is pure window math — a prefix sum of token counts per source,
    floor-divided by the budget — so packing is ONE shuffle on the grouping
    key and never materializes concatenated text. At 100 TB the prefix sum
    partitions by source (or source×shard for monster domains); token counts
    ride inside codegen (split+filter+size), and the output is sequence
    *manifests* (doc spans per sequence), which downstream loaders join back
    to content — the engine never shuffles document bytes to pack them.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(tokens("text")).cast("bigint")
    w = Window.partitionBy("source").orderBy("doc_id")
    packed = docs.select(
        "source",
        "doc_id",
        n_tok.alias("n_tok"),
    ).withColumn(
        "seq_id",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / F.lit(float(PACK_BUDGET))).cast("bigint"),
    )
    return packed.groupBy("source", "seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("seq_tokens"),
        F.round(F.sum("n_tok") / F.lit(float(PACK_BUDGET)), 4).alias("fill_ratio"),
    )


# --- domain-mixture resampling -----------------------------------------------

@query(
    "q_mixture_resample",
    """
    WITH counts AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS c
                    FROM documents GROUP BY lang),
    tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS total,
                   CAST(COUNT(*) AS DOUBLE) AS n_langs FROM counts),
    rates AS (SELECT lang, c,
                     LEAST(1.0, (total / n_langs) / c) AS rate
              FROM counts, tot)
    SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
           ROUND(ANY_VALUE(r.rate), 6) AS rate,
           CAST(ANY_VALUE(r.c) AS BIGINT) AS n_before
    FROM documents d JOIN rates r USING (lang)
    WHERE (d.doc_id * 2654435761) % 4294967296
          < CAST(r.rate * 4294967296 AS BIGINT)
    GROUP BY d.lang
    """,
)
def q_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture resampling: downsample over-represented languages to a
    uniform target mixture (rate_l = min(1, (N/|langs|)/N_l)), keeping rows by
    a deterministic Knuth multiplicative hash of doc_id — re-runs and engine
    swaps select the SAME documents, which a lineage-audited training corpus
    requires.

    Scale shape: the rate table is |langs| rows (an agg over the corpus with
    map-side partial counts, scoped-persisted — its two consumers would
    otherwise each re-scan the corpus), broadcast back — the big table is
    filtered map-side with zero extra shuffles before the final per-lang agg.
    """
    from hive_json_spark.functions.caching import scoped_persist

    docs = load_table(spark, sf_dir, "documents")
    counts = scoped_persist(
        docs.groupBy("lang").agg(F.count("*").cast("bigint").alias("c"))
    )
    tot = counts.agg(
        F.sum("c").cast("double").alias("total"),
        F.count("*").cast("double").alias("n_langs"),
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        "c",
        F.least(F.lit(1.0), (F.col("total") / F.col("n_langs")) / F.col("c")).alias("rate"),
    )
    bucket = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    kept = docs.join(F.broadcast(rates), "lang").filter(
        bucket < (F.col("rate") * F.lit(4294967296.0)).cast("bigint")
    )
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_kept"),
        F.round(F.any_value("rate"), 6).alias("rate"),
        F.any_value("c").cast("bigint").alias("n_before"),
    )


# --- curriculum staging ------------------------------------------------------

@query(
    "q_curriculum_stages",
    """
    WITH t AS (
      SELECT doc_id,
             CAST(len(toks) AS DOUBLE) AS n_tok,
             CAST(len(list_distinct(toks)) AS DOUBLE)
               / greatest(CAST(len(toks) AS DOUBLE), 1.0) AS diversity,
             CAST(len(list_filter(toks, x -> x IN ('the','a','of','and'))) AS DOUBLE)
               / greatest(len(toks), 1) AS stop_ratio
      FROM (SELECT doc_id,
                   list_filter(string_split_regex(text, '\\s+'), t -> t != '') AS toks
            FROM documents)),
    scored AS (
      SELECT doc_id,
             ROUND(greatest(least(
                 0.5 * diversity
                 + 0.5 * (CASE WHEN n_tok BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.5 END)
                 - 0.25 * stop_ratio, 1.0), 0.0), 6) AS score
      FROM t),
    staged AS (
      SELECT doc_id, score,
             ntile(4) OVER (ORDER BY score, doc_id) AS stage
      FROM scored)
    SELECT stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(score), 6) AS avg_score,
           ROUND(MIN(score), 6) AS min_score,
           ROUND(MAX(score), 6) AS max_score
    FROM staged GROUP BY stage
    """,
)
def q_curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum staging: rank the corpus by quality score and cut it into
    4 ordered stages (ntile) — the easy→hard schedule curriculum training
    consumes. Tiebreak on doc_id makes stage assignment a total order.

    Scale note: a global ntile is a single-partition sort — fine for ranking
    *summaries*, wrong for assigning stages to 100 TB of rows. At scale the
    same semantics come from approx quantile cut points (computed with the
    mergeable t-digest/GK sketch, broadcast back) — the per-row stage is then
    a map-side comparison. This query keeps the exact-ntile form because the
    output is the 4-row stage summary, not a per-row label.
    """
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", F.round(quality_score("text"), 6).alias("score")
    )
    staged = scored.withColumn(
        "stage", F.ntile(4).over(Window.orderBy("score", "doc_id"))
    )
    return staged.groupBy("stage").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("score"), 6).alias("avg_score"),
        F.round(F.min("score"), 6).alias("min_score"),
        F.round(F.max("score"), 6).alias("max_score"),
    )


# --- k-means: one full Lloyd iteration over the embedding table --------------

@query(
    "q_embedding_centroids",
    """
    WITH e AS (SELECT label, unnest(embedding) AS x,
                      generate_subscripts(embedding, 1) AS ord
               FROM embeddings),
    c AS (SELECT label, ord, AVG(CAST(x AS DOUBLE)) AS m
          FROM e GROUP BY label, ord),
    n AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs
          FROM embeddings GROUP BY label)
    SELECT c.label, n.n_vecs,
           list(ROUND(m, 6) ORDER BY ord) AS centroid,
           ROUND(SQRT(SUM(m * m)), 6) AS norm
    FROM c JOIN n ON c.label = n.label
    GROUP BY c.label, n.n_vecs
    """,
)
def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding table (the k-means M-step /
    class-prototype computation).

    Spark-first shape: posexplode to (label, dim, x), groupBy(label, dim)
    AVG — the explode is pipelined (never shuffled raw) because the partial
    aggregate collapses each map task to |labels|×|dims| cells before the
    exchange; the final state is k×d doubles regardless of input size. That
    property is exactly what makes this the scale path at 100 TB — the
    alternative (collect vectors per label) is unbounded.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select("label", F.posexplode("embedding").alias("ord", "x"))
    c = ex.groupBy("label", "ord").agg(F.avg(F.col("x").cast("double")).alias("m"))
    n = emb.groupBy("label").agg(F.count("*").alias("n_vecs"))
    cent = c.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ord", "m"))), lambda s: F.round(s.m, 6)
        ).alias("centroid"),
        F.round(F.sqrt(F.sum(F.col("m") * F.col("m"))), 6).alias("norm"),
    )
    return cent.join(F.broadcast(n), "label").select(
        "label", "n_vecs", "centroid", "norm"
    )


LPA_ROUNDS = 3


def _lpa_oracle(rounds: int) -> str:
    head = """
    WITH seq AS (SELECT event_type AS u,
                        LEAD(event_type) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id) AS v
                 FROM events),
    e0 AS (SELECT u, v, CAST(COUNT(*) AS BIGINT) AS w
           FROM seq WHERE v IS NOT NULL GROUP BY u, v),
    und AS (SELECT u, v, CAST(SUM(w) AS BIGINT) AS w
            FROM (SELECT u, v, w FROM e0
                  UNION ALL SELECT v AS u, u AS v, w FROM e0)
            GROUP BY u, v),
    l0 AS (SELECT DISTINCT u AS node, u AS lab FROM und)"""
    steps = []
    for k in range(1, rounds + 1):
        steps.append(f""",
    v{k} AS (SELECT und.v AS node, l{k-1}.lab,
                    CAST(SUM(und.w) AS BIGINT) AS vw
             FROM und JOIN l{k-1} ON l{k-1}.node = und.u
             GROUP BY und.v, l{k-1}.lab),
    l{k} AS (SELECT node, lab FROM
               (SELECT node, lab,
                       ROW_NUMBER() OVER (PARTITION BY node
                                          ORDER BY vw DESC, lab) AS rn
                FROM v{k})
             WHERE rn = 1)"""
        )
    return head + "".join(steps) + f"""
    SELECT node, lab AS community FROM l{rounds}
    """


@query("q_label_propagation", _lpa_oracle(LPA_ROUNDS))
def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (3 rounds)
    over the undirected event-type transition graph — the cheap
    communities-without-modularity pass (Raghavan et al. 2007) used to
    cluster interaction graphs before heavier methods. Deterministic
    variant: synchronous updates, argmax by (vote weight DESC, label
    ASC) — a total order, so the oracle's unrolled CTEs reproduce every
    round exactly.

    Scale shape: edge weights come from one windowed pass + agg (shared
    with q_event_transitions / q_pagerank_events); each round is one
    join + one agg + one bounded argmax window on the label frame
    (|nodes| rows), localCheckpoint()ed so the audited plan equals the
    per-round executed one. At graph scale the label frame co-partitions
    with the edge list on the source key — same loop, no broadcast."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("u"), F.lead("event_type").over(w).alias("v")
    ).filter(F.col("v").isNotNull())
    e0 = seq.groupBy("u", "v").agg(F.count("*").alias("w"))
    und = (
        e0.select("u", "v", "w")
        .unionByName(e0.select(F.col("v").alias("u"), F.col("u").alias("v"), "w"))
        .groupBy("u", "v")
        .agg(F.sum("w").cast("bigint").alias("w"))
        # localCheckpoint, not persist: the edge frame is re-read every
        # LPA round, and checkpoint blocks are reclaimed on GC — persist
        # leaked one cached plan per call across suite/bench re-runs
        .localCheckpoint()
    )
    labels = und.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("lab")
    )
    for _ in range(LPA_ROUNDS):
        votes = (
            und.join(labels, und.u == labels.node)
            .groupBy(F.col("v").alias("node2"), "lab")
            .agg(F.sum("w").cast("bigint").alias("vw"))
        )
        wr = Window.partitionBy("node2").orderBy(F.col("vw").desc(), F.col("lab"))
        labels = (
            votes.withColumn("rn", F.row_number().over(wr))
            .filter(F.col("rn") == 1)
            .select(F.col("node2").alias("node"), "lab")
            .localCheckpoint(eager=True)
        )
    return labels.select("node", F.col("lab").alias("community"))


@query(
    "q_embedding_outliers",
    """
    WITH e AS (SELECT label, unnest(embedding) AS x,
                      generate_subscripts(embedding, 1) AS ord
               FROM embeddings),
    c AS (SELECT label, ord, AVG(CAST(x AS DOUBLE)) AS m
          FROM e GROUP BY label, ord),
    cent AS (SELECT label, list(m ORDER BY ord) AS cv FROM c GROUP BY label),
    scored AS (
      SELECT v.label, v.vec_id,
             ROUND(list_cosine_similarity(CAST(v.embedding AS DOUBLE[]),
                                          cent.cv), 6) AS cos_centroid
      FROM embeddings v JOIN cent USING (label)),
    ranked AS (
      SELECT label, vec_id, cos_centroid,
             CAST(ROW_NUMBER() OVER (PARTITION BY label
                                     ORDER BY cos_centroid, vec_id) AS BIGINT)
               AS rn
      FROM scored)
    SELECT label, vec_id, cos_centroid, rn FROM ranked WHERE rn <= 3
    """,
)
def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-outlier scrub: the 3 vectors per label FURTHEST (lowest
    cosine) from their own class centroid — the "mislabeled or off-topic
    sample" filter run before contrastive training (the complement of
    q_semantic_dedup, which removes the too-close). Ranking is on the
    ROUNDED cosine with a vec_id tiebreak so near-ties cannot flip
    membership across engines or layouts.

    Scale shape: centroids via posexplode + partial-agg (k×d final state,
    the q_embedding_centroids argument), broadcast back; the cosine is a
    per-row map-side fold over the dims; the bottom-k window partitions
    by label with a rank-3 cutoff — never a global sort."""
    from hive_json_spark.functions.vectors import cosine_similarity

    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("ord", "x")
    )
    cent = (
        ex.groupBy("label", "ord")
        .agg(F.avg("x").alias("m"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ord", "m"))), lambda s: s.m
            ).alias("cv")
        )
    )
    scored = emb.join(F.broadcast(cent), "label").select(
        "label",
        "vec_id",
        F.round(
            cosine_similarity(F.col("embedding").cast("array<double>"), F.col("cv")), 6
        ).alias("cos_centroid"),
    )
    w = Window.partitionBy("label").orderBy("cos_centroid", "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select("label", "vec_id", "cos_centroid", "rn")
    )


@query(
    "q_kmeans_assign",
    """
    WITH e AS (SELECT label, unnest(embedding) AS x,
                      generate_subscripts(embedding, 1) AS ord
               FROM embeddings),
    cent AS (SELECT label AS c_label, ord, AVG(CAST(x AS DOUBLE)) AS m
             FROM e GROUP BY label, ord),
    v AS (SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS x,
                 generate_subscripts(embedding, 1) AS ord
          FROM embeddings),
    d AS (SELECT v.vec_id, v.label, cent.c_label,
                 SUM((v.x - cent.m) * (v.x - cent.m)) AS d2
          FROM v JOIN cent ON v.ord = cent.ord
          GROUP BY v.vec_id, v.label, cent.c_label),
    best AS (SELECT vec_id, label, c_label, d2,
                    ROW_NUMBER() OVER (PARTITION BY vec_id
                                       ORDER BY d2, c_label) AS rn
             FROM d)
    SELECT vec_id, label, c_label AS assigned, ROUND(d2, 5) AS d2
    FROM best WHERE rn = 1
    """,
)
def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means E-step: assign every vector to its nearest per-label centroid
    (squared L2, argmin tiebroken by centroid label → deterministic).
    Together with ``q_embedding_centroids`` this is one full Lloyd iteration
    expressed as DataFrame ops.

    Scale shape: centroids are k×d doubles → broadcast; the distance is a
    per-row map-side computation (no shuffle of the vector table), and the
    argmin is a broadcast-side loop, not a window — the window here runs over
    k rows per vector only because the HOF keeps the plan readable at test
    scale. The true 100 TB hot path is the numpy GEMM kernel in
    ``operators/similarity.py`` (‖v−c‖² = ‖v‖² − 2v·c + ‖c‖² batched per
    Arrow chunk); this query pins the exact semantics that kernel must match.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    ex = emb.select("label", F.posexplode(F.col("embedding").cast("array<double>")).alias("ord", "x"))
    cent = (
        ex.groupBy("label", "ord")
        .agg(F.avg("x").alias("m"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ord", "m"))), lambda s: s.m
            ).alias("c")
        )
        .select(F.col("label").alias("c_label"), "c")
    )
    d2 = F.aggregate(
        F.zip_with("v", "c", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = vecs.join(F.broadcast(cent)).select(
        "vec_id", "label", "c_label", d2.alias("d2")
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "c_label")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", F.col("c_label").alias("assigned"), F.round("d2", 5).alias("d2"))
    )


# --- PageRank over the event-transition graph --------------------------------

PR_ITERS = 3
PR_DAMP = 0.85

def _pagerank_oracle(iters: int) -> str:
    head = """
    WITH seq AS (
      SELECT event_type AS u,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS v
      FROM events),
    edges AS (SELECT u, v, CAST(COUNT(*) AS DOUBLE) AS w
              FROM seq WHERE v IS NOT NULL GROUP BY u, v),
    nodes AS (SELECT DISTINCT u AS node FROM edges
              UNION SELECT DISTINCT v FROM edges),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    p AS (SELECT u, v, w / SUM(w) OVER (PARTITION BY u) AS p FROM edges),
    r0 AS (SELECT node, 1.0 / nn.n AS pr FROM nodes, nn)"""
    steps = []
    for k in range(1, iters + 1):
        steps.append(f"""
    r{k} AS (SELECT n2.node, 0.15 / nn.n + 0.85 * COALESCE(SUM(r{k-1}.pr * p.p), 0) AS pr
            FROM nodes n2 CROSS JOIN nn
            LEFT JOIN p ON p.v = n2.node
            LEFT JOIN r{k-1} ON r{k-1}.node = p.u
            GROUP BY n2.node, nn.n)""")
    return head + "," + ",".join(steps) + f"""
    SELECT node, ROUND(pr, 6) AS pr FROM r{iters}
    """

@query("q_pagerank_events", _pagerank_oracle(PR_ITERS))
def q_pagerank_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 3 synchronous iterations, uniform init) over
    the event-type transition graph — the "which state dominates user flows"
    ranking. The oracle unrolls the same 3 iterations as chained CTEs, so
    this pins an *iterative* DataFrame algorithm to an exact SQL fixpoint.

    Scale shape: edge weights come from one windowed pass + agg (the same
    shuffle q_event_transitions pays); the iteration loop joins the rank
    vector to the transition matrix — rank is |nodes| rows, broadcast; each
    step is one shuffle on the destination key. For graphs too big to
    broadcast the same loop co-partitions p and ranks on u (documented in
    SCALE.md). The rank frame is localCheckpoint()ed each round (the BFS
    lesson): with pure lineage the persisted p/nodes subplans embed once
    per round and the STATIC plan audit counted 48 shuffles for 3 rounds;
    checkpointing makes the audited plan equal the executed one (per-round
    truth) at the cost of one tiny eager materialization per iteration.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("u"), F.lead("event_type").over(w).alias("v")
    ).filter(F.col("v").isNotNull())
    edges = seq.groupBy("u", "v").agg(F.count("*").cast("double").alias("w"))
    nodes = edges.select(F.col("u").alias("node")).union(
        edges.select("v")
    ).distinct()
    p = edges.select(
        "u", "v", (F.col("w") / F.sum("w").over(Window.partitionBy("u"))).alias("p")
    )
    # tiny frames referenced each iteration: persist once
    nodes = nodes.persist()
    p = p.persist()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return spark.range(0).select(
            F.lit("").alias("node"), F.lit(0.0).alias("pr")
        )
    n = float(n_nodes)
    ranks = nodes.select("node", (F.lit(1.0) / F.lit(n)).alias("pr"))
    for _ in range(PR_ITERS):
        contrib = (
            p.join(ranks, p.u == ranks.node)
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum(F.col("pr") * F.col("p")).alias("c"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (F.lit(0.15) / F.lit(n) + F.lit(PR_DAMP) * F.coalesce("c", F.lit(0.0))).alias("pr"),
        ).localCheckpoint(eager=True)
    return ranks.select("node", F.round("pr", 6).alias("pr"))


# --- BFS shortest-hop distance over the transition graph ---------------------

BFS_ITERS = 6  # ≥ graph diameter (|event types| is small and fixed)
BFS_SRC = "signup"
_BFS_INF = 999


def _bfs_oracle(iters: int) -> str:
    head = f"""
    WITH seq AS (
      SELECT event_type AS u,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS v
      FROM events),
    edges AS (SELECT DISTINCT u, v FROM seq WHERE v IS NOT NULL),
    nodes AS (SELECT DISTINCT u AS node FROM edges
              UNION SELECT DISTINCT v FROM edges),
    d0 AS (SELECT node, CASE WHEN node = '{BFS_SRC}' THEN 0 ELSE {_BFS_INF} END AS d
           FROM nodes)"""
    steps = []
    for k in range(1, iters + 1):
        steps.append(f"""
    d{k} AS (
      SELECT n.node, LEAST(p.d, COALESCE(MIN(q.d + 1), {_BFS_INF})) AS d
      FROM nodes n
      JOIN d{k - 1} p ON p.node = n.node
      LEFT JOIN edges e ON e.v = n.node
      LEFT JOIN d{k - 1} q ON q.node = e.u
      GROUP BY n.node, p.d)""")
    return head + "," + ",".join(steps) + f"""
    SELECT node,
           CAST(CASE WHEN d >= {_BFS_INF} THEN NULL ELSE d END AS BIGINT) AS hops
    FROM d{iters}
    """


@query("q_bfs_hops", _bfs_oracle(BFS_ITERS))
def q_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop distance from the BFS_SRC ('signup') state over the
    event-type transition graph — the reachability/radius primitive behind
    "how many steps from signup to purchase" flow questions, and the
    second iterative fixpoint pinned to an unrolled-CTE oracle (PageRank
    is the weighted one; this is the Bellman-Ford relaxation d' = min(d,
    min_incoming(d_u + 1)) with unreachable = NULL).

    All-integer state → no float accumulation anywhere, so the fixpoint
    is exactly engine-portable. Scale shape: edges come from the one
    windowed pass every transition query pays, pre-aggregated to the
    |types|² distinct-edge frame; each of the BFS_ITERS rounds is one
    join + min-agg on that tiny frame. The loop localCheckpoints the
    distance vector every round (the q_dedup_clusters mechanism): dist
    feeds both the relaxation AND the carry join, so pure lineage doubles
    the plan per round — 2⁶ copies of the base scan by round 6, measured
    15.4 s → 1.9 s at sf0.1 for the checkpointed loop. At billion-node
    scale the same loop co-partitions dist and edges on the node key.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("u"), F.lead("event_type").over(w).alias("v")
    ).filter(F.col("v").isNotNull())
    edges = seq.distinct().persist()
    nodes = edges.select(F.col("u").alias("node")).union(
        edges.select("v")
    ).distinct()
    dist = nodes.select(
        "node",
        F.when(F.col("node") == BFS_SRC, 0).otherwise(_BFS_INF).alias("d"),
    ).localCheckpoint()
    for _ in range(BFS_ITERS):
        relax = (
            edges.join(dist, edges.u == dist.node)
            .groupBy(F.col("v").alias("node"))
            .agg(F.min(F.col("d") + 1).alias("dr"))
        )
        dist = (
            dist.join(relax, "node", "left")
            .select(
                "node",
                F.least(F.col("d"), F.coalesce("dr", F.lit(_BFS_INF))).alias("d"),
            )
            .localCheckpoint()
        )
    return dist.select(
        "node",
        F.when(F.col("d") >= _BFS_INF, F.lit(None))
        .otherwise(F.col("d"))
        .cast("bigint")
        .alias("hops"),
    )


# --- Markov absorption probability (attribution) -----------------------------

MK_STEPS = 4
MK_TARGET = "purchase"
_MK_UNIT = 10**12  # micro-unit scale for the per-step probability fold


def _markov_oracle(steps: int) -> str:
    head = f"""
    WITH seq AS (
      SELECT event_type AS u,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS v
      FROM events),
    edges AS (SELECT u, v, CAST(COUNT(*) AS BIGINT) AS c
              FROM seq WHERE v IS NOT NULL GROUP BY u, v),
    nodes AS (SELECT DISTINCT u AS node FROM edges
              UNION SELECT DISTINCT v FROM edges),
    p AS (SELECT u, v, CAST(c AS DOUBLE) / SUM(c) OVER (PARTITION BY u) AS p
          FROM edges),
    a0 AS (SELECT node, CASE WHEN node = '{MK_TARGET}'
                             THEN CAST({_MK_UNIT} AS BIGINT)
                             ELSE CAST(0 AS BIGINT) END AS a
           FROM nodes)"""
    steps_sql = []
    for k in range(1, steps + 1):
        steps_sql.append(f"""
    a{k} AS (
      SELECT n.node,
             CASE WHEN n.node = '{MK_TARGET}' THEN CAST({_MK_UNIT} AS BIGINT)
                  ELSE COALESCE(CAST(SUM(CAST(ROUND(p.p * q.a) AS BIGINT)) AS BIGINT), 0)
             END AS a
      FROM nodes n
      LEFT JOIN p ON p.u = n.node
      LEFT JOIN a{k - 1} q ON q.node = p.v
      GROUP BY n.node)""")
    return head + "," + ",".join(steps_sql) + f"""
    SELECT node, ROUND(a / {_MK_UNIT}.0, 6) AS absorb_prob
    FROM a{steps}
    """


@query("q_markov_absorption", _markov_oracle(MK_STEPS))
def q_markov_absorption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain absorption probability: chance a user starting in each
    state reaches MK_TARGET ('purchase') within MK_STEPS transitions,
    with the target absorbing — the quantity behind Markov (removal-
    effect) attribution and "how convertible is this entry state"
    triage. Third iterative fixpoint pinned to an unrolled-CTE oracle
    (PageRank: weighted push; BFS: integer min-relax; this: probability
    fold with an absorbing boundary).

    Determinism: the k-step value lives in integer micro-units (1e-12).
    Each step computes Σ_v p(s→v)·a(v) by rounding every TERM to a long
    before the sum (the BM25 rule) — transition probabilities are exact
    single divisions of bigint counts, so both engines produce the
    identical double term, the same rounded long, and an order-free
    exact sum; the absorbing state is pinned to exactly 1.0. Scale
    shape: identical to PageRank — the |types|² probability matrix and
    the rank vector are tiny aggregates of one windowed pass; each step
    is one join + agg, pure lineage at this depth."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("u"), F.lead("event_type").over(w).alias("v")
    ).filter(F.col("v").isNotNull())
    # checkpoint the tiny |types|² edge frame ONCE: nodes, p, and every
    # iteration's plan all hang off it — without the truncation the
    # windowed corpus pass embeds (and re-executes) once per consumer
    edges = seq.groupBy("u", "v").agg(F.count("*").alias("c")).localCheckpoint()
    nodes = (
        edges.select(F.col("u").alias("node")).union(edges.select("v")).distinct()
    )
    p = edges.select(
        "u",
        "v",
        (F.col("c").cast("double") / F.sum("c").over(Window.partitionBy("u"))).alias("p"),
    )
    unit = F.lit(_MK_UNIT).cast("bigint")
    a = nodes.select(
        "node",
        F.when(F.col("node") == MK_TARGET, unit).otherwise(F.lit(0).cast("bigint")).alias("a"),
    )
    for _ in range(MK_STEPS):
        folded = (
            p.join(a, p.v == a.node)
            .groupBy(F.col("u").alias("node"))
            .agg(F.sum(F.round(F.col("p") * F.col("a")).cast("bigint")).alias("fa"))
        )
        a = nodes.join(folded, "node", "left").select(
            "node",
            F.when(F.col("node") == MK_TARGET, unit)
            .otherwise(F.coalesce("fa", F.lit(0)).cast("bigint"))
            .alias("a"),
        )
    return a.select(
        "node", F.round(F.col("a") / float(_MK_UNIT), 6).alias("absorb_prob")
    )


# --- mergeable HLL sketches (datasketches) -----------------------------------

@query(
    "q_hll_sketch",
    """
    SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT text) AS BIGINT) AS exact_distinct_texts,
           true AS est_within_5pct
    FROM documents
    """,
)
def q_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed-mergeable distinct counting with Apache DataSketches HLL:
    build one sketch per source partition (hll_sketch_agg), then merge the
    sketches (hll_union_agg) and estimate — the pattern that lets a 100 TB
    pipeline maintain per-shard distinct counts and roll them up WITHOUT
    re-scanning data (sketches are tiny, unions are associative).

    The estimate itself is implementation-defined, so the graded row is
    the acceptance verdict: exact source/row/distinct-text counts
    (recomputed independently by the DuckDB oracle) plus whether the
    merged-sketch estimate lands within 5% of exact (lgK=12 → ~1.6%
    relative standard error; measured 0.8% at both grading scales). The
    exact distinct count here is the harness's one-off check — the
    production pattern stays sketch-only."""
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.hll_sketch_agg(F.col("text"), F.lit(12)).alias("sk"),
        F.count("*").alias("n_rows"),
    )
    est = per_src.agg(
        F.count("*").cast("bigint").alias("n_sources"),
        F.sum("n_rows").cast("bigint").alias("nr"),
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sk"), F.lit(False)))
        .cast("bigint")
        .alias("est"),
    )
    exact = docs.agg(F.count_distinct("text").alias("exact"))
    return est.crossJoin(exact).select(
        "n_sources",
        F.coalesce("nr", F.lit(0)).cast("bigint").alias("n_rows"),
        F.col("exact").cast("bigint").alias("exact_distinct_texts"),
        (
            F.abs(F.coalesce("est", F.lit(0)) - F.col("exact"))
            <= 0.05 * F.greatest(F.col("exact"), F.lit(1))
        ).alias("est_within_5pct"),
    )


@query(
    "q_hll_intersect",
    """
    WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
    sz AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
           FROM du GROUP BY event_type),
    ix AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                  CAST(COUNT(*) AS BIGINT) AS exact_intersect
           FROM du a JOIN du b USING (user_id)
           WHERE a.event_type < b.event_type
           GROUP BY 1, 2)
    SELECT ix.type_a, ix.type_b,
           sa.n AS exact_a, sb.n AS exact_b,
           CAST(sa.n + sb.n - ix.exact_intersect AS BIGINT) AS exact_union,
           ix.exact_intersect,
           true AS est_within_tol
    FROM ix JOIN sz sa ON sa.event_type = ix.type_a
            JOIN sz sb ON sb.event_type = ix.type_b
    """,
)
def q_hll_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation from sketches alone: per event type,
    one HLL sketch of its user set; pairwise overlap via
    inclusion-exclusion (|A ∩ B| = est(A) + est(B) − est(A ∪ B)) on the
    MERGED sketch — no re-scan, no join of the raw streams. This is how a
    100 TB pipeline answers "how many users did both X and Y" from
    KB-sized per-segment state maintained incrementally; the raw-stream
    alternative is a distinct-shuffle of every (user, type) pair.

    Estimates are implementation-defined, so the graded rows carry the
    EXACT overlap numbers (one distinct + one self-join, independently
    recomputed by the DuckDB oracle) plus a verdict that the
    inclusion-exclusion estimate lands within 5% of the exact union + 10
    (error compounds three lgK=12 sketches; measured worst 3.1% of the
    exact intersection at sf0.1). The exact side is the harness's
    one-off check — the production pattern stays sketch-only.

    One events scan total (r8): the distinct (type, user) frame is
    scoped-persisted and feeds all four consumers — the sketches build
    FROM it (HLL insertion is idempotent, so sketching the deduped pairs
    yields identical sketches to sketching the raw stream), the per-type
    sizes, and both sides of the exact self-join. The previous form
    re-evaluated per_type twice and du three times: 6 corpus passes."""
    from hive_json_spark.functions.caching import scoped_persist

    ev = load_table(spark, sf_dir, "events")
    du = scoped_persist(ev.select("event_type", "user_id").distinct())
    per_type = du.groupBy("event_type").agg(
        F.hll_sketch_agg(F.col("user_id").cast("string"), F.lit(12)).alias("sk"),
    )
    a, b = per_type.alias("a"), per_type.alias("b")
    ests = a.join(b, F.col("a.event_type") < F.col("b.event_type")).select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        F.greatest(
            F.lit(0).cast("bigint"),
            (
                F.hll_sketch_estimate("a.sk")
                + F.hll_sketch_estimate("b.sk")
                - F.hll_sketch_estimate(F.hll_union("a.sk", "b.sk"))
            ).cast("bigint"),
        ).alias("est_intersect"),
    )
    sz = du.groupBy("event_type").agg(F.count("*").alias("n"))
    ix = (
        du.alias("x")
        .join(du.alias("y"), "user_id")
        .filter(F.col("x.event_type") < F.col("y.event_type"))
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("exact_intersect"))
    )
    exact = (
        ix.join(
            F.broadcast(sz.select(F.col("event_type").alias("type_a"), F.col("n").alias("na"))),
            "type_a",
        )
        .join(
            F.broadcast(sz.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb"))),
            "type_b",
        )
    )
    return exact.join(F.broadcast(ests), ["type_a", "type_b"]).select(
        "type_a",
        "type_b",
        F.col("na").cast("bigint").alias("exact_a"),
        F.col("nb").cast("bigint").alias("exact_b"),
        (F.col("na") + F.col("nb") - F.col("exact_intersect"))
        .cast("bigint")
        .alias("exact_union"),
        F.col("exact_intersect").cast("bigint"),
        (
            F.abs(F.col("est_intersect") - F.col("exact_intersect"))
            <= 0.05 * (F.col("na") + F.col("nb") - F.col("exact_intersect")) + 10
        ).alias("est_within_tol"),
    )


# --- collection-function surface: maps, HOFs, URLs ---------------------------

@query(
    "q_map_pack",
    """
    WITH lc AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS cnt
                FROM documents GROUP BY source, lang)
    SELECT source,
           array_to_string(list_sort(list(lang)), ',') AS langs,
           CAST(SUM(cnt) AS BIGINT) AS total_docs,
           CAST(len(list_filter(list(cnt), c -> c >= 5)) AS BIGINT) AS n_major_langs,
           CAST(COALESCE(MAX(CASE WHEN lang = 'en' THEN cnt END), 0) AS BIGINT) AS en_docs,
           CAST(MAX(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BOOLEAN) AS has_en
    FROM lc GROUP BY source
    """,
)
def q_map_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: build a lang→count map per source
    (map_from_entries), then interrogate it with map_keys / map_values /
    map_filter / element_at / map_contains_key. The oracle computes the same
    facts relationally — the check pins map SEMANTICS (the engine's map ops
    must agree with the flat answer), not map encoding.

    All map HOFs run post-aggregation on |sources|×|langs| rows — at scale
    the only heavy step is the first partial-agg count.
    """
    docs = load_table(spark, sf_dir, "documents")
    lc = docs.groupBy("source", "lang").agg(F.count("*").alias("cnt"))
    m = lc.groupBy("source").agg(
        F.map_from_entries(F.array_sort(F.collect_list(F.struct("lang", "cnt")))).alias("m")
    )
    return m.select(
        "source",
        F.array_join(F.array_sort(F.map_keys("m")), ",").alias("langs"),
        F.aggregate(F.map_values("m"), F.lit(0).cast("bigint"), lambda a, x: a + x).alias("total_docs"),
        F.size(F.map_filter("m", lambda k, v: v >= 5)).cast("bigint").alias("n_major_langs"),
        F.coalesce(F.element_at("m", F.lit("en")), F.lit(0)).cast("bigint").alias("en_docs"),
        F.map_contains_key("m", F.lit("en")).alias("has_en"),
    )


@query(
    "q_hof_pack",
    """
    WITH t AS (SELECT doc_id,
                      list_filter(string_split_regex(text, '\\s+'), x -> x != '') AS toks
               FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tok,
           CAST(len(list_filter(toks, x -> length(x) >= 6)) AS BIGINT) AS n_long,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS total_chars,
           len(list_filter(toks, x -> x = 'spark')) > 0 AS has_spark,
           list_aggregate(toks, 'min') AS first_alpha,
           CASE WHEN len(toks) > 0
                THEN toks[1] || '|' || list_reverse(toks)[1] ELSE NULL END AS ends
    FROM t
    """,
)
def q_hof_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order-function surface over token arrays: transform / filter /
    exists / aggregate / array_min / zip_with — the lambda-expression layer a
    JSON-heavy corpus leans on for in-place array work (no explode, no
    shuffle: every column here is per-row).

    Scale note: Spark HOFs are interpreted (CodegenFallback) — fine for
    per-row array math, but hot loops belong in Arrow kernels
    (see SCALE.md "expression strategy"); this query pins semantics.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    t = docs.select("doc_id", toks.alias("toks"))
    zipped = F.zip_with(
        "toks",
        F.reverse(F.col("toks")),
        lambda a, b: F.concat(a, F.lit("|"), b),
    )
    return t.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tok"),
        F.size(F.filter("toks", lambda x: F.length(x) >= 6)).cast("bigint").alias("n_long"),
        F.aggregate("toks", F.lit(0).cast("bigint"), lambda a, x: a + F.length(x).cast("bigint")).alias("total_chars"),
        F.exists("toks", lambda x: x == F.lit("spark")).alias("has_spark"),
        F.array_min("toks").alias("first_alpha"),
        F.when(F.size("toks") > 0, F.element_at(zipped, 1)).alias("ends"),
    )


@query(
    "q_url_pack",
    """
    WITH u AS (
      SELECT doc_id, lang,
             'https://' || source || '.example.com/docs/' || doc_id
               || '?lang=' || lang || '&q=1' AS url
      FROM documents)
    SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS host,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(COUNT(DISTINCT regexp_extract(url, '^https?://[^/]+(/[^?#]*)', 1))
                AS BIGINT) AS n_paths,
           CAST(SUM(CASE WHEN regexp_extract(url, '[?&]lang=([^&#]*)', 1) = 'en'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
           MIN(regexp_extract(url, '^([a-z]+)://', 1)) AS protocol
    FROM u GROUP BY host
    """,
)
def q_url_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing surface (parse_url HOST/PATH/QUERY-param/PROTOCOL) over
    synthesized per-doc URLs — the host-level rollup a web-corpus pipeline
    runs for domain filtering and robots/quality lists. The oracle parses the
    same URLs with regexes, pinning parse_url's component semantics.

    parse_url is a JVM intrinsic — the whole query is one codegen stage plus
    the per-host agg; at 100 TB hosts are the natural partition key (skewed
    hosts → AQE skew split or salting).
    """
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"), F.lit("&q=1"),
    )
    u = docs.select("doc_id", "lang", url.alias("url"))
    return u.groupBy(F.parse_url("url", F.lit("HOST")).alias("host")).agg(
        F.count("*").alias("n_urls"),
        F.count_distinct(F.parse_url("url", F.lit("PATH"))).alias("n_paths"),
        F.sum(
            F.when(F.parse_url("url", F.lit("QUERY"), F.lit("lang")) == "en", 1).otherwise(0)
        ).cast("bigint").alias("n_en"),
        F.min(F.parse_url("url", F.lit("PROTOCOL"))).alias("protocol"),
    )


@query(
    "q_epoch_shuffle",
    """
    WITH keyed AS (
      SELECT doc_id,
             CAST((doc_id * 2654435761) % 4294967296 AS BIGINT) AS h
      FROM documents)
    SELECT doc_id,
           CAST(h % 16 AS BIGINT) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY h % 16 ORDER BY h, doc_id)
                AS BIGINT) AS pos
    FROM keyed
    """,
)
def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle: assign every document a pseudo-random
    but reproducible training order — Knuth multiplicative hash as the
    sort key, 16 shards so each data-loader worker reads one shard
    sequentially. The manifest (doc_id, shard, pos) IS the epoch plan;
    vary the multiplier/offset per epoch for fresh orders.

    Never rand(): the hash is a pure function of doc_id, so task retries,
    partition count, and engine all agree (the same determinism stance as
    every sampler in this module). Multiplier fits 64-bit exactly for
    doc_id < 2^31 (doc_id * 2654435761 < 2^63); shard-local position is a
    ROW_NUMBER over a total order with doc_id tiebreak.

    Scale shape: one hash projection in codegen + one shuffle on shard +
    per-shard window sort — the same cost as writing the epoch out
    range-partitioned. At 100 TB the window sorts ~1/16 of the corpus per
    task-group; raise shard count with cluster size (shards are the
    data-parallel read unit downstream).
    """
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        ((F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296))
        .cast("bigint")
        .alias("h"),
    )
    w = Window.partitionBy(F.col("h") % 16).orderBy("h", "doc_id")
    return keyed.select(
        "doc_id",
        (F.col("h") % 16).cast("bigint").alias("shard"),
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


@query(
    "q_power_iteration",
    """
    WITH s AS (
      SELECT vec_id, embedding,
             list_reduce(list_transform(embedding, e -> CAST(e AS DOUBLE) * 0.125),
                         (a, b) -> a + b) AS s
      FROM embeddings),
    t AS (
      SELECT generate_subscripts(embedding, 1) - 1 AS dim,
             CAST(ROUND(1000000 * (CAST(unnest(embedding) AS DOUBLE) * s))
                  AS BIGINT) AS term
      FROM s)
    SELECT CAST(dim AS BIGINT) AS dim,
           ROUND(SUM(term) / 1000000.0, 6) AS gram_v
    FROM t GROUP BY dim
    """,
)
def q_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One distributed power-iteration step for the corpus's dominant
    principal direction: v1 = X'(X v0) with v0 = (1/8, ..., 1/8) — the
    building block of PCA / spectral embedding quality audits, computed
    WITHOUT ever materializing the d x d Gram matrix or shuffling raw
    vectors: the per-row scalar s = x.v0 rides the scan, and the explode
    collapses to d partial sums per map task before the one tiny exchange
    (reducer state is d cells regardless of corpus size — the same
    bounded-state property as the centroid M-step above).

    Determinism: v0 = 0.125 is an exact binary fraction; the per-row dot
    product folds left-to-right identically in both engines (F.aggregate
    vs list_reduce); each (row, dim) contribution x_j * s is rounded to
    integer micro-units per row and long-summed (the SCALE.md rule), so
    partitioning/engine cannot reorder a double sum. Iterating = feeding
    the normalized output back as the next v0 — each step is this same
    one-scan query.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    s = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + x * F.lit(0.125),
    )
    ex = emb.select(s.alias("s"), F.posexplode("embedding").alias("dim", "x"))
    term = F.round(F.lit(1000000) * (F.col("x") * F.col("s"))).cast("long")
    return ex.groupBy(F.col("dim").cast("bigint").alias("dim")).agg(
        F.round(F.sum(term) / F.lit(1000000.0), 6).alias("gram_v")
    )


@query(
    "q_semantic_dedup",
    """
    WITH e AS (
      SELECT label, vec_id,
             list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb
      FROM embeddings),
    c AS (
      SELECT label, ord, AVG(x) AS m
      FROM (SELECT label, unnest(emb) AS x,
                   generate_subscripts(emb, 1) AS ord FROM e)
      GROUP BY label, ord),
    cent AS (SELECT label, list(m ORDER BY ord) AS centroid FROM c GROUP BY label),
    d AS (
      SELECT e.label, e.vec_id,
             CAST(ROUND(1000000 * list_reduce(
                    list_transform(range(1, len(e.emb) + 1),
                                   i -> (e.emb[i] - cent.centroid[i])
                                        * (e.emb[i] - cent.centroid[i])),
                    (a, b) -> a + b)) AS BIGINT) AS d2u
      FROM e JOIN cent USING (label)),
    best AS (
      SELECT label, vec_id, d2u,
             ROW_NUMBER() OVER (PARTITION BY label ORDER BY d2u, vec_id) AS rn,
             COUNT(*) OVER (PARTITION BY label) AS n_members
      FROM d)
    SELECT label, vec_id AS keeper_id,
           ROUND(d2u / 1000000.0, 6) AS dist2,
           CAST(n_members AS BIGINT) AS n_members
    FROM best WHERE rn = 1
    """,
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-space) dedup, keep-one-per-cluster: for every
    label cluster, keep the member closest to the cluster centroid (the
    SemDeDup-style representative election — labels here stand in for the
    k-means assignment produced by q_kmeans_assign). Output is the keeper
    manifest with cluster sizes.

    Scale shape: centroids are a k x d partial aggregate (bounded reducer
    state, the q_embedding_centroids plan) broadcast back; each member
    computes its squared distance map-side with a FIXED left-fold over
    dims (F.aggregate / list_reduce — same order both engines), rounded
    to integer micro-units per row so the argmin ranks exact longs; the
    election is one window partitioned by label. No pairwise distances
    anywhere — O(n·d + k·d), the property that lets semantic dedup run
    at corpus scale where near-dup pair enumeration cannot.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    ex = emb.select("label", F.posexplode("emb").alias("ord", "x"))
    cent = (
        ex.groupBy("label", "ord")
        .agg(F.avg("x").alias("m"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ord", "m"))), lambda s: s.m
            ).alias("centroid")
        )
    )
    joined = emb.join(F.broadcast(cent), "label")
    diff2 = F.zip_with("emb", "centroid", lambda a, b: (a - b) * (a - b))
    d2 = F.aggregate(diff2, F.lit(0.0), lambda acc, v: acc + v)
    d2u = F.round(F.lit(1000000) * d2).cast("bigint")
    w = Window.partitionBy("label").orderBy("d2u", "vec_id")
    ranked = joined.select("label", "vec_id", d2u.alias("d2u")).select(
        "label",
        "vec_id",
        "d2u",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("label")).alias("n_members"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "label",
        F.col("vec_id").alias("keeper_id"),
        F.round(F.col("d2u") / F.lit(1000000.0), 6).alias("dist2"),
        F.col("n_members").cast("bigint").alias("n_members"),
    )


# --- full Lloyd's k-means (iterative, integer lattice) -----------------------

KM_ITERS = 3
KM_K = 4
_KM_SCALE = 64        # float -> lattice: xq = round(x * 64)
_KM_UNIT = 1_000_000  # lattice -> centroid micro-units


def _kmeans_oracle(iters: int) -> str:
    head = f"""
    WITH xq AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS ord,
             CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * {_KM_SCALE}) AS BIGINT) AS xu
      FROM embeddings),
    c0 AS (
      SELECT vec_id AS cid, ord, xu * {_KM_UNIT} AS cu
      FROM xq WHERE vec_id < {KM_K})"""
    steps = []
    for k in range(1, iters + 1):
        steps.append(f"""
    a{k} AS (
      SELECT vec_id, cid FROM (
        SELECT x.vec_id, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY x.vec_id
                 ORDER BY SUM((x.xu * {_KM_UNIT} - c.cu) * (x.xu * {_KM_UNIT} - c.cu)),
                          c.cid) AS rn
        FROM xq x JOIN c{k - 1} c ON x.ord = c.ord
        GROUP BY x.vec_id, c.cid)
      WHERE rn = 1),
    c{k} AS (
      SELECT a.cid, x.ord,
             CAST(ROUND({_KM_UNIT}.0 * AVG(x.xu)) AS BIGINT) AS cu
      FROM a{k} a JOIN xq x ON a.vec_id = x.vec_id
      GROUP BY a.cid, x.ord)""")
    last = iters
    return head + "," + ",".join(steps) + f"""
    SELECT a.cid,
           CAST(COUNT(DISTINCT a.vec_id) AS BIGINT) AS n_assigned,
           CAST((SELECT SUM(c.cu) FROM c{last} c WHERE c.cid = a.cid) AS BIGINT)
             AS cent_checksum
    FROM a{last} a GROUP BY a.cid
    """


@query("q_kmeans_lloyd", _kmeans_oracle(KM_ITERS))
def q_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL Lloyd's k-means — k=4, 3 assignment+update rounds, seeded
    from vectors 0..3 — not just the single E-step of q_kmeans_assign.
    The fourth iterative fixpoint pinned to an unrolled-CTE oracle
    (PageRank / BFS / Markov absorption are the graph trio; this is the
    clustering loop every embedding pipeline runs).

    Determinism across engines AND iterations: floats quantize ONCE onto
    an integer lattice (round(x·64)); every distance is an exact long
    (Σ(xu·1e6 − cu)², bounded < 2⁶³), every argmin ties on centroid id,
    and each M-step re-quantizes the mean to integer micro-units with a
    single correctly-rounded operation — so no float accumulates across
    rounds and the 3-deep recurrence cannot diverge by an ulp (the
    un-quantized version WOULD: an argmin flip in round 1 cascades).

    Scale shape: assignments broadcast the k×d centroid frame and fold
    distances in codegen (zip_with+aggregate, no explode of the vector
    side); the M-step is the posexplode partial-agg whose reducer state
    is k×d cells regardless of corpus size (q_embedding_centroids
    mechanics); each round localCheckpoints the k×d centroid frame so
    the plan stays linear in rounds. r10 trim (guide §1.2 fixed cost):
    the per-round ASSIGNMENT checkpoint is gone — each round's
    assignment has exactly one consumer (that round's M-step; the final
    round's feeds the count agg), so pinning it bought nothing and cost
    a corpus-sized materialization plus a blocking job per round. Only
    the k×d centroid frame (the thing two expressions per round actually
    reuse, and whose checkpoint keeps the lineage flat) stays pinned.
    Every number is exact-integer, so the recomputed assignment in the
    final count is bit-identical to the one the M-step consumed."""
    emb = load_table(spark, sf_dir, "embeddings")
    xq = emb.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double") * _KM_SCALE).cast("long"),
        ).alias("xu"),
    ).localCheckpoint()
    cent = (
        xq.filter(F.col("vec_id") < KM_K)
        .select(
            F.col("vec_id").alias("cid"),
            F.transform(F.col("xu"), lambda v: v * _KM_UNIT).alias("cu"),
        )
        .localCheckpoint()
    )
    assigned = None
    for _ in range(KM_ITERS):
        d2 = F.aggregate(
            F.zip_with(
                "xu", "cu", lambda x, c: (x * _KM_UNIT - c) * (x * _KM_UNIT - c)
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        w = Window.partitionBy("vec_id").orderBy("d2", "cid")
        assigned = (
            xq.join(F.broadcast(cent))
            .select("vec_id", "xu", "cid", d2.alias("d2"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "xu", "cid")
        )
        cent = (
            assigned.select("cid", F.posexplode("xu").alias("ord", "x"))
            .groupBy("cid", "ord")
            .agg(
                F.round(F.lit(float(_KM_UNIT)) * F.avg("x")).cast("long").alias("cu")
            )
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ord", "cu"))),
                    lambda s: s.cu,
                ).alias("cu")
            )
            .localCheckpoint()
        )
    checksum = cent.select(
        "cid",
        F.aggregate("cu", F.lit(0).cast("long"), lambda a, v: a + v).alias(
            "cent_checksum"
        ),
    )
    counts = assigned.groupBy("cid").agg(
        F.countDistinct("vec_id").alias("n_assigned")
    )
    return counts.join(checksum, "cid").select(
        "cid", "n_assigned", F.col("cent_checksum").cast("bigint").alias("cent_checksum")
    )


# --- deterministic negative sampling (contrastive pairs) ---------------------

@query(
    "q_negative_sampling",
    """
    WITH pool AS (SELECT vec_id AS nid, label AS nlabel
                  FROM embeddings WHERE vec_id < 32),
    cand AS (
      SELECT e.vec_id AS anchor_id, p.nid,
             md5(CAST(e.vec_id AS VARCHAR) || ':' || CAST(p.nid AS VARCHAR)) AS h
      FROM embeddings e JOIN pool p
        ON e.label != p.nlabel AND e.vec_id != p.nid),
    r AS (SELECT anchor_id, nid,
                 ROW_NUMBER() OVER (PARTITION BY anchor_id ORDER BY h, nid) AS rk
          FROM cand)
    SELECT anchor_id, CAST(rk AS INT) AS neg_rank, nid AS negative_id
    FROM r WHERE rk <= 2
    """,
)
def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training pairs:
    each anchor draws 2 negatives (different label) from a fixed
    candidate pool, ordered by an md5 of the (anchor, candidate) pair —
    the reproducible replacement for `rand()`-based samplers that a
    lineage-audited training corpus requires (re-runs and engine swaps
    pick the SAME negatives; changing the pool or k is an explicit,
    diffable config change).

    Scale shape: the pool is a broadcast constant (32 rows), so the
    candidate join is map-side with fanout |pool| and the per-anchor
    rank window is bounded by the pool size — no corpus-sized shuffle,
    no n² pairing. The md5 hash family is the engine-portable one every
    sketch in this repo uses, so the draw itself is oracle-checked."""
    emb = load_table(spark, sf_dir, "embeddings")
    pool = emb.filter(F.col("vec_id") < 32).select(
        F.col("vec_id").alias("nid"), F.col("label").alias("nlabel")
    )
    cand = (
        emb.select("vec_id", "label")
        .join(
            F.broadcast(pool),
            (F.col("label") != F.col("nlabel")) & (F.col("vec_id") != F.col("nid")),
        )
        .select(
            F.col("vec_id").alias("anchor_id"),
            "nid",
            F.md5(
                F.concat(
                    F.col("vec_id").cast("string"), F.lit(":"), F.col("nid").cast("string")
                )
            ).alias("h"),
        )
    )
    wr = Window.partitionBy("anchor_id").orderBy("h", "nid")
    return (
        cand.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= 2)
        .select("anchor_id", F.col("rk").cast("int").alias("neg_rank"),
                F.col("nid").alias("negative_id"))
    )
