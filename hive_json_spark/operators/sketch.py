"""Sketch-shaped aggregation operators: results are EXACT, but the physical
plan uses the bounded-memory candidate/verify shape that survives
vocabularies too large to shuffle.

(The reference has no aggregation beyond a record count —
`JsonSchemaFinder.java:241,248` — this surface is SURVEY.md §2 "absent"
territory.)
"""

from __future__ import annotations

import math

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from hive_json_spark.functions.text import PY_ASCII_WS, token_count, tokens
from hive_json_spark.operators.util import ensure_parallelism

# candidate generation must tokenize EXACTLY like the verify phase's
# tokens() (JVM \s+, which is ASCII whitespace) or the pigeonhole superset
# guarantee breaks — PY_ASCII_WS is the repo-wide shared definition
# (functions/text.py), the exact mirror of the JVM tokens()
_ASCII_WS = PY_ASCII_WS


def heavy_hitters(
    df: DataFrame,
    text_col: str,
    freq_threshold: float = 0.01,
    min_count: int | None = None,
) -> DataFrame:
    """Exact heavy-hitter tokens: every token whose corpus-wide count is
    >= ``min_count`` (default ``ceil(freq_threshold * total_tokens)``),
    with its exact count and integer ppm frequency.

    Two-phase plan (Misra-Gries-flavored candidate generation + exact
    verify):

    1. **Candidates** — one Arrow-batched pass accumulates a per-PARTITION
       token counter and emits only tokens with local count >=
       floor(s/P). Pigeonhole guarantee: a token with global count >= s
       must reach ceil(s/P) >= floor(s/P) in some partition (if every one
       of P partitions held < ceil(s/P), the total would be at most
       P*(ceil(s/P)-1) <= s-1). So the candidate set is a SUPERSET of the
       true heavy hitters; false candidates cost only verify work, never
       correctness.
    2. **Verify** — candidates (small by construction: at most
       total/floor(s/P) tokens) broadcast; the exploded token stream
       equi-joins them, and only surviving tokens are exactly counted and
       thresholded at s.

    Why not one groupBy(token): that shuffles the ENTIRE vocabulary — at
    100 TB of text, billions of distinct tokens/shingles of which only
    thousands matter. Here the shuffle after the broadcast join carries
    candidate occurrences only, and phase 1's map-side state is one counter
    per partition, spillable and bounded by per-partition vocabulary.
    """
    spark = df.sparkSession
    total = df.select(F.sum(token_count(text_col))).first()[0] or 0
    if total == 0:
        return spark.createDataFrame([], "token string, n bigint, freq_ppm bigint")
    s = int(min_count) if min_count is not None else math.ceil(freq_threshold * total)
    s = max(1, s)

    # repartition BEFORE sizing the per-partition floor when the corpus
    # is big enough for single-core candidate counting to matter: a
    # single-file scan is one partition, which would run the Counter on
    # one core over the whole corpus (the edit_distance_pairs r6 lesson).
    # Below ~1M tokens the round-robin shuffle costs more than it saves
    # (measured at sf0.1: 0.65 s unpartitioned vs 1.0-1.3 s shuffled), so
    # the probe gates on the token total already computed above. The
    # pigeonhole floor stays sound under ANY partitioning: a token with
    # global count >= s has >= s/n_parts occurrences in some partition.
    if total > 1_000_000:
        df = ensure_parallelism(df)
    n_parts = max(1, df.rdd.getNumPartitions())
    local_floor = max(1, s // n_parts)

    def candidates_kernel(batches):
        cnt: Counter = Counter()
        for pdf in batches:
            for txt in pdf[text_col]:
                if txt:
                    cnt.update(t for t in _ASCII_WS.split(txt) if t)
        heavy = [(t, c) for t, c in cnt.items() if c >= local_floor]
        yield pd.DataFrame(
            {"token": [t for t, _ in heavy], "local_n": [c for _, c in heavy]}
        )

    cands = (
        df.select(text_col)
        .mapInPandas(candidates_kernel, "token string, local_n long")
        .select("token")
        .distinct()
    )

    toks = df.select(F.explode(tokens(text_col)).alias("token"))
    return (
        toks.join(F.broadcast(cands), "token")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= s)
        .select(
            "token",
            F.col("n").cast("bigint").alias("n"),
            F.expr(f"(n * 1000000) div {total}").cast("bigint").alias("freq_ppm"),
        )
    )


def _cms_bucket(key_str, j: int, width: int):
    """Row hash for CMS depth ``j``: engine-portable md5 arithmetic (the
    [[cross-engine-float-determinism]] family's integer cousin) — the same
    bytes hash identically in Spark, DuckDB, or any engine with md5, so
    the sketch CONTENT is deterministic, not just its estimates."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{j}:"), key_str)), 1, 8), 16, 10
        ).cast("long")
        % width
    )


def count_min_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch of a key stream as a ``(j, bucket, n)`` frame —
    ``depth x width`` cells regardless of stream size.

    The sketch is MERGEABLE state: cells are plain counts, so partial
    sketches from any partitioning (or day, or shard) sum cell-wise —
    exactly what the one map-side-combinable groupBy below exploits. At
    100 TB the shuffle carries at most ``partitions x depth x width``
    partial cells, never keys; estimate error is the classic
    ``<= e/width * N`` overcount with probability ``1 - e^-depth``.

    ``weight_col`` sketches a PRE-AGGREGATED (key, weight) frame: cells
    sum the weights instead of counting rows — bit-identical to sketching
    the raw stream the aggregate came from, which lets one per-key count
    frame feed both a sketch and an exact audit without a second corpus
    pass.
    """
    k = F.col(key_col).cast("string")
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"), _cms_bucket(k, j, width).alias("bucket")
                )
                for j in range(depth)
            ]
        )
    )
    extra = [F.col(weight_col).alias("_w")] if weight_col is not None else []
    agg = F.sum("_w") if weight_col is not None else F.count("*")
    return (
        df.select(cells.alias("c"), *extra)
        .groupBy(F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
        .agg(agg.alias("n"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point-query the sketch: per probe key, ``min`` over its ``depth``
    cells. Probe keys should come from the sketched stream (the usual
    top-k verification flow); an unseen key would inner-join onto only
    the cells other keys populated. The probe frame is small by usage, so
    it explodes to ``|probes| x depth`` rows and joins the broadcast
    ``depth x width`` sketch without shuffling anything."""
    k = F.col(key_col).cast("string")
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"), _cms_bucket(k, j, width).alias("bucket")
                )
                for j in range(depth)
            ]
        )
    )
    pr = probes.select(F.col(key_col), cells.alias("c")).select(
        key_col, F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket")
    )
    return (
        pr.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy(key_col)
        .agg(F.min("n").cast("bigint").alias("cms_n"))
    )
