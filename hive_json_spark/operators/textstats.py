"""Text-analysis operators: profiling, language ID, fingerprinting.

All the hot-path functions are JVM expressions (functions/text.py); only
language ID uses Python, and it is Arrow-batched with the scoring tables
shipped as constants — at 100 TB language ID is a single narrow map stage.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from hive_json_spark.operators.util import ensure_parallelism
from hive_json_spark.functions.text import (
    bpe_ish_token_count,
    char_count,
    distinct_token_count,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
)

# Tiny per-language function-word tables (public-knowledge stopwords).
_LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "es": ("el", "la", "de", "que", "y", "es", "un"),
    "fr": ("le", "la", "de", "et", "est", "un", "une"),
    "zh": ("的", "是", "了", "在", "和"),
}


def text_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document stats: token/char/distinct counts, BPE-ish token count,
    stopword ratio, quality score. One narrow projection, pure codegen."""
    df = ensure_parallelism(df)
    return df.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        char_count(text_col).alias("n_chars"),
        distinct_token_count(text_col).alias("n_distinct"),
        bpe_ish_token_count(text_col).alias("n_bpe_tokens"),
        F.round(stopword_ratio(text_col), 6).alias("stop_ratio"),
        quality_score(text_col).alias("quality"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic language ID: argmax of marker-word hit counts, 'und' when
    no marker hits. JVM-side: one array expr per language, no UDF."""
    df = ensure_parallelism(df)
    toks = tokens(text_col)
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return df.select(
        F.col(id_col),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("pred_lang"),
        best["hits"].cast("bigint").alias("marker_hits"),
    )


def repetition_ratio(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Duplicate-3-gram ratio per document — the repetition filter from
    published web-corpus quality rules (high ratio ⇒ boilerplate/spam).

    Arrow-batched pandas kernel rather than JVM array exprs: the
    equivalent ``transform``+``slice`` higher-order expression tree is
    CodegenFallback (interpreted) AND pays a ~3 s Janino compile on first
    touch; the kernel is ~2.5× faster warm with no compile cliff. The
    final ``F.round`` stays JVM-side so round-half-up matches the SQL
    oracle (Python ``round`` is banker's rounding). ``re.ASCII`` keeps
    ``\\s`` identical to Java's default ASCII character class.
    """
    df = ensure_parallelism(df)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _dup3(texts: pd.Series) -> pd.Series:
        ws = re.compile(r"\s+", re.ASCII)

        def one(t):
            if t is None:
                return None
            tk = [x for x in ws.split(t) if x]
            positions = max(len(tk) - 3, 0) + 1
            grams = {" ".join(tk[i : i + 3]) for i in range(positions)}
            return 1.0 - len(grams) / positions

        return texts.map(one)

    return df.select(
        F.col(id_col), F.round(_dup3(F.col(text_col)), 6).alias("dup3_ratio")
    )


def distinct_ngrams(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Explode each document into its DISTINCT word n-grams: one
    (id, gram) row per distinct n-gram — the input frame for verbatim-
    overlap decontamination and shingle-based dedup.

    Arrow-batched kernel for the same reason as ``repetition_ratio``: the
    JVM ``transform``+``slice`` formulation is CodegenFallback and
    O(tokens × n) interpreted work per row, plus a multi-second Janino
    compile. The kernel is a narrow map — output rows ∝ distinct grams,
    nothing shuffles here. ``re.ASCII`` keeps ``\\s`` identical to Java's
    default character class. Documents shorter than n tokens emit
    nothing (full windows only, the decontam convention)."""
    df = ensure_parallelism(df)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _grams(texts: pd.Series) -> pd.Series:
        ws = re.compile(r"\s+", re.ASCII)

        def one(t):
            if t is None:
                return []
            tk = [x for x in ws.split(t) if x]
            if len(tk) < n:
                return []
            return list({" ".join(tk[i : i + n]) for i in range(len(tk) - n + 1)})

        return texts.map(one)

    return df.select(
        F.col(id_col), F.explode(_grams(F.col(text_col))).alias("gram")
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token set. Deterministic across engines (SQL-expressible) — the cheap
    'same bag of words' key for clustering and incremental dedup."""
    df = ensure_parallelism(df)
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text_col))))
    return df.select(F.col(id_col), F.md5(canon).alias("fingerprint"))
