"""Text-analysis operators: profiling, language ID, fingerprinting.

All the hot-path functions are JVM expressions (functions/text.py); only
language ID uses Python, and it is Arrow-batched with the scoring tables
shipped as constants — at 100 TB language ID is a single narrow map stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

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


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token set. Deterministic across engines (SQL-expressible) — the cheap
    'same bag of words' key for clustering and incremental dedup."""
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text_col))))
    return df.select(F.col(id_col), F.md5(canon).alias("fingerprint"))
