"""Differential fuzzing for the text/LM query family: seeded random
corpora — including empty documents, single tokens, heavy repetition, and
token-internal unicode whitespace — must hash-match the DuckDB oracles
exactly. Guards the ln()-sum (integer micro-unit) queries against edge
inputs the real corpus never shows."""

from __future__ import annotations

import math
import random

import duckdb
import pytest

FUZZED = [
    "q_token_entropy",
    "q_unigram_logloss",
    "q_bigram_lm",
    "q_keyword_extraction",
    "q_heavy_hitters",
    "q_zipf_audit",
    "q_duplicate_ngram_fraction",
    "q_dataset_card",
    "q_tfidf_topk",
    "q_bm25_topk",
    "q_inverted_index",
    "q_setsim_prefix_join",
    "q_doc_novelty",
    "q_vocab_drift",
    "q_block_fanout_audit",
]

ALPHABET = [
    "spark", "scan", "merge", "token", "vector", "filter", "agg", "row",
    "x", "nb sp",  # token with internal NBSP: one token under ASCII \s
    "élève",  # non-ASCII letters
]


def _corpus(seed: int):
    rnd = random.Random(seed)
    rows = []
    for doc_id in range(rnd.randint(3, 40)):
        style = rnd.random()
        if style < 0.1:
            text = ""  # empty document
        elif style < 0.2:
            text = rnd.choice(ALPHABET)  # single token
        elif style < 0.35:
            text = " ".join([rnd.choice(ALPHABET[:2])] * rnd.randint(5, 60))
        else:
            text = " ".join(
                rnd.choice(ALPHABET) for _ in range(rnd.randint(1, 80))
            )
        rows.append((doc_id, text, "en", f"src{doc_id % 3}", len(text)))
    return rows


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.12g}"
    return str(v)


@pytest.mark.parametrize("seed", range(8))
def test_random_corpus_matches_oracles(spark, tmp_path, seed):
    from hive_json_spark.registry import ORACLES, QUERIES

    rows = _corpus(seed)
    sf_dir = str(tmp_path / f"corpus{seed}")
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    docs.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    for name in FUZZED:
        sdf = QUERIES[name](spark, sf_dir)
        cols = sorted(sdf.columns)
        spark_rows = sorted(
            tuple(_norm(row[c]) for c in cols) for row in sdf.collect()
        )
        res = con.execute(ORACLES[name])
        names = [d[0] for d in res.description]
        idx = [names.index(c) for c in cols]
        duck_rows = sorted(
            tuple(_norm(r[i]) for i in idx) for r in res.fetchall()
        )
        assert spark_rows == duck_rows, f"{name} seed={seed}"
