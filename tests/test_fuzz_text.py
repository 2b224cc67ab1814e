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


@pytest.mark.parametrize("seed", range(40, 46))
def test_substring_and_winnow_match_bruteforce(spark, seed):
    """Differential fuzz for the span-dedup operators: on random corpora
    with planted shared runs, substring_dup_pairs must equal the literal
    python set computation, and winnow_dup_pairs must (a) be a subset of
    docs sharing >= w+k-1-token runs' guarantee set and (b) match its own
    python reference exactly."""
    import hashlib

    from hive_json_spark.operators.dedup import (
        substring_dup_pairs,
        winnow_dup_pairs,
    )

    rnd = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    runs = [
        [rnd.choice(vocab) for _ in range(rnd.randint(8, 14))] for _ in range(4)
    ]
    for doc_id in range(24):
        toks = [rnd.choice(vocab) for _ in range(rnd.randint(5, 40))]
        if rnd.random() < 0.5:  # plant a shared run at a random position
            run = rnd.choice(runs)
            pos = rnd.randint(0, len(toks))
            toks = toks[:pos] + run + toks[pos:]
        docs.append((doc_id, " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")

    k = 8
    # python reference: k-token window sets
    wins = {
        i: {
            " ".join(t.split()[j:j + k])
            for j in range(len(t.split()) - k + 1)
        }
        for i, t in docs
        if len(t.split()) >= k
    }
    expect_sub = {
        (a, b): len(wins[a] & wins[b])
        for a in wins
        for b in wins
        if a < b and wins[a] & wins[b]
    }
    got_sub = {
        (r.id_a, r.id_b): r.n_shared_windows
        for r in substring_dup_pairs(df, k=k).collect()
    }
    assert got_sub == expect_sub, f"seed={seed}"

    # python reference for winnowing (k=5, w=4, md5-prefix hash)
    def fps(toks):
        if len(toks) < 5 + 4 - 1:
            return set()
        hs = [
            int(hashlib.md5(" ".join(toks[j:j + 5]).encode()).hexdigest()[:8], 16)
            for j in range(len(toks) - 4)
        ]
        return {min(hs[j:j + 4]) for j in range(len(hs) - 3)}

    fsets = {i: fps(t.split()) for i, t in docs}
    expect_win = {
        (a, b): len(fsets[a] & fsets[b])
        for a in fsets
        for b in fsets
        if a < b and fsets[a] & fsets[b]
    }
    got_win = {
        (r.id_a, r.id_b): r.n_shared_fp
        for r in winnow_dup_pairs(df, k=5, w=4).collect()
    }
    assert got_win == expect_win, f"seed={seed}"


@pytest.mark.parametrize("seed", [11, 23])
def test_edit_distance_pairs_fuzz_matches_bruteforce(spark, seed):
    """Differential fuzz for the r8 FastSS join rewrite (folded-hash
    candidates + output-sized exact verify): 40 independent random
    corpora — tiny alphabet to force shared deletion variants and hash
    bucket collisions, lengths 0-8, duplicate strings, multi-column
    blocks — run as ONE operator call (the block columns isolate the
    corpora), compared pair-for-pair against brute-force Levenshtein."""
    import itertools

    from hive_json_spark.operators.dedup import edit_distance_pairs

    rng = random.Random(seed)
    rows = []
    rid = 0
    for corpus in range(40):
        blk_a = f"b{corpus % 7}"
        blk_b = corpus  # second block col: ints — (blk_a, blk_b) is unique
        for _ in range(rng.randint(2, 12)):
            s = "".join(rng.choice("abc") for _ in range(rng.randint(0, 8)))
            rows.append((rid, s, blk_a, blk_b))
            rid += 1
    df = spark.createDataFrame(rows, "id bigint, s string, blk string, blk2 int")
    max_dist = 1 if seed % 2 else 2
    got = {
        (r.id_a, r.id_b): r.lev
        for r in edit_distance_pairs(
            df, "id", "s", max_dist=max_dist, block_cols=["blk", "blk2"]
        ).collect()
    }

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a):
            cur = [i + 1]
            for j, cb in enumerate(b):
                cur.append(min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {}
    for (i1, s1, a1, b1), (i2, s2, a2, b2) in itertools.combinations(rows, 2):
        if a1 == a2 and b1 == b2:
            d = lev(s1, s2)
            if d <= max_dist:
                want[(min(i1, i2), max(i1, i2))] = d
    assert got == want and len(want) > 0
