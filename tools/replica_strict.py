"""Generic strict driver-replica: run the EXACT driver comparison (sf0.01,
type-strict normalize — the same code path as tests/test_oracle_parity)
over a named slice of the registry and write a one-line-per-query
artifact. Generalizes tools/replica_never_sampled.py (r8) so each round
can rotate the replica across a different never-driver-sampled family
(r9 verdict ask #5: the LLM-pipeline/training entries).

Usage: python tools/replica_strict.py --out replica_pipeline_r9.json \
           q_dedup_method_eval q_ann_recall ...
       python tools/replica_strict.py --slice pipeline_r9
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

# The r9 rotation: ~25 pipeline/training entries the driver has never
# sampled (its 50-query draw is relational-heavy; 60/237 unique ever
# sampled through r8, none from these families). Ordered most-plan-complex
# first (the verdict's top-10 ask), then breadth across the dedup /
# similarity / multimodal / training families.
SLICES = {
    "pipeline_r9": [
        "q_dedup_method_eval",
        "q_ann_recall",
        "q_setsim_prefix_join",
        "q_phash_image_dup",
        "q_embedding_near_dup",
        "q_minhash_dedup_pairs",
        "q_fuzzy_name_match",
        "q_similarity_ivf",
        "q_similarity_lsh",
        "q_pq_recall",
        "q_mutual_nn",
        "q_semantic_dedup",
        "q_kmeans_lloyd",
        "q_sorted_neighborhood",
        "q_substring_dup",
        "q_winnow_dup",
        "q_simhash_pairs",
        "q_dedup_clusters",
        "q_incremental_dedup",
        "q_audio_fingerprint_dup",
        "q_media_features",
        "q_media_resize",
        "q_flac_roundtrip",
        "q_sequence_pack",
        "q_decontaminate",
        "q_mixture_resample",
    ],
    # The r10 rotation (verdict ask #4): the training / quality families —
    # never driver-sampled and never strictly replicated through r9.
    "training_r10": [
        "q_bpe_pair_step",
        "q_tokenizer_fertility",
        "q_dataset_card",
        "q_curriculum_stages",
        "q_negative_sampling",
        "q_epoch_shuffle",
        "q_train_test_split",
        "q_chunk_documents",
        "q_label_propagation",
        "q_embedding_outliers",
        "q_embedding_centroids",
        "q_unigram_logloss",
        "q_bigram_lm",
        "q_pii_scan",
        "q_pii_scrub",
        "q_gopher_rules",
        "q_repetition_filter",
        "q_lang_id",
        "q_text_profile",
        "q_readability",
        "q_quality_by_source",
        "q_keyword_extraction",
        "q_token_entropy",
        "q_boilerplate_grams",
        "q_duplicate_ngram_fraction",
        "q_zipf_audit",
    ],
}

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="registry query names")
    ap.add_argument("--slice", default=None, help=f"named slice: {sorted(SLICES)}")
    ap.add_argument("--out", default=None, help="output json filename")
    args = ap.parse_args()
    names = list(args.names)
    if args.slice:
        names = SLICES[args.slice] + names
        out_name = args.out or f"replica_{args.slice}.json"
    else:
        out_name = args.out or "replica_strict.json"
    if not names:
        ap.error("no queries given (names or --slice)")

    import duckdb

    import __spark_entry__ as entry_mod
    from hive_json_spark.session import get_spark
    from test_oracle_parity import decimal_columns, normalize

    spark = get_spark("replica-strict")
    spark.sparkContext.setLogLevel("ERROR")
    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    results = {}
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, SF_DIR)
            cols = sorted(sdf.columns)
            srows = [[row[c] for c in cols] for row in sdf.collect()]
            res = con.execute(oracles[name])
            dnames = [d[0] for d in res.description]
            draw = res.fetchall()
            idx = [dnames.index(c) for c in cols]
            drows = [[row[i] for i in idx] for row in draw]
            results[name] = {
                "rows": len(srows),
                "rows_match": len(srows) == len(drows),
                "schema_match": sorted(dnames) == cols,
                "no_decimal": not decimal_columns(srows, cols)
                and not decimal_columns(drows, cols),
                "values_match": normalize(srows, cols) == normalize(drows, cols),
                "sec": round(time.time() - t0, 2),
            }
        except Exception as exc:
            results[name] = {"err": f"{type(exc).__name__}: {exc}"[:300]}
        spark.catalog.clearCache()
    ok = all(
        r.get("rows_match")
        and r.get("schema_match")
        and r.get("values_match")
        and r.get("no_decimal")
        for r in results.values()
    )
    out = {"sf_dir": SF_DIR, "all_green": ok, "n": len(results), "queries": results}
    with open(os.path.join(ROOT, out_name), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"all_green": ok, "n": len(results), "out": out_name}))
    for name, r in results.items():
        flag = "OK " if (r.get("values_match") and r.get("rows_match")) else "BAD"
        print(f"{flag} {name}: {r}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
