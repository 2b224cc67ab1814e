"""Strict driver-replica rehearsal over the never-driver-sampled entries
(r8, verdict ask #6): the rotation can now land on the render/gz/ddl
entries and the 7 streaming entries, so run the EXACT replica (sf0.01,
type-strict normalize — the same code path as tests/test_oracle_parity)
over precisely that set plus q_time_rollup (the one historical driver
red), and record a one-line-per-query artifact.

Usage: python tools/replica_never_sampled.py  -> replica_never_sampled.json
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

NEVER_SAMPLED = [
    "q_render_ddl",
    "q_flat_render",
    "q_infer_props_schema_gz",
    "q_infer_by_group_ddl",
    "q_stream_topk_final",
    "q_stream_cms_cells",
    "q_stream_rollup_final",
    "q_stream_merge_snapshot",
    "q_stream_psi_final",
    "q_stream_session_final",
    "q_stream_join_pairs",
    "q_time_rollup",  # the one historical driver red (r2), re-pinned
    "q_schema_drift",  # new in r8 — never sampled by construction
]

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from hive_json_spark.session import get_spark
    from test_oracle_parity import decimal_columns, normalize

    spark = get_spark("replica-never-sampled")
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
    for name in NEVER_SAMPLED:
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
    ok = all(
        r.get("rows_match") and r.get("schema_match") and r.get("values_match") and r.get("no_decimal")
        for r in results.values()
    )
    out = {"sf_dir": SF_DIR, "all_green": ok, "queries": results}
    with open(os.path.join(ROOT, "replica_never_sampled.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
