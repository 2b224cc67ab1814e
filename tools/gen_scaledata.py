#!/usr/bin/env python
"""Generate scaled testdata for SCALING runs (sf1 = 10x the bench scale).

/root/testdata is driver-owned and read-only, and ships no sf1 — so the
scaling evidence the 100 TB design claims need (SCALE.md) comes from
this generator: the same schemas, key relationships, cardinality ratios
and planted structures as the driver's sf0.001-0.1 tables (characterized
empirically — row-count ratios, vocab, dup-pair rate, per-order line
fanout, event stream shape all measured from the shipped parquet),
extrapolated with the same 10x-per-decade rules:

  table      sf0.01   sf0.1    sf1        rule
  region     5        5        5          fixed
  nation     25       25       25         fixed
  customer   1,500    15,000   150,000    10x
  supplier   100      1,000    10,000     10x
  part       2,000    20,000   200,000    10x
  orders     15,000   150,000  1,500,000  10x (custkey = 10% of customers... keys 10x)
  lineitem   60,000   600,000  6,000,000  10x (4 lines/order, Poisson-ish)
  events     10,000   100,000  1,000,000  10x rows, users 10x, SAME 30-day span
  documents  500      5,000    50,000     10x (20 sources fixed, 31-token vocab,
                                          1 planted near-dup pair per 20 docs)
  embeddings 500      2,000    20,000     10x from sf0.1 (64-dim unit-norm)

Only quantities that drive COST are reproduced faithfully (row counts,
group cardinalities, join fanouts, text lengths, dup-pair volume, date
spans); value-level distributions are approximated. This data grades
scaling ratios, never correctness — the DuckDB oracle gate stays on the
driver's own tables.

Usage: python tools/gen_scaledata.py [--sf 1] [--out _scaledata]
              [--vocab small|zipf]

--vocab zipf (r6): the REALISTIC-vocabulary variant the r5 census asked
for. The shipped corpus' 31-token vocabulary saturates similarity (93%
of same-block pairs clear token-set J >= 0.5), which makes every dedup
pair OUTPUT dense and masks the sparse-output behavior the prefix-filter
/ LSH designs are built for. zipf mode draws document tokens from a
50,000-word vocabulary with Zipf(s=1.07) rank frequencies (heavy head ≈
stopwords stressing prefix-filter df ordering and LSH bucket skew; long
rare tail keeping non-planted pair output sparse) and gives customers
NON-sequential name keys (a fixed modular bijection of the row id), so
edit-distance pair output is sparse too (the shipped zero-padded
sequential names make lev<=2 pairs dense by construction). Planted
near-dup pairs (1 per 20 docs) and all other tables are unchanged.
Output dir gets a "zipf-" prefix: _scaledata/zipf-sf1.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]  # the 30 uniform tokens; 'dup' is the planted-pair marker

LANGS = ["en", "de", "es", "fr", "zh"]
LANG_W = [0.4, 0.15, 0.15, 0.15, 0.15]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PNOUNS = ["ring", "bolt", "screw", "nut", "washer", "gear", "pin", "clip"]
PADJS = ["large", "hot", "blue", "red", "green", "dim", "odd", "new"]
STATUSES = ["O", "F", "P"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPES = ["click", "view", "purchase", "signup", "error"]


def _ts_us(base: str, offsets_us: np.ndarray) -> pa.Array:
    base64 = np.datetime64(base, "us").astype("int64")
    return pa.array(base64 + offsets_us.astype("int64"), type=pa.timestamp("us"))


def write(out_dir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out_dir, f"{name}.parquet")
    pq.write_table(table, path, compression="snappy")
    print(f"{name}: {table.num_rows} rows -> {path}", flush=True)



def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "_scaledata"))
    ap.add_argument("--vocab", choices=["small", "zipf"], default="small")
    ap.add_argument("--tables", default="",
                    help="comma list to generate only these tables (sf10 spot-checks)")
    args = ap.parse_args()
    sf = args.sf
    zipf = args.vocab == "zipf"
    prefix = "zipf-" if zipf else ""
    out_dir = os.path.join(args.out, f"{prefix}sf{sf:g}")
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)
    only = set(args.tables.split(",")) if args.tables else None

    def want(name: str) -> bool:
        return only is None or name in only

    n_cust = int(150_000 * sf * 10) // 10
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_orders = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_events = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_docs = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    # region / nation (fixed dims)
    if want("region"):
        write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    if want("nation"):
        write(out_dir, "nation", pa.table({
            "n_nationkey": pa.array(range(25), pa.int32()),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
        }))

    # customer
    ck = np.arange(n_cust, dtype=np.int64)
    if want("customer"):
        write(out_dir, "customer", pa.table({
        "c_custkey": ck,
        # zipf mode: non-sequential name keys (fixed odd-multiplier
        # bijection mod 10^9) — lev<=2 neighbors become rare, matching
        # real id spaces; sequential zero-padded keys make them dense
        "c_name": (
            [f"Customer#{(i * 2654435761) % 1_000_000_000:09d}" for i in range(n_cust)]
            if zipf
            else [f"Customer#{i:09d}" for i in range(n_cust)]
        ),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))

    # supplier
    if want("supplier"):
        write(out_dir, "supplier", pa.table({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    # part
    pk = np.arange(n_part, dtype=np.int64)
    if want("part"):
        write(out_dir, "part", pa.table({
        "p_partkey": pk,
        "p_name": pa.array(
            np.char.add(
                np.char.add(np.array(PADJS)[pk % 8], " "),
                np.array(PNOUNS)[(pk // 8) % 8],
            )
        ),
        "p_brand": pa.array(np.char.add("Brand#", (pk % 25).astype(str))),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + (pk % 1000) * 0.1, 2),
    }))

    # orders: 1995-01-01 .. 2001-08-01 (~2404 days), uniform
    day_us = 86_400_000_000
    if want("orders"):
        odays = rng.integers(0, 2404, n_orders)
        write(out_dir, "orders", pa.table({
        "o_orderkey": np.arange(n_orders, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_orders),
        "o_orderstatus": pa.array(np.array(STATUSES)[rng.integers(0, 3, n_orders)]),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_orders), 2),
        "o_orderdate": _ts_us("1995-01-01", odays * day_us),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_orders)]),
    }))

    # lineitem: orderkeys drawn uniformly (Poisson-4 fanout like the
    # shipped data: ~2% of orders end up line-less), linenumber 1..7
    if want("lineitem"):
        lik = rng.integers(0, n_orders, n_li)
        ldays = rng.integers(1, 2500, n_li)
        write(out_dir, "lineitem", pa.table({
        "l_orderkey": lik,
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts_us("1995-01-01", ldays * day_us),
    }))

    # events: sorted 30-day stream, 10x density at 10x sf
    span_us = 30 * day_us
    if want("events"):
        offs = np.sort(rng.integers(0, span_us, n_events))
        write(out_dir, "events", pa.table({
        "event_id": np.arange(n_events, dtype=np.int64),
        "ts": _ts_us("2024-01-01", offs),
        "user_id": rng.integers(0, n_users, n_events),
        "event_type": pa.array(np.array(ETYPES)[rng.integers(0, 5, n_events)]),
        "value": np.round(np.minimum(rng.exponential(80.0, n_events), 560.0), 2),
        "props": pa.array(
            np.char.add(np.char.add('{"k": ', rng.integers(0, 100, n_events).astype(str)), "}")
        ),
    }))

    # documents: 31-token vocab (30 uniform + planted 'dup' marker),
    # 10-100 tokens/doc, source round-robin, one planted near-dup pair
    # per 20 docs (partner text = copy with ONE token flipped to 'dup' —
    # shingle Jaccard ~0.9, matching the shipped corpus where minhash
    # recall measures 1.0)
    if want("documents"):
        lengths = rng.integers(10, 101, n_docs)
        if zipf:
            # 50k-word Zipf(s=1.07) vocabulary: rank-r probability ∝ 1/r^s.
            # One bulk draw for the whole corpus, sliced per doc.
            V = 50_000
            ranks = np.arange(1, V + 1, dtype=np.float64)
            pz = ranks ** -1.07
            pz /= pz.sum()
            vocab_arr = np.array([f"w{i:05d}" for i in range(V)])
            flat = rng.choice(V, size=int(lengths.sum()), p=pz)
            cuts = np.cumsum(lengths)[:-1]
            texts = [" ".join(vocab_arr[chunk]) for chunk in np.split(flat, cuts)]
        else:
            vocab_arr = np.array(VOCAB)
            texts = [" ".join(vocab_arr[rng.integers(0, 30, ln)]) for ln in lengths]
        n_pairs = n_docs // 20
        dup_ids = rng.choice(n_docs, size=2 * n_pairs, replace=False)
        for a, b in zip(dup_ids[:n_pairs], dup_ids[n_pairs:]):
            toks = texts[a].split()
            toks[rng.integers(0, len(toks))] = "dup"
            texts[b] = " ".join(toks)
        langs = np.array(LANGS)[rng.choice(5, n_docs, p=LANG_W)]
        write(out_dir, "documents", pa.table({
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "text": texts,
            "lang": pa.array(langs),
            "source": pa.array(np.char.add("src", (np.arange(n_docs) % 20).astype(str))),
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }))

    # embeddings: 64-dim unit-norm float32, labels 0..9
    if want("embeddings"):
        X = rng.standard_normal((n_emb, 64)).astype(np.float32)
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        write(out_dir, "embeddings", pa.table({
            "vec_id": np.arange(n_emb, dtype=np.int64),
            "embedding": pa.array(list(X), pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
        }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
