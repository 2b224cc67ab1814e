"""Distributed schema inference: the reference's fold, as a Spark aggregation.

The reference streams documents one at a time through ``pickType`` +
``mergeType`` in a single sequential loop (JsonSchemaFinder.java:227-247).
Here the same lattice runs as a classic partial+final aggregation:

    scan → per-partition local fold (partial)  → tree-reduce of partials (final)

Scale design (100 TB):
- **NDJSON / one-doc-per-line** (the common large-corpus layout): read with
  ``spark.read.text`` — splittable, so a 1 GB+ file parallelizes across
  executors. Per-partition fold keeps O(schema) memory; only one partial
  type tree per partition crosses the wire.
- **Concatenated multi-line JSON or .gz**: not splittable (the same
  constraint the reference has — gzip forces sequential reads,
  JsonSchemaFinder.java:234-236). Parallelism is per *file* via
  ``binaryFiles``; throughput scales with file count.
- **In-table JSON columns**: ``mapInPandas`` over Arrow batches — one
  pickled partial per partition, merged on the driver. The driver merges
  #partitions items (KBs each), never data.
- Result determinism: the reference is fold-order-sensitive for union
  branch order (UnionType.java:89-100); distributed folds are unordered, so
  entry points canonicalize (sorted union branches) by default.
"""

from __future__ import annotations

import glob as _glob
import gzip
import io
import json
import os
import pickle
from dataclasses import dataclass
from typing import Iterable, Iterator, List, Optional, Sequence, Tuple

from hive_json_spark.types import (
    HType,
    JsonNumber,
    canonicalize,
    infer_type,
    iter_json_documents,
    merge_types,
)

__all__ = [
    "InferResult",
    "infer_files_local",
    "infer_schema",
    "infer_schema_of_column",
]


@dataclass
class InferResult:
    """Discovered type + record count (count parity: JsonSchemaFinder.java:248)."""

    htype: Optional[HType]
    records: int


# --- local (single-process) path: CLI parity with the reference main ---------


def _open_text(path: str) -> io.TextIOBase:
    # transparent .gz by suffix (JsonSchemaFinder.java:234-236)
    if path.endswith(".gz"):
        return io.TextIOWrapper(gzip.open(path, "rb"), encoding="utf-8")
    return open(path, "r", encoding="utf-8")


def _expand(paths: Sequence[str] | str) -> List[str]:
    if isinstance(paths, str):
        paths = [paths]
    out: List[str] = []
    for p in paths:
        hits = sorted(_glob.glob(p))
        out.extend(hits if hits else [p])
    return out


def infer_files_local(paths: Sequence[str] | str) -> InferResult:
    """Sequential left-fold over files — exact reference semantics including
    union branch order (single-threaded fold, JsonSchemaFinder.java:227-247)."""
    result: Optional[HType] = None
    count = 0
    for path in _expand(paths):
        with _open_text(path) as f:
            for doc in iter_json_documents(f.read()):
                result = merge_types(result, infer_type(doc))
                count += 1
    return InferResult(result, count)


# --- distributed paths -------------------------------------------------------


def _fold_texts(texts: Iterable[str]) -> Tuple[Optional[HType], int]:
    t: Optional[HType] = None
    n = 0
    dec = json.JSONDecoder(parse_int=JsonNumber, parse_float=JsonNumber)
    for text in texts:
        if text is None:
            continue
        s = text.strip()
        if not s:
            continue
        if "\n" not in s and s[0] in "{[" and s[-1] in "}]":
            # single-doc fast path (NDJSON line)
            try:
                t = merge_types(t, infer_type(dec.decode(s)))
                n += 1
                continue
            except ValueError:
                pass
        for doc in iter_json_documents(s):
            t = merge_types(t, infer_type(doc))
            n += 1
    return t, n


def infer_schema(
    spark,
    paths: Sequence[str] | str,
    *,
    ndjson: bool = True,
    canonical: bool = True,
    min_partitions: Optional[int] = None,
) -> InferResult:
    """Distributed inference over JSON corpus files.

    ndjson=True  → line-splittable ``spark.read.text`` scan (scale path).
    ndjson=False → whole-file parallelism via ``binaryFiles`` (concatenated
                   docs / .gz corpora — the reference's sequential constraint,
                   parallel across files).
    """
    paths = _expand(paths)
    sc = spark.sparkContext
    if ndjson:
        df = spark.read.text(list(paths))
        rdd = df.rdd.map(lambda row: row[0])
    else:
        n_parts = min_partitions or max(len(paths), 1)
        binaries = sc.binaryFiles(",".join(paths), minPartitions=n_parts)

        def decode(kv):
            path, data = kv
            if path.endswith(".gz"):
                data = gzip.decompress(data)
            return data.decode("utf-8")

        rdd = binaries.map(decode)

    def seq(acc, text):
        t, n = _fold_texts([text])
        return merge_types(acc[0], t), acc[1] + n

    def comb(a, b):
        return merge_types(a[0], b[0]), a[1] + b[1]

    htype, records = rdd.treeAggregate((None, 0), seq, comb, depth=2)
    if canonical and htype is not None:
        htype = canonicalize(htype)
    return InferResult(htype, records)


_COLUMN_INFER_MEMO: dict = {}


def infer_schema_of_column(
    df, column: str, *, canonical: bool = True, memo: bool = True
) -> InferResult:
    """Infer the schema of a JSON-string column (e.g. ``events.props``).

    Arrow-batched: ``mapInPandas`` folds each partition locally and emits ONE
    pickled partial per partition; the driver merges #partitions partials.
    Each partition folds only its *distinct* values (scaled by frequency).

    memo=True caches the result per (plan semantic hash, input files,
    column) within the process — repeated inference over the same immutable
    files (the common "infer then load then query" pattern) folds once.
    """
    import pandas as pd

    memo_key = None
    if memo:
        try:
            memo_key = (df.semanticHash(), tuple(sorted(df.inputFiles())), column, canonical)
        except Exception:
            memo_key = None
        if memo_key is not None and memo_key in _COLUMN_INFER_MEMO:
            return _COLUMN_INFER_MEMO[memo_key]

    def fold_partition(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        # Fold each DISTINCT text once and scale the record count by its
        # frequency — the merge is idempotent, so duplicates add nothing to
        # the type but would cost a full parse each. Low-cardinality JSON
        # columns (telemetry props, enum-ish payloads) drop orders of
        # magnitude of Python parse work; high-cardinality columns pay one
        # cheap value_counts.
        t: Optional[HType] = None
        n = 0
        for pdf in batches:
            for text, freq in pdf[column].value_counts().items():
                pt, pn = _fold_texts([text])
                t = merge_types(t, pt)
                n += pn * int(freq)
        yield pd.DataFrame({"partial": [pickle.dumps((t, n))]})

    from hive_json_spark.operators.util import ensure_parallelism

    partials = (
        ensure_parallelism(df.select(column))
        .mapInPandas(fold_partition, schema="partial binary")
        .collect()
    )
    htype: Optional[HType] = None
    records = 0
    for row in partials:
        t, n = pickle.loads(row["partial"])
        htype = merge_types(htype, t)
        records += n
    if canonical and htype is not None:
        htype = canonicalize(htype)
    result = InferResult(htype, records)
    if memo_key is not None:
        _COLUMN_INFER_MEMO[memo_key] = result
    return result
