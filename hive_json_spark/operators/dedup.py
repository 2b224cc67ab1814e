"""Deduplication operators for training-data pipelines, 100 TB-shaped.

- **Exact**: content-hash groupBy keeping the min id. One shuffle on the
  hash (never on the text itself — at 100 TB the md5 is 16 bytes/row vs
  KBs of text), map-side partial min, AQE-coalesced.
- **MinHash + LSH**: word-shingle → 64-perm MinHash signature computed
  entirely JVM-side (xxhash-based universal hashing inside ``transform``/
  ``array_min`` — no Python in the scan), banded into LSH buckets, bucket
  join for candidates, exact-Jaccard verification on the candidates only.
  The full O(n²) never materializes; cost is #collisions, which the band
  count tunes.
- **SimHash**: 64-bit sign-of-weighted-bit-sums over token hashes via an
  Arrow-batched pandas UDF (numpy bit tricks), banded on 16-bit chunks so
  near-misses (≤3 differing bits) always share ≥1 chunk — standard
  pigeonhole blocking; hamming verified with ``bit_count`` JVM-side.
- **N-gram Jaccard**: exact token-set Jaccard within cheap blocking keys —
  the SQL-expressible (oracle-checkable) exact variant.
"""

from __future__ import annotations

import random
from typing import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.storagelevel import StorageLevel

from hive_json_spark.functions.text import py_tokens, tokens, word_shingles
from hive_json_spark.operators.util import ensure_parallelism

_MERSENNE_P = 4294967311  # prime > 2^32; universal-hash modulus

_SHINGLE_POLY = 1099511628211  # FNV-1a prime; shingle/band rolling-hash base


def _roll_py(vals) -> int:
    """Python twin of the kernel's numpy rolling hash: fold ``vals`` with
    the FNV polynomial mod 2^64, avalanche with the splitmix64 finalizer,
    then truncate to 32 bits. Must stay bit-identical to the uint64-wrap
    numpy path in ``banded_minhash`` — the precomputed-shingles branch
    uses this so both input paths yield the same signatures.

    The finalizer is load-bearing, not styling: the bare polynomial is
    AFFINE in the token hashes mod 2^32, and on a Zipfian corpus (huge
    shared-token mass) that structure produced systematically shared
    MinHash minima — measured 1.5× the pair mass and 2.4× the candidate
    volume of the crc32-of-string family at zipf-sf1 (max bucket 128 vs
    60). Avalanching restores an unstructured family."""
    M64 = 0xFFFFFFFFFFFFFFFF
    acc = 0
    for v in vals:
        acc = (acc * _SHINGLE_POLY + v) & M64
    acc = ((acc ^ (acc >> 30)) * 0xBF58476D1CE4E5B9) & M64
    acc = ((acc ^ (acc >> 27)) * 0x94D049BB133111EB) & M64
    acc = acc ^ (acc >> 31)
    return acc & 0xFFFFFFFF


def _round4_half_up(intersection: int, union: int) -> float:
    """4-dp ROUND of intersection/union in INTEGER space, half-up.

    floor((2*i*10^4 + u) / (2u)) / 10^4 — the one rounding definition
    shared by every Jaccard arm (prefix-filter integer verify, the Arrow
    verify kernels here) and the DuckDB ``ROUND(double, 4)`` oracles.
    Python's ``round`` is half-EVEN, so exact 4-dp halves (e.g. 17/32 =
    0.53125) would diverge between arms and from the oracle.
    """
    if union == 0:
        return 0.0
    return (2 * intersection * 10_000 + union) // (2 * union) / 10_000


def shingled_docs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    keep_text: bool = False,
) -> DataFrame:
    """``(id[, text], shingles array<string>)`` — the distinct n-word
    shingle SET per document, one Arrow kernel (py_tokens + set, the
    exact set ``word_shingles``/the verify kernels build). Compute it
    ONCE and pass via ``shingles_col=`` to ``shingle_jaccard_truth_pairs``
    / ``minhash_dedup_pairs`` when several arms consume the same corpus
    (the q_dedup_method_eval shape) — each arm then skips its own
    tokenize+shingle pass over identical text."""

    def kernel(batches):
        for pdf in batches:
            out = []
            for text in pdf[text_col]:
                toks = py_tokens(text)
                count = max(len(toks) - n + 1, 1)
                out.append(list({" ".join(toks[i : i + n]) for i in range(count)}))
            cols = {id_col: pdf[id_col]}
            if keep_text:
                cols[text_col] = pdf[text_col]
            cols["shingles"] = out
            yield pd.DataFrame(cols)

    fields = f"{id_col} bigint, "
    if keep_text:
        fields += f"{text_col} string, "
    fields += "shingles array<string>"
    return ensure_parallelism(df).select(id_col, text_col).mapInPandas(kernel, fields)


def content_hash_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: survivors = min(id) per md5(text). Returns (hash, id)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_md5"), F.col(id_col))
        .groupBy("content_md5")
        .agg(F.min(id_col).alias(id_col))
    )


def shingle_jaccard_truth_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.5,
    shingle_n: int = 3,
    impl: str = "equijoin",
    shingles_col: str | None = None,
) -> DataFrame:
    """EXACT shingle-set Jaccard ≥ threshold pairs — the all-pairs ground
    truth approximate dedup methods are graded against (the truth arm of
    q_dedup_method_eval, factored out).

    ``impl="equijoin"`` (default): join on every shared shingle hash and
    count intersections. Pair volume is Σ C(df_shingle, 2) — fine on the
    BOUNDED inputs an eval harness feeds it (measured 201k intermediate
    rows at 2000 docs), but corpus-QUADRATIC when common shingles exist
    (measured 128.5M rows / 216 s at sf1, max shingle df 141) — an
    acceptance harness's cost must not scale with the corpus, so callers
    bound the input, not this function.

    ``impl="prefix"``: the AllPairs/PPJoin prefix-filter core
    (``_set_similarity_pairs``) over shingle sets. Asymptotically safer
    on natural corpora (prefix = rarest shingles), but on this saturated
    synthetic corpus at t=0.5 the positional filters keep 18.6M
    candidates at sf1 and array verification costs more than the naive
    join — measured, which is why it is not the default. Both impls are
    lossless (identical output).

    Returns (id_a, id_b) with id_a < id_b.
    """
    sh_expr = (
        F.col(shingles_col)
        if shingles_col
        else F.array_distinct(word_shingles(text_col, shingle_n))
    )
    if impl == "prefix":
        base = ensure_parallelism(df).select(
            F.col(id_col).alias("_id"), sh_expr.alias("_tok")
        )
        return _set_similarity_pairs(
            base, threshold, salt_grid=1, impl="prefix", max_tokens=0
        ).select("id_a", "id_b")
    sharr = ensure_parallelism(df).select(
        F.col(id_col).alias("_id"), sh_expr.alias("_ss")
    )
    # carry each doc's set size THROUGH the explode instead of broadcast-
    # joining a sizes frame back on afterwards: the two broadcasts cost two
    # extra materialization jobs (each a driver collect of the sizes frame)
    # per call, while the carried size is one extra int per exploded row —
    # r10, measured faster both solo and inside the concurrent eval harness
    sh = sharr.select(
        "_id", F.size("_ss").alias("_sz"), F.explode("_ss").alias("_s")
    ).select("_id", "_sz", F.xxhash64("_s").alias("_h"))
    a = sh.select(F.col("_id").alias("id_a"), F.col("_sz").alias("_sa"), "_h")
    b = sh.select(F.col("_id").alias("id_b"), F.col("_sz").alias("_sb"), "_h")
    return (
        a.join(b, "_h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "_sa", "_sb")
        .agg(F.count("*").alias("_i"))
        .filter(
            F.col("_i").cast("double")
            >= threshold * (F.col("_sa") + F.col("_sb") - F.col("_i"))
        )
        .select("id_a", "id_b")
    )


def minhash_signature(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
    impl: str = "arrow",
) -> DataFrame:
    """MinHash signatures as ``(id, sig: array<bigint>)``.

    impl="arrow" (default): one Arrow-batched numpy kernel per partition —
    shingle + crc32 + vectorized (a·h+b) mod p mins. Measured ~3-4× faster
    than the JVM expression form both cold and warm, because Spark's
    higher-order array lambdas (the shingle build) evaluate interpreted
    with per-element boxing, and the 64-min aggregate pays heavy codegen
    compile per fresh JVM.

    impl="jvm": explode the shingle-hash array + num_perm codegen'd ``min``
    aggregates grouped by id; map-side partial agg means only
    (id, num_perm longs) per doc crosses the shuffle. Kept for
    Python-worker-free deployments.
    """
    df = ensure_parallelism(df)
    rnd = random.Random(seed)
    coeffs = [(rnd.randrange(1, 1 << 30), rnd.randrange(0, _MERSENNE_P)) for _ in range(num_perm)]

    if impl == "arrow":
        A = np.array([a for a, _ in coeffs], dtype=np.uint64)
        B = np.array([b for _, b in coeffs], dtype=np.uint64)
        n = shingle_n

        def kernel(batches):
            from zlib import crc32

            for pdf in batches:
                sigs = []
                for text in pdf[text_col]:
                    toks = py_tokens(text)
                    count = max(len(toks) - n + 1, 1)
                    sh = {" ".join(toks[i : i + n]) for i in range(count)}
                    hs = np.fromiter((crc32(s.encode()) for s in sh), dtype=np.uint64, count=len(sh))
                    sig = ((A[:, None] * hs[None, :] + B[:, None]) % _MERSENNE_P).min(axis=1)
                    sigs.append(sig.astype(np.int64))
                yield pd.DataFrame({id_col: pdf[id_col], "sig": sigs})

        return df.select(id_col, text_col).mapInPandas(
            kernel, f"{id_col} bigint, sig array<bigint>"
        )

    shingles = word_shingles(text_col, shingle_n)
    base = F.transform(shingles, lambda s: F.abs(F.hash(s)).cast("bigint") % F.lit(1 << 32))
    exploded = df.select(F.col(id_col), F.explode(base).alias("h"))
    mins = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(_MERSENNE_P)).alias(f"m{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    return (
        exploded.groupBy(id_col)
        .agg(*mins)
        .select(F.col(id_col), F.array(*[f"m{i}" for i in range(num_perm)]).alias("sig"))
    )


def banded_minhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_perm: int = 64,
    bands: int = 8,
    shingle_n: int = 3,
    seed: int = 42,
    keep_text: bool = False,
    keep_cols: Sequence[str] = (),
    shingles_col: str | None = None,
) -> DataFrame:
    """``(id, band, band_hash)`` rows — the LSH bucket keys, one Arrow
    kernel end-to-end (shingle → minhash → per-band hash). Fusing the
    banding into the signature kernel avoids `bands` codegen'd
    hash-of-concat expressions plus a posexplode: measured ~2× less
    cold-start than kernel+JVM banding, identical output volume
    (bands rows per doc crossing the shuffle).

    Shingle hashing is a rolling polynomial over per-token crc32 values
    (r7): the old form materialized every shingle STRING and crc32'd it —
    two Python string ops per shingle, which at zipf-sf10 made this
    kernel the dominant pipeline cost (51 s of 102). Token hashes are
    computed once per doc and windows combine arithmetically in numpy;
    band hashes fold signature rows with the same polynomial, vectorized
    across the whole Arrow batch. The hash FAMILY changes (LSH bucket
    keys only — candidate sets shift within the recall contract, the
    exact-Jaccard verify is untouched); measured 51 → ~8 s at zipf-sf10
    with LSH recall still 1.0 at every grading scale.

    ``shingles_col``: a precomputed ``shingled_docs`` array column — the
    kernel re-splits each shingle on the single space ``word_shingles``
    joined it with, so signatures are IDENTICAL to the text path (the
    shingle sets are the same and so are the rolling hashes)."""
    rnd = random.Random(seed)
    coeffs = [(rnd.randrange(1, 1 << 30), rnd.randrange(0, _MERSENNE_P)) for _ in range(num_perm)]
    A = np.array([a for a, _ in coeffs], dtype=np.uint64)
    B = np.array([b for _, b in coeffs], dtype=np.uint64)
    rows_per_band = num_perm // bands
    n = shingle_n

    extra = ([text_col] if keep_text else []) + list(keep_cols)

    def kernel(batches):
        from zlib import crc32

        POLY = np.uint64(_SHINGLE_POLY)  # uint64 arithmetic wraps mod 2^64
        MASK32 = np.uint64(0xFFFFFFFF)

        C1 = np.uint64(0xBF58476D1CE4E5B9)
        C2 = np.uint64(0x94D049BB133111EB)
        S30, S27, S31 = np.uint64(30), np.uint64(27), np.uint64(31)

        def finalize32(acc: np.ndarray) -> np.ndarray:
            # splitmix64 avalanche — see _roll_py for why this is required
            acc = (acc ^ (acc >> S30)) * C1
            acc = (acc ^ (acc >> S27)) * C2
            acc = acc ^ (acc >> S31)
            return np.unique(acc & MASK32)

        def rolling32(toks: list) -> np.ndarray:
            """Distinct 32-bit avalanched rolling-poly hashes of the
            n-token windows (one whole-list window when the doc is
            shorter than n — the same shingle count rule as
            ``word_shingles``/the verify kernel: max(len-n+1, 1))."""
            th = np.fromiter(
                (crc32(t.encode()) for t in toks), dtype=np.uint64, count=len(toks)
            )
            if len(toks) >= n:
                m = len(toks) - n + 1
                acc = th[0:m].copy()
                for j in range(1, n):
                    acc = acc * POLY + th[j : j + m]
            else:
                acc = np.zeros(1, dtype=np.uint64)
                for v in th:
                    acc = acc * POLY + v
            return finalize32(acc)

        for pdf in batches:
            src = pdf[shingles_col] if shingles_col else pdf[text_col]
            n_docs = len(pdf)
            sig_mat = np.empty((n_docs, num_perm), dtype=np.uint64)
            for row_ix, payload in enumerate(src):
                if shingles_col is not None:
                    # precomputed distinct shingles: same tokens, same
                    # rolling hash as the text path (split undoes the
                    # single-space join exactly — tokens contain no \s)
                    if len(payload):
                        hs = np.unique(
                            np.fromiter(
                                (
                                    _roll_py(
                                        crc32(t.encode()) for t in s.split(" ")
                                    )
                                    for s in payload
                                ),
                                dtype=np.uint64,
                                count=len(payload),
                            )
                        )
                    else:
                        hs = np.zeros(1, dtype=np.uint64)
                else:
                    hs = rolling32(py_tokens(payload))
                sig_mat[row_ix] = (
                    (A[:, None] * hs[None, :] + B[:, None]) % _MERSENNE_P
                ).min(axis=1)
            # band hashes: fold each band's signature rows with the same
            # polynomial, vectorized over (docs × bands) at once
            v = sig_mat.reshape(n_docs, bands, rows_per_band)
            bh = np.zeros((n_docs, bands), dtype=np.uint64)
            for j in range(rows_per_band):
                bh = bh * POLY + v[:, :, j]
            out = {
                id_col: np.repeat(pdf[id_col].to_numpy(), bands),
                "band": np.tile(np.arange(bands, dtype=np.int32), n_docs),
                "band_hash": (bh & np.uint64(0x7FFFFFFFFFFFFFFF))
                .astype(np.int64)
                .ravel(),
            }
            for c in extra:
                out[c] = np.repeat(pdf[c].to_numpy(), bands)
            yield pd.DataFrame(out)

    in_df = ensure_parallelism(df)
    types = {f.name: f.dataType.simpleString() for f in in_df.schema.fields}
    schema_parts = [f"{id_col} bigint", "band int", "band_hash bigint"] + [
        f"{c} {types[c]}" for c in extra
    ]
    payload_col = shingles_col if shingles_col else text_col
    return in_df.select(id_col, payload_col, *keep_cols).mapInPandas(
        kernel, ", ".join(schema_parts)
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_perm: int = 64,
    bands: int = 8,
    shingle_n: int = 3,
    seed: int = 42,
    shingles_col: str | None = None,
) -> DataFrame:
    """Banded-LSH candidate pairs (id_a < id_b), deduplicated across bands.

    bands=8 over 64 perms → rows-per-band 8 → collision threshold
    ≈ (1/8)^(1/8) ≈ 0.77 Jaccard. The bucket join shuffles only
    (band, band_hash, id) triples.
    """
    banded = banded_minhash(
        df, id_col, text_col, num_perm=num_perm, bands=bands, shingle_n=shingle_n, seed=seed,
        shingles_col=shingles_col,
    )
    left = banded.alias("a")
    right = banded.alias("b")
    return (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 8,
    shingle_n: int = 3,
    shingles_col: str | None = None,
) -> DataFrame:
    """LSH candidates verified with exact shingle-set Jaccard ≥ threshold.

    Verification joins the shingle arrays back on only the candidate ids —
    at scale this is the small side and broadcasts.

    ``shingles_col``: precomputed ``shingled_docs`` array column — both
    the signature kernel and the verify kernel consume it directly
    (no re-tokenize anywhere in this pipeline). Deliberately NOT derived
    internally when absent: the interpreted-HOF ``word_shingles`` costs
    more than the Python kernels' in-pass shingling (measured 3.6 s vs
    1.1 s for the whole signature phase at zipf-sf1), so JVM pre-shingling
    only pays when a caller already needs the arrays for something else
    (the dedup-method eval harness).
    """
    # Pin the candidate pairs: they are tiny (LSH collisions only) but the
    # plan references them twice, and each recompute would redo the whole
    # signature + band join.
    cands = lsh_candidate_pairs(
        df, id_col, text_col, num_perm=num_perm, bands=bands, shingle_n=shingle_n,
        shingles_col=shingles_col,
    ).persist()
    # Verification: join the texts of each side back onto the pairs (the
    # candidate side is small by construction, so AQE broadcasts it and the
    # corpus never shuffles), then one Arrow kernel computes exact
    # shingle-set Jaccard per pair. The corpus' shingle sets are never
    # materialized engine-side — only candidate pairs' texts cross into
    # Python, which is what keeps this viable at 100 TB.
    payload = df.select(id_col, shingles_col if shingles_col else text_col)
    pc = shingles_col if shingles_col else text_col
    paired = (
        cands.join(
            payload.withColumnRenamed(id_col, "id_a").withColumnRenamed(pc, "_ta"), "id_a"
        ).join(
            payload.withColumnRenamed(id_col, "id_b").withColumnRenamed(pc, "_tb"), "id_b"
        )
    )
    n = shingle_n
    pre_shingled = shingles_col is not None

    def verify(batches):
        for pdf in batches:
            # per-batch id -> frozenset cache: the r7 zipf-sf10 census
            # showed candidate volume is input-quadratic at the r=2 band
            # setting (84x candidates for 10x docs — organic cross-doc
            # Jaccard makes 2-row band collisions common), and a hot
            # document appears in MANY of those pairs. Shingling runs
            # once per (batch, id), not once per pair — the quadratic
            # term pays set-intersection cost only.
            cache: dict = {}

            def shingle_set(doc_id, payload_val):
                s = cache.get(doc_id)
                if s is None:
                    if pre_shingled:
                        s = frozenset(payload_val)
                    else:
                        toks = py_tokens(payload_val)
                        count = max(len(toks) - n + 1, 1)
                        s = frozenset(
                            " ".join(toks[i : i + n]) for i in range(count)
                        )
                    cache[doc_id] = s
                return s

            jac = []
            for ia, ib, ta, tb in zip(
                pdf["id_a"], pdf["id_b"], pdf["_ta"], pdf["_tb"]
            ):
                sa, sb = shingle_set(ia, ta), shingle_set(ib, tb)
                union = len(sa | sb)
                jac.append(_round4_half_up(len(sa & sb), union))
            yield pdf[["id_a", "id_b"]].assign(jaccard=jac)

    return (
        paired.mapInPandas(verify, "id_a bigint, id_b bigint, jaccard double")
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Append a 64-bit ``simhash`` column (Arrow-batched numpy UDF).

    Token hashes are blake2b-64 (stable across workers/runs, unlike
    Python's salted ``hash``); each bit of the simhash is the sign of the
    per-bit vote sum.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _simhash(texts: pd.Series) -> pd.Series:
        import hashlib

        out = np.empty(len(texts), dtype=np.int64)
        for i, text in enumerate(texts):
            if not text:
                out[i] = 0
                continue
            hs = np.fromiter(
                (
                    int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
                    for t in py_tokens(text)
                ),
                dtype=np.uint64,
            )
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            out[i] = np.int64(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64).astype(np.int64))
        return pd.Series(out)

    return df.withColumn("simhash", _simhash(F.col(text_col)))


def simhash_near_dup_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming via 16-bit-chunk
    blocking (≤3 differing bits ⇒ at least one of 4 chunks identical)."""
    # persist the (id, simhash) table: 16 bytes/doc, referenced by BOTH
    # sides of the self-join — without the pin each side re-runs the
    # Arrow hashing kernel over the full corpus (4 Python stages in the
    # plan instead of 1)
    sh = (
        simhash(ensure_parallelism(df), text_col, id_col)
        .select(id_col, "simhash")
        .persist()
    )
    chunks = F.array(
        *[
            F.shiftrightunsigned(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF)).alias(f"c{i}")
            for i in range(4)
        ]
    )
    blocked = sh.select(id_col, "simhash", F.posexplode(chunks).alias("chunk", "chunk_val"))
    a, b = blocked.alias("a"), blocked.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: Sequence[str],
    threshold: float,
    keep_block_cols: bool = False,
) -> DataFrame:
    """Exact token-set Jaccard for all pairs inside a blocking key.

    The blocking keys bound the quadratic term; at 100 TB the blocks come
    from cheap attributes (source, language, length bucket) so each block
    fits one task. SQL-expressible → oracle-checkable.

    keep_block_cols=True carries the blocking key on each emitted pair —
    downstream block-local operators (``blocked_components``) group on it
    without re-joining the corpus.
    """
    base = ensure_parallelism(df).select(
        F.col(id_col), *[F.col(c) for c in block_cols], F.col(text_col).alias("_txt")
    )
    a, b = base.alias("a"), base.alias("b")
    cond = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    extra = [F.col(f"a.{c}").alias(c) for c in block_cols] if keep_block_cols else []
    paired = a.join(b, cond).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        *extra,
        F.col("a._txt").alias("_ta"),
        F.col("b._txt").alias("_tb"),
    )

    # the block equi-join stays JVM (hash join on the block key); the
    # token-set Jaccard runs in one Arrow kernel — array_intersect /
    # array_union are CodegenFallback expressions (per-row boxed eval +
    # GC churn), while Python set ops over the same pairs are faster and
    # steady. Output values are identical (exact distinct-token Jaccard).
    keep = ["id_a", "id_b"]
    out_fields = "id_a bigint, id_b bigint"
    if keep_block_cols:
        by_name = {f.name: f for f in df.schema.fields}
        for c in block_cols:
            keep.append(c)
            out_fields += f", {c} {by_name[c].dataType.simpleString()}"
    out_fields += ", jaccard double"

    def verify(batches):
        for pdf in batches:
            jac = []
            for ta, tb in zip(pdf["_ta"], pdf["_tb"]):
                sa = set(py_tokens(ta))
                sb = set(py_tokens(tb))
                union = len(sa | sb)
                jac.append(_round4_half_up(len(sa & sb), union))
            yield pdf[keep].assign(jaccard=jac)

    return (
        paired.mapInPandas(verify, out_fields)
        .filter(F.col("jaccard") >= threshold)
    )


def _prefix_candidates(
    rbase: DataFrame, threshold: float, salt_grid: int
) -> DataFrame:
    """AllPairs/PPJoin candidate generation over (_id, _tok) rows: under a
    global token order (ascending document frequency — rarest first, ties
    by token), any pair with J >= t must share a token inside each side's
    prefix of length ``|x| - ceil(t*|x|) + 1``, so the inverted index is
    built over PREFIX tokens only and candidates come from one equi-join
    on the token. Returns distinct (id_a, id_b) candidate pairs — a
    superset of the true result, every true pair included (lossless)."""
    ex = rbase.select(
        "_id", F.size("_tok").alias("sz"), F.explode("_tok").alias("tok")
    )
    freq = ex.groupBy("tok").agg(F.count("*").alias("_df"))
    w = Window.partitionBy("_id").orderBy(F.col("_df").asc(), F.col("tok").asc())
    # localCheckpoint (eager): the prefix index self-joins below, and a
    # lazy plan recomputes the explode + frequency-join + window lineage
    # once per branch (measured 64 s vs 12 s at sf0.1). The index is the
    # SMALL artifact by design — a couple of rare tokens per doc (14 k
    # rows for 5 k docs), so pinning it is O(reps), never O(corpus).
    prefix = (
        ex.join(freq, "tok")
        .withColumn("_pos", F.row_number().over(w))
        .filter(
            F.col("_pos")
            <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + F.lit(1)
        )
        .select("_id", "tok", "sz", "_pos")
        .localCheckpoint()
    )
    # Grid-salting (salt_grid > 1) splits a hot prefix token's pair
    # production across G² independently scheduled cells: side a gets cell
    # row-index ga = hash(id) % G and replicates across all gb, side b gets
    # gb = hash(id) % G and replicates across all ga; joining on
    # (tok, ga, gb) lands every pair in exactly one cell (lossless). This
    # matters when the index is too big to broadcast and the join is
    # sort-merge keyed on the token: AQE's skew split can't divide a single
    # hot KEY, so one task would enumerate |bucket|² pairs. When the index
    # IS broadcast (the small-SF graded path), the stream side's even
    # partitioning already spreads pair production and salting only adds
    # G× probe overhead — so the default is unsalted and the at-scale
    # caller flips it on (covered by the salted-vs-unsalted equality test).
    if salt_grid > 1:
        grid = F.sequence(F.lit(0), F.lit(salt_grid - 1))
        a = (
            prefix.withColumn("_ga", F.pmod(F.hash("_id"), F.lit(salt_grid)))
            .withColumn("_gb", F.explode(grid))
            .alias("a")
        )
        b = (
            prefix.withColumn("_gb", F.pmod(F.hash("_id"), F.lit(salt_grid)))
            .withColumn("_ga", F.explode(grid))
            .alias("b")
        )
    else:
        a = prefix.withColumn("_ga", F.lit(0)).withColumn("_gb", F.lit(0)).alias("a")
        b = prefix.withColumn("_ga", F.lit(0)).withColumn("_gb", F.lit(0)).alias("b")
    # PPJoin positional filter: a match at prefix positions (pa, pb) caps
    # the achievable overlap at 1 + min(sa-pa, sb-pb); J >= t needs
    # overlap >= t*(sa+sb)/(1+t). The 1e-9 slack keeps the float bound
    # conservative (never prunes an exactly-qualifying pair).
    alpha = F.ceil(
        F.lit(threshold) * (F.col("a.sz") + F.col("b.sz")) / F.lit(1.0 + threshold)
        - F.lit(1e-9)
    )
    cand = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a._ga") == F.col("b._ga"))
            & (F.col("a._gb") == F.col("b._gb"))
            & (F.col("a._id") < F.col("b._id"))
            # length filter: J >= t forces min(|x|,|y|) >= t * max(|x|,|y|)
            & (
                F.least(F.col("a.sz"), F.col("b.sz"))
                >= F.lit(threshold) * F.greatest(F.col("a.sz"), F.col("b.sz"))
            )
            & (
                F.lit(1)
                + F.least(
                    F.col("a.sz") - F.col("a._pos"), F.col("b.sz") - F.col("b._pos")
                )
                >= alpha
            ),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    return cand


def _deletion_candidates(
    rbase: DataFrame, threshold: float, max_tokens: int
) -> DataFrame:
    """FastSS-style deletion-neighborhood candidate generation (Bocek et
    al., 2007, generalized from edit distance to set Jaccard): for J >= t,
    the non-shared token mass of a pair is bounded — dx + dy <= i(1-t)/t
    where dx = |x| - |x∩y| — so each side reaches the shared-set
    fingerprint fp(x∩y) by deleting at most D_x = floor(|x|(1-t)/t) of its
    tokens. Emit every <=D-deletion subset's hash per doc and equi-join on
    the hash: every true pair meets (at fp(x∩y), possibly deeper), and the
    join key is a uniform 64-bit hash — no hot tokens, no skew, no window.

    Candidate precision is structurally higher than prefix filtering when
    t is high: meeting requires an EXACT shared subset, not one shared
    (possibly frequent) token — measured at sf0.1/t=0.9, 68 k candidates
    (asymmetric L/S budgets, r9; the symmetric scheme emitted 322 k) vs
    1.7 M from the prefix index for the same 29 k true pairs. The cost
    is the neighborhood size C(sz, <=D), explosive for low t / long docs —
    callers get a plan-time guard (ValueError) instead of a blown-up job,
    and the general-threshold path stays `impl="prefix"`. xxhash64
    collisions only ever ADD a candidate; exact verification removes them.
    """
    d_max = int(max_tokens * (1 - threshold) / threshold)
    if d_max > 3:
        raise ValueError(
            f"impl='deletion' needs floor(max_tokens*(1-t)/t) <= 3 "
            f"(got {d_max} at t={threshold}, max_tokens={max_tokens}); "
            "use impl='prefix' for low thresholds or long documents"
        )
    sz = F.size("_tok")
    # runtime guard: docs longer than the static bound would silently miss
    # pairs — fail the job instead (raise_error evaluates only on bad rows)
    toks = F.when(
        sz > F.lit(max_tokens),
        F.raise_error(
            F.concat(
                F.lit("deletion-neighborhood join: doc exceeds max_tokens="),
                F.lit(str(max_tokens)),
            )
        ).cast("array<string>"),
    ).otherwise(F.array_sort("_tok"))
    # Subset hash by XOR algebra (r9): hash each token ONCE per doc, keep
    # the full-set XOR, and derive every deletion-subset hash as
    # total ⊕ (deleted tokens' hashes) — O(D) per combo instead of
    # re-hashing an O(sz) string concat per combo (the explode emits
    # C(sz,<=D) combos per doc, so this is the stage's hot loop). XOR is
    # order-independent, so equal remaining SETS always collide (lossless);
    # unequal sets collide only by 64-bit accident, and those extras are
    # removed by exact verification. The remaining-set SIZE joins alongside
    # the hash — free structural insurance that also shrinks hash buckets.
    th0 = F.transform(toks, lambda t: F.xxhash64(t))
    doc = rbase.select(
        "_id",
        sz.alias("sz"),
        th0.alias("_th"),
        F.aggregate(
            th0, F.lit(0).cast("long"), lambda acc, x: acc.bitwiseXOR(x)
        ).alias("_xall"),
    )

    def neighborhood(budget):
        """Explode ``doc`` into one row per <=budget-deletion subset:
        (_id, sz, _fph subset-XOR-hash, _rsz remaining size)."""
        idx = F.sequence(F.lit(0), F.col("sz") - 1)
        c0 = F.array(F.array().cast("array<int>"))
        c1 = F.transform(idx, lambda i: F.array(i))
        c2 = F.flatten(
            F.transform(
                idx,
                lambda i: F.transform(
                    F.filter(idx, lambda j: j > i), lambda j: F.array(i, j)
                ),
            )
        )
        c3 = F.flatten(
            F.flatten(
                F.transform(
                    idx,
                    lambda i: F.transform(
                        F.filter(idx, lambda j: j > i),
                        lambda j: F.transform(
                            F.filter(idx, lambda k: k > j),
                            lambda k: F.array(i, j, k),
                        ),
                    ),
                )
            )
        )
        empty = F.array().cast("array<array<int>>")
        combos = F.concat(
            c0,
            F.when(budget >= 1, c1).otherwise(empty),
            F.when(budget >= 2, c2).otherwise(empty),
            F.when(budget >= 3, c3).otherwise(empty),
        )
        return doc.select(
            "_id", "sz", "_th", "_xall", F.explode(combos).alias("_del")
        ).select(
            "_id",
            "sz",
            F.aggregate(
                F.col("_del"),
                F.col("_xall"),
                lambda acc, i: acc.bitwiseXOR(F.element_at(F.col("_th"), i + 1)),
            ).alias("_fph"),
            (F.col("sz") - F.size("_del")).alias("_rsz"),
        )

    # Asymmetric role budgets (r9, PPJoin-style length tightening applied
    # to FastSS): orient every qualifying pair as (L = larger set, S =
    # smaller set; ties by id). Both sides must delete down to the SAME
    # meet subset T ⊆ x∩y, so per-role worst-case budgets follow from
    # i_min(|x|,|y|) = ceil(t(|x|+|y|)/(1+t)) maximized over the partner
    # sizes the length filter admits (i_min grows with partner size, so
    # dx peaks at the smallest partner and dy at the equal-size partner):
    #   D_L(sz) = sz - i_min(sz, ceil(t*sz))
    #   D_S(sz) = sz - i_min(sz, sz) = sz - ceil(2t*sz/(1+t))
    # D_S is (1-t)/(1+t)*sz — at t=0.9 a 31-token doc emits 32 S-rows vs
    # ~5000 symmetric rows, and a pair's DEEPER common subsets blow the S
    # budget, so each pair now meets ~once: the join emits near-distinct
    # pairs instead of 10x duplicates (measured 3.1M -> 0.4M emissions at
    # sf0.1), halving the shuffle and gutting the distinct. Lossless: the
    # meet at exactly T = x∩y satisfies both budgets whenever J >= t.
    # the 1e-9 slack keeps each ceil conservative under float noise: a
    # mathematically-integer bound must not round UP (that would shrink a
    # budget and silently drop a qualifying pair); rounding DOWN by the
    # slack only enlarges a budget, and verification removes the extras
    tt = F.lit(threshold)
    eps = F.lit(1e-9)
    d_l = (
        F.col("sz")
        - F.ceil(
            tt * (F.col("sz") + F.ceil(tt * F.col("sz") - eps)) / F.lit(1 + threshold)
            - eps
        )
    ).cast("int")
    d_s = (
        F.col("sz")
        - F.ceil(F.lit(2) * tt * F.col("sz") / F.lit(1 + threshold) - eps)
    ).cast("int")
    # pin a SHUFFLE join: the planner sizes the neighborhoods from their
    # rep-sized source and under-estimates the explode fanout, so left
    # unhinted it BROADCASTS the L-neighborhood — the one frame here that
    # is NOT small (C(sz,<=D) rows per doc; a driver OOM at scale and
    # measured 30% slower even at sf0.1). shuffle_hash beats merge's sort;
    # the key is a uniform xxhash64 so partitions can't skew, and
    # per-partition build sides stay bounded.
    a = neighborhood(d_l).hint("shuffle_hash").alias("a")
    b = neighborhood(d_s).alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._fph") == F.col("b._fph"))
            & (F.col("a._rsz") == F.col("b._rsz"))
            # orientation: a is the strictly larger set, or same-size with
            # the smaller id — each qualifying pair matches exactly one way
            & (
                (F.col("a.sz") > F.col("b.sz"))
                | ((F.col("a.sz") == F.col("b.sz")) & (F.col("a._id") < F.col("b._id")))
            )
            # length filter: J >= t forces min(|x|,|y|) >= t * max(|x|,|y|)
            & (F.col("b.sz") >= tt * F.col("a.sz")),
        )
        .select(
            F.least("a._id", "b._id").alias("id_a"),
            F.greatest("a._id", "b._id").alias("id_b"),
        )
        .distinct()
    )
    return cand


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    salt_grid: int = 1,
    impl: str = "prefix",
    max_tokens: int = 35,
    tokens_col: str | None = None,
) -> DataFrame:
    """Exact token-set Jaccard join with NO blocking key.

    ``ngram_jaccard_pairs`` bounds its quadratic term with caller-supplied
    blocking attributes; when no cheap attribute exists this operator gets
    the same exact answer from the similarity threshold itself, in three
    stages that all keep per-task work bounded:

    1. Identical-set collapse — documents with equal distinct-token sets
       are interchangeable under Jaccard, so the quadratic core runs on
       one representative per set.
    2. Candidate generation — ``impl="prefix"``: AllPairs/PPJoin prefix
       filtering (Bayardo/Ma/Srikant WWW'07; Xiao et al. VLDB'08), any
       threshold; ``impl="deletion"``: FastSS deletion-neighborhood join,
       far tighter candidates for high thresholds (see the helpers).
    3. Exact verification of candidates + expansion back to member ids.

    Lossless for either impl: the result equals the all-pairs filter.

    ``impl="auto"`` (r6, added when the Zipfian-vocabulary census fired
    the deletion guard): one cheap probe — max distinct-token count over
    the corpus — dispatches to the deletion impl when every doc fits its
    static bound (floor(max_tokens·(1-t)/t) ≤ 3) and to the prefix impl
    otherwise. Both impls are lossless, so the dispatch never changes
    output. The small-vocab corpus (≤31 distinct tokens/doc) takes the
    deletion path; realistic vocabularies (up to 100 distinct tokens at
    the same doc lengths) exceed the bound and take the prefix path
    instead of failing the plan-time guard.

    Scale shape (100 TB): the exploded (id, token) frame joins the
    token-frequency table on the token (shuffle carries ids + tokens, not
    text); per-doc prefix selection is a doc-partitioned window; the
    candidate join shuffles only prefix postings — rare tokens by
    construction, so posting lists are short exactly where a naive token
    join explodes (stopwords land in the discarded suffix). When the index
    outgrows broadcast and residual hot prefix tokens (tiny vocabularies,
    template boilerplate) would serialize pair production into one
    sort-merge task, ``salt_grid=G`` decomposes the self-join into G²
    independent cells (see inline note) — per-task work stays bounded no
    matter how degenerate the token distribution. The deletion impl's join
    key is a uniform hash, skew-free by construction.
    Verification touches candidate pairs only, JVM-side, in exact integer
    arithmetic (no float accumulation, no Python round).
    """
    # ``tokens_col=``: callers that already hold the DISTINCT token set
    # (e.g. _blocked_jaccard_pairs' block-prefixed arrays) pass it directly
    # — skipping the rebuild-a-string + second regex tokenize round trip
    # (measured 4.5 → 3.0 s for the base build at sf1). Same contract as
    # shingle_jaccard_truth_pairs' shingles_col: the column must be the
    # distinct-set array the default expression would produce.
    tok_expr = (
        F.col(tokens_col) if tokens_col else F.array_distinct(tokens(text_col))
    )
    base = ensure_parallelism(df).select(
        F.col(id_col).alias("_id"),
        tok_expr.alias("_tok"),
    # token-less documents leave the join: Jaccard over two empty sets is
    # 0/0, and before the r7 tokenizer unification (single-space split
    # kept "" as a token) the identical-set collapse would have paired
    # empty docs at jaccard=1 while any token-join formulation (the
    # oracle's shape) can never produce them
    ).filter(F.size("_tok") > 0)
    # Materialize the tokenized corpus ONCE: the fingerprint groupBy and
    # the member-map join each consume `base` (r9: the auto-dispatch probe
    # rides the rep frame and the rep base falls out of the groups
    # checkpoint, so consumers fell 3 -> 2), and without this each re-runs
    # the regex tokenize over the full corpus (r7 census find: 3+
    # evaluations × ~18 s at zipf-sf10 — the dominant cost of the whole
    # join). persist(MEMORY_AND_DISK), NOT
    # localCheckpoint: this frame is CORPUS-sized, and checkpoint blocks
    # are non-evictable and survive catalog.clearCache(), so back-to-back
    # heavy queries accumulated them until the 8g JVM OOMed (measured:
    # the r7 census died in the query AFTER two of these checkpoints).
    # Persisted blocks evict under pressure (lineage intact → recompute,
    # never wrong) and release with the cache. members/rbase below stay
    # checkpoints — they are rep-sized, not corpus-sized. scoped_persist
    # registers the frame so the graded wrapper unpersists it when the
    # next query starts (r7 ADVICE: a bare persist leaked one resident
    # corpus cache per invocation for callers that never clearCache()).
    from hive_json_spark.functions.caching import scoped_persist

    base = scoped_persist(base)
    return _set_similarity_pairs(base, threshold, salt_grid, impl, max_tokens)


def _set_similarity_pairs(
    base: DataFrame, threshold: float, salt_grid: int, impl: str, max_tokens: int
) -> DataFrame:
    """Collapse + candidate-gen + exact-verify + expansion over (_id, _tok)
    set rows — the shared core of ``prefix_filter_jaccard_pairs`` (token
    sets) and ``shingle_jaccard_truth_pairs`` (shingle sets)."""
    # Identical-set collapse: Jaccard only sees the distinct-token SET, so
    # documents with equal sets are interchangeable — group them by a
    # sorted-set fingerprint and run the quadratic machinery on one
    # representative (min id) per group. Lossless: intra-group pairs are
    # exactly the J=1.0 >= t pairs (equal sets ⟺ J=1), and every
    # cross-group pair's Jaccard equals its representatives' Jaccard.
    # Templated corpora (and the exact-duplicate mass every 100 TB crawl
    # carries) shrink both the candidate join (quadratic in |reps|, not
    # |docs|) and per-pair verification (29 k rep pairs vs 965 k doc pairs
    # measured at sf0.1); the expansion back to document ids is two
    # equi-joins that emit exactly the final rows.
    #
    # r9 fusion (was: a per-_fp window pass for the member map + a corpus
    # join for rep selection = two passes over the tokenized cache and a
    # row-per-doc window sort): ONE partial-aggregating groupBy(_fp) emits
    # both the representative id (min) and the representative token set
    # (min_by) — map-side combine means the exchange carries one row per
    # (partition, fingerprint), never per doc, and rbase falls out of the
    # checkpoint for free. The member map then joins the cached corpus
    # against the rep-sized groups frame (AQE broadcasts it while it fits;
    # beyond broadcast it degrades to the same _fp-keyed shuffle the old
    # window needed). localCheckpoint pins groups (rep token sets) and
    # members (3 longs/row) — both bounded, never corpus token arrays.
    fpd = base.select(
        "_id", "_tok", F.md5(F.concat_ws("\x01", F.array_sort("_tok"))).alias("_fp")
    )
    # repartition BEFORE the checkpoint: AQE coalesces the rep-sized agg
    # output to one partition, and the checkpoint would freeze that — the
    # neighborhood/prefix explode downstream (the compute-heavy stage)
    # would then run single-task (measured 35 s vs 4 s at sf0.1). The
    # round-robin moves only rep rows.
    from pyspark.sql import Observation

    n_parts = fpd.sparkSession.sparkContext.defaultParallelism
    gsrc = fpd.groupBy("_fp").agg(
        F.min("_id").alias("_grp"),
        F.min_by("_tok", "_id").alias("_tok"),
    ).repartition(n_parts)
    # auto-dispatch probe rides the groups CHECKPOINT as an observed
    # metric (r11; was its own .agg().first() job after it — observations
    # fire on localCheckpoint, verified + test-pinned): max |tok| over
    # representatives == max over all docs because identical sets have
    # identical sizes. Only attached when the static budget bound can
    # hold at all; otherwise the dispatch is decided at plan time.
    gobs = None
    if impl == "auto":
        if int(max_tokens * (1 - threshold) / threshold) <= 3:
            gobs = Observation()
            gsrc = gsrc.observe(
                gobs, F.coalesce(F.max(F.size("_tok")), F.lit(0)).alias("m")
            )
        else:
            impl = "prefix"
    groups = gsrc.localCheckpoint()
    rbase = groups.select(F.col("_grp").alias("_id"), "_tok")
    # the member-map size rides ITS checkpoint the same way (r11; was a
    # members.count() job — metadata-cheap but still a driver round trip)
    mobs = Observation()
    members = (
        fpd.select("_id", "_fp")
        .join(groups.select("_fp", "_grp"), "_fp")
        .select("_id", "_grp")
        .observe(mobs, F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    if gobs is not None:
        impl = "deletion" if gobs.get["m"] <= max_tokens else "prefix"
    if impl == "deletion":
        cand = _deletion_candidates(rbase, threshold, max_tokens)
    else:
        cand = _prefix_candidates(rbase, threshold, salt_grid)
    # Verify on candidates only (representative pairs). Intersection/union
    # are exact ints; the 4-dp rounding happens in INTEGER space
    # (floor((2*i*10^4 + u) / (2u)) = round-half-up, matching SQL ROUND)
    # so no Python banker's-rounding or float-accumulation flip can split
    # Spark from the oracle.
    ta = rbase.select(F.col("_id").alias("id_a"), F.col("_tok").alias("_ta"))
    tb = rbase.select(F.col("_id").alias("id_b"), F.col("_tok").alias("_tb"))
    i = F.size(F.array_intersect(F.col("_ta"), F.col("_tb"))).cast("long")
    u = (F.size("_ta") + F.size("_tb")).cast("long") - i
    rounded = F.floor((F.lit(2) * i * F.lit(10_000) + u) / (F.lit(2) * u)) / F.lit(10_000.0)
    rep_pairs = (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a",
            "id_b",
            i.alias("_i"),
            u.alias("_u"),
            rounded.alias("jaccard"),
        )
        .filter(F.col("_i") >= F.lit(threshold) * F.col("_u"))
        .select("id_a", "id_b", "jaccard")
    )
    # Expand representatives back to document ids, cross-group and
    # intra-group in ONE pair of joins (r9; was a separate members
    # self-join for the intra pairs — two more shuffles): every group is
    # appended as a SELF rep-pair (grp, grp, J=1.0 — equal sets ⟺ J=1,
    # and 1.0 is what the integer rounding yields at i == u, so the value
    # matches the unpruned oracle bit-for-bit), and the same
    # members(A) x members(B) expansion then emits intra pairs too. The
    # _da < _db guard applies only to self-pairs: it dedupes the (x,y) /
    # (y,x) double emission there (singleton groups emit nothing), while
    # cross-group pairs keep both-orientation safety via least/greatest
    # (group membership does not follow rep order). The joins emit exactly
    # the final rows, no over-generation.
    self_pairs = groups.select(
        F.col("_grp").alias("id_a"),
        F.col("_grp").alias("id_b"),
        F.lit(1.0).alias("jaccard"),
    )
    all_pairs = rep_pairs.unionByName(self_pairs)
    ma = members.select(F.col("_grp").alias("id_a"), F.col("_id").alias("_da"))
    mb = members.select(F.col("_grp").alias("id_b"), F.col("_id").alias("_db"))
    # The member map's size arrived with its checkpoint's observed metric
    # (exact row count, no extra job): broadcast it below the pinned
    # bound — at graded scale this removes all four expansion shuffles —
    # and fall back to the sort-merge joins when the corpus outgrows it
    # (members is doc-count-sized; 2M rows ≈ 32 MB broadcast is the
    # comfortable ceiling, same adaptive-dispatch pattern as impl="auto").
    if mobs.get["n"] <= 2_000_000:
        ma, mb = F.broadcast(ma), F.broadcast(mb)
    return (
        all_pairs.join(ma, "id_a")
        .join(mb, "id_b")
        .filter((F.col("id_a") != F.col("id_b")) | (F.col("_da") < F.col("_db")))
        .select(
            F.least("_da", "_db").alias("id_a"),
            F.greatest("_da", "_db").alias("id_b"),
            "jaccard",
        )
    )


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    *,
    max_dist: int = 2,
    block_cols: Sequence[str] = (),
    max_len: int = 40,
) -> DataFrame:
    """Exact edit-distance ≤ ``max_dist`` pairs via character-level deletion
    neighborhoods (FastSS, Bocek et al. 2007) — the scale-safe replacement
    for a blocked quadratic self-join when the blocking attributes have
    FIXED cardinality (nation × segment = 125 blocks forever, so block
    pair volume grows with corpus², the ngram_jaccard trap).

    Soundness: if lev(x, y) ≤ k, deleting from each side the ≤ k
    characters an optimal alignment leaves unmatched yields the SAME
    string, so the ≤ k-deletion neighborhoods intersect. Candidate
    generation is therefore an equi-join on ONE bigint column:
    xxhash64(variant, *block_cols) — the block columns are folded into
    the hash, and equal variants imply equal variant length, so neither
    blocks nor a length band need to ride the shuffle. Hash collisions
    (including cross-block ones) only ever ADD candidates: the verify
    step re-fetches the strings AND the block columns for the
    output-sized distinct id pairs and applies the exact block equality
    plus the thresholded 3-arg ``levenshtein``, so the result is
    identical to the all-pairs predicate.

    Scale: neighborhood size is 1 + L + C(L, 2) per row (~172 for
    18-char keys) — per-row constant fanout, one equi-join shuffle,
    linear in corpus. The shuffled variant row is exactly (_eid, _vh) —
    two longs, so the sort-merge join's per-side sort takes the radix
    fast path and the shuffle moves ~3-4x fewer bytes than a frame that
    drags the strings through (the r8 rewrite: the join output was
    measured output-sized at every scale — 8.8k candidates from 23.7M
    variants at zipf-sf1 — so the join's cost was entirely the sorted
    bytes, 172 s → 46 s at zipf-sf10 quiet-host (decade_refresh_r8.json),
    identical 10,499-pair output). Strings longer than ``max_len``
    raise at runtime (raise_error evaluates only on offending rows)
    instead of silently exploding the variant count; long-key workloads
    want the q-gram / PassJoin route instead.

    Returns (id_a, id_b, lev) with id_a < id_b and lev the true distance.
    """
    if max_dist not in (1, 2):
        raise ValueError(f"max_dist must be 1 or 2 (got {max_dist})")
    s0 = F.coalesce(F.col(str_col).cast("string"), F.lit(""))
    guarded = F.when(
        F.length(s0) > F.lit(max_len),
        F.raise_error(
            F.concat(
                F.lit(f"edit_distance_pairs: string exceeds max_len={max_len}: "),
                s0,
            )
        ).cast("string"),
    ).otherwise(s0)
    # ensure_parallelism BEFORE the 172x explode: a single-file scan is
    # one input partition, and the variant fanout multiplies whatever
    # parallelism the scan had — the r6 Zipf census measured the explode
    # running 28 s on ONE core at sf1 (26M variants) because this was
    # missing; repartitioned it is ~1 s on local[32].
    base = ensure_parallelism(
        df.select(
            F.col(id_col).alias("_eid"),
            guarded.alias("_s"),
            *[F.col(c) for c in block_cols],
        )
    )
    s = F.col("_s")
    sL = F.length("_s")
    idx = F.when(sL > 0, F.sequence(F.lit(0), sL - 1)).otherwise(
        F.array().cast("array<int>")
    )

    def _del1(i):
        # drop 0-based position i: s[0:i] + s[i+1:]
        return F.concat(F.substr(s, F.lit(1), i), F.substr(s, i + 2, sL))

    def _del2(i, j):
        # drop 0-based positions i < j
        return F.concat(
            F.substr(s, F.lit(1), i),
            F.substr(s, i + 2, j - i - 1),
            F.substr(s, j + 2, sL),
        )

    parts = [F.array(s), F.transform(idx, _del1)]
    if max_dist >= 2:
        parts.append(
            F.flatten(
                F.transform(
                    idx,
                    lambda i: F.transform(
                        F.filter(idx, lambda j: j > i), lambda j: _del2(i, j)
                    ),
                )
            )
        )
    vrows = base.select(
        "_eid",
        *block_cols,
        F.explode(F.array_distinct(F.concat(*parts))).alias("_v"),
    ).select(
        "_eid",
        F.xxhash64("_v", *[F.col(c) for c in block_cols]).alias("_vh"),
    )
    # Catalyst sizes explode output at the pre-explode estimate, so left to
    # itself it BROADCASTS the ~C(L,2)×|rows| variant frame (3.1 GiB at
    # sf1). Pin the strategy: SORT-MERGE self-join on the variant hash —
    # unlike shuffle_hash (r5), SMJ never materializes a per-partition
    # hash map of the build side, it SPILLS: the r6 Zipfian census OOMed
    # the r5 hint ("not enough memory to build hash map" — 26M variant
    # rows split over 32 partitions exceeds the 8 GiB local JVM's
    # per-task execution memory; incompressible non-sequential names
    # tipped what sequential names just fit). Same shuffle, same output;
    # the sort is on the join key the shuffle already clustered.
    a, b = vrows.alias("a"), vrows.hint("merge").alias("b")
    cand = (
        a.join(b, (F.col("a._vh") == F.col("b._vh")) & (F.col("a._eid") < F.col("b._eid")))
        .select(F.col("a._eid").alias("id_a"), F.col("b._eid").alias("id_b"))
        .distinct()
    )
    # re-fetch strings + blocks for the OUTPUT-SIZED candidate set (AQE
    # turns these into broadcast joins of the small pair frame at
    # runtime), then verify exactly: block equality + thresholded
    # levenshtein — this is where hash collisions die, so the folded-hash
    # join above needs no residual conditions at shuffle width.
    side_a = base.select(
        F.col("_eid").alias("id_a"),
        F.col("_s").alias("_sa"),
        *[F.col(c).alias(f"_ba_{c}") for c in block_cols],
    )
    side_b = base.select(
        F.col("_eid").alias("id_b"),
        F.col("_s").alias("_sb"),
        *[F.col(c).alias(f"_bb_{c}") for c in block_cols],
    )
    verified = cand.join(side_a, "id_a").join(side_b, "id_b")
    for c in block_cols:
        verified = verified.filter(F.col(f"_ba_{c}") == F.col(f"_bb_{c}"))
    return verified.select(
        "id_a", "id_b", F.levenshtein("_sa", "_sb", max_dist).alias("lev")
    ).filter(F.col("lev") >= 0)


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    impl: str = "auto",
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    max_exact_rows: int = 1_000_000,
    n_tables: int = 24,
    max_bucket_rows: int = 32_768,
    row_chunk: int = 1024,
    col_block: int = 4096,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine similarity.

    impl="auto" (default): size-dispatched — the exact GEMM path while the
    corpus fits under ``max_exact_rows`` (probed with a limit+count
    early-out scan, not a full count), the LSH path above it. The operator
    is scale-safe BY DEFAULT: at 100 TB the same call silently takes the
    bucketed path instead of refusing or OOMing, trading boundary-pair
    recall for a bounded shuffle.

    impl="exact": the oracle-able all-pairs baseline. The corpus matrix is
    normalized once, broadcast, and each partition computes its rows × all
    columns as one float64 GEMM — O(n²) work but BLAS throughput, never
    interpreted per-element expression eval. The broadcast bounds this
    variant to corpora that fit executor memory (~10⁷ × dim floats), so it
    refuses corpora above ``max_exact_rows`` instead of silently
    materializing an unbounded corpus on the driver.

    impl="lsh": OR-amplified hyperplane LSH — the 100 TB path.
    ``n_tables`` independent tables of ``n_planes`` sign-bits each (r10;
    the r9 single-table form had 3% recall at the graded threshold 0.4 —
    one 8-bit agreement is a (1-θ/π)^8 ≈ 0.03 event for θ ≈ 66°, so
    amplification across tables is REQUIRED for weak-similarity mining,
    recall 1-(1-p^k)^L). Three stages, two exchanges:

    1. one Arrow kernel computes all L bucket ids per vector — a single
       (batch × dim)·(dim × L·k) GEMM + bit-pack — and explodes to
       (table, bucket, id, vec);
    2. one shuffle co-locates each (table, bucket); pairs are verified
       INSIDE the bucket with a row-blocked float64 GEMM
       (``applyInPandas``) — candidate pairs never materialize as rows,
       only survivors ≥ threshold leave the kernel;
    3. a pair-level groupBy dedups pairs found by multiple tables.

    Cost is L× the corpus through one shuffle plus Σ-per-bucket O(b²·dim)
    BLAS — the standard multi-table LSH trade. A bucket larger than
    ``max_bucket_rows`` fails loudly (its O(b²) verify would dominate and
    the grouped pdf must fit a worker): raise ``n_planes`` (more, smaller
    buckets) rather than the cap. Verified cosines are computed from the
    same float64 vectors as impl="exact"; output is always a subset of
    the exact arm's pairs.
    """
    if impl == "lsh":
        rng = np.random.RandomState(seed)
        planes = rng.randn(n_tables, n_planes, dim)
        P = planes.reshape(n_tables * n_planes, dim)
        L, k = n_tables, n_planes
        pack = (np.uint64(1) << np.arange(k, dtype=np.uint64))[None, None, :]

        def bucket_kernel(batches):
            for pdf in batches:
                n = len(pdf)
                if not n:
                    continue
                V = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                )
                bits = (V @ P.T > 0).reshape(n, L, k)
                bkt = (bits.astype(np.uint64) * pack).sum(axis=2).astype(np.int64)
                ix = np.repeat(np.arange(n), L)
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col].to_numpy(dtype=np.int64)[ix],
                        "_tbl": np.tile(np.arange(L, dtype=np.int32), n),
                        "_bkt": bkt.ravel(),
                        vec_col: pdf[vec_col].iloc[ix].to_numpy(),
                    }
                )

        elem_t = next(
            f.dataType.simpleString()
            for f in df.schema.fields
            if f.name == vec_col
        )
        bucketed = ensure_parallelism(df).select(id_col, vec_col).mapInPandas(
            bucket_kernel,
            f"{id_col} bigint, _tbl int, _bkt bigint, {vec_col} {elem_t}",
        )

        def verify(pdf: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame(
                {
                    "id_a": np.array([], dtype=np.int64),
                    "id_b": np.array([], dtype=np.int64),
                    "cos_sim": np.array([], dtype=np.float64),
                }
            )
            n = len(pdf)
            if n < 2:
                return empty
            if n > max_bucket_rows:
                raise ValueError(
                    f"embedding_near_dup_pairs(impl='lsh'): bucket of {n} rows "
                    f"exceeds max_bucket_rows={max_bucket_rows}; raise n_planes "
                    "so buckets split further (the per-bucket verify is O(b^2))"
                )
            pdf = pdf.sort_values(id_col)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            M = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
            out = []
            step = 2048
            col_ix = np.arange(n)
            for i0 in range(0, n, step):
                i1 = min(i0 + step, n)
                S = np.round(M[i0:i1] @ M.T, 6)
                keep = (S >= threshold) & (col_ix[None, :] > np.arange(i0, i1)[:, None])
                ri, ci = np.nonzero(keep)
                if len(ri):
                    out.append(
                        pd.DataFrame(
                            {
                                "id_a": ids[ri + i0],
                                "id_b": ids[ci],
                                "cos_sim": S[ri, ci],
                            }
                        )
                    )
            return pd.concat(out) if out else empty

        return (
            bucketed.groupBy("_tbl", "_bkt")
            .applyInPandas(verify, "id_a bigint, id_b bigint, cos_sim double")
            .groupBy("id_a", "id_b")
            .agg(F.max("cos_sim").alias("cos_sim"))
        )

    if impl not in ("auto", "exact"):
        raise ValueError(f"embedding_near_dup_pairs: unknown impl={impl!r}")
    probe = df.select(id_col).limit(max_exact_rows + 1).count()
    if probe > max_exact_rows:
        if impl == "auto":
            return embedding_near_dup_pairs(
                df,
                id_col,
                vec_col,
                threshold,
                "lsh",
                n_planes,
                dim,
                seed,
                n_tables=n_tables,
                max_bucket_rows=max_bucket_rows,
            )
        raise ValueError(
            f"embedding_near_dup_pairs(impl='exact'): corpus exceeds "
            f"max_exact_rows={max_exact_rows}; the exact all-pairs baseline "
            f"materializes the corpus matrix on the driver and does not scale "
            f"past that — use impl='lsh' (bucketed, no driver materialization) "
            f"or raise max_exact_rows explicitly if the driver has the memory."
        )
    rows = df.select(id_col, vec_col).collect()
    if not rows:  # empty corpus: np.linalg.norm(axis=1) rejects a 0-d stack
        return df.sparkSession.createDataFrame(
            [], "id_a bigint, id_b bigint, cos_sim double"
        )
    ids_all = np.fromiter((r[0] for r in rows), dtype=np.int64, count=len(rows))
    M = np.array([r[1] for r in rows], dtype=np.float64)
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
    bcast = df.sparkSession.sparkContext.broadcast((ids_all, M))

    def kernel(batches):
        # blocked scores in preallocated buffers (r10, same rationale as
        # similarity.brute_force_top1_gemm): the one-shot V @ bm.T form
        # materializes three batch×corpus transients (scores + two bool
        # masks) that numpy munmaps on free, so every execution re-faults
        # the pages — pathological under 32 concurrent workers on this
        # host. Block emission changes only intra-batch row ORDER (pairs
        # come out block-major), which nothing downstream observes.
        bids, bm = bcast.value
        n_corpus = bm.shape[0]
        # two reallocate-on-shape-change buffers (not a dict keyed by
        # shape): a stream of varying batch/tail sizes must stay bounded
        # at two live buffers, same scheme as brute_force_top1_gemm
        S_full = np.empty((0, 0))
        S_tail = np.empty((0, 0))
        for pdf in batches:
            if not len(pdf):
                continue
            ida_all = pdf[id_col].to_numpy(dtype=np.int64)
            V_all = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            V_all /= np.maximum(
                np.linalg.norm(V_all, axis=1, keepdims=True), 1e-300
            )
            for r0 in range(0, len(V_all), row_chunk):
                V = V_all[r0 : r0 + row_chunk]
                ida = ida_all[r0 : r0 + row_chunk]
                nb = len(V)
                for c0 in range(0, n_corpus, col_block):
                    c1 = min(c0 + col_block, n_corpus)
                    if c1 - c0 == col_block:
                        if S_full.shape != (nb, col_block):
                            S_full = np.empty((nb, col_block))
                        S = S_full
                    else:
                        if S_tail.shape != (nb, c1 - c0):
                            S_tail = np.empty((nb, c1 - c0))
                        S = S_tail
                    np.dot(V, bm[c0:c1].T, out=S)
                    np.round(S, 6, out=S)
                    keep = (S >= threshold) & (
                        ida[:, None] < bids[None, c0:c1]
                    )
                    ii, jj = np.nonzero(keep)
                    if len(ii):
                        yield pd.DataFrame(
                            {
                                "id_a": ida[ii],
                                "id_b": bids[jj + c0],
                                "cos_sim": S[ii, jj],
                            }
                        )

    return (
        ensure_parallelism(df)
        .select(id_col, vec_col)
        .mapInPandas(kernel, "id_a bigint, id_b bigint, cos_sim double")
    )


def blocked_components(
    pairs: DataFrame,
    block_cols: Sequence[str],
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Connected components when every edge lives INSIDE a blocking key
    (the shape block-bounded pair generators like ``ngram_jaccard_pairs``
    emit): one union-find pass per block replaces the iterative min-label
    propagation of ``dedup_clusters`` — a single shuffle of the (sparse)
    pair frame, zero rounds, no checkpoints.

    cluster_id = min node id in the component (union by smaller root, so
    the final root IS the minimum — identical labels to dedup_clusters).

    Scale bound: per-task state ∝ distinct nodes appearing in one block's
    pairs — the same block-fits-a-task bound the quadratic pair generation
    already assumes, and usually far smaller (near-dup nodes only). For
    graphs whose edges CROSS blocks, use ``dedup_clusters`` (generic
    iterative) or GraphFrames at billion-edge scale.
    """
    import pandas as pd

    def uf(pdf: "pd.DataFrame") -> "pd.DataFrame":
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for a, b in zip(pdf[id_a], pdf[id_b]):
            a, b = int(a), int(b)
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra == rb:
                continue
            if ra < rb:  # union by min root → root stays the component min
                parent[rb] = ra
            else:
                parent[ra] = rb

        nodes = sorted(parent)
        return pd.DataFrame(
            {"doc_id": nodes, "cluster_id": [find(n) for n in nodes]}
        )

    # Project to ids + ONE hashed group key BEFORE the exchange (§2.3):
    # applyInPandas is opaque to column pruning, so without the select the
    # shuffle ships every pair column (jaccard et al — ~90 MB of doubles
    # at 11M edges) that the union-find never reads, and grouping on the
    # raw block strings converts two string columns per edge to Python
    # objects in the workers. xxhash64(block_cols) is safe even if two
    # blocks collide into one group: edges never cross blocks, so
    # union-find over a disjoint union of blocks returns the identical
    # per-block components (measured at sf1 on the pinned 11M-pair frame:
    # 4.71 s all-cols → 2.68 s projected → 2.22 s hashed key, min-of-2).
    edges = pairs.select(
        F.xxhash64(*[F.col(c) for c in block_cols]).alias("_blk"), id_a, id_b
    )
    # Pin the exchange's partition count (§2.5 stragglers): the edge frame
    # is BYTE-small at bench scale, so AQE's size-based coalescing folds
    # the post-shuffle side to ONE partition and every block's union-find
    # runs serially in a single Python task (measured 0.55 s of a 1.9 s
    # wall at sf0.1). An explicit same-key repartition is reused by the
    # groupBy (no extra exchange) and AQE leaves user-specified partition
    # counts alone; per-task state keeps the same one-block bound.
    n_parts = edges.sparkSession.sparkContext.defaultParallelism
    return edges.repartition(n_parts, "_blk").groupBy("_blk").applyInPandas(
        uf, "doc_id long, cluster_id long"
    )


def dedup_clusters(pairs: DataFrame, max_iters: int = 20) -> DataFrame:
    """Connected components over a near-dup pair graph → (doc_id,
    cluster_id) with cluster_id = min doc id in the component.

    The engine's iterative-algorithm surface: min-label propagation — each
    round every node adopts the smallest label among itself and its
    neighbors; converged when a round changes nothing. Rounds needed =
    graph diameter (near-dup components are shallow — usually 2-3).

    Scale mechanics: every round ends in `localCheckpoint`, which both
    materializes the labels AND truncates the logical plan — with plain
    `persist` Catalyst re-optimizes a plan that doubles per round, which
    dominates wall time after ~4 iterations (measured 29 s → 3 s at
    sf0.1). The convergence check rides the same materialized frame (the
    pre-update label is carried as a column), so each round costs exactly
    one checkpoint job + one count job. `localCheckpoint` stores blocks on
    executors (not reliable storage); on a real cluster with lineage-
    breaking fault tolerance needs, point `spark.sparkContext.
    setCheckpointDir` at durable storage and swap in `checkpoint()`. For
    billion-edge graphs swap in GraphFrames; this stays dependency-free.
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.col("label").alias("_prev"),
                F.least(F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))).alias(
                    "label"
                ),
            )
            .localCheckpoint()
        )
        changed = stepped.filter(F.col("label") != F.col("_prev")).count()
        labels = stepped.select("node", "label")
        if changed == 0:
            break
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def substring_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    hash_key: bool = True,
    max_df: int | None = None,
) -> DataFrame:
    """Pairs of documents sharing at least one EXACT k-token span — the
    exact-substring dedup of Lee et al.'s "Deduplicating Training Data
    Makes Language Models Better" (arXiv:2107.06499), re-expressed as a
    window equi-join instead of a suffix array.

    Every document explodes into its k-token sliding windows (distinct
    per doc), windows meet in an equi-join, and pairs aggregate with the
    count of shared distinct windows. Documents shorter than k tokens
    have no k-window and drop out (standard semantics).

    100 TB shape: the shuffle key is ``xxhash64(window)`` (8 bytes/row,
    ``hash_key=True``, default) rather than the window text; fanout is
    bounded at tokens-per-doc rows per document. The skew hazard is
    boilerplate: a window appearing in d documents yields d² join rows,
    so production passes ``max_df`` to discard windows whose document
    frequency exceeds it (one extra groupBy on the same key — boilerplate
    spans carry no dedup signal, same argument as the prefix-filter
    join's stopword discard). ``hash_key=False`` joins on the window text
    itself — bit-exact (no collision caveat) and what the DuckDB oracle
    checks; the two paths emit identical pairs unless a 64-bit collision
    occurs (~n²/2⁶⁵).
    """
    toks = tokens(text_col)
    base = (
        ensure_parallelism(df)
        .select(F.col(id_col).alias("_id"), toks.alias("_tk"))
        .filter(F.size("_tk") >= k)
    )
    idx = F.sequence(F.lit(0), F.size("_tk") - k)
    wins = base.select(
        "_id",
        F.explode(
            F.transform(idx, lambda i: F.array_join(F.slice("_tk", i + 1, k), " "))
        ).alias("_win"),
    ).distinct()
    key = F.xxhash64("_win") if hash_key else F.col("_win")
    wins = wins.select("_id", key.alias("_wk"))
    if max_df is not None:
        hot = wins.groupBy("_wk").agg(F.count("*").alias("_df")).filter(
            F.col("_df") > max_df
        )
        wins = wins.join(hot.select("_wk"), "_wk", "left_anti")
    a = wins.select(F.col("_id").alias("id_a"), "_wk")
    b = wins.select(F.col("_id").alias("id_b"), "_wk")
    return (
        a.join(b, "_wk")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared_windows"))
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every k-token gram, slide a
    w-hash window, keep the MINIMUM hash of each full window, emit the
    distinct (id, fingerprint) set.

    The winnowing guarantee: two documents sharing a verbatim run of at
    least ``w + k - 1`` tokens share at least one fingerprint — detection
    is certain above that length, while storage is ~2/(w+1) of the gram
    count (vs keeping every gram hash). Taking the min VALUE (not the
    min position) keeps the result a pure function of the token
    sequence — no tie-break subtlety, identical in any engine.

    Gram hashes are the portable md5-prefix 32-bit ints (the
    q_weighted_sample idiom) so a DuckDB oracle can reproduce them.
    Scale shape: gram explode is bounded fanout (≈ tokens/doc), the
    window min partitions BY DOCUMENT (each partition is one doc's gram
    list — parallel across the corpus, bounded within), and the distinct
    collapses ~w× before anything shuffles further.
    """
    toks = tokens(text_col)
    base = (
        ensure_parallelism(df)
        .select(F.col(id_col).alias("_id"), toks.alias("_tk"))
        .filter(F.size("_tk") >= k + w - 1)
    )
    grams = base.select(
        "_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("_tk") - k),
                lambda i: F.array_join(F.slice("_tk", i + 1, k), " "),
            )
        ).alias("_i", "_gram"),
    )
    hv = F.conv(F.substring(F.md5("_gram"), 1, 8), 16, 10).cast("bigint")
    hashed = grams.select("_id", "_i", hv.alias("_hv"))
    win = Window.partitionBy("_id").orderBy("_i").rowsBetween(0, w - 1)
    fps = (
        hashed.select(
            "_id",
            F.min("_hv").over(win).alias("fp"),
            F.count("*").over(win).alias("_wn"),
        )
        .filter(F.col("_wn") == w)  # full windows only
        .select(F.col("_id").alias(id_col), "fp")
        .distinct()
    )
    return fps


def winnow_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Near-dup pairs by shared winnowing fingerprints: equi-join on the
    fingerprint value, pair counts aggregated map-side. Same join shape
    as substring_dup_pairs but over the ~2/(w+1)-sparsified fingerprint
    set — the storage/recall trade the winnowing paper proves tight."""
    fps = winnow_fingerprints(df, id_col, text_col, k, w)
    a = fps.select(F.col(id_col).alias("id_a"), "fp")
    b = fps.select(F.col(id_col).alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared_fp"))
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    window: int = 5,
    block=None,
) -> DataFrame:
    """Sorted-neighborhood method (SNM) candidate generation: sort records
    by a fuzzy key and emit every pair within ``window`` positions of each
    other in the global sort order — the classic record-linkage blocking
    strategy (Hernández & Stolfo '95) that catches near-duplicates which
    hash/equality blocking misses (typos in the first character of a
    blocking key move a record far in hash space but only a few positions
    in sort space... and vice versa, which is why production linkage runs
    both and unions candidates).

    Distributed exactly, without a single-partition global sort:

    1. coarse ``block`` (default: first character of the key — any prefix
       expression whose ordering is consistent with the key's) partitions
       the sort;
    2. per-block counts → prefix offsets (a DISTRIBUTED cumulative sum
       over the aggregated count frame — one row per block, never on the
       driver, so a high-cardinality ``block`` expression costs a
       single-task window over tiny (blk, count) rows instead of an
       unbounded driver materialization) convert per-block
       ``row_number`` into the EXACT global rank — the same two-phase
       rank the z-order layout uses;
    3. ranks band into width-``window`` stripes; each left row probes its
       own stripe and the next (explode fanout = 2), so a pair at rank
       distance ≤ window shares exactly one probed stripe — an equi-join,
       no distinct needed, never O(n²).

    Returns (id_a, key_a, id_b, key_b, rank_gap) with rank_a < rank_b.
    Callers apply the expensive verify predicate (edit distance etc.) on
    this linear-sized candidate frame.
    """
    blk = block if block is not None else F.substring(F.col(key_col), 1, 1)
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(key_col).alias("_key"),
        F.coalesce(blk, F.lit("")).alias("_blk"),
    )
    # prefix offsets computed IN-PLAN: sum(count) over (order by _blk
    # rows unbounded preceding .. -1). The unpartitioned window is a
    # single task — but over the pre-aggregated (blk, count) frame (one
    # row per distinct block), not the corpus, so it stays cheap for any
    # block cardinality and nothing ever lands on the driver.
    off_w = (
        Window.orderBy("_blk").rowsBetween(Window.unboundedPreceding, -1)
    )
    off_df = F.broadcast(
        base.groupBy("_blk")
        .count()
        .select(
            "_blk",
            F.coalesce(F.sum("count").over(off_w), F.lit(0)).alias("_off"),
        )
    )
    w = Window.partitionBy("_blk").orderBy("_key", "_id")
    # both stripe sides consume the ranked frame: scoped-persist it so the
    # rank window (and its corpus scan) runs once, not once per join side
    from hive_json_spark.functions.caching import scoped_persist

    ranked = scoped_persist(
        base.withColumn("_rn", F.row_number().over(w))
        .join(off_df, "_blk")
        .select("_id", "_key", (F.col("_off") + F.col("_rn")).alias("_rank"))
    )
    stripe = F.floor((F.col("_rank") - 1) / F.lit(int(window)))
    a = ranked.select(
        F.col("_id").alias("id_a"),
        F.col("_key").alias("key_a"),
        F.col("_rank").alias("_ra"),
        F.explode(F.array(stripe, stripe + 1)).alias("_stripe"),
    )
    b = ranked.select(
        F.col("_id").alias("id_b"),
        F.col("_key").alias("key_b"),
        F.col("_rank").alias("_rb"),
        stripe.alias("_stripe"),
    )
    return (
        a.join(b, "_stripe")
        .filter(
            (F.col("_rb") > F.col("_ra"))
            & (F.col("_rb") - F.col("_ra") <= F.lit(int(window)))
        )
        .select(
            "id_a",
            "key_a",
            "id_b",
            "key_b",
            (F.col("_rb") - F.col("_ra")).cast("int").alias("rank_gap"),
        )
    )
