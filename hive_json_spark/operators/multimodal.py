"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The container has no image/audio codecs, so the *decode kernels* are
stubbed: ``decode_image`` raises ``NotImplementedError`` unless
``fake=True``, which produces a deterministic hash-derived feature vector.
Everything Spark-side — schemas, batch iteration, partitioning, UDF
signatures, output shapes — is real and tested; swapping in a real codec
(PIL/ffmpeg) changes only the marked kernel function.

Scale notes: binary payloads stay columnar in Arrow batches end-to-end
(never row-at-a-time); per-batch vectorized kernels amortize the Python
boundary; ``spark.sql.files.maxPartitionBytes`` bounds the bytes a task
holds, so 100 TB of blobs streams through fixed executor memory.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("media_type", T.StringType()),   # image|audio|video
        T.StructField("format", T.StringType()),       # png|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = "media_id bigint, feature array<float>, n_bytes bigint"


def _fake_feature(content: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a decoded-image feature vector.

    REAL-CODEC BOUNDARY: replace this function (and only this function)
    with e.g. PIL decode + model embed when codecs are available.
    """
    import hashlib

    out = []
    counter = 0
    while len(out) < dim:
        h = hashlib.blake2b(content + counter.to_bytes(4, "big"), digest_size=32).digest()
        out.extend(b / 255.0 for b in h)
        counter += 1
    return [float(x) for x in out[:dim]]


def decode_and_featurize(
    media: DataFrame, *, dim: int = 32, fake: bool = False
) -> DataFrame:
    """binary content → fixed-dim feature vector, Arrow-batched."""
    import pandas as pd

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "no image/audio codecs in this environment; pass fake=True "
                    "for the deterministic stand-in kernel"
                )
            feats = [
                _fake_feature(bytes(c) if c is not None else b"", dim)
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                }
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video → (media_id, frame_ts_ms) sampling plan, computed from metadata
    only (no decode): the explode that downstream decode stages consume."""
    n_frames = F.greatest((F.col("duration_ms") / every_ms).cast("int"), F.lit(1))
    return media.filter(F.col("media_type") == "video").select(
        "media_id",
        F.explode(
            F.transform(F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms)
        ).alias("frame_ts_ms"),
    )


def synthetic_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic media table derived from a text corpus.

    The container ships no codecs or binary corpora, so this stands in for
    a real binary source: content is the UTF-8 bytes of the text, and all
    metadata is keyed off the id so every engine derives the identical
    table (which is what makes the downstream queries oracle-checkable).
    """
    slot = (F.col(id_col) % 3 + 1).cast("int")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), slot).alias(
            "media_type"
        ),
        F.element_at(F.array(F.lit("png"), F.lit("wav"), F.lit("mp4")), slot).alias("format"),
        ((F.col(id_col) % 64 + 1) * 8).cast("int").alias("width"),
        ((F.col(id_col) % 48 + 1) * 8).cast("int").alias("height"),
        ((F.col(id_col) % 10 + 1) * 1500).cast("bigint").alias("duration_ms"),
    )
