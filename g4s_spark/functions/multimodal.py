"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (north-star surface, BASELINE.json:6).

The decode step is STUBBED (no image/audio libs in this container) behind
``decode_stub``: a deterministic fake that derives "features" from the
md5 of the bytes, so the Spark-side plumbing — schema, Arrow batching,
mapInPandas signature, partitioning — is real and tested while the codec
is swappable.

At scale: binaries live in parquet binary columns (or object-store URIs);
mapInPandas streams Arrow batches through the decoder, so executor memory
holds one batch, not one partition.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField("meta", T.StructType([
            T.StructField("mime", T.StringType()),
            T.StructField("n_bytes", T.LongType()),
        ])),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def to_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Wrap a text column as an opaque binary media column with typed
    metadata — the canonical multimodal table shape."""
    media = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        media.alias("media"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(media).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def media_metadata(media_df: DataFrame) -> DataFrame:
    """Metadata columns over the binary payload — pure built-in column
    expressions (whole-stage codegen, zero Python): size + content digest.
    The Python decode path (``extract_features``) is reserved for the one
    thing built-ins can't do — running an actual codec — so metadata-only
    consumers never pay the Arrow round-trip."""
    return media_df.select(
        "doc_id",
        F.octet_length(F.col("media")).cast("long").alias("n_bytes"),
        F.md5(F.col("media")).alias("digest"),
    )


def decode_stub(data: bytes, n_features: int = 8) -> list[float]:
    """Deterministic fake decoder: md5-derived feature vector. Replace with
    a real image/audio decode (PIL/librosa) where available."""
    h = hashlib.md5(data).digest()
    return [h[i] / 255.0 for i in range(n_features)]


def extract_features(media_df: DataFrame, n_features: int = 8) -> DataFrame:
    """mapInPandas feature extraction over the binary column: Arrow-batched,
    one batch in memory at a time. This is the pattern for any real
    decode / resize / frame-sample stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["media"].map(len).astype("int64"),
                    "digest": pdf["media"].map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                    "features": pdf["media"].map(lambda b: decode_stub(bytes(b), n_features)),
                }
            )
            yield out

    return media_df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_stub(media_df: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: explode the binary
    into fixed-size 'frames' (here: 64-byte chunks standing in for decoded
    frames) and keep every n-th. Real codec would replace the chunker."""
    frames = F.transform(
        F.sequence(F.lit(0), F.floor(F.col("meta.n_bytes") / 64).cast("int")),
        lambda i: F.struct(i.alias("frame_no"), F.substring(F.col("media"), i * 64 + 1, 64).alias("frame")),
    )
    return (
        media_df.select("doc_id", F.explode(frames).alias("f"))
        .select("doc_id", F.col("f.frame_no").alias("frame_no"), F.col("f.frame").alias("frame"))
        .filter(F.col("frame_no") % every_n == 0)
    )
