"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are `binary` columns with a `media_type` tag and a
metadata map. Decoding real media needs codec libraries that are not in
this environment, so the decode step is STUBBED: `decode_media` raises
NotImplementedError unless the deterministic fake decoder is selected.
Everything Spark-side — schema, partition-preserving mapInPandas, Arrow
batch shapes, UDF signatures — is real and tested.

Scale: feature extraction runs as mapInPandas over Arrow batches (one
Python hop, vectorized per batch, no per-row serde); batch size is
governed by spark.sql.execution.arrow.maxRecordsPerBatch. Binary
payloads never pass through the driver."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, media_type string, payload binary, "
    "meta map<string,string>"
)

FEATURE_SCHEMA = (
    "media_id bigint, media_type string, byte_len bigint, n_chunks bigint, "
    "head_byte int, checksum bigint"
)


def attach_media(
    df: DataFrame, id_col: str, payload_col: str, media_type: str
) -> DataFrame:
    """Normalize a DataFrame into the media envelope."""
    return df.select(
        F.col(id_col).cast("bigint").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.create_map(
            F.lit("origin"), F.lit("synthetic"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, media_type: str, fake: bool = False) -> dict:
    """Decode one media payload. Real codecs (image/audio/video) are not
    available in this environment — STUB: raises unless fake=True, in
    which case a deterministic pure-bytes 'decode' is returned."""
    if not fake:
        raise NotImplementedError(
            f"no codec for media_type={media_type!r}: image/audio libraries "
            "are not installed; use fake=True for the deterministic stub"
        )
    return {
        "byte_len": len(payload),
        "n_chunks": (len(payload) + 255) // 256,
        "head_byte": payload[0] if payload else -1,
        "checksum": sum(payload) % 1_000_000_007,
    }


def extract_features(df: DataFrame, chunk_size: int = 256) -> DataFrame:
    """Deterministic fake feature extraction over media envelopes via
    mapInPandas (the real-codec version swaps decode_media's body and
    keeps this exact plumbing: same schema, same batch shape)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            feats = [
                decode_media(bytes(p) if p is not None else b"", t, fake=True)
                for p, t in zip(payloads, pdf["media_type"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            out.insert(1, "media_type", pdf["media_type"].values)
            yield out

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 4) -> DataFrame:
    """'Frame sampling' for chunked binary media: split each payload into
    fixed-size chunks and keep every n-th — all with built-in binary
    functions (substr on binary), no Python. Output one row per kept
    chunk: (media_id, chunk_idx, chunk binary)."""
    n_chunks = F.ceil(F.length(F.col("payload")) / F.lit(256)).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))
    kept = F.filter(idx, lambda i: i % every_n == 0)
    return (
        df.select("media_id", "payload", F.explode(kept).alias("chunk_idx"))
        .select(
            "media_id",
            "chunk_idx",
            F.expr("substr(payload, chunk_idx * 256 + 1, 256)").alias("chunk"),
        )
    )


def resize_media(df: DataFrame, factor: int = 4) -> DataFrame:
    """'Resize' for binary media — STUB decode, real plumbing.

    A real implementation decodes pixels, resamples, re-encodes (codec
    libraries unavailable here); the deterministic stand-in keeps every
    factor-th byte, preserving the exact pipeline shape: binary in,
    smaller binary out, one vectorized mapInPandas hop, metadata updated
    with the resize factor."""
    from collections.abc import Iterator

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [
                bytes(bytes(p)[::factor]) if p is not None else None
                for p in pdf["payload"]
            ]
            out["meta"] = [
                {**(dict(m) if m is not None else {}), "resize_factor": str(factor)}
                for m in pdf["meta"]
            ]
            yield out

    return df.mapInPandas(run, schema=MEDIA_SCHEMA)
