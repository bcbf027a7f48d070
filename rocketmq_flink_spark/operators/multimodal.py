"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are `binary` columns with a `media_type` tag and a
metadata map. Decode is REAL for stdlib-parsable containers — BMP /
WAV / PPM headers are parsed with struct/bytes (parse_media_header),
and for the raw-dump containers the CONTENT is decoded too: PPM pixels
and WAV PCM16 samples are exact numpy frombuffer reads, with a genuine
nearest-neighbor resize re-encoding real pixels (decode_ppm_pixels /
resize_ppm / decode_wav_samples / media_pixel_features).

Compressed formats (round 5): PNG is FULLY decoded with the stdlib —
zlib inflate + all five scanline unfilters (decode_png_pixels), and
encode_png round-trips real filtered scanlines. JPEG headers (the
fields a corpus pipeline filters on: dimensions, component count) are
parsed by the real marker walk (SOFn segment); JPEG *pixel* decode
(Huffman+DCT) still needs codec libraries and raises
NotImplementedError behind the same registry slot, as do MP3/video.
Everything Spark-side — schema, partition-preserving mapInPandas,
Arrow batch shapes, UDF signatures — is real and tested.

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
    """Decode one media payload. fake=True returns the deterministic
    pure-bytes 'decode' (pipeline-shape testing). Otherwise the REAL
    stdlib header parsers run: BMP / WAV / PPM / PNG (CRC-verified
    IHDR) / JPEG (SOFn marker walk) — no codec libraries needed.
    MP3/video still raise NotImplementedError, as does JPEG pixel
    (not header) decode."""
    if fake:
        return {
            "byte_len": len(payload),
            "n_chunks": (len(payload) + 255) // 256,
            "head_byte": payload[0] if payload else -1,
            "checksum": sum(payload) % 1_000_000_007,
        }
    return parse_media_header(payload)


# ---------------------------------------------------------------------------
# Real stdlib container codecs: BMP (BITMAPINFOHEADER), WAV (RIFF), PPM (P6).
# Encoders synthesize genuine container bytes; the parser reads genuine
# headers with struct.unpack — no image/audio libraries involved, so the
# "decode" step of the multimodal pipeline is real for these formats.
# ---------------------------------------------------------------------------

HEADER_SCHEMA = (
    "media_id bigint, fmt string, width int, height int, sample_rate int, "
    "n_channels int, duration_ms bigint, byte_len bigint"
)


def _bmp_row_size(width: int) -> int:
    return ((width * 3 + 3) // 4) * 4  # 24bpp rows pad to 4 bytes


def encode_bmp(width: int, height: int) -> bytes:
    """Minimal valid 24-bit BMP (BITMAPFILEHEADER + BITMAPINFOHEADER)."""
    import struct

    row = _bmp_row_size(width)
    pixels = bytes(row * height)
    file_size = 54 + len(pixels)
    return (
        struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels),
            2835, 2835, 0, 0,
        )
        + pixels
    )


def encode_wav(
    sample_rate: int, n_channels: int, n_frames: int,
    bits_per_sample: int = 16,
) -> bytes:
    """Minimal valid PCM WAV (RIFF/WAVE with fmt + data chunks)."""
    import struct

    block_align = n_channels * bits_per_sample // 8
    data = bytes(n_frames * block_align)
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate,
        sample_rate * block_align, block_align, bits_per_sample,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_ppm(width: int, height: int) -> bytes:
    """Minimal valid binary PPM (P6, maxval 255)."""
    return f"P6\n{width} {height}\n255\n".encode() + bytes(3 * width * height)


PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> channel count (PNG spec 11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# SOF markers that carry frame dimensions (JPEG spec B.2.2): C0-C3,
# C5-C7, C9-CB, CD-CF (C4=DHT, C8=JPG, CC=DAC are not frames)
_JPEG_SOF = frozenset(
    range(0xC0, 0xD0)
) - {0xC4, 0xC8, 0xCC}


def parse_media_header(payload: bytes) -> dict:
    """Parse a REAL container header (magic-sniffed), returning typed
    metadata: fmt, width, height, sample_rate, n_channels, duration_ms,
    byte_len. Fields that don't apply to the format are None. PNG IHDR
    (CRC-verified) and JPEG SOFn (real marker walk) are parsed with the
    stdlib. Raises NotImplementedError for containers with no
    stdlib-parsable header (MP3/video), ValueError for a malformed
    payload."""
    import struct

    out = {
        "fmt": None, "width": None, "height": None, "sample_rate": None,
        "n_channels": None, "duration_ms": None, "byte_len": len(payload),
    }
    if payload[:2] == b"BM" and len(payload) >= 54:
        width, height = struct.unpack_from("<ii", payload, 18)
        out.update(fmt="bmp", width=width, height=abs(height))
        return out
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        # walk RIFF chunks (fmt need not be first in a real file)
        pos, rate, channels, block_align, data_size = 12, None, None, None, None
        while pos + 8 <= len(payload):
            cid, size = payload[pos:pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
            if cid == b"fmt " and size >= 16:
                _, channels, rate, _, block_align, _ = struct.unpack_from(
                    "<HHIIHH", payload, pos + 8
                )
            elif cid == b"data":
                data_size = size
            pos += 8 + size + (size & 1)  # chunks pad to even
        if rate is None or data_size is None:
            raise ValueError("malformed WAV: missing fmt or data chunk")
        out.update(
            fmt="wav", sample_rate=rate, n_channels=channels,
            duration_ms=(data_size // block_align) * 1000 // rate,
        )
        return out
    if payload[:2] == b"P6":
        import re

        m = re.match(rb"P6\s+(?:#[^\n]*\n\s*)*(\d+)\s+(\d+)\s+(\d+)\s", payload)
        if not m:
            raise ValueError("malformed PPM header")
        out.update(fmt="ppm", width=int(m.group(1)), height=int(m.group(2)))
        return out
    if payload[:8] == PNG_SIG:
        import zlib

        if len(payload) < 33 or payload[12:16] != b"IHDR":
            raise ValueError("malformed PNG: missing IHDR")
        if struct.unpack_from(">I", payload, 8)[0] != 13:
            raise ValueError("malformed PNG: bad IHDR length")
        crc = struct.unpack_from(">I", payload, 29)[0]
        if zlib.crc32(payload[12:29]) & 0xFFFFFFFF != crc:
            raise ValueError("malformed PNG: IHDR CRC mismatch")
        width, height = struct.unpack_from(">II", payload, 16)
        depth, color = payload[24], payload[25]
        if color not in _PNG_CHANNELS:
            raise ValueError(f"malformed PNG: color type {color}")
        out.update(
            fmt="png", width=width, height=height,
            n_channels=_PNG_CHANNELS[color],
        )
        return out
    if payload[:2] == b"\xff\xd8":
        # real JPEG marker walk: skip segments until a SOFn frame header
        pos = 2
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                raise ValueError("malformed JPEG: lost marker sync")
            marker = payload[pos + 1]
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
                pos += 2  # standalone markers have no length
                continue
            if marker == 0xD9:  # EOI before any SOF
                break
            size = struct.unpack_from(">H", payload, pos + 2)[0]
            if marker in _JPEG_SOF:
                _prec, height, width, ncomp = struct.unpack_from(
                    ">BHHB", payload, pos + 4
                )
                out.update(
                    fmt="jpeg", width=width, height=height,
                    n_channels=ncomp,
                )
                return out
            if marker == 0xDA:  # SOS: entropy data follows, no SOF seen
                break
            pos += 2 + size
        raise ValueError("malformed JPEG: no SOF frame header")
    raise NotImplementedError(
        "unrecognized container magic: BMP/WAV/PPM/PNG headers and JPEG "
        "SOF dimensions are stdlib-parsable; other compressed formats "
        "(MP3/video) need codec libraries not present in this environment"
    )


def media_header_features(df: DataFrame) -> DataFrame:
    """REAL header decode over media envelopes: one Arrow-batched
    mapInPandas hop parses each payload's genuine container header
    (parse_media_header) into typed metadata. Binary never passes
    through the driver; batch size governed by
    spark.sql.execution.arrow.maxRecordsPerBatch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                parse_media_header(bytes(p) if p is not None else b"")
                for p in pdf["payload"]
            ]
            out = pd.DataFrame({
                "media_id": pdf["media_id"].astype("int64").values,
                "fmt": [r["fmt"] for r in rows],
                "width": pd.array([r["width"] for r in rows], dtype="Int32"),
                "height": pd.array([r["height"] for r in rows], dtype="Int32"),
                "sample_rate": pd.array(
                    [r["sample_rate"] for r in rows], dtype="Int32"
                ),
                "n_channels": pd.array(
                    [r["n_channels"] for r in rows], dtype="Int32"
                ),
                "duration_ms": pd.array(
                    [r["duration_ms"] for r in rows], dtype="Int64"
                ),
                "byte_len": pd.array(
                    [r["byte_len"] for r in rows], dtype="Int64"
                ),
            })
            yield out

    return df.mapInPandas(run, schema=HEADER_SCHEMA)


def synth_container_payloads(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic REAL container payloads from an id column: id % 3
    selects bmp/wav/ppm, and the container parameters derive from the id
    by fixed formulas (so an oracle can predict every parsed field
    without parsing bytes). The bytes are genuine containers built by
    the encode_* functions — the decode side exercises real header
    parsing, not a fake."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for d in pdf["media_id"].astype("int64"):
                d = int(d)
                if d % 3 == 0:
                    payloads.append(encode_bmp(d % 31 + 1, d % 17 + 1))
                elif d % 3 == 1:
                    payloads.append(encode_wav(
                        8000 + (d % 5) * 1000, (d // 2) % 2 + 1, 100 + d % 50
                    ))
                else:
                    payloads.append(encode_ppm(d % 31 + 1, d % 17 + 1))
            yield pd.DataFrame({
                "media_id": pdf["media_id"].astype("int64").values,
                "payload": payloads,
            })

    return df.select(F.col(id_col).cast("bigint").alias("media_id")).mapInPandas(
        run, schema="media_id bigint, payload binary"
    )


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
    """Resize for binary media: REAL for PPM payloads (pixels decoded,
    nearest-neighbor resampled, re-encoded — see resize_ppm); other
    containers fall back to the deterministic byte-stride stand-in
    (their pixel decoders need codec libraries not in this
    environment). Same pipeline shape either way: binary in, smaller
    binary out, one vectorized mapInPandas hop, metadata updated with
    the resize factor."""
    from collections.abc import Iterator

    def _one(p):
        if p is None:
            return None
        b = bytes(p)
        if b[:2] == b"P6":
            return resize_ppm(b, factor)
        return bytes(b[::factor])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [_one(p) for p in pdf["payload"]]
            out["meta"] = [
                {**(dict(m) if m is not None else {}), "resize_factor": str(factor)}
                for m in pdf["meta"]
            ]
            yield out

    return df.mapInPandas(run, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# REAL pixel/sample codecs for the stdlib-parsable containers: PPM pixel
# decode + nearest-neighbor resize, WAV PCM16 sample decode. No image or
# audio libraries — P6 pixels are a raw RGB dump after the text header,
# PCM16 frames are a raw int16 dump after the RIFF chunks, so numpy
# frombuffer IS the full decoder. This removes the decode stub for these
# formats: pixels/samples are genuinely decoded, resampled, re-encoded.
# ---------------------------------------------------------------------------


def encode_ppm_pattern(media_id: int, width: int, height: int) -> bytes:
    """P6 image whose pixel (y, x, c) = (7*id + 3y + 5x + 11c) mod 256 —
    a deterministic pattern an oracle can recompute closed-form."""
    import numpy as np

    y = np.arange(height)[:, None, None]
    x = np.arange(width)[None, :, None]
    c = np.arange(3)[None, None, :]
    px = ((media_id * 7 + y * 3 + x * 5 + c * 11) % 256).astype(np.uint8)
    return f"P6\n{width} {height}\n255\n".encode() + px.tobytes()


def decode_ppm_pixels(payload: bytes):
    """REAL P6 decode: (height, width, 3) uint8 array of the raw pixels."""
    import re

    import numpy as np

    m = re.match(rb"P6\s+(?:#[^\n]*\n\s*)*(\d+)\s+(\d+)\s+(\d+)\s", payload)
    if not m:
        raise ValueError("malformed PPM header")
    w, h = int(m.group(1)), int(m.group(2))
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=m.end())
    return px.reshape(h, w, 3)


def resize_ppm(payload: bytes, factor: int = 2) -> bytes:
    """REAL nearest-neighbor downsample: decode pixels, keep every
    factor-th row/column, re-encode as P6."""
    px = decode_ppm_pixels(payload)[::factor, ::factor, :]
    h, w = px.shape[0], px.shape[1]
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()


def encode_wav_pattern(
    media_id: int, sample_rate: int, n_frames: int
) -> bytes:
    """Mono PCM16 WAV whose sample i = ((31*id + 17*i) mod 65536) - 32768
    — deterministic, oracle-recomputable."""
    import struct

    import numpy as np

    i = np.arange(n_frames, dtype=np.int64)
    samples = (((media_id * 31 + i * 17) % 65536) - 32768).astype("<i2")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_samples(payload: bytes):
    """REAL PCM16 decode: int16 numpy array of the frames (mono)."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"data":
            return np.frombuffer(
                payload, dtype="<i2", count=size // 2, offset=pos + 8
            )
        pos += 8 + size + (size & 1)
    raise ValueError("malformed WAV: no data chunk")


def encode_ppm_scene(
    frame_id: int, scene: int, width: int, height: int
) -> bytes:
    """P6 video frame for scene-cut tests: pixel (y, x, c) =
    (37*scene + 3y + 5x + 11c + frame_id) mod 256 — consecutive
    frames inside a scene differ by a +1 drift (small histogram
    churn), a scene boundary jumps the whole pattern by 37 (large
    churn). Oracle-recomputable closed-form."""
    import numpy as np

    y = np.arange(height)[:, None, None]
    x = np.arange(width)[None, :, None]
    c = np.arange(3)[None, None, :]
    px = (
        (scene * 37 + y * 3 + x * 5 + c * 11 + frame_id) % 256
    ).astype(np.uint8)
    return f"P6\n{width} {height}\n255\n".encode() + px.tobytes()


FRAME_HIST_SCHEMA = "video_id bigint, frame_id bigint, hist array<bigint>"


def frame_histograms(df: DataFrame, bins: int = 16) -> DataFrame:
    """REAL per-frame signature extraction: decode every PPM frame's
    pixels and emit a `bins`-bucket histogram of the red channel
    (value div (256/bins)) — the compact frame fingerprint used for
    scene-cut detection. One vectorized Arrow hop; payloads never
    leave the executors; downstream comparisons move only the
    bins-sized arrays."""
    width = 256 // bins

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode_ppm_pixels(bytes(r.payload))
                h = np.bincount(
                    (px[:, :, 0].astype(np.int64) // width).ravel(),
                    minlength=bins,
                )
                rows.append(
                    {
                        "video_id": r.video_id,
                        "frame_id": r.frame_id,
                        "hist": [int(v) for v in h],
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("video_id", "frame_id", "payload").mapInPandas(
        run, schema=FRAME_HIST_SCHEMA
    )


def scene_cuts(hist_df: DataFrame, threshold: int) -> DataFrame:
    """Scene-cut detection from per-frame histograms: L1 distance to
    the previous frame (per video, frame order), cut where the
    distance exceeds `threshold`. Exact integer arithmetic throughout
    (zip_with + aggregate fold over the histogram arrays). Scale: one
    window over per-video frame sequences moving only bins-sized
    arrays; partition by video — no payload shuffle."""
    from pyspark.sql import Window

    w = Window.partitionBy("video_id").orderBy("frame_id")
    lagged = hist_df.withColumn("prev", F.lag("hist").over(w))
    return lagged.select(
        "video_id",
        "frame_id",
        F.when(F.col("prev").isNull(), F.lit(0))
        .otherwise(
            F.aggregate(
                F.zip_with(
                    "hist", "prev", lambda a, b: F.abs(a - b)
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            )
        )
        .cast("long")
        .alias("l1_dist"),
    ).withColumn(
        "is_cut", F.col("l1_dist") > F.lit(threshold)
    )


PIXEL_FEATURE_SCHEMA = (
    "media_id bigint, fmt string, width int, height int, "
    "sum_r bigint, sum_g bigint, sum_b bigint, "
    "rs_width int, rs_sum_r bigint, "
    "n_samples bigint, sum_sq bigint, peak int"
)


def media_pixel_features(df: DataFrame, resize_factor: int = 2) -> DataFrame:
    """REAL content decode over the media envelope: PPM and PNG
    payloads are pixel-decoded (PNG through the full stdlib inflate +
    unfilter codec; exact per-channel integer sums + the same sums
    after a genuine nearest-neighbor resize), WAV payloads are
    PCM16-decoded (exact sum of squares + peak amplitude). One
    vectorized Arrow hop; every emitted number is an exact integer, so
    a SQL oracle that regenerates the deterministic pixel/sample
    patterns hash-checks the entire decode -> transform -> aggregate
    path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                row = {
                    "media_id": r.media_id, "fmt": None, "width": None,
                    "height": None, "sum_r": None, "sum_g": None,
                    "sum_b": None, "rs_width": None, "rs_sum_r": None,
                    "n_samples": None, "sum_sq": None, "peak": None,
                }
                if r.payload is None:
                    rows.append(row)  # all-null features, like resize_media
                    continue
                payload = bytes(r.payload)
                if payload[:2] == b"P6" or payload[:8] == PNG_SIG:
                    is_png = payload[:8] == PNG_SIG
                    dec = decode_png_pixels if is_png else decode_ppm_pixels
                    rsz = resize_png if is_png else resize_ppm
                    px = dec(payload).astype(np.int64)
                    rs = dec(rsz(payload, resize_factor)).astype(np.int64)
                    row.update(
                        fmt="png" if is_png else "ppm",
                        width=px.shape[1], height=px.shape[0],
                        sum_r=int(px[:, :, 0].sum()),
                        sum_g=int(px[:, :, 1].sum()),
                        sum_b=int(px[:, :, 2].sum()),
                        rs_width=rs.shape[1],
                        rs_sum_r=int(rs[:, :, 0].sum()),
                    )
                elif payload[:4] == b"RIFF":
                    s = decode_wav_samples(payload).astype(np.int64)
                    row.update(
                        fmt="wav", n_samples=len(s),
                        sum_sq=int((s * s).sum()),
                        peak=int(np.abs(s).max()) if len(s) else 0,
                    )
                else:
                    raise NotImplementedError(
                        "pixel/sample decode is implemented for PPM/PNG/"
                        "WAV; JPEG pixel decode (Huffman+DCT) and MP3/"
                        "video need codec libraries"
                    )
                rows.append(row)
            yield pd.DataFrame(rows)

    return df.select("media_id", "payload").mapInPandas(
        run, schema=PIXEL_FEATURE_SCHEMA
    )


AUDIO_FRAME_SCHEMA = (
    "media_id bigint, frame_no bigint, n_samples bigint, "
    "sum_sq bigint, zero_cross bigint, peak bigint"
)


def audio_frame_energy(df: DataFrame, frame_len: int = 256) -> DataFrame:
    """REAL PCM16 frame analysis — the audio-side counterpart of
    frame_histograms: decode every WAV payload's samples (numpy
    frombuffer IS the full decoder for raw PCM16), slice into
    frame_len-sample windows, and emit per-frame energy (sum of
    squares), zero-crossing count (strict sign-product < 0 between
    consecutive samples WITHIN the frame; exact zeros never count),
    and peak |amplitude| — the primitives under VAD/silence trimming
    and loudness normalization in audio-corpus pipelines. One
    vectorized Arrow hop; payloads never leave the executors; output
    is frame-sized (n_samples/frame_len rows), not sample-sized."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                s = decode_wav_samples(bytes(r.payload)).astype(np.int64)
                for fno, f0 in enumerate(range(0, len(s), frame_len)):
                    fr = s[f0:f0 + frame_len]
                    rows.append(
                        {
                            "media_id": int(r.media_id),
                            "frame_no": fno,
                            "n_samples": int(fr.size),
                            "sum_sq": int(np.dot(fr, fr)),
                            "zero_cross": int(
                                np.sum(fr[1:] * fr[:-1] < 0)
                            ),
                            "peak": int(np.max(np.abs(fr))),
                        }
                    )
            yield pd.DataFrame(rows)

    return df.select("media_id", "payload").mapInPandas(
        run, schema=AUDIO_FRAME_SCHEMA
    )


# ---------------------------------------------------------------------------
# REAL compressed-image codec (round 5): PNG, fully decoded with the
# stdlib — zlib IS the official PNG compression, and the five scanline
# filters are pure byte arithmetic, so encode_png/decode_png_pixels are a
# genuine codec pair (the encoder cycles through ALL five filter types so
# the decoder's unfilter paths are all exercised by round-trip tests).
# JPEG gets the real header/marker walk in parse_media_header; its pixel
# decode (Huffman + DCT) stays behind the codec registry.
# ---------------------------------------------------------------------------


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(pixels) -> bytes:
    """REAL PNG encoder for an (h, w, 3) uint8 array: filtered
    scanlines (row y uses filter y % 5 — None/Sub/Up/Average/Paeth,
    so every decoder filter path gets exercised), zlib-deflated into
    one IDAT, CRC-stamped chunks."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, ch = px.shape
    assert ch == 3, "encode_png writes RGB8"
    bpp = 3
    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.int64)
    for y in range(h):
        row = px[y].reshape(-1).astype(np.int64)
        f = y % 5
        raw.append(f)
        if f == 0:
            flt = row
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, np.int64), row[:-bpp]])
            flt = (row - left) % 256
        elif f == 2:  # Up
            flt = (row - prev) % 256
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(bpp, np.int64), row[:-bpp]])
            flt = (row - (left + prev) // 2) % 256
        else:  # Paeth
            left = np.concatenate([np.zeros(bpp, np.int64), row[:-bpp]])
            upleft = np.concatenate([np.zeros(bpp, np.int64), prev[:-bpp]])
            pr = np.fromiter(
                (
                    _paeth(int(a), int(b), int(c))
                    for a, b, c in zip(left, prev, upleft)
                ),
                dtype=np.int64,
                count=w * bpp,
            )
            flt = (row - pr) % 256
        raw += bytes(flt.astype(np.uint8))
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png_pixels(payload: bytes):
    """REAL full PNG decode with the stdlib: IHDR parse (8-bit depth,
    color types 0/2/6, non-interlaced), IDAT concat + zlib inflate,
    and all five scanline unfilters. Returns an (h, w, channels) uint8
    array. Raises ValueError on malformed input, NotImplementedError
    for PNG features beyond this profile (16-bit, palette, interlace)."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    idat = bytearray()
    while pos + 8 <= len(payload):
        size = struct.unpack_from(">I", payload, pos)[0]
        ctype = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + size]
        crc = struct.unpack_from(">I", payload, pos + 8 + size)[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"malformed PNG: {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color not in (0, 2, 6) or interlace:
                raise NotImplementedError(
                    "PNG profile beyond 8-bit gray/RGB/RGBA non-interlaced"
                )
            ch = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + size
    if w is None or not idat:
        raise ValueError("malformed PNG: missing IHDR or IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("malformed PNG: bad decompressed length")
    out = np.zeros((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        if f == 0:
            cur = row
        elif f == 2:  # Up
            cur = (row + prev) % 256
        elif f in (1, 3, 4):  # Sub/Average/Paeth: left-dependent, per pixel
            cur = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                left = cur[i - ch] if i >= ch else 0
                if f == 1:
                    cur[i] = (row[i] + left) % 256
                elif f == 3:
                    cur[i] = (row[i] + (left + prev[i]) // 2) % 256
                else:
                    upleft = prev[i - ch] if i >= ch else 0
                    cur[i] = (
                        row[i] + _paeth(int(left), int(prev[i]), int(upleft))
                    ) % 256
        else:
            raise ValueError(f"malformed PNG: filter type {f}")
        out[y] = cur
        prev = cur
    return out.astype(np.uint8).reshape(h, w, ch)


def encode_png_pattern(media_id: int, width: int, height: int) -> bytes:
    """PNG with the SAME deterministic pixel pattern as
    encode_ppm_pattern ((7*id + 3y + 5x + 11c) mod 256), so the one
    oracle formula certifies both the raw-dump and the compressed
    codec path."""
    import numpy as np

    y = np.arange(height)[:, None, None]
    x = np.arange(width)[None, :, None]
    c = np.arange(3)[None, None, :]
    px = ((media_id * 7 + y * 3 + x * 5 + c * 11) % 256).astype(np.uint8)
    return encode_png(px)


def resize_png(payload: bytes, factor: int = 2) -> bytes:
    """REAL nearest-neighbor downsample for PNG: full decode, keep every
    factor-th row/column, re-encode (RGB profile)."""
    px = decode_png_pixels(payload)[::factor, ::factor, :]
    if px.shape[2] != 3:
        raise NotImplementedError("resize_png re-encodes RGB only")
    return encode_png(px)


def encode_jpeg_header_pattern(
    media_id: int, width: int, height: int
) -> bytes:
    """Genuine JPEG marker stream (SOI, APP0/JFIF, DQT, SOF0, SOS, EOI)
    with real segment lengths — what parse_media_header's marker walk
    sees in a camera file. The entropy-coded scan is a placeholder (a
    real scan needs the Huffman tables this environment can't verify),
    so ONLY header fields are meaningful — exactly the JPEG surface the
    engine supports (dimension/component filtering, not pixel decode)."""
    import struct

    app0 = b"JFIF\x00" + bytes([1, 2, 0]) + struct.pack(">HH", 72, 72) + b"\x00\x00"
    dqt = bytes([0]) + bytes((media_id * 3 + i) % 255 + 1 for i in range(64))
    sof = struct.pack(">BHHB", 8, height, width, 3)
    for comp in range(3):
        sof += bytes([comp + 1, 0x11 if comp == 0 else 0x11, 0 if comp == 0 else 1])
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
        + b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
        + b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
        + b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        + bytes([(media_id + i) % 255 for i in range(8)])  # entropy stub
        + b"\xff\xd9"
    )
