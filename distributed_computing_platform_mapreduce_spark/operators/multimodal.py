"""Multimodal columns: binary payloads + typed metadata, Arrow-batched.

Images/audio/video are opaque ``binary`` columns beside a metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas iterators via ``mapInPandas`` — payloads never
pass through Python row-at-a-time, and the per-batch work is
vectorized numpy, the exact shape a production decoder plugs into.

Decode support is format-honest:

- **PPM (P6) / PGM (P5)** are decoded FOR REAL — pure numpy, no
  external libs — into ``(h, w, c)`` uint8 arrays; features and
  resize operate on true pixels. The synthesized media table carries
  genuine P6 payloads, so the whole pipeline (encode → scan → decode →
  feature/resize) is exercised end-to-end in tests.
- **RIFF/WAV PCM-16** is decoded FOR REAL — pure numpy + struct chunk
  walk — into ``(n_frames, channels)`` int16 arrays; duration / RMS /
  peak features operate on true samples. Float/compressed WAV raises
  ``NotImplementedError`` (same honest gate as PNG/JPEG below).
- **PNG/JPEG** (magic detected) raise ``NotImplementedError`` — their
  codecs (PIL/opencv) are not in this container; a deployment would
  swap ``decode_image`` to the real library, nothing else changes.
- Unknown payloads fall back to byte statistics (schema-stable).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("byte_mean", DoubleType()),
        StructField("first_byte", IntegerType()),
        StructField("feature_norm", DoubleType()),
        StructField("decoded", StringType()),  # ppm | pgm | wav | fallback
        StructField("px_width", IntegerType()),  # image: pixels; audio: channels
        StructField("px_height", IntegerType()),  # image: pixels; audio: -1
        StructField("px_mean", DoubleType()),
        # audio-only features; 0.0 / -1 for non-audio rows (one schema
        # for every modality keeps the union/driver output stable)
        StructField("duration_s", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("peak", IntegerType()),
    ]
)


# --- pure-numpy PPM/PGM codec ----------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) or (h, w) uint8 array as binary PPM/PGM."""
    if pixels.ndim == 3:
        h, w, _ = pixels.shape
        return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()
    h, w = pixels.shape
    return b"P5\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def decode_image(payload: bytes) -> np.ndarray:
    """Decode a binary image payload to an (h, w, c)/(h, w) uint8 array.

    Real decode for P6/P5; explicit NotImplementedError for PNG/JPEG
    (codec libs absent here — swap this function in deployment);
    ValueError otherwise.
    """
    if payload[:2] in (b"P6", b"P5"):
        # header: magic, whitespace/comments, width, height, maxval, one ws
        parts: list[int] = []
        i = 2
        while len(parts) < 3:
            while i < len(payload) and payload[i : i + 1].isspace():
                i += 1
            if payload[i : i + 1] == b"#":  # comment line
                i = payload.index(b"\n", i) + 1
                continue
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            parts.append(int(payload[i:j]))
            i = j
        i += 1  # single whitespace after maxval
        w, h, maxval = parts
        if maxval > 255:
            raise ValueError("16-bit PPM not supported")
        c = 3 if payload[:2] == b"P6" else 1
        arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * c, offset=i)
        return arr.reshape((h, w, 3)) if c == 3 else arr.reshape((h, w))
    if payload[:8] == b"\x89PNG\r\n\x1a\n" or payload[:2] == b"\xff\xd8":
        raise NotImplementedError(
            "PNG/JPEG decode requires PIL/opencv (not in this container); "
            "swap decode_image to the real codec in deployment"
        )
    raise ValueError("unknown image format")


def synth_pixels(seed: int, width: int = 16, height: int = 16) -> np.ndarray:
    """Deterministic RGB pixels from a seed (splitmix64 stream) — real
    image content for fixtures without bundling binary test assets."""
    n = width * height * 3
    offset = ((seed or 1) * 0x9E3779B97F4A7C15) % (1 << 64)  # modular by design
    with np.errstate(over="ignore"):
        x = np.arange(n, dtype=np.uint64) + np.uint64(offset)
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
    return (x & np.uint64(0xFF)).astype(np.uint8).reshape((height, width, 3))


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize via numpy index maps (no loops)."""
    h, w = pixels.shape[:2]
    rows = (np.arange(out_h) * h // out_h).astype(np.int64)
    cols = (np.arange(out_w) * w // out_w).astype(np.int64)
    return pixels[rows][:, cols]


# --- pure-numpy RIFF/WAV PCM-16 codec ---------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode int16 PCM samples — ``(n,)`` mono or ``(n, channels)`` —
    as a canonical RIFF/WAVE file (fmt + data chunks)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    _, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    block_align = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * block_align, block_align, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode RIFF/WAVE PCM-16 to ``((n_frames, channels) int16,
    sample_rate)``.

    Walks the chunk list generically (word-aligned, unknown chunks like
    LIST/INFO skipped), so files from real encoders parse too. IEEE-float
    and compressed formats raise ``NotImplementedError`` — the same
    honest-codec gate as PNG/JPEG in ``decode_image``; ValueError for
    non-WAV or truncated payloads.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt_info = None
    data = None
    i = 12
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt_info = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if fmt_info is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, ch, rate, _byte_rate, _block_align, bits = fmt_info
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"WAV format {audio_format}/{bits}-bit not supported "
            "(PCM-16 only here; swap decode_wav to a real codec in deployment)"
        )
    if ch < 1:
        raise ValueError("WAV with zero channels")
    samples = np.frombuffer(data, dtype="<i2", count=(len(data) // (2 * ch)) * ch)
    return samples.reshape(-1, ch), rate


def synth_samples(seed: int, n_samples: int = 800, channels: int = 1) -> np.ndarray:
    """Deterministic int16 PCM from a seed: a seed-pitched sine plus
    splitmix64 dither — real audio content for fixtures without binary
    assets (same role as ``synth_pixels``)."""
    n = n_samples * channels
    offset = ((seed or 1) * 0x9E3779B97F4A7C15) % (1 << 64)
    with np.errstate(over="ignore"):
        x = np.arange(n, dtype=np.uint64) + np.uint64(offset)
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
    dither = (x & np.uint64(0x3FF)).astype(np.float64) - 512.0  # ±512
    t = np.arange(n, dtype=np.float64)
    freq = 0.01 + (seed % 97) / 970.0  # radians/sample, seed-dependent pitch
    wave = 12000.0 * np.sin(freq * t)
    return np.clip(wave + dither, -32768, 32767).astype(np.int16).reshape(n_samples, channels)


# --- media table ------------------------------------------------------------


def media_from_documents(docs: DataFrame, width: int = 16, height: int = 16) -> DataFrame:
    """Synthesize a media table with REAL P6 payloads, deterministically
    seeded by doc_id (no binary fixtures in the container). The payload
    column is genuine encoded-image bytes; everything downstream decodes
    it for real."""
    from distributed_computing_platform_mapreduce_spark.shipping import ensure_shipped

    ensure_shipped(docs.sparkSession)
    ids = docs.select(F.col("doc_id").alias("media_id"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_ppm(synth_pixels(int(m), width, height)) for m in pdf["media_id"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": "image",
                    "payload": payloads,
                    "width": np.int32(width),
                    "height": np.int32(height),
                    "n_frames": np.int32(1),
                }
            )

    return ids.mapInPandas(run, schema=MEDIA_SCHEMA)


def audio_from_documents(
    docs: DataFrame, n_samples: int = 800, sample_rate: int = 8000, channels: int = 1
) -> DataFrame:
    """Synthesize an audio media table with REAL RIFF/WAV PCM-16
    payloads, deterministically seeded by doc_id — the ``kind='audio'``
    twin of ``media_from_documents``. width/height are -1 (not pixels);
    ``n_frames`` carries the sample-frame count."""
    from distributed_computing_platform_mapreduce_spark.shipping import ensure_shipped

    ensure_shipped(docs.sparkSession)
    ids = docs.select(F.col("doc_id").alias("media_id"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_wav(synth_samples(int(m), n_samples, channels), sample_rate)
                for m in pdf["media_id"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": "audio",
                    "payload": payloads,
                    "width": np.int32(-1),
                    "height": np.int32(-1),
                    "n_frames": np.int32(n_samples),
                }
            )

    return ids.mapInPandas(run, schema=MEDIA_SCHEMA)


# --- operators --------------------------------------------------------------


def _features_one(payload: bytes) -> tuple:
    n = len(payload)
    if n == 0:
        return 0, 0.0, -1, 0.0, "fallback", -1, -1, 0.0, 0.0, 0.0, -1
    arr = np.frombuffer(payload, dtype=np.uint8)
    byte_mean = float(arr.mean())
    norm = float(int(arr.sum()) % 997) / 997.0
    base = (n, byte_mean, int(payload[0]), norm)
    if payload[:4] == b"RIFF":
        try:
            samples, rate = decode_wav(payload)
            frames, ch = samples.shape
            s = samples.astype(np.float64)
            return base + (
                "wav", ch, -1, 0.0,
                frames / rate,
                float(np.sqrt(np.mean(s * s))),
                int(np.max(np.abs(s))) if frames else 0,
            )
        except (ValueError, NotImplementedError):
            return base + ("fallback", -1, -1, 0.0, 0.0, 0.0, -1)
    try:
        px = decode_image(payload)
        fmt = "ppm" if px.ndim == 3 else "pgm"
        h, w = px.shape[:2]
        return base + (fmt, w, h, float(px.mean()), 0.0, 0.0, -1)
    except (ValueError, NotImplementedError):
        return base + ("fallback", -1, -1, 0.0, 0.0, 0.0, -1)


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction: REAL pixel stats for decodable
    payloads (P6/P5), byte stats otherwise — one schema either way."""
    from distributed_computing_platform_mapreduce_spark.shipping import ensure_shipped

    ensure_shipped(media.sparkSession)
    cols = [f.name for f in FEATURE_SCHEMA.fields[2:]]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame([_features_one(p) for p in pdf["payload"]], columns=cols)
            out.insert(0, "kind", pdf["kind"].values)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Real nearest-neighbor resize of decodable payloads; re-encoded to
    the same format. Undecodable payloads pass through unchanged (their
    metadata keeps the original size)."""
    from distributed_computing_platform_mapreduce_spark.shipping import ensure_shipped

    ensure_shipped(media.sparkSession)

    def one(payload: bytes) -> tuple[bytes, int, int]:
        try:
            px = resize_nearest(decode_image(payload), out_w, out_h)
            return encode_ppm(px), out_w, out_h
        except (ValueError, NotImplementedError):
            return payload, -1, -1

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "payload": [r[0] for r in resized],
                    "width": np.int32([r[1] if r[1] > 0 else w for r, w in zip(resized, pdf["width"])]),
                    "height": np.int32([r[2] if r[2] > 0 else h for r, h in zip(resized, pdf["height"])]),
                    "n_frames": pdf["n_frames"].values,
                }
            )

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one row per sampled
    frame index (JVM-side explode; per-frame decode would slot into a
    downstream mapInPandas like ``extract_features``)."""
    return media.select(
        "media_id",
        "kind",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
        F.col("payload"),
    )
