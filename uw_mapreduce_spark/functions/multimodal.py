"""Multimodal (image/audio/video) column plumbing.

Design: media ride through the engine as opaque ``binary`` columns with
a typed metadata struct; decode / feature-extraction are Arrow-batched
``mapInPandas`` stages so the Python cost is per-BATCH, not per-row, and
the Spark-side schema, partitioning, and batch shape are real.

Decoding: uncompressed container formats are decoded REAL and
dependency-free — PPM (P6) and 24-bit BMP images to HWC uint8 arrays,
PCM WAV audio to normalized float samples — so the decode → feature path
runs end-to-end in this container.  Compressed codecs (JPEG/PNG/MP3/…)
require PIL/librosa/ffmpeg, which are absent here; those payloads raise
``NotImplementedError`` with the intended contract (declared stubs).
``fake_features`` (byte stats) remains as the codec-independent
stand-in.  Swapping in a richer decoder changes ONE function, no plan
changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("mime", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("byte_mean", DoubleType(), True),
        StructField("byte_histogram", ArrayType(LongType()), True),
    ]
)


def attach_media(df: DataFrame, id_col: str, payload_col: str, kind: str = "image") -> DataFrame:
    """Normalize any binary payload column into the engine's media schema."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.length(F.col(payload_col).cast("binary")).cast("long").alias("n_bytes"),
        F.lit(f"application/x-{kind}").alias("mime"),
    )


def _decode_ppm(payload: bytes):
    """PPM P6 (binary) → HWC uint8 ndarray.  Header is ASCII tokens
    (magic, width, height, maxval) with ``#`` comments, then ONE
    whitespace byte, then width·height·3 raw bytes."""
    import numpy as np

    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return data.reshape(h, w, 3)


def _decode_bmp(payload: bytes):
    """Uncompressed 24-bit BI_RGB BMP → HWC uint8 ndarray (RGB order).
    Rows are 4-byte padded and stored bottom-up when height > 0."""
    import struct

    import numpy as np

    data_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0] if hdr_size >= 40 else 0
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP supported without PIL")
    bottom_up = h > 0
    h = abs(h)
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_offset
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def decode_image(payload: bytes) -> "object":
    """Decode an image payload to an HWC uint8 array.

    REAL for the uncompressed formats a pure-Python reader can handle
    (PPM P6, 24-bit BMP); compressed formats (JPEG/PNG/WEBP/…) need PIL,
    absent in this container — declared stub for those."""
    if payload is None or len(payload) < 2:
        raise ValueError("empty image payload")
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    raise NotImplementedError(
        "compressed image decode requires PIL; only PPM(P6)/BMP(24-bit) supported here"
    )


def decode_audio(payload: bytes) -> "tuple[object, int]":
    """Decode an audio payload to (float64 samples in [-1, 1] shaped
    (n_frames, channels), sample_rate).

    REAL for PCM WAV (8/16/32-bit integer RIFF); compressed formats
    (MP3/OGG/FLAC) need librosa/soundfile — declared stub for those."""
    import struct

    import numpy as np

    if payload is None or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("compressed audio decode requires librosa/soundfile")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("malformed WAV: truncated fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("malformed WAV: missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1:
        raise NotImplementedError("only PCM WAV supported without codec libs")
    if channels < 1:
        raise ValueError("malformed WAV: zero channels")
    if bits == 8:  # unsigned
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif bits == 16:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 32:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"{bits}-bit PCM not supported")
    n = (len(x) // channels) * channels
    return x[:n].reshape(-1, channels), sample_rate


def fake_features(payload: bytes, bins: int = 8) -> tuple[float, list[int]]:
    """Deterministic stand-in for a decoder: byte mean + coarse histogram."""
    if payload is None or len(payload) == 0:
        return 0.0, [0] * bins
    hist = [0] * bins
    total = 0
    for byte in payload:
        hist[byte * bins // 256] += 1
        total += byte
    return total / len(payload), hist


def extract_features(media: DataFrame, bins: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over the media table.

    ``mapInPandas`` processes whole record batches; the stubbed
    ``fake_features`` sits exactly where a decoder would.  Output schema,
    partitioning, and batch shape are the production ones.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_features(p, bins) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["n_bytes"],
                    "byte_mean": [f[0] for f in feats],
                    "byte_histogram": [f[1] for f in feats],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("width", LongType(), True),  # image only
        StructField("height", LongType(), True),  # image only
        StructField("channel_means", ArrayType(DoubleType()), True),  # image only
        StructField("sample_rate", LongType(), True),  # audio only
        StructField("n_frames", LongType(), True),  # audio only
        StructField("rms", DoubleType(), True),  # audio only
        StructField("decode_error", StringType(), True),
    ]
)


def extract_decoded_features(media: DataFrame) -> DataFrame:
    """REAL decode → feature extraction over the media table.

    Same Arrow ``mapInPandas`` shape as ``extract_features`` but running
    the actual decoders: images (PPM/BMP) yield dimensions + per-channel
    means, audio (PCM WAV) yields sample rate / frame count / RMS.
    Payloads needing an absent codec land in ``decode_error`` instead of
    failing the stage — at corpus scale a bad payload must cost one row,
    not the job."""
    import struct

    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in DECODED_SCHEMA.fields}
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                row = dict.fromkeys(out)
                row["media_id"], row["kind"] = mid, kind
                try:
                    if kind == "image":
                        arr = decode_image(payload)
                        row["height"], row["width"] = arr.shape[0], arr.shape[1]
                        row["channel_means"] = [float(m) for m in arr.mean(axis=(0, 1))]
                    elif kind == "audio":
                        samples, sr = decode_audio(payload)
                        row["sample_rate"], row["n_frames"] = sr, samples.shape[0]
                        row["rms"] = float(np.sqrt(np.mean(samples**2))) if samples.size else 0.0
                    else:
                        row["decode_error"] = f"unsupported kind: {kind}"
                except (NotImplementedError, ValueError, struct.error) as e:
                    # struct.error: truncated binary structure that slipped
                    # past the explicit length checks — still one-row cost.
                    row["decode_error"] = f"{type(e).__name__}: {e}" if isinstance(
                        e, struct.error
                    ) else str(e)
                for k, v in row.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


# ---------------------------------------------------------------------------
# Resize and video frame-sampling — the remaining two multimodal verbs a
# training-data pipeline needs (decode and feature-extract live above).


def encode_ppm(arr) -> bytes:
    """HWC uint8 ndarray → binary PPM (P6).  Inverse of ``_decode_ppm``."""
    h, w = arr.shape[0], arr.shape[1]
    return f"P6\n{w} {h}\n255\n".encode() + arr.astype("uint8").tobytes()


def resize_nearest(arr, width: int, height: int):
    """Nearest-neighbor resize with pure integer index math: output
    pixel (i, j) takes input pixel (i·H //  height, j·W // width).  No
    interpolation, no floats — the choice is deterministic across
    platforms, which is what makes the resize oracle-checkable."""
    import numpy as np

    src_h, src_w = arr.shape[0], arr.shape[1]
    rows = (np.arange(height) * src_h) // height
    cols = (np.arange(width) * src_w) // width
    return arr[rows][:, cols]


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("payload", BinaryType(), True),  # re-encoded PPM
        StructField("decode_error", StringType(), True),
    ]
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode (PPM), Arrow-batched.

    Same mapInPandas contract as the decode stage: a payload needing an
    absent codec costs its own row (``decode_error``), never the batch.
    """
    import struct

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in RESIZED_SCHEMA.fields}
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                row = dict.fromkeys(out)
                row["media_id"], row["kind"] = mid, kind
                try:
                    arr = resize_nearest(decode_image(payload), width, height)
                    row["width"], row["height"] = width, height
                    row["payload"] = encode_ppm(arr)
                except (NotImplementedError, ValueError, struct.error) as e:
                    row["decode_error"] = str(e)
                for k, v in row.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def _ppm_byte_length(payload: bytes, offset: int) -> int:
    """Byte length of the PPM (P6) frame starting at ``offset`` —
    header scan identical to ``_decode_ppm``, without materializing
    pixels.  Lets the video demuxer walk self-describing frames."""
    if payload[offset : offset + 2] != b"P6":
        raise ValueError("not a PPM frame")
    pos, tokens = offset + 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, _ = tokens
    return (pos - offset) + w * h * 3


def demux_video(payload: bytes) -> "list[bytes]":
    """UWV1 container → list of frame payloads (each a standalone PPM).

    Container layout: ASCII header ``UWV1\\n<n_frames>\\n`` followed by
    n self-describing PPM(P6) frames back to back.  A stand-in for a
    real container (MP4/MKV demux needs ffmpeg, absent here) with the
    same pipeline shape: sequential demux, per-frame decode."""
    if payload is None or payload[:5] != b"UWV1\n":
        raise NotImplementedError("compressed video demux requires ffmpeg")
    nl = payload.index(b"\n", 5)
    n = int(payload[5:nl])
    frames, pos = [], nl + 1
    for _ in range(n):
        ln = _ppm_byte_length(payload, pos)
        frames.append(payload[pos : pos + ln])
        pos += ln
    return frames


def sample_frame_indices(n_frames: int, k: int) -> "list[int]":
    """Uniform frame sample, pure integer math: i·(n−1) // (k−1) for
    k>1 (first and last frames always included).  Deterministic, so an
    oracle can name the exact frames."""
    if n_frames <= 0:
        return []
    if k >= n_frames:
        return list(range(n_frames))
    if k == 1:
        return [0]
    return [i * (n_frames - 1) // (k - 1) for i in range(k)]


SAMPLED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame_payload", BinaryType(), True),
        StructField("decode_error", StringType(), True),
    ]
)


def sample_frames(media: DataFrame, k: int) -> DataFrame:
    """Demux each video payload and keep a uniform sample of k frames —
    one output row per sampled frame (Arrow-batched; a bad payload
    yields one error row, not a failed stage)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in SAMPLED_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    frames = demux_video(payload)
                    for idx in sample_frame_indices(len(frames), k):
                        out["media_id"].append(mid)
                        out["frame_idx"].append(idx)
                        out["frame_payload"].append(frames[idx])
                        out["decode_error"].append(None)
                except (NotImplementedError, ValueError) as e:
                    out["media_id"].append(mid)
                    out["frame_idx"].append(-1)
                    out["frame_payload"].append(None)
                    out["decode_error"].append(str(e))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=SAMPLED_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual hashing — image DEDUP, the multimodal twin of MinHash.  A
# training corpus carries the same photo re-encoded/resized thousands of
# times; byte-level fingerprints miss every one of them.  aHash works on
# the decoded pixels: downsample to 8×8, one bit per pixel = "brighter
# than the image mean".  Near-duplicate images agree on almost every bit,
# so dedup = small-Hamming-distance pairs over a 60-bit integer — which
# the banded-join machinery already built for MinHash handles at scale.

AHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("ahash", LongType(), True),
    ]
)


def ahash_images(media: DataFrame) -> DataFrame:
    """REAL decode → 60-bit perceptual average-hash per image.

    Kernel (integer-exact, engine-portable): resize to 8×8
    (nearest-neighbor integer index math), gray_j = r+g+b per pixel in
    row-major order, bit_j = (64·gray_j > Σ_all gray) for j < 60 —
    cross-multiplied against the mean, no division, no floats.  60 bits
    (not 64) keeps the hash inside a signed int64 and splits evenly
    into 4×15-bit LSH bands.

    Arrow ``mapInPandas``: map-only, zero shuffle; a corpus-scale run
    is one decode pass.  Undecodable payloads yield NULL (one-row cost,
    filtered by callers), same policy as ``extract_decoded_features``.
    """
    import numpy as np

    weights = 1 << np.arange(60, dtype=np.int64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    arr = decode_image(payload)
                    if arr.shape[0] != 8 or arr.shape[1] != 8:
                        arr = resize_nearest(arr, 8, 8)
                    gray = arr.astype(np.int64).sum(axis=2).reshape(-1)
                    bits = (64 * gray[:60]) > int(gray.sum())
                    h = int((weights[bits]).sum())
                except (NotImplementedError, ValueError):
                    h = None
                ids.append(mid)
                hashes.append(h)
            yield pd.DataFrame({"media_id": ids, "ahash": hashes})

    return media.mapInPandas(run, schema=AHASH_SCHEMA)


def ahash_near_dup_pairs(
    hashes: DataFrame, radius: int = 3, bands: int = 4, band_bits: int = 15
) -> DataFrame:
    """All image pairs within Hamming distance ``radius`` of each other,
    LOSSLESSLY, via banded candidate generation.

    Pigeonhole: ≤ ``radius`` differing bits spread over ``bands`` bands
    means at least one band is bit-identical whenever
    radius < bands — so the equi-join on (band index, band value)
    generates a superset of the true pairs and the exact
    ``bit_count(xor)`` verify prunes it.  Never all-pairs: candidate
    cost is Σ (bucket size)² over 2^band_bits buckets per band, and
    constant-border real-world images that pile into hot buckets are
    exactly what AQE skew-split handles.  Defaults (radius 3, 4×15-bit
    bands on the 60-bit aHash) satisfy the losslessness condition.
    """
    if radius >= bands:
        raise ValueError(
            f"banding is lossy for radius {radius} >= bands {bands}"
        )
    mask = (1 << band_bits) - 1
    banded = hashes.where(F.col("ahash").isNotNull()).select(
        "media_id",
        "ahash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("ahash"), b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bv"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = a.join(
        b,
        (F.col("a.bv.band") == F.col("b.bv.band"))
        & (F.col("a.bv.val") == F.col("b.bv.val"))
        & (F.col("a.media_id") < F.col("b.media_id")),
    ).select(
        F.col("a.media_id").alias("id_a"),
        F.col("b.media_id").alias("id_b"),
        F.bit_count(F.col("a.ahash").bitwiseXOR(F.col("b.ahash")))
        .cast("long")
        .alias("hamming"),
    )
    # A pair can surface from several agreeing bands: collapse via one
    # group-by (hamming is pair-determined, min is just a tie-silencer).
    return (
        cand.where(F.col("hamming") <= F.lit(radius))
        .groupBy("id_a", "id_b")
        .agg(F.min("hamming").alias("hamming"))
    )


def energy_hash_audio(media: DataFrame, frame: int = 4, frames: int = 60) -> DataFrame:
    """REAL WAV decode → 60-bit energy-envelope fingerprint per clip —
    the audio twin of ``ahash_images`` (same (media_id, ahash) output
    contract, so ``ahash_near_dup_pairs`` provides the pair join).

    Kernel: first ``frames·frame`` samples of channel 0, integer frame
    energies e_f = Σ v² (the decoder's /32768 normalization is a
    power-of-two scale, so v = x·32768 recovers the PCM integers
    exactly), bit_f = (frames·e_f > Σe) — cross-multiplied against the
    mean energy, no division.  Re-encoded or slightly edited clips keep
    their loudness envelope, so near-dups land within small Hamming
    distance.  Map-only Arrow pass; clips too short or undecodable
    yield NULL."""
    import numpy as np

    weights = 1 << np.arange(frames, dtype=np.int64)
    need = frames * frame

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    x, _sr = decode_audio(payload)
                    if x.shape[0] < need:
                        raise ValueError("clip shorter than fingerprint window")
                    v = np.rint(x[:need, 0] * 32768.0).astype(np.int64)
                    e = (v * v).reshape(frames, frame).sum(axis=1)
                    bits = frames * e > int(e.sum())
                    h = int(weights[bits].sum())
                except (NotImplementedError, ValueError):
                    h = None
                ids.append(mid)
                hashes.append(h)
            yield pd.DataFrame({"media_id": ids, "ahash": hashes})

    return media.mapInPandas(run, schema=AHASH_SCHEMA)
