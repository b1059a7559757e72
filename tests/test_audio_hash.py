"""Audio energy-envelope fingerprint: kernel exactness vs pure Python
and the frame-swap Hamming bound, through the real WAV encode/decode."""

import struct

import numpy as np

from uw_mapreduce_spark.functions.multimodal import (
    attach_media,
    energy_hash_audio,
)


def _wav(samples: np.ndarray) -> bytes:
    raw = samples.astype("<i2").tobytes()
    return (
        b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(raw))
    )


def _wav_bytes(samples):
    raw = samples.astype("<i2").tobytes()
    return _wav(samples) + raw


def _ehash_py(samples, frame=4, frames=60):
    v = samples[: frames * frame].astype(np.int64)
    e = (v * v).reshape(frames, frame).sum(axis=1)
    s = int(e.sum())
    return sum(1 << f for f in range(frames) if frames * int(e[f]) > s)


def test_energy_hash_matches_pure_python(spark):
    rng = np.random.RandomState(5)
    clips = [
        rng.randint(-32768, 32768, size=300).astype(np.int16) for _ in range(10)
    ]
    df = spark.createDataFrame(
        [(i, bytearray(_wav_bytes(c))) for i, c in enumerate(clips)],
        "media_id long, payload binary",
    )
    out = {
        r["media_id"]: r["ahash"]
        for r in energy_hash_audio(
            attach_media(df, "media_id", "payload", kind="audio")
        ).collect()
    }
    for i, c in enumerate(clips):
        assert out[i] == _ehash_py(c)


def test_frame_swap_twin_within_hamming_2():
    rng = np.random.RandomState(9)
    for _ in range(30):
        a = rng.randint(-32768, 32768, size=240).astype(np.int16)
        b = a.copy().reshape(60, 4)
        b[[3, 7]] = b[[7, 3]]
        d = bin(_ehash_py(a) ^ _ehash_py(b.reshape(-1))).count("1")
        assert d <= 2


def test_short_clip_yields_null(spark):
    short = np.zeros(10, dtype=np.int16)
    df = spark.createDataFrame(
        [(1, bytearray(_wav_bytes(short)))], "media_id long, payload binary"
    )
    [row] = energy_hash_audio(
        attach_media(df, "media_id", "payload", kind="audio")
    ).collect()
    assert row["ahash"] is None
