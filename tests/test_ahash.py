"""Perceptual aHash: kernel exactness on constructed pixels, the
pixel-swap Hamming bound, and banding losslessness vs brute force."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from uw_mapreduce_spark.functions.multimodal import (
    ahash_images,
    ahash_near_dup_pairs,
    attach_media,
    encode_ppm,
)


def _ahash_py(arr):
    gray = arr.astype(np.int64).sum(axis=2).reshape(-1)
    s = int(gray.sum())
    return sum(1 << j for j in range(60) if 64 * int(gray[j]) > s)


def test_ahash_kernel_matches_pure_python(spark):
    rng = np.random.RandomState(7)
    imgs = [rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8) for _ in range(20)]
    df = spark.createDataFrame(
        [(i, bytearray(encode_ppm(a))) for i, a in enumerate(imgs)],
        "media_id long, payload binary",
    )
    out = {
        r["media_id"]: r["ahash"]
        for r in ahash_images(attach_media(df, "media_id", "payload")).collect()
    }
    for i, a in enumerate(imgs):
        assert out[i] == _ahash_py(a)


def test_ahash_resizes_non_8x8_inputs(spark):
    arr = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    df = spark.createDataFrame(
        [(1, bytearray(encode_ppm(arr)))], "media_id long, payload binary"
    )
    from uw_mapreduce_spark.functions.multimodal import resize_nearest

    [row] = ahash_images(attach_media(df, "media_id", "payload")).collect()
    assert row["ahash"] == _ahash_py(resize_nearest(arr, 8, 8))


def test_pixel_swap_twin_within_hamming_2():
    rng = np.random.RandomState(3)
    for _ in range(50):
        a = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
        b = a.copy().reshape(64, 3)
        b[[3, 7]] = b[[7, 3]]
        b = b.reshape(8, 8, 3)
        d = bin(_ahash_py(a) ^ _ahash_py(b)).count("1")
        assert d <= 2


def test_banded_pairs_lossless_vs_bruteforce(spark):
    """Every Hamming<=3 pair among random 60-bit hashes must surface
    from the 4x15-bit banded join (pigeonhole losslessness)."""
    rng = np.random.RandomState(11)
    base = [int(rng.randint(0, 1 << 30)) | (int(rng.randint(0, 1 << 30)) << 30)
            for _ in range(40)]
    hashes = list(base)
    # plant near-dups at Hamming 1..3 and one far pair
    hashes.append(base[0] ^ 0b1)
    hashes.append(base[1] ^ 0b101)
    hashes.append(base[2] ^ (1 << 59) ^ (1 << 20) ^ 0b1)
    hashes.append(base[3] ^ 0b1111)  # Hamming 4: must NOT pair with base[3]
    df = spark.createDataFrame(
        list(enumerate(hashes)), "media_id long, ahash long"
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in ahash_near_dup_pairs(df, radius=3).collect()
    }
    want = {}
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            d = bin(hashes[i] ^ hashes[j]).count("1")
            if d <= 3:
                want[(i, j)] = d
    assert got == want and (3, len(hashes) - 1) not in got


def test_banding_lossy_config_rejected(spark):
    import pytest

    df = spark.createDataFrame([(1, 5)], "media_id long, ahash long")
    with pytest.raises(ValueError):
        ahash_near_dup_pairs(df, radius=4, bands=4)
