"""Text functions, multimodal plumbing, as-of join — constructed truth."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from uw_mapreduce_spark.functions.multimodal import attach_media, decode_image, extract_features
from uw_mapreduce_spark.functions.text import doc_stats, fingerprint, lang_id
from uw_mapreduce_spark.operators.asof import asof_join


def test_lang_id_on_real_sentences(spark):
    rows = [
        (0, "the cat sat on the mat and it is a good day for all of us"),
        (1, "der Hund und die Katze sind ein gutes Team und das ist nicht schlecht"),
        (2, "le chat est sur la table et les enfants sont dans le jardin"),
        (3, "el perro y el gato son los mejores amigos de la casa"),
        (4, "xyzzy plugh qwerty asdf"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.pred for r in df.select("doc_id", lang_id(F.col("text")).alias("pred")).collect()}
    assert got == {0: "en", 1: "de", 2: "fr", 3: "es", 4: "und"}


def test_doc_stats_known_string(spark):
    df = spark.createDataFrame([(1, "The quick fox, the lazy dog.")], "doc_id long, text string")
    r = doc_stats(df).collect()[0]
    assert r.n_chars == 28
    assert r.n_tokens == 6
    assert r.n_uniq_tokens == 5  # 'the' twice (lowercased)
    assert r.n_punct == 2
    assert r.n_stopwords == 2
    assert r.stopword_permille == 333
    assert r.uniq_permille == 833


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "  hello world "), (3, "hello worlds")],
        "doc_id long, text string",
    )
    fps = [r.fp for r in df.select(fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_multimodal_plumbing_deterministic(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "")], "doc_id long, text string")
    media = attach_media(df.withColumn("p", F.encode("text", "utf-8")), "doc_id", "p")
    feats = {r.media_id: r for r in extract_features(media, bins=4).collect()}
    assert feats[1].n_bytes == 3
    assert feats[1].byte_mean == pytest.approx((97 + 98 + 99) / 3)
    assert feats[1].byte_histogram == [0, 3, 0, 0]  # 'abc' all in bin 1 (64..127)
    assert feats[2].byte_mean == 0.0


def test_decode_is_declared_stub():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def _make_ppm(w, h):
    """P6 with a comment line; pixel (x,y) = (x%256, y%256, (x+y)%256)."""
    body = bytes((x % 256, y % 256, (x + y) % 256)[c] for y in range(h) for x in range(w) for c in range(3))
    return b"P6\n# test image\n%d %d\n255\n" % (w, h) + body


def _make_bmp(w, h, rgb):
    """Bottom-up uncompressed 24-bit BMP filled with one RGB color."""
    import struct

    stride = ((w * 3 + 3) // 4) * 4
    row = (bytes(rgb[::-1]) * w) + b"\x00" * (stride - 3 * w)
    pixels = row * h
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    return header + dib + pixels


def _make_wav(freq=440, sr=8000, n=800):
    """16-bit mono PCM sine."""
    import math
    import struct

    samples = [int(32767 * 0.5 * math.sin(2 * math.pi * freq * i / sr)) for i in range(n)]
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_real_decoders_roundtrip():
    import numpy as np

    from uw_mapreduce_spark.functions.multimodal import decode_audio

    img = decode_image(_make_ppm(5, 3))
    assert img.shape == (3, 5, 3)
    assert tuple(img[2, 4]) == (4, 2, 6)  # (x%256, y%256, (x+y)%256)

    bmp = decode_image(_make_bmp(4, 2, (10, 20, 30)))
    assert bmp.shape == (2, 4, 3) and tuple(bmp[0, 0]) == (10, 20, 30)

    samples, sr = decode_audio(_make_wav())
    assert sr == 8000 and samples.shape == (800, 1)
    # 0.5-amplitude sine → RMS ≈ 0.5/√2.
    assert np.sqrt((samples**2).mean()) == pytest.approx(0.3536, abs=0.01)


def test_decoded_features_through_mapinpandas(spark):
    """Real decode end-to-end through the Arrow mapInPandas stage: PPM +
    BMP images, a WAV, and an undecodable payload that must land in
    decode_error, not fail the job."""
    from uw_mapreduce_spark.functions.multimodal import extract_decoded_features

    rows = [
        (1, "image", bytearray(_make_ppm(6, 4))),
        (2, "image", bytearray(_make_bmp(4, 2, (255, 0, 0)))),
        (3, "audio", bytearray(_make_wav())),
        (4, "image", bytearray(b"\x89PNG....")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, kind string, p binary")
    media = df.select(
        F.col("doc_id").alias("media_id"), "kind", F.col("p").alias("payload")
    )
    feats = {r.media_id: r for r in extract_decoded_features(media).collect()}
    assert (feats[1].width, feats[1].height) == (6, 4)
    assert feats[2].channel_means == [255.0, 0.0, 0.0]
    assert feats[3].sample_rate == 8000 and feats[3].n_frames == 800
    assert feats[3].rms == pytest.approx(0.3536, abs=0.01)
    assert feats[4].decode_error and "PIL" in feats[4].decode_error
    assert all(feats[i].decode_error is None for i in (1, 2, 3))


def test_asof_join_constructed(spark):
    ts = lambda m: datetime.datetime(2024, 1, 1, 0, m)
    left = spark.createDataFrame(
        [(1, ts(10), "p1"), (1, ts(20), "p2"), (2, ts(5), "p3")],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, ts(10), 100), (1, ts(15), 150), (2, ts(6), 200)],
        "user_id long, ts timestamp, val int",
    )
    out = {r.tag: (r.val_asof, r.ts_asof) for r in asof_join(left, right, on="user_id").collect()}
    assert out["p1"] == (100, ts(10))   # equal ts is inclusive
    assert out["p2"] == (150, ts(15))   # latest at-or-before
    assert out["p3"] == (None, None)    # nothing precedes


def test_asof_join_null_payload_comes_from_matched_row(spark):
    """ASOF semantics: ALL carried values come from the single most
    recent right row — a legitimately-NULL column must stay NULL, not
    fall back to an older row's non-null value (per-column last() bug)."""
    ts = lambda m: datetime.datetime(2024, 1, 1, 0, m)
    left = spark.createDataFrame([(1, ts(30), "q")], "user_id long, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, ts(10), 100, "old"), (1, ts(20), None, "new")],
        "user_id long, ts timestamp, val int, label string",
    )
    r = asof_join(left, right, on="user_id").collect()[0]
    assert r.ts_asof == ts(20)
    assert r.label_asof == "new"
    assert r.val_asof is None  # matched row's NULL, not 100 from ts(10)


def test_cross_corpus_overlap_flags_leak(spark):
    from uw_mapreduce_spark.operators.dedup import cross_corpus_overlap

    leak = "the quick brown fox jumps over the lazy dog tonight again"
    train = spark.createDataFrame(
        [(1, leak + " plus some extra training prose"),
         (2, "completely unrelated text about shuffle partitions and codegen stages")],
        "doc_id long, text string",
    )
    holdout = spark.createDataFrame([(100, leak)], "doc_id long, text string")
    got = {(r.train_doc, r.eval_doc): r.n_common
           for r in cross_corpus_overlap(train, holdout, min_common=3).collect()}
    assert set(got) == {(1, 100)}
    assert got[(1, 100)] >= 6  # the 11-token leak yields 7 shared 5-gram shingles


def test_redact_pii_and_counts(spark):
    import pyspark.sql.functions as F

    from uw_mapreduce_spark.functions.text import pii_counts, redact_pii

    df = spark.createDataFrame(
        [(1, "mail a.user+tag@sub.example.org or call 555-867-5309 now"),
         (2, "no pii here at all")],
        "id long, t string",
    )
    ne, np_ = pii_counts(F.col("t"))
    out = {r.id: (r.r, r.ne, r.np)
           for r in df.select("id", redact_pii(F.col("t")).alias("r"),
                              ne.alias("ne"), np_.alias("np")).collect()}
    assert out[1] == ("mail <EMAIL> or call <PHONE> now", 1, 1)
    assert out[2] == ("no pii here at all", 0, 0)


def test_repetition_stats_flags_degenerate_doc(spark):
    from uw_mapreduce_spark.functions.text import repetition_stats

    df = spark.createDataFrame(
        [(1, "spam spam spam spam spam spam spam spam spam ham"),
         (2, "every token in this sentence is entirely distinct wording"),
         (3, "solo")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.top_token_permille, r.top_bigram_permille)
           for r in repetition_stats(df).collect()}
    assert got[1] == (900, 888)   # 9/10 tokens, 8/9 bigrams
    assert got[2][0] <= 112       # 1/9 tokens
    assert got[3] == (1000, 0)    # single token: no bigrams


def test_tf_df_top_terms_prefers_distinctive(spark):
    """A rare term with moderate tf must outrank a corpus-wide common
    term with higher tf (tf/df), with deterministic term tie-break."""
    from uw_mapreduce_spark.functions.text import tf_df_top_terms

    rows = [
        (1, "the the the the the zebra zebra quagga"),
        (2, "the the common words here"),
        (3, "the common words again appear"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_id, r.rnk): (r.term, r.score)
           for r in tf_df_top_terms(df, k=2).collect()}
    # doc 1: zebra tf=2 df=1 -> 2e6 beats the tf=5 df=3 -> 1.67e6
    assert got[(1, 1)] == ("zebra", 2_000_000)
    assert got[(1, 2)] == ("the", 1_666_666)
    # doc 2: unique "here" (1e6) outranks the common "the" (2/3 ~ 0.67e6)
    assert got[(2, 1)] == ("here", 1_000_000)


def test_resize_nearest_and_ppm_roundtrip():
    """Integer nearest-neighbor picks pixel (i*H//h, j*W//w); PPM encode
    is the exact inverse of the decoder."""
    import numpy as np

    from uw_mapreduce_spark.functions.multimodal import (
        _decode_ppm,
        encode_ppm,
        resize_nearest,
    )

    arr = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    assert np.array_equal(_decode_ppm(encode_ppm(arr)), arr)
    small = resize_nearest(arr, 4, 4)
    assert small.shape == (4, 4, 3)
    # output (i, j) == input (2i, 2j)
    for i in range(4):
        for j in range(4):
            assert np.array_equal(small[i, j], arr[2 * i, 2 * j])
    # upscale works too: output (i, j) == input (i*8//16, j*8//16)
    big = resize_nearest(arr, 16, 16)
    assert np.array_equal(big[15, 15], arr[7, 7])


def test_video_demux_and_sampling():
    """UWV1 demux walks self-describing PPM frames; uniform sampling is
    pure integer math including the edge cases."""
    import numpy as np

    from uw_mapreduce_spark.functions.multimodal import (
        _decode_ppm,
        demux_video,
        encode_ppm,
        sample_frame_indices,
    )

    frames = [
        encode_ppm(np.full((2 + f, 3, 3), f, dtype=np.uint8)) for f in range(5)
    ]  # deliberately varying sizes: demux must parse each header
    video = b"UWV1\n5\n" + b"".join(frames)
    got = demux_video(video)
    assert got == frames
    assert _decode_ppm(got[3]).shape == (5, 3, 3)

    assert sample_frame_indices(6, 3) == [0, 2, 5]
    assert sample_frame_indices(5, 1) == [0]
    assert sample_frame_indices(3, 7) == [0, 1, 2]   # k >= n: all frames
    assert sample_frame_indices(0, 4) == []

    import pytest

    with pytest.raises(NotImplementedError):
        demux_video(b"\x00\x00\x00\x18ftypmp42 not supported")


def test_resize_images_bad_payload_costs_one_row(spark):
    """A payload the decoder rejects lands in decode_error; the good
    rows still resize."""
    from pyspark.sql import functions as F

    from uw_mapreduce_spark.functions.multimodal import (
        attach_media,
        resize_images,
    )
    import numpy as np

    from uw_mapreduce_spark.functions.multimodal import encode_ppm

    good = encode_ppm(np.zeros((8, 8, 3), dtype=np.uint8))
    rows = [(1, good), (2, b"\x89PNG\r\n not decodable here")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = resize_images(attach_media(df, "doc_id", "payload"), 4, 4).collect()
    by_id = {r.media_id: r for r in out}
    assert by_id[1].decode_error is None and by_id[1].width == 4
    assert by_id[2].decode_error is not None and by_id[2].payload is None


def test_asof_forward_direction(spark):
    from pyspark.sql import functions as F

    from uw_mapreduce_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k", 10, "l1"), ("k", 20, "l2"), ("k", 35, "l3")], "k string, ts long, l string"
    )
    right = spark.createDataFrame(
        [("k", 5, "a"), ("k", 20, "b"), ("k", 30, "c")], "k string, ts long, v string"
    )
    fwd = {
        r["l"]: (r["v_asof"], r["ts_asof"])
        for r in asof_join(left, right, on="k", ts_col="ts", direction="forward").collect()
    }
    # l1(ts=10) -> first right at-or-after = (b, 20); l2(20) -> inclusive (b, 20);
    # l3(35) -> nothing after -> NULLs.
    assert fwd == {"l1": ("b", 20), "l2": ("b", 20), "l3": (None, None)}
    import pytest

    with pytest.raises(ValueError):
        asof_join(left, right, on="k", ts_col="ts", direction="sideways")
