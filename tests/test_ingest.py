"""binaryFile media ingestion (`sources/ingest.read_binary_dir`):
glob + size pruning at the source, payload fidelity, and the feed into
the multimodal decode stage.
"""

from __future__ import annotations

def test_read_binary_dir_feeds_multimodal_decode(spark, tmp_path):
    """binaryFile ingestion -> attach_media -> real PPM decode, end to
    end: the media-dump entry point produces exactly the payloads on
    disk, glob filtering prunes non-matching files, and max_bytes
    prunes on source metadata."""
    from pyspark.sql import functions as F

    from uw_mapreduce_spark.functions.multimodal import (
        attach_media,
        extract_decoded_features,
    )
    from uw_mapreduce_spark.sources.ingest import read_binary_dir

    # Two tiny valid PPMs (2x1 and 1x1) + one decoy .txt + one oversized.
    ppm_a = b"P6\n2 1\n255\n" + bytes([255, 0, 0, 0, 255, 0])
    ppm_b = b"P6\n1 1\n255\n" + bytes([0, 0, 255])
    (tmp_path / "a.ppm").write_bytes(ppm_a)
    (tmp_path / "b.ppm").write_bytes(ppm_b)
    (tmp_path / "note.txt").write_bytes(b"not an image")
    (tmp_path / "huge.ppm").write_bytes(b"P6\n9 9\n255\n" + b"\x00" * 500)

    raw = read_binary_dir(spark, str(tmp_path), glob="*.ppm", max_bytes=100)
    rows = {r.path.rsplit("/", 1)[-1]: bytes(r.payload) for r in raw.collect()}
    assert rows == {"a.ppm": ppm_a, "b.ppm": ppm_b}  # decoy + oversized pruned

    media = attach_media(
        raw.withColumn("media_id", F.xxhash64("path")), "media_id", "payload"
    )
    decoded = {
        (r.width, r.height)
        for r in extract_decoded_features(media).select("width", "height").collect()
    }
    assert decoded == {(2, 1), (1, 1)}
