"""Multimodal plumbing tests (SURVEY.md §2.11 L4): binary schema, Arrow
batch shape, decode determinism, row-expansion semantics, stub boundary.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sigma_rx7_spark.llm import multimodal as mm


def test_decode_features_deterministic(spark):
    media = mm.build_media_table(spark, n=16)
    feats = {r.media_id: r for r in mm.decode_features(media).collect()}
    assert len(feats) == 16
    # media 1 is a 16x12 image with pixels (31 + 7i) % 256 — recompute
    px = [(1 * 31 + i * 7) % 256 for i in range(16 * 12)]
    r = feats[1]
    assert (r.width, r.height) == (16, 12)
    assert r.mean_intensity == pytest.approx(sum(px) / len(px))
    hist = [0] * 16
    for b in px:
        hist[b >> 4] += 1
    assert list(r.histogram) == hist


def test_frame_sampling_expansion(spark):
    media = mm.build_media_table(spark, n=16)
    frames = mm.sample_frames(media, stride=2).collect()
    # videos are media_id % 4 == 0 with 5 frames; stride 2 keeps 0,2,4
    vids = {r.media_id for r in frames}
    assert vids == {0, 4, 8, 12}
    per = {}
    for r in frames:
        per.setdefault(r.media_id, []).append(r.frame_idx)
        assert len(r.frame_bytes) == 8 * 6
    assert all(sorted(v) == [0, 2, 4] for v in per.values())


def test_unknown_format_raises(spark):
    bad = spark.createDataFrame(
        [(99, "image", b"JPEGnotreally0000", None)], mm.MEDIA_SCHEMA)
    with pytest.raises(Exception) as exc_info:
        mm.decode_features(bad).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError)


def test_payload_opaque_to_spark(spark):
    # Spark-side ops (filter/partition/count) never interpret payloads.
    media = mm.build_media_table(spark, n=16)
    by_kind = {r.kind: r.n for r in media.groupBy("kind")
               .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_kind == {"video": 4, "image": 12}
