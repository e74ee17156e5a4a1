"""Multimodal column plumbing: image features, resize, video frame sampling
— real mapInPandas stages over the deterministic fake codecs."""

import numpy as np
import pytest

from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.functions import (
    images as I,
    multimodal as M,
)


def _images(spark, ids, w=32, h=32):
    rows = [
        (iid, I.encode(I.synth_pixels(iid, w, h), "png"), w, h, "png")
        for iid in ids
    ]
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )


def test_image_features(spark):
    df = _images(spark, ["A1", "B2", "C3"])
    out = {r.image_id: r for r in M.image_features(df).collect()}
    assert set(out) == {"A1", "B2", "C3"}
    for r in out.values():
        assert 0 <= r.mean_r <= 255 and 0 <= r.mean_g <= 255
        assert len(r.luma_hist) == 8
        assert abs(sum(r.luma_hist) - 1.0) < 1e-9
    # deterministic: recomputation yields identical features
    again = {r.image_id: r for r in M.image_features(df).collect()}
    assert {k: (v.mean_r, tuple(v.luma_hist)) for k, v in out.items()} == {
        k: (v.mean_r, tuple(v.luma_hist)) for k, v in again.items()
    }


def test_resize_images(spark):
    df = _images(spark, ["A1", "B2"])
    out = M.resize_images(df, 8, 8).collect()
    for r in out:
        assert (r.w, r.h) == (8, 8)
        px, fmt = I.decode(bytes(r.bytes))
        assert px.shape == (8, 8, 3) and fmt == "png"


def test_sample_frames(spark):
    rows = [(f"v{i}", M.synth_video_bytes(f"v{i}", n_frames=8)) for i in range(3)]
    df = spark.createDataFrame(rows, "video_id string, bytes binary")
    out = M.sample_frames(df, every=2).collect()
    by_vid = {}
    for r in out:
        by_vid.setdefault(r.video_id, []).append(r.frame_index)
    assert all(sorted(v) == [0, 2, 4, 6] for v in by_vid.values())
    # frames decode back to pixels
    px, _ = I.decode(bytes(out[0].frame_bytes))
    assert px.shape == (16, 16, 3)


def test_video_garbage_rejected(spark):
    df = spark.createDataFrame([("v0", b"GARBAGE123")], "video_id string, bytes binary")
    with pytest.raises(Exception, match="magic"):
        M.sample_frames(df).collect()


def test_real_codec_stubs_marked():
    with pytest.raises(NotImplementedError):
        M.decode_video_real(b"x")
    with pytest.raises(NotImplementedError):
        M.decode_audio_real(b"x")
    with pytest.raises(NotImplementedError):
        I.decode_real(b"x")
