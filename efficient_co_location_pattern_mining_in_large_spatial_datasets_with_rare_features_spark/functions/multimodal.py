"""Multimodal column operators: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow-batched ``mapInPandas`` stages.

The Spark-side plumbing — schemas, batch shapes, UDF signatures,
partitioning behavior — is real and tested.  Steps that need codecs absent
from this container (libjpeg/ffmpeg/soundfile) are either served by the
deterministic fake codec (images, images.py) or STUBBED behind a clearly
marked ``NotImplementedError`` (audio decode, real video demux) with a
deterministic fake generator used for tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from . import images as I

IMAGE_FEATURES_SCHEMA = (
    "image_id string, mean_r double, mean_g double, mean_b double, "
    "luma_hist array<double>"
)
RESIZE_SCHEMA = "image_id string, bytes binary, w int, h int, fmt string"
FRAME_SCHEMA = "video_id string, frame_index int, frame_bytes binary"


def image_features(images: DataFrame) -> DataFrame:
    """Decode -> per-channel means + 8-bin luma histogram (normalized)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "mean_r": [], "mean_g": [], "mean_b": [], "luma_hist": []}
            for iid, buf in zip(pdf.image_id, pdf.bytes):
                px, _ = I.decode(bytes(buf))
                out["image_id"].append(iid)
                means = px.reshape(-1, 3).mean(axis=0)
                out["mean_r"].append(float(means[0]))
                out["mean_g"].append(float(means[1]))
                out["mean_b"].append(float(means[2]))
                luma = px.astype(np.float64).mean(axis=2)
                hist, _ = np.histogram(luma, bins=8, range=(0, 256))
                out["luma_hist"].append((hist / luma.size).tolist())
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Block-mean resize (exact on the fake codec's raw pixels); output is
    re-encoded in the row's original format."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "bytes": [], "w": [], "h": [], "fmt": []}
            for iid, buf, fmt in zip(pdf.image_id, pdf.bytes, pdf.fmt):
                px, _ = I.decode(bytes(buf))
                h, w, _c = px.shape
                ys = np.linspace(0, h, out_h + 1, dtype=int)
                xs = np.linspace(0, w, out_w + 1, dtype=int)
                small = np.empty((out_h, out_w, 3), dtype=np.uint8)
                for i in range(out_h):
                    for j in range(out_w):
                        block = px[
                            ys[i] : max(ys[i + 1], ys[i] + 1),
                            xs[j] : max(xs[j + 1], xs[j] + 1),
                        ]
                        small[i, j] = block.reshape(-1, 3).mean(axis=0).astype(np.uint8)
                out["image_id"].append(iid)
                out["bytes"].append(I.encode(small, fmt))
                out["w"].append(out_w)
                out["h"].append(out_h)
                out["fmt"].append(fmt)
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "fmt").mapInPandas(run, RESIZE_SCHEMA)


# ----------------------------------------------------------------- video
def synth_video_bytes(video_id: str, n_frames: int = 8, w: int = 16, h: int = 16) -> bytes:
    """Deterministic fake 'video': concatenated fake-PNG frames with a tiny
    header — stands in for a real container format."""
    frames = [
        I.encode(I.synth_pixels(f"{video_id}/f{i}", w, h), "png")
        for i in range(n_frames)
    ]
    head = b"FVID" + n_frames.to_bytes(4, "big")
    body = b"".join(len(f).to_bytes(4, "big") + f for f in frames)
    return head + body


def _demux_fake(buf: bytes) -> list[bytes]:
    if buf[:4] != b"FVID":
        raise ValueError(f"unknown video magic {buf[:4]!r}")
    n = int.from_bytes(buf[4:8], "big")
    frames, off = [], 8
    for _ in range(n):
        ln = int.from_bytes(buf[off : off + 4], "big")
        frames.append(buf[off + 4 : off + 4 + ln])
        off += 4 + ln
    return frames


def decode_video_real(buf: bytes) -> list[bytes]:  # pragma: no cover
    """STUB: real container demux needs ffmpeg, absent in this container."""
    raise NotImplementedError("ffmpeg unavailable; use the FVID fake format")


def sample_frames(videos: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling: demux, keep every ``every``-th frame.

    Input: (video_id string, bytes binary).  Output one row per kept frame.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"video_id": [], "frame_index": [], "frame_bytes": []}
            for vid, buf in zip(pdf.video_id, pdf.bytes):
                for idx, frame in enumerate(_demux_fake(bytes(buf))):
                    if idx % every == 0:
                        out["video_id"].append(vid)
                        out["frame_index"].append(idx)
                        out["frame_bytes"].append(frame)
            yield pd.DataFrame(out)

    return videos.select("video_id", "bytes").mapInPandas(run, FRAME_SCHEMA)


# ----------------------------------------------------------------- audio
def decode_audio_real(buf: bytes) -> np.ndarray:  # pragma: no cover
    """STUB: audio decode needs soundfile/ffmpeg, absent in this container.
    The mapInPandas plumbing for audio mirrors sample_frames exactly."""
    raise NotImplementedError("audio codecs unavailable in this container")
