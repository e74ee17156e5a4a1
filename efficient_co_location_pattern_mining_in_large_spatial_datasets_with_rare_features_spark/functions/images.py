"""Image payload codecs + perceptual checks, Arrow-vectorized.

The engine's primary input (BASELINE.json ``input_hint``) is a table of
image+caption rows ``(image_id, bytes, w, h, fmt, caption, phash)``.  All
pixel work happens in numpy inside ``mapInPandas``/``pandas_udf`` batches —
zero per-row Python in the Spark plan.

Real image libraries (PIL / libjpeg) are NOT available in this container, so
the codec is a deterministic stand-in with the same *contract* as PNG/JPEG:

- ``fpng`` (stands in for PNG): lossless — decode(encode(p)) == p.
- ``fjpg`` (stands in for JPEG): lossy 2-bit quantization — decode is within
  +-2/255 per channel, PSNR ~= 46 dB > the 40 dB invariant floor.

The header carries a magic + dims so malformed payloads fail loudly.  If PIL
ever becomes available, ``decode_real`` is the marked extension point.
"""

from __future__ import annotations

import zlib

import numpy as np

MAGIC_PNG = b"FPNG"
MAGIC_JPG = b"FJPG"

try:  # pragma: no cover - not installed in this container
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


# ------------------------------------------------------------------ pixels
def synth_pixels(image_id: str, w: int = 32, h: int = 32) -> np.ndarray:
    """Deterministic per-id RGB test pattern (FIXTURES.md §1)."""
    seed = zlib.crc32(image_id.encode("utf-8")) % 251
    r = np.arange(h, dtype=np.int64)[:, None, None]
    c = np.arange(w, dtype=np.int64)[None, :, None]
    ch = np.arange(3, dtype=np.int64)[None, None, :]
    return ((r * 31 + c * 17 + ch * 29 + seed) % 256).astype(np.uint8)


# ------------------------------------------------------------------ codecs
def encode(pixels: np.ndarray, fmt: str) -> bytes:
    h, w, _ = pixels.shape
    head = (b"" if fmt == "png" else b"") + (
        MAGIC_PNG if fmt == "png" else MAGIC_JPG
    ) + w.to_bytes(4, "big") + h.to_bytes(4, "big")
    if fmt == "png":
        return head + pixels.tobytes()
    if fmt == "jpeg":
        return head + (pixels >> 2).astype(np.uint8).tobytes()
    raise ValueError(f"unsupported fmt {fmt!r}")


def decode(buf: bytes) -> tuple[np.ndarray, str]:
    """Decode -> (pixels uint8 [h,w,3], fmt). Raises on malformed payloads.

    Routing: FPNG/FJPG payloads use the hermetic fake codec (the CI
    path); anything else is handed to the REAL codec via PIL when it is
    installed (``decode_real``), so real PNG/JPEG corpora flow through
    the same mapInPandas operators with no code change — in this
    container (no PIL) unknown magics fail loudly instead."""
    magic, rest = buf[:4], buf[4:]
    if magic == MAGIC_PNG:
        fmt = "png"
    elif magic == MAGIC_JPG:
        fmt = "jpeg"
    elif HAVE_PIL:
        return decode_real(buf)
    else:
        raise ValueError(
            f"unknown image magic {magic!r} (real codecs need PIL, "
            "not installed in this container)"
        )
    w = int.from_bytes(rest[:4], "big")
    h = int.from_bytes(rest[4:8], "big")
    body = np.frombuffer(rest[8:], dtype=np.uint8)
    if body.size != w * h * 3:
        raise ValueError(f"payload size {body.size} != {w}x{h}x3")
    px = body.reshape(h, w, 3)
    if fmt == "jpeg":
        px = ((px.astype(np.int16) << 2) + 2).clip(0, 255).astype(np.uint8)
    return px, fmt


def decode_real(buf: bytes) -> tuple[np.ndarray, str]:
    """Real PNG/JPEG decode via PIL, same contract as ``decode``.

    Detected at import (``HAVE_PIL``): when PIL is installed,
    ``decode()`` routes every non-FPNG/FJPG payload here, so the
    mapInPandas operators (features, resize, frame sampling) process
    real corpora unchanged.  In this container PIL is absent and the
    FVID/FPNG fake formats remain the hermetic CI path.
    """
    if not HAVE_PIL:  # pragma: no cover - PIL absent in this container
        raise NotImplementedError(
            "real image codecs unavailable in this container; use decode()"
        )
    import io

    import PIL.Image

    try:
        img = PIL.Image.open(io.BytesIO(buf))
        fmt = (img.format or "").lower()
        px = np.asarray(img.convert("RGB"), dtype=np.uint8)
    except Exception as e:  # undecodable bytes: same error contract as fake
        raise ValueError(f"PIL could not decode payload: {e}") from e
    # the documented contract is {png, jpeg}: any other PIL-detected
    # format (gif, webp, bmp, ...) fails AT DECODE TIME rather than
    # being relabeled — reporting, say, a lossy WebP payload as "png"
    # would let a mislabeled row slip past image_table's declared-format
    # integrity check (sources/image_table.py: fmt_dec != fmt)
    if fmt in ("jpg", "jpeg"):
        return px, "jpeg"
    if fmt == "png":
        return px, "png"
    raise ValueError(
        f"decoded format {fmt!r} outside the {{png, jpeg}} contract"
    )


# ------------------------------------------------------------------ checks
def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def dhash64(pixels: np.ndarray) -> int:
    """64-bit difference hash: 8x9 block-mean downsample of the luma plane,
    bit = left > right; returned as signed int64 (parquet/Spark BIGINT)."""
    luma = pixels.astype(np.float64).mean(axis=2)
    h, w = luma.shape
    ys = np.unique(np.linspace(0, h, 9, dtype=int)[:8].clip(0, h - 1))
    xs = np.unique(np.linspace(0, w, 10, dtype=int)[:9].clip(0, w - 1))
    # block sums via reduceat (vectorized; the per-block Python loop was the
    # hot spot of both synthesis and verification)
    sums = np.add.reduceat(np.add.reduceat(luma, ys, axis=0), xs, axis=1)
    rows = np.diff(np.append(ys, h))
    cols = np.diff(np.append(xs, w))
    grid = sums / np.outer(rows, cols)
    if grid.shape != (8, 9):  # degenerate tiny images: pad by edge repeat
        gg = np.zeros((8, 9))
        gg[: grid.shape[0], : grid.shape[1]] = grid[:8, :9]
        grid = gg
    bits = (grid[:, :-1] > grid[:, 1:]).flatten()
    val = np.uint64(0)
    for bit in bits:
        val = np.uint64(val << np.uint64(1)) | np.uint64(bool(bit))
    return int(val.astype(np.int64))
