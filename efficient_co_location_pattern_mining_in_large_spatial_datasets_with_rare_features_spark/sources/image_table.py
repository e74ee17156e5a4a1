"""Image+caption table: synthesis and the decode/verify/derive stage.

Per BASELINE.json ``input_hint`` the engine's external input shape is an
Iceberg table ``(image_id string, bytes binary, w int, h int, fmt string,
caption string, phash bigint)`` whose caption is the authoritative carrier
of the spatial instance: ``"<feature> <ordinal> at <x> <y>"`` with full-
precision ``repr(float)`` coordinates (FIXTURES.md §1).

``synthesize_image_table`` embeds any instance DataFrame into that shape
(deterministic pixels per image_id, PNG/JPEG mix); ``derive_instances``
decodes each payload, enforces the per-row invariants (decode/re-encode
round-trip, PSNR >= 40 dB on lossy rows, phash equality, caption/coordinate
consistency) and projects the canonical instance table.  Both stages are
``mapInPandas`` over Arrow batches — no per-row Python in the plan.

At scale the ``bytes`` column never flows into the miner: derivation is the
only stage that touches payloads; everything downstream carries just
``(feature, id, x, y)`` (SURVEY §7 "never shuffle bytes through the miner").

Iceberg note: this container has no Iceberg jars, so the read path detects
the catalog at startup and falls back to parquet; the derivation plan is
identical either way (``read_image_table``).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import images as I

IMAGE_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash bigint"
)
INSTANCE_SCHEMA = "feature string, id string, x double, y double"

PSNR_FLOOR_DB = 40.0


def synthesize_image_table(
    instances: DataFrame, width: int = 32, height: int = 32
) -> DataFrame:
    """Embed an instance table into the image+caption shape.

    ``ordinal`` is whatever follows the feature name in the id (the
    reference synthesizes ids as feature+ordinal, src/data_loader.cpp:28;
    the events-derived ids are ``feature#ordinal``).
    """

    parallelism = instances.sparkSession.sparkContext.defaultParallelism
    if instances.rdd.getNumPartitions() < parallelism:
        instances = instances.repartition(parallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "image_id": [], "bytes": [], "w": [], "h": [],
                "fmt": [], "caption": [], "phash": [],
            }
            for feature, iid, x, y in zip(pdf.feature, pdf.id, pdf.x, pdf.y):
                px = I.synth_pixels(iid, width, height)
                fmt = "png" if zlib.crc32(iid.encode()) % 2 == 0 else "jpeg"
                buf = I.encode(px, fmt)
                decoded, _ = I.decode(buf)
                ordinal = iid[len(feature):].lstrip("#")
                out["image_id"].append(iid)
                out["bytes"].append(buf)
                out["w"].append(width)
                out["h"].append(height)
                out["fmt"].append(fmt)
                out["caption"].append(f"{feature} {ordinal} at {x!r} {y!r}")
                # phash over *decoded* pixels so verification is exact for
                # both lossless and lossy rows
                out["phash"].append(I.dhash64(decoded))
            yield pd.DataFrame(out)

    return instances.mapInPandas(gen, schema=IMAGE_SCHEMA)


def derive_instances(images: DataFrame, verify: bool = True) -> DataFrame:
    """Decode payloads, enforce invariants, project the instance table.

    Raises (task failure -> job failure) on any violated invariant: that is
    deliberate — a corrupt payload must not silently drop a spatial instance.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, ids, xs, ys = [], [], [], []
            for iid, buf, w, h, fmt, caption, phash in zip(
                pdf.image_id, pdf.bytes, pdf.w, pdf.h, pdf.fmt, pdf.caption, pdf.phash
            ):
                toks = caption.split(" ")
                if len(toks) != 5 or toks[2] != "at":
                    raise ValueError(f"malformed caption {caption!r} for {iid}")
                feature, _ordinal, _, xs_s, ys_s = toks
                if verify:
                    px, fmt_dec = I.decode(bytes(buf))
                    if fmt_dec != fmt or px.shape != (h, w, 3):
                        raise ValueError(f"payload mismatch for {iid}")
                    # decode -> re-encode -> decode must be stable, and the
                    # lossy path must stay above the PSNR floor vs the
                    # synthesis source (input_hint invariant)
                    rt, _ = I.decode(I.encode(px, fmt))
                    if not np.array_equal(rt, px):
                        raise ValueError(f"re-encode round-trip drift for {iid}")
                    if fmt == "jpeg":
                        src = I.synth_pixels(iid, w, h)
                        p = I.psnr(src, px)
                        if p < PSNR_FLOOR_DB:
                            raise ValueError(f"PSNR {p:.1f} dB < 40 for {iid}")
                    if I.dhash64(px) != phash:
                        raise ValueError(f"phash mismatch for {iid}")
                feats.append(feature)
                ids.append(iid)
                xs.append(float(xs_s))
                ys.append(float(ys_s))
            yield pd.DataFrame({"feature": feats, "id": ids, "x": xs, "y": ys})

    return images.mapInPandas(run, schema=INSTANCE_SCHEMA)


def read_image_table(spark: SparkSession, path_or_table: str) -> DataFrame:
    """Read the image table from Iceberg when a catalog is configured,
    else from parquet (offline fallback — this container has no Iceberg jar)."""
    if "." in path_or_table and not path_or_table.startswith("/"):
        try:
            return spark.read.table(path_or_table)
        except Exception:
            pass
    return spark.read.parquet(path_or_table)
