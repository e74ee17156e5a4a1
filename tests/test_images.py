"""Image payload plumbing: codec invariants, synth->derive round trip through
real Spark mapInPandas stages, and corrupt-payload failure."""

import numpy as np
import pytest

import efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark as eng
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.functions import (
    images as I,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.sources.image_table import (
    derive_instances,
    synthesize_image_table,
)


def test_png_roundtrip_lossless():
    px = I.synth_pixels("A1")
    out, fmt = I.decode(I.encode(px, "png"))
    assert fmt == "png" and np.array_equal(out, px)


def test_jpeg_lossy_psnr_above_floor():
    px = I.synth_pixels("B7")
    out, fmt = I.decode(I.encode(px, "jpeg"))
    assert fmt == "jpeg"
    p = I.psnr(px, out)
    assert 40.0 <= p < 60.0, p
    # quantization is idempotent: re-encode of decoded == same payload
    assert I.encode(out, "jpeg")[12:] == I.encode(px, "jpeg")[12:]


def test_decode_rejects_garbage():
    with pytest.raises(ValueError, match="magic"):
        I.decode(b"NOPE" + b"\x00" * 16)
    with pytest.raises(ValueError, match="size"):
        I.decode(I.MAGIC_PNG + (5).to_bytes(4, "big") + (5).to_bytes(4, "big") + b"\x01")


def test_dhash_stable_and_sensitive():
    a = I.dhash64(I.synth_pixels("A1"))
    assert a == I.dhash64(I.synth_pixels("A1"))
    assert isinstance(a, int)
    # int64-representable (parquet BIGINT)
    assert -(2**63) <= a < 2**63


def test_synthesize_then_derive_roundtrip(spark, sample_instances):
    images = synthesize_image_table(sample_instances)
    assert images.schema.simpleString() == (
        "struct<image_id:string,bytes:binary,w:int,h:int,fmt:string,"
        "caption:string,phash:bigint>"
    )
    derived = derive_instances(images, verify=True)
    orig = {(r.feature, r.id, r.x, r.y) for r in sample_instances.collect()}
    got = {(r.feature, r.id, r.x, r.y) for r in derived.collect()}
    assert got == orig  # exact doubles through repr() captions
    fmts = {r.fmt for r in images.select("fmt").distinct().collect()}
    assert fmts == {"png", "jpeg"}  # both codec paths exercised


def test_derive_rejects_corrupt_payload(spark, sample_instances):
    from pyspark.sql import functions as F

    images = synthesize_image_table(sample_instances)
    corrupt = images.withColumn(
        "bytes", F.when(F.col("image_id") == "A1", F.lit(b"JUNK")).otherwise(F.col("bytes"))
    )
    with pytest.raises(Exception, match="magic|payload"):
        derive_instances(corrupt, verify=True).collect()


def test_mining_through_image_table_matches_direct(spark, sample_instances):
    """Full-stack: image table -> derive -> mine == mine(instances)."""
    derived = derive_instances(synthesize_image_table(sample_instances))
    res = eng.ColocationMiner(spark, eng.ColocationConfig(5.0, 0.6)).mine(derived)
    assert res.pair_count == 48 and len(res.patterns) == 7
