"""pack_chunks: the distributed exclusive prefix sum must equal the
serial scan for any bucket count, and chunk spans must follow the
documented concat-and-chunk semantics."""

import pytest
from pyspark.sql import functions as F

from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.packing import (
    pack_chunks,
)


def _serial(rows, seq_len):
    out, acc = {}, 0
    for k, t in sorted(rows):
        first = acc // seq_len
        last = (acc + max(t, 1) - 1) // seq_len
        out[k] = (t, acc, first, last, last - first + 1)
        acc += t
    return out


@pytest.mark.parametrize("n_buckets", [1, 3, 4096])
def test_matches_serial_scan(spark, n_buckets):
    # ragged sizes incl. zeros, non-contiguous and unsorted keys
    rows = [(7, 5), (1, 0), (3, 2048), (100, 1), (42, 4000), (8, 0), (2, 17)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["offset"], r["chunk_first"], r["chunk_last"],
            r["n_chunks"],
        )
        for r in pack_chunks(df, 2048, n_buckets=n_buckets).collect()
    }
    assert got == _serial(rows, 2048)


def test_negative_and_wide_keys(spark):
    """Bucket ids stay order-preserving for negative keys and a key span
    far wider than the bucket count (integer div, no double rounding)."""
    rows = [(-(10**12), 3), (-5, 2048), (0, 0), (7, 100), (10**12, 1)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["offset"], r["chunk_first"], r["chunk_last"],
            r["n_chunks"],
        )
        for r in pack_chunks(df, 2048, n_buckets=7).collect()
    }
    assert got == _serial(rows, 2048)


def test_offsets_partition_the_stream(spark):
    # consecutive docs tile the stream: offset[i+1] = offset[i] + tokens[i]
    rows = [(i, (i * 37) % 500) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = sorted(
        (r["doc_id"], r["offset"], r["n_tokens"])
        for r in pack_chunks(df, 128, n_buckets=16).collect()
    )
    acc = 0
    for _, off, t in got:
        assert off == acc
        acc += t


def test_single_doc_spanning_many_chunks(spark):
    df = spark.createDataFrame([(1, 10_000)], "doc_id long, n_tokens long")
    r = pack_chunks(df, 1024).collect()[0]
    assert (r["chunk_first"], r["chunk_last"], r["n_chunks"]) == (0, 9, 10)


def test_empty_input(spark):
    df = spark.createDataFrame([], "doc_id long, n_tokens long")
    out = pack_chunks(df, 2048)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "n_tokens", "offset", "chunk_first", "chunk_last", "n_chunks",
    ]


def test_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, 1)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError):
        pack_chunks(df, 0)
    with pytest.raises(ValueError):
        pack_chunks(df, 10, n_buckets=0)


def test_no_global_single_reducer_window(spark):
    """The physical plan must not contain an un-partitioned window — the
    whole point of the two-phase scan (a naive SUM OVER (ORDER BY) with
    no PARTITION BY runs in one task)."""
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("n_tokens")
    )
    plan = pack_chunks(df, 64)._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "partitionBy" not in line:
            # Spark prints windowspecdefinition(partCols..., ordCols...);
            # an un-partitioned global window spec starts with the order
            # column directly followed by the frame — assert our bucket
            # column is in every spec instead.
            assert "_b" in line, f"un-partitioned window in plan: {line}"


def test_skewed_keys_stay_bucket_balanced(spark):
    """Round-6 verdict #6: 99% of keys packed into 1% of the key span
    must NOT collapse into a handful of buckets (the old uniform
    ``(key - min) div width`` arithmetic re-approached the
    single-reducer plan there).  repartitionByRange samples the key
    DISTRIBUTION, so bucket occupancy tracks row count, not key span —
    assert enough active buckets AND unchanged offsets."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.packing import (
        _bucketize,
    )

    n, n_buckets = 10_000, 64
    # 9_900 keys dense in [0, 9_900) — 1% of the 1e6 span — plus 100
    # spread across the rest of the span
    keys = list(range(9_900)) + [10_000 + i * 9_900 for i in range(100)]
    rows = [(k, (k * 13) % 97) for k in keys]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")

    cores = spark.sparkContext.defaultParallelism
    active = (
        _bucketize(df, "doc_id", "n_tokens", n_buckets)
        .select("_b").distinct().count()
    )
    assert active >= min(cores, n_buckets // 2), active

    got = {
        r["doc_id"]: (
            r["n_tokens"], r["offset"], r["chunk_first"], r["chunk_last"],
            r["n_chunks"],
        )
        for r in pack_chunks(df, 2048, n_buckets=n_buckets).collect()
    }
    assert got == _serial(rows, 2048)


def test_source_scanned_once(spark):
    """The advice-r06 triple-scan fix: an expensive tokens_col expression
    (here an accumulator-instrumented column) must be evaluated exactly
    once per row — the bucketed skinny frame is eagerly checkpointed
    before the partials collect and the final window."""
    acc = spark.sparkContext.accumulator(0)

    def bump(v):
        acc.add(1)
        return v

    from pyspark.sql.types import LongType

    bump_udf = F.udf(bump, LongType())
    df = spark.range(50).select(
        F.col("id").alias("doc_id"), bump_udf(F.col("id") % 7).alias("n_tokens")
    )
    out = pack_chunks(df, 64, n_buckets=8)
    out.collect()
    out.collect()  # re-reads the checkpoint, never the source
    assert acc.value == 50, acc.value
