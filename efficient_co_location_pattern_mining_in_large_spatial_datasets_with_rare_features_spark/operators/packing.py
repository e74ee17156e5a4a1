"""Sequence packing: concat-and-chunk layout for LLM training batches.

Trainers consume fixed-length token sequences; the standard layout
(GPT-2/3 style) concatenates every document in a deterministic order
into one token stream and slices it at ``seq_len`` boundaries.  The
operator computes, per document, its absolute token ``offset`` in that
stream and the first/last chunk it lands in — everything a writer needs
to materialize packed sequences, without ever materializing the stream.

The crux is a *global* exclusive prefix sum over documents in key
order.  The naive plan — ``SUM() OVER (ORDER BY key)`` with no
PARTITION BY — funnels the whole table through ONE task (Spark executes
an un-partitioned window in a single reducer), which is exactly the
kind of operator that works at sf0.01 and dies at 100 TB.  This module
runs the classic two-phase distributed scan instead:

1. bucket each row by an order-preserving, row-local integer
   ``(key - min_key) div width`` (width sized so there are
   ``n_buckets`` buckets — far more than cores, so the later
   per-bucket window is parallel);
2. one partial-aggregated ``groupBy(bucket).sum`` (map-side combine,
   ≤ ``n_buckets`` rows) collected to the driver, turned into
   per-bucket exclusive base offsets, and broadcast back;
3. a window ``PARTITION BY bucket ORDER BY key`` running sum for the
   within-bucket offset; ``offset = bucket_base + local_offset``.

Two shuffles total (the partial agg and the bucket-keyed window), both
keyed by the bucket id; driver traffic is bounded by ``n_buckets``
regardless of corpus size.  Bucket skew mirrors key-density skew: keys
clustered in a narrow range concentrate buckets, degrading toward the
single-reducer plan — acceptable for the dense synthetic ids here and
documented for real corpora (re-key by a dense row number first if the
id space is pathological).

Ordering contract: ``order_col`` must be unique per row — the prefix
sum (and any SQL oracle's ``ORDER BY``) is otherwise ambiguous.  Both
the operator and the oracle define document order as ascending
``order_col``.

Chunk semantics (documented so the SQL twin is exact):
``chunk_first = offset div seq_len``; ``chunk_last = (offset +
greatest(n_tokens, 1) - 1) div seq_len``.  A zero-token document spans
no tokens; it is assigned to the chunk at its offset (``chunk_last ==
chunk_first``) so every row keeps a well-defined location.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_chunks(
    df: DataFrame,
    seq_len: int,
    tokens_col: str = "n_tokens",
    order_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """Per-document packed-stream position under concat-and-chunk.

    Input: one row per document with a unique integer ``order_col`` and
    a non-negative ``tokens_col``.  Output adds ``offset`` (exclusive
    prefix sum of tokens in key order), ``chunk_first``, ``chunk_last``
    and ``n_chunks`` (all bigint).
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    key = F.col(order_col)
    toks = F.col(tokens_col).cast("long")
    base = df.select(key.alias("_k"), toks.alias("_t"))

    # Row-local, order-preserving bucket id.  Integer arithmetic only:
    # span < 2^63 and width >= 1, so (k - mn) div width is exact where a
    # double-rounded multiply could break monotonicity on wide spans.
    bounds = base.agg(
        F.min("_k").alias("mn"), F.max("_k").alias("mx")
    ).collect()[0]
    if bounds["mn"] is None:  # empty input
        return df.select(
            key.alias(order_col),
            toks.alias(tokens_col),
            F.lit(0).cast("long").alias("offset"),
            F.lit(0).cast("long").alias("chunk_first"),
            F.lit(0).cast("long").alias("chunk_last"),
            F.lit(0).cast("long").alias("n_chunks"),
        ).limit(0)
    mn = int(bounds["mn"])
    span = int(bounds["mx"]) - mn + 1
    width = max(1, -(-span // n_buckets))  # ceil div
    bucketed = base.select(
        "_k", "_t", F.expr(f"(_k - {mn}L) div {width}L").alias("_b")
    )

    # Phase 1: per-bucket token sums -> driver (<= n_buckets rows) ->
    # exclusive prefix per bucket, shipped back as a broadcast join.
    partials = bucketed.groupBy("_b").agg(F.sum("_t").alias("_s")).collect()
    partials.sort(key=lambda r: r["_b"])
    bases, acc = [], 0
    for r in partials:
        bases.append((int(r["_b"]), acc))
        acc += int(r["_s"])
    spark = df.sparkSession
    base_df = spark.createDataFrame(bases, "_b long, _base long")

    # Phase 2: within-bucket running sum, parallel across buckets.
    w = (
        Window.partitionBy("_b")
        .orderBy("_k")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = (
        bucketed.join(F.broadcast(base_df), "_b")
        .select(
            "_k",
            "_t",
            (F.coalesce(F.sum("_t").over(w), F.lit(0)) + F.col("_base")).alias(
                "offset"
            ),
        )
    )
    first = F.expr("offset div " + str(seq_len))
    last = F.expr(f"(offset + greatest(_t, 1L) - 1L) div {seq_len}")
    return offs.select(
        F.col("_k").alias(order_col),
        F.col("_t").alias(tokens_col),
        F.col("offset").cast("long").alias("offset"),
        first.cast("long").alias("chunk_first"),
        last.cast("long").alias("chunk_last"),
        (last - first + F.lit(1)).cast("long").alias("n_chunks"),
    )
