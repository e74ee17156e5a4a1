"""Structured-Streaming exact deduplication: arriving documents deduped on
their content hash with Spark's stateful streaming
``dropDuplicatesWithinWatermark``.

This is the live form of operators/dedup.py::exact_duplicates — the
training-pipeline shape where a document firehose must emit each distinct
content exactly once.  ``dropDuplicatesWithinWatermark`` is the variant
whose state store actually evicts: plain ``dropDuplicates`` only removes
dedup state when the event-time column is part of the dedup keys
(SPARK-42931 — the motivation for the WithinWatermark form), so keying on
``content_hash`` alone would grow state with every distinct hash ever
seen.  With the WithinWatermark form, a key's state expires once the
watermark passes its first-seen event time plus ``watermark_delay``, so
state is O(distinct hashes within the watermark window), not O(stream
length) — the property that makes the operator viable on an unbounded
100 TB/day feed.

Determinism contract: the operator keeps the FIRST arrival per key, which
is partition-order-dependent — so the deterministic, oracle-checkable
output is the distinct content-hash SET (one row per distinct content
seen inside the watermark window), not the winning doc_id.  Draining a
static directory with ``trigger(availableNow=True)`` and a
``watermark_delay`` wider than the corpus' event-time spread yields
exactly the batch ``SELECT DISTINCT md5(text)`` (no key can expire
mid-drain and re-emit), which is what the ``dedup_stream_backfill`` entry
checks hash-exactly against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_STREAM_SCHEMA = "doc_id bigint, text string, ts timestamp"


def streaming_exact_dedup(
    spark: SparkSession,
    source_dir: str,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark_delay: str = "30 days",
) -> DataFrame:
    """Streaming DataFrame of distinct content hashes (one row per distinct
    ``md5(text)`` first seen inside the watermark window).

    ``watermark_delay`` trades state size against dedup reach: duplicates
    of a hash arriving within ``watermark_delay`` of its first appearance
    are dropped; once the watermark passes first-seen + delay the key's
    state is evicted, so the same content reappearing later re-emits.
    Arriving rows lagging the stream's max event time by more than the
    delay are dropped as late.
    """
    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(source_dir)
    )
    return (
        stream.withColumn("content_hash", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark_delay)
        .dropDuplicatesWithinWatermark(["content_hash"])
        .select("content_hash")
    )
