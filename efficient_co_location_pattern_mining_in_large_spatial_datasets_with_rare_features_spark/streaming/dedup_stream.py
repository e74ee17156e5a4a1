"""Structured-Streaming exact deduplication: arriving documents deduped on
their content hash with Spark's stateful streaming ``dropDuplicates``.

This is the live form of operators/dedup.py::exact_duplicates — the
training-pipeline shape where a document firehose must emit each distinct
content exactly once.  The watermark bounds the dedup state store: content
hashes older than ``watermark_delay`` behind the stream's max event time
are evicted, so state is O(distinct hashes within the watermark window),
not O(stream length) — the property that makes the operator viable on an
unbounded 100 TB/day feed.

Determinism contract: ``dropDuplicates`` keeps the FIRST arrival per key,
which is partition-order-dependent — so the deterministic, oracle-checkable
output is the distinct content-hash SET (one row per distinct content ever
seen inside the watermark), not the winning doc_id.  Draining a static
directory with ``trigger(availableNow=True)`` and a ``watermark_delay``
wider than the corpus' event-time spread yields exactly the batch
``SELECT DISTINCT md5(text)`` (nothing is ever late), which is what the
``dedup_stream_backfill`` entry checks hash-exactly against DuckDB.
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

    ``watermark_delay`` trades state size against tolerance for
    out-of-order arrivals: a hash can re-emit only if its content reappears
    more than ``watermark_delay`` of event time after last seen, and an
    arriving row is dropped as late only if it lags the stream's max event
    time by more than the delay.
    """
    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(source_dir)
    )
    return (
        stream.withColumn("content_hash", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark_delay)
        .dropDuplicates(["content_hash"])
        .select("content_hash")
    )
