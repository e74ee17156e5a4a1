"""Structured-Streaming sessionization: Spark's native ``session_window``
over an event firehose — the streaming counterpart of
operators/sessions.py::sessionize.

``session_window(ts, gap)`` keeps a per-key session open while each next
event arrives within ``gap`` of EVENT TIME after the session's last event
(INCLUSIVE — an event exactly at the session's current end extends it,
the same delta <= gap merge rule as the batch operator; pinned by the
boundary unit test), merging out-of-order arrivals into the right
session; state is evicted once the watermark passes a session's end —
the property that bounds state on an unbounded feed.

Determinism contract: all comparisons happen on microsecond-precision
event time, so the backfill oracle works in integer epoch-micros
(``unix_micros`` / DuckDB ``epoch_us``) — no float time arithmetic
anywhere.  Draining a static directory with ``availableNow`` and complete
output mode yields one row per (user, session): ``(user_id, start_us,
end_us, n_events)`` with ``end_us`` = last event + gap, exactly
reproducible by a windowed SQL pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: session_window has no intra-session ordering sensitivity, so unlike
#: the batch operator no event-id tie-break column is needed in the feed
EVENT_STREAM_SCHEMA = "user_id bigint, ts timestamp"


def streaming_sessionize(
    spark: SparkSession,
    source_dir: str,
    gap_seconds: int = 1800,
    watermark_delay: str = "30 days",
) -> DataFrame:
    """Streaming DataFrame of closed/open sessions per user.

    ``watermark_delay`` bounds session state: a session's state is
    dropped (and the session finalized) once the watermark passes its
    end; arrivals later than that are dropped as late rather than
    reopening the session.
    """
    stream = (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(source_dir)
    )
    return (
        stream.withWatermark("ts", watermark_delay)
        .groupBy(
            F.session_window("ts", f"{gap_seconds} seconds").alias("sw"),
            "user_id",
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start")).alias("start_us"),
            F.unix_micros(F.col("sw.end")).alias("end_us"),
            "n_events",
        )
    )
