"""Gap-based sessionization of event streams.

The standard event-pipeline rollup: a user's events belong to one session
until a silence longer than ``gap_seconds`` splits it.  Expressed as two
window passes over ``(user, time)`` — a lag-based new-session flag, then
a running sum that numbers sessions — followed by one aggregation; all
whole-stage-codegen expressions, shuffling once on the user key.

At scale this partitions by user (millions of small groups — no skew
beyond the heaviest single user, which AQE's skew handling covers), and
the same construction runs incrementally in Structured Streaming via
``session_window`` — the batch form here is the oracle-checkable
reference semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """One row per (user, session): consecutive events of a user separated
    by at most ``gap_seconds`` of event time.

    Ordering within a user is ``(epoch_seconds, id_col)`` — the id
    tie-break makes session numbering deterministic when two events share
    a timestamp.  Output: ``(user_id, session_id, n_events, start_tse,
    end_tse, duration_sec)``; ``session_id`` numbers a user's sessions
    from 1 in time order.
    """
    tse = F.unix_timestamp(F.col(ts_col)).alias("tse")
    base = events.select(F.col(user_col).alias("user_id"), F.col(id_col).alias("eid"), tse)
    w = Window.partitionBy("user_id").orderBy("tse", "eid")
    flagged = base.withColumn(
        "new_session",
        F.when(
            F.lag("tse").over(w).isNull()
            | ((F.col("tse") - F.lag("tse").over(w)) > F.lit(gap_seconds)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    numbered = flagged.withColumn(
        "session_id",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return (
        numbered.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("tse").alias("start_tse"),
            F.max("tse").alias("end_tse"),
        )
        .select(
            "user_id",
            "session_id",
            "n_events",
            "start_tse",
            "end_tse",
            (F.col("end_tse") - F.col("start_tse")).alias("duration_sec"),
        )
    )
