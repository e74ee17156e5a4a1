"""Structured-Streaming tile densities: continuously-arriving spatial
instances -> windowed per-cell counts with late-data handling.

The reference is batch-only (SURVEY §2.5: no streaming constructs), and the
north rule requires batch-level checkpoint/resume, not streaming — this
module is the engine's *additional* streaming surface for live heatmaps:

    events dir (parquet/json rows: ts timestamp, feature, x, y)
      -> readStream -> cell encode (same GridSpec as batch)
      -> withWatermark(ts) -> groupBy(window(ts), cell) count
      -> writeStream (append once windows close)

Determinism contract with the batch path: running the stream with
``trigger(availableNow=True)`` over a static directory produces exactly the
batch ``tile_counts`` aggregated per window (tested in tests/test_tiles.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cells import GridSpec, with_cell

STREAM_SCHEMA = "ts timestamp, feature string, x double, y double"


def streaming_tile_counts(
    spark: SparkSession,
    source_dir: str,
    grid: GridSpec,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Streaming DataFrame of windowed per-cell instance counts."""
    stream = (
        spark.readStream.schema(STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(source_dir)
    )
    cells = with_cell(stream, grid)
    return (
        cells.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "cell_x", "cell_y")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            "cell_x",
            "cell_y",
            "n",
        )
    )


def run_available_now(
    stream_df: DataFrame,
    checkpoint_dir: str,
    out_table: str,
    output_mode: str = "complete",
) -> None:
    """Drain everything currently in the source into an in-memory sink and
    stop — the batch-equivalence test path and a resumable backfill runner
    (the checkpoint makes reruns incremental).  ``output_mode`` is
    "complete" for aggregations, "append" for stateless plans (e.g. the
    stream-static neighbor join)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(out_table)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
