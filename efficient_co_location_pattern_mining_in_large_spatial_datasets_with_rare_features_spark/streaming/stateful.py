"""Custom stateful streaming operator: per-tile running totals with
hot-tile flagging, built on ``applyInPandasWithState``.

Windowed aggregation (tile_stream.py) covers per-window densities; this
operator maintains *cumulative* per-cell state across micro-batches — the
shape needed for "tile has ever crossed N instances" style monitors that
plain windowed aggs cannot express (state outlives any window).

State per (cell_x, cell_y): total count and whether the hot threshold was
already crossed.  Each batch emits one row per updated cell with the new
running total and a ``went_hot`` flag that fires exactly once per cell
(first crossing) — downstream can alert without dedup logic.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.cells import GridSpec, with_cell

STREAM_SCHEMA = "ts timestamp, feature string, x double, y double"
OUTPUT_SCHEMA = (
    "cell_x int, cell_y int, total bigint, went_hot boolean"
)
STATE_SCHEMA = "total bigint, hot boolean"


def _make_update(threshold: int):
    def _update(
        key: tuple,
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rows = sum(len(b) for b in batches)
        if state.exists:
            total, hot = state.get
        else:
            total, hot = 0, False
        total += rows
        went_hot = (not hot) and total >= threshold
        state.update((total, hot or went_hot))
        yield pd.DataFrame(
            {
                "cell_x": [key[0]],
                "cell_y": [key[1]],
                "total": [total],
                "went_hot": [went_hot],
            }
        )

    return _update


def streaming_tile_state(
    spark: SparkSession,
    source_dir: str,
    grid: GridSpec,
    hot_threshold: int = 100,
) -> DataFrame:
    """Streaming DataFrame of cumulative per-cell totals + one-shot hot flags."""
    stream = (
        spark.readStream.schema(STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(source_dir)
    )
    cells = with_cell(stream, grid).select("cell_x", "cell_y")
    return cells.groupBy("cell_x", "cell_y").applyInPandasWithState(
        _make_update(hot_threshold),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_update_stream(
    stream_df: DataFrame, checkpoint_dir: str, out_table: str
) -> None:
    """Drain into an in-memory table (no restart support — quick checks)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(out_table)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_update_stream_durable(
    stream_df: DataFrame, checkpoint_dir: str, out_dir: str
) -> None:
    """Drain into an appended parquet dir via foreachBatch — this sink
    supports checkpoint *recovery*, so re-running after new data arrives
    resumes the per-cell state instead of recounting from zero."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
