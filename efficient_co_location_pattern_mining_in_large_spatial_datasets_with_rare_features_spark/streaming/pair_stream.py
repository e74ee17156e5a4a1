"""Structured-Streaming neighbor pairs: arriving spatial instances joined
against a static reference corpus on the grid stencil.

The core mining join (operators/pairs.py) in its live form: each arriving
instance emits every static instance of a different feature within ``d``.
A stream-static inner join is STATELESS — no watermark or state store; each
micro-batch plans the same cell-keyed hash join the batch operator uses, so
the scale properties (stencil equi-join, no theta join) carry over 1:1.

Determinism contract: draining a static directory with
``trigger(availableNow=True)`` yields exactly the batch neighbor-pair set,
oriented (arriving -> static), i.e. both orientations of the canonical
unordered batch output (tested in tests/test_pairs.py and checked against
the SQL oracle by the ``pairs_stream_backfill`` entry).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cells import GridSpec, with_cell

INSTANCE_STREAM_SCHEMA = "feature string, id string, x double, y double"


def streaming_neighbor_pairs(
    spark: SparkSession,
    source_dir: str,
    static_instances: DataFrame,
    d: float,
    grid: GridSpec,
) -> DataFrame:
    """Streaming DataFrame of (a_* = arriving, b_* = static) pairs within
    ``d`` (inclusive), cross-feature, self-pairs excluded.

    ``grid`` must be precomputed (a stream has no bounds to aggregate) and
    its cell size sets the stencil reach; out-of-bounds arrivals clamp to
    edge cells exactly like the batch path, so no arrival is ever silently
    dropped.
    """
    if grid.cell_size > d:
        raise ValueError(
            f"grid cell_size ({grid.cell_size}) must be <= d ({d})"
        )
    reach = max(1, math.ceil(d / grid.cell_size - 1e-12))
    stream = (
        spark.readStream.schema(INSTANCE_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(source_dir)
    )
    build = with_cell(static_instances, grid).select(
        F.col("feature").alias("b_feature"),
        F.col("id").alias("b_id"),
        F.col("x").alias("b_x"),
        F.col("y").alias("b_y"),
        F.col("cell_x").alias("t_cx"),
        F.col("cell_y").alias("t_cy"),
    )
    offs = F.array(
        *[
            F.struct(F.lit(ox).alias("ox"), F.lit(oy).alias("oy"))
            for ox in range(-reach, reach + 1)
            for oy in range(-reach, reach + 1)
        ]
    )
    probe = with_cell(stream, grid).withColumn("_o", F.explode(offs)).select(
        F.col("feature").alias("a_feature"),
        F.col("id").alias("a_id"),
        F.col("x").alias("a_x"),
        F.col("y").alias("a_y"),
        (F.col("cell_x") + F.col("_o.ox")).alias("t_cx"),
        (F.col("cell_y") + F.col("_o.oy")).alias("t_cy"),
    )
    dist = F.sqrt(
        (F.col("a_x") - F.col("b_x")) ** 2 + (F.col("a_y") - F.col("b_y")) ** 2
    )
    return (
        probe.join(build, ["t_cx", "t_cy"])
        .filter(
            (F.col("a_feature") != F.col("b_feature"))
            & (dist <= F.lit(float(d)))
        )
        .select(
            "a_feature", "a_id", "b_feature", "b_id", dist.alias("dist")
        )
    )
