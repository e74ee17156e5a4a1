"""Grid-cell encoding of spatial instances.

The reference buckets instances into a d x d grid anchored at the dataset's
min corner (reference src/spatial_index.cpp:62-73).  We reproduce that cell
id — ``(floor((x-minx)/c), floor((y-miny)/c))`` — with a top-edge clamp to
``ncells-1`` (the reference has an out-of-bounds write when the extent is an
exact multiple of d; SURVEY §1 quirk 2).  The cell id doubles as the tile id
for the raster/vector heatmap sink and generalizes to an H3/S2-style index:
all downstream operators key on the opaque ``(cell_x, cell_y)`` pair only.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class GridSpec:
    """Anchored uniform grid over the data's bounding box."""

    min_x: float
    min_y: float
    max_x: float
    max_y: float
    cell_size: float

    @property
    def ncells_x(self) -> int:
        return max(1, math.ceil((self.max_x - self.min_x) / self.cell_size))

    @property
    def ncells_y(self) -> int:
        return max(1, math.ceil((self.max_y - self.min_y) / self.cell_size))


def compute_bounds(instances: DataFrame, cell_size: float) -> GridSpec:
    """Single-pass bounds aggregation (the reference does 4 full scans,
    src/spatial_index.cpp:52-59; one ``agg`` replaces them)."""
    row = instances.agg(
        F.min("x").alias("min_x"),
        F.min("y").alias("min_y"),
        F.max("x").alias("max_x"),
        F.max("y").alias("max_y"),
    ).collect()[0]
    if row.min_x is None:  # empty input: degenerate 1-cell grid
        return GridSpec(0.0, 0.0, 0.0, 0.0, cell_size)
    return GridSpec(row.min_x, row.min_y, row.max_x, row.max_y, cell_size)


def _cell_col(v: Column, lo: float, cell: float, ncells: int) -> Column:
    return F.least(
        F.floor((v - F.lit(lo)) / F.lit(cell)).cast("int"), F.lit(ncells - 1)
    )


def with_cell(instances: DataFrame, grid: GridSpec) -> DataFrame:
    """Append ``cell_x``/``cell_y`` tile coordinates."""
    return instances.withColumns(
        {
            "cell_x": _cell_col(F.col("x"), grid.min_x, grid.cell_size, grid.ncells_x),
            "cell_y": _cell_col(F.col("y"), grid.min_y, grid.cell_size, grid.ncells_y),
        }
    )


def cell_sql(grid: GridSpec) -> tuple[str, str]:
    """ANSI-SQL expressions for the same cell id (used by DuckDB oracles)."""
    cx = (
        f"LEAST(CAST(FLOOR((x - ({grid.min_x!r})) / ({grid.cell_size!r})) AS INT), "
        f"{grid.ncells_x - 1})"
    )
    cy = (
        f"LEAST(CAST(FLOOR((y - ({grid.min_y!r})) / ({grid.cell_size!r})) AS INT), "
        f"{grid.ncells_y - 1})"
    )
    return cx, cy
