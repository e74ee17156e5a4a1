"""Tile materialization: per-cell densities as vector polygons or raster rows.

The grid cell id (cells.py) doubles as the tile id.  Two interchangeable
materializations of the same per-cell aggregate:

- *vector*: one row per non-empty cell — cell id, bounding-box polygon
  (WKT), instance count (optionally per feature).  Sparse-friendly.
- *raster*: one row per grid row ``cell_y`` with a dense ``array<bigint>``
  of counts across ``cell_x`` (zero-filled) — a heatmap scanline.  The
  row-per-scanline layout keeps raster rows bounded (ncells_x elements)
  no matter how many instances exist, so it scales with grid size only.

``raster_to_vector`` / ``vector_to_raster`` convert between them losslessly
(round-trip tested), satisfying the north rule's raster<->vector heatmap
output requirement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cells import GridSpec, with_cell


def tile_assign(instances: DataFrame, grid: GridSpec) -> DataFrame:
    """Instance -> tile assignment (engine's per-instance tile id)."""
    return with_cell(instances, grid)


def tile_counts(instances: DataFrame, grid: GridSpec, by_feature: bool = False) -> DataFrame:
    keys = ["cell_x", "cell_y"] + (["feature"] if by_feature else [])
    return (
        with_cell(instances, grid)
        .groupBy(*keys)
        .agg(F.count("*").alias("n"))
    )


def vector_tiles(counts: DataFrame, grid: GridSpec) -> DataFrame:
    """Vector heatmap: cell polygon (WKT) + count per non-empty cell."""
    x0 = F.lit(grid.min_x) + F.col("cell_x") * F.lit(grid.cell_size)
    y0 = F.lit(grid.min_y) + F.col("cell_y") * F.lit(grid.cell_size)
    x1 = x0 + F.lit(grid.cell_size)
    y1 = y0 + F.lit(grid.cell_size)

    def fmt(c: F.Column) -> F.Column:
        # %.6f (not format_number, whose thousands separators corrupt WKT
        # for coordinates >= 1000 and have no ANSI-SQL equivalent)
        return F.format_string("%.6f", c)

    wkt = F.concat(
        F.lit("POLYGON(("),
        fmt(x0), F.lit(" "), fmt(y0), F.lit(", "),
        fmt(x1), F.lit(" "), fmt(y0), F.lit(", "),
        fmt(x1), F.lit(" "), fmt(y1), F.lit(", "),
        fmt(x0), F.lit(" "), fmt(y1), F.lit(", "),
        fmt(x0), F.lit(" "), fmt(y0), F.lit("))"),
    )
    return counts.select("cell_x", "cell_y", wkt.alias("wkt"), "n")


def raster_tiles(counts: DataFrame, grid: GridSpec) -> DataFrame:
    """Raster heatmap: one scanline per cell_y, dense zero-filled counts.

    Built without a driver-side loop: aggregate (cell_x -> n) maps per
    scanline, then project a dense array with ``transform`` over a static
    ``sequence`` — all JVM-side, whole-stage-codegen friendly.
    """
    ncx = grid.ncells_x
    return (
        counts.groupBy("cell_y")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("cell_x"), F.col("n")))
            ).alias("m")
        )
        .select(
            "cell_y",
            F.transform(
                F.sequence(F.lit(0), F.lit(ncx - 1)),
                lambda i: F.coalesce(F.element_at(F.col("m"), i), F.lit(0).cast("long")),
            ).alias("counts"),
        )
    )


def raster_to_vector(raster: DataFrame, grid: GridSpec) -> DataFrame:
    counts = (
        raster.select("cell_y", F.posexplode("counts").alias("cell_x", "n"))
        .filter(F.col("n") > 0)
        .select("cell_x", "cell_y", "n")
    )
    return vector_tiles(counts, grid)


def vector_to_raster(vector: DataFrame, grid: GridSpec) -> DataFrame:
    return raster_tiles(vector.select("cell_x", "cell_y", "n"), grid)


def hotspot_scores(instances: DataFrame, grid: GridSpec) -> DataFrame:
    """Getis-Ord Gi*-style hotspot z-score per non-empty grid cell.

    For each cell i with 3x3 neighborhood (over cells that exist in the
    counts table):  gi = (S_i - k_i * mean) / (s * sqrt((N*k_i - k_i^2) /
    (N - 1)))  where S_i = neighborhood count sum, k_i = neighborhood cell
    count, N / mean / s are the global cell count, mean and population
    stddev of per-cell counts.

    All aggregates are integer sums (count, sum, sum of squares), so the
    doubles are derived through one identical expression on both engines —
    the result is rounded to 9 dp anyway as cross-engine insurance.  The
    neighborhood sum is a 9-offset stencil equi-join on the counts table
    (the same shuffle shape as neighbor_pairs, but over cells, which are
    orders of magnitude fewer than instances).  Cells on the grid edge
    simply have fewer existing neighbors (k_i < 9) — the Gi* denominator
    accounts for k_i.

    Output: (cell_x, cell_y, n, nbr_sum, nbr_cells, gi), gi = NULL when the
    variance is zero or N < 2 (degenerate grids).
    """
    # one-shot materialization (not persist: nothing unpins a cache the
    # caller never sees; the checkpoint is dropped with its RDD reference)
    counts = tile_counts(instances, grid).localCheckpoint()
    g = counts.agg(
        F.count("*").alias("nn"),
        F.sum("n").alias("tot"),
        F.sum(F.col("n") * F.col("n")).alias("totsq"),
    ).collect()[0]
    n_cells, tot, totsq = int(g["nn"]), int(g["tot"] or 0), int(g["totsq"] or 0)
    if n_cells < 2:
        return counts.select(
            "cell_x", "cell_y", "n",
            F.col("n").alias("nbr_sum"),
            F.lit(1).cast("long").alias("nbr_cells"),
            F.lit(None).cast("double").alias("gi"),
        )

    offs = F.array(
        *[
            F.struct(F.lit(ox).alias("ox"), F.lit(oy).alias("oy"))
            for ox in (-1, 0, 1)
            for oy in (-1, 0, 1)
        ]
    )
    probe = counts.withColumn("_o", F.explode(offs)).select(
        F.col("cell_x").alias("p_x"),
        F.col("cell_y").alias("p_y"),
        (F.col("cell_x") + F.col("_o.ox")).alias("t_x"),
        (F.col("cell_y") + F.col("_o.oy")).alias("t_y"),
    )
    nbr = (
        probe.join(
            counts.select(
                F.col("cell_x").alias("t_x"),
                F.col("cell_y").alias("t_y"),
                F.col("n").alias("t_n"),
            ),
            ["t_x", "t_y"],
        )
        .groupBy("p_x", "p_y")
        .agg(F.sum("t_n").alias("nbr_sum"), F.count("*").alias("nbr_cells"))
    )
    mean = F.lit(float(tot)) / F.lit(float(n_cells))
    s = F.sqrt(
        F.lit(float(totsq)) / F.lit(float(n_cells)) - mean * mean
    )
    k = F.col("nbr_cells").cast("double")
    denom = s * F.sqrt(
        (F.lit(float(n_cells)) * k - k * k) / F.lit(float(n_cells - 1))
    )
    # 9-dp round as floor(x*1e9 + 0.5)/1e9 — three explicit IEEE ops that
    # any engine reproduces bitwise.  Spark round() (BigDecimal HALF_UP on
    # the decimal expansion) and DuckDB ROUND (binary multiply/round) can
    # disagree in the last digit near a 9th-dp boundary; this form cannot.
    gi_raw = (F.col("nbr_sum").cast("double") - k * mean) / denom
    gi = F.floor(gi_raw * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)
    out = (
        counts.join(
            nbr,
            (F.col("cell_x") == F.col("p_x")) & (F.col("cell_y") == F.col("p_y")),
        )
        .select(
            "cell_x", "cell_y", "n",
            "nbr_sum", "nbr_cells",
            F.when(denom > 0, gi).alias("gi"),
        )
    )
    return out


def tile_pyramid(
    instances: DataFrame, grid: GridSpec, levels: int = 4
) -> DataFrame:
    """Multi-resolution heatmap pyramid: per-cell counts at the base grid
    plus ``levels - 1`` coarser zoom levels, each cell aggregating its 2x2
    children (exactly the ``cell_parent`` nesting in cells.py — level L
    cell coords are the base coords >> L).

    One base aggregation reads the instances; every coarser level
    re-aggregates the (tiny) next-finer counts table, never the raw data —
    the rollup cost is O(base cells), independent of instance count.

    Output: (level, cell_x, cell_y, n); level 0 = base resolution.
    """
    if levels < 1:
        raise ValueError(f"levels must be >= 1, got {levels}")
    out = tile_counts(instances, grid).select(
        F.lit(0).alias("level"), "cell_x", "cell_y", "n"
    )
    prev = out
    for lv in range(1, levels):
        prev = (
            prev.groupBy(
                F.shiftright("cell_x", 1).alias("cell_x"),
                F.shiftright("cell_y", 1).alias("cell_y"),
            )
            .agg(F.sum("n").alias("n"))
            .select(F.lit(lv).alias("level"), "cell_x", "cell_y", "n")
        )
        out = out.unionByName(prev)
    return out
