"""Raster grid model: affine math + the cell ("raster-as-table") schema.

A raster is a long table ``cells(band, row, col, value)`` (exploded form;
``value`` NULL ≙ nodata) or ``tiles(band, tile_y, tile_x, values:array)``
(blocked form for halo/focal ops), plus a tiny :class:`Grid` metadata struct
that is broadcast, never shuffled — the same discipline as the reference's
pickle-the-path-not-the-handle rule (``abstract_dataset.py:97-122``).

The affine arithmetic reproduces the reference contract bit-for-bit
(asserted by its tests, see SURVEY §1.2):

- geotransform ``(x0, cell, 0, y0, 0, -cell)``  (``abstract_dataset.py:184-193``)
- cell centre:  ``x = x0 + col*cell + cell/2``, ``y = y0 - row*cell - cell/2``
  (``abstract_dataset.py:246-284``)
- point → cell: ``col = floor((x - x0)/cell)``, ``row = floor((y0 - y)/cell)``
  (``dataset/ops/cell.py:304-452`` map_to_array_coordinates)
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Grid:
    x0: float  # top-left corner x
    y0: float  # top-left corner y
    cell: float  # cell size (square cells, north-up)
    rows: int
    cols: int
    epsg: int = 4326
    nodata: float | None = -9999.0

    # --- geotransform ------------------------------------------------------
    @property
    def geotransform(self) -> tuple[float, float, float, float, float, float]:
        return (self.x0, self.cell, 0.0, self.y0, 0.0, -self.cell)

    @property
    def bounds(self) -> tuple[float, float, float, float]:
        """(xmin, ymin, xmax, ymax)."""
        return (
            self.x0,
            self.y0 - self.rows * self.cell,
            self.x0 + self.cols * self.cell,
            self.y0,
        )

    # --- coordinate arrays (reference get_x_lon/get_y_lat contract) --------
    def x_centers(self) -> np.ndarray:
        return self.x0 + np.arange(self.cols) * self.cell + self.cell / 2

    def y_centers(self) -> np.ndarray:
        return self.y0 - np.arange(self.rows) * self.cell - self.cell / 2

    # --- point → cell (numpy) ----------------------------------------------
    def col_of(self, x: np.ndarray) -> np.ndarray:
        return np.floor((np.asarray(x) - self.x0) / self.cell).astype(np.int64)

    def row_of(self, y: np.ndarray) -> np.ndarray:
        return np.floor((self.y0 - np.asarray(y)) / self.cell).astype(np.int64)

    def in_bounds(self, row: np.ndarray, col: np.ndarray) -> np.ndarray:
        return (row >= 0) & (row < self.rows) & (col >= 0) & (col < self.cols)

    # --- point → cell (Column expressions; same formula textually) ---------
    def col_of_col(self, x: Column) -> Column:
        return F.floor((x - F.lit(self.x0)) / F.lit(self.cell)).cast("long")

    def row_of_col(self, y: Column) -> Column:
        return F.floor((F.lit(self.y0) - y) / F.lit(self.cell)).cast("long")

    def x_center_col(self, col: Column) -> Column:
        return F.lit(self.x0) + col * F.lit(self.cell) + F.lit(self.cell / 2)

    def y_center_col(self, row: Column) -> Column:
        return F.lit(self.y0) - row * F.lit(self.cell) - F.lit(self.cell / 2)

    # --- point → cell (SQL strings for DuckDB oracles) ----------------------
    def col_of_sql(self, x: str) -> str:
        return f"CAST(floor((({x}) - {self.x0!r}) / {self.cell!r}) AS BIGINT)"

    def row_of_sql(self, y: str) -> str:
        return f"CAST(floor(({self.y0!r} - ({y})) / {self.cell!r}) AS BIGINT)"

    def x_center_sql(self, col: str) -> str:
        return f"({self.x0!r} + ({col}) * {self.cell!r} + {self.cell / 2!r})"

    def y_center_sql(self, row: str) -> str:
        return f"({self.y0!r} - ({row}) * {self.cell!r} - {self.cell / 2!r})"

    def with_cell(self, cell: float) -> "Grid":
        """New grid over the same extent with a different cell size
        (reference ``resample``: rows = round(extent/cell), ``spatial.py:238-358``)."""
        xmin, ymin, xmax, ymax = self.bounds
        rows = int(round((ymax - ymin) / cell))
        cols = int(round((xmax - xmin) / cell))
        return replace(self, cell=cell, rows=rows, cols=cols)


# Reference test fixtures (FIXTURES.md §4) -----------------------------------

#: coello catchment grid: acc4000.tif analogue (13×14, 4 km, EPSG:32618)
COELLO = Grid(
    x0=432968.1206170588, y0=520007.787999178, cell=4000.0, rows=13, cols=14,
    epsg=32618, nodata=-9999.0,
)

#: 0.05° WGS84 grid used by the crop-window doctest (10×10, corner (0,0))
CROP_GRID = Grid(x0=0.0, y0=0.0, cell=0.05, rows=10, cols=10, epsg=4326)

#: e2e UTM grid (20×20, 1 km, EPSG:32636)
E2E_GRID = Grid(x0=500000.0, y0=3400000.0, cell=1000.0, rows=20, cols=20, epsg=32636)


def grid_df(
    spark: SparkSession,
    grid: Grid,
    value_expr: str = "CAST(row * {cols} + col + 1 AS DOUBLE)",
    bands: int = 1,
) -> DataFrame:
    """Exploded cell table for a grid with a deterministic value per cell.

    Default values are 1..rows*cols row-major from top-left — the reference
    ``raster_to_df_full_of_data`` fixture (``tests/conftest.py:110-119``).
    ``value_expr`` is a SQL expression over ``band/row/col`` so the DuckDB
    oracle can regenerate the identical raster with ``generate_series``.
    """
    ncells = grid.rows * grid.cols
    df = (
        spark.range(bands * ncells)
        .withColumn("band", (F.col("id") / F.lit(ncells)).cast("int"))
        .withColumn("cid", (F.col("id") % F.lit(ncells)).cast("long"))
        .withColumn("row", (F.col("cid") / F.lit(grid.cols)).cast("long"))
        .withColumn("col", (F.col("cid") % F.lit(grid.cols)).cast("long"))
        .withColumn("value", F.expr(value_expr.format(cols=grid.cols)))
        .drop("id", "cid")
    )
    return df


def grid_sql(grid: Grid, value_expr: str = "CAST(row * {cols} + col + 1 AS DOUBLE)", bands: int = 1) -> str:
    """DuckDB CTE body generating the same cell table as :func:`grid_df`."""
    ncells = grid.rows * grid.cols
    ve = value_expr.format(cols=grid.cols)
    return (
        f"SELECT CAST(i // {ncells} AS INT) AS band, "
        f"(i % {ncells}) // {grid.cols} AS row, "
        f"(i % {ncells}) % {grid.cols} AS col, {ve} AS value "
        f"FROM generate_series(0, {bands * ncells - 1}) t(i)"
    )
