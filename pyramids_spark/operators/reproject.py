"""Reprojection: raster to_crs / align across CRSes, and coordinate math.

Reference: ``Dataset.to_crs`` (``/root/reference/src/pyramids/dataset/ops/
spatial.py:65-157``; manual corner-transform path ``:360-457``) and the
plan-once ``Reprojector`` (``reproject.py:35-213``). Without GDAL/pyproj we
implement the closed-form spherical Web-Mercator transform (EPSG:4326 ↔
3857) — the projection the reference's own tile math uses
(``basemap/tiles.py``, mercantile) — as pure column expressions, and express
to_crs as the standard distributed gather:

    generate dst grid cells → inverse-project dst centres to src CRS →
    floor-map to src (row, col) → equi-join the src cell table.

That plan is projection-agnostic: any (inverse-)transform expressible as
column math or a pandas UDF slots into the same join. ``convert_longitude``
(0..360 → −180..180, ``spatial.py:192-236``) is the degenerate affine case.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..grid import Grid

R = 6378137.0  # WGS84 spherical radius used by Web-Mercator


def merc_x(lon: Column) -> Column:
    return F.lit(R) * F.radians(lon)


def merc_y(lat: Column) -> Column:
    return F.lit(R) * F.log(F.tan(F.radians(lat) / 2 + F.lit(np.pi / 4)))


def inv_merc_lon(x: Column) -> Column:
    return F.degrees(x / F.lit(R))


def inv_merc_lat(y: Column) -> Column:
    return F.degrees(2 * F.atan(F.exp(y / F.lit(R))) - F.lit(np.pi / 2))


def merc_sql(lon: str, lat: str) -> tuple[str, str]:
    return (
        f"({R!r} * radians({lon}))",
        f"({R!r} * ln(tan(radians({lat}) / 2 + {np.pi / 4!r})))",
    )


def inv_merc_sql(x: str, y: str) -> tuple[str, str]:
    return (
        f"degrees(({x}) / {R!r})",
        f"degrees(2 * atan(exp(({y}) / {R!r})) - {np.pi / 2!r})",
    )


# --- world equidistant cylindrical, EPSG:4087 (plate carrée on the sphere) —
# x = R·λ, y = R·φ; exactly invertible, the closed-form workhorse for
# distance-preserving meridians (reference reprojects via pyproj,
# feature/crs.py:162; this is the same formula pyproj uses for +proj=eqc)
def eqc_x(lon: Column) -> Column:
    return F.lit(R) * F.radians(lon)


def eqc_y(lat: Column) -> Column:
    return F.lit(R) * F.radians(lat)


def inv_eqc_lon(x: Column) -> Column:
    return F.degrees(x / F.lit(R))


def inv_eqc_lat(y: Column) -> Column:
    return F.degrees(y / F.lit(R))


def inv_eqc_sql(x: str, y: str) -> tuple[str, str]:
    return (f"degrees(({x}) / {R!r})", f"degrees(({y}) / {R!r})")


# --- sinusoidal (ESRI:54008), equal-area: x = R·λ·cos(φ), y = R·φ
def sinu_x(lon: Column, lat: Column) -> Column:
    return F.lit(R) * F.radians(lon) * F.cos(F.radians(lat))


def sinu_y(lat: Column) -> Column:
    return F.lit(R) * F.radians(lat)


def inv_sinu_lon(x: Column, y: Column) -> Column:
    return F.degrees(x / (F.lit(R) * F.cos(y / F.lit(R))))


def inv_sinu_lat(y: Column) -> Column:
    return F.degrees(y / F.lit(R))


def inv_sinu_sql(x: str, y: str) -> tuple[str, str]:
    return (
        f"degrees(({x}) / ({R!r} * cos(({y}) / {R!r})))",
        f"degrees(({y}) / {R!r})",
    )


def to_crs_nearest(
    src: DataFrame, src_grid: Grid, dst_grid: Grid,
    inverse: tuple = (inv_merc_lon, inv_merc_lat),
) -> DataFrame:
    """Reproject src (4326 cell table) onto dst_grid (3857 by default):
    nearest-neighbour gather join. ``inverse`` maps dst coords → src coords:
    either a (inv_x_fn, inv_y_fn) pair of single-column transforms, or one
    callable (dx, dy) → (sx, sy) for projections whose inverse couples the
    axes (e.g. sinusoidal).
    """
    spark = src.sparkSession
    ncells = dst_grid.rows * dst_grid.cols
    out = (
        spark.range(ncells)
        .select(
            (F.col("id") / F.lit(dst_grid.cols)).cast("long").alias("row"),
            (F.col("id") % F.lit(dst_grid.cols)).cast("long").alias("col"),
        )
        .withColumn("_dx", dst_grid.x_center_col(F.col("col")))
        .withColumn("_dy", dst_grid.y_center_col(F.col("row")))
    )
    if callable(inverse):
        sx, sy = inverse(F.col("_dx"), F.col("_dy"))
    else:
        inv_x, inv_y = inverse
        sx, sy = inv_x(F.col("_dx")), inv_y(F.col("_dy"))
    out = (
        out.withColumn("_sx", sx)
        .withColumn("_sy", sy)
        .withColumn("src_row", src_grid.row_of_col(F.col("_sy")))
        .withColumn("src_col", src_grid.col_of_col(F.col("_sx")))
    )
    s = src.select(
        "band", F.col("row").alias("src_row"), F.col("col").alias("src_col"), "value"
    )
    return out.join(s, ["src_row", "src_col"]).select("band", "row", "col", "value")


def reproject_plan(src_grid: Grid, target_epsg: int) -> Grid:
    """The ``maintain_alignment=False`` corner-transform grid derivation
    (``spatial.py:360-457``): project the 4 corners, new cell =
    |x1' - x0'| / cols; rows/cols preserved."""
    if src_grid.epsg != 4326:
        raise NotImplementedError("closed-form path reprojects FROM 4326")
    xmin, ymin, xmax, ymax = src_grid.bounds
    if target_epsg == 3857:
        x0p = R * np.radians(xmin)
        x1p = R * np.radians(xmax)
        y0p = R * np.log(np.tan(np.radians(ymax) / 2 + np.pi / 4))
    elif target_epsg == 4087:  # world equidistant cylindrical
        x0p = R * np.radians(xmin)
        x1p = R * np.radians(xmax)
        y0p = R * np.radians(ymax)
    elif target_epsg == 54008:  # sinusoidal (equal-area); corner at ymax
        x0p = R * np.radians(xmin) * np.cos(np.radians(ymax))
        x1p = R * np.radians(xmax) * np.cos(np.radians(ymax))
        y0p = R * np.radians(ymax)
    else:
        raise NotImplementedError(
            f"closed-form targets: 3857, 4087, 54008 (got {target_epsg})"
        )
    cell = (x1p - x0p) / src_grid.cols
    return Grid(
        x0=float(x0p), y0=float(y0p), cell=float(cell),
        rows=src_grid.rows, cols=src_grid.cols, epsg=target_epsg,
        nodata=src_grid.nodata,
    )


def reproject_plan_utm(src_grid: Grid, target_epsg: int) -> Grid:
    """Corner-transform grid derivation for 4326 → UTM (same rule as
    reproject_plan: project corners, cell = |x1'−x0'|/cols)."""
    import numpy as np

    from . import utm

    xmin, ymin, xmax, ymax = src_grid.bounds
    xs, ys = utm.wgs84_to_utm(
        np.array([xmin, xmax]), np.array([ymax, ymax]), target_epsg
    )
    cell = (xs[1] - xs[0]) / src_grid.cols
    return Grid(
        x0=float(xs[0]), y0=float(ys[0]), cell=float(cell),
        rows=src_grid.rows, cols=src_grid.cols, epsg=target_epsg,
        nodata=src_grid.nodata,
    )


def to_crs_nearest_utm(src: DataFrame, src_grid: Grid, dst_grid: Grid) -> DataFrame:
    """4326 cell table → UTM dst grid, nearest gather; the inverse transform
    runs as an Arrow-batched pandas UDF (pure-numpy Krüger series)."""
    from . import utm

    spark = src.sparkSession
    conv = utm.reproject_udf(dst_grid.epsg, 4326)
    ncells = dst_grid.rows * dst_grid.cols
    out = (
        spark.range(ncells)
        .select(
            (F.col("id") / F.lit(dst_grid.cols)).cast("long").alias("row"),
            (F.col("id") % F.lit(dst_grid.cols)).cast("long").alias("col"),
        )
        .withColumn("_dx", dst_grid.x_center_col(F.col("col")))
        .withColumn("_dy", dst_grid.y_center_col(F.col("row")))
        .withColumn("_p", conv(F.col("_dx"), F.col("_dy")))
        .withColumn("src_row", src_grid.row_of_col(F.col("_p.y")))
        .withColumn("src_col", src_grid.col_of_col(F.col("_p.x")))
    )
    s = src.select(
        "band", F.col("row").alias("src_row"), F.col("col").alias("src_col"), "value"
    )
    return out.join(s, ["src_row", "src_col"]).select("band", "row", "col", "value")


def convert_longitude(df: DataFrame, lon: str = "x") -> DataFrame:
    """0..360 → −180..180 (``spatial.py:192-236``)."""
    c = F.col(lon)
    return df.withColumn(lon, F.when(c > 180.0, c - 360.0).otherwise(c))
