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


# --- conic projections: Lambert conformal conic + Albers equal-area --------
# Spherical closed forms (Snyder 1987 §15/§14 sphere cases) on the same R as
# 3857 — the reference reaches these via pyproj (feature/crs.py:162-268);
# with pyproj banned here the spherical forms keep the whole transform in
# codegen column algebra, same discipline as merc/eqc/sinu above. Constants
# (n, F, ρ0) are derived once in Python doubles and embedded as literals in
# BOTH the Column and SQL forms so the two engines compute bit-equal doubles.

from dataclasses import dataclass as _dataclass


@_dataclass(frozen=True)
class ConicParams:
    phi1: float  # first standard parallel (deg)
    phi2: float  # second standard parallel (deg)
    phi0: float  # latitude of origin (deg)
    lam0: float  # central meridian (deg)


#: EPSG codes with their conic family + defining parallels (spherical form)
CONIC_EPSG: dict[int, tuple[str, ConicParams]] = {
    2154: ("lcc", ConicParams(44.0, 49.0, 46.5, 3.0)),       # RGF93 Lambert-93
    102004: ("lcc", ConicParams(33.0, 45.0, 39.0, -96.0)),   # USA Contiguous LCC
    5070: ("albers", ConicParams(29.5, 45.5, 23.0, -96.0)),  # NAD83 Conus Albers
    102008: ("albers", ConicParams(29.5, 45.5, 37.5, -96.0)),  # N.America Albers
}


def _lcc_consts(p: ConicParams) -> tuple[float, float, float]:
    f1, f2, f0 = np.radians([p.phi1, p.phi2, p.phi0])
    n = np.log(np.cos(f1) / np.cos(f2)) / np.log(
        np.tan(np.pi / 4 + f2 / 2) / np.tan(np.pi / 4 + f1 / 2)
    )
    Fc = np.cos(f1) * np.tan(np.pi / 4 + f1 / 2) ** n / n
    rho0 = R * Fc / np.tan(np.pi / 4 + f0 / 2) ** n
    return float(n), float(Fc), float(rho0)


def lcc_xy_np(lon: np.ndarray, lat: np.ndarray, p: ConicParams):
    n, Fc, rho0 = _lcc_consts(p)
    rho = R * Fc / np.tan(np.pi / 4 + np.radians(lat) / 2) ** n
    th = n * np.radians(lon - p.lam0)
    return rho * np.sin(th), rho0 - rho * np.cos(th)


def inv_lcc_cols(x: Column, y: Column, p: ConicParams) -> tuple[Column, Column]:
    n, Fc, rho0 = _lcc_consts(p)
    dy = F.lit(rho0) - y
    rho = F.sqrt(x * x + dy * dy)  # n > 0 for all registered codes
    th = F.atan2(x, dy)
    lon = F.lit(p.lam0) + F.degrees(th) / F.lit(n)
    lat = F.degrees(
        2 * F.atan(F.pow(F.lit(R * Fc) / rho, F.lit(1.0 / n))) - F.lit(np.pi / 2)
    )
    return lon, lat


def inv_lcc_sql(x: str, y: str, p: ConicParams) -> tuple[str, str]:
    n, Fc, rho0 = _lcc_consts(p)
    # force DOUBLE before squaring: DuckDB parses long float literals as
    # DECIMAL and a DECIMAL(38)² overflows
    x = f"CAST(({x}) AS DOUBLE)"
    y = f"CAST(({y}) AS DOUBLE)"
    dy = f"({rho0!r} - ({y}))"
    rho = f"sqrt(({x}) * ({x}) + {dy} * {dy})"
    th = f"atan2(({x}), {dy})"
    lon = f"({p.lam0!r} + degrees({th}) / {n!r})"
    lat = f"degrees(2 * atan(pow({R * Fc!r} / {rho}, {1.0 / n!r})) - {np.pi / 2!r})"
    return lon, lat


def _albers_consts(p: ConicParams) -> tuple[float, float, float]:
    f1, f2, f0 = np.radians([p.phi1, p.phi2, p.phi0])
    n = (np.sin(f1) + np.sin(f2)) / 2
    C = np.cos(f1) ** 2 + 2 * n * np.sin(f1)
    rho0 = R * np.sqrt(C - 2 * n * np.sin(f0)) / n
    return float(n), float(C), float(rho0)


def albers_xy_np(lon: np.ndarray, lat: np.ndarray, p: ConicParams):
    n, C, rho0 = _albers_consts(p)
    rho = R * np.sqrt(C - 2 * n * np.sin(np.radians(lat))) / n
    th = n * np.radians(lon - p.lam0)
    return rho * np.sin(th), rho0 - rho * np.cos(th)


def inv_albers_cols(x: Column, y: Column, p: ConicParams) -> tuple[Column, Column]:
    n, C, rho0 = _albers_consts(p)
    dy = F.lit(rho0) - y
    rho = F.sqrt(x * x + dy * dy)
    th = F.atan2(x, dy)
    lon = F.lit(p.lam0) + F.degrees(th) / F.lit(n)
    lat = F.degrees(F.asin((F.lit(C) - F.pow(rho * F.lit(n / R), F.lit(2.0))) / F.lit(2 * n)))
    return lon, lat


def inv_albers_sql(x: str, y: str, p: ConicParams) -> tuple[str, str]:
    n, C, rho0 = _albers_consts(p)
    x = f"CAST(({x}) AS DOUBLE)"
    y = f"CAST(({y}) AS DOUBLE)"
    dy = f"({rho0!r} - ({y}))"
    rho = f"sqrt(({x}) * ({x}) + {dy} * {dy})"
    th = f"atan2(({x}), {dy})"
    lon = f"({p.lam0!r} + degrees({th}) / {n!r})"
    lat = f"degrees(asin(({C!r} - pow({rho} * {n / R!r}, 2.0)) / {2 * n!r}))"
    return lon, lat


def parse_proj4(s: str):
    """PROJ4-style CRS string → (family, params) for the closed-form
    dispatch (the reference accepts arbitrary CRS input via pyproj/OSR,
    ``feature/crs.py:162-268``; this covers the spherical closed-form
    families implemented here). Returns one of:

    - ``("merc"|"eqc"|"sinu"|"longlat", None)``
    - ``("lcc"|"albers", (ConicParams, x_0, y_0))`` — false easting/
      northing honored (subtracted before the spherical inverse)
    - ``("utm", epsg)`` — +zone/+south → 326xx/327xx
    """
    toks: dict[str, object] = {}
    for t in s.split():
        if not t.startswith("+"):
            continue
        kv = t[1:].split("=", 1)
        toks[kv[0]] = kv[1] if len(kv) == 2 else True
    proj = toks.get("proj")
    if proj in ("merc", "eqc", "sinu"):
        return (proj, None)
    if proj in ("longlat", "latlong"):
        return ("longlat", None)
    if proj in ("lcc", "aea"):
        lat1 = float(toks.get("lat_1", 0.0))
        p = ConicParams(
            lat1,
            float(toks.get("lat_2", lat1)),
            float(toks.get("lat_0", 0.0)),
            float(toks.get("lon_0", 0.0)),
        )
        fam = "lcc" if proj == "lcc" else "albers"
        return (fam, (p, float(toks.get("x_0", 0.0)), float(toks.get("y_0", 0.0))))
    if proj == "utm":
        zone = int(toks["zone"])  # type: ignore[arg-type]
        return ("utm", (32700 if "south" in toks else 32600) + zone)
    raise NotImplementedError(f"unsupported +proj={proj!r} in {s!r}")


def conic_inverse_params(fam: str, p: ConicParams, x0f: float = 0.0, y0f: float = 0.0):
    """(dx, dy) → (lon, lat) for explicit conic params + false easting."""
    inv = inv_lcc_cols if fam == "lcc" else inv_albers_cols
    return lambda dx, dy: inv(dx - F.lit(x0f), dy - F.lit(y0f), p)


def reproject_plan_conic(
    src_grid: Grid, fam: str, p: ConicParams,
    x0f: float = 0.0, y0f: float = 0.0, epsg: int = 0,
) -> Grid:
    """Corner-transform grid derivation for explicit conic params."""
    xmin, ymin, xmax, ymax = src_grid.bounds
    fwd = lcc_xy_np if fam == "lcc" else albers_xy_np
    xs, ys = fwd(np.array([xmin, xmax]), np.array([ymax, ymax]), p)
    cell = (xs[1] - xs[0]) / src_grid.cols
    return Grid(
        x0=float(xs[0] + x0f), y0=float(ys[0] + y0f), cell=float(cell),
        rows=src_grid.rows, cols=src_grid.cols, epsg=epsg,
        nodata=src_grid.nodata,
    )


def conic_inverse_cols(epsg: int):
    """(dx, dy) → (lon, lat) Column transform for a registered conic EPSG —
    plugs straight into :func:`to_crs_nearest`'s callable ``inverse``."""
    fam, p = CONIC_EPSG[epsg]
    inv = inv_lcc_cols if fam == "lcc" else inv_albers_cols
    return lambda dx, dy: inv(dx, dy, p)


def conic_inverse_sql(epsg: int, x: str, y: str) -> tuple[str, str]:
    fam, p = CONIC_EPSG[epsg]
    return (inv_lcc_sql if fam == "lcc" else inv_albers_sql)(x, y, p)


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
    elif target_epsg in CONIC_EPSG:  # LCC / Albers, spherical (VERDICT r2 #5)
        fam, p = CONIC_EPSG[target_epsg]
        fwd = lcc_xy_np if fam == "lcc" else albers_xy_np
        xs, ys = fwd(np.array([xmin, xmax]), np.array([ymax, ymax]), p)
        x0p, x1p, y0p = xs[0], xs[1], ys[0]
    else:
        raise NotImplementedError(
            "closed-form targets: 3857, 4087, 54008, "
            f"{sorted(CONIC_EPSG)} (got {target_epsg})"
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
