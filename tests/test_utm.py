"""Transverse-Mercator (UTM) transform validation — anchors, round trips,
Spark UDF surface."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyramids_spark.operators import utm


def test_central_meridian_anchor():
    x, y = utm.wgs84_to_utm(np.array([-75.0]), np.array([0.0]), 32618)
    assert abs(x[0] - 500000.0) < 1e-6 and abs(y[0]) < 1e-6
    # northing at lat=1° on the CM = k0 × meridian arc(1°) ≈ 0.9996 × 110574.4
    x1, y1 = utm.wgs84_to_utm(np.array([-75.0]), np.array([1.0]), 32618)
    assert y1[0] == pytest.approx(0.9996 * 110574.38855796, abs=1.0)


def test_southern_hemisphere_false_northing():
    x, y = utm.wgs84_to_utm(np.array([-75.0]), np.array([-1.0]), 32718)
    assert y[0] == pytest.approx(10_000_000.0 - 0.9996 * 110574.38855796, abs=1.0)


def test_roundtrip_machine_precision_with_polish():
    rng = np.random.default_rng(0)
    lon = -81 + 12 * rng.random(20000)
    lat = -84 + 168 * rng.random(20000)
    e, n = utm.wgs84_to_utm(lon, lat, 32618)
    lon2, lat2 = utm.utm_to_wgs84(e, n, 32618)
    err_m = np.max(
        np.hypot((lon2 - lon) * 111320 * np.cos(np.radians(lat)), (lat2 - lat) * 110574)
    )
    assert err_m < 1e-6  # sub-micrometer with Newton polish


def test_series_inverse_submm_within_zone():
    rng = np.random.default_rng(1)
    lon = -78 + 6 * rng.random(20000)  # true ±3° zone width
    lat = -80 + 160 * rng.random(20000)
    e, n = utm.wgs84_to_utm(lon, lat, 32618)
    lon2, lat2 = utm.utm_to_wgs84(e, n, 32618, newton_polish=0)
    err_m = np.max(
        np.hypot((lon2 - lon) * 111320 * np.cos(np.radians(lat)), (lat2 - lat) * 110574)
    )
    assert err_m < 1e-3


def test_coello_grid_roundtrip():
    """The reference coello grid origin (EPSG:32618) survives the ellipsoid
    round trip to machine precision."""
    gx, gy = utm.utm_to_wgs84(
        np.array([432968.1206170588]), np.array([520007.787999178]), 32618
    )
    bx, by = utm.wgs84_to_utm(gx, gy, 32618)
    assert abs(bx[0] - 432968.1206170588) < 1e-6
    assert abs(by[0] - 520007.787999178) < 1e-6


def test_utm_to_utm_cross_zone():
    lon, lat = np.array([-72.1]), np.array([41.0])  # zone 18/19 border area
    e18, n18 = utm.wgs84_to_utm(lon, lat, 32618)
    e19, n19 = utm.wgs84_to_utm(lon, lat, 32619)
    l2, p2 = utm.utm_to_wgs84(e19, n19, 32619)
    assert l2[0] == pytest.approx(-72.1, abs=1e-9) and p2[0] == pytest.approx(41.0, abs=1e-9)
    assert abs(e18[0] - e19[0]) > 100000  # genuinely different frames


def test_to_crs_utm_facade_matches_numpy_oracle(spark):
    from pyramids_spark.api import SparkDataset
    from pyramids_spark.grid import Grid

    g = Grid(x0=-76.0, y0=41.0, cell=0.05, rows=20, cols=40, epsg=4326)
    ds = SparkDataset.create(spark, g, "CAST(row * {cols} + col + 1 AS DOUBLE)")
    out = ds.to_crs(32618)
    assert out.grid.epsg == 32618
    pdf = out.df.toPandas()
    assert len(pdf) == 800
    xc = out.grid.x0 + pdf.col.to_numpy() * out.grid.cell + out.grid.cell / 2
    yc = out.grid.y0 - pdf.row.to_numpy() * out.grid.cell - out.grid.cell / 2
    lon, lat = utm.utm_to_wgs84(xc, yc, 32618)
    sc = np.floor((lon - g.x0) / g.cell).astype(int)
    sr = np.floor((g.y0 - lat) / g.cell).astype(int)
    assert (pdf.value.to_numpy() == sr * 40 + sc + 1).all()


def test_reproject_points_spark_udf(spark):
    from pyramids_spark import synth

    pts = synth.doc_points(spark, 10000).where(
        (F.col("x") > -81) & (F.col("x") < -69) & (F.col("y") > -84) & (F.col("y") < 84)
    )
    fwd = utm.reproject_points(pts, 4326, 32618)
    back = utm.reproject_points(fwd, 32618, 4326)
    a = pts.select("key", "x", "y").toPandas().set_index("key").sort_index()
    b = back.select("key", "x", "y").toPandas().set_index("key").sort_index()
    assert len(a) > 200
    np.testing.assert_allclose(a.x, b.x, atol=1e-9)
    np.testing.assert_allclose(a.y, b.y, atol=1e-9)
