"""Cell index + geometry kernel unit tests (numpy side, no Spark)."""

import numpy as np
import pytest

from pyramids_spark import cells
from pyramids_spark.grid import COELLO, CROP_GRID


def _pip_scalar(x, y, p):
    # independent scalar even-odd oracle
    if np.allclose(p[0], p[-1]):
        p = p[:-1]
    inside = False
    for i in range(len(p)):
        xa, ya = p[i]
        xb, yb = p[(i + 1) % len(p)]
        if (ya > y) != (yb > y):
            xint = xa + (y - ya) * (xb - xa) / (yb - ya)
            if x < xint:
                inside = not inside
    return inside


def test_hash_is_stable_and_in_range():
    ids = np.arange(100000)
    h1, h2 = cells.h1_np(ids), cells.h2_np(ids)
    assert h1.min() >= 0 and h1.max() < 2**32
    assert h2.min() >= 0 and h2.max() < 2**32
    # distinct constants → decorrelated streams
    assert abs(np.corrcoef(h1, h2)[0, 1]) < 0.01
    lon, lat = cells.lon_np(h1), cells.lat_np(h2)
    assert lon.min() >= -180 and lon.max() < 180
    assert lat.min() >= -85 and lat.max() < 85


def test_hash_space_cells_match_geo_space_cells():
    """floor(h/2^(32-z)) must equal the geo-grid cell of the derived lon
    (the int path and the float path agree except at the ±90 lat band the
    hash never produces)."""
    ids = np.arange(50000)
    h1 = cells.h1_np(ids)
    zoom = 8
    cx_int = h1 >> (32 - zoom)
    lon = cells.lon_np(h1)
    n = 1 << zoom
    cx_geo = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    assert (cx_int == cx_geo).all()


def test_pack_unpack_parent_children():
    zoom = 10
    cx = np.array([0, 5, 1023, 511], dtype=np.int64)
    cy = np.array([7, 0, 1023, 256], dtype=np.int64)
    cid = cells.pack(cx, cy, zoom)
    ux, uy = cells.unpack(cid, zoom)
    assert (ux == cx).all() and (uy == cy).all()
    par = cells.parent(cid, zoom)
    px, py = cells.unpack(par, zoom - 1)
    assert (px == cx >> 1).all() and (py == cy >> 1).all()
    ch = cells.children(int(par[0]), zoom - 1)
    assert cid[0] in ch and len(ch) == 4


def test_disk_and_ring():
    zoom = 6
    cid = int(cells.pack(np.int64(10), np.int64(10), zoom))
    d0 = cells.disk(cid, zoom, 0)
    assert list(d0) == [cid]
    d2 = cells.disk(cid, zoom, 2)
    assert len(d2) == 25
    dx, dy = cells.ring_offsets(2)
    assert len(dx) == 16 and (np.maximum(abs(dx), abs(dy)) == 2).all()
    # clamping at the grid edge
    corner = int(cells.pack(np.int64(0), np.int64(0), zoom))
    assert len(cells.disk(corner, zoom, 1)) == 4


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_points_in_polygon_matches_scalar_oracle(seed):
    rng = np.random.default_rng(seed)
    v = rng.uniform(-5, 5, (7, 2))
    from pyramids_spark.synth import _convex_hull

    poly = _convex_hull(v)
    px = rng.uniform(-6, 6, 2000)
    py = rng.uniform(-6, 6, 2000)
    got = cells.points_in_polygon(px, py, poly)
    exp = np.array([_pip_scalar(a, b, poly) for a, b in zip(px, py)])
    assert (got == exp).all()


def test_cover_center_mode_is_exact():
    poly = np.array([[0, 0], [10, 0], [10, 6], [0, 6]], float)
    zoom = 9
    cov = cells.cells_covering_polygon(poly, zoom, "center")
    cx, cy = cells.unpack(cov, zoom)
    x0, y0, x1, y1 = cells.cell_bounds_np(cx, cy, zoom)
    ctr_in = cells.points_in_polygon((x0 + x1) / 2, (y0 + y1) / 2, poly)
    assert ctr_in.all()
    # exhaustive complement check within bbox+1
    n = 1 << zoom
    gx, gy = np.meshgrid(np.arange(n // 2 - 30, n // 2 + 30), np.arange(n // 2 - 30, n // 2 + 30))
    gx, gy = gx.ravel(), gy.ravel()
    bx0, by0, bx1, by1 = cells.cell_bounds_np(gx, gy, zoom)
    m = cells.points_in_polygon((bx0 + bx1) / 2, (by0 + by1) / 2, poly)
    assert set(cells.pack(gx[m], gy[m], zoom)) <= set(cov)


def test_cover_intersects_superset_and_touch_duality():
    poly = np.array([[0.01, 0.01], [3.99, 0.01], [3.99, 2.99], [0.01, 2.99]], float)
    zoom = 8
    c = set(cells.cells_covering_polygon(poly, zoom, "center"))
    i = set(cells.cells_covering_polygon(poly, zoom, "intersects"))
    assert c < i  # strict: edge cells touch but centres are outside


def test_grid_affine_contract_coello():
    """FIXTURES.md §4: cell-centre arrays asserted verbatim by reference tests."""
    xs = COELLO.x_centers()
    ys = COELLO.y_centers()
    assert len(xs) == 14 and len(ys) == 13
    assert xs[0] == pytest.approx(432968.1206170588 + 2000.0)
    assert np.allclose(np.diff(xs), 4000.0)
    assert ys[0] == pytest.approx(520007.787999178 - 2000.0)
    assert np.allclose(np.diff(ys), -4000.0)
    # round trip point -> cell -> centre
    col = COELLO.col_of(xs)
    row = COELLO.row_of(ys)
    assert (col == np.arange(14)).all() and (row == np.arange(13)).all()


def test_grid_crop_window_contract():
    """Crop box [0.1,-0.2,0.2,-0.1] on the 0.05° grid selects cols 2:4 × rows 2:4
    (reference spatial.py:911-988 doctest)."""
    g = CROP_GRID
    cols = np.arange(10)
    xc = g.x_centers()
    yc = g.y_centers()
    inx = (xc >= 0.1) & (xc <= 0.2)
    iny = (yc >= -0.2) & (yc <= -0.1)
    assert list(cols[inx]) == [2, 3]
    assert list(cols[iny]) == [2, 3]
