"""Focal halo-tiles vs offset-join equivalence; kNN engines vs numpy oracle."""

import numpy as np
import pytest

from pyramids_spark import cells, synth
from pyramids_spark.grid import COELLO, Grid, grid_df
from pyramids_spark.operators import focal, knn


def _np_focal_mean_reflect(a: np.ndarray, r: int) -> np.ndarray:
    """Box mean with scipy-uniform_filter 'reflect' boundary (edge repeated:
    (d c b a | a b c d) — numpy's mode='symmetric'), NaN-aware oracle."""
    p = np.pad(a, r, mode="symmetric")
    out = np.empty_like(a, dtype=np.float64)
    for i in range(a.shape[0]):
        for j in range(a.shape[1]):
            w = p[i : i + 2 * r + 1, j : j + 2 * r + 1]
            out[i, j] = np.nanmean(w) if not np.all(np.isnan(w)) else np.nan
    return out


@pytest.mark.parametrize("r", [1, 2])
def test_focal_join_matches_numpy_reflect(spark, r):
    g = grid_df(spark, COELLO)
    got = focal.focal_join(g, COELLO, r=r, stat="mean").toPandas()
    a = (np.arange(182, dtype=np.float64) + 1).reshape(13, 14)
    exp = _np_focal_mean_reflect(a, r)
    for _, row in got.iterrows():
        assert row.value == pytest.approx(exp[int(row.row), int(row.col)], rel=1e-12)
    assert len(got) == 182


@pytest.mark.parametrize("tile,r", [(5, 1), (5, 2), (4, 2), (16, 1)])
def test_focal_tiles_matches_focal_join(spark, tile, r):
    """Halo-tile scale path must equal the offset-join path, with nodata."""
    expr = "CASE WHEN (row * {cols} + col) % 9 = 0 THEN NULL ELSE CAST(row * {cols} + col + 1 AS DOUBLE) END"
    g = grid_df(spark, COELLO, expr)
    a = focal.focal_join(g, COELLO, r=r, stat="mean").toPandas()
    b = focal.focal_tiles(g, COELLO, r=r, stat="mean", tile=tile).toPandas()
    a = a.dropna().sort_values(["row", "col"]).reset_index(drop=True)
    b = b.sort_values(["row", "col"]).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a.row.to_numpy() == b.row.to_numpy()).all()
    np.testing.assert_allclose(a.value.to_numpy(), b.value.to_numpy(), rtol=1e-12)


def test_focal_tiles_std_matches_join_std(spark):
    g = grid_df(spark, COELLO)
    a = focal.focal_join(g, COELLO, r=1, stat="std").toPandas().sort_values(["row", "col"])
    b = focal.focal_tiles(g, COELLO, r=1, stat="std", tile=6).toPandas().sort_values(["row", "col"])
    np.testing.assert_allclose(a.value.to_numpy(), b.value.to_numpy(), rtol=1e-9)


@pytest.mark.parametrize("stat", ["min", "max"])
def test_focal_tiles_minmax_matches_join(spark, stat):
    """Order statistics through the tiled path (focal_apply completion)."""
    expr = "CASE WHEN (row * {cols} + col) % 9 = 0 THEN NULL ELSE CAST(row * {cols} + col + 1 AS DOUBLE) END"
    g = grid_df(spark, COELLO, expr)
    a = focal.focal_join(g, COELLO, r=2, stat=stat).toPandas()
    b = focal.focal_tiles(g, COELLO, r=2, stat=stat, tile=5).toPandas()
    a = a.dropna().sort_values(["row", "col"]).reset_index(drop=True)
    b = b.sort_values(["row", "col"]).reset_index(drop=True)
    assert len(a) == len(b) == 182
    np.testing.assert_array_equal(a.value.to_numpy(), b.value.to_numpy())


def test_focal_tiles_arbitrary_callable(spark):
    """focal_apply semantics: a custom reducer over (h, w, k²) windows —
    here nan-median, cross-checked against nanmedian on the full grid."""
    g = grid_df(spark, COELLO)

    def med(flat):
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            return np.nanmedian(flat, axis=2)

    got = focal.focal_tiles(g, COELLO, r=1, stat=med, tile=6).toPandas()
    a = (np.arange(182, dtype=np.float64) + 1).reshape(13, 14)
    pad = np.pad(a, 1, mode="symmetric")  # scipy 'reflect' == numpy 'symmetric'
    from numpy.lib.stride_tricks import sliding_window_view

    exp = np.nanmedian(sliding_window_view(pad, (3, 3)).reshape(13, 14, 9), axis=2)
    for _, row in got.iterrows():
        assert row.value == pytest.approx(exp[int(row.row), int(row.col)], rel=1e-12)
    assert len(got) == 182


def _np_knn(ids, xs, ys, queries, k):
    exp = []
    for qid, qx, qy in queries:
        d2 = (xs - qx) ** 2 + (ys - qy) ** 2
        order = np.lexsort((ids, d2))[:k]
        exp += [(qid, int(ids[i]), d2[i], r + 1) for r, i in enumerate(order)]
    return exp


@pytest.mark.parametrize(
    "engine", ["partial_topk", "cellpruned", "df_dense", "df_sparse"]
)
def test_knn_matches_numpy(spark, engine):
    n = 4000
    pts = synth.doc_points(spark, n)
    queries = [(0, 10.0, 20.0), (1, -170.0, -80.0), (2, 0.01, 0.02), (3, 179.0, 84.0)]
    if engine == "partial_topk":
        got = knn.knn_join(pts, queries, k=7).toPandas()
    elif engine == "cellpruned":
        got = knn.knn_join_cellpruned(pts, queries, k=7, zoom=4).toPandas()
    else:
        # DataFrame query side; the small radius forces the corner queries
        # through the sparse fallback, the big one resolves all in phase 1
        qdf = spark.createDataFrame(
            queries, "query_id long, qx double, qy double"
        )
        radius = 40.0 if engine == "df_dense" else 4.0
        got = knn.knn_join_df(pts, qdf, k=7, radius=radius).toPandas()
    ids = np.arange(n)
    h1, h2 = cells.h1_np(ids), cells.h2_np(ids)
    h3 = ((ids.astype(np.uint64) * np.uint64(2971215073) + np.uint64(433494437)) % np.uint64(2**32)).astype(np.int64)
    lon, lat = cells.lon_np(h1), cells.lat_np(h2)
    hot = h3 / 2**32 < 0.2
    lon[hot] = -0.5 + (h1[hot] / 2**32)
    lat[hot] = -0.5 + (h2[hot] / 2**32)
    exp = _np_knn(ids, lon, lat, queries, 7)
    got = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(exp)
    for i, (qid, key, d2, rank) in enumerate(exp):
        assert got.query_id[i] == qid and got['key'][i] == key and got['rank'][i] == rank
        assert got.dist2[i] == pytest.approx(d2, rel=1e-12)


def test_knn_k_larger_than_points(spark):
    pts = synth.doc_points(spark, 3)
    got = knn.knn_join(pts, [(0, 0.0, 0.0)], k=10).toPandas()
    assert len(got) == 3  # returns what exists, ranked
    assert list(got.sort_values("rank")["rank"]) == [1, 2, 3]
