"""Facade API, streaming ingest, and mesh operator tests."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyramids_spark.api import SparkDataset, SparkDatasetCollection, SparkFeatureCollection
from pyramids_spark.grid import COELLO, Grid
from pyramids_spark.operators import mesh


def test_dataset_facade_pipeline(spark, tmp_path):
    """create → apply → crop → stats → save/reload round trip (the reference
    e2e workflow shape, tests/test_e2e_workflows.py)."""
    ds = SparkDataset.create(spark, COELLO, "CAST(row * {cols} + col + 1 AS DOUBLE)")
    ds2 = ds.apply(F.col("value") * 2.0)
    box = (COELLO.x0, COELLO.y0 - 8000.0, COELLO.x0 + 8000.0, COELLO.y0)
    cropped = ds2.crop(box).toPandas()
    assert len(cropped) == 4
    assert sorted(cropped.value) == [2.0, 4.0, 30.0, 32.0]
    st = ds2.stats().toPandas()
    assert st["min"].iloc[0] == 2.0 and st["max"].iloc[0] == 364.0
    p = str(tmp_path / "ds")
    ds2.to_parquet(p)
    back = SparkDataset.read_parquet(spark, p, COELLO)
    assert back.count_domain_cells().toPandas().n_domain.iloc[0] == 182


def test_dataset_facade_align_resample_overviews(spark):
    ds = SparkDataset.create(spark, COELLO, "CAST(row * {cols} + col + 1 AS DOUBLE)")
    up = ds.resample(2000.0)
    assert (up.grid.rows, up.grid.cols) == (26, 28)
    back = up.align(ds)
    assert back.df.count() == 182
    ovs = ds.create_overviews(levels=(2, 4))
    assert ovs[2].count() == 7 * 7 and ovs[4].count() == 4 * 4
    # kernel pyramid: iterative ×2 with extent clamp at every level
    kv = ds.create_overviews(levels=(2, 4), method="gauss")
    assert kv[2].count() == 7 * 7 and kv[4].count() == 4 * 4
    lz = ds.create_overviews(levels=(2,), method="lanczos")
    assert lz[2].count() == 7 * 7


def test_feature_collection_facade(spark, tmp_path):
    pdf = pd.DataFrame(
        {"fid": range(100), "x": np.linspace(-10, 10, 100), "y": np.linspace(-5, 5, 100),
         "attr": np.arange(100) % 7}
    )
    fc = SparkFeatureCollection(spark.createDataFrame(pdf))
    p = str(tmp_path / "fc")
    fc.to_parquet(p)
    # pushdown read: bbox + columns + where
    sub = SparkFeatureCollection.read_parquet(
        spark, p, bbox=(-5, -5, 5, 5), columns=["fid", "x", "y"], where="fid % 2 = 0"
    )
    got = sub.df.toPandas()
    assert (got.x.abs() <= 5).all() and set(got.columns) == {"fid", "x", "y"}
    assert (got.fid % 2 == 0).all()
    # concat + CRS guard
    both = fc.concat(fc)
    assert both.df.count() == 200
    with pytest.raises(ValueError):
        fc.concat(SparkFeatureCollection(fc.df, epsg=3857))
    # spatial shuffle keeps all rows, sorts by morton ranges
    sh = fc.spatial_shuffle(zoom=10, partitions=4)
    assert sh.df.count() == 100
    # iter_features batches
    batches = list(fc.iter_features(chunksize=30))
    assert [len(b) for b in batches] == [30, 30, 30, 10]


def test_collection_facade_temporal(spark):
    rows = []
    for t in range(4):
        for r in range(3):
            for c in range(3):
                rows.append((t, 0, r, c, float(t + r * 3 + c)))
    df = spark.createDataFrame(rows, "t int, band int, row long, col long, value double")
    col = SparkDatasetCollection(df)
    m = col.reduce("mean").toPandas()
    assert m[(m.row == 0) & (m.col == 0)].value.iloc[0] == pytest.approx(1.5)
    h = col.head(2)
    assert h.count() == 18
    t = col.tail(1)
    assert t.count() == 9
    g = col.groupby(F.col("t") % 2).toPandas()
    assert len(g) == 2 * 9


def test_streaming_tile_counts(spark, tmp_path):
    """rate source → tile windowed counts → memory sink, availableNow."""
    from pyramids_spark.streaming import stream_tile_counts

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "500").load()
        .withColumn("x", (F.col("value") % 360) - 180.0)
        .withColumn("y", (F.col("value") % 170) - 85.0)
        .withColumnRenamed("timestamp", "ts")
    )
    out = stream_tile_counts(stream, zoom=4, window="5 seconds")
    q = (
        out.writeStream.format("memory").queryName("tiles")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    # append mode only emits closed windows; the important assertions are
    # that the stream ran and the schema is right
    res = spark.sql("SELECT * FROM tiles")
    assert res.columns == ["window_start", "window_end", "tile_id", "n"]


def test_streaming_dedup(spark, tmp_path):
    from pyramids_spark.streaming import streaming_dedup

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "1000").load()
        .withColumn("doc_id", F.col("value") % 50)  # heavy duplication
        .withColumnRenamed("timestamp", "ts")
    )
    out = streaming_dedup(stream, key="doc_id")
    q = (
        out.writeStream.format("memory").queryName("dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    res = spark.sql("SELECT count(*) AS n, count(DISTINCT doc_id) AS d FROM dedup").first()
    assert res.n == res.d  # no duplicates emitted


def test_mesh_centroids_and_nearest(spark):
    nodes = spark.createDataFrame(
        [(0, 0.0, 0.0, 10.0), (1, 2.0, 0.0, 20.0), (2, 2.0, 2.0, 30.0),
         (3, 0.0, 2.0, 40.0), (4, 4.0, 1.0, 50.0)],
        "node_id long, x double, y double, data double",
    )
    faces = spark.createDataFrame(
        [(0, [0, 1, 2, 3]), (1, [1, 4, 2, -1])],
        "face_id long, node_ids array<int>",
    )
    c = mesh.face_centroids(nodes, faces).toPandas().set_index("face_id")
    assert c.loc[0].centroid_x == 1.0 and c.loc[0].centroid_y == 1.0
    assert c.loc[1].n_nodes == 3  # fill −1 dropped
    nn = mesh.locate_nearest_node(nodes, [(0, 1.9, 0.1)], k=2).toPandas()
    # nodes 0 and 2 tie at dist²=3.62 → deterministic tie-break on key
    assert list(nn.sort_values("rank")["key"]) == [1, 0]
    sub = mesh.subset_by_bounds(nodes, (0.0, 0.0, 2.0, 2.0)).count()
    assert sub == 4


def test_mesh_to_grid_nearest_with_cutoff(spark):
    nodes = spark.createDataFrame(
        [(0, 0.5, 9.5, 1.0), (1, 3.5, 6.5, 2.0)],
        "node_id long, x double, y double, data double",
    )
    g = Grid(x0=0.0, y0=10.0, cell=1.0, rows=4, cols=4)
    out = mesh.mesh_to_grid_nearest(nodes, g, value="data").toPandas()
    assert len(out) == 16
    m = out.set_index(["row", "col"]).value
    assert m.loc[(0, 0)] == 1.0  # on-node cell
    assert m.loc[(3, 3)] == 2.0  # within 2-cell cutoff of node 1
    assert np.isnan(m.loc[(3, 0)])  # beyond max_distance → NULL


def test_mesh_to_grid_linear_reproduces_linear_field(spark):
    """Barycentric interpolation of a linear field v = 2x + 3y + 1 is EXACT
    inside faces and NULL outside every face (NaN-outside-hull contract)."""
    pts = [(0, 0.2, 9.8), (1, 3.7, 9.6), (2, 0.4, 6.3), (3, 3.9, 6.1)]
    nodes = spark.createDataFrame(
        [(i, x, y, 2.0 * x + 3.0 * y + 1.0) for i, x, y in pts],
        "node_id long, x double, y double, data double",
    )
    faces = spark.createDataFrame(
        [(0, [0, 1, 2]), (1, [1, 3, 2])], "face_id long, node_ids array<int>"
    )
    g = Grid(x0=0.0, y0=10.0, cell=1.0, rows=4, cols=4)
    out = mesh.mesh_to_grid_linear(nodes, faces, g, value="data").toPandas()
    assert len(out) == 16
    xs = np.array(pts)[:, 1], np.array(pts)[:, 2]
    from pyramids_spark import cells as pscells

    n_in = 0
    for _, r in out.iterrows():
        qx = g.x0 + (r.col + 0.5) * g.cell
        qy = g.y0 - (r.row + 0.5) * g.cell
        hull = np.array([[0.2, 9.8], [3.7, 9.6], [3.9, 6.1], [0.4, 6.3]])
        inside = bool(pscells.points_in_polygon(np.array([qx]), np.array([qy]), hull)[0])
        if inside:
            assert r.value == pytest.approx(2.0 * qx + 3.0 * qy + 1.0, rel=1e-12)
            n_in += 1
        else:
            assert pd.isna(r.value)
    assert n_in >= 6  # the quad covers the grid middle


def test_clip_mesh_renumbers_compactly(spark):
    """clip_mesh (reference ugrid/spatial.py:227-266): touch duality, dense
    sorted renumbering of surviving nodes AND faces, fill -1 preserved."""
    nodes = spark.createDataFrame(
        [(i * 10, float(i), float(i), float(i * 100)) for i in range(6)],
        "node_id long, x double, y double, data double",
    )
    faces = spark.createDataFrame(
        [(7, [0, 10, 20, -1]), (8, [20, 30, 40, 50]), (9, [40, 50, 0, -1])],
        "face_id long, node_ids array<int>",
    )
    box = (0.5, 0.5, 3.5, 3.5)  # contains nodes 1,2,3 (ids 10,20,30)
    # touch=True: any node in box → faces 7 (10,20), 8 (20,30), 9 (none? 40,50,0 → no)
    nn, nf = mesh.clip_mesh(nodes, faces, box, touch=True)
    nfp = nf.toPandas().set_index("face_id").sort_index()
    assert list(nfp.index) == [7, 8]
    assert list(nfp.new_face_id) == [0, 1]
    # surviving nodes: union of kept faces' nodes = {0,10,20,30,40,50} minus fill
    nnp = nn.toPandas().sort_values("node_id")
    assert list(nnp.node_id) == [0, 10, 20, 30, 40, 50]
    assert list(nnp.new_node_id) == [0, 1, 2, 3, 4, 5]  # dense sorted
    assert nnp.set_index("node_id").loc[20, "data"] == 200.0
    assert list(nfp.loc[7, "node_ids"]) == [0, 1, 2, -1]  # fill preserved, renumbered
    assert list(nfp.loc[8, "node_ids"]) == [2, 3, 4, 5]
    # touch=False: ALL nodes inside → no face qualifies (7 has node 0 outside)
    _nn2, nf2 = mesh.clip_mesh(nodes, faces, box, touch=False)
    assert nf2.count() == 0
    # a box containing every node of face 8
    _nn3, nf3 = mesh.clip_mesh(nodes, faces, (1.5, 1.5, 5.5, 5.5), touch=False)
    assert [r["face_id"] for r in nf3.collect()] == [8]


def test_mesh_to_grid_plans_have_no_cartesian(spark):
    """Both mesh→grid interpolation plans must be cell-indexed EQUI-joins:
    no CartesianProduct, no BroadcastNestedLoopJoin (VERDICT r2 #2-3 —
    those shapes are O(cells·mesh) and die at 100× either side)."""
    nodes = spark.createDataFrame(
        [(i, float(i % 5), float(i // 5), float(i)) for i in range(25)],
        "node_id long, x double, y double, data double",
    )
    faces = spark.createDataFrame(
        [(i, [i, i + 1, i + 2]) for i in range(23)],
        "face_id long, node_ids array<int>",
    )
    g = Grid(x0=0.0, y0=5.0, cell=1.0, rows=5, cols=5)
    for df in (
        mesh.mesh_to_grid_nearest(nodes, g, value="data"),
        mesh.mesh_to_grid_linear(nodes, faces, g, value="data"),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert df.count() == 25  # every cell present (sentinel path)


def test_netcdf_variable_dict_surface(spark):
    """variables dict / get_variable / add_variable / remove_variable / sel
    (reference netcdf.py:331-360, :736-846)."""
    from pyramids_spark.api import SparkDatasetCollection, SparkNetCDF

    rows = [
        (v, t, 0, r, c, float(t * 10 + r + c))
        for v in ("temp", "precip")
        for t in range(3)
        for r in range(2)
        for c in range(2)
    ]
    nc = SparkNetCDF(spark.createDataFrame(
        rows, "variable string, t long, band int, row long, col long, value double"
    ))
    assert nc.variable_names == ["precip", "temp"]
    assert set(nc.variables) == {"precip", "temp"}
    temp = nc.get_variable("temp")
    assert temp.df.count() == 12
    red = temp.reduce("mean").toPandas()
    assert len(red) == 4 and red.value.min() == 10.0  # mean over t of t*10+0
    nc2 = nc.remove_variable("precip")
    assert nc2.variable_names == ["temp"]
    nc3 = nc2.add_variable("wind", SparkDatasetCollection(
        nc2.df.drop("variable").withColumn("value", F.col("value") * 2)
    ))
    assert nc3.variable_names == ["temp", "wind"]
    sl = nc3.sel(t=(1, 2), variable="wind")
    assert sl.df.count() == 8


def test_streaming_sessionize_stateful(spark, tmp_path):
    """applyInPandasWithState sessionization: events stream in two
    micro-batches; advancing the watermark closes earlier sessions with
    exact 30-min-gap semantics (the batch `sessionize` contract)."""
    import json
    import os

    from pyramids_spark.streaming.sessionize import stream_sessionize

    src = tmp_path / "events"
    src.mkdir()
    ck = str(tmp_path / "ck")

    def write_batch(name, rows):
        p = src / f"{name}.json"
        tmp = str(p) + ".tmp"
        with open(tmp, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.rename(tmp, p)

    # batch 1: user 1 has two events 10 min apart (one session), user 2 one
    t0 = "2026-01-01T00:00:00Z"
    write_batch("b1", [
        {"ts": "2026-01-01T00:00:00Z", "user_id": 1},
        {"ts": "2026-01-01T00:10:00Z", "user_id": 1},
        {"ts": "2026-01-01T00:05:00Z", "user_id": 2},
    ])
    stream = (
        spark.readStream.schema("ts timestamp, user_id long")
        .json(str(src))
    )
    out = stream_sessionize(stream, gap_minutes=30)
    q = (
        out.writeStream.format("memory").queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", ck)
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: much later events advance the watermark far past
        # (session_end + gap) for every batch-1 session
        write_batch("b2", [
            {"ts": "2026-01-01T06:00:00Z", "user_id": 1},
            {"ts": "2026-01-01T06:00:00Z", "user_id": 2},
        ])
        q.processAllAvailable()
        # one more empty-ish advance so timeout-fired rows flush
        write_batch("b3", [{"ts": "2026-01-01T12:00:00Z", "user_id": 3}])
        q.processAllAvailable()
    finally:
        q.stop()
    res = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"])): r["n_events"]
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    assert res[(1, "2026-01-01 00:00:00", "2026-01-01 00:10:00")] == 2
    assert res[(2, "2026-01-01 00:05:00", "2026-01-01 00:05:00")] == 1


def test_streaming_sessionize_out_of_order_across_batches(spark, tmp_path):
    """A late event (legal under the gap-sized watermark) that lands BEFORE
    the stored session start must pull session_start back to min(t, start),
    not be silently folded in with the old start (ADVICE r2, medium)."""
    import json
    import os

    from pyramids_spark.streaming.sessionize import stream_sessionize

    src = tmp_path / "events"
    src.mkdir()

    def write_batch(name, rows):
        p = src / f"{name}.json"
        tmp = str(p) + ".tmp"
        with open(tmp, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.rename(tmp, p)

    # batch 1: user 9 at 01:00 → watermark after b1 = 00:30
    write_batch("b1", [{"ts": "2026-01-01T01:00:00Z", "user_id": 9}])
    stream = spark.readStream.schema("ts timestamp, user_id long").json(str(src))
    out = stream_sessionize(stream, gap_minutes=30)
    q = (
        out.writeStream.format("memory").queryName("sessions_ooo")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: late event at 00:40 — after the 00:30 watermark, before the
        # stored session start (01:00), within gap → must merge with start=00:40
        write_batch("b2", [{"ts": "2026-01-01T00:40:00Z", "user_id": 9}])
        q.processAllAvailable()
        # advance watermark far past end+gap so the session closes
        write_batch("b3", [{"ts": "2026-01-01T12:00:00Z", "user_id": 10}])
        q.processAllAvailable()
    finally:
        q.stop()
    res = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"])): r["n_events"]
        for r in spark.sql("SELECT * FROM sessions_ooo").collect()
    }
    assert res[(9, "2026-01-01 00:40:00", "2026-01-01 01:00:00")] == 2


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two collections bucketed by the same cell spec must join with NO
    Exchange on either side (the Iceberg bucket-transform co-location
    story; one shuffle of a 10^12-row table dominates any join it feeds)."""
    from pyramids_spark import synth

    fc_a = SparkFeatureCollection(
        synth.doc_points(spark, 4000).select("doc_id", "key", "x", "y")
    )
    fc_b = SparkFeatureCollection(
        synth.doc_points(spark, 2000).select("doc_id", "key", "x", "y")
    )
    fc_a.write_bucketed("bj_a", str(tmp_path / "a"), n_buckets=8, zoom=10)
    fc_b.write_bucketed("bj_b", str(tmp_path / "b"), n_buckets=8, zoom=10)
    try:
        j = SparkFeatureCollection.bucketed_join(spark, "bj_a", "bj_b")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
        assert j.count() > 0
        # correctness: equals the plain (shuffling) join
        plain = (
            spark.read.parquet(str(tmp_path / "a"))
            .join(
                spark.read.parquet(str(tmp_path / "b")).withColumnRenamed(
                    "doc_id", "doc_id_b"
                ),
                "cell_id",
            )
        )
        assert j.count() == plain.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS bj_a")
        spark.sql("DROP TABLE IF EXISTS bj_b")


def test_streaming_sessionize_late_event_bridges_sessions(spark, tmp_path):
    """Two in-state sessions separated by > gap must NOT be emitted until
    the watermark confirms closure: a legal late event landing between
    them bridges all three into ONE session (code-review r3 — early
    emission in append mode would have split it irrecoverably)."""
    import json
    import os

    from pyramids_spark.streaming.sessionize import stream_sessionize

    src = tmp_path / "events"
    src.mkdir()

    def write_batch(name, rows):
        p = src / f"{name}.json"
        tmp = str(p) + ".tmp"
        with open(tmp, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.rename(tmp, p)

    # batch 1: events at 00:00 and 00:45 (45 min apart > 30-min gap → two
    # provisional sessions); watermark after b1 = 00:15
    write_batch("b1", [
        {"ts": "2026-01-01T00:00:00Z", "user_id": 9},
        {"ts": "2026-01-01T00:45:00Z", "user_id": 9},
    ])
    stream = spark.readStream.schema("ts timestamp, user_id long").json(str(src))
    out = stream_sessionize(stream, gap_minutes=30)
    q = (
        out.writeStream.format("memory").queryName("sessions_bridge")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        # nothing may be emitted yet: watermark (00:15) has not passed
        # 00:00 + gap (00:30)
        assert spark.sql("SELECT count(*) n FROM sessions_bridge").first()["n"] == 0
        # batch 2: late event at 00:20 (> watermark) bridges both sessions
        write_batch("b2", [{"ts": "2026-01-01T00:20:00Z", "user_id": 9}])
        q.processAllAvailable()
        # close everything
        write_batch("b3", [{"ts": "2026-01-01T12:00:00Z", "user_id": 10}])
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql(
        "SELECT * FROM sessions_bridge WHERE user_id = 9"
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert str(r["session_start"]) == "2026-01-01 00:00:00"
    assert str(r["session_end"]) == "2026-01-01 00:45:00"
    assert r["n_events"] == 3


def test_streaming_zone_counts_match_batch(spark, tmp_path):
    """The flagship PIP join applied to a stream (stream-static broadcast
    join + windowed count) must emit exactly the counts of the batch twin
    (pip_join + window groupBy over the same rows)."""
    import json

    from pyramids_spark import synth
    from pyramids_spark.operators import pip
    from pyramids_spark.streaming import stream_zone_counts

    zones = synth.zone_polygons(6, "box")
    src = tmp_path / "zev"
    src.mkdir()
    rows = []
    for i in range(300):
        h1 = (i * 2654435761 + 1013904223) % (2**32)
        h2 = (i * 2246822519 + 3266489917) % (2**32)
        rows.append({
            "ts": f"2026-03-01T00:00:{i % 50:02d}Z",
            "x": -180.0 + 360.0 * h1 / 2**32,
            "y": -85.0 + 170.0 * h2 / 2**32,
        })
    rows.append({"ts": "2026-03-01T06:00:00Z", "x": 0.0, "y": 0.0})  # sentinel
    with open(src / "b1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    stream = spark.readStream.schema("ts timestamp, x double, y double").json(str(src))
    out = stream_zone_counts(stream, zones, zoom=6, window="10 seconds",
                             watermark="5 seconds")
    q = (
        out.writeStream.format("memory").queryName("zc")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(120), "streaming zone-count query timed out"
    finally:
        q.stop()
    got = {
        (str(r["window_start"]), r["zone_id"]): r["n"]
        for r in spark.sql("SELECT * FROM zc").collect()
    }
    batch = spark.read.schema("ts timestamp, x double, y double").json(str(src))
    want_df = (
        pip.pip_join(batch, zones, zoom=6)
        .groupBy(F.window("ts", "10 seconds").alias("w"), "zone_id")
        .count()
        .where(F.col("w.start") < "2026-03-01 01:00:00")  # closed windows only
    )
    want = {(str(r["w"]["start"]), r["zone_id"]): r["count"] for r in want_df.collect()}
    assert got == want and len(want) > 0


def test_streaming_tile_counts_match_batch(spark, tmp_path):
    """Closed streaming windows must carry EXACTLY the counts the batch
    twin (window groupBy over the same rows) produces — not just a schema
    check."""
    import json
    import os

    from pyramids_spark.streaming import stream_tile_counts

    src = tmp_path / "ev"
    src.mkdir()
    rows = []
    for i in range(200):
        rows.append({
            "ts": f"2026-02-01T00:00:{i % 50:02d}Z",
            "x": float((i * 37) % 360 - 180) + 0.5,
            "y": float((i * 53) % 170 - 85) + 0.5,
        })
    # sentinel far in the future: advances the watermark past every window
    rows.append({"ts": "2026-02-01T06:00:00Z", "x": 0.5, "y": 0.5})
    with open(src / "b1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    stream = spark.readStream.schema("ts timestamp, x double, y double").json(str(src))
    out = stream_tile_counts(stream, zoom=4, window="10 seconds", watermark="5 seconds")
    q = (
        out.writeStream.format("memory").queryName("tc")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["tile_id"]): r["n"]
        for r in spark.sql("SELECT * FROM tc").collect()
    }
    batch = spark.read.schema("ts timestamp, x double, y double").json(str(src))
    from pyramids_spark import cells
    cx, cy = cells.geo_cell_col(F.col("x"), F.col("y"), 4)
    want_df = (
        batch.withColumn("tile_id", cells.cell_id_col(cx, cy, 4))
        .groupBy(F.window("ts", "10 seconds").alias("w"), "tile_id")
        .count()
        .where(F.col("w.start") < "2026-02-01 01:00:00")  # closed windows only
    )
    want = {
        (str(r["w"]["start"]), r["tile_id"]): r["count"] for r in want_df.collect()
    }
    assert got == want and len(want) > 10


def test_streaming_pip_join_df_matches_batch(spark, tmp_path):
    """pip_join_df works unchanged as a stream-static join: the zone side
    (mapInPandas cover + ring table) is static, the point stream flows
    through cell-encode → cover join → convex/ray-cast refine; rows equal
    the batch run over the same files."""
    import json

    from pyramids_spark.operators import pip

    zdf = spark.createDataFrame(
        [
            (0, [-60.0, -20.0, -20.0, -60.0], [-40.0, -40.0, 10.0, 10.0]),
            (1, [0.0, 80.0, 80.0, 40.0, 0.0], [0.0, 0.0, 60.0, 80.0, 60.0]),
            # concave L: exercises the ray-cast branch under streaming
            (2, [-180.0, -100.0, -100.0, -140.0, -140.0, -180.0],
             [-85.0, -85.0, -45.0, -45.0, -65.0, -65.0]),
        ],
        "zone_id long, xs array<double>, ys array<double>",
    )
    src = tmp_path / "spdf"
    src.mkdir()
    with open(src / "b1.json", "w") as f:
        for i in range(400):
            h1 = (i * 2654435761 + 1013904223) % (2**32)
            h2 = (i * 2246822519 + 3266489917) % (2**32)
            f.write(json.dumps({
                "pid": i,
                "x": -180.0 + 360.0 * h1 / 2**32,
                "y": -85.0 + 170.0 * h2 / 2**32,
            }) + "\n")
    schema = "pid long, x double, y double"
    stream = spark.readStream.schema(schema).json(str(src))
    out = pip.pip_join_df(stream, zdf, zoom=6)
    q = (
        out.writeStream.format("memory").queryName("spdf")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(120), "streaming pip_join_df timed out"
    finally:
        q.stop()
    got = {(r["pid"], r["zone_id"]) for r in spark.sql("SELECT * FROM spdf").collect()}
    batch = spark.read.schema(schema).json(str(src))
    want = {(r["pid"], r["zone_id"]) for r in pip.pip_join_df(batch, zdf, zoom=6).collect()}
    assert got == want and len(want) > 0
    assert any(z == 2 for _, z in want)  # concave zone exercised


def test_geojson_null_geometry_and_seq_file(spark, tmp_path):
    """code-review r5 pass 2: RFC 7946 allows "geometry": null — a NULL
    geometry row must not crash to_geojson mid-stream (write(None)) nor
    silently vanish from to_geojson_seq; and read_geojson must read a
    single-FILE GeoJSONSeq (.geojsonl) completely instead of truncating
    it to its first feature under multiLine=true."""
    import json
    import os

    from pyramids_spark.functions import wkt as W

    df = spark.createDataFrame(
        [(1, '{"type": "Point", "coordinates": [3.0, 4.0]}'), (2, None)],
        "fid long, geometry string",
    )
    fc = SparkFeatureCollection(df, 4326)

    # single-document sink: null geometry serializes as null
    doc = str(tmp_path / "fc.geojson")
    assert fc.to_geojson(doc) == 2
    parsed = json.load(open(doc))
    geoms = {f["properties"]["fid"]: f["geometry"]
             for f in parsed["features"]}
    assert geoms[2] is None and geoms[1]["coordinates"] == [3.0, 4.0]
    back = SparkFeatureCollection.read_geojson(spark, doc)
    assert back.df.count() == 2

    # distributed seq sink: the null-geometry line is present, not dropped
    seq_dir = str(tmp_path / "fc_seq")
    fc.to_geojson_seq(seq_dir)
    lines = []
    for name in os.listdir(seq_dir):
        if name.startswith("part-"):
            lines += [ln for ln in open(os.path.join(seq_dir, name))
                      if ln.strip()]
    assert len(lines) == 2
    assert any(json.loads(ln)["geometry"] is None for ln in lines)

    # single-file .geojsonl: all features read, none truncated away
    jl = str(tmp_path / "pts.geojsonl")
    with open(jl, "w") as fh:
        for i in range(5):
            fh.write(json.dumps({
                "type": "Feature", "properties": {"fid": i},
                "geometry": {"type": "Point",
                             "coordinates": [float(i), float(-i)]},
            }) + "\n")
    got = SparkFeatureCollection.read_geojson(spark, jl)
    rows = got.df.select(
        "fid", W.geojson_point_x(F.col("geometry")).alias("x")
    ).orderBy("fid").collect()
    assert [r.fid for r in rows] == [0, 1, 2, 3, 4]
    assert [r.x for r in rows] == [0.0, 1.0, 2.0, 3.0, 4.0]
