"""Round-7 profiling harness. bench.py is FROZEN for measurement; this file
holds the per-query isolation runs (guide §1.4 noop-sink discipline), the
best-of-N timings and the .explain("formatted") dumps cited in
OPTIMIZATION_r07.md. Usage:

    python bench_extra.py [--runs=N] [--tag=before|after] [--explain] q1 q2 ...

Queries not named are skipped; inputs are built lazily per query family.
Env contract identical to bench.py (SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
BENCH_DOCS/BENCH_TEXT_DOCS/BENCH_VECS)."""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyramids_spark import cells, synth  # noqa: E402
from pyramids_spark.ann import search as ann  # noqa: E402
from pyramids_spark.operators import focal, knn, pip as pip_op, raster, vectorize, zonal  # noqa: E402
from pyramids_spark.session import get_spark  # noqa: E402
from pyramids_spark.grid import Grid, grid_df  # noqa: E402
from pyramids_spark.text import dedup  # noqa: E402

N_DOCS = int(os.environ.get("BENCH_DOCS", "8000000"))
N_TEXT = int(os.environ.get("BENCH_TEXT_DOCS", "200000"))
N_VECS = int(os.environ.get("BENCH_VECS", "100000"))

PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r07")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {a.split("=")[0]: (a.split("=", 1)[1] if "=" in a else True)
            for a in sys.argv[1:] if a.startswith("--")}
    runs = int(opts.get("--runs", 2))
    tag = opts.get("--tag", "probe")
    do_explain = "--explain" in opts

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=cpus * 2)
    spark.sparkContext.setLogLevel("ERROR")

    g = Grid(x0=0.0, y0=0.0, cell=1.0, rows=2048, cols=2048)
    state: dict = {}

    def pts():
        if "pts" not in state:
            p = synth.doc_points(spark, N_DOCS).persist()
            p.count()
            state["pts"] = p
        return state["pts"]

    def gdf():
        if "gdf" not in state:
            d = grid_df(spark, g).persist()
            d.count()
            state["gdf"] = d
        return state["gdf"]

    def ccdf():
        if "ccdf" not in state:
            d = grid_df(spark, g, "CAST(pmod(hash(row*2048+col), 100) AS DOUBLE)").persist()
            d.count()
            state["ccdf"] = d
        return state["ccdf"]

    def rdf():
        if "rdf" not in state:
            d = grid_df(
                spark, g,
                "CAST(pmod(hash(CAST(row / 8 AS LONG) * 2048 + CAST(col / 8 AS LONG)), 7) AS DOUBLE)",
            ).persist()
            d.count()
            state["rdf"] = d
        return state["rdf"]

    def texts():
        if "texts" not in state:
            t = (
                synth.documents_spans(spark, N_TEXT)
                .select(
                    F.col("doc_id").alias("id_str"),
                    F.concat_ws(
                        " ", F.flatten(F.array(F.filter(F.col("spans"), lambda s: s["kind"] == "text")["text"]))
                    ).alias("text"),
                )
                .withColumn("doc_id", F.expr("cast(substring(id_str, 5) as long)"))
                .persist()
            )
            t.count()
            state["texts"] = t
        return state["texts"]

    def zdf():
        if "zdf" not in state:
            state["zdf"] = synth.zone_hexagons_df(spark, 12000)
        return state["zdf"]

    def vecs():
        if "vecs" not in state:
            dim = 32
            v = (
                spark.range(N_VECS)
                .select(
                    F.col("id").alias("vec_id"),
                    F.array(
                        *[
                            ((cells.h1_col(F.col("id") * 131 + i) / F.lit(2.0**32)) * 2 - 1)
                            for i in range(dim)
                        ]
                    ).alias("embedding"),
                )
                .persist()
            )
            v.count()
            state["vecs"] = v
        return state["vecs"]

    def qs():
        return vecs().where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )

    def _q25():
        import numpy as np

        out = []
        for i in range(25):
            k = np.array([i * 7_000_003 + 11], dtype=np.int64)
            out.append(
                (i, float(cells.lon_np(cells.h1_np(k))[0]),
                 float(cells.lat_np(cells.h2_np(k))[0]))
            )
        return out

    # DataFrame builders (explainable) or plain thunks (sinks)
    builders = {
        "knn_25q": lambda: knn.knn_join(pts(), _q25(), k=10),
        "knn_25q_cellpruned": None,  # multi-action: thunk below
        "pip_faces_12k": lambda: pip_op.pip_join_df(pts(), zdf(), zoom=10),
        "focal_tiles_r2": lambda: focal.focal_tiles(gdf(), g, r=2, tile=128),
        "focal_tiles_r2_t256": lambda: focal.focal_tiles(gdf(), g, r=2, tile=256),
        "cluster_cc_4m": lambda: vectorize.cluster(
            ccdf(), g, lo=0.0, hi=54.0, tile=128, single_pass=True),
        "polygonize_rings_4m": lambda: vectorize.polygonize_rings(rdf(), g, tile=256),
        "polygonize_only_4m": lambda: vectorize.polygonize(rdf(), g, tile=256),
        "minhash_sigs": lambda: dedup.minhash_signatures(dedup.shingles(texts()), 8),
        "exact_dedup": lambda: dedup.exact_dedup(texts()),
        "ann_lsh": lambda: ann.cosine_topk_lsh(vecs(), qs(), ann.hyperplanes(32, 8), k=10),
        "ann_bruteforce": lambda: ann.cosine_topk(vecs(), qs(), k=10),
        "zonal_stats_boxes": lambda: zonal.zonal_stats_points(
            pts(), synth.zone_polygons(25, "box"), value="key", zoom=8),
        "rasterize_rollup": lambda: raster.overview_rollup(
            _rasterized(spark, pts()), level=4, stat="avg"),
    }

    def thunk_knn_cellpruned():
        knn.knn_join_cellpruned(pts(), _q25(), k=10, zoom=6).count()

    def thunk_ann_ivf():
        idx, cents = ann.ivf_index(vecs(), n_centroids=32, iters=1)
        ann.cosine_topk_ivf(idx, cents, qs(), k=10, nprobe=6).collect()

    thunks = {
        "knn_25q_cellpruned": thunk_knn_cellpruned,
        "ann_ivf": thunk_ann_ivf,
    }

    import shutil as _sh
    from pyramids_spark import tiff as _tiff, hdf5 as _h5, zarr as _zarr

    def thunk_cog():
        _sh.rmtree("/tmp/pyramids_bench_mosaic_x", ignore_errors=True)
        _tiff.write_cog_parts(gdf(), g, 1, "/tmp/pyramids_bench_mosaic_x",
                              shard=(512, 512), tile=(256, 256), compress=1)

    def thunk_nc4():
        _h5.write_netcdf4(
            gdf().select(F.lit("v").alias("variable"),
                         F.lit(0).cast("long").alias("t"), "row", "col", "value"),
            g, "/tmp/pyramids_bench_nc4_x.nc", times=None,
            compress=1, shuffle=True, chunk=(256, 256), parallel=True)

    def thunk_nc4p():
        _h5.write_netcdf4(
            gdf().select(F.lit("v").alias("variable"),
                         F.lit(0).cast("long").alias("t"), "row", "col", "value"),
            g, "/tmp/pyramids_bench_nc4p_x.nc", times=None,
            compress=None, shuffle=True, chunk=(256, 256),
            index="fixed_array", parallel=True)

    def thunk_zarr3():
        _sh.rmtree("/tmp/pyramids_bench_zarr3_x", ignore_errors=True)
        _zarr.write_zarr(gdf(), g, "/tmp/pyramids_bench_zarr3_x",
                         chunks=(256, 256), compress=3, zarr_format=3,
                         shards=(512, 512), codec="blosc:zstd")

    thunks.update({
        "cog_mosaic_sink_4m": thunk_cog,
        "netcdf4_sink_4m": thunk_nc4,
        "netcdf4_parallel_sink_4m": thunk_nc4p,
        "zarr_v3_sharded_sink_4m": thunk_zarr3,
    })

    names = args or list(builders) + [k for k in thunks if k not in builders]
    results: dict[str, list[float]] = {}
    for name in names:
        b = builders.get(name)
        if b is not None:
            if do_explain:
                os.makedirs(PLANS_DIR, exist_ok=True)
                with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as f:
                    f.write(b()._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
            fn = lambda: noop(b())  # noqa: E731
        elif name in thunks:
            fn = thunks[name]
        else:
            print(f"unknown query {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"{name} warmup")
        fn()  # untimed warmup
        ts = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t0 = time.time()
            fn()
            ts.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        results[name] = ts
        print(json.dumps({"query": name, "runs": ts, "best": min(ts)}), flush=True)

    print(json.dumps({"tag": tag, "best": {k: min(v) for k, v in results.items()}}))
    spark.stop()


def _rasterized(spark, pts):
    cx, cy = cells.geo_cell_col(F.col("x"), F.col("y"), 10)
    return (
        pts.select(cells.cell_id_col(cx, cy, 10).alias("cid"), cx.alias("col"), cy.alias("row"))
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).cast("double").alias("value"))
        .withColumn("band", F.lit(0))
    )


if __name__ == "__main__":
    main()
