"""Benchmark harness: headline queries on sf=$SPARK_GRAFT_SF_DIR at
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Two input families:
- driver sf tables (lineitem/events/documents parquet) for the
  SQL-expressible operators — exercises scan pushdown on real files;
- deterministic synthetic inputs at bench scale (2M docs with interleaved
  spans, 4M-cell raster) for the engine's flagship spatial ops — the driver
  tables cap at 500 documents, far too small to measure a join engine.

The flagship job (spans → cell-encode → broadcast PIP join → rasterize →
zonal agg, span invariant verified) reports docs/sec — the BASELINE.json
metric. Scaling evidence (local[8] vs local[32]) is produced by
tools/scaling_bench.py → BENCH/BASELINE.md.
"""

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


# v5: partitioned by coarse cell (pcell, zoom PART_ZOOM) — the parquet
# stand-in for an Iceberg `truncate/bucket(cell_id)` partition transform;
# bump version on any schema/hash/layout change (v4: doc_id widened to 13
# digits; v5: repartition("pcell") + maxRecordsPerFile so each pcell holds
# a few ~10 MB files instead of 64 sub-MB shards — the v4 layout produced
# 4096 tiny files whose listing alone cost ~1 s of driver time per query
# and whose per-file open overhead dominated the scan at 16 cores)
DOCS_PATH = os.environ.get("BENCH_DOCS_PATH", "/tmp/pyramids_bench_docs_v5")
PART_ZOOM = 3  # 64 partitions world-wide


def ensure_docs(spark, n_docs: int) -> str:
    """Materialize the interleaved-documents table once (untimed setup):
    the production job reads an Iceberg/parquet table — synthesis is the
    stand-in for ingest, not part of the measured spatial-join job. The
    span_hash column is written at source; the job re-verifies it at sink
    (the BASELINE.json invariant). The table is PARTITIONED by the coarse
    cell of the doc geometry so spatial predicates prune files — zone-cover
    pruning then skips ~4/5 of the scan before it starts."""
    path = f"{DOCS_PATH}_{n_docs}"
    import glob

    if not glob.glob(f"{path}/_SUCCESS"):
        d = synth.documents_full(spark, n_docs, partitions=64)
        pcx, pcy = cells.geo_cell_col(F.col("x"), F.col("y"), PART_ZOOM)
        d = d.withColumn("pcell", cells.cell_id_col(pcx, pcy, PART_ZOOM))
        # one shuffle at ingest → each pcell is a few ~10 MB files (not 64
        # sub-MB shards per pcell): listing stays O(100) files and scan
        # splits stay balanced at any core count. maxRecordsPerFile bounds
        # the file size so splits (1 row group each) spread across cores.
        (
            d.repartition(64, F.col("pcell"))
            .write.mode("overwrite")
            .option("maxRecordsPerFile", 125_000)
            .partitionBy("pcell")
            .parquet(path)
        )
    return path


def zone_prune_cells(zones: list[dict]) -> list[int]:
    """Partition-prune predicate: every PART_ZOOM cell intersecting any zone
    (a point inside a zone always lies in an intersecting cell — superset
    guarantee, exactness restored by the PIP refinement)."""
    out: set[int] = set()
    for z in zones:
        for part in z["parts"]:
            out.update(
                int(c) for c in cells.cells_covering_polygon(part, PART_ZOOM, "intersects")
            )
    return sorted(out)


def flagship(spark, n_docs: int) -> dict:
    """The north-rule job: scan interleaved docs → cell encode → cell-pruned
    broadcast PIP join → tile assignment → zonal agg, span invariant
    re-verified at sink. Returns row/doc counts (forces execution).

    The job runs as TWO CONCURRENT Spark actions over the same columnar
    source:

    1. **Integrity audit** — decode `spans`, recompute the span-sequence
       hash, min() the match bit over every scanned row (strictly stronger
       than auditing joined rows only). Reading a nested array<struct>
       forces Spark's row-based parquet path (allocation/ALU-heavy).
    2. **Spatial join** — a flat vectorized (x, y) scan → cell encode →
       broadcast PIP join → tile assignment → per-zone rollup. Pure
       whole-stage codegen over columnar batches (DRAM-stream-heavy).

    Fusing them into one pass (the v1 plan) dragged the join through the
    row-based reader: measured at 32M docs, the fused scan cost 24.5 s at
    4 cores vs 15.4 s un-fused, and the un-fused pair overlapped in two
    scheduler threads reached 6.9 s at 16 cores vs 13.0 s fused — the
    ALU-heavy audit soaks up the cycles the stream-bound join leaves
    stalled. Parquet column pruning means no byte is read twice. At 10^12
    docs this is also the right shape: the audit is an independent
    map-reduce with no shuffle, and the join never touches the wide payload
    column (project early, never shuffle wide payloads)."""
    zones = _hexes()
    path = ensure_docs(spark, n_docs)
    pruned = zone_prune_cells(zones)

    def _audit():
        d = spark.read.parquet(path).where(F.col("pcell").isin(pruned))
        return d.select(
            F.min((synth.span_hash_col() == F.col("span_hash")).cast("int")).alias("all_ok")
        ).collect()[0]["all_ok"]

    # future (not a bare Thread): an audit failure re-raises at .result()
    # instead of being swallowed and surfacing as a KeyError (ADVICE r2)
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=1)
    audit = pool.submit(_audit)

    docs = (
        spark.read.parquet(path)
        .where(F.col("pcell").isin(pruned))  # partition pruning
        .select("x", "y")
    )
    hits = pip_op.pip_join(docs, zones, zoom=11)
    cx, cy = cells.geo_cell_col(F.col("x"), F.col("y"), 12)
    hits = hits.withColumn("tile_id", cells.cell_id_col(cx, cy, 12))
    # two-stage distinct: groupBy(zone, tile) partial-aggregates map-side,
    # then zone-level rollup counts tiles — unlike countDistinct's EXPAND
    # plan this never duplicates the input stream (measured: the EXPAND
    # variant added a ~6s non-scaling stage)
    per_tile = hits.groupBy("zone_id", "tile_id").agg(F.count(F.lit(1)).alias("n"))
    agg = per_tile.groupBy("zone_id").agg(
        F.sum("n").alias("n_docs"),
        F.count(F.lit(1)).alias("n_tiles"),
    )
    rows = agg.collect()
    all_ok = audit.result(timeout=600)
    pool.shutdown()
    assert all_ok == 1, "span invariant violated"
    return {"zones": len(rows), "joined_docs": sum(r["n_docs"] for r in rows)}


def _hexes():
    return synth.zone_polygons(10, "hex")


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus * 2)
    spark.sparkContext.setLogLevel("ERROR")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    def bench(name, fn):
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)

    # --- flagship: docs/sec ------------------------------------------------
    ensure_docs(spark, N_DOCS)  # untimed setup (ingest stand-in)
    flagship(spark, min(N_DOCS, 1_000_000))  # untimed warmup: codegen + workers
    t0 = time.time()
    res = flagship(spark, N_DOCS)
    dt = time.time() - t0
    timings["flagship_pip_spans"] = round(dt, 3)
    extra["flagship_docs_per_sec"] = round(N_DOCS / dt, 1)
    extra["flagship_joined_docs"] = res["joined_docs"]

    # --- spatial ops at bench scale ----------------------------------------
    pts = synth.doc_points(spark, N_DOCS).persist()
    pts.count()
    # untimed warmup: one FULL-SIZE pass. A 100k (or even 1M) warmup leaves
    # the first full run 2-3× slower than steady state (measured 12.8 →
    # 4.3 → 4.7 s after a 100k warmup; 8.9 → 4.7 s after 1M) — JIT tiering
    # of the generated stage + Python-worker ramp need a full execution,
    # not just a small one. Same steady-state discipline as the flagship
    # warmup, at the size that actually reaches steady state.
    knn.knn_join(pts, _q25(), k=10).count()
    bench("knn_25q", lambda: knn.knn_join(pts, _q25(), k=10).count())
    bench(
        "knn_25q_cellpruned",
        lambda: knn.knn_join_cellpruned(pts, _q25(), k=10, zoom=6).count(),
    )
    bench(
        "rasterize_rollup",
        lambda: raster.overview_rollup(
            _rasterized(spark, pts), level=4, stat="avg"
        ).count(),
    )
    bench(
        "zonal_stats_boxes",
        lambda: zonal.zonal_stats_points(
            pts, synth.zone_polygons(25, "box"), value="key", zoom=8
        ).count(),
    )
    # DataFrame-native polygon side (locate_faces shape): 12k hexagon parts
    # synthesized in column math, mapInPandas batched cover, AQE broadcasts
    # the 1.1M-row zoom-10 cover so the 8M-point side never shuffles;
    # short warmup compiles the cover/refine codepaths (session is already
    # hot from the queries above — measured warm-vs-steady gap ~4%)
    zdf = synth.zone_hexagons_df(spark, 12000)
    pip_op.pip_join_df(
        pts.where(F.col("key") % 40 == 0), zdf, zoom=10
    ).count()
    bench(
        "pip_faces_12k",
        lambda: pip_op.pip_join_df(pts, zdf, zoom=10).count(),
    )
    pts.unpersist()

    g = Grid(x0=0.0, y0=0.0, cell=1.0, rows=2048, cols=2048)
    gdf = grid_df(spark, g).persist()
    gdf.count()
    # tile=128: 256 tiles load-balance 32 cores (measured 2.3 s vs 3.0 s at
    # tile=256, 5.3 s at 512 — twelve 512² tasks starve the cores); halo
    # overhead at r=2 is still <2%
    bench("focal_tiles_r2", lambda: focal.focal_tiles(gdf, g, r=2, tile=128).count())

    # the PARALLEL GeoTIFF sink at 4M cells: 16 standalone 512x512 COG
    # shards written executor-side (deflate-1) + manifest — the scale path
    # that replaces the single-file driver byte stream (tiff.write_geotiff)
    import shutil as _sh

    from pyramids_spark import tiff as _tiff

    _mdir = "/tmp/pyramids_bench_mosaic"

    def run_mosaic():
        _sh.rmtree(_mdir, ignore_errors=True)
        _tiff.write_cog_parts(
            gdf, g, 1, _mdir, shard=(512, 512), tile=(256, 256), compress=1
        )

    run_mosaic()  # untimed warmup (codegen + Python-worker ramp)
    bench("cog_mosaic_sink_4m", run_mosaic)
    extra["cog_mosaic_bytes"] = sum(
        os.path.getsize(os.path.join(_mdir, f_)) for f_ in os.listdir(_mdir)
    )

    # the netCDF-4/HDF5 sink at the same 4M cells: 64 shuffle+deflate
    # chunks — since r6 via the TWO-PHASE STAGED parallel tail
    # (distributed compress+stage → driver metadata layout → distributed
    # pwrite; byte-identical to the r5 driver-stream file, ~2x faster at
    # 16M cells on one box and unbounded at cluster scale)
    from pyramids_spark import hdf5 as _h5

    def run_nc4():
        _h5.write_netcdf4(
            gdf.select(
                F.lit("v").alias("variable"),
                F.lit(0).cast("long").alias("t"), "row", "col", "value",
            ),
            g, "/tmp/pyramids_bench_nc4.nc", times=None,
            compress=1, shuffle=True, chunk=(256, 256), parallel=True,
        )

    run_nc4()  # untimed warmup
    bench("netcdf4_sink_4m", run_nc4)
    extra["netcdf4_bytes"] = os.path.getsize("/tmp/pyramids_bench_nc4.nc")

    # the PARALLEL netCDF-4 sink: compress=None makes every chunk's
    # stored size plan-time-known, so the front matter + dense
    # fixed-array index are written up front and executors pwrite chunks
    # at computed addresses — the classic-NetCDF pwrite pattern scaled
    # out, vs the ordered driver stream above
    def run_nc4_par():
        _h5.write_netcdf4(
            gdf.select(
                F.lit("v").alias("variable"),
                F.lit(0).cast("long").alias("t"), "row", "col", "value",
            ),
            g, "/tmp/pyramids_bench_nc4p.nc", times=None,
            compress=None, shuffle=True, chunk=(256, 256),
            index="fixed_array", parallel=True,
        )

    run_nc4_par()  # untimed warmup
    bench("netcdf4_parallel_sink_4m", run_nc4_par)
    extra["netcdf4_parallel_bytes"] = os.path.getsize(
        "/tmp/pyramids_bench_nc4p.nc")

    # the zarr v3 SHARDED sink at the same 4M cells: 16 shard files
    # (512x512, blosc-zstd inner 256x256 chunks + crc32c'd uint64 index)
    # written FULLY parallel, one task per shard — the object-store path
    # with no driver byte stream at all. blosc:zstd measured 19% faster
    # AND 31% smaller than the gzip-1 it replaces (byte-shuffle makes
    # float64 rasters zstd-friendly; pyarrow's C++ codec does the work)
    from pyramids_spark import zarr as _zarr

    _zdir = "/tmp/pyramids_bench_zarr3"

    def run_zarr3():
        _sh.rmtree(_zdir, ignore_errors=True)
        _zarr.write_zarr(
            gdf, g, _zdir, chunks=(256, 256), compress=3, zarr_format=3,
            shards=(512, 512), codec="blosc:zstd",
        )

    run_zarr3()  # untimed warmup
    bench("zarr_v3_sharded_sink_4m", run_zarr3)
    gdf.unpersist()

    # distributed connected components at a border set of ~10^5 cells
    # (per-tile CC + one-task label-graph solve; no driver round-trips)
    ccdf = grid_df(spark, g, "CAST(pmod(hash(row*2048+col), 100) AS DOUBLE)").persist()
    ccdf.count()
    bench(
        "cluster_cc_4m",
        lambda: vectorize.cluster(
            ccdf, g, lo=0.0, hi=54.0, tile=128, single_pass=True
        ).count(),
    )
    ccdf.unpersist()

    # full polygonize→WKT ring extraction at 4M cells / ~47k polygons:
    # per-tile chain walks + partition-level chain-graph stitch (round-3
    # distributed ring assembly — one task holds O(perimeter), never a
    # component's cells)
    rdf = grid_df(
        spark, g,
        "CAST(pmod(hash(CAST(row / 8 AS LONG) * 2048 + CAST(col / 8 AS LONG)), 7) AS DOUBLE)",
    ).persist()
    rdf.count()
    bench(
        "polygonize_rings_4m",
        lambda: vectorize.polygonize_rings(rdf, g, tile=256).count(),
    )
    rdf.unpersist()

    # --- text pipeline at bench scale ---------------------------------------
    texts = (
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
    texts.count()
    bench("minhash_sigs", lambda: dedup.minhash_signatures(dedup.shingles(texts), 8).count())
    bench("exact_dedup", lambda: dedup.exact_dedup(texts).count())
    texts.unpersist()

    # --- ANN at bench scale --------------------------------------------------
    dim = 32
    vecs = (
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
    vecs.count()
    qs = vecs.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    exact_pairs: set = set()
    bench(
        "ann_bruteforce",
        lambda: exact_pairs.update(
            (r["qid"], r["vec_id"]) for r in ann.cosine_topk(vecs, qs, k=10).collect()
        ),
    )
    planes = ann.hyperplanes(dim, 8)
    lsh_pairs_res: set = set()
    bench(
        "ann_lsh",
        lambda: lsh_pairs_res.update(
            (r["qid"], r["vec_id"])
            for r in ann.cosine_topk_lsh(vecs, qs, planes, k=10).collect()
        ),
    )
    extra["ann_lsh_recall"] = round(
        len(lsh_pairs_res & exact_pairs) / max(1, len(exact_pairs)), 4
    )
    ivf_pairs: set = set()

    def run_ivf():
        idx, cents = ann.ivf_index(vecs, n_centroids=32, iters=1)
        ivf_pairs.update(
            (r["qid"], r["vec_id"])
            for r in ann.cosine_topk_ivf(idx, cents, qs, k=10, nprobe=6).collect()
        )

    bench("ann_ivf", run_ivf)
    extra["ann_ivf_recall"] = round(
        len(ivf_pairs & exact_pairs) / max(1, len(exact_pairs)), 4
    )
    vecs.unpersist()

    # --- driver sf tables (scan pushdown paths) ------------------------------
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    bench(
        "histogram_lineitem",
        lambda: raster.histogram(
            li.select(F.lit(0).alias("band"), F.col("l_extendedprice").alias("value")),
            0.0, 60000.0, 20,
        ).count(),
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    bench(
        "temporal_reduce_events",
        lambda: ev.groupBy((F.col("user_id") % 64).alias("c"))
        .agg(F.avg("value"), F.min("value"), F.max("value"))
        .count(),
    )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline suite wall time (flagship PIP+tiling on "
                f"{N_DOCS} interleaved docs + spatial/text/ann ops)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "cpus": cpus,
                **extra,
            }
        )
    )
    spark.stop()


def _q25():
    import numpy as np

    out = []
    for i in range(25):
        k = np.array([i * 7_000_003 + 11], dtype=np.int64)
        out.append(
            (i, float(cells.lon_np(cells.h1_np(k))[0]), float(cells.lat_np(cells.h2_np(k))[0]))
        )
    return out


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
