"""Production entry point for the flagship spatial-join + tiling job.

Submit (the north-rule deployment shape)::

    cd /root/repo && zip -r /tmp/pyramids_spark.zip pyramids_spark
    spark-submit --py-files /tmp/pyramids_spark.zip \\
        jobs/pip_tiling_job.py \\
        --input /path/to/documents_parquet_or_iceberg \\
        --output /path/to/checkpointed_output \\
        --zones 10 --zoom 11 --chunks 16

The job is CHECKPOINTED: the input keyspace is split into chunks; each chunk
commits atomically with per-partition lineage + metrics
(pyramids_spark.checkpoint). Re-submitting after a failure resumes from the
last committed chunk. On a real cluster add ``--master yarn`` /
``--master k8s://...`` and executor sizing; the engine code is unchanged.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents table path (parquet)")
    ap.add_argument("--output", required=True, help="checkpoint/output root")
    ap.add_argument("--zones", type=int, default=10)
    ap.add_argument("--zoom", type=int, default=11)
    ap.add_argument("--tile-zoom", type=int, default=12)
    ap.add_argument("--chunks", type=int, default=16)
    ap.add_argument("--job-id", default="pip_tiling")
    args = ap.parse_args()

    # import AFTER spark-submit ships the zip
    from pyramids_spark import cells, synth
    from pyramids_spark.checkpoint import CheckpointedJob
    from pyramids_spark.operators import pip as pip_op

    spark = SparkSession.builder.appName("pip_tiling").getOrCreate()
    zones = synth.zone_polygons(args.zones, "hex")

    docs = spark.read.parquet(args.input)
    n_keys = docs.agg(F.max("key")).first()[0] + 1
    step = (n_keys + args.chunks - 1) // args.chunks
    chunks = [
        {"id": i, "lo": i * step, "hi": min(n_keys, (i + 1) * step)}
        for i in range(args.chunks)
        if i * step < n_keys
    ]

    def run_chunk(spark_, chunk):
        part = docs.where(
            (F.col("key") >= chunk["lo"]) & (F.col("key") < chunk["hi"])
        )
        hits = pip_op.pip_join(part, zones, zoom=args.zoom)
        cx, cy = cells.geo_cell_col(F.col("x"), F.col("y"), args.tile_zoom)
        hits = hits.withColumn("tile_id", cells.cell_id_col(cx, cy, args.tile_zoom))
        ok = (synth.span_hash_col() == F.col("span_hash")).alias("span_ok")
        return hits.select("doc_id", "zone_id", "tile_id", ok)

    cp = CheckpointedJob(spark, args.output, args.job_id)
    lineage = cp.run(chunks, run_chunk)
    v = cp.snapshot()
    bad = cp.result().where(~F.col("span_ok")).count()
    print(f"snapshot v{v}; {len(lineage)} chunks; span-invariant violations: {bad}")
    assert bad == 0
    cp.metrics_df().show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
