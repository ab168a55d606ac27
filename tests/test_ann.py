"""ANN engines: exact vs LSH vs IVF — determinism and recall bounds."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyramids_spark import cells
from pyramids_spark.ann import search as ann


def _vectors(spark, n, dim=16):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[((cells.h1_col(F.col("id") * 131 + i) / F.lit(2.0**32)) * 2 - 1) for i in range(dim)]
        ).alias("embedding"),
    )


def _pairs(df):
    return {(r["qid"], r["vec_id"]) for r in df.collect()}


def test_exact_topk_self_query_rank1(spark):
    vecs = _vectors(spark, 2000)
    qs = vecs.where("vec_id < 3").select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    top = ann.cosine_topk(vecs, qs, k=5).toPandas()
    r1 = top[top["rank"] == 1]
    assert (r1.qid.to_numpy() == r1.vec_id.to_numpy()).all()
    assert (r1.cos_sim == 1.0).all()


def test_ivf_recall_and_determinism(spark):
    vecs = _vectors(spark, 3000)
    qs = vecs.where("vec_id < 5").select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    exact = _pairs(ann.cosine_topk(vecs, qs, k=10))
    idx, cents = ann.ivf_index(vecs, n_centroids=8, iters=2)
    idx = idx.persist()
    got = _pairs(ann.cosine_topk_ivf(idx, cents, qs, k=10, nprobe=4))
    recall = len(got & exact) / len(exact)
    assert recall >= 0.8, recall
    # full probe (nprobe = all centroids) must equal exact
    full = _pairs(ann.cosine_topk_ivf(idx, cents, qs, k=10, nprobe=8))
    assert full == exact
    # determinism: rebuilt index gives identical assignment
    idx2, cents2 = ann.ivf_index(vecs, n_centroids=8, iters=2)
    np.testing.assert_allclose(cents, cents2)
    a = idx.select("vec_id", "centroid_id").toPandas().sort_values("vec_id")
    b = idx2.select("vec_id", "centroid_id").toPandas().sort_values("vec_id")
    assert (a.centroid_id.to_numpy() == b.centroid_id.to_numpy()).all()
    idx.unpersist()


def test_lsh_multiprobe_recall(spark):
    vecs = _vectors(spark, 3000)
    qs = vecs.where("vec_id < 5").select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    exact = _pairs(ann.cosine_topk(vecs, qs, k=10))
    planes = ann.hyperplanes(16, 8)
    got = _pairs(ann.cosine_topk_lsh(vecs, qs, planes, k=10, probe_hamming=1))
    assert len(got & exact) / len(exact) >= 0.5


def test_ivf_persisted_index_partition_prunes(spark, tmp_path):
    """ivf_write partitions the lists by centroid_id; probing a stored
    index must (a) read only the probed partition directories — asserted
    via PartitionFilters in the scan plan — and (b) return exactly what
    probing the in-memory index returns."""
    vecs = _vectors(spark, 2000, dim=16)
    qs = vecs.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    idx, cents = ann.ivf_index(vecs, n_centroids=8, iters=1)
    path = str(tmp_path / "ivf")
    ann.ivf_write(idx, cents, path)
    idx2, cents2 = ann.ivf_read(spark, path)
    assert np.allclose(cents, cents2)

    mem = {(r["qid"], r["rank"]): r["vec_id"]
           for r in ann.cosine_topk_ivf(idx, cents, qs, k=5, nprobe=2).collect()}
    disk_df = ann.cosine_topk_ivf(idx2, cents2, qs, k=5, nprobe=2)
    disk = {(r["qid"], r["rank"]): r["vec_id"] for r in disk_df.collect()}
    assert mem == disk

    # the isin literal list must reach the scan's partition filters
    import re

    plan = disk_df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "centroid_id" in m.group(1) and "IN" in m.group(1).upper()


def test_auto_planes_scales_bucket_space():
    """The LSH plane count is a FLOOR that auto-raises with n: mean
    bucket ~1024 rows, capped at 30 planes (VERDICT r5 guard)."""
    assert ann._auto_planes(100, 8) == 8          # small n: floor wins
    assert ann._auto_planes(2048, 2) == 2         # auto=1 < floor
    assert ann._auto_planes(1 << 20, 8) == 10     # 1M rows -> 1024 buckets
    assert ann._auto_planes(5_000_000, 8) == 13
    assert ann._auto_planes(10**12, 8) == 30      # capped: int bucket
    assert ann._auto_planes(0, 8) == 8


def test_near_dup_lsh_path_uses_auto_planes(spark):
    """Above max_exact_rows the LSH branch engages the auto-sized bucket
    space and still finds the exact-path pairs for clustered vectors."""
    emb = _vectors(spark, 400).withColumn(
        "embedding",
        F.when(F.col("vec_id") % 100 == 0,
               F.array(*[F.lit(1.0)] * 16)).otherwise(F.col("embedding")))
    got = ann.near_dup_pairs(emb, threshold=0.999, id_col="vec_id",
                             max_exact_rows=50).collect()
    ids = {(r.id_a, r.id_b) for r in got}
    assert {(0, 100), (0, 200), (0, 300), (100, 200), (100, 300),
            (200, 300)} <= ids
