"""Similarity search over an embedding column (array<float>).

- :func:`cosine_topk` — exact brute-force baseline: JVM-side ``aggregate``/
  ``zip_with`` dot products against a broadcast query set, partition-local
  top-k (same pattern as operators.knn) so the 10^12-row side is scanned
  once and only Q×k×parts candidate rows shuffle.
- :func:`lsh_buckets` / :func:`cosine_topk_lsh` — the scale path: random-
  hyperplane signs (deterministic hash-derived planes) bucket vectors; top-k
  runs only within matching buckets (multi-probe = Hamming-1 neighbors).
  Recall < 1 by construction; the bench reports recall vs the exact path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import cells


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec: str = "embedding",
    qid: str = "qid",
    qvec: str = "qvec",
) -> DataFrame:
    """Exact cosine top-k: queries (small) broadcast-joined against every
    vector; per-query row_number ≤ k. Sim rounded to 6 dp for cross-engine
    hash stability; ties break on vec_id."""
    q = F.broadcast(queries.select(qid, qvec))
    j = emb.select(id_col, vec).crossJoin(q)
    sim = _dot(F.col(vec), F.col(qvec)) / (_norm(F.col(vec)) * _norm(F.col(qvec)))
    scored = j.select(qid, id_col, F.round(sim, 6).alias("cos_sim"))
    w = Window.partitionBy(qid).orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 7) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes from the portable hash —
    reproducible on any executor with no RNG state."""
    idx = np.arange(dim * n_planes, dtype=np.int64) + seed * 1_000_003
    u = cells.h1_np(idx).astype(np.float64) / 2**32
    return (u.reshape(n_planes, dim) * 2.0 - 1.0)


def lsh_buckets(
    emb: DataFrame, planes: np.ndarray, vec: str = "embedding"
) -> DataFrame:
    """Append ``bucket`` = sign-pattern int of the vector against each plane."""
    n_planes, dim = planes.shape
    bucket = F.lit(0)
    for i in range(n_planes):
        arr = F.array(*[F.lit(float(v)) for v in planes[i]])
        d = _dot(F.col(vec), arr)
        bucket = bucket + F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return emb.withColumn("bucket", bucket)


def cosine_topk_lsh(
    emb: DataFrame,
    queries: DataFrame,
    planes: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec: str = "embedding",
    qid: str = "qid",
    qvec: str = "qvec",
    probe_hamming: int = 1,
) -> DataFrame:
    """Bucketed ANN: score only vectors whose bucket is within
    ``probe_hamming`` bit flips of the query's bucket (multi-probe LSH).
    Equi-join on bucket → no cross join, prunes ~(1 - probes/2^P) of work."""
    n_planes = planes.shape[0]
    eb = lsh_buckets(emb, planes, vec)
    qb = lsh_buckets(queries, planes, qvec)
    # expand query buckets to the probe set
    probes = [F.col("bucket")]
    if probe_hamming >= 1:
        probes += [F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)]
    qexp = qb.select(qid, qvec, F.explode(F.array(*probes)).alias("bucket"))
    j = eb.join(F.broadcast(qexp), "bucket")
    sim = _dot(F.col(vec), F.col(qvec)) / (_norm(F.col(vec)) * _norm(F.col(qvec)))
    scored = j.select(qid, id_col, F.round(sim, 6).alias("cos_sim")).dropDuplicates([qid, id_col])
    w = Window.partitionBy(qid).orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
