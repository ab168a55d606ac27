"""kNN join: for each query point, the k nearest target rows (Euclidean).

Reference semantics: ``MeshSpatialIndex.locate_nearest_node/face``
(``/root/reference/src/pyramids/netcdf/ugrid/spatial.py:101-143``): cKDTree
``query(points, k)`` — k nearest by Euclidean distance, deterministic
tie-break. Distributed designs (both exact):

1. :func:`knn_join` — **broadcast-queries partial top-k**: the query set
   (≪ targets; broadcast) is scored against each target partition in one
   vectorized numpy pass (``mapInPandas``); each partition emits at most
   Q×k candidate rows — the shuffle volume is O(parts·Q·k), independent of
   target row count — then a window ``row_number() ≤ k`` finalizes. This is
   the map-side-combine pattern of Spark aggregation applied to top-k, and
   it scales to 10^12 targets because the big table is scanned once and
   never shuffled.
2. :func:`knn_join_cellpruned` — **cell-ring expansion** (the reference's
   KD-tree analogue, SURVEY §2.3): candidates only from grid cells within a
   Chebyshev ring around each query, ring radius grown until ≥k found AND
   the guarantee radius (kth candidate distance) is fully covered. Wins when
   Q is large and targets are cell-partitioned (partition pruning kicks in).

Ties broken by (distance², key) — bit-stable across engines since the
distance² arithmetic is identical IEEE doubles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import cells
from .pip import with_cell_id


def knn_join(
    targets: DataFrame,
    queries: list[tuple[int, float, float]],
    k: int = 5,
    x: str = "x",
    y: str = "y",
    key: str = "key",
) -> DataFrame:
    """→ (query_id, {key}, dist2, rank) with rank = 1..k per query."""
    spark = targets.sparkSession
    qarr = np.asarray([[q[1], q[2]] for q in queries], dtype=np.float64)
    qids = np.asarray([q[0] for q in queries], dtype=np.int64)
    qb = spark.sparkContext.broadcast((qids, qarr))

    out_schema = f"query_id long, {key} long, dist2 double"

    def partial_topk(batches):
        qi, qxy = qb.value
        # accumulate per-partition best k per query across batches
        best: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for pdf in batches:
            px = pdf[x].to_numpy(dtype=np.float64)
            py = pdf[y].to_numpy(dtype=np.float64)
            kk = pdf[key].to_numpy(dtype=np.int64)
            # (Q, B) distance matrix, vectorized
            d2 = (qxy[:, 0:1] - px[None, :]) ** 2 + (qxy[:, 1:2] - py[None, :]) ** 2
            for i in range(qi.shape[0]):
                row = d2[i]
                if i in best:
                    row = np.concatenate([row, best[i][0]])
                    kk2 = np.concatenate([kk, best[i][1]])
                else:
                    kk2 = kk
                if row.shape[0] > k:
                    # O(B) threshold-partition, then sort only the ≤k-th
                    # subset (exact under ties: everything at the kth value
                    # is kept for the lexsort)
                    kth = np.partition(row, k - 1)[k - 1]
                    m = row <= kth
                    row, kk2 = row[m], kk2[m]
                sel = np.lexsort((kk2, row))[:k]
                best[i] = (row[sel], kk2[sel])
        rows = {
            "query_id": np.concatenate([np.full(len(v[0]), qi[i]) for i, v in best.items()])
            if best else np.array([], dtype=np.int64),
            key: np.concatenate([v[1] for v in best.values()])
            if best else np.array([], dtype=np.int64),
            "dist2": np.concatenate([v[0] for v in best.values()])
            if best else np.array([], dtype=np.float64),
        }
        yield pd.DataFrame(rows)

    cand = targets.select(key, x, y).mapInPandas(partial_topk, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.col("dist2").asc(), F.col(key).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def knn_join_cellpruned(
    targets: DataFrame,
    queries: list[tuple[int, float, float]],
    k: int = 5,
    zoom: int = 6,
    x: str = "x",
    y: str = "y",
    key: str = "key",
    max_rounds: int = 8,
) -> DataFrame:
    """Exact kNN via expanding cell disks; prunes the scan to candidate cells.

    Each round doubles the Chebyshev radius; a query finishes when it has ≥k
    candidates whose kth distance is covered by the searched radius (the
    ring guarantee: all unsearched cells are farther than the current kth).
    Returns the same schema as :func:`knn_join`.
    """
    spark = targets.sparkSession
    n = 1 << zoom
    cell_w = cells.LON_SPAN / n
    cell_h = 180.0 / n
    tgt = with_cell_id(targets.select(key, x, y), zoom, x, y)
    tgt = tgt.persist()
    qids = np.asarray([q[0] for q in queries], dtype=np.int64)
    qxy = np.asarray([[q[1], q[2]] for q in queries], dtype=np.float64)
    qcx, qcy = cells.geo_cell_np(qxy[:, 0], qxy[:, 1], zoom)

    done: list[pd.DataFrame] = []
    active = np.ones(len(qids), dtype=bool)
    r = 1
    for _ in range(max_rounds):
        if not active.any():
            break
        # candidate cells for active queries (disk of radius r, clamped)
        rows = []
        rr = np.arange(-r, r + 1)
        dx, dy = np.meshgrid(rr, rr)
        dx, dy = dx.ravel(), dy.ravel()
        for i in np.nonzero(active)[0]:
            xs, ys = qcx[i] + dx, qcy[i] + dy
            m = (xs >= 0) & (xs < n) & (ys >= 0) & (ys < n)
            for c in cells.pack(xs[m], ys[m], zoom):
                rows.append((int(qids[i]), int(c)))
        cand_cells = F.broadcast(
            spark.createDataFrame(
                pd.DataFrame(rows, columns=["query_id", "cell_id"]),
                schema="query_id long, cell_id long",
            )
        )
        qdf = F.broadcast(
            spark.createDataFrame(
                pd.DataFrame({"query_id": qids[active], "qx": qxy[active, 0], "qy": qxy[active, 1]}),
                schema="query_id long, qx double, qy double",
            )
        )
        got = (
            tgt.join(cand_cells, "cell_id")
            .join(qdf, "query_id")
            .withColumn(
                "dist2",
                (F.col(x) - F.col("qx")) ** 2 + (F.col(y) - F.col("qy")) ** 2,
            )
            .withColumn(
                "rank",
                F.row_number().over(
                    Window.partitionBy("query_id").orderBy(
                        F.col("dist2").asc(), F.col(key).asc()
                    )
                ),
            )
            .where(F.col("rank") <= k)
            .select("query_id", key, "dist2", "rank")
            .toPandas()
        )
        # guarantee: kth distance must fit inside the searched radius
        guard2 = (r * min(cell_w, cell_h)) ** 2
        for i in np.nonzero(active)[0]:
            g = got[got.query_id == qids[i]]
            if len(g) >= k and g.dist2.max() <= guard2:
                done.append(g)
                active[i] = False
            elif len(g) >= k and r >= n:  # searched everything
                done.append(g)
                active[i] = False
        r *= 2
        if r > n:
            r = n
    # anything still active after max_rounds: fall back to full search
    if active.any():
        rest = knn_join(
            tgt, [(int(qids[i]), float(qxy[i, 0]), float(qxy[i, 1])) for i in np.nonzero(active)[0]],
            k=k, x=x, y=y, key=key,
        ).toPandas()
        done.append(rest[["query_id", key, "dist2", "rank"]])
    tgt.unpersist()
    out = pd.concat(done, ignore_index=True) if done else pd.DataFrame(
        columns=["query_id", key, "dist2", "rank"]
    )
    return spark.createDataFrame(out, schema=f"query_id long, {key} long, dist2 double, rank int")
