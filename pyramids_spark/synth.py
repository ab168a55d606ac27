"""Deterministic synthetic data (no external data; seeded per-key hashing).

The primary input table has the exact shape mandated by BASELINE.json
``input_hint``::

    documents(doc_id: string, spans: array<struct<kind:string, text:string,
              media_ref:string, offset:int>>)

Everything derives from the integer sequence id via the portable hash in
:mod:`pyramids_spark.cells` — fully reproducible at any scale, on any
executor, with no driver-side state (generation runs distributed via
``spark.range(n)`` + vectorized pandas UDFs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import cells

SPAN_KINDS = ("text", "image", "audio", "table")

_SPANS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("kind", T.StringType()),
                        T.StructField("text", T.StringType()),
                        T.StructField("media_ref", T.StringType()),
                        T.StructField("offset", T.IntegerType()),
                    ]
                )
            ),
        ),
    ]
)

_WORDS = np.array(
    "the of and to in a is that for it as was with be by on not he his but at are this".split()
)


def _spans_batch(ids: np.ndarray) -> pd.DataFrame:
    """Vectorized span synthesis for a batch of integer ids (FIXTURES.md §1):
    1-8 spans per doc; kind cycled by per-(doc, j) hash; text deterministic
    tokens for kind=text else ''; media_ref 'media://{doc_id}/{j}' for
    non-text kinds; offset = cumulative char offset."""
    n_spans = 1 + (cells.h1_np(ids) % 8).astype(np.int64)  # 1..8
    doc_idx = np.repeat(np.arange(ids.shape[0]), n_spans)
    j = np.concatenate([np.arange(k) for k in n_spans]) if ids.size else np.array([], dtype=np.int64)
    key = ids[doc_idx] * 16 + j  # unique per (doc, span)
    kind_i = (cells.h2_np(key) % 4).astype(np.int64)
    kind = np.array(SPAN_KINDS)[kind_i]
    wi = cells.h1_np(key * 7 + 3) % len(_WORDS)
    wj = cells.h2_np(key * 7 + 5) % len(_WORDS)
    wk = cells.h1_np(key * 7 + 11) % len(_WORDS)
    text = np.where(
        kind == "text",
        np.char.add(np.char.add(np.char.add(_WORDS[wi], " "), _WORDS[wj]),
                    np.char.add(" ", _WORDS[wk])),
        "",
    )
    doc_id = np.char.add("doc-", np.char.zfill(ids[doc_idx].astype(str), 13))
    media_ref = np.where(
        kind == "text",
        "",
        np.char.add(np.char.add(np.char.add("media://", doc_id), "/"), j.astype(str)),
    )
    lengths = np.where(kind == "text", np.char.str_len(text), 64).astype(np.int64)
    # offset = cumulative length of prior spans within the doc
    csum = np.cumsum(lengths)
    starts = np.concatenate([[0], csum[:-1]])
    doc_start = np.concatenate([[0], np.cumsum(n_spans)[:-1]])
    offset = (starts - starts[doc_start][doc_idx] ).astype(np.int32)
    sdf = pd.DataFrame(
        {"doc_id": doc_id, "kind": kind, "text": text, "media_ref": media_ref,
         "offset": offset, "_d": doc_idx}
    )
    rec = sdf.groupby("_d", sort=True).apply(
        lambda g: g[["kind", "text", "media_ref", "offset"]].to_dict("records"),
        include_groups=False,
    )
    return pd.DataFrame(
        {"doc_id": np.char.add("doc-", np.char.zfill(ids.astype(str), 13)),
         "spans": rec.values}
    )



def doc_key_col() -> "F.Column":
    """Numeric key recovered from the synthetic 'doc-%013d' id — the ONE
    place that knows the prefix format (substring(…, 5) with no length so
    recovery works at any id width)."""
    return F.expr("cast(substring(doc_id, 5) as long)")

def documents_spans(
    spark: SparkSession, n: int, partitions: int | None = None, start: int = 0
) -> DataFrame:
    """The interleaved text+media documents table (input_hint shape).

    Generated entirely with JVM column expressions (whole-stage codegen, no
    Python in the loop) so synthesis keeps up at bench scale; byte-identical
    to the numpy reference generator :func:`_spans_batch`, which the test
    suite asserts against.
    """
    # partitions must scale with the cluster, not the row count: 2-3 waves
    # of tasks per core (same rule a 1000-executor job would use)
    partitions = partitions or max(
        2 * spark.sparkContext.defaultParallelism, min(256, n // 250_000 + 1)
    )
    df = spark.range(start, start + n, 1, partitions)

    h1e = cells.h1_col  # overflow-safe for any key magnitude
    h2e = cells.h2_col

    words = F.array(*[F.lit(w) for w in _WORDS.tolist()])
    kinds = F.array(*[F.lit(k) for k in SPAN_KINDS])
    nw = len(_WORDS)
    # format_string never truncates (unlike lpad): ids >= 10^13 simply widen,
    # keeping doc_id unique and the numpy zfill twin byte-identical for the
    # whole advertised 10^12-doc range (13 digits cover ids < 10^13).
    doc_id = F.format_string("doc-%013d", F.col("id"))
    n_spans = (F.lit(1) + h1e(F.col("id")) % 8).cast("int")

    def span_at(j):
        key = F.col("id") * 16 + j
        kind = F.element_at(kinds, (h2e(key) % 4 + 1).cast("int"))
        w = lambda kk: F.element_at(words, (h1e(kk) % nw + 1).cast("int"))  # noqa: E731
        w2 = lambda kk: F.element_at(words, (h2e(kk) % nw + 1).cast("int"))  # noqa: E731
        text = F.when(
            kind == "text",
            F.concat_ws(" ", w(key * 7 + 3), w2(key * 7 + 5), w(key * 7 + 11)),
        ).otherwise(F.lit(""))
        media = F.when(kind == "text", F.lit("")).otherwise(
            F.concat(F.lit("media://"), doc_id, F.lit("/"), j.cast("string"))
        )
        length = F.when(kind == "text", F.length(text)).otherwise(F.lit(64))
        return kind, text, media, length

    # materialize spans once (each span expression evaluated exactly once),
    # then offsets = exclusive prefix sum over the materialized lengths
    # (O(k²) over plain ints, k ≤ 8)
    idx = F.sequence(F.lit(0), n_spans - 1)
    spans0 = F.transform(
        idx,
        lambda j: F.struct(
            span_at(j)[0].alias("kind"),
            span_at(j)[1].alias("text"),
            span_at(j)[2].alias("media_ref"),
            span_at(j)[3].alias("length"),
        ),
    )
    df = df.select(doc_id.alias("doc_id"), spans0.alias("s0"))
    spans = F.transform(
        F.sequence(F.lit(0), F.size("s0") - 1),
        lambda j: F.struct(
            F.element_at(F.col("s0"), j + 1)["kind"].alias("kind"),
            F.element_at(F.col("s0"), j + 1)["text"].alias("text"),
            F.element_at(F.col("s0"), j + 1)["media_ref"].alias("media_ref"),
            F.when(j == 0, F.lit(0))
            .otherwise(
                F.aggregate(
                    F.slice(F.col("s0"), 1, j),
                    F.lit(0),
                    lambda acc, s: acc + s["length"],
                )
            )
            .cast("int")
            .alias("offset"),
        ),
    )
    return df.select("doc_id", spans.alias("spans"))


def documents_full(
    spark: SparkSession,
    n: int,
    hot_frac: float = 0.2,
    hot_box: tuple[float, float, float, float] = (-0.5, -0.5, 0.5, 0.5),
    partitions: int | None = None,
    start: int = 0,
) -> DataFrame:
    """documents + geometry in ONE generated pass: (doc_id, key, spans,
    span_hash, x, y). Both derive from the same sequence id, so fusing them
    avoids a full-table shuffle join — at 10^12 rows the fused scan is the
    only sane plan (and mirrors reading one wide Iceberg table)."""
    docs = documents_spans(spark, n, partitions, start=start)
    key = doc_key_col()
    from . import cells as _c

    h1 = _c.h1_col(key)
    h2 = _c.h2_col(key)
    h3 = _c.mulmod32_col(key, 2971215073, 433494437)
    lon = _c.lon_col(h1)
    lat = _c.lat_col(h2)
    x0, y0, x1, y1 = hot_box
    hot = (h3 / F.lit(float(2**32))) < F.lit(hot_frac)
    lon = F.when(hot, F.lit(x0) + F.lit(x1 - x0) * (h1 / F.lit(float(2**32)))).otherwise(lon)
    lat = F.when(hot, F.lit(y0) + F.lit(y1 - y0) * (h2 / F.lit(float(2**32)))).otherwise(lat)
    return docs.select(
        "doc_id", key.alias("key"), "spans", span_hash_col().alias("span_hash"),
        lon.alias("x"), lat.alias("y"),
    )


def span_hash_col(spans_col: str = "spans") -> F.Column:
    """Canonical hash of the span sequence (kind, text, media_ref, order).

    Computed at source, carried through every operator, re-checked at sink —
    the per-row invariant of BASELINE.json. Spark's xxhash64 folds complex
    types (array<struct>) element-by-element, field-by-field with a fixed
    seed — order- and content-sensitive, deterministic across runs/executors,
    and fully codegen'd. (Measured alternatives: hashing to_json is 2.4×
    slower — string materialization; an `aggregate` HOF fold is ~7× slower —
    lambdas don't codegen.)
    """
    return F.xxhash64(F.col(spans_col))


def doc_points(
    spark: SparkSession,
    n: int,
    hot_frac: float = 0.2,
    hot_box: tuple[float, float, float, float] = (-0.5, -0.5, 0.5, 0.5),
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic point geometry per doc with a skewed hot spot.

    ``hot_frac`` of docs land inside ``hot_box`` (lon0, lat0, lon1, lat1) to
    create realistic cell skew — the thing the salting/AQE machinery must
    handle (north rule). Pure column arithmetic; no UDF.
    """
    partitions = partitions or max(
        2 * spark.sparkContext.defaultParallelism, min(64, n // 100_000 + 1)
    )
    df = spark.range(n, numPartitions=partitions)
    h1, h2 = cells.h1_col(F.col("id")), cells.h2_col(F.col("id"))
    h3 = cells.mulmod32_col(F.col("id"), 2971215073, 433494437)
    lon = cells.lon_col(h1)
    lat = cells.lat_col(h2)
    x0, y0, x1, y1 = hot_box
    hot = (h3 / F.lit(float(2**32))) < F.lit(hot_frac)
    lon = F.when(hot, F.lit(x0) + F.lit(x1 - x0) * (h1 / F.lit(float(2**32)))).otherwise(lon)
    lat = F.when(hot, F.lit(y0) + F.lit(y1 - y0) * (h2 / F.lit(float(2**32)))).otherwise(lat)
    return df.select(
        F.format_string("doc-%013d", F.col("id")).alias("doc_id"),
        F.col("id").alias("key"),
        lon.alias("x"),
        lat.alias("y"),
    )


def zone_polygons(n_zones: int, kind: str = "hex", seed: int = 42) -> list[dict]:
    """Deterministic zone polygons in geo space (numpy, driver-side, tiny).

    kinds: 'box' (axis-aligned), 'hex' (regular hexagon around a hash
    centre), 'hull' (convex hull of k hashed points), 'multi' (2-3 disjoint
    boxes — multipolygon for explode tests). Returns dicts:
    {zone_id, zone_class, parts: [ (V,2) ndarray, ...]}.
    """
    out = []
    for z in range(n_zones):
        k = np.int64(seed * 1_000_003 + z)
        cx = cells.lon_np(cells.h1_np(np.array([k])))[0] * 0.8
        cy = cells.lat_np(cells.h2_np(np.array([k])))[0] * 0.8
        r = 2.0 + (cells.h1_np(np.array([k * 3 + 1]))[0] % 1000) / 100.0  # 2..12°
        if kind == "box":
            parts = [np.array([[cx - r, cy - r], [cx + r, cy - r], [cx + r, cy + r], [cx - r, cy + r]])]
        elif kind == "hex":
            ang = np.linspace(0, 2 * np.pi, 7)[:-1]
            parts = [np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=1)]
        elif kind == "hull":
            kk = np.arange(8) + k * 17
            px = cx + (cells.h1_np(kk) % 10000) / 10000.0 * r - r / 2
            py = cy + (cells.h2_np(kk) % 10000) / 10000.0 * r - r / 2
            pts = np.stack([px, py], axis=1)
            parts = [_convex_hull(pts)]
        elif kind == "multi":
            m = 2 + int(cells.h2_np(np.array([k]))[0] % 2)
            parts = []
            for p in range(m):
                ox = cx + p * 2.5 * r
                parts.append(
                    np.array([[ox - r / 2, cy - r / 2], [ox + r / 2, cy - r / 2],
                              [ox + r / 2, cy + r / 2], [ox - r / 2, cy + r / 2]])
                )
        else:
            raise ValueError(kind)
        out.append({"zone_id": z, "zone_class": z % 5, "parts": parts})
    return out


def _convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain (tiny input, driver-side only)."""
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(points):
        h: list[np.ndarray] = []
        for p in points:
            while len(h) >= 2 and np.cross(h[-1] - h[-2], p - h[-2]) <= 0:
                h.pop()
            h.append(p)
        return h

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


#: unit-hexagon vertex offsets (ccw) for zone_hexagons_df — embedded as the
#: SAME double literals in the entry oracle SQL so the two engines agree
HEX6_COS = [float(np.cos(2 * np.pi * k / 6)) for k in range(6)]
HEX6_SIN = [float(np.sin(2 * np.pi * k / 6)) for k in range(6)]


def zone_hexagons_df(spark: SparkSession, n: int) -> DataFrame:
    """``n`` hexagon polygon parts as a DataFrame ``(zone_id, xs, ys)`` —
    the DISTRIBUTED polygon side for ``pip.pip_join_df`` (reference
    ``locate_faces`` against 10^7-face mesh tables). Synthesized in pure
    column math from the portable int64 hash: centre from
    ``h1/h2(zone_id·1000003 + 11)``, radius 0.5–2.0° from
    ``h1(zone_id·3 + 1)``; never materialized driver-side."""
    z = spark.range(n).select(F.col("id").alias("zone_id"))
    k = F.col("zone_id") * F.lit(1000003) + F.lit(11)
    z = (
        z.withColumn("_cx", cells.lon_col(cells.h1_col(k)) * 0.75)
        .withColumn("_cy", cells.lat_col(cells.h2_col(k)) * 0.75)
        .withColumn(
            "_r",
            F.lit(0.5)
            + (cells.h1_col(F.col("zone_id") * F.lit(3) + F.lit(1)) % F.lit(1500))
            / F.lit(1000.0),
        )
    )
    xs = F.array(*[F.col("_cx") + F.col("_r") * F.lit(c) for c in HEX6_COS])
    ys = F.array(*[F.col("_cy") + F.col("_r") * F.lit(s) for s in HEX6_SIN])
    return z.select("zone_id", xs.alias("xs"), ys.alias("ys"))
