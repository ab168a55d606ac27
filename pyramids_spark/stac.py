"""STAC ItemCollection ingest (reference ``dataset/_stac.py:106-186``).

Duck-typed like the reference: items may be pystac-style objects
(``item.assets[k].href``) or raw STAC JSON dicts
(``item["assets"][k]["href"]``); bbox intersection filters items BEFORE any
href resolves (catalog-level pruning — at scale this is what keeps a
continental query from listing a planet of scenes). The resolved hrefs
become one multi-path parquet scan with a ``t`` timestep column — Spark
merges the file lists at the source, so per-file partition pruning and
column pushdown still apply.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _iter_items(items: Any) -> list:
    return list(items)


def _get(obj: Any, key: str, default=None):
    if isinstance(obj, dict):
        return obj.get(key, default)
    return getattr(obj, key, default)


def _item_bbox(item: Any):
    return _get(item, "bbox")


def _bbox_intersects(a, b) -> bool:
    return not (a[2] < b[0] or b[2] < a[0] or a[3] < b[1] or b[3] < a[1])


def _resolve_asset_href(item: Any, asset: str) -> str:
    assets = _get(item, "assets")
    if assets is None:
        raise KeyError(f"item has no assets: {item!r}")
    a = assets[asset]
    href = _get(a, "href")
    if href is None:
        raise KeyError(f"asset {asset!r} has no href")
    return str(href)


def from_stac(
    spark: SparkSession,
    items: Iterable[Any],
    asset: str,
    *,
    patch_url: Callable[[str], str] | None = None,
    bbox: tuple[float, float, float, float] | None = None,
    max_items: int | None = None,
) -> DataFrame:
    """STAC items → temporal cell stack: one ``t`` per item (catalog order
    after filtering), each backed by the item's resolved asset parquet.

    Mirrors the reference contract: KeyError on a missing asset, ValueError
    on zero items after filtering, ``patch_url`` for URL signing.
    """
    item_list = _iter_items(items)
    if bbox is not None:
        item_list = [
            i for i in item_list
            if _item_bbox(i) is not None and _bbox_intersects(_item_bbox(i), bbox)
        ]
    if max_items is not None:
        item_list = item_list[:max_items]
    if not item_list:
        raise ValueError("no STAC items left after filtering")
    hrefs = []
    for item in item_list:
        href = _resolve_asset_href(item, asset)
        if patch_url is not None:
            href = patch_url(href)
        hrefs.append(href)
    parts = [
        spark.read.parquet(h).withColumn("t", F.lit(t)) for t, h in enumerate(hrefs)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
