"""WKT geometry constructors / extractors as pure column algebra.

Reference surface: ``feature/geometry.py:546`` ``create_polygon`` /
``:637`` ``create_points`` (shapely constructors) and the WKT string forms
used throughout the reference's FeatureCollection round trips. With no
shapely in a Spark executor the distributed representation of a geometry
column IS its WKT string (plus typed coordinate columns); these helpers
build and parse that representation with codegen'd string functions — no
UDF, no Python in the hot path, safe at any row count.

Precision discipline: both Spark's ``format_string`` and DuckDB's
``printf`` use C-style ``%.6f``; values are ``round(x, 6)``-ed first (both
engines round half away from zero) and ``+ 0.0`` normalizes IEEE ``-0.0``
to ``+0.0`` so the two engines emit byte-identical strings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_NUM = r"(-?[0-9]+\.?[0-9]*)"


def _norm(c: Column) -> Column:
    # 6-dp, then -0.0 → +0.0 (adding +0.0 maps -0.0 to +0.0, exact no-op
    # for every other double)
    return F.round(c, 6) + F.lit(0.0)


def point_wkt(x: Column, y: Column) -> Column:
    """(x, y) → ``POINT (x y)`` at 6-dp (reference ``create_points``)."""
    return F.format_string("POINT (%.6f %.6f)", _norm(x), _norm(y))


def box_wkt(x0: Column, y0: Column, x1: Column, y1: Column) -> Column:
    """Bounding box → closed ccw ``POLYGON`` ring at 6-dp (reference
    ``create_polygon`` over the 5-vertex bounds ring)."""
    a, b, c, d = _norm(x0), _norm(y0), _norm(x1), _norm(y1)
    return F.format_string(
        "POLYGON ((%.6f %.6f, %.6f %.6f, %.6f %.6f, %.6f %.6f, %.6f %.6f))",
        a, b, c, b, c, d, a, d, a, b,
    )


def _vertex_strs(xs: Column, ys: Column) -> Column:
    return F.zip_with(
        xs, ys, lambda x, y: F.format_string("%.6f %.6f", _norm(x), _norm(y))
    )


def polygon_wkt(xs: Column, ys: Column) -> Column:
    """Coordinate arrays → single-ring ``POLYGON ((…))`` at 6-dp, closing
    the ring when the input is open (reference ``create_polygon``'s
    closed-ring contract, ``feature/geometry.py:546-604``). Pure array/
    string algebra — codegen, SQL-twinnable, no UDF."""
    parts = _vertex_strs(xs, ys)
    closed = F.element_at(parts, 1) == F.element_at(parts, -1)
    ring = F.when(closed, parts).otherwise(
        F.concat(parts, F.array(F.element_at(parts, 1)))
    )
    return F.concat(F.lit("POLYGON (("), F.array_join(ring, ", "), F.lit("))"))


def linestring_wkt(xs: Column, ys: Column) -> Column:
    """Coordinate arrays → ``LINESTRING (…)`` at 6-dp (reference
    ``create_linestring``-style constructor, ``feature/geometry.py:26-441``)."""
    return F.concat(
        F.lit("LINESTRING ("), F.array_join(_vertex_strs(xs, ys), ", "), F.lit(")")
    )


def _ring_body(wkt: Column) -> Column:
    # first parenthesized coordinate run: the POLYGON exterior ring, or the
    # whole LINESTRING body (neither contains nested parens)
    return F.regexp_extract(wkt, r"\(\(?([^()]+)\)", 1)


def wkt_ring_xs(wkt: Column) -> Column:
    """POLYGON exterior ring (or LINESTRING) → x array<double>."""
    return F.transform(
        F.split(_ring_body(wkt), ", "),
        lambda p: F.element_at(F.split(p, " "), 1).try_cast("double"),
    )


def wkt_ring_ys(wkt: Column) -> Column:
    """POLYGON exterior ring (or LINESTRING) → y array<double>."""
    return F.transform(
        F.split(_ring_body(wkt), ", "),
        lambda p: F.element_at(F.split(p, " "), 2).try_cast("double"),
    )


def multipolygon_parts(wkt: Column) -> Column:
    """``MULTIPOLYGON (((…)), ((…)))`` → array of ``POLYGON ((…))`` part
    strings (holes survive: each part keeps its own inner ring list) —
    ``explode`` it for the reference's ``explode_gdf`` Multi*→parts
    semantics (``feature/geometry.py:219``)."""
    body = F.regexp_extract(wkt, r"^\s*MULTIPOLYGON \((.*)\)\s*$", 1)
    pieces = F.split(body, r"\)\)\s*,\s*\(\(")
    return F.transform(
        pieces,
        lambda p: F.concat(
            F.lit("POLYGON (("),
            F.regexp_replace(F.regexp_replace(p, r"^\(\(", ""), r"\)\)$", ""),
            F.lit("))"),
        ),
    )


def multilinestring_parts(wkt: Column) -> Column:
    """``MULTILINESTRING ((…), (…))`` → array of ``LINESTRING (…)``."""
    body = F.regexp_extract(wkt, r"^\s*MULTILINESTRING \((.*)\)\s*$", 1)
    pieces = F.split(body, r"\)\s*,\s*\(")
    return F.transform(
        pieces,
        lambda p: F.concat(
            F.lit("LINESTRING ("),
            F.regexp_replace(F.regexp_replace(p, r"^\(", ""), r"\)$", ""),
            F.lit(")"),
        ),
    )


def geometrycollection_parts(wkt: Column) -> Column:
    """``GEOMETRYCOLLECTION (POINT (…), POLYGON ((…)), …)`` → array of the
    member WKT strings, RECURSIVELY flattened like the reference's
    ``geometry_collection_coords`` (``feature/geometry.py:392-441``): a
    nested collection contributes its primitive/Multi* members, not itself.

    Pure string algebra (codegen, no UDF): (1) strip every nested
    ``GEOMETRYCOLLECTION (`` header; (2) split members on ``", "`` followed
    by a geometry TAG — coordinates never start with a letter; a
    capture-and-sentinel replace rather than a lookahead so the DuckDB twin
    (RE2: no lookahead) stays textually parallel; (3) the stripped nested
    headers leave their closing parens dangling at the END of the member
    that preceded them — trim each part by its paren-count excess."""
    body = F.regexp_extract(wkt, r"^\s*GEOMETRYCOLLECTION \((.*)\)\s*$", 1)
    flat = F.regexp_replace(body, r"GEOMETRYCOLLECTION \(", "")
    parts = F.split(F.regexp_replace(flat, r",\s*([A-Z])", "\x1f$1"), "\x1f")

    def trim(p: Column) -> Column:
        excess = (
            F.length(p) - F.length(F.regexp_replace(p, r"\)", ""))
        ) - (F.length(p) - F.length(F.regexp_replace(p, r"\(", "")))
        return p.substr(F.lit(1), F.length(p) - F.greatest(excess, F.lit(0)))

    return F.transform(parts, trim)


def wkt_point_x(wkt: Column) -> Column:
    """``POINT (x y)`` → x as double (NULL on non-point input; try_cast
    because ANSI mode hard-fails on the empty no-match extract)."""
    return F.regexp_extract(wkt, rf"POINT \({_NUM} {_NUM}\)", 1).try_cast("double")


def wkt_point_y(wkt: Column) -> Column:
    """``POINT (x y)`` → y as double (NULL on non-point input)."""
    return F.regexp_extract(wkt, rf"POINT \({_NUM} {_NUM}\)", 2).try_cast("double")


def wkt_geometry_type(wkt: Column) -> Column:
    """Leading WKT tag (``POINT`` / ``POLYGON`` / …) — reference
    ``geom_type`` accessor."""
    return F.upper(F.regexp_extract(wkt, r"^\s*([A-Za-z]+)", 1))


# --- GeoJSON (reference geometry-as-dict surface, feature/geometry.py) ------
# Same 6-dp + (-0.0 → +0.0) discipline as the WKT constructors so the Spark
# and DuckDB strings are byte-identical.


def point_geojson(x: Column, y: Column) -> Column:
    """(x, y) → ``{"type": "Point", "coordinates": [x, y]}``."""
    return F.format_string(
        '{"type": "Point", "coordinates": [%.6f, %.6f]}', _norm(x), _norm(y)
    )


def polygon_geojson(xs: Column, ys: Column) -> Column:
    """Coordinate arrays → single-ring GeoJSON Polygon, ring closed when
    the input is open (the create_polygon closed-ring contract)."""
    parts = F.zip_with(
        xs, ys, lambda a, b: F.format_string("[%.6f, %.6f]", _norm(a), _norm(b))
    )
    closed = F.element_at(parts, 1) == F.element_at(parts, -1)
    ring = F.when(closed, parts).otherwise(
        F.concat(parts, F.array(F.element_at(parts, 1)))
    )
    return F.concat(
        F.lit('{"type": "Polygon", "coordinates": [['),
        F.array_join(ring, ", "),
        F.lit("]]}"),
    )


def geojson_type(s: Column) -> Column:
    """GeoJSON ``type`` field (``Point`` / ``Polygon`` / …)."""
    return F.regexp_extract(s, r'"type":\s*"([A-Za-z]+)"', 1)


def geojson_point_x(s: Column) -> Column:
    """GeoJSON Point → x (NULL on non-point input). Separator-tolerant:
    wild files (and Spark's to_json) emit no space after the comma."""
    return F.regexp_extract(
        s, rf'"coordinates":\s*\[{_NUM},\s*{_NUM}\]', 1
    ).try_cast("double")


def geojson_point_y(s: Column) -> Column:
    """GeoJSON Point → y (NULL on non-point input)."""
    return F.regexp_extract(
        s, rf'"coordinates":\s*\[{_NUM},\s*{_NUM}\]', 2
    ).try_cast("double")


def geojson_ring_xs(s: Column) -> Column:
    """GeoJSON Polygon exterior ring → x array<double>."""
    body = F.regexp_extract(s, r"\[\[\[(.*?)\]\]", 1)
    return F.transform(
        F.split(body, r"\],\s*\["),
        lambda p: F.element_at(F.split(p, r",\s*"), 1).try_cast("double"),
    )
