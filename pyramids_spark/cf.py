"""CF-convention metadata machinery, Spark-first.

Reference surface: ``/root/reference/src/pyramids/netcdf/cf.py`` —
``detect_axis`` (:544), ``classify_variables`` (:607),
``apply_valid_range_mask`` (:772), ``decode_flags`` (:810) and the
scale/offset + ``units: <step> since <epoch>`` time decoding the NetCDF
reader applies per variable.

Spark model: attributes are DATA, not object state — a tall
``attrs(variable, attr, value)`` string table (one row per attribute, the
natural long form of NetCDF per-variable attribute dicts). Axis detection
and role classification are then joins + CASE column expressions over that
table: distributed, SQL-twinnable, and O(#variables) — metadata frames are
driver-small by nature but the same expressions run unchanged inside a
10^6-variable catalog scan.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# CF-standard lookup tables (cf.py:514-541) — these are convention
# constants, not code: the same strings appear in the CF specification.
_STDNAME_TO_AXIS = {
    "latitude": "Y",
    "longitude": "X",
    "time": "T",
    "projection_x_coordinate": "X",
    "projection_y_coordinate": "Y",
    "grid_latitude": "Y",
    "grid_longitude": "X",
    "height": "Z",
    "altitude": "Z",
    "depth": "Z",
    "air_pressure": "Z",
}

_NAME_PATTERNS = {
    "lat": "Y",
    "latitude": "Y",
    "y": "Y",
    "lon": "X",
    "longitude": "X",
    "x": "X",
    "time": "T",
    "lev": "Z",
    "level": "Z",
    "depth": "Z",
    "height": "Z",
    "z": "Z",
}

_DEG_NORTH = ("degrees_north", "degree_north", "degree_n", "degrees_n")
_DEG_EAST = ("degrees_east", "degree_east", "degree_e", "degrees_e")


def _map_when(col: Column, mapping: dict[str, str]) -> Column:
    """dict lookup as a CASE chain; NULL when no key matches."""
    expr = None
    for k, v in mapping.items():
        cond = F.lower(col) == k
        expr = F.when(cond, v) if expr is None else expr.when(cond, v)
    return expr


def detect_axis_col(
    name: Column, axis: Column, standard_name: Column, units: Column
) -> Column:
    """CF axis type (X/Y/Z/T) with the reference's priority order
    (cf.py:544-599): explicit ``axis`` attr → standard_name table → unit
    string (degrees_north/east, '<x> since <epoch>' → T) → name pattern.
    Each tier yields NULL on no-match, so ``coalesce`` IS the priority."""
    unit = F.lower(F.trim(units))
    return F.coalesce(
        F.when(F.upper(axis).isin("X", "Y", "Z", "T"), F.upper(axis)),
        _map_when(standard_name, _STDNAME_TO_AXIS),
        F.when(unit.isin(*_DEG_NORTH), "Y")
        .when(unit.isin(*_DEG_EAST), "X")
        .when(unit.contains("since"), "T"),
        _map_when(F.trim(name), _NAME_PATTERNS),
    )


def pivot_attrs(attrs: DataFrame, names: list[str]) -> DataFrame:
    """Tall attrs(variable, attr, value) → one row per variable with one
    column per requested attribute (max aggregation — attrs are unique per
    (variable, attr) by NetCDF contract)."""
    return attrs.groupBy("variable").agg(*[
        F.max(F.when(F.col("attr") == n, F.col("value"))).alias(n) for n in names
    ])


def classify_variables(attrs: DataFrame, dims: DataFrame) -> DataFrame:
    """→ (variable, cf_role) with the reference's precedence
    (cf.py:607-695): grid_mapping > bounds > cell_measure > ancillary >
    mesh_topology > connectivity > coordinate (name is a dimension) >
    auxiliary_coordinate > data.

    ``attrs``: tall (variable, attr, value); ``dims``: (name). The
    referenced-by sets (bounds targets, cell-measure / ancillary /
    coordinate tokens) are built by exploding the referencing attribute
    values — joins, no driver sets."""
    a = attrs

    def _tokens(attr_name: str, strip_colon: bool, drop: tuple = ()) -> DataFrame:
        v = F.col("value")
        if strip_colon:
            v = F.regexp_replace(v, ":", " ")
        t = (
            a.where(F.col("attr") == attr_name)
            .select(F.explode(F.split(v, r"\s+")).alias("ref"))
            .where(F.col("ref") != "")
        )
        if drop:
            t = t.where(~F.col("ref").isin(*drop))
        return t.distinct()

    # bounds references are whole attribute values, NOT tokenized (cf.py:631)
    bounds = (
        a.where(F.col("attr") == "bounds")
        .select(F.col("value").alias("ref")).distinct()
    )
    cellm = _tokens("cell_measures", strip_colon=True, drop=("area", "volume"))
    anc = _tokens("ancillary_variables", strip_colon=False)
    aux = _tokens("coordinates", strip_colon=False)

    wide = pivot_attrs(
        a, ["grid_mapping_name", "cf_role", "topology_dimension", "node_coordinates"]
    )
    flag = lambda df, name: df.select(  # noqa: E731
        F.col("ref").alias("variable"), F.lit(1).alias(name)
    )
    j = (
        a.select("variable").distinct()
        .join(wide, "variable", "left")
        .join(flag(bounds, "_bnd"), "variable", "left")
        .join(flag(cellm, "_cm"), "variable", "left")
        .join(flag(anc, "_anc"), "variable", "left")
        .join(flag(aux, "_aux"), "variable", "left")
        .join(
            dims.select(F.col("name").alias("variable"), F.lit(1).alias("_dim")),
            "variable", "left",
        )
    )
    mesh_topo = (F.col("cf_role") == "mesh_topology") | (
        F.col("topology_dimension").isNotNull()
        & F.col("node_coordinates").isNotNull()
    )
    role = (
        F.when(F.col("grid_mapping_name").isNotNull(), "grid_mapping")
        .when(F.col("_bnd").isNotNull(), "bounds")
        .when(F.col("_cm").isNotNull(), "cell_measure")
        .when(F.col("_anc").isNotNull(), "ancillary")
        .when(mesh_topo, "mesh_topology")
        .when(F.col("cf_role").contains("connectivity"), "connectivity")
        .when(F.col("_dim").isNotNull(), "coordinate")
        .when(F.col("_aux").isNotNull(), "auxiliary_coordinate")
        .otherwise("data")
    )
    return j.select("variable", role.alias("cf_role_out")).withColumnRenamed(
        "cf_role_out", "cf_role"
    )


def apply_valid_range(
    value: Column,
    valid_min: float | None = None,
    valid_max: float | None = None,
    valid_range: tuple | list | None = None,
) -> Column:
    """CF valid-range mask (cf.py:772-802); out-of-range → NULL (the
    engine's nodata, ≙ the reference's NaN fill)."""
    if valid_range is not None:
        valid_min, valid_max = valid_range[0], valid_range[1]
    cond = F.lit(False)
    if valid_min is not None:
        cond = cond | (value < F.lit(valid_min))
    if valid_max is not None:
        cond = cond | (value > F.lit(valid_max))
    return F.when(cond, F.lit(None).cast("double")).otherwise(value)


def decode_flags_col(
    value: Column,
    flag_values: list | None = None,
    flag_masks: list | None = None,
    flag_meanings: list[str] | None = None,
) -> Column:
    """CF flag decode (cf.py:810-866) as array algebra → array<string>;
    ``["unknown"]`` when nothing matches. Three CF modes: values-only
    (mutually exclusive), masks-only (bit field), masks+values (combined)."""
    unknown = F.array(F.lit("unknown"))
    if flag_meanings is None:
        return unknown
    n = len(flag_meanings)
    if flag_masks is not None and flag_values is not None:
        conds = [
            (value.bitwiseAND(F.lit(int(flag_masks[i]))) == F.lit(int(flag_values[i])))
            for i in range(n)
            if i < len(flag_masks) and i < len(flag_values)
        ]
    elif flag_masks is not None:
        conds = [
            (value.bitwiseAND(F.lit(int(flag_masks[i]))) != 0)
            for i in range(n)
            if i < len(flag_masks)
        ]
    elif flag_values is not None:
        expr = None
        for i, fv in enumerate(flag_values):
            if i < n:
                b = F.array(F.lit(flag_meanings[i]))
                expr = (
                    F.when(value == fv, b) if expr is None else expr.when(value == fv, b)
                )
        return expr.otherwise(unknown) if expr is not None else unknown
    else:
        return unknown
    arr = F.filter(
        F.array(*[F.when(c, F.lit(flag_meanings[i])) for i, c in enumerate(conds)]),
        lambda x: x.isNotNull(),
    )
    return F.when(F.size(arr) > 0, arr).otherwise(unknown)


_UNIT_SECONDS = {"seconds": 1, "minutes": 60, "hours": 3600, "days": 86400}


def decode_time_col(t: Column, units: str) -> Column:
    """CF time coordinate: ``'<step>s since <epoch>'`` + numeric t →
    timestamp (the label-based time axis the reference's NetCDF reader
    builds, ``netcdf/dimensions.py`` time handling)."""
    m = re.match(r"\s*(seconds|minutes|hours|days)\s+since\s+(.+?)\s*$",
                 units.lower())
    if not m:
        raise ValueError(f"unsupported CF time units: {units!r}")
    mult = _UNIT_SECONDS[m.group(1)]
    base = F.to_timestamp(F.lit(m.group(2)))
    return F.timestamp_add("SECOND", (t * mult).cast("long"), base)


def decode_cf_value(value: Column, attrs: dict) -> Column:
    """Per-variable CF value pipeline: mask ``_FillValue`` → scale/offset
    (``value·scale_factor + add_offset``) → valid range. The composition
    the reference reader applies when materializing a variable."""
    out = value
    fv = attrs.get("_FillValue")
    if fv is not None:
        out = F.when(out == F.lit(float(fv)), F.lit(None).cast("double")).otherwise(out)
    scale = attrs.get("scale_factor")
    off = attrs.get("add_offset")
    if scale is not None or off is not None:
        out = out * F.lit(float(scale if scale is not None else 1.0)) + F.lit(
            float(off if off is not None else 0.0)
        )
    return apply_valid_range(
        out,
        valid_min=attrs.get("valid_min"),
        valid_max=attrs.get("valid_max"),
        valid_range=attrs.get("valid_range"),
    )
