"""Storage dtype table shared by the GeoTIFF / zarr / NetCDF containers.

The reference supports the full GDAL dtype table (byte, uint16, int16,
uint32, int32, float32, float64, int8, uint64, int64 …) — see
``/root/reference/src/pyramids/base/_utils.py:16-56`` (``DTYPE_NAMES`` /
``GDAL_DTYPE``) and the conversion tests under ``tests/dataset``. Complex
dtypes are out of scope (no closed-form analytics here use them; the
reference's own AVERAGE_MAGPHASE overview path is likewise excluded).

The ENGINE representation never changes: cell tables always carry
``value double`` (float64 covers every supported integer exactly up to
2^53, and uint64/int64 round-trips are validated against that bound at
write time). A dtype is a property of the CONTAINER: writers cast float64
cells to the storage dtype with loud guards (integer stores need a
representable nodata and in-range integral values); readers decode the
stored dtype and widen back to float64.
"""

from __future__ import annotations

import math

import numpy as np

#: name → (little-endian numpy dtype, bits, TIFF SampleFormat)
#: SampleFormat: 1 = unsigned int, 2 = signed int, 3 = IEEE float
TABLE: dict[str, tuple[str, int, int]] = {
    "uint8": ("u1", 8, 1),
    "int8": ("i1", 8, 2),
    "uint16": ("<u2", 16, 1),
    "int16": ("<i2", 16, 2),
    "uint32": ("<u4", 32, 1),
    "int32": ("<i4", 32, 2),
    "uint64": ("<u8", 64, 1),
    "int64": ("<i8", 64, 2),
    "float32": ("<f4", 32, 3),
    "float64": ("<f8", 64, 3),
}

#: reference spelling "byte" (GDAL GDT_Byte) accepted as an alias
ALIASES = {"byte": "uint8"}


def resolve(name: str) -> str:
    n = ALIASES.get(str(name).lower(), str(name).lower())
    if n not in TABLE:
        raise NotImplementedError(
            f"unsupported storage dtype {name!r} (supported: "
            f"{sorted(TABLE)} — complex dtypes out of scope)"
        )
    return n


def np_dtype(name: str) -> np.dtype:
    return np.dtype(TABLE[resolve(name)][0])


def is_float(name: str) -> bool:
    return resolve(name).startswith("float")


#: TIFF (BitsPerSample, SampleFormat) → dtype name (read side)
FROM_TIFF = {(bits, sf): n for n, (_, bits, sf) in TABLE.items()}

#: zarr v2 dtype strings (1-byte types are written with '|' per convention;
#: both '|' and '<' spellings are accepted on read)
TO_ZARR = {n: ("|" + t if len(t) == 2 else t) for n, (t, _, _) in TABLE.items()}
FROM_ZARR = {z: n for n, z in TO_ZARR.items()}
FROM_ZARR.update({"<" + t.lstrip("|<"): n for n, (t, _, _) in TABLE.items()})


def check_fill(name: str, nodata: "float | None") -> float:
    """The write-side fill value for a storage dtype: floats may use NaN
    (nodata None); integer stores need an explicit, exactly-representable
    nodata — silently wrapping a fill would corrupt every empty cell."""
    n = resolve(name)
    if is_float(n):
        return float("nan") if nodata is None else float(nodata)
    if nodata is None:
        raise ValueError(
            f"integer storage dtype {n!r} needs an explicit grid nodata "
            "(NaN fill is not representable)"
        )
    info = np.iinfo(np_dtype(n))
    f = float(nodata)
    if f != math.floor(f) or not (info.min <= f <= info.max):
        raise ValueError(
            f"nodata {nodata!r} is not exactly representable in {n!r} "
            f"[{info.min}, {info.max}]"
        )
    return f


def cast_block(block: np.ndarray, name: str) -> np.ndarray:
    """float64 block → storage dtype, loudly. Integer targets require
    integral in-range values (matching GDAL's round-to-nearest would hide
    caller bugs; the engine keeps values exact in float64, so a fractional
    value reaching an int store IS a bug)."""
    n = resolve(name)
    dt = np_dtype(n)
    if is_float(n):
        return block.astype(dt)
    info = np.iinfo(dt)
    # 64-bit integer stores are additionally capped at ±2^53: the engine's
    # float64 cell tables cannot have carried larger values exactly, so a
    # larger magnitude means precision was already lost upstream
    hi = min(info.max, 2**53) if info.bits == 64 else info.max
    lo = max(info.min, -(2**53)) if info.bits == 64 else info.min
    bad = ~((block == np.floor(block)) & (block >= lo) & (block <= hi))
    if bad.any():
        v = block[bad].ravel()[0]
        raise ValueError(
            f"value {v!r} not exactly representable in {n!r} "
            f"[{info.min}, {info.max}]"
        )
    return block.astype(dt)
