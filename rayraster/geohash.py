"""Geohash cell index — the third spatial index next to the planar
grid (grid.py) and the spherical S2-style cells (s2cell.py).

Geohash is the classic base-32 Z-order (Morton) encoding of (lon, lat):
bit t of the code comes from longitude when t is even and latitude when
t is odd (MSB first), five bits per character.  It is the interleaved
counterpart of the reference's row/column pixel ids
(/root/reference/R/main.R:122-137 builds per-pixel ids from cut()
indices); a geohash PREFIX is a cell of the hierarchy, so prefix
truncation is the rollup and lexicographic sort is a locality-preserving
(Z-curve) layout — the standard trick for clustering spatial parquet.

Everything is vectorized int64 bit math over numpy arrays; encode
returns a pyarrow StringArray built directly from buffers (no per-row
Python).  The same arithmetic is emitted as an ANSI-SQL expression
(:func:`geohash_sql`) so DuckDB oracles reproduce codes byte-for-byte:
``ilon = floor((x+180)/360 * 2^nx)`` (clamped), bits extracted with
``// 2^k % 2`` — identical IEEE double ops on both sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_B32 = b"0123456789bcdefghjkmnpqrstuvwxyz"
_B32_LUT = np.frombuffer(_B32, dtype=np.uint8)
_B32_REV = np.full(256, -1, dtype=np.int64)
for _i, _c in enumerate(_B32):
    _B32_REV[_c] = _i


def _splits(precision: int) -> tuple[int, int]:
    nbits = 5 * precision
    return (nbits + 1) // 2, nbits // 2  # lon bits, lat bits


def geohash_encode(
    x: np.ndarray, y: np.ndarray, precision: int = 8
) -> pa.StringArray:
    """Vectorized geohash of lon/lat double arrays (standard cells:
    matches the published test vectors, e.g. (10.40744, 57.64911) →
    'u4pruydqqvj' at precision 11)."""
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in [1, 12]")
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    nx, ny = _splits(precision)
    sx, sy = np.int64(1) << nx, np.int64(1) << ny
    ilon = np.floor((x + 180.0) / 360.0 * float(sx)).astype(np.int64)
    ilat = np.floor((y + 90.0) / 180.0 * float(sy)).astype(np.int64)
    ilon = np.minimum(np.maximum(ilon, 0), sx - 1)
    ilat = np.minimum(np.maximum(ilat, 0), sy - 1)
    n = len(x)
    idx = np.zeros((n, precision), dtype=np.int64)
    for t in range(5 * precision):
        if t % 2 == 0:
            bit = (ilon >> np.int64(nx - 1 - t // 2)) & 1
        else:
            bit = (ilat >> np.int64(ny - 1 - (t - 1) // 2)) & 1
        c, b = divmod(t, 5)
        idx[:, c] |= bit << np.int64(4 - b)
    chars = _B32_LUT[idx]  # (n, precision) uint8
    offsets = pa.py_buffer((np.arange(n + 1, dtype=np.int32) * precision).tobytes())
    return pa.StringArray.from_buffers(n, offsets, pa.py_buffer(chars.tobytes()))


def _codes_matrix(arr: pa.ChunkedArray | pa.Array, precision: int) -> np.ndarray:
    """(n, precision) uint8 matrix of a fixed-length string column —
    through the Arrow values buffer, no per-row Python."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = arr.cast(pa.string())
    if arr.null_count:
        raise ValueError("geohash_decode: NULL codes")
    off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    if len(arr) and not np.all(np.diff(off) == precision):
        raise ValueError(f"geohash_decode: codes must all have length {precision}")
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return data[off[0] : off[0] + len(arr) * precision].reshape(len(arr), precision)


def geohash_decode(
    codes: pa.ChunkedArray | pa.Array, precision: int = 8
) -> tuple[np.ndarray, np.ndarray]:
    """Geohash string column → cell-center (lon, lat) doubles."""
    mat = _codes_matrix(codes, precision)
    idx = _B32_REV[mat]  # (n, precision)
    if (idx < 0).any():
        raise ValueError("geohash_decode: invalid base32 character")
    nx, ny = _splits(precision)
    n = mat.shape[0]
    ilon = np.zeros(n, dtype=np.int64)
    ilat = np.zeros(n, dtype=np.int64)
    for t in range(5 * precision):
        c, b = divmod(t, 5)
        bit = (idx[:, c] >> np.int64(4 - b)) & 1
        if t % 2 == 0:
            ilon |= bit << np.int64(nx - 1 - t // 2)
        else:
            ilat |= bit << np.int64(ny - 1 - (t - 1) // 2)
    lon = -180.0 + (ilon.astype(np.float64) + 0.5) / float(np.int64(1) << nx) * 360.0
    lat = -90.0 + (ilat.astype(np.float64) + 0.5) / float(np.int64(1) << ny) * 180.0
    return lon, lat


def geohash_sql(x_expr: str, y_expr: str, precision: int = 8) -> str:
    """The encode as ONE ANSI-SQL expression (DuckDB-compatible) over
    lon/lat expressions — generated bit-by-bit with the same operation
    order as :func:`geohash_encode`, so codes match byte-for-byte."""
    nx, ny = _splits(precision)
    sx, sy = 1 << nx, 1 << ny
    ilon = (
        f"least(greatest(CAST(floor(({x_expr} + 180.0) / 360.0 * {float(sx)!r}) "
        f"AS BIGINT), 0), {sx - 1})"
    )
    ilat = (
        f"least(greatest(CAST(floor(({y_expr} + 90.0) / 180.0 * {float(sy)!r}) "
        f"AS BIGINT), 0), {sy - 1})"
    )
    chars = []
    for c in range(precision):
        terms = []
        for b in range(5):
            t = 5 * c + b
            if t % 2 == 0:
                src, shift = "ghlon", nx - 1 - t // 2
            else:
                src, shift = "ghlat", ny - 1 - (t - 1) // 2
            terms.append(f"(({src} // {1 << shift}) % 2) * {1 << (4 - b)}")
        chars.append(f"substr('{_B32.decode()}', CAST({' + '.join(terms)} AS INTEGER) + 1, 1)")
    concat = " || ".join(chars)
    return (
        f"(SELECT {concat} FROM (SELECT {ilon} AS ghlon, {ilat} AS ghlat) ghbits)"
    )
