"""Deterministic synthetic geocoding — observation id → (x, y).

The reference's observations carry real spatial coordinates
(spatialCoords, /root/reference/R/main.R:16-18).  The graft table is
web pages, so coordinates are *derived*: a deterministic synthetic
geocode of the row id / url (BASELINE.json north_star).  Two variants:

* :func:`geocode_id` — pure modular arithmetic on an int64 id.  Has an
  exact ANSI-SQL twin (see ``GEOCODE_SQL``) so DuckDB oracles reproduce
  coordinates bit-for-bit.  Used for the correctness-gate queries over
  the driver's ``documents`` table.

* :func:`geocode_url` — 64-bit FNV-1a hash of the url string, with a
  configurable fraction of rows redirected into a few small hotspot
  clusters to exercise skew-aware aggregation (FIXTURES.md F1).  Used
  for the synthetic pages table (synth.py) and scale benches; not
  SQL-reproducible (string hashing), so those queries are rows-only.

All ops are int64-exact; float ops are ordered identically to the SQL
twins so IEEE doubles match bit-for-bit.
"""

from __future__ import annotations

import numpy as np

# World-ish domain used by both geocodes (a fixed global frame means the
# 100-TB path never needs a min/max pass over the input).
XMIN, XMAX = -180.0, 180.0
YMIN, YMAX = -90.0, 90.0

_PX, _MX = 2654435761, 1000003  # x: Knuth multiplicative hash, prime modulus
_PY, _QY, _MY = 97003, 7919, 1000033


def geocode_id(ids: np.ndarray):
    """(x, y) doubles from an int64 id column.

    SQL twin (keep operation order identical):
      x = -180.0 + (((id * 2654435761) % 1000003) / 1000003.0) * 360.0
      y =  -90.0 + (((id * 97003 + 7919) % 1000033) / 1000033.0) * 180.0

    EXACT-TWIN DOMAIN: the simple twin above matches bit-for-bit only
    while ``id * 2654435761`` fits int64, i.e. ``id < 2^63/2654435761
    ≈ 3.47e9`` (all driver test scales are far below).  Beyond that
    numpy wraps int64 (deterministically — the engine itself stays
    consistent at any scale) while DuckDB BIGINT multiplication
    errors; an id-scale oracle there must reproduce the wrap
    explicitly: ``s = ((id::HUGEINT * 2654435761 + 2^63) %% 2^64)
    - 2^63`` then ``((s %% 1000003) + 1000003) %% 1000003`` (numpy's
    ``%%`` is non-negative; DuckDB's is truncated — hence the double
    mod)."""
    ids = np.asarray(ids, dtype=np.int64)
    ux = (ids * np.int64(_PX)) % np.int64(_MX)
    uy = (ids * np.int64(_PY) + np.int64(_QY)) % np.int64(_MY)
    x = -180.0 + (ux / float(_MX)) * 360.0
    y = -90.0 + (uy / float(_MY)) * 180.0
    return x, y


GEOCODE_SQL_X = "(-180.0 + (((({id}) * 2654435761) % 1000003) / 1000003.0) * 360.0)"
GEOCODE_SQL_Y = "(-90.0 + (((({id}) * 97003 + 7919) % 1000033) / 1000033.0) * 180.0)"


def geocode_sql(id_expr: str) -> tuple[str, str]:
    """The SQL twins of :func:`geocode_id` for a given id expression."""
    return GEOCODE_SQL_X.format(id=id_expr), GEOCODE_SQL_Y.format(id=id_expr)


# --------------------------------------------------------------------------
# url hashing geocode with injected hotspots (skew exercise)
# --------------------------------------------------------------------------

_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)

# Hotspot cluster centers (deterministic, arbitrary): dense "cities".
HOTSPOTS = np.array(
    [(-73.99, 40.73), (2.35, 48.86), (139.69, 35.68), (-0.13, 51.51)]
)
HOTSPOT_FRACTION = 0.25  # of rows land in a hotspot
HOTSPOT_SIGMA = 0.05  # cluster radius in degrees


def _fnv_hash_padded(mat: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """FNV-1a over the rows of a zero-padded (n, width) uint8 matrix.

    Rows are grouped by byte length and each group is hashed with ONE
    vectorized pass per byte *position* (≤ url length iterations of
    numpy ops), not per row — this is the hot path of the url geocode
    at bench scale."""
    out = np.empty(len(lengths), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for ln in np.unique(lengths):
            sel = lengths == ln
            h = np.full(sel.sum(), _FNV_OFFSET, dtype=np.uint64)
            sub = mat[sel]
            for j in range(ln):
                h = (h ^ sub[:, j].astype(np.uint64)) * _FNV_PRIME
            out[sel] = h
    return out


def fnv1a64(strings) -> np.ndarray:
    """Vectorized 64-bit FNV-1a over a sequence of strings.

    Accepts a Python sequence OR a pyarrow string/binary array — Arrow
    input takes the zero-copy buffer path (:func:`fnv1a64_arrow`, ~6×
    faster than materializing Python strings at 1M urls).
    """
    try:
        import pyarrow as pa

        if isinstance(strings, (pa.Array, pa.ChunkedArray)):
            return fnv1a64_arrow(strings)
    except ImportError:  # pragma: no cover - pyarrow is a hard dep in practice
        pass
    n = len(strings)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    # numpy 'S' storage drops trailing NUL bytes (b"a\x00" and b"a"
    # store identically), so any NUL-bearing input must take the exact
    # Arrow buffer path — one C-speed containment pass decides
    if any("\x00" in s for s in strings):
        import pyarrow as pa

        return fnv1a64_arrow(pa.array(list(strings), type=pa.string()))
    # numpy 'S' dtype gives a zero-padded fixed-width byte matrix in C
    try:
        arr = np.asarray(strings, dtype="S")
    except UnicodeEncodeError:  # rare non-ASCII url: slow per-row path
        with np.errstate(over="ignore"):
            for k, s in enumerate(strings):
                h = _FNV_OFFSET
                for b in s.encode("utf-8"):
                    h = (h ^ np.uint64(b)) * _FNV_PRIME
                out[k] = h
        return out
    width = arr.dtype.itemsize
    mat = arr.view(np.uint8).reshape(n, width)
    lengths = width - (mat[:, ::-1] != 0).argmax(axis=1)
    lengths[mat[:, -1] != 0] = width
    lengths[~(mat != 0).any(axis=1)] = 0
    return _fnv_hash_padded(mat, lengths)


def fnv1a64_arrow(col) -> np.ndarray:
    """fnv1a64 over an Arrow string/binary column WITHOUT materializing
    Python strings: the padded byte matrix is built straight from the
    Arrow offsets/values buffers with one vectorized flat scatter
    (measured 6.4× faster than the ``to_pylist`` route on 1M urls).

    Bit-identical to ``fnv1a64(col.to_pylist())`` for non-null rows;
    NULL rows hash like the string ``"None"`` — the same value the
    legacy ``[str(v) for v in ...]`` call sites produced — so swapping
    a call site never changes partition assignments or sketch bits.

    NOTE: utf-8 strings with embedded NUL bytes hash those bytes here
    (exact); :func:`fnv1a64` detects NUL-bearing sequence input and
    routes it through this path, so both entry points agree on every
    string.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not pa.types.is_large_binary(col.type):
        if (
            pa.types.is_string(col.type)
            or pa.types.is_large_string(col.type)
            or pa.types.is_binary(col.type)
        ):
            col = col.cast(pa.large_binary())
        else:
            raise TypeError(f"fnv1a64_arrow needs a string/binary column, got {col.type}")
    if col.null_count:
        col = pc.fill_null(col, b"None")
    n = len(col)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    bufs = col.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int64)[col.offset : col.offset + n + 1]
    lengths = np.diff(offs)
    width = int(lengths.max())
    if width == 0:  # all-empty column: every row hashes to the offset basis
        out[:] = _FNV_OFFSET
        return out
    data = np.frombuffer(bufs[2], dtype=np.uint8)[offs[0] : offs[-1]]
    flat = np.zeros(n * width, dtype=np.uint8)
    # flat destination per source byte: row*width + within-row position
    dest = (
        np.arange(len(data), dtype=np.int64)
        - np.repeat(offs[:-1] - offs[0], lengths)
        + np.repeat(np.arange(n, dtype=np.int64) * width, lengths)
    )
    flat[dest] = data
    return _fnv_hash_padded(flat.reshape(n, width), lengths)


def geocode_hash(h: np.ndarray):
    """(x, y) from precomputed uint64 hashes, with hotspot injection.

    Rows whose hash falls in the lowest HOTSPOT_FRACTION of the hash
    space are pulled into one of the HOTSPOTS with a small deterministic
    offset — this is what makes some tiles "hot" so skew handling is
    actually exercised (SURVEY.md §4 salting row).
    """
    h = np.asarray(h, dtype=np.uint64)
    u1 = (h & np.uint64(0xFFFFFFFF)).astype(np.float64) / 4294967296.0
    u2 = (h >> np.uint64(32)).astype(np.float64) / 4294967296.0
    x = XMIN + u1 * (XMAX - XMIN)
    y = YMIN + u2 * (YMAX - YMIN)
    hot = u1 < HOTSPOT_FRACTION
    if hot.any():
        idx = (h[hot] % np.uint64(len(HOTSPOTS))).astype(np.int64)
        cx = HOTSPOTS[idx, 0]
        cy = HOTSPOTS[idx, 1]
        # deterministic jitter.  KNOWN QUIRK, kept for golden/BASELINE
        # continuity: j1 reads bits 16-31 of the same low word whose
        # `u1 < HOTSPOT_FRACTION` cut selected hotness, so hot rows'
        # x-offsets span only [-sigma, -sigma/2) (west-shifted quarter
        # range) while y-offsets span the full [-sigma, +sigma).  The
        # clusters stay deterministic, skewed and tile-concentrated —
        # which is all the skew machinery needs — but they are NOT
        # centered on the HOTSPOTS coordinates.
        j1 = ((h[hot] >> np.uint64(16)) & np.uint64(0xFFFF)).astype(np.float64) / 65536.0
        j2 = ((h[hot] >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.float64) / 65536.0
        x[hot] = cx + (j1 - 0.5) * 2.0 * HOTSPOT_SIGMA
        y[hot] = cy + (j2 - 0.5) * 2.0 * HOTSPOT_SIGMA
    return x, y


def geocode_url(urls) -> tuple[np.ndarray, np.ndarray]:
    return geocode_hash(fnv1a64(urls))
