"""Grid geometry: closed-form cell encoding, centroids, polygons.

Replaces the reference's materialized ``sf::st_make_grid`` polygon grid
(/root/reference/R/main.R:118) with pure arithmetic so the grid is
never materialized — mandatory at 10^12 rows.  Two cell shapes:

* square  — side length = ``resolution`` (R/main.R:25-28)
* hexagon — ``resolution`` = distance between opposite edges
            (R/main.R:29-31); pointy-top axial coordinates.  (sf's
            exact hex offset convention is opaque; pixel identity is
            compared on centroids, SURVEY.md §1.1, so we fix our own
            deterministic convention and document it.)

Border tie-break parity with ``st_intersects`` + take-first
(R/main.R:132-136): a point exactly on a shared edge belongs to the
*lower-index* (left / below) cell, i.e. ``ix = ceil(t) - 1`` clamped to
0 at the bbox minimum, NOT ``floor(t)``.

Every formula here has an exact ANSI-SQL twin used by the DuckDB
oracles in __ray_entry__.py — keep operation ORDER identical on both
sides so IEEE doubles match bit-for-bit.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass

import numpy as np

SQRT3 = math.sqrt(3.0)

# --------------------------------------------------------------------------
# bbox derivation — SEraster pad rule (R/main.R:303-308, 346-351):
#   xmin = floor(min_x - res/2), xmax = ceil(max_x + res/2), same for y.
# --------------------------------------------------------------------------


def derive_bbox(
    min_x: float, max_x: float, min_y: float, max_y: float, resolution: float
) -> tuple[float, float, float, float]:
    """Padded bbox (xmin, ymin, xmax, ymax) per R/main.R:346-351."""
    h = resolution / 2.0
    return (
        math.floor(min_x - h),
        math.floor(min_y - h),
        math.ceil(max_x + h),
        math.ceil(max_y + h),
    )


@dataclass(frozen=True)
class GridSpec:
    """A shared pixel frame: origin + resolution + shape.

    ``origin`` is the bbox (xmin, ymin) — every dataset rasterized with
    the same GridSpec lands on the same pixel frame (the Ray analog of
    the reference's common-bbox list semantics, R/main.R:294-308).
    """

    x0: float
    y0: float
    resolution: float
    square: bool = True
    level: int = 0  # hierarchy level for packed ids (0 = this resolution)

    # -- square assignment --------------------------------------------------
    def assign_square(self, x: np.ndarray, y: np.ndarray):
        """(ix, iy) int64 cell indices with left/below tie-break.

        SQL twin:  CAST(greatest(ceiling((x - x0)/res) - 1, 0) AS BIGINT)
        """
        res = self.resolution
        tx = (x - self.x0) / res
        ty = (y - self.y0) / res
        ix = np.maximum(np.ceil(tx) - 1.0, 0.0).astype(np.int64)
        iy = np.maximum(np.ceil(ty) - 1.0, 0.0).astype(np.int64)
        return ix, iy

    def centroid_square(self, ix: np.ndarray, iy: np.ndarray):
        """Closed-form centroid (R/main.R:127-129 analog).

        SQL twin:  x0 + (ix + 0.5) * res
        """
        res = self.resolution
        cx = self.x0 + (ix + 0.5) * res
        cy = self.y0 + (iy + 0.5) * res
        return cx, cy

    # -- hexagon assignment -------------------------------------------------
    # Pointy-top hexes; resolution = distance across flats = sqrt(3)*R
    # where R is the circumradius.  Axial (q, r) with cube rounding.
    @property
    def hex_R(self) -> float:
        return self.resolution / SQRT3

    def _hex_fractional(self, x: np.ndarray, y: np.ndarray):
        R = self.hex_R
        xr = x - self.x0
        yr = y - self.y0
        # qf = (sqrt(3)/3 * xr - yr/3) / R ; rf = (2/3 * yr) / R — written
        # as single-multiply constants so the SQL twin is literal-identical.
        A = SQRT3 / (3.0 * R)
        C = 1.0 / (3.0 * R)
        D = 2.0 / (3.0 * R)
        qf = xr * A - yr * C
        rf = yr * D
        return qf, rf

    def assign_hex(self, x: np.ndarray, y: np.ndarray):
        """(q, r) int64 axial hex coordinates via cube rounding.

        Rounding uses floor(v + 0.5) (NOT banker's rounding) so the
        DuckDB twin is bit-identical.
        """
        qf, rf = self._hex_fractional(x, y)
        return hex_cube_round(qf, rf)

    def centroid_hex(self, q: np.ndarray, r: np.ndarray):
        """SQL twin: x0 + q*W + r*(W/2) ; y0 + r*H  with
        W = sqrt(3)*R (= resolution), H = 1.5*R."""
        R = self.hex_R
        W = SQRT3 * R
        H = 1.5 * R
        cx = self.x0 + q * W + r * (W / 2.0)
        cy = self.y0 + r * H
        return cx, cy

    # -- unified ------------------------------------------------------------
    def assign(self, x: np.ndarray, y: np.ndarray):
        return self.assign_square(x, y) if self.square else self.assign_hex(x, y)

    def centroid(self, i: np.ndarray, j: np.ndarray):
        return self.centroid_square(i, j) if self.square else self.centroid_hex(i, j)

    def polygon(self, i: int, j: int) -> np.ndarray:
        """Vertex ring (closed, CCW) of one cell as an (n,2) float array —
        the raster→vector direction (R/main.R:191-193 analog)."""
        if self.square:
            res = self.resolution
            x0 = self.x0 + i * res
            y0 = self.y0 + j * res
            return np.array(
                [
                    (x0, y0),
                    (x0 + res, y0),
                    (x0 + res, y0 + res),
                    (x0, y0 + res),
                    (x0, y0),
                ]
            )
        cx, cy = self.centroid_hex(np.asarray([i]), np.asarray([j]))
        cx, cy = float(cx[0]), float(cy[0])
        R = self.hex_R
        # pointy-top: vertices at 30°, 90°, ..., 330°, closed explicitly
        ang = np.deg2rad(30.0 + 60.0 * np.arange(6))
        ring = np.column_stack([cx + R * np.cos(ang), cy + R * np.sin(ang)])
        return np.vstack([ring, ring[:1]])

    def polygon_wkb(self, i: int, j: int) -> bytes:
        return wkb_polygon(self.polygon(i, j))


# --------------------------------------------------------------------------
# hex cube rounding — shared by GridSpec and clip-side helpers
# --------------------------------------------------------------------------


def hex_cube_round(qf: np.ndarray, rf: np.ndarray):
    """Standard cube-coordinate rounding, vectorized; floor(v+0.5) ties.

    Mirrors the SQL CASE cascade in __ray_entry__.py exactly.
    """
    cxv = qf
    czv = rf
    cyv = -qf - rf
    rx = np.floor(cxv + 0.5)
    ry = np.floor(cyv + 0.5)
    rz = np.floor(czv + 0.5)
    dx = np.abs(rx - cxv)
    dy = np.abs(ry - cyv)
    dz = np.abs(rz - czv)
    first = (dx > dy) & (dx > dz)
    third = (~first) & ~(dy > dz)
    q = np.where(first, -ry - rz, rx)
    r = np.where(third, -rx - ry, rz)
    return q.astype(np.int64), r.astype(np.int64)


# --------------------------------------------------------------------------
# hierarchical packed int64 cell ids (H3/S2-style: level + 2×29-bit index)
# --------------------------------------------------------------------------

_OFF = 1 << 28  # bias so signed hex axial coords pack into 29 unsigned bits
_MASK29 = (1 << 29) - 1


def pack_cell_id(level, ix, iy):
    """int64 id = level(5 bits) << 58 | (ix+OFF) << 29 | (iy+OFF).

    Works for both square (ix,iy ≥ 0) and hex (q,r possibly negative)
    indices; |index| < 2^28 — checked, so an ultra-fine global grid
    fails loudly instead of silently aliasing cell ids.
    Vectorized over numpy int64 arrays.
    """
    if np.any(np.abs(np.asarray(ix)) >= _OFF) or np.any(np.abs(np.asarray(iy)) >= _OFF):
        raise ValueError(
            "pack_cell_id: |index| >= 2^28 would alias packed ids — "
            "use a coarser resolution or a wider id scheme"
        )
    lv = np.int64(level)
    return (lv << np.int64(58)) | ((np.int64(0) + ix + _OFF) << np.int64(29)) | (iy + _OFF)


def unpack_cell_id(cell_id):
    cell_id = np.asarray(cell_id, dtype=np.int64)
    level = cell_id >> np.int64(58)
    ix = ((cell_id >> np.int64(29)) & _MASK29) - _OFF
    iy = (cell_id & _MASK29) - _OFF
    return level, ix, iy


def parent_cell(cell_id, levels_up: int = 1):
    """Quad-tree parent for square grids: each level doubles the cell
    side, so parent index = floor-div by 2 per level.  (Hex grids have
    no exact nesting — same as real H3 — so hex parents are approximate
    by centroid re-encoding; use ``GridSpec.assign`` at the coarser
    resolution for that.)"""
    level, ix, iy = unpack_cell_id(cell_id)
    return pack_cell_id(level + levels_up, ix >> levels_up, iy >> levels_up)


def children_cells(cell_id):
    """The 4 quad-tree children of a square cell, one level down."""
    level, ix, iy = unpack_cell_id(cell_id)
    level = np.asarray(level) - 1
    out = []
    for dx in (0, 1):
        for dy in (0, 1):
            out.append(pack_cell_id(level, (ix << 1) + dx, (iy << 1) + dy))
    return np.stack(out, axis=-1)


# --------------------------------------------------------------------------
# WKB (the only geometry wire format we emit; analog of sfc_POLYGON)
# --------------------------------------------------------------------------


def wkb_polygon(ring: np.ndarray) -> bytes:
    """Little-endian WKB POLYGON with one exterior ring (closed)."""
    n = len(ring)
    head = struct.pack("<BII", 1, 3, 1) + struct.pack("<I", n)
    body = np.ascontiguousarray(ring, dtype="<f8").tobytes()
    return head + body


def parse_wkb_polygon(wkb: bytes) -> np.ndarray:
    """Inverse of :func:`wkb_polygon` (exterior ring only)."""
    byte_order, geom_type, nrings = struct.unpack_from("<BII", wkb, 0)
    if byte_order != 1 or geom_type != 3 or nrings < 1:
        raise ValueError("only little-endian single-ring WKB POLYGON supported")
    (n,) = struct.unpack_from("<I", wkb, 9)
    ring = np.frombuffer(wkb, dtype="<f8", count=2 * n, offset=13)
    return ring.reshape(n, 2).copy()


# --------------------------------------------------------------------------
# polyfill: vector → raster (cells whose centroid falls inside a polygon)
# --------------------------------------------------------------------------


def polyfill_bbox(spec: GridSpec, xmin, ymin, xmax, ymax):
    """All (ix, iy) whose centroid lies in [xmin,xmax]×[ymin,ymax].

    SQL twin: generate_series over index ranges + centroid arithmetic.
    """
    if spec.square:
        res = spec.resolution
        i_lo = int(np.ceil((xmin - spec.x0) / res - 0.5))
        i_hi = int(np.floor((xmax - spec.x0) / res - 0.5))
        j_lo = int(np.ceil((ymin - spec.y0) / res - 0.5))
        j_hi = int(np.floor((ymax - spec.y0) / res - 0.5))
        ii, jj = np.meshgrid(
            np.arange(i_lo, i_hi + 1, dtype=np.int64),
            np.arange(j_lo, j_hi + 1, dtype=np.int64),
            indexing="ij",
        )
        return ii.ravel(), jj.ravel()
    # hex: over-scan candidate axial range, filter by centroid
    R = spec.hex_R
    r_lo = int(np.floor((ymin - spec.y0) / (1.5 * R))) - 1
    r_hi = int(np.ceil((ymax - spec.y0) / (1.5 * R))) + 1
    W = SQRT3 * R
    q_lo = int(np.floor((xmin - spec.x0) / W)) - abs(r_hi) - abs(r_lo) - 2
    q_hi = int(np.ceil((xmax - spec.x0) / W)) + abs(r_hi) + abs(r_lo) + 2
    qq, rr = np.meshgrid(
        np.arange(q_lo, q_hi + 1, dtype=np.int64),
        np.arange(r_lo, r_hi + 1, dtype=np.int64),
        indexing="ij",
    )
    qq, rr = qq.ravel(), rr.ravel()
    cx, cy = spec.centroid_hex(qq, rr)
    keep = (cx >= xmin) & (cx <= xmax) & (cy >= ymin) & (cy <= ymax)
    return qq[keep], rr[keep]


def polyfill_polygon(spec: GridSpec, ring: np.ndarray):
    """Cells whose centroid is inside the polygon ring (vector→raster)."""
    from rayraster.clip import points_in_ring

    xmin, ymin = ring.min(axis=0)
    xmax, ymax = ring.max(axis=0)
    ii, jj = polyfill_bbox(spec, xmin, ymin, xmax, ymax)
    cx, cy = spec.centroid(ii, jj)
    keep = points_in_ring(cx, cy, ring)
    return ii[keep], jj[keep]


def segment_cells(
    spec: GridSpec,
    x0: np.ndarray,
    y0: np.ndarray,
    x1: np.ndarray,
    y1: np.ndarray,
):
    """Supercover line rasterization (vector→raster for segments — the
    GDAL ``gdal_rasterize``-on-linestrings direction; reference analogy:
    the ``st_intersects`` spatial predicate of R/main.R:132 applied to a
    segment instead of a point): every SQUARE grid cell whose closed
    box the segment touches.

    Exact separating-axis formulation (segment × axis-aligned box needs
    only the box axes + the line normal): candidate cells are the
    per-axis ``floor`` index ranges of the segment's bbox (that IS the
    box-axes test), then a cell survives iff its 4 corners do not lie
    strictly on one side of the carrying line —
    ``min(c) * max(c) <= 0`` over the four corner cross products
    ``c = (x1−x0)·(cy−y0) − (y1−y0)·(cx−x0)``.  Every float expression
    is a fixed-order IEEE formula the SQL twin
    (:func:`segment_cells_sql`) reproduces verbatim, so results are
    bit-identical.  Zero-length segments degrade to their bbox cell.

    Returns ``(row_idx, ix, iy)``: the originating segment row index
    plus visited cell indices (NOT clamped at 0 — a segment may stray
    outside the frame; callers clip if the frame is authoritative).
    Map-only at any scale (each segment expands independently; keep
    segments short — split long polylines upstream — so the bbox
    candidate set stays O(cells visited)).
    """
    if not spec.square:
        raise ValueError("segment_cells supports square grids only")
    res = spec.resolution
    x0 = np.asarray(x0, dtype=np.float64)
    y0 = np.asarray(y0, dtype=np.float64)
    x1 = np.asarray(x1, dtype=np.float64)
    y1 = np.asarray(y1, dtype=np.float64)
    i0 = np.floor((np.minimum(x0, x1) - spec.x0) / res).astype(np.int64)
    i1 = np.floor((np.maximum(x0, x1) - spec.x0) / res).astype(np.int64)
    j0 = np.floor((np.minimum(y0, y1) - spec.y0) / res).astype(np.int64)
    j1 = np.floor((np.maximum(y0, y1) - spec.y0) / res).astype(np.int64)
    nx = i1 - i0 + 1
    ny = j1 - j0 + 1
    m = nx * ny
    tot = int(m.sum())
    if not tot:
        z = np.empty(0, dtype=np.int64)
        return z, z, z
    idx = np.repeat(np.arange(len(m)), m)
    c = np.arange(tot, dtype=np.int64) - np.repeat(np.cumsum(m) - m, m)
    ix = i0[idx] + c // ny[idx]
    iy = j0[idx] + c % ny[idx]
    dx = x1 - x0
    dy = y1 - y0
    cx0 = spec.x0 + ix * res
    cy0 = spec.y0 + iy * res
    cx1 = spec.x0 + (ix + 1) * res
    cy1 = spec.y0 + (iy + 1) * res
    xa, ya, dxa, dya = x0[idx], y0[idx], dx[idx], dy[idx]
    c00 = dxa * (cy0 - ya) - dya * (cx0 - xa)
    c10 = dxa * (cy0 - ya) - dya * (cx1 - xa)
    c01 = dxa * (cy1 - ya) - dya * (cx0 - xa)
    c11 = dxa * (cy1 - ya) - dya * (cx1 - xa)
    lo = np.minimum(np.minimum(c00, c10), np.minimum(c01, c11))
    hi = np.maximum(np.maximum(c00, c10), np.maximum(c01, c11))
    keep = lo * hi <= 0.0
    return idx[keep], ix[keep], iy[keep]


def segment_cells_sql(
    seg_rel: str,
    res: float,
    gx0: str,
    gy0: str,
    x0: str = "x0",
    y0: str = "y0",
    x1: str = "x1",
    y1: str = "y1",
    extra_cols: str = "",
) -> str:
    """DuckDB twin of :func:`segment_cells` over ``seg_rel`` (a relation
    exposing the segment endpoint columns): two LATERAL
    ``generate_series`` for the bbox candidate ranges + the identical
    corner-cross-product keep test.  ``gx0``/``gy0`` are SQL expressions
    for the grid origin (columns of ``seg_rel`` or literals);
    ``extra_cols`` (e.g. ``"s.seg_id, "``) is spliced into the SELECT.
    Emits ``(…extra, ix, iy, x0, y0, x1, y1)``."""
    r = f"{res!r}"

    def cross(cx: str, cy: str) -> str:
        return (f"((s.{x1} - s.{x0}) * (({cy}) - s.{y0})"
                f" - (s.{y1} - s.{y0}) * (({cx}) - s.{x0}))")

    cx0 = f"({gx0}) + gi.ix * {r}"
    cy0 = f"({gy0}) + gj.iy * {r}"
    cx1 = f"({gx0}) + (gi.ix + 1) * {r}"
    cy1 = f"({gy0}) + (gj.iy + 1) * {r}"
    c00, c10 = cross(cx0, cy0), cross(cx1, cy0)
    c01, c11 = cross(cx0, cy1), cross(cx1, cy1)
    return f"""SELECT {extra_cols}gi.ix, gj.iy,
       s.{x0} AS x0, s.{y0} AS y0, s.{x1} AS x1, s.{y1} AS y1
FROM {seg_rel} s,
LATERAL (SELECT UNNEST(generate_series(
  CAST(floor((least(s.{x0}, s.{x1}) - ({gx0})) / {r}) AS BIGINT),
  CAST(floor((greatest(s.{x0}, s.{x1}) - ({gx0})) / {r}) AS BIGINT))) AS ix) gi,
LATERAL (SELECT UNNEST(generate_series(
  CAST(floor((least(s.{y0}, s.{y1}) - ({gy0})) / {r}) AS BIGINT),
  CAST(floor((greatest(s.{y0}, s.{y1}) - ({gy0})) / {r}) AS BIGINT))) AS iy) gj
WHERE least(least({c00}, {c10}), least({c01}, {c11}))
      * greatest(greatest({c00}, {c10}), greatest({c01}, {c11})) <= 0.0"""


def hilbert_key(ix, iy, order: int = 10) -> "np.ndarray":
    """Hilbert space-filling-curve index of grid cells: (ix, iy) in
    [0, 2^order)² → d in [0, 4^order) along the curve — the
    locality-preserving alternative to the Morton/quad-tree packing of
    :func:`pack_cell` (every curve step moves exactly one rook hop, so
    a contiguous d-range is a compact tile: the partitioning key that
    keeps spatial neighbors in the same shard at 10^12 rows).

    Vectorized level loop of the classic bit-twiddling xy→d walk
    (Wikipedia/Warren, public domain): per level s, quadrant bits
    (rx, ry) contribute s²·((3·rx) XOR ry) and the frame rotates.
    Raises when a coordinate falls outside [0, 2^order) — silently
    wrapping would alias far-apart tiles."""
    ix = np.asarray(ix, dtype=np.int64)
    iy = np.asarray(iy, dtype=np.int64)
    if not (1 <= order <= 31):
        raise ValueError(f"order must be in [1, 31], got {order}")
    n = np.int64(1) << order
    if len(ix) and (
        ix.min(initial=0) < 0 or iy.min(initial=0) < 0
        or ix.max(initial=0) >= n or iy.max(initial=0) >= n
    ):
        raise ValueError(f"hilbert_key: coordinates must be in [0, 2^{order})")
    x = ix.copy()
    y = iy.copy()
    d = np.zeros_like(x)
    s = n >> 1
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate the sub-quadrant frame
        swap = ry == 0
        flip = swap & (rx == 1)
        xf = np.where(flip, s - 1 - x, x)
        yf = np.where(flip, s - 1 - y, y)
        x = np.where(swap, yf, xf)
        y = np.where(swap, xf, yf)
        s >>= 1
    return d


def hilbert_xy(d, order: int = 10) -> "tuple[np.ndarray, np.ndarray]":
    """Inverse of :func:`hilbert_key`: curve index d → (ix, iy)."""
    d = np.asarray(d, dtype=np.int64)
    if not (1 <= order <= 31):
        raise ValueError(f"order must be in [1, 31], got {order}")
    n = np.int64(1) << order
    if len(d) and (d.min(initial=0) < 0 or d.max(initial=0) >= n * n):
        raise ValueError(f"hilbert_xy: d must be in [0, 4^{order})")
    t = d.copy()
    x = np.zeros_like(d)
    y = np.zeros_like(d)
    s = np.int64(1)
    while s < n:
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        # rotate back
        flip = (ry == 0) & (rx == 1)
        xf = np.where(flip, s - 1 - x, x)
        yf = np.where(flip, s - 1 - y, y)
        xs = np.where(ry == 0, yf, xf)
        ys = np.where(ry == 0, xf, yf)
        x = xs + s * rx
        y = ys + s * ry
        t //= 4
        s <<= 1
    return x, y


def hilbert_sql_ctes(
    src_cte: str,
    carry_cols: "Sequence[str]",
    x_col: str,
    y_col: str,
    order: int = 10,
    prefix: str = "hb",
) -> "tuple[str, str]":
    """DuckDB twin of :func:`hilbert_key`: one generated CTE per bit
    level applying the same quadrant-contribution + frame-rotation
    step with CASE/xor arithmetic.  Returns ``(ctes, final_cte)``;
    the final CTE carries ``carry_cols`` + ``hkey``."""
    carry = ", ".join(carry_cols)
    ctes = [
        f"{prefix}0 AS (SELECT {carry}, CAST({x_col} AS BIGINT) AS hx, "
        f"CAST({y_col} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd "
        f"FROM {src_cte})"
    ]
    lev = 0
    s = 1 << (order - 1)
    while s > 0:
        p, q = f"{prefix}{lev}", f"{prefix}{lev + 1}"
        ctes.append(f"""{q} AS (
  SELECT {carry},
    CASE WHEN (hy & {s}) = 0
         THEN (CASE WHEN (hx & {s}) > 0 THEN {s} - 1 - hy ELSE hy END)
         ELSE hx END AS hx,
    CASE WHEN (hy & {s}) = 0
         THEN (CASE WHEN (hx & {s}) > 0 THEN {s} - 1 - hx ELSE hx END)
         ELSE hy END AS hy,
    hd + {s}::BIGINT * {s}::BIGINT *
      xor(3 * (CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END),
          (CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)) AS hd
  FROM {p})""")
        lev += 1
        s >>= 1
    final = f"{prefix}k"
    ctes.append(
        f"{final} AS (SELECT {carry}, hd AS hkey FROM {prefix}{lev})"
    )
    return ",\n".join(ctes), final
