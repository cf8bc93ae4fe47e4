"""From-scratch S2-style spherical cell index, fully vectorized.

The north rule names "vectorized H3/S2 cell encoding in map_batches"
explicitly (BASELINE.json north_star); grid.py's frames are planar.
This module adds the spherical path: (lon, lat) → unit sphere → cube
face → quadratic ST → leaf (i, j) → Hilbert curve position → one packed
hierarchical int64 cell id, every step a numpy kernel over whole Arrow
columns (no per-row Python).  The conventions follow the published S2
geometry design (face order +x,+y,+z,-x,-y,-z; the quadratic ST
transform s = 0.5*sqrt(1+3u); Hilbert-ordered positions; id = face in
the top 3 bits, position bits, then a single sentinel 1 bit marking the
level) re-derived from the public algorithm descriptions — no S2 code
is used or required.

Reference parity: SEraster's rasterization is planar
(/root/reference/R/main.R:118 builds an sf grid in the data's own
coordinate frame); the S2 index is the beyond-parity spherical analog
the north rule asks for, and `s2_rollup` mirrors the reference's
multi-resolution story (vignette resolutions sweep) the same way
rasterize.rollup_quadtree does for squares.

Every float step has an exact ANSI-SQL twin (`s2_sql_cte`, used by the
r6 DuckDB oracle): sin/cos/radians, IEEE division, sqrt, and dyadic
scalings are bit-identical between numpy and DuckDB (verified on this
host — see tests/test_s2.py::test_trig_parity_with_duckdb), so keep
operation ORDER identical on both sides when editing.

Packing (level L, 0 ≤ L ≤ 30):

    id = signed_face * 2^61 + d * 2^(61-2L) + 2^(60-2L)

where d is the Hilbert position among the 4^L level-L cells of the
face and signed_face = face-8 for faces 4..5 so the arithmetic form
equals the two's-complement bit pattern ``face << 61`` (DuckDB raises
on << overflow; numpy wraps — the arithmetic form is the shared twin).
The sentinel bit (lowest set bit) encodes the level, so parent ids are
computed by bit ops alone (`s2_parent`) and children share their
parent's prefix — `floor(s*2^Lc) == floor(s*2^Lf) >> (Lf-Lc)` and the
Hilbert self-similarity `d_coarse == d_fine >> 2(Lf-Lc)` make a fine
encode + rollup bit-identical to a direct coarse encode (property
tests in tests/test_s2.py).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa

MAX_LEVEL = 30
_POW61 = 1 << 61


# --------------------------------------------------------------------------
# sphere → face/UV → ST → (i, j)
# --------------------------------------------------------------------------


def lonlat_to_xyz(lon: np.ndarray, lat: np.ndarray):
    """Unit-sphere coordinates.  SQL twin (same op order):
    px = cos(radians(lat)) * cos(radians(lon))
    py = cos(radians(lat)) * sin(radians(lon))
    pz = sin(radians(lat))
    """
    lon_r = np.radians(np.asarray(lon, dtype=np.float64))
    lat_r = np.radians(np.asarray(lat, dtype=np.float64))
    cl = np.cos(lat_r)
    return cl * np.cos(lon_r), cl * np.sin(lon_r), np.sin(lat_r)


def xyz_to_face(px: np.ndarray, py: np.ndarray, pz: np.ndarray) -> np.ndarray:
    """Cube face 0..5 (+x,+y,+z,-x,-y,-z).  Tie-break = the SQL CASE
    chain: x wins >=, then y wins >=, else z (ties are measure-zero for
    the geocodes but the rule must match the oracle exactly)."""
    ax, ay, az = np.abs(px), np.abs(py), np.abs(pz)
    axis = np.where(
        (ax >= ay) & (ax >= az), 0, np.where(ay >= az, 1, 2)
    ).astype(np.int64)
    comp = np.choose(axis, [px, py, pz])
    return np.where(comp > 0, axis, axis + 3)


def face_uv(face: np.ndarray, px: np.ndarray, py: np.ndarray, pz: np.ndarray):
    """(u, v) in [-1, 1] on the face plane (S2's XYZtoFaceUV table)."""
    u = np.empty_like(px)
    v = np.empty_like(px)
    for f, (ue, ve) in enumerate(
        [
            (lambda x, y, z: y / x, lambda x, y, z: z / x),  # +x
            (lambda x, y, z: -(x / y), lambda x, y, z: z / y),  # +y
            (lambda x, y, z: -(x / z), lambda x, y, z: -(y / z)),  # +z
            (lambda x, y, z: z / x, lambda x, y, z: y / x),  # -x
            (lambda x, y, z: z / y, lambda x, y, z: -(x / y)),  # -y
            (lambda x, y, z: -(y / z), lambda x, y, z: -(x / z)),  # -z
        ]
    ):
        m = face == f
        if m.any():
            u[m] = ue(px[m], py[m], pz[m])
            v[m] = ve(px[m], py[m], pz[m])
    return u, v


def uv_to_st(u: np.ndarray) -> np.ndarray:
    """Quadratic ST transform, SQL twin:
    CASE WHEN u >= 0 THEN 0.5 * sqrt(1.0 + 3.0 * u)
         ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * u) END
    """
    with np.errstate(invalid="ignore"):  # np.where evaluates both arms
        return np.where(
            u >= 0.0,
            0.5 * np.sqrt(1.0 + 3.0 * u),
            1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u),
        )


def st_to_ij(s: np.ndarray, level: int) -> np.ndarray:
    """Discretize s ∈ [0, 1] to [0, 2^level), clamped at both ends
    (s == 1.0 exactly maps to the last cell)."""
    n = np.int64(1) << level
    i = np.floor(s * float(n)).astype(np.int64)
    return np.clip(i, 0, n - 1)


# --------------------------------------------------------------------------
# Hilbert curve (classic xy2d / d2xy), vectorized across rows
# --------------------------------------------------------------------------


def hilbert_d(level: int, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Hilbert position d ∈ [0, 4^level) of cell (i, j); vectorized
    over rows, `level` iterations of whole-array ops.  Self-similar:
    hilbert_d(L-1, i>>1, j>>1) == hilbert_d(L, i, j) >> 2."""
    i = np.asarray(i, dtype=np.int64).copy()
    j = np.asarray(j, dtype=np.int64).copy()
    d = np.zeros_like(i)
    s = np.int64(1) << (level - 1) if level > 0 else np.int64(0)
    while s > 0:
        rx = ((i & s) > 0).astype(np.int64)
        ry = ((j & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        swap = ry == 0
        flip = swap & (rx == 1)
        i_f = np.where(flip, s - 1 - i, i)
        j_f = np.where(flip, s - 1 - j, j)
        i, j = np.where(swap, j_f, i_f), np.where(swap, i_f, j_f)
        s >>= 1
    return d


def hilbert_ij(level: int, d: np.ndarray):
    """Inverse of :func:`hilbert_d` (d2xy), vectorized."""
    d = np.asarray(d, dtype=np.int64)
    t = d.copy()
    i = np.zeros_like(d)
    j = np.zeros_like(d)
    s = np.int64(1)
    top = np.int64(1) << level if level > 0 else np.int64(0)
    while s < top:
        rx = (t // 2) & 1
        ry = (t ^ rx) & 1
        # rotate (inverse order of xy2d)
        flip = (ry == 0) & (rx == 1)
        i_f = np.where(flip, s - 1 - i, i)
        j_f = np.where(flip, s - 1 - j, j)
        swap = ry == 0
        i, j = np.where(swap, j_f, i_f), np.where(swap, i_f, j_f)
        i = i + s * rx
        j = j + s * ry
        t //= 4
        s <<= 1
    return i, j


# --------------------------------------------------------------------------
# id packing / hierarchy
# --------------------------------------------------------------------------


def s2_cell_id(face: np.ndarray, d: np.ndarray, level: int) -> np.ndarray:
    """Packed signed int64 id (see module docstring for the layout)."""
    shift = 61 - 2 * level
    uid = (
        (np.asarray(face).astype(np.uint64) << np.uint64(61))
        | (np.asarray(d).astype(np.uint64) << np.uint64(shift))
        | np.uint64(1 << (shift - 1))
    )
    return uid.view(np.int64)


def s2_level(ids: np.ndarray) -> np.ndarray:
    """Level from the sentinel (lowest set) bit."""
    ids = np.asarray(ids, dtype=np.int64)
    lsb = (ids & -ids).astype(np.float64)  # powers of two: exact in float64
    return ((60 - np.log2(lsb)) / 2).astype(np.int64)


def s2_face(ids: np.ndarray) -> np.ndarray:
    """Face from the top 3 bits."""
    return (np.asarray(ids, dtype=np.int64).view(np.uint64) >> np.uint64(61)).astype(
        np.int64
    )


def s2_pos(ids: np.ndarray) -> np.ndarray:
    """Hilbert position d at the id's own level."""
    ids = np.asarray(ids, dtype=np.int64)
    lvl = s2_level(ids)
    u = ids.view(np.uint64) & ~(np.uint64(7) << np.uint64(61))
    return (u >> (np.uint64(61) - 2 * lvl.astype(np.uint64))).astype(np.int64)


def s2_parent(ids: np.ndarray, levels_up: int = 1) -> np.ndarray:
    """Parent id `levels_up` levels above, pure bit ops (no decode):
    new_lsb = lsb << 2; id = (id & -new_lsb) | new_lsb."""
    ids = np.asarray(ids, dtype=np.int64).copy()
    for _ in range(levels_up):
        nl = (ids & -ids) << np.int64(2)
        ids = (ids & -nl) | nl
    return ids


# --------------------------------------------------------------------------
# Arrow batch kernels (map_batches stages)
# --------------------------------------------------------------------------


def s2_encode(
    t: pa.Table, level: int, x_col: str = "x", y_col: str = "y"
) -> pa.Table:
    """Append `s2_face`, `s2_i`, `s2_j`, `s2_id` (level `level`) to an
    Arrow batch with lon/lat degree columns.  One numpy pass; the hot
    stage of the spherical pipeline at bench scale."""
    lon = t[x_col].to_numpy(zero_copy_only=False)
    lat = t[y_col].to_numpy(zero_copy_only=False)
    px, py, pz = lonlat_to_xyz(lon, lat)
    face = xyz_to_face(px, py, pz)
    u, v = face_uv(face, px, py, pz)
    i = st_to_ij(uv_to_st(u), level)
    j = st_to_ij(uv_to_st(v), level)
    d = hilbert_d(level, i, j)
    t = t.append_column("s2_face", pa.array(face))
    t = t.append_column("s2_i", pa.array(i))
    t = t.append_column("s2_j", pa.array(j))
    return t.append_column("s2_id", pa.array(s2_cell_id(face, d, level)))


def s2_aggregate(
    ds,
    level: int,
    value_cols: Sequence[str],
    x_col: str = "x",
    y_col: str = "y",
    num_partitions: int = 64,
):
    """points → one row per occupied level-`level` S2 cell with
    `sum_<c>` per value column and `num_cell` point counts.

    map_batches[s2_encode] → hash_aggregate (partial per-batch combine,
    ONE hash shuffle on a small int key) — the same 100-TB shape as
    rasterize.py's planar core.  Output keys: s2_face, s2_i, s2_j,
    s2_id."""
    from rayraster.agg import hash_aggregate

    cols = [x_col, y_col, *value_cols]

    def enc(t: pa.Table) -> pa.Table:
        return s2_encode(t.select(cols), level, x_col, y_col)

    enc_ds = ds.map_batches(enc, batch_format="pyarrow", zero_copy_batch=True)
    return hash_aggregate(
        enc_ds,
        keys=["s2_face", "s2_i", "s2_j", "s2_id"],
        sum_cols=list(value_cols),
        count=True,
        count_name="num_cell",
        num_partitions=num_partitions,
    )


def s2_rollup(cells, sum_cols: Sequence[str], levels_up: int = 1, num_partitions: int = 64):
    """Aggregate a cell Dataset (output of :func:`s2_aggregate`) to a
    coarser level: parent ids via bit ops inside map_batches, then ONE
    hash-partitioned re-aggregate — never touches the raw points
    (rasterize.rollup_quadtree's spherical twin)."""
    from rayraster.agg import hash_aggregate

    def up(t: pa.Table) -> pa.Table:
        ids = s2_parent(t["s2_id"].to_numpy(zero_copy_only=False), levels_up)
        sh = np.int64(levels_up)
        cols = {
            "s2_face": t["s2_face"],
            "s2_i": pa.array(t["s2_i"].to_numpy(zero_copy_only=False) >> sh),
            "s2_j": pa.array(t["s2_j"].to_numpy(zero_copy_only=False) >> sh),
            "s2_id": pa.array(ids),
        }
        for c in sum_cols:
            cols[c] = t[c]
        cols["num_cell"] = t["num_cell"]
        return pa.table(cols)

    rolled = cells.map_batches(up, batch_format="pyarrow", zero_copy_batch=True)
    out = hash_aggregate(
        rolled,
        keys=["s2_face", "s2_i", "s2_j", "s2_id"],
        sum_cols=[*sum_cols, "num_cell"],
        count=False,
        num_partitions=num_partitions,
    )
    # hash_aggregate names the re-summed columns sum_<name>; restore the
    # cell-table contract (sum_x stays sum_x, num_cell stays num_cell)
    ren = {f"sum_{c}": c for c in sum_cols}
    ren["sum_num_cell"] = "num_cell"
    return out.rename_columns(
        [ren.get(n, n) for n in out.schema().names]
    )


def s2_cell_center_st(i: np.ndarray, level: int) -> np.ndarray:
    """Cell-center ST coordinate (i + 0.5) / 2^level — exact dyadic, so
    the SQL twin `(i + 0.5) / <2^level>` is bit-identical."""
    return (np.asarray(i, dtype=np.float64) + 0.5) / float(1 << level)


def st_center_to_uv(s: np.ndarray) -> np.ndarray:
    """Inverse quadratic ST, SQL twin (same op order):
    CASE WHEN s >= 0.5 THEN (4.0 * s * s - 1.0) / 3.0
         ELSE (1.0 - 4.0 * (1.0 - s) * (1.0 - s)) / 3.0 END"""
    s = np.asarray(s, dtype=np.float64)
    return np.where(
        s >= 0.5,
        (4.0 * s * s - 1.0) / 3.0,
        (1.0 - 4.0 * (1.0 - s) * (1.0 - s)) / 3.0,
    )


# FaceUVtoXYZ table (S2 convention); inverse of face_uv
_FACE_XYZ = [
    lambda u, v: (np.ones_like(u), u, v),  # +x
    lambda u, v: (-u, np.ones_like(u), v),  # +y
    lambda u, v: (-u, -v, np.ones_like(u)),  # +z
    lambda u, v: (-np.ones_like(u), -v, -u),  # -x
    lambda u, v: (v, -np.ones_like(u), -u),  # -y
    lambda u, v: (v, u, -np.ones_like(u)),  # -z
]


def face_uv_to_xyz(face: np.ndarray, u: np.ndarray, v: np.ndarray):
    """Unit-sphere point of a face/(u,v) — normalized with the exact
    expression `x / sqrt(x*x + y*y + z*z)` the SQL twin uses."""
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    for f, fn in enumerate(_FACE_XYZ):
        m = face == f
        if m.any():
            x[m], y[m], z[m] = fn(u[m], v[m])
    n = np.sqrt(x * x + y * y + z * z)
    return x / n, y / n, z / n


def s2_cell_center_xyz(face: np.ndarray, i: np.ndarray, j: np.ndarray, level: int):
    """Unit-sphere center of cell (face, i, j) at `level`."""
    u = st_center_to_uv(s2_cell_center_st(i, level))
    v = st_center_to_uv(s2_cell_center_st(j, level))
    return face_uv_to_xyz(np.asarray(face), u, v)


class S2CellKnnStage:
    """map_batches actor: k nearest S2 cells per query cell by
    great-circle distance (ranked via the monotone squared chord
    ``(ax-bx)^2 + (ay-by)^2 + (az-bz)^2`` on unit vectors — no
    trig in the distance itself, so the SQL self-join twin matches
    bit-for-bit).

    ``ref``: ObjectRef (ray.put once, read per actor — the cell table
    after aggregation is bounded by 6*4^level, so a broadcast side is
    the right 100-TB shape; the raw points never enter) of
    ``{"face", "id", "i", "j"}`` arrays.  Centers are computed ONCE in
    __init__; each __call__ scores one query batch against them with
    whole-matrix numpy and a vectorized (dist2, face, id) lexsort —
    tie-break parity with the oracle's ROW_NUMBER ORDER BY.
    """

    def __init__(self, ref, k: int, level: int, exclude_self: bool = True):
        import ray as _ray

        ref = _ray.get(ref) if isinstance(ref, _ray.ObjectRef) else ref
        self.k = k
        self.level = level
        self.exclude_self = exclude_self
        self.rface = np.asarray(ref["face"], dtype=np.int64)
        self.rid = np.asarray(ref["id"], dtype=np.int64)
        rx, ry, rz = s2_cell_center_xyz(
            self.rface,
            np.asarray(ref["i"], dtype=np.int64),
            np.asarray(ref["j"], dtype=np.int64),
            level,
        )
        self.rx, self.ry, self.rz = rx, ry, rz

    def __call__(self, t: pa.Table) -> pa.Table:
        # bound the (block × nr) distance matrix: whole-batch outer
        # differences at a few thousand queries allocate six >100 MB
        # temporaries and page-thrash (measured 3.3 s vs 0.05 s
        # chunked for the SAME flops); 512-query blocks keep every
        # temporary cache-resident with identical float results
        out = [self._solve_block(t.slice(s, 512))
               for s in range(0, t.num_rows, 512)]
        return pa.concat_tables(out) if out else self._solve_block(t)

    def _solve_block(self, t: pa.Table) -> pa.Table:
        face = t["s2_face"].to_numpy(zero_copy_only=False)
        ids = t["s2_id"].to_numpy(zero_copy_only=False)
        qi = t["s2_i"].to_numpy(zero_copy_only=False)
        qj = t["s2_j"].to_numpy(zero_copy_only=False)
        qx, qy, qz = s2_cell_center_xyz(face, qi, qj, self.level)
        nq, nr = len(ids), len(self.rid)
        dx = qx[:, None] - self.rx[None, :]
        dy = qy[:, None] - self.ry[None, :]
        dz = qz[:, None] - self.rz[None, :]
        d2 = dx * dx + dy * dy + dz * dz
        if self.exclude_self:
            d2[ids[:, None] == self.rid[None, :]] = np.inf
        k = self.k
        if nr > 4 * k + 8:
            # top-k via argpartition + a SMALL (nq × m) lexsort — the
            # former full-matrix 3-key lexsort was the whole stage's
            # cost (measured 20 s on 3.7k×3.7k; this path is ~50×
            # cheaper).  Exactness: argpartition(m-1) guarantees every
            # value < max(candidates) is inside the candidate set, so
            # the (d2, face, id) tie-break is complete unless the k-th
            # distance EQUALS the candidate max — those (rare) rows
            # fall back to a full single-row lexsort.
            m = 4 * k + 8
            cand = np.argpartition(d2, m - 1, axis=1)[:, :m]
            subd = np.take_along_axis(d2, cand, axis=1)
            sord = np.lexsort(
                (self.rid[cand], self.rface[cand], subd), axis=-1
            )[:, :k]
            order = np.take_along_axis(cand, sord, axis=1)
            kth = np.take_along_axis(subd, sord[:, k - 1:k], axis=1)[:, 0]
            risky = kth >= subd.max(axis=1)
            for r in np.nonzero(risky)[0]:
                full = np.lexsort((self.rid, self.rface, d2[r]))[:k]
                order[r] = full
        else:
            order = np.lexsort(
                (
                    np.broadcast_to(self.rid, (nq, nr)),
                    np.broadcast_to(self.rface, (nq, nr)),
                    d2,
                ),
                axis=-1,
            )[:, :k]
        rows = np.repeat(np.arange(nq), order.shape[1])
        cols = order.ravel()
        return pa.table(
            {
                "ix": pa.array(np.repeat(face, order.shape[1])),
                "iy": pa.array(np.repeat(ids, order.shape[1])),
                "rank": pa.array(
                    np.tile(np.arange(1, order.shape[1] + 1), nq).astype(np.int64)
                ),
                "dist2": pa.array(d2[rows, cols]),
                "n_ix": pa.array(self.rface[cols]),
                "n_iy": pa.array(self.rid[cols]),
            }
        )


# --------------------------------------------------------------------------
# spherical cap range query (covering → index prune → exact test)
# --------------------------------------------------------------------------


def s2_cap_covering(lon: float, lat: float, chord2: float, level: int) -> np.ndarray:
    """Cell ids at `level` whose cells MAY intersect the spherical cap
    around (lon, lat) with squared-chord radius `chord2` — a guaranteed
    superset (candidates are kept when the center is within
    radius + 2×circumradius; chord distance is Euclidean in R^3, so the
    triangle-inequality prune is exact, and the 2× pads the curved-edge
    farthest-point case the corner max doesn't capture).

    Closed-form enumeration of all 6*4^level cells — use a COARSE
    covering level (≤ ~8, ≤ 400k cells) and let the exact per-point
    test do the boundary work; the covering is computed once on the
    driver and broadcast, the points are never scanned."""
    n = 1 << level
    face = np.repeat(np.arange(6, dtype=np.int64), n * n)
    i = np.tile(np.repeat(np.arange(n, dtype=np.int64), n), 6)
    j = np.tile(np.arange(n, dtype=np.int64), 6 * n)
    cx, cy, cz = s2_cell_center_xyz(face, i, j, level)
    # per-cell circumradius bound: max chord from center to a corner
    rc2 = np.zeros(len(face))
    for di in (0.0, 1.0):
        for dj in (0.0, 1.0):
            su = st_center_to_uv((i + di) / float(n))
            sv = st_center_to_uv((j + dj) / float(n))
            kx, ky, kz = face_uv_to_xyz(face, su, sv)
            d2 = (cx - kx) ** 2 + (cy - ky) ** 2 + (cz - kz) ** 2
            rc2 = np.maximum(rc2, d2)
    qx, qy, qz = lonlat_to_xyz(np.array([lon]), np.array([lat]))
    dq = np.sqrt((cx - qx[0]) ** 2 + (cy - qy[0]) ** 2 + (cz - qz[0]) ** 2)
    keep = dq <= np.sqrt(chord2) + 2.0 * np.sqrt(rc2)
    d = hilbert_d(level, i[keep], j[keep])
    return s2_cell_id(face[keep], d, level)


def cap_chord2_mask(
    x: np.ndarray, y: np.ndarray, lon: float, lat: float, chord2: float
) -> np.ndarray:
    """Exact cap membership test.  SQL twin (qx/qy/qz inlined as the
    SAME Python-computed double literals):
    (px - qx)*(px - qx) + (py - qy)*(py - qy) + (pz - qz)*(pz - qz)
      <= chord2"""
    px, py, pz = lonlat_to_xyz(x, y)
    qx, qy, qz = cap_query_xyz(lon, lat)
    return (px - qx) * (px - qx) + (py - qy) * (py - qy) + (pz - qz) * (
        pz - qz
    ) <= chord2


def cap_query_xyz(lon: float, lat: float) -> tuple[float, float, float]:
    """The cap center's unit vector as plain floats — inline these as
    literals in BOTH the numpy mask and the SQL twin so the per-point
    expression is identical on each side."""
    qx, qy, qz = lonlat_to_xyz(np.array([lon]), np.array([lat]))
    return float(qx[0]), float(qy[0]), float(qz[0])


def s2_cap_filter(
    ds,
    lon: float,
    lat: float,
    chord2: float,
    level: int = 6,
    x_col: str = "x",
    y_col: str = "y",
):
    """Points within the spherical cap, the 100-TB shape: the bounded
    covering-cell id set is broadcast once (`ray.put`), each batch is
    pruned with one C++ `is_in` on its encoded cell id, and ONLY the
    candidate rows pay the exact chord test — map-only, no shuffle.
    The exact test keeps the result independent of the covering's
    looseness (tested: prune ∘ exact ≡ brute exact)."""
    import pyarrow.compute as pc
    import ray as _ray

    cover = _ray.put(pa.array(s2_cap_covering(lon, lat, chord2, level)))

    class CapStage:
        def __init__(self):
            self.cover = _ray.get(cover)

        def __call__(self, t: pa.Table) -> pa.Table:
            enc = s2_encode(t, level, x_col, y_col)
            cand = enc.filter(pc.is_in(enc["s2_id"], value_set=self.cover))
            if cand.num_rows == 0:
                return cand.drop_columns(["s2_face", "s2_i", "s2_j", "s2_id"])
            m = cap_chord2_mask(
                cand[x_col].to_numpy(zero_copy_only=False),
                cand[y_col].to_numpy(zero_copy_only=False),
                lon,
                lat,
                chord2,
            )
            return cand.filter(pa.array(m)).drop_columns(
                ["s2_face", "s2_i", "s2_j", "s2_id"]
            )

    return ds.map_batches(CapStage, batch_format="pyarrow", concurrency=2)


# SQL twin of the cell-center expressions (compose after s2_sql_cte's
# per-cell GROUP BY): given columns face, ci, cj at `level`, produce
# unit-vector center columns ax, ay, az.
def s2_center_sql(level: int, rel: str) -> str:
    n = float(1 << level)
    inv = (
        "CASE WHEN {s} >= 0.5 THEN (4.0 * {s} * {s} - 1.0) / 3.0 "
        "ELSE (1.0 - 4.0 * (1.0 - {s}) * (1.0 - {s})) / 3.0 END"
    )
    su = f"((ci + 0.5) / {n!r})"
    sv = f"((cj + 0.5) / {n!r})"
    return f"""s2uvc AS (
  SELECT *, {inv.format(s=su)} AS cu, {inv.format(s=sv)} AS cv FROM {rel}
),
s2xyzc AS (
  SELECT *, CASE face WHEN 0 THEN 1.0 WHEN 1 THEN -cu WHEN 2 THEN -cu
                      WHEN 3 THEN -1.0 WHEN 4 THEN cv ELSE cv END AS rxu,
            CASE face WHEN 0 THEN cu WHEN 1 THEN 1.0 WHEN 2 THEN -cv
                      WHEN 3 THEN -cv WHEN 4 THEN -1.0 ELSE cu END AS ryu,
            CASE face WHEN 0 THEN cv WHEN 1 THEN cv WHEN 2 THEN 1.0
                      WHEN 3 THEN -cu WHEN 4 THEN -cu ELSE -1.0 END AS rzu
  FROM s2uvc
),
s2ctr AS (
  SELECT *, rxu / sqrt(rxu * rxu + ryu * ryu + rzu * rzu) AS ax,
            ryu / sqrt(rxu * rxu + ryu * ryu + rzu * rzu) AS ay,
            rzu / sqrt(rxu * rxu + ryu * ryu + rzu * rzu) AS az
  FROM s2xyzc
)"""


# --------------------------------------------------------------------------
# ANSI-SQL twin (DuckDB oracle building blocks)
# --------------------------------------------------------------------------


def s2_sql_cte(level: int, src: str = "pts", key: str = "doc_id", carry: str = "n_chars") -> str:
    """CTE chain reproducing the level-`level` encode bit-for-bit from
    a relation `src(key, x, y, carry)`: xyz → face → uv → st → (i, j) →
    Hilbert d via a recursive CTE (`level` steps) → packed id.  Exposes
    relation `s2c(key, carry, face, ci, cj, cell_id)`."""
    n = 1 << level
    shift = 1 << (61 - 2 * level)
    sentinel = 1 << (60 - 2 * level)
    return f"""s2xyz AS (
  SELECT {key}, {carry},
         cos(radians(y)) * cos(radians(x)) AS px,
         cos(radians(y)) * sin(radians(x)) AS py,
         sin(radians(y)) AS pz
  FROM {src}
),
s2f AS (
  SELECT *, CASE
      WHEN abs(px) >= abs(py) AND abs(px) >= abs(pz) THEN CASE WHEN px > 0 THEN 0 ELSE 3 END
      WHEN abs(py) >= abs(pz) THEN CASE WHEN py > 0 THEN 1 ELSE 4 END
      ELSE CASE WHEN pz > 0 THEN 2 ELSE 5 END END AS face
  FROM s2xyz
),
s2uv AS (
  SELECT {key}, {carry}, face,
    CASE face WHEN 0 THEN py / px WHEN 1 THEN -(px / py) WHEN 2 THEN -(px / pz)
              WHEN 3 THEN pz / px WHEN 4 THEN pz / py ELSE -(py / pz) END AS u,
    CASE face WHEN 0 THEN pz / px WHEN 1 THEN pz / py WHEN 2 THEN -(py / pz)
              WHEN 3 THEN py / px WHEN 4 THEN -(px / py) ELSE -(px / pz) END AS v
  FROM s2f
),
s2st AS (
  SELECT {key}, {carry}, face,
    CASE WHEN u >= 0.0 THEN 0.5 * sqrt(1.0 + 3.0 * u) ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * u) END AS s,
    CASE WHEN v >= 0.0 THEN 0.5 * sqrt(1.0 + 3.0 * v) ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * v) END AS t
  FROM s2uv
),
s2ij AS (
  SELECT {key}, {carry}, face,
    LEAST(GREATEST(CAST(floor(s * {float(n)!r}) AS BIGINT), 0), {n - 1}) AS ci,
    LEAST(GREATEST(CAST(floor(t * {float(n)!r}) AS BIGINT), 0), {n - 1}) AS cj
  FROM s2st
),
s2hil AS (
  SELECT {key}, ci AS hi, cj AS hj, CAST(0 AS BIGINT) AS hd,
         CAST({n // 2} AS BIGINT) AS hs
  FROM s2ij
  UNION ALL
  SELECT {key},
    CASE WHEN (hj & hs) = 0 THEN CASE WHEN (hi & hs) > 0 THEN hs - 1 - hj ELSE hj END ELSE hi END AS hi,
    CASE WHEN (hj & hs) = 0 THEN CASE WHEN (hi & hs) > 0 THEN hs - 1 - hi ELSE hi END ELSE hj END AS hj,
    hd + hs * hs * xor(3 * (CASE WHEN (hi & hs) > 0 THEN 1 ELSE 0 END),
                       CASE WHEN (hj & hs) > 0 THEN 1 ELSE 0 END) AS hd,
    hs // 2 AS hs
  FROM s2hil WHERE hs > 0
),
s2d AS (SELECT {key}, hd FROM s2hil WHERE hs = 0),
s2c AS (
  SELECT p.{key}, p.{carry}, p.face, p.ci, p.cj,
         (CASE WHEN p.face >= 4 THEN p.face - 8 ELSE p.face END) * {_POW61}
           + h.hd * {shift} + {sentinel} AS cell_id
  FROM s2ij p JOIN s2d h ON p.{key} = h.{key}
)"""
