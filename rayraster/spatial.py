"""Spatial statistics over rasters: lattice neighbor aggregates and
local Moran's I (LISA).

SEraster's whole purpose is preparing rasters for downstream spatial
statistics (vignette: SpatialDE / nnSVG feed on the pixel matrix —
``/root/reference/vignettes/getting-started-with-SEraster.Rmd``); this
module provides the first of those statistics natively so the raster
never has to leave the engine.

Design (the 100-TB shape): a pixel's rook/queen/hex-ring neighborhood
is pure (ix, iy) arithmetic, so the neighbor "join" needs no general shuffle
join — pixels are tiled into ``tile × tile`` blocks, rows on a tile
edge are additionally copied to the adjacent tile (a ≤ 1-cell halo;
interior rows ship exactly once), and ONE hash-partitioned exchange
co-locates every tile with its halo.  Within a tile group the
neighbor lookup is a vectorized ``searchsorted`` over packed int64
cell keys.  Mirrors the proven :func:`rayraster.knn.spatial_knn_self`
tiling — kept as a separate implementation on purpose: that one fans
a float-radius 3×3 halo for EVERY row and answers with a GridIndex,
this one copies only lattice-edge rows and answers with exact key
lookups (the shared part is just the partition hash and the
sort-and-segment loop).  Here the halo bound is exact (lattice
distance 1), so results are always exact.

Float discipline: neighbor sums/counts stay exact int64 through the
exchange; the single LISA float expression
``(x_i − mean) · (nbr_sum − nbr_cnt · mean)`` is evaluated in one
fixed operation order so a SQL twin matches it bit-for-bit (mean is
the one division, ``S/n`` of exact integers).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ray.data import Dataset

_OFFSETS = {
    # square lattice: rook / queen
    4: [(-1, 0), (1, 0), (0, -1), (0, 1)],
    8: [(-1, 0), (1, 0), (0, -1), (0, 1), (-1, -1), (-1, 1), (1, -1), (1, 1)],
    # hex lattice (axial coordinates, the engine's pointy-top
    # convention — rayraster.grid): the 6 ring-1 neighbors.  All hex
    # offsets are within ±1 in each axis, so the same 1-cell tile halo
    # is exact for hex too.
    6: [(1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)],
}


def _pack(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    """Injective int64 key for |ix|,|iy| < 2^31 (checked by caller)."""
    return ix.astype(np.int64) * np.int64(1 << 32) + iy.astype(np.int64)


def neighbor_stats(
    pixels: Dataset,
    value_col: str,
    ix_col: str = "ix",
    iy_col: str = "iy",
    connectivity: int = 4,
    tile: int = 64,
    num_partitions: int = 64,
    sumsq: bool = False,
) -> Dataset:
    """Append exact ``nbr_cnt`` (existing rook / queen / hex-ring
    neighbors — ``connectivity`` 4, 8 or 6) and ``nbr_sum`` (int64 sum
    of their ``value_col``) to every pixel row.

    ONE exchange: tile fan-out with a 1-cell halo (home row → its own
    tile; edge rows also copied to the adjacent tile(s)), then a
    vectorized packed-key ``searchsorted`` per tile group.  Missing
    neighbors (outside the raster's live set) simply don't count —
    matching a LEFT-JOIN-on-the-lattice SQL twin.

    ``sumsq=True`` additionally emits ``nbr_sumsq`` (exact int64 sum of
    the neighbors' squared values — the local-Geary ingredient); the
    exactness contract then requires ``|value| ≤ isqrt((2^63−1)/conn)``
    (validated — 1,073,741,823 for 8-connectivity).
    """
    if connectivity not in _OFFSETS:
        raise ValueError(
            f"connectivity must be 4, 8 (square) or 6 (hex axial), got {connectivity}"
        )
    offsets = _OFFSETS[connectivity]
    sq_bound = np.int64(math.isqrt((2**63 - 1) // len(offsets)))
    T = np.int64(tile)

    def fanout(t: pa.Table) -> pa.Table:
        if not pa.types.is_integer(t.schema.field(value_col).type):
            raise TypeError(
                f"neighbor_stats: {value_col!r} must be an integer column "
                f"(got {t.schema.field(value_col).type}) — the exactness "
                "contract is int64 neighbor sums; pre-scale float rasters "
                "to fixed-point integers first"
            )
        if t.num_rows == 0:
            e = t.append_column("_home", pa.array([], type=pa.bool_()))
            e = e.append_column("_ttx", pa.array([], type=pa.int64()))
            e = e.append_column("_tty", pa.array([], type=pa.int64()))
            return e.append_column("_part", pa.array([], type=pa.int64()))
        ix = t[ix_col].to_numpy(zero_copy_only=False).astype(np.int64)
        iy = t[iy_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if np.abs(ix).max(initial=0) >= 1 << 31 or np.abs(iy).max(initial=0) >= 1 << 31:
            raise ValueError("neighbor_stats: |ix|,|iy| must be < 2^31 to pack")
        tx, ty = ix // T, iy // T
        lx, ly = ix - tx * T, iy - ty * T  # 0..tile-1 (floor semantics)
        pieces = []
        for a in (-1, 0, 1):
            okx = (lx == 0) if a == -1 else (lx == T - 1) if a == 1 else None
            for b in (-1, 0, 1):
                oky = (ly == 0) if b == -1 else (ly == T - 1) if b == 1 else None
                if a == 0 and b == 0:
                    sel = None  # every row is home in its own tile
                else:
                    sel = np.ones(t.num_rows, dtype=bool)
                    if okx is not None:
                        sel &= okx
                    if oky is not None:
                        sel &= oky
                if sel is None:
                    p, ptx, pty = t, tx, ty
                else:
                    idx = np.flatnonzero(sel)
                    if len(idx) == 0:
                        continue
                    p = t.take(pa.array(idx, type=pa.int64()))
                    ptx, pty = tx[idx], ty[idx]
                p = p.append_column(
                    "_home", pa.array(np.full(p.num_rows, a == 0 and b == 0))
                )
                part = (
                    np.abs(
                        (ptx + a) * np.int64(73856093) ^ (pty + b) * np.int64(19349663)
                    )
                    % np.int64(num_partitions)
                )
                # the halo copy must land with the NEIGHBOR tile's
                # group — tag the target tile, not the source
                p = p.append_column("_ttx", pa.array(ptx + a))
                p = p.append_column("_tty", pa.array(pty + b))
                pieces.append(p.append_column("_part", pa.array(part)))
        return pa.concat_tables(pieces)

    def solve(group: pa.Table) -> pa.Table:
        base_cols = [
            c for c in group.column_names
            if c not in ("_home", "_part", "_ttx", "_tty")
        ]
        empty = pa.table(
            {
                **{c: pa.array([], type=group[c].type) for c in base_cols},
                "nbr_cnt": pa.array([], type=pa.int64()),
                "nbr_sum": pa.array([], type=pa.int64()),
                **({"nbr_sumsq": pa.array([], type=pa.int64())} if sumsq else {}),
            }
        )
        if group.num_rows == 0:
            return empty
        # a partition may hold several tiles: resolve per tile
        group = group.sort_by([("_ttx", "ascending"), ("_tty", "ascending")])
        gtx = group["_ttx"].to_numpy(zero_copy_only=False)
        gty = group["_tty"].to_numpy(zero_copy_only=False)
        home = group["_home"].to_numpy(zero_copy_only=False)
        ix = group[ix_col].to_numpy(zero_copy_only=False).astype(np.int64)
        iy = group[iy_col].to_numpy(zero_copy_only=False).astype(np.int64)
        val = group[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if sumsq and len(val) and np.abs(val).max() > sq_bound:
            raise ValueError(
                f"neighbor_stats: |{value_col}| must be <= {sq_bound} for an "
                "exact int64 nbr_sumsq — rescale the raster first"
            )
        n = group.num_rows
        brk = np.ones(n, dtype=bool)
        brk[1:] = (gtx[1:] != gtx[:-1]) | (gty[1:] != gty[:-1])
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], n)
        keep_rows: list[np.ndarray] = []
        cnts: list[np.ndarray] = []
        sums: list[np.ndarray] = []
        sqs: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            rows = np.arange(s, e)
            h = rows[home[s:e]]
            if len(h) == 0:
                continue
            keys = _pack(ix[rows], iy[rows])
            order = np.argsort(keys)
            skeys, svals = keys[order], val[rows][order]
            if len(skeys) > 1 and (skeys[1:] == skeys[:-1]).any():
                # a pixel's home tile is unique and halo copies target
                # OTHER tiles, so a repeated key here means duplicate
                # (ix, iy) rows in the INPUT — searchsorted would match
                # only one of them, silently diverging from a lattice
                # self-join's semantics; refuse instead
                raise ValueError(
                    "neighbor_stats: duplicate (ix, iy) pixels in the input"
                    " — the raster must be unique per cell (aggregate first)"
                )
            cnt = np.zeros(len(h), dtype=np.int64)
            ssum = np.zeros(len(h), dtype=np.int64)
            ssq = np.zeros(len(h), dtype=np.int64)
            for dx, dy in offsets:
                want = _pack(ix[h] + dx, iy[h] + dy)
                pos = np.searchsorted(skeys, want)
                pos_c = np.minimum(pos, len(skeys) - 1)
                hit = skeys[pos_c] == want
                cnt += hit
                hv = np.where(hit, svals[pos_c], 0)
                ssum += hv
                if sumsq:
                    ssq += hv * hv  # |v| ≤ sq_bound ⇒ Σ over ≤conn terms exact
            keep_rows.append(h)
            cnts.append(cnt)
            sums.append(ssum)
            sqs.append(ssq)
        if not keep_rows:
            return empty
        take = np.concatenate(keep_rows)
        out = group.select(base_cols).take(pa.array(take, type=pa.int64()))
        out = out.append_column("nbr_cnt", pa.array(np.concatenate(cnts)))
        out = out.append_column("nbr_sum", pa.array(np.concatenate(sums)))
        if sumsq:
            out = out.append_column("nbr_sumsq", pa.array(np.concatenate(sqs)))
        return out

    fanned = pixels.map_batches(fanout, batch_format="pyarrow", zero_copy_batch=True)
    return fanned.groupby("_part").map_groups(solve, batch_format="pyarrow")


def join_counts(
    pixels: Dataset,
    value_col: str,
    ix_col: str = "ix",
    iy_col: str = "iy",
    connectivity: int = 4,
    tile: int = 64,
    num_partitions: int = 64,
) -> Dataset:
    """Cliff–Ord JOIN-COUNT statistics for a BINARY (0/1) lattice
    variable — the categorical-raster autocorrelation diagnostic
    ("are black pixels next to black pixels more often than chance?",
    Cliff & Ord 1981 §1.3): per pixel, the same-color and cross-color
    neighbor-join contributions

      ``jc_bb = v · Σnbr v``        (black–black joins touching it)
      ``jc_bw = v · (cnt − Σv) + (1−v) · Σv``   (black–white)
      ``jc_ww = (1−v) · (cnt − Σv)``            (white–white)

    ONE tile+halo exchange (:func:`neighbor_stats`) and a vectorized
    local finish — all int64-exact.  Every unordered lattice join is
    counted from BOTH endpoints, so the global statistics are
    ``BB = Σ jc_bb / 2``, ``BW = Σ jc_bw / 2``, ``WW = Σ jc_ww / 2``.
    Non-binary values raise (recode first — e.g. ``num_cell >= 2``).
    """
    ns = neighbor_stats(
        pixels, value_col, ix_col=ix_col, iy_col=iy_col,
        connectivity=connectivity, tile=tile,
        num_partitions=num_partitions,
    )

    def finish(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(v) and not np.all((v == 0) | (v == 1)):
            raise ValueError(
                f"join_counts: {value_col!r} must be binary 0/1 "
                "(recode the raster first)"
            )
        s = t["nbr_sum"].to_numpy(zero_copy_only=False)
        c = t["nbr_cnt"].to_numpy(zero_copy_only=False)
        t = t.append_column("jc_bb", pa.array(v * s))
        t = t.append_column("jc_bw", pa.array(v * (c - s) + (1 - v) * s))
        return t.append_column("jc_ww", pa.array((1 - v) * (c - s)))

    return ns.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def resample_bilinear(
    pixels: Dataset,
    value_col: str,
    x0: float,
    y0: float,
    src_res: float,
    dst_res: float,
    ix_col: str = "ix",
    iy_col: str = "iy",
    weight_scale: int = 1024,
    num_partitions: int = 64,
) -> Dataset:
    """Bilinear raster RESAMPLING onto a new resolution sharing the
    same origin — terra ``resample(method="bilinear")`` / gdalwarp
    ``-r bilinear``: every target centroid takes the tent-weighted
    mean of the ≤ 4 surrounding source pixel centroids.

    Per-axis weight at target coordinate ``u = (t − x0)/src_res − ½``
    (continuous source-index space): ``w = 1 − |u − ix|`` clipped at 0
    — exactly the classical ``(1−fx)``/``fx`` pair, branch-free.
    Weights are QUANTIZED (``wq = floor(scale·wx)·floor(scale·wy)``)
    so per-target folds are int64 sums, and the single division
    ``Σ wq·v / Σ wq`` happens last — RENORMALIZED bilinear: missing
    corners simply don't contribute (the GDAL nodata convention), and
    the ≤1-ulp floor loss cancels in the ratio.  Quantized-to-zero
    corners are dropped on BOTH engines (``wq > 0``).

    100-TB shape: pure SCATTER — each source pixel fans out to its
    ≤ (2·src/dst+2)² candidate targets closed-form (no index, no
    join), ONE grouped-sum exchange folds contributions
    (:func:`rayraster.agg.hash_aggregate`).  ``value_col`` must be an
    integer column (quantize float rasters first).

    Returns ``(ix, iy, cx, cy, n, sum_wv, sum_w, value)`` — target
    indices/centroids, contributing corner count, exact int64 sums,
    and the resampled value.
    """
    from .agg import hash_aggregate

    if src_res <= 0 or dst_res <= 0:
        raise ValueError("resolutions must be positive")
    ws = float(weight_scale)
    rr = src_res / dst_res
    kx = int(math.ceil(2.0 * rr)) + 2  # candidate targets per axis

    def fan(t: pa.Table) -> pa.Table:
        if not pa.types.is_integer(t.schema.field(value_col).type):
            raise TypeError(
                f"resample_bilinear: {value_col!r} must be an integer column"
            )
        ix = t[ix_col].to_numpy(zero_copy_only=False).astype(np.int64)
        iy = t[iy_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ix)
        if n == 0:
            return pa.table(
                {"jx": pa.array([], pa.int64()), "jy": pa.array([], pa.int64()),
                 "wv": pa.array([], pa.int64()), "w": pa.array([], pa.int64()),
                 "one": pa.array([], pa.int64())}
            )
        # candidate target range per axis: wq > 0 requires
        # |u − i| < 1 ⟺ t ∈ (x0+(i−½)·src, x0+(i+1½)·src)
        jx_lo = np.ceil((ix.astype(np.float64) - 0.5) * rr - 0.5).astype(np.int64) - 1
        jy_lo = np.ceil((iy.astype(np.float64) - 0.5) * rr - 0.5).astype(np.int64) - 1
        offs = np.arange(kx, dtype=np.int64)
        jxs = jx_lo[:, None] + offs[None, :]          # (n, kx)
        jys = jy_lo[:, None] + offs[None, :]
        # per-axis quantized tent weights at each candidate target
        tx = x0 + (jxs.astype(np.float64) + 0.5) * dst_res
        ux = (tx - x0) / src_res - 0.5
        wx = np.floor(ws * np.maximum(1.0 - np.abs(ux - ix[:, None]), 0.0)
                      ).astype(np.int64)
        ty = y0 + (jys.astype(np.float64) + 0.5) * dst_res
        uy = (ty - y0) / src_res - 0.5
        wy = np.floor(ws * np.maximum(1.0 - np.abs(uy - iy[:, None]), 0.0)
                      ).astype(np.int64)
        # cross the axes: (n, kx, kx) contributions, keep wq > 0
        wq = wx[:, :, None] * wy[:, None, :]
        src = np.repeat(np.arange(n), kx * kx)
        jx_f = np.repeat(jxs, kx, axis=1).reshape(-1)
        jy_f = np.tile(jys, (1, kx)).reshape(-1)
        wq_f = wq.reshape(-1)
        keep = wq_f > 0
        src, jx_f, jy_f, wq_f = src[keep], jx_f[keep], jy_f[keep], wq_f[keep]
        return pa.table(
            {"jx": pa.array(jx_f), "jy": pa.array(jy_f),
             "wv": pa.array(wq_f * v[src]), "w": pa.array(wq_f),
             "one": pa.array(np.ones(len(src), dtype=np.int64))}
        )

    folded = hash_aggregate(
        pixels.map_batches(fan, batch_format="pyarrow", zero_copy_batch=True),
        keys=["jx", "jy"], sum_cols=["wv", "w", "one"], count=False,
        num_partitions=num_partitions,
    )

    def finish(t: pa.Table) -> pa.Table:
        jx = t["jx"].to_numpy(zero_copy_only=False)
        jy = t["jy"].to_numpy(zero_copy_only=False)
        wv = t["sum_wv"].to_numpy(zero_copy_only=False)
        w = t["sum_w"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"ix": pa.array(jx), "iy": pa.array(jy),
             "cx": pa.array(x0 + (jx.astype(np.float64) + 0.5) * dst_res),
             "cy": pa.array(y0 + (jy.astype(np.float64) + 0.5) * dst_res),
             "n": t["sum_one"], "sum_wv": pa.array(wv), "sum_w": pa.array(w),
             "value": pa.array(
                 wv.astype(np.float64) / w.astype(np.float64)),
             }
        )

    return folded.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


def trend_moments(
    pts: Dataset,
    value_col: str,
    x_col: str = "x",
    y_col: str = "y",
    scale: int = 256,
) -> dict:
    """Exact integer moment sums for a first-order TREND SURFACE fit
    (ArcGIS Trend / R ``lm(v ~ x + y)``): coordinates are quantized to
    the int lattice ``q = floor(c · scale)`` (floor of one IEEE
    product — deterministic per value), so every normal-equation
    moment (n, Σx, Σy, Σx², Σxy, Σy², Σv, Σvx, Σvy) is an int64 sum —
    associative, schedule-invariant, and exactly reproducible in SQL.

    ONE map-only pass (per-batch single-row partials) + one tiny
    aggregate; nothing driver-side but 9 scalars.  Exactness contract:
    ``n · max(q)² < 2^63`` — with the default scale 256 on world
    coordinates (|c| ≤ 360) that holds to ~4·10^9 points; shrink
    ``scale`` for bigger corpora (the fit is then defined on the
    coarser lattice — a documented, deterministic statistic).
    ``value_col`` must be an integer column.
    """
    sc = float(scale)

    def fold(t: pa.Table) -> pa.Table:
        if not pa.types.is_integer(t.schema.field(value_col).type):
            raise TypeError(
                f"trend_moments: {value_col!r} must be an integer column"
            )
        x = t[x_col].to_numpy(zero_copy_only=False)
        y = t[y_col].to_numpy(zero_copy_only=False)
        xq = np.floor(x * sc).astype(np.int64)
        yq = np.floor(y * sc).astype(np.int64)
        if len(xq) and max(
            np.abs(xq).max(), np.abs(yq).max()
        ) >= np.int64(1) << 31:
            raise ValueError(
                "trend_moments: |coord·scale| must be < 2^31 "
                "(shrink scale)"
            )
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        row = {
            "n": len(xq), "sx": xq.sum(), "sy": yq.sum(),
            "sxx": (xq * xq).sum(), "sxy": (xq * yq).sum(),
            "syy": (yq * yq).sum(), "sv": v.sum(),
            "svx": (v * xq).sum(), "svy": (v * yq).sum(),
        }
        return pa.table(
            {k: pa.array([int(val)], type=pa.int64())
             for k, val in row.items()}
        )

    from ray.data.aggregate import Sum

    keys = ("n", "sx", "sy", "sxx", "sxy", "syy", "sv", "svx", "svy")
    agg = pts.map_batches(
        fold, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(*[Sum(k) for k in keys])
    return {k: int(agg[f"sum({k})"] or 0) for k in keys}


def trend_surface_fit(m: dict) -> "tuple[float, float, float]":
    """Closed-form OLS solve of the first-order trend normal equations
    by Cramer's rule over the :func:`trend_moments` int sums — a FIXED
    float expression tree (the same cofactor expansion, term order and
    divisions in the SQL twin), so (a, b, c) are bit-deterministic.
    The prediction at a quantized point is ``a + b·xq + c·yq``.
    Raises on a singular design (degenerate point sets)."""
    n = float(m["n"])
    sx, sy = float(m["sx"]), float(m["sy"])
    sxx, sxy, syy = float(m["sxx"]), float(m["sxy"]), float(m["syy"])
    sv, svx, svy = float(m["sv"]), float(m["svx"]), float(m["svy"])
    det = (
        n * (sxx * syy - sxy * sxy)
        - sx * (sx * syy - sxy * sy)
        + sy * (sx * sxy - sxx * sy)
    )
    if det == 0.0:
        raise ValueError("trend_surface_fit: singular design matrix")
    det_a = (
        sv * (sxx * syy - sxy * sxy)
        - sx * (svx * syy - sxy * svy)
        + sy * (svx * sxy - sxx * svy)
    )
    det_b = (
        n * (svx * syy - sxy * svy)
        - sv * (sx * syy - sxy * sy)
        + sy * (sx * svy - svx * sy)
    )
    det_c = (
        n * (sxx * svy - svx * sxy)
        - sx * (sx * svy - svx * sy)
        + sv * (sx * sxy - sxx * sy)
    )
    return det_a / det, det_b / det, det_c / det


def local_moran(
    pixels: Dataset,
    value_col: str,
    ix_col: str = "ix",
    iy_col: str = "iy",
    connectivity: int = 4,
    tile: int = 64,
    num_partitions: int = 64,
    with_focal: bool = False,
    with_gi: bool = False,
    with_geary: bool = False,
    terms_q: int | None = None,
) -> Dataset:
    """Append ``nbr_cnt``, ``nbr_sum`` and the (unnormalized) local
    Moran's I term ``lisa = (x_i − mean) · (nbr_sum − nbr_cnt · mean)``
    to every pixel row — positive where a pixel and its neighborhood
    deviate from the corpus mean the same way (hot/cold spots),
    negative at spatial outliers.  ``Σ lisa`` is the global Moran's I
    numerator (× n²); the conventional normalization divides by the
    variance and link count — deliberately left to the caller so every
    emitted float is ONE fixed-order expression a SQL twin reproduces
    bit-for-bit.

    ``with_gi=True`` additionally appends the Getis-Ord ``gi_star``
    hot-spot z-score (Getis & Ord 1992, binary weights incl. self):

        W   = 1 + nbr_cnt                 (link count, int)
        S1  = x_i + nbr_sum               (windowed sum, int)
        sd  = sqrt(ssq/n − mean²)         (population sd)
        gi* = (S1 − W·mean) / (sd · sqrt((n·W − W²)/(n − 1)))

    evaluated in exactly that operation order (every primitive —
    division, multiply, subtract, sqrt — is IEEE correctly rounded, so
    a SQL twin spelling the same tree matches bit-for-bit).

    ``with_geary=True`` additionally appends ``nbr_sumsq`` and the
    LOCAL GEARY'S C term (Anselin 1995) as an EXACT int64:

        geary = Σ_j (x_i − x_j)²  =  nbr_cnt·x_i² − 2·x_i·nbr_sum + nbr_sumsq

    — small where a pixel matches its neighborhood, large at edges;
    ``Σ geary`` is the global Geary's C numerator (× 2n²/(n−1)-style
    normalization left to the caller like ``lisa``).  Pure integer
    algebra, so the SQL twin is exact by construction; requires
    ``|value| ≤ isqrt((2^63−1)/(4·conn))`` so the result (≤ conn·(2m)²)
    and every intermediate stay in int64 (validated).

    ``terms_q=Q`` appends the QUANTIZED global-Moran per-pixel terms
    ``lisa_q = floor(Q·lisa)`` and ``z2_q = floor(Q·(x_i − mean)²)``
    as int64 — integer sums are order-independent, so
    :func:`global_moran` can fold them into the global statistic with
    a bit-identical result at any partitioning/cluster size.

    The pixel table is a post-aggregation raster (orders of magnitude
    smaller than the input points), so it is materialized once: the
    global ``(n, Σx, Σx²)`` fold and the neighbor exchange both consume
    it without re-executing upstream lineage.
    """
    pixels = pixels.materialize()

    def psum(t: pa.Table) -> pa.Table:
        if not pa.types.is_integer(t.schema.field(value_col).type):
            raise TypeError(
                f"local_moran: {value_col!r} must be an integer column "
                f"(got {t.schema.field(value_col).type}) — exactness "
                "requires int64 sums; pre-scale float rasters to "
                "fixed-point integers first"
            )
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(v) and np.abs(v).max() >= np.int64(1) << 31:
            raise ValueError(
                "local_moran: |value| must be < 2^31 (the Σx² fold packs "
                "squares into 31-bit halves for exact int accumulation)"
            )
        vv = v * v  # < 2^62, exact in int64
        lo = vv & ((np.int64(1) << 31) - 1)
        hi = vv >> 31
        ssq = (int(hi.sum()) << 31) + int(lo.sum())  # exact Python int
        return pa.table(
            {"n": pa.array([t.num_rows], type=pa.int64()),
             "s": pa.array([int(v.sum())], type=pa.int64()),
             "ssq_hi": pa.array([ssq >> 62], type=pa.int64()),
             "ssq_lo": pa.array([ssq & ((1 << 62) - 1)], type=pa.int64())}
        )

    # one tiny row per block on the driver (the scalar-fold pattern)
    parts = pixels.map_batches(psum, batch_format="pyarrow").take_all()
    n_px = sum(r["n"] for r in parts)
    s_px = sum(r["s"] for r in parts)
    ssq_px = sum((r["ssq_hi"] << 62) + r["ssq_lo"] for r in parts)
    if n_px == 0:
        raise ValueError("local_moran: empty pixel table")
    mean = s_px / n_px  # ONE IEEE division of exact ints (< 2^53)
    nf = float(n_px)
    sd = math.sqrt(max(float(ssq_px) / nf - mean * mean, 0.0)) if with_gi else 0.0
    if with_gi and (sd == 0.0 or n_px < 2):
        # a constant or single-pixel raster has no z-score — raise like
        # global_moran's degenerate case instead of emitting inf/nan
        raise ValueError(
            "local_moran: gi_star undefined for a constant or "
            "single-pixel raster (sd = 0)"
        )

    with_nbrs = neighbor_stats(
        pixels, value_col, ix_col=ix_col, iy_col=iy_col,
        connectivity=connectivity, tile=tile, num_partitions=num_partitions,
        sumsq=with_geary,
    )

    Q = float(terms_q) if terms_q else 0.0
    geary_bound = np.int64(
        math.isqrt((2**63 - 1) // (4 * len(_OFFSETS[connectivity])))
    )

    def add_lisa(t: pa.Table) -> pa.Table:
        xi_i = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ns_i = t["nbr_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        nc_i = t["nbr_cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        xi, ns, nc = (a.astype(np.float64) for a in (xi_i, ns_i, nc_i))
        lisa = (xi - mean) * (ns - nc * mean)
        t = t.append_column("lisa", pa.array(lisa))
        if with_focal:
            # same formula as focal_mean, riding this exchange for free
            fm = (xi_i + ns_i).astype(np.float64) / (1 + nc_i).astype(np.float64)
            t = t.append_column("focal", pa.array(fm))
        if with_gi:
            w = (1 + nc_i).astype(np.float64)
            s1 = (xi_i + ns_i).astype(np.float64)
            num = s1 - w * mean
            den = sd * np.sqrt((nf * w - w * w) / (nf - 1.0))
            t = t.append_column("gi_star", pa.array(num / den))
        if with_geary:
            if len(xi_i) and np.abs(xi_i).max() > geary_bound:
                raise ValueError(
                    f"local_moran: |{value_col}| must be <= {geary_bound} "
                    "for an exact int64 local Geary term — rescale first"
                )
            nsq_i = t["nbr_sumsq"].to_numpy(zero_copy_only=False).astype(np.int64)
            # Σ_j (x−x_j)² expanded; every intermediate bounded by
            # 4·conn·m² < 2^63 under the validated m, so exact int64
            t = t.append_column(
                "geary", pa.array((nc_i * xi_i * xi_i - 2 * xi_i * ns_i) + nsq_i)
            )
        if terms_q:
            lisa_q = np.floor(Q * lisa)
            z2_q = np.floor(Q * ((xi - mean) * (xi - mean)))
            if len(lisa_q) and (
                np.abs(lisa_q).max() >= 2.0**62 or z2_q.max() >= 2.0**62
            ):
                raise ValueError(
                    "local_moran: terms_q overflow — quantized Moran terms "
                    "exceed 2^62; lower terms_q for this value range"
                )
            t = t.append_column("lisa_q", pa.array(lisa_q.astype(np.int64)))
            t = t.append_column("z2_q", pa.array(z2_q.astype(np.int64)))
        return t

    return with_nbrs.map_batches(add_lisa, batch_format="pyarrow")


def global_moran(
    pixels_with_terms: Dataset,
) -> dict:
    """Fold the quantized per-pixel Moran terms (``lisa_q``, ``z2_q``
    from :func:`local_moran` with ``terms_q``) plus the link counts
    into the GLOBAL Moran's I statistic:

        I = (n / W_tot) · Σ lisa_q / Σ z2_q

    All three folds are int64 sums (order-independent ⇒ bit-identical
    at any partitioning / cluster size); the returned ``moran_i`` is
    one float expression over the exact integer totals.  Returns
    ``{n, w_tot, sum_lisa_q, sum_z2_q, moran_i}``.
    """

    def fold(t: pa.Table) -> pa.Table:
        return pa.table(
            {"n": pa.array([t.num_rows], type=pa.int64()),
             "w": pa.array(
                 [int(t["nbr_cnt"].to_numpy(zero_copy_only=False).sum())],
                 type=pa.int64()),
             "lq": pa.array(
                 [int(t["lisa_q"].to_numpy(zero_copy_only=False).sum())],
                 type=pa.int64()),
             "zq": pa.array(
                 [int(t["z2_q"].to_numpy(zero_copy_only=False).sum())],
                 type=pa.int64())}
        )

    parts = pixels_with_terms.map_batches(fold, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in parts)
    w_tot = sum(r["w"] for r in parts)
    sum_lq = sum(r["lq"] for r in parts)
    sum_zq = sum(r["zq"] for r in parts)
    if n == 0 or w_tot == 0 or sum_zq == 0:
        raise ValueError("global_moran: degenerate raster (empty, linkless "
                         "or constant)")
    moran_i = (float(n) / float(w_tot)) * (float(sum_lq) / float(sum_zq))
    return {"n": n, "w_tot": w_tot, "sum_lisa_q": sum_lq,
            "sum_z2_q": sum_zq, "moran_i": moran_i}


def focal_mean(
    pixels: Dataset,
    value_col: str,
    ix_col: str = "ix",
    iy_col: str = "iy",
    connectivity: int = 4,
    tile: int = 64,
    num_partitions: int = 64,
    out_col: str = "focal_mean",
) -> Dataset:
    """Raster smoothing: append the focal (moving-window) mean —
    ``(x_i + nbr_sum) / (1 + nbr_cnt)`` over the pixel and its
    existing rook/queen/hex-ring neighbors.  ONE exchange (rides
    :func:`neighbor_stats`); the emitted float is one IEEE division of
    exact integers, so a SQL twin matches it bit-for-bit.  Pixels
    outside the raster's live set contribute nothing (edge pixels
    average over fewer cells — the standard boundary rule)."""
    with_nbrs = neighbor_stats(
        pixels, value_col, ix_col=ix_col, iy_col=iy_col,
        connectivity=connectivity, tile=tile, num_partitions=num_partitions,
    )

    def add_mean(t: pa.Table) -> pa.Table:
        xi = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ns = t["nbr_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        nc = t["nbr_cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        fm = (xi + ns).astype(np.float64) / (1 + nc).astype(np.float64)
        return t.append_column(out_col, pa.array(fm))

    return with_nbrs.map_batches(add_mean, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# raster region labeling ("clump" / polygonize front half)
# ---------------------------------------------------------------------------


def region_edges(
    pixels: Dataset,
    value_col: str,
    ix_col: str = "ix",
    iy_col: str = "iy",
    connectivity: int = 4,
    tile: int = 64,
    num_partitions: int = 64,
) -> Dataset:
    """Same-value lattice adjacency edges: one ``(a, b)`` row (packed
    int64 cell keys, ``a < b``) per pair of rook/queen/hex-adjacent
    pixels whose ``value_col`` is EQUAL, plus one self-loop ``(k, k)``
    per pixel so isolated pixels still reach the component engine.

    Same tile + 1-cell-halo exchange as :func:`neighbor_stats` (only
    ``(ix, iy, value)`` ships — columns are pruned before the fan-out);
    each undirected edge is discovered from both endpoints' home tiles
    and the ``a < b`` filter keeps exactly one copy.  This is the edge
    half of GDAL ``polygonize`` / R ``raster::clump``: feed the result
    to :func:`rayraster.dedup.connected_components_distributed` (or let
    :func:`label_regions` do both).
    """
    if connectivity not in _OFFSETS:
        raise ValueError(
            f"connectivity must be 4, 8 (square) or 6 (hex axial), got {connectivity}"
        )
    offsets = _OFFSETS[connectivity]
    T = np.int64(tile)

    def fanout(t: pa.Table) -> pa.Table:
        if not pa.types.is_integer(t.schema.field(value_col).type):
            raise TypeError(
                f"region_edges: {value_col!r} must be an integer column "
                f"(got {t.schema.field(value_col).type}) — region identity "
                "is exact equality; quantize float rasters first"
            )
        t = t.select([ix_col, iy_col, value_col])
        if t.num_rows == 0:
            e = t.append_column("_home", pa.array([], type=pa.bool_()))
            e = e.append_column("_ttx", pa.array([], type=pa.int64()))
            e = e.append_column("_tty", pa.array([], type=pa.int64()))
            return e.append_column("_part", pa.array([], type=pa.int64()))
        ix = t[ix_col].to_numpy(zero_copy_only=False).astype(np.int64)
        iy = t[iy_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if np.abs(ix).max(initial=0) >= 1 << 31 or np.abs(iy).max(initial=0) >= 1 << 31:
            raise ValueError("region_edges: |ix|,|iy| must be < 2^31 to pack")
        tx, ty = ix // T, iy // T
        lx, ly = ix - tx * T, iy - ty * T
        pieces = []
        for a in (-1, 0, 1):
            okx = (lx == 0) if a == -1 else (lx == T - 1) if a == 1 else None
            for b in (-1, 0, 1):
                oky = (ly == 0) if b == -1 else (ly == T - 1) if b == 1 else None
                if a == 0 and b == 0:
                    sel = None
                else:
                    sel = np.ones(t.num_rows, dtype=bool)
                    if okx is not None:
                        sel &= okx
                    if oky is not None:
                        sel &= oky
                if sel is None:
                    p, ptx, pty = t, tx, ty
                else:
                    idx = np.flatnonzero(sel)
                    if len(idx) == 0:
                        continue
                    p = t.take(pa.array(idx, type=pa.int64()))
                    ptx, pty = tx[idx], ty[idx]
                p = p.append_column(
                    "_home", pa.array(np.full(p.num_rows, a == 0 and b == 0))
                )
                part = (
                    np.abs(
                        (ptx + a) * np.int64(73856093) ^ (pty + b) * np.int64(19349663)
                    )
                    % np.int64(num_partitions)
                )
                p = p.append_column("_ttx", pa.array(ptx + a))
                p = p.append_column("_tty", pa.array(pty + b))
                pieces.append(p.append_column("_part", pa.array(part)))
        return pa.concat_tables(pieces)

    def solve(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64())}
        )
        if group.num_rows == 0:
            return empty
        group = group.sort_by([("_ttx", "ascending"), ("_tty", "ascending")])
        gtx = group["_ttx"].to_numpy(zero_copy_only=False)
        gty = group["_tty"].to_numpy(zero_copy_only=False)
        home = group["_home"].to_numpy(zero_copy_only=False)
        ix = group[ix_col].to_numpy(zero_copy_only=False).astype(np.int64)
        iy = group[iy_col].to_numpy(zero_copy_only=False).astype(np.int64)
        val = group[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = group.num_rows
        brk = np.ones(n, dtype=bool)
        brk[1:] = (gtx[1:] != gtx[:-1]) | (gty[1:] != gty[:-1])
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], n)
        outs_a: list[np.ndarray] = []
        outs_b: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            rows = np.arange(s, e)
            h = rows[home[s:e]]
            if len(h) == 0:
                continue
            keys = _pack(ix[rows], iy[rows])
            order = np.argsort(keys)
            skeys, svals = keys[order], val[rows][order]
            if len(skeys) > 1 and (skeys[1:] == skeys[:-1]).any():
                raise ValueError(
                    "region_edges: duplicate (ix, iy) pixels in the input"
                    " — the raster must be unique per cell (aggregate first)"
                )
            hk = _pack(ix[h], iy[h])
            hv = val[h]
            outs_a.append(hk)  # self loops: every pixel reaches CC
            outs_b.append(hk)
            for dx, dy in offsets:
                want = _pack(ix[h] + dx, iy[h] + dy)
                pos = np.searchsorted(skeys, want)
                pos_c = np.minimum(pos, len(skeys) - 1)
                hit = (skeys[pos_c] == want) & (svals[pos_c] == hv) & (hk < want)
                if hit.any():
                    outs_a.append(hk[hit])
                    outs_b.append(want[hit])
        if not outs_a:
            return empty
        return pa.table(
            {"a": pa.array(np.concatenate(outs_a)),
             "b": pa.array(np.concatenate(outs_b))}
        )

    fanned = pixels.map_batches(fanout, batch_format="pyarrow", zero_copy_batch=True)
    return fanned.groupby("_part").map_groups(solve, batch_format="pyarrow")


def unpack_cell_key(k: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Invert :func:`_pack` for any signed (ix, iy) with |·| < 2^31:
    the low 32 bits (mod, always in [0, 2^32)) recover iy's residue;
    values ≥ 2^31 were a negative iy."""
    m = np.mod(k, np.int64(1) << 32)
    iy = np.where(m >= np.int64(1) << 31, m - (np.int64(1) << 32), m)
    ix = (k - iy) // (np.int64(1) << 32)
    return ix, iy


def label_regions(
    pixels: Dataset,
    value_col: str,
    ix_col: str = "ix",
    iy_col: str = "iy",
    connectivity: int = 4,
    tile: int = 64,
    num_partitions: int = 64,
    max_rounds: int = 64,
    with_size: bool = True,
    sum_cols: tuple = (),
    pixels_schema: pa.Schema | None = None,
    engine: str = "distributed",
) -> Dataset:
    """Label connected same-value raster regions (R ``raster::clump``,
    the front half of GDAL ``polygonize``): appends ``region_ix`` /
    ``region_iy`` — the lexicographically smallest (ix, iy) of the
    pixel's region, a deterministic stable region id — plus (with
    ``with_size``) ``region_n``, the region's pixel count, and (with
    ``sum_cols``) ZONAL statistics ``sum_<c>`` — the exact int64 sum
    of each listed pixel column over the whole region (the raster
    zonal-stats operator, zones = the labeled regions themselves).
    Sizes and zonal sums share ONE grouped aggregate + ONE join-back.

    ``engine="distributed"`` (default, the 10^12-pixel path):
    :func:`region_edges` (tile+halo exchange) →
    :func:`rayraster.dedup.connected_components_distributed`
    (min-label + pointer jumping, O(log diameter) rounds, one bucket
    join per round) → one `bucket_join` back to the pixels (+ one
    grouped count + join for sizes) — nothing driver-side.
    ``engine="driver"``: rasters are usually post-aggregation tables
    orders of magnitude smaller than their inputs, so the label table
    fits the driver — :func:`rayraster.dedup.connected_components`
    (broadcast labels, one exchange/round) then ONE map-side
    broadcast join back; zero join shuffles.  Both engines emit
    identical rows (pytest-pinned).  Labels are min PACKED keys;
    packing is strictly (ix, iy)-lexicographic so the unpacked pair is
    the lex-min member.  Pass ``pixels_schema`` when the pixel
    lineage contains a shuffle (same rule as every join in the repo).
    """
    from rayraster.agg import hash_aggregate
    from rayraster.dedup import (
        connected_components,
        connected_components_distributed,
    )
    from rayraster.join import broadcast_join, bucket_join

    if engine not in ("distributed", "driver"):
        raise ValueError(f"engine must be 'distributed' or 'driver', got {engine!r}")
    i64 = pa.int64()
    edges = region_edges(
        pixels, value_col, ix_col=ix_col, iy_col=iy_col,
        connectivity=connectivity, tile=tile, num_partitions=num_partitions,
    )

    def add_key(t: pa.Table) -> pa.Table:
        ix = t[ix_col].to_numpy(zero_copy_only=False).astype(np.int64)
        iy = t[iy_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("_k", pa.array(_pack(ix, iy)))

    keyed = pixels.map_batches(add_key, batch_format="pyarrow")

    def finalize(t: pa.Table) -> pa.Table:
        rix, riy = unpack_cell_key(
            t["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        t = t.drop_columns(["_k", "cluster"])
        t = t.append_column("region_ix", pa.array(rix))
        return t.append_column("region_iy", pa.array(riy))

    sum_cols = list(sum_cols)

    if engine == "driver":
        import ray

        lab_tbl = connected_components(
            edges, max_rounds=max_rounds, num_partitions=num_partitions
        ).rename_columns(["_k", "cluster"])
        with_lab = broadcast_join(keyed, lab_tbl, keys=["_k"])
        if with_size or sum_cols:
            # per-region aggregate runs distributed; the result (one
            # row per region ≤ one per pixel — and the driver engine is
            # the small-raster path by contract) is collected and
            # broadcast back, zero join shuffles
            with_lab = with_lab.materialize()
            agg_ds = hash_aggregate(
                with_lab, ["cluster"], sum_cols=sum_cols, count=with_size,
                count_name="region_n", num_partitions=num_partitions,
            )
            agg = pa.concat_tables(
                [ray.get(r) for r in agg_ds.to_arrow_refs()]
            ).combine_chunks()
            with_lab = broadcast_join(with_lab, agg, keys=["cluster"])
        return with_lab.map_batches(finalize, batch_format="pyarrow")

    labels = connected_components_distributed(
        edges, max_rounds=max_rounds, num_partitions=num_partitions
    )
    def _fields(schema: pa.Schema) -> list[pa.Field]:
        return [schema.field(i) for i in range(len(schema.names))]

    # explicit schemas only when the caller supplied one (the repo's
    # join rule: pass it whenever pixel lineage contains a shuffle);
    # otherwise bucket_join probes once
    keyed_schema = (
        pa.schema(_fields(pixels_schema) + [pa.field("_k", i64)])
        if pixels_schema is not None else None
    )

    joined = bucket_join(
        keyed, labels, "_k", "node",
        num_buckets=num_partitions,
        left_schema=keyed_schema,
        right_schema=pa.schema([("node", i64), ("cluster", i64)]),
    )
    if with_size or sum_cols:
        # the labeled pixel table feeds both the aggregate and the
        # join-back: pin its blocks (object store, spillable) so the
        # label rounds don't re-execute
        joined = joined.materialize()
        agg = hash_aggregate(
            joined, ["cluster"], sum_cols=sum_cols, count=with_size,
            count_name="region_n", num_partitions=num_partitions,
        )
        agg_fields = (
            [pa.field("cluster", i64)]
            + [pa.field(f"sum_{c}", i64) for c in sum_cols]
            + ([pa.field("region_n", i64)] if with_size else [])
        )
        joined = bucket_join(
            joined, agg, "cluster", "cluster",
            num_buckets=num_partitions,
            left_schema=(
                pa.schema(_fields(keyed_schema) + [pa.field("cluster", i64)])
                if keyed_schema is not None else None
            ),
            right_schema=pa.schema(agg_fields),
        )

    return joined.map_batches(finalize, batch_format="pyarrow")


def zonal_perimeter(
    labeled: Dataset,
    value_col: str,
    ix_col: str = "ix",
    iy_col: str = "iy",
    region_cols: tuple = ("region_ix", "region_iy"),
    connectivity: int = 4,
    tile: int = 64,
    num_partitions: int = 64,
) -> Dataset:
    """Per-region boundary length over a labeled raster (the zonal
    companion of R ``raster::clump`` + GDAL polygonize's ring length,
    and the landscape-ecology perimeter metric): for every pixel,
    ``connectivity − (#same-value neighbors present)`` exposed faces —
    grid boundary and different-value neighbors both count — summed
    per region.

    Input is :func:`label_regions` output (pixels carrying
    ``region_ix``/``region_iy``).  Same tile + 1-cell-halo exchange as
    :func:`region_edges` (same-value adjacency ⇒ same region — valid
    when ``connectivity`` is ≤ the connectivity the labels were built
    with, so the per-pixel count needs no label lookup on the halo
    side), then one grouped aggregate.  Output: one row per region
    with

    * ``perimeter``  — Σ exposed faces (= ``connectivity·n − adj2``)
    * ``adj_pairs``  — intra-region adjacent pairs (``adj2 / 2``)
    * ``region_n``   — pixel count
    * ``val``        — the region's (constant) value
    """
    from rayraster.agg import hash_aggregate

    if connectivity not in _OFFSETS:
        raise ValueError(
            f"connectivity must be 4, 8 (square) or 6 (hex axial), got {connectivity}"
        )
    offsets = _OFFSETS[connectivity]
    T = np.int64(tile)
    rix_col, riy_col = region_cols

    def fanout(t: pa.Table) -> pa.Table:
        t = t.select([ix_col, iy_col, value_col, rix_col, riy_col])
        if t.num_rows == 0:
            e = t.append_column("_home", pa.array([], type=pa.bool_()))
            e = e.append_column("_ttx", pa.array([], type=pa.int64()))
            e = e.append_column("_tty", pa.array([], type=pa.int64()))
            return e.append_column("_part", pa.array([], type=pa.int64()))
        ix = t[ix_col].to_numpy(zero_copy_only=False).astype(np.int64)
        iy = t[iy_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if np.abs(ix).max(initial=0) >= 1 << 31 or np.abs(iy).max(initial=0) >= 1 << 31:
            raise ValueError("zonal_perimeter: |ix|,|iy| must be < 2^31 to pack")
        tx, ty = ix // T, iy // T
        lx, ly = ix - tx * T, iy - ty * T
        pieces = []
        for a in (-1, 0, 1):
            okx = (lx == 0) if a == -1 else (lx == T - 1) if a == 1 else None
            for b in (-1, 0, 1):
                oky = (ly == 0) if b == -1 else (ly == T - 1) if b == 1 else None
                if a == 0 and b == 0:
                    sel = None
                else:
                    sel = np.ones(t.num_rows, dtype=bool)
                    if okx is not None:
                        sel &= okx
                    if oky is not None:
                        sel &= oky
                if sel is None:
                    p, ptx, pty = t, tx, ty
                else:
                    idx = np.flatnonzero(sel)
                    if len(idx) == 0:
                        continue
                    p = t.take(pa.array(idx, type=pa.int64()))
                    ptx, pty = tx[idx], ty[idx]
                p = p.append_column(
                    "_home", pa.array(np.full(p.num_rows, a == 0 and b == 0))
                )
                part = (
                    np.abs(
                        (ptx + a) * np.int64(73856093) ^ (pty + b) * np.int64(19349663)
                    )
                    % np.int64(num_partitions)
                )
                p = p.append_column("_ttx", pa.array(ptx + a))
                p = p.append_column("_tty", pa.array(pty + b))
                pieces.append(p.append_column("_part", pa.array(part)))
        return pa.concat_tables(pieces)

    n_faces = np.int64(len(offsets))

    def solve(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {rix_col: pa.array([], type=pa.int64()),
             riy_col: pa.array([], type=pa.int64()),
             value_col: pa.array([], type=pa.int64()),
             "_bnd": pa.array([], type=pa.int64()),
             "_adj": pa.array([], type=pa.int64())}
        )
        if group.num_rows == 0:
            return empty
        group = group.sort_by([("_ttx", "ascending"), ("_tty", "ascending")])
        gtx = group["_ttx"].to_numpy(zero_copy_only=False)
        gty = group["_tty"].to_numpy(zero_copy_only=False)
        home = group["_home"].to_numpy(zero_copy_only=False)
        ix = group[ix_col].to_numpy(zero_copy_only=False).astype(np.int64)
        iy = group[iy_col].to_numpy(zero_copy_only=False).astype(np.int64)
        val = group[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        rix = group[rix_col].to_numpy(zero_copy_only=False).astype(np.int64)
        riy = group[riy_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = group.num_rows
        brk = np.ones(n, dtype=bool)
        brk[1:] = (gtx[1:] != gtx[:-1]) | (gty[1:] != gty[:-1])
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], n)
        out = []
        for s, e in zip(starts, ends):
            rows = np.arange(s, e)
            h = rows[home[s:e]]
            if len(h) == 0:
                continue
            keys = _pack(ix[rows], iy[rows])
            order = np.argsort(keys)
            skeys, svals = keys[order], val[rows][order]
            if len(skeys) > 1 and (skeys[1:] == skeys[:-1]).any():
                # same contract as neighbor_stats/region_edges:
                # searchsorted would match only one duplicate, silently
                # double-counting perimeters — refuse
                raise ValueError(
                    "zonal_perimeter: duplicate (ix, iy) pixels in the"
                    " input — the raster must be unique per cell"
                )
            hk = _pack(ix[h], iy[h])
            hv = val[h]
            same = np.zeros(len(h), np.int64)
            for dx, dy in offsets:
                want = _pack(ix[h] + dx, iy[h] + dy)
                pos = np.searchsorted(skeys, want)
                pos_c = np.minimum(pos, len(skeys) - 1)
                same += ((skeys[pos_c] == want) & (svals[pos_c] == hv)).astype(np.int64)
            out.append(pa.table(
                {rix_col: pa.array(rix[h]), riy_col: pa.array(riy[h]),
                 value_col: pa.array(hv),
                 "_bnd": pa.array(n_faces - same), "_adj": pa.array(same)}
            ))
        return pa.concat_tables(out) if out else empty

    fanned = labeled.map_batches(fanout, batch_format="pyarrow", zero_copy_batch=True)
    per_pixel = fanned.groupby("_part").map_groups(solve, batch_format="pyarrow")
    agg = hash_aggregate(
        per_pixel, [rix_col, riy_col],
        sum_cols=["_bnd", "_adj"], min_cols=[value_col],
        count=True, count_name="region_n", num_partitions=num_partitions,
    )

    def project(t: pa.Table) -> pa.Table:
        adj2 = t["sum__adj"].to_numpy(zero_copy_only=False)
        return pa.table(
            {rix_col: t[rix_col], riy_col: t[riy_col],
             "perimeter": t["sum__bnd"],
             "adj_pairs": pa.array(adj2 // 2),
             "region_n": t["region_n"],
             "val": t[f"min_{value_col}"]}
        )

    return agg.map_batches(project, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# weighted focal convolution (Gaussian smoothing etc.)
# ---------------------------------------------------------------------------


def zonal_mode(
    labeled: Dataset,
    value_col: str,
    region_cols: tuple = ("region_ix", "region_iy"),
    num_partitions: int = 64,
) -> Dataset:
    """Majority value per labeled region (the categorical zonal
    statistic — ArcGIS Zonal Statistics MAJORITY / GRASS ``r.mode``):
    the most frequent ``value_col`` among each region's pixels, ties
    to the SMALLEST value (deterministic).  The zonal companion of
    :func:`focal_mode`; compose with :func:`label_regions` output (or
    any table carrying zone id columns).

    Two exchanges, both vectorized: ONE grouped count per
    (region, value) (:func:`rayraster.agg.hash_aggregate`, per-batch
    combiner inside), then ONE hash-partition by region key + an
    in-partition lexsort ``(region, count DESC, value ASC)`` whose
    boundary mask takes each region's first row — no per-key
    ``map_groups``, nothing on the driver.

    Returns ``(region_cols..., mode, mode_n)``.
    """
    from rayraster.agg import hash_aggregate

    rix_col, riy_col = region_cols
    counts = hash_aggregate(
        labeled.map_batches(
            lambda t: t.select([rix_col, riy_col, value_col]),
            batch_format="pyarrow",
        ),
        [rix_col, riy_col, value_col], count=True, count_name="n",
        num_partitions=num_partitions,
    )
    P = np.int64(num_partitions)

    def tag(t: pa.Table) -> pa.Table:
        rix = t[rix_col].to_numpy(zero_copy_only=False).astype(np.int64)
        riy = t[riy_col].to_numpy(zero_copy_only=False).astype(np.int64)
        part = ((_pack(rix, riy) % P) + P) % P
        return t.append_column("_part", pa.array(part))

    def pick(g: pa.Table) -> pa.Table:
        g = g.sort_by(
            [(rix_col, "ascending"), (riy_col, "ascending"),
             ("n", "descending"), (value_col, "ascending")]
        )
        rix = g[rix_col].to_numpy(zero_copy_only=False)
        riy = g[riy_col].to_numpy(zero_copy_only=False)
        first = np.ones(g.num_rows, dtype=bool)
        if g.num_rows:
            first[1:] = (rix[1:] != rix[:-1]) | (riy[1:] != riy[:-1])
        g = g.filter(pa.array(first))
        return pa.table(
            {rix_col: g[rix_col], riy_col: g[riy_col],
             "mode": g[value_col].cast(pa.int64()),
             "mode_n": g["n"].cast(pa.int64())}
        )

    return (
        counts.map_batches(tag, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(pick, batch_format="pyarrow")
    )


def gaussian_kernel_int(radius: int, sigma: float, scale: int = 100) -> np.ndarray:
    """Quantized (2R+1)² integer Gaussian: ``round(scale·exp(−d²/2σ²))``
    — integer weights keep the convolution's sums exact int64, so the
    smoothed raster has a bit-exact SQL twin (the repo's fixed-point
    discipline).  Zero-weight corners are dropped by
    :func:`focal_convolve` (they ship no halo rows)."""
    d = np.arange(-radius, radius + 1, dtype=np.float64)
    g = np.exp(-(d[:, None] ** 2 + d[None, :] ** 2) / (2.0 * sigma * sigma))
    return np.round(scale * g).astype(np.int64)


def focal_convolve(
    pixels: Dataset,
    value_col: str,
    kernel: "np.ndarray | dict",
    ix_col: str = "ix",
    iy_col: str = "iy",
    tile: int = 64,
    num_partitions: int = 64,
    out_prefix: str = "conv",
) -> Dataset:
    """Weighted moving-window convolution over a sparse raster:
    appends ``<prefix>_sum = Σ w(dx,dy)·value(ix+dx, iy+dy)`` and
    ``<prefix>_wt = Σ w(dx,dy)·[cell exists]`` (both exact int64) to
    every pixel — ``conv_sum / conv_wt`` is the kernel-weighted focal
    mean with the standard renormalize-at-the-boundary rule, and the
    caller owns that one float division (bit-exact twin discipline,
    like :func:`focal_mean`).

    Generalizes :func:`neighbor_stats`'s exchange to a halo of width
    ``R = kernel.shape[0] // 2``: rows within R cells of a tile edge
    are copied to the adjacent tile(s) (requires ``R < tile``, so the
    8-neighbor fan-out stays exact), ONE hash-partitioned exchange
    co-locates tiles with halos, and each kernel offset is one
    vectorized packed-key ``searchsorted`` per tile group.  Missing
    cells contribute nothing — sparse-raster semantics throughout.

    ``kernel``: odd-sided square int array (e.g.
    :func:`gaussian_kernel_int`) — or a ``{prefix: kernel}`` DICT to
    apply SEVERAL kernels in the SAME exchange (the Sobel-pair /
    smooth+gradient case: the halo ships once at the widest radius,
    each unique offset is looked up once, every kernel just adds its
    weight — per extra kernel the marginal cost is two int64 columns).
    The center weight applies to the pixel itself.  Float kernels are
    rejected — quantize first.
    """
    kmap = kernel if isinstance(kernel, dict) else {out_prefix: kernel}
    if not kmap:
        raise ValueError("focal_convolve: at least one kernel required")
    prefixes = list(kmap)
    norm: dict[str, np.ndarray] = {}
    for name, k in kmap.items():
        k = np.asarray(k)
        if k.ndim != 2 or k.shape[0] != k.shape[1] or k.shape[0] % 2 == 0:
            raise ValueError(
                f"kernel {name!r} must be an odd-sided square array, "
                f"got shape {k.shape}"
            )
        if not np.issubdtype(k.dtype, np.integer):
            raise TypeError(
                f"focal_convolve: kernel {name!r} must be integer (quantize "
                "floats first — see gaussian_kernel_int); exactness requires "
                "int64 sums"
            )
        norm[name] = k
    R = max(k.shape[0] // 2 for k in norm.values())
    if R >= tile:
        raise ValueError(f"kernel radius {R} must be < tile {tile}")
    # union of offsets; per offset the weight of EVERY kernel (0 = skip)
    offw: dict[tuple, dict[str, int]] = {}
    for name, k in norm.items():
        r = k.shape[0] // 2
        for dx in range(-r, r + 1):
            for dy in range(-r, r + 1):
                w = int(k[dx + r, dy + r])
                if w != 0:
                    offw.setdefault((dx, dy), {})[name] = w
    offs = [
        (dx, dy, [wd.get(name, 0) for name in prefixes])
        for (dx, dy), wd in sorted(offw.items())
    ]
    T = np.int64(tile)
    Rn = np.int64(R)

    def fanout(t: pa.Table) -> pa.Table:
        if not pa.types.is_integer(t.schema.field(value_col).type):
            raise TypeError(
                f"focal_convolve: {value_col!r} must be an integer column "
                f"(got {t.schema.field(value_col).type}) — pre-scale float "
                "rasters to fixed-point integers first"
            )
        if t.num_rows == 0:
            e = t.append_column("_home", pa.array([], type=pa.bool_()))
            e = e.append_column("_ttx", pa.array([], type=pa.int64()))
            e = e.append_column("_tty", pa.array([], type=pa.int64()))
            return e.append_column("_part", pa.array([], type=pa.int64()))
        ix = t[ix_col].to_numpy(zero_copy_only=False).astype(np.int64)
        iy = t[iy_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if np.abs(ix).max(initial=0) >= 1 << 31 or np.abs(iy).max(initial=0) >= 1 << 31:
            raise ValueError("focal_convolve: |ix|,|iy| must be < 2^31 to pack")
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        wmax = max(max(abs(w) for w in ws) for _, _, ws in offs)
        # exact Python-int product — the guard itself must not wrap
        if len(v) and int(np.abs(v).max()) * wmax * len(offs) >= 1 << 62:
            raise ValueError(
                "focal_convolve: |value|·Σ|w| risks int64 overflow — "
                "shrink the kernel scale or pre-scale values down"
            )
        tx, ty = ix // T, iy // T
        lx, ly = ix - tx * T, iy - ty * T
        pieces = []
        for a in (-1, 0, 1):
            okx = (lx < Rn) if a == -1 else (lx >= T - Rn) if a == 1 else None
            for b in (-1, 0, 1):
                oky = (ly < Rn) if b == -1 else (ly >= T - Rn) if b == 1 else None
                if a == 0 and b == 0:
                    sel = None
                else:
                    sel = np.ones(t.num_rows, dtype=bool)
                    if okx is not None:
                        sel &= okx
                    if oky is not None:
                        sel &= oky
                if sel is None:
                    p, ptx, pty = t, tx, ty
                else:
                    idx = np.flatnonzero(sel)
                    if len(idx) == 0:
                        continue
                    p = t.take(pa.array(idx, type=pa.int64()))
                    ptx, pty = tx[idx], ty[idx]
                p = p.append_column(
                    "_home", pa.array(np.full(p.num_rows, a == 0 and b == 0))
                )
                part = (
                    np.abs(
                        (ptx + a) * np.int64(73856093) ^ (pty + b) * np.int64(19349663)
                    )
                    % np.int64(num_partitions)
                )
                p = p.append_column("_ttx", pa.array(ptx + a))
                p = p.append_column("_tty", pa.array(pty + b))
                pieces.append(p.append_column("_part", pa.array(part)))
        return pa.concat_tables(pieces)

    out_cols = [(f"{p}_sum", f"{p}_wt") for p in prefixes]

    def solve(group: pa.Table) -> pa.Table:
        base_cols = [
            c for c in group.column_names
            if c not in ("_home", "_part", "_ttx", "_tty")
        ]
        empty = pa.table(
            {
                **{c: pa.array([], type=group[c].type) for c in base_cols},
                **{c: pa.array([], type=pa.int64())
                   for pair in out_cols for c in pair},
            }
        )
        if group.num_rows == 0:
            return empty
        group = group.sort_by([("_ttx", "ascending"), ("_tty", "ascending")])
        gtx = group["_ttx"].to_numpy(zero_copy_only=False)
        gty = group["_tty"].to_numpy(zero_copy_only=False)
        home = group["_home"].to_numpy(zero_copy_only=False)
        ix = group[ix_col].to_numpy(zero_copy_only=False).astype(np.int64)
        iy = group[iy_col].to_numpy(zero_copy_only=False).astype(np.int64)
        val = group[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = group.num_rows
        brk = np.ones(n, dtype=bool)
        brk[1:] = (gtx[1:] != gtx[:-1]) | (gty[1:] != gty[:-1])
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], n)
        keep_rows: list[np.ndarray] = []
        sums: list[list[np.ndarray]] = [[] for _ in prefixes]
        wts: list[list[np.ndarray]] = [[] for _ in prefixes]
        for s, e in zip(starts, ends):
            rows = np.arange(s, e)
            h = rows[home[s:e]]
            if len(h) == 0:
                continue
            keys = _pack(ix[rows], iy[rows])
            order = np.argsort(keys)
            skeys, svals = keys[order], val[rows][order]
            if len(skeys) > 1 and (skeys[1:] == skeys[:-1]).any():
                raise ValueError(
                    "focal_convolve: duplicate (ix, iy) pixels in the input"
                    " — the raster must be unique per cell (aggregate first)"
                )
            csum = [np.zeros(len(h), dtype=np.int64) for _ in prefixes]
            cwt = [np.zeros(len(h), dtype=np.int64) for _ in prefixes]
            for dx, dy, ws in offs:
                want = _pack(ix[h] + dx, iy[h] + dy)
                pos = np.searchsorted(skeys, want)
                pos_c = np.minimum(pos, len(skeys) - 1)
                hit = skeys[pos_c] == want
                hv = np.where(hit, svals[pos_c], 0)
                for ki, w in enumerate(ws):
                    if w:
                        csum[ki] += w * hv
                        cwt[ki] += np.where(hit, w, 0)
            keep_rows.append(h)
            for ki in range(len(prefixes)):
                sums[ki].append(csum[ki])
                wts[ki].append(cwt[ki])
        if not keep_rows:
            return empty
        take = np.concatenate(keep_rows)
        out = group.select(base_cols).take(pa.array(take, type=pa.int64()))
        for ki, (sc, wc) in enumerate(out_cols):
            out = out.append_column(sc, pa.array(np.concatenate(sums[ki])))
            out = out.append_column(wc, pa.array(np.concatenate(wts[ki])))
        return out

    fanned = pixels.map_batches(fanout, batch_format="pyarrow", zero_copy_batch=True)
    return fanned.groupby("_part").map_groups(solve, batch_format="pyarrow")


def sobel_kernels_int() -> dict:
    """The Horn/Sobel gradient pair as integer kernels for
    :func:`focal_convolve`: ``gx[dx,dy] = dx·(2−|dy|)`` and
    ``gy[dx,dy] = dy·(2−|dx|)`` (3×3, weights ±1/±2).  ``gx_sum`` /
    ``gy_sum`` are then exact int64 directional derivatives (×8·res
    in value·cell units); slope/aspect are the caller's float ops
    (`atan2` differs between libm and SQL engines in the last ulp, so
    the engine stops at the exact integers — the repo's twin rule)."""
    d = np.arange(-1, 2, dtype=np.int64)
    gx = d[:, None] * (2 - np.abs(d[None, :]))
    gy = d[None, :] * (2 - np.abs(d[:, None]))
    return {"gx": gx.astype(np.int64), "gy": np.ascontiguousarray(gy, np.int64)}


# ---------------------------------------------------------------------------
# hillshade (Horn 1981 analytic shading over Sobel gradients)
# ---------------------------------------------------------------------------


def _hillshade_constants(azimuth_deg: float, altitude_deg: float):
    import math

    zen = math.radians(90.0 - altitude_deg)
    az = math.radians(azimuth_deg)
    return math.cos(zen), math.sin(zen), math.cos(az), math.sin(az)


def hillshade(
    ds: Dataset,
    gx_col: str = "gx_sum",
    gy_col: str = "gy_sum",
    cellsize: float = 1.0,
    z_factor: float = 1.0,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
    out_col: str = "shade",
) -> Dataset:
    """Horn (1981) analytic hillshading from the int64 Sobel gradient
    sums :func:`sobel_kernels_int` + :func:`focal_convolve` produce:
    illumination = 255·(cos zenith·cos slope + sin zenith·sin slope·
    cos(azimuth − aspect)), clamped at 0 — the classic DEM
    visualization, map-only on the already-convolved pixel table.

    Trig-free formulation (the oracle-parity trick): aspect and slope
    never materialize as angles — ``cos/sin(aspect)`` come from the
    normalized gradient vector and ``cos/sin(slope)`` from
    ``1/sqrt(1+m²)``, so the whole shade is one fixed-order
    ``+ − × ÷ sqrt`` expression over (gx, gy).  numpy and DuckDB share
    libm for sqrt (bit-exact, unlike their atan/atan2) —
    :func:`hillshade_sql` emits the identical expression, making the
    column hash-exact under a SQL twin.  Flat cells (zero gradient)
    shade to ``255·cos(zenith)`` (aspect undefined ⇒ no directional
    term), per the convention GDAL uses."""
    cz, sz, ca, sa = _hillshade_constants(azimuth_deg, altitude_deg)
    c8 = 8.0 * cellsize
    zf = float(z_factor)

    def add_shade(t: pa.Table) -> pa.Table:
        gx = t[gx_col].to_numpy(zero_copy_only=False).astype(np.float64)
        gy = t[gy_col].to_numpy(zero_copy_only=False).astype(np.float64)
        dx = gx / c8
        dy = gy / c8
        r = np.sqrt(dx * dx + dy * dy)
        m = zf * r
        denom = np.sqrt(1.0 + m * m)
        flat = r == 0.0
        rsafe = np.where(flat, 1.0, r)
        shade = 255.0 * (
            cz / denom
            + (sz * (m / denom))
            * (ca * ((0.0 - dx) / rsafe) + sa * (dy / rsafe))
        )
        shade = np.where(flat, 255.0 * cz, shade)
        shade = np.maximum(shade, 0.0)
        return t.append_column(out_col, pa.array(shade))

    return ds.map_batches(add_shade, batch_format="pyarrow", zero_copy_batch=True)


def _flit(x: float) -> str:
    """Double literal DuckDB parses EXACTLY: plain decimals route
    through DECIMAL (observed 1-ulp drift on e.g. 180.31222920256963);
    an exponent forces the DOUBLE parser, which is correctly rounded."""
    s = repr(float(x))
    return s if ("e" in s or "E" in s) else s + "e0"


def hillshade_sql(
    gx_expr: str,
    gy_expr: str,
    cellsize: float = 1.0,
    z_factor: float = 1.0,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
) -> str:
    """The DuckDB twin of :func:`hillshade` — same constants (inlined
    as e-notation double literals so DuckDB's DOUBLE parser, not its
    DECIMAL route, reads them — see :func:`_flit`), same fixed
    evaluation order, so the resulting column is bit-exact against the
    engine's."""
    cz, sz, ca, sa = _hillshade_constants(azimuth_deg, altitude_deg)
    c8 = 8.0 * cellsize
    zf = float(z_factor)
    dx = f"(CAST({gx_expr} AS DOUBLE) / {_flit(c8)})"
    dy = f"(CAST({gy_expr} AS DOUBLE) / {_flit(c8)})"
    r = f"sqrt({dx} * {dx} + {dy} * {dy})"
    m = f"({_flit(zf)} * {r})"
    denom = f"sqrt(1.0 + {m} * {m})"
    shade = (
        f"(255.0 * ({_flit(cz)} / {denom} + ({_flit(sz)} * ({m} / {denom}))"
        f" * ({_flit(ca)} * ((0.0 - {dx}) / {r}) + {_flit(sa)} * ({dy} / {r}))))"
    )
    # the flat branch clamps at 0 too — the Python engine applies
    # np.maximum(..., 0) AFTER the flat substitution, so a sun below
    # the horizon (255·cos(zenith) < 0) must clamp in both engines
    return (
        f"CASE WHEN {r} = 0.0 THEN {_flit(max(255.0 * cz, 0.0))} "
        f"ELSE greatest({shade}, 0.0) END"
    )


# ---------------------------------------------------------------------------
# Inverse-distance-weighted interpolation (scatter-gather over the grid)
# ---------------------------------------------------------------------------


def _idw_ring(radius: float, res: float) -> int:
    """Smallest Chebyshev cell ring that provably contains every point
    within ``radius`` of a cell centroid: a point anywhere in cell
    ``i±k`` (k ≥ 1) is ≥ (k − 0.5)·res from the centroid of cell
    ``i`` along that axis, so offsets with max|k| = n+1 are impossible
    once (n + 0.5)·res > radius."""
    return max(1, int(math.floor(radius / res - 0.5)) + 1)


def idw_interpolate(
    pts: Dataset,
    x0: float,
    y0: float,
    res: float,
    value_col: str,
    radius: float | None = None,
    scale: float = 1_000_000.0,
    cap: float = 1_000_000_000.0,
    x_col: str = "x",
    y_col: str = "y",
    num_partitions: int = 64,
) -> Dataset:
    """Inverse-distance-weighted (Shepard, power 2) interpolation of a
    point attribute onto the pixel grid — the gap-filling complement
    to rasterize's per-cell aggregate (SEraster's mean|sum only sees a
    cell's OWN points; IDW lets every pixel borrow from the points
    around it, the standard geostatistical surface).

    100-TB shape: pure SCATTER — each point emits one quantized
    contribution per grid cell whose centroid lies within ``radius``
    (a closed-form (2·ring+1)² fan-out, no index, no join; ring 1 for
    the default radius), then ONE grouped-sum exchange
    (:func:`rayraster.agg.hash_aggregate`) folds contributions per
    target cell.  Targets are exactly the cells with ≥ 1 in-radius
    contributor — interpolation reaches into EMPTY neighbor cells (ix
    may be −ring at the frame edge), which a join against occupied
    pixels could never produce.

    Float discipline (the quantized-integer-kernel trick,
    :func:`gaussian_kernel_int`): the 1/d² weight is quantized to
    ``w = min(floor(scale / d²), cap)`` (d² < 1e−12 ⇒ cap) — an exact
    int64, so the shuffled sums Σw·v and Σw are order-free and the ONE
    float division Σwv/Σw happens after the exchange.  Every float op
    before quantization (centroid, d²) is a fixed-order expression the
    SQL twin (:func:`idw_sql`) reproduces bit-for-bit.

    Caller must keep ``cap · max|value| · contributors`` < 2^63 (the
    default cap leaves ~9·10^9 value-units of headroom).

    Returns (ix, iy, cx, cy, n, sum_wv, sum_w, idw) — ``n`` = in-radius
    contributor count, ``idw`` = Σwv/Σw.
    """
    from rayraster.agg import hash_aggregate

    rad = 1.45 * res if radius is None else float(radius)
    ring = _idw_ring(rad, res)
    rad2 = rad * rad
    offs = [(dx, dy) for dx in range(-ring, ring + 1) for dy in range(-ring, ring + 1)]

    def scatter(t: pa.Table) -> pa.Table:
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ix = np.maximum(np.ceil((x - x0) / res) - 1.0, 0.0).astype(np.int64)
        iy = np.maximum(np.ceil((y - y0) / res) - 1.0, 0.0).astype(np.int64)
        o_ix, o_iy, o_wv, o_w = [], [], [], []
        for dx, dy in offs:
            tix = ix + dx
            tiy = iy + dy
            tcx = x0 + (tix.astype(np.float64) + 0.5) * res
            tcy = y0 + (tiy.astype(np.float64) + 0.5) * res
            ddx = x - tcx
            ddy = y - tcy
            d2 = ddx * ddx + ddy * ddy
            m = d2 <= rad2
            if not m.any():
                continue
            d2m = d2[m]
            near = d2m < 1e-12
            d2s = np.where(near, 1.0, d2m)  # dodge the 0-division warning
            w = np.where(near, cap, np.minimum(np.floor(scale / d2s), cap)).astype(
                np.int64
            )
            o_ix.append(tix[m])
            o_iy.append(tiy[m])
            o_wv.append(w * v[m])
            o_w.append(w)
        if not o_ix:
            return pa.table(
                {"ix": pa.array([], pa.int64()), "iy": pa.array([], pa.int64()),
                 "wv": pa.array([], pa.int64()), "w": pa.array([], pa.int64())}
            )
        return pa.table(
            {"ix": np.concatenate(o_ix), "iy": np.concatenate(o_iy),
             "wv": np.concatenate(o_wv), "w": np.concatenate(o_w)}
        )

    scattered = pts.map_batches(scatter, batch_format="pyarrow", zero_copy_batch=True)
    agg = hash_aggregate(
        scattered, ["ix", "iy"], sum_cols=["wv", "w"],
        count=True, count_name="n", num_partitions=num_partitions,
    )

    def finalize(t: pa.Table) -> pa.Table:
        ix = t["ix"].to_numpy(zero_copy_only=False)
        iy = t["iy"].to_numpy(zero_copy_only=False)
        cx = x0 + (ix.astype(np.float64) + 0.5) * res
        cy = y0 + (iy.astype(np.float64) + 0.5) * res
        wv = t["sum_wv"].to_numpy(zero_copy_only=False)
        w = t["sum_w"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"ix": t["ix"], "iy": t["iy"], "cx": pa.array(cx), "cy": pa.array(cy),
             "n": t["n"], "sum_wv": t["sum_wv"], "sum_w": t["sum_w"],
             "idw": pa.array(wv / w)}
        )

    return agg.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def idw_sql(
    points_cte: str,
    res: float,
    value_expr: str,
    radius: float | None = None,
    scale: float = 1_000_000.0,
    cap: float = 1_000_000_000.0,
    x0_expr: str = "p.x0",
    y0_expr: str = "p.y0",
) -> str:
    """DuckDB twin of :func:`idw_interpolate`: same fan-out offsets,
    same fixed-order centroid/d² expressions (e-notation literals via
    :func:`_flit`), same quantized weight — SELECTs
    (ix, iy, cx, cy, n, sum_wv, sum_w, idw) from ``points_cte``, a
    relation with columns (x, y, <value>), point cell ids ix, iy (the
    clamped assign the engine uses) and the grid origin as COLUMNS
    (``x0_expr``/``y0_expr``, data-derived in the driver twin — the
    origin is the padded-bbox floor so both sides compute the same
    exact-integer double)."""
    rad = 1.45 * res if radius is None else float(radius)
    ring = _idw_ring(rad, res)
    rad2 = rad * rad
    offs = ", ".join(
        f"({dx}, {dy})"
        for dx in range(-ring, ring + 1)
        for dy in range(-ring, ring + 1)
    )
    tcx = f"({x0_expr} + (CAST(p.ix + o.dx AS DOUBLE) + 0.5) * {_flit(res)})"
    tcy = f"({y0_expr} + (CAST(p.iy + o.dy AS DOUBLE) + 0.5) * {_flit(res)})"
    d2 = f"((p.x - {tcx}) * (p.x - {tcx}) + (p.y - {tcy}) * (p.y - {tcy}))"
    w = (
        f"CAST(CASE WHEN {d2} < 1e-12 THEN {_flit(cap)} "
        f"ELSE least(floor({_flit(scale)} / {d2}), {_flit(cap)}) END AS BIGINT)"
    )
    return f"""SELECT ix, iy,
       gx0 + (CAST(ix AS DOUBLE) + 0.5) * {_flit(res)} AS cx,
       gy0 + (CAST(iy AS DOUBLE) + 0.5) * {_flit(res)} AS cy,
       COUNT(*) AS n,
       CAST(SUM(wv) AS BIGINT) AS sum_wv,
       CAST(SUM(w) AS BIGINT) AS sum_w,
       CAST(SUM(wv) AS BIGINT) / CAST(SUM(w) AS BIGINT) AS idw
FROM (
  SELECT p.ix + o.dx AS ix, p.iy + o.dy AS iy,
         {x0_expr} AS gx0, {y0_expr} AS gy0,
         {w} * ({value_expr}) AS wv, {w} AS w
  FROM {points_cte} p CROSS JOIN (VALUES {offs}) o(dx, dy)
  WHERE {d2} <= {_flit(rad2)}
) GROUP BY ix, iy, gx0, gy0"""


def kde_surface(
    pts: Dataset,
    x0: float,
    y0: float,
    res: float,
    bandwidth: float | None = None,
    value_col: str | None = None,
    scale: float = 1_000_000.0,
    x_col: str = "x",
    y_col: str = "y",
    num_partitions: int = 64,
) -> Dataset:
    """Kernel-density surface (spatstat ``density.ppp`` / QGIS heatmap)
    on the pixel grid with the EPANECHNIKOV kernel
    ``K(d) = max(0, 1 − d²/h²)`` — the optimal-MSE kernel and, unlike a
    Gaussian, a POLYNOMIAL: every weight is fixed-order +−×÷ that a SQL
    twin (:func:`kde_sql`) reproduces bit-for-bit (no libm ``exp``
    divergence risk).

    Same 100-TB shape as :func:`idw_interpolate`: pure SCATTER — each
    point emits one quantized contribution per grid centroid with
    ``d² < h²`` (closed-form (2·ring+1)² fan-out, no index, no join),
    then ONE grouped-sum exchange.  The weight is quantized to the
    exact int64 ``w = floor(scale · (1 − d²/h²))`` so the shuffled sum
    is order-free; the one float division (``density = Σw / scale``)
    happens after the exchange.  With ``value_col`` the surface is the
    value-weighted intensity (``sum_wv = Σ w·v`` rides the same
    exchange; caller keeps ``scale · max|value| · contributors``
    < 2^63).

    Returns ``(ix, iy, cx, cy, n, sum_w[, sum_wv], density)`` over
    exactly the cells with ≥ 1 in-bandwidth contributor — density
    spreads into EMPTY neighbor cells like IDW.
    """
    from rayraster.agg import hash_aggregate

    h = 2.0 * res if bandwidth is None else float(bandwidth)
    ring = _idw_ring(h, res)
    h2 = h * h
    offs = [(dx, dy) for dx in range(-ring, ring + 1) for dy in range(-ring, ring + 1)]
    weighted = value_col is not None

    def scatter(t: pa.Table) -> pa.Table:
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = (
            t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
            if weighted else None
        )
        ix = np.maximum(np.ceil((x - x0) / res) - 1.0, 0.0).astype(np.int64)
        iy = np.maximum(np.ceil((y - y0) / res) - 1.0, 0.0).astype(np.int64)
        o_ix, o_iy, o_w, o_wv = [], [], [], []
        for dx, dy in offs:
            tix = ix + dx
            tiy = iy + dy
            tcx = x0 + (tix.astype(np.float64) + 0.5) * res
            tcy = y0 + (tiy.astype(np.float64) + 0.5) * res
            ddx = x - tcx
            ddy = y - tcy
            d2 = ddx * ddx + ddy * ddy
            m = d2 < h2
            if not m.any():
                continue
            w = np.floor(scale * (1.0 - d2[m] / h2)).astype(np.int64)
            o_ix.append(tix[m])
            o_iy.append(tiy[m])
            o_w.append(w)
            if weighted:
                o_wv.append(w * v[m])
        cols = {"ix": pa.array([], pa.int64()), "iy": pa.array([], pa.int64()),
                "w": pa.array([], pa.int64())}
        if weighted:
            cols["wv"] = pa.array([], pa.int64())
        if not o_ix:
            return pa.table(cols)
        cols = {"ix": np.concatenate(o_ix), "iy": np.concatenate(o_iy),
                "w": np.concatenate(o_w)}
        if weighted:
            cols["wv"] = np.concatenate(o_wv)
        return pa.table(cols)

    scattered = pts.map_batches(scatter, batch_format="pyarrow", zero_copy_batch=True)
    agg = hash_aggregate(
        scattered, ["ix", "iy"], sum_cols=["w", *(["wv"] if weighted else [])],
        count=True, count_name="n", num_partitions=num_partitions,
    )

    def finalize(t: pa.Table) -> pa.Table:
        ix = t["ix"].to_numpy(zero_copy_only=False)
        iy = t["iy"].to_numpy(zero_copy_only=False)
        cx = x0 + (ix.astype(np.float64) + 0.5) * res
        cy = y0 + (iy.astype(np.float64) + 0.5) * res
        w = t["sum_w"].to_numpy(zero_copy_only=False)
        cols = {"ix": t["ix"], "iy": t["iy"],
                "cx": pa.array(cx), "cy": pa.array(cy),
                "n": t["n"], "sum_w": t["sum_w"]}
        if weighted:
            cols["sum_wv"] = t["sum_wv"]
        cols["density"] = pa.array(w / scale)
        return pa.table(cols)

    return agg.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def kde_sql(
    points_cte: str,
    res: float,
    bandwidth: float | None = None,
    scale: float = 1_000_000.0,
    x0_expr: str = "p.x0",
    y0_expr: str = "p.y0",
) -> str:
    """DuckDB twin of :func:`kde_surface` (unweighted form): same
    fan-out offsets, same fixed-order centroid/d²/weight expressions
    (e-notation literals via :func:`_flit`) — SELECTs
    (ix, iy, cx, cy, n, sum_w, density) from ``points_cte``, a relation
    with (x, y), clamped point cell ids ix, iy and the grid origin as
    columns (see :func:`idw_sql`)."""
    h = 2.0 * res if bandwidth is None else float(bandwidth)
    ring = _idw_ring(h, res)
    h2 = h * h
    offs = ", ".join(
        f"({dx}, {dy})"
        for dx in range(-ring, ring + 1)
        for dy in range(-ring, ring + 1)
    )
    tcx = f"({x0_expr} + (CAST(p.ix + o.dx AS DOUBLE) + 0.5) * {_flit(res)})"
    tcy = f"({y0_expr} + (CAST(p.iy + o.dy AS DOUBLE) + 0.5) * {_flit(res)})"
    d2 = f"((p.x - {tcx}) * (p.x - {tcx}) + (p.y - {tcy}) * (p.y - {tcy}))"
    w = (
        f"CAST(floor({_flit(scale)} * (1.0 - {d2} / {_flit(h2)})) AS BIGINT)"
    )
    return f"""SELECT ix, iy,
       gx0 + (CAST(ix AS DOUBLE) + 0.5) * {_flit(res)} AS cx,
       gy0 + (CAST(iy AS DOUBLE) + 0.5) * {_flit(res)} AS cy,
       COUNT(*) AS n,
       CAST(SUM(w) AS BIGINT) AS sum_w,
       CAST(SUM(w) AS BIGINT) / {_flit(scale)} AS density
FROM (
  SELECT p.ix + o.dx AS ix, p.iy + o.dy AS iy,
         {x0_expr} AS gx0, {y0_expr} AS gy0, {w} AS w
  FROM {points_cte} p CROSS JOIN (VALUES {offs}) o(dx, dy)
  WHERE {d2} < {_flit(h2)}
) GROUP BY ix, iy, gx0, gy0"""


# ---------------------------------------------------------------------------
# D8 flow routing (direction + accumulation) over sparse rasters
# ---------------------------------------------------------------------------

#: D8 neighbor order — ties in drop break toward the EARLIEST offset
#: here (the SQL twin's ROW_NUMBER ... ORDER BY drop DESC, ord ASC).
FLOW_OFFSETS = tuple(_OFFSETS[8])


def flow_direction(
    pixels: Dataset,
    value_col: str,
    ix_col: str = "ix",
    iy_col: str = "iy",
    tile: int = 64,
    num_partitions: int = 64,
) -> Dataset:
    """D8 steepest-descent flow direction (O'Callaghan & Mark 1984) on
    a sparse integer raster: each pixel points at the 8-neighbor with
    the LARGEST positive drop ``value(p) − value(q)`` (strictly lower
    only; missing cells are nodata and never receive flow).  Ties break
    by :data:`FLOW_OFFSETS` order; pixels with no lower neighbor are
    pits/outlets (``has_down`` false).

    One exchange: the 8 neighbor values arrive as eight single-offset
    kernels through :func:`focal_convolve`'s shared tile+halo shuffle
    (the halo ships once, each offset is one packed-key lookup); the
    argmax is a local vectorized pass.  All comparisons are exact
    int64 — the SQL twin (ROW_NUMBER over the 8-way self-join) is
    value-identical.

    Returns the pixel rows + ``has_down``, ``down_ix``, ``down_iy``
    (self-coordinates when ``has_down`` is false).
    """
    kernels = {}
    for i, (dx, dy) in enumerate(FLOW_OFFSETS):
        k = np.zeros((3, 3), dtype=np.int64)
        k[dx + 1, dy + 1] = 1
        kernels[f"fd{i}"] = k
    conv = focal_convolve(
        pixels, value_col, kernels,
        ix_col=ix_col, iy_col=iy_col, tile=tile, num_partitions=num_partitions,
    )

    def pick(t: pa.Table) -> pa.Table:
        n = t.num_rows
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        drops = np.full((len(FLOW_OFFSETS), n), -1, dtype=np.int64)
        for i in range(len(FLOW_OFFSETS)):
            nb = t[f"fd{i}_sum"].to_numpy(zero_copy_only=False)
            wt = t[f"fd{i}_wt"].to_numpy(zero_copy_only=False)
            valid = (wt > 0) & (nb < v)
            drops[i, valid] = (v - nb)[valid]
        best = np.argmax(drops, axis=0)  # first max == twin's tie-break
        rows = np.arange(n)
        has = drops[best, rows] > 0
        offs = np.asarray(FLOW_OFFSETS, dtype=np.int64)
        ix = t[ix_col].to_numpy(zero_copy_only=False).astype(np.int64)
        iy = t[iy_col].to_numpy(zero_copy_only=False).astype(np.int64)
        dix = np.where(has, ix + offs[best, 0], ix)
        diy = np.where(has, iy + offs[best, 1], iy)
        keep = [c for c in t.column_names if not c.startswith("fd")]
        out = t.select(keep)
        out = out.append_column("has_down", pa.array(has))
        out = out.append_column("down_ix", pa.array(dix))
        return out.append_column("down_iy", pa.array(diy))

    return conv.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


def flow_accumulation(
    flows: Dataset,
    rounds: int,
    ix_col: str = "ix",
    iy_col: str = "iy",
    num_partitions: int = 64,
    node_count: int | None = None,
    driver_threshold: int = 200_000,
) -> Dataset:
    """Synchronous-Jacobi flow accumulation over a D8 direction field
    (:func:`flow_direction` output): ``acc ← 1 + Σ acc(upstream)``,
    iterated ``rounds`` times.  At ``rounds ≥`` the longest flow path
    this is the exact upstream-cell count (+1 for the cell itself) —
    the hydrology workhorse; below it both engines still agree
    bit-for-bit with a twin that unrolls the SAME number of rounds.

    Two shapes, picked by ``node_count`` (the graph is the RASTER —
    already aggregated, O(pixels) ≪ the point table):

    * ≤ ``driver_threshold``: the per-node acc vector lives on the
      driver (``np.add.at`` per round — the same bounded
      small-state-on-driver shape as ``bfs_depths``' frontier and
      ``exact_quantiles``' histograms); ZERO exchanges per round.
    * above: acc stays a Dataset — one inner
      :func:`rayraster.join.bucket_join` (edges ⋈ acc on src) plus one
      grouped sum per round, nothing driver-side.

    Returns ``(ix, iy, acc)``.
    """
    from rayraster.agg import hash_aggregate
    from rayraster.join import bucket_join

    def to_graph(t: pa.Table) -> pa.Table:
        ix = t[ix_col].to_numpy(zero_copy_only=False).astype(np.int64)
        iy = t[iy_col].to_numpy(zero_copy_only=False).astype(np.int64)
        dix = t["down_ix"].to_numpy(zero_copy_only=False).astype(np.int64)
        diy = t["down_iy"].to_numpy(zero_copy_only=False).astype(np.int64)
        has = t["has_down"].to_numpy(zero_copy_only=False).astype(bool)
        # packed keys are SIGNED (negative ix/iy are legal raster
        # coords) — no integer sentinel is safe, carry the bool
        return pa.table(
            {"node": _pack(ix, iy), "down": _pack(dix, diy), "has": has}
        )

    graph = flows.map_batches(to_graph, batch_format="pyarrow")
    e_schema = pa.schema([("node", pa.int64()), ("down", pa.int64())])

    small = node_count is not None and node_count <= driver_threshold
    if small:
        gt = pa.concat_tables(graph.iter_batches(batch_format="pyarrow"))
        nodes = gt["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        downs = gt["down"].to_numpy(zero_copy_only=False).astype(np.int64)
        hass = gt["has"].to_numpy(zero_copy_only=False).astype(bool)
        order = np.argsort(nodes, kind="stable")
        nodes, downs, has = nodes[order], downs[order], hass[order]
        src_idx = np.flatnonzero(has)
        dst_idx = np.searchsorted(nodes, downs[has])
        acc = np.ones(len(nodes), dtype=np.int64)
        for _ in range(rounds):
            inflow = np.zeros(len(nodes), dtype=np.int64)
            np.add.at(inflow, dst_idx, acc[src_idx])
            acc = 1 + inflow
        ix, iy = unpack_cell_key(nodes)
        import ray.data as rd

        return rd.from_arrow(
            pa.table({ix_col: ix, iy_col: iy, "acc": acc})
        )

    # materialize the shared parent ONCE: edges and nodes_ds both
    # derive from `graph`, and two independent .materialize() children
    # would execute the upstream flow_direction tile+halo exchange
    # twice (the local_moran materialize-once pattern)
    graph = graph.materialize()
    edges = graph.map_batches(
        lambda t: t.filter(t["has"]).select(["node", "down"]),
        batch_format="pyarrow",
    ).materialize()
    nodes_ds = graph.map_batches(
        lambda t: t.select(["node"]), batch_format="pyarrow"
    ).materialize()
    acc_schema = pa.schema([("node", pa.int64()), ("acc", pa.int64())])
    acc_ds = nodes_ds.map_batches(
        lambda t: t.append_column(
            "acc", pa.array(np.ones(t.num_rows, dtype=np.int64))
        ),
        batch_format="pyarrow",
    )
    base = nodes_ds.map_batches(
        lambda t: t.append_column(
            "acc", pa.array(np.zeros(t.num_rows, dtype=np.int64))
        ),
        batch_format="pyarrow",
    )
    for _ in range(rounds):
        contrib = bucket_join(
            edges, acc_ds, "node", "node", join_type="inner",
            left_schema=e_schema, right_schema=acc_schema,
            num_buckets=num_partitions,
        ).map_batches(
            lambda t: pa.table({"node": t["down"], "acc": t["acc"]}),
            batch_format="pyarrow",
        )
        folded = hash_aggregate(
            base.union(contrib), ["node"], sum_cols=["acc"], count=False,
            num_partitions=num_partitions,
        )
        acc_ds = folded.map_batches(
            lambda t: pa.table(
                {"node": t["node"],
                 "acc": pa.compute.add(t["sum_acc"], 1).cast(pa.int64())}
            ),
            batch_format="pyarrow",
        ).materialize()

    def unpack(t: pa.Table) -> pa.Table:
        ix, iy = unpack_cell_key(t["node"].to_numpy(zero_copy_only=False))
        return pa.table({ix_col: ix, iy_col: iy, "acc": t["acc"]})

    return acc_ds.map_batches(unpack, batch_format="pyarrow")


def focal_mode(
    pixels: Dataset,
    value_col: str,
    ix_col: str = "ix",
    iy_col: str = "iy",
    connectivity: int = 8,
    tile: int = 64,
    num_partitions: int = 64,
) -> Dataset:
    """Focal MAJORITY (modal) filter — the categorical-raster cleanup
    (GRASS ``r.neighbors method=mode`` / terra ``focal fun="modal"``):
    each pixel takes the most frequent value among itself and its
    present neighbors; ties break to the SMALLEST value (terra's
    ``ties="lowest"`` — deterministic, partitioning-invariant).  The
    salt-and-pepper smoother for `rasterize_categories` outputs (values
    = integer category codes).

    One exchange: neighbor VALUES arrive as single-offset kernels
    through :func:`focal_convolve`'s shared tile+halo shuffle (value =
    the offset's sum, presence = its weight); the mode is a local pass
    of 9 constant-width vectorized steps over the sorted value matrix
    (no per-row Python).  Exact int64 throughout.

    Returns the pixel rows + ``mode`` and ``n_present`` (window size
    including self).
    """
    if connectivity not in _OFFSETS:
        raise ValueError(
            f"connectivity must be 4, 8 (square) or 6 (hex axial), got {connectivity}"
        )
    offsets = _OFFSETS[connectivity]
    kernels = {}
    for i, (dx, dy) in enumerate(offsets):
        k = np.zeros((3, 3), dtype=np.int64)
        k[dx + 1, dy + 1] = 1
        kernels[f"fm{i}"] = k
    conv = focal_convolve(
        pixels, value_col, kernels,
        ix_col=ix_col, iy_col=iy_col, tile=tile, num_partitions=num_partitions,
    )
    _SENT = np.int64(2**62)

    def mode_pass(t: pa.Table) -> pa.Table:
        n = t.num_rows
        center = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = [center]
        present = np.ones((n, 1), dtype=bool)
        for i in range(len(offsets)):
            v = t[f"fm{i}_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
            p = t[f"fm{i}_wt"].to_numpy(zero_copy_only=False).astype(np.int64) > 0
            cols.append(np.where(p, v, _SENT))
            present = np.concatenate([present, p[:, None]], axis=1)
        M = np.sort(np.stack(cols, axis=1), axis=1)  # sentinels sort last
        best_val = M[:, 0].copy()
        best_cnt = np.ones(n, dtype=np.int64)
        cur_cnt = np.ones(n, dtype=np.int64)
        for j in range(1, M.shape[1]):
            same = M[:, j] == M[:, j - 1]
            cur_cnt = np.where(same, cur_cnt + 1, 1)
            better = (M[:, j] != _SENT) & (cur_cnt > best_cnt)
            best_cnt = np.where(better, cur_cnt, best_cnt)
            best_val = np.where(better, M[:, j], best_val)
        drop = [value_col] + [
            c for i in range(len(offsets)) for c in (f"fm{i}_sum", f"fm{i}_wt")
        ]
        out = t.drop_columns([c for c in drop if c != value_col])
        return out.append_column(
            "mode", pa.array(best_val)
        ).append_column(
            "n_present", pa.array(present.sum(axis=1).astype(np.int64))
        )

    return conv.map_batches(mode_pass, batch_format="pyarrow", zero_copy_batch=True)


def focal_stat(
    pixels: Dataset,
    value_col: str,
    ix_col: str = "ix",
    iy_col: str = "iy",
    connectivity: int = 8,
    tile: int = 64,
    num_partitions: int = 64,
) -> Dataset:
    """Focal MIN / MAX / RANGE (GRASS ``r.neighbors`` methods
    ``minimum``/``maximum``/``range``, terra ``focal`` min/max): each
    pixel takes the extreme of its own value and its PRESENT neighbors
    (4/8 square or hex-6).  ``focal_range = focal_max − focal_min`` is
    the local-relief / roughness raster; on a 0/1 indicator ``focal_min``
    is grayscale EROSION and ``focal_max`` DILATION restricted to the
    occupied set (dilation that CREATES cells is :func:`grow_cells`).

    One exchange: neighbor values arrive as single-offset kernels
    through :func:`focal_convolve`'s shared tile+halo shuffle (the same
    plumbing as :func:`focal_mode`); the extremes are sentinel-masked
    vectorized folds — exact int64, no per-row Python.

    Returns the pixel rows + ``focal_min``, ``focal_max``,
    ``focal_range`` and ``n_present`` (window size including self).
    """
    if connectivity not in _OFFSETS:
        raise ValueError(
            f"connectivity must be 4, 8 (square) or 6 (hex axial), got {connectivity}"
        )
    offsets = _OFFSETS[connectivity]
    kernels = {}
    for i, (dx, dy) in enumerate(offsets):
        k = np.zeros((3, 3), dtype=np.int64)
        k[dx + 1, dy + 1] = 1
        kernels[f"fs{i}"] = k
    conv = focal_convolve(
        pixels, value_col, kernels,
        ix_col=ix_col, iy_col=iy_col, tile=tile, num_partitions=num_partitions,
    )
    _SENT = np.int64(2**62)

    def extremes(t: pa.Table) -> pa.Table:
        n = t.num_rows
        center = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = center.copy()
        hi = center.copy()
        npres = np.ones(n, dtype=np.int64)
        for i in range(len(offsets)):
            v = t[f"fs{i}_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
            p = t[f"fs{i}_wt"].to_numpy(zero_copy_only=False).astype(np.int64) > 0
            lo = np.minimum(lo, np.where(p, v, _SENT))
            hi = np.maximum(hi, np.where(p, v, -_SENT))
            npres += p
        out = t.drop_columns(
            [c for i in range(len(offsets)) for c in (f"fs{i}_sum", f"fs{i}_wt")]
        )
        out = out.append_column("focal_min", pa.array(lo))
        out = out.append_column("focal_max", pa.array(hi))
        out = out.append_column("focal_range", pa.array(hi - lo))
        return out.append_column("n_present", pa.array(npres))

    return conv.map_batches(extremes, batch_format="pyarrow", zero_copy_batch=True)


def grow_cells(
    pixels: Dataset,
    radius: int = 1,
    ix_col: str = "ix",
    iy_col: str = "iy",
    metric: str = "chebyshev",
    num_partitions: int = 64,
) -> Dataset:
    """Raster BUFFER / morphological dilation that CREATES cells
    (GRASS ``r.grow`` / ``r.buffer``, ArcGIS Expand): emit every cell
    within ``radius`` of an occupied cell, tagged with ``dist`` = the
    exact distance (0 ⇒ the cell was occupied) to its nearest occupied
    cell — i.e. the distance transform TRUNCATED at ``radius``.

    ``metric``: ``"chebyshev"`` (square window, max(|dx|,|dy|) — the
    8-connected growth) or ``"manhattan"`` (diamond, |dx|+|dy| — the
    4-connected growth).

    Plan: map-only fan-out of each occupied cell to its (2r+1)² window
    (diamond-pruned for manhattan) carrying the candidate distance,
    then ONE grouped MIN per target cell — the fan-out factor is
    (2r+1)², so keep ``radius`` small (≤ 4 validated; iterate for wide
    buffers) — at 10^12 cells the window copies stream through the
    exchange like any rasterize partial, nothing driver-side.

    Returns ``(ix, iy, dist)`` over the DILATED cell set.
    """
    from rayraster.agg import hash_aggregate

    if metric not in ("chebyshev", "manhattan"):
        raise ValueError(f"metric must be chebyshev|manhattan, got {metric!r}")
    if not 1 <= radius <= 4:
        raise ValueError("radius must be in 1..4 (iterate grow_cells for wider buffers)")
    offs = [
        (dx, dy)
        for dx in range(-radius, radius + 1)
        for dy in range(-radius, radius + 1)
        if metric == "chebyshev" or abs(dx) + abs(dy) <= radius
    ]
    dists = np.array(
        [max(abs(dx), abs(dy)) if metric == "chebyshev" else abs(dx) + abs(dy)
         for dx, dy in offs],
        dtype=np.int64,
    )

    def fanout(t: pa.Table) -> pa.Table:
        ix = t[ix_col].to_numpy(zero_copy_only=False).astype(np.int64)
        iy = t[iy_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ix) and (
            np.abs(ix).max() + radius >= 1 << 31
            or np.abs(iy).max() + radius >= 1 << 31
        ):
            raise ValueError("grow_cells: |ix|,|iy|+radius must be < 2^31 to pack")
        pieces = []
        for (dx, dy), d in zip(offs, dists):
            pieces.append(
                pa.table(
                    {"node": _pack(ix + dx, iy + dy),
                     "d": pa.array(np.full(len(ix), d, dtype=np.int64))}
                )
            )
        return pa.concat_tables(pieces)

    fanned = pixels.map_batches(fanout, batch_format="pyarrow", zero_copy_batch=True)
    folded = hash_aggregate(
        fanned, ["node"], min_cols=["d"], count=False,
        num_partitions=num_partitions,
    )

    def unpack(t: pa.Table) -> pa.Table:
        ix, iy = unpack_cell_key(t["node"].to_numpy(zero_copy_only=False))
        return pa.table({ix_col: ix, iy_col: iy, "dist": t["min_d"]})

    return folded.map_batches(unpack, batch_format="pyarrow")


def basin_labels(
    flows: Dataset,
    doublings: int,
    ix_col: str = "ix",
    iy_col: str = "iy",
    num_partitions: int = 64,
    node_count: int | None = None,
    driver_threshold: int = 200_000,
) -> Dataset:
    """Watershed basin labeling over a D8 direction field
    (:func:`flow_direction` output): each cell's basin is the
    pit/outlet reached by following ``down`` pointers — delineating
    drainage basins is the standard companion to flow accumulation
    (r.watershed / terra watershed; the reference's users reach to R's
    raster stack for it).

    Pointer doubling (``ptr ← ptr(ptr)`` per round) instead of
    step-at-a-time chasing: after ``doublings`` rounds every cell has
    walked ``2^doublings`` steps, so O(log longest-path) rounds reach
    the fixpoint.  D8 flow is acyclic (value strictly decreases along
    flow) and pits/outlets self-point, so the fixpoint IS the terminal
    basin cell; below convergence both engines still agree bit-for-bit
    with a twin that unrolls the SAME doubling count (pure integer
    pointer algebra, no floats anywhere).

    Same dual engine as :func:`flow_accumulation` (the graph is the
    RASTER — O(pixels) ≪ the point table):

    * ``node_count ≤ driver_threshold``: sorted node vector + one
      ``searchsorted`` gather per round on the driver; ZERO exchanges.
    * above: the pointer table stays a Dataset — ONE inner
      :func:`rayraster.join.bucket_join` of the table with itself per
      round (left keyed on ``ptr``, right on ``node``; total because
      every pointer target is an occupied cell), nothing driver-side.

    Returns ``(ix, iy, basin_ix, basin_iy)``.
    """
    from rayraster.join import bucket_join

    if doublings < 0:
        raise ValueError("doublings must be >= 0")

    def to_ptr(t: pa.Table) -> pa.Table:
        ix = t[ix_col].to_numpy(zero_copy_only=False).astype(np.int64)
        iy = t[iy_col].to_numpy(zero_copy_only=False).astype(np.int64)
        dix = t["down_ix"].to_numpy(zero_copy_only=False).astype(np.int64)
        diy = t["down_iy"].to_numpy(zero_copy_only=False).astype(np.int64)
        # flow_direction emits self-coordinates when has_down is false,
        # so (down_ix, down_iy) already encodes the self-pointing pit
        return pa.table({"node": _pack(ix, iy), "ptr": _pack(dix, diy)})

    ptr0 = flows.map_batches(to_ptr, batch_format="pyarrow")

    def emit(nodes: np.ndarray, ptrs: np.ndarray) -> pa.Table:
        ix, iy = unpack_cell_key(nodes)
        bix, biy = unpack_cell_key(ptrs)
        return pa.table(
            {ix_col: ix, iy_col: iy, "basin_ix": bix, "basin_iy": biy}
        )

    small = node_count is not None and node_count <= driver_threshold
    if small:
        gt = pa.concat_tables(ptr0.iter_batches(batch_format="pyarrow"))
        nodes = gt["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        ptrs = gt["ptr"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(nodes, kind="stable")
        nodes, ptrs = nodes[order], ptrs[order]
        for _ in range(doublings):
            ptrs = ptrs[np.searchsorted(nodes, ptrs)]
        import ray.data as rd

        return rd.from_arrow(emit(nodes, ptrs))

    p_schema = pa.schema([("node", pa.int64()), ("ptr", pa.int64())])
    h_schema = pa.schema([("node", pa.int64()), ("hop", pa.int64())])
    ptr_ds = ptr0.materialize()
    for _ in range(doublings):
        # zero-copy rename: the right side's value column must not
        # collide with the left join key (both are "ptr" otherwise)
        hop = ptr_ds.map_batches(
            lambda t: pa.table({"node": t["node"], "hop": t["ptr"]}),
            batch_format="pyarrow",
        )
        ptr_ds = bucket_join(
            ptr_ds, hop, "ptr", "node", join_type="inner",
            left_schema=p_schema, right_schema=h_schema,
            num_buckets=num_partitions,
        ).map_batches(
            lambda t: pa.table({"node": t["node"], "ptr": t["hop"]}),
            batch_format="pyarrow",
        ).materialize()

    def unpack(t: pa.Table) -> pa.Table:
        return emit(
            t["node"].to_numpy(zero_copy_only=False),
            t["ptr"].to_numpy(zero_copy_only=False),
        )

    return ptr_ds.map_batches(unpack, batch_format="pyarrow")


def cost_distance(
    pixels: Dataset,
    sources: Dataset,
    rounds: int,
    cost_col: str = "cost",
    ix_col: str = "ix",
    iy_col: str = "iy",
    num_partitions: int = 64,
    node_count: int | None = None,
    driver_threshold: int = 200_000,
) -> Dataset:
    """Least-cost distance over a sparse cost raster (r.cost / terra
    ``costDist``): ``dist(p) = min over 8-neighbors q of
    dist(q) + cost(p)`` (cost of ENTERING p; sources cost 0), relaxed
    with ``rounds`` synchronous min-plus Jacobi iterations — Bellman-
    Ford on the lattice.  At ``rounds ≥`` the longest optimal path this
    is the exact cost distance; below it both engines agree bit-for-bit
    with a twin that unrolls the SAME round count (pure int64 min-plus,
    no floats).  Cells not reached within ``rounds`` hops are absent
    from the output (the twin's iterated frontier produces the same
    set).

    Same dual engine as :func:`flow_accumulation`:

    * ``node_count ≤ driver_threshold``: per-offset (p, q) index pairs
      built once with ``searchsorted``; each round is one vectorized
      gather + ``np.minimum.at`` into a COPY (Jacobi, not Gauss-Seidel
      — the twin is synchronous); ZERO exchanges.
    * above: the dist table stays a Dataset — the (p, q, cost_p) edge
      table is built ONCE (map-only 8-way fan-out + one semi
      :func:`rayraster.join.bucket_join` against the occupied set),
      then per round ONE inner bucket join (edges ⋈ dist on q) + ONE
      grouped-min fold.

    ``cost_col`` must be non-negative int64 (negative min-plus on a
    cyclic lattice never converges — validated on the fly).

    Returns ``(ix, iy, dist)``.
    """
    from rayraster.agg import hash_aggregate
    from rayraster.join import bucket_join

    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    _SENT = np.int64(1) << 62

    def to_nodes(t: pa.Table) -> pa.Table:
        ix = t[ix_col].to_numpy(zero_copy_only=False).astype(np.int64)
        iy = t[iy_col].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t[cost_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(c) and c.min() < 0:
            raise ValueError(f"{cost_col} must be non-negative")
        return pa.table({"node": _pack(ix, iy), "cost": c})

    def src_nodes(t: pa.Table) -> pa.Table:
        ix = t[ix_col].to_numpy(zero_copy_only=False).astype(np.int64)
        iy = t[iy_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": _pack(ix, iy)})

    nodes_ds = pixels.map_batches(to_nodes, batch_format="pyarrow")
    srcs_ds = sources.map_batches(src_nodes, batch_format="pyarrow")

    def emit(nodes: np.ndarray, dist: np.ndarray) -> pa.Table:
        keep = dist < _SENT
        ix, iy = unpack_cell_key(nodes[keep])
        return pa.table({ix_col: ix, iy_col: iy, "dist": dist[keep]})

    small = node_count is not None and node_count <= driver_threshold
    if small:
        gt = pa.concat_tables(nodes_ds.iter_batches(batch_format="pyarrow"))
        nodes = gt["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        cost = gt["cost"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(nodes, kind="stable")
        nodes, cost = nodes[order], cost[order]
        st = pa.concat_tables(srcs_ds.iter_batches(batch_format="pyarrow"))
        sk = st["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        si = np.searchsorted(nodes, sk)
        if (si >= len(nodes)).any() or (nodes[np.minimum(si, len(nodes) - 1)] != sk).any():
            raise ValueError("a source cell is not an occupied pixel")
        ix_all, iy_all = unpack_cell_key(nodes)
        pis, qis = [], []
        for dx, dy in FLOW_OFFSETS:
            want = _pack(ix_all + dx, iy_all + dy)
            idx = np.searchsorted(nodes, want)
            ok = (idx < len(nodes)) & (nodes[np.minimum(idx, len(nodes) - 1)] == want)
            pis.append(np.flatnonzero(ok))
            qis.append(idx[ok])
        pi = np.concatenate(pis) if pis else np.empty(0, np.int64)
        qi = np.concatenate(qis) if qis else np.empty(0, np.int64)
        dist = np.full(len(nodes), _SENT, dtype=np.int64)
        dist[si] = 0
        for _ in range(rounds):
            new = dist.copy()
            reach = dist[qi] < _SENT
            np.minimum.at(
                new, pi[reach], dist[qi[reach]] + cost[pi[reach]]
            )
            dist = new
        import ray.data as rd

        return rd.from_arrow(emit(nodes, dist))

    d_schema = pa.schema([("node", pa.int64()), ("d", pa.int64())])
    e_schema = pa.schema(
        [("node", pa.int64()), ("cost", pa.int64()), ("q", pa.int64())]
    )

    def fanout(t: pa.Table) -> pa.Table:
        n = t["node"].to_numpy(zero_copy_only=False)
        c = t["cost"].to_numpy(zero_copy_only=False)
        ix, iy = unpack_cell_key(n)
        pieces = []
        for dx, dy in FLOW_OFFSETS:
            pieces.append(
                pa.table({"node": n, "cost": c, "q": _pack(ix + dx, iy + dy)})
            )
        return pa.concat_tables(pieces)

    nodes_mat = nodes_ds.materialize()
    occupied = nodes_mat.map_batches(
        lambda t: t.select(["node"]), batch_format="pyarrow"
    )
    edges = bucket_join(
        nodes_mat.map_batches(fanout, batch_format="pyarrow"),
        occupied.map_batches(
            lambda t: pa.table({"occ": t["node"]}), batch_format="pyarrow"
        ),
        "q", "occ", join_type="semi",
        left_schema=e_schema,
        right_schema=pa.schema([("occ", pa.int64())]),
        num_buckets=num_partitions,
    ).materialize()
    # the driver engine validates every source against the occupied
    # set; the distributed engine must enforce the SAME contract or
    # the two diverge (a phantom (src, 0) row for an unoccupied cell)
    srcs_mat = srcs_ds.materialize()
    n_src = srcs_mat.count()
    n_hit = bucket_join(
        srcs_mat, occupied, "node", "node", join_type="semi",
        left_schema=pa.schema([("node", pa.int64())]),
        right_schema=pa.schema([("node", pa.int64())]),
        num_buckets=num_partitions,
    ).count()
    if n_hit != n_src:
        raise ValueError("a source cell is not an occupied pixel")
    dist_ds = srcs_mat.map_batches(
        lambda t: t.append_column(
            "d", pa.array(np.zeros(t.num_rows, dtype=np.int64))
        ),
        batch_format="pyarrow",
    ).materialize()
    for _ in range(rounds):
        contrib = bucket_join(
            edges, dist_ds, "q", "node", join_type="inner",
            left_schema=e_schema, right_schema=d_schema,
            num_buckets=num_partitions,
        ).map_batches(
            lambda t: pa.table(
                {"node": t["node"],
                 "d": pa.compute.add(t["d"], t["cost"]).cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
        dist_ds = hash_aggregate(
            dist_ds.union(contrib), ["node"], min_cols=["d"], count=False,
            num_partitions=num_partitions,
        ).map_batches(
            lambda t: pa.table({"node": t["node"], "d": t["min_d"]}),
            batch_format="pyarrow",
        ).materialize()

    def unpack(t: pa.Table) -> pa.Table:
        ix, iy = unpack_cell_key(t["node"].to_numpy(zero_copy_only=False))
        return pa.table({ix_col: ix, iy_col: iy, "dist": t["d"]})

    return dist_ds.map_batches(unpack, batch_format="pyarrow")


def cost_allocation(
    pixels: Dataset,
    sources: Dataset,
    rounds: int,
    cost_col: str = "cost",
    ix_col: str = "ix",
    iy_col: str = "iy",
    num_partitions: int = 64,
    node_count: int | None = None,
    driver_threshold: int = 200_000,
) -> Dataset:
    """Cost ALLOCATION (ArcGIS Cost Allocation / GRASS ``r.cost``
    with ``nearest``): label every reached cell with the SOURCE it is
    cheapest to reach it from, alongside the least-cost distance —
    the cost-weighted Voronoi partition of the raster.  Ties at equal
    cost break to the source with the smaller packed ``(ix, iy)`` key
    (deterministic, partitioning-invariant).

    One trick makes this the SAME min-plus Jacobi as
    :func:`cost_distance` with zero extra exchanges: the state packs
    ``(dist << k) | src_idx`` into one int64 (``k`` = bits for the
    source index, sources enumerated in sorted-key order), so

        relax:  state' = min(state, state_q + (cost_p << k))

    — adding a shifted cost preserves the source bits, and the numeric
    min of packed states IS the lexicographic ``(dist, src_idx)`` min.
    Both engines (driver-array below ``driver_threshold``, bucket-join
    Dataset above) relax the packed state identically, so they agree
    bit-for-bit at ANY round count.

    Bounds (validated): ≤ 2^20 sources (the idx field), every
    ``dist < 2^(62−k)``; source keys are enumerated on the driver —
    a bounded materialization like ``kmeans_centroids``' sample (the
    source set of an allocation is small by construction; the COST
    RASTER never lands on the driver in the large engine).

    Returns ``(ix, iy, dist, src_ix, src_iy)`` over cells reached
    within ``rounds`` hops.
    """
    from rayraster.agg import hash_aggregate
    from rayraster.join import bucket_join

    if rounds < 0:
        raise ValueError("rounds must be >= 0")

    def to_nodes(t: pa.Table) -> pa.Table:
        ix = t[ix_col].to_numpy(zero_copy_only=False).astype(np.int64)
        iy = t[iy_col].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t[cost_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(c) and c.min() < 0:
            raise ValueError(f"{cost_col} must be non-negative")
        return pa.table({"node": _pack(ix, iy), "cost": c})

    def src_nodes(t: pa.Table) -> pa.Table:
        ix = t[ix_col].to_numpy(zero_copy_only=False).astype(np.int64)
        iy = t[iy_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": _pack(ix, iy)})

    nodes_ds = pixels.map_batches(to_nodes, batch_format="pyarrow")
    srcs_ds = sources.map_batches(src_nodes, batch_format="pyarrow")

    # enumerate sources deterministically (sorted packed key = idx)
    st = pa.concat_tables(srcs_ds.iter_batches(batch_format="pyarrow"))
    sk = np.unique(st["node"].to_numpy(zero_copy_only=False).astype(np.int64))
    n_src = len(sk)
    if n_src == 0:
        raise ValueError("cost_allocation: no sources")
    if n_src > 1 << 20:
        raise ValueError("cost_allocation: > 2^20 sources — the packed idx field is 20 bits")
    k = max(1, int(n_src - 1).bit_length())
    _SENT = np.int64(1) << 62
    cost_cap = int(_SENT - 1) >> k

    def emit(nodes: np.ndarray, state: np.ndarray) -> pa.Table:
        keep = state < _SENT
        ix, iy = unpack_cell_key(nodes[keep])
        d = state[keep] >> k
        si = (state[keep] & ((np.int64(1) << k) - 1)).astype(np.int64)
        six, siy = unpack_cell_key(sk[si])
        return pa.table(
            {ix_col: ix, iy_col: iy, "dist": d, "src_ix": six, "src_iy": siy}
        )

    small = node_count is not None and node_count <= driver_threshold
    if small:
        gt = pa.concat_tables(nodes_ds.iter_batches(batch_format="pyarrow"))
        nodes = gt["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        cost = gt["cost"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(cost) and cost.max() > cost_cap:
            raise ValueError("cost_allocation: cost too large for the packed state")
        order = np.argsort(nodes, kind="stable")
        nodes, cost = nodes[order], cost[order]
        si = np.searchsorted(nodes, sk)
        if (si >= len(nodes)).any() or (nodes[np.minimum(si, len(nodes) - 1)] != sk).any():
            raise ValueError("a source cell is not an occupied pixel")
        ix_all, iy_all = unpack_cell_key(nodes)
        pis, qis = [], []
        for dx, dy in FLOW_OFFSETS:
            want = _pack(ix_all + dx, iy_all + dy)
            idx = np.searchsorted(nodes, want)
            ok = (idx < len(nodes)) & (nodes[np.minimum(idx, len(nodes) - 1)] == want)
            pis.append(np.flatnonzero(ok))
            qis.append(idx[ok])
        pi = np.concatenate(pis) if pis else np.empty(0, np.int64)
        qi = np.concatenate(qis) if qis else np.empty(0, np.int64)
        state = np.full(len(nodes), _SENT, dtype=np.int64)
        state[si] = np.arange(n_src, dtype=np.int64)  # dist 0, own idx
        shifted = cost << k
        for _ in range(rounds):
            new = state.copy()
            reach = state[qi] < _SENT
            np.minimum.at(new, pi[reach], state[qi[reach]] + shifted[pi[reach]])
            state = new
        import ray.data as rd

        return rd.from_arrow(emit(nodes, state))

    s_schema = pa.schema([("node", pa.int64()), ("d", pa.int64())])
    e_schema = pa.schema(
        [("node", pa.int64()), ("cost", pa.int64()), ("q", pa.int64())]
    )

    def fanout(t: pa.Table) -> pa.Table:
        n = t["node"].to_numpy(zero_copy_only=False)
        c = t["cost"].to_numpy(zero_copy_only=False)
        if len(c) and c.max() > cost_cap:
            raise ValueError("cost_allocation: cost too large for the packed state")
        ix, iy = unpack_cell_key(n)
        pieces = []
        for dx, dy in FLOW_OFFSETS:
            pieces.append(
                pa.table({"node": n, "cost": c, "q": _pack(ix + dx, iy + dy)})
            )
        return pa.concat_tables(pieces)

    nodes_mat = nodes_ds.materialize()
    occupied = nodes_mat.map_batches(
        lambda t: pa.table({"occ": t["node"]}), batch_format="pyarrow"
    )
    edges = bucket_join(
        nodes_mat.map_batches(fanout, batch_format="pyarrow"),
        occupied,
        "q", "occ", join_type="semi",
        left_schema=e_schema,
        right_schema=pa.schema([("occ", pa.int64())]),
        num_buckets=num_partitions,
    ).materialize()
    import ray.data as rd

    # same source-occupancy contract as the driver engine (sk is
    # already on the driver here): every source must be an occupied
    # pixel or the engines diverge
    skv = pa.array(np.unique(sk))
    hit = 0
    for t in occupied.map_batches(
        lambda t: pa.table({"h": pa.array(
            [int(pa.compute.sum(
                pa.compute.is_in(t["occ"], value_set=skv)
            ).as_py() or 0)], type=pa.int64())}),
        batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow"):
        hit += int(pa.compute.sum(t["h"]).as_py() or 0)
    if hit != len(skv):
        raise ValueError("a source cell is not an occupied pixel")
    init = pa.table(
        {"node": pa.array(sk), "d": pa.array(np.arange(n_src, dtype=np.int64))}
    )
    state_ds = rd.from_arrow(init).materialize()
    kk = np.int64(k)
    for _ in range(rounds):
        contrib = bucket_join(
            edges, state_ds, "q", "node", join_type="inner",
            left_schema=e_schema, right_schema=s_schema,
            num_buckets=num_partitions,
        ).map_batches(
            lambda t: pa.table(
                {"node": t["node"],
                 "d": pa.array(
                     t["d"].to_numpy(zero_copy_only=False).astype(np.int64)
                     + (t["cost"].to_numpy(zero_copy_only=False).astype(np.int64) << kk)
                 )}
            ),
            batch_format="pyarrow",
        )
        state_ds = hash_aggregate(
            state_ds.union(contrib), ["node"], min_cols=["d"], count=False,
            num_partitions=num_partitions,
        ).map_batches(
            lambda t: pa.table({"node": t["node"], "d": t["min_d"]}),
            batch_format="pyarrow",
        ).materialize()

    def unpack(t: pa.Table) -> pa.Table:
        nodes = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        state = t["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        return emit(nodes, state)

    return state_ds.map_batches(unpack, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Marching squares: per-block contour case index + edge crossings
# ---------------------------------------------------------------------------

#: fixed edge order (the SQL twin and tsum addition order):
#: bottom (v00→v10), right (v10→v11), top (v01→v11), left (v00→v01)
_MS_EDGES = (("b0", "b1", "v00", "v10"), ("b1", "b2", "v10", "v11"),
             ("b3", "b2", "v01", "v11"), ("b0", "b3", "v00", "v01"))


def contour_cases(
    pixels: Dataset,
    value_col: str,
    threshold: int,
    ix_col: str = "ix",
    iy_col: str = "iy",
    tile: int = 64,
    num_partitions: int = 64,
) -> Dataset:
    """Marching squares (Lorensen-style 2D) over a sparse int raster —
    the raster→vector isoline front half: for every 2×2 block anchored
    at an occupied pixel, the 4-bit case index of ``value > threshold``
    (missing corners are background 0), the number of crossed block
    edges, and ``tsum`` = the sum of the linear-interpolation
    parameters ``t = (T − va)/(vb − va)`` over crossed edges in the
    fixed :data:`_MS_EDGES` order (each t places the isoline crossing
    on its edge; downstream segment assembly is pure per-case lookup).
    Blocks with case 0 (all below) or 15 (all above) are dropped.

    ONE exchange: the three non-anchor corners arrive through
    :func:`focal_convolve`'s shared tile+halo shuffle (single-offset
    kernels), everything after is a local vectorized pass.  Bit
    discipline: corner compares and the case index are exact ints; each
    ``t`` is one double division of exact ints and ``tsum`` adds them
    in written order — a SQL twin reproduces both bit-for-bit.
    Crossed edges always have ``va ≠ vb`` (their compare bits differ),
    so the division is safe.
    """
    kernels = {}
    for name, (dx, dy) in (("e10", (1, 0)), ("e01", (0, 1)), ("e11", (1, 1))):
        k = np.zeros((3, 3), dtype=np.int64)
        k[dx + 1, dy + 1] = 1
        kernels[name] = k
    conv = focal_convolve(
        pixels, value_col, kernels,
        ix_col=ix_col, iy_col=iy_col, tile=tile, num_partitions=num_partitions,
    )
    T = int(threshold)

    def cases(t: pa.Table) -> pa.Table:
        v00 = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v10 = t["e10_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        v01 = t["e01_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        v11 = t["e11_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        corners = {"v00": v00, "v10": v10, "v01": v01, "v11": v11}
        bits = {
            "b0": v00 > T, "b1": v10 > T, "b2": v11 > T, "b3": v01 > T,
        }
        case = (
            bits["b0"].astype(np.int64)
            + 2 * bits["b1"].astype(np.int64)
            + 4 * bits["b2"].astype(np.int64)
            + 8 * bits["b3"].astype(np.int64)
        )
        keep = (case != 0) & (case != 15)
        tsum = np.zeros(len(v00), dtype=np.float64)
        ncross = np.zeros(len(v00), dtype=np.int64)
        for ba, bb_, ca, cb in _MS_EDGES:
            crossed = bits[ba] != bits[bb_]
            va = corners[ca].astype(np.float64)
            vb = corners[cb].astype(np.float64)
            tv = np.where(
                crossed,
                (np.float64(T) - va) / np.where(crossed, vb - va, 1.0),
                0.0,
            )
            tsum = tsum + tv
            ncross = ncross + crossed.astype(np.int64)
        out = pa.table(
            {ix_col: t[ix_col], iy_col: t[iy_col],
             "case": pa.array(case), "ncross": pa.array(ncross),
             "tsum": pa.array(tsum),
             "v00": t[value_col].cast(pa.int64())}
        )
        return out.filter(pa.array(keep))

    return conv.map_batches(cases, batch_format="pyarrow", zero_copy_batch=True)


#: per-case crossed-edge pairings (edges 0=bottom 1=right 2=top
#: 3=left); saddles 5/10 use the FIXED two-segment convention
#: (no center disambiguation — deterministic, documented)
_MS_SEGMENTS = {
    1: [(3, 0)], 2: [(0, 1)], 3: [(3, 1)], 4: [(1, 2)],
    5: [(3, 0), (1, 2)], 6: [(0, 2)], 7: [(3, 2)], 8: [(2, 3)],
    9: [(0, 2)], 10: [(0, 1), (2, 3)], 11: [(1, 2)], 12: [(3, 1)],
    13: [(0, 1)], 14: [(3, 0)],
}


def contour_segments(
    pixels: Dataset,
    value_col: str,
    threshold: int,
    x0: float,
    y0: float,
    res: float,
    ix_col: str = "ix",
    iy_col: str = "iy",
    tile: int = 64,
    num_partitions: int = 64,
) -> Dataset:
    """Marching-squares ISOLINE SEGMENTS in world coordinates — the
    back half of :func:`contour_cases` (GDAL ``gdal_contour`` / terra
    ``as.contour``): for every 2×2 block, the 1–2 line segments of the
    ``value = threshold`` isoline, endpoints linearly interpolated on
    the crossed edges between cell CENTROIDS.

    Unlike :func:`contour_cases` (blocks anchored at OCCUPIED pixels —
    the oracle-pinned front half), the segment operator first expands
    the anchor set to every block with ≥ 1 occupied corner (a map-only
    4-way shift fan-out + ONE grouped sum; empty anchors carry value
    0) — without this, loops around cells whose south-west diagonal
    neighbors are empty would not close.  Then the same tile+halo
    exchange gathers the three non-anchor corners and everything after
    is a local vectorized pass over the 14 case patterns.  Saddle
    cases 5/10 use a fixed two-segment convention (b0/b2 and b1/b3
    corners isolated, respectively) — deterministic without a center
    sample.  Every interior edge crossing is shared by exactly TWO
    blocks, so the emitted segments chain into CLOSED loops around
    each super-threshold region (pytest-pinned endpoint-degree law).

    Returns ``(ix, iy, seg, x1, y1, x2, y2)`` — ``seg`` is 0/1 within
    the block.
    """
    from rayraster.agg import hash_aggregate

    if threshold < 0:
        # missing cells are background 0; a negative threshold would
        # put the UNBOUNDED background above the isoline
        raise ValueError("threshold must be >= 0 (background is 0)")

    def expand(t: pa.Table) -> pa.Table:
        ix = t[ix_col].to_numpy(zero_copy_only=False).astype(np.int64)
        iy = t[iy_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        z = np.zeros(len(v), dtype=np.int64)
        pieces = []
        for dx, dy, val in ((0, 0, v), (-1, 0, z), (0, -1, z), (-1, -1, z)):
            pieces.append(
                pa.table({ix_col: ix + dx, iy_col: iy + dy, "_v": val})
            )
        return pa.concat_tables(pieces)

    anchors = hash_aggregate(
        pixels.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True),
        [ix_col, iy_col], sum_cols=["_v"], count=False,
        num_partitions=num_partitions,
    ).map_batches(
        lambda t: pa.table(
            {ix_col: t[ix_col], iy_col: t[iy_col], value_col: t["sum__v"]}
        ),
        batch_format="pyarrow",
    )

    kernels = {}
    for name, (dx, dy) in (("e10", (1, 0)), ("e01", (0, 1)), ("e11", (1, 1))):
        k = np.zeros((3, 3), dtype=np.int64)
        k[dx + 1, dy + 1] = 1
        kernels[name] = k
    conv = focal_convolve(
        anchors, value_col, kernels,
        ix_col=ix_col, iy_col=iy_col, tile=tile, num_partitions=num_partitions,
    )
    T = int(threshold)

    def segs(t: pa.Table) -> pa.Table:
        ix = t[ix_col].to_numpy(zero_copy_only=False).astype(np.int64)
        iy = t[iy_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v00 = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v10 = t["e10_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        v01 = t["e01_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        v11 = t["e11_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        corners = {"v00": v00, "v10": v10, "v01": v01, "v11": v11}
        bits = {
            "b0": v00 > T, "b1": v10 > T, "b2": v11 > T, "b3": v01 > T,
        }
        case = (
            bits["b0"].astype(np.int64)
            + 2 * bits["b1"].astype(np.int64)
            + 4 * bits["b2"].astype(np.int64)
            + 8 * bits["b3"].astype(np.int64)
        )
        cx = x0 + (ix.astype(np.float64) + 0.5) * res
        cy = y0 + (iy.astype(np.float64) + 0.5) * res
        ex, ey = [], []  # crossing point per edge (valid where crossed)
        for ei, (ba, bb_, ca, cb) in enumerate(_MS_EDGES):
            crossed = bits[ba] != bits[bb_]
            va = corners[ca].astype(np.float64)
            vb = corners[cb].astype(np.float64)
            tv = np.where(
                crossed,
                (np.float64(T) - va) / np.where(crossed, vb - va, 1.0),
                0.0,
            )
            if ei == 0:    # bottom: v00 -> v10
                ex.append(cx + tv * res); ey.append(cy)
            elif ei == 1:  # right: v10 -> v11
                ex.append(cx + res);      ey.append(cy + tv * res)
            elif ei == 2:  # top: v01 -> v11
                ex.append(cx + tv * res); ey.append(cy + res)
            else:          # left: v00 -> v01
                ex.append(cx);            ey.append(cy + tv * res)
        o_ix, o_iy, o_seg, o_x1, o_y1, o_x2, o_y2 = [], [], [], [], [], [], []
        for c, pairs in _MS_SEGMENTS.items():
            m = case == c
            if not m.any():
                continue
            for si, (e1, e2) in enumerate(pairs):
                o_ix.append(ix[m]); o_iy.append(iy[m])
                o_seg.append(np.full(int(m.sum()), si, dtype=np.int64))
                o_x1.append(ex[e1][m]); o_y1.append(ey[e1][m])
                o_x2.append(ex[e2][m]); o_y2.append(ey[e2][m])
        if not o_ix:
            return pa.table(
                {ix_col: pa.array([], pa.int64()),
                 iy_col: pa.array([], pa.int64()),
                 "seg": pa.array([], pa.int64()),
                 "x1": pa.array([], pa.float64()),
                 "y1": pa.array([], pa.float64()),
                 "x2": pa.array([], pa.float64()),
                 "y2": pa.array([], pa.float64())}
            )
        return pa.table(
            {ix_col: np.concatenate(o_ix), iy_col: np.concatenate(o_iy),
             "seg": np.concatenate(o_seg),
             "x1": np.concatenate(o_x1), "y1": np.concatenate(o_y1),
             "x2": np.concatenate(o_x2), "y2": np.concatenate(o_y2)}
        )

    return conv.map_batches(segs, batch_format="pyarrow", zero_copy_batch=True)


def contour_sql(
    px_rel: str,
    value_col: str,
    threshold: int,
    ix_col: str = "ix",
    iy_col: str = "iy",
) -> str:
    """DuckDB twin of :func:`contour_cases` over ``px_rel``, a relation
    of (ix, iy, value) — 3 LEFT self-joins for the corners (COALESCE 0
    = background), identical bit/edge/tsum expressions."""
    T = int(threshold)
    v00, v10, v01, v11 = (
        f"CAST(p.{value_col} AS BIGINT)",
        "COALESCE(q10.v, 0)", "COALESCE(q01.v, 0)", "COALESCE(q11.v, 0)",
    )
    b = {
        "b0": f"({v00} > {T})", "b1": f"({v10} > {T})",
        "b2": f"({v11} > {T})", "b3": f"({v01} > {T})",
    }
    corner = {"v00": v00, "v10": v10, "v01": v01, "v11": v11}
    case = (
        f"(CAST({b['b0']} AS BIGINT) + 2 * CAST({b['b1']} AS BIGINT)"
        f" + 4 * CAST({b['b2']} AS BIGINT) + 8 * CAST({b['b3']} AS BIGINT))"
    )
    t_terms, n_terms = [], []
    for ba, bb_, ca, cb in _MS_EDGES:
        crossed = f"({b[ba]} <> {b[bb_]})"
        va = f"CAST({corner[ca]} AS DOUBLE)"
        vb = f"CAST({corner[cb]} AS DOUBLE)"
        t_terms.append(
            f"CASE WHEN {crossed} THEN "
            f"(CAST({T} AS DOUBLE) - {va}) / ({vb} - {va}) ELSE 0.0 END"
        )
        n_terms.append(f"CAST({crossed} AS BIGINT)")
    tsum = " + ".join(t_terms)
    ncross = " + ".join(n_terms)
    return f"""SELECT ix, iy, "case", ncross, tsum, v00 FROM (
  SELECT p.{ix_col} AS ix, p.{iy_col} AS iy,
         {case} AS "case", {ncross} AS ncross, {tsum} AS tsum,
         {v00} AS v00
  FROM {px_rel} p
  LEFT JOIN (SELECT {ix_col} AS ix, {iy_col} AS iy,
                    CAST({value_col} AS BIGINT) AS v FROM {px_rel}) q10
         ON q10.ix = p.{ix_col} + 1 AND q10.iy = p.{iy_col}
  LEFT JOIN (SELECT {ix_col} AS ix, {iy_col} AS iy,
                    CAST({value_col} AS BIGINT) AS v FROM {px_rel}) q01
         ON q01.ix = p.{ix_col} AND q01.iy = p.{iy_col} + 1
  LEFT JOIN (SELECT {ix_col} AS ix, {iy_col} AS iy,
                    CAST({value_col} AS BIGINT) AS v FROM {px_rel}) q11
         ON q11.ix = p.{ix_col} + 1 AND q11.iy = p.{iy_col} + 1
) WHERE "case" NOT IN (0, 15)"""


# ---------------------------------------------------------------------------
# Viewshed: single-observer discrete line-of-sight visibility
# ---------------------------------------------------------------------------


def viewshed_observer(
    pixels: Dataset,
    value_col: str,
    ix_col: str = "ix",
    iy_col: str = "iy",
) -> tuple[int, int, int]:
    """Deterministic observer pick for :func:`viewshed`: the cell with
    the MAXIMUM ``value_col`` (highest elevation), ties broken by the
    lowest packed ``(ix, iy)`` key — the twin's
    ``ORDER BY e DESC, ix, iy LIMIT 1``.

    Map-only: each batch reduces to its own one-row champion, the
    driver folds the tiny per-batch rows (never the raster).  Returns
    ``(ox, oy, eo)`` Python ints.
    """

    def best(t: pa.Table) -> pa.Table:
        ix = t[ix_col].to_numpy(zero_copy_only=False).astype(np.int64)
        iy = t[iy_col].to_numpy(zero_copy_only=False).astype(np.int64)
        e = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(e):
            return pa.table(
                {"k": pa.array([], pa.int64()), "e": pa.array([], pa.int64())}
            )
        key = _pack(ix, iy)
        top = e == e.max()
        i = np.flatnonzero(top)[np.argmin(key[top])]
        return pa.table({"k": key[i : i + 1], "e": e[i : i + 1]})

    rows = pa.concat_tables(
        pixels.map_batches(best, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    if not rows.num_rows:
        raise ValueError("viewshed_observer: empty raster")
    k = rows["k"].to_numpy(zero_copy_only=False).astype(np.int64)
    e = rows["e"].to_numpy(zero_copy_only=False).astype(np.int64)
    top = e == e.max()
    i = np.flatnonzero(top)[np.argmin(k[top])]
    ox, oy = unpack_cell_key(k[i : i + 1])
    return int(ox[0]), int(oy[0]), int(e[i])


def viewshed(
    pixels: Dataset,
    value_col: str,
    observer: tuple[int, int, int] | None = None,
    ix_col: str = "ix",
    iy_col: str = "iy",
    num_partitions: int = 64,
) -> Dataset:
    """Single-observer viewshed (GRASS ``r.viewshed`` semantics, the
    O(N·L) "R3" exact algorithm of Franklin & Ray 1994) over a sparse
    elevation raster ``(ix, iy, value_col)`` — reference analogy: the
    per-pixel visibility overlay a SEraster user would compute from the
    rasterized surface (R/main.R:139's per-pixel frame).

    Discrete semantics (bit-exact, integer-only comparisons): target
    ``t`` at Chebyshev distance ``n`` from observer ``o`` is VISIBLE
    iff for every ``k ∈ [1, n-1]`` the line sample at parameter ``k/n``
    — the cell ``o + floor(k·(t−o)/n + 0.5)`` component-wise, elevation
    0 where the raster has no cell — satisfies
    ``(e_s − e_o)·n < (e_t − e_o)·k`` (cross-multiplied elevation-angle
    test, no division).  Cells with ``n ≤ 1`` are visible by
    definition.  Requires ``max|e|·grid_diameter < 2^62`` (int64
    products; the twin's BIGINT overflows loudly at the same bound).

    100-TB shape: sample generation is a map-only ragged fan-out
    (Σ(n−1) rows), the elevation lookup is ONE hash-partitioned
    :func:`rayraster.join.bucket_join` (left, missing ⇒ 0), the
    per-target reduction is ONE grouped max — two exchanges total, no
    broadcast of the raster and nothing driver-side (the observer pick
    folds one row per batch).

    Returns ``(ix, iy, vis)`` with ``vis ∈ {0, 1}`` int64, one row per
    input cell.
    """
    from rayraster.agg import hash_aggregate
    from rayraster.join import bucket_join

    if observer is None:
        observer = viewshed_observer(pixels, value_col, ix_col, iy_col)
    ox, oy, eo = (int(v) for v in observer)

    def to_nodes(t: pa.Table) -> pa.Table:
        ix = t[ix_col].to_numpy(zero_copy_only=False).astype(np.int64)
        iy = t[iy_col].to_numpy(zero_copy_only=False).astype(np.int64)
        e = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": _pack(ix, iy), "es": e})

    nodes = pixels.map_batches(to_nodes, batch_format="pyarrow").materialize()
    n_schema = pa.schema([("node", pa.int64()), ("es", pa.int64())])
    s_schema = pa.schema(
        [("tkey", pa.int64()), ("skey", pa.int64()), ("n", pa.int64()),
         ("k", pa.int64()), ("et", pa.int64())]
    )

    def fanout(t: pa.Table) -> pa.Table:
        key = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        e = t["es"].to_numpy(zero_copy_only=False).astype(np.int64)
        ix, iy = unpack_cell_key(key)
        dx, dy = ix - ox, iy - oy
        n = np.maximum(np.abs(dx), np.abs(dy))
        m = np.maximum(n - 1, 0)
        tot = int(m.sum())
        if not tot:
            return s_schema.empty_table()
        idx = np.repeat(np.arange(len(n)), m)
        k = np.arange(tot, dtype=np.int64) - np.repeat(np.cumsum(m) - m, m) + 1
        nn = n[idx]
        # float expression order matches the twin exactly:
        # CAST(dx*k AS DOUBLE) / CAST(n AS DOUBLE) + 0.5, floor
        sx = ox + np.floor(
            (dx[idx] * k).astype(np.float64) / nn.astype(np.float64) + 0.5
        ).astype(np.int64)
        sy = oy + np.floor(
            (dy[idx] * k).astype(np.float64) / nn.astype(np.float64) + 0.5
        ).astype(np.int64)
        return pa.table(
            {"tkey": key[idx], "skey": _pack(sx, sy), "n": nn, "k": k,
             "et": e[idx]}
        )

    samples = nodes.map_batches(fanout, batch_format="pyarrow")
    joined = bucket_join(
        samples, nodes, "skey", "node", join_type="left",
        left_schema=s_schema, right_schema=n_schema,
        num_buckets=num_partitions,
    )

    def blocked(t: pa.Table) -> pa.Table:
        es = pa.compute.fill_null(t["es"], 0).to_numpy(zero_copy_only=False)
        es = es.astype(np.int64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = t["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = t["et"].to_numpy(zero_copy_only=False).astype(np.int64)
        blk = ((es - eo) * n >= (et - eo) * k).astype(np.int64)
        return pa.table({"tkey": t["tkey"], "blk": blk})

    far = hash_aggregate(
        joined.map_batches(blocked, batch_format="pyarrow"),
        ["tkey"], max_cols=["blk"], count=False,
        num_partitions=num_partitions,
    )

    def far_out(t: pa.Table) -> pa.Table:
        ix, iy = unpack_cell_key(t["tkey"].to_numpy(zero_copy_only=False))
        blk = t["max_blk"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({ix_col: ix, iy_col: iy, "vis": 1 - blk})

    def near_out(t: pa.Table) -> pa.Table:
        key = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        ix, iy = unpack_cell_key(key)
        keep = np.maximum(np.abs(ix - ox), np.abs(iy - oy)) <= 1
        return pa.table(
            {ix_col: ix[keep], iy_col: iy[keep],
             "vis": np.ones(int(keep.sum()), dtype=np.int64)}
        )

    return far.map_batches(far_out, batch_format="pyarrow").union(
        nodes.map_batches(near_out, batch_format="pyarrow")
    )


def viewshed_sql(
    px_rel: str,
    value_col: str,
    ix_col: str = "ix",
    iy_col: str = "iy",
) -> str:
    """DuckDB twin of :func:`viewshed` with the
    :func:`viewshed_observer` pick, over ``px_rel`` (ix, iy, value) —
    returns a full SELECT of ``(ix, iy, vis)``.  LATERAL
    ``generate_series`` reproduces the ragged sample fan-out; the
    rounding expression is the identical IEEE float op sequence."""
    v = f"CAST({value_col} AS BIGINT)"
    return f"""SELECT t.{ix_col} AS ix, t.{iy_col} AS iy,
       CAST(CASE WHEN t.n <= 1 THEN 1
                 ELSE 1 - COALESCE(b.blocked, 0) END AS BIGINT) AS vis
FROM (
  SELECT p.{ix_col}, p.{iy_col}, {v} AS et, o.ox, o.oy, o.eo,
         greatest(abs(p.{ix_col} - o.ox), abs(p.{iy_col} - o.oy)) AS n
  FROM {px_rel} p CROSS JOIN
       (SELECT {ix_col} AS ox, {iy_col} AS oy, {v} AS eo FROM {px_rel}
        ORDER BY {v} DESC, {ix_col}, {iy_col} LIMIT 1) o
) t
LEFT JOIN (
  SELECT s.ix, s.iy,
         MAX(CASE WHEN (COALESCE(CAST(p.{value_col} AS BIGINT), 0) - s.eo) * s.n
                  >= (s.et - s.eo) * s.k THEN 1 ELSE 0 END) AS blocked
  FROM (
    SELECT t.{ix_col} AS ix, t.{iy_col} AS iy, t.n, t.et, t.eo, g.k,
           t.ox + CAST(floor(CAST((t.{ix_col} - t.ox) * g.k AS DOUBLE)
                             / CAST(t.n AS DOUBLE) + 0.5) AS BIGINT) AS sx,
           t.oy + CAST(floor(CAST((t.{iy_col} - t.oy) * g.k AS DOUBLE)
                             / CAST(t.n AS DOUBLE) + 0.5) AS BIGINT) AS sy
    FROM (
      SELECT p.{ix_col}, p.{iy_col}, {v} AS et, o.ox, o.oy, o.eo,
             greatest(abs(p.{ix_col} - o.ox), abs(p.{iy_col} - o.oy)) AS n
      FROM {px_rel} p CROSS JOIN
           (SELECT {ix_col} AS ox, {iy_col} AS oy, {v} AS eo FROM {px_rel}
            ORDER BY {v} DESC, {ix_col}, {iy_col} LIMIT 1) o
    ) t, LATERAL (SELECT UNNEST(generate_series(1, t.n - 1)) AS k) g
    WHERE t.n >= 2
  ) s LEFT JOIN {px_rel} p ON p.{ix_col} = s.sx AND p.{iy_col} = s.sy
  GROUP BY s.ix, s.iy
) b ON t.{ix_col} = b.ix AND t.{iy_col} = b.iy"""


def simplify_lines(
    lines: Dataset,
    eps: float,
    line_col: str = "line_id",
    seq_col: str = "seq",
    x_col: str = "x",
    y_col: str = "y",
    num_partitions: int = 64,
    max_line_len: int = 65536,
) -> Dataset:
    """Douglas–Peucker polyline simplification (PostGIS
    ``ST_Simplify`` / terra ``simplifyGeom``): drop every vertex whose
    perpendicular distance to the kept chord is ≤ ``eps``, recursively
    splitting at the farthest outlier — the standard generalization
    pass over :func:`contour_segments`-style isolines, traced
    boundaries or GPS tracks before plotting/serving them.

    Plan: ONE hash exchange on ``line_col`` co-locates each polyline,
    then an in-partition ``(line, seq)`` lexsort and a per-line
    stack-based DP whose distance scan is vectorized numpy (the
    per-LINE loop is the unit of work, like ``merge_asof``'s per-key
    pandas kernel — polylines are short by construction; lines longer
    than ``max_line_len`` raise rather than degrade).  First and last
    vertex always survive; ties at the farthest outlier break to the
    LOWEST index (np.argmax-first), so output is deterministic and
    partitioning-invariant.  Distances compare as exact-float ``d² >
    eps²`` cross-products — no sqrt.

    Returns the input rows filtered to the kept vertices (same
    columns, ``(line, seq)``-sorted within each partition).
    """
    if not math.isfinite(eps) or eps < 0:
        raise ValueError("eps must be finite and >= 0")
    if max_line_len < 2:
        raise ValueError("max_line_len must be >= 2")
    eps2 = float(eps) * float(eps)
    P = np.int64(num_partitions)

    def tag(t: pa.Table) -> pa.Table:
        lid = t[line_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("_part", pa.array(((lid % P) + P) % P))

    def solve(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_part"])
        if g.num_rows == 0:
            return g
        g = g.sort_by([(line_col, "ascending"), (seq_col, "ascending")])
        lid = g[line_col].to_numpy(zero_copy_only=False).astype(np.int64)
        seq = g[seq_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = g[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = g[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        n = g.num_rows
        brk = np.ones(n, dtype=bool)
        brk[1:] = lid[1:] != lid[:-1]
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], n)
        if bool((~brk[1:] & (seq[1:] == seq[:-1])).any()):
            raise ValueError(
                f"simplify_lines: duplicate {seq_col} within a line — "
                "vertex order is ambiguous"
            )
        keep = np.zeros(n, dtype=bool)
        for s, e in zip(starts, ends):
            m = e - s
            if m > max_line_len:
                raise ValueError(
                    f"simplify_lines: a line has {m} vertices > "
                    f"max_line_len={max_line_len} — split it upstream"
                )
            keep[s] = keep[e - 1] = True
            if m < 3:
                continue
            stack = [(s, e - 1)]
            while stack:
                i, j = stack.pop()
                if j - i < 2:
                    continue
                dx, dy = x[j] - x[i], y[j] - y[i]
                L2 = dx * dx + dy * dy
                xs, ys = x[i + 1 : j], y[i + 1 : j]
                if L2 == 0.0:  # degenerate chord (closed ring): point distance
                    d2 = (xs - x[i]) ** 2 + (ys - y[i]) ** 2
                else:
                    cr = dx * (ys - y[i]) - dy * (xs - x[i])
                    d2 = cr * cr / L2
                k = i + 1 + int(np.argmax(d2))
                if float(d2[k - i - 1]) > eps2:
                    keep[k] = True
                    stack.append((i, k))
                    stack.append((k, j))
        return g.filter(pa.array(keep))

    return (
        lines.map_batches(tag, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(solve, batch_format="pyarrow")
    )


_OVERLAY_OPS = {
    "add": lambda a, b: a + b,
    "sub": lambda a, b: a - b,
    "mul": lambda a, b: a * b,
    "min": np.minimum,
    "max": np.maximum,
}


def raster_overlay(
    a: Dataset,
    b: Dataset,
    value_a: str,
    value_b: str,
    ops: "dict[str, str] | None" = None,
    how: str = "inner",
    fill_a: int = 0,
    fill_b: int = 0,
    num_partitions: int = 64,
) -> Dataset:
    """Local map algebra over two pixel tables — the two-raster
    raster-calculator (ArcGIS Raster Calculator / GRASS r.mapcalc
    ``A op B``), the overlay a SEraster user runs to combine two
    rasterized layers (reference rasters are dgCMatrix layers combined
    in R; here each layer is a distributed ``(ix, iy, value)`` table).

    ONE hash exchange total: both sides are tagged and co-partitioned
    by cell key in a single union fold (cheaper than a join — the
    combiner sums values and presence counts per cell), then every op
    is evaluated vectorized in the finalize pass.

    ``ops`` maps output column → op in ``{add, sub, mul, min, max}``
    (int64-exact, so results are bit-stable and SQL-twinnable; compose
    a float division downstream if needed).  Default ``{"v_add":
    "add"}``.  ``how="inner"`` keeps cells present in BOTH layers;
    ``"outer"`` keeps all cells, absent sides take ``fill_a`` /
    ``fill_b``.  Duplicate cell keys WITHIN a layer fold by sum (the
    rasterize contract emits unique cells; documented for raw input).

    Returns ``(ix, iy, a, b, <ops...>)``.
    """
    from rayraster.agg import hash_aggregate

    ops = dict(ops or {"v_add": "add"})
    if not ops:
        raise ValueError("raster_overlay: need at least one op")
    for name, op in ops.items():
        if op not in _OVERLAY_OPS:
            raise ValueError(
                f"raster_overlay: unknown op {op!r} for {name!r} "
                f"(valid: {sorted(_OVERLAY_OPS)})"
            )
        if name in ("ix", "iy", "a", "b"):
            raise ValueError(f"raster_overlay: output name {name!r} reserved")
    if how not in ("inner", "outer"):
        raise ValueError(f"raster_overlay: how must be inner|outer, got {how!r}")

    def tag_a(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "ix": t["ix"].cast(pa.int64()), "iy": t["iy"].cast(pa.int64()),
            "va": t[value_a].cast(pa.int64()),
            "vb": pa.array(np.zeros(n, dtype=np.int64)),
            "ca": pa.array(np.ones(n, dtype=np.int64)),
            "cb": pa.array(np.zeros(n, dtype=np.int64)),
        })

    def tag_b(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "ix": t["ix"].cast(pa.int64()), "iy": t["iy"].cast(pa.int64()),
            "va": pa.array(np.zeros(n, dtype=np.int64)),
            "vb": t[value_b].cast(pa.int64()),
            "ca": pa.array(np.zeros(n, dtype=np.int64)),
            "cb": pa.array(np.ones(n, dtype=np.int64)),
        })

    folded = hash_aggregate(
        a.map_batches(tag_a, batch_format="pyarrow").union(
            b.map_batches(tag_b, batch_format="pyarrow")
        ),
        keys=["ix", "iy"],
        sum_cols=["va", "vb", "ca", "cb"],
        count=False,
        num_partitions=num_partitions,
    )

    def finalize(t: pa.Table) -> pa.Table:
        va = t["sum_va"].to_numpy(zero_copy_only=False).astype(np.int64)
        vb = t["sum_vb"].to_numpy(zero_copy_only=False).astype(np.int64)
        ca = t["sum_ca"].to_numpy(zero_copy_only=False).astype(np.int64)
        cb = t["sum_cb"].to_numpy(zero_copy_only=False).astype(np.int64)
        if how == "inner":
            keep = (ca > 0) & (cb > 0)
            t, va, vb = t.filter(pa.array(keep)), va[keep], vb[keep]
            ca, cb = ca[keep], cb[keep]
        va = np.where(ca > 0, va, np.int64(fill_a))
        vb = np.where(cb > 0, vb, np.int64(fill_b))
        cols = {"ix": t["ix"], "iy": t["iy"],
                "a": pa.array(va), "b": pa.array(vb)}
        for name, op in ops.items():
            cols[name] = pa.array(_OVERLAY_OPS[op](va, vb))
        return pa.table(cols)

    return folded.map_batches(finalize, batch_format="pyarrow")


def raster_crosstab(
    a: Dataset,
    b: Dataset,
    class_a: str,
    class_b: str,
    num_partitions: int = 64,
) -> Dataset:
    """Cross-tabulate two categorical rasters — cells counted per
    (class-in-A, class-in-B) pair over the cells present in BOTH
    layers (ArcGIS Combine / Tabulate Area; land-cover-change
    matrices).  The change/confusion matrix of two rasterized layers.

    Same single co-location exchange as :func:`raster_overlay`, then
    the (class_a, class_b) counts fold through per-batch partial
    counts + one TINY second exchange (≤ |classes|² rows).  Duplicate
    cell keys within a layer are an error (raised — a doubled cell
    would silently corrupt the contingency table).

    Returns ``(ca, cb, n)``.
    """
    from rayraster.agg import hash_aggregate

    def tag_a(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "ix": t["ix"].cast(pa.int64()), "iy": t["iy"].cast(pa.int64()),
            "va": t[class_a].cast(pa.int64()),
            "vb": pa.array(np.zeros(n, dtype=np.int64)),
            "ca": pa.array(np.ones(n, dtype=np.int64)),
            "cb": pa.array(np.zeros(n, dtype=np.int64)),
        })

    def tag_b(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "ix": t["ix"].cast(pa.int64()), "iy": t["iy"].cast(pa.int64()),
            "va": pa.array(np.zeros(n, dtype=np.int64)),
            "vb": t[class_b].cast(pa.int64()),
            "ca": pa.array(np.zeros(n, dtype=np.int64)),
            "cb": pa.array(np.ones(n, dtype=np.int64)),
        })

    folded = hash_aggregate(
        a.map_batches(tag_a, batch_format="pyarrow").union(
            b.map_batches(tag_b, batch_format="pyarrow")
        ),
        keys=["ix", "iy"],
        sum_cols=["va", "vb", "ca", "cb"],
        count=False,
        num_partitions=num_partitions,
    )

    def partial_counts(t: pa.Table) -> pa.Table:
        ca = t["sum_ca"].to_numpy(zero_copy_only=False).astype(np.int64)
        cb = t["sum_cb"].to_numpy(zero_copy_only=False).astype(np.int64)
        if (ca > 1).any() or (cb > 1).any():
            raise ValueError(
                "raster_crosstab: duplicate cell keys within a layer — "
                "each (ix, iy) must appear at most once per raster"
            )
        keep = (ca == 1) & (cb == 1)
        t = t.filter(pa.array(keep))
        g = (
            pa.table({"ca": t["sum_va"], "cb": t["sum_vb"]})
            .group_by(["ca", "cb"])
            .aggregate([([], "count_all")])
        )
        return pa.table({"ca": g["ca"], "cb": g["cb"],
                         "n": g["count_all"].cast(pa.int64())})

    out = hash_aggregate(
        folded.map_batches(partial_counts, batch_format="pyarrow"),
        keys=["ca", "cb"],
        sum_cols=["n"],
        count=False,
        num_partitions=min(num_partitions, 8),
    )
    return out.map_batches(
        lambda t: pa.table({"ca": t["ca"], "cb": t["cb"], "n": t["sum_n"]}),
        batch_format="pyarrow",
    )


def _chain_prune(px: np.ndarray, py: np.ndarray, upper: bool) -> np.ndarray:
    """Indices (into the x-sorted order) of one hull chain by repeated
    vectorized triple-pruning: drop every interior point whose
    consecutive triple fails the strict-turn test, until stable.  Each
    round is pure numpy over the surviving candidates; rounds needed ≈
    log of the longest concave run, and the candidate set shrinks
    geometrically — the vectorized form of Andrew's monotone chain."""
    idx = np.arange(len(px), dtype=np.int64)
    while len(idx) > 2:
        x, y = px[idx], py[idx]
        cross = (x[1:-1] - x[:-2]) * (y[2:] - y[:-2]) - (
            y[1:-1] - y[:-2]
        ) * (x[2:] - x[:-2])
        bad = cross >= 0 if upper else cross <= 0  # strict turns only
        if not bad.any():
            break
        keep = np.ones(len(idx), dtype=bool)
        keep[1:-1] = ~bad
        idx = idx[keep]
    return idx


def _hull_points(x: np.ndarray, y: np.ndarray) -> "tuple[np.ndarray, np.ndarray]":
    """Exact strict convex hull of a point set, CCW from the
    lexicographic minimum; collinear boundary points excluded."""
    pts = np.unique(np.stack([x, y], axis=1), axis=0)  # lexsorted (x, y)
    if len(pts) <= 2:
        return pts[:, 0], pts[:, 1]
    px, py = pts[:, 0], pts[:, 1]
    lo = _chain_prune(px, py, upper=False)
    hi = _chain_prune(px, py, upper=True)
    # CCW: lower chain left→right, then upper chain right→left, drop
    # the shared endpoints from the second chain
    order = np.concatenate([lo, hi[::-1][1:-1]])
    return px[order], py[order]


def convex_hull(
    ds: Dataset,
    x_col: str = "x",
    y_col: str = "y",
    batch_size: int = 262144,
) -> "tuple[np.ndarray, np.ndarray]":
    """EXACT distributed convex hull of a point table with NO shuffle
    (ST_ConvexHull over the whole layer — coverage footprints, study
    region outlines).  Hull of a union = hull of the per-part hulls,
    so each batch reduces to its own hull (vectorized triple-pruning —
    no per-row Python) and the driver merges the tiny candidate union
    (≤ Σ per-batch hull sizes — hundreds, not rows) with one final
    chain.  Exact for integer coordinates and for doubles whose cross
    products are exactly representable; collinear boundary points are
    excluded (strict hull), duplicates collapse.

    Returns ``(hx, hy)`` in CCW order starting from the lexicographic
    minimum vertex; degenerate inputs reduce accordingly (all points
    collinear → the two extreme endpoints; ≤ 2 distinct points → the
    distinct point set in lexicographic order).
    """

    def batch_hull(t: pa.Table) -> pa.Table:
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~(np.isnan(x) | np.isnan(y))
        if not ok.any():
            return pa.table({"hx": pa.array([], type=pa.float64()),
                             "hy": pa.array([], type=pa.float64())})
        hx, hy = _hull_points(x[ok], y[ok])
        return pa.table({"hx": pa.array(hx), "hy": pa.array(hy)})

    parts = [
        b for b in ds.map_batches(
            batch_hull, batch_format="pyarrow", batch_size=batch_size,
            zero_copy_batch=True,
        ).iter_batches(batch_format="pyarrow") if b.num_rows
    ]
    if not parts:
        raise ValueError("convex_hull: no finite points")
    cand = pa.concat_tables(parts)
    return _hull_points(
        cand["hx"].to_numpy(zero_copy_only=False),
        cand["hy"].to_numpy(zero_copy_only=False),
    )


def hull_metrics(hx: np.ndarray, hy: np.ndarray) -> dict:
    """Exact shape metrics of a convex hull (:func:`convex_hull`
    output, CCW): ``area2`` = twice the shoelace area (exact for
    integer coordinates — no halving, no floats), ``diameter_sq`` =
    the squared max pairwise vertex distance (the hull realizes the
    point set's diameter), ``n_vertices``, and ``perimeter`` (the one
    float — a sum of sqrt terms).  Hull sizes are tiny, so the O(h²)
    pair scan is vectorized driver math."""
    hx = np.asarray(hx, dtype=np.float64)
    hy = np.asarray(hy, dtype=np.float64)
    h = len(hx)
    if h == 0:
        raise ValueError("hull_metrics: empty hull")
    if h == 1:
        return {"n_vertices": 1, "area2": 0.0, "diameter_sq": 0.0,
                "perimeter": 0.0}
    nx, ny = np.roll(hx, -1), np.roll(hy, -1)
    area2 = float(np.sum(hx * ny - nx * hy))
    dx = hx[:, None] - hx[None, :]
    dy = hy[:, None] - hy[None, :]
    diameter_sq = float((dx * dx + dy * dy).max())
    per = float(np.sqrt((nx - hx) ** 2 + (ny - hy) ** 2).sum())
    if h == 2:  # degenerate open "hull": one segment, not a ring
        per = per / 2.0
        area2 = 0.0
    return {"n_vertices": h, "area2": area2, "diameter_sq": diameter_sq,
            "perimeter": per}
