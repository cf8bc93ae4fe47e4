"""Point-in-polygon tile clipping — broadcast-small-side semi-join.

The reference's only join is the point↔grid spatial join
(/root/reference/R/main.R:135).  The north_rule additionally requires
clipping against *arbitrary* polygons (raster↔vector direction).  The
Ray-Data-first shape is a broadcast semi-join: the (small) polygon set
is ``ray.put`` once on the driver; every ``map_batches`` task reads it
from the object store and runs a vectorized ray-crossing test — no
shuffle.

No shapely/geos in the sandbox → the even-odd crossing-number test is
implemented from scratch in numpy.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def points_in_ring(x: np.ndarray, y: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd (ray-crossing) point-in-polygon.

    ``ring``: (n, 2) closed or open vertex ring.  Boundary points are
    half-open (a point exactly on an edge may land either side) — the
    oracle fixtures avoid exact-boundary coordinates.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    vx = np.asarray(ring[:, 0], dtype=np.float64)
    vy = np.asarray(ring[:, 1], dtype=np.float64)
    if vx[0] == vx[-1] and vy[0] == vy[-1]:
        vx, vy = vx[:-1], vy[:-1]
    n = len(vx)
    inside = np.zeros(x.shape, dtype=bool)
    j = n - 1
    for i in range(n):  # loop over polygon EDGES (small), not points
        xi, yi, xj, yj = vx[i], vy[i], vx[j], vy[j]
        cond = (yi > y) != (yj > y)
        with np.errstate(divide="ignore", invalid="ignore"):
            xcross = (xj - xi) * (y - yi) / (yj - yi) + xi
        inside ^= cond & (x < xcross)
        j = i
    return inside


def points_in_any(x: np.ndarray, y: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Union membership over several rings, with a bbox pre-filter."""
    hit = np.zeros(np.asarray(x).shape, dtype=bool)
    for ring in rings:
        todo = ~hit
        if not todo.any():
            break
        xmin, ymin = ring.min(axis=0)
        xmax, ymax = ring.max(axis=0)
        cand = todo & (x >= xmin) & (x <= xmax) & (y >= ymin) & (y <= ymax)
        if cand.any():
            hit[cand] = points_in_ring(x[cand], y[cand], ring)
    return hit


def polygon_cell_index(polygons, spec) -> pa.Table:
    """(cell_id, poly_id) candidate index: every grid cell of each
    polygon's bbox at ``spec`` resolution.  ``polygons``: list of
    (poly_id, ring).  The index is the small side of the spatial join
    — one row per (covering cell, polygon), vertex data not included."""
    from rayraster.grid import pack_cell_id

    if not spec.square:
        raise ValueError(
            "polygon_cell_index requires a square GridSpec: hex axial "
            "coordinates are skewed, so an (q, r) meshgrid over corner "
            "assignments does not cover the bbox"
        )
    cells, pids = [], []
    for pid, ring in polygons:
        (xmin, ymin), (xmax, ymax) = ring.min(axis=0), ring.max(axis=0)
        # COVERING cells (every cell the bbox touches), via the same
        # assign() the points use — polyfill_bbox is centroid-inside
        # semantics and would drop boundary cells, losing candidates
        ilo, jlo = spec.assign(np.array([xmin]), np.array([ymin]))
        ihi, jhi = spec.assign(np.array([xmax]), np.array([ymax]))
        ii, jj = np.meshgrid(
            np.arange(ilo[0], ihi[0] + 1, dtype=np.int64),
            np.arange(jlo[0], jhi[0] + 1, dtype=np.int64),
            indexing="ij",
        )
        ii, jj = ii.ravel(), jj.ravel()
        cells.append(pack_cell_id(spec.level, ii, jj))
        pids.append(np.full(len(ii), pid, dtype=np.int64))
    if not cells:
        return pa.table({"cell_id": pa.array([], type=pa.int64()),
                         "poly_id": pa.array([], type=pa.int64())})
    return pa.table({"cell_id": pa.array(np.concatenate(cells)),
                     "poly_id": pa.array(np.concatenate(pids))})


def spatial_join_polygons(
    points,
    polygons,
    spec,
    x_col: str = "x",
    y_col: str = "y",
    num_buckets: int = 64,
):
    """Distributed point-in-polygon JOIN via cell indexing — the
    many-polygons path (:class:`ClipStage` is the broadcast-whole-set
    path; it tests every point against every polygon bbox).

    Shape: polyfill each polygon's bbox → (cell_id, poly_id) candidate
    index; assign each point its grid cell; ONE bucket co-location
    shuffle joins points to candidate polygons by cell; the exact
    ray-crossing test then runs per surviving (point, polygon) pair —
    a point is tested only against polygons whose bbox covers its
    cell, never the whole set.  Rings are broadcast once for the exact
    test (vertex data is tiny relative to the candidate join).
    Output: point columns + ``poly_id``, one row per containing
    polygon (inner semantics — points in no polygon drop, points in k
    polygons emit k rows)."""
    from ray.data import Dataset  # noqa: F401  (doc typing)
    import ray.data as rd

    from rayraster.grid import pack_cell_id
    from rayraster.join import bucket_join

    polygons = list(polygons)
    index = rd.from_arrow(polygon_cell_index(polygons, spec))
    rings_ref = ray.put({int(pid): np.asarray(ring, dtype=np.float64)
                         for pid, ring in polygons})

    def add_cell(t: pa.Table) -> pa.Table:
        x = t[x_col].to_numpy(zero_copy_only=False)
        y = t[y_col].to_numpy(zero_copy_only=False)
        ix, iy = spec.assign(x, y)
        return t.append_column("cell_id", pa.array(pack_cell_id(spec.level, ix, iy)))

    pts = points.map_batches(add_cell, batch_format="pyarrow", zero_copy_batch=True)
    cand = bucket_join(pts, index, "cell_id", "cell_id", num_buckets=num_buckets)

    class _ExactTest:
        def __init__(self):
            self.rings = None

        def __call__(self, t: pa.Table) -> pa.Table:
            if self.rings is None:
                self.rings = ray.get(rings_ref)
            x = t[x_col].to_numpy(zero_copy_only=False)
            y = t[y_col].to_numpy(zero_copy_only=False)
            pid = t["poly_id"].to_numpy(zero_copy_only=False)
            keep = np.zeros(len(x), dtype=bool)
            order = np.argsort(pid, kind="stable")
            spid = pid[order]
            starts = np.concatenate([[0], np.flatnonzero(np.diff(spid)) + 1]) \
                if len(spid) else np.zeros(0, dtype=np.int64)
            ends = np.append(starts[1:], len(spid))
            for s, e in zip(starts, ends):  # loop per polygon GROUP, not row
                rows = order[s:e]
                keep[rows] = points_in_ring(x[rows], y[rows], self.rings[int(spid[s])])
            return t.filter(pa.array(keep)).drop_columns(["cell_id"])

    return cand.map_batches(_ExactTest(), batch_format="pyarrow")


class ClipStage:
    """``map_batches`` callable: keep rows inside any broadcast polygon.

    Usage::

        rings_ref = ray.put([ring1, ring2])      # ONCE on the driver
        ds = ds.map_batches(ClipStage(rings_ref, "x", "y"),
                            batch_format="pyarrow")

    Stateless w.r.t. rows; the polygon set is fetched from the object
    store lazily on first call in each worker (zero re-ship per batch).
    """

    def __init__(self, rings_ref, x_col: str = "x", y_col: str = "y", invert: bool = False):
        self._ref = rings_ref
        self._rings = None
        self.x_col = x_col
        self.y_col = y_col
        self.invert = invert

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._rings is None:
            self._rings = ray.get(self._ref) if not isinstance(self._ref, list) else self._ref
        x = batch[self.x_col].to_numpy(zero_copy_only=False)
        y = batch[self.y_col].to_numpy(zero_copy_only=False)
        keep = points_in_any(x, y, self._rings)
        if self.invert:
            keep = ~keep
        return batch.filter(pa.array(keep))
