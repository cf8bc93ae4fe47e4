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
