"""kNN pixel-neighborhood queries — stateful actor-pool stage.

The north_star mandates kNN over pixel centroids with per-actor spatial
index state (BASELINE.json; SURVEY.md "Stateful stages").  No scipy in
the sandbox, so the index is a from-scratch uniform-grid bucket index
(rasterization-native: it reuses the same cell-binning arithmetic as
the engine itself) with an expanding-ring exact search:

  a neighbor in a bucket beyond ring r is at distance ≥ r·s from the
  query point (s = bucket size), so once the kth-best distance is
  ≤ r·s the answer is provably exact.

Usage (the Ray-Data-first shape)::

    ref = ray.put(ref_table_dict)                 # broadcast ONCE
    out = queries.map_batches(
        KnnStage(ref, k=4), batch_format="pyarrow",
        concurrency=4, num_cpus=1)                # actor pool: index
                                                  # built once per actor

Results are deterministic: ties broken by (dist², ref row order).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


class GridIndex:
    """Uniform-grid bucket index over 2-D points; exact kNN."""

    def __init__(self, x: np.ndarray, y: np.ndarray, bucket_size: float | None = None):
        self.x = np.asarray(x, dtype=np.float64)
        self.y = np.asarray(y, dtype=np.float64)
        n = len(self.x)
        if n == 0:
            raise ValueError("empty reference set")
        if bucket_size is None:
            # aim for ~4 points per bucket on a uniform spread
            span = max(self.x.ptp(), self.y.ptp(), 1e-9)
            bucket_size = span / max(1.0, np.sqrt(n / 4.0))
        self.s = float(bucket_size)
        self.x0 = float(self.x.min())
        self.y0 = float(self.y.min())
        bx = np.floor((self.x - self.x0) / self.s).astype(np.int64)
        by = np.floor((self.y - self.y0) / self.s).astype(np.int64)
        # collision-free bucket key: by ≥ 0 and < 2^32 (both axes are
        # offset from their minima), so (bx << 32) | by is injective —
        # a row-count-based multiplier can collide when the y-extent
        # exceeds the x-extent
        key = (bx << np.int64(32)) | by
        # occupied bucket bounding box — far-outside queries clamp
        # their search center onto it (see query())
        self._bx_lo, self._bx_hi = int(bx.min()), int(bx.max())
        self._by_lo, self._by_hi = int(by.min()), int(by.max())
        order = np.argsort(key, kind="stable")
        self._order = order
        skey = key[order]
        uniq, starts = np.unique(skey, return_index=True)
        self._bucket_of = dict(zip(uniq.tolist(), range(len(uniq))))
        self._starts = np.append(starts, n)

    def _bucket_members(self, bx: int, by: int) -> np.ndarray:
        if by < 0:
            return np.empty(0, dtype=np.int64)
        k = (bx << 32) | by
        i = self._bucket_of.get(k)
        if i is None:
            return np.empty(0, dtype=np.int64)
        return self._order[self._starts[i] : self._starts[i + 1]]

    def query(self, qx: np.ndarray, qy: np.ndarray, k: int, exclude: np.ndarray | None = None):
        """Exact kNN.  Queries sharing a bucket are answered together so
        the Python loop is over occupied *buckets*, not points.

        ``exclude``: optional int64 array per query of a ref row index
        to drop (self-exclusion).  Returns (idx, dist2) of shape
        (nq, k); fewer-than-k refs → padded with -1 / inf.
        """
        qx = np.asarray(qx, dtype=np.float64)
        qy = np.asarray(qy, dtype=np.float64)
        nq = len(qx)
        out_idx = np.full((nq, k), -1, dtype=np.int64)
        out_d2 = np.full((nq, k), np.inf)
        qbx = np.floor((qx - self.x0) / self.s).astype(np.int64)
        qby = np.floor((qy - self.y0) / self.s).astype(np.int64)
        # group queries by their (possibly out-of-range) bucket; offset
        # qby to non-negative so the 32-bit packing stays injective
        qoff = np.int64(min(int(qby.min()), 0))
        qkey = (qbx << np.int64(32)) | (qby - qoff)
        order = np.argsort(qkey, kind="stable")
        skey = qkey[order]
        uniq, starts = np.unique(skey, return_index=True)
        starts = np.append(starts, nq)
        n_ref = len(self.x)
        for u in range(len(uniq)):
            members = order[starts[u] : starts[u + 1]]
            bx, by = int(qbx[members[0]]), int(qby[members[0]])
            # clamp the search center onto the occupied bucket box: a
            # far-outside query otherwise walks O((dist/s)²) empty
            # rings in Python (measured: one (5000,5000) query against
            # a [-10,10]² index stalled > 60 s).  Exactness holds — in
            # any clamped dim the true query is strictly FARTHER from
            # every reference than the clamped center, so the
            # ring-termination bound still under-estimates distances.
            bx = min(max(bx, self._bx_lo), self._bx_hi)
            by = min(max(by, self._by_lo), self._by_hi)
            r = 1
            cand = self._ring_members(bx, by, 0, 1)
            while True:
                enough = len(cand) > (k if exclude is not None else k - 1)
                if enough or len(cand) >= n_ref:
                    dx = qx[members, None] - self.x[None, cand]
                    dy = qy[members, None] - self.y[None, cand]
                    d2 = dx * dx + dy * dy
                    if exclude is not None:
                        d2[cand[None, :] == exclude[members, None]] = np.inf
                    kk = min(k, d2.shape[1])
                    # full tie-aware sort by (dist2, ref row index): a
                    # partial selection (argpartition) would cut a tie
                    # group straddling the k boundary arbitrarily
                    refs = np.broadcast_to(cand, d2.shape)
                    ordk = np.lexsort((refs, d2), axis=1)[:, :kk]
                    pd2 = np.take_along_axis(d2, ordk, axis=1)
                    pidx = np.take_along_axis(refs, ordk, axis=1)
                    kth = pd2[:, min(kk, k) - 1]
                    bound = (r - 1) * self.s  # beyond ring r-1 ⇒ dist ≥ (r-1)·s
                    done = (kth <= bound * bound) | (len(cand) >= n_ref)
                    if done.all():
                        out_idx[members, :kk] = pidx
                        out_d2[members, :kk] = pd2
                        break
                more = self._ring_members(bx, by, r, r + 1)
                cand = np.concatenate([cand, more])
                r += 1
        return out_idx, out_d2

    def _ring_members(self, bx: int, by: int, r_lo: int, r_hi: int) -> np.ndarray:
        """Members of buckets with r_lo ≤ Chebyshev ring < r_hi."""
        chunks = []
        for i in range(bx - r_hi + 1, bx + r_hi):
            for j in range(by - r_hi + 1, by + r_hi):
                ring = max(abs(i - bx), abs(j - by))
                if r_lo <= ring < r_hi:
                    m = self._bucket_members(i, j)
                    if len(m):
                        chunks.append(m)
        if not chunks:
            return np.empty(0, dtype=np.int64)
        return np.concatenate(chunks)


def brute_force_knn(qx, qy, rx, ry, k: int, exclude: np.ndarray | None = None):
    """O(nq·nref) baseline — the correctness oracle for GridIndex and
    the right choice when the ref set is tiny."""
    dx = np.asarray(qx)[:, None] - np.asarray(rx)[None, :]
    dy = np.asarray(qy)[:, None] - np.asarray(ry)[None, :]
    d2 = dx * dx + dy * dy
    if exclude is not None:
        d2[np.arange(d2.shape[1])[None, :] == np.asarray(exclude)[:, None]] = np.inf
    kk = min(k, d2.shape[1])
    ref_rows = np.broadcast_to(np.arange(d2.shape[1]), d2.shape)
    ordk = np.lexsort((ref_rows, d2), axis=1)[:, :kk]
    return ordk, np.take_along_axis(d2, ordk, axis=1)


def spatial_knn_self(
    cells,
    k: int,
    tile_size: float,
    x_col: str = "cx",
    y_col: str = "cy",
    id_cols: tuple = ("ix", "iy"),
    num_partitions: int = 64,
):
    """Distributed kNN self-join over a point/pixel Dataset — the
    per-partition-index scale path (north_star: "kNN pixel-neighborhood
    queries via a per-partition index held in stateful workers").

    Shape: every point is assigned to a spatial tile of side
    ``tile_size``; as a QUERY it goes to its own tile, as a REFERENCE
    it fans out to the 3×3 tile neighborhood (the halo).  One
    hash-partitioned shuffle co-locates each tile's queries with all
    references within ``tile_size`` of it; a GridIndex per tile group
    answers locally.  Results carry ``exact``: True iff the kth
    neighbor distance ≤ tile_size (the halo provably contains every
    true neighbor that close).  For guaranteed-exact results pick
    ``tile_size`` ≥ the expected kth-neighbor distance, or re-run the
    inexact residue with :class:`KnnStage` (broadcast) — at pixel
    densities ≥ k per tile the residue is empty.

    Broadcasts nothing; both sides stream through ONE shuffle.
    """
    import pyarrow as pa

    from ray.data import Dataset  # noqa: F401

    id_cols = list(id_cols)

    def fanout(t: pa.Table) -> pa.Table:
        x = t[x_col].to_numpy(zero_copy_only=False)
        y = t[y_col].to_numpy(zero_copy_only=False)
        tx = np.floor(x / tile_size).astype(np.int64)
        ty = np.floor(y / tile_size).astype(np.int64)
        pieces = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                p = t.append_column("_tx", pa.array(tx + dx))
                p = p.append_column("_ty", pa.array(ty + dy))
                p = p.append_column(
                    "_is_query",
                    pa.array(np.full(t.num_rows, dx == 0 and dy == 0)),
                )
                pieces.append(p)
        out = pa.concat_tables(pieces)
        part = (
            np.abs(
                out["_tx"].to_numpy(zero_copy_only=False) * np.int64(73856093)
                ^ out["_ty"].to_numpy(zero_copy_only=False) * np.int64(19349663)
            )
            % np.int64(num_partitions)
        )
        return out.append_column("_part", pa.array(part))

    def solve(part: pa.Table) -> pa.Table:
        part = part.sort_by([("_tx", "ascending"), ("_ty", "ascending")])
        tx = part["_tx"].to_numpy(zero_copy_only=False)
        ty = part["_ty"].to_numpy(zero_copy_only=False)
        isq = part["_is_query"].to_numpy(zero_copy_only=False)
        x = part[x_col].to_numpy(zero_copy_only=False)
        y = part[y_col].to_numpy(zero_copy_only=False)
        idc = {c: part[c].to_numpy(zero_copy_only=False) for c in id_cols}
        n = len(tx)
        out_cols: dict[str, list] = {
            **{c: [] for c in id_cols},
            "rank": [],
            "dist2": [],
            **{f"n_{c}": [] for c in id_cols},
            "exact": [],
        }
        if n == 0:
            return pa.table(
                {
                    **{c: pa.array([], type=part[c].type) for c in id_cols},
                    "rank": pa.array([], type=pa.int64()),
                    "dist2": pa.array([], type=pa.float64()),
                    **{f"n_{c}": pa.array([], type=part[c].type) for c in id_cols},
                    "exact": pa.array([], type=pa.bool_()),
                }
            )
        brk = np.ones(n, dtype=bool)
        brk[1:] = (tx[1:] != tx[:-1]) | (ty[1:] != ty[:-1])
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], n)
        for s, e in zip(starts, ends):
            q = np.flatnonzero(isq[s:e]) + s
            if len(q) == 0:
                continue
            r = np.arange(s, e)  # refs = everything in the tile group
            # deterministic ref order by id cols
            order = np.lexsort(tuple(idc[c][r] for c in reversed(id_cols)))
            r = r[order]
            # self-exclusion by id equality
            ref_keys = {tuple(idc[c][j] for c in id_cols): pos for pos, j in enumerate(r)}
            gi = GridIndex(x[r], y[r], bucket_size=tile_size / 4.0)
            excl = np.array(
                [ref_keys.get(tuple(idc[c][j] for c in id_cols), -1) for j in q],
                dtype=np.int64,
            )
            idx, d2 = gi.query(x[q], y[q], k, exclude=excl)
            kk = idx.shape[1]
            for row, j in enumerate(q):
                margin2 = tile_size * tile_size
                for rank in range(kk):
                    if idx[row, rank] < 0 or not np.isfinite(d2[row, rank]):
                        break
                    for c in id_cols:
                        out_cols[c].append(idc[c][j])
                        out_cols[f"n_{c}"].append(idc[c][r[idx[row, rank]]])
                    out_cols["rank"].append(rank + 1)
                    out_cols["dist2"].append(d2[row, rank])
                    out_cols["exact"].append(bool(d2[row, rank] <= margin2))
        return pa.table(
            {
                **{c: pa.array(out_cols[c]) for c in id_cols},
                "rank": pa.array(out_cols["rank"], type=pa.int64()),
                "dist2": pa.array(out_cols["dist2"], type=pa.float64()),
                **{f"n_{c}": pa.array(out_cols[f"n_{c}"]) for c in id_cols},
                "exact": pa.array(out_cols["exact"], type=pa.bool_()),
            }
        )

    fanned = cells.map_batches(fanout, batch_format="pyarrow", zero_copy_batch=True)
    return fanned.groupby("_part").map_groups(solve, batch_format="pyarrow")


class KnnStage:
    """map_batches actor: k nearest *reference* points per query row.

    ``ref``: ObjectRef (or plain dict in tests) of
    ``{"x": array, "y": array, <id col>: array, ...}``.  The index is
    built ONCE per actor in __init__ — pass this class with
    ``concurrency=N`` so Ray makes an actor pool (SURVEY.md §2 O-knn).

    Output: one row per (query, rank): query id columns (pass-through),
    ``rank`` (1-based), ``dist2``, and each ref id column prefixed
    ``n_``.  ``self_key``: (query_col, ref_col) pairs — a ref row whose
    key equals the query row's is excluded (self-exclusion for
    pixel-to-pixel neighborhoods).
    """

    def __init__(
        self,
        ref,
        k: int,
        query_x: str = "cx",
        query_y: str = "cy",
        id_cols: tuple = ("ix", "iy"),
        ref_id_cols: tuple = ("ix", "iy"),
        exclude_self: bool = False,
        brute_force: bool = False,
    ):
        # store the REF (possibly an ObjectRef) and build lazily on
        # first __call__: a driver-side ray.get here would pickle the
        # materialized arrays + the bucket dict into the stage closure,
        # defeating the ray.put broadcast (each actor should fetch the
        # small ObjectRef and build its own index)
        self._ref_handle = ref
        self.ref = None
        self.k = k
        self.query_x = query_x
        self.query_y = query_y
        self.id_cols = list(id_cols)
        self.ref_id_cols = list(ref_id_cols)
        self.exclude_self = exclude_self
        self.brute = brute_force
        self.rx = self.ry = None
        self.index = None
        self._ref_row = None

    def _ensure(self):
        if self.ref is not None:
            return
        ref = self._ref_handle
        ref = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        self.ref = ref
        self.rx = np.asarray(ref["x"], dtype=np.float64)
        self.ry = np.asarray(ref["y"], dtype=np.float64)
        if not self.brute:
            self.index = GridIndex(self.rx, self.ry)
        if self.exclude_self:
            # map ref id tuple → row for self-exclusion lookups
            keys = list(zip(*(np.asarray(ref[c]).tolist() for c in self.ref_id_cols)))
            self._ref_row = {t: i for i, t in enumerate(keys)}

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._ensure()
        qx = batch[self.query_x].to_numpy(zero_copy_only=False)
        qy = batch[self.query_y].to_numpy(zero_copy_only=False)
        exclude = None
        if self.exclude_self:
            qkeys = list(
                zip(*(batch[c].to_numpy(zero_copy_only=False).tolist() for c in self.id_cols))
            )
            exclude = np.array([self._ref_row.get(t, -1) for t in qkeys], dtype=np.int64)
        if self.brute:
            idx, d2 = brute_force_knn(qx, qy, self.rx, self.ry, self.k, exclude)
        else:
            idx, d2 = self.index.query(qx, qy, self.k, exclude)
        nq, kk = idx.shape
        valid = (idx.ravel() >= 0) & np.isfinite(d2.ravel())
        rows = np.repeat(np.arange(nq), kk)[valid]
        flat = idx.ravel()[valid]
        cols = {}
        for c in self.id_cols:
            cols[c] = batch[c].take(pa.array(rows))
        cols["rank"] = pa.array(np.tile(np.arange(1, kk + 1), nq)[valid])
        cols["dist2"] = pa.array(d2.ravel()[valid])
        for c in self.ref_id_cols:
            cols[f"n_{c}"] = pa.array(np.asarray(self.ref[c])[flat])
        return pa.table(cols)
