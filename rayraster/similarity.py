"""Similarity search over an embedding column (list<float>).

* :func:`brute_topk` — exact cosine top-k: per-batch numpy matmul
  against a broadcast query matrix, per-batch partial top-k, tiny
  final merge.  The correctness baseline.
* :class:`IVFIndex` / :func:`ivf_topk` — IVF-style bucketed variant:
  vectors assigned to their nearest of C seeded centroids in one pass;
  queries probe the ``nprobe`` nearest centroid buckets.  The scale
  path (approximate; recall measured in tests).

All distances in float64 with fixed op order (matmul then division by
precomputed norms) so results are deterministic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)


class _BatchTopK:
    """map_batches actor: cosine of every batch row vs the broadcast
    query matrix; emits per-batch top-k candidates per query."""

    def __init__(self, queries_ref, k: int, vec_col: str, id_col: str):
        self._ref = queries_ref
        self.Q = None
        self.qids = None
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.Q is None:
            obj = ray.get(self._ref) if isinstance(self._ref, ray.ObjectRef) else self._ref
            self.qids = np.asarray(obj["ids"])
            self.Q = _normalize(np.asarray(obj["mat"], dtype=np.float64))
        vecs = np.stack(batch[self.vec_col].to_pylist()).astype(np.float64)
        vecs = _normalize(vecs)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        sims = self.Q @ vecs.T  # (nq, nbatch)
        kk = min(self.k, sims.shape[1])
        # per-query partial top-k (ties resolved in the final merge)
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        nq = sims.shape[0]
        rows = np.repeat(np.arange(nq), kk)
        cols = part.ravel()
        return pa.table(
            {
                "qid": pa.array(self.qids[rows]),
                self.id_col: pa.array(ids[cols]),
                "cos": pa.array(sims[rows, cols]),
            }
        )


def brute_topk(
    ds: Dataset,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Exact cosine top-k of each query over the whole dataset.

    Returns a small arrow table (qid, vec_id, rank, cos), rank 1-based,
    deterministic order (cos desc, vec_id asc)."""
    qref = ray.put({"ids": np.asarray(query_ids), "mat": np.asarray(query_mat)})
    # instance → task pool: the per-task state (normalizing a tiny query
    # matrix) is far cheaper than actor-pool spin-up; contrast KnnStage /
    # _VerifyJaccard whose heavy per-actor state justifies a pool
    cand = ds.map_batches(
        _BatchTopK(qref, k, vec_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    t = cand.to_arrow_refs()
    tbl = pa.concat_tables([ray.get(r) for r in t])
    return _final_topk(tbl, k, id_col)


def _final_topk(tbl: pa.Table, k: int, id_col: str) -> pa.Table:
    qid = tbl["qid"].to_numpy(zero_copy_only=False)
    vid = tbl[id_col].to_numpy(zero_copy_only=False)
    cos = tbl["cos"].to_numpy(zero_copy_only=False)
    out_q, out_v, out_r, out_c = [], [], [], []
    for q in np.unique(qid):
        m = qid == q
        v, c = vid[m], cos[m]
        order = np.lexsort((v, -c))[:k]
        out_q.append(np.full(len(order), q))
        out_v.append(v[order])
        out_r.append(np.arange(1, len(order) + 1, dtype=np.int64))
        out_c.append(c[order])
    return pa.table(
        {
            "qid": pa.array(np.concatenate(out_q)),
            id_col: pa.array(np.concatenate(out_v)),
            "rank": pa.array(np.concatenate(out_r)),
            "cos": pa.array(np.concatenate(out_c)),
        }
    )


# ---------------------------------------------------------------------------
# IVF-style bucketed ANN (the scale path)
# ---------------------------------------------------------------------------


def seeded_centroids(dim: int, n_centroids: int, seed: int = 424242) -> np.ndarray:
    """Deterministic unit-norm centroids (no kmeans dependency; for
    real corpora swap in a one-pass sampled kmeans — interface equal)."""
    rng = np.random.default_rng(seed)
    return _normalize(rng.standard_normal((n_centroids, dim)))


class IVFAssignStage:
    """map_batches actor: vector → nearest-centroid bucket id."""

    def __init__(self, centroids_ref, vec_col="embedding", id_col="vec_id"):
        self._ref = centroids_ref
        self.C = None
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.C is None:
            self.C = ray.get(self._ref) if isinstance(self._ref, ray.ObjectRef) else self._ref
        vecs = _normalize(np.stack(batch[self.vec_col].to_pylist()).astype(np.float64))
        bucket = np.argmax(vecs @ self.C.T, axis=1).astype(np.int64)
        return batch.append_column("bucket", pa.array(bucket))


def ivf_topk(
    ds: Dataset,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Approximate cosine top-k probing the ``nprobe`` nearest centroid
    buckets per query.  Same output schema as :func:`brute_topk`."""
    C = seeded_centroids(dim, n_centroids)
    cref = ray.put(C)
    assigned = ds.map_batches(
        IVFAssignStage(cref, vec_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    Q = _normalize(np.asarray(query_mat, dtype=np.float64))
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    wanted = sorted({int(b) for row in probe for b in row})
    wset = pa.array(wanted, type=pa.int64())

    def _probe_filter(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t["bucket"], value_set=wset))

    sub = assigned.map_batches(_probe_filter, batch_format="pyarrow", zero_copy_batch=True)
    # per-query probe masks applied in the final merge
    qref = ray.put({"ids": np.asarray(query_ids), "mat": Q})
    cand = sub.map_batches(
        _BatchTopK(qref, k, vec_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    tbl = pa.concat_tables([ray.get(r) for r in cand.to_arrow_refs()])
    return _final_topk(tbl, k, id_col)
