"""Similarity search over an embedding column (list<float>).

* :func:`brute_topk` — exact cosine top-k: per-batch numpy matmul
  against a broadcast query matrix, per-batch partial top-k, tiny
  final merge.  The correctness baseline.
* :func:`ivf_topk` — IVF-style bucketed variant: vectors assigned to
  their nearest of C centroids in one pass (seeded random, data seed
  vectors, or :func:`kmeans_centroids`); queries probe only their
  ``nprobe`` nearest centroid buckets (per-query masks).
* :func:`ivf_build_index` / :func:`ivf_query_index` — the persisted
  form: corpus written bucket-partitioned (clustered, one file per
  bucket), probes read only probed bucket directories.

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


def list_col_to_matrix(col) -> np.ndarray:
    """Zero-copy-ish (n, dim) matrix from a ``list<float>`` /
    ``fixed_size_list`` column: reshape the flat Arrow values buffer
    instead of a per-row ``to_pylist`` Python round-trip (the hot-path
    rule — this runs per batch in every vector operator).  Raises on
    ragged lists or nulls (vector columns are dense by contract)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col.type, pa.ExtensionType):
        # Ray Data's ArrowTensorArray (in-memory datasets re-encode
        # list columns as its tensor extension): its to_numpy is the
        # buffer reshape already
        mat = col.to_numpy(zero_copy_only=False)
        if mat.dtype == object:  # variable-shaped tensor fallback
            mat = np.stack(mat)
        return mat
    if col.null_count:
        raise ValueError("vector column contains nulls")
    if pa.types.is_fixed_size_list(col.type):
        w = col.type.list_size
        flat = col.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(len(col), w)
    offs = col.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offs)
    if len(widths) == 0:
        return np.empty((0, 0))
    w = int(widths[0])
    if not (widths == w).all():
        raise ValueError("ragged list column — not a vector matrix")
    # col.values is the RAW child (offsets already include any array
    # slice offset), so index by the offset window, not [0:n*w]
    flat = col.values.to_numpy(zero_copy_only=False)
    return flat[offs[0] : offs[-1]].reshape(len(col), w)


def binary_col_to_matrix(col, dtype=np.float64) -> np.ndarray:
    """(n, dim) matrix from a ``binary`` column of uniform-width blobs
    (serialized vectors, e.g. the partitioned-verify payload columns) —
    the blob bytes are viewed straight out of the Arrow values buffer,
    no per-row ``frombuffer`` loop.  Raises on nulls or ragged widths.
    The returned array is a READ-ONLY view; copy before mutating."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        raise ValueError("binary vector column contains nulls")
    itemsize = np.dtype(dtype).itemsize
    n = len(col)
    if pa.types.is_fixed_size_binary(col.type):
        w = col.type.byte_width
        data = np.frombuffer(col.buffers()[1], dtype=np.uint8)
        flat = data[col.offset * w : (col.offset + n) * w]
        return flat.view(dtype).reshape(n, w // itemsize)
    if pa.types.is_binary(col.type):
        off_dt = np.int32
    elif pa.types.is_large_binary(col.type):
        off_dt = np.int64
    else:
        raise TypeError(f"need a binary column, got {col.type}")
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    bufs = col.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dt)[col.offset : col.offset + n + 1]
    widths = np.diff(offs)
    w = int(widths[0])
    if not (widths == w).all():
        raise ValueError("ragged binary column — not a vector matrix")
    if w % itemsize:
        raise ValueError(f"blob width {w} is not a multiple of itemsize {itemsize}")
    data = np.frombuffer(bufs[2], dtype=np.uint8)[offs[0] : offs[-1]]
    return data.view(dtype).reshape(n, w // itemsize)


class _BatchTopK:
    """map_batches actor: cosine of every batch row vs the broadcast
    query matrix; emits per-batch top-k candidates per query.

    With ``probe`` in the broadcast object (nq × n_centroids bool) and
    a ``bucket`` column in the batch, each query only sees rows in its
    OWN probed buckets (honest IVF semantics — without the mask a
    query would scan every bucket any other query probed)."""

    def __init__(self, queries_ref, k: int, vec_col: str, id_col: str,
                 normalize: bool = True):
        self._ref = queries_ref
        self.Q = None
        self.qids = None
        self.probe = None
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col
        self.normalize = normalize  # False => raw dot product scoring
        # (exact for integer vectors below 2^53 — any summation order)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.Q is None:
            obj = ray.get(self._ref) if isinstance(self._ref, ray.ObjectRef) else self._ref
            self.qids = np.asarray(obj["ids"])
            Q = np.asarray(obj["mat"], dtype=np.float64)
            self.Q = _normalize(Q) if self.normalize else Q
            self.probe = obj.get("probe")
        if batch.num_rows == 0:
            # a fully-filtered block (e.g. no probed bucket present)
            # must yield the empty candidate table, not a matmul crash
            return pa.table(
                {"qid": pa.array([], type=pa.int64()),
                 self.id_col: pa.array([], type=batch[self.id_col].type),
                 "cos": pa.array([], type=pa.float64())}
            )
        vecs = list_col_to_matrix(batch[self.vec_col]).astype(np.float64)
        if self.normalize:
            vecs = _normalize(vecs)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        sims = self.Q @ vecs.T  # (nq, nbatch)
        if self.probe is not None:
            bucket = batch["bucket"].to_numpy(zero_copy_only=False)
            sims = np.where(self.probe[:, bucket], sims, -np.inf)
        kk = min(self.k, sims.shape[1])
        # per-query partial top-k with TIE-SAFE cut: argpartition's
        # tie order is unspecified, so cutting at exactly kk can drop
        # a tied lower-id candidate the (cos desc, id asc) contract
        # requires (exact duplicates at cos=1.0 are the EXPECTED input
        # of the self-join).  Emit every candidate ≥ the kk-th value —
        # the deterministic final merge resolves the ties; the
        # overshoot is bounded by duplicates of the cut value.
        cut = -np.partition(-sims, kk - 1, axis=1)[:, kk - 1]
        mask = sims >= cut[:, None]
        # drop masked-out -inf entries BEFORE nonzero — a query whose
        # probed buckets are all masked has cut = -inf, and -inf >=
        # -inf would otherwise materialize every index of its row
        np.logical_and(mask, np.isfinite(sims), out=mask)
        rows, cols = np.nonzero(mask)
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
    normalize: bool = True,
) -> pa.Table:
    """Exact cosine top-k of each query over the whole dataset
    (``normalize=False`` scores by raw dot product instead — exact to
    the bit for integer vectors, e.g. hashed-n-gram counts).

    Returns a small arrow table (qid, vec_id, rank, cos), rank 1-based,
    deterministic order (cos desc, vec_id asc)."""
    qref = ray.put({"ids": np.asarray(query_ids), "mat": np.asarray(query_mat)})
    # instance → task pool: the per-task state (normalizing a tiny query
    # matrix) is far cheaper than actor-pool spin-up; contrast KnnStage /
    # _VerifyJaccard whose heavy per-actor state justifies a pool
    cand = ds.map_batches(
        _BatchTopK(qref, k, vec_col, id_col, normalize=normalize),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return _final_topk(_collect_candidates(cand, id_col, k=k), k, id_col)


def _collect_candidates(
    cand: Dataset, id_col: str, k: int | None = None, fold_batch: int = 65536
) -> pa.Table:
    """Gather per-batch candidate blocks, skipping the zero-column
    empty blocks a union boundary can emit (they have no schema and
    break concat_tables).

    With ``k``, a distributed fold keeps only each query's top-k per
    ~fold_batch candidate rows BEFORE the driver concat — without it,
    driver traffic grows with block count (k × nq per map task)."""

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        return _final_topk(t, k, id_col).drop_columns(["rank"])

    if k is not None:
        cand = cand.map_batches(fold, batch_format="pyarrow",
                                batch_size=fold_batch, zero_copy_batch=True)
    # pin before pulling refs: to_arrow_refs' schema resolution runs a
    # limit-1 probe that re-executes the whole candidate pipeline
    # (measured: 2× wall on the s1 self-join path)
    cand = cand.materialize()
    tbls = [t for t in (ray.get(r) for r in cand.to_arrow_refs()) if t.num_columns > 0]
    if not tbls:
        return pa.table(
            {"qid": pa.array([], type=pa.int64()), id_col: pa.array([], type=pa.int64()),
             "cos": pa.array([], type=pa.float64())}
        )
    return pa.concat_tables(tbls)


def _final_topk(tbl: pa.Table, k: int, id_col: str) -> pa.Table:
    if tbl.num_rows == 0:
        # the typed empty-candidate table must survive to an empty
        # RESULT (np.concatenate of zero arrays raises)
        return pa.table(
            {"qid": pa.array([], type=pa.int64()),
             id_col: pa.array([], type=pa.int64()),
             "rank": pa.array([], type=pa.int64()),
             "cos": pa.array([], type=pa.float64())}
        )
    qid = tbl["qid"].to_numpy(zero_copy_only=False)
    vid = tbl[id_col].to_numpy(zero_copy_only=False)
    cos = tbl["cos"].to_numpy(zero_copy_only=False)
    # one vectorized pass for ALL queries (a per-query Python loop here
    # cost s1's self-join path ~7 s at 5k queries): lexsort by
    # (qid, cos desc, id asc), then segment ranks + cut to k
    order = np.lexsort((vid, -cos, qid))
    sq = qid[order]
    n = len(order)
    new_q = np.ones(n, dtype=bool)
    new_q[1:] = sq[1:] != sq[:-1]
    idx = np.arange(n, dtype=np.int64)
    starts = np.maximum.accumulate(np.where(new_q, idx, 0))
    rank = idx - starts + 1
    keep = rank <= k
    sel = order[keep]
    return pa.table(
        {
            "qid": pa.array(qid[sel]),
            id_col: pa.array(vid[sel]),
            "rank": pa.array(rank[keep]),
            "cos": pa.array(cos[sel]),
        }
    )


def self_topk(
    ds: Dataset,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
    ids: np.ndarray | None = None,
    mat: np.ndarray | None = None,
) -> pa.Table:
    """All-pairs cosine top-k SELF-join: each vector's k nearest
    neighbours within the same dataset (near-duplicate ranking,
    related-item discovery) — exact.

    Broadcast formulation: the full (ids, matrix) pair ships once via
    ``ray.put`` and every batch scores against it — ONE streaming pass
    over the corpus side; right whenever the N×d query matrix fits a
    worker (the brute/oracle baseline, same duality as the r8
    broadcast kNN vs the r8b tiled-halo kNN).  At 10⁹+ vectors use
    the IVF path (:func:`ivf_build_index` + :func:`ivf_query_index`
    probed per corpus slab) or the threshold semantics of
    ``dedup.embedding_neardup_pairs``.

    Self-matches are dropped by ID, not by cosine — an exact
    duplicate under a DIFFERENT id stays (and ranks first).  Ranks
    are recomputed after the self-drop, so the result equals a
    ``ROW_NUMBER`` over the a ≠ b cross join (cos desc, id asc).
    """
    if ids is None or mat is None:
        q = ds.select_columns([id_col, vec_col]).to_pandas()
        # ^ O(N·d) on the driver — this IS the broadcast side (the
        # whole point of the brute formulation); the docstring names
        # the scale escape hatches.  Callers holding the (ids, matrix)
        # pair already (e.g. from a local parquet read) pass it in and
        # skip this pipeline execution.
        ids = q[id_col].to_numpy().astype(np.int64)
        mat = np.stack(q[vec_col].values).astype(np.float64)
    else:
        ids = np.asarray(ids).astype(np.int64)
        mat = np.asarray(mat, dtype=np.float64)
    kk = k + 1 if exclude_self else k
    out = brute_topk(ds, ids, mat, k=kk, vec_col=vec_col, id_col=id_col)
    if not exclude_self:
        return out
    qid = out["qid"].to_numpy(zero_copy_only=False)
    vid = out[id_col].to_numpy(zero_copy_only=False)
    cos = out["cos"].to_numpy(zero_copy_only=False)
    keep = qid != vid
    # re-rank the survivors with the SAME (cos desc, id asc) rule and
    # cut to k — one shared implementation, no second copy of the
    # segment-rank idiom
    return _final_topk(
        pa.table(
            {
                "qid": pa.array(qid[keep]),
                id_col: pa.array(vid[keep]),
                "cos": pa.array(cos[keep]),
            }
        ),
        k,
        id_col,
    )


class _TileSelfTopK:
    """Actor-pool tile scorer for the distributed self-join: each
    input row names one (query-slab, corpus-slab) tile; the actor
    loads both slabs from the slab layout (small per-actor cache —
    tiles sharing a slab reuse the load), scores the full tile with
    one float64 matmul, and emits each query's tie-safe per-tile
    top-k candidates.  Memory per actor = cached slabs × slab_rows ×
    dim × 8 bytes — slab_rows is the knob that fits a tile to the
    worker heap."""

    def __init__(self, slab_dir: str, k: int, vec_col: str, id_col: str,
                 exclude_self: bool, cache_slots: int = 4):
        self.dir = slab_dir
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col
        self.exclude_self = exclude_self
        self.cache_slots = cache_slots
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def _slab(self, s: int) -> tuple[np.ndarray, np.ndarray]:
        hit = self._cache.get(s)
        if hit is not None:
            return hit
        import os

        import pyarrow.parquet as pq

        d = os.path.join(self.dir, f"slab={s}")
        files = [
            os.path.join(d, f) for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        ]
        tbls = [pq.read_table(f, columns=[self.id_col, self.vec_col]) for f in files]
        t = pa.concat_tables(tbls)
        ids = t[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _normalize(list_col_to_matrix(t[self.vec_col]).astype(np.float64))
        if len(self._cache) >= self.cache_slots:
            self._cache.pop(next(iter(self._cache)))
        self._cache[s] = (ids, mat)
        return ids, mat

    # query-side chunk: a full slab×slab float64 sims matrix (e.g.
    # 8192² = 512 MB) plus its partition copy is memory-bandwidth
    # bound, not compute bound (measured 175 s for a 50k self-join);
    # chunking the query rows keeps the transient ≈ 2 × CHUNK×slab×8
    # bytes per actor and the matmuls cache-friendly
    CHUNK = 2048

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = []
        for qs, cs in zip(batch["qs"].to_pylist(), batch["cs"].to_pylist()):
            qids, Q = self._slab(int(qs))
            cids, C = self._slab(int(cs))
            if not len(qids) or not len(cids):
                continue
            nc = len(cids)
            kk = min(self.k, nc)
            for q0 in range(0, len(qids), self.CHUNK):
                q1 = min(q0 + self.CHUNK, len(qids))
                sims = Q[q0:q1] @ C.T
                if self.exclude_self:
                    sims[qids[q0:q1, None] == cids[None, :]] = -np.inf
                # tie-safe cut (same contract as _BatchTopK): emit every
                # candidate >= the kk-th LARGEST value; kth-largest via
                # one ascending partition (no negation copies)
                cut = np.partition(sims, nc - kk, axis=1)[:, nc - kk]
                mask = sims >= cut[:, None]
                np.logical_and(mask, np.isfinite(sims), out=mask)
                rows, cols = np.nonzero(mask)
                outs.append(
                    pa.table(
                        {
                            "qid": pa.array(qids[q0 + rows]),
                            self.id_col: pa.array(cids[cols]),
                            "cos": pa.array(sims[rows, cols]),
                        }
                    )
                )
        if not outs:
            return pa.table(
                {"qid": pa.array([], type=pa.int64()),
                 self.id_col: pa.array([], type=pa.int64()),
                 "cos": pa.array([], type=pa.float64())}
            )
        return pa.concat_tables(outs)


def write_slab_layout(
    ds: Dataset,
    out_dir: str,
    num_slabs: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """Write (id, vector) hash-sliced into ``slab=<s>/`` dirs (shared
    Knuth bucket hash of the id — deterministic, skew-proof for
    arbitrary id patterns, cluster-size-invariant).  Rows are
    CLUSTERED by slab before the write (one exchange) so each slab is
    ~1 file instead of blocks × slabs fragments — same layout rule as
    :func:`ivf_build_index`.

    A ``_DONE`` marker (stamped with the slab count) makes the layout
    RESUMABLE: a re-run with the same ``out_dir``/``num_slabs`` skips
    the exchange and write entirely (same pattern as the persisted
    PageRank edge layout)."""
    import os

    from rayraster.join import key_bucket

    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == str(num_slabs):
                return out_dir
        raise ValueError(
            f"{out_dir} holds a layout with a different slab count — "
            "remove it or pick another work_dir"
        )
    if os.path.isdir(out_dir):
        # dir without marker = an interrupted write; write_parquet
        # APPENDS, so a dirty dir must be cleared before the retry
        import shutil

        shutil.rmtree(out_dir)

    def assign(t: pa.Table) -> pa.Table:
        b = key_bucket(t[id_col], num_slabs)
        return pa.table(
            {id_col: t[id_col], vec_col: t[vec_col], "slab": pa.array(b)}
        )

    ds.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    ).sort("slab").write_parquet(out_dir, partition_cols=["slab"])
    with open(marker, "w") as f:
        f.write(str(num_slabs))
    return out_dir


def self_topk_distributed(
    ds: Dataset,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
    slab_rows: int = 65536,
    work_dir: str | None = None,
    corpus_count: int | None = None,
    concurrency: int | None = None,
    output: str = "table",
) -> pa.Table | Dataset:
    """All-pairs cosine top-k self-join, EXACT, with no whole-corpus
    materialization anywhere: the corpus is hash-sliced into S =
    ceil(n / slab_rows) slabs on disk, the S×S tile grid fans out as
    a Ray Data stage over an actor pool (each task holds at most two
    slabs — the worker-heap bound), and per-tile tie-safe top-k
    candidates fold distributedly before the deterministic
    (cos desc, id asc) merge.  Work is the same O(n²·d) as the exact
    broadcast path (:func:`self_topk`) — all-pairs exactness is
    irreducibly quadratic — but peak memory per node drops from
    O(n·d) to O(slab_rows·d), which is what unblocks 10⁹-vector
    corpora.  Candidate traffic into the final merge is ~k per query
    per slab-row batch, never the corpus.

    Bit-parity: same normalize → float64 matmul → (cos desc, id asc)
    rules as :func:`self_topk`, so both paths satisfy the same
    ROW_NUMBER-over-cross-join oracle.

    ``output="table"`` merges the folded candidates on the driver (the
    result is k·N rows — fine while THAT fits); ``output="dataset"``
    keeps even the result distributed: candidates go through ONE
    hash-partitioned grouped top-k (``agg.grouped_topk``) and come
    back as a streaming Dataset of (qid, <id>, rank, cos) ready for
    ``write_parquet`` — the 10⁹-vector form, where k·N itself is too
    big for any single node.  The slab layout is resumable: re-runs
    with the same ``work_dir`` skip the slab exchange (``_DONE``
    marker)."""
    import math
    import tempfile

    if output not in ("table", "dataset"):
        raise ValueError('output must be "table" or "dataset"')
    n = corpus_count if corpus_count is not None else ds.count()
    S = max(1, math.ceil(n / max(1, slab_rows)))
    out = work_dir or tempfile.mkdtemp(prefix="rayraster_selfjoin_")
    write_slab_layout(ds, out, S, vec_col=vec_col, id_col=id_col)
    cand = _self_tile_candidates(
        out, S, k, vec_col, id_col, exclude_self, concurrency
    )
    if output == "dataset":
        from rayraster.agg import grouped_topk

        ranked = grouped_topk(
            cand, ["qid"], "cos", k, descending=True, tie_col=id_col,
            num_partitions=max(8, min(64, S * 4)),
        )
        return ranked.map_batches(
            lambda t: t.rename_columns(
                ["rank" if c == "rnk" else c for c in t.column_names]
            ),
            batch_format="pyarrow",
        )
    return _final_topk(_collect_candidates(cand, id_col, k=k), k, id_col)


def _self_tile_candidates(
    slab_dir: str,
    num_slabs: int,
    k: int,
    vec_col: str,
    id_col: str,
    exclude_self: bool,
    concurrency: int | None = None,
) -> Dataset:
    """The S×S tile fan-out as a Dataset of per-tile candidates (split
    out so tests can bound the folded candidate row count)."""
    import ray.data as rd

    pairs = [
        {"qs": q, "cs": c} for q in range(num_slabs) for c in range(num_slabs)
    ]
    tiles = rd.from_items(pairs, override_num_blocks=len(pairs))
    pool = concurrency or min(len(pairs), 8)
    return tiles.map_batches(
        _TileSelfTopK(slab_dir, k, vec_col, id_col, exclude_self),
        batch_format="pyarrow",
        batch_size=1,
        concurrency=pool,
    )


# ---------------------------------------------------------------------------
# IVF-style bucketed ANN (the scale path)
# ---------------------------------------------------------------------------


def seeded_centroids(dim: int, n_centroids: int, seed: int = 424242) -> np.ndarray:
    """Deterministic unit-norm centroids (no kmeans dependency; for
    real corpora swap in a one-pass sampled kmeans — interface equal)."""
    rng = np.random.default_rng(seed)
    return _normalize(rng.standard_normal((n_centroids, dim)))


def kmeans_centroids(
    ds: Dataset,
    n_centroids: int,
    vec_col: str = "embedding",
    sample_size: int = 65536,
    iters: int = 5,
    seed: int = 424242,
) -> np.ndarray:
    """One-pass sampled spherical k-means: a bounded deterministic
    sample (``Dataset.limit`` — block order is deterministic for
    parquet reads) trains Lloyd iterations on the driver; the sample,
    not the corpus, bounds driver memory.  Init = first n_centroids
    sample vectors (deterministic).  Returns unit-norm (C, dim)."""
    sample = np.stack(
        [r[vec_col] for r in ds.limit(sample_size).take_all()]
    ).astype(np.float64)
    X = _normalize(sample)
    C = _normalize(X[:n_centroids].copy())
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(n_centroids):
            m = assign == j
            if m.any():
                C[j] = X[m].mean(axis=0)
        C = _normalize(C)
    return C


def ivf_objective(vecs: np.ndarray, centroids: np.ndarray) -> float:
    """Mean max-cosine of vectors to their nearest centroid — the
    spherical-kmeans objective (higher = tighter buckets)."""
    X = _normalize(np.asarray(vecs, dtype=np.float64))
    return float(np.max(X @ centroids.T, axis=1).mean())


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
        vecs = _normalize(list_col_to_matrix(batch[self.vec_col]).astype(np.float64))
        bucket = np.argmax(vecs @ self.C.T, axis=1).astype(np.int64)
        return batch.append_column("bucket", pa.array(bucket))


def ivf_build_index(
    ds: Dataset,
    out_dir: str,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """Write the corpus bucket-partitioned by nearest centroid
    (hive-style ``bucket=<b>/`` dirs) — the persisted IVF index.  At
    query time only probed bucket directories are read (partition
    pruning), so a probe touches nprobe/C of the corpus bytes instead
    of filtering all rows post-read.

    The assigned rows are SORTED by bucket before the write: without
    the clustering shuffle every input block writes one fragment per
    bucket it touches (blocks × buckets tiny files — measured 895
    files / 57 s probe at 10k vectors; clustered: ~1 file per bucket).
    ``bucket`` is kept as an in-file column too (``partition_cols``
    moves it into the dir name only), so probed dirs can be read in
    ONE ``read_parquet`` call."""
    cref = ray.put(np.asarray(centroids))
    assigned = ds.map_batches(
        IVFAssignStage(cref, vec_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).map_batches(
        lambda t: t.append_column("bucket_id", t["bucket"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    assigned.sort("bucket").write_parquet(out_dir, partition_cols=["bucket"])
    return out_dir


def ivf_query_index(
    index_dir: str,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Top-k over a persisted IVF index: reads ONLY the probed bucket
    directories (explicit ``bucket=<b>`` path pruning — unprobed
    buckets' bytes never leave storage), then the same
    per-query-masked partial top-k as :func:`ivf_topk` — bit-identical
    results to the in-flight path with the same centroids."""
    import os

    import ray.data as rd

    C = np.asarray(centroids)
    n_centroids = len(C)
    Q = _normalize(np.asarray(query_mat, dtype=np.float64))
    nprobe = min(nprobe, n_centroids)
    probe_idx = np.argsort(-(Q @ C.T), kind="stable", axis=1)[:, :nprobe]
    probe = np.zeros((len(Q), n_centroids), dtype=bool)
    np.put_along_axis(probe, probe_idx, True, axis=1)
    wanted = sorted({int(b) for row in probe_idx for b in row})
    dirs = [
        d for d in (os.path.join(index_dir, f"bucket={b}") for b in wanted)
        if os.path.isdir(d)  # a bucket with no assigned rows has no dir
    ]
    if not dirs:
        return pa.table(
            {"qid": pa.array([], type=pa.int64()), id_col: pa.array([], type=pa.int64()),
             "rank": pa.array([], type=pa.int64()), "cos": pa.array([], type=pa.float64())}
        )
    # ONE read over all probed dirs' files (bucket carried as the
    # in-file bucket_id column) — a per-dir read loop pays
    # dataset-creation metadata cost per bucket
    files = [
        os.path.join(d, f)
        for d in dirs
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    sub = rd.read_parquet(files, columns=[id_col, vec_col, "bucket_id"]).map_batches(
        lambda t: t.rename_columns(
            ["bucket" if c == "bucket_id" else c for c in t.column_names]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    qref = ray.put({"ids": np.asarray(query_ids), "mat": Q, "probe": probe})
    cand = sub.map_batches(
        _BatchTopK(qref, k, vec_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return _final_topk(_collect_candidates(cand, id_col, k=k), k, id_col)


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
    centroids: np.ndarray | None = None,
) -> pa.Table:
    """Approximate cosine top-k probing the ``nprobe`` nearest centroid
    buckets per query (per-query bucket mask — a query never scans a
    bucket probed only by another query).  Same output schema as
    :func:`brute_topk`.

    ``centroids``: pass :func:`kmeans_centroids` output (the trained
    scale path) or data-derived seed vectors (SQL-reproducible — the
    s2 oracle path); default falls back to seeded random."""
    C = seeded_centroids(dim, n_centroids) if centroids is None else np.asarray(centroids)
    n_centroids = len(C)
    cref = ray.put(C)
    assigned = ds.map_batches(
        IVFAssignStage(cref, vec_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    Q = _normalize(np.asarray(query_mat, dtype=np.float64))
    nprobe = min(nprobe, n_centroids)
    probe_idx = np.argsort(-(Q @ C.T), kind="stable", axis=1)[:, :nprobe]  # (nq, nprobe)
    probe = np.zeros((len(Q), n_centroids), dtype=bool)
    np.put_along_axis(probe, probe_idx, True, axis=1)
    wanted = sorted({int(b) for row in probe_idx for b in row})
    wset = pa.array(wanted, type=pa.int64())

    def _probe_filter(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t["bucket"], value_set=wset))

    sub = assigned.map_batches(_probe_filter, batch_format="pyarrow", zero_copy_batch=True)
    qref = ray.put({"ids": np.asarray(query_ids), "mat": Q, "probe": probe})
    cand = sub.map_batches(
        _BatchTopK(qref, k, vec_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return _final_topk(_collect_candidates(cand, id_col, k=k), k, id_col)


# ---------------------------------------------------------------------------
# PCA / whitening (embedding post-processing)
# ---------------------------------------------------------------------------


def embedding_pca(
    ds: Dataset,
    vec_col: str = "embedding",
    d_out: int | None = None,
    batch_size: int = 65536,
    fold_batch: int = 64,
):
    """Distributed PCA over an embedding column — the standard vector
    post-processing step (decorrelate / whiten / reduce before ANN or
    near-dup; e.g. the whitening in "Whitening Sentence Representations"
    and IVF-PQ preprocessing).

    Shape at 10^12 rows: the covariance is assembled from ONE map-only
    streaming pass — each batch emits a fixed-size blob (n, Σx, XᵀX:
    d² + d + 1 doubles, ~2 MB at d=512), an add-fold stage collapses
    ``fold_batch`` blobs, the driver sums the handful and runs the d×d
    ``eigh`` locally (d is model width, never corpus-sized).  No
    shuffle, no row materialization.  Float sums are schedule-dependent
    at the ulp level (documented — this is a numeric operator, not a
    hash-exact one; tests pin to numpy within tolerance).

    Returns ``(components, mean, explained_var)``: rows of
    ``components`` are the top ``d_out`` eigenvectors (descending
    eigenvalue; sign fixed so each row's largest-|entry| is positive —
    deterministic given the covariance), ``explained_var`` the
    matching eigenvalues (sample covariance, ddof=1)."""

    def gram_batch(t: pa.Table) -> pa.Table:
        X = list_col_to_matrix(t[vec_col]).astype(np.float64)
        blob = np.concatenate(
            [[float(len(X))], X.sum(axis=0), (X.T @ X).reshape(-1)]
        )
        return pa.table({"blob": pa.array([blob.tobytes()], type=pa.binary())})

    def add_fold(t: pa.Table) -> pa.Table:
        acc = None
        for b in t["blob"].to_pylist():
            v = np.frombuffer(b, np.float64)
            acc = v.copy() if acc is None else acc + v
        return pa.table({"blob": pa.array([acc.tobytes()], type=pa.binary())})

    folded = ds.map_batches(
        gram_batch, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    ).map_batches(
        add_fold, batch_format="pyarrow", batch_size=fold_batch,
        zero_copy_batch=True,
    )
    acc = None
    for t in folded.iter_batches(batch_format="pyarrow", batch_size=fold_batch):
        for b in t["blob"].to_pylist():
            v = np.frombuffer(b, np.float64)
            acc = v.copy() if acc is None else acc + v
    if acc is None:
        raise ValueError("embedding_pca: empty dataset")
    n = acc[0]
    if n < 2:
        raise ValueError("embedding_pca needs at least 2 rows")
    d = int(round((-1 + np.sqrt(1 + 4 * (len(acc) - 1))) / 2))
    s = acc[1:1 + d]
    G = acc[1 + d:].reshape(d, d)
    mean = s / n
    cov = (G - np.outer(s, mean)) / (n - 1.0)
    cov = (cov + cov.T) / 2.0  # symmetrize fp drift before eigh
    w, V = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    w, V = w[order], V[:, order]
    k = d if d_out is None else min(d_out, d)
    comps = V[:, :k].T.copy()
    # deterministic sign: the largest-|entry| of each component is +
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps, mean, np.maximum(w[:k], 0.0)


class PCATransformStage:
    """Project (and optionally whiten) an embedding column with the
    components from :func:`embedding_pca`: ``y = C(x − μ)[ / √λ]`` —
    a stateless vectorized batch map (one matmul per batch); the
    components/mean ship once per task as captured arrays (a few KB —
    use ``ray.put`` handles for very wide models)."""

    def __init__(self, components: np.ndarray, mean: np.ndarray,
                 explained_var: np.ndarray | None = None,
                 vec_col: str = "embedding", out_col: str = "embedding_pca",
                 whiten: bool = False, eps: float = 1e-12):
        self.C = np.asarray(components, np.float64)
        self.mu = np.asarray(mean, np.float64)
        self.vec_col = vec_col
        self.out_col = out_col
        if whiten:
            if explained_var is None:
                raise ValueError("whiten=True needs explained_var")
            self.scale = 1.0 / np.sqrt(np.asarray(explained_var, np.float64) + eps)
        else:
            self.scale = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = list_col_to_matrix(batch[self.vec_col]).astype(np.float64)
        Y = (X - self.mu) @ self.C.T
        if self.scale is not None:
            Y = Y * self.scale
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(Y.reshape(-1), type=pa.float64()), Y.shape[1]
        )
        return batch.append_column(self.out_col, arr)


# ---------------------------------------------------------------------------
# product quantization (compressed ANN — the memory-bound scale path)
# ---------------------------------------------------------------------------


def pq_train(
    ds: Dataset,
    vec_col: str = "embedding",
    m: int = 8,
    n_centroids: int = 256,
    sample_size: int = 65536,
    iters: int = 8,
) -> np.ndarray:
    """Train product-quantization codebooks (Jégou et al. 2011): split
    the (unit-normalized) vector into ``m`` contiguous subspaces, run
    Lloyd k-means with L2 per subspace on a bounded deterministic
    sample (same sampling contract as :func:`kmeans_centroids`).
    Returns ``(m, n_centroids, dim/m)`` float64 codebooks.

    Why PQ at 10^12 vectors: a 256-d float32 corpus is 1 KB/vector;
    ``m=8`` codes are 8 BYTES/vector (128×), so the scan side of ANN
    becomes memory-bandwidth-cheap table lookups (ADC) instead of
    matmuls over raw vectors — compose with the IVF layout for the
    classic IVF-PQ."""
    if n_centroids > 256:
        raise ValueError("n_centroids must fit a uint8 code (<= 256)")
    sample = np.stack(
        [r[vec_col] for r in ds.limit(sample_size).take_all()]
    ).astype(np.float64)
    X = _normalize(sample)
    n, d = X.shape
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    books = np.empty((m, n_centroids, dsub))
    for s in range(m):
        Xs = X[:, s * dsub:(s + 1) * dsub]
        # deterministic init: first n_centroids DISTINCT subvectors
        # (repeated subvectors would pin duplicate centroids)
        _, first = np.unique(Xs.round(12), axis=0, return_index=True)
        init = Xs[np.sort(first)[:n_centroids]]
        C = np.concatenate(
            [init, Xs[: n_centroids - len(init)]]
        ) if len(init) < n_centroids else init
        C = C.copy()
        for _ in range(iters):
            d2 = (
                (Xs * Xs).sum(1)[:, None]
                - 2.0 * (Xs @ C.T)
                + (C * C).sum(1)[None, :]
            )
            assign = np.argmin(d2, axis=1)
            for j in range(len(C)):
                mask = assign == j
                if mask.any():
                    C[j] = Xs[mask].mean(axis=0)
        books[s, : len(C)] = C
        if len(C) < n_centroids:
            books[s, len(C):] = C[0]  # degenerate tail never wins argmin ties
    return books


class PQEncodeStage:
    """map_batches stage: vector → ``m``-byte PQ code (nearest codebook
    entry per subspace, vectorized argmin per batch).  Codebooks ship
    once per task via the captured ``ray.put`` handle."""

    def __init__(self, books_ref, vec_col: str = "embedding",
                 id_col: str = "vec_id"):
        self._ref = books_ref
        self.books = None
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.books is None:
            self.books = (ray.get(self._ref)
                          if isinstance(self._ref, ray.ObjectRef) else self._ref)
        B = self.books
        m, nc, dsub = B.shape
        X = _normalize(list_col_to_matrix(batch[self.vec_col]).astype(np.float64))
        codes = np.empty((len(X), m), np.uint8)
        for s in range(m):
            Xs = X[:, s * dsub:(s + 1) * dsub]
            C = B[s]
            d2 = (
                (Xs * Xs).sum(1)[:, None]
                - 2.0 * (Xs @ C.T)
                + (C * C).sum(1)[None, :]
            )
            codes[:, s] = np.argmin(d2, axis=1).astype(np.uint8)
        arr = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(m), len(X), [None, pa.py_buffer(codes.tobytes())]
        )
        return pa.table(
            {self.id_col: batch[self.id_col], "pq_code": arr}
        )


def pq_encode(ds: Dataset, books: np.ndarray, vec_col: str = "embedding",
              id_col: str = "vec_id") -> Dataset:
    """Encode a vector column to ``m``-byte PQ codes (streaming; the
    output Dataset carries only (id, pq_code))."""
    return ds.map_batches(
        PQEncodeStage(ray.put(books), vec_col, id_col),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def pq_search(
    codes: Dataset,
    books: np.ndarray,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
) -> pa.Table:
    """Asymmetric-distance (ADC) top-k over PQ codes: per query, one
    (m × 256) table of exact subspace distances to every codebook
    entry; each code row's approximate L2² is ``Σ_s T[s, code_s]`` —
    table GATHERS per batch, no per-row matmul, the raw vectors never
    load.  Per-batch partial top-k folds exactly like
    :func:`brute_topk` (distance ascending, id-ascending tie-break).
    On unit vectors L2² = 2 − 2·cos, so ranking matches the cosine
    family's contract."""
    m, nc, dsub = books.shape
    Q = _normalize(np.asarray(query_mat, np.float64))
    qids = np.asarray(query_ids)
    # tables[q, s, c] = ||Q[q, s·dsub:(s+1)·dsub] − books[s, c]||²
    T = np.empty((len(Q), m, nc))
    for s in range(m):
        Qs = Q[:, s * dsub:(s + 1) * dsub]
        C = books[s]
        T[:, s, :] = (
            (Qs * Qs).sum(1)[:, None]
            - 2.0 * (Qs @ C.T)
            + (C * C).sum(1)[None, :]
        )
    tref = ray.put({"T": T, "qids": qids})

    def score(batch: pa.Table) -> pa.Table:
        obj = ray.get(tref) if isinstance(tref, ray.ObjectRef) else tref
        TT, qq = obj["T"], obj["qids"]
        col = batch["pq_code"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        buf = np.frombuffer(
            col.buffers()[1], np.uint8,
            count=len(col) * m, offset=col.offset * m,
        ).reshape(len(col), m)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if len(ids) == 0:  # empty code block: no candidates, no crash
            return pa.table(
                {"qid": pa.array([], type=pa.int64()),
                 id_col: pa.array([], type=batch[id_col].type),
                 "adc": pa.array([], type=pa.float64())}
            )
        # dist[q, row] = Σ_s TT[q, s, code[row, s]] — one gather per
        # subspace, accumulated (nq × nbatch)
        dist = np.zeros((len(qq), len(ids)))
        for s in range(m):
            dist += TT[:, s, buf[:, s]]
        kk = min(k, dist.shape[1])
        cut = np.partition(dist, kk - 1, axis=1)[:, kk - 1]
        mask = dist <= cut[:, None]
        rows, cols = np.nonzero(mask)
        return pa.table(
            {"qid": pa.array(qq[rows]),
             id_col: pa.array(ids[cols]),
             "adc": pa.array(dist[rows, cols])}
        )

    cand = codes.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    batches = [t for t in cand.iter_batches(batch_format="pyarrow",
                                            batch_size=65536)]
    if not batches:  # empty corpus: the typed empty result, like siblings
        return pa.table(
            {"qid": pa.array([], type=pa.int64()),
             id_col: pa.array([], type=pa.int64()),
             "rank": pa.array([], type=pa.int64()),
             "adc": pa.array([], type=pa.float64())}
        )
    tbl = pa.concat_tables(batches).combine_chunks()
    # deterministic final merge: (qid, adc asc, id asc) → rank
    order = np.lexsort(
        (tbl[id_col].to_numpy(zero_copy_only=False),
         tbl["adc"].to_numpy(zero_copy_only=False),
         tbl["qid"].to_numpy(zero_copy_only=False))
    )
    tbl = tbl.take(pa.array(order, type=pa.int64()))
    q = tbl["qid"].to_numpy(zero_copy_only=False)
    new = np.ones(len(q), bool)
    new[1:] = q[1:] != q[:-1]
    seg = np.cumsum(new) - 1
    pos = np.arange(len(q)) - np.concatenate([[0], np.nonzero(new)[0][1:]])[seg]
    keep = pos < k
    out = tbl.filter(pa.array(keep))
    rank = (pos[keep] + 1).astype(np.int64)
    return out.append_column("rank", pa.array(rank))


def sq_train(
    ds: Dataset, vec_col: str = "embedding", normalize: bool = True
) -> dict:
    """Train per-dimension scalar-quantization ranges: ONE map-only
    pass emitting a (lo, hi) pair of d-vectors per batch, folded to
    the global ranges on the driver (d doubles — never rows; the same
    blob-fold shape as :func:`embedding_pca`'s Gram pass).

    ``normalize=True`` trains on unit-normalized vectors (the cosine
    family's contract); returns ``{"lo": (d,), "hi": (d,),
    "normalize": bool}`` for :func:`sq_encode` / :func:`sq_search`.

    Why SQ at 10^12 vectors: uint8 codes are 8× smaller than float64
    (4× vs float32) with NO codebook training or gather tables — the
    cheap, always-applicable compression tier below PQ (Jégou et al.
    2011 §II.A calls this the scalar baseline)."""

    def ranges(batch: pa.Table) -> pa.Table:
        X = list_col_to_matrix(batch[vec_col]).astype(np.float64)
        if normalize:
            X = _normalize(X)
        if len(X) == 0:
            return pa.table({"lo": pa.array([], type=pa.binary()),
                             "hi": pa.array([], type=pa.binary())})
        return pa.table(
            {
                "lo": pa.array([X.min(axis=0).tobytes()], type=pa.binary()),
                "hi": pa.array([X.max(axis=0).tobytes()], type=pa.binary()),
            }
        )

    rows = ds.map_batches(ranges, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    if not rows:
        raise ValueError("sq_train: empty dataset")
    lo = np.min(np.stack([np.frombuffer(r["lo"]) for r in rows]), axis=0)
    hi = np.max(np.stack([np.frombuffer(r["hi"]) for r in rows]), axis=0)
    return {"lo": lo, "hi": hi, "normalize": bool(normalize)}


class SQEncodeStage:
    """map_batches stage: vector → d-byte uint8 scalar-quantized code
    (``round((x − lo)·255/(hi − lo))``, clipped; degenerate dims with
    hi == lo encode 0).  Ranges ship once per task via the captured
    ``ray.put`` handle."""

    def __init__(self, ranges_ref, vec_col: str = "embedding",
                 id_col: str = "vec_id"):
        self._ref = ranges_ref
        self.r = None
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.r is None:
            self.r = (ray.get(self._ref)
                      if isinstance(self._ref, ray.ObjectRef) else self._ref)
        lo, hi = self.r["lo"], self.r["hi"]
        span = hi - lo
        safe = np.where(span > 0, span, 1.0)
        X = list_col_to_matrix(batch[self.vec_col]).astype(np.float64)
        if self.r["normalize"]:
            X = _normalize(X)
        q = np.rint(np.clip((X - lo) / safe, 0.0, 1.0) * 255.0)
        codes = np.where(span > 0, q, 0.0).astype(np.uint8)
        d = codes.shape[1]
        arr = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(d), len(X), [None, pa.py_buffer(codes.tobytes())]
        )
        return pa.table({self.id_col: batch[self.id_col], "sq_code": arr})


def sq_encode(ds: Dataset, ranges: dict, vec_col: str = "embedding",
              id_col: str = "vec_id") -> Dataset:
    """Encode a vector column to d-byte SQ codes (streaming; the output
    Dataset carries only (id, sq_code))."""
    return ds.map_batches(
        SQEncodeStage(ray.put(ranges), vec_col, id_col),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def sq_search(
    codes: Dataset,
    ranges: dict,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
) -> pa.Table:
    """Cosine top-k over SQ codes: per batch, reconstruct
    ``x̂ = lo + code·(hi − lo)/255`` (one affine op over the uint8
    matrix — the raw vectors never load), unit-normalize, score
    against the broadcast query matrix, and fold per-batch partial
    top-k exactly like :func:`brute_topk` (cos desc, id asc).  When
    every corpus coordinate sits on the 256-point grid of its range
    the reconstruction is EXACT and the result equals
    :func:`brute_topk` bit for bit (pytest-pinned).

    Compute note: reconstruction makes the scan compute-identical to
    the brute path — SQ's win is the 8× storage/IO/object-store
    footprint.  For a compute-bound variant, fold the affine map into
    the query side (``dot(q, x̂) = dot(q·s, c) + dot(q, lo)``) and
    gather ``‖x̂‖`` from a per-dim table like :func:`pq_search`'s ADC."""
    Q = _normalize(np.asarray(query_mat, np.float64))
    qids = np.asarray(query_ids)
    lo, hi = ranges["lo"], ranges["hi"]
    scale = (hi - lo) / 255.0
    d = len(lo)
    qref = ray.put({"Q": Q, "qids": qids, "lo": lo, "scale": scale})

    def score(batch: pa.Table) -> pa.Table:
        obj = ray.get(qref) if isinstance(qref, ray.ObjectRef) else qref
        QQ, qq = obj["Q"], obj["qids"]
        col = batch["sq_code"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        buf = np.frombuffer(
            col.buffers()[1], np.uint8,
            count=len(col) * d, offset=col.offset * d,
        ).reshape(len(col), d)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if len(ids) == 0:  # empty code block: no candidates, no crash
            return pa.table(
                {"qid": pa.array([], type=pa.int64()),
                 id_col: pa.array([], type=batch[id_col].type),
                 "cos": pa.array([], type=pa.float64())}
            )
        X = _normalize(obj["lo"] + buf * obj["scale"])
        sims = QQ @ X.T
        kk = min(k, sims.shape[1])
        cut = -np.partition(-sims, kk - 1, axis=1)[:, kk - 1]
        mask = sims >= cut[:, None]
        rows, cols = np.nonzero(mask)
        return pa.table(
            {"qid": pa.array(qq[rows]), id_col: pa.array(ids[cols]),
             "cos": pa.array(sims[rows, cols])}
        )

    cand = codes.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return _final_topk(_collect_candidates(cand, id_col, k=k), k, id_col)


def semantic_neardup_pairs(
    ds: Dataset,
    threshold: float = 0.95,
    n_clusters: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 65536,
    max_cluster: int = 100_000,
) -> Dataset:
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al.
    2023, arXiv:2303.09540): spherical k-means the embeddings, then
    compare ONLY within each cluster — cosine ≥ ``threshold`` pairs
    come out as ``(a, b)`` with a < b, ready for the repo's connected
    -components → keep-list chain (same contract as
    ``dedup.minhash_lsh_pairs``).

    Candidate generation is the cluster assignment (map-only, the
    centroid matrix broadcast once); the pairwise work is per-cluster
    — O(Σ c_i²) instead of O(n²), the published method's trade.
    APPROXIMATE by design: a pair straddling a cluster boundary is
    missed, exactly like an LSH band miss; raise ``n_clusters`` or the
    ``threshold`` family for tighter recall.

    Distribution: centroids from the bounded deterministic sample
    (:func:`kmeans_centroids`), ONE cluster-keyed exchange, per-cluster
    blockwise X·Xᵀ (vectorized, upper triangle only).  A cluster above
    ``max_cluster`` raises (re-run with more clusters) instead of
    silently attempting an O(c²) that cannot finish — the documented
    skew guard.

    Determinism: centroids, assignment, and per-cluster thresholding
    are all pure functions of the data — pairs are identical across
    partitionings and cluster sizes (pytest-pinned)."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    dim_probe = ds.limit(1).take_all()
    if not dim_probe:
        import ray.data as _rd

        return _rd.from_arrow(
            pa.table({"a": pa.array([], type=pa.int64()),
                      "b": pa.array([], type=pa.int64()),
                      "cos": pa.array([], type=pa.float64())})
        )
    C = kmeans_centroids(ds, n_clusters, vec_col=vec_col,
                         sample_size=sample_size)
    cref = ray.put(C)
    assigned = ds.map_batches(
        IVFAssignStage(cref, vec_col, id_col),
        batch_format="pyarrow", zero_copy_batch=True,
    ).map_batches(
        lambda t: t.select([id_col, vec_col, "bucket"]),
        batch_format="pyarrow",
    )

    empty = pa.table(
        {"a": pa.array([], type=pa.int64()),
         "b": pa.array([], type=pa.int64()),
         "cos": pa.array([], type=pa.float64())}
    )

    def cluster_pairs(grp: pa.Table) -> pa.Table:
        c = grp.num_rows
        if c < 2:
            return empty
        if c > max_cluster:
            raise ValueError(
                f"semantic_neardup_pairs: cluster of {c} rows exceeds "
                f"max_cluster={max_cluster} — raise n_clusters"
            )
        ids = grp[id_col].to_numpy(zero_copy_only=False)
        X = _normalize(list_col_to_matrix(grp[vec_col]).astype(np.float64))
        out_a, out_b, out_c = [], [], []
        block = 2048
        col = np.arange(c)
        for s in range(0, c, block):
            Xb = X[s:s + block]
            S = Xb @ X.T  # (b, c)
            # strict upper triangle of the full matrix: col > global row
            mask = (S >= threshold) & (col[None, :] > (s + np.arange(len(Xb)))[:, None])
            r, cc = np.nonzero(mask)
            if len(r):
                out_a.append(ids[s + r])
                out_b.append(ids[cc])
                out_c.append(S[r, cc])
        if not out_a:
            return empty
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        cs = np.concatenate(out_c)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        nz = lo != hi  # duplicate ids in a cluster: no self-pairs
        return pa.table(
            {"a": pa.array(lo[nz]), "b": pa.array(hi[nz]),
             "cos": pa.array(cs[nz])}
        )

    return assigned.groupby("bucket").map_groups(
        cluster_pairs, batch_format="pyarrow"
    )
