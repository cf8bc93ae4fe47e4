"""Deduplication operators for training-data pipelines.

All from scratch on Ray Data (no reference analog — SEraster has no
set ops, SURVEY.md §2 "Set ops / dedup: none" — these are the
training-pipeline extensions the task brief mandates):

* exact_dedup        — content-hash → hash-partitioned keep-first
* minhash_lsh_pairs  — char-shingle MinHash → banded LSH buckets →
                       candidate pairs → exact-Jaccard verification
* simhash_pairs      — 64-bit SimHash → 4×16-bit band buckets
                       (pigeonhole: hamming ≤ 3 ⇒ ≥1 equal band) →
                       verified by exact Hamming distance
* ngram_jaccard      — exact word-n-gram Jaccard (the verifier, also
                       exposed standalone)
* embedding_neardup_pairs — random-hyperplane LSH over an embedding
                       column → candidate pairs → exact cosine ≥ τ

Scale notes: candidate generation shuffles only (bucket_key, id)
rows.  Verification has TWO paths, selected by ``verify_mode``:

* ``broadcast`` — {id: payload} in the object store via ``ray.put``,
  fetched once per verify actor.  Fastest when the payload table fits
  one node (≤ ``broadcast_threshold`` docs).
* ``partitioned`` — the 10^12-row path: candidate pairs are resolved
  against the (id, payload) table with TWO hash-partitioned bucket
  joins (:func:`attach_pair_payloads` — join on ``a``, then on
  ``b``), then verified vectorized per batch.  Nothing is
  materialized on the driver and nothing is broadcast; both sides
  stream through co-location shuffles.

``verify_mode="auto"`` (default) picks via a BOUNDED row probe
(``limit(threshold+1).count()`` — never a full corpus pass) or a
caller-supplied ``corpus_count``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from rayraster.agg import distinct, hash_aggregate

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def add_content_hash(batch: pa.Table, text_col: str = "text", out_col: str = "_h") -> pa.Table:
    # cast-to-binary hands hashlib the utf-8 buffers directly (no
    # str decode + re-encode per row); md5 itself is oracle-bound
    # (DuckDB twin: md5(coalesce(text, '')) — NULL text ≡ '')
    data = pc.fill_null(batch[text_col], "").cast(pa.binary()).to_pylist()
    h = [hashlib.md5(b).hexdigest() for b in data]
    return batch.append_column(out_col, pa.array(h, type=pa.string()))


def exact_dedup_keep_ids(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id", num_partitions: int = 64
) -> Dataset:
    """ids of the kept (minimum-id) representative per distinct text.

    hash-partition + per-group first — the exact-dedup shape from the
    task brief.  md5 collisions are ignored (2^-64 scale)."""
    hashed = ds.map_batches(
        lambda b: add_content_hash(b, text_col).select(["_h", id_col]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    agg = hash_aggregate(
        hashed, ["_h"], min_cols=[id_col], count=False, num_partitions=num_partitions
    )
    return agg.map_batches(
        lambda t: pa.table({id_col: t[f"min_{id_col}"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ---------------------------------------------------------------------------
# paragraph-level exact dedup + document reassembly (the C4/CCNet
# preprocessing step: dedup at sub-document granularity ACROSS the
# corpus, keep the first occurrence, rebuild documents from survivors)
# ---------------------------------------------------------------------------


def _split_units(
    t: pa.Table, id_col: str, text_col: str, split: str, block_words: int | None
) -> pa.Table:
    """Vectorized unit emission: one output row per paragraph (plain
    ``split`` separator) or per ``block_words``-word block (units
    rebuilt from ``\\s+`` words — how the SQL twin expresses it).
    Columns: (id, _uidx position-in-doc, _unit text).  No Python loop:
    list offsets → numpy repeat/cumsum → ``ListArray`` →
    ``binary_join``."""
    txt = pc.fill_null(t[text_col], "")  # NULL text ≡ '' (repo convention)
    if block_words is None:
        lists = pc.split_pattern(txt, split)
    else:
        lists = pc.split_pattern_regex(txt, r"\s+")
    la = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) else lists
    counts = la.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
    flat = la.flatten()
    ids = t[id_col].to_numpy(zero_copy_only=False)
    if block_words is None:
        unit = flat
        doc_idx = np.repeat(np.arange(len(ids)), counts)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        uidx = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(starts, counts)
    else:
        nblk = np.maximum((counts + block_words - 1) // block_words, 1)
        doc_idx = np.repeat(np.arange(len(ids)), nblk)
        bstart = np.concatenate(([0], np.cumsum(nblk)[:-1]))
        uidx = np.arange(int(nblk.sum()), dtype=np.int64) - np.repeat(bstart, nblk)
        wstart = np.concatenate(([0], np.cumsum(counts)[:-1]))
        offs = wstart[doc_idx] + uidx * block_words
        offsets = np.append(offs, counts.sum()).astype(np.int32)
        unit = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), flat), " "
        )
    return pa.table({id_col: ids[doc_idx], "_uidx": uidx, "_unit": unit})


def paragraph_dedup(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    split: str = "\n",
    block_words: int | None = None,
    num_partitions: int = 64,
) -> Dataset:
    """Corpus-wide sub-document exact dedup (C4 §2.2 / CCNet-style):
    split every document into units — paragraphs on the plain ``split``
    separator, or fixed ``block_words``-word blocks rebuilt from
    ``\\s+`` words — drop every duplicate unit except its FIRST
    occurrence (lexicographic min ``(id, position)`` over the whole
    corpus, duplicates within one document included), then reassemble
    each document from its surviving units in order.  Returns
    ``(id_col, text_col)``; documents whose every unit was removed
    disappear (matching the SQL ``GROUP BY`` twin).

    Distributed shape (100 TB): map-only unit emission → ONE
    hash-partition shuffle on ``fnv1a64(unit)`` with a vectorized
    first-of-run winner pass per partition (dictionary codes +
    lexsort) → ONE hash-partition shuffle on the document id with a
    vectorized run-length reassembly (``ListArray`` + ``binary_join``).
    Nothing touches the driver; skew is bounded because a duplicated
    unit contributes one row per OCCURRENCE to exactly one partition.

    Edge pinned by tests: empty text yields one ``''`` unit (pyarrow's
    split of ``''``), while DuckDB's ``string_split_regex('', …)`` is
    ``[]`` — twins therefore only bind on corpora without empty/NULL
    texts (the driver tables qualify).  Reference has no dedup at all
    (SURVEY.md §2 "Set ops / dedup: none") — this is a task-brief
    training-data operator.
    """
    from rayraster.geo import fnv1a64

    join_sep = " " if block_words is not None else split

    def emit(t: pa.Table) -> pa.Table:
        out = _split_units(t, id_col, text_col, split, block_words)
        part = fnv1a64(out["_unit"]).view(np.int64) % np.int64(
            num_partitions
        )
        return out.append_column("_part", pa.array(np.abs(part)))

    def winners(part_tbl: pa.Table) -> pa.Table:
        part_tbl = part_tbl.combine_chunks()
        codes = pc.dictionary_encode(part_tbl["_unit"]).combine_chunks().indices
        codes = codes.to_numpy(zero_copy_only=False).astype(np.int64)
        ids = part_tbl[id_col].to_numpy(zero_copy_only=False)
        uidx = part_tbl["_uidx"].to_numpy(zero_copy_only=False)
        order = np.lexsort((uidx, ids, codes))
        first = np.ones(len(order), dtype=bool)
        first[1:] = codes[order[1:]] != codes[order[:-1]]
        keep = order[first]
        return part_tbl.select([id_col, "_uidx", "_unit"]).take(pa.array(keep))

    def rebuild(part_tbl: pa.Table) -> pa.Table:
        part_tbl = part_tbl.combine_chunks()
        ids = part_tbl[id_col].to_numpy(zero_copy_only=False)
        uidx = part_tbl["_uidx"].to_numpy(zero_copy_only=False)
        order = np.lexsort((uidx, ids))
        ids_s = ids[order]
        units_s = part_tbl["_unit"].combine_chunks().take(pa.array(order))
        newdoc = np.ones(len(ids_s), dtype=bool)
        newdoc[1:] = ids_s[1:] != ids_s[:-1]
        starts = np.nonzero(newdoc)[0]
        offsets = np.append(starts, len(ids_s)).astype(np.int32)
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), units_s), join_sep
        )
        return pa.table({id_col: ids_s[starts], text_col: joined})

    units = ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)
    kept = units.groupby("_part").map_groups(winners, batch_format="pyarrow")

    def repart(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        part = np.abs(ids * np.int64(2654435761)) % np.int64(num_partitions)
        return t.append_column("_part", pa.array(part))

    tagged = kept.map_batches(repart, batch_format="pyarrow", zero_copy_batch=True)
    return tagged.groupby("_part").map_groups(rebuild, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# shingles / minhash
# ---------------------------------------------------------------------------

_MIX = np.uint64(0x9E3779B97F4A7C15)


def char_shingle_hashes(text: str, k: int = 8) -> np.ndarray:
    """uint64 hashes of the k-byte shingles of ``text`` (unique,
    sorted).  Rolling-window vectorized (one multiply per offset).

    Default k=8: shingles span word boundaries, so cross-document
    Jaccard on small-vocabulary text stays low (measured on the synth
    corpus: random-pair J ≈ 0.20 at k=5 — which floods LSH with ~10^7
    false candidates at 10^5 docs — vs 0.035 at k=8)."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(b) == 0:
        return np.zeros(0, dtype=np.uint64)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)))
    win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    with np.errstate(over="ignore"):
        h = np.zeros(win.shape[0], dtype=np.uint64)
        for j in range(k):
            h = h * np.uint64(1099511628211) + win[:, j]
        h = (h ^ (h >> np.uint64(33))) * _MIX
    return np.unique(h)


def word_ngram_hashes(text: str, n: int = 3) -> np.ndarray:
    """uint64 hashes of word n-grams (unique, sorted).

    Tokens are hashed with the vectorized FNV (one numpy pass per byte
    position); n-grams combine consecutive token hashes with a
    mix-and-shift — no per-character Python."""
    from rayraster.geo import fnv1a64

    words = text.split()
    if not words:
        return np.zeros(0, dtype=np.uint64)
    h = fnv1a64(words)
    if len(words) < n:
        n = len(words)
    with np.errstate(over="ignore"):
        g = h[: len(h) - n + 1].copy()
        for j in range(1, n):
            g = (g * np.uint64(0x100000001B3)) ^ h[j : len(h) - n + 1 + j]
        g = (g ^ (g >> np.uint64(33))) * _MIX
    return np.unique(g)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted-unique hash arrays."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)


_SALTS = None


def _perm_salts(num_perm: int) -> np.ndarray:
    global _SALTS
    if _SALTS is None or len(_SALTS) < num_perm:
        # deterministic splitmix64 stream
        s = np.uint64(0x123456789ABCDEF)
        out = []
        with np.errstate(over="ignore"):
            for _ in range(num_perm):
                s = s + np.uint64(0x9E3779B97F4A7C15)
                z = s
                z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
                z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
                out.append(z ^ (z >> np.uint64(31)))
        _SALTS = np.array(out, dtype=np.uint64)
    return _SALTS[:num_perm]


def minhash_signature(shingles: np.ndarray, num_perm: int = 64) -> np.ndarray:
    """num_perm × uint64 signature: min over shingles of mixed hashes.

    Memory-bounded: the naive ``(|shingles|, num_perm)`` outer product
    amplifies a 10 MB document to ~5 GB transient at num_perm=64; the
    shingle axis is processed in 64k-row blocks with a running min —
    identical output (min is associative), O(block · num_perm) peak."""
    salts = _perm_salts(num_perm)
    if len(shingles) == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    out = np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    block = 65536
    with np.errstate(over="ignore"):
        for s in range(0, len(shingles), block):
            m = (shingles[s:s + block, None] ^ salts[None, :]) * _MIX
            np.minimum(out, m.min(axis=0), out=out)
    return out


class MinHashStage:
    """map_batches actor: text → (id, band, band_hash) bucket rows.

    Stateful (salts precomputed once per actor); emits
    bands × rows-per-signature rows per document."""

    def __init__(self, text_col="text", id_col="doc_id", num_perm=64, bands=16, k=8):
        assert num_perm % bands == 0
        self.text_col = text_col
        self.id_col = id_col
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = k
        _perm_salts(num_perm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # NULL text ≡ '' (zero shingles → the all-max signature)
        texts = pc.fill_null(batch[self.text_col], "").to_pylist()
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        n = len(texts)
        sigs = np.empty((n, self.num_perm), dtype=np.uint64)
        for i, t in enumerate(texts):
            sigs[i] = minhash_signature(char_shingle_hashes(t, self.k), self.num_perm)
        # band hash: FNV-combine the band's signature components
        r = self.rows_per_band
        bh = np.empty((n, self.bands), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for b in range(self.bands):
                h = np.full(n, np.uint64(14695981039346656037))
                for j in range(r):
                    h = (h ^ sigs[:, b * r + j]) * np.uint64(1099511628211)
                bh[:, b] = h
        out_id = np.repeat(ids, self.bands)
        out_band = np.tile(np.arange(self.bands, dtype=np.int64), n)
        out_hash = bh.reshape(-1).view(np.int64)
        return pa.table(
            {self.id_col: out_id, "band": out_band, "bhash": out_hash}
        )


def _adaptive_parts(corpus_count: int | None, cap: int) -> int:
    """Exchange partition count scaled to the (caller-known) corpus
    size: every exchange has a per-partition fixed cost (measured on
    the CC loop: 2.7 s → 0.7 s per run going 64 → 16 partitions on a
    toy graph), so small corpora run their candidate/verify shuffles
    at ≥8 partitions and ``cap`` is the production setting callers
    raise for 10^12-row inputs.  Unknown count → cap (never guess
    small at scale)."""
    if corpus_count is None:
        return cap
    return min(cap, max(8, corpus_count // 4096))


def candidate_pairs(
    bucket_rows: Dataset,
    id_col: str = "doc_id",
    num_partitions: int = 64,
    max_bucket: int = 2000,
) -> Dataset:
    """(band, bhash) bucket rows → distinct candidate pairs (a < b).

    Hash-partitioned on the bucket key (NOT one task per bucket — a
    bucket is usually tiny and there are millions of them); pairs are
    emitted per bucket segment inside each partition, vectorized, with
    a ``max_bucket`` guard so one degenerate hot bucket (e.g. all-empty
    documents) cannot emit O(n²) pairs."""

    def add_part(t: pa.Table) -> pa.Table:
        band = t["band"].to_numpy(zero_copy_only=False)
        bh = t["bhash"].to_numpy(zero_copy_only=False)
        part = np.abs(band * np.int64(1000003) ^ bh) % np.int64(num_partitions)
        return t.append_column("_part", pa.array(part))

    def emit_pairs(g: pa.Table) -> pa.Table:
        g = g.sort_by([("band", "ascending"), ("bhash", "ascending")])
        band = g["band"].to_numpy(zero_copy_only=False)
        bh = g["bhash"].to_numpy(zero_copy_only=False)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table(
                {"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64())}
            )
        new_seg = np.empty(len(ids), dtype=bool)
        new_seg[0] = True
        new_seg[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
        starts = np.flatnonzero(new_seg)
        ends = np.append(starts[1:], len(ids))
        sizes = ends - starts
        outs_a, outs_b = [], []
        # vectorized fast path for 2-member buckets — the overwhelming
        # majority on a healthy banding (the Python loop below was the
        # hot spot at 10^5+ docs: ~4e5 segments/partition)
        s2 = starts[sizes == 2]
        if len(s2):
            x, y = ids[s2], ids[s2 + 1]
            lo, hi = np.minimum(x, y), np.maximum(x, y)
            keep = lo != hi
            outs_a.append(lo[keep])
            outs_b.append(hi[keep])
        for s, t_ in zip(starts[sizes > 2], ends[sizes > 2]):
            if t_ - s > max_bucket:
                continue
            u = np.unique(ids[s:t_])
            if len(u) < 2:
                continue
            ai, bi = np.triu_indices(len(u), k=1)
            outs_a.append(u[ai])
            outs_b.append(u[bi])
        if not outs_a:
            return pa.table(
                {"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64())}
            )
        return pa.table(
            {"a": pa.array(np.concatenate(outs_a)), "b": pa.array(np.concatenate(outs_b))}
        )

    parted = bucket_rows.map_batches(
        add_part, batch_format="pyarrow", zero_copy_batch=True
    )
    pairs = parted.groupby("_part").map_groups(emit_pairs, batch_format="pyarrow")
    return distinct(pairs, ["a", "b"], num_partitions=num_partitions)


def attach_pair_payloads(
    pairs: Dataset,
    payload: Dataset,
    id_col: str,
    payload_col: str,
    num_buckets: int = 64,
    payload_type: pa.DataType | None = None,
) -> Dataset:
    """(a, b) candidate pairs ⨝ (id, payload) → (a, b, _pa, _pb).

    The partitioned pair-resolution stage: two hash-partitioned
    :func:`rayraster.join.bucket_join` hops (on ``a``, then on ``b``)
    co-locate each pair with both payloads.  No driver
    materialization, no broadcast — the verify-side 10^12-row shape
    promised by the module docstring."""
    from rayraster.join import bucket_join

    def _rename(col_from: str, col_to: str):
        def fn(t: pa.Table) -> pa.Table:
            names = [col_to if c == col_from else c for c in t.column_names]
            return t.rename_columns(names)

        return fn

    # schemas passed explicitly: pairs/h1 lineage contains shuffles, and
    # Dataset.schema() on those would re-execute the whole candidate
    # pipeline per probe (see bucket_join docstring).  ``payload_type``
    # skips even the payload schema probe — pass it when the payload's
    # OWN lineage contains a shuffle (e.g. a distinct() sig table).
    if payload_type is None:
        pay_schema = payload.schema()
        pay_type = dict(zip(pay_schema.names, pay_schema.types))[payload_col]
        if not isinstance(pay_type, pa.DataType):
            pay_type = {str: pa.string(), bytes: pa.binary(), int: pa.int64()}.get(
                pay_type, pa.string()
            )
    else:
        pay_type = payload_type
    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    h1_schema = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("_pa", pay_type)]
    )
    r_schema = pa.schema([(id_col, pa.int64()), (payload_col, pay_type)])

    h1 = bucket_join(
        pairs, payload, "a", id_col, num_buckets=num_buckets,
        left_schema=pair_schema, right_schema=r_schema,
    )
    h1 = h1.map_batches(
        _rename(payload_col, "_pa"), batch_format="pyarrow", zero_copy_batch=True
    )
    h2 = bucket_join(
        h1, payload, "b", id_col, num_buckets=num_buckets,
        left_schema=h1_schema, right_schema=r_schema,
    )
    return h2.map_batches(
        _rename(payload_col, "_pb"), batch_format="pyarrow", zero_copy_batch=True
    )


class _VerifyJaccardPartitioned:
    """Exact Jaccard over pairs carrying their own payloads
    (``_pa``/``_pb`` from :func:`attach_pair_payloads`).  Shingle sets
    are cached per id (bounded), so a hub document re-verified against
    many candidates is shingled once per task."""

    def __init__(self, threshold: float, kind: str = "char", k: int = 8, n: int = 3):
        self.threshold = threshold
        self._cache: dict = {}
        self._fn = (
            (lambda t: char_shingle_hashes(t, k))
            if kind == "char"
            else (lambda t: word_ngram_hashes(t, n))
        )

    def _sh(self, i, text):
        s = self._cache.get(i)
        if s is None:
            if len(self._cache) > 100_000:
                self._cache.clear()
            s = self._cache[i] = self._fn(text or "")  # NULL text ≡ ''
        return s

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        ta = batch["_pa"].to_pylist()
        tb = batch["_pb"].to_pylist()
        jac = np.array(
            [jaccard(self._sh(x, tx), self._sh(y, ty))
             for x, y, tx, ty in zip(a, b, ta, tb)]
        )
        keep = jac >= self.threshold if len(a) else np.zeros(0, dtype=bool)
        return pa.table(
            {"a": pa.array(a[keep]), "b": pa.array(b[keep]),
             "jac": pa.array(jac[keep], type=pa.float64())}
        )


def _popcount64(x: np.ndarray) -> np.ndarray:
    if len(x) == 0:
        return np.zeros(0, dtype=np.int64)
    bits = np.unpackbits(np.ascontiguousarray(x).view(np.uint8))
    return bits.reshape(len(x), 64).sum(axis=1).astype(np.int64)


def _verify_hamming_partitioned(batch: pa.Table, max_dist: int) -> pa.Table:
    a = batch["a"].to_numpy(zero_copy_only=False)
    b = batch["b"].to_numpy(zero_copy_only=False)
    sa = batch["_pa"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    sb = batch["_pb"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    dist = _popcount64(np.bitwise_xor(sa, sb))
    keep = dist <= max_dist
    return pa.table(
        {"a": pa.array(a[keep]), "b": pa.array(b[keep]), "hamming": pa.array(dist[keep])}
    )


def _verify_cosine_partitioned(batch: pa.Table, threshold: float) -> pa.Table:
    a = batch["a"].to_numpy(zero_copy_only=False)
    b = batch["b"].to_numpy(zero_copy_only=False)
    if len(a) == 0:
        return pa.table(
            {"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64()),
             "cos": pa.array([], type=pa.float64())}
        )
    from rayraster.similarity import binary_col_to_matrix

    # read-only buffer views — normalize into fresh arrays, not in place
    va = binary_col_to_matrix(batch["_pa"], np.float64)
    vb = binary_col_to_matrix(batch["_pb"], np.float64)
    va = va / np.maximum(np.linalg.norm(va, axis=1, keepdims=True), 1e-30)
    vb = vb / np.maximum(np.linalg.norm(vb, axis=1, keepdims=True), 1e-30)
    cos = np.einsum("ij,ij->i", va, vb)
    keep = cos >= threshold
    return pa.table(
        {"a": pa.array(a[keep]), "b": pa.array(b[keep]),
         "cos": pa.array(cos[keep], type=pa.float64())}
    )


def _pick_verify_mode(
    ds: Dataset, verify_mode: str, broadcast_threshold: int,
    corpus_count: int | None = None,
) -> str:
    """Pick broadcast vs partitioned verify.

    ``auto`` only needs to know whether the corpus EXCEEDS the
    broadcast threshold — a full ``ds.count()`` would execute the
    whole upstream lineage of a lazy input just to pick a code path
    (an extra corpus pass, measured on d2/d2b).  Instead: use the
    caller-supplied ``corpus_count`` when given, else a BOUNDED probe
    ``ds.limit(threshold+1).count()`` — the streaming executor stops
    feeding upstream operators once the limit is satisfied, so the
    probe reads at most threshold+1 rows regardless of corpus size."""
    if verify_mode == "auto":
        n = (
            corpus_count
            if corpus_count is not None
            else ds.limit(broadcast_threshold + 1).count()
        )
        return "broadcast" if n <= broadcast_threshold else "partitioned"
    if verify_mode not in ("broadcast", "partitioned"):
        raise ValueError(f"verify_mode must be auto|broadcast|partitioned, got {verify_mode!r}")
    return verify_mode


class _VerifyJaccard:
    """Exact shingle-Jaccard for candidate pairs.

    MUST be passed to map_batches as a CLASS (with
    ``fn_constructor_args``) so Ray makes an actor pool — an instance
    would run as stateless tasks and refetch/rehash per task.  The
    broadcast {id: text} map is fetched once per actor; shingle hash
    sets are computed LAZILY per id and cached (pairs usually touch a
    small subset of the corpus)."""

    def __init__(self, texts_ref, threshold: float, kind: str = "char", k: int = 8, n: int = 3):
        self._texts = ray.get(texts_ref) if isinstance(texts_ref, ray.ObjectRef) else texts_ref
        self._cache: dict = {}
        self.threshold = threshold
        self._fn = (
            (lambda t: char_shingle_hashes(t, k))
            if kind == "char"
            else (lambda t: word_ngram_hashes(t, n))
        )

    def _sh(self, i):
        s = self._cache.get(i)
        if s is None:
            if len(self._cache) > 100_000:  # bounded like the
                self._cache.clear()        # partitioned twin
            s = self._cache[i] = self._fn(self._texts[i] or "")  # NULL ≡ ''
        return s

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        jac = np.array(
            [jaccard(self._sh(x), self._sh(y)) for x, y in zip(a, b)]
        )
        keep = jac >= self.threshold
        return pa.table(
            {"a": pa.array(a[keep]), "b": pa.array(b[keep]), "jac": pa.array(jac[keep])}
        )


def minhash_lsh_pairs(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 8,
    texts_ref=None,
    verify_mode: str = "auto",
    broadcast_threshold: int = 50_000,
    num_buckets: int = 64,
    corpus_count: int | None = None,
) -> Dataset:
    """Near-duplicate pairs with exact-verified char-shingle Jaccard ≥
    threshold.  ``verify_mode`` picks the verify shape (module
    docstring); ``texts_ref`` (optional pre-broadcast {id: text})
    forces the broadcast path; ``corpus_count`` (if known) skips the
    auto-mode row probe entirely."""
    parts = _adaptive_parts(corpus_count, num_buckets)
    buckets = ds.map_batches(
        MinHashStage(text_col, id_col, num_perm, bands, k),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pairs = candidate_pairs(buckets, id_col, num_partitions=parts)
    if texts_ref is None and _pick_verify_mode(
        ds, verify_mode, broadcast_threshold, corpus_count
    ) == "partitioned":
        joined = attach_pair_payloads(
            pairs, ds.select_columns([id_col, text_col]), id_col, text_col, parts
        )
        return joined.map_batches(
            _VerifyJaccardPartitioned(threshold, "char", k),
            batch_format="pyarrow",
        )
    if texts_ref is None:
        pdf = ds.select_columns([id_col, text_col]).to_pandas()
        texts_ref = ray.put(dict(zip(pdf[id_col], pdf[text_col])))
        small = len(pdf) <= broadcast_threshold
    else:
        small = False
    if small:
        # tiny corpus: task form beats actor-pool spin-up (~2-4 s)
        return pairs.map_batches(
            _VerifyJaccard(texts_ref, threshold, "char", k),
            batch_format="pyarrow",
        )
    return pairs.map_batches(
        _VerifyJaccard,
        fn_constructor_args=(texts_ref, threshold, "char", k),
        batch_format="pyarrow",
        concurrency=(1, 2),
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> np.uint64:
    """64-bit SimHash over word-unigram hashes."""
    toks = word_ngram_hashes(text, n=1)
    if len(toks) == 0:
        return np.uint64(0)
    bits = np.unpackbits(toks.view(np.uint8).reshape(len(toks), 8), axis=1)
    score = bits.sum(axis=0).astype(np.int64) * 2 - len(toks)  # ±1 vote per bit
    return np.uint64(np.packbits(score > 0).view(np.uint64)[0])


class SimHashStage:
    def __init__(self, text_col="text", id_col="doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        # NULL text ≡ '' (zero tokens → signature 0)
        texts = pc.fill_null(batch[self.text_col], "").to_pylist()
        sigs = np.array([simhash64(t) for t in texts], dtype=np.uint64)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        # 4 bands × 16 bits: hamming ≤ 3 ⇒ at least one band equal
        out = {
            self.id_col: np.repeat(ids, 4),
            "band": np.tile(np.arange(4, dtype=np.int64), len(ids)),
            "bhash": np.empty(4 * len(ids), dtype=np.int64),
            "sig": np.repeat(sigs.view(np.int64), 4),
        }
        for b in range(4):
            chunk = (sigs >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            out["bhash"][b::4] = chunk.astype(np.int64)
        return pa.table(out)


def simhash_pairs(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dist: int = 3,
    verify_mode: str = "auto",
    broadcast_threshold: int = 50_000,
    num_buckets: int = 64,
    corpus_count: int | None = None,
) -> Dataset:
    """Near-dup pairs with Hamming(simhash) ≤ max_dist (≤ 3 for exact
    recall with the 4×16 banding; larger max_dist is best-effort)."""
    parts = _adaptive_parts(corpus_count, num_buckets)
    rows = ds.map_batches(
        SimHashStage(text_col, id_col), batch_format="pyarrow", zero_copy_batch=True
    )
    return _banded_hamming_pairs(
        rows, ds, id_col, max_dist, verify_mode, broadcast_threshold,
        parts, corpus_count,
    )


def hamming_neardup_pairs(
    ds: Dataset,
    sig_col: str = "phash",
    id_col: str = "doc_id",
    max_dist: int = 4,
    n_bands: int = 8,
    verify_mode: str = "auto",
    broadcast_threshold: int = 50_000,
    num_buckets: int = 64,
    corpus_count: int | None = None,
) -> Dataset:
    """Near-dup pairs over a PRECOMPUTED 64-bit signature column:
    Hamming(sig) ≤ ``max_dist`` — the generic banded-LSH engine behind
    any fingerprint family (perceptual image hashes from
    :class:`rayraster.multimodal.ImagePHashStage`, SimHash from other
    tooling, …).

    Bits split into ``n_bands`` equal chunks (64 % n_bands == 0);
    a pair within ``max_dist`` differs in ≤ max_dist bands, so with
    ``max_dist < n_bands`` at least one band matches — EXACT recall
    (pigeonhole), then exact popcount verification kills band-collision
    false positives.  Same dual verify path as every near-dup family
    here: broadcast signature dict under ``broadcast_threshold`` docs,
    two hash-partitioned ``bucket_join`` hops above it.  Band-width
    trade at scale: 8 bands × 8 bits leaves 256 buckets per band —
    fine to ~10^5 docs; at corpus scale use 4 bands × 16 bits with
    ``max_dist ≤ 3`` (or shard the band key by a signature prefix) so
    bucket sizes stay bounded (``candidate_pairs``'s ``max_bucket``
    guard drops degenerate buckets rather than emitting O(n²))."""
    if 64 % n_bands != 0:
        raise ValueError(f"n_bands must divide 64, got {n_bands}")
    if max_dist >= n_bands:
        raise ValueError(
            f"exact recall needs max_dist < n_bands (pigeonhole); "
            f"got max_dist={max_dist}, n_bands={n_bands}"
        )
    width = 64 // n_bands
    mask = np.uint64((1 << width) - 1)
    parts = _adaptive_parts(corpus_count, num_buckets)

    def band_rows(batch: pa.Table) -> pa.Table:
        sigs = batch[sig_col].to_numpy(zero_copy_only=False).view(np.uint64)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out = {
            id_col: np.repeat(ids, n_bands),
            "band": np.tile(np.arange(n_bands, dtype=np.int64), len(ids)),
            "bhash": np.empty(n_bands * len(ids), dtype=np.int64),
            "sig": np.repeat(sigs.view(np.int64), n_bands),
        }
        for b in range(n_bands):
            chunk = (sigs >> np.uint64(width * b)) & mask
            out["bhash"][b::n_bands] = chunk.astype(np.int64)
        return pa.table(out)

    rows = ds.map_batches(band_rows, batch_format="pyarrow", zero_copy_batch=True)
    return _banded_hamming_pairs(
        rows, ds, id_col, max_dist, verify_mode, broadcast_threshold,
        parts, corpus_count,
    )


def _banded_hamming_pairs(
    rows: Dataset,
    probe_ds: Dataset,
    id_col: str,
    max_dist: int,
    verify_mode: str,
    broadcast_threshold: int,
    parts: int,
    corpus_count: int | None,
) -> Dataset:
    """Shared tail of the Hamming near-dup families: banded rows
    ``(id, band, bhash, sig)`` → candidate pairs → exact-popcount
    verify (broadcast dict or two partitioned join hops)."""
    pairs = candidate_pairs(rows, id_col, num_partitions=parts)
    sig_rows = distinct(rows, [id_col, "sig"], num_partitions=parts)
    if _pick_verify_mode(probe_ds, verify_mode, broadcast_threshold, corpus_count) == "partitioned":
        # materialize: the sig table (one small row per doc) feeds BOTH
        # join hops and its lineage contains the SimHash map + a
        # shuffle — unmaterialized, each hop (plus the schema probe)
        # would recompute signatures for the whole corpus
        sig_rows = sig_rows.materialize()
        joined = attach_pair_payloads(
            pairs, sig_rows, id_col, "sig", parts, payload_type=pa.int64()
        )
        return joined.map_batches(
            lambda t: _verify_hamming_partitioned(t, max_dist),
            batch_format="pyarrow",
        )
    sig_pdf = sig_rows.to_pandas()
    sig_ref = ray.put(dict(zip(sig_pdf[id_col], sig_pdf["sig"].astype(np.int64))))

    class _VerifyHamming:
        def __init__(self):
            self.sigs = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self.sigs is None:
                self.sigs = ray.get(sig_ref)
            a = batch["a"].to_numpy(zero_copy_only=False)
            b = batch["b"].to_numpy(zero_copy_only=False)
            # popcount over the UNSIGNED view — int.bit_count() on a
            # signed xor popcounts the absolute value, which is wrong
            # whenever bit 63 differs (same arithmetic as the
            # partitioned twin _verify_hamming_partitioned)
            sa = np.array([self.sigs[x] for x in a.tolist()],
                          dtype=np.int64).view(np.uint64)
            sb = np.array([self.sigs[y] for y in b.tolist()],
                          dtype=np.int64).view(np.uint64)
            dist = _popcount64(np.bitwise_xor(sa, sb))
            keep = dist <= max_dist
            return pa.table(
                {
                    "a": pa.array(a[keep]),
                    "b": pa.array(b[keep]),
                    "hamming": pa.array(dist[keep]),
                }
            )

    if len(sig_pdf) <= broadcast_threshold:
        return pairs.map_batches(_VerifyHamming(), batch_format="pyarrow")
    return pairs.map_batches(_VerifyHamming, batch_format="pyarrow", concurrency=(1, 2))


# ---------------------------------------------------------------------------
# embedding near-dup (cosine LSH)
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, n_planes: int, table: int) -> np.ndarray:
    rng = np.random.default_rng(8675309 + table)
    return rng.standard_normal((dim, n_planes))


class HyperplaneLSHStage:
    """embedding → (id, band=table, bhash=sign-bit bucket) rows."""

    def __init__(self, vec_col="embedding", id_col="vec_id", n_planes=16, n_tables=4, dim=64):
        self.vec_col = vec_col
        self.id_col = id_col
        self.planes = [_hyperplanes(dim, n_planes, t) for t in range(n_tables)]
        self.n_tables = n_tables
        self.pow2 = (1 << np.arange(n_planes, dtype=np.int64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        from rayraster.similarity import list_col_to_matrix

        vecs = list_col_to_matrix(batch[self.vec_col]).astype(np.float64)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        parts = []
        for t, P in enumerate(self.planes):
            bits = (vecs @ P) > 0
            bh = bits @ self.pow2
            parts.append(
                pa.table(
                    {
                        self.id_col: ids,
                        "band": np.full(len(ids), t, dtype=np.int64),
                        "bhash": bh,
                    }
                )
            )
        return pa.concat_tables(parts)


def embedding_neardup_pairs(
    ds: Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.99,
    dim: int = 64,
    verify_mode: str = "auto",
    broadcast_threshold: int = 50_000,
    num_buckets: int = 64,
    corpus_count: int | None = None,
) -> Dataset:
    """Pairs with exact cosine ≥ threshold, candidates from
    random-hyperplane LSH (4 tables × 16 planes)."""
    parts = _adaptive_parts(corpus_count, num_buckets)
    rows = ds.map_batches(
        HyperplaneLSHStage(vec_col, id_col, dim=dim),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pairs = candidate_pairs(rows, id_col, num_partitions=parts)
    if _pick_verify_mode(ds, verify_mode, broadcast_threshold, corpus_count) == "partitioned":
        # serialize vectors to fixed float64 bytes: Arrow's hash join
        # can't carry list columns (pyarrow 16), binary it can.  The
        # whole matrix serializes in ONE buffer op — a fixed_size_binary
        # view over the contiguous row bytes, cast to binary for the
        # join (no per-row Python .tobytes() loop on the corpus side)
        def to_bytes(t: pa.Table) -> pa.Table:
            from rayraster.similarity import list_col_to_matrix

            vecs = np.ascontiguousarray(
                list_col_to_matrix(t[vec_col]).astype("<f8")
            )
            n, w = vecs.shape
            fsb = pa.Array.from_buffers(
                pa.binary(w * 8), n, [None, pa.py_buffer(vecs.tobytes())]
            )
            return pa.table({id_col: t[id_col], "_vb": fsb.cast(pa.binary())})

        payload = ds.map_batches(to_bytes, batch_format="pyarrow", zero_copy_batch=True)
        joined = attach_pair_payloads(pairs, payload, id_col, "_vb", parts)
        return joined.map_batches(
            lambda t: _verify_cosine_partitioned(t, threshold),
            batch_format="pyarrow",
        )
    pdf = ds.select_columns([id_col, vec_col]).to_pandas()
    mat = np.stack(pdf[vec_col].values).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    vec_ref = ray.put({"ids": pdf[id_col].to_numpy(), "mat": mat})

    class _VerifyCosine:
        def __init__(self):
            self.row = None
            self.mat = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self.mat is None:
                obj = ray.get(vec_ref)
                self.mat = obj["mat"]
                self.row = {int(i): k for k, i in enumerate(obj["ids"])}
            a = batch["a"].to_numpy(zero_copy_only=False)
            b = batch["b"].to_numpy(zero_copy_only=False)
            ra = np.array([self.row[int(x)] for x in a])
            rb = np.array([self.row[int(x)] for x in b])
            cos = np.einsum("ij,ij->i", self.mat[ra], self.mat[rb]) if len(a) else np.zeros(0)
            keep = cos >= threshold
            return pa.table(
                {"a": pa.array(a[keep]), "b": pa.array(b[keep]), "cos": pa.array(cos[keep])}
            )

    if len(pdf) <= broadcast_threshold:
        return pairs.map_batches(_VerifyCosine(), batch_format="pyarrow")
    return pairs.map_batches(_VerifyCosine, batch_format="pyarrow", concurrency=(1, 2))


# ---------------------------------------------------------------------------
# connected components over near-dup pairs → dedup clusters
# ---------------------------------------------------------------------------


def connected_components(
    pairs: Dataset,
    a_col: str = "a",
    b_col: str = "b",
    max_rounds: int = 20,
    num_partitions: int = 64,
) -> pa.Table:
    """Cluster ids for every node appearing in a pair: iterative
    min-label propagation — each round broadcasts the (small) label
    table and reduces per-node mins with the hash-partitioned grouped
    aggregate; converges in O(component diameter) rounds.

    The label table holds only nodes that appear in near-dup PAIRS —
    tiny relative to the corpus — so driver-side label state is the
    right trade (the Ray-guide dedup pattern); the edge set streams
    through the cluster every round.  Returns an arrow table
    (node, cluster), cluster = min reachable node id."""

    def to_edges(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False)
        b = t[b_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b])),
                "peer": pa.array(np.concatenate([b, a])),
            }
        )

    edges = pairs.map_batches(
        to_edges, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # reused every round; 2 rows per pair

    from rayraster.agg import hash_aggregate
    from rayraster.join import broadcast_join

    def collect(ds: Dataset) -> pa.Table:
        return pa.concat_tables([ray.get(r) for r in ds.to_arrow_refs()]).combine_chunks()

    empty = pa.table(
        {"node": pa.array([], type=pa.int64()), "cluster": pa.array([], type=pa.int64())}
    )
    if edges.count() == 0:  # no pairs → no clusters
        return empty

    # init: label(node) = min(node, min direct peer)
    init = collect(
        hash_aggregate(edges, ["node"], min_cols=["peer"], count=False,
                       num_partitions=num_partitions)
    )
    if init.num_rows == 0:
        return empty
    nodes = np.asarray(init["node"].to_numpy(zero_copy_only=False))
    order = np.argsort(nodes)
    nodes = nodes[order]
    labels = np.minimum(
        nodes, np.asarray(init["min_peer"].to_numpy(zero_copy_only=False))[order]
    )

    converged = False
    for _ in range(max_rounds):
        peer_labels = pa.table(
            {"peer": pa.array(nodes), "peer_label": pa.array(labels)}
        )
        msgs = broadcast_join(edges, peer_labels, keys=["peer"], concurrency=2)
        new_min = collect(
            hash_aggregate(msgs, ["node"], min_cols=["peer_label"], count=False,
                           num_partitions=num_partitions)
        )
        nn = new_min["node"].to_numpy(zero_copy_only=False)
        nv = new_min["min_peer_label"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(nodes, nn)
        merged = labels.copy()
        np.minimum.at(merged, pos, nv)
        # pointer jump: label(node) ← label(label(node)) — keeps round
        # count O(log diameter) so max_rounds is a safety cap, not a
        # silent truncation on long chains (templated near-dup text)
        lpos = np.searchsorted(nodes, merged)
        hit = (lpos < len(nodes)) & (nodes[np.minimum(lpos, len(nodes) - 1)] == merged)
        np.minimum.at(merged, np.flatnonzero(hit), labels[lpos[hit]])
        if np.array_equal(merged, labels):
            converged = True
            break
        labels = merged
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds; "
            "raise max_rounds (labels were still changing)"
        )
    return pa.table({"node": pa.array(nodes), "cluster": pa.array(labels)})


def connected_components_distributed(
    pairs: Dataset,
    a_col: str = "a",
    b_col: str = "b",
    max_rounds: int = 64,
    num_partitions: int = 64,
) -> Dataset:
    """Connected components with NO driver-side label state — the
    10^12-pair scale path (:func:`connected_components` keeps a numpy
    label table on the driver, right only while paired nodes are few).

    Labels live in a Dataset; each round computes

      label(v) ← min(label(v), min_{(v,u)∈E} label(u), label(label(v)))

    with ONE hash-partitioned bucket join: both the neighbor-min term
    and the pointer-jump term are "look up label[req] and deliver it
    to out", so the edge requests (out=node, req=peer) and the jump
    requests (out=v, req=label(v)) are unioned into a single request
    table joined once against the labels — one co-location shuffle
    per round instead of two (plus the grouped-min exchange).

    The ``label(label(v))`` term is pointer jumping: a chain of
    diameter d converges in O(log d) rounds instead of O(d).  The only
    driver-side value per round is one int64 checksum (labels are
    monotone non-increasing, so Σlabel is constant iff fixpoint).
    Raises RuntimeError if ``max_rounds`` pass without convergence.
    Returns a Dataset (node, cluster)."""
    from rayraster.join import bucket_join

    def to_edges(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False)
        b = t[b_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b])),
                "peer": pa.array(np.concatenate([b, a])),
            }
        )

    edges = pairs.map_batches(
        to_edges, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # reused every round; 2 rows per pair

    # partition count scales with the edge set: every exchange has a
    # per-partition fixed cost (measured 2.7 s/round at 64 partitions
    # vs 0.7 s at 16 on a 10k-edge toy graph), so small graphs run at
    # ≥8 partitions and ``num_partitions`` is the cap the caller
    # raises for production edge counts (~64k edges per partition)
    n_edges = edges.count()  # materialized → metadata read
    num_partitions = min(num_partitions, max(8, n_edges // 65536 + 1))

    i64 = pa.int64()
    def _rename(names):
        def fn(t: pa.Table) -> pa.Table:
            return t.rename_columns(names)

        return fn

    # init: label(node) = min(node, min direct peer)
    init = hash_aggregate(
        edges, ["node"], min_cols=["peer"], count=False, num_partitions=num_partitions
    )

    def clamp(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False)
        lab = np.minimum(node, t["min_peer"].to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(node), "label": pa.array(lab)})

    labels = init.map_batches(clamp, batch_format="pyarrow").materialize()
    # sum() is the round checksum; None only for an empty label table
    checksum = labels.sum("label") or 0

    def _edge_requests(t: pa.Table) -> pa.Table:
        return pa.table({"out": t["node"], "req": t["peer"]})

    def _jump_requests(t: pa.Table) -> pa.Table:
        return pa.table({"out": t["node"], "req": t["label"]})

    req_schema = pa.schema([("out", i64), ("req", i64)])

    for _ in range(max_rounds):
        # both update terms are "deliver label[req] to out":
        #   neighbor min  → (out=node, req=peer)   for every edge
        #   pointer jump  → (out=v,    req=label(v)) for every label
        requests = edges.map_batches(
            _edge_requests, batch_format="pyarrow"
        ).union(labels.map_batches(_jump_requests, batch_format="pyarrow"))
        delivered = bucket_join(
            requests,
            labels.map_batches(_rename(["req", "label"]), batch_format="pyarrow"),
            "req",
            "req",
            num_buckets=num_partitions,
            left_schema=req_schema,
            right_schema=pa.schema([("req", i64), ("label", i64)]),
        ).map_batches(
            lambda t: pa.table({"node": t["out"], "label": t["label"]}),
            batch_format="pyarrow",
        )
        cand = labels.union(delivered)
        merged = hash_aggregate(
            cand, ["node"], min_cols=["label"], count=False, num_partitions=num_partitions
        )
        labels = merged.map_batches(
            _rename(["node", "label"]), batch_format="pyarrow"
        ).materialize()
        new_sum = labels.sum("label") or 0
        if new_sum == checksum:
            return labels.map_batches(
                _rename(["node", "cluster"]), batch_format="pyarrow"
            )
        checksum = new_sum
    raise RuntimeError(
        f"connected_components_distributed did not converge in {max_rounds} rounds"
    )


def dedup_keep_from_clusters_ds(clusters: Dataset, id_col: str = "doc_id") -> Dataset:
    """Distributed keep-list: one representative (cluster label = min
    id) per cluster, as a Dataset (pairs with
    :func:`connected_components_distributed`)."""
    reps = distinct(clusters.select_columns(["cluster"]), ["cluster"])
    return reps.map_batches(
        lambda t: pa.table({id_col: t["cluster"]}), batch_format="pyarrow"
    )


def dedup_keep_from_clusters(clusters: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Keep-list from a cluster assignment: one representative (the
    cluster label = min id) per cluster."""
    reps = np.unique(clusters["cluster"].to_numpy(zero_copy_only=False))
    return pa.table({id_col: pa.array(reps)})


# ---------------------------------------------------------------------------
# exact word-n-gram Jaccard over candidate pairs (standalone operator)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 32,
    k: int = 8,
    verify_mode: str = "auto",
    broadcast_threshold: int = 50_000,
    num_buckets: int = 64,
    corpus_count: int | None = None,
) -> Dataset:
    """Near-dup pairs by exact word-n-gram Jaccard ≥ threshold;
    candidates from an aggressive MinHash banding (32 bands × 2 rows —
    high recall at moderate thresholds)."""
    parts = _adaptive_parts(corpus_count, num_buckets)
    buckets = ds.map_batches(
        MinHashStage(text_col, id_col, num_perm, bands, k=k),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pairs = candidate_pairs(buckets, id_col, num_partitions=parts)
    if _pick_verify_mode(ds, verify_mode, broadcast_threshold, corpus_count) == "partitioned":
        joined = attach_pair_payloads(
            pairs, ds.select_columns([id_col, text_col]), id_col, text_col, parts
        )
        return joined.map_batches(
            _VerifyJaccardPartitioned(threshold, "word", 5, n),
            batch_format="pyarrow",
        )
    pdf = ds.select_columns([id_col, text_col]).to_pandas()
    texts_ref = ray.put(dict(zip(pdf[id_col], pdf[text_col])))
    if len(pdf) <= broadcast_threshold:
        return pairs.map_batches(
            _VerifyJaccard(texts_ref, threshold, "word", 5, n),
            batch_format="pyarrow",
        )
    return pairs.map_batches(
        _VerifyJaccard,
        fn_constructor_args=(texts_ref, threshold, "word", 5, n),
        batch_format="pyarrow",
        concurrency=(1, 2),
    )


def leakage_safe_split(
    docs: Dataset,
    clusters: Dataset,
    id_col: str = "doc_id",
    val_num: int = 100_000,
    rate_den: int = 1000003,
    num_partitions: int = 64,
) -> Dataset:
    """Near-dup-aware train/validation split: the split decision is a
    deterministic hash of the document's NEAR-DUP CLUSTER label, so
    every member of a cluster lands on the SAME side — the leakage
    guard every LLM eval needs (a val doc whose near-duplicate sits in
    train is a contaminated eval point; Lee et al. 2021 §5 measure
    exactly this inflation).  Documents in no cluster are singletons
    (cluster = own id).

    ``clusters`` is the (node, cluster) Dataset from
    :func:`connected_components` / :func:`connected_components_distributed`
    over any near-dup pair table (MinHash/SimHash/embedding/Hamming).
    The split keeps the repo's sampling contract: side = ``val`` iff
    ``(cluster · 2654435761) % rate_den < val_num`` — the same
    chunk/cluster-size-invariant id arithmetic as
    :func:`rayraster.agg.deterministic_sample`, exactly reproducible
    in SQL.  Expected val fraction = ``val_num / rate_den`` of
    CLUSTERS (not docs — a giant cluster moves as one unit, which is
    the point).

    Plan: one hash-partitioned LEFT :func:`rayraster.join.bucket_join`
    (docs ⨝ clusters on id; both sides stream) + a map-only flag —
    adds exactly one exchange to whatever produced the pairs.
    Returns the docs with ``cluster`` and ``split`` columns.
    """
    from rayraster.agg import _sample_hash
    from rayraster.join import bucket_join

    doc_schema = docs.schema()
    names = list(doc_schema.names)
    if "cluster" in names or "split" in names:
        raise ValueError("docs already carry a cluster/split column")
    cl = clusters.map_batches(
        lambda t: pa.table({id_col: t["node"], "cluster": t["cluster"]}),
        batch_format="pyarrow",
    )
    cl_schema = pa.schema([(id_col, pa.int64()), ("cluster", pa.int64())])
    joined = bucket_join(
        docs, cl, id_col, id_col, num_buckets=num_partitions,
        join_type="left",
        left_schema=doc_schema.base_schema if hasattr(doc_schema, "base_schema")
        else None,
        right_schema=cl_schema,
    )

    def flag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = t[id_col].to_numpy(zero_copy_only=False)
        # singletons: cluster = own id.  Fill nulls IN ARROW before
        # to_numpy — a null-bearing int64 column round-trips through
        # float64 and silently corrupts ids >= 2^53 (the key_bucket
        # trap); coalescing to 0 first keeps the int64 path exact
        isnull = pc.is_null(t["cluster"]).to_numpy(zero_copy_only=False)
        cluster = pc.fill_null(
            t["cluster"].cast(pa.int64()), 0
        ).to_numpy(zero_copy_only=False)
        cl_eff = np.where(isnull, ids, cluster).astype(np.int64)
        is_val = _sample_hash(cl_eff, rate_den) < np.int64(val_num)
        out = t.drop_columns(["cluster"]).append_column(
            "cluster", pa.array(cl_eff)
        )
        return out.append_column(
            "split", pa.array(np.where(is_val, "val", "train"))
        )

    return joined.map_batches(flag, batch_format="pyarrow")


_GEAR_SEED = 0x9E3779B9
_gear_cache: "np.ndarray | None" = None


def gear_table() -> np.ndarray:
    """The 256-entry uint64 Gear table (deterministic: PCG64 seeded
    with the golden-ratio constant) shared by every CDC call site —
    chunk boundaries are stable across processes, partitions and
    cluster sizes by construction."""
    global _gear_cache
    if _gear_cache is None:
        rng = np.random.Generator(np.random.PCG64(_GEAR_SEED))
        _gear_cache = rng.integers(0, 2**64, size=256, dtype=np.uint64)
    return _gear_cache


def cdc_chunks(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_size: int = 64,
    avg_bits: int = 13,
    max_size: int = 65536,
) -> Dataset:
    """Content-defined chunking (Gear rolling hash — FastCDC's base
    gear, Xia et al. 2016): split every document at positions where
    the rolling hash's low ``avg_bits`` bits are zero (expected chunk
    ≈ ``2^avg_bits`` bytes), bounded by ``min_size``/``max_size``.
    The storage-dedup primitive brought to corpus curation: shared
    chunks survive INSERTIONS AND DELETIONS (boundaries re-synchronize
    after an edit), which fixed-window shingles cannot do.

    MAP-ONLY — no shuffle: the boundary condition at byte ``i``
    depends only on the last ``avg_bits`` bytes (``h_i = Σ_{k<bits}
    G[b_{i-k}]·2^k mod 2^bits``), so the rolling hash is computed as
    ``avg_bits`` vectorized shifted adds over the flat byte buffer of
    the whole batch (windows crossing document starts are masked), and
    only the SPARSE candidate positions (≈ ``n/2^avg_bits``) are
    walked to enforce the size bounds.  Chunk identity is the md5 of
    the chunk bytes — dedup across docs is then any of the engine's
    hash-partitioned folds on ``chunk_md5``.

    Returns ``(id_col, chunk_idx, chunk_len, chunk_md5)`` — one row
    per chunk, ``chunk_idx`` 0-based within its document; empty
    documents emit no rows.

    Determinism: boundaries are a pure function of the bytes and the
    shared :func:`gear_table`, so the chunk set is bit-identical
    across partitionings and cluster sizes.
    """
    if not (1 <= avg_bits <= 30):
        raise ValueError(f"cdc_chunks: avg_bits must be in [1, 30], got {avg_bits}")
    if min_size < 1:
        raise ValueError(f"cdc_chunks: min_size must be >= 1, got {min_size}")
    if max_size < min_size:
        raise ValueError(
            f"cdc_chunks: max_size ({max_size}) < min_size ({min_size})"
        )
    from rayraster.textops import _texts_as_bytes

    bits = int(avg_bits)
    mask = np.uint64((1 << bits) - 1)

    def chunk(t: pa.Table) -> pa.Table:
        G = gear_table() & mask  # only the low bits can ever matter
        b, offs = _texts_as_bytes(t[text_col])
        n = len(b)
        ids_out: list = []
        idx_parts: list = []
        len_parts: list = []
        md5_parts: list = []
        if n:
            gv = G[b]
            hm = gv.copy()
            # position-in-doc per flat byte (to mask cross-doc windows)
            starts = offs[:-1]
            doc_of = np.repeat(
                np.arange(len(starts), dtype=np.int64), np.diff(offs)
            )
            pos_in_doc = np.arange(n, dtype=np.int64) - starts[doc_of]
            for k in range(1, bits):
                c = np.zeros(n, dtype=np.uint64)
                c[k:] = gv[:-k] << np.uint64(k)
                c[pos_in_doc < k] = 0
                hm += c
            cand = (hm & mask) == 0
            ids_np = t[id_col].to_numpy(zero_copy_only=False)
            raw = b.tobytes()
            for d in range(len(starts)):
                s, e = int(offs[d]), int(offs[d + 1])
                if e == s:
                    continue
                cuts = []
                last = s
                for p in np.nonzero(cand[s:e])[0]:
                    pos = s + int(p) + 1  # cut AFTER the matching byte
                    while pos - last > max_size:
                        cuts.append(last + max_size)
                        last += max_size
                    if pos - last >= min_size:
                        cuts.append(pos)
                        last = pos
                while e - last > max_size:
                    cuts.append(last + max_size)
                    last += max_size
                if last < e:
                    cuts.append(e)
                prev = s
                for ci, cut in enumerate(cuts):
                    ids_out.append(ids_np[d])
                    idx_parts.append(ci)
                    len_parts.append(cut - prev)
                    md5_parts.append(hashlib.md5(raw[prev:cut]).hexdigest())
                    prev = cut
        return pa.table({
            id_col: pa.array(ids_out, type=pa.int64()),
            "chunk_idx": pa.array(idx_parts, type=pa.int64()),
            "chunk_len": pa.array(len_parts, type=pa.int64()),
            "chunk_md5": pa.array(md5_parts, type=pa.string()),
        })

    return ds.map_batches(chunk, batch_format="pyarrow", zero_copy_batch=True)


_CROSS_SIDE = np.int64(1) << np.int64(60)


def minhash_lsh_pairs_cross(
    left: Dataset,
    right: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 8,
    verify_mode: str = "auto",
    broadcast_threshold: int = 50_000,
    num_buckets: int = 64,
    left_count: int | None = None,
    right_count: int | None = None,
) -> Dataset:
    """Cross-corpus near-duplicate pairs — FUZZY decontamination
    (train×benchmark near-dup join, the MinHash generalization of the
    exact n-gram blocklist in :func:`rayraster.textops.decontaminate`;
    GPT-3/PaLM-style eval decontamination catches only verbatim
    overlap, this catches paraphrased/perturbed copies too).

    Pure composition: the right side's ids are tagged into bit 60 of a
    combined key space, the union runs the WHOLE self-join machinery
    (:func:`minhash_lsh_pairs` — banding, hash-partitioned candidate
    buckets, exact-Jaccard verify in either shape) unchanged, and
    same-side pairs are dropped at the end.  Because the side bit
    dominates the ``a < b`` pair order, every surviving pair is
    already ``(left_id, right_id)``.  Ids must be in ``[0, 2^60)`` on
    both sides (checked).

    Returns ``(left_id, right_id)`` — one row per cross pair with
    exact char-shingle Jaccard ≥ ``threshold``.
    """

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            ids = t[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
            if len(ids) and (int(ids.min()) < 0
                             or int(ids.max()) >= int(_CROSS_SIDE)):
                raise ValueError(
                    "minhash_lsh_pairs_cross: ids must be in [0, 2^60)"
                )
            return pa.table({
                id_col: pa.array(ids + np.int64(side) * _CROSS_SIDE),
                text_col: t[text_col],
            })
        return f

    u = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow")
    )
    total = (
        left_count + right_count
        if left_count is not None and right_count is not None else None
    )
    pairs = minhash_lsh_pairs(
        u, text_col, id_col, threshold, num_perm, bands, k,
        verify_mode=verify_mode, broadcast_threshold=broadcast_threshold,
        num_buckets=num_buckets, corpus_count=total,
    )

    def unpack(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        cross = (a < _CROSS_SIDE) & (b >= _CROSS_SIDE)
        return pa.table({
            "left_id": pa.array(a[cross]),
            "right_id": pa.array(b[cross] - _CROSS_SIDE),
        })

    return pairs.map_batches(unpack, batch_format="pyarrow")


def fuzzy_decontaminate(
    train: Dataset,
    bench: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    train_schema: "pa.Schema | None" = None,
    num_buckets: int = 64,
    **cross_kwargs,
):
    """Drop every train document near-duplicate to a benchmark
    document: :func:`minhash_lsh_pairs_cross` → distinct contaminated
    train ids → one anti bucket-join (the contaminated set stays a
    Dataset — never a driver keep-list).  ``train_schema`` avoids a
    lineage re-execution when ``train`` is not a raw read; omitted, it
    is probed from the Dataset (cheap on a fresh ``read_parquet``).

    Returns the cleaned train Dataset (all original columns).
    """
    from rayraster.join import bucket_join

    pairs = minhash_lsh_pairs_cross(
        train, bench, text_col, id_col, threshold,
        num_buckets=num_buckets, **cross_kwargs,
    )
    contaminated = distinct(
        pairs.map_batches(
            lambda t: pa.table({"left_id": t["left_id"]}),
            batch_format="pyarrow",
        ),
        ["left_id"],
        num_partitions=num_buckets,
    )
    if train_schema is None:
        train_schema = train.schema()
    return bucket_join(
        train, contaminated, id_col, "left_id",
        join_type="anti", num_buckets=num_buckets,
        left_schema=train_schema,
        right_schema=pa.schema([("left_id", pa.int64())]),
    )


def levenshtein_batch(a_texts, b_texts, chunk: int = 256) -> np.ndarray:
    """Exact byte-level Levenshtein distances for a batch of string
    pairs, fully vectorized ACROSS the batch: the classic row DP runs
    one row per iteration over ALL pairs at once, with the
    left-neighbor (insertion) dependency resolved by the prefix-min
    identity ``c[i] = min-over-k≤i (t[k] + (i−k))`` — one
    ``np.minimum.accumulate`` per row instead of a per-cell loop.
    Distances are over UTF-8 BYTES (document the unit when mixing
    scripts); memory is bounded by processing ``chunk`` pairs at a
    time."""
    n = len(a_texts)
    out = np.zeros(n, dtype=np.int64)
    for s in range(0, n, chunk):
        aa = [(x or "").encode() for x in a_texts[s:s + chunk]]
        bb = [(x or "").encode() for x in b_texts[s:s + chunk]]
        P = len(aa)
        la = np.array([len(x) for x in aa], dtype=np.int64)
        lb = np.array([len(x) for x in bb], dtype=np.int64)
        La, Lb = int(la.max(initial=0)), int(lb.max(initial=0))
        res = la.copy()  # blen == 0 rows: distance = alen
        if Lb == 0 or P == 0:
            out[s:s + P] = res
            continue
        A = np.zeros((P, La), dtype=np.uint8)
        B = np.zeros((P, Lb), dtype=np.uint8)
        for i, x in enumerate(aa):
            A[i, : len(x)] = np.frombuffer(x, dtype=np.uint8)
        for i, x in enumerate(bb):
            B[i, : len(x)] = np.frombuffer(x, dtype=np.uint8)
        prev = np.broadcast_to(
            np.arange(La + 1, dtype=np.int64), (P, La + 1)
        ).copy()
        ar = np.arange(1, La + 1, dtype=np.int64)
        for j in range(1, Lb + 1):
            neq = (A != B[:, j - 1: j]).astype(np.int64)
            t = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + neq)
            cur = np.empty_like(prev)
            cur[:, 0] = j
            d = np.minimum.accumulate(
                np.concatenate([cur[:, :1], t - ar[None, :]], axis=1), axis=1
            )
            cur[:, 1:] = d[:, 1:] + ar[None, :]
            done = lb == j
            if done.any():
                res[done] = cur[done, la[done]]
            prev = cur
        out[s:s + P] = res
    return out


class _VerifyEditPartitioned:
    """Exact edit-similarity verify over pairs carrying their own
    payloads (``_pa``/``_pb``): keep pairs with
    ``1 − dist/max(len_a, len_b) ≥ threshold`` (byte lengths; empty
    vs empty = similarity 1)."""

    def __init__(self, threshold: float):
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        ta = batch["_pa"].to_pylist()
        tb = batch["_pb"].to_pylist()
        dist = levenshtein_batch(ta, tb)
        mla = np.array(
            [max(len((x or "").encode()), len((y or "").encode()))
             for x, y in zip(ta, tb)], dtype=np.int64,
        )
        sim = np.where(mla > 0, 1.0 - dist / np.maximum(mla, 1), 1.0)
        keep = sim >= self.threshold if len(a) else np.zeros(0, dtype=bool)
        return pa.table(
            {"a": pa.array(a[keep]),
             "b": pa.array(batch["b"].to_numpy(zero_copy_only=False)[keep]),
             "edit_sim": pa.array(sim[keep], type=pa.float64())}
        )


def edit_verify_pairs(
    pairs: Dataset,
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.9,
    num_partitions: int = 64,
) -> Dataset:
    """EDIT-SIMILARITY verification of ANY candidate pair table: keep
    pairs with exact byte-level Levenshtein similarity
    ``1 - dist/max(len_a, len_b) >= threshold`` -- the character-edit
    companion of the Jaccard verify (catches small in-place edits that
    shingle sets under-weigh; the similarity used by SimHash dedup in
    the Gyawali et al. 2024 / BigCode pipelines).

    Always the PARTITIONED shape: candidates are co-located with their
    two payloads via :func:`attach_pair_payloads` (two bucket hops),
    then the batch-vectorized DP (:func:`levenshtein_batch`) verifies
    inside each task -- the corpus never lands on the driver.

    Returns ``(a, b, edit_sim)``.
    """
    joined = attach_pair_payloads(
        pairs, ds.select_columns([id_col, text_col]), id_col, text_col,
        num_partitions,
    )
    return joined.map_batches(
        _VerifyEditPartitioned(threshold), batch_format="pyarrow"
    )


def minhash_edit_pairs(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.9,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 8,
    num_buckets: int = 64,
    corpus_count: int | None = None,
) -> Dataset:
    """MinHash-LSH candidates + exact edit-similarity verify
    (:func:`edit_verify_pairs`) -- near-dup pairs under the EDIT
    metric with the banded generator's recall guarantees."""
    parts = _adaptive_parts(corpus_count, num_buckets)
    rows = ds.map_batches(
        MinHashStage(text_col, id_col, num_perm, bands, k),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pairs = candidate_pairs(rows, id_col, num_partitions=parts)
    return edit_verify_pairs(pairs, ds, text_col, id_col, threshold, parts)


def simhash_edit_pairs(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.9,
    num_buckets: int = 64,
    corpus_count: int | None = None,
) -> Dataset:
    """SimHash-banded candidates + exact edit-similarity verify --
    note the 4x16 banding guarantees recall only for pairs within
    SimHash Hamming <= 3; for heavier edits use the MinHash generator
    (:func:`minhash_edit_pairs`)."""
    parts = _adaptive_parts(corpus_count, num_buckets)
    rows = ds.map_batches(
        SimHashStage(text_col, id_col), batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pairs = candidate_pairs(rows, id_col, num_partitions=parts)
    return edit_verify_pairs(pairs, ds, text_col, id_col, threshold, parts)


# ---------------------------------------------------------------------------
# exact set-similarity self-join (AllPairs / PPJoin prefix filtering)
# ---------------------------------------------------------------------------


def _word_token_units(batch: pa.Table, text_col: str, id_col: str) -> pa.Table:
    """One row per (doc, distinct word-token hash): columns
    ``doc / tok / sz`` where ``sz`` is the doc's distinct-token count.

    The token universe is EXACTLY ``word_ngram_hashes(text, 1)`` (the
    module's word-unigram verify metric): Python ``str.split()``
    semantics via ``utf8_split_whitespace`` + empty-token filter, the
    same FNV-1a hash, the same mix.  A whole document sits in one
    input row, so per-doc distinctness is local to the batch — this
    stage is map-only."""
    from rayraster.geo import fnv1a64_arrow

    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    words = pc.utf8_split_whitespace(pc.fill_null(batch[text_col], ""))
    lens = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(words)
    doc_rep = np.repeat(ids, lens)
    nonempty = pc.not_equal(pc.utf8_length(flat), 0)
    flat = flat.filter(nonempty)
    doc_rep = doc_rep[nonempty.to_numpy(zero_copy_only=False)]
    h = fnv1a64_arrow(flat) if len(flat) else np.zeros(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        tok = ((h ^ (h >> np.uint64(33))) * _MIX).view(np.int64)
    order = np.lexsort((tok, doc_rep))
    d, t = doc_rep[order], tok[order]
    keep = np.empty(len(d), dtype=bool)
    if len(d):
        keep[0] = True
        keep[1:] = (d[1:] != d[:-1]) | (t[1:] != t[:-1])
    d, t = d[keep], t[keep]
    if len(d):
        seg = np.empty(len(d), dtype=bool)
        seg[0] = True
        seg[1:] = d[1:] != d[:-1]
        counts = np.diff(np.append(np.flatnonzero(seg), len(d)))
        sz = np.repeat(counts, counts).astype(np.int64)
    else:
        sz = np.zeros(0, dtype=np.int64)
    return pa.table(
        {"doc": pa.array(d), "tok": pa.array(t), "sz": pa.array(sz)}
    )


def set_similarity_pairs(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.9,
    num_buckets: int = 64,
    corpus_count: int | None = None,
    verify_mode: str = "auto",
    broadcast_threshold: int = 50_000,
    max_token_group: int = 100_000,
) -> Dataset:
    """EXACT set-similarity self-join: every pair (a < b) with
    word-unigram Jaccard >= ``threshold`` — the AllPairs/PPJoin
    prefix-filtering design (Bayardo et al., WWW 2007; Xiao et al.,
    WWW 2008), the 100%-recall complement to :func:`minhash_lsh_pairs`
    (whose banding can miss a true pair with probability
    (1-t^r)^b > 0).

    Losslessness (the prefix-filter lemma): order every token set by
    global (df ASC, token ASC).  If J(a,b) >= t, then the FIRST common
    token in that order sits within position |x| - ceil(t*|x|) + 1 of
    BOTH sets — all tokens before it are non-shared, and a set with
    more than |x| - ceil(t*|x|) non-shared tokens cannot reach
    J >= t.  So indexing only each doc's first p tokens (its rarest
    ones) still generates every qualifying pair; an exact verify
    finishes the job.

    Distributed plan (nothing on the driver, no broadcast of any
    corpus-sized side):

    1. map-only tokenize -> (doc, tok, sz) distinct unit rows;
    2. token df: one hash-partitioned grouped count;
    3. df attach: one :func:`~rayraster.join.bucket_join` on ``tok``;
    4. prefix mark: one doc-keyed exchange, per-doc lexsort by
       (df, tok), keep the first ``|T| - ceil(t*|T|) + 1`` rows;
    5. pair-gen: one token-keyed exchange over PREFIX postings only —
       rare tokens by construction, so hot tokens (stopwords) never
       enter a pair loop; size filter ``min >= t*max`` prunes early;
    6. distinct pairs -> the module's shared exact-Jaccard verify
       (broadcast or partitioned per ``verify_mode``), metric
       ``word_ngram_hashes(text, 1)`` — identical to the candidate
       token universe, so the composition is exact end-to-end.

    Docs with an empty token set are EXCLUDED (a prefix of nothing
    indexes nothing); exact dedup owns empty documents.  A token
    group larger than ``max_token_group`` RAISES (never silently
    drops — that would break exactness); at default settings that
    means >100k docs sharing a token that is among the RAREST ~10%
    of at least one of them, a corpus pathology worth surfacing.

    Scale: the only quadratic-risk stage is 5, bounded by prefix
    rarity; every exchange is a hash partition keyed by int64.  At
    10^12 docs raise ``num_buckets`` (all exchanges scale with it)."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    from rayraster.join import bucket_join

    parts = _adaptive_parts(corpus_count, num_buckets)

    units = ds.map_batches(
        lambda t: _word_token_units(t, text_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    df = hash_aggregate(
        units, ["tok"], count=True, count_name="df", num_partitions=parts
    )
    unit_schema = pa.schema(
        [("doc", pa.int64()), ("tok", pa.int64()), ("sz", pa.int64())]
    )
    df_schema = pa.schema([("tok", pa.int64()), ("df", pa.int64())])
    with_df = bucket_join(
        units, df, "tok", "tok", num_buckets=parts,
        left_schema=unit_schema, right_schema=df_schema,
    )

    def _doc_part(t: pa.Table) -> pa.Table:
        d = t["doc"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_part", pa.array((d * np.int64(2654435761)) % np.int64(parts))
        )

    def _prefix(g: pa.Table) -> pa.Table:
        d = g["doc"].to_numpy(zero_copy_only=False)
        tok = g["tok"].to_numpy(zero_copy_only=False)
        dfv = g["df"].to_numpy(zero_copy_only=False)
        sz = g["sz"].to_numpy(zero_copy_only=False)
        order = np.lexsort((tok, dfv, d))
        d, tok, dfv, sz = d[order], tok[order], dfv[order], sz[order]
        n = len(d)
        if n == 0:
            return pa.table(
                {"tok": pa.array([], type=pa.int64()),
                 "doc": pa.array([], type=pa.int64()),
                 "sz": pa.array([], type=pa.int64())}
            )
        seg = np.empty(n, dtype=bool)
        seg[0] = True
        seg[1:] = d[1:] != d[:-1]
        starts = np.flatnonzero(seg)
        pos = np.arange(n, dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, n))
        )
        # prefix length p = |T| - ceil(t*|T|) + 1.  The epsilon guards
        # the conservative direction: 40*0.9 rounds to 36.0000…006 in
        # IEEE, whose ceil (37) would SHRINK the prefix and break the
        # losslessness lemma; over-long prefixes only add candidates.
        p = sz - np.ceil(sz * np.float64(threshold) - 1e-9).astype(np.int64) + 1
        keep = pos < p
        return pa.table(
            {"tok": pa.array(tok[keep]), "doc": pa.array(d[keep]),
             "sz": pa.array(sz[keep])}
        )

    prefix = with_df.map_batches(
        _doc_part, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("_part").map_groups(_prefix, batch_format="pyarrow")

    def _tok_part(t: pa.Table) -> pa.Table:
        tok = t["tok"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_part",
            pa.array(np.abs(tok * np.int64(1000003)) % np.int64(parts)),
        )

    def _emit_pairs(g: pa.Table) -> pa.Table:
        tok = g["tok"].to_numpy(zero_copy_only=False)
        doc = g["doc"].to_numpy(zero_copy_only=False)
        sz = g["sz"].to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, tok))
        tok, doc, sz = tok[order], doc[order], sz[order]
        n = len(tok)
        empty = pa.table(
            {"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64())}
        )
        if n == 0:
            return empty
        seg = np.empty(n, dtype=bool)
        seg[0] = True
        seg[1:] = tok[1:] != tok[:-1]
        starts = np.flatnonzero(seg)
        ends = np.append(starts[1:], n)
        sizes = ends - starts
        big = sizes.max() if len(sizes) else 0
        if big > max_token_group:
            raise ValueError(
                f"set_similarity_pairs: a prefix token is shared by {big} docs "
                f"(> max_token_group={max_token_group}); raise the cap or "
                "pre-dedup exact duplicates first"
            )
        outs_a, outs_b = [], []
        s2 = starts[sizes == 2]
        if len(s2):
            x, y = doc[s2], doc[s2 + 1]
            sx, sy = sz[s2], sz[s2 + 1]
            lo = np.minimum(x, y)
            hi = np.maximum(x, y)
            keep = (lo != hi) & (
                np.minimum(sx, sy).astype(np.float64)
                >= threshold * np.maximum(sx, sy) - 1e-9
            )
            outs_a.append(lo[keep])
            outs_b.append(hi[keep])
        for s, e in zip(starts[sizes > 2], ends[sizes > 2]):
            u, first = np.unique(doc[s:e], return_index=True)
            su = sz[s:e][first]
            if len(u) < 2:
                continue
            ai, bi = np.triu_indices(len(u), k=1)
            keep = (
                np.minimum(su[ai], su[bi]).astype(np.float64)
                >= threshold * np.maximum(su[ai], su[bi]) - 1e-9
            )
            outs_a.append(u[ai][keep])
            outs_b.append(u[bi][keep])
        if not outs_a:
            return empty
        return pa.table(
            {"a": pa.array(np.concatenate(outs_a)),
             "b": pa.array(np.concatenate(outs_b))}
        )

    cand = prefix.map_batches(
        _tok_part, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("_part").map_groups(_emit_pairs, batch_format="pyarrow")
    pairs = distinct(cand, ["a", "b"], num_partitions=parts)

    if _pick_verify_mode(ds, verify_mode, broadcast_threshold, corpus_count) == "partitioned":
        joined = attach_pair_payloads(
            pairs, ds.select_columns([id_col, text_col]), id_col, text_col, parts
        )
        return joined.map_batches(
            _VerifyJaccardPartitioned(threshold, "word", n=1),
            batch_format="pyarrow",
        )
    pdf = ds.select_columns([id_col, text_col]).to_pandas()
    texts_ref = ray.put(dict(zip(pdf[id_col], pdf[text_col])))
    if len(pdf) <= broadcast_threshold:
        # tiny corpus: task form beats actor-pool spin-up
        return pairs.map_batches(
            _VerifyJaccard(texts_ref, threshold, "word", n=1),
            batch_format="pyarrow",
        )
    # forced-broadcast above the threshold: actor pool so the text map
    # is fetched once per ACTOR, not per task (the _VerifyJaccard
    # class contract — same handling as minhash_lsh_pairs)
    return pairs.map_batches(
        _VerifyJaccard,
        fn_constructor_args=(texts_ref, threshold, "word", 8, 1),
        batch_format="pyarrow",
        concurrency=(1, 2),
    )


def set_similarity_pairs_cross(
    left: Dataset,
    right: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.9,
    num_buckets: int = 64,
    verify_mode: str = "auto",
    broadcast_threshold: int = 50_000,
    left_count: int | None = None,
    right_count: int | None = None,
    max_token_group: int = 100_000,
) -> Dataset:
    """Cross-corpus EXACT set-similarity join (R×S at word-unigram
    Jaccard >= threshold) — the 100%-recall companion of
    :func:`minhash_lsh_pairs_cross` for fuzzy decontamination where a
    banding miss is unacceptable (e.g. legal/compliance screens).

    Pure composition (the module's cross pattern): the right side's
    ids are tagged into bit 60 of a shared key space, the whole
    prefix-filter self-join (:func:`set_similarity_pairs` — df
    ordering, prefix postings, size filter, exact verify) runs
    unchanged, and same-side pairs are dropped at the end; the side
    bit dominates the ``a < b`` order so survivors are already
    ``(left_id, right_id)``.  Ids must be in ``[0, 2^60)`` (checked).
    """

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            ids = t[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
            if len(ids) and (int(ids.min()) < 0
                             or int(ids.max()) >= int(_CROSS_SIDE)):
                raise ValueError(
                    "set_similarity_pairs_cross: ids must be in [0, 2^60)"
                )
            return pa.table({
                id_col: pa.array(ids + np.int64(side) * _CROSS_SIDE),
                text_col: t[text_col],
            })
        return f

    u = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow")
    )
    total = (
        left_count + right_count
        if left_count is not None and right_count is not None else None
    )
    pairs = set_similarity_pairs(
        u, text_col, id_col, threshold, num_buckets,
        corpus_count=total, verify_mode=verify_mode,
        broadcast_threshold=broadcast_threshold,
        max_token_group=max_token_group,
    )

    def unpack(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        cross = (a < _CROSS_SIDE) & (b >= _CROSS_SIDE)
        return pa.table({
            "left_id": pa.array(a[cross]),
            "right_id": pa.array(b[cross] - _CROSS_SIDE),
        })

    return pairs.map_batches(unpack, batch_format="pyarrow")
