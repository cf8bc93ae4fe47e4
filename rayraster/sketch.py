"""Mergeable sketches: HyperLogLog distinct counting + Bloom membership.

The reference has no sketches ("no distinct-count, no sketches
anywhere", SURVEY.md §2) — this is the task-brief custom-operator
extension for the 10^12-row path, where exact COUNT(DISTINCT) would
shuffle every distinct key.  From-scratch vectorized HLL:

* per batch: one register array (2^p uint8) via numpy scatter-max —
  ONE sketch row per batch leaves the node (the mergeable-sketch
  pattern from the Ray guide)
* merge: elementwise max of registers (associative/commutative)
* estimate: standard HLL with small-range linear counting

Accuracy ~1.04/sqrt(2^p) (p=12 → ~1.6%).  The exact path for the same
question is ``agg.distinct`` + count (used by the SQL-parity query);
HLL is the scale path, tested against exact in pytest.

:class:`Bloom` / :func:`build_bloom` / :func:`bloom_filter` follow the
same mergeable shape (bitwise-OR fold instead of register max) for
cross-snapshot membership — "drop documents whose url was already in
last month's crawl" without shuffling either corpus; see
``bloom_filter`` for the exact-finish composition with the bucketed
semi-join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from rayraster.geo import fnv1a64


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — FNV's high bits avalanche poorly on
    short keys (measured: 5000 short strings hit only ~170 of 4096 HLL
    registers unmixed); shared by the HLL and Bloom index derivations."""
    h = np.asarray(h, dtype=np.uint64)
    with np.errstate(over="ignore"):
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return h ^ (h >> np.uint64(31))


def _km_indices(h: np.ndarray, n_probes: int, mask: np.uint64):
    """Kirsch–Mitzenmacher double hashing: the i-th probe index is
    ``h1 + i·h2`` (mod power-of-two via ``mask``) — as good as i
    independent hashes.  THE shared index derivation for Bloom and
    CMS; one definition so the two hash streams can never diverge."""
    h1 = _mix64(np.asarray(h, np.uint64))
    h2 = _mix64(h1 ^ np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
    for i in range(n_probes):
        with np.errstate(over="ignore"):
            yield ((h1 + np.uint64(i) * h2) & mask).astype(np.int64)


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


class HLL:
    """One HyperLogLog register set."""

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.reg = (
            registers.copy() if registers is not None else np.zeros(self.m, np.uint8)
        )

    def add_hashes(self, h: np.ndarray) -> "HLL":
        h = _mix64(h)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        with np.errstate(over="ignore"):
            # sentinel bit caps the rank at 64-p+1 (standard trick)
            w = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # leading zeros via float64 log2 — a rounding-edge off-by-one on
        # ~2^-53 of inputs is far below the sketch's ~1.6% error
        lz = 63.0 - np.floor(np.log2(w.astype(np.float64)))
        rank = np.clip(lz + 1.0, 1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.reg, idx, rank)
        return self

    def add_values(self, values) -> "HLL":
        return self.add_hashes(fnv1a64([str(v) for v in values]))

    def merge(self, other: "HLL") -> "HLL":
        np.maximum(self.reg, other.reg, out=self.reg)
        return self

    def estimate(self) -> float:
        m = self.m
        inv = np.ldexp(1.0, -self.reg.astype(np.int64))
        e = _alpha(m) * m * m / inv.sum()
        zeros = int((self.reg == 0).sum())
        if e <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting
        return float(e)

    def to_bytes(self) -> bytes:
        return self.reg.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, p: int = 12) -> "HLL":
        return cls(p, np.frombuffer(b, dtype=np.uint8))


def build_hll_grouped(
    ds: Dataset, col: str, group_col: str, p: int = 12
) -> dict:
    """Per-group HyperLogLogs of ``col`` in ONE pass: one serialized
    sketch per (batch, group) → the tiny blob stream register-max
    folded on the driver (m bytes per (batch, group) — never rows).
    Returns ``{str(group_key): HLL}``; null group keys fold under
    ``"None"``.  Each returned sketch is bit-identical across
    partitionings/cluster sizes (register max is commutative,
    associative, idempotent), so anything derived from it —
    :func:`approx_distinct` estimates, :func:`hll_set_estimates`
    union/intersection/jaccard probes between groups — is
    deterministic too."""

    def sketch_batch(t: pa.Table) -> pa.Table:
        vals = t[col].to_pylist()
        if t.num_rows == 0:
            return pa.table(
                {"_g": pa.array([], type=pa.string()),
                 "sketch": pa.array([], type=pa.binary())}
            )
        # vectorized grouping: dictionary-encode the key, one stable
        # argsort, then ONE add_hashes per group segment (the Python
        # loop is per distinct group per batch, not per row)
        h = fnv1a64([str(v) for v in vals])
        enc = t[group_col].combine_chunks().dictionary_encode()
        dic = enc.dictionary.to_pylist()
        indices = enc.indices
        if indices.null_count:
            # null group keys: fold into a sentinel code so they form
            # their own group (str(None) == "None", matching the old
            # per-row path) instead of NaN-promoting the index array
            import pyarrow.compute as pc

            indices = pc.fill_null(indices, len(dic))
            dic = dic + [None]
        idx = indices.to_numpy(zero_copy_only=False)
        order = np.argsort(idx, kind="stable")
        sidx, sh = idx[order], h[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(sidx)) + 1])
        ends = np.append(starts[1:], len(sidx))
        return pa.table(
            {
                "_g": pa.array([str(dic[sidx[s]]) for s in starts]),
                "sketch": pa.array(
                    [HLL(p).add_hashes(sh[s:e]).to_bytes() for s, e in zip(starts, ends)],
                    type=pa.binary(),
                ),
            }
        )

    rows = ds.map_batches(sketch_batch, batch_format="pyarrow", zero_copy_batch=True)
    merged: dict[str, HLL] = {}
    for t in rows.iter_batches(batch_format="pyarrow", batch_size=4096):
        for g, b in zip(t["_g"].to_pylist(), t["sketch"].to_pylist()):
            if g in merged:
                merged[g].merge(HLL.from_bytes(b, p))
            else:
                merged[g] = HLL.from_bytes(b, p)
    return merged


def approx_distinct(
    ds: Dataset, col: str, group_col: str | None = None, p: int = 12
) -> pa.Table:
    """Approximate distinct count of ``col`` (optionally per
    ``group_col``): one serialized sketch per (batch[, group]) → tiny
    final merge on the driver (grouped path =
    :func:`build_hll_grouped`).  Returns an arrow table
    ``[group_col,] approx_distinct``."""
    if group_col is not None:
        merged = build_hll_grouped(ds, col, group_col, p)
        names = sorted(merged)
        return pa.table(
            {group_col: pa.array(names),
             "approx_distinct": pa.array([merged[g].estimate() for g in names])}
        )

    def sketch_batch(t: pa.Table) -> pa.Table:
        hll = HLL(p).add_values(t[col].to_pylist())
        return pa.table({"sketch": pa.array([hll.to_bytes()], type=pa.binary())})

    rows = ds.map_batches(sketch_batch, batch_format="pyarrow", zero_copy_batch=True)
    folded = HLL(p)
    for t in rows.iter_batches(batch_format="pyarrow", batch_size=4096):
        for b in t["sketch"].to_pylist():
            folded.merge(HLL.from_bytes(b, p))
    return pa.table({"approx_distinct": pa.array([folded.estimate()])})


_NULL_INT_SENTINEL = -(2**63)  # int64 min — nulls hash as this value


def _col_hashes(t: pa.Table, col: str) -> np.ndarray:
    """uint64 hash input for a column: integer columns are taken as
    their two's-complement bits (no string formatting in the hot
    path); everything else goes through the vectorized FNV-1a used by
    the url geocode.  ``_mix64`` is applied by the consumers.

    Nulls in an integer column are filled with int64-min BEFORE
    ``to_numpy`` — otherwise pyarrow promotes the whole batch to
    float64/NaN and every id in a null-containing batch would hash by
    its FLOAT bit pattern, different from the same id in a null-free
    batch (which would break Bloom's no-false-negatives guarantee
    batch-dependently).  Null keys therefore all hash like int64-min."""
    import pyarrow.compute as pc

    c = t[col]
    if pa.types.is_integer(c.type):
        c = pc.fill_null(c.cast(pa.int64()), _NULL_INT_SENTINEL)
        return c.to_numpy(zero_copy_only=False).view(np.uint64)
    if pa.types.is_string(c.type) or pa.types.is_large_string(c.type):
        # buffer path; NULL hashes like "None", same as the str() route
        return fnv1a64(c)
    return fnv1a64([str(v) for v in c.to_pylist()])


_BIT_LUT = np.uint8(1) << np.arange(8, dtype=np.uint8)


class Bloom:
    """Mergeable Bloom filter: ``2^log2_bits`` bits, ``num_hashes``
    probes per key via double hashing (Kirsch–Mitzenmacher: the i-th
    index is ``h1 + i·h2`` mod m, as good as i independent hashes).

    Membership is one-sided: ``contains`` is ALWAYS true for added
    keys (no false negatives); false-positive rate is approximately
    ``(1 - e^(-j·n/m))^j``.  Merging two filters of the same shape is
    a bitwise OR (associative/commutative — the mergeable-sketch
    pattern, like :class:`HLL`)."""

    def __init__(self, log2_bits: int = 23, num_hashes: int = 5,
                 bits: np.ndarray | None = None, copy: bool = True):
        """``copy=False`` adopts ``bits`` as a (possibly read-only)
        view — for probe-only use over a plasma/frombuffer buffer
        (``contains_hashes`` never mutates; ``add``/``merge``-into
        such a filter raises numpy's read-only error)."""
        if not 3 <= log2_bits <= 36:
            raise ValueError("log2_bits out of range [3, 36]")
        if num_hashes < 1:
            raise ValueError("num_hashes must be >= 1")
        self.log2_bits = log2_bits
        self.m = np.uint64(1 << log2_bits)
        self.j = num_hashes
        nbytes = (1 << log2_bits) // 8
        if bits is None:
            self.bits = np.zeros(nbytes, np.uint8)
        else:
            if len(bits) != nbytes:
                raise ValueError(
                    f"bits buffer is {len(bits)} bytes; 2^{log2_bits} bits "
                    f"needs {nbytes} — wrong log2_bits or truncated blob"
                )
            self.bits = bits.copy() if copy else np.asarray(bits)

    def _indices(self, h: np.ndarray):
        return _km_indices(h, self.j, self.m - np.uint64(1))

    def add_hashes(self, h: np.ndarray) -> "Bloom":
        if not self.bits.flags.writeable:
            # ufunc.at does NOT honor the read-only flag (numpy 1.26
            # silently writes through it — measured: it mutates the
            # underlying immutable bytes/plasma buffer), so the guard
            # must be explicit or a copy=False probe filter could
            # corrupt the SHARED object-store buffer for every worker
            raise ValueError("Bloom bits are read-only (copy=False) — "
                             "probe-only; build into a writable filter")
        for idx in self._indices(h):
            np.bitwise_or.at(self.bits, idx >> 3, _BIT_LUT[idx & 7])
        return self

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        """Boolean mask: True = possibly present, False = DEFINITELY
        absent."""
        out = np.ones(len(h), dtype=bool)
        for idx in self._indices(np.asarray(h, np.uint64)):
            out &= (self.bits[idx >> 3] & _BIT_LUT[idx & 7]) != 0
        return out

    def merge(self, other: "Bloom") -> "Bloom":
        if (self.log2_bits, self.j) != (other.log2_bits, other.j):
            raise ValueError("Bloom shapes differ — cannot merge")
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self

    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, log2_bits: int, num_hashes: int = 5,
                   copy: bool = True) -> "Bloom":
        """``copy=False`` wraps the blob read-only (frombuffer view) —
        fine as a merge SOURCE or probe filter, not as a mutation
        target."""
        return cls(log2_bits, num_hashes, np.frombuffer(b, dtype=np.uint8),
                   copy=copy)


def build_bloom(
    ds: Dataset, col: str, log2_bits: int = 23, num_hashes: int = 5,
    fold_batch: int = 32,
) -> Bloom:
    """Distributed Bloom build over ``ds[col]`` — the membership side
    of cross-snapshot dedup ("drop documents whose url was already in
    last month's crawl") without shuffling either corpus: per batch
    one filter blob leaves the node, an OR-fold stage collapses
    ~``fold_batch`` blobs into one, and the driver merges the
    remaining handful (at the default 2^23 bits a blob is 1 MiB — the
    driver sees ceil(batches / fold_batch) of them, never the corpus).
    """

    def sketch_batch(t: pa.Table) -> pa.Table:
        b = Bloom(log2_bits, num_hashes).add_hashes(_col_hashes(t, col))
        return pa.table({"blob": pa.array([b.to_bytes()], type=pa.binary())})

    def or_fold(t: pa.Table) -> pa.Table:
        acc = Bloom(log2_bits, num_hashes)
        for blob in t["blob"].to_pylist():
            # copy=False: a merge SOURCE is read-only — no blob memcpy
            acc.merge(Bloom.from_bytes(blob, log2_bits, num_hashes, copy=False))
        return pa.table({"blob": pa.array([acc.to_bytes()], type=pa.binary())})

    folded = ds.map_batches(
        sketch_batch, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        or_fold, batch_format="pyarrow", batch_size=fold_batch, zero_copy_batch=True
    )
    out = Bloom(log2_bits, num_hashes)
    for t in folded.iter_batches(batch_format="pyarrow", batch_size=fold_batch):
        for blob in t["blob"].to_pylist():
            out.merge(Bloom.from_bytes(blob, log2_bits, num_hashes, copy=False))
    return out


def _bloom_probe(bloom: Bloom, col: str):
    """The shared broadcast probe: ship the bit array once via
    ``ray.put`` (zero-copy plasma numpy view per task, cached per
    worker — no per-batch memcpy), return a closure computing the
    membership mask of ``col`` for a batch."""
    import ray

    bref = ray.put(bloom.bits)
    log2_bits, num_hashes = bloom.log2_bits, bloom.j

    def mask_of(t: pa.Table) -> np.ndarray:
        # copy=False: probe directly against the read-only plasma view
        b = Bloom(log2_bits, num_hashes, bits=ray.get(bref), copy=False)
        return b.contains_hashes(_col_hashes(t, col))

    return mask_of


def bloom_filter(ds: Dataset, bloom: Bloom, col: str, keep: str = "hits") -> Dataset:
    """Filter ``ds`` by Bloom membership of ``col``.

    ``keep="hits"`` keeps POSSIBLE members (a superset of true
    members — chain a ``bucket_join(..., join_type="semi")`` on the
    survivors for exactness; the Bloom pass shrinks that exchange to
    the candidate set).  ``keep="misses"`` keeps DEFINITE non-members
    (no exact pass needed — Bloom has no false negatives)."""
    if keep not in ("hits", "misses"):
        raise ValueError('keep must be "hits" or "misses"')
    mask_of = _bloom_probe(bloom, col)
    want_hits = keep == "hits"

    def keep_fn(t: pa.Table) -> pa.Table:
        mask = mask_of(t)
        return t.filter(pa.array(mask if want_hits else ~mask))

    return ds.map_batches(keep_fn, batch_format="pyarrow", zero_copy_batch=True)


def bloom_mark(
    ds: Dataset, bloom: Bloom, col: str, out_col: str = "bloom_hit"
) -> Dataset:
    """Append the Bloom membership mask of ``col`` as a bool column
    instead of filtering on it.

    Use when BOTH partitions of the split are needed downstream (e.g.
    hits go through an exact anti-join finish while misses bypass it):
    one hashing pass over the corpus, then two trivial boolean filters
    on the marked result — versus two full hashing passes with paired
    ``keep="hits"`` / ``keep="misses"`` :func:`bloom_filter` calls."""
    mask_of = _bloom_probe(bloom, col)

    def mark_fn(t: pa.Table) -> pa.Table:
        return t.append_column(out_col, pa.array(mask_of(t)))

    return ds.map_batches(mark_fn, batch_format="pyarrow", zero_copy_batch=True)


class CMS:
    """Mergeable Count-Min sketch: ``depth × 2^log2_width`` int64
    counters; a key's ``depth`` row indices come from Kirsch–
    Mitzenmacher double hashing (same derivation as :class:`Bloom`).

    Point query = min over the key's ``depth`` counters — an
    OVERESTIMATE, never an under-estimate: ``true ≤ est ≤ true +
    ε·N`` with probability ``1 − (1/2)^depth`` where
    ``ε ≈ 2 / 2^log2_width`` and ``N`` is the total added weight.
    Merging two sketches of the same shape is elementwise integer
    addition (associative/commutative → the merged sketch, and every
    estimate from it, is IDENTICAL regardless of batch/merge order —
    the property the oracle-checkable gate relies on)."""

    def __init__(self, depth: int = 4, log2_width: int = 14,
                 counts: np.ndarray | None = None, copy: bool = True):
        """``copy=False`` adopts ``counts`` as a (possibly read-only)
        view — for merge-SOURCE / query-only use over a frombuffer
        blob (``merge`` into and ``query_hashes`` from such a sketch
        never mutate it; ``add_hashes`` on it raises)."""
        if not 1 <= depth <= 16:
            raise ValueError("depth out of range [1, 16]")
        if not 3 <= log2_width <= 30:
            raise ValueError("log2_width out of range [3, 30]")
        self.depth = depth
        self.log2_width = log2_width
        self.w = np.uint64(1 << log2_width)
        shape = (depth, 1 << log2_width)
        if counts is None:
            self.counts = np.zeros(shape, np.int64)
        else:
            counts = np.asarray(counts)
            if counts.size != depth << log2_width:
                raise ValueError(
                    f"counts buffer has {counts.size} cells; "
                    f"{depth}x2^{log2_width} needs {depth << log2_width}"
                )
            self.counts = (
                counts.reshape(shape).copy() if copy
                else counts.reshape(shape)
            )

    def _indices(self, h: np.ndarray):
        return _km_indices(h, self.depth, self.w - np.uint64(1))

    def add_hashes(self, h: np.ndarray, weights: np.ndarray | None = None) -> "CMS":
        if not self.counts.flags.writeable:
            # np.add.at ignores the read-only flag (numpy 1.26 writes
            # through frombuffer views — the Bloom lesson); guard
            # explicitly so a copy=False blob can't be corrupted
            raise ValueError("CMS counts are read-only (copy=False) — "
                             "merge-source/query-only; build into a "
                             "writable sketch")
        w = (np.ones(len(h), np.int64) if weights is None
             else np.asarray(weights, np.int64))
        for i, idx in enumerate(self._indices(h)):
            np.add.at(self.counts[i], idx, w)
        return self

    def query_hashes(self, h: np.ndarray) -> np.ndarray:
        """int64 estimate per key: min over the depth rows."""
        est = None
        for i, idx in enumerate(self._indices(h)):
            row = self.counts[i][idx]
            est = row if est is None else np.minimum(est, row)
        return est

    def merge(self, other: "CMS") -> "CMS":
        if (self.depth, self.log2_width) != (other.depth, other.log2_width):
            raise ValueError("CMS shapes differ — cannot merge")
        np.add(self.counts, other.counts, out=self.counts)
        return self

    def total(self) -> int:
        """Total added weight N (any row sums to it)."""
        return int(self.counts[0].sum())

    def to_bytes(self) -> bytes:
        return self.counts.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, depth: int = 4, log2_width: int = 14,
                   copy: bool = True) -> "CMS":
        """``copy=False`` wraps the blob read-only — fine as a merge
        SOURCE or for queries, not as an ``add_hashes`` target."""
        return cls(depth, log2_width, np.frombuffer(b, dtype=np.int64),
                   copy=copy)


def build_cms(
    ds: Dataset, col: str, depth: int = 4, log2_width: int = 14,
    fold_batch: int = 32,
) -> CMS:
    """Distributed Count-Min build over ``ds[col]`` — approximate
    frequencies of EVERY key in one streaming pass with a fixed-size
    state, no shuffle (the heavy-hitter / hot-key side of the sketch
    family next to HLL's distinct-count and Bloom's membership).  Same
    blob plumbing as :func:`build_bloom`: one sketch per batch, an
    add-fold stage collapses ~``fold_batch`` blobs, the driver merges
    the remaining handful (2^14 width × depth 4 = 512 KiB per blob).
    Integer addition is order-independent, so the built sketch is
    bit-identical across partitionings and cluster sizes."""

    def sketch_batch(t: pa.Table) -> pa.Table:
        c = CMS(depth, log2_width).add_hashes(_col_hashes(t, col))
        return pa.table({"blob": pa.array([c.to_bytes()], type=pa.binary())})

    def add_fold(t: pa.Table) -> pa.Table:
        acc = CMS(depth, log2_width)
        for blob in t["blob"].to_pylist():
            acc.merge(CMS.from_bytes(blob, depth, log2_width, copy=False))
        return pa.table({"blob": pa.array([acc.to_bytes()], type=pa.binary())})

    folded = ds.map_batches(
        sketch_batch, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        add_fold, batch_format="pyarrow", batch_size=fold_batch, zero_copy_batch=True
    )
    out = CMS(depth, log2_width)
    for t in folded.iter_batches(batch_format="pyarrow", batch_size=fold_batch):
        for blob in t["blob"].to_pylist():
            out.merge(CMS.from_bytes(blob, depth, log2_width, copy=False))
    return out


def cms_estimate(cms: CMS, t: pa.Table, col: str) -> np.ndarray:
    """int64 frequency estimates for ``t[col]`` (hashing exactly as
    :func:`build_cms` hashed the corpus column)."""
    return cms.query_hashes(_col_hashes(t, col))


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (mergeable frequent-items summary)
# ---------------------------------------------------------------------------


class MG:
    """Mergeable Misra-Gries frequent-items summary: at most ``k``
    (key, counter) pairs plus one integer ``err`` — the cumulative
    decrement applied so far.

    Deterministic guarantee (Agarwal/Cormode et al., "Mergeable
    Summaries", PODS'12), independent of batch boundaries, merge order
    and cluster size::

        true(x) - err  <=  counter(x)  <=  true(x)      (absent -> 0)
        err <= N / (k + 1)                               (N = total weight)

    so any key with true frequency above ``N/(k+1)`` is GUARANTEED
    present — the deterministic-bound flag the d7 oracle gate checks,
    exactly like CMS's one-sided bound.  (SpaceSaving is the same
    summary under the substitution ``ss_count = mg_count + err``, so
    this one class covers both classical algorithms.)

    Unlike HLL/CMS the merged COUNTERS are not bit-identical across
    partitionings (the decrement schedule differs); the BOUNDS above
    hold on every schedule, which is what the gate asserts.
    """

    def __init__(self, k: int = 256,
                 counters: dict[str, int] | None = None, err: int = 0):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = k
        self.counters: dict[str, int] = dict(counters) if counters else {}
        self.err = int(err)

    def _shrink(self) -> None:
        if len(self.counters) <= self.k:
            return
        vals = np.fromiter(self.counters.values(), np.int64,
                           len(self.counters))
        # the (k+1)-th largest value is the decrement that leaves at
        # most k strictly-positive counters
        m = int(np.partition(vals, len(vals) - self.k - 1)
                [len(vals) - self.k - 1])
        self.counters = {key: c - m for key, c in self.counters.items()
                         if c > m}
        self.err += m

    def add_counts(self, keys, counts) -> "MG":
        """Fold EXACT per-key counts of one batch (from
        ``pc.value_counts`` — the vectorized C++ pre-aggregation; the
        Python loop below touches distinct keys, not rows)."""
        c = self.counters
        for key, n in zip(keys, counts):
            c[key] = c.get(key, 0) + int(n)
        self._shrink()
        return self

    def merge(self, other: "MG") -> "MG":
        if self.k != other.k:
            raise ValueError("MG sizes differ — cannot merge")
        c = self.counters
        for key, n in other.counters.items():
            c[key] = c.get(key, 0) + n
        self.err += other.err
        self._shrink()
        return self

    def lower_bound(self, key: str) -> int:
        """counter(key) — a lower bound on the true count; the true
        count is at most ``lower_bound(key) + self.err``."""
        return self.counters.get(key, 0)

    def topk(self, n: int | None = None) -> list[tuple[str, int]]:
        """(key, counter) pairs, counter descending then key ascending
        (deterministic for a GIVEN summary)."""
        items = sorted(self.counters.items(), key=lambda kv: (-kv[1], kv[0]))
        return items if n is None else items[:n]

    def to_bytes(self) -> bytes:
        import json

        return json.dumps(
            {"k": self.k, "err": self.err, "c": self.counters},
            sort_keys=True, separators=(",", ":"),
        ).encode("utf-8")

    @classmethod
    def from_bytes(cls, b: bytes) -> "MG":
        import json

        d = json.loads(b.decode("utf-8"))
        return cls(d["k"], d["c"], d["err"])


def build_mg(ds: Dataset, col: str, k: int = 256, fold_batch: int = 32) -> MG:
    """Distributed Misra-Gries build over ``ds[col]`` — the top-of-
    stream heavy hitters in one streaming pass with O(k) state per
    node and NO shuffle (the frequent-ITEMS member of the sketch
    family: HLL = how many distinct, CMS = how often is this one, MG =
    which ones are hot).  Same blob plumbing as :func:`build_cms`: one
    summary per batch (exact in-batch counts via ``pc.value_counts``),
    an add-fold stage collapses ~``fold_batch`` blobs, the driver
    merges the remaining handful (a k=256 summary is a few KiB).  At
    10^12 rows this replaces the full ``groupby(col).count()``
    exchange whenever only the ``> N/(k+1)``-frequency tail matters
    (hot-key discovery for salting, mixture monitoring, top domains).
    """
    import pyarrow.compute as pc

    def sketch_batch(t: pa.Table) -> pa.Table:
        # NULLs are not items (engine-wide NULL rule) — kept, the None
        # key crashes to_bytes' sorted-json serialization and would
        # drift to the string "null" across a round-trip
        v = pc.drop_null(pc.cast(t[col], pa.string()))
        vc = pc.value_counts(v)
        s = MG(k).add_counts(vc.field("values").to_pylist(),
                             vc.field("counts").to_numpy())
        return pa.table({"blob": pa.array([s.to_bytes()], type=pa.binary())})

    def add_fold(t: pa.Table) -> pa.Table:
        acc = MG(k)
        for blob in t["blob"].to_pylist():
            acc.merge(MG.from_bytes(blob))
        return pa.table({"blob": pa.array([acc.to_bytes()], type=pa.binary())})

    folded = ds.map_batches(
        sketch_batch, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        add_fold, batch_format="pyarrow", batch_size=fold_batch,
        zero_copy_batch=True,
    )
    out = MG(k)
    for t in folded.iter_batches(batch_format="pyarrow", batch_size=fold_batch):
        for blob in t["blob"].to_pylist():
            out.merge(MG.from_bytes(blob))
    return out


# ---------------------------------------------------------------------------
# q-digest — mergeable quantile summary
# ---------------------------------------------------------------------------


_SIGN = np.uint64(1) << np.uint64(63)
_U64MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def _f64_key(v: np.ndarray) -> np.ndarray:
    """Order-preserving float64 → uint64 bijection (IEEE-754 total
    order): non-negative floats get the sign bit set, negative floats
    get ALL bits flipped, so uint64 comparison == float comparison
    (−0.0 sorts just below +0.0; NaNs land above +inf)."""
    bits = np.ascontiguousarray(v, np.float64).view(np.int64)
    u = bits.view(np.uint64).copy()
    neg = bits < 0
    u[neg] = ~u[neg]
    u[~neg] ^= _SIGN
    return u


def _key_f64(u: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_f64_key`."""
    u = np.asarray(u, np.uint64).copy()
    nonneg = (u & _SIGN) != 0
    u[nonneg] ^= _SIGN
    u[~nonneg] = ~u[~nonneg]
    return u.view(np.float64)


class QDigest:
    """Mergeable q-digest quantile summary (Shrivastava et al. 2004)
    over the 64-bit order-preserving float key universe.

    Nodes are dyadic intervals ``[base, base + 2^lev)`` with int64
    counts; a canonical bottom-up compress merges a sibling group into
    its parent whenever the combined count fits under ``N // k`` —
    leaves keep exact counts for heavy repeated values.  Merging two
    digests is concat + group-sum + compress.

    Deterministic guarantee (Agarwal/Cormode et al., "Mergeable
    Summaries", PODS'12 — q-digest is their canonical mergeable
    quantile summary), independent of batch boundaries, merge order
    and cluster size: for ``est = quantile(q)`` and the true rank
    interval ``[lo, hi] = [#values < est, #values <= est]``::

        lo − err_bound()  <=  ceil(q·N)  <=  hi + err_bound()
        err_bound() == 64 · (N // k + 1)        (≈ 64·N/k)

    (the interval form, not ``|rank − q·N|``, because a heavy repeated
    value legitimately spans many ranks — its leaf count is exact)

    so ``k=4096`` answers every quantile to ~1.6% rank error in ONE
    streaming pass with O(k) state and NO shuffle — the quantile
    member of the sketch family (HLL = distinct, CMS = frequency,
    MG = heavy hitters, q-digest = ranks).  Like MG, the merged NODE
    SET is schedule-dependent but the bound above holds on every
    schedule — the flag the t7 oracle gate asserts.  (The exact
    multi-pass alternative is :func:`rayraster.agg.exact_quantiles`;
    the q-digest is the one-pass/mergeable/checkpointable trade.)
    """

    LEVELS = 64

    def __init__(self, k: int = 4096,
                 lev: np.ndarray | None = None,
                 base: np.ndarray | None = None,
                 cnt: np.ndarray | None = None):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self.lev = (np.empty(0, np.uint8) if lev is None
                    else np.asarray(lev, np.uint8))
        self.base = (np.empty(0, np.uint64) if base is None
                     else np.asarray(base, np.uint64))
        self.cnt = (np.empty(0, np.int64) if cnt is None
                    else np.asarray(cnt, np.int64))

    @property
    def n(self) -> int:
        """Total weight N."""
        return int(self.cnt.sum())

    def err_bound(self) -> int:
        """Deterministic rank-error bound (holds on every merge
        schedule): one ≤ N//k + 1 ancestor count per level."""
        return self.LEVELS * (self.n // self.k + 1)

    # -- internals ---------------------------------------------------

    def _canon(self) -> None:
        """Group-sum duplicate (lev, base) nodes, drop zeros, sort."""
        if len(self.lev) == 0:
            return
        order = np.lexsort((self.base, self.lev))
        lev, base, cnt = self.lev[order], self.base[order], self.cnt[order]
        head = np.empty(len(lev), bool)
        head[0] = True
        head[1:] = (lev[1:] != lev[:-1]) | (base[1:] != base[:-1])
        idx = np.nonzero(head)[0]
        cnt = np.add.reduceat(cnt, idx)
        keep = cnt > 0
        self.lev, self.base, self.cnt = lev[idx][keep], base[idx][keep], cnt[keep]

    def _compress(self) -> None:
        """Canonical bottom-up compress: per level, absorb each parent
        block's children (and the existing parent count) into the
        parent node when the combined count ≤ N // k."""
        self._canon()
        t = self.n // self.k
        if t < 1 or len(self.lev) == 0:
            return
        lev, base, cnt = self.lev, self.base, self.cnt
        for lvl in range(self.LEVELS):
            child = lev == lvl
            if not child.any():
                continue
            pmask = (np.uint64(0) if lvl >= 63
                     else ~((np.uint64(1) << np.uint64(lvl + 1)) - np.uint64(1)))
            cb, cc = base[child], cnt[child]
            pb = cb & pmask
            order = np.argsort(pb, kind="stable")
            pb_s, cc_s = pb[order], cc[order]
            head = np.empty(len(pb_s), bool)
            if len(pb_s):
                head[0] = True
                head[1:] = pb_s[1:] != pb_s[:-1]
            gidx = np.nonzero(head)[0]
            gbase = pb_s[gidx]                       # parent base per group
            gsum = np.add.reduceat(cc_s, gidx)       # children total per group
            # existing parent counts (level lvl+1, same base)
            par = lev == lvl + 1
            par_b, par_c = base[par], cnt[par]
            pord = np.argsort(par_b, kind="stable")
            par_b, par_c = par_b[pord], par_c[pord]
            pos = np.searchsorted(par_b, gbase)
            hit = (pos < len(par_b))
            hit[hit] &= par_b[pos[hit]] == gbase[hit]
            pexist = np.zeros(len(gbase), np.int64)
            pexist[hit] = par_c[pos[hit]]
            mergeable = gsum + pexist <= t           # absorb whole block
            if not mergeable.any():
                continue
            # children to drop: those whose parent group is mergeable
            grp_of_child = np.cumsum(head) - 1       # group index per sorted child
            drop_sorted = mergeable[grp_of_child]
            drop = np.zeros(len(cb), bool)
            drop[order] = drop_sorted
            keep_mask = np.ones(len(lev), bool)
            keep_mask[np.nonzero(child)[0]] = ~drop
            add_b = gbase[mergeable]
            add_c = gsum[mergeable]
            lev = np.concatenate([lev[keep_mask],
                                  np.full(len(add_b), lvl + 1, np.uint8)])
            base = np.concatenate([base[keep_mask], add_b])
            cnt = np.concatenate([cnt[keep_mask], add_c])
            # re-canonicalize the touched parent level before moving up
            self.lev, self.base, self.cnt = lev, base, cnt
            self._canon()
            lev, base, cnt = self.lev, self.base, self.cnt
        self.lev, self.base, self.cnt = lev, base, cnt

    # -- public API ---------------------------------------------------

    def add_values(self, v: np.ndarray) -> "QDigest":
        """Fold a batch of float64 values (NaNs rejected — mask first)."""
        v = np.asarray(v, np.float64)
        if np.isnan(v).any():
            raise ValueError("NaNs are not rankable — filter them first")
        keys, counts = np.unique(_f64_key(v), return_counts=True)
        self.lev = np.concatenate([self.lev, np.zeros(len(keys), np.uint8)])
        self.base = np.concatenate([self.base, keys])
        self.cnt = np.concatenate([self.cnt, counts.astype(np.int64)])
        self._compress()
        return self

    def merge(self, other: "QDigest") -> "QDigest":
        if self.k != other.k:
            raise ValueError("QDigest k differ — cannot merge")
        self.lev = np.concatenate([self.lev, other.lev])
        self.base = np.concatenate([self.base, other.base])
        self.cnt = np.concatenate([self.cnt, other.cnt])
        self._compress()
        return self

    def _uppers(self) -> np.ndarray:
        width = np.where(
            self.lev >= 64, _U64MAX,
            (np.uint64(1) << self.lev.astype(np.uint64)) - np.uint64(1),
        )
        return self.base + width

    def quantiles(self, qs) -> np.ndarray:
        """Value estimates at ranks ``ceil(q·N)`` — the estimate's
        true rank interval ``[#< est, #<= est]`` comes within
        :meth:`err_bound` of ``ceil(q·N)`` (see class docstring).
        Estimates are dyadic interval bounds: rank-space guarantees,
        not necessarily data elements."""
        if len(self.lev) == 0:
            raise ValueError("empty QDigest")
        up = self._uppers()
        order = np.lexsort((self.lev, up))   # postorder: by upper, deeper first
        csum = np.cumsum(self.cnt[order])
        n = csum[-1]
        qs = np.asarray(qs, np.float64)
        targets = np.maximum(1, np.ceil(qs * n)).astype(np.int64)
        pos = np.searchsorted(csum, targets, side="left")
        pos = np.minimum(pos, len(csum) - 1)
        return _key_f64(up[order][pos])

    def node_count(self) -> int:
        return len(self.lev)

    def to_bytes(self) -> bytes:
        m = np.int64(len(self.lev)).tobytes()
        return m + self.lev.tobytes() + self.base.tobytes() + self.cnt.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, k: int = 4096) -> "QDigest":
        m = int(np.frombuffer(b[:8], np.int64)[0])
        o = 8
        lev = np.frombuffer(b[o:o + m], np.uint8); o += m
        base = np.frombuffer(b[o:o + 8 * m], np.uint64); o += 8 * m
        cnt = np.frombuffer(b[o:o + 8 * m], np.int64)
        return cls(k, lev.copy(), base.copy(), cnt.copy())


def build_qdigest(ds: Dataset, col: str, k: int = 4096,
                  fold_batch: int = 32, batch_size: int = 131072) -> QDigest:
    """Distributed q-digest build over ``ds[col]`` — every quantile of
    a 10^12-row column from ONE streaming pass with O(k·log U) state
    per node and NO shuffle, mergeable across partitions/snapshots
    (the rank member of the sketch family; checkpoint the blob and
    fold tomorrow's data in).  Same blob plumbing as
    :func:`build_cms`/:func:`build_mg`: one digest per batch, an
    add-fold stage collapses ~``fold_batch`` blobs, the driver merges
    the remaining handful.  Nulls are skipped (SQL rank semantics)."""

    def sketch_batch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col_arr = t[col]
        if isinstance(col_arr, pa.ChunkedArray):
            col_arr = col_arr.combine_chunks()
        v = pc.drop_null(col_arr).to_numpy(zero_copy_only=False)
        d = QDigest(k)
        if len(v):
            d.add_values(np.asarray(v, np.float64))
        return pa.table({"blob": pa.array([d.to_bytes()], type=pa.binary())})

    def add_fold(t: pa.Table) -> pa.Table:
        acc = QDigest(k)
        for blob in t["blob"].to_pylist():
            acc.merge(QDigest.from_bytes(blob, k))
        return pa.table({"blob": pa.array([acc.to_bytes()], type=pa.binary())})

    folded = ds.map_batches(
        sketch_batch, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    ).map_batches(
        add_fold, batch_format="pyarrow", batch_size=fold_batch,
        zero_copy_batch=True,
    )
    out = QDigest(k)
    for t in folded.iter_batches(batch_format="pyarrow", batch_size=fold_batch):
        for blob in t["blob"].to_pylist():
            out.merge(QDigest.from_bytes(blob, k))
    return out


def build_qdigest_grouped(
    ds: Dataset, group_col: str, col: str, k: int = 4096,
    num_partitions: int = 32, batch_size: int = 131072,
) -> dict:
    """Per-group q-digests in ONE streaming pass + one tiny blob
    shuffle: per batch, one digest per group PRESENT in the batch
    (sorted-segment build, no per-row Python); the partial blobs are
    hash-partitioned by group and merged per group inside each
    partition (`groupby(_part).map_groups`), so the driver receives
    exactly ONE blob per group — the grouped companion of
    :func:`build_qdigest` (grouped EXACT quantiles pay a full row
    shuffle; this pays a ``groups × k``-bounded one).  Returns
    ``{group: QDigest}``; the per-group rank guarantee is QDigest's.
    NULL values are skipped; NULL groups are skipped (SQL GROUP BY
    semantics would give them their own group — pre-fill if wanted)."""
    import pyarrow.compute as pc

    from rayraster.agg import _part_of

    def sketch_batch(t: pa.Table) -> pa.Table:
        t = pa.table({group_col: t[group_col], col: t[col]})
        t = t.drop_null().combine_chunks()
        if t.num_rows == 0:
            return pa.table({group_col: pa.array([], type=t[group_col].type),
                             "blob": pa.array([], type=pa.binary())})
        t = t.sort_by([(group_col, "ascending")])
        g = t[group_col]
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        # segment boundaries over the sorted group column (C++ compare)
        eq = pc.equal(g.slice(1), g.slice(0, len(g) - 1)).to_numpy(
            zero_copy_only=False
        )
        starts = np.concatenate([[0], np.nonzero(~eq)[0] + 1])
        ends = np.append(starts[1:], len(g))
        groups, blobs = [], []
        for s, e in zip(starts.tolist(), ends.tolist()):
            vv = v[s:e]
            vv = vv[~np.isnan(vv)]
            if len(vv) == 0:
                continue
            groups.append(g[s].as_py())
            blobs.append(QDigest(k).add_values(vv).to_bytes())
        return pa.table({group_col: pa.array(groups, type=g.type),
                         "blob": pa.array(blobs, type=pa.binary())})

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_part", pa.array(_part_of(t, [group_col], num_partitions))
        )

    def merge_groups(part: pa.Table) -> pa.Table:
        part = part.sort_by([(group_col, "ascending")])
        g = part[group_col].combine_chunks()
        groups, blobs = [], []
        cur, acc = None, None
        for i in range(part.num_rows):
            key = g[i].as_py()
            if key != cur:
                if acc is not None:
                    groups.append(cur)
                    blobs.append(acc.to_bytes())
                cur, acc = key, QDigest(k)
            acc.merge(QDigest.from_bytes(part["blob"][i].as_py(), k))
        if acc is not None:
            groups.append(cur)
            blobs.append(acc.to_bytes())
        return pa.table({group_col: pa.array(groups, type=g.type),
                         "blob": pa.array(blobs, type=pa.binary())})

    folded = (
        ds.map_batches(sketch_batch, batch_format="pyarrow",
                       batch_size=batch_size, zero_copy_batch=True)
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(merge_groups, batch_format="pyarrow")
    )
    out: dict = {}
    for t in folded.iter_batches(batch_format="pyarrow", batch_size=1024):
        for key, blob in zip(t[group_col].to_pylist(), t["blob"].to_pylist()):
            d = QDigest.from_bytes(blob, k)
            out[key] = d if key not in out else out[key].merge(d)
    return out


def build_hll(ds: Dataset, col: str, p: int = 12) -> HLL:
    """Build ONE corpus-wide HLL for ``col``: one sketch blob per
    batch, register-max folded on the driver (m bytes each — never
    rows; the same mergeable blob-fold plumbing as :func:`build_bloom`
    / :func:`build_cms`).  The result is bit-identical across
    partitionings and cluster sizes (register max is commutative,
    associative and idempotent)."""

    def sketch_batch(t: pa.Table) -> pa.Table:
        hll = HLL(p).add_hashes(_col_hashes(t, col))
        return pa.table({"sketch": pa.array([hll.to_bytes()], type=pa.binary())})

    rows = ds.map_batches(sketch_batch, batch_format="pyarrow",
                          zero_copy_batch=True)
    out = HLL(p)
    for t in rows.iter_batches(batch_format="pyarrow", batch_size=4096):
        for b in t["sketch"].to_pylist():
            out.merge(HLL.from_bytes(b, p))
    return out


def hll_set_estimates(a: HLL, b: HLL) -> dict:
    """Set-relationship estimates between two HLLs built with the
    same ``p`` — the pre-join cardinality probe (how much do these
    key sets overlap? is the join worth a shuffle or is a broadcast
    side small?) without touching either table again:

    * ``union``        — estimate of |A ∪ B| (register max, the
      LOSSLESS HLL operation)
    * ``intersection`` — inclusion–exclusion |A| + |B| − |A ∪ B|
      (clamped at 0; error grows as the overlap shrinks — the
      documented inclusion–exclusion caveat)
    * ``jaccard``      — intersection / union (0 when union is 0)

    Inputs are not mutated."""
    if a.p != b.p:
        raise ValueError(f"hll precision mismatch: {a.p} vs {b.p}")
    u = HLL(a.p, a.reg).merge(HLL(b.p, b.reg))
    union = u.estimate()
    inter = max(0.0, a.estimate() + b.estimate() - union)
    return {
        "union": union,
        "intersection": inter,
        "jaccard": (inter / union) if union > 0 else 0.0,
    }
