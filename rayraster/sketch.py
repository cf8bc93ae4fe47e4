"""Mergeable sketches — approximate distinct counting (HyperLogLog).

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
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from rayraster.geo import fnv1a64


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
        h = np.asarray(h, dtype=np.uint64)
        with np.errstate(over="ignore"):
            # splitmix64 finalizer: FNV's high bits avalanche poorly on
            # short keys, which empties most registers (measured: 5000
            # short strings hit only ~170 of 4096 registers unmixed)
            h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            h = h ^ (h >> np.uint64(31))
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


def approx_distinct(
    ds: Dataset, col: str, group_col: str | None = None, p: int = 12
) -> pa.Table:
    """Approximate distinct count of ``col`` (optionally per
    ``group_col``): one serialized sketch per (batch[, group]) → tiny
    final merge on the driver.  Returns an arrow table
    ``[group_col,] approx_distinct``."""

    def sketch_batch(t: pa.Table) -> pa.Table:
        vals = t[col].to_pylist()
        if group_col is None:
            hll = HLL(p).add_values(vals)
            return pa.table(
                {"_g": pa.array(["_all"]), "sketch": pa.array([hll.to_bytes()], type=pa.binary())}
            )
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
    names = sorted(merged)
    out = {
        "approx_distinct": pa.array([merged[g].estimate() for g in names]),
    }
    if group_col is not None:
        return pa.table({group_col: pa.array(names), **out})
    return pa.table(out)
