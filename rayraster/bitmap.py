"""Chunked bitmap (bitset) secondary index for LOW-CARDINALITY columns.

The warehouse-style bitmap index re-expressed for Ray Data: the id
space is cut into fixed ``2^chunk_bits``-row chunks, and each
``(column, value, chunk)`` triple owns one packed bitset blob (8 KiB
at the default 2^16 rows/chunk).  Build is a map pass emitting partial
blobs plus ONE grouped OR-fold; predicates evaluate as bitwise
AND/OR over only the probed values' blobs — the exchange carries
blobs, never rows, and a multi-predicate query reads only the
requested (column, value) postings thanks to parquet filter pushdown.

At 10^12 rows the index is ~15 M blobs per indexed value — a Dataset,
never driver state; chunk co-location is one hash exchange on the
chunk id.

Reference parity note: SEraster has no secondary indexes at all
(R/main.R filters by dense matrix masks); this module is part of the
beyond-reference storage family (inverted index, IVF layout,
bucketed-join layouts).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset


def bitmap_index_build(
    ds: Dataset,
    cols: "list[str]",
    id_col: str,
    out_path: str,
    chunk_bits: int = 16,
    num_partitions: int = 8,
) -> None:
    """Build and persist the index for ``cols`` (each low-cardinality:
    the blob count is #distinct-values × #chunks).  Ids must be
    non-negative int64."""
    if not cols:
        raise ValueError("bitmap_index_build: need at least one column")
    if not 3 <= chunk_bits <= 24:
        raise ValueError("chunk_bits out of range [3, 24]")
    mask = np.int64((1 << chunk_bits) - 1)
    nbytes = (1 << chunk_bits) // 8

    def partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) and ids.min() < 0:
            raise ValueError("bitmap_index_build: ids must be >= 0")
        chunk = ids >> chunk_bits
        off = ids & mask
        out_col: list[str] = []
        out_val: list[str] = []
        out_chunk: list[int] = []
        out_bits: list[bytes] = []
        for c in cols:
            vals = t[c].to_pylist()
            seen: dict[tuple, np.ndarray] = {}
            for v, ch, o in zip(vals, chunk.tolist(), off.tolist()):
                key = (str(v), ch)
                blob = seen.get(key)
                if blob is None:
                    blob = np.zeros(nbytes, dtype=np.uint8)
                    seen[key] = blob
                blob[o >> 3] |= np.uint8(1 << (o & 7))
            for (v, ch), blob in seen.items():
                out_col.append(c)
                out_val.append(v)
                out_chunk.append(ch)
                out_bits.append(blob.tobytes())
        return pa.table(
            {"col": pa.array(out_col, type=pa.string()),
             "val": pa.array(out_val, type=pa.string()),
             "chunk": pa.array(out_chunk, type=pa.int64()),
             "bits": pa.array(out_bits, type=pa.binary())}
        )

    def or_fold(g: pa.Table) -> pa.Table:
        acc: dict[tuple, np.ndarray] = {}
        for c, v, ch, b in zip(
            g["col"].to_pylist(), g["val"].to_pylist(),
            g["chunk"].to_pylist(), g["bits"].to_pylist(),
        ):
            key = (c, v, ch)
            arr = np.frombuffer(b, dtype=np.uint8)
            cur = acc.get(key)
            acc[key] = arr.copy() if cur is None else (cur | arr)
        keys = sorted(acc)
        return pa.table(
            {"col": pa.array([k[0] for k in keys], type=pa.string()),
             "val": pa.array([k[1] for k in keys], type=pa.string()),
             "chunk": pa.array([k[2] for k in keys], type=pa.int64()),
             "bits": pa.array([acc[k].tobytes() for k in keys],
                              type=pa.binary())}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    folded = parts.groupby("chunk").map_groups(or_fold, batch_format="pyarrow")
    import shutil

    shutil.rmtree(out_path, ignore_errors=True)
    folded.write_parquet(out_path)


def bitmap_query(
    index_path: str,
    preds: "dict[str, str]",
    mode: str = "and",
    chunk_bits: int = 16,
) -> Dataset:
    """Evaluate equality predicates over the persisted index: read
    ONLY the requested (column, value) blobs (parquet filter
    pushdown), co-locate per chunk, AND/OR the bitsets, unpack to row
    ids.  Returns a Dataset of ``(doc_id,)``."""
    import pyarrow.compute as pc
    import ray.data as rd

    if mode not in ("and", "or"):
        raise ValueError(f"mode must be 'and' or 'or', got {mode!r}")
    if not preds:
        raise ValueError("bitmap_query: need at least one predicate")
    need = len(preds)
    flt = None
    for c, v in preds.items():
        term = (pc.field("col") == c) & (pc.field("val") == str(v))
        flt = term if flt is None else (flt | term)
    blobs = rd.read_parquet(index_path, filter=flt)

    def solve(g: pa.Table) -> pa.Table:
        out_ids: list[np.ndarray] = []
        chunks = g["chunk"].to_numpy(zero_copy_only=False)
        for ch in np.unique(chunks):
            sub = g.filter(pc.equal(g["chunk"], pa.scalar(int(ch))))
            arrs = [np.frombuffer(b, dtype=np.uint8)
                    for b in sub["bits"].to_pylist()]
            if mode == "and":
                if sub.num_rows < need:
                    continue  # some predicate has no rows in this chunk
                acc = arrs[0]
                for a in arrs[1:]:
                    acc = acc & a
            else:
                acc = arrs[0].copy()
                for a in arrs[1:]:
                    acc |= a
            bitpos = np.flatnonzero(
                np.unpackbits(acc, bitorder="little")
            ).astype(np.int64)
            if len(bitpos):
                out_ids.append((np.int64(ch) << chunk_bits) | bitpos)
        ids = (np.concatenate(out_ids) if out_ids
               else np.zeros(0, dtype=np.int64))
        return pa.table({"doc_id": pa.array(np.sort(ids))})

    return blobs.groupby("chunk").map_groups(solve, batch_format="pyarrow")
