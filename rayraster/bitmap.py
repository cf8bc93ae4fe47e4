"""Chunked bitmap (bitset) secondary index for LOW-CARDINALITY columns.

The warehouse-style bitmap index re-expressed for Ray Data: the id
space is cut into fixed ``2^chunk_bits``-row chunks, and each
``(column, value, chunk)`` triple owns one packed bitset blob (8 KiB
at the default 2^16 rows/chunk).  Build is a map pass emitting partial
blobs plus ONE hash-partitioned OR-fold (``_part = chunk %
num_partitions`` — a bounded number of Python group calls, never one
per chunk id); predicates evaluate as bitwise AND/OR over only the
probed values' blobs — the exchange carries blobs, never rows, and a
multi-predicate query reads only the requested (column, value)
postings thanks to parquet filter pushdown.

Every per-row step is vectorized: the build dictionary-encodes the
indexed column (str() touches only the tiny dictionary), lexsorts by
(value code, chunk) and emits one ``np.packbits`` per segment; the
fold and the query OR/AND blobs with ``np.bitwise_or.reduceat`` /
``np.bitwise_and.reduceat`` over a zero-copy buffer-reshaped blob
matrix.  The Python loop count is O(#distinct (col,value,chunk) per
batch), not O(rows).

At 10^12 rows the index is ~15 M blobs per indexed value — a Dataset,
never driver state; chunk co-location is one hash exchange on
``_part``.

Reference parity note: SEraster has no secondary indexes at all
(R/main.R filters by dense matrix masks); this module is part of the
beyond-reference storage family (inverted index, IVF layout,
bucketed-join layouts).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset


def _binary_col_to_matrix(col: pa.ChunkedArray, nbytes: int) -> np.ndarray:
    """Zero-copy-ish reshape of a fixed-width binary column into an
    (n, nbytes) uint8 matrix (the ``list_col_to_matrix`` buffer trick,
    dedup.py, applied to BinaryArray)."""
    arr = col.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.zeros((0, nbytes), dtype=np.uint8)
    large = pa.types.is_large_binary(arr.type) or pa.types.is_large_string(arr.type)
    off_dtype, off_width = (np.int64, 8) if large else (np.int32, 4)
    offs = np.frombuffer(arr.buffers()[1], dtype=off_dtype, count=n + 1,
                         offset=arr.offset * off_width)
    widths = np.diff(offs)
    if not np.all(widths == nbytes):
        raise ValueError("bitmap: blob width mismatch (corrupt index?)")
    buf = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return buf[offs[0]: offs[-1]].reshape(n, nbytes)


def _str_codes(col: pa.ChunkedArray) -> "tuple[np.ndarray, list[str]]":
    """Dictionary-encode a column; apply str() only to the dictionary
    (per distinct value, matching the legacy per-row ``str(v)``
    stringification incl. ``None`` for nulls)."""
    import pyarrow.compute as pc

    enc = col.combine_chunks().dictionary_encode()
    dic = [str(v) for v in enc.dictionary.to_pylist()]
    idx = enc.indices
    if idx.null_count:
        idx = pc.fill_null(idx, len(dic))
        dic = dic + ["None"]
    return idx.to_numpy(zero_copy_only=False).astype(np.int64), dic


def _segments(sort_keys: "list[np.ndarray]") -> "tuple[np.ndarray, np.ndarray, np.ndarray]":
    """lexsort by the given keys (last key is primary) and return
    (order, starts, ends) of the equal-key segments."""
    order = np.lexsort(sort_keys)
    n = len(order)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return order, z, z
    change = np.zeros(n, dtype=bool)
    for k in sort_keys:
        s = k[order]
        change[1:] |= s[1:] != s[:-1]
    starts = np.concatenate([[0], np.flatnonzero(change[1:]) + 1])
    ends = np.append(starts[1:], n)
    return order, starts, ends


def _make_partial(cols, id_col, chunk_bits, num_partitions):
    """Factory for the build's map stage (module-level so tests can
    bound its Python iteration count in-process)."""
    mask = np.int64((1 << chunk_bits) - 1)
    nbits = 1 << chunk_bits

    def partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) and ids.min() < 0:
            raise ValueError("bitmap_index_build: ids must be >= 0")
        chunk = ids >> chunk_bits
        off = (ids & mask).astype(np.int64)
        out_col: list[str] = []
        out_val: list[str] = []
        out_chunk: list[np.ndarray] = []
        out_bits: list[bytes] = []
        bitbuf = np.zeros(nbits, dtype=np.uint8)
        for c in cols:
            codes, dic = _str_codes(t[c])
            order, starts, ends = _segments([chunk, codes])
            s_codes, s_chunk, s_off = codes[order], chunk[order], off[order]
            # one packbits per (value, chunk) segment — zero Python per row
            for s, e in zip(starts, ends):
                seg = s_off[s:e]
                bitbuf[seg] = 1
                out_bits.append(
                    np.packbits(bitbuf, bitorder="little").tobytes())
                bitbuf[seg] = 0
                out_val.append(dic[s_codes[s]])
            out_col.extend([c] * len(starts))
            out_chunk.append(s_chunk[starts])
        chunks = (np.concatenate(out_chunk) if out_chunk
                  else np.zeros(0, dtype=np.int64))
        part = chunks % np.int64(num_partitions)
        return pa.table(
            {"col": pa.array(out_col, type=pa.string()),
             "val": pa.array(out_val, type=pa.string()),
             "chunk": pa.array(chunks, type=pa.int64()),
             "bits": pa.array(out_bits, type=pa.binary()),
             "_part": pa.array(part, type=pa.int64())}
        )

    return partial


def _make_fold(chunk_bits):
    """Factory for the build's OR-fold stage (one call per _part)."""
    nbytes = (1 << chunk_bits) // 8

    def fold_part(g: pa.Table) -> pa.Table:
        # OR all partial blobs sharing (col, val, chunk): lexsort the
        # composite key, then ONE bitwise_or.reduceat over the blob
        # matrix — the Python cost is O(1) per partition, not per chunk
        mat = _binary_col_to_matrix(g["bits"], nbytes)
        colc, cold = _str_codes(g["col"])
        valc, vald = _str_codes(g["val"])
        chunk = g["chunk"].to_numpy(zero_copy_only=False).astype(np.int64)
        order, starts, _ends = _segments([chunk, valc, colc])
        folded = np.bitwise_or.reduceat(mat[order], starts, axis=0)
        first = order[starts]
        out = pa.table(
            {"col": pa.array([cold[c] for c in colc[first]],
                             type=pa.string()),
             "val": pa.array([vald[c] for c in valc[first]],
                             type=pa.string()),
             "chunk": pa.array(chunk[first], type=pa.int64()),
             "bits": pa.array([r.tobytes() for r in folded],
                              type=pa.binary())}
        )
        return out.sort_by([("col", "ascending"), ("val", "ascending"),
                            ("chunk", "ascending")])

    return fold_part


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
    parts = ds.map_batches(
        _make_partial(cols, id_col, chunk_bits, num_partitions),
        batch_format="pyarrow")
    folded = parts.groupby("_part").map_groups(
        _make_fold(chunk_bits), batch_format="pyarrow")
    import shutil

    shutil.rmtree(out_path, ignore_errors=True)
    folded.write_parquet(out_path)


def bitmap_query(
    index_path: str,
    preds: "dict[str, str]",
    mode: str = "and",
    chunk_bits: int = 16,
    num_partitions: int = 8,
) -> Dataset:
    """Evaluate equality predicates over the persisted index: read
    ONLY the requested (column, value) blobs (parquet filter
    pushdown), co-locate per ``_part = chunk % num_partitions``,
    AND/OR the bitsets per chunk with one ``reduceat``, unpack to row
    ids.  Returns a Dataset of ``(doc_id,)``."""
    import pyarrow.compute as pc
    import ray.data as rd

    if mode not in ("and", "or"):
        raise ValueError(f"mode must be 'and' or 'or', got {mode!r}")
    if not preds:
        raise ValueError("bitmap_query: need at least one predicate")
    need = len(preds)
    nbits = 1 << chunk_bits
    nbytes = nbits // 8
    flt = None
    for c, v in preds.items():
        term = (pc.field("col") == c) & (pc.field("val") == str(v))
        flt = term if flt is None else (flt | term)
    blobs = rd.read_parquet(index_path, filter=flt)

    def add_part(t: pa.Table) -> pa.Table:
        chunk = t["chunk"].to_numpy(zero_copy_only=False).astype(np.int64)
        part = chunk % np.int64(num_partitions)
        return t.append_column("_part", pa.array(part, type=pa.int64()))

    def solve(g: pa.Table) -> pa.Table:
        mat = _binary_col_to_matrix(g["bits"], nbytes)
        chunk = g["chunk"].to_numpy(zero_copy_only=False).astype(np.int64)
        order, starts, ends = _segments([chunk])
        smat = mat[order]
        if mode == "and":
            accs = np.bitwise_and.reduceat(smat, starts, axis=0)
            keep = (ends - starts) >= need  # all predicates present
        else:
            accs = np.bitwise_or.reduceat(smat, starts, axis=0)
            keep = np.ones(len(starts), dtype=bool)
        accs = accs[keep]
        seg_chunks = chunk[order][starts][keep]
        if len(accs):
            unpacked = np.unpackbits(accs, axis=1, bitorder="little")
            rows, bitpos = np.nonzero(unpacked)
            ids = (seg_chunks[rows] << chunk_bits) | bitpos.astype(np.int64)
        else:
            ids = np.zeros(0, dtype=np.int64)
        return pa.table({"doc_id": pa.array(np.sort(ids))})

    parted = blobs.map_batches(add_part, batch_format="pyarrow")
    return parted.groupby("_part").map_groups(solve, batch_format="pyarrow")
