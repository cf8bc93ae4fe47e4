"""Source / sink surface beyond parquet.

The engine's canonical storage is partitioned parquet (columnar,
prunable, resumable — every pipeline here reads and writes it), but a
100-TB ingest usually STARTS from crawler output in line-delimited
JSON or CSV.  ``read_table`` maps a format name onto the matching Ray
Data reader so the same downstream pipeline runs off any of them, and
``write_table`` does the inverse for interchange output.

Column pruning: parquet prunes at the READ (only requested
columns/row-groups leave storage); CSV prunes at DECODE (pyarrow's
reader skips unwanted columns at parse time); JSONL is pruned right
after decode (row-major text can't skip fields).  The honest contract
stands: convert to parquet once, early, for any input that will be
scanned more than once.

Fidelity: parquet and CSV round-trip values exactly.  ``json`` is a
LOSSY interchange format — the pandas-based sink caps doubles at 15
significant digits (its hard maximum; float64 needs 17 for identity)
and timestamps come back as ISO-8601 strings, not timestamp columns.
``write_table`` writes at that maximum fidelity; do not use JSONL as
a faithful store.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa

from ray.data import Dataset

FORMATS = ("parquet", "csv", "json")


def _expand_dirs(paths):
    """Ray 2.49's ``read_parquet`` rejects a LIST that contains
    directories (single dir is fine) — expand each dir entry to its
    (non-hidden) files so callers can pass ``[shard_dir, shard_dir2]``."""
    if not isinstance(paths, (list, tuple)):
        return paths
    out = []
    for p in paths:
        if isinstance(p, str) and os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                out.extend(
                    os.path.join(root, f) for f in sorted(files)
                    if not f.startswith((".", "_"))
                )
        else:
            out.append(p)
    return out


def read_table(paths, fmt: str = "parquet", columns=None, **kwargs) -> Dataset:
    """Read ``paths`` (file, dir, or list of either) as ``fmt`` into a
    Dataset.

    ``json`` means line-delimited JSON (the crawler interchange
    format).  ``columns`` prunes at the read for parquet, at decode
    for CSV, and right after decode for JSONL.  Gzipped CSV/JSONL
    (``*.gz`` — the Common-Crawl wire format) decompresses
    transparently via Arrow's extension inference (pinned by test)."""
    import ray.data as rd

    paths = _expand_dirs(paths)
    if fmt == "parquet":
        return rd.read_parquet(paths, columns=list(columns) if columns else None,
                               **kwargs)
    if fmt == "csv":
        if columns and "convert_options" not in kwargs:
            from pyarrow import csv as pacsv

            kwargs["convert_options"] = pacsv.ConvertOptions(
                include_columns=list(columns)
            )
        ds = rd.read_csv(paths, **kwargs)
    elif fmt == "json":
        ds = rd.read_json(paths, **kwargs)
    else:
        raise ValueError(f"fmt must be one of {FORMATS}, got {fmt!r}")
    if columns:
        ds = ds.select_columns(list(columns))
    return ds


def write_table(ds: Dataset, path: str, fmt: str = "parquet") -> None:
    """Write a Dataset as ``fmt`` under ``path`` (one file per block —
    the resumable-partitioned layout for parquet; JSONL/CSV for
    interchange).

    An existing ``path`` directory is REPLACED: every Ray sink appends
    uniquely-named files into an existing dir, so a retried job would
    otherwise silently stack two runs' rows (the repo-wide rmtree-first
    convention — see cli.py / checkpoint.py sinks).

    JSON fidelity caveat: see the module docstring — doubles are
    written at 15 significant digits (the pandas sink's maximum) and
    timestamps as ISO-8601 microsecond strings."""
    if os.path.isdir(path):
        shutil.rmtree(path)
    if fmt == "parquet":
        ds.write_parquet(path)
    elif fmt == "csv":
        ds.write_csv(path)
    elif fmt == "json":
        ds.write_json(path, orient="records", lines=True,
                      double_precision=15, date_format="iso", date_unit="us")
    else:
        raise ValueError(f"fmt must be one of {FORMATS}, got {fmt!r}")


_TIME_MANIFEST = "_TIMEPARTS.json"
_GRAN_US = {"hour": 3_600_000_000, "day": 86_400_000_000}


def write_time_partitioned(
    ds: Dataset,
    path: str,
    ts_col: str = "ts",
    granularity: str = "day",
) -> str:
    """Persist an event table hive-partitioned by TIME (``tp=<epoch
    bucket>/`` dirs, bucket = ``epoch_us // granularity``): the layout
    that makes time-range scans at 100 TB read ONLY the touched
    days/hours (:func:`read_time_range`) and daily ingests append one
    new directory — the standard log-store layout (Hive/Iceberg
    day-partitioning).  One clustering sort before the partitioned
    write (same rationale as ``write_bucketed``: an unsorted write
    fragments blocks × partitions), plus a manifest recording the
    granularity so readers can't mis-prune.

    The partition value is the INTEGER epoch bucket, not a date
    string — pruning is integer comparison, immune to timezone and
    format drift; ``ts_col`` itself is preserved in-file at full
    microsecond fidelity."""
    import json
    import os
    import shutil

    if granularity not in _GRAN_US:
        raise ValueError(f"granularity must be one of {sorted(_GRAN_US)}")
    g = _GRAN_US[granularity]

    def addp(t):
        import numpy as np
        import pyarrow as pa

        # FLOOR bucketing (numpy //) — pc.divide truncates toward
        # zero, which would put pre-epoch rows in a bucket the floor-
        # dividing reader never prunes to (silently missing rows)
        us = (t[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        return t.append_column("tp", pa.array(us // np.int64(g)))

    shutil.rmtree(path, ignore_errors=True)
    tagged = ds.map_batches(addp, batch_format="pyarrow", zero_copy_batch=True)
    tagged.sort("tp").write_parquet(path, partition_cols=["tp"])
    os.makedirs(path, exist_ok=True)
    # probe the WRITTEN files' schema (no extra lineage execution —
    # Dataset.schema() on a lazy input would run a partial pipeline)
    import glob as _glob

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    ts_is = True
    any_f = sorted(_glob.glob(os.path.join(path, "tp=*", "*.parquet")))
    if any_f:
        _sch = _pq.read_schema(any_f[0])
        if ts_col in _sch.names:
            ts_is = bool(_pa.types.is_timestamp(_sch.field(ts_col).type))
    with open(os.path.join(path, _TIME_MANIFEST), "w") as f:
        json.dump({"ts_col": ts_col, "granularity": granularity,
                   "granularity_us": g,
                   # readers build their boundary-filter scalars from
                   # this — an int64 epoch column must be compared as
                   # int64, not timestamp[us]
                   "ts_is_timestamp": ts_is}, f)
    return path


def read_time_range(
    path: str,
    start_us: int,
    end_us: int,
    columns=None,
) -> Dataset:
    """Read ``[start_us, end_us)`` from a :func:`write_time_partitioned`
    layout: directory-level pruning first (only epoch buckets
    intersecting the range are listed — the 100-TB win: a one-day scan
    of a year-long store touches 1/365 of the files), then an EXACT
    per-row timestamp filter inside the boundary buckets, pushed into
    the parquet scan.  ``columns`` prunes at the read as everywhere
    else (the ``ts`` column is added to the scan if missing, for the
    boundary filter, then kept — callers project it away if unwanted)."""
    import glob as _glob
    import json
    import os

    import pyarrow as pa
    import pyarrow.dataset as pads

    with open(os.path.join(path, _TIME_MANIFEST)) as f:
        m = json.load(f)
    g = m["granularity_us"]
    ts_col = m["ts_col"]
    if end_us <= start_us:
        raise ValueError("read_time_range: end_us must be > start_us")
    lo_b, hi_b = start_us // g, (end_us - 1) // g
    dirs = []
    for d in _glob.glob(os.path.join(path, "tp=*")):
        b = int(os.path.basename(d).split("=", 1)[1])
        if lo_b <= b <= hi_b:
            dirs.append((b, d))
    files = [
        f for _, d in sorted(dirs)
        for f in sorted(_glob.glob(os.path.join(d, "*.parquet")))
    ]
    cols = None
    if columns is not None:
        cols = list(columns) if ts_col in columns else [ts_col, *columns]
    import ray.data as rd

    if not files:
        # schema-preserving empty result: any file in the store (even
        # outside the range) carries the schema, so downstream
        # select_columns/union doesn't crash only on empty days
        import pyarrow.parquet as _pq

        any_f = sorted(_glob.glob(os.path.join(path, "tp=*", "*.parquet")))
        if any_f:
            sch = _pq.read_schema(any_f[0])
            names = cols if cols is not None else [
                n for n in sch.names if n != "tp"]
            empty = pa.table(
                {n: pa.array([], type=sch.field(n).type) for n in names}
            )
            return rd.from_arrow(empty)
        return rd.from_items([]).limit(0)
    if m.get("ts_is_timestamp", True):
        lo_s = pa.scalar(start_us, pa.timestamp("us"))
        hi_s = pa.scalar(end_us, pa.timestamp("us"))
    else:  # int64 epoch-us column: compare as int64
        lo_s = pa.scalar(start_us, pa.int64())
        hi_s = pa.scalar(end_us, pa.int64())
    flt = (pads.field(ts_col) >= lo_s) & (pads.field(ts_col) < hi_s)
    return rd.read_parquet(files, columns=cols, filter=flt)


def write_hilbert_clustered(
    ds: Dataset,
    path: str,
    ix_col: str = "ix",
    iy_col: str = "iy",
    order: int = 10,
    key_col: str = "hkey",
) -> None:
    """Spatially-CLUSTERED parquet layout: rows sorted by their
    Hilbert curve key before writing, so each output file (and each
    row group inside it) covers a compact contiguous key range — the
    Z-order/liquid-clustering trick with the better curve (every
    Hilbert step is one rook hop, so a key range IS a compact tile).
    A windowed read then prunes at BOTH the file and row-group level
    from parquet min/max stats, without any manifest.

    One global sort (the only exchange) + the standard parquet sink;
    the key column is persisted for predicate pushdown."""
    from rayraster.grid import hilbert_key

    def add_key(t: pa.Table) -> pa.Table:
        d = hilbert_key(
            t[ix_col].to_numpy(zero_copy_only=False),
            t[iy_col].to_numpy(zero_copy_only=False), order,
        )
        return t.append_column(key_col, pa.array(d))

    import json
    import os
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    ds.map_batches(add_key, batch_format="pyarrow").sort(key_col).write_parquet(path)
    # record the curve parameters: a reader on a DIFFERENT order would
    # compute intervals on a different curve and silently return the
    # wrong window contents
    with open(os.path.join(path, "_HILBERT.json"), "w") as f:
        json.dump({"order": order, "key_col": key_col,
                   "ix_col": ix_col, "iy_col": iy_col}, f)


def hilbert_ranges_for_rect(
    ix0: int, iy0: int, ix1: int, iy1: int, order: int = 10,
) -> "list[tuple[int, int]]":
    """The sorted, run-compressed Hilbert-key intervals covering the
    inclusive cell rectangle [ix0..ix1] × [iy0..iy1] — the query-side
    companion of :func:`write_hilbert_clustered` (each interval is one
    contiguous scan of the clustered layout).  Enumerates the rect's
    cells (bounded by the window size, not the grid), keys them, and
    merges consecutive runs."""
    from rayraster.grid import hilbert_key

    if ix1 < ix0 or iy1 < iy0:
        raise ValueError("empty rectangle")
    xs, ys = np.meshgrid(
        np.arange(ix0, ix1 + 1, dtype=np.int64),
        np.arange(iy0, iy1 + 1, dtype=np.int64),
    )
    keys = np.sort(hilbert_key(xs.ravel(), ys.ravel(), order))
    breaks = np.flatnonzero(np.diff(keys) > 1)
    starts = np.concatenate([[0], breaks + 1])
    ends = np.concatenate([breaks, [len(keys) - 1]])
    return [(int(keys[s]), int(keys[e])) for s, e in zip(starts, ends)]


def read_hilbert_rect(
    path: str,
    ix0: int, iy0: int, ix1: int, iy1: int,
    order: int = 10,
    key_col: str = "hkey",
    columns=None,
) -> Dataset:
    """Windowed read of a :func:`write_hilbert_clustered` layout: the
    rect's key intervals become ONE pushed-down OR-of-BETWEEN filter —
    files and row groups whose min/max stats miss every interval never
    leave storage."""
    import json
    import os

    import pyarrow.dataset as pads
    import ray.data as rd

    mf = os.path.join(path, "_HILBERT.json")
    if os.path.exists(mf):
        with open(mf) as f:
            hm = json.load(f)
        if hm.get("order") != order or hm.get("key_col") != key_col:
            raise ValueError(
                f"read_hilbert_rect: layout was written with order="
                f"{hm.get('order')}, key_col={hm.get('key_col')!r} but the "
                f"read asked for order={order}, key_col={key_col!r} — "
                "intervals on a different curve return wrong contents"
            )
    flt = None
    for lo, hi in hilbert_ranges_for_rect(ix0, iy0, ix1, iy1, order):
        term = (pads.field(key_col) >= lo) & (pads.field(key_col) <= hi)
        flt = term if flt is None else (flt | term)
    cols = list(columns) + [key_col] if columns else None
    return rd.read_parquet(path, columns=cols, filter=flt)
