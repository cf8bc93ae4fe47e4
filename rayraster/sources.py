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
        import pyarrow as pa
        import pyarrow.compute as pc

        us = t[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        return t.append_column("tp", pc.divide(us, g))

    shutil.rmtree(path, ignore_errors=True)
    tagged = ds.map_batches(addp, batch_format="pyarrow", zero_copy_batch=True)
    tagged.sort("tp").write_parquet(path, partition_cols=["tp"])
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _TIME_MANIFEST), "w") as f:
        json.dump({"ts_col": ts_col, "granularity": granularity,
                   "granularity_us": g}, f)
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
    if not files:
        import ray.data as rd

        return rd.from_items([]).limit(0)
    cols = None
    if columns is not None:
        cols = list(columns) if ts_col in columns else [ts_col, *columns]
    import ray.data as rd

    flt = (pads.field(ts_col) >= pa.scalar(start_us, pa.timestamp("us"))) & (
        pads.field(ts_col) < pa.scalar(end_us, pa.timestamp("us"))
    )
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

    import shutil

    shutil.rmtree(path, ignore_errors=True)
    ds.map_batches(add_key, batch_format="pyarrow").sort(key_col).write_parquet(path)


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
    import pyarrow.dataset as pads
    import ray.data as rd

    flt = None
    for lo, hi in hilbert_ranges_for_rect(ix0, iy0, ix1, iy1, order):
        term = (pads.field(key_col) >= lo) & (pads.field(key_col) <= hi)
        flt = term if flt is None else (flt | term)
    cols = list(columns) + [key_col] if columns else None
    return rd.read_parquet(path, columns=cols, filter=flt)
