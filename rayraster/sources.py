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
