"""Source / sink surface beyond parquet.

The engine's canonical storage is partitioned parquet (columnar,
prunable, resumable — every pipeline here reads and writes it), but a
100-TB ingest usually STARTS from crawler output in line-delimited
JSON or CSV.  ``read_table`` maps a format name onto the matching Ray
Data reader so the same downstream pipeline runs off any of them, and
``write_table`` does the inverse for interchange output.

Column pruning: parquet prunes at the READ (only requested
columns/row-groups leave storage); CSV/JSONL are row-major formats,
so pruning there happens after decode — ``read_table`` still applies
it (smaller blocks downstream) and the docstring is the honest
contract: convert to parquet once, early, for any input that will be
scanned more than once.
"""

from __future__ import annotations

from ray.data import Dataset

FORMATS = ("parquet", "csv", "json")


def read_table(paths, fmt: str = "parquet", columns=None, **kwargs) -> Dataset:
    """Read ``paths`` (file, dir, or list) as ``fmt`` into a Dataset.

    ``json`` means line-delimited JSON (the crawler interchange
    format).  ``columns`` prunes at the read for parquet and right
    after decode for the row-major formats."""
    import ray.data as rd

    if fmt == "parquet":
        return rd.read_parquet(paths, columns=list(columns) if columns else None,
                               **kwargs)
    if fmt == "csv":
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
    interchange)."""
    if fmt == "parquet":
        ds.write_parquet(path)
    elif fmt == "csv":
        ds.write_csv(path)
    elif fmt == "json":
        ds.write_json(path)
    else:
        raise ValueError(f"fmt must be one of {FORMATS}, got {fmt!r}")
