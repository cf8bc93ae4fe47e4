"""Tumbling-window aggregates over an event stream table.

Ray Data is a batch engine (the reference is strictly batch too —
SURVEY.md §2 "Streaming: none"); stream-shaped workloads are treated
as an ordered log: the window id is a pure function of the timestamp,
so windowed aggregation is just the engine's hash-partitioned grouped
aggregate with (key, window) keys — no watermarks, no state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from rayraster.agg import hash_aggregate


def add_tumbling_window(
    batch: pa.Table, ts_col: str = "ts", window_us: int = 3_600_000_000
) -> pa.Table:
    """window = floor(epoch_us / window_us) — SQL twin:
    ``epoch_us(ts) // {window_us}`` (non-negative timestamps)."""
    us = (
        batch[ts_col]
        .cast(pa.timestamp("us"))
        .cast(pa.int64())
        .to_numpy(zero_copy_only=False)
    )
    win = us // np.int64(window_us)
    return batch.append_column("window", pa.array(win))


def tumbling_aggregate(
    ds: Dataset,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    window_us: int = 3_600_000_000,
    num_partitions: int = 64,
) -> Dataset:
    """Per (key, window): row count + min/max of ``value``.

    min/max (not sum) for the float column so the result is independent
    of reduction order — bit-reproducible against the SQL oracle."""
    wds = ds.map_batches(
        lambda b: add_tumbling_window(b, ts_col, window_us),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return hash_aggregate(
        wds,
        [key_col, "window"],
        min_cols=[value_col],
        max_cols=[value_col],
        count=True,
        num_partitions=num_partitions,
    )
