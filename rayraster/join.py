"""Joins: broadcast hash join (small side) — the Ray-Data-first lookup.

The reference's only join is the computable spatial join (SURVEY.md §2
O1d); for relational enrichment (dimension tables, blocklists, label
maps) the right distributed shape at 100 TB is: ``ray.put`` the small
side ONCE, then an actor-pool map_batches doing a vectorized pyarrow
join per batch — no shuffle, no re-ship per batch.

For large×large equi-joins use the bucket pattern (add hash-bucket
column to both sides, groupby bucket, join per bucket) — not needed by
any current operator, documented here for completeness.
"""

from __future__ import annotations

import pyarrow as pa

import ray
from ray.data import Dataset


class BroadcastJoinStage:
    """map_batches actor: inner/left join each batch against the
    broadcast small side (a pyarrow Table in the object store).

    The small side is fetched ONCE per actor (first call) and the
    per-batch work is pyarrow's C++ hash join."""

    def __init__(self, small_ref, keys, join_type: str = "inner",
                 right_suffix: str = "_r"):
        self._ref = small_ref
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.join_type = "inner" if join_type == "inner" else "left outer"
        self.right_suffix = right_suffix
        self._small = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._small is None:
            small = ray.get(self._ref) if isinstance(self._ref, ray.ObjectRef) else self._ref
            self._small = small.combine_chunks()
        return batch.join(
            self._small,
            keys=self.keys,
            join_type=self.join_type,
            right_suffix=self.right_suffix,
        )


def broadcast_join(
    ds: Dataset,
    small: pa.Table,
    keys,
    join_type: str = "inner",
    concurrency: int = 4,
) -> Dataset:
    """ds ⨝ small on ``keys`` with the small side broadcast once."""
    ref = ray.put(small)
    return ds.map_batches(
        BroadcastJoinStage(ref, keys, join_type),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def semi_join_filter(ds: Dataset, key_values, key_col: str, invert: bool = False) -> Dataset:
    """Semi/anti join: keep rows whose key is (not) in the broadcast
    key set — vectorized ``pc.is_in`` per batch."""
    vals = pa.array(sorted(set(key_values)))
    ref = ray.put(vals)

    class _Semi:
        def __init__(self):
            self._vals = None

        def __call__(self, t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            if self._vals is None:
                self._vals = ray.get(ref)
            mask = pc.is_in(t[key_col], value_set=self._vals)
            if invert:
                mask = pc.invert(mask)
            return t.filter(mask)

    return ds.map_batches(_Semi, batch_format="pyarrow", zero_copy_batch=True, concurrency=2)
