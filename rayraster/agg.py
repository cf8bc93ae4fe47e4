"""Generic hash-partitioned grouped aggregation (partial → final).

The same pattern rasterize.py uses for cells, generalized to arbitrary
keys and (sum / count / min / max) aggregates — all algebraic, so the
partial/final decomposition is exact:

  map_batches[per-batch pyarrow group_by + part = hash(keys) % P]
  → groupby(part).map_groups[one vectorized pyarrow group_by]

The shuffle key is the small int ``part``; group count per finalize
task is bounded by |keys|/P.  Never uses Ray's per-group-Python
aggregate reduce (see rasterize.py module docstring for the numbers).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from rayraster.geo import fnv1a64

_PART = "_part"
_ONES = "_n1"


def _part_of(t: pa.Table, keys: Sequence[str], num_partitions: int) -> np.ndarray:
    """Deterministic partition id from arbitrary-typed key columns."""
    h = np.zeros(t.num_rows, dtype=np.int64)
    for k in keys:
        col = t[k]
        if pa.types.is_integer(col.type):
            v = col.to_numpy(zero_copy_only=False).astype(np.int64)
        elif pa.types.is_floating(col.type):
            f = col.to_numpy(zero_copy_only=False)
            # normalize -0.0 → +0.0 so bit-hashing agrees with value
            # equality (group_by would merge them; the partition must too)
            v = (f + 0.0).view(np.int64)
        else:
            v = fnv1a64([str(s) for s in col.to_pylist()]).view(np.int64)
        h = h * np.int64(1000003) ^ v
    return np.abs(h) % np.int64(num_partitions)


def _aggs_for(sum_cols, min_cols, max_cols, count):
    aggs = [(c, "sum") for c in sum_cols]
    aggs += [(c, "min") for c in min_cols]
    aggs += [(c, "max") for c in max_cols]
    if count:
        aggs.append((_ONES, "sum"))
    return aggs


def hash_aggregate(
    ds: Dataset,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
    count: bool = True,
    count_name: str = "n",
    num_partitions: int = 64,
    batch_size: int | None = 65536,
) -> Dataset:
    """Grouped aggregate: one row per distinct key combination with
    ``sum_<c>``, ``min_<c>``, ``max_<c>`` and a count column.

    Output column names are stable regardless of pyarrow's internal
    naming: ``[*keys, sum_*…, min_*…, max_*…, count_name]``.
    """
    keys = list(keys)
    sum_cols = list(sum_cols)
    min_cols = list(min_cols)
    max_cols = list(max_cols)
    out_names = (
        keys
        + [f"sum_{c}" for c in sum_cols]
        + [f"min_{c}" for c in min_cols]
        + [f"max_{c}" for c in max_cols]
        + ([count_name] if count else [])
    )

    def partial(batch: pa.Table) -> pa.Table:
        cols = {k: batch[k] for k in keys}
        for c in set(sum_cols + min_cols + max_cols):
            cols[c] = batch[c]
        if count:
            cols[_ONES] = pa.array(np.ones(batch.num_rows, dtype=np.int64))
        t = pa.table(cols)
        out = t.group_by(keys).aggregate(_aggs_for(sum_cols, min_cols, max_cols, count))
        out = out.rename_columns(out_names)
        return out.append_column(_PART, pa.array(_part_of(out, keys, num_partitions)))

    def finalize(part: pa.Table) -> pa.Table:
        # merge partials: sum of sums/counts, min of mins, max of maxes
        aggs = [(f"sum_{c}", "sum") for c in sum_cols]
        aggs += [(f"min_{c}", "min") for c in min_cols]
        aggs += [(f"max_{c}", "max") for c in max_cols]
        if count:
            aggs.append((count_name, "sum"))
        out = part.group_by(keys).aggregate(aggs)
        return out.rename_columns(out_names)

    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    return partials.groupby(_PART).map_groups(finalize, batch_format="pyarrow")


def distinct(ds: Dataset, keys: Sequence[str], num_partitions: int = 64) -> Dataset:
    """Distinct key combinations (a hash-partitioned dedup of keys)."""
    return hash_aggregate(ds, keys, count=False, num_partitions=num_partitions)


def deterministic_sample(
    ds: Dataset, id_col: str, rate_num: int, rate_den: int = 1000003
) -> Dataset:
    """Reproducible row sample: keep rows where
    ``(id * 2654435761) % rate_den < rate_num`` — a pure function of
    the id, so the sample is identical across runs, chunkings and
    cluster sizes (unlike seeded RNG sampling, which depends on block
    layout), and exactly reproducible in SQL."""

    def keep(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mask = (ids * np.int64(2654435761)) % np.int64(rate_den) < np.int64(rate_num)
        return t.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def grouped_topk(
    ds: Dataset,
    keys: Sequence[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tie_col: str | None = None,
    num_partitions: int = 64,
    batch_size: int | None = 65536,
) -> Dataset:
    """Top-k rows per key group by ``order_col`` (deterministic ties via
    ``tie_col``), with a ``rnk`` column (1-based).

    Partial top-k is taken per batch BEFORE the shuffle (a batch can
    only contribute k rows per key), then per-partition finalize sorts
    each group — both steps vectorized via pyarrow sort + numpy
    segment logic, never one task per key."""
    keys = list(keys)

    def _topk_table(t: pa.Table, with_rank: bool) -> pa.Table:
        order = [(kc, "ascending") for kc in keys]
        order.append((order_col, "descending" if descending else "ascending"))
        if tie_col:
            order.append((tie_col, "ascending"))
        t = t.sort_by(order)
        import numpy as _np

        n = t.num_rows
        if n == 0:
            return t.append_column("rnk", pa.array([], type=pa.int64())) if with_rank else t
        new_grp = _np.zeros(n, dtype=bool)
        new_grp[0] = True
        for kc in keys:
            col = t[kc].to_numpy(zero_copy_only=False)
            new_grp[1:] |= col[1:] != col[:-1]
        # rank within group = index - start_of_group
        starts = _np.maximum.accumulate(_np.where(new_grp, _np.arange(n), 0))
        rnk = _np.arange(n) - starts + 1
        keep = rnk <= k
        t = t.filter(pa.array(keep))
        if with_rank:
            t = t.append_column("rnk", pa.array(rnk[keep]))
        return t

    def partial(batch: pa.Table) -> pa.Table:
        out = _topk_table(batch, with_rank=False)
        return out.append_column(
            _PART, pa.array(_part_of(out, keys, num_partitions))
        )

    def finalize(part: pa.Table) -> pa.Table:
        part = part.drop_columns([_PART])
        return _topk_table(part, with_rank=True)

    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    return partials.groupby(_PART).map_groups(finalize, batch_format="pyarrow")
