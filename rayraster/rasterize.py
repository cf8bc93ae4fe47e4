"""Core rasterization: bin points into grid cells, aggregate per cell.

Ray-Data-first re-expression of SEraster's ``rasterizeMatrix`` /
``rasterizeGeneExpression`` / ``rasterizeCellType``
(/root/reference/R/main.R:98-197, 291-375, 466-559):

  read → map_batches[assign cell + PARTIAL aggregate + hash part]
       → groupby("part").map_groups[vectorized pyarrow finalize]
       → final projection (mean, centroid, packed id)

Why not ``ds.groupby(keys).aggregate(Sum(...))``: Ray's built-in
aggregate pays per-GROUP Python overhead in its reduce — measured
~16 s for 100k cells on this node — which is unusable at H3-res-7
cell counts (10^8 groups).  Instead the ONE shuffle here is on a
small integer ``part = hash(cell) % P`` key, and each partition is
finalized with a single vectorized ``pyarrow.Table.group_by`` (C++).
This is the textbook partial/final decomposition:

* partial: each Arrow batch is pre-aggregated per cell before the
  exchange, so a hot tile contributes ONE row per batch regardless of
  how many points hit it — the block-local pre-reduction that defuses
  the skew the north_rule's "salting" requirement targets (the salt is
  the block id); the final per-cell reduce sees ≤ #blocks rows per
  cell, spread over partitions by hash.
* final: group count per partition is bounded by cells/P; P
  (``num_partitions``) is the knob to size for the cluster.

Other reference semantics preserved: empty pixels never exist
(groupby sees only present keys — R/main.R:174-179 drop), ``fun``
validated up front (the reference silently NULLs unknown ``fun``,
R/main.R:146-150), mean = sum/count computed once in the final
projection (exact partial/final decomposition).
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Max, Min

from rayraster.grid import GridSpec, derive_bbox, pack_cell_id

VALID_FUNS = ("mean", "sum")
_PARTIAL_COUNT = "_pn"
_PART = "_part"
DEFAULT_PARTITIONS = 64


def derive_grid_spec(
    ds: Dataset,
    resolution: float,
    square: bool = True,
    x_col: str = "x",
    y_col: str = "y",
    level: int = 0,
) -> GridSpec:
    """SEraster bbox semantics: pad min/max by res/2, floor/ceil
    (R/main.R:303-308, 346-351), origin = (xmin, ymin).

    This is a full extra pass over ``ds`` — at the 100-TB scale pass a
    known-domain GridSpec instead (e.g. the fixed geocode frame in
    geo.py); derivation exists for reference parity and ad-hoc inputs.
    """
    agg = ds.aggregate(Min(x_col), Max(x_col), Min(y_col), Max(y_col))
    x0, y0, _, _ = derive_bbox(
        agg[f"min({x_col})"],
        agg[f"max({x_col})"],
        agg[f"min({y_col})"],
        agg[f"max({y_col})"],
        resolution,
    )
    return GridSpec(x0=float(x0), y0=float(y0), resolution=resolution, square=square, level=level)


def _hash_part(ix: np.ndarray, iy: np.ndarray, num_partitions: int) -> np.ndarray:
    """Deterministic cell → partition hash (same cell, same partition)."""
    h = ix * np.int64(73856093) ^ iy * np.int64(19349663)
    return np.abs(h) % np.int64(num_partitions)


class _AssignAndPartial:
    """map_batches callable: cell assignment + per-batch partial
    aggregate + partition hash.

    Emits one row per cell (×extra keys) per batch:
    ``ix, iy, [extra…], <c>_sum…, _pn, _part``.
    """

    def __init__(
        self,
        spec: GridSpec,
        x_col: str,
        y_col: str,
        value_cols: Sequence[str],
        extra_keys: Sequence[str] = (),
        num_partitions: int = DEFAULT_PARTITIONS,
        extra_stats: Sequence[str] = (),
    ):
        self.spec = spec
        self.x_col = x_col
        self.y_col = y_col
        self.value_cols = list(value_cols)
        self.extra_keys = list(extra_keys)
        self.num_partitions = num_partitions
        self.extra_stats = list(extra_stats)  # subset of {"min", "max"}

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = batch[self.x_col].to_numpy(zero_copy_only=False)
        y = batch[self.y_col].to_numpy(zero_copy_only=False)
        ix, iy = self.spec.assign(x, y)
        cols = {"ix": pa.array(ix), "iy": pa.array(iy)}
        for k in self.extra_keys:
            cols[k] = batch[k]
        for c in self.value_cols:
            cols[c] = batch[c]
        cols[_PARTIAL_COUNT] = pa.array(np.ones(batch.num_rows, dtype=np.int64))
        t = pa.table(cols)
        aggs = [(c, "sum") for c in self.value_cols]
        for st in self.extra_stats:
            aggs += [(c, st) for c in self.value_cols]
        aggs.append((_PARTIAL_COUNT, "sum"))
        out = t.group_by(["ix", "iy", *self.extra_keys]).aggregate(aggs)
        out = out.rename_columns(
            [
                _PARTIAL_COUNT if c == f"{_PARTIAL_COUNT}_sum" else c
                for c in out.column_names
            ]
        )
        part = _hash_part(
            out["ix"].to_numpy(zero_copy_only=False),
            out["iy"].to_numpy(zero_copy_only=False),
            self.num_partitions,
        )
        return out.append_column(_PART, pa.array(part))


def _make_finalize_partition(value_cols, extra_keys, extra_stats=()):
    """map_groups fn over one hash partition: merge partials with ONE
    vectorized pyarrow group_by (no per-cell Python).  min/max merge as
    min-of-mins / max-of-maxes — exact algebraic decomposition."""
    value_cols = list(value_cols)
    extra_stats = list(extra_stats)
    keys = ["ix", "iy", *extra_keys]

    def finalize_partition(part: pa.Table) -> pa.Table:
        aggs = [(f"{c}_sum", "sum") for c in value_cols]
        for st in extra_stats:
            aggs += [(f"{c}_{st}", st) for c in value_cols]
        aggs.append((_PARTIAL_COUNT, "sum"))
        out = part.group_by(keys).aggregate(aggs)
        rename = []
        for c in out.column_names:
            if c == f"{_PARTIAL_COUNT}_sum":
                rename.append("num_cell")
            elif c.endswith("_sum_sum"):
                rename.append(f"sum_{c[: -len('_sum_sum')]}")
            elif c.endswith("_min_min"):
                rename.append(f"min_{c[: -len('_min_min')]}")
            elif c.endswith("_max_max"):
                rename.append(f"max_{c[: -len('_max_max')]}")
            else:
                rename.append(c)
        return out.rename_columns(rename)

    return finalize_partition


class _FinalProject:
    """map_batches callable on the aggregated cell table: centroids,
    packed hierarchical id, mean columns, metadata (type/resolution —
    R/main.R:183-193 analog)."""

    def __init__(self, spec: GridSpec, value_cols, fun: str, with_meta: bool):
        self.spec = spec
        self.value_cols = list(value_cols)
        self.fun = fun
        self.with_meta = with_meta

    def __call__(self, t: pa.Table) -> pa.Table:
        ix = t["ix"].to_numpy(zero_copy_only=False)
        iy = t["iy"].to_numpy(zero_copy_only=False)
        cx, cy = self.spec.centroid(ix, iy)
        t = t.append_column("cell_id", pa.array(pack_cell_id(self.spec.level, ix, iy)))
        t = t.append_column("cx", pa.array(cx))
        t = t.append_column("cy", pa.array(cy))
        if self.fun == "mean":
            n = t["num_cell"].to_numpy(zero_copy_only=False).astype(np.float64)
            for c in self.value_cols:
                s = t[f"sum_{c}"].to_numpy(zero_copy_only=False).astype(np.float64)
                t = t.append_column(f"mean_{c}", pa.array(s / n))
        if self.with_meta:
            n_rows = t.num_rows
            shape = "square" if self.spec.square else "hexagon"
            t = t.append_column("type", pa.array([shape] * n_rows, type=pa.string()))
            t = t.append_column(
                "resolution", pa.array(np.full(n_rows, self.spec.resolution))
            )
        return t


def _make_combine(value_cols, extra_keys, extra_stats=()):
    """Pre-shuffle combiner: merge partial rows across many original
    batches (same algebraic merge as finalize, keyed WITH ``_part``),
    emitting the exact partial-row schema — run with a large
    ``batch_size`` so each task folds ~16 map outputs into ≤ one row
    per live cell before the exchange."""
    value_cols = list(value_cols)
    extra_stats = list(extra_stats)
    keys = ["ix", "iy", *extra_keys, _PART]

    def combine(part: pa.Table) -> pa.Table:
        aggs = [(f"{c}_sum", "sum") for c in value_cols]
        for st in extra_stats:
            aggs += [(f"{c}_{st}", st) for c in value_cols]
        aggs.append((_PARTIAL_COUNT, "sum"))
        out = part.group_by(keys).aggregate(aggs)
        rename = []
        for c in out.column_names:
            if c == f"{_PARTIAL_COUNT}_sum":
                rename.append(_PARTIAL_COUNT)
            elif c.endswith("_sum_sum") or c.endswith("_min_min") or c.endswith("_max_max"):
                rename.append(c[: -4])
            else:
                rename.append(c)
        return out.rename_columns(rename)

    return combine


def _partial_then_finalize(
    ds: Dataset,
    spec: GridSpec,
    x_col: str,
    y_col: str,
    value_cols: Sequence[str],
    extra_keys: Sequence[str],
    num_partitions: int,
    batch_size: int | None,
    extra_stats: Sequence[str] = (),
    combine_batch_size: int | None = 262144,
) -> Dataset:
    partial = ds.map_batches(
        _AssignAndPartial(
            spec, x_col, y_col, value_cols, extra_keys, num_partitions, extra_stats
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    partial = _maybe_combine(partial, value_cols, extra_keys, extra_stats,
                             combine_batch_size)
    # the finalize group_by drops _PART (it only emits grouped keys)
    return partial.groupby(_PART).map_groups(
        _make_finalize_partition(value_cols, extra_keys, extra_stats),
        batch_format="pyarrow",
    )


def _maybe_combine(
    partial: Dataset,
    value_cols: Sequence[str],
    extra_keys: Sequence[str],
    extra_stats: Sequence[str],
    combine_batch_size: int | None,
) -> Dataset:
    """Insert the pre-shuffle combiner when it can help.

    Second pre-reduce: per-batch partials compress poorly when live
    cells ≈ batch size (measured 2M rows → 1.46M partial rows at 194k
    cells); folding ~16 map outputs per combine task bounds the
    exchange at ~cells × (rows / combine_batch).  num_cpus
    deliberately differs (by ε) from the map stage so Ray does NOT
    fuse the two operators — fused, each combine call sees only one
    map output and folds nothing.  Measured at 2M rows / 32 cpus:
    fused wall 7.0s → unfused 4.85s.  ε is BELOW 1 cpu (0.99, not
    1.01): a request above 1.0 strands a fractional cpu on small
    clusters (8-cpu leg: 7×1.01 leaves 0.93 — no 1.0-cpu map task
    fits), and a 2-cpu request degraded the 8-cpu scaling leg 2×.
    Skipped on a <2-CPU cluster (a lone cpu should not split)."""
    if not combine_batch_size:
        return partial
    import ray as _ray

    if _ray.is_initialized():
        cpus = _ray.cluster_resources().get("CPU", 0)
    else:
        # Ray will auto-init on THIS machine at execution time — judge
        # feasibility by its core count, not by skipping the check
        # (building the graph before ray.init is the common lazy path)
        cpus = os.cpu_count() or 1
    if cpus < 2:
        return partial
    return partial.map_batches(
        _make_combine(value_cols, extra_keys, extra_stats),
        batch_format="pyarrow",
        batch_size=combine_batch_size,
        zero_copy_batch=True,
        num_cpus=0.99,
    )


def rasterize_features(
    ds: Dataset,
    resolution: float,
    value_cols: Sequence[str],
    spec: GridSpec | None = None,
    square: bool = True,
    fun: str = "mean",
    x_col: str = "x",
    y_col: str = "y",
    extra_keys: Sequence[str] = (),
    with_meta: bool = True,
    batch_size: int | None = 16384,
    num_partitions: int = DEFAULT_PARTITIONS,
    ordered: bool = False,
    extra_stats: Sequence[str] = (),
    combine_batch_size: int | None = 262144,
) -> tuple[Dataset, GridSpec]:
    """Continuous-feature rasterization (``rasterizeGeneExpression``,
    R/main.R:291-375).

    ``ordered=True`` sorts the (small, aggregated) pixel table by
    ``cell_id`` — the reference's sorted-grid-index output order
    (R/main.R:139,175-176); costs a sort of the pixel table only, and
    tests/oracles compare order-insensitively so the default is off.

    Returns (pixel_table, spec).  Pixel table columns:
    ``cell_id, ix, iy, cx, cy, num_cell, sum_<c>…[, mean_<c>…]
    [, type, resolution]`` plus any ``extra_keys`` (e.g. ``rotation``
    or ``dataset_id`` — the Ray analog of the reference's list-of-SPE
    shared-frame semantics, R/main.R:294-308: one shared GridSpec,
    dataset identity as a key column, ONE shuffle for all members).
    """
    if fun not in VALID_FUNS:
        raise ValueError(f"fun must be one of {VALID_FUNS}, got {fun!r}")
    # validate BEFORE derive_grid_spec: the spec derivation is an
    # eager full-input Min/Max aggregate — a bad argument must fail in
    # microseconds, not after a complete scan
    if not set(extra_stats) <= {"min", "max"}:
        raise ValueError(f"extra_stats must be within {{'min','max'}}, got {extra_stats}")
    if spec is None:
        spec = derive_grid_spec(ds, resolution, square, x_col, y_col)
    cells = _partial_then_finalize(
        ds, spec, x_col, y_col, value_cols, extra_keys, num_partitions, batch_size,
        extra_stats, combine_batch_size,
    )
    out = cells.map_batches(
        _FinalProject(spec, value_cols, fun, with_meta),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if ordered:
        out = out.sort("cell_id")
    return out, spec


def _make_finalize_categorical(cat_col: str, extra_keys):
    """map_groups fn for one hash partition of the categorical path:
    per-cell per-label counts, per-cell totals and proportions — all
    vectorized (partitioning is by cell hash, so every label of a cell
    is local to the partition)."""
    cell_keys = ["ix", "iy", *extra_keys]
    keys = [*cell_keys, cat_col]

    def finalize_categorical(part: pa.Table) -> pa.Table:
        long = part.group_by(keys).aggregate([(_PARTIAL_COUNT, "sum")])
        long = long.rename_columns([*keys, "n"])
        tot = long.group_by(cell_keys).aggregate([("n", "sum")])
        tot = tot.rename_columns([*cell_keys, "num_cell"])
        joined = long.join(tot, keys=cell_keys, join_type="inner")
        n = joined["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        nc = joined["num_cell"].to_numpy(zero_copy_only=False).astype(np.float64)
        return joined.append_column("prop", pa.array(n / nc))

    return finalize_categorical


def rasterize_categories(
    ds: Dataset,
    resolution: float,
    cat_col: str,
    spec: GridSpec | None = None,
    square: bool = True,
    fun: str = "sum",
    x_col: str = "x",
    y_col: str = "y",
    extra_keys: Sequence[str] = (),
    batch_size: int | None = 16384,
    num_partitions: int = DEFAULT_PARTITIONS,
    combine_batch_size: int | None = 262144,
) -> tuple[Dataset, GridSpec]:
    """Categorical rasterization (``rasterizeCellType``, R/main.R:466-559).

    The reference one-hot encodes labels into a sparse 0/1 matrix and
    sums it (R/main.R:538-541).  Here the encoding is *implicit*: the
    label is just another group key — no indicator matrix ever exists.
    Output is LONG format
    ``(cell_id, ix, iy, cx, cy, <cat_col>, n, num_cell, prop)``:

    * ``n``    = per-cell per-label count       (fun="sum" semantics)
    * ``prop`` = n / num_cell                   (fun="mean" → proportions,
                                                 R/main.R:405-409)
    Use :func:`pivot_categories` for the wide SEraster-matrix layout.
    """
    if fun not in VALID_FUNS:
        raise ValueError(f"fun must be one of {VALID_FUNS}, got {fun!r}")
    if spec is None:
        spec = derive_grid_spec(ds, resolution, square, x_col, y_col)
    partial = ds.map_batches(
        _AssignAndPartial(
            spec, x_col, y_col, [], [*extra_keys, cat_col], num_partitions
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    partial = _maybe_combine(partial, [], [*extra_keys, cat_col], (), combine_batch_size)
    long = partial.groupby(_PART).map_groups(
        _make_finalize_categorical(cat_col, extra_keys), batch_format="pyarrow"
    )

    def _project(t: pa.Table) -> pa.Table:
        ix = t["ix"].to_numpy(zero_copy_only=False)
        iy = t["iy"].to_numpy(zero_copy_only=False)
        cx, cy = spec.centroid(ix, iy)
        t = t.append_column("cell_id", pa.array(pack_cell_id(spec.level, ix, iy)))
        t = t.append_column("cx", pa.array(cx))
        t = t.append_column("cy", pa.array(cy))
        return t

    return long.map_batches(_project, batch_format="pyarrow", zero_copy_batch=True), spec


def pivot_categories(
    cells_long: Dataset,
    levels: Sequence[str],
    cat_col: str,
    value_col: str = "n",
    keys: Sequence[str] = ("cell_id", "ix", "iy", "cx", "cy"),
    num_partitions: int = DEFAULT_PARTITIONS,
) -> Dataset:
    """LONG → WIDE pivot: one row per cell, one column per label
    (``<value_col>_<label>``) — the SEraster features×pixels layout
    (R/main.R:539-541), levels sorted like R's factor levels.

    ``levels`` must be the global label set (small; get it with
    ``ds.unique(cat_col)`` or pass it — analog of factor levels).
    Hash-partitioned on cell_id; each partition pivots in ONE pandas
    ``pivot_table`` call (never a task per cell).
    """
    levels = sorted(levels)
    keys = list(keys)

    def add_part(t: pa.Table) -> pa.Table:
        cid = t["cell_id"].to_numpy(zero_copy_only=False)
        part = np.abs(cid * np.int64(1000003)) % np.int64(num_partitions)
        return t.append_column(_PART, pa.array(part))

    def pivot_partition(g):
        import pandas as pd

        g = g.drop(columns=[_PART])
        wide = g.pivot_table(
            index=keys, columns=cat_col, values=value_col,
            aggfunc="sum", fill_value=0,
        )
        for lv in levels:  # absent levels → zero columns
            if lv not in wide.columns:
                wide[lv] = 0
        wide = wide[levels]
        wide.columns = [f"{value_col}_{lv}" for lv in levels]
        wide["num_cell"] = (
            g.groupby(keys)["n"].sum().reindex(wide.index)
            if "n" in g
            else g.groupby(keys)["num_cell"].first().reindex(wide.index)
        )
        return wide.reset_index()

    parted = cells_long.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
    return parted.groupby(_PART).map_groups(pivot_partition, batch_format="pandas")


def unpivot(
    ds: "Dataset",
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "feature",
    value_name: str = "value",
) -> "Dataset":
    """WIDE → LONG unpivot/melt (the inverse of :func:`pivot_categories`
    and SQL UNPIVOT): one output row per (input row × value column),
    ``var_name`` holding the source column name.  Map-only and
    vectorized — per batch, one column-slice table per value column
    concatenated (the label column is a dictionary-friendly constant
    per slice); no shuffle, order within a batch is column-major."""
    id_cols = list(id_cols)
    value_cols = list(value_cols)
    if not value_cols:
        raise ValueError("unpivot: need at least one value column")

    def melt(t: pa.Table) -> pa.Table:
        pieces = []
        for c in value_cols:
            piece = t.select(id_cols)
            piece = piece.append_column(
                var_name, pa.array([c] * t.num_rows, type=pa.string())
            )
            pieces.append(piece.append_column(value_name, t[c]))
        # permissive promotion: mixed value-column types (e.g. the
        # engine's own sum_v int64 + mean_v float64) unify instead of
        # crashing concat on unequal schemas
        return pa.concat_tables(pieces, promote_options="permissive")

    return ds.map_batches(melt, batch_format="pyarrow", zero_copy_batch=True)


def rollup_quadtree(
    cells: Dataset,
    spec: GridSpec,
    sum_cols: Sequence[str],
    levels_up: int = 1,
    count_col: str = "num_cell",
    num_partitions: int = DEFAULT_PARTITIONS,
) -> tuple[Dataset, GridSpec]:
    """Hierarchical re-aggregation: roll a fine pixel table up the
    quad-tree (multi-resolution consistency, SURVEY.md §5 invariant 5).

    Because sums/counts are algebraic, the coarse raster is computed
    from the (already reduced) fine pixel table — no second pass over
    the input rows.  Coarse origin/frame = fine origin, resolution
    doubled per level (square grids only; hex has no exact nesting).
    """
    if not spec.square:
        raise ValueError("quad-tree rollup requires a square grid")
    coarse = GridSpec(
        spec.x0,
        spec.y0,
        spec.resolution * (2**levels_up),
        square=True,
        level=spec.level + levels_up,
    )

    def _partial(t: pa.Table) -> pa.Table:
        ix = pc.shift_right(t["ix"], levels_up)
        iy = pc.shift_right(t["iy"], levels_up)
        cols = {"ix": ix, "iy": iy}
        for c in sum_cols:
            cols[c] = t[c]
        cols[count_col] = t[count_col]
        tt = pa.table(cols)
        out = tt.group_by(["ix", "iy"]).aggregate(
            [(c, "sum") for c in sum_cols] + [(count_col, "sum")]
        )
        out = out.rename_columns(["ix", "iy", *sum_cols, count_col])
        part = _hash_part(
            out["ix"].to_numpy(zero_copy_only=False),
            out["iy"].to_numpy(zero_copy_only=False),
            num_partitions,
        )
        return out.append_column(_PART, pa.array(part))

    def _finalize(part: pa.Table) -> pa.Table:
        out = part.group_by(["ix", "iy"]).aggregate(
            [(c, "sum") for c in sum_cols] + [(count_col, "sum")]
        )
        return out.rename_columns(["ix", "iy", *sum_cols, count_col])

    partial = cells.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = partial.groupby(_PART).map_groups(_finalize, batch_format="pyarrow")

    def _project(t: pa.Table) -> pa.Table:
        if _PART in t.column_names:
            t = t.drop_columns([_PART])
        ix = t["ix"].to_numpy(zero_copy_only=False)
        iy = t["iy"].to_numpy(zero_copy_only=False)
        cx, cy = coarse.centroid(ix, iy)
        t = t.append_column("cell_id", pa.array(pack_cell_id(coarse.level, ix, iy)))
        t = t.append_column("cx", pa.array(cx))
        t = t.append_column("cy", pa.array(cy))
        return t

    return agg.map_batches(_project, batch_format="pyarrow", zero_copy_batch=True), coarse


def collect_cell_ids(
    ds: Dataset,
    spec: GridSpec,
    id_col: str,
    x_col: str = "x",
    y_col: str = "y",
) -> Dataset:
    """Opt-in ``cellID_list`` (R/main.R:153-155): per-cell list of
    observation ids.  O(rows) output payload — deadly at 10^12 rows
    (SURVEY.md O1f) — so it is a separate opt-in pipeline, not part of
    the main aggregate.
    """

    def _assign(t: pa.Table) -> pa.Table:
        x = t[x_col].to_numpy(zero_copy_only=False)
        y = t[y_col].to_numpy(zero_copy_only=False)
        ix, iy = spec.assign(x, y)
        part = _hash_part(ix, iy, DEFAULT_PARTITIONS)
        return pa.table(
            {
                "ix": pa.array(ix),
                "iy": pa.array(iy),
                id_col: t[id_col],
                _PART: pa.array(part),
            }
        )

    def _collect(g: pa.Table) -> pa.Table:
        # one vectorized pass per partition: sort, find cell segment
        # boundaries, build the list column straight from offsets
        g = g.sort_by(
            [("ix", "ascending"), ("iy", "ascending"), (id_col, "ascending")]
        )
        ix = g["ix"].to_numpy(zero_copy_only=False)
        iy = g["iy"].to_numpy(zero_copy_only=False)
        n = len(ix)
        if n == 0:
            return pa.table(
                {
                    "ix": pa.array([], type=pa.int64()),
                    "iy": pa.array([], type=pa.int64()),
                    "num_cell": pa.array([], type=pa.int64()),
                    "cell_ids": pa.array([], type=pa.list_(g[id_col].type)),
                }
            )
        new = np.ones(n, dtype=bool)
        new[1:] = (ix[1:] != ix[:-1]) | (iy[1:] != iy[:-1])
        starts = np.flatnonzero(new)
        offsets = np.append(starts, n).astype(np.int32)
        values = g[id_col].combine_chunks()
        if isinstance(values, pa.ChunkedArray):
            values = values.chunk(0) if values.num_chunks else pa.array([], type=values.type)
        lists = pa.ListArray.from_arrays(pa.array(offsets), values)
        return pa.table(
            {
                "ix": pa.array(ix[starts]),
                "iy": pa.array(iy[starts]),
                "num_cell": pa.array(np.diff(np.append(starts, n))),
                "cell_ids": lists,
            }
        )

    assigned = ds.map_batches(_assign, batch_format="pyarrow", zero_copy_batch=True)
    return assigned.groupby(_PART).map_groups(_collect, batch_format="pyarrow")


def resample_area_weighted(
    pixels,
    res_in: int,
    res_out: int,
    value_cols: Sequence[str],
    ix_col: str = "ix",
    iy_col: str = "iy",
    origin: tuple | None = None,
    num_partitions: int = 64,
):
    """Exact area-weighted raster resampling to an ARBITRARY new
    resolution sharing the input grid's origin (gdalwarp ``-tr`` /
    ``terra::resample(method="sum")``; :func:`rollup_quadtree` covers
    only the ×2^k special case).  Each input cell distributes its
    value over the output cells it overlaps, proportional to overlap
    area — total mass is conserved exactly.

    Fixed-point discipline: ``res_in`` / ``res_out`` must be positive
    INTEGERS (pre-scale both by a common denominator for fractional
    resolutions), so every overlap length ``min((i+1)·r1, (j+1)·r2) −
    max(i·r1, j·r2)`` is an exact integer and each contribution
    ``v · ovx · ovy`` an exact int64.  The emitted ``sum_<c>`` is the
    resampled value SCALED BY ``res_in²`` (one int, bit-exact across
    partitionings; divide by ``float(res_in)**2`` for the physical
    value — the caller owns that single float op, the repo's twin
    rule).  ``num_cell`` counts contributing input cells.

    Shape: map-only fan-out (≤ ``(res_in // res_out + 2)²`` output
    candidates per input cell — 4 when coarsening) + ONE
    hash-partitioned aggregate; no driver state.  With ``origin=(x0,
    y0)`` the output carries ``cx``/``cy`` centers of the new grid.
    """
    import pyarrow as pa

    from rayraster.agg import hash_aggregate

    if int(res_in) != res_in or int(res_out) != res_out or res_in <= 0 or res_out <= 0:
        raise ValueError(
            "resample_area_weighted: res_in/res_out must be positive integers "
            "(pre-scale fractional resolutions by a common denominator)"
        )
    r1, r2 = np.int64(int(res_in)), np.int64(int(res_out))
    value_cols = list(value_cols)
    K = int(r1 // r2) + 2  # candidate output cells per axis

    def fanout(t: pa.Table) -> pa.Table:
        for c in value_cols:
            if not pa.types.is_integer(t.schema.field(c).type):
                raise TypeError(
                    f"resample_area_weighted: {c!r} must be integer "
                    "(pre-scale float rasters to fixed point)"
                )
        ix = t[ix_col].to_numpy(zero_copy_only=False).astype(np.int64)
        iy = t[iy_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = {
            c: t[c].to_numpy(zero_copy_only=False).astype(np.int64)
            for c in value_cols
        }
        for c, v in vals.items():
            if len(v) and int(np.abs(v).max()) * int(r1) * int(r1) >= 1 << 62:
                raise ValueError(
                    f"resample_area_weighted: |{c}|·res_in² risks int64 "
                    "overflow — pre-scale values down"
                )
        n = len(ix)
        d = np.arange(K, dtype=np.int64)
        # candidate output indices per axis: (i·r1)//r2 + d
        jx = (ix * r1) // r2
        jy = (iy * r1) // r2
        # grid of (dx, dy) candidates: rows = n·K², vectorized
        jx2 = (jx[:, None] + d[None, :])  # n × K
        jy2 = (jy[:, None] + d[None, :])
        ovx = (
            np.minimum((ix[:, None] + 1) * r1, (jx2 + 1) * r2)
            - np.maximum(ix[:, None] * r1, jx2 * r2)
        )  # n × K
        ovy = (
            np.minimum((iy[:, None] + 1) * r1, (jy2 + 1) * r2)
            - np.maximum(iy[:, None] * r1, jy2 * r2)
        )
        # combine axes: n × K × K weights
        w = ovx[:, :, None] * ovy[:, None, :]
        keep = (ovx[:, :, None] > 0) & (ovy[:, None, :] > 0)
        rows, ax, ay = np.nonzero(keep)
        out = {
            "ix": jx2[rows, ax],
            "iy": jy2[rows, ay],
        }
        ww = w[rows, ax, ay]
        for c, v in vals.items():
            out[f"_w_{c}"] = v[rows] * ww
        out["_one"] = np.ones(len(rows), dtype=np.int64)
        return pa.table({k: pa.array(a) for k, a in out.items()})

    fanned = pixels.map_batches(fanout, batch_format="pyarrow", zero_copy_batch=True)
    agg = hash_aggregate(
        fanned, ["ix", "iy"], sum_cols=[f"_w_{c}" for c in value_cols] + ["_one"],
        count=False, num_partitions=num_partitions,
    )

    def finalize(t: pa.Table) -> pa.Table:
        cols = {"ix": t["ix"], "iy": t["iy"]}
        if origin is not None:
            ox, oy = origin
            ixv = t["ix"].to_numpy(zero_copy_only=False).astype(np.float64)
            iyv = t["iy"].to_numpy(zero_copy_only=False).astype(np.float64)
            cols["cx"] = pa.array(ox + (ixv + 0.5) * float(int(r2)))
            cols["cy"] = pa.array(oy + (iyv + 0.5) * float(int(r2)))
        cols["num_cell"] = t["sum__one"]
        for c in value_cols:
            cols[f"sum_{c}"] = t[f"sum__w_{c}"]
        return pa.table(cols)

    return agg.map_batches(finalize, batch_format="pyarrow")
