"""Core rasterization: bin points into grid cells, aggregate per cell.

Ray-Data-first re-expression of SEraster's ``rasterizeMatrix`` /
``rasterizeGeneExpression`` / ``rasterizeCellType``
(/root/reference/R/main.R:98-197, 291-375, 466-559):

  read → map_batches[assign cell + PARTIAL aggregate]  (stateless, Arrow)
       → groupby(cell keys).aggregate(Sum of partials)   (the ONE shuffle)
       → map_batches[final projection: mean, centroid, packed id]

Scale notes (the whole point of the redesign):

* The reference forks one task per non-empty pixel and subsets a
  resident matrix per task (R/main.R:139-162).  Here assignment is a
  closed-form vectorized computation per Arrow batch and aggregation is
  a partial/final decomposition: each batch is pre-aggregated with
  ``pyarrow.Table.group_by`` before the shuffle, so the exchange moves
  at most (#distinct cells in batch) rows per batch — a hot tile
  contributes ONE row per batch regardless of how many points hit it.
  This per-block pre-reduction is exactly the "salting" defense the
  north_rule asks for: the implicit salt is the block id, and the
  final reduce per cell is over ≤ #blocks tiny partials.
* Empty pixels never exist (groupby only sees present keys) — matching
  the reference's drop of empty pixels (R/main.R:174-179).
* ``fun`` is validated up front; the reference silently yields NULLs
  for unknown ``fun`` (R/main.R:146-150) — a sharp edge we reject.
* mean = sum / count computed in the final projection — exact
  partial/final decomposition, no double-rounding drift.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Max, Min, Sum

from rayraster.grid import GridSpec, derive_bbox, pack_cell_id

VALID_FUNS = ("mean", "sum")
_PARTIAL_COUNT = "_pn"


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


class _AssignAndPartial:
    """map_batches callable: cell assignment + per-batch partial aggregate.

    Emits one row per (cell keys…) per batch:
    ``ix, iy, [extra keys…], <c>_sum…, _pn``.
    """

    def __init__(
        self,
        spec: GridSpec,
        x_col: str,
        y_col: str,
        value_cols: Sequence[str],
        extra_keys: Sequence[str] = (),
    ):
        self.spec = spec
        self.x_col = x_col
        self.y_col = y_col
        self.value_cols = list(value_cols)
        self.extra_keys = list(extra_keys)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_partial_table(self.value_cols, self.extra_keys)
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
        aggs = [(c, "sum") for c in self.value_cols] + [(_PARTIAL_COUNT, "sum")]
        out = t.group_by(["ix", "iy", *self.extra_keys]).aggregate(aggs)
        # pyarrow names results "<col>_sum"; normalize the count column
        return out.rename_columns(
            [
                _PARTIAL_COUNT if c == f"{_PARTIAL_COUNT}_sum" else c
                for c in out.column_names
            ]
        )


def _empty_partial_table(value_cols, extra_keys):
    fields = [("ix", pa.int64()), ("iy", pa.int64())]
    fields += [(k, pa.string()) for k in extra_keys]
    fields += [(f"{c}_sum", pa.int64()) for c in value_cols]
    fields += [(_PARTIAL_COUNT, pa.int64())]
    return pa.table({n: pa.array([], type=t) for n, t in fields})


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
    batch_size: int | None = 65536,
) -> tuple[Dataset, GridSpec]:
    """Continuous-feature rasterization (``rasterizeGeneExpression``,
    R/main.R:291-375).

    Returns (pixel_table, spec).  Pixel table columns:
    ``cell_id, ix, iy, cx, cy, num_cell, sum_<c>…[, mean_<c>…]
    [, type, resolution]`` plus any ``extra_keys`` (e.g. ``rotation``
    or ``dataset_id`` — the Ray analog of the reference's list-of-SPE
    shared-frame semantics, R/main.R:294-308: one shared GridSpec,
    dataset identity as a key column, ONE shuffle for all members).
    """
    if fun not in VALID_FUNS:
        raise ValueError(f"fun must be one of {VALID_FUNS}, got {fun!r}")
    if spec is None:
        spec = derive_grid_spec(ds, resolution, square, x_col, y_col)
    partial = ds.map_batches(
        _AssignAndPartial(spec, x_col, y_col, value_cols, extra_keys),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    aggs = [Sum(f"{c}_sum", alias_name=f"sum_{c}") for c in value_cols]
    aggs.append(Sum(_PARTIAL_COUNT, alias_name="num_cell"))
    cells = partial.groupby(["ix", "iy", *extra_keys]).aggregate(*aggs)
    out = cells.map_batches(
        _FinalProject(spec, value_cols, fun, with_meta),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return out, spec


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
    batch_size: int | None = 65536,
) -> tuple[Dataset, GridSpec]:
    """Categorical rasterization (``rasterizeCellType``, R/main.R:466-559).

    The reference one-hot encodes labels into a sparse 0/1 matrix and
    sums it (R/main.R:538-541).  Here the encoding is *implicit*: the
    label is just another group key — ``groupby(ix, iy, cat)`` with a
    count — so no indicator matrix ever exists.  Output is LONG format
    ``(cell_id, ix, iy, cx, cy, <cat_col>, n, num_cell[, prop])``:

    * ``n``        = per-cell per-label count      (fun="sum" semantics)
    * ``prop``     = n / num_cell                  (fun="mean" → proportions,
                                                    R/main.R:405-409)
    Use :func:`pivot_categories` for the wide SEraster-matrix layout.
    """
    if fun not in VALID_FUNS:
        raise ValueError(f"fun must be one of {VALID_FUNS}, got {fun!r}")
    if spec is None:
        spec = derive_grid_spec(ds, resolution, square, x_col, y_col)
    partial = ds.map_batches(
        _AssignAndPartial(spec, x_col, y_col, [], [*extra_keys, cat_col]),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    long = partial.groupby(["ix", "iy", *extra_keys, cat_col]).aggregate(
        Sum(_PARTIAL_COUNT, alias_name="n")
    )

    # attach per-cell totals (num_cell) and proportions without a second
    # full shuffle: the aggregated long table is tiny (cells × labels),
    # group it per cell with map_groups.
    def _per_cell(g):
        g = g.copy()
        g["num_cell"] = int(g["n"].sum())
        g["prop"] = g["n"] / g["num_cell"]
        return g

    long = long.groupby(["ix", "iy", *extra_keys]).map_groups(
        _per_cell, batch_format="pandas"
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
) -> Dataset:
    """LONG → WIDE pivot: one row per cell, one column per label
    (``<value_col>_<label>``) — the SEraster features×pixels layout
    (R/main.R:539-541), levels sorted like R's factor levels.

    ``levels`` must be the global label set (small; get it with
    ``ds.unique(cat_col)`` or pass it — analog of factor levels).
    """
    levels = sorted(levels)
    keys = list(keys)

    def _pivot(g):
        import pandas as pd

        first = g.iloc[0]
        row = {k: first[k] for k in keys}
        row["num_cell"] = int(g["n"].sum()) if "n" in g else int(first["num_cell"])
        vals = dict(zip(g[cat_col], g[value_col]))
        zero = 0 if g[value_col].dtype.kind in "iu" else 0.0
        for lv in levels:
            row[f"{value_col}_{lv}"] = vals.get(lv, zero)
        return pd.DataFrame([row])

    return cells_long.groupby("cell_id").map_groups(_pivot, batch_format="pandas")


def rollup_quadtree(
    cells: Dataset,
    spec: GridSpec,
    sum_cols: Sequence[str],
    levels_up: int = 1,
    count_col: str = "num_cell",
) -> tuple[Dataset, GridSpec]:
    """Hierarchical re-aggregation: roll a fine pixel table up the
    quad-tree (multi-resolution consistency, SURVEY.md §5 invariant 5).

    Because sums/counts are algebraic, the coarse raster is computed
    from the (already tiny) fine pixel table — no second pass over the
    input rows.  Coarse origin/frame = fine origin, resolution doubled
    per level (square grids only; hex has no exact nesting)."""
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
        return out.rename_columns(["ix", "iy", *sum_cols, count_col])

    partial = cells.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    aggs = [Sum(c, alias_name=c) for c in sum_cols]
    aggs.append(Sum(count_col, alias_name=count_col))
    agg = partial.groupby(["ix", "iy"]).aggregate(*aggs)

    def _project(t: pa.Table) -> pa.Table:
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
        return pa.table({"ix": pa.array(ix), "iy": pa.array(iy), id_col: t[id_col]})

    def _collect(g):
        import pandas as pd

        return pd.DataFrame(
            [
                {
                    "ix": g["ix"].iloc[0],
                    "iy": g["iy"].iloc[0],
                    "num_cell": len(g),
                    "cell_ids": sorted(g[id_col].tolist()),
                }
            ]
        )

    assigned = ds.map_batches(_assign, batch_format="pyarrow", zero_copy_batch=True)
    return assigned.groupby(["ix", "iy"]).map_groups(_collect, batch_format="pandas")
