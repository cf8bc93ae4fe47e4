"""Reference-shaped convenience API — the SEraster function surface.

Thin wrappers exposing the engine under the reference's call shapes
(/root/reference/NAMESPACE:3-7) so a SEraster user can port pipelines
mechanically:

* ``rasterize_gene_expression``  ≙ rasterizeGeneExpression (R/main.R:291)
* ``rasterize_cell_type``        ≙ rasterizeCellType       (R/main.R:466)
* ``permutate_by_rotation``      ≙ permutateByRotation     (R/main.R:616)
* ``plot_raster``                ≙ plotRaster              (R/main.R:791)

List-of-SpatialExperiment inputs map to a ``dict[name, Dataset]``:
members are tagged and unioned, ONE shared pixel frame is derived over
the union (common-bbox semantics, R/main.R:294-308), ONE shuffle
rasterizes everything, and the result is returned as a dict with the
member names preserved (test-main.R:63-68 name-preservation).
"""

from __future__ import annotations

from typing import Mapping, Sequence

import pyarrow as pa

from ray.data import Dataset

from rayraster.grid import GridSpec
from rayraster.rasterize import (
    derive_grid_spec,
    rasterize_categories,
    rasterize_features,
)
from rayraster.rotate import permutate_by_rotation  # noqa: F401  (re-export)
from rayraster.plot import plot_raster  # noqa: F401  (re-export)

_DSID = "dataset_id"


def _tag_union(members: Mapping[str, Dataset]) -> Dataset:
    if not members:
        raise ValueError(
            "need at least one named dataset (the members dict is empty)"
        )
    parts = []
    for name, ds in members.items():
        def tag(t: pa.Table, _name=name) -> pa.Table:
            return t.append_column(
                _DSID, pa.array([_name] * t.num_rows, type=pa.string())
            )

        parts.append(ds.map_batches(tag, batch_format="pyarrow"))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def _split_named(pixels: Dataset, names) -> dict[str, Dataset]:
    import pyarrow.compute as pc

    # materialize ONCE: each returned member filters the same pixel
    # Dataset, and without this, consuming N members would re-execute
    # the whole rasterize pipeline N times (pixels are post-aggregation
    # — small by construction)
    pixels = pixels.materialize()
    out = {}
    for name in names:
        def keep(t: pa.Table, _name=name) -> pa.Table:
            return t.filter(pc.equal(t[_DSID], _name))

        out[name] = pixels.map_batches(keep, batch_format="pyarrow")
    return out


def rasterize_gene_expression(
    input,
    assay_cols: Sequence[str],
    resolution: float = 100.0,
    square: bool = True,
    fun: str = "mean",
    x_col: str = "x",
    y_col: str = "y",
    spec: GridSpec | None = None,
):
    """Continuous-feature rasterization with the reference's signature
    shape.  ``input``: a Dataset, or a dict[name, Dataset] (list-of-SPE
    analog → shared frame, names preserved).  Returns (pixels, spec)
    or (dict[name, pixels], spec)."""
    if isinstance(input, Mapping):
        union = _tag_union(input)
        if spec is None:
            spec = derive_grid_spec(union, resolution, square, x_col, y_col)
        pixels, _ = rasterize_features(
            union, resolution, assay_cols, spec=spec, square=square, fun=fun,
            x_col=x_col, y_col=y_col, extra_keys=(_DSID,),
        )
        return _split_named(pixels, input.keys()), spec
    return rasterize_features(
        input, resolution, assay_cols, spec=spec, square=square, fun=fun,
        x_col=x_col, y_col=y_col,
    )


def rasterize_cell_type(
    input,
    col_name: str,
    resolution: float = 100.0,
    square: bool = True,
    fun: str = "sum",
    x_col: str = "x",
    y_col: str = "y",
    spec: GridSpec | None = None,
):
    """Categorical rasterization with the reference's signature shape
    (default fun="sum" → counts; "mean" semantics = proportions via
    the ``prop`` column — R/main.R:405-409)."""
    if isinstance(input, Mapping):
        union = _tag_union(input)
        if spec is None:
            spec = derive_grid_spec(union, resolution, square, x_col, y_col)
        long, _ = rasterize_categories(
            union, resolution, col_name, spec=spec, square=square, fun=fun,
            x_col=x_col, y_col=y_col, extra_keys=(_DSID,),
        )
        return _split_named(long, input.keys()), spec
    return rasterize_categories(
        input, resolution, col_name, spec=spec, square=square, fun=fun,
        x_col=x_col, y_col=y_col,
    )
