"""Rotation permutations — ``permutateByRotation`` (R/main.R:616-707).

The reference builds ``n_perm`` rotated *copies* of the dataset (list
of SPE), rotating coordinates about the midrange point
``((min+max)/2, (min+max)/2)`` with angles ``k * 360/n_perm`` degrees,
k = 0..n_perm-1 (R/main.R:618,637,652).  All copies share one bbox /
pixel frame downstream (vignette line 245).

Ray-Data-first shape: a single fan-out ``map_batches`` that emits all
n_perm rotated copies tagged with a ``rotation`` column — rotation then
becomes just another group key in the ONE rasterize shuffle, instead of
n_perm sequential pipelines.  Stateless; rotation matrices are plain
numpy.

cos/sin constants are computed once on the driver and baked into the
stage (and into the SQL oracles as literals) so results are
IEEE-identical everywhere.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Max, Min


def rotation_angles(n_perm: int) -> list[float]:
    """Angles in degrees: seq(0, 360, by=360/n_perm)[1:n_perm]
    (R/main.R:618) — i.e. k*360/n_perm, k=0..n_perm-1; always distinct
    (test-main.R:96-97)."""
    if n_perm < 1:
        raise ValueError("n_perm must be >= 1")
    return [k * (360.0 / n_perm) for k in range(n_perm)]


def midrange_origin(ds: Dataset, x_col: str = "x", y_col: str = "y"):
    """((min+max)/2, (min+max)/2) — rearrr::midrange semantics
    (R/main.R:627-637,686).  Over the whole dataset: for multi-dataset
    input keep them in ONE Dataset (dataset_id column) and this is
    automatically the common origin of the reference's list branch."""
    agg = ds.aggregate(Min(x_col), Max(x_col), Min(y_col), Max(y_col))
    ox = (agg[f"min({x_col})"] + agg[f"max({x_col})"]) / 2.0
    oy = (agg[f"min({y_col})"] + agg[f"max({y_col})"]) / 2.0
    return float(ox), float(oy)


def rotate_xy(x, y, angle_deg: float, ox: float, oy: float):
    """Counter-clockwise rotation by ``angle_deg`` about (ox, oy).

    SQL twin (cos/sin inlined as literals):
      x' = ox + (x-ox)*COS - (y-oy)*SIN
      y' = oy + (x-ox)*SIN + (y-oy)*COS
    """
    c = math.cos(math.radians(angle_deg))
    s = math.sin(math.radians(angle_deg))
    dx = x - ox
    dy = y - oy
    return ox + dx * c - dy * s, oy + dx * s + dy * c


class _RotateFanout:
    """map_batches callable: emit one rotated copy per angle, tagged."""

    def __init__(self, angles, ox, oy, x_col, y_col):
        self.params = [
            (a, math.cos(math.radians(a)), math.sin(math.radians(a))) for a in angles
        ]
        self.ox = ox
        self.oy = oy
        self.x_col = x_col
        self.y_col = y_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = batch[self.x_col].to_numpy(zero_copy_only=False)
        y = batch[self.y_col].to_numpy(zero_copy_only=False)
        dx = x - self.ox
        dy = y - self.oy
        others = batch.drop_columns([self.x_col, self.y_col])
        pieces = []
        for a, c, s in self.params:
            t = others
            t = t.append_column(self.x_col, pa.array(self.ox + dx * c - dy * s))
            t = t.append_column(self.y_col, pa.array(self.oy + dx * s + dy * c))
            t = t.append_column(
                "rotation", pa.array(np.full(batch.num_rows, a, dtype=np.float64))
            )
            pieces.append(t)
        return pa.concat_tables(pieces)


def permutate_by_rotation(
    ds: Dataset,
    n_perm: int = 1,
    x_col: str = "x",
    y_col: str = "y",
    origin: tuple[float, float] | None = None,
    batch_size: int | None = 65536,
) -> Dataset:
    """All n_perm rotated copies in one Dataset with a ``rotation``
    column (degrees).  Rotation 0 is the identity copy.  Feed straight
    into :func:`rayraster.rasterize.rasterize_features` with
    ``extra_keys=("rotation",)`` — one shared frame, one shuffle, which
    is the reference's list-branch semantics (R/main.R:294-308) without
    n_perm sequential passes.
    """
    if origin is None:
        origin = midrange_origin(ds, x_col, y_col)
    angles = rotation_angles(n_perm)
    return ds.map_batches(
        _RotateFanout(angles, origin[0], origin[1], x_col, y_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
