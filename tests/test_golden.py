"""Golden-file regression pin (FIXTURES.md F2): per-pixel aggregates of
the micro fixture at {1.0, 2.5} × {square, hex} × rotations
{0°, 120°, 240°} must match the committed CSVs exactly, compared
order-insensitively keyed on (rotation, cx, cy) — pixel labels are
opaque grid indices (SURVEY.md §1.1)."""

import os

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from rayraster import permutate_by_rotation, rasterize_features

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

from golden.generate import fixture_df  # noqa: E402


@pytest.mark.parametrize("res", [1.0, 2.5])
@pytest.mark.parametrize("square", [True, False])
def test_matches_golden(res, square, ray_session):
    ds = rd.from_pandas(fixture_df())
    rotated = permutate_by_rotation(ds, 3, origin=(2.0, 2.0))
    out, _ = rasterize_features(
        rotated, res, ["f1", "f2"], square=square, fun="mean",
        extra_keys=("rotation",),
    )
    got = (
        out.to_pandas()[
            ["rotation", "cx", "cy", "num_cell",
             "sum_f1", "mean_f1", "sum_f2", "mean_f2"]
        ]
        .sort_values(["rotation", "cx", "cy"])
        .reset_index(drop=True)
    )
    name = f"raster_res{res}_{'sq' if square else 'hex'}.csv"
    want = pd.read_csv(os.path.join(GOLDEN_DIR, name))
    assert len(got) == len(want), name
    for c in got.columns:
        np.testing.assert_allclose(
            got[c].to_numpy(dtype=np.float64),
            want[c].to_numpy(dtype=np.float64),
            rtol=0,
            atol=1e-9,
            err_msg=f"{name}:{c}",
        )
