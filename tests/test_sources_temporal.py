"""Non-parquet sources (CSV / line-delimited JSON) and the
spatiotemporal raster composition."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from rayraster.grid import GridSpec
from rayraster.pipelines import rasterize_temporal
from rayraster.rasterize import rasterize_features
from rayraster.sources import read_table, write_table


def _points(n=2000, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "id": np.arange(n),
            "x": rng.uniform(-10, 10, n),
            "y": rng.uniform(-5, 5, n),
            "v": rng.integers(0, 100, n),
        }
    )


def test_read_table_formats_equivalent(ray_session, tmp_path):
    """The same pipeline off parquet, CSV and JSONL sources produces
    identical pixel tables."""
    df = _points()
    base = rd.from_pandas(df)
    outs = {}
    for fmt in ("parquet", "csv", "json"):
        d = str(tmp_path / fmt)
        write_table(base, d, fmt=fmt)
        ds = read_table(d, fmt=fmt, columns=["x", "y", "v"])
        px, _ = rasterize_features(
            ds, 1.0, ["v"], spec=GridSpec(-10.0, -5.0, 1.0), fun="sum",
            with_meta=False, num_partitions=8,
        )
        outs[fmt] = (
            px.to_pandas()[["ix", "iy", "num_cell", "sum_v"]]
            .sort_values(["ix", "iy"])
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs["csv"], outs["parquet"])
    pd.testing.assert_frame_equal(outs["json"], outs["parquet"])
    assert outs["parquet"].num_cell.sum() == len(df)  # mass conservation


def test_read_table_rejects_unknown_format(ray_session, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="fmt"):
        read_table(str(tmp_path), fmt="orc")


def test_rasterize_temporal_cube(ray_session):
    """One pixel row per (cell, hour window); counts match a pandas
    groupby over the same window id + cell assignment."""
    rng = np.random.default_rng(3)
    n = 5000
    df = pd.DataFrame(
        {
            "x": rng.uniform(0, 4, n),
            "y": rng.uniform(0, 4, n),
            "v": rng.integers(0, 10, n),
            "ts": pd.to_datetime(
                rng.integers(0, 4 * 3600, n) * 1_000_000, unit="us"
            ),
        }
    )
    spec = GridSpec(0.0, 0.0, 1.0)
    px, _ = rasterize_temporal(
        rd.from_pandas(df), 1.0, ["v"], ts_col="ts",
        window_us=3_600_000_000, spec=spec, fun="sum", with_meta=False,
        num_partitions=8,
    )
    got = (
        px.to_pandas()[["ix", "iy", "window", "num_cell", "sum_v"]]
        .sort_values(["ix", "iy", "window"])
        .reset_index(drop=True)
    )
    ix, iy = spec.assign(df.x.to_numpy(), df.y.to_numpy())
    w = (df.ts.astype("int64") // 1000) // 3_600_000_000  # ns → us → hour
    want = (
        pd.DataFrame({"ix": ix, "iy": iy, "window": w, "v": df.v})
        .groupby(["ix", "iy", "window"])
        .agg(num_cell=("v", "size"), sum_v=("v", "sum"))
        .reset_index()
        .sort_values(["ix", "iy", "window"])
        .reset_index(drop=True)
    )
    got["window"] = got.window.astype(np.int64)
    want["num_cell"] = want.num_cell.astype(np.int64)
    want["sum_v"] = want.sum_v.astype(np.int64)
    pd.testing.assert_frame_equal(got, want)
    # the cube has multiple windows per cell (the extra_keys axis is real)
    assert got.groupby(["ix", "iy"]).size().max() > 1
