"""kNN: GridIndex exactness vs brute force; KnnStage actor semantics."""

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data as rd

from rayraster.knn import GridIndex, KnnStage, brute_force_knn


def test_grid_index_matches_brute_force():
    rng = np.random.default_rng(11)
    rx = rng.uniform(-100, 100, 800)
    ry = rng.uniform(-50, 50, 800)
    qx = rng.uniform(-110, 110, 300)
    qy = rng.uniform(-60, 60, 300)
    gi = GridIndex(rx, ry)
    for k in (1, 5, 17):
        gidx, gd2 = gi.query(qx, qy, k)
        bidx, bd2 = brute_force_knn(qx, qy, rx, ry, k)
        np.testing.assert_array_equal(gidx, bidx)
        np.testing.assert_allclose(gd2, bd2)


def test_grid_index_clustered_points():
    """Heavy clustering (hotspot shape) must stay exact."""
    rng = np.random.default_rng(3)
    rx = np.concatenate([rng.normal(0, 0.01, 500), rng.uniform(-100, 100, 50)])
    ry = np.concatenate([rng.normal(0, 0.01, 500), rng.uniform(-100, 100, 50)])
    gi = GridIndex(rx, ry)
    gidx, _ = gi.query(rx[:50], ry[:50], 7)
    bidx, _ = brute_force_knn(rx[:50], ry[:50], rx, ry, 7)
    np.testing.assert_array_equal(gidx, bidx)


def test_knn_k_larger_than_refs():
    rx = np.array([0.0, 1.0, 2.0])
    ry = np.zeros(3)
    gi = GridIndex(rx, ry)
    idx, d2 = gi.query(np.array([0.1]), np.array([0.0]), 5)
    assert idx[0, :3].tolist() == [0, 1, 2]
    assert (idx[0, 3:] == -1).all()


def test_knn_stage_actor_pool_and_self_exclusion():
    pix = pd.DataFrame(
        {
            "ix": [0, 1, 2, 3],
            "iy": [0, 0, 0, 0],
            "cx": [0.5, 1.5, 2.5, 3.5],
            "cy": [0.5, 0.5, 0.5, 0.5],
        }
    )
    ref = ray.put(
        {"x": pix.cx.to_numpy(), "y": pix.cy.to_numpy(),
         "ix": pix.ix.to_numpy(), "iy": pix.iy.to_numpy()}
    )
    ds = rd.from_pandas(pix)
    out = ds.map_batches(
        KnnStage,
        fn_constructor_args=(ref, 2),
        fn_constructor_kwargs={"exclude_self": True},
        batch_format="pyarrow",
        concurrency=2,
    ).to_pandas()
    # 4 queries × 2 ranks
    assert len(out) == 8
    g = out[out.ix == 0].sort_values("rank")
    assert g.n_ix.tolist() == [1, 2]  # nearest two, self excluded
    assert g.dist2.tolist() == [1.0, 4.0]
    # deterministic tie-break: query 1 is equidistant to 0 and 2 → lower row first
    g1 = out[out.ix == 1].sort_values("rank")
    assert g1.n_ix.tolist() == [0, 2]


def test_spatial_knn_self_matches_brute(ray_session):
    """Per-partition tiled kNN (one shuffle, no broadcast) must match
    brute force wherever it reports exact=True — and at this density
    everything is exact."""
    from rayraster.knn import spatial_knn_self

    rng = np.random.default_rng(21)
    n = 400
    pix = pd.DataFrame(
        {
            "ix": np.arange(n),
            "iy": np.zeros(n, dtype=np.int64),
            "cx": rng.uniform(0, 20, n),
            "cy": rng.uniform(0, 20, n),
        }
    )
    out = (
        spatial_knn_self(rd.from_pandas(pix), k=3, tile_size=5.0)
        .to_pandas()
        .sort_values(["ix", "rank"])
        .reset_index(drop=True)
    )
    assert out.exact.all()
    assert len(out) == n * 3
    bidx, bd2 = brute_force_knn(
        pix.cx.to_numpy(), pix.cy.to_numpy(),
        pix.cx.to_numpy(), pix.cy.to_numpy(), 3,
        exclude=np.arange(n),
    )
    want_n_ix = pix.ix.to_numpy()[bidx].ravel()
    np.testing.assert_array_equal(out.n_ix.to_numpy(), want_n_ix)
    np.testing.assert_allclose(out.dist2.to_numpy(), bd2.ravel())


def test_spatial_knn_sparse_flags_inexact(ray_session):
    """Two far-apart points with a tiny tile: neighbor beyond the halo
    must be flagged exact=False (or dropped), never silently wrong."""
    from rayraster.knn import spatial_knn_self

    pix = pd.DataFrame(
        {"ix": [0, 1], "iy": [0, 0], "cx": [0.0, 10.0], "cy": [0.0, 0.0]}
    )
    out = spatial_knn_self(rd.from_pandas(pix), k=1, tile_size=1.0).to_pandas()
    assert (~out.exact).all() if len(out) else True


def test_grid_index_skewed_extent():
    """y-extent ≫ x-extent: bucket keys must stay collision-free."""
    rng = np.random.default_rng(31)
    rx = rng.uniform(0, 1, 500)       # tiny x range
    ry = rng.uniform(0, 1000, 500)    # huge y range
    qx = rng.uniform(0, 1, 100)
    qy = rng.uniform(0, 1000, 100)
    gi = GridIndex(rx, ry)
    gidx, gd2 = gi.query(qx, qy, 5)
    bidx, bd2 = brute_force_knn(qx, qy, rx, ry, 5)
    np.testing.assert_array_equal(gidx, bidx)
    np.testing.assert_allclose(gd2, bd2)
