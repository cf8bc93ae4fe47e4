"""Point-pattern statistics (rayraster/pointpattern.py) vs brute numpy."""

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from rayraster.pointpattern import (
    NN_SCALE,
    extent_stats,
    nn_censored,
    ripley_k,
    semivariogram,
)


def _pts(seed=7, n=300, span=100.0):
    rng = np.random.default_rng(seed)
    ids = np.arange(n, dtype=np.int64)
    x = rng.uniform(0, span, n)
    y = rng.uniform(0, span, n)
    return ids, x, y


def _ds(ids, x, y, v=None, parallelism=5):
    cols = {"id": ids, "x": x, "y": y}
    if v is not None:
        cols["v"] = v
    return rd.from_arrow(pa.table(cols)).repartition(parallelism)


def _d2(x, y):
    return (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2


def test_ripley_k_matches_brute(ray_session):
    ids, x, y = _pts()
    radii = [3.0, 7.0, 12.0]
    out = ripley_k(_ds(ids, x, y), radii, num_partitions=7)
    d2 = _d2(x, y)
    np.fill_diagonal(d2, np.inf)
    n = len(ids)
    area = (x.max() - x.min()) * (y.max() - y.min())
    for i, r in enumerate(radii):
        want = int(np.count_nonzero(d2 <= r * r))
        got = out["npairs"][i].as_py()
        assert got == want
        k = (area * float(want)) / (float(n) * (float(n) - 1.0))
        assert out["k_est"][i].as_py() == k
        assert out["l_q"][i].as_py() == math.floor(
            float(NN_SCALE) * math.sqrt(k / math.pi)
        )
    assert out["n"][0].as_py() == n


def test_ripley_k_csr_scale(ray_session):
    # uniform points: K(r) should be within 35% of pi r^2 at mid radii
    ids, x, y = _pts(seed=11, n=800)
    out = ripley_k(_ds(ids, x, y), [10.0], num_partitions=9)
    k = out["k_est"][0].as_py()
    assert abs(k - math.pi * 100.0) / (math.pi * 100.0) < 0.35


def test_ripley_k_validates_radii(ray_session):
    ids, x, y = _pts(n=20)
    with pytest.raises(ValueError):
        ripley_k(_ds(ids, x, y), [5.0, 3.0])
    with pytest.raises(ValueError):
        ripley_k(_ds(ids, x, y), [])


def test_cross_k_matches_brute(ray_session):
    from rayraster.pointpattern import cross_k

    ids1, x1, y1 = _pts(seed=21, n=150)
    ids2, x2, y2 = _pts(seed=22, n=400)
    radii = [4.0, 9.0]
    out = cross_k(
        _ds(ids1, x1, y1), _ds(ids2, x2, y2), radii, num_partitions=6
    )
    d2 = (x1[:, None] - x2[None, :]) ** 2 + (y1[:, None] - y2[None, :]) ** 2
    n1, n2 = len(ids1), len(ids2)
    area = (x1.max() - x1.min()) * (y1.max() - y1.min())
    for i, r in enumerate(radii):
        want = int(np.count_nonzero(d2 <= r * r))
        assert out["npairs"][i].as_py() == want
        k = (area * float(want)) / (float(n1) * float(n2))
        assert out["k_est"][i].as_py() == k
        assert out["l_q"][i].as_py() == math.floor(
            float(NN_SCALE) * math.sqrt(k / math.pi)
        )
    assert out["n1"][0].as_py() == n1 and out["n2"][0].as_py() == n2


def test_cross_k_independence_scale(ray_session):
    from rayraster.pointpattern import cross_k

    ids1, x1, y1 = _pts(seed=31, n=300)
    ids2, x2, y2 = _pts(seed=32, n=600)
    out = cross_k(_ds(ids1, x1, y1), _ds(ids2, x2, y2), [12.0])
    k = out["k_est"][0].as_py()
    assert abs(k - math.pi * 144.0) / (math.pi * 144.0) < 0.35


def test_nn_censored_matches_brute(ray_session):
    ids, x, y = _pts(seed=5, n=250)
    eps = 15.0
    res = nn_censored(_ds(ids, x, y), eps, num_partitions=6)
    d2 = _d2(x, y)
    np.fill_diagonal(d2, np.inf)
    nnd2 = d2.min(axis=1)
    cov = nnd2 <= eps * eps
    qsum = int(np.floor(NN_SCALE * np.sqrt(nnd2[cov])).astype(np.int64).sum())
    assert res["ncov"] == int(cov.sum())
    assert res["qsum"] == qsum
    n = len(ids)
    area = (x.max() - x.min()) * (y.max() - y.min())
    mean_obs = (float(qsum) / float(NN_SCALE)) / float(cov.sum())
    expected = 0.5 * math.sqrt(area / float(n))
    assert res["r_index"] == mean_obs / expected
    # uniform points: censored CE index should be near 1
    assert 0.7 < res["r_index"] < 1.3


def test_nn_censored_clustered_below_one(ray_session):
    # two tight clusters: NN distances tiny vs CSR expectation
    rng = np.random.default_rng(2)
    n = 200
    cx = np.where(np.arange(n) % 2 == 0, 10.0, 90.0)
    x = cx + rng.normal(0, 0.5, n)
    y = cx + rng.normal(0, 0.5, n)
    res = nn_censored(_ds(np.arange(n, dtype=np.int64), x, y), 20.0)
    assert res["ncov"] == n
    assert res["r_index"] < 0.3


def test_semivariogram_matches_brute(ray_session):
    ids, x, y = _pts(seed=9, n=220)
    rng = np.random.default_rng(1)
    v = rng.integers(0, 50, len(ids)).astype(np.int64)
    bw, md = 5.0, 20.0
    out = semivariogram(_ds(ids, x, y, v), "v", bw, md, num_partitions=6)
    d2 = _d2(x, y)
    hit = (d2 <= md * md) & (~np.eye(len(ids), dtype=bool))
    ai, bi = np.nonzero(hit)
    h = np.floor(np.sqrt(d2[ai, bi]) / bw).astype(np.int64)
    dv = v[ai] - v[bi]
    want = {}
    for hh, s in zip(h, dv * dv):
        c, q = want.get(int(hh), (0, 0))
        want[int(hh)] = (c + 1, q + int(s))
    got = {
        int(out["h"][i].as_py()): (
            out["cnt"][i].as_py(), out["sqsum"][i].as_py()
        )
        for i in range(out.num_rows)
    }
    assert got == want
    for i in range(out.num_rows):
        c, q = got[int(out["h"][i].as_py())]
        assert out["gamma"][i].as_py() == float(q) / (2.0 * float(c))


def test_semivariogram_flat_field_zero(ray_session):
    ids, x, y = _pts(seed=4, n=100)
    v = np.full(len(ids), 7, dtype=np.int64)
    out = semivariogram(_ds(ids, x, y, v), "v", 10.0, 30.0)
    assert out.num_rows > 0
    assert all(g == 0.0 for g in out["gamma"].to_pylist())


def test_semivariogram_rejects_float_values(ray_session):
    ids, x, y = _pts(n=50)
    v = np.ones(len(ids), dtype=np.float64)
    with pytest.raises((TypeError, Exception)):
        semivariogram(_ds(ids, x, y, v), "v", 5.0, 15.0).num_rows


def test_extent_stats(ray_session):
    ids, x, y = _pts(n=64)
    e = extent_stats(_ds(ids, x, y))
    assert e["n"] == 64
    assert e["xmin"] == x.min() and e["ymax"] == y.max()
    assert e["area"] == (x.max() - x.min()) * (y.max() - y.min())


def test_payload_pairs_roundtrip(ray_session):
    # radius_pairs payload columns carry both endpoints' values exactly
    from rayraster.cluster import radius_pairs

    ids, x, y = _pts(seed=13, n=120)
    v = (ids * 3 + 1).astype(np.int64)
    t = pa.concat_tables(
        [b for b in radius_pairs(
            _ds(ids, x, y, v), 12.0, payload_cols=("v",)
        ).iter_batches(batch_format="pyarrow")]
    )
    a = t["a"].to_numpy(zero_copy_only=False)
    b = t["b"].to_numpy(zero_copy_only=False)
    assert np.array_equal(t["a_v"].to_numpy(zero_copy_only=False), a * 3 + 1)
    assert np.array_equal(t["b_v"].to_numpy(zero_copy_only=False), b * 3 + 1)


def test_ripley_and_crossk_reject_degenerate_sizes(ray_session):
    """Regression: n<=1 (or an empty cross side) raised a bare
    ZeroDivisionError deep in the estimator."""
    from rayraster.pointpattern import cross_k, ripley_k

    one = pa.table({"id": pa.array([1], type=pa.int64()),
                    "x": pa.array([0.0]), "y": pa.array([0.0])})
    with pytest.raises(ValueError, match="at least 2"):
        ripley_k(rd.from_arrow(one), [1.0],
                 extent={"n": 1, "area": 1.0})
    empty = pa.table({"id": pa.array([], type=pa.int64()),
                      "x": pa.array([], type=pa.float64()),
                      "y": pa.array([], type=pa.float64())})
    with pytest.raises(ValueError, match="non-empty"):
        cross_k(rd.from_arrow(one), rd.from_arrow(empty), [1.0],
                extent={"n": 1, "area": 1.0}, n_right=0)
