"""Lattice neighbor stats + local Moran's I (rayraster/spatial.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from rayraster.spatial import local_moran, neighbor_stats


def _brute_nbrs(px: pd.DataFrame, connectivity: int):
    if connectivity == 6:
        offs = [(1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)]
    else:
        offs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
        if connectivity == 8:
            offs += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    vals = {(r.ix, r.iy): r.v for r in px.itertuples()}
    cnt, ssum = [], []
    for r in px.itertuples():
        ns = [vals.get((r.ix + dx, r.iy + dy)) for dx, dy in offs]
        ns = [v for v in ns if v is not None]
        cnt.append(len(ns))
        ssum.append(sum(ns))
    return np.array(cnt, dtype=np.int64), np.array(ssum, dtype=np.int64)


def _raster(seed=5, m=400, span=60):
    rng = np.random.default_rng(seed)
    ix = rng.integers(-span, span, m).astype(np.int64)
    iy = rng.integers(-span, span, m).astype(np.int64)
    keys = ix * (1 << 32) + iy
    _, first = np.unique(keys, return_index=True)
    return pd.DataFrame(
        {
            "ix": ix[first],
            "iy": iy[first],
            "v": rng.integers(0, 1000, len(first)).astype(np.int64),
        }
    )


@pytest.mark.parametrize("connectivity", [4, 8, 6])
def test_neighbor_stats_matches_brute(ray_session, connectivity):
    px = _raster()
    out = (
        neighbor_stats(
            rd.from_pandas(px).repartition(4), "v",
            connectivity=connectivity, tile=16, num_partitions=8,
        )
        .to_pandas()
        .sort_values(["ix", "iy"])
        .reset_index(drop=True)
    )
    want = px.sort_values(["ix", "iy"]).reset_index(drop=True)
    cnt, ssum = _brute_nbrs(want, connectivity)
    assert len(out) == len(want)
    assert (out["v"].to_numpy() == want["v"].to_numpy()).all()
    assert (out["nbr_cnt"].to_numpy() == cnt).all()
    assert (out["nbr_sum"].to_numpy() == ssum).all()


def test_neighbor_stats_tile_and_partition_invariant(ray_session):
    px = _raster(seed=9)

    def run(tile, parts, blocks):
        return (
            neighbor_stats(
                rd.from_pandas(px).repartition(blocks), "v",
                tile=tile, num_partitions=parts,
            )
            .to_pandas()
            .sort_values(["ix", "iy"])
            .reset_index(drop=True)
        )

    a = run(16, 8, 2)
    b = run(7, 16, 5)  # odd tile size exercises different halo splits
    pd.testing.assert_frame_equal(a, b)


def test_neighbor_stats_dense_block_edges(ray_session):
    # a dense 10x10 block straddling a tile boundary: interior pixels
    # have 4 neighbors, corners 2, edges 3
    g = np.mgrid[-5:5, -5:5].reshape(2, -1)
    px = pd.DataFrame(
        {"ix": g[0].astype(np.int64), "iy": g[1].astype(np.int64),
         "v": np.ones(100, dtype=np.int64)}
    )
    out = neighbor_stats(
        rd.from_pandas(px), "v", tile=4, num_partitions=8
    ).to_pandas()
    assert len(out) == 100
    assert out["nbr_cnt"].sum() == out["nbr_sum"].sum()  # v ≡ 1
    counts = out["nbr_cnt"].value_counts().to_dict()
    assert counts == {4: 64, 3: 32, 2: 4}


def test_local_moran_patterns(ray_session):
    # checkerboard of 0/2 values: every neighbor deviates OPPOSITE to
    # the pixel → all lisa strictly negative; constant raster → all 0
    g = np.mgrid[0:8, 0:8].reshape(2, -1)
    ix, iy = g[0].astype(np.int64), g[1].astype(np.int64)
    checker = pd.DataFrame(
        {"ix": ix, "iy": iy, "v": ((ix + iy) % 2 * 2).astype(np.int64)}
    )
    out = local_moran(rd.from_pandas(checker), "v", num_partitions=8).to_pandas()
    assert (out["lisa"] < 0).all()
    # global Moran numerator from the lisa sum equals the dense formula
    v = checker.set_index(["ix", "iy"])["v"]
    mean = v.sum() / len(v)
    num = 0.0
    for (a, b), x in v.items():
        for dx, dy in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
            if (a + dx, b + dy) in v.index:
                num += (x - mean) * (v[(a + dx, b + dy)] - mean)
    assert np.isclose(out["lisa"].sum(), num)

    const = checker.assign(v=np.int64(7))
    out2 = local_moran(rd.from_pandas(const), "v", num_partitions=8).to_pandas()
    assert (out2["lisa"] == 0.0).all()


def test_focal_mean_matches_brute(ray_session):
    from rayraster.spatial import focal_mean

    px = _raster(seed=3)
    out = (
        focal_mean(rd.from_pandas(px).repartition(3), "v", tile=16,
                   num_partitions=8)
        .to_pandas()
        .sort_values(["ix", "iy"])
        .reset_index(drop=True)
    )
    want = px.sort_values(["ix", "iy"]).reset_index(drop=True)
    cnt, ssum = _brute_nbrs(want, 4)
    v = want["v"].to_numpy()
    np.testing.assert_array_equal(
        out["focal_mean"].to_numpy(), (v + ssum) / (1 + cnt)
    )
    # isolated pixels smooth to themselves
    iso = out[out.nbr_cnt == 0]
    assert (iso["focal_mean"].to_numpy() == iso["v"].to_numpy()).all()


def test_hex_neighbor_ring_counts(ray_session):
    # a filled axial-coordinate hex patch: the center of ring-1 has all
    # 6 neighbors; axial "corner" cells of the patch have fewer
    cells = [(q, r) for q in range(-2, 3) for r in range(-2, 3)
             if abs(q + r) <= 2]  # hexagon of radius 2 in axial coords
    px = pd.DataFrame(
        {"ix": np.array([c[0] for c in cells], dtype=np.int64),
         "iy": np.array([c[1] for c in cells], dtype=np.int64),
         "v": np.ones(len(cells), dtype=np.int64)}
    )
    out = neighbor_stats(
        rd.from_pandas(px), "v", connectivity=6, tile=2, num_partitions=4
    ).to_pandas().set_index(["ix", "iy"])
    assert out.loc[(0, 0)].nbr_cnt == 6  # interior hex: full ring
    assert out.loc[(2, 0)].nbr_cnt == 3  # patch corner
    assert (out["nbr_cnt"] == out["nbr_sum"]).all()  # v ≡ 1


def test_neighbor_stats_validation(ray_session):
    px = _raster(seed=1, m=10)
    with pytest.raises(ValueError, match="connectivity"):
        neighbor_stats(rd.from_pandas(px), "v", connectivity=5)
    bad = pd.DataFrame(
        {"ix": np.array([1 << 31], dtype=np.int64),
         "iy": np.array([0], dtype=np.int64),
         "v": np.array([1], dtype=np.int64)}
    )
    with pytest.raises(Exception, match="2\\^31"):
        neighbor_stats(rd.from_pandas(bad), "v").to_pandas()


@pytest.mark.parametrize("connectivity", [4, 8])
def test_nbr_sumsq_and_local_geary_match_brute(ray_session, connectivity):
    px = _raster(seed=21)
    out = (
        local_moran(
            rd.from_pandas(px).repartition(3), "v",
            connectivity=connectivity, tile=16, num_partitions=8,
            with_geary=True,
        )
        .to_pandas()
        .sort_values(["ix", "iy"])
        .reset_index(drop=True)
    )
    want = px.sort_values(["ix", "iy"]).reset_index(drop=True)
    offs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if connectivity == 8:
        offs += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    vals = {(r.ix, r.iy): r.v for r in want.itertuples()}
    ssq, geary = [], []
    for r in want.itertuples():
        ns = [vals.get((r.ix + dx, r.iy + dy)) for dx, dy in offs]
        ns = [v for v in ns if v is not None]
        ssq.append(sum(int(v) ** 2 for v in ns))
        geary.append(sum((int(r.v) - int(v)) ** 2 for v in ns))
    assert (out["nbr_sumsq"].to_numpy() == np.array(ssq, dtype=np.int64)).all()
    assert (out["geary"].to_numpy() == np.array(geary, dtype=np.int64)).all()
    assert (out["geary"].to_numpy() >= 0).all()
    # constant raster: geary identically zero on every pixel
    const = px.copy()
    const["v"] = 7
    cz = local_moran(
        rd.from_pandas(const), "v", connectivity=connectivity, with_geary=True
    ).to_pandas()
    assert (cz["geary"].to_numpy() == 0).all()


def test_local_geary_overflow_guard(ray_session):
    # 10^9 passes the pre-existing 2^31 Σx² packing guard but exceeds
    # the 4-connectivity geary bound isqrt((2^63−1)/16) ≈ 7.59e8
    big = pd.DataFrame(
        {"ix": np.array([0, 1], dtype=np.int64),
         "iy": np.array([0, 0], dtype=np.int64),
         "v": np.array([10**9, 1], dtype=np.int64)}
    )
    with pytest.raises(Exception, match="exact int64 local Geary"):
        local_moran(rd.from_pandas(big), "v", with_geary=True).to_pandas()
    # without the geary request the same magnitude is fine
    ok = local_moran(rd.from_pandas(big), "v").to_pandas()
    assert len(ok) == 2


def test_gi_star_matches_dense_reference(ray_session):
    import math

    px = _raster(seed=11)
    out = (
        local_moran(rd.from_pandas(px), "v", num_partitions=8,
                    with_gi=True, terms_q=1 << 20)
        .to_pandas()
        .sort_values(["ix", "iy"])
        .reset_index(drop=True)
    )
    ref = px.sort_values(["ix", "iy"]).reset_index(drop=True)
    cnt, ssum = _brute_nbrs(ref, 4)
    n = len(ref)
    s = int(ref.v.sum())
    ssq = int((ref.v.astype(object) ** 2).sum())
    mean = s / n
    sd = math.sqrt(ssq / n - mean * mean)
    w = (1 + cnt).astype(np.float64)
    s1 = (ref.v.to_numpy() + ssum).astype(np.float64)
    want = (s1 - w * mean) / (
        sd * np.sqrt((float(n) * w - w * w) / (float(n) - 1.0))
    )
    np.testing.assert_array_equal(out["gi_star"].to_numpy(), want)
    # quantized global-Moran terms match the dense formula
    lisa = (ref.v.to_numpy() - mean) * (ssum - cnt * mean)
    np.testing.assert_array_equal(
        out["lisa_q"].to_numpy(), np.floor((1 << 20) * lisa).astype(np.int64)
    )


def test_global_moran_scalar_and_partition_invariance(ray_session):
    from rayraster.spatial import global_moran

    px = _raster(seed=13)
    outs = []
    for parts in (1, 7):
        terms = local_moran(
            rd.from_pandas(px).repartition(parts), "v",
            num_partitions=8, terms_q=1 << 20,
        )
        outs.append(global_moran(terms))
    assert outs[0] == outs[1]  # bit-identical across partitionings
    g = outs[0]
    assert g["w_tot"] > 0 and g["sum_z2_q"] > 0
    # smooth gradient raster → strong positive autocorrelation;
    # checkerboard → negative
    m = np.mgrid[0:12, 0:12].reshape(2, -1)
    grad = pd.DataFrame(
        {"ix": m[0], "iy": m[1], "v": (m[0] * 100).astype(np.int64)}
    )
    checker = pd.DataFrame(
        {"ix": m[0], "iy": m[1],
         "v": ((m[0] + m[1]) % 2 * 100).astype(np.int64)}
    )
    gi = global_moran(
        local_moran(rd.from_pandas(grad), "v", num_partitions=8,
                    terms_q=1 << 20)
    )
    ci = global_moran(
        local_moran(rd.from_pandas(checker), "v", num_partitions=8,
                    terms_q=1 << 20)
    )
    assert gi["moran_i"] > 0.5
    assert ci["moran_i"] < -0.5


# ---------------------------------------------------------------------------
# region labeling (clump)
# ---------------------------------------------------------------------------


def _clump_reference(cells: dict, offsets) -> dict:
    """Union-find clump on a {(ix,iy): val} dict; returns cell → lex-min
    member of its same-value region."""
    parent = {c: c for c in cells}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (a, b), v in cells.items():
        for dx, dy in offsets:
            nb = (a + dx, b + dy)
            if cells.get(nb) == v:
                ra, rb = find((a, b)), find(nb)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    return {c: find(c) for c in cells}


def _rand_raster(seed: int, shape=(30, 30), density=0.6, nvals=3):
    rng = np.random.default_rng(seed)
    mask = rng.random(shape) < density
    ix, iy = np.nonzero(mask)
    val = rng.integers(0, nvals, len(ix)).astype(np.int64)
    return pa.table(
        {"ix": pa.array(ix.astype(np.int64)), "iy": pa.array(iy.astype(np.int64)),
         "val": pa.array(val)}
    )


@pytest.mark.parametrize("connectivity,offs", [
    (4, [(-1, 0), (1, 0), (0, -1), (0, 1)]),
    (8, [(-1, 0), (1, 0), (0, -1), (0, 1), (-1, -1), (-1, 1), (1, -1), (1, 1)]),
    (6, [(1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)]),
])
def test_label_regions_matches_union_find(ray_session, connectivity, offs):
    from collections import Counter

    from rayraster.spatial import label_regions

    t = _rand_raster(17)
    cells = {
        (int(a), int(b)): int(v)
        for a, b, v in zip(t["ix"].to_pylist(), t["iy"].to_pylist(),
                           t["val"].to_pylist())
    }
    ref = _clump_reference(cells, offs)
    sizes = Counter(ref.values())
    out = label_regions(
        rd.from_arrow(t).repartition(4), "val",
        connectivity=connectivity, tile=8, num_partitions=8,
    ).to_pandas()
    assert len(out) == len(cells)
    for r in out.itertuples():
        c = (int(r.ix), int(r.iy))
        assert (r.region_ix, r.region_iy) == ref[c]
        assert r.region_n == sizes[ref[c]]


def test_label_regions_engines_agree_and_negative_coords(ray_session):
    from rayraster.spatial import label_regions

    t = _rand_raster(29, shape=(24, 24), density=0.7, nvals=2)
    # shift into negative coordinate territory: packing must stay
    # injective and the unpack must invert it
    ixs = pa.array(np.asarray(t["ix"].to_numpy(zero_copy_only=False)) - 12)
    iys = pa.array(np.asarray(t["iy"].to_numpy(zero_copy_only=False)) - 12)
    t = pa.table({"ix": ixs, "iy": iys, "val": t["val"]})
    kw = dict(connectivity=4, tile=8, num_partitions=8)
    a = (
        label_regions(rd.from_arrow(t), "val", engine="distributed", **kw)
        .to_pandas().sort_values(["ix", "iy"]).reset_index(drop=True)
    )
    b = (
        label_regions(rd.from_arrow(t), "val", engine="driver", **kw)
        .to_pandas()[a.columns].sort_values(["ix", "iy"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    with pytest.raises(ValueError, match="engine must be"):
        label_regions(rd.from_arrow(t), "val", engine="bogus")


def test_unpack_cell_key_roundtrip():
    from rayraster.spatial import _pack, unpack_cell_key

    rng = np.random.default_rng(3)
    ix = rng.integers(-(1 << 31) + 1, 1 << 31, 1000)
    iy = rng.integers(-(1 << 31) + 1, 1 << 31, 1000)
    rx, ry = unpack_cell_key(_pack(ix, iy))
    assert np.array_equal(rx, ix) and np.array_equal(ry, iy)


def test_region_edges_validations(ray_session):
    from rayraster.spatial import label_regions, region_edges

    t = pa.table({"ix": pa.array([0, 0], type=pa.int64()),
                  "iy": pa.array([0, 0], type=pa.int64()),
                  "val": pa.array([1, 1], type=pa.int64())})
    with pytest.raises(Exception, match="duplicate"):
        region_edges(rd.from_arrow(t), "val").to_pandas()
    tf = pa.table({"ix": pa.array([0], type=pa.int64()),
                   "iy": pa.array([0], type=pa.int64()),
                   "val": pa.array([1.0])})
    with pytest.raises(Exception, match="integer column"):
        region_edges(rd.from_arrow(tf), "val").to_pandas()
    with pytest.raises(ValueError, match="connectivity"):
        label_regions(rd.from_arrow(t), "val", connectivity=5)


# ---------------------------------------------------------------------------
# weighted focal convolution
# ---------------------------------------------------------------------------


def test_focal_convolve_matches_bruteforce_and_partition_invariant(ray_session):
    from rayraster.spatial import focal_convolve, gaussian_kernel_int

    rng = np.random.default_rng(9)
    mask = rng.random((40, 40)) < 0.5
    ix, iy = np.nonzero(mask)
    val = rng.integers(-50, 500, len(ix)).astype(np.int64)
    K = gaussian_kernel_int(2, 1.0)
    assert K[2, 2] == 100 and K[0, 0] == 2  # pinned quantization
    t = pa.table(
        {"ix": pa.array(ix.astype(np.int64)), "iy": pa.array(iy.astype(np.int64)),
         "v": pa.array(val)}
    )
    cells = {(int(a), int(b)): int(v) for a, b, v in zip(ix, iy, val)}
    R = 2
    outs = []
    for parts in (1, 6):
        out = (
            focal_convolve(rd.from_arrow(t).repartition(parts), "v", K,
                           tile=16, num_partitions=8)
            .to_pandas().sort_values(["ix", "iy"]).reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])  # partition-invariant
    out = outs[0]
    assert len(out) == len(cells)
    for r in out.sample(n=80, random_state=1).itertuples():
        cs = cw = 0
        for dx in range(-R, R + 1):
            for dy in range(-R, R + 1):
                w = int(K[dx + R, dy + R])
                nb = cells.get((r.ix + dx, r.iy + dy))
                if w and nb is not None:
                    cs += w * nb
                    cw += w
        assert (r.conv_sum, r.conv_wt) == (cs, cw)


def test_focal_convolve_validations(ray_session):
    from rayraster.spatial import focal_convolve, gaussian_kernel_int

    t = pa.table({"ix": pa.array([0], type=pa.int64()),
                  "iy": pa.array([0], type=pa.int64()),
                  "v": pa.array([1], type=pa.int64())})
    ds = rd.from_arrow(t)
    with pytest.raises(TypeError, match="integer"):
        focal_convolve(ds, "v", np.ones((3, 3)))  # float kernel
    with pytest.raises(ValueError, match="odd-sided"):
        focal_convolve(ds, "v", np.ones((2, 2), np.int64))
    with pytest.raises(ValueError, match="radius"):
        focal_convolve(ds, "v", np.ones((9, 9), np.int64), tile=4)
    dup = pa.table({"ix": pa.array([0, 0], type=pa.int64()),
                    "iy": pa.array([0, 0], type=pa.int64()),
                    "v": pa.array([1, 1], type=pa.int64())})
    with pytest.raises(Exception, match="duplicate"):
        focal_convolve(rd.from_arrow(dup), "v",
                       gaussian_kernel_int(1, 1.0)).to_pandas()
    big = pa.table({"ix": pa.array([0], type=pa.int64()),
                    "iy": pa.array([0], type=pa.int64()),
                    "v": pa.array([1 << 55], type=pa.int64())})
    with pytest.raises(Exception, match="overflow"):
        focal_convolve(rd.from_arrow(big), "v",
                       gaussian_kernel_int(1, 1.0)).to_pandas()


def test_focal_convolve_center_only_kernel_equals_value(ray_session):
    from rayraster.spatial import focal_convolve

    t = pa.table({"ix": pa.array([0, 5], type=pa.int64()),
                  "iy": pa.array([0, 5], type=pa.int64()),
                  "v": pa.array([7, -3], type=pa.int64())})
    K = np.zeros((3, 3), np.int64)
    K[1, 1] = 10
    out = (
        focal_convolve(rd.from_arrow(t), "v", K)
        .to_pandas().sort_values("ix").reset_index(drop=True)
    )
    assert out.conv_sum.tolist() == [70, -30]
    assert out.conv_wt.tolist() == [10, 10]


@pytest.mark.parametrize("engine", ["distributed", "driver"])
def test_label_regions_zonal_sums(ray_session, engine):
    from collections import defaultdict

    from rayraster.spatial import label_regions

    t = _rand_raster(41, shape=(20, 20), density=0.65, nvals=2)
    rng = np.random.default_rng(2)
    w = rng.integers(1, 100, t.num_rows).astype(np.int64)
    t = t.append_column("w", pa.array(w))
    cells = {
        (int(a), int(b)): int(v)
        for a, b, v in zip(t["ix"].to_pylist(), t["iy"].to_pylist(),
                           t["val"].to_pylist())
    }
    wmap = dict(zip(cells.keys(), w.tolist()))
    ref = _clump_reference(cells, [(-1, 0), (1, 0), (0, -1), (0, 1)])
    zonal = defaultdict(int)
    for c, lab in ref.items():
        zonal[lab] += wmap[c]
    out = label_regions(
        rd.from_arrow(t), "val", connectivity=4, tile=8, num_partitions=8,
        sum_cols=("w",), engine=engine,
    ).to_pandas()
    assert len(out) == len(cells)
    for r in out.itertuples():
        lab = ref[(int(r.ix), int(r.iy))]
        assert (r.region_ix, r.region_iy) == lab
        assert r.sum_w == zonal[lab]


def test_focal_convolve_multi_kernel_single_pass(ray_session):
    from rayraster.spatial import focal_convolve, gaussian_kernel_int, sobel_kernels_int

    t = _rand_raster(51, shape=(25, 25), density=0.6, nvals=1)
    rng = np.random.default_rng(4)
    v = rng.integers(0, 300, t.num_rows).astype(np.int64)
    t = pa.table({"ix": t["ix"], "iy": t["iy"], "v": pa.array(v)})
    kmap = {"g": gaussian_kernel_int(2, 1.0), **sobel_kernels_int()}
    multi = (
        focal_convolve(rd.from_arrow(t), "v", kmap, tile=8, num_partitions=8)
        .to_pandas().sort_values(["ix", "iy"]).reset_index(drop=True)
    )
    # multi-kernel single exchange ≡ one call per kernel
    for name, k in kmap.items():
        single = (
            focal_convolve(rd.from_arrow(t), "v", k, tile=8,
                           num_partitions=8, out_prefix=name)
            .to_pandas().sort_values(["ix", "iy"]).reset_index(drop=True)
        )
        assert multi[f"{name}_sum"].tolist() == single[f"{name}_sum"].tolist()
        assert multi[f"{name}_wt"].tolist() == single[f"{name}_wt"].tolist()
    # Sobel antisymmetry: a constant raster has zero gradient everywhere
    const = pa.table({"ix": t["ix"], "iy": t["iy"],
                      "v": pa.array(np.full(t.num_rows, 7, np.int64))})
    g = focal_convolve(rd.from_arrow(const), "v", sobel_kernels_int(),
                       tile=8, num_partitions=8).to_pandas()
    interior = g[(g.gx_wt == 0) & (g.gy_wt == 0)]  # full-window pixels
    assert (interior.gx_sum == 0).all() and (interior.gy_sum == 0).all()
    # gradient of a linear ramp v = 10·ix on a DENSE block: gx = 80, gy = 0
    m = np.mgrid[0:9, 0:9].reshape(2, -1)
    ramp = pa.table({"ix": pa.array(m[0].astype(np.int64)),
                     "iy": pa.array(m[1].astype(np.int64)),
                     "v": pa.array((m[0] * 10).astype(np.int64))})
    gr = focal_convolve(rd.from_arrow(ramp), "v", sobel_kernels_int(),
                        tile=8, num_partitions=8).to_pandas()
    inner = gr[(gr.ix > 0) & (gr.ix < 8) & (gr.iy > 0) & (gr.iy < 8)]
    assert (inner.gx_sum == 80).all() and (inner.gy_sum == 0).all()
    with pytest.raises(ValueError, match="at least one kernel"):
        focal_convolve(rd.from_arrow(t), "v", {})


@pytest.mark.parametrize("connectivity,offs", [
    (4, [(-1, 0), (1, 0), (0, -1), (0, 1)]),
    (6, [(1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)]),
])
def test_zonal_perimeter_matches_brute(ray_session, connectivity, offs):
    from collections import Counter, defaultdict

    from rayraster.spatial import label_regions, zonal_perimeter

    t = _rand_raster(23, shape=(26, 26), density=0.55, nvals=2)
    cells = {
        (int(a), int(b)): int(v)
        for a, b, v in zip(t["ix"].to_pylist(), t["iy"].to_pylist(),
                           t["val"].to_pylist())
    }
    ref = _clump_reference(cells, offs)
    sizes = Counter(ref.values())
    perim = defaultdict(int)
    pairs = defaultdict(int)
    for c, v in cells.items():
        for dx, dy in offs:
            nb = (c[0] + dx, c[1] + dy)
            if cells.get(nb) == v:
                pairs[ref[c]] += 1  # counted from both ends → /2 below
            else:
                perim[ref[c]] += 1
    labeled = label_regions(
        rd.from_arrow(t).repartition(4), "val",
        connectivity=connectivity, tile=8, num_partitions=8,
    ).materialize()
    out = zonal_perimeter(
        labeled, "val", connectivity=connectivity, tile=8, num_partitions=8,
    ).to_pandas()
    assert len(out) == len(sizes)
    for r in out.itertuples():
        key = (int(r.region_ix), int(r.region_iy))
        assert r.perimeter == perim[key]
        assert r.adj_pairs == pairs[key] // 2
        assert r.region_n == sizes[key]
        assert r.val == cells[key]
        # identity: faces·n == perimeter + 2·adj_pairs
        assert len(offs) * r.region_n == r.perimeter + 2 * r.adj_pairs


def test_zonal_perimeter_single_cells_and_tile_invariance(ray_session):
    from rayraster.spatial import label_regions, zonal_perimeter

    # isolated pixels: perimeter = 4 each, no pairs
    t = pa.table(
        {"ix": pa.array([0, 5, 10], type=pa.int64()),
         "iy": pa.array([0, 5, 10], type=pa.int64()),
         "val": pa.array([1, 1, 1], type=pa.int64())}
    )
    labeled = label_regions(rd.from_arrow(t), "val", tile=8).materialize()
    out = zonal_perimeter(labeled, "val", tile=8).to_pandas()
    assert (out.perimeter == 4).all() and (out.adj_pairs == 0).all()

    # tile-size invariance on a random raster
    t = _rand_raster(31, shape=(20, 20), density=0.7, nvals=2)
    labeled = label_regions(rd.from_arrow(t), "val", tile=64).materialize()
    a = (zonal_perimeter(labeled, "val", tile=4, num_partitions=16)
         .to_pandas().sort_values(["region_ix", "region_iy"])
         .reset_index(drop=True))
    b = (zonal_perimeter(labeled, "val", tile=512, num_partitions=2)
         .to_pandas()[a.columns].sort_values(["region_ix", "region_iy"])
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)

    with pytest.raises(ValueError, match="connectivity"):
        zonal_perimeter(labeled, "val", connectivity=5)


def test_hillshade_matches_trig_reference_and_flat_convention(ray_session):
    import math

    from rayraster.spatial import hillshade

    rng = np.random.default_rng(41)
    gx = rng.integers(-4000, 4000, 500).astype(np.int64)
    gy = rng.integers(-4000, 4000, 500).astype(np.int64)
    gx[:5] = 0
    gy[:5] = 0  # flat cells
    ds = rd.from_arrow(pa.table({"gx_sum": pa.array(gx), "gy_sum": pa.array(gy)}))
    out = hillshade(ds, cellsize=2.0, z_factor=3.0, azimuth_deg=300.0,
                    altitude_deg=40.0).to_pandas()
    # straight-trig Horn reference
    zen = math.radians(50.0)
    az = math.radians(300.0)
    dx = gx / 16.0
    dy = gy / 16.0
    slope = np.arctan(3.0 * np.hypot(dx, dy))
    aspect = np.arctan2(dy, -dx)
    ref = 255.0 * (np.cos(zen) * np.cos(slope)
                   + np.sin(zen) * np.sin(slope) * np.cos(az - aspect))
    ref = np.maximum(ref, 0.0)
    ref[:5] = 255.0 * math.cos(zen)  # flat convention
    assert np.allclose(out.shade.to_numpy(), ref, atol=1e-9)
    assert (out.shade >= 0).all() and (out.shade <= 255.0 + 1e-9).all()


def test_hillshade_sql_twin_is_bit_exact(ray_session):
    import duckdb

    from rayraster.spatial import hillshade, hillshade_sql

    rng = np.random.default_rng(43)
    gx = rng.integers(-100000, 100000, 4000).astype(np.int64)
    gy = rng.integers(-100000, 100000, 4000).astype(np.int64)
    gx[::97] = 0
    gy[::97] = 0
    t = pa.table({"gx_sum": pa.array(gx), "gy_sum": pa.array(gy)})
    mine = hillshade(rd.from_arrow(t)).to_pandas().shade.to_numpy()
    con = duckdb.connect()
    con.register("g", t)
    theirs = con.sql(
        f"SELECT {hillshade_sql('gx_sum', 'gy_sum')} AS shade FROM g"
    ).df().shade.to_numpy()
    assert np.array_equal(mine.view(np.int64), theirs.view(np.int64))


# ---------------------------------------------------------------------------
# IDW interpolation
# ---------------------------------------------------------------------------


def _idw_brute(x, y, v, x0, y0, res, rad, scale=1e6, cap=1e9):
    """Driver-side reference: full cross product of points × candidate
    cells, no fan-out shortcut."""
    out = {}
    rad2 = rad * rad
    ring = 5  # generous
    for xi, yi, vi in zip(x, y, v):
        ix = int(max(np.ceil((xi - x0) / res) - 1.0, 0.0))
        iy = int(max(np.ceil((yi - y0) / res) - 1.0, 0.0))
        for dx in range(-ring, ring + 1):
            for dy in range(-ring, ring + 1):
                tix, tiy = ix + dx, iy + dy
                tcx = x0 + (float(tix) + 0.5) * res
                tcy = y0 + (float(tiy) + 0.5) * res
                ddx = xi - tcx
                ddy = yi - tcy
                d2 = ddx * ddx + ddy * ddy
                if d2 <= rad2:
                    w = cap if d2 < 1e-12 else min(np.floor(scale / d2), cap)
                    wv, ws, n = out.get((tix, tiy), (0, 0, 0))
                    out[(tix, tiy)] = (wv + int(w) * int(vi), ws + int(w), n + 1)
    return out


def test_idw_matches_brute_and_reaches_empty_cells(ray_session):
    from rayraster.spatial import idw_interpolate

    rng = np.random.default_rng(11)
    n = 300
    x = rng.uniform(0, 200, n)
    y = rng.uniform(0, 200, n)
    v = rng.integers(1, 500, n).astype(np.int64)
    x0, y0, res = -3.0, -7.0, 20.0
    pts = rd.from_arrow(pa.table({"x": x, "y": y, "val": v}))
    got = (
        idw_interpolate(pts, x0, y0, res, "val", num_partitions=4)
        .to_pandas()
        .set_index(["ix", "iy"])
        .sort_index()
    )
    ref = _idw_brute(x, y, v, x0, y0, res, 1.45 * res)
    assert set(got.index) == set(ref)
    for (ix, iy), (wv, ws, cnt) in ref.items():
        row = got.loc[(ix, iy)]
        assert int(row.sum_wv) == wv and int(row.sum_w) == ws and int(row.n) == cnt
        assert row.idw == wv / ws
    # interpolation must reach at least one cell no point falls in
    occupied = set()
    for xi, yi in zip(x, y):
        occupied.add(
            (int(max(np.ceil((xi - x0) / res) - 1.0, 0.0)),
             int(max(np.ceil((yi - y0) / res) - 1.0, 0.0)))
        )
    assert set(got.index) - occupied


def test_idw_sql_twin_is_bit_exact(ray_session):
    import duckdb

    from rayraster.spatial import idw_interpolate, idw_sql

    rng = np.random.default_rng(23)
    n = 500
    x = rng.uniform(-50, 150, n)
    y = rng.uniform(0, 90, n)
    v = rng.integers(1, 1000, n).astype(np.int64)
    x0, y0, res = -61.0, -11.0, 25.0
    pts = rd.from_arrow(pa.table({"x": x, "y": y, "val": v}))
    got = (
        idw_interpolate(pts, x0, y0, res, "val", radius=2.2 * res, num_partitions=4)
        .to_pandas()
        .sort_values(["ix", "iy"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("raw", pa.table({"x": x, "y": y, "val": v}))
    cte = f"""(SELECT x, y, val, {x0!r} AS x0, {y0!r} AS y0,
      CAST(greatest(ceiling((x - ({x0!r})) / {res!r}) - 1, 0) AS BIGINT) AS ix,
      CAST(greatest(ceiling((y - ({y0!r})) / {res!r}) - 1, 0) AS BIGINT) AS iy
      FROM raw)"""
    want = con.execute(
        idw_sql(cte, res, "p.val", radius=2.2 * res) + " ORDER BY ix, iy"
    ).df()
    assert len(got) == len(want)
    for c in ("ix", "iy", "n", "sum_wv", "sum_w"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    for c in ("cx", "cy", "idw"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_idw_ring_bound():
    from rayraster.spatial import _idw_ring

    assert _idw_ring(1.45 * 30.0, 30.0) == 1
    assert _idw_ring(30.0, 30.0) == 1
    assert _idw_ring(2.0 * 30.0, 30.0) == 2
    assert _idw_ring(2.6 * 30.0, 30.0) == 3


def _kde_brute(x, y, x0, y0, res, h, scale=1_000_000.0, v=None):
    ring = int(np.ceil(h / res + 0.5))
    h2 = h * h
    out = {}
    for i, (xi, yi) in enumerate(zip(x, y)):
        ix = int(max(np.ceil((xi - x0) / res) - 1.0, 0.0))
        iy = int(max(np.ceil((yi - y0) / res) - 1.0, 0.0))
        for dx in range(-ring, ring + 1):
            for dy in range(-ring, ring + 1):
                tix, tiy = ix + dx, iy + dy
                tcx = x0 + (np.float64(tix) + 0.5) * res
                tcy = y0 + (np.float64(tiy) + 0.5) * res
                ddx, ddy = xi - tcx, yi - tcy
                d2 = ddx * ddx + ddy * ddy
                if d2 < h2:
                    w = int(np.floor(scale * (1.0 - d2 / h2)))
                    ws, wv, n = out.get((tix, tiy), (0, 0, 0))
                    vv = int(v[i]) if v is not None else 0
                    out[(tix, tiy)] = (ws + w, wv + w * vv, n + 1)
    return out


def test_kde_matches_brute_and_weighted(ray_session):
    from rayraster.spatial import kde_surface

    rng = np.random.default_rng(41)
    n = 300
    x = rng.uniform(0, 200, n)
    y = rng.uniform(0, 200, n)
    v = rng.integers(1, 500, n).astype(np.int64)
    x0, y0, res = -3.0, -7.0, 20.0
    pts = rd.from_arrow(pa.table({"x": x, "y": y, "val": v}))
    ref = _kde_brute(x, y, x0, y0, res, 2.0 * res, v=v)
    got = (
        kde_surface(pts, x0, y0, res, num_partitions=4)
        .to_pandas().set_index(["ix", "iy"]).sort_index()
    )
    assert set(got.index) == set(ref)
    for (ix, iy), (ws, _, cnt) in ref.items():
        row = got.loc[(ix, iy)]
        assert int(row.sum_w) == ws and int(row.n) == cnt
        assert row.density == ws / 1_000_000.0
    gotw = (
        kde_surface(pts, x0, y0, res, value_col="val", num_partitions=4)
        .to_pandas().set_index(["ix", "iy"]).sort_index()
    )
    for (ix, iy), (ws, wv, cnt) in ref.items():
        row = gotw.loc[(ix, iy)]
        assert int(row.sum_w) == ws and int(row.sum_wv) == wv


def test_kde_sql_twin_is_bit_exact(ray_session):
    import duckdb

    from rayraster.spatial import kde_sql, kde_surface

    rng = np.random.default_rng(43)
    n = 400
    x = rng.uniform(-50, 150, n)
    y = rng.uniform(0, 90, n)
    x0, y0, res = -61.0, -11.0, 25.0
    pts = rd.from_arrow(pa.table({"x": x, "y": y}))
    got = (
        kde_surface(pts, x0, y0, res, bandwidth=1.7 * res, num_partitions=4)
        .to_pandas().sort_values(["ix", "iy"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("raw", pa.table({"x": x, "y": y}))
    cte = f"""(SELECT x, y, {x0!r} AS x0, {y0!r} AS y0,
      CAST(greatest(ceiling((x - ({x0!r})) / {res!r}) - 1, 0) AS BIGINT) AS ix,
      CAST(greatest(ceiling((y - ({y0!r})) / {res!r}) - 1, 0) AS BIGINT) AS iy
      FROM raw)"""
    want = con.execute(
        kde_sql(cte, res, bandwidth=1.7 * res) + " ORDER BY ix, iy"
    ).df()
    assert len(got) == len(want)
    for c in ("ix", "iy", "n", "sum_w"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    for c in ("cx", "cy", "density"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


# ---------------------------------------------------------------------------
# D8 flow routing
# ---------------------------------------------------------------------------


def _flow_brute(px: pd.DataFrame):
    """Reference D8 direction + converged accumulation."""
    from rayraster.spatial import FLOW_OFFSETS

    vals = {(r.ix, r.iy): r.v for r in px.itertuples()}
    down = {}
    for r in px.itertuples():
        best, bd = None, 0
        for dx, dy in FLOW_OFFSETS:
            q = (r.ix + dx, r.iy + dy)
            if q in vals and vals[q] < r.v and r.v - vals[q] > bd:
                best, bd = q, r.v - vals[q]
        down[(r.ix, r.iy)] = best
    acc = {k: 1 for k in vals}
    changed = True
    while changed:
        changed = False
        new = {k: 1 for k in vals}
        for k, d in down.items():
            if d is not None:
                new[d] = new.get(d, 1)
        new = {k: 1 for k in vals}
        for k in vals:
            s = 1
            for j, d in down.items():
                if d == k:
                    s += acc[j]
            new[k] = s
        if new != acc:
            acc = new
            changed = True
    return down, acc


def test_flow_direction_and_accumulation_match_brute(ray_session):
    from rayraster.spatial import flow_accumulation, flow_direction

    px = _raster(seed=17, m=250, span=12)  # dense small DEM
    ds = rd.from_pandas(px)
    flows = flow_direction(ds, "v", num_partitions=4).materialize()
    fdf = flows.to_pandas()
    down, acc = _flow_brute(px)
    assert len(fdf) == len(px)
    for r in fdf.itertuples():
        want = down[(r.ix, r.iy)]
        if want is None:
            assert not r.has_down and (r.down_ix, r.down_iy) == (r.ix, r.iy)
        else:
            assert r.has_down and (r.down_ix, r.down_iy) == want
    got = (
        flow_accumulation(flows, rounds=64, num_partitions=4,
                          node_count=len(px))
        .to_pandas()
    )
    gmap = {(r.ix, r.iy): r.acc for r in got.itertuples()}
    assert gmap == acc


def test_flow_direction_tiebreak_first_offset(ray_session):
    from rayraster.spatial import flow_direction

    # center 10 with two equal drops to (-1,0) and (1,0): ord 0 wins
    px = pd.DataFrame(
        {"ix": [0, -1, 1], "iy": [0, 0, 0], "v": [10, 4, 4]}
    )
    out = flow_direction(rd.from_pandas(px), "v", num_partitions=2).to_pandas()
    c = out[(out.ix == 0) & (out.iy == 0)].iloc[0]
    assert c.has_down and (c.down_ix, c.down_iy) == (-1, 0)


def test_flow_accumulation_engines_agree_unconverged_rounds(ray_session):
    from rayraster.spatial import flow_accumulation, flow_direction

    px = _raster(seed=29, m=300, span=14)
    flows = flow_direction(rd.from_pandas(px), "v", num_partitions=4).materialize()
    for rounds in (2, 5):
        small = (
            flow_accumulation(flows, rounds=rounds, node_count=len(px))
            .to_pandas().sort_values(["ix", "iy"]).reset_index(drop=True)
        )
        big = (
            flow_accumulation(flows, rounds=rounds, num_partitions=4,
                              node_count=None)
            .to_pandas().sort_values(["ix", "iy"]).reset_index(drop=True)
        )
        assert small.equals(big)


def _basin_brute(px: pd.DataFrame, down: dict, steps: int):
    """Follow down pointers exactly ``steps`` times (self at pits)."""
    out = {}
    for r in px.itertuples():
        cur = (r.ix, r.iy)
        for _ in range(steps):
            nxt = down[cur]
            cur = nxt if nxt is not None else cur
        out[(r.ix, r.iy)] = cur
    return out


def test_basin_labels_converged_matches_brute(ray_session):
    from rayraster.spatial import basin_labels, flow_direction

    px = _raster(seed=31, m=250, span=12)
    flows = flow_direction(rd.from_pandas(px), "v", num_partitions=4).materialize()
    down, _ = _flow_brute(px)
    # 2^10 = 1024 steps >> any path in a 25x25 raster: converged
    got = basin_labels(flows, doublings=10, node_count=len(px)).to_pandas()
    want = _basin_brute(px, down, 1024)
    assert len(got) == len(px)
    for r in got.itertuples():
        assert (r.basin_ix, r.basin_iy) == want[(r.ix, r.iy)]
        # fixpoint really is a pit/outlet
        assert down[(r.basin_ix, r.basin_iy)] is None


def test_basin_labels_engines_agree_unconverged(ray_session):
    from rayraster.spatial import basin_labels, flow_direction

    px = _raster(seed=37, m=300, span=14)
    flows = flow_direction(rd.from_pandas(px), "v", num_partitions=4).materialize()
    down, _ = _flow_brute(px)
    for doublings in (0, 1, 2):
        small = (
            basin_labels(flows, doublings=doublings, node_count=len(px))
            .to_pandas().sort_values(["ix", "iy"]).reset_index(drop=True)
        )
        big = (
            basin_labels(flows, doublings=doublings, num_partitions=4,
                         node_count=None)
            .to_pandas().sort_values(["ix", "iy"]).reset_index(drop=True)
        )
        assert small.equals(big)
        want = _basin_brute(px, down, 2 ** doublings)
        for r in small.itertuples():
            assert (r.basin_ix, r.basin_iy) == want[(r.ix, r.iy)]


def _cost_brute(px: pd.DataFrame, src: set, rounds: int):
    """Synchronous min-plus reference."""
    from rayraster.spatial import FLOW_OFFSETS

    cost = {(r.ix, r.iy): r.v for r in px.itertuples()}
    INF = float("inf")
    dist = {k: (0 if k in src else INF) for k in cost}
    for _ in range(rounds):
        new = dict(dist)
        for p in cost:
            for dx, dy in FLOW_OFFSETS:
                q = (p[0] + dx, p[1] + dy)
                if q in dist and dist[q] + cost[p] < new[p]:
                    new[p] = dist[q] + cost[p]
        dist = new
    return {k: v for k, v in dist.items() if v < INF}


def test_cost_distance_matches_brute_and_converges(ray_session):
    from rayraster.spatial import cost_distance, flow_direction

    px = _raster(seed=47, m=250, span=12)
    ds = rd.from_pandas(px)
    # sources = the D8 pits of the same raster (the query-arm shape)
    fd = flow_direction(ds, "v", num_partitions=4).materialize()
    pits = fd.map_batches(
        lambda t: t.filter(pa.compute.invert(t["has_down"])).select(["ix", "iy"]),
        batch_format="pyarrow",
    )
    src = set(
        map(tuple, fd.to_pandas().query("~has_down")[["ix", "iy"]].to_numpy())
    )
    got = cost_distance(
        ds, pits, rounds=64, cost_col="v", node_count=len(px)
    ).to_pandas()
    want = _cost_brute(px, src, 64)
    assert {(r.ix, r.iy): r.dist for r in got.itertuples()} == want
    # sources are at distance 0, everything else > 0 (costs >= 0)
    for s in src:
        assert want[s] == 0


def test_cost_distance_engines_agree_unconverged(ray_session):
    from rayraster.spatial import cost_distance, flow_direction

    px = _raster(seed=53, m=300, span=14)
    ds = rd.from_pandas(px)
    fd = flow_direction(ds, "v", num_partitions=4).materialize()
    pits = fd.map_batches(
        lambda t: t.filter(pa.compute.invert(t["has_down"])).select(["ix", "iy"]),
        batch_format="pyarrow",
    ).materialize()
    src = set(
        map(tuple, fd.to_pandas().query("~has_down")[["ix", "iy"]].to_numpy())
    )
    for rounds in (0, 1, 3):
        small = (
            cost_distance(ds, pits, rounds=rounds, cost_col="v",
                          node_count=len(px))
            .to_pandas().sort_values(["ix", "iy"]).reset_index(drop=True)
        )
        big = (
            cost_distance(ds, pits, rounds=rounds, cost_col="v",
                          num_partitions=4, node_count=None)
            .to_pandas().sort_values(["ix", "iy"]).reset_index(drop=True)
        )
        assert small.equals(big), rounds
        want = _cost_brute(px, src, rounds)
        assert {(r.ix, r.iy): r.dist for r in small.itertuples()} == want


def test_cost_distance_validations(ray_session):
    from rayraster.spatial import cost_distance

    px = pd.DataFrame({"ix": [0, 1], "iy": [0, 0], "v": [1, -2]})
    srcs = rd.from_pandas(px[["ix", "iy"]].iloc[:1])
    with pytest.raises(ValueError, match="rounds"):
        cost_distance(rd.from_pandas(px), srcs, rounds=-1, cost_col="v",
                      node_count=2)
    with pytest.raises(Exception, match="non-negative"):
        cost_distance(rd.from_pandas(px), srcs, rounds=1, cost_col="v",
                      node_count=2).to_pandas()
    bad = rd.from_pandas(pd.DataFrame({"ix": [9], "iy": [9]}))
    ok = pd.DataFrame({"ix": [0, 1], "iy": [0, 0], "v": [1, 2]})
    with pytest.raises(Exception, match="not an occupied"):
        cost_distance(rd.from_pandas(ok), bad, rounds=1, cost_col="v",
                      node_count=2).to_pandas()


def test_basin_labels_validation(ray_session):
    from rayraster.spatial import basin_labels, flow_direction

    px = _raster(seed=31, m=50, span=6)
    flows = flow_direction(rd.from_pandas(px), "v", num_partitions=2)
    with pytest.raises(ValueError, match="doublings"):
        basin_labels(flows, doublings=-1, node_count=len(px))


# ---------------------------------------------------------------------------
# Marching squares
# ---------------------------------------------------------------------------


def test_contour_cases_matches_sql_twin(ray_session):
    import duckdb

    from rayraster.spatial import contour_cases, contour_sql

    px = _raster(seed=41, m=500, span=20).rename(columns={"v": "val"})
    got = (
        contour_cases(rd.from_pandas(px), "val", threshold=400,
                      num_partitions=4)
        .to_pandas()
        .sort_values(["ix", "iy"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("px", pa.Table.from_pandas(px))
    want = con.execute(
        contour_sql("px", "val", 400) + " ORDER BY ix, iy"
    ).df()
    assert len(got) == len(want) > 0
    for c in ("ix", "iy", "case", "ncross", "v00"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    assert (got["tsum"].to_numpy() == want["tsum"].to_numpy()).all()


def test_contour_cases_known_block(ray_session):
    from rayraster.spatial import contour_cases

    # single pixel above threshold, all neighbors missing: case 1
    # (only b0), two crossings (bottom t=(1-5)/(0-5)=0.8, left same)
    px = pd.DataFrame({"ix": [0], "iy": [0], "v": [5]})
    out = contour_cases(rd.from_pandas(px), "v", threshold=1,
                        num_partitions=2).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["case"], r.ncross) == (1, 2)
    assert r.tsum == 0.8 + 0.8
    # saddle: diagonal above → case 5 (b0 + b2), 4 crossings
    px2 = pd.DataFrame(
        {"ix": [0, 1, 0, 1], "iy": [0, 0, 1, 1], "v": [9, 1, 1, 9]}
    )
    out2 = contour_cases(rd.from_pandas(px2), "v", threshold=4,
                         num_partitions=2).to_pandas()
    blk = out2[(out2.ix == 0) & (out2.iy == 0)].iloc[0]
    assert (blk["case"], blk.ncross) == (1 + 4, 4)


def test_contour_segments_known_block_and_loop_closure(ray_session):
    from rayraster.spatial import contour_segments

    # single super-threshold cell at (5,5), value 10, T=4: four blocks
    # carry one segment each and they chain into ONE closed loop
    px = pd.DataFrame(
        {"ix": [5, 4, 6, 5, 5], "iy": [5, 5, 5, 4, 6],
         "v": [10, 2, 2, 2, 2]}
    )
    segs = contour_segments(
        rd.from_pandas(px), "v", 4, x0=0.0, y0=0.0, res=10.0,
        num_partitions=2,
    ).to_pandas()
    # every crossing endpoint appears exactly twice (closed loops)
    pts = list(map(tuple, segs[["x1", "y1"]].to_numpy())) + list(
        map(tuple, segs[["x2", "y2"]].to_numpy())
    )
    from collections import Counter

    deg = Counter(pts)
    assert all(c == 2 for c in deg.values()), deg
    # the block anchored at the hot cell is case 1 (only v00 above):
    # segment from left edge to bottom edge, t = (4-10)/(2-10) = 0.75
    b = segs[(segs.ix == 5) & (segs.iy == 5)]
    assert len(b) == 1
    r = b.iloc[0]
    assert {(r.x1, r.y1), (r.x2, r.y2)} == {(55.0, 55.0 + 7.5), (55.0 + 7.5, 55.0)}


def test_contour_segments_counts_match_cases(ray_session):
    from rayraster.spatial import contour_cases, contour_segments

    px = _raster(seed=67, m=400, span=16)
    ds = rd.from_pandas(px)
    cases = contour_cases(ds, "v", 500, num_partitions=4).to_pandas()
    segs = contour_segments(
        rd.from_pandas(px), "v", 500, x0=-1.0, y0=-2.0, res=5.0,
        num_partitions=4,
    ).to_pandas()
    # segments per block = ncross / 2 on every occupied-anchor block
    # (contour_segments additionally covers empty-anchor blocks so
    # loops close — those are absent from contour_cases by design)
    want = (cases.set_index(["ix", "iy"]).ncross // 2).sort_index()
    got = segs.groupby(["ix", "iy"]).size()
    assert got.loc[want.index].equals(want.astype(np.int64))
    # closed loops globally (background-bounded regions)
    from collections import Counter

    pts = list(map(tuple, segs[["x1", "y1"]].to_numpy())) + list(
        map(tuple, segs[["x2", "y2"]].to_numpy())
    )
    deg = Counter(pts)
    assert all(c == 2 for c in deg.values())


def _mode_brute(px: pd.DataFrame, connectivity=8):
    from collections import Counter

    offs = {8: [(-1, 0), (1, 0), (0, -1), (0, 1),
                (-1, -1), (-1, 1), (1, -1), (1, 1)],
            4: [(-1, 0), (1, 0), (0, -1), (0, 1)]}[connectivity]
    vals = {(r.ix, r.iy): r.v for r in px.itertuples()}
    out = {}
    for r in px.itertuples():
        window = [r.v] + [
            vals[(r.ix + dx, r.iy + dy)]
            for dx, dy in offs if (r.ix + dx, r.iy + dy) in vals
        ]
        c = Counter(window)
        m = max(c.values())
        out[(r.ix, r.iy)] = (min(v for v, k in c.items() if k == m),
                             len(window))
    return out


@pytest.mark.parametrize("connectivity", [4, 8])
def test_focal_mode_matches_brute(ray_session, connectivity):
    from rayraster.spatial import focal_mode

    rng = np.random.default_rng(101)
    px = _raster(seed=101, m=400, span=14)
    px["v"] = rng.integers(0, 5, len(px)).astype(np.int64)  # categorical
    got = focal_mode(
        rd.from_pandas(px).repartition(3), "v",
        connectivity=connectivity, tile=8, num_partitions=8,
    ).to_pandas()
    want = _mode_brute(px, connectivity)
    assert len(got) == len(px)
    for r in got.itertuples():
        assert (r.mode, r.n_present) == want[(r.ix, r.iy)]


def test_focal_mode_tie_breaks_to_smallest_and_validation(ray_session):
    from rayraster.spatial import focal_mode

    # 2 and 7 each appear twice in the window of (0,0): smallest wins
    px = pd.DataFrame(
        {"ix": [0, 1, 0, 1], "iy": [0, 0, 1, 1],
         "v": np.array([7, 2, 2, 7], dtype=np.int64)}
    )
    out = focal_mode(rd.from_pandas(px), "v", num_partitions=2).to_pandas()
    assert (out["mode"] == 2).all()
    with pytest.raises(ValueError, match="connectivity"):
        focal_mode(rd.from_pandas(px), "v", connectivity=5)


def test_zonal_mode_matches_brute_and_composes(ray_session):
    from rayraster.spatial import label_regions, zonal_mode

    rng = np.random.default_rng(103)
    # blobs of constant REGION value + an independent categorical attr
    g = np.mgrid[0:12, 0:12].reshape(2, -1)
    ix, iy = g[0].astype(np.int64), g[1].astype(np.int64)
    region_val = (ix // 4).astype(np.int64)  # three vertical bands
    attr = rng.integers(0, 3, len(ix)).astype(np.int64)
    px = pd.DataFrame({"ix": ix, "iy": iy, "v": region_val, "a": attr})
    labeled = label_regions(
        rd.from_pandas(px), "v", num_partitions=4, with_size=False
    )
    got = (
        zonal_mode(labeled, "a", num_partitions=4)
        .to_pandas().set_index(["region_ix", "region_iy"]).sort_index()
    )
    ref = px.copy()
    ref["region"] = ref.ix // 4
    want = {}
    for reg, grp in ref.groupby("region"):
        c = grp.a.value_counts()
        m = c.max()
        want[(4 * reg, 0)] = (min(v for v, k in c.items() if k == m), m)
    assert len(got) == 3
    for (rix, riy), r in got.iterrows():
        assert (r["mode"], r.mode_n) == want[(rix, riy)]


def test_zonal_mode_tie_to_smallest_and_partition_invariance(ray_session):
    from rayraster.spatial import zonal_mode

    px = pd.DataFrame(
        {"region_ix": np.zeros(4, dtype=np.int64),
         "region_iy": np.zeros(4, dtype=np.int64),
         "a": np.array([9, 9, 1, 1], dtype=np.int64)}
    )
    a = zonal_mode(rd.from_pandas(px), "a", num_partitions=2).to_pandas()
    assert len(a) == 1 and a.iloc[0]["mode"] == 1 and a.iloc[0].mode_n == 2
    b = zonal_mode(
        rd.from_pandas(px).repartition(4), "a", num_partitions=16
    ).to_pandas()
    assert a.equals(b)


# ---------------------------------------------------------------------------
# viewshed
# ---------------------------------------------------------------------------


def _vs_brute(ix, iy, e, W, H):
    """Driver-side reference of the discrete R3 visibility rule."""
    full = np.zeros((W, H), dtype=np.int64)
    occ = np.zeros((W, H), dtype=bool)
    full[ix, iy] = e
    occ[ix, iy] = True
    cand = np.flatnonzero(e == e.max())
    key = ix.astype(np.int64) * (1 << 32) + iy
    i = cand[np.argmin(key[cand])]
    ox, oy, eo = int(ix[i]), int(iy[i]), int(e[i])
    out = {}
    for tx, ty, te in zip(ix, iy, e):
        n = max(abs(int(tx) - ox), abs(int(ty) - oy))
        v = 1
        for k in range(1, n):
            sx = ox + int(np.floor(float((int(tx) - ox) * k) / float(n) + 0.5))
            sy = oy + int(np.floor(float((int(ty) - oy) * k) / float(n) + 0.5))
            es = int(full[sx, sy]) if (0 <= sx < W and 0 <= sy < H and occ[sx, sy]) else 0
            if (es - eo) * n >= (int(te) - eo) * k:
                v = 0
                break
        out[(int(tx), int(ty))] = v
    return (ox, oy, eo), out


def test_viewshed_matches_sql_twin_and_brute(ray_session):
    import duckdb

    from rayraster.spatial import viewshed, viewshed_sql

    rng = np.random.default_rng(19)
    W, H = 18, 22
    mask = rng.random((W, H)) > 0.35
    ix, iy = np.nonzero(mask)
    e = rng.integers(0, 9000, size=len(ix)).astype(np.int64)
    t = pa.table({"ix": ix.astype(np.int64), "iy": iy.astype(np.int64), "e": e})

    got = (
        viewshed(rd.from_arrow(t).repartition(5), "e", num_partitions=4)
        .to_pandas()
        .sort_values(["ix", "iy"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("px", t)
    want = con.execute(
        viewshed_sql("px", "e") + " ORDER BY ix, iy"
    ).df()
    assert len(got) == len(want) == int(mask.sum())
    assert (got["vis"].to_numpy() == want["vis"].to_numpy()).all()
    assert 0 < int(got["vis"].sum()) < len(got)

    obs, brute = _vs_brute(ix.astype(np.int64), iy.astype(np.int64), e, W, H)
    bv = np.array([brute[(a, b)] for a, b in zip(got["ix"], got["iy"])])
    assert (bv == got["vis"].to_numpy()).all()


def test_viewshed_ridge_blocks_far_side(ray_session):
    """A 1-D transect: observer at the left end, a tall ridge mid-way —
    everything beyond the ridge whose sight-line dips under it is
    hidden, the ridge itself and the near side are visible."""
    from rayraster.spatial import viewshed

    # elevations: observer 100 at x=0, flat 0, ridge 500 at x=5, flat 0
    ixs = np.arange(11, dtype=np.int64)
    e = np.zeros(11, dtype=np.int64)
    e[0] = 100
    e[5] = 500
    t = pa.table({"ix": ixs, "iy": np.zeros(11, dtype=np.int64), "e": e})
    # observer = argmax = the RIDGE (x=5, e=500); from the top every
    # flat cell is visible (angles all negative, monotone k test)
    got = (
        viewshed(rd.from_arrow(t), "e", num_partitions=2)
        .to_pandas()
        .sort_values("ix")
        .reset_index(drop=True)
    )
    assert (got["vis"] == 1).all()
    # now force the LOW observer at x=0: the ridge hides x>=6
    got2 = (
        viewshed(rd.from_arrow(t), "e", observer=(0, 0, 100),
                 num_partitions=2)
        .to_pandas()
        .sort_values("ix")
        .reset_index(drop=True)
    )
    vis = got2["vis"].to_numpy()
    assert (vis[:6] == 1).all()          # near side + ridge visible
    assert (vis[6:] == 0).all()          # far side shadowed


def test_viewshed_observer_pick_and_partition_invariance(ray_session):
    from rayraster.spatial import viewshed, viewshed_observer

    rng = np.random.default_rng(3)
    ix = rng.integers(0, 30, size=200).astype(np.int64)
    iy = rng.integers(0, 30, size=200).astype(np.int64)
    key = ix * (1 << 32) + iy
    _, u = np.unique(key, return_index=True)
    ix, iy = ix[u], iy[u]
    e = np.full(len(ix), 7, dtype=np.int64)  # ALL-TIE: min (ix, iy) wins
    t = pa.table({"ix": ix, "iy": iy, "e": e})
    ox, oy, eo = viewshed_observer(rd.from_arrow(t).repartition(7), "e")
    k = ix * (1 << 32) + iy
    i = int(np.argmin(k))
    assert (ox, oy, eo) == (int(ix[i]), int(iy[i]), 7)

    a = (
        viewshed(rd.from_arrow(t).repartition(2), "e", num_partitions=2)
        .to_pandas().sort_values(["ix", "iy"]).reset_index(drop=True)
    )
    b = (
        viewshed(rd.from_arrow(t).repartition(9), "e", num_partitions=7)
        .to_pandas().sort_values(["ix", "iy"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.parametrize("connectivity", [4, 8, 6])
def test_focal_stat_matches_brute(ray_session, connectivity):
    from rayraster.spatial import focal_stat

    px = _raster(seed=33)
    got = (
        focal_stat(
            rd.from_pandas(px).repartition(3), "v",
            connectivity=connectivity, tile=16, num_partitions=8,
        )
        .to_pandas().sort_values(["ix", "iy"]).reset_index(drop=True)
    )
    want = px.sort_values(["ix", "iy"]).reset_index(drop=True)
    if connectivity == 6:
        offs = [(1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)]
    else:
        offs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
        if connectivity == 8:
            offs += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    vals = {(r.ix, r.iy): r.v for r in want.itertuples()}
    for row, g in zip(want.itertuples(), got.itertuples()):
        window = [row.v] + [
            vals[(row.ix + dx, row.iy + dy)]
            for dx, dy in offs if (row.ix + dx, row.iy + dy) in vals
        ]
        assert g.focal_min == min(window)
        assert g.focal_max == max(window)
        assert g.focal_range == max(window) - min(window)
        assert g.n_present == len(window)


def test_focal_stat_constant_and_indicator(ray_session):
    from rayraster.spatial import focal_stat

    # constant raster: range identically 0
    px = _raster(seed=4)
    px["v"] = 5
    out = focal_stat(rd.from_pandas(px), "v").to_pandas()
    assert (out["focal_range"].to_numpy() == 0).all()
    assert (out["focal_min"].to_numpy() == 5).all()
    # 0/1 indicator on a dense block: focal_min is erosion (interior
    # survives, boundary of the 1-region hits a 0), focal_max dilation
    g = np.mgrid[0:6, 0:6].reshape(2, -1)
    ind = ((g[0] >= 1) & (g[0] <= 4) & (g[1] >= 1) & (g[1] <= 4)).astype(np.int64)
    px2 = pd.DataFrame({"ix": g[0].astype(np.int64), "iy": g[1].astype(np.int64), "v": ind})
    o2 = focal_stat(rd.from_pandas(px2), "v", connectivity=8).to_pandas()
    o2 = o2.set_index(["ix", "iy"])
    eroded = {(i, j) for i in (2, 3) for j in (2, 3)}
    for (i, j), r in o2.iterrows():
        assert r["focal_min"] == (1 if (i, j) in eroded else 0)
        # dilation: any cell 8-adjacent to the 1-block (or in it) gets 1
        near = any(
            (1 <= i + a <= 4) and (1 <= j + b <= 4)
            for a in (-1, 0, 1) for b in (-1, 0, 1)
        )
        assert r["focal_max"] == (1 if near else 0)
    with pytest.raises(ValueError, match="connectivity"):
        focal_stat(rd.from_pandas(px2), "v", connectivity=3)


@pytest.mark.parametrize("metric", ["chebyshev", "manhattan"])
def test_grow_cells_truncated_distance_transform(ray_session, metric):
    from rayraster.spatial import grow_cells

    px = _raster(seed=11, m=60, span=12)[["ix", "iy"]]
    r = 2
    got = (
        grow_cells(rd.from_pandas(px).repartition(3), radius=r, metric=metric)
        .to_pandas().sort_values(["ix", "iy"]).reset_index(drop=True)
    )
    occ = {(r_.ix, r_.iy) for r_ in px.itertuples()}
    want = {}
    for (ox, oy) in occ:
        for dx in range(-r, r + 1):
            for dy in range(-r, r + 1):
                d = max(abs(dx), abs(dy)) if metric == "chebyshev" else abs(dx) + abs(dy)
                if d > r:
                    continue
                key = (ox + dx, oy + dy)
                want[key] = min(want.get(key, r + 1), d)
    assert len(got) == len(want)
    for row in got.itertuples():
        assert want[(row.ix, row.iy)] == row.dist
    # occupied cells are exactly the dist==0 set
    zero = {(row.ix, row.iy) for row in got.itertuples() if row.dist == 0}
    assert zero == occ


def test_grow_cells_partition_invariance_and_validation(ray_session):
    from rayraster.spatial import grow_cells

    px = _raster(seed=14, m=80, span=15)[["ix", "iy"]]
    a = (
        grow_cells(rd.from_pandas(px).repartition(2), radius=1, num_partitions=4)
        .to_pandas().sort_values(["ix", "iy"]).reset_index(drop=True)
    )
    b = (
        grow_cells(rd.from_pandas(px).repartition(7), radius=1, num_partitions=16)
        .to_pandas().sort_values(["ix", "iy"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    with pytest.raises(ValueError, match="radius"):
        grow_cells(rd.from_pandas(px), radius=0)
    with pytest.raises(ValueError, match="metric"):
        grow_cells(rd.from_pandas(px), metric="euclid")


def _alloc_brute(px, src_keys, rounds):
    """Per-source synchronous Bellman-Ford, then lexicographic
    (dist, src_idx) min per cell — the cost_allocation reference."""
    offs = [(-1, 0), (1, 0), (0, -1), (0, 1), (-1, -1), (-1, 1), (1, -1), (1, 1)]
    cost = {(r.ix, r.iy): int(r.cost) for r in px.itertuples()}
    INF = float("inf")
    best = {}
    for idx, (sx, sy) in enumerate(src_keys):
        d = {c: INF for c in cost}
        d[(sx, sy)] = 0
        for _ in range(rounds):
            nd = dict(d)
            for (ix, iy), dc in d.items():
                for dx, dy in offs:
                    q = (ix + dx, iy + dy)
                    if q in d and d[q] < INF:
                        nd[(ix, iy)] = min(nd[(ix, iy)], d[q] + cost[(ix, iy)])
            d = nd
        for c, dc in d.items():
            if dc < INF and (c not in best or (dc, idx) < best[c]):
                best[c] = (dc, idx)
    return best


@pytest.mark.parametrize("engine", ["driver", "distributed"])
def test_cost_allocation_matches_brute(ray_session, engine):
    from rayraster.spatial import cost_allocation

    rng = np.random.default_rng(3)
    g = np.mgrid[0:9, 0:9].reshape(2, -1)
    px = pd.DataFrame(
        {"ix": g[0].astype(np.int64), "iy": g[1].astype(np.int64),
         "cost": rng.integers(1, 9, 81).astype(np.int64)}
    )
    srcs = [(0, 0), (8, 8), (0, 8)]
    src_df = pd.DataFrame({"ix": [s[0] for s in srcs], "iy": [s[1] for s in srcs]})
    # sources enumerate in sorted packed-key order — match it
    sk = sorted(srcs, key=lambda s: s[0] * (1 << 32) + s[1])
    rounds = 20  # > any optimal path in a 9x9 grid: converged
    got = cost_allocation(
        rd.from_pandas(px).repartition(3), rd.from_pandas(src_df), rounds,
        node_count=(81 if engine == "driver" else None),
        num_partitions=4,
    ).to_pandas().sort_values(["ix", "iy"]).reset_index(drop=True)
    want = _alloc_brute(px, sk, rounds)
    assert len(got) == 81
    for r in got.itertuples():
        d, idx = want[(r.ix, r.iy)]
        assert r.dist == d
        assert (r.src_ix, r.src_iy) == sk[idx]


def test_cost_allocation_engines_agree_unconverged(ray_session):
    from rayraster.spatial import cost_allocation

    px = _raster(seed=41, m=200, span=10)
    px = px.rename(columns={"v": "cost"})
    px["cost"] = (px["cost"] % 7) + 1
    src_df = px[["ix", "iy"]].iloc[[0, 5, 11]]
    for rounds in (0, 1, 3):
        a = cost_allocation(
            rd.from_pandas(px), rd.from_pandas(src_df), rounds,
            node_count=len(px),
        ).to_pandas().sort_values(["ix", "iy"]).reset_index(drop=True)
        b = cost_allocation(
            rd.from_pandas(px).repartition(5), rd.from_pandas(src_df), rounds,
            node_count=None, num_partitions=8,
        ).to_pandas().sort_values(["ix", "iy"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


def test_cost_allocation_validations(ray_session):
    from rayraster.spatial import cost_allocation

    px = pd.DataFrame(
        {"ix": np.array([0, 1], dtype=np.int64),
         "iy": np.array([0, 0], dtype=np.int64),
         "cost": np.array([1, 1], dtype=np.int64)}
    )
    src = px[["ix", "iy"]].iloc[[0]]
    with pytest.raises(ValueError, match="rounds"):
        cost_allocation(rd.from_pandas(px), rd.from_pandas(src), -1)
    bad_src = pd.DataFrame({"ix": [99], "iy": [99]})
    with pytest.raises(Exception, match="not an occupied"):
        cost_allocation(rd.from_pandas(px), rd.from_pandas(bad_src), 1,
                        node_count=2).to_pandas()
    big = px.copy()
    big["cost"] = np.int64(1) << 61
    with pytest.raises(Exception, match="cost too large"):
        cost_allocation(rd.from_pandas(big), rd.from_pandas(src), 1,
                        node_count=2).to_pandas()
    neg = px.copy()
    neg["cost"] = -1
    with pytest.raises(Exception, match="non-negative"):
        cost_allocation(rd.from_pandas(neg), rd.from_pandas(src), 1,
                        node_count=2).to_pandas()


def _dp_brute(pts, eps):
    """Classical recursive Douglas-Peucker reference."""
    import math as _m

    def rec(lo, hi, keep):
        if hi - lo < 2:
            return
        ax, ay = pts[lo]
        bx, by = pts[hi]
        dx, dy = bx - ax, by - ay
        L2 = dx * dx + dy * dy
        best, bd = -1, -1.0
        for i in range(lo + 1, hi):
            px_, py_ = pts[i]
            if L2 == 0.0:
                d2 = (px_ - ax) ** 2 + (py_ - ay) ** 2
            else:
                cr = dx * (py_ - ay) - dy * (px_ - ax)
                d2 = cr * cr / L2
            if d2 > bd:
                best, bd = i, d2
        if bd > eps * eps:
            keep.add(best)
            rec(lo, best, keep)
            rec(best, hi, keep)

    keep = {0, len(pts) - 1}
    rec(0, len(pts) - 1, keep)
    return keep


def test_simplify_lines_matches_brute(ray_session):
    from rayraster.spatial import simplify_lines

    rng = np.random.default_rng(7)
    rows = []
    expected = {}
    for lid in range(12):
        m = int(rng.integers(2, 40))
        xs = np.cumsum(rng.normal(1.0, 0.5, m))
        ys = rng.normal(0.0, 2.0, m)
        pts = list(zip(xs.tolist(), ys.tolist()))
        keep = _dp_brute(pts, 1.5)
        expected[lid] = {i for i in keep}
        for i, (px_, py_) in enumerate(pts):
            rows.append((lid, i, px_, py_))
    df = pd.DataFrame(rows, columns=["line_id", "seq", "x", "y"])
    got = (
        simplify_lines(rd.from_pandas(df).repartition(4), 1.5, num_partitions=8)
        .to_pandas()
    )
    for lid, grp in got.groupby("line_id"):
        assert set(grp["seq"].tolist()) == expected[lid], lid


def test_simplify_lines_straight_collinear_and_ring(ray_session):
    from rayraster.spatial import simplify_lines

    # noisy-but-within-eps line: only the endpoints survive
    m = 30
    df = pd.DataFrame(
        {"line_id": np.zeros(m, dtype=np.int64), "seq": np.arange(m),
         "x": np.arange(m, dtype=np.float64),
         "y": np.sin(np.arange(m)) * 0.01}
    )
    out = simplify_lines(rd.from_pandas(df), 0.5).to_pandas()
    assert sorted(out["seq"].tolist()) == [0, m - 1]
    # eps=0 drops EXACTLY the collinear interior vertices: an L-shape
    # keeps only its corner
    df2 = pd.DataFrame(
        {"line_id": np.zeros(5, dtype=np.int64), "seq": np.arange(5),
         "x": np.array([0.0, 1.0, 2.0, 2.0, 2.0]),
         "y": np.array([0.0, 0.0, 0.0, 1.0, 2.0])}
    )
    out2 = simplify_lines(rd.from_pandas(df2), 0.0).to_pandas()
    assert sorted(out2["seq"].tolist()) == [0, 2, 4]  # the corner at seq 2
    # closed ring (first == last): degenerate chord handled, ring kept
    th = np.linspace(0, 2 * np.pi, 17)
    df3 = pd.DataFrame(
        {"line_id": np.zeros(17, dtype=np.int64), "seq": np.arange(17),
         "x": np.cos(th), "y": np.sin(th)}
    )
    out3 = simplify_lines(rd.from_pandas(df3), 0.05).to_pandas()
    assert len(out3) >= 5
    assert {0, 16} <= set(out3["seq"].tolist())


def test_simplify_lines_partition_invariance_and_validation(ray_session):
    from rayraster.spatial import simplify_lines

    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {"line_id": rng.integers(0, 6, 120).astype(np.int64),
         "seq": np.arange(120), "x": rng.normal(0, 5, 120),
         "y": rng.normal(0, 5, 120)}
    )
    a = (
        simplify_lines(rd.from_pandas(df).repartition(2), 2.0, num_partitions=4)
        .to_pandas().sort_values(["line_id", "seq"]).reset_index(drop=True)
    )
    b = (
        simplify_lines(rd.from_pandas(df).repartition(9), 2.0, num_partitions=16)
        .to_pandas().sort_values(["line_id", "seq"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    with pytest.raises(ValueError, match="eps"):
        simplify_lines(rd.from_pandas(df), -1.0)
    dup = pd.DataFrame(
        {"line_id": [1, 1], "seq": [3, 3], "x": [0.0, 1.0], "y": [0.0, 1.0]}
    )
    with pytest.raises(Exception, match="duplicate"):
        simplify_lines(rd.from_pandas(dup), 1.0).to_pandas()
    with pytest.raises(Exception, match="max_line_len"):
        simplify_lines(rd.from_pandas(df), 1.0, max_line_len=5).to_pandas()


# ---------------------------------------------------------------------------
# join-count statistics (Cliff–Ord categorical autocorrelation)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("connectivity", [4, 8])
def test_join_counts_matches_brute(ray_session, connectivity):
    from rayraster.spatial import join_counts

    px = _raster(seed=44)
    px["v"] = (px["v"] % 2).astype("int64")  # binary recode
    got = (
        join_counts(
            rd.from_pandas(px).repartition(3), "v",
            connectivity=connectivity, tile=16, num_partitions=8,
        )
        .to_pandas().sort_values(["ix", "iy"]).reset_index(drop=True)
    )
    want = px.sort_values(["ix", "iy"]).reset_index(drop=True)
    offs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if connectivity == 8:
        offs += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    vals = {(r.ix, r.iy): r.v for r in want.itertuples()}
    for row, g in zip(want.itertuples(), got.itertuples()):
        nb = [
            vals[(row.ix + dx, row.iy + dy)]
            for dx, dy in offs if (row.ix + dx, row.iy + dy) in vals
        ]
        s, c = sum(nb), len(nb)
        assert g.jc_bb == row.v * s
        assert g.jc_bw == row.v * (c - s) + (1 - row.v) * s
        assert g.jc_ww == (1 - row.v) * (c - s)
    # per-pixel contributions partition every join twice over endpoints
    assert (got.jc_bb + got.jc_bw + got.jc_ww == got.nbr_cnt).all()
    # global BB/BW/WW: each unordered join counted from both ends
    assert int(got.jc_bb.sum()) % 2 == 0 and int(got.jc_ww.sum()) % 2 == 0
    assert int(got.jc_bw.sum()) % 2 == 0


def test_join_counts_all_black_and_rejects_nonbinary(ray_session):
    from rayraster.spatial import join_counts

    px = _raster(seed=45, m=120, span=10)
    px["v"] = np.int64(1)
    got = join_counts(rd.from_pandas(px), "v", connectivity=4).to_pandas()
    assert (got.jc_bw == 0).all() and (got.jc_ww == 0).all()
    assert (got.jc_bb == got.nbr_cnt).all()
    px2 = _raster(seed=46, m=50, span=8)
    px2["v"] = np.int64(3)
    with pytest.raises(Exception):
        join_counts(rd.from_pandas(px2), "v").to_pandas()


# ---------------------------------------------------------------------------
# first-order trend surface (ArcGIS Trend / OLS v ~ x + y)
# ---------------------------------------------------------------------------


def test_trend_surface_recovers_exact_plane(ray_session):
    from rayraster.spatial import trend_moments, trend_surface_fit

    rng = np.random.default_rng(3)
    n = 400
    x = rng.uniform(-50, 50, n)
    y = rng.uniform(-50, 50, n)
    xq = np.floor(x * 256.0).astype(np.int64)
    yq = np.floor(y * 256.0).astype(np.int64)
    v = 7 + 2 * xq + 5 * yq  # exact plane on the quantized lattice
    ds = rd.from_pandas(
        pd.DataFrame({"x": x, "y": y, "v": v})
    ).repartition(4)
    m = trend_moments(ds, "v", scale=256)
    a, b, c = trend_surface_fit(m)
    assert abs(a - 7) < 1e-6 and abs(b - 2) < 1e-9 and abs(c - 5) < 1e-9


def test_trend_moments_match_numpy_and_partition_invariant(ray_session):
    from rayraster.spatial import trend_moments, trend_surface_fit

    rng = np.random.default_rng(9)
    n = 300
    x = rng.uniform(-30, 30, n)
    y = rng.uniform(-30, 30, n)
    v = rng.integers(0, 1000, n).astype(np.int64)
    df = pd.DataFrame({"x": x, "y": y, "v": v})
    m1 = trend_moments(rd.from_pandas(df), "v", scale=256)
    m2 = trend_moments(rd.from_pandas(df).repartition(7), "v", scale=256)
    assert m1 == m2  # int sums: associative, partition-invariant
    xq = np.floor(x * 256.0).astype(np.int64)
    yq = np.floor(y * 256.0).astype(np.int64)
    assert m1["n"] == n and m1["sx"] == int(xq.sum())
    assert m1["sxy"] == int((xq * yq).sum())
    assert m1["svx"] == int((v * xq).sum())
    # fit agrees with lstsq on the quantized design
    a, b, c = trend_surface_fit(m1)
    A = np.stack([np.ones(n), xq.astype(float), yq.astype(float)], axis=1)
    ref, *_ = np.linalg.lstsq(A, v.astype(float), rcond=None)
    assert np.allclose([a, b, c], ref, rtol=1e-8, atol=1e-8)


def test_trend_surface_validations(ray_session):
    from rayraster.spatial import trend_moments, trend_surface_fit

    df = pd.DataFrame({"x": [1.0, 2.0], "y": [1.0, 2.0], "v": [1.0, 2.0]})
    with pytest.raises(Exception):
        trend_moments(rd.from_pandas(df), "v")  # float value column
    # collinear design (all points on one line) is singular
    n = 20
    df2 = pd.DataFrame(
        {"x": np.arange(n, dtype=float), "y": np.arange(n, dtype=float),
         "v": np.arange(n, dtype=np.int64)}
    )
    m = trend_moments(rd.from_pandas(df2), "v", scale=1)
    with pytest.raises(ValueError):
        trend_surface_fit(m)
    with pytest.raises(Exception):  # ValueError wrapped in RayTaskError
        trend_moments(
            rd.from_pandas(pd.DataFrame(
                {"x": [1e9], "y": [0.0], "v": np.array([1], dtype=np.int64)}
            )),
            "v", scale=256,
        )  # |coord*scale| >= 2^31


# ---------------------------------------------------------------------------
# bilinear resampling (terra resample / gdalwarp -r bilinear)
# ---------------------------------------------------------------------------


def _brute_resample(px: dict, x0, y0, sres, dres, ws=1024.0):
    """Pure-python renormalized bilinear with quantized tent weights."""
    out = {}
    ixs = [k[0] for k in px]
    iys = [k[1] for k in px]
    import math as m

    jx_lo = m.floor((min(ixs) - 0.5) * sres / dres) - 2
    jx_hi = m.ceil((max(ixs) + 1.5) * sres / dres) + 2
    jy_lo = m.floor((min(iys) - 0.5) * sres / dres) - 2
    jy_hi = m.ceil((max(iys) + 1.5) * sres / dres) + 2
    for jx in range(jx_lo, jx_hi + 1):
        for jy in range(jy_lo, jy_hi + 1):
            tx = x0 + (jx + 0.5) * dres
            ty = y0 + (jy + 0.5) * dres
            ux = (tx - x0) / sres - 0.5
            uy = (ty - y0) / sres - 0.5
            wv = w = n = 0
            for (ix, iy), v in px.items():
                wx = m.floor(ws * max(1.0 - abs(ux - ix), 0.0))
                wy = m.floor(ws * max(1.0 - abs(uy - iy), 0.0))
                wq = wx * wy
                if wq > 0:
                    wv += wq * v
                    w += wq
                    n += 1
            if n:
                out[(jx, jy)] = (n, wv, w, wv / w)
    return out


def test_resample_bilinear_matches_brute(ray_session):
    from rayraster.spatial import resample_bilinear

    rng = np.random.default_rng(17)
    keys = {(int(i), int(j)) for i, j in rng.integers(-6, 7, (60, 2))}
    px = {k: int(rng.integers(1, 500)) for k in keys}
    df = pd.DataFrame(
        {"ix": [k[0] for k in px], "iy": [k[1] for k in px],
         "v": np.array(list(px.values()), dtype=np.int64)}
    )
    got = (
        resample_bilinear(
            rd.from_pandas(df).repartition(3), "v",
            x0=-10.0, y0=5.0, src_res=30.0, dst_res=20.0, num_partitions=6,
        )
        .to_pandas().set_index(["ix", "iy"]).sort_index()
    )
    want = _brute_resample(px, -10.0, 5.0, 30.0, 20.0)
    assert set(got.index) == set(want)
    for k, (n, wv, w, val) in want.items():
        assert got.loc[k, "n"] == n
        assert got.loc[k, "sum_wv"] == wv
        assert got.loc[k, "sum_w"] == w
        assert got.loc[k, "value"] == val


def test_resample_bilinear_laws(ray_session):
    from rayraster.spatial import resample_bilinear

    # constant raster resamples to the constant exactly (renormalized)
    df = pd.DataFrame(
        {"ix": np.repeat(np.arange(5), 5), "iy": np.tile(np.arange(5), 5),
         "v": np.full(25, 37, dtype=np.int64)}
    )
    got = resample_bilinear(
        rd.from_pandas(df), "v", x0=0.0, y0=0.0, src_res=10.0, dst_res=7.0
    ).to_pandas()
    assert (got["value"] == 37.0).all()
    # identity at equal resolutions: every aligned target equals its source
    same = resample_bilinear(
        rd.from_pandas(df), "v", x0=0.0, y0=0.0, src_res=10.0, dst_res=10.0
    ).to_pandas().set_index(["ix", "iy"])
    for i in range(5):
        for j in range(5):
            assert same.loc[(i, j), "value"] == 37.0
            assert same.loc[(i, j), "n"] == 1  # only its own source
    # float value column rejected
    dff = df.assign(v=df["v"].astype(float))
    with pytest.raises(Exception):
        resample_bilinear(
            rd.from_pandas(dff), "v", x0=0.0, y0=0.0, src_res=10.0,
            dst_res=7.0,
        ).to_pandas()


def _px(rows):
    ix, iy, v = zip(*rows)
    return rd.from_arrow(pa.table({
        "ix": pa.array(ix, pa.int64()), "iy": pa.array(iy, pa.int64()),
        "v": pa.array(v, pa.int64()),
    }))


def test_raster_overlay_inner_outer(ray_session):
    from rayraster.spatial import raster_overlay

    a = _px([(0, 0, 10), (1, 0, 20), (2, 2, 5)])
    b = _px([(0, 0, 3), (1, 0, 7), (9, 9, 100)])

    inner = sorted(
        (r["ix"], r["iy"], r["a"], r["b"], r["v_add"], r["v_min"])
        for r in raster_overlay(
            a, b, "v", "v", ops={"v_add": "add", "v_min": "min"},
            num_partitions=4,
        ).take_all()
    )
    assert inner == [(0, 0, 10, 3, 13, 3), (1, 0, 20, 7, 27, 7)]

    outer = sorted(
        (r["ix"], r["iy"], r["a"], r["b"], r["d"])
        for r in raster_overlay(
            a, b, "v", "v", ops={"d": "sub"}, how="outer",
            fill_a=0, fill_b=0, num_partitions=4,
        ).take_all()
    )
    assert outer == [
        (0, 0, 10, 3, 7), (1, 0, 20, 7, 13),
        (2, 2, 5, 0, 5), (9, 9, 0, 100, -100),
    ]

    with pytest.raises(ValueError, match="unknown op"):
        raster_overlay(a, b, "v", "v", ops={"x": "pow"})
    with pytest.raises(ValueError, match="reserved"):
        raster_overlay(a, b, "v", "v", ops={"a": "add"})
    with pytest.raises(ValueError, match="inner|outer"):
        raster_overlay(a, b, "v", "v", how="left")


def test_raster_overlay_partition_invariance(ray_session):
    from rayraster.spatial import raster_overlay

    rng = np.random.default_rng(3)
    cells = [(int(x), int(y), int(v)) for x, y, v in
             zip(rng.integers(0, 20, 200), rng.integers(0, 20, 200),
                 rng.integers(1, 50, 200))]
    # dedup cell keys (overlay folds dups by sum; keep the test exact)
    a = {(x, y): v for x, y, v in cells[:120]}
    b = {(x, y): v for x, y, v in cells[80:]}

    def run(parts):
        return sorted(
            tuple(r.values()) for r in raster_overlay(
                _px([(x, y, v) for (x, y), v in a.items()]).repartition(parts),
                _px([(x, y, v) for (x, y), v in b.items()]).repartition(parts),
                "v", "v", ops={"m": "mul"}, num_partitions=parts + 2,
            ).take_all()
        )

    r1, r2 = run(2), run(9)
    assert r1 == r2
    want = sorted(
        (x, y, a[(x, y)], b[(x, y)], a[(x, y)] * b[(x, y)])
        for (x, y) in set(a) & set(b)
    )
    assert r1 == want


def test_raster_crosstab_counts_and_duplicate_guard(ray_session):
    from rayraster.spatial import raster_crosstab

    a = _px([(0, 0, 1), (1, 0, 1), (2, 0, 2), (3, 0, 2), (4, 4, 9)])
    b = _px([(0, 0, 5), (1, 0, 6), (2, 0, 5), (3, 0, 5), (8, 8, 1)])
    got = sorted(
        (r["ca"], r["cb"], r["n"])
        for r in raster_crosstab(a, b, "v", "v", num_partitions=4).take_all()
    )
    assert got == [(1, 5, 1), (1, 6, 1), (2, 5, 2)]

    dup = _px([(0, 0, 1), (0, 0, 2)])
    with pytest.raises(Exception, match="duplicate cell keys"):
        raster_crosstab(dup, b, "v", "v").take_all()


def _brute_hull(pts):
    pts = sorted(set(map(tuple, pts)))
    if len(pts) <= 2:
        return pts

    def chain(ps):
        out = []
        for p in ps:
            while len(out) >= 2 and (
                (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
            ) <= 0:
                out.pop()
            out.append(p)
        return out

    lo = chain(pts)
    hi = chain(pts[::-1])
    return lo[:-1] + hi[:-1]


def test_convex_hull_matches_brute(ray_session):
    from rayraster.spatial import convex_hull

    rng = np.random.default_rng(8)
    for trial in range(6):
        n = int(rng.integers(3, 3000))
        x = rng.integers(-1000, 1000, n).astype(np.float64)
        y = rng.integers(-1000, 1000, n).astype(np.float64)
        ds = rd.from_arrow(pa.table({"x": x, "y": y})).repartition(
            int(rng.integers(1, 7))
        )
        got = list(zip(*(a.tolist() for a in convex_hull(ds, batch_size=256))))
        assert got == _brute_hull(list(zip(x.tolist(), y.tolist()))), trial


def test_convex_hull_degenerate(ray_session):
    from rayraster.spatial import convex_hull

    # all collinear (+ duplicates): strict hull = the two endpoints
    ds = rd.from_arrow(pa.table({"x": [0.0, 1, 2, 3, 3, 2],
                                 "y": [0.0, 1, 2, 3, 3, 2]}))
    hx, hy = convex_hull(ds)
    assert list(zip(hx, hy)) == [(0, 0), (3, 3)]
    one = rd.from_arrow(pa.table({"x": [5.0], "y": [7.0]}))
    hx, hy = convex_hull(one)
    assert list(zip(hx, hy)) == [(5.0, 7.0)]
    with pytest.raises(ValueError, match="no finite points"):
        convex_hull(rd.from_arrow(pa.table(
            {"x": pa.array([None], type=pa.float64()),
             "y": pa.array([None], type=pa.float64())}
        )))


def test_hull_metrics_exact(ray_session):
    from rayraster.spatial import convex_hull, hull_metrics

    # unit square + interior noise: area2 = 2·100², diameter² = 2·100²
    rng = np.random.default_rng(12)
    xs = np.concatenate([[0, 100, 100, 0], rng.integers(1, 99, 50)]).astype(float)
    ys = np.concatenate([[0, 0, 100, 100], rng.integers(1, 99, 50)]).astype(float)
    hx, hy = convex_hull(rd.from_arrow(pa.table({"x": xs, "y": ys})))
    m = hull_metrics(hx, hy)
    assert m["n_vertices"] == 4
    assert m["area2"] == 20000.0 and m["diameter_sq"] == 20000.0
    assert m["perimeter"] == 400.0

    # degenerate: segment and single point
    m2 = hull_metrics(np.array([0.0, 3.0]), np.array([0.0, 4.0]))
    assert m2["area2"] == 0.0 and m2["diameter_sq"] == 25.0 and m2["perimeter"] == 5.0
    m1 = hull_metrics(np.array([7.0]), np.array([7.0]))
    assert m1["diameter_sq"] == 0.0
    with pytest.raises(ValueError, match="empty"):
        hull_metrics(np.array([]), np.array([]))


def test_zonal_perimeter_rejects_duplicates_and_wide_coords(ray_session):
    """Regression: zonal_perimeter's fanout lacked both sibling
    guards — duplicate (ix,iy) pixels silently double-counted
    perimeters, and |ix| >= 2^31 aliased packed keys."""
    from rayraster.spatial import zonal_perimeter

    dup = pa.table({"ix": pa.array([0, 0, 1], type=pa.int64()),
                    "iy": pa.array([0, 0, 0], type=pa.int64()),
                    "v": pa.array([1, 1, 1], type=pa.int64()),
                    "rx": pa.array([0, 0, 0], type=pa.int64()),
                    "ry": pa.array([0, 0, 0], type=pa.int64())})
    with pytest.raises(Exception, match="duplicate"):
        zonal_perimeter(rd.from_arrow(dup), "v", region_cols=("rx", "ry"),
                        num_partitions=2).to_pandas()
    wide = pa.table({"ix": pa.array([1 << 31], type=pa.int64()),
                     "iy": pa.array([0], type=pa.int64()),
                     "v": pa.array([1], type=pa.int64()),
                     "rx": pa.array([0], type=pa.int64()),
                     "ry": pa.array([0], type=pa.int64())})
    with pytest.raises(Exception, match="2\\^31"):
        zonal_perimeter(rd.from_arrow(wide), "v", region_cols=("rx", "ry"),
                        num_partitions=2).to_pandas()


def test_cost_distance_distributed_validates_sources(ray_session):
    """Regression: the distributed engine emitted a phantom (src, 0)
    row for a source outside the raster where the driver engine
    raises — both engines must enforce the occupancy contract."""
    from rayraster.spatial import cost_distance

    px = pa.table({"ix": pa.array([0, 1, 2], type=pa.int64()),
                   "iy": pa.array([0, 0, 0], type=pa.int64()),
                   "cost": pa.array([1, 1, 1], type=pa.int64())})
    bad_src = pa.table({"ix": pa.array([10], type=pa.int64()),
                        "iy": pa.array([10], type=pa.int64())})
    for node_count in (3, None):  # driver engine, then distributed
        with pytest.raises(Exception, match="occupied"):
            cost_distance(rd.from_arrow(px), rd.from_arrow(bad_src),
                          rounds=2, node_count=node_count,
                          num_partitions=2).to_pandas()


def test_local_moran_gi_rejects_constant_raster(ray_session):
    """Regression: a constant raster produced inf/nan gi_star with
    only a numpy warning; must raise like global_moran's degenerate."""
    from rayraster.spatial import local_moran

    px = pa.table({"ix": pa.array([0, 1], type=pa.int64()),
                   "iy": pa.array([0, 0], type=pa.int64()),
                   "v": pa.array([5, 5], type=pa.int64())})
    with pytest.raises(ValueError, match="constant"):
        local_moran(rd.from_arrow(px), "v", with_gi=True,
                    num_partitions=2).to_pandas()


def test_unpivot_mixed_value_column_types(ray_session):
    """Regression: mixed int64/float64 value columns (the engine's
    own sum_/mean_ outputs) crashed pa.concat_tables."""
    from rayraster.rasterize import unpivot

    t = pa.table({"cell_id": pa.array([1, 2], type=pa.int64()),
                  "sum_v": pa.array([10, 20], type=pa.int64()),
                  "mean_v": pa.array([1.5, 2.5], type=pa.float64())})
    out = unpivot(rd.from_arrow(t), ["cell_id"], ["sum_v", "mean_v"]).to_pandas()
    assert len(out) == 4
    assert sorted(out.feature.unique()) == ["mean_v", "sum_v"]
