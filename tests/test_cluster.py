"""Distributed ε-pairs + DBSCAN (rayraster/cluster.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from rayraster.cluster import dbscan_labels, radius_pairs


def _pts(seed=3, n=400, span=100.0):
    rng = np.random.default_rng(seed)
    return (
        np.arange(n, dtype=np.int64),
        rng.uniform(0, span, n),
        rng.uniform(0, span, n),
    )


def _brute_pairs(ids, x, y, eps):
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    hit = (d2 <= eps * eps) & (ids[:, None] != ids[None, :])
    ai, bi = np.nonzero(hit)
    return {(ids[i], ids[j]): d2[i, j] for i, j in zip(ai, bi)}


def _brute_dbscan(ids, x, y, eps, min_samples):
    nbrs = {}
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    within = d2 <= eps * eps
    for i in range(len(ids)):
        nbrs[ids[i]] = [ids[j] for j in np.nonzero(within[i])[0] if j != i]
    core = {i for i in ids if len(nbrs[i]) + 1 >= min_samples}
    # CC over core-core edges, min-id labels
    parent = {i: i for i in core}

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in core:
        for j in nbrs[i]:
            if j in core:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    lbl = {i: find(i) for i in core}
    for i in ids:
        if i in core:
            continue
        cl = [lbl[j] for j in nbrs[i] if j in core]
        lbl[i] = min(cl) if cl else -1
    return lbl


@pytest.mark.parametrize("eps", [4.0, 9.5])
def test_radius_pairs_matches_brute(ray_session, eps):
    ids, x, y = _pts()
    ds = rd.from_arrow(pa.table({"id": ids, "x": x, "y": y}))
    got = radius_pairs(ds, eps, num_partitions=4).to_pandas()
    ref = _brute_pairs(ids, x, y, eps)
    assert len(got) == len(ref)
    for a, b, d2 in zip(got.a, got.b, got.d2):
        assert ref[(a, b)] == d2


@pytest.mark.parametrize("min_samples", [1, 3, 5])
def test_dbscan_matches_brute(ray_session, min_samples):
    ids, x, y = _pts(seed=9, n=350, span=60.0)  # dense enough for clusters
    ds = rd.from_arrow(pa.table({"id": ids, "x": x, "y": y}))
    ref = _brute_dbscan(ids, x, y, 4.0, min_samples)
    # both CC engines must reach the same fixpoint
    for eng in ("driver", "distributed"):
        got = (
            dbscan_labels(ds, 4.0, min_samples=min_samples, num_partitions=4,
                          cc_engine=eng)
            .to_pandas()
            .set_index("node")["label"]
            .to_dict()
        )
        assert len(got) == len(ids), eng
        assert got == ref, eng
    with pytest.raises(ValueError, match="cc_engine"):
        dbscan_labels(ds, 4.0, cc_engine="bogus")


def test_dbscan_partition_invariant_and_noise(ray_session):
    # three tight blobs + two isolated points
    blob = np.array([[0.0, 0.0], [0.5, 0.0], [1.0, 0.1], [0.2, 0.6]])
    xs, ys, ids = [], [], []
    for b, (bx, by) in enumerate([(0, 0), (50, 0), (0, 50)]):
        xs.extend(blob[:, 0] + bx)
        ys.extend(blob[:, 1] + by)
        ids.extend(4 * b + np.arange(4))
    ids.extend([100, 101])
    xs.extend([500.0, -500.0])
    ys.extend([500.0, -500.0])
    t = pa.table(
        {"id": np.array(ids, dtype=np.int64),
         "x": np.array(xs), "y": np.array(ys)}
    )
    out = {}
    for parts in (2, 8):
        ds = rd.from_arrow(t)
        out[parts] = (
            dbscan_labels(ds, 2.0, min_samples=3, num_partitions=parts)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
    assert out[2].equals(out[8])
    lbl = out[2].set_index("node")["label"].to_dict()
    assert lbl[100] == -1 and lbl[101] == -1
    for b in range(3):
        members = {lbl[4 * b + k] for k in range(4)}
        assert members == {4 * b}


# ---------------------------------------------------------------------------
# Cross-table radius join
# ---------------------------------------------------------------------------


def test_radius_join_matches_brute(ray_session):
    from rayraster.cluster import radius_join

    rng = np.random.default_rng(71)
    nl, nr = 120, 200
    lx, ly = rng.uniform(0, 100, nl), rng.uniform(0, 100, nl)
    rx, ry = rng.uniform(0, 100, nr), rng.uniform(0, 100, nr)
    eps = 7.0
    left = rd.from_arrow(
        pa.table({"id": np.arange(nl, dtype=np.int64), "x": lx, "y": ly})
    ).repartition(3)
    right = rd.from_arrow(
        pa.table({"id": np.arange(nr, dtype=np.int64), "x": rx, "y": ry})
    ).repartition(4)
    got = radius_join(left, right, eps, num_partitions=8).to_pandas()
    want = set()
    for i in range(nl):
        d2 = (lx[i] - rx) ** 2 + (ly[i] - ry) ** 2
        for j in np.flatnonzero(d2 <= eps * eps):
            want.add((i, int(j), d2[j]))
    assert set(map(tuple, got[["a", "b", "d2"]].to_numpy())) == {
        (float(a), float(b), d) for a, b, d in want
    }
    assert len(got) == len(want)  # no duplicate pairs from the halo


def test_radius_join_id_collision_and_partition_invariance(ray_session):
    from rayraster.cluster import radius_join

    # identical ids on both sides must still pair (different tables)
    left = rd.from_arrow(
        pa.table({"id": np.array([5], dtype=np.int64),
                  "x": [0.0], "y": [0.0]})
    )
    right = rd.from_arrow(
        pa.table({"id": np.array([5], dtype=np.int64),
                  "x": [1.0], "y": [0.0]})
    )
    out = radius_join(left, right, 2.0, num_partitions=4).to_pandas()
    assert len(out) == 1 and out.iloc[0].a == 5 and out.iloc[0].b == 5
    rng = np.random.default_rng(73)
    n = 150
    t = pa.table(
        {"id": np.arange(n, dtype=np.int64),
         "x": rng.uniform(0, 50, n), "y": rng.uniform(0, 50, n)}
    )
    a = (
        radius_join(rd.from_arrow(t), rd.from_arrow(t), 4.0, num_partitions=2)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    b = (
        radius_join(
            rd.from_arrow(t).repartition(7), rd.from_arrow(t).repartition(3),
            4.0, num_partitions=16,
        )
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    assert a.equals(b)
    # self pair (a==b, d2=0) IS included in a cross-table join
    assert ((a.a == a.b) & (a.d2 == 0.0)).sum() == n


# ---------------------------------------------------------------------------
# ST-DBSCAN (spatiotemporal neighborhood)
# ---------------------------------------------------------------------------


def _brute_st_pairs(ids, x, y, tv, eps, eps_t):
    out = {}
    for i in range(len(ids)):
        for j in range(len(ids)):
            if i == j:
                continue
            d2 = (x[i] - x[j]) ** 2 + (y[i] - y[j]) ** 2
            if d2 <= eps * eps and abs(tv[i] - tv[j]) <= eps_t:
                out[(ids[i], ids[j])] = d2
    return out


def test_st_radius_pairs_matches_brute(ray_session):
    rng = np.random.default_rng(83)
    n = 200
    ids = np.arange(n, dtype=np.int64)
    x = rng.uniform(0, 60, n)
    y = rng.uniform(0, 60, n)
    tv = rng.uniform(0, 1000, n)
    ds = rd.from_arrow(pa.table({"id": ids, "x": x, "y": y, "t": tv}))
    got = radius_pairs(
        ds, 6.0, num_partitions=4, time_col="t", eps_t=50.0
    ).to_pandas()
    ref = _brute_st_pairs(ids, x, y, tv, 6.0, 50.0)
    assert len(got) == len(ref)
    for a, b, d2 in zip(got.a, got.b, got.d2):
        assert ref[(a, b)] == d2
    with pytest.raises(ValueError, match="together"):
        radius_pairs(ds, 6.0, time_col="t")


def test_st_dbscan_separates_time_slices(ray_session):
    # two co-LOCATED blobs far apart in time: plain DBSCAN merges
    # them, ST-DBSCAN keeps them distinct clusters
    n = 8
    x = np.tile(np.linspace(0, 1.4, n), 2)
    y = np.zeros(2 * n)
    tv = np.concatenate([np.zeros(n), np.full(n, 10_000.0)])
    ids = np.arange(2 * n, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"id": ids, "x": x, "y": y, "t": tv}))
    plain = (
        dbscan_labels(ds, 1.0, min_samples=3, num_partitions=4)
        .to_pandas().set_index("node")["label"]
    )
    st = (
        dbscan_labels(ds, 1.0, min_samples=3, num_partitions=4,
                      time_col="t", eps_t=100.0)
        .to_pandas().set_index("node")["label"]
    )
    assert plain.nunique() == 1          # one merged cluster
    assert st.nunique() == 2             # split on the time axis
    assert set(st[ids[:n]]) == {0} and set(st[ids[n:]]) == {int(n)}


def test_st_radius_join_matches_brute(ray_session):
    from rayraster.cluster import radius_join

    rng = np.random.default_rng(89)
    nl, nr = 80, 150
    lx, ly, lt = (rng.uniform(0, 50, nl), rng.uniform(0, 50, nl),
                  rng.uniform(0, 500, nl))
    rx, ry, rt = (rng.uniform(0, 50, nr), rng.uniform(0, 50, nr),
                  rng.uniform(0, 500, nr))
    eps, eps_t = 5.0, 40.0
    left = rd.from_arrow(pa.table(
        {"id": np.arange(nl, dtype=np.int64), "x": lx, "y": ly, "t": lt}
    )).repartition(3)
    right = rd.from_arrow(pa.table(
        {"id": np.arange(nr, dtype=np.int64), "x": rx, "y": ry, "t": rt}
    )).repartition(2)
    got = radius_join(
        left, right, eps, num_partitions=8, time_col="t", eps_t=eps_t
    ).to_pandas()
    want = set()
    for i in range(nl):
        d2 = (lx[i] - rx) ** 2 + (ly[i] - ry) ** 2
        ok = (d2 <= eps * eps) & (np.abs(lt[i] - rt) <= eps_t)
        for j in np.flatnonzero(ok):
            want.add((i, int(j), d2[j]))
    assert set(map(tuple, got[["a", "b", "d2"]].to_numpy())) == {
        (float(a), float(b), d) for a, b, d in want
    }
    assert len(got) == len(want)
    with pytest.raises(ValueError, match="together"):
        radius_join(left, right, eps, eps_t=40.0)


def _kmeans_ref(X, k, iters):
    C = X[:k].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d, axis=1)
        for j in range(k):
            m = a == j
            assert m.any()
            s = X[m].sum(axis=0)
            n = int(m.sum())
            C[j] = (2 * s + n) // (2 * n)
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    return np.argmin(d, axis=1), C


def test_kmeans_lloyd_int_exact(ray_session):
    import ray.data as rd

    from rayraster.cluster import kmeans_lloyd_int

    rng = np.random.default_rng(29)
    n, dim, k = 300, 6, 4
    X = rng.uniform(-1, 1, (n, dim)).astype(np.float32)
    Xq = np.floor(X.astype(np.float64) * 100.0).astype(np.int64) + 200
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([row.tolist() for row in X],
                              type=pa.list_(pa.float32())),
    })
    want_a, want_c = _kmeans_ref(Xq, k, 2)
    assign, C = kmeans_lloyd_int(
        rd.from_arrow(t).repartition(5), "vec_id", "embedding",
        k=k, iters=2, dim=dim,
    )
    got = assign.to_pandas().sort_values("vec_id")
    assert got["cluster"].to_numpy().tolist() == want_a.tolist()
    assert np.array_equal(C, want_c)
    # partitioning invariance
    assign2, C2 = kmeans_lloyd_int(
        rd.from_arrow(t).repartition(11), "vec_id", "embedding",
        k=k, iters=2, dim=dim,
    )
    assert np.array_equal(C2, C)
    with pytest.raises(ValueError, match="k, iters, dim"):
        kmeans_lloyd_int(rd.from_arrow(t), "vec_id", "embedding",
                         k=0, iters=1, dim=2)


def test_kcenter_select_matches_greedy_reference(ray_session):
    import ray.data as rd

    from rayraster.cluster import kcenter_select

    rng = np.random.default_rng(61)
    n, dim = 200, 5
    X = rng.uniform(-1, 1, (n, dim)).astype(np.float32)
    Xq = np.floor(X.astype(np.float64) * 100.0).astype(np.int64) + 200
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([r.tolist() for r in X],
                              type=pa.list_(pa.float32())),
    })
    # greedy reference
    chosen = [0]
    for _ in range(5):
        d = ((Xq[:, None, :] - Xq[chosen][None, :, :]) ** 2).sum(2).min(1)
        d[chosen] = -1
        best = np.lexsort((np.arange(n), -d))[0]
        chosen.append(int(best))
    got = kcenter_select(rd.from_arrow(t).repartition(6), "vec_id",
                         "embedding", k=6, dim=dim)
    assert got == chosen
    got2 = kcenter_select(rd.from_arrow(t).repartition(13), "vec_id",
                          "embedding", k=6, dim=dim)
    assert got2 == chosen  # partitioning-invariant
    with pytest.raises(ValueError, match="k and dim"):
        kcenter_select(rd.from_arrow(t), "vec_id", "embedding", k=0, dim=2)


def test_radius_pairs_rejects_count_radii_beyond_eps(ray_session):
    """Regression: a count_radii bucket beyond eps silently
    undercounted (pairs past eps never enter the histogram)."""
    from rayraster.cluster import radius_pairs

    pts = pa.table({"id": pa.array([1, 2], type=pa.int64()),
                    "x": pa.array([0.0, 1.5]),
                    "y": pa.array([0.0, 0.0])})
    with pytest.raises(ValueError, match="count_radii"):
        radius_pairs(rd.from_arrow(pts), eps=1.0, count_radii=[0.5, 2.0])
