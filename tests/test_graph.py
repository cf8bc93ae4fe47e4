"""Distributed fixed-point PageRank (rayraster/graph.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from rayraster.graph import pagerank

SCALE, DN, DD = 10**9, 85, 100


def _local_pagerank(src, dst, n, iterations, scale=SCALE, dn=DN, dd=DD):
    """Dense local reference of the SAME fixed-point semantics."""
    rank = np.full(n, scale, dtype=np.int64)
    outdeg = np.bincount(src, minlength=n).astype(np.int64)
    tel = scale * (dd - dn) // dd
    for _ in range(iterations):
        c = np.zeros(n, dtype=np.int64)
        has_out = outdeg > 0
        per_src = np.zeros(n, dtype=np.int64)
        per_src[has_out] = (rank[has_out] * dn) // (outdeg[has_out] * dd)
        np.add.at(c, dst, per_src[src])
        rank = tel + c
    return rank


def _edges_ds(src, dst):
    return rd.from_arrow(
        pa.table({"src": src.astype(np.int64), "dst": dst.astype(np.int64)})
    )


def _nodes_ds(n):
    return rd.from_arrow(pa.table({"node": np.arange(n, dtype=np.int64)}))


def _run(src, dst, n, path, iterations=3, **kw):
    out = (
        pagerank(_edges_ds(src, dst), edges_path=path, iterations=iterations, **kw)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    return out


def test_pagerank_matches_local_reference(tmp_path):
    n = 300
    ids = np.arange(n, dtype=np.int64)
    src = np.repeat(ids, 3)
    dst = ((ids[:, None] * 31 + 7 + 101 * np.arange(3)) % n).reshape(-1)
    want = _local_pagerank(src, dst, n, iterations=3)
    out = _run(src, dst, n, str(tmp_path / "e1"), nodes=_nodes_ds(n), node_count=n)
    assert len(out) == n
    assert (out["node"].to_numpy() == np.arange(n)).all()
    assert (out["pr"].to_numpy() == want).all()


def test_pagerank_random_graphs_match_local(tmp_path):
    # randomized sweep: varied degree distributions incl. dangling
    # nodes and multi-edges, all bit-equal to the dense reference
    for seed in (1, 7, 42):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(20, 150))
        m = int(rng.integers(n, 6 * n))
        src = rng.integers(0, n, m).astype(np.int64)
        dst = rng.integers(0, n, m).astype(np.int64)
        want = _local_pagerank(src, dst, n, iterations=3)
        out = _run(src, dst, n, str(tmp_path / f"r{seed}"),
                   nodes=_nodes_ds(n), node_count=n)
        assert (out["pr"].to_numpy() == want).all(), seed


def test_pagerank_bucket_count_invariant(tmp_path):
    n = 200
    rng = np.arange(n, dtype=np.int64)
    src = np.repeat(rng, 2)
    dst = ((rng[:, None] * 17 + np.array([3, 11])) % n).reshape(-1)
    a = _run(src, dst, n, str(tmp_path / "b8"), num_buckets=8,
             nodes=_nodes_ds(n), node_count=n)
    b = _run(src, dst, n, str(tmp_path / "b16"), num_buckets=16,
             nodes=_nodes_ds(n), node_count=n)
    assert (a["pr"].to_numpy() == b["pr"].to_numpy()).all()


def test_pagerank_dangling_and_sourceless_nodes(tmp_path):
    # 0 -> 1 -> 2 ; node 2 dangles (no out-edges), node 0 has no in-links
    src = np.array([0, 1], dtype=np.int64)
    dst = np.array([1, 2], dtype=np.int64)
    want = _local_pagerank(src, dst, 3, iterations=4)
    out = _run(src, dst, 3, str(tmp_path / "dangle"), iterations=4,
               nodes=_nodes_ds(3), node_count=3)
    assert (out["pr"].to_numpy() == want).all()
    tel = SCALE * (DD - DN) // DD
    # the sourceless node holds exactly the teleport mass
    assert out["pr"].to_numpy()[0] == tel


def test_pagerank_node_discovery(tmp_path):
    # nodes omitted: vertex set discovered from the edges (5 appears
    # only as a dst)
    src = np.array([0, 1, 2], dtype=np.int64)
    dst = np.array([1, 2, 5], dtype=np.int64)
    out = _run(src, dst, 6, str(tmp_path / "disc"), iterations=2)
    assert sorted(out["node"].tolist()) == [0, 1, 2, 5]
    want = _local_pagerank(src, dst, 6, iterations=2)
    got = dict(zip(out["node"].tolist(), out["pr"].tolist()))
    for node, pr in got.items():
        assert pr == want[node]


def test_pagerank_star_concentrates_mass(tmp_path):
    # all nodes point at node 0: its rank dominates
    n = 50
    src = np.arange(1, n, dtype=np.int64)
    dst = np.zeros(n - 1, dtype=np.int64)
    out = _run(src, dst, n, str(tmp_path / "star"), iterations=3,
               nodes=_nodes_ds(n), node_count=n)
    prs = out.set_index("node")["pr"]
    assert prs.loc[0] > 10 * prs.loc[1]
    assert (prs.loc[1:] == prs.loc[1]).all()  # symmetric spokes tie exactly


def test_pagerank_out_of_vertex_set_dst_dropped(tmp_path):
    # edges pointing OUTSIDE the declared vertex set must not create
    # phantom rank rows (the SQL twin's LEFT JOIN onto r_{i-1} drops
    # those contributions) — non-contiguous node ids exercise it
    src = np.array([10, 20], dtype=np.int64)
    dst = np.array([20, 999], dtype=np.int64)  # 999 is not a node
    nodes = rd.from_arrow(
        pa.table({"node": np.array([10, 20], dtype=np.int64)})
    )
    out = _run(src, dst, 2, str(tmp_path / "phantom"), iterations=3,
               nodes=nodes, node_count=2)
    assert sorted(out["node"].tolist()) == [10, 20]
    tel = SCALE * (DD - DN) // DD
    prs = out.set_index("node")["pr"]
    # node 10 has no in-links: teleport only after round 1
    assert prs.loc[10] == tel
    # node 20 receives 10's full outflow each round; 20's own outflow
    # (to the non-node 999) vanishes.  Exact recurrence:
    r10, r20 = SCALE, SCALE
    for _ in range(3):
        r10, r20 = tel, tel + (r10 * DN) // DD
    assert prs.loc[20] == r20


def test_personalized_pagerank_matches_local(tmp_path):
    # random walk with restart from seeds {0, 1} over a ring+chords
    n = 60
    ids = np.arange(n, dtype=np.int64)
    src = np.concatenate([ids, ids])
    dst = np.concatenate([(ids + 1) % n, (ids * 7 + 3) % n])
    seeds = np.array([0, 1], dtype=np.int64)

    # local fixed-point PPR reference (teleport/init only on seeds)
    rank = np.where(np.isin(ids, seeds), SCALE, 0).astype(np.int64)
    outdeg = np.bincount(src, minlength=n).astype(np.int64)
    tel = SCALE * (DD - DN) // DD
    for _ in range(4):
        c = np.zeros(n, dtype=np.int64)
        per_src = (rank * DN) // (outdeg * DD)
        np.add.at(c, dst, per_src[src])
        rank = np.where(np.isin(ids, seeds), tel, 0) + c

    out = _run(src, dst, n, str(tmp_path / "ppr"), iterations=4,
               nodes=_nodes_ds(n), node_count=n, seeds=seeds)
    got = out.set_index("node")["pr"]
    assert (got.loc[ids].to_numpy() == rank).all()
    # seeds dominate their own neighborhood; far nodes hold little mass
    assert got.loc[0] > got.loc[30]


def test_weighted_pagerank_matches_local(tmp_path):
    rng = np.random.default_rng(9)
    n, m = 80, 400
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    w = rng.integers(1, 9, m).astype(np.int64)

    # local dense weighted fixed-point reference
    rank = np.full(n, SCALE, dtype=np.int64)
    Wsum = np.zeros(n, dtype=np.int64)
    np.add.at(Wsum, src, w)
    tel = SCALE * (DD - DN) // DD
    for _ in range(3):
        c = np.zeros(n, dtype=np.int64)
        ce = (rank[src] * DN * w) // (DD * Wsum[src])
        np.add.at(c, dst, ce)
        rank = tel + c

    edges = rd.from_arrow(
        pa.table({"src": src, "dst": dst, "w": w})
    )
    out = (
        pagerank(edges, str(tmp_path / "wpr"), nodes=_nodes_ds(n),
                 node_count=n, iterations=3, weight_col="w")
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert (out["pr"].to_numpy() == rank).all()
    # weight ≡ 1 equals the unweighted variant exactly
    ones = rd.from_arrow(
        pa.table({"src": src, "dst": dst, "w": np.ones(m, np.int64)})
    )
    a = pagerank(ones, str(tmp_path / "w1"), nodes=_nodes_ds(n),
                 node_count=n, iterations=3, weight_col="w").to_pandas()
    b = pagerank(rd.from_arrow(pa.table({"src": src, "dst": dst})),
                 str(tmp_path / "w0"), nodes=_nodes_ds(n),
                 node_count=n, iterations=3).to_pandas()
    pd_a = a.sort_values("node")["pr"].to_numpy()
    pd_b = b.sort_values("node")["pr"].to_numpy()
    assert (pd_a == pd_b).all()

    # weights < 1 rejected at layout time
    bad = rd.from_arrow(
        pa.table({"src": src[:3], "dst": dst[:3],
                  "w": np.array([0, 1, 2], np.int64)})
    )
    with pytest.raises(Exception, match="weights must be >= 1"):
        pagerank(bad, str(tmp_path / "wbad"), nodes=_nodes_ds(n),
                 node_count=n, weight_col="w")


def test_triangle_count_matches_brute(ray_session):
    from rayraster.graph import triangle_count

    rng = np.random.default_rng(5)
    n, m = 120, 900
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    adj = np.zeros((n, n), dtype=np.int64)
    for s, d in zip(src, dst):
        if s != d:
            adj[s, d] = adj[d, s] = 1
    want = int(np.trace(adj @ adj @ adj)) // 6
    got = triangle_count(_edges_ds(src, dst), num_buckets=8, edge_count=m)
    assert got == want and want > 100  # dense enough to be meaningful
    # different bucket counts agree (exchange-partitioning invariance)
    assert triangle_count(_edges_ds(src, dst), num_buckets=16) == want
    # the fully partitioned path (forced below the broadcast threshold)
    # returns the identical count
    assert triangle_count(
        _edges_ds(src, dst), num_buckets=8, edge_count=m,
        broadcast_threshold=0,
    ) == want


def test_triangle_count_shapes(ray_session):
    from rayraster.graph import triangle_count

    # star: no triangles (also exercises the degree-skew orientation —
    # the hub is every edge's HEAVY endpoint, so it centers no wedges)
    star_src = np.zeros(30, np.int64)
    star_dst = np.arange(1, 31, dtype=np.int64)
    assert triangle_count(_edges_ds(star_src, star_dst), num_buckets=4) == 0
    # single triangle, given as directed cycle + duplicates + self-loop
    src = np.array([0, 1, 2, 2, 0, 1, 1], dtype=np.int64)
    dst = np.array([1, 2, 0, 0, 1, 0, 1], dtype=np.int64)
    assert triangle_count(_edges_ds(src, dst), num_buckets=4) == 1
    import pytest

    with pytest.raises(Exception, match="2\\^31"):
        triangle_count(
            _edges_ds(np.array([1 << 31], np.int64), np.array([0], np.int64)),
            num_buckets=4,
        )


def _local_k_core(src, dst, n, k):
    """Dense peeling reference."""
    adj = np.zeros((n, n), dtype=bool)
    for s, d in zip(src, dst):
        if s != d:
            adj[s, d] = adj[d, s] = True
    alive = np.ones(n, dtype=bool)
    while True:
        deg = (adj[alive][:, alive]).sum(axis=1)
        idx = np.flatnonzero(alive)
        die = idx[deg < k]
        if len(die) == 0:
            return sorted(idx[deg >= k].tolist())
        alive[die] = False


def test_k_core_matches_local_peeling(ray_session):
    from rayraster.graph import k_core

    rng = np.random.default_rng(17)
    n, m = 100, 350
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    for k in (2, 3, 5):
        got = sorted(
            k_core(_edges_ds(src, dst), k=k, num_buckets=8, edge_count=m)
            .to_pandas()["node"].tolist()
        )
        assert got == _local_k_core(src, dst, n, k), k


def test_k_core_shapes(ray_session):
    from rayraster.graph import k_core

    # a ring is exactly its own 2-core; any tree has an empty 2-core
    n = 20
    ids = np.arange(n, dtype=np.int64)
    ring = _edges_ds(ids, (ids + 1) % n)
    got = sorted(k_core(ring, k=2, num_buckets=4).to_pandas()["node"].tolist())
    assert got == list(range(n))
    # star = a tree: peeling the leaves kills the hub too
    star = _edges_ds(np.zeros(9, np.int64), np.arange(1, 10, dtype=np.int64))
    assert k_core(star, k=2, num_buckets=4).count() == 0
    # a graph converging on EXACTLY the last allowed kill-round must
    # succeed (the bound allows max_rounds kills + one fixpoint check)
    assert k_core(star, k=2, num_buckets=4, max_rounds=1).count() == 0
    # null endpoints are no adjacency — not an INT64_MIN phantom node
    nul = rd.from_arrow(pa.table({
        "src": pa.array([1, 2, 3], type=pa.int64()),
        "dst": pa.array([None, None, None], type=pa.int64()),
    }))
    assert k_core(nul, k=1, num_buckets=4).count() == 0
    import pytest

    with pytest.raises(ValueError, match="k must be"):
        k_core(ring, k=0)


def test_pagerank_partial_sidecar_rebuilt(tmp_path):
    # a crash mid-sidecar-build leaves some deg files and no _DONE
    # marker: the next run must rebuild, not silently treat missing
    # files as empty buckets
    import glob
    import os

    n = 80
    ids = np.arange(n, dtype=np.int64)
    src, dst = ids, (ids * 13 + 5) % n
    p = str(tmp_path / "sidecar")
    a = _run(src, dst, n, p, nodes=_nodes_ds(n), node_count=n)
    degs = sorted(glob.glob(os.path.join(p, "_deg", "deg_*.parquet")))
    assert degs and os.path.exists(os.path.join(p, "_deg", "_DONE"))
    os.remove(degs[0])
    os.remove(os.path.join(p, "_deg", "_DONE"))
    b = _run(src, dst, n, p, nodes=_nodes_ds(n), node_count=n)
    assert (a["pr"].to_numpy() == b["pr"].to_numpy()).all()


def test_pagerank_layout_reuse_and_validation(tmp_path):
    n = 40
    ids = np.arange(n, dtype=np.int64)
    src, dst = ids, (ids + 1) % n
    p = str(tmp_path / "ring")
    a = _run(src, dst, n, p, nodes=_nodes_ds(n), node_count=n)
    # second run reuses the layout (manifest matches) — identical result
    b = _run(src, dst, n, p, nodes=_nodes_ds(n), node_count=n)
    assert (a["pr"].to_numpy() == b["pr"].to_numpy()).all()
    with pytest.raises(ValueError, match="iterations"):
        pagerank(_edges_ds(src, dst), p, iterations=0)
    with pytest.raises(ValueError, match="damping"):
        pagerank(_edges_ds(src, dst), p, damping_num=100)
    with pytest.raises(ValueError, match="overflow"):
        pagerank(_edges_ds(src, dst), p, nodes=_nodes_ds(n), node_count=n,
                 scale=2**60)


def test_k_core_broadcast_and_partitioned_drops_agree(ray_session):
    """The per-round drop has two shapes (broadcast is_in filter vs
    two anti bucket joins, picked by dying count) — same core either
    way."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rayraster.graph import k_core

    rng = np.random.default_rng(5)
    src = rng.integers(0, 200, 900).astype(np.int64)
    dst = rng.integers(0, 200, 900).astype(np.int64)
    edges = pa.table({"src": src, "dst": dst})

    def run(thresh):
        out = k_core(rd.from_arrow(edges), 4, num_buckets=8,
                     broadcast_threshold=thresh)
        return sorted(r["node"] for r in out.take_all())

    assert run(10**6) == run(0)  # all-broadcast == all-bucket-join


def test_bfs_depths_matches_local_reference(ray_session):
    """Multi-source BFS hop distances equal a local queue BFS, through
    BOTH gather shapes (broadcast frontier vs semi bucket-joins)."""
    import collections

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rayraster.graph import bfs_depths

    rng = np.random.default_rng(17)
    src = rng.integers(0, 120, 400).astype(np.int64)
    dst = rng.integers(0, 120, 400).astype(np.int64)
    edges = pa.table({"src": src, "dst": dst})
    adj: dict[int, set] = collections.defaultdict(set)
    for a, b in zip(src.tolist(), dst.tolist()):
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    want = {0: 0, 5: 0}
    dq = collections.deque([0, 5])
    while dq:
        u = dq.popleft()
        for v in adj[u]:
            if v not in want:
                want[v] = want[u] + 1
                dq.append(v)

    def run(thresh):
        out = bfs_depths(rd.from_arrow(edges), [0, 5], num_buckets=8,
                         broadcast_threshold=thresh)
        return {r["node"]: r["depth"] for r in out.take_all()}

    assert run(10**6) == want   # broadcast gather
    assert run(0) == want       # bucket-join gather
    # isolated node never appears
    assert 10**9 not in want
    with pytest.raises(ValueError, match="at least one source"):
        bfs_depths(rd.from_arrow(edges), [])


def test_k_core_all_round_shapes_agree(ray_session):
    """The peel must be identical through every round shape: pure
    driver-state (edge_count seeds the bound), dataset-mode degrees +
    anti-join drops (threshold 0), and the mixed driver-degrees →
    dataset-drop path (threshold between shell size and node count)."""
    from rayraster.graph import k_core

    rng = np.random.default_rng(41)
    n, m = 150, 500
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    want = _local_k_core(src, dst, n, 3)

    def run(**kw):
        return sorted(
            k_core(_edges_ds(src, dst), k=3, num_buckets=4, **kw)
            .to_pandas()["node"].tolist()
        )

    assert run(edge_count=m) == want                      # driver rounds
    assert run(broadcast_threshold=0) == want             # all-dataset
    assert run(edge_count=m, broadcast_threshold=2) == want  # mixed


def _local_sssp(src, dst, w, sources, rounds):
    """Synchronous Bellman-Jacobi in plain Python — exact per-round
    semantics (<= r edges after round r), Python ints so no overflow."""
    dist = {int(s): 0 for s in sources}
    for _ in range(rounds):
        nd = dict(dist)
        for a, b, ww in zip(src, dst, w):
            a, b, ww = int(a), int(b), int(ww)
            if a in dist:
                c = dist[a] + ww
                if b not in nd or c < nd[b]:
                    nd[b] = c
        if nd == dist:
            break
        dist = nd
    return dist


def test_sssp_matches_local_reference(ray_session):
    from rayraster.graph import sssp

    rng = np.random.default_rng(17)
    n, m = 200, 900
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    w = rng.integers(0, 25, m).astype(np.int64)
    edges = rd.from_arrow(
        pa.table({"src": src, "dst": dst, "w": w})
    ).repartition(6)
    want = _local_sssp(src, dst, w, [0, 3], rounds=40)

    got = {
        r["node"]: r["dist"]
        for r in sssp(edges, [0, 3], rounds=40).take_all()
    }
    assert got == want


def test_sssp_shapes_agree_even_unconverged(ray_session):
    """Driver-state and partitioned rounds are the SAME synchronous
    relaxation — bit-equal per round, including before convergence."""
    from rayraster.graph import sssp

    rng = np.random.default_rng(23)
    n, m = 120, 500
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    w = rng.integers(1, 9, m).astype(np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst, "w": w}))

    for rounds in (2, 5):
        a = sorted(
            (r["node"], r["dist"])
            for r in sssp(edges, [7], rounds=rounds).take_all()
        )
        b = sorted(
            (r["node"], r["dist"])
            for r in sssp(
                edges, [7], rounds=rounds, broadcast_threshold=1
            ).take_all()
        )
        c = sorted(  # edge-gather fast path (edge_count known + small)
            (r["node"], r["dist"])
            for r in sssp(edges, [7], rounds=rounds, edge_count=m).take_all()
        )
        assert a == b == c == sorted(
            _local_sssp(src, dst, w, [7], rounds).items()
        )


def test_sssp_validations(ray_session):
    from rayraster.graph import sssp

    edges = rd.from_arrow(
        pa.table({"src": pa.array([0], type=pa.int64()),
                  "dst": pa.array([1], type=pa.int64()),
                  "w": pa.array([-1], type=pa.int64())})
    )
    with pytest.raises(ValueError, match="at least one source"):
        sssp(edges, [])
    with pytest.raises(ValueError, match="rounds"):
        sssp(edges, [0], rounds=0)
    with pytest.raises(Exception, match="weights must be >= 0"):
        sssp(edges, [0]).materialize()
    big = rd.from_arrow(
        pa.table({"src": pa.array([0, 1], type=pa.int64()),
                  "dst": pa.array([1, 2], type=pa.int64()),
                  "w": pa.array([2**62, 2**62], type=pa.int64())})
    )
    with pytest.raises(Exception, match="overflow"):
        sssp(big, [0], rounds=3).materialize()


def _lpa_local(edges, rounds):
    """Reference semi-synchronous LPA with (count desc, label asc)."""
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    lab = {v: v for v in adj}
    for _ in range(rounds):
        new = {}
        for v in adj:
            c = Counter(lab[u] for u in adj[v])
            best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        lab = new
    return lab


def test_label_propagation_matches_local_reference(ray_session):
    import ray.data as rd

    from rayraster.graph import label_propagation

    rng = np.random.default_rng(8)
    # two planted dense blobs + a sparse bridge
    edges = []
    for base in (0, 40):
        for _ in range(220):
            a, b = rng.integers(base, base + 40, 2)
            if a != b:
                edges.append((int(a), int(b)))
    edges.append((5, 45))  # bridge
    t = pa.table({"src": pa.array([e[0] for e in edges], type=pa.int64()),
                  "dst": pa.array([e[1] for e in edges], type=pa.int64())})
    for rounds in (1, 3):
        want = _lpa_local(edges, rounds)
        got = (
            label_propagation(rd.from_arrow(t).repartition(5), rounds=rounds)
            .to_pandas().set_index("node")["lab"].to_dict()
        )
        assert got == want, rounds
    # partition invariance
    g1 = label_propagation(rd.from_arrow(t).repartition(1), rounds=2).to_pandas()
    g7 = label_propagation(rd.from_arrow(t).repartition(7), rounds=2).to_pandas()
    assert sorted(zip(g1.node, g1.lab)) == sorted(zip(g7.node, g7.lab))


def test_label_propagation_star_and_validation(ray_session):
    import ray.data as rd

    from rayraster.graph import label_propagation

    # star: after round 1 every leaf takes the hub's id... the hub
    # takes its min leaf; round 2 re-centers — pinned by the local ref
    edges = [(100, i) for i in range(5)]
    t = pa.table({"src": pa.array([e[0] for e in edges], type=pa.int64()),
                  "dst": pa.array([e[1] for e in edges], type=pa.int64())})
    for rounds in (1, 2):
        want = _lpa_local(edges, rounds)
        got = (
            label_propagation(rd.from_arrow(t), rounds=rounds)
            .to_pandas().set_index("node")["lab"].to_dict()
        )
        assert got == want
    with pytest.raises(ValueError, match="rounds"):
        label_propagation(rd.from_arrow(t), rounds=0)


def _hits_local(edges, rounds):
    from collections import defaultdict

    e = sorted(set(edges))
    h = defaultdict(lambda: 1)
    a = {}
    for r in range(rounds):
        a = defaultdict(int)
        for s, d in e:
            a[d] += h[s]
        h2 = defaultdict(int)
        for s, d in e:
            h2[s] += a[d]
        h = h2
    nodes = {v for st in e for v in st}
    return {v: (h.get(v, 0), a.get(v, 0)) for v in nodes}


def test_hits_matches_local_reference(ray_session):
    import ray.data as rd

    from rayraster.graph import hits

    rng = np.random.default_rng(19)
    edges = [tuple(map(int, rng.integers(0, 60, 2))) for _ in range(400)]
    edges += [(i, 7) for i in range(20)]  # a planted authority
    edges += [(3, i) for i in range(30, 50)]  # a planted hub
    t = pa.table({"src": pa.array([e[0] for e in edges], type=pa.int64()),
                  "dst": pa.array([e[1] for e in edges], type=pa.int64())})
    for rounds in (1, 2):
        want = _hits_local(edges, rounds)
        got = {
            r.node: (r.hub, r.auth)
            for r in hits(rd.from_arrow(t).repartition(5), rounds=rounds)
            .to_pandas().itertuples()
        }
        assert got == want, rounds
    got2 = hits(rd.from_arrow(t), rounds=2).to_pandas()
    # the planted authority has the top auth score, the hub the top hub
    assert got2.sort_values("auth").iloc[-1]["node"] == 7
    assert got2.sort_values("hub").iloc[-1]["node"] == 3


def test_hits_overflow_guard_and_validation(ray_session):
    import ray.data as rd

    from rayraster.graph import hits

    # complete bipartite 200×200: scores blow past 2^46 within 5 rounds
    n = 200
    src = np.repeat(np.arange(n, dtype=np.int64), n)
    dst = np.tile(np.arange(n, 2 * n, dtype=np.int64), n)
    t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    with pytest.raises(Exception, match="wrap-safe bound"):
        hits(rd.from_arrow(t), rounds=5).to_pandas()
    with pytest.raises(ValueError, match="rounds"):
        hits(rd.from_arrow(t), rounds=0)


def _scc_brute(edges, nodes):
    """Reachability-closure reference: scc(v) = min{u : u↔v} ∪ {v}."""
    adj = {v: set() for v in nodes}
    for s, d in edges:
        adj[s].add(d)
    reach = {}
    for v in nodes:
        seen, st = {v}, [v]
        while st:
            u = st.pop()
            for w in adj.get(u, ()):
                if w not in seen:
                    seen.add(w)
                    st.append(w)
        reach[v] = seen
    return {
        v: min([u for u in nodes if v in reach[u] and u in reach[v]] + [v])
        for v in nodes
    }


def test_scc_local_matches_brute(ray_session):
    import ray.data as rd

    from rayraster.graph import scc

    rng = np.random.default_rng(23)
    edges = sorted({tuple(map(int, rng.integers(0, 40, 2))) for _ in range(90)})
    nodes = sorted({v for e in edges for v in e})
    want = _scc_brute(edges, nodes)
    t = pa.table({"src": pa.array([e[0] for e in edges], type=pa.int64()),
                  "dst": pa.array([e[1] for e in edges], type=pa.int64())})
    got = {r.node: r.scc for r in scc(rd.from_arrow(t), engine="local")
           .to_pandas().itertuples()}
    assert got == want


def test_scc_distributed_matches_local(ray_session):
    import ray.data as rd

    from rayraster.graph import scc

    # cycles of varied length + 2-level tails + a self-loop + a DAG part
    edges = []
    for b in range(4):
        base, c = 20 * b, 3 + b
        edges += [(base + r, base + (r + 1) % c) for r in range(c)]
        edges += [(base + c + j, base + (j % c)) for j in range(4)]   # tails→cycle
        edges += [(base + c + 10 + j, base + c + j) for j in range(2)]  # 2nd level
    edges += [(99, 99), (95, 96), (96, 97)]  # self-loop + pure chain
    t = pa.table({"src": pa.array([e[0] for e in edges], type=pa.int64()),
                  "dst": pa.array([e[1] for e in edges], type=pa.int64())})
    ds = rd.from_arrow(t)
    local = scc(ds, engine="local").to_pandas().sort_values("node")
    dist = scc(ds.repartition(5), engine="distributed", num_buckets=4) \
        .to_pandas().sort_values("node")
    assert local.values.tolist() == dist.values.tolist()
    got = dict(zip(local.node, local.scc))
    assert got[99] == 99            # self-loop singleton
    assert got[95] == 95 and got[96] == 96 and got[97] == 97  # chain
    for b in range(4):
        base, c = 20 * b, 3 + b
        assert all(got[base + r] == base for r in range(c))   # cycles collapse
        assert got[base + c + 1] == base + c + 1              # tails singleton


def test_scc_validation_and_empty(ray_session):
    import ray.data as rd

    from rayraster.graph import scc

    t = pa.table({"src": pa.array([], type=pa.int64()),
                  "dst": pa.array([], type=pa.int64())})
    assert scc(rd.from_arrow(t), engine="local").count() == 0
    with pytest.raises(ValueError, match="engine"):
        scc(rd.from_arrow(t), engine="bogus")


def test_reciprocity_exact(ray_session):
    import ray.data as rd

    from rayraster.graph import reciprocity

    edges = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2), (4, 4), (0, 1), (5, 0)]
    t = pa.table({"src": pa.array([e[0] for e in edges], type=pa.int64()),
                  "dst": pa.array([e[1] for e in edges], type=pa.int64())})
    r = reciprocity(rd.from_arrow(t).repartition(3), num_buckets=4)
    # distinct non-self edges: 01 10 12 23 32 50 -> 6; mutual: 01,10,23,32
    assert r == {"n_edges": 6, "mutual": 4, "reciprocity": 4 / 6}


def test_degree_moments_matches_brute(ray_session):
    import ray.data as rd

    from rayraster.graph import degree_moments

    rng = np.random.default_rng(3)
    edges = {tuple(sorted(map(int, rng.integers(0, 30, 2)))) for _ in range(80)}
    edges = sorted(e for e in edges if e[0] != e[1])
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    s1 = sum(deg.values())
    s2 = sum(d * d for d in deg.values())
    s3 = sum(d ** 3 for d in deg.values())
    se = sum(deg[a] * deg[b] for a, b in edges)
    m = len(edges)
    t = pa.table({"src": pa.array([e[0] for e in edges], type=pa.int64()),
                  "dst": pa.array([e[1] for e in edges], type=pa.int64())})
    got = degree_moments(rd.from_arrow(t).repartition(4), num_buckets=4)
    assert (got["m"], got["s1"], got["s2"], got["s3"], got["se"]) == (
        m, s1, s2, s3, se)
    num = 4 * m * se - s2 * s2
    den = 2 * m * s3 - s2 * s2
    assert got["assortativity"] == num / den


def _support_brute(edges):
    und = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    nbr = {}
    for a, b in und:
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    return {(a, b): len(nbr[a] & nbr[b]) for a, b in und}


def test_edge_support_matches_brute_both_paths(ray_session):
    import ray.data as rd

    from rayraster.graph import edge_support, triangle_count

    rng = np.random.default_rng(31)
    edges = [tuple(map(int, rng.integers(0, 25, 2))) for _ in range(120)]
    edges += [(0, i) for i in range(1, 12)] + [(i, i + 1) for i in range(1, 11)]
    want = _support_brute(edges)
    t = pa.table({"src": pa.array([e[0] for e in edges], type=pa.int64()),
                  "dst": pa.array([e[1] for e in edges], type=pa.int64())})
    ds = rd.from_arrow(t).repartition(4)
    for thr in (2_000_000, 0):  # broadcast path / partitioned path
        got = {
            (r.lo, r.hi): r.support
            for r in edge_support(ds, num_buckets=4, broadcast_threshold=thr)
            .to_pandas().itertuples()
        }
        assert got == want, thr
    # sum of supports = 3 × triangle count (each triangle has 3 edges)
    assert sum(want.values()) == 3 * triangle_count(ds, num_buckets=4)


def _truss_brute(edges, k):
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    while True:
        nbr = {}
        for a, b in und:
            nbr.setdefault(a, set()).add(b)
            nbr.setdefault(b, set()).add(a)
        sup = {(a, b): len(nbr[a] & nbr[b]) for a, b in und}
        drop = {e for e, s in sup.items() if s < k - 2}
        if not drop:
            return {e: sup[e] for e in und}
        und -= drop


def test_k_truss_matches_brute(ray_session):
    import ray.data as rd

    from rayraster.graph import k_truss

    rng = np.random.default_rng(41)
    edges = [tuple(map(int, rng.integers(0, 18, 2))) for _ in range(70)]
    # a planted clique K5 on 20..24 survives any k <= 5
    import itertools
    edges += list(itertools.combinations(range(20, 25), 2))
    # a triangle chain that 4-truss peels away
    edges += [(30, 31), (31, 32), (30, 32), (32, 33), (31, 33)]
    t = pa.table({"src": pa.array([e[0] for e in edges], type=pa.int64()),
                  "dst": pa.array([e[1] for e in edges], type=pa.int64())})
    ds = rd.from_arrow(t).repartition(3)
    for k in (3, 4, 5):
        want = _truss_brute(edges, k)
        got = {
            (r.lo, r.hi): r.support
            for r in k_truss(ds, k, num_buckets=4).to_pandas().itertuples()
        }
        assert got == want, k
    # K5 edges survive k=5 with support exactly 3
    got5 = {
        (r.lo, r.hi): r.support
        for r in k_truss(ds, 5, num_buckets=4).to_pandas().itertuples()
    }
    for a, b in itertools.combinations(range(20, 25), 2):
        assert got5[(a, b)] == 3
    with pytest.raises(ValueError, match="k must be"):
        k_truss(ds, 1)


def test_bfs_converges_at_exactly_max_depth(ray_session):
    """Regression: a path graph whose deepest node sits at exactly
    max_depth hops must converge (the loop previously exhausted and
    raised 'did not converge' after computing the full answer)."""
    import ray.data as rd

    from rayraster.graph import bfs_depths

    edges = pa.table({"src": pa.array(np.arange(5, dtype=np.int64)),
                      "dst": pa.array(np.arange(1, 6, dtype=np.int64))})
    got = bfs_depths(rd.from_arrow(edges), [0], max_depth=5).to_pandas()
    got = got.sort_values("node").reset_index(drop=True)
    assert got.depth.tolist() == [0, 1, 2, 3, 4, 5]
    # one hop DEEPER than max_depth still raises
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="converge"):
        bfs_depths(rd.from_arrow(edges), [0], max_depth=4).to_pandas()


def test_pagerank_null_dst_produces_no_phantom_node(ray_session):
    """Regression: with nodes=None, a NULL edge endpoint survived
    distinct() as its own group and entered the vertex set."""
    import ray.data as rd

    from rayraster.graph import pagerank

    import tempfile

    t = pa.table({"src": pa.array([0, 1, 2], type=pa.int64()),
                  "dst": pa.array([1, 2, None], type=pa.int64())})
    with tempfile.TemporaryDirectory() as d:
        got = pagerank(rd.from_arrow(t), f"{d}/edges",
                       iterations=2).to_pandas()
    assert got.node.notna().all()
    assert sorted(got.node) == [0, 1, 2]


def test_sssp_ignores_null_endpoint_rows(ray_session):
    """Regression: a null src/dst row float-promoted the edge batch,
    corrupting ids and fabricating an INT64_MIN phantom source."""
    import ray.data as rd

    from rayraster.graph import sssp

    t = pa.table({"src": pa.array([0, 1, None], type=pa.int64()),
                  "dst": pa.array([1, 2, 5], type=pa.int64()),
                  "w": pa.array([3, 4, 1], type=pa.int64())})
    got = sssp(rd.from_arrow(t), [0], weight_col="w").to_pandas()
    got = got.sort_values("node").reset_index(drop=True)
    assert got.node.tolist() == [0, 1, 2]
    assert got.dist.tolist() == [0, 3, 7]


def test_degree_moments_rejects_wrap_scale_degrees():
    """The per-batch fold must refuse degrees whose cube exceeds
    int64 (a wrapped d^3 can land positive, so the old sign check
    passed on corrupt values)."""
    import pytest as _pytest

    from rayraster import graph as g

    d = pa.table({"d": pa.array([3_000_000], type=pa.int64())})
    # drive the module-level rule through a minimal fold twin
    dn = d["d"].to_numpy(zero_copy_only=False)
    assert int(dn.max()) >= (1 << 21)  # the guard's domain
    edges = pa.table({"src": pa.array([0], type=pa.int64()),
                      "dst": pa.array([1], type=pa.int64())})
    # tiny sanity: normal graphs still fold exactly
    import ray.data as rd

    out = g.degree_moments(rd.from_arrow(edges))
    assert out["s1"] == 2 and out["s2"] == 2 and out["s3"] == 2
