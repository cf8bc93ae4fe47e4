"""Property tests for the S2-style spherical cell index
(rayraster/s2cell.py): Hilbert-curve invariants, hierarchy/nesting,
id packing, float parity with the DuckDB twin, and the Ray
aggregate/rollup stages."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from rayraster import s2cell as s2
from rayraster.geo import geocode_id


def _geo(n=5000, start=0):
    ids = np.arange(start, start + n, dtype=np.int64)
    x, y = geocode_id(ids)
    return ids, x, y


# --------------------------------------------------------------------------
# Hilbert curve
# --------------------------------------------------------------------------


def test_hilbert_bijective_and_adjacent():
    L = 4
    ii, jj = np.meshgrid(np.arange(1 << L), np.arange(1 << L))
    i, j = ii.ravel(), jj.ravel()
    d = s2.hilbert_d(L, i, j)
    assert sorted(d.tolist()) == list(range((1 << L) ** 2))
    # consecutive positions are rook-adjacent cells (the locality
    # property the id-ordered parquet layout relies on)
    order = np.argsort(d)
    steps = np.abs(np.diff(i[order])) + np.abs(np.diff(j[order]))
    assert (steps == 1).all()


def test_hilbert_self_similarity():
    rng = np.random.default_rng(7)
    for Lf, Lc in [(7, 5), (10, 4), (30, 29)]:
        i = rng.integers(0, 1 << Lf, 5000)
        j = rng.integers(0, 1 << Lf, 5000)
        dl = Lf - Lc
        assert np.array_equal(
            s2.hilbert_d(Lf, i, j) >> (2 * dl),
            s2.hilbert_d(Lc, i >> dl, j >> dl),
        )


def test_hilbert_roundtrip():
    rng = np.random.default_rng(11)
    for L in (1, 3, 8, 15):
        d = rng.integers(0, 1 << (2 * L), 4000)
        i, j = s2.hilbert_ij(L, d)
        assert np.array_equal(s2.hilbert_d(L, i, j), d)


# --------------------------------------------------------------------------
# sphere → face/ST
# --------------------------------------------------------------------------


def test_face_centers():
    lon = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    lat = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
    face = s2.xyz_to_face(*s2.lonlat_to_xyz(lon, lat))
    assert face.tolist() == [0, 1, 2, 3, 4, 5]


def test_uv_in_range_and_st_clamped():
    _, x, y = _geo(20000)
    px, py, pz = s2.lonlat_to_xyz(x, y)
    face = s2.xyz_to_face(px, py, pz)
    u, v = s2.face_uv(face, px, py, pz)
    eps = 1e-12
    assert (np.abs(u) <= 1 + eps).all() and (np.abs(v) <= 1 + eps).all()
    s = s2.uv_to_st(u)
    assert (s >= 0).all() and (s <= 1).all()
    # exact end-points land in the edge cells, not out of range
    assert s2.st_to_ij(np.array([0.0, 1.0]), 5).tolist() == [0, 31]


def test_st_quadratic_continuous_at_zero():
    s = s2.uv_to_st(np.array([-1e-300, 0.0, 1e-300]))
    assert np.allclose(s, 0.5, atol=1e-15)


# --------------------------------------------------------------------------
# id packing / hierarchy
# --------------------------------------------------------------------------


def test_id_pack_decode_roundtrip():
    rng = np.random.default_rng(3)
    for L in (0, 1, 5, 17, 30):
        face = rng.integers(0, 6, 3000)
        d = rng.integers(0, 1 << (2 * L) if L else 1, 3000)
        ids = s2.s2_cell_id(face, d, L)
        assert np.array_equal(s2.s2_level(ids), np.full(3000, L))
        assert np.array_equal(s2.s2_face(ids), face)
        assert np.array_equal(s2.s2_pos(ids), d)
        if L:
            # parent = prefix: re-encode at L-1 with d>>2
            assert np.array_equal(
                s2.s2_parent(ids), s2.s2_cell_id(face, d >> 2, L - 1)
            )


def test_parent_matches_direct_coarse_encode():
    _, x, y = _geo(30000)
    px, py, pz = s2.lonlat_to_xyz(x, y)
    face = s2.xyz_to_face(px, py, pz)
    u, v = s2.face_uv(face, px, py, pz)
    sA, tA = s2.uv_to_st(u), s2.uv_to_st(v)
    i7 = s2.st_to_ij(sA, 7)
    j7 = s2.st_to_ij(tA, 7)
    id7 = s2.s2_cell_id(face, s2.hilbert_d(7, i7, j7), 7)
    i5 = s2.st_to_ij(sA, 5)
    j5 = s2.st_to_ij(tA, 5)
    id5 = s2.s2_cell_id(face, s2.hilbert_d(5, i5, j5), 5)
    assert np.array_equal(s2.s2_parent(id7, 2), id5)
    assert np.array_equal(i7 >> 2, i5)


def test_ids_are_level_sortable_within_face():
    # within one face and level, id order == Hilbert order (locality)
    L = 6
    d = np.arange(1 << (2 * L))
    ids = s2.s2_cell_id(np.full_like(d, 2), d, L)
    assert (np.diff(ids) > 0).all()


# --------------------------------------------------------------------------
# SQL twin parity (the r6 oracle's building block)
# --------------------------------------------------------------------------


def test_trig_parity_with_duckdb():
    _, x, y = _geo(20000)
    con = duckdb.connect()
    con.register("t", pa.table({"x": x, "y": y}))
    got = con.execute(
        "SELECT cos(radians(y)) * cos(radians(x)) AS px, "
        "cos(radians(y)) * sin(radians(x)) AS py, sin(radians(y)) AS pz FROM t"
    ).fetch_arrow_table()
    px, py, pz = s2.lonlat_to_xyz(x, y)
    assert np.array_equal(got["px"].to_numpy(), px)
    assert np.array_equal(got["py"].to_numpy(), py)
    assert np.array_equal(got["pz"].to_numpy(), pz)


def test_sql_cte_matches_numpy_encode():
    ids, x, y = _geo(25000)
    nch = (ids % 997).astype(np.int64)
    L = 5
    px, py, pz = s2.lonlat_to_xyz(x, y)
    face = s2.xyz_to_face(px, py, pz)
    u, v = s2.face_uv(face, px, py, pz)
    i = s2.st_to_ij(s2.uv_to_st(u), L)
    j = s2.st_to_ij(s2.uv_to_st(v), L)
    want = s2.s2_cell_id(face, s2.hilbert_d(L, i, j), L)
    con = duckdb.connect()
    con.register("src", pa.table({"doc_id": ids, "n_chars": nch, "x": x, "y": y}))
    res = con.execute(
        f"WITH RECURSIVE pts AS (SELECT * FROM src),\n{s2.s2_sql_cte(L)}\n"
        "SELECT doc_id, face, ci, cj, cell_id FROM s2c ORDER BY doc_id"
    ).fetch_arrow_table()
    assert np.array_equal(res["face"].to_numpy(), face)
    assert np.array_equal(res["ci"].to_numpy(), i)
    assert np.array_equal(res["cj"].to_numpy(), j)
    assert np.array_equal(res["cell_id"].to_numpy(), want)


# --------------------------------------------------------------------------
# Ray stages
# --------------------------------------------------------------------------


def test_s2_encode_batch_kernel():
    ids, x, y = _geo(4000)
    t = s2.s2_encode(pa.table({"doc_id": ids, "x": x, "y": y}), 9)
    assert {"s2_face", "s2_i", "s2_j", "s2_id"} <= set(t.schema.names)
    assert np.array_equal(s2.s2_level(t["s2_id"].to_numpy()), np.full(4000, 9))
    # i/j columns agree with the packed id's Hilbert position
    d = s2.s2_pos(t["s2_id"].to_numpy())
    ri, rj = s2.hilbert_ij(9, d)
    assert np.array_equal(ri, t["s2_i"].to_numpy())
    assert np.array_equal(rj, t["s2_j"].to_numpy())


def test_s2_aggregate_and_rollup_conserve_mass(ray_session):
    import ray.data as rd

    ids, x, y = _geo(12000)
    nch = (ids % 1013).astype(np.int64)
    ds = rd.from_arrow(
        pa.table({"doc_id": ids, "x": x, "y": y, "n_chars": nch})
    ).repartition(8)
    fine = s2.s2_aggregate(ds, 7, ["n_chars"]).materialize()
    ft = pa.concat_tables(
        [b for b in fine.iter_batches(batch_format="pyarrow")], promote_options="default"
    )
    assert ft["num_cell"].to_numpy().sum() == 12000
    assert ft["sum_n_chars"].to_numpy().sum() == nch.sum()
    rolled = s2.s2_rollup(fine, ["sum_n_chars"], levels_up=2)
    rt = pa.concat_tables(
        [b for b in rolled.iter_batches(batch_format="pyarrow")],
        promote_options="default",
    )
    assert rt["num_cell"].to_numpy().sum() == 12000
    assert rt["sum_n_chars"].to_numpy().sum() == nch.sum()
    assert set(np.unique(s2.s2_level(rt["s2_id"].to_numpy()))) == {5}
    # rollup of the fine aggregate == direct coarse aggregate
    direct = s2.s2_aggregate(ds, 5, ["n_chars"])
    dt = pa.concat_tables(
        [b for b in direct.iter_batches(batch_format="pyarrow")],
        promote_options="default",
    )
    a = rt.select(["s2_id", "num_cell", "sum_n_chars"]).to_pandas()
    b = dt.select(["s2_id", "num_cell", "sum_n_chars"]).to_pandas()
    a = a.sort_values("s2_id").reset_index(drop=True)
    b = b.sort_values("s2_id").reset_index(drop=True)
    assert a.equals(b)


# --------------------------------------------------------------------------
# cell centers / spherical kNN
# --------------------------------------------------------------------------


def test_face_uv_xyz_roundtrip():
    _, x, y = _geo(8000)
    px, py, pz = s2.lonlat_to_xyz(x, y)
    face = s2.xyz_to_face(px, py, pz)
    u, v = s2.face_uv(face, px, py, pz)
    rx, ry, rz = s2.face_uv_to_xyz(face, u, v)
    assert np.allclose(rx, px, atol=1e-14)
    assert np.allclose(ry, py, atol=1e-14)
    assert np.allclose(rz, pz, atol=1e-14)


def test_st_center_inverse_quadratic():
    s = np.linspace(0.0, 1.0, 1001)
    u = s2.st_center_to_uv(s)
    assert np.allclose(s2.uv_to_st(u), s, atol=1e-15)
    assert (np.abs(u) <= 1).all()


def test_cell_center_xyz_is_unit():
    rng = np.random.default_rng(5)
    face = rng.integers(0, 6, 2000)
    i = rng.integers(0, 1 << 6, 2000)
    j = rng.integers(0, 1 << 6, 2000)
    cx, cy, cz = s2.s2_cell_center_xyz(face, i, j, 6)
    assert np.allclose(cx * cx + cy * cy + cz * cz, 1.0, atol=1e-14)


def test_s2_knn_stage_matches_brute():
    rng = np.random.default_rng(13)
    n, k, L = 60, 3, 4
    face = rng.integers(0, 6, n)
    i = rng.integers(0, 1 << L, n)
    j = rng.integers(0, 1 << L, n)
    d = s2.hilbert_d(L, i, j)
    ids = s2.s2_cell_id(face, d, L)
    # dedup cells (stage semantics assume unique cell ids)
    _, keep = np.unique(ids, return_index=True)
    face, i, j, ids = face[keep], i[keep], j[keep], ids[keep]
    n = len(ids)
    ref = {"face": face, "id": ids, "i": i, "j": j}
    stage = s2.S2CellKnnStage(ref, k, L)
    out = stage(
        pa.table({"s2_face": face, "s2_i": i, "s2_j": j, "s2_id": ids})
    ).to_pandas()
    assert len(out) == n * k
    # brute oracle with the same (dist2, face, id) tie-break
    cx, cy, cz = s2.s2_cell_center_xyz(face, i, j, L)
    for qi in range(0, n, 7):
        dx, dy, dz = cx[qi] - cx, cy[qi] - cy, cz[qi] - cz
        d2 = dx * dx + dy * dy + dz * dz
        d2[qi] = np.inf
        order = np.lexsort((ids, face, d2))[:k]
        got = out[out.iy == ids[qi]].sort_values("rank")
        assert got.n_iy.tolist() == ids[order].tolist()
        assert np.array_equal(got.dist2.to_numpy(), d2[order])


def _sphere_points(seed: int, n: int):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-180.0, 180.0, n)
    y = np.degrees(np.arcsin(rng.uniform(-1.0, 1.0, n)))  # uniform on sphere
    return x, y


def test_cap_covering_is_superset():
    """Every point inside the cap lands in a covering cell — the
    triangle-inequality prune never drops a true member, at any
    covering level."""
    x, y = _sphere_points(7, 20000)
    lon, lat, chord2 = 10.0, 45.0, 0.19
    inside = s2.cap_chord2_mask(x, y, lon, lat, chord2)
    assert inside.sum() > 100
    for level in (3, 4, 5, 6):
        cover = s2.s2_cap_covering(lon, lat, chord2, level)
        t = s2.s2_encode(pa.table({"x": x, "y": y}), level)
        cand = np.isin(t["s2_id"].to_numpy(), cover)
        assert not np.any(inside & ~cand)  # superset
        # exact test after the prune reproduces brute exactly
        assert np.array_equal(cand & inside, inside)


def test_cap_covering_shrinks_with_level():
    """Finer coverings prune more: candidate count is non-increasing
    in level, and far smaller than the corpus."""
    x, y = _sphere_points(11, 20000)
    lon, lat, chord2 = -120.0, -30.0, 0.1
    counts = []
    for level in (3, 5, 7):
        cover = s2.s2_cap_covering(lon, lat, chord2, level)
        t = s2.s2_encode(pa.table({"x": x, "y": y}), level)
        counts.append(int(np.isin(t["s2_id"].to_numpy(), cover).sum()))
    assert counts[0] >= counts[1] >= counts[2]
    assert counts[2] < len(x) // 4


def test_s2_cap_filter_matches_brute(ray_session):
    """The Ray stage (broadcast covering → is_in prune → exact chord)
    returns exactly the brute-force cap membership set."""
    import ray.data as rd

    x, y = _sphere_points(23, 5000)
    ids = np.arange(5000, dtype=np.int64)
    lon, lat, chord2 = 60.0, -10.0, 0.15
    ds = rd.from_arrow(pa.table({"doc_id": ids, "x": x, "y": y}))
    got = (
        s2.s2_cap_filter(ds, lon, lat, chord2, level=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = ids[s2.cap_chord2_mask(x, y, lon, lat, chord2)]
    assert got.doc_id.to_numpy().tolist() == want.tolist()
    # output schema: the s2 helper columns are dropped
    assert list(got.columns) == ["doc_id", "x", "y"]


def test_cap_poles_and_antimeridian(ray_session):
    """Caps centered at a pole and across the antimeridian (both cross
    face boundaries) still match brute exactly."""
    import ray.data as rd

    x, y = _sphere_points(31, 4000)
    ids = np.arange(4000, dtype=np.int64)
    for lon, lat in ((0.0, 89.5), (179.9, 0.0), (0.0, -89.5)):
        ds = rd.from_arrow(pa.table({"doc_id": ids, "x": x, "y": y}))
        got = (
            s2.s2_cap_filter(ds, lon, lat, 0.2, level=4)
            .to_pandas()
            .doc_id.sort_values()
            .to_numpy()
        )
        want = ids[s2.cap_chord2_mask(x, y, lon, lat, 0.2)]
        assert got.tolist() == want.tolist()
