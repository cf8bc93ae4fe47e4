"""Rasterization semantics: golden micro-fixture + invariants (SURVEY.md §5).

The reference asserts structure only (tests/testthat/test-main.R:32-47);
here we additionally pin golden VALUES via hand-computed expectations
and a DuckDB oracle over the same rows.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest
import pyarrow as pa

import ray.data as rd

from rayraster.grid import GridSpec
from rayraster.rasterize import (
    collect_cell_ids,
    pivot_categories,
    rasterize_categories,
    rasterize_features,
)
from rayraster.rotate import permutate_by_rotation, rotation_angles


@pytest.fixture(scope="module")
def micro_df():
    """F2-style fixture: exact edge/corner points, dupes, lonely pixel."""
    rows = [
        # url, x, y, f1, f2, lang
        ("p00", 0.25, 0.25, 1, 10.0, "en"),
        ("p01", 0.75, 0.25, 2, -5.0, "en"),
        ("p02", 1.0, 0.5, 4, 0.0, "de"),   # on shared edge x=1 → cell 0
        ("p03", 1.5, 0.5, 8, 2.5, "de"),
        ("p04", 2.0, 2.0, 16, 1.0, "fr"),  # corner point → cell (1,1)
        ("p05", 0.0, 0.0, 32, 3.0, "en"),  # bbox min → cell (0,0)
        ("p06", 0.25, 0.25, 64, 7.0, "en"),  # duplicate coordinate
        ("p07", 3.5, 3.5, 128, -1.0, "fr"),  # lonely pixel
        ("p08", 2.5, 0.5, 256, 4.0, "de"),
        ("p09", 0.5, 2.5, 512, 6.0, "en"),
    ]
    return pd.DataFrame(rows, columns=["url", "x", "y", "f1", "f2", "lang"])


def test_square_golden_values(micro_df):
    ds = rd.from_pandas(micro_df)
    spec = GridSpec(0.0, 0.0, 1.0)
    out, _ = rasterize_features(
        ds, 1.0, ["f1", "f2"], spec=spec, fun="mean"
    )
    pdf = out.to_pandas().sort_values(["ix", "iy"]).reset_index(drop=True)
    got = {
        (r.ix, r.iy): (r.num_cell, r.sum_f1, r.mean_f1, r.sum_f2)
        for r in pdf.itertuples()
    }
    # hand-computed: cell (0,0) gets p00,p01,p02(edge),p05,p06
    assert got[(0, 0)] == (5, 1 + 2 + 4 + 32 + 64, 103 / 5, 10 - 5 + 0 + 3 + 7)
    assert got[(1, 0)] == (1, 8, 8.0, 2.5)
    assert got[(1, 1)] == (1, 16, 16.0, 1.0)  # corner → left/below
    assert got[(3, 3)] == (1, 128, 128.0, -1.0)
    assert got[(2, 0)] == (1, 256, 256.0, 4.0)
    assert got[(0, 2)] == (1, 512, 512.0, 6.0)
    assert len(got) == 6  # empty pixels absent
    # centroids
    row = pdf[(pdf.ix == 1) & (pdf.iy == 1)].iloc[0]
    assert (row.cx, row.cy) == (1.5, 1.5)
    assert row.type == "square" and row.resolution == 1.0


def test_invariants_mass_conservation(micro_df):
    """Σ pixels = Σ rows per feature; Σ num_cell = row count; mean×n=sum;
    pixels ≤ rows (SURVEY.md §5 invariants 1-4)."""
    ds = rd.from_pandas(micro_df)
    for square in (True, False):
        for res in (1.0, 2.5):
            out, _ = rasterize_features(
                ds, res, ["f1", "f2"], square=square, fun="mean"
            )
            pdf = out.to_pandas()
            assert pdf["sum_f1"].sum() == micro_df["f1"].sum()
            assert pdf["sum_f2"].sum() == pytest.approx(micro_df["f2"].sum())
            assert pdf["num_cell"].sum() == len(micro_df)
            assert len(pdf) <= len(micro_df)
            np.testing.assert_allclose(
                pdf["mean_f1"] * pdf["num_cell"], pdf["sum_f1"]
            )


def test_duckdb_oracle_square(micro_df):
    """Value-level parity with a SQL oracle using the exact SQL twin of
    the assignment formula."""
    ds = rd.from_pandas(micro_df)
    spec = GridSpec(0.0, 0.0, 1.0)
    out, _ = rasterize_features(ds, 1.0, ["f1"], spec=spec, fun="sum")
    got = (
        out.to_pandas()[["ix", "iy", "num_cell", "sum_f1"]]
        .sort_values(["ix", "iy"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("pts", micro_df)
    want = con.sql(
        """
        SELECT CAST(greatest(ceiling((x - 0.0)/1.0) - 1, 0) AS BIGINT) ix,
               CAST(greatest(ceiling((y - 0.0)/1.0) - 1, 0) AS BIGINT) iy,
               COUNT(*) num_cell, SUM(f1) sum_f1
        FROM pts GROUP BY 1,2 ORDER BY ix, iy
        """
    ).df()
    pd.testing.assert_frame_equal(
        got.astype({"sum_f1": "int64"}), want.astype({"sum_f1": "int64"})
    )


def test_categorical_counts_and_props(micro_df):
    ds = rd.from_pandas(micro_df)
    spec = GridSpec(0.0, 0.0, 1.0)
    out, _ = rasterize_categories(ds, 1.0, "lang", spec=spec)
    pdf = out.to_pandas()
    cell00 = pdf[(pdf.ix == 0) & (pdf.iy == 0)].set_index("lang")
    assert cell00.loc["en", "n"] == 4 and cell00.loc["de", "n"] == 1
    assert cell00["num_cell"].iloc[0] == 5
    # proportions sum to 1 per cell (invariant 5)
    sums = pdf.groupby(["ix", "iy"])["prop"].sum()
    np.testing.assert_allclose(sums.values, 1.0)
    # per-cell lang counts sum to num_cell
    agg = pdf.groupby(["ix", "iy"]).agg(n=("n", "sum"), nc=("num_cell", "first"))
    assert (agg["n"] == agg["nc"]).all()


def test_pivot_wide_layout(micro_df):
    ds = rd.from_pandas(micro_df)
    spec = GridSpec(0.0, 0.0, 1.0)
    long, _ = rasterize_categories(ds, 1.0, "lang", spec=spec)
    wide = pivot_categories(long, ["en", "de", "fr"], "lang").to_pandas()
    assert {"n_de", "n_en", "n_fr"} <= set(wide.columns)
    r = wide[(wide.ix == 0) & (wide.iy == 0)].iloc[0]
    assert (r.n_en, r.n_de, r.n_fr) == (4, 1, 0)
    # one row per distinct cell, counts conserved (test-main.R:74 analog)
    assert wide["n_en"].sum() + wide["n_de"].sum() + wide["n_fr"].sum() == len(micro_df)


def test_cell_id_list_partition_property(micro_df):
    """Each observation id in exactly one cell list (invariant 3)."""
    ds = rd.from_pandas(micro_df)
    spec = GridSpec(0.0, 0.0, 1.0)
    lists = collect_cell_ids(ds, spec, "url").to_pandas()
    all_ids = [u for ids in lists["cell_ids"] for u in ids]
    assert sorted(all_ids) == sorted(micro_df["url"])
    assert (lists["num_cell"] == lists["cell_ids"].map(len)).all()


def test_rotation_identity_and_invariance(micro_df):
    """Rotation 0° = identity; per-rotation totals equal; shared frame
    (SURVEY.md §5 invariant 6)."""
    ds = rd.from_pandas(micro_df)
    angles = rotation_angles(3)
    assert angles == [0.0, 120.0, 240.0]
    assert len(set(rotation_angles(7))) == 7
    rotated = permutate_by_rotation(ds, 3, origin=(2.0, 2.0))
    out, spec = rasterize_features(
        rotated, 2.5, ["f1"], fun="sum", extra_keys=("rotation",)
    )
    pdf = out.to_pandas()
    totals = pdf.groupby("rotation")[["sum_f1", "num_cell"]].sum()
    assert (totals["sum_f1"] == micro_df["f1"].sum()).all()
    assert (totals["num_cell"] == len(micro_df)).all()
    # identity copy: equals direct rasterization with same spec
    direct, _ = rasterize_features(ds, 2.5, ["f1"], spec=spec, fun="sum")
    dd = direct.to_pandas().set_index(["ix", "iy"])["sum_f1"].sort_index()
    r0 = (
        pdf[pdf.rotation == 0.0].set_index(["ix", "iy"])["sum_f1"].sort_index()
    )
    pd.testing.assert_series_equal(dd, r0)


def test_fun_validation():
    ds = rd.from_pandas(pd.DataFrame({"x": [0.5], "y": [0.5], "f": [1]}))
    with pytest.raises(ValueError, match="fun"):
        rasterize_features(ds, 1.0, ["f"], spec=GridSpec(0, 0, 1.0), fun="median")


def test_multires_nesting(micro_df):
    """Coarse pixel sum = sum of contained fine pixels when resolutions
    nest (invariant 5 in SURVEY §5): roll fine cells up via quad-tree
    parent and compare to direct coarse rasterization."""
    ds = rd.from_pandas(micro_df)
    fine = GridSpec(0.0, 0.0, 1.0, level=0)
    coarse = GridSpec(0.0, 0.0, 2.0, level=1)
    f, _ = rasterize_features(ds, 1.0, ["f1"], spec=fine, fun="sum")
    c, _ = rasterize_features(ds, 2.0, ["f1"], spec=coarse, fun="sum")
    fp = f.to_pandas()
    fp["pix"] = fp["ix"] // 2
    fp["piy"] = fp["iy"] // 2
    rolled = fp.groupby(["pix", "piy"])["sum_f1"].sum().sort_index()
    direct = c.to_pandas().set_index(["ix", "iy"])["sum_f1"].sort_index()
    direct.index.names = ["pix", "piy"]
    pd.testing.assert_series_equal(rolled, direct)


def test_ordered_output(micro_df):
    ds = rd.from_pandas(micro_df)
    out, _ = rasterize_features(
        ds, 1.0, ["f1"], spec=GridSpec(0.0, 0.0, 1.0), fun="sum", ordered=True
    )
    ids = out.to_pandas()["cell_id"].tolist()
    assert ids == sorted(ids)  # reference sorted-grid-index order


def test_seraster_api_dict_input_shared_frame(micro_df, ray_session):
    """dict[name, Dataset] ≙ list-of-SPE: one shared frame, names
    preserved, per-member results equal member-filtered union."""
    from rayraster.seraster_api import rasterize_gene_expression

    a = rd.from_pandas(micro_df.iloc[:5])
    b = rd.from_pandas(micro_df.iloc[5:])
    named, spec = rasterize_gene_expression(
        {"first": a, "second": b}, ["f1"], resolution=2.0, fun="sum"
    )
    assert set(named) == {"first", "second"}
    fa = named["first"].to_pandas()
    fb = named["second"].to_pandas()
    # shared frame: both use the union-derived origin; totals conserved
    assert fa.sum_f1.sum() == micro_df.iloc[:5].f1.sum()
    assert fb.sum_f1.sum() == micro_df.iloc[5:].f1.sum()
    # spec equals the one derived over ALL rows (common-bbox semantics)
    from rayraster.rasterize import derive_grid_spec

    want_spec = derive_grid_spec(rd.from_pandas(micro_df), 2.0)
    assert (spec.x0, spec.y0, spec.resolution) == (
        want_spec.x0, want_spec.y0, want_spec.resolution,
    )


def test_seraster_api_cell_type(micro_df, ray_session):
    from rayraster.seraster_api import rasterize_cell_type

    long, spec = rasterize_cell_type(rd.from_pandas(micro_df), "lang", resolution=1.0)
    pdf = long.to_pandas()
    assert pdf.n.sum() == len(micro_df)


def test_wide_feature_matrix_reference_shape(ray_session):
    """The reference fixture shape: 6,509 observations × 155 features
    (MERFISH mPOA, R/data.R) — exercises the wide-matrix aggregate path
    and the reference's cells→pixels reduction."""
    import time

    n, f = 6509, 155
    rng = np.random.default_rng(42)
    data = {"x": rng.uniform(0, 6000, n), "y": rng.uniform(0, 6000, n)}
    for k in range(f):
        data[f"g{k:03d}"] = rng.integers(0, 20, n)
    df = pd.DataFrame(data)
    ds = rd.from_pandas(df)
    t0 = time.perf_counter()
    out, _ = rasterize_features(
        ds, 50.0, [f"g{k:03d}" for k in range(f)], fun="mean"
    )
    pdf = out.to_pandas()
    sec = time.perf_counter() - t0
    assert len(pdf) <= n  # pixels ≤ cells (test-main.R:46)
    assert pdf["num_cell"].sum() == n
    # every feature column aggregated, mass conserved
    for k in (0, 77, 154):
        col = f"g{k:03d}"
        assert pdf[f"sum_{col}"].sum() == df[col].sum()
    assert sec < 30  # the whole reference-scale workload in seconds


def test_hot_cell_partial_aggregation_bounds_shuffle(ray_session):
    """Skew defense (north_rule 'salting'): a cell hit by EVERY row
    contributes one row per batch to the exchange, never one per
    point — the shuffle volume is bounded by #batches, not #rows."""
    from rayraster.rasterize import _AssignAndPartial

    spec = GridSpec(0.0, 0.0, 1.0)
    stage = _AssignAndPartial(spec, "x", "y", ["f"], (), 64)
    import pyarrow as pa

    total_partial_rows = 0
    n_batches = 20
    for _ in range(n_batches):
        batch = pa.table(
            {
                "x": np.full(10_000, 0.5),  # every point → cell (0,0)
                "y": np.full(10_000, 0.5),
                "f": np.ones(10_000, dtype=np.int64),
            }
        )
        out = stage(batch)
        total_partial_rows += out.num_rows
    assert total_partial_rows == n_batches  # 200k points → 20 shuffle rows


def test_write_pyramid_levels_conserve_mass(micro_df, tmp_path, ray_session):
    from rayraster.pipelines import write_pyramid

    spec = GridSpec(0.0, 0.0, 1.0)
    px, _ = rasterize_features(
        rd.from_pandas(micro_df), 1.0, ["f1"], spec=spec, fun="sum",
        with_meta=False, num_partitions=8,
    )
    summary = write_pyramid(
        px.select_columns(["ix", "iy", "num_cell", "sum_f1"]), spec,
        str(tmp_path / "pyr"), sum_cols=("sum_f1",), levels=3,
        num_partitions=8,
    )
    assert sorted(summary) == [0, 1, 2, 3]
    base = rd.read_parquet(str(tmp_path / "pyr" / "level=0")).to_pandas()
    for k in range(4):
        lv = rd.read_parquet(str(tmp_path / "pyr" / f"level={k}")).to_pandas()
        # mass conservation per level: observation count + feature sum
        assert lv["num_cell"].sum() == base["num_cell"].sum()
        assert lv["sum_f1"].sum() == base["sum_f1"].sum()
        assert summary[k]["rows"] == len(lv)
        assert summary[k]["resolution"] == 1.0 * (2 ** k)
        if k:
            assert len(lv) <= summary[k - 1]["rows"]
    # deepest level collapses the micro raster to a couple of tiles
    assert summary[3]["rows"] < summary[0]["rows"]


def test_merge_pixel_stores_equals_full_rasterize(micro_df, tmp_path, ray_session):
    from rayraster.pipelines import merge_pixel_stores

    spec = GridSpec(0.0, 0.0, 1.0)
    half_a, half_b = micro_df.iloc[:5], micro_df.iloc[5:]
    for name, part in (("a", half_a), ("b", half_b)):
        px, _ = rasterize_features(
            rd.from_pandas(part), 1.0, ["f1"], spec=spec, fun="sum",
            with_meta=False, num_partitions=4,
            extra_stats=("min", "max"),
        )
        px.select_columns(
            ["ix", "iy", "num_cell", "sum_f1", "min_f1", "max_f1"]
        ).write_parquet(str(tmp_path / name))

    merged = (
        merge_pixel_stores(
            [str(tmp_path / "a"), str(tmp_path / "b")], spec,
            str(tmp_path / "merged"),
            sum_cols=("sum_f1",), min_cols=("min_f1",), max_cols=("max_f1",),
            num_partitions=4,
        )
        .to_pandas().sort_values(["ix", "iy"]).reset_index(drop=True)
    )
    full, _ = rasterize_features(
        rd.from_pandas(micro_df), 1.0, ["f1"], spec=spec, fun="sum",
        with_meta=False, num_partitions=4, extra_stats=("min", "max"),
    )
    want = (
        full.select_columns(
            ["ix", "iy", "num_cell", "sum_f1", "min_f1", "max_f1"]
        ).to_pandas().sort_values(["ix", "iy"]).reset_index(drop=True)
    )
    for c in ["ix", "iy", "num_cell", "sum_f1", "min_f1", "max_f1"]:
        assert (merged[c].to_numpy() == want[c].to_numpy()).all(), c
    # the store also landed on disk with the uniform projection
    disk = rd.read_parquet(str(tmp_path / "merged")).to_pandas()
    assert {"cell_id", "cx", "cy"} <= set(disk.columns)
    assert len(disk) == len(want)

    # chained merge: the output carries _SPEC.json, so merging it
    # again validates the spec — and a mismatched spec is refused
    again = merge_pixel_stores(
        [str(tmp_path / "merged")], spec, str(tmp_path / "merged2"),
        sum_cols=("sum_f1",), min_cols=("min_f1",), max_cols=("max_f1",),
        num_partitions=4,
    ).to_pandas().sort_values(["ix", "iy"]).reset_index(drop=True)
    assert (again["sum_f1"].to_numpy() == want["sum_f1"].to_numpy()).all()
    with pytest.raises(ValueError, match="different grids"):
        merge_pixel_stores(
            [str(tmp_path / "merged")], GridSpec(0.0, 0.0, 2.0),
            str(tmp_path / "bad"), sum_cols=("sum_f1",),
        )
    with pytest.raises(ValueError, match="at least one store"):
        merge_pixel_stores([], spec, str(tmp_path / "none"))


# ---------------------------------------------------------------------------
# area-weighted resampling
# ---------------------------------------------------------------------------


def _resample_reference(cells, r1, r2):
    """Brute per-cell overlap split; returns {(jx,jy): (sum, n)}."""
    from collections import defaultdict

    acc = defaultdict(lambda: [0, 0])
    for (a, b), val in cells.items():
        for jx in range((a * r1) // r2, ((a + 1) * r1 - 1) // r2 + 1):
            for jy in range((b * r1) // r2, ((b + 1) * r1 - 1) // r2 + 1):
                ovx = min((a + 1) * r1, (jx + 1) * r2) - max(a * r1, jx * r2)
                ovy = min((b + 1) * r1, (jy + 1) * r2) - max(b * r1, jy * r2)
                if ovx > 0 and ovy > 0:
                    acc[(jx, jy)][0] += val * ovx * ovy
                    acc[(jx, jy)][1] += 1
    return acc


@pytest.mark.parametrize("r1,r2", [(15, 40), (40, 15), (30, 30), (7, 3)])
def test_resample_area_weighted_matches_brute_and_conserves_mass(
    ray_session, r1, r2
):
    from rayraster.rasterize import resample_area_weighted

    rng = np.random.default_rng(13)
    ix = rng.integers(-15, 15, 300).astype(np.int64)
    iy = rng.integers(-15, 15, 300).astype(np.int64)
    _, u = np.unique(ix * 1000 + iy, return_index=True)
    ix, iy = ix[u], iy[u]
    v = rng.integers(-100, 1000, len(ix)).astype(np.int64)
    t = pa.table({"ix": pa.array(ix), "iy": pa.array(iy), "v": pa.array(v)})
    ref = _resample_reference(
        {(int(a), int(b)): int(x) for a, b, x in zip(ix, iy, v)}, r1, r2
    )
    out = resample_area_weighted(
        rd.from_arrow(t).repartition(4), r1, r2, ["v"], origin=(3.0, -2.0),
        num_partitions=8,
    ).to_pandas()
    assert len(out) == len(ref)
    for r in out.itertuples():
        s, n = ref[(r.ix, r.iy)]
        assert (r.sum_v, r.num_cell) == (s, n)
        assert r.cx == 3.0 + (float(r.ix) + 0.5) * float(r2)
    assert out.sum_v.sum() == int(v.sum()) * r1 * r1  # exact mass


def test_resample_area_weighted_identity_when_same_res(ray_session):
    from rayraster.rasterize import resample_area_weighted

    t = pa.table({"ix": pa.array([0, 3], type=pa.int64()),
                  "iy": pa.array([1, -2], type=pa.int64()),
                  "v": pa.array([10, -4], type=pa.int64())})
    out = (
        resample_area_weighted(rd.from_arrow(t), 20, 20, ["v"])
        .to_pandas().sort_values("ix").reset_index(drop=True)
    )
    assert out.sum_v.tolist() == [10 * 400, -4 * 400]
    assert out.num_cell.tolist() == [1, 1]
    assert out.ix.tolist() == [0, 3] and out.iy.tolist() == [1, -2]


def test_resample_area_weighted_validations(ray_session):
    from rayraster.rasterize import resample_area_weighted

    t = pa.table({"ix": pa.array([0], type=pa.int64()),
                  "iy": pa.array([0], type=pa.int64()),
                  "v": pa.array([1], type=pa.int64())})
    with pytest.raises(ValueError, match="positive integers"):
        resample_area_weighted(rd.from_arrow(t), 1.5, 3, ["v"])
    tf = pa.table({"ix": pa.array([0], type=pa.int64()),
                   "iy": pa.array([0], type=pa.int64()),
                   "v": pa.array([1.0])})
    with pytest.raises(Exception, match="integer"):
        resample_area_weighted(rd.from_arrow(tf), 2, 3, ["v"]).to_pandas()
    big = pa.table({"ix": pa.array([0], type=pa.int64()),
                    "iy": pa.array([0], type=pa.int64()),
                    "v": pa.array([1 << 50], type=pa.int64())})
    with pytest.raises(Exception, match="overflow"):
        resample_area_weighted(rd.from_arrow(big), 1 << 10, 3, ["v"]).to_pandas()


def test_unpivot_inverts_pivot(ray_session):
    from rayraster.rasterize import unpivot

    t = pa.table(
        {"cell_id": pa.array([1, 2], type=pa.int64()),
         "n_en": pa.array([3, 0], type=pa.int64()),
         "n_fr": pa.array([1, 5], type=pa.int64())}
    )
    long = (
        unpivot(rd.from_arrow(t), ["cell_id"], ["n_en", "n_fr"])
        .to_pandas().sort_values(["cell_id", "feature"]).reset_index(drop=True)
    )
    assert list(long.cell_id) == [1, 1, 2, 2]
    assert list(long.feature) == ["n_en", "n_fr", "n_en", "n_fr"]
    assert list(long.value) == [3, 1, 0, 5]
    import pytest as _pt

    with _pt.raises(ValueError, match="value column"):
        unpivot(rd.from_arrow(t), ["cell_id"], [])
