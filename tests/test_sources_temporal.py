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


def test_read_table_gzip_csv_and_jsonl(ray_session, tmp_path):
    """Gzipped CSV/JSONL (the Common-Crawl wire format) decompress
    transparently — Arrow infers the codec from the .gz extension."""
    import gzip

    with gzip.open(tmp_path / "a.csv.gz", "wt") as f:
        f.write("doc_id,text\n1,alpha\n2,beta\n")
    out = (
        read_table(str(tmp_path / "a.csv.gz"), fmt="csv",
                   columns=["doc_id", "text"])
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out.doc_id.tolist() == [1, 2]
    assert out.text.tolist() == ["alpha", "beta"]

    with gzip.open(tmp_path / "b.json.gz", "wt") as f:
        f.write('{"doc_id": 3, "text": "gamma"}\n{"doc_id": 4, "text": "delta"}\n')
    out = (
        read_table(str(tmp_path / "b.json.gz"), fmt="json",
                   columns=["doc_id", "text"])
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out.doc_id.tolist() == [3, 4]


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


def test_write_table_replaces_existing_dir(ray_session, tmp_path):
    """A rerun must not stack a second run's files into the target dir
    (every Ray sink appends uniquely-named files)."""
    df = _points(500)
    d = str(tmp_path / "out")
    for _ in range(2):
        write_table(rd.from_pandas(df), d, fmt="parquet")
    assert read_table(d).count() == len(df)


def test_read_table_list_of_dirs(ray_session, tmp_path):
    """A list that CONTAINS directories is expanded to files (Ray 2.49
    read_parquet rejects dir entries inside a list)."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_table(rd.from_pandas(_points(300, seed=1)), a)
    write_table(rd.from_pandas(_points(200, seed=2)), b)
    ds = read_table([a, b], columns=["id", "v"])
    assert ds.count() == 500
    assert sorted(ds.schema().names) == ["id", "v"]


def test_csv_prunes_at_decode(ray_session, tmp_path):
    """columns= on CSV rides pyarrow ConvertOptions(include_columns) —
    unwanted columns never become Arrow data."""
    d = str(tmp_path / "c")
    write_table(rd.from_pandas(_points(400)), d, fmt="csv")
    ds = read_table(d, fmt="csv", columns=["x", "v"])
    assert sorted(ds.schema().names) == ["v", "x"]
    assert ds.count() == 400


def test_json_interchange_fidelity_bounds(ray_session, tmp_path):
    """JSONL is documented LOSSY: doubles survive to 15 significant
    digits (the pandas sink maximum) and timestamps come back as
    ISO-8601 microsecond STRINGS — assert the documented contract so a
    silent downgrade (10-digit / epoch-ms default) is caught."""
    df = pd.DataFrame(
        {
            "x": [1 / 3],
            "ts": pd.to_datetime(["2026-01-02 03:04:05.123456"]),
        }
    )
    d = str(tmp_path / "j")
    write_table(rd.from_pandas(df), d, fmt="json")
    back = read_table(d, fmt="json").to_pandas()
    assert abs(back.x[0] - 1 / 3) < 1e-15  # 15 digits, NOT 10
    assert back.ts[0] == "2026-01-02T03:04:05.123456"  # µs ISO string


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


def test_rasterize_temporal_composes_extra_keys(ray_session):
    """A caller-supplied extra_keys (the engine's documented
    composition pattern, e.g. rotation/dataset_id) rides alongside the
    window axis instead of raising TypeError."""
    rng = np.random.default_rng(5)
    n = 1200
    df = pd.DataFrame(
        {
            "x": rng.uniform(0, 2, n),
            "y": rng.uniform(0, 2, n),
            "v": rng.integers(0, 10, n),
            "src": rng.integers(0, 2, n),
            "ts": pd.to_datetime(
                rng.integers(0, 2 * 3600, n) * 1_000_000, unit="us"
            ),
        }
    )
    spec = GridSpec(0.0, 0.0, 1.0)
    px, _ = rasterize_temporal(
        rd.from_pandas(df), 1.0, ["v"], ts_col="ts",
        window_us=3_600_000_000, spec=spec, fun="sum", with_meta=False,
        num_partitions=8, extra_keys=("src",),
    )
    got = px.to_pandas()
    assert {"window", "src"} <= set(got.columns)
    assert got.num_cell.sum() == n
    ix, iy = spec.assign(df.x.to_numpy(), df.y.to_numpy())
    w = (df.ts.astype("int64") // 1000) // 3_600_000_000
    assert len(got) == len(
        df.assign(ix=ix, iy=iy, window=w)
        .groupby(["ix", "iy", "window", "src"])
        .size()
    )


def _upsert_frames():
    snap = pd.DataFrame(
        {
            "k": [1, 2, 3, 4],
            "version": [10, 10, 10, 10],
            "val": ["a", "b", "c", "d"],
        }
    )
    chg = pd.DataFrame(
        {
            "k": [2, 3, 3, 5, 4, 1],
            "version": [11, 11, 12, 11, 10, 9],
            "val": ["b2", "c2", "c3", "e", "d2", "a_old"],
            "deleted": [False, False, False, False, False, False],
        }
    )
    return snap, chg


def test_upsert_latest_semantics(ray_session):
    from rayraster.pipelines import upsert_latest

    snap, chg = _upsert_frames()
    out = (
        upsert_latest(
            rd.from_pandas(snap), rd.from_pandas(chg), "k", "version",
            tombstone_col="deleted",
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # k=1: change version 9 < snapshot 10 -> snapshot row survives
    # k=2: change v11 wins; k=3: highest change v12 wins
    # k=4: EQUAL version 10 -> changes side wins (correction semantics)
    # k=5: pure insert
    assert out.k.tolist() == [1, 2, 3, 4, 5]
    assert out.val.tolist() == ["a", "b2", "c3", "d2", "e"]
    assert out.version.tolist() == [10, 11, 12, 10, 11]


def test_upsert_latest_tombstones_and_partition_invariance(ray_session):
    from rayraster.pipelines import upsert_latest

    snap, chg = _upsert_frames()
    chg2 = chg.copy()
    chg2.loc[chg2.k == 3, "deleted"] = True  # delete k=3 at its max version
    a = (
        upsert_latest(
            rd.from_pandas(snap), rd.from_pandas(chg2), "k", "version",
            tombstone_col="deleted",
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert a.k.tolist() == [1, 2, 4, 5]
    b = (
        upsert_latest(
            rd.from_pandas(snap).repartition(3),
            rd.from_pandas(chg2).repartition(4),
            "k", "version", tombstone_col="deleted", num_partitions=7,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_upsert_latest_version_bounds(ray_session):
    import pytest

    from rayraster.pipelines import upsert_latest

    snap = pd.DataFrame({"k": [1], "version": [2**62], "val": ["x"]})
    chg = pd.DataFrame({"k": [1], "version": [1], "val": ["y"]})
    with pytest.raises(Exception, match="2\\^62"):
        upsert_latest(
            rd.from_pandas(snap), rd.from_pandas(chg), "k", "version"
        ).to_pandas()


def test_diff_snapshots_matrix(ray_session):
    from rayraster.pipelines import diff_snapshots

    old = pd.DataFrame(
        {"k": [1, 2, 3, 4], "v": [10.0, 20.0, 30.0, np.nan], "s": ["a", "b", "c", "d"]}
    )
    new = pd.DataFrame(
        {"k": [2, 3, 4, 5], "v": [20.0, 31.0, np.nan, 50.0], "s": ["b", "c", "d", "e"]}
    )
    out = (
        diff_snapshots(rd.from_pandas(old), rd.from_pandas(new), "k", ["v", "s"])
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # k=1 removed; k=2 unchanged (dropped); k=3 changed (v 30->31);
    # k=4 unchanged (NaN==NaN treated as no change); k=5 added
    assert out.k.tolist() == [1, 3, 5]
    assert out.change.tolist() == ["removed", "changed", "added"]
    chg = out[out.k == 3].iloc[0]
    assert (chg.old_v, chg.new_v) == (30.0, 31.0)


def test_diff_snapshots_null_transitions_and_unchanged(ray_session):
    from rayraster.pipelines import diff_snapshots

    old = pd.DataFrame({"k": [1, 2], "v": [np.nan, 5.0]})
    new = pd.DataFrame({"k": [1, 2], "v": [7.0, 5.0]})
    out = (
        diff_snapshots(
            rd.from_pandas(old), rd.from_pandas(new), "k", ["v"],
            include_unchanged=True,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out.change.tolist() == ["changed", "unchanged"]  # NULL->value = change
    import pytest as _pt

    with _pt.raises(ValueError, match="compare column"):
        diff_snapshots(rd.from_pandas(old), rd.from_pandas(new), "k", [])


def test_diff_snapshots_partition_invariance(ray_session):
    from rayraster.pipelines import diff_snapshots

    rng = np.random.default_rng(4)
    old = pd.DataFrame({"k": np.arange(200), "v": rng.integers(0, 5, 200)})
    new = pd.DataFrame({"k": np.arange(50, 250), "v": rng.integers(0, 5, 200)})
    a = (
        diff_snapshots(rd.from_pandas(old), rd.from_pandas(new), "k", ["v"])
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    b = (
        diff_snapshots(
            rd.from_pandas(old).repartition(7), rd.from_pandas(new).repartition(3),
            "k", ["v"], num_partitions=13,
        )
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert set(a[a.k < 50].change) == {"removed"}
    assert set(a[a.k >= 200].change) == {"added"}


def test_time_partitioned_store_roundtrip_and_pruning(ray_session, tmp_path):
    import glob
    import os

    from rayraster.sources import read_time_range, write_time_partitioned

    base = pd.Timestamp("2024-03-01").value // 1000  # epoch us
    day = 86_400_000_000
    n = 3000
    rng = np.random.default_rng(3)
    us = base + rng.integers(0, 10 * day, n)  # ten days of events
    df = pd.DataFrame(
        {"ts": pd.to_datetime(us, unit="us"), "user_id": rng.integers(0, 50, n),
         "value": rng.normal(size=n)}
    )
    path = str(tmp_path / "events_by_day")
    write_time_partitioned(rd.from_pandas(df), path, granularity="day")
    # ten day-dirs
    assert len(glob.glob(os.path.join(path, "tp=*"))) == 10

    # mid-range window crossing two day boundaries, odd offsets
    s, e = base + int(2.5 * day), base + int(4.25 * day)
    got = read_time_range(path, s, e).to_pandas()
    want = df[(us >= s) & (us < e)]
    assert len(got) == len(want)
    got_us = got.ts.astype("int64") // 1000
    assert sorted(got_us.tolist()) == sorted((us[(us >= s) & (us < e)]).tolist())
    # column pruning keeps ts for the filter
    got2 = read_time_range(path, s, e, columns=["user_id"]).to_pandas()
    assert set(got2.columns) == {"ts", "user_id"} and len(got2) == len(want)
    # empty range beyond the data
    far = read_time_range(path, base + 100 * day, base + 101 * day)
    assert far.count() == 0

    import pytest as _pt

    with _pt.raises(ValueError, match="end_us"):
        read_time_range(path, s, s)
    with _pt.raises(ValueError, match="granularity"):
        write_time_partitioned(rd.from_pandas(df), path, granularity="week")


def test_hilbert_clustered_layout_roundtrip_and_pruning(ray_session, tmp_path):
    import glob as _glob

    import pyarrow.parquet as _pq
    import ray.data as rd

    from rayraster.sources import (
        hilbert_ranges_for_rect,
        read_hilbert_rect,
        write_hilbert_clustered,
    )

    rng = np.random.default_rng(67)
    n = 4000
    ix = rng.integers(0, 64, n).astype(np.int64)
    iy = rng.integers(0, 64, n).astype(np.int64)
    v = np.arange(n, dtype=np.int64)
    t = pa.table({"ix": pa.array(ix), "iy": pa.array(iy), "v": pa.array(v)})
    out = str(tmp_path / "hc")
    write_hilbert_clustered(rd.from_arrow(t).repartition(6), out, order=6)
    # windowed read returns exactly the rect's rows
    got = read_hilbert_rect(out, 10, 20, 25, 40, order=6).to_pandas()
    want = ((ix >= 10) & (ix <= 25) & (iy >= 20) & (iy <= 40)).sum()
    assert len(got) == want
    assert ((got.ix >= 10) & (got.ix <= 25)
            & (got.iy >= 20) & (got.iy <= 40)).all()
    # clustering: per-file key ranges are disjoint (the sort guarantee)
    spans = []
    for f in _glob.glob(out + "/*.parquet"):
        md = _pq.ParquetFile(f).metadata
        cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
        ki = cols["hkey"]
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ki).statistics
            mins.append(st.min)
            maxs.append(st.max)
        if mins:
            spans.append((min(mins), max(maxs)))
    spans.sort()
    for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
        assert a1 <= b0  # contiguous, non-overlapping tiles
    # range compression: a full square decomposes into few intervals
    rngs = hilbert_ranges_for_rect(0, 0, 15, 15, order=6)
    assert rngs[0][0] >= 0 and len(rngs) < 40


def test_time_store_pre_epoch_rows_and_int64_ts(ray_session, tmp_path):
    """Regressions: (a) write bucketed with truncating division while
    the reader floor-divided, silently excluding pre-epoch rows; (b)
    an int64 epoch-us ts column wrote fine but every range read
    crashed on the hardcoded timestamp filter type."""
    import pandas as pd

    from rayraster.sources import read_time_range, write_time_partitioned

    day = 86_400_000_000
    # (a) pre-epoch timestamps round-trip
    df = pd.DataFrame({
        "ts": pd.to_datetime([-12 * 3_600_000_000, 3_600_000_000], unit="us"),
        "v": [1, 2],
    })
    p1 = str(tmp_path / "pre")
    write_time_partitioned(rd.from_pandas(df), p1, "ts", "day")
    got = read_time_range(p1, -day, 0).to_pandas()
    assert got.v.tolist() == [1]
    # (b) int64 epoch-us column
    t = pa.table({"ts": pa.array([100, day + 5], type=pa.int64()),
                  "v": pa.array([10, 20], type=pa.int64())})
    p2 = str(tmp_path / "i64")
    write_time_partitioned(rd.from_arrow(t), p2, "ts", "day")
    got2 = read_time_range(p2, 0, day).to_pandas()
    assert got2.v.tolist() == [10]
    # empty-range read preserves the DATASET schema (Ray's to_pandas
    # drops columns on 0-row datasets, so assert on schema())
    e = read_time_range(p2, 40 * day, 41 * day)
    assert "v" in e.schema().names and e.count() == 0


def test_hilbert_layout_rejects_mismatched_order(ray_session, tmp_path):
    """Regression: a read with a different curve order silently
    returned wrong window contents; the layout manifest now pins it."""
    import pytest

    from rayraster.sources import read_hilbert_rect, write_hilbert_clustered

    t = pa.table({"ix": pa.array(np.arange(16), type=pa.int64()),
                  "iy": pa.array(np.arange(16), type=pa.int64()),
                  "v": pa.array(np.arange(16), type=pa.int64())})
    p = str(tmp_path / "hil")
    write_hilbert_clustered(rd.from_arrow(t), p, order=12)
    with pytest.raises(ValueError, match="order"):
        read_hilbert_rect(p, 0, 0, 3, 3, order=10)
    got = read_hilbert_rect(p, 0, 0, 3, 3, order=12).to_pandas()
    assert sorted(got.v.tolist()) == [0, 1, 2, 3]
