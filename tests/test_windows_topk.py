"""Sliding/session windows + grouped top-k."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from rayraster.agg import grouped_topk
from rayraster.windows import session_windows, sliding_aggregate


def test_sliding_window_fanout(ray_session):
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta([0, 30, 90, 150], unit="m")
    df = pd.DataFrame({"ts": ts, "event_type": ["a"] * 4, "value": [1.0, 2.0, 3.0, 4.0]})
    out = (
        sliding_aggregate(rd.from_pandas(df), size_us=7_200_000_000, step_us=3_600_000_000)
        .to_pandas()
        .sort_values("window")
        .reset_index(drop=True)
    )
    # events at h0,h0.5,h1.5,h2.5; windows of 2h starting each hour
    w0 = int(pd.Timestamp("2024-01-01").value // 1000 // 3_600_000_000)
    got = {int(r.window) - w0: r.n for r in out.itertuples()}
    assert got == {-1: 2, 0: 3, 1: 2, 2: 1}
    # every event counted size/step times
    assert out.n.sum() == 8


def test_session_windows_gap(ray_session):
    base = pd.Timestamp("2024-01-01")
    rows = []
    # user 1: two sessions (gap 40min), user 2: one session
    for mins, v in [(0, 1.0), (10, 2.0), (50, 3.0)]:
        rows.append({"ts": base + pd.Timedelta(minutes=mins), "user_id": 1, "value": v})
    rows.append({"ts": base, "user_id": 2, "value": 9.0})
    out = session_windows(rd.from_pandas(pd.DataFrame(rows)), gap_us=1_800_000_000).to_pandas()
    u1 = out[out.user_id == 1].sort_values("session_start")
    assert len(u1) == 2
    assert u1.iloc[0].n == 2 and u1.iloc[0].min_value == 1.0 and u1.iloc[0].max_value == 2.0
    assert u1.iloc[1].n == 1 and u1.iloc[1].min_value == 3.0
    assert len(out[out.user_id == 2]) == 1
    # max intra-session gap: 10 min for the 2-event session, 0 for the
    # single-event ones
    assert u1.iloc[0].max_gap_us == 600_000_000
    assert u1.iloc[1].max_gap_us == 0
    assert out[out.user_id == 2].iloc[0].max_gap_us == 0


def test_lag_columns_matches_duckdb(ray_session):
    import duckdb

    from rayraster.windows import lag_columns

    rng = np.random.default_rng(4)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 7, 300).astype(np.int64),
            "o": rng.permutation(300).astype(np.int64),  # unique order col
            "v": rng.integers(0, 100, 300).astype(np.int64),
            "w": rng.standard_normal(300),
        }
    )
    out = (
        lag_columns(rd.from_pandas(df).repartition(4), "k", "o", ["v", "w"],
                    num_partitions=8)
        .to_pandas()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.sql(
        """SELECT k, o, v, w,
                  lag(v) OVER (PARTITION BY k ORDER BY o) AS lag_v,
                  lag(w) OVER (PARTITION BY k ORDER BY o) AS lag_w
           FROM t ORDER BY k, o"""
    ).df()
    pd.testing.assert_frame_equal(
        out[["k", "o", "v", "w", "lag_v", "lag_w"]], want, check_dtype=False
    )


def test_lag_columns_single_rows_and_empty(ray_session):
    from rayraster.windows import lag_columns

    df = pd.DataFrame(
        {"k": np.array([1, 2, 3], dtype=np.int64),
         "o": np.array([0, 0, 0], dtype=np.int64),
         "v": np.array([5, 6, 7], dtype=np.int64)}
    )
    out = lag_columns(rd.from_pandas(df), "k", "o", ["v"]).to_pandas()
    assert out["lag_v"].isna().all()  # every key has one row
    with pytest.raises(ValueError, match="at least one column"):
        lag_columns(rd.from_pandas(df), "k", "o", [])


def test_grouped_topk_matches_pandas(ray_session):
    rng = np.random.default_rng(2)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], 500),
            "id": np.arange(500),
            "v": rng.integers(0, 50, 500),
        }
    )
    out = (
        grouped_topk(rd.from_pandas(df), ["g"], "v", k=4, tie_col="id", batch_size=64)
        .to_pandas()
        .sort_values(["g", "rnk"])
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["g", "v", "id"], ascending=[True, False, True])
        .groupby("g")
        .head(4)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out[["g", "id", "v"]], want[["g", "id", "v"]])
    assert out.groupby("g").rnk.apply(list).map(lambda x: x == [1, 2, 3, 4]).all()


def test_grouped_topk_ascending(ray_session):
    df = pd.DataFrame({"g": ["x"] * 5, "id": range(5), "v": [5, 3, 1, 4, 2]})
    out = grouped_topk(
        rd.from_pandas(df), ["g"], "v", k=2, descending=False, tie_col="id"
    ).to_pandas()
    assert sorted(out.v) == [1, 2]


def test_exact_quantiles_matches_numpy(ray_session):
    """Histogram-refinement order statistics vs a local sort, across
    distributions that stress the refinement: uniform floats, heavy
    duplicates, skewed integers, and a tiny corpus."""
    from rayraster.agg import exact_quantiles

    rng = np.random.default_rng(23)
    cases = [
        rng.uniform(-1000, 1000, 50_000),
        np.repeat([1.5, 2.5, 2.5, 9.0], [20_000, 15_000, 10_000, 5_000]).astype(float),
        rng.zipf(1.5, 30_000).astype(float),
        np.array([4.0, 1.0, 3.0]),
    ]
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    for vals in cases:
        ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(8)
        got = exact_quantiles(ds, "v", qs, collect_threshold=512)
        s = np.sort(vals)
        n = len(s)
        want = [s[min(max(int(np.ceil(n * q)) - 1, 0), n - 1)] for q in qs]
        assert got == want, (got, want)


def test_exact_quantiles_duplicate_mass_converges(ray_session):
    """A single value holding more rows than collect_threshold must
    still converge (interval stops shrinking -> collected)."""
    from rayraster.agg import exact_quantiles

    vals = np.full(40_000, 7.25)
    ds = rd.from_pandas(pd.DataFrame({"v": vals}))
    assert exact_quantiles(ds, "v", [0.5], collect_threshold=100) == [7.25]


def test_add_late_flag_prefix_scan(ray_session):
    """Watermark late-data detection vs a local sequential replay,
    with out-of-order arrivals crossing chunk boundaries."""
    from rayraster.windows import add_late_flag

    rng = np.random.default_rng(31)
    n = 5000
    # event times wander forward with occasional big backward jumps
    ts_us = np.cumsum(rng.integers(0, 60_000_000, n))
    jump = rng.random(n) < 0.02
    ts_us[jump] -= 3_000_000_000
    ts_us = np.maximum(ts_us, 0)
    df = pd.DataFrame(
        {"event_id": np.arange(n), "ts": pd.to_datetime(ts_us, unit="us"),
         "value": rng.random(n)}
    )
    delay = 1_000_000_000
    got = (
        add_late_flag(rd.from_pandas(df).repartition(8), delay_us=delay,
                      num_partitions=7)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # oracle: sequential scan
    wm = np.int64(np.iinfo(np.int64).min)
    want = []
    for t in ts_us:
        want.append(wm != np.iinfo(np.int64).min and t < wm - delay)
        wm = max(wm, np.int64(t))
    assert got.late.tolist() == want
    assert got.late.any()  # the corpus actually exercises lateness


def test_watermark_tumbling_drops_late_rows(ray_session):
    from rayraster.windows import tumbling_aggregate, watermark_tumbling

    df = pd.DataFrame(
        {
            "event_id": [0, 1, 2, 3],
            "ts": pd.to_datetime(
                [3_600_000_000, 7_200_000_000, 100, 7_300_000_000], unit="us"
            ),
            "event_type": ["a"] * 4,
            "value": [1.0, 2.0, 3.0, 4.0],
        }
    )
    out = watermark_tumbling(
        rd.from_pandas(df), delay_us=1_000_000
    ).to_pandas().sort_values("window").reset_index(drop=True)
    # event 2 (ts=100) is hours behind the watermark -> dropped
    assert out.n.sum() == 3 and 0 not in out.window.tolist()
    full = tumbling_aggregate(rd.from_pandas(df)).to_pandas()
    assert full.n.sum() == 4  # sanity: without the watermark it stays


def test_stratified_sample_rates(ray_session):
    """Per-group thresholds applied exactly; NULL/unlisted groups get
    the default; union with the uniform rule stays deterministic."""
    from rayraster.agg import stratified_sample

    n = 30_000
    g = np.where(np.arange(n) % 3 == 0, "a", np.where(np.arange(n) % 3 == 1, "b", None))
    df = pd.DataFrame({"id": np.arange(n), "g": g})
    out = stratified_sample(
        rd.from_pandas(df), "id", "g", {"a": 500000, "b": 50000}, default_num=100000
    ).to_pandas()
    h = (df.id.to_numpy().astype(np.int64) * 2654435761) % 1000003
    thr = np.where(df.g == "a", 500000, np.where(df.g == "b", 50000, 100000))
    want = df[h < thr]
    assert sorted(out.id) == sorted(want.id)
    # rates actually differ per group
    frac = out.groupby(out.g.fillna("<null>")).size() / df.groupby(df.g.fillna("<null>")).size()
    assert frac["a"] > 0.4 and frac["b"] < 0.1 and 0.05 < frac["<null>"] < 0.15


def test_grouped_quantiles_matches_pandas(ray_session):
    from rayraster.agg import grouped_quantiles

    rng = np.random.default_rng(41)
    df = pd.DataFrame(
        {"g": rng.choice(["a", "b", "c"], 9000), "v": rng.uniform(-5, 5, 9000)}
    )
    qs = [0.25, 0.5, 0.9]
    got = (
        grouped_quantiles(rd.from_pandas(df).repartition(6), ["g"], "v", qs)
        .to_pandas()
        .sort_values(["g", "q"])
        .reset_index(drop=True)
    )
    want_rows = []
    for g, sub in df.groupby("g"):
        s = np.sort(sub.v.to_numpy())
        n = len(s)
        for q in qs:
            k = min(max(int(np.ceil(n * q)) - 1, 0), n - 1)
            want_rows.append((g, q, s[k]))
    want = pd.DataFrame(want_rows, columns=["g", "q", "value"]).sort_values(
        ["g", "q"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_grouped_quantiles_giant_group_escape(ray_session):
    """One group holding 90% of the rows: the escape hatch must route
    it through exact_quantiles (no single-partition serialization) and
    produce EXACTLY the same (group, q, value) rows as the normal rank
    rule — including integer value types surviving the float path."""
    from rayraster.agg import grouped_quantiles

    rng = np.random.default_rng(43)
    n = 20_000
    g = np.where(rng.random(n) < 0.9, "big", rng.choice(["s1", "s2"], n))
    df = pd.DataFrame({"g": g, "v": rng.integers(0, 10_000, n)})
    qs = [0.1, 0.5, 0.99]
    got = (
        grouped_quantiles(rd.from_pandas(df).repartition(8), ["g"], "v", qs,
                          sample_rows=4096)
        .to_pandas()
        .sort_values(["g", "q"])
        .reset_index(drop=True)
    )
    want_rows = []
    for gg, sub in df.groupby("g"):
        s = np.sort(sub.v.to_numpy())
        m = len(s)
        for q in qs:
            k = min(max(int(np.ceil(m * q)) - 1, 0), m - 1)
            want_rows.append((gg, q, s[k]))
    want = pd.DataFrame(want_rows, columns=["g", "q", "value"]).sort_values(
        ["g", "q"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert got.value.dtype == np.int64  # giant path kept the int type


def test_grouped_quantiles_giant_keeps_null_group(ray_session):
    """Review-confirmed bug: NULL-keyed rows vanished when a giant was
    detected (null equality propagated through the drop mask).  The
    NULL group must survive on the normal path."""
    import pyarrow as pa

    from rayraster.agg import grouped_quantiles

    g = ["big"] * 9000 + [None] * 500 + ["s1"] * 500
    v = list(range(10000))
    ds = rd.from_arrow(pa.table({"g": pa.array(g, type=pa.string()),
                                 "v": pa.array(v, type=pa.int64())}))
    got = (
        grouped_quantiles(ds, ["g"], "v", [0.5], sample_rows=2048)
        .to_pandas()
    )
    assert set(got.g.fillna("<null>")) == {"big", "<null>", "s1"}
    # null-group median: values 9000..9499 → k = ceil(500*0.5)-1 = 249
    assert got[got.g.isna()].value.tolist() == [9249]
    assert got[got.g == "big"].value.tolist() == [4499]


def test_grouped_quantiles_single_group_all_giant(ray_session):
    """Degenerate case: ONE group = the whole dataset (the partitioned
    remainder is empty)."""
    from rayraster.agg import grouped_quantiles

    df = pd.DataFrame({"g": ["only"] * 5000, "v": np.arange(5000.0)})
    got = (
        grouped_quantiles(rd.from_pandas(df), ["g"], "v", [0.5], sample_rows=1024)
        .to_pandas()
    )
    assert got.g.tolist() == ["only"] and got.value.tolist() == [2499.0]


def test_exact_quantiles_rejects_wide_integers(ray_session):
    """Advisor item: an int64 column at hash/id magnitude (>= 2^53)
    must raise instead of silently returning a rounded double."""
    from rayraster.agg import exact_quantiles

    df = pd.DataFrame({"v": np.array([2**60, 2**60 + 1, 5], dtype=np.int64)})
    with pytest.raises(ValueError, match="2\\^53"):
        exact_quantiles(rd.from_pandas(df), "v", [0.5])
    # floats of any magnitude stay fine (already doubles)
    fdf = pd.DataFrame({"v": [1e300, -1e300, 0.0]})
    assert exact_quantiles(rd.from_pandas(fdf), "v", [0.5]) == [0.0]


def test_exact_quantiles_duplicate_atom_and_outlier(ray_session):
    """Regression (review-confirmed crashes): a zero-value duplicate
    mass larger than collect_threshold, and an extreme outlier, must
    both converge quickly — the chosen bin's ACTUAL [min,max] bounds
    terminate pure-value bins instantly and collapse empty range."""
    from rayraster.agg import exact_quantiles

    rng = np.random.default_rng(3)
    vals = np.concatenate([np.zeros(300_000), rng.uniform(0.5, 2.0, 300_000)])
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(8)
    assert exact_quantiles(ds, "v", [0.25]) == [0.0]  # inside the zero atom

    vals2 = np.concatenate([rng.uniform(0, 1, 50_000), [1e300, -1e300]])
    ds2 = rd.from_pandas(pd.DataFrame({"v": vals2}))
    got = exact_quantiles(ds2, "v", [0.5], collect_threshold=1024)[0]
    s = np.sort(vals2)
    assert got == s[int(np.ceil(len(s) * 0.5)) - 1]


def test_exact_quantiles_ignores_nulls(ray_session):
    """NULLs are ignored (quantile_disc semantics), not poisoning the
    range scan."""
    from rayraster.agg import exact_quantiles

    df = pd.DataFrame({"v": [1.0, 2.0, None, 3.0, None, 4.0, 5.0]})
    assert exact_quantiles(rd.from_pandas(df), "v", [0.5]) == [3.0]


# --------------------------------------------------------------------------
# rolling_time_aggregate (global RANGE frame without a global sort)
# --------------------------------------------------------------------------


def _rolling_events(seed: int, n: int, span_us: int):
    rng = np.random.default_rng(seed)
    us = np.sort(rng.integers(0, span_us, n))
    # inject timestamp TIES (RANGE-frame peers) to pin peer semantics
    us[n // 3] = us[n // 3 + 1]
    us[2 * n // 3] = us[2 * n // 3 + 1] = us[2 * n // 3 + 2]
    v = rng.integers(-50, 1000, n)
    return us.astype(np.int64), v.astype(np.int64)


def _brute_rolling(us, v, window_us):
    order = np.argsort(us, kind="stable")
    us, v = us[order], v[order]
    cum = np.cumsum(v)
    lo = np.searchsorted(us, us - window_us, side="left")
    hi = np.searchsorted(us, us, side="right")
    rs = cum[hi - 1] - np.where(lo > 0, cum[np.maximum(lo - 1, 0)], 0)
    return us, rs, (hi - lo)


def test_rolling_time_aggregate_matches_duckdb(ray_session):
    import duckdb
    import pyarrow as pa
    from rayraster.windows import rolling_time_aggregate

    us, v = _rolling_events(5, 4000, 40 * 3_600_000_000)
    win = 7_200_000_000
    t = pa.table({"ts": pa.array(us, type=pa.timestamp("us")), "value": v,
                  "eid": np.arange(len(us), dtype=np.int64)})
    out = (
        rolling_time_aggregate(
            rd.from_arrow(t), window_us=win, bucket_us=3 * win, keep_cols=("eid",)
        )
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    want = duckdb.connect().execute(
        """SELECT eid,
                  SUM(value) OVER (ORDER BY epoch_us(ts)
                    RANGE BETWEEN 7200000000 PRECEDING AND CURRENT ROW) AS rs,
                  COUNT(*) OVER (ORDER BY epoch_us(ts)
                    RANGE BETWEEN 7200000000 PRECEDING AND CURRENT ROW) AS rn
           FROM t ORDER BY eid"""
    ).df()
    assert out.rolling_sum.tolist() == want.rs.astype(int).tolist()
    assert out.rolling_n.tolist() == want.rn.astype(int).tolist()


def test_rolling_bucket_width_invariance(ray_session):
    """The answer is a pure function of the data — identical across
    bucket widths, including windows LARGER than the bucket (multi-hop
    halo) and buckets much larger than the window (no halo at all)."""
    import pyarrow as pa
    from rayraster.windows import rolling_time_aggregate

    us, v = _rolling_events(9, 2500, 30 * 3_600_000_000)
    win = 7_200_000_000
    t = pa.table({"ts": pa.array(us, type=pa.timestamp("us")), "value": v,
                  "eid": np.arange(len(us), dtype=np.int64)})
    ref = None
    for bucket in (win // 3, win, 2 * win, 100 * win):
        out = (
            rolling_time_aggregate(
                rd.from_arrow(t), window_us=win, bucket_us=bucket, keep_cols=("eid",)
            )
            .to_pandas()
            .sort_values("eid")
            .reset_index(drop=True)
        )
        got = (out.rolling_sum.tolist(), out.rolling_n.tolist())
        if ref is None:
            srt, rs, rn = _brute_rolling(us, v, win)
            assert got == (rs.tolist(), rn.tolist())
            ref = got
        assert got == ref
        assert len(out) == len(us)  # halo rows never emitted


def test_rolling_rejects_float_values(ray_session):
    import pyarrow as pa
    from rayraster.windows import rolling_time_aggregate

    t = pa.table({"ts": pa.array([0, 1], type=pa.timestamp("us")),
                  "value": [1.5, 2.5]})
    with pytest.raises(Exception, match="integer"):
        rolling_time_aggregate(rd.from_arrow(t)).materialize()


# --------------------------------------------------------------------------
# global_rank (distributed ROW_NUMBER without an all-to-all sort)
# --------------------------------------------------------------------------


def test_global_rank_matches_duckdb(ray_session):
    import duckdb
    import pyarrow as pa
    from rayraster.agg import global_rank

    rng = np.random.default_rng(13)
    n = 5000
    t = pa.table(
        {
            "score": rng.integers(0, 200, n),          # heavy ties
            "uid": rng.permutation(n).astype(np.int64),  # unique tiebreak
        }
    )
    out = (
        global_rank(
            rd.from_arrow(t),
            [("score", "descending"), ("uid", "ascending")],
            bucket_fn=lambda b: -b["score"].to_numpy(zero_copy_only=False),
            num_partitions=8,
        )
        .to_pandas()
        .sort_values("uid")
        .reset_index(drop=True)
    )
    want = duckdb.connect().execute(
        """SELECT uid, row_number() OVER (ORDER BY score DESC, uid) AS rank
           FROM t ORDER BY uid"""
    ).df()
    assert out["rank"].tolist() == want["rank"].astype(int).tolist()


def test_global_rank_coarse_buckets(ray_session):
    """A coarser monotone bucket (score // 50) still yields the exact
    ranks — bucketing only bounds the local-sort width."""
    import pyarrow as pa
    from rayraster.agg import global_rank

    rng = np.random.default_rng(17)
    n = 3000
    t = pa.table(
        {"score": rng.integers(0, 1000, n),
         "uid": rng.permutation(n).astype(np.int64)}
    )
    fine = global_rank(
        rd.from_arrow(t), [("score", "ascending"), ("uid", "ascending")],
        bucket_fn=lambda b: b["score"].to_numpy(zero_copy_only=False),
    ).to_pandas().sort_values("uid").reset_index(drop=True)
    coarse = global_rank(
        rd.from_arrow(t), [("score", "ascending"), ("uid", "ascending")],
        bucket_fn=lambda b: b["score"].to_numpy(zero_copy_only=False) // 50,
        num_partitions=4,
    ).to_pandas().sort_values("uid").reset_index(drop=True)
    assert fine["rank"].tolist() == coarse["rank"].tolist()
    assert sorted(fine["rank"].tolist()) == list(range(1, n + 1))


def test_grouped_ewma_matches_pandas(ray_session):
    from rayraster.windows import grouped_ewma

    rng = np.random.default_rng(19)
    n = 20_000
    keys = rng.integers(0, 37, n)
    ts = rng.permutation(n).astype(np.int64)
    vals = rng.normal(0, 5, n)
    vals[rng.random(n) < 0.02] = np.nan
    t = pa.table({"k": pa.array(keys, type=pa.int64()),
                  "ts": pa.array(ts), "v": pa.array(vals)})
    for adjust in (True, False):
        got = (
            grouped_ewma(rd.from_arrow(t).repartition(8), "k", "ts", "v",
                         alpha=0.3, adjust=adjust, num_partitions=8)
            .to_pandas().sort_values(["k", "ts"]).reset_index(drop=True)
        )
        want = (
            t.to_pandas().sort_values(["k", "ts"]).reset_index(drop=True)
        )
        want["ewma"] = want.groupby("k")["v"].transform(
            lambda s: s.ewm(alpha=0.3, adjust=adjust).mean()
        )
        assert np.allclose(got.ewma.to_numpy(), want.ewma.to_numpy(),
                           equal_nan=True)


def test_grouped_ewma_validation_and_alpha_one(ray_session):
    from rayraster.windows import grouped_ewma

    t = pa.table({"k": pa.array([1, 1, 1], type=pa.int64()),
                  "ts": pa.array([1, 2, 3], type=pa.int64()),
                  "v": pa.array([1.0, 2.0, 3.0])})
    with pytest.raises(ValueError, match="alpha"):
        grouped_ewma(rd.from_arrow(t), "k", "ts", "v", alpha=0.0)
    # alpha=1: ewma == the value itself
    out = (grouped_ewma(rd.from_arrow(t), "k", "ts", "v", alpha=1.0)
           .to_pandas().sort_values("ts"))
    assert np.allclose(out.ewma, [1.0, 2.0, 3.0])


def test_grouped_ewma_dyadic_matches_pandas_and_is_partition_invariant(ray_session):
    from rayraster.windows import grouped_ewma_dyadic

    rng = np.random.default_rng(23)
    n = 5_000
    keys = rng.integers(0, 29, n)
    ts = rng.permutation(n).astype(np.int64)
    vals = rng.integers(-200, 200, n).astype(np.int64)
    # bound per-key length so the dyadic closed form stays exact int64
    df = pd.DataFrame({"k": keys, "ts": ts, "v": vals})
    df["pos"] = df.sort_values(["k", "ts"]).groupby("k").cumcount().reindex(df.index)
    df = df[df.pos < 40].drop(columns=["pos"]).reset_index(drop=True)
    t = pa.Table.from_pandas(df)

    outs = []
    for parts in (3, 8):
        got = (
            grouped_ewma_dyadic(rd.from_arrow(t).repartition(6), "k", ["ts"],
                                "v", s=1, num_partitions=parts)
            .to_pandas().sort_values(["k", "ts"]).reset_index(drop=True)
        )
        outs.append(got)
    # partition invariance is BIT-exact (pure int arithmetic + one division)
    assert (outs[0].ewma.to_numpy() == outs[1].ewma.to_numpy()).all()
    assert (outs[0].ewma_pos.to_numpy() == outs[1].ewma_pos.to_numpy()).all()

    want = df.sort_values(["k", "ts"]).reset_index(drop=True)
    want["ewma"] = want.groupby("k")["v"].transform(
        lambda s: s.ewm(alpha=0.5, adjust=True).mean()
    )
    assert np.allclose(outs[0].ewma.to_numpy(), want.ewma.to_numpy(),
                       rtol=1e-12, atol=1e-12)


def test_grouped_ewma_dyadic_string_keys_and_guards(ray_session):
    from rayraster.windows import grouped_ewma_dyadic

    t = pa.table({
        "k": pa.array(["a", "b", "a", "b", "a"], type=pa.string()),
        "ts": pa.array([1, 1, 2, 2, 3], type=pa.int64()),
        "v": pa.array([4, 10, 8, 2, 1], type=pa.int64()),
    })
    out = (grouped_ewma_dyadic(rd.from_arrow(t), "k", ["ts"], "v",
                               num_partitions=2)
           .to_pandas().sort_values(["k", "ts"]).reset_index(drop=True))
    # hand values: a: 4, (4+2*8)/3, (4+2*8+4*1)/7 ; b: 10, (10+2*2)/3
    assert np.allclose(out[out.k == "a"].ewma.to_numpy(),
                       [4.0, 20.0 / 3.0, 24.0 / 7.0])
    assert np.allclose(out[out.k == "b"].ewma.to_numpy(), [10.0, 14.0 / 3.0])
    assert list(out[out.k == "a"].ewma_pos) == [0, 1, 2]

    big = pa.table({"k": pa.array([1] * 70, type=pa.int64()),
                    "ts": pa.array(range(70), type=pa.int64()),
                    "v": pa.array([1] * 70, type=pa.int64())})
    with pytest.raises(Exception, match="overflow"):
        grouped_ewma_dyadic(rd.from_arrow(big), "k", ["ts"], "v").to_pandas()
    flt = pa.table({"k": pa.array([1], type=pa.int64()),
                    "ts": pa.array([1], type=pa.int64()),
                    "v": pa.array([1.5])})
    with pytest.raises(Exception, match="integer"):
        grouped_ewma_dyadic(rd.from_arrow(flt), "k", ["ts"], "v").to_pandas()


def test_cohort_retention_matches_brute_and_partition_invariant(ray_session):
    from rayraster.windows import cohort_retention

    rng = np.random.default_rng(31)
    n = 4_000
    P = 1_000_000  # 1-second periods over a ~20-period span
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 60, n),
            "ts": pd.to_datetime(rng.integers(0, 20 * P, n), unit="us"),
        }
    )
    # brute: distinct (user, period) → min-period cohorts → counts
    b = df.assign(period=(df.ts.astype(np.int64) // 1000) // P)
    dp = b[["user_id", "period"]].drop_duplicates()
    ch = dp.groupby("user_id").period.min().rename("cohort")
    j = dp.join(ch, on="user_id")
    j["offset"] = j.period - j.cohort
    want = (
        j.groupby(["cohort", "offset"]).size().rename("n_active").reset_index()
    )
    sizes = want[want.offset == 0].set_index("cohort").n_active
    want["rate"] = want.n_active / want.cohort.map(sizes)

    outs = []
    for parts in (3, 8):
        got = (
            cohort_retention(
                rd.from_pandas(df).repartition(5), period_us=P,
                num_partitions=parts,
            )
            .to_pandas().sort_values(["cohort", "offset"]).reset_index(drop=True)
        )
        outs.append(got)
    for got in outs:
        w = want.sort_values(["cohort", "offset"]).reset_index(drop=True)
        assert (got.cohort.to_numpy() == w.cohort.to_numpy()).all()
        assert (got.offset.to_numpy() == w.offset.to_numpy()).all()
        assert (got.n_active.to_numpy() == w.n_active.to_numpy()).all()
        assert (got.rate.to_numpy() == w.rate.to_numpy()).all()  # one IEEE div
        assert (got.cohort_size.to_numpy()
                == w.cohort.map(sizes).to_numpy()).all()
    with pytest.raises(ValueError, match="period_us"):
        cohort_retention(rd.from_pandas(df), period_us=0)


def _funnel_brute(df, stages):
    """Reference first-touch funnel in plain pandas (per-user loop)."""
    rows = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values("us")
        prev = -(2**62)
        ts_list, val_list = [], []
        for s in stages:
            cand = g[(g.event_type == s) & (g.us > prev)]
            if len(cand) == 0:
                break
            t = int(cand.us.min())
            tied = cand[cand.us == t].value
            tied = tied.dropna()
            val_list.append(tied.min() if len(tied) else np.nan)
            ts_list.append(t)
            prev = t
        if not ts_list:
            continue
        vals = [v for v in val_list if not np.isnan(v)]
        steps = [b - a for a, b in zip(ts_list, ts_list[1:])]
        rows.append(
            {
                "user_id": uid,
                "funnel_start": ts_list[0],
                "n_stages": len(ts_list),
                "min_value": min(vals) if vals else np.nan,
                "max_value": max(vals) if vals else np.nan,
                "max_step_us": max(steps) if steps else 0,
            }
        )
    return pd.DataFrame(rows).sort_values("user_id").reset_index(drop=True)


def _funnel_df(seed=7, n=600, users=25):
    rng = np.random.default_rng(seed)
    us = rng.integers(0, 10**9, n)
    df = pd.DataFrame(
        {
            "ts": pd.to_datetime(us, unit="us"),
            "us": us,
            "user_id": rng.integers(1, users + 1, n),
            "event_type": rng.choice(["view", "click", "purchase", "error"], n),
            "value": rng.normal(size=n).round(3),
        }
    )
    return df


def test_funnel_match_matches_brute(ray_session):
    from rayraster.windows import funnel_match

    stages = ["view", "click", "purchase"]
    df = _funnel_df()
    got = (
        funnel_match(rd.from_pandas(df.drop(columns=["us"])), stages)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = _funnel_brute(df, stages)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_funnel_match_partition_invariant_and_single_stage(ray_session):
    from rayraster.windows import funnel_match

    df = _funnel_df(seed=11)
    a = (
        funnel_match(rd.from_pandas(df.drop(columns=["us"])), ["click"], num_partitions=3)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    b = (
        funnel_match(
            rd.from_pandas(df.drop(columns=["us"])).repartition(13),
            ["click"],
            num_partitions=64,
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert (a.n_stages == 1).all()
    assert (a.max_step_us == 0).all()
    # single stage: funnel_start = first click, values = that event's value
    want = _funnel_brute(df, ["click"])
    pd.testing.assert_frame_equal(a, want, check_dtype=False)


def test_funnel_match_strict_order_and_ties(ray_session):
    from rayraster.windows import funnel_match

    base = 1_000_000
    rows = [
        # user 1: click at SAME us as first view -> not counted (strict >)
        (1, base, "view", 5.0),
        (1, base, "click", 1.0),
        (1, base + 10, "click", 2.0),
        (1, base + 20, "purchase", 3.0),
        # user 2: purchase before any view -> only reaches view
        (2, base, "purchase", 9.0),
        (2, base + 5, "view", 1.5),
        # user 3: no view at all -> excluded
        (3, base, "click", 4.0),
        # user 4: two views tie at min ts -> MIN(value) wins
        (4, base, "view", 7.0),
        (4, base, "view", 2.5),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "us", "event_type", "value"])
    df["ts"] = pd.to_datetime(df.us, unit="us")
    out = (
        funnel_match(
            rd.from_pandas(df[["ts", "user_id", "event_type", "value"]]),
            ["view", "click", "purchase"],
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert out.user_id.tolist() == [1, 2, 4]
    u1 = out.iloc[0]
    assert (u1.n_stages, u1.funnel_start, u1.max_step_us) == (3, base, 10)
    assert (u1.min_value, u1.max_value) == (2.0, 5.0)  # tied click excluded
    u2 = out.iloc[1]
    assert (u2.n_stages, u2.min_value, u2.max_value) == (1, 1.5, 1.5)
    u4 = out.iloc[2]
    assert (u4.min_value, u4.max_value) == (2.5, 2.5)


def test_funnel_match_validations(ray_session):
    from rayraster.windows import funnel_match

    ds = rd.from_items([{"ts": 0, "user_id": 1, "event_type": "a", "value": 1.0}])
    with pytest.raises(ValueError, match="at least one stage"):
        funnel_match(ds, [])
    with pytest.raises(ValueError, match="distinct"):
        funnel_match(ds, ["a", "a"])


def test_assign_equidepth_bins_matches_brute(ray_session):
    from rayraster.agg import assign_equidepth_bins

    rng = np.random.default_rng(2)
    x = rng.normal(size=500).round(2)  # rounding forces duplicates
    cuts = np.quantile(x, [0.25, 0.5, 0.75], method="lower")
    ds = rd.from_pandas(pd.DataFrame({"value": x}))
    out = assign_equidepth_bins(ds, "value", cuts).to_pandas()
    want = np.array([(c < v).sum() for v, c in zip(out.value, [cuts] * len(out))])
    assert (out.bin.to_numpy() == want).all()
    # cut-equal values land in the LOWER bin (strict >)
    eq = out[out.value == cuts[1]]
    assert len(eq) > 0 and (eq.bin == 1).all()
    # populations are near-equal (equi-depth)
    counts = out.bin.value_counts()
    assert counts.min() > 80


def test_assign_equidepth_bins_nan_and_validations(ray_session):
    import pytest as _pt

    from rayraster.agg import assign_equidepth_bins

    ds = rd.from_pandas(pd.DataFrame({"value": [1.0, np.nan, 3.0]}))
    out = assign_equidepth_bins(ds, "value", [2.0]).to_pandas().sort_values("value")
    assert out.bin.tolist()[:2] == [0, 1]
    assert out[out.value.isna()].bin.tolist() == [-1]
    with _pt.raises(ValueError, match="at least one"):
        assign_equidepth_bins(ds, "value", [])
    with _pt.raises(ValueError, match="sorted"):
        assign_equidepth_bins(ds, "value", [3.0, 1.0])


def test_grouped_variance_matches_duckdb_twin_bit_exact(ray_session):
    import duckdb

    from rayraster.agg import grouped_variance

    rng = np.random.default_rng(6)
    df = pd.DataFrame(
        {"g": rng.integers(0, 7, 800), "v": rng.integers(-500, 500, 800)}
    )
    got = (
        grouped_variance(rd.from_pandas(df), ["g"], "v", num_partitions=5)
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    ora = duckdb.sql(
        """WITH s AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS sx,
         CAST(SUM(v*v) AS BIGINT) AS sx2
  FROM df GROUP BY g)
SELECT g, n, sx, sx2,
  CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
  CAST(n*sx2 - sx*sx AS DOUBLE)
    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS var,
  sqrt(CAST(n*sx2 - sx*sx AS DOUBLE)
    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS std
FROM s ORDER BY g"""
    ).df()
    for c, o in [("n", "n"), (f"sum_v", "sx"), ("sumsq_v", "sx2"),
                 ("mean", "mean"), ("var", "var"), ("std", "std")]:
        assert (got[c].to_numpy() == ora[o].to_numpy()).all(), c
    # sanity vs numpy population variance
    for g, grp in df.groupby("g"):
        row = got[got.g == g].iloc[0]
        assert abs(row["var"] - grp.v.to_numpy().var()) < 1e-9


def test_grouped_variance_floats_and_overflow_guard(ray_session):
    import pytest as _pt

    from rayraster.agg import grouped_variance

    df = pd.DataFrame({"g": [0, 0, 1], "v": [1.5, 2.5, 4.0]})
    out = grouped_variance(rd.from_pandas(df), ["g"], "v").to_pandas()
    r0 = out[out.g == 0].iloc[0]
    assert abs(r0["var"] - 0.25) < 1e-12 and r0["mean"] == 2.0
    r1 = out[out.g == 1].iloc[0]
    assert r1["var"] == 0.0 and r1["std"] == 0.0
    big = pd.DataFrame({"g": [0], "v": np.array([2**32], dtype=np.int64)})
    with _pt.raises(Exception, match="int64"):
        grouped_variance(rd.from_pandas(big), ["g"], "v").to_pandas()


def test_transition_counts_matches_duckdb(ray_session):
    import duckdb

    from rayraster.windows import transition_counts

    rng = np.random.default_rng(13)
    n = 3000
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 40, n), type=pa.int64()),
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "ts": pa.array(rng.integers(0, 10_000, n), type=pa.int64()),
        "event_type": pa.array(
            np.array(["view", "click", "buy", "scroll"])[rng.integers(0, 4, n)]
        ),
    })
    got = sorted(
        (r["from_type"], r["to_type"], r["n"], r["n_from"], r["p"])
        for r in transition_counts(
            rd.from_arrow(t).repartition(6), num_partitions=8
        ).take_all()
    )
    con = duckdb.connect()
    con.register("ev", t)
    want = sorted(
        tuple(r) for r in con.sql("""
        WITH tr AS (
          SELECT event_type AS f,
                 LEAD(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS t2
          FROM ev),
        c AS (SELECT f, t2, CAST(COUNT(*) AS BIGINT) AS n
              FROM tr WHERE t2 IS NOT NULL GROUP BY f, t2),
        tot AS (SELECT f, CAST(SUM(n) AS BIGINT) AS nf FROM c GROUP BY f)
        SELECT c.f, c.t2, c.n, tot.nf,
               CAST(c.n AS DOUBLE) / CAST(tot.nf AS DOUBLE)
        FROM c JOIN tot USING (f)
        """).fetchall()
    )
    assert got == want
    # partition invariance
    again = sorted(
        (r["from_type"], r["to_type"], r["n"], r["n_from"], r["p"])
        for r in transition_counts(
            rd.from_arrow(t).repartition(2), num_partitions=3
        ).take_all()
    )
    assert again == got

    with pytest.raises(ValueError, match="order column"):
        transition_counts(rd.from_arrow(t), order_cols=())


def test_grouped_linreg_matches_duckdb_twin_bit_exact(ray_session):
    import duckdb

    from rayraster.agg import grouped_linreg

    rng = np.random.default_rng(9)
    x = rng.integers(-300, 300, 900)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 6, 900),
            "x": x,
            "y": 3 * x + rng.integers(-40, 40, 900),
        }
    )
    got = (
        grouped_linreg(rd.from_pandas(df).repartition(4), ["g"], "x", "y",
                       num_partitions=5)
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    ora = duckdb.sql(
        """WITH s AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(y*y) AS BIGINT) AS syy,
         CAST(SUM(x*y) AS BIGINT) AS sxy
  FROM df GROUP BY g),
r AS (
  SELECT g, n, sx, sy, sxx, syy, sxy,
    (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
      / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
      AS slope,
    (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
      / (sqrt(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
         * sqrt(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
                - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))) AS r
  FROM s)
SELECT g, n, sx, sy, sxx, syy, sxy, slope,
       (CAST(sy AS DOUBLE) - slope*CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
         AS intercept,
       r, r*r AS r2
FROM r ORDER BY g"""
    ).df()
    for c, o in [("n", "n"), ("sum_x", "sx"), ("sum_y", "sy"),
                 ("sum_xx", "sxx"), ("sum_yy", "syy"), ("sum_xy", "sxy"),
                 ("slope", "slope"), ("intercept", "intercept"),
                 ("r", "r"), ("r2", "r2")]:
        assert (got[c].to_numpy() == ora[o].to_numpy()).all(), c
    # sanity vs numpy polyfit / corrcoef
    for g, grp in df.groupby("g"):
        row = got[got.g == g].iloc[0]
        m, b = np.polyfit(grp.x, grp.y, 1)
        assert abs(row.slope - m) < 1e-8 and abs(row.intercept - b) < 1e-6
        assert abs(row.r - np.corrcoef(grp.x, grp.y)[0, 1]) < 1e-10


def test_grouped_linreg_degenerate_and_guard(ray_session):
    import pytest as _pt

    from rayraster.agg import grouped_linreg

    # constant x in one group: slope/r are NaN or inf the IEEE way
    df = pd.DataFrame(
        {"g": [0, 0, 0, 1, 1], "x": [5, 5, 5, 1, 2], "y": [1, 2, 3, 10, 20]}
    )
    got = grouped_linreg(rd.from_pandas(df), ["g"], "x", "y").to_pandas()
    row0 = got[got.g == 0].iloc[0]
    assert not np.isfinite(row0.slope) or np.isnan(row0.slope)
    row1 = got[got.g == 1].iloc[0]
    assert row1.slope == 10.0 and row1.intercept == 0.0
    # overflow guard raises instead of wrapping
    big = pd.DataFrame({"g": [0, 0], "x": [2**32, 2**32], "y": [1, 1]})
    with _pt.raises(Exception, match="pre-scale"):  # ValueError via RayTaskError
        grouped_linreg(rd.from_pandas(big), ["g"], "x", "y").to_pandas()


def _brute_skyline(df, a, b):
    pts = df[[a, b]].to_numpy()
    keep = []
    for i, (x, y) in enumerate(pts):
        dom = ((pts[:, 0] >= x) & (pts[:, 1] >= y)
               & ((pts[:, 0] > x) | (pts[:, 1] > y))).any()
        if not dom:
            keep.append(i)
    return df.iloc[keep]


def test_skyline_matches_brute_and_partition_invariant(ray_session):
    from rayraster.agg import skyline

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {"id": np.arange(400),
         "a": rng.integers(0, 50, 400),
         "b": rng.integers(0, 50, 400)}
    )
    want = _brute_skyline(df, "a", "b").sort_values(["id"]).reset_index(drop=True)
    for parts in (1, 6):
        got = (
            skyline(rd.from_pandas(df).repartition(parts), "a", "b")
            .to_pandas().sort_values(["id"]).reset_index(drop=True)
        )
        assert got[["id", "a", "b"]].values.tolist() == want[["id", "a", "b"]].values.tolist()


def test_skyline_duplicates_and_edges(ray_session):
    from rayraster.agg import skyline

    # duplicated frontier point kept twice; dominated duplicates dropped
    df = pd.DataFrame(
        {"id": [1, 2, 3, 4, 5],
         "a": [5, 5, 4, 9, 9],
         "b": [7, 7, 7, 1, 1]}
    )
    got = skyline(rd.from_pandas(df), "a", "b").to_pandas().sort_values("id")
    assert sorted(got.id) == [1, 2, 4, 5]
    # single row, and floats
    one = pd.DataFrame({"id": [1], "a": [0.5], "b": [-2.5]})
    g1 = skyline(rd.from_pandas(one), "a", "b").to_pandas()
    assert g1.id.tolist() == [1]
    # anti-correlated worst case still exact (whole set IS the frontier)
    n = 300
    anti = pd.DataFrame({"id": np.arange(n), "a": np.arange(n),
                         "b": n - np.arange(n)})
    ga = skyline(rd.from_pandas(anti).repartition(4), "a", "b").to_pandas()
    assert len(ga) == n


def test_rollup_aggregate_matches_duckdb_rollup(ray_session):
    import duckdb

    from rayraster.agg import rollup_aggregate

    rng = np.random.default_rng(12)
    df = pd.DataFrame(
        {
            "a": rng.choice(["x", "y", "z"], 600),
            "b": rng.integers(0, 5, 600),
            "v": rng.integers(-20, 20, 600),
        }
    )
    got = (
        rollup_aggregate(
            rd.from_pandas(df).repartition(5), ["a", "b"], "v",
            sentinels={"a": "__all__", "b": -1}, num_partitions=8,
        )
        .to_pandas().sort_values(["lvl", "a", "b"]).reset_index(drop=True)
    )
    want = duckdb.sql(
        """SELECT COALESCE(a, '__all__') AS a,
                  CASE WHEN GROUPING(b) = 1 THEN -1 ELSE b END AS b,
                  CAST(SUM(v) AS BIGINT) AS rsum,
                  COUNT(*) AS n,
                  2 - GROUPING(a) - GROUPING(b) AS lvl
           FROM df GROUP BY ROLLUP(a, b)
           ORDER BY lvl, a, b"""
    ).df()
    for c in ("a", "b", "rsum", "n", "lvl"):
        assert got[c].tolist() == want[c].tolist(), c
    # mass conservation across every level
    for lvl in (0, 1, 2):
        assert got[got.lvl == lvl].rsum.sum() == df.v.sum()
        assert got[got.lvl == lvl].n.sum() == 600


def test_rollup_aggregate_single_key_and_validation(ray_session):
    from rayraster.agg import rollup_aggregate

    df = pd.DataFrame({"a": ["p", "p", "q"], "v": [1, 2, 4]})
    got = (
        rollup_aggregate(rd.from_pandas(df), ["a"], "v", sentinels={"a": "__all__"})
        .to_pandas().sort_values(["lvl", "a"]).reset_index(drop=True)
    )
    assert got[got.lvl == 0].rsum.tolist() == [7]
    assert sorted(got[got.lvl == 1].rsum) == [3, 4]
    with pytest.raises(ValueError, match="sentinel"):
        rollup_aggregate(rd.from_pandas(df), ["a"], "v", sentinels={})
    with pytest.raises(ValueError, match="at least one key"):
        rollup_aggregate(rd.from_pandas(df), [], "v", sentinels={})


def test_cube_aggregate_matches_duckdb_cube(ray_session):
    import duckdb

    from rayraster.agg import cube_aggregate

    rng = np.random.default_rng(21)
    df = pd.DataFrame(
        {
            "a": rng.choice(["x", "y"], 400),
            "b": rng.integers(0, 4, 400),
            "v": rng.integers(-9, 9, 400),
        }
    )
    got = (
        cube_aggregate(
            rd.from_pandas(df).repartition(3), ["a", "b"], "v",
            sentinels={"a": "__all__", "b": -1}, num_partitions=8,
        )
        .to_pandas().sort_values(["lvl", "a", "b"]).reset_index(drop=True)
    )
    want = duckdb.sql(
        """SELECT COALESCE(a, '__all__') AS a,
                  CASE WHEN GROUPING(b) = 1 THEN -1 ELSE b END AS b,
                  CAST(SUM(v) AS BIGINT) AS rsum, COUNT(*) AS n,
                  2 - GROUPING(a) - GROUPING(b) AS lvl
           FROM df GROUP BY CUBE(a, b) ORDER BY lvl, a, b"""
    ).df()
    for c in ("a", "b", "rsum", "n", "lvl"):
        assert got[c].tolist() == want[c].tolist(), c
    # cube = rollup + the hour-only set: 4 grouping sets for d=2
    assert (got.lvl == 0).sum() == 1
    with pytest.raises(ValueError, match="more than 4"):
        cube_aggregate(rd.from_pandas(df), list("abcde"), "v", sentinels={})


def test_grouped_mad_matches_duckdb_twin(ray_session):
    import duckdb

    from rayraster.agg import grouped_mad

    rng = np.random.default_rng(14)
    df = pd.DataFrame(
        {"g": rng.choice(["a", "b", "c"], 700),
         "v": np.round(rng.standard_normal(700) * 10, 3)}
    )
    # plant outliers that wreck the variance but not the MAD
    df.loc[df.index[:5], "v"] = 1e6
    got = grouped_mad(rd.from_pandas(df).repartition(4), "g", "v").to_pandas()
    got = got.sort_values("g").reset_index(drop=True)
    want = duckdb.sql(
        """WITH m AS (
  SELECT g, quantile_disc(v, 0.5) AS med FROM df GROUP BY g
)
SELECT m.g, m.med,
       quantile_disc(abs(v - m.med), 0.5) AS mad
FROM df JOIN m USING (g) GROUP BY m.g, m.med ORDER BY m.g"""
    ).df()
    assert got.g.tolist() == want.g.tolist()
    assert (got.med.to_numpy() == want.med.to_numpy()).all()
    assert (got["mad"].to_numpy() == want["mad"].to_numpy()).all()
    # robustness: the outlier group's mad stays ~10, its std would be ~1e5
    assert got["mad"].max() < 50


def test_ntile_matches_sql_window(ray_session):
    import duckdb
    import ray.data as rd

    from rayraster.agg import ntile

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 25, 500)  # heavy ties
    ids = np.arange(500, dtype=np.int64)
    t = pa.table({"event_id": pa.array(ids), "qv": pa.array(vals.astype(np.int64))})
    for k in (1, 7, 16):
        got = (
            ntile(
                rd.from_arrow(t).repartition(6), k,
                [("qv", "ascending"), ("event_id", "ascending")],
                lambda b: b["qv"].to_numpy(zero_copy_only=False),
                num_partitions=4,
            )
            .to_pandas().sort_values("event_id")
        )
        want = duckdb.sql(
            f"SELECT event_id, NTILE({k}) OVER (ORDER BY qv, event_id) AS tile "
            "FROM t ORDER BY event_id"
        ).df()
        assert got["tile"].tolist() == want["tile"].tolist(), k
    # n < k: one row per tile, rank order
    small = pa.table({"event_id": pa.array([3, 1, 2], type=pa.int64()),
                      "qv": pa.array([9, 9, 9], type=pa.int64())})
    got = ntile(
        rd.from_arrow(small), 10,
        [("qv", "ascending"), ("event_id", "ascending")],
        lambda b: b["qv"].to_numpy(zero_copy_only=False),
    ).to_pandas().sort_values("event_id")
    assert got["tile"].tolist() == [1, 2, 3]
    with pytest.raises(ValueError, match="k must be"):
        ntile(rd.from_arrow(small), 0, [("qv", "ascending")], lambda b: None)


def test_grouped_rank_sums_vs_scipy_free_reference(ray_session):
    import ray.data as rd

    from rayraster.agg import grouped_rank_sums

    rng = np.random.default_rng(5)
    g = rng.choice(["a", "b", "c"], 400).tolist()
    v = rng.integers(0, 20, 400).astype(np.int64)  # heavy ties
    t = pa.table({"grp": pa.array(g), "qv": pa.array(v)})
    got = {
        r.grp: (r.n_g, r.two_rsum)
        for r in grouped_rank_sums(
            rd.from_arrow(t).repartition(5), "grp", "qv", num_partitions=4
        ).to_pandas().itertuples()
    }
    # reference: average ranks over the combined sorted sample
    order = np.argsort(v, kind="stable")
    ranks = np.empty(len(v), dtype=np.float64)
    sv = v[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0  # average of ranks i+1..j
        i = j
    for grp in "abc":
        mask = np.array([x == grp for x in g])
        assert got[grp] == (int(mask.sum()), int(round(2 * ranks[mask].sum())))
    # Mann-Whitney 2U for (a, b) from the doubled rank sums
    na, ra2 = got["a"]
    nb, _ = got["b"]
    two_u = 2 * na * nb + na * (na + 1) - ra2
    assert 0 <= two_u <= 2 * na * nb


def test_scd2_history_matches_sql_windows(ray_session):
    import duckdb

    from rayraster.windows import scd2_history

    rng = np.random.default_rng(13)
    n = 400
    key = rng.integers(0, 12, n).astype(np.int64)
    order = np.arange(n, dtype=np.int64)
    rng.shuffle(order)  # unique per key, arbitrary arrival
    state = rng.integers(0, 3, n).astype(np.int64)
    t = pa.table({"k": pa.array(key), "o": pa.array(order),
                  "s": pa.array(state)})
    got = (
        scd2_history(rd.from_arrow(t).repartition(5), "k", "o", "s",
                     num_partitions=4)
        .to_pandas().sort_values(["k", "valid_from"]).reset_index(drop=True)
    )
    want = duckdb.sql("""
        WITH r AS (
          SELECT k, o, s,
                 LAG(s) OVER (PARTITION BY k ORDER BY o) AS ps
          FROM t
        ),
        starts AS (
          SELECT k, o AS valid_from, s FROM r WHERE ps IS NULL OR s <> ps
        )
        SELECT k, s, valid_from,
               LEAD(valid_from) OVER (PARTITION BY k ORDER BY valid_from)
                 AS valid_to
        FROM starts ORDER BY k, valid_from
    """).df()
    assert got["k"].tolist() == want["k"].tolist()
    assert got["s"].tolist() == want["s"].tolist()
    assert got["valid_from"].tolist() == want["valid_from"].tolist()
    gt = got["valid_to"].fillna(-1).astype(np.int64).tolist()
    wt = want["valid_to"].fillna(-1).astype(np.int64).tolist()
    assert gt == wt
    # every key's last run is open
    assert (got.groupby("k")["valid_to"].apply(lambda s: s.isna().sum() == 1)).all()


def test_trajectory_trips_matches_sql_windows(ray_session):
    import duckdb

    from rayraster.windows import trajectory_trips

    rng = np.random.default_rng(17)
    n = 500
    key = rng.integers(0, 9, n).astype(np.int64)
    order = np.arange(n, dtype=np.int64)
    rng.shuffle(order)
    x = rng.uniform(-180, 180, n)
    y = rng.uniform(-90, 90, n)
    t = pa.table({"k": pa.array(key), "o": pa.array(order),
                  "x": pa.array(x), "y": pa.array(y)})
    got = (
        trajectory_trips(rd.from_arrow(t).repartition(5), "k", "o",
                         jump_threshold=80.0, num_partitions=4)
        .to_pandas().sort_values(["k", "trip"]).reset_index(drop=True)
    )
    want = duckdb.sql("""
        WITH tl AS (
          SELECT k, o, x, y,
                 LAG(x) OVER w AS px, LAG(y) OVER w AS py
          FROM t WINDOW w AS (PARTITION BY k ORDER BY o)
        ),
        tf AS (
          SELECT *,
            CASE WHEN px IS NULL
                   OR ((x-px)*(x-px) + (y-py)*(y-py)) > 6400.0
                 THEN 1 ELSE 0 END AS f,
            CASE WHEN px IS NULL
                   OR ((x-px)*(x-px) + (y-py)*(y-py)) > 6400.0
                 THEN CAST(0 AS BIGINT)
                 ELSE CAST(floor(((x-px)*(x-px) + (y-py)*(y-py))
                                 * 1000000.0) AS BIGINT) END AS qd
          FROM tl
        ),
        tt AS (
          SELECT *, CAST(SUM(f) OVER (PARTITION BY k ORDER BY o)
                         AS BIGINT) AS trip
          FROM tf
        )
        SELECT k, trip, CAST(COUNT(*) AS BIGINT) AS n,
               MIN(o) AS start, MAX(o) AS "end",
               CAST(SUM(qd) AS BIGINT) AS qlen
        FROM tt GROUP BY k, trip ORDER BY k, trip
    """).df()
    assert got["k"].tolist() == want["k"].tolist()
    assert got["trip"].tolist() == want["trip"].tolist()
    assert got["n"].tolist() == want["n"].tolist()
    assert got["start"].tolist() == want["start"].tolist()
    assert got["end"].tolist() == want["end"].tolist()
    assert got["qlen"].tolist() == want["qlen"].tolist()


def test_lagged_products_matches_brute(ray_session):
    from rayraster.windows import lagged_products

    rng = np.random.default_rng(47)
    rows = []
    for g in ("a", "b"):
        hours = sorted(rng.choice(200, 60, replace=False).tolist())
        for h in hours:
            rows.append((g, h, int(rng.integers(1, 9))))
    t = pa.table({"g": pa.array([r[0] for r in rows]),
                  "h": pa.array([r[1] for r in rows], type=pa.int64()),
                  "v": pa.array([r[2] for r in rows], type=pa.int64())})
    got = {
        (r.g, r.lag): r.num
        for r in lagged_products(
            rd.from_arrow(t).repartition(4), "g", "h", "v", [0, 1, 2, 3],
            num_partitions=4,
        ).to_pandas().itertuples()
    }
    series = {}
    for g, h, v in rows:
        series.setdefault(g, {})[h] = v
    for g, s in series.items():
        for k in (0, 1, 2, 3):
            want = sum(v * s.get(h - k, 0) for h, v in s.items())
            assert got.get((g, k), 0) == want, (g, k)


def test_grouped_ranks_matches_sql_window(ray_session):
    import duckdb

    from rayraster.agg import grouped_ranks

    rng = np.random.default_rng(53)
    n = 400
    g = rng.choice(["a", "b", "c"], n).tolist()
    v = rng.integers(0, 15, n).astype(np.int64)  # heavy ties
    eid = np.arange(n, dtype=np.int64)
    t = pa.table({"g": pa.array(g), "v": pa.array(v), "eid": pa.array(eid)})
    got = (
        grouped_ranks(rd.from_arrow(t).repartition(5), "g", "v",
                      num_partitions=4)
        .to_pandas().sort_values("eid").reset_index(drop=True)
    )
    want = duckdb.sql("""
        SELECT eid,
               CAST(2 * avg_r AS BIGINT) AS two_rank,
               CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS n_g
        FROM (SELECT g, eid,
                     AVG(CAST(r AS DOUBLE)) OVER (PARTITION BY g, v) AS avg_r
              FROM (SELECT g, v, eid,
                           ROW_NUMBER() OVER (PARTITION BY g ORDER BY v, eid)
                             AS r
                    FROM t))
        ORDER BY eid
    """).df()
    assert got["two_rank"].tolist() == want["two_rank"].tolist()
    assert got["n_g"].tolist() == want["n_g"].tolist()


def test_scd2_history_string_key(ray_session):
    """String key columns must hash through the FNV fallback (no
    astype(int64) crash) and produce the same history as int keys."""
    from rayraster.windows import scd2_history

    df = pd.DataFrame(
        {"k": ["a", "a", "b", "b", "b"],
         "o": [1, 2, 1, 2, 3],
         "s": ["x", "y", "p", "p", "q"]}
    )
    got = (
        scd2_history(rd.from_pandas(df).repartition(3), "k", "o", "s",
                     num_partitions=4)
        .to_pandas().sort_values(["k", "valid_from"]).reset_index(drop=True)
    )
    assert got[got.k == "a"].s.tolist() == ["x", "y"]
    assert got[got.k == "b"].s.tolist() == ["p", "q"]


def test_key_part_no_negative_on_overflow():
    """The multiply-hash must mask int64 wraparound: no negative
    partition ids for any key (incl. ones that overflow keys*1000003)."""
    from rayraster.windows import _key_part

    keys = pa.chunked_array([pa.array(
        [np.iinfo(np.int64).min, np.iinfo(np.int64).max, -1, 0,
         9223372036854775807 // 1000003 + 1], type=pa.int64())])
    part = _key_part(keys, 64)
    assert part.min() >= 0 and part.max() < 64


def test_rollup_sentinel_keeps_source_key_type(ray_session):
    """Rolled-up levels must carry the INPUT key column type (int32
    keys + int sentinel must not promote some levels to int64)."""
    from rayraster.agg import rollup_aggregate

    t = pa.table(
        {"a": pa.array([1, 1, 2], type=pa.int32()),
         "b": pa.array([1, 2, 2], type=pa.int32()),
         "v": pa.array([10, 20, 30], type=pa.int64())}
    )
    out = rollup_aggregate(
        rd.from_arrow(t), ["a", "b"], "v", {"a": -1, "b": -1},
        num_partitions=4,
    ).to_pandas()
    # every level unioned without schema conflict; totals correct
    assert out[out.lvl == 0].rsum.tolist() == [60]
    assert sorted(out[out.lvl == 1].rsum.tolist()) == [30, 30]


def test_grouped_mad_returns_dataset(ray_session):
    """grouped_mad is annotated -> Dataset; chaining Dataset ops must
    work (the pa.Table return broke union/map_batches)."""
    from ray.data import Dataset

    from rayraster.agg import grouped_mad

    df = pd.DataFrame({"g": [1, 1, 1, 2, 2], "v": [1.0, 2.0, 9.0, 4.0, 8.0]})
    res = grouped_mad(rd.from_pandas(df).repartition(2), "g", "v")
    assert isinstance(res, Dataset)
    assert res.count() == 2


def test_key_part_type_based_dispatch_is_batch_invariant():
    """The hash-path choice must depend on the column TYPE only: the
    same string key must land in the same partition whether its batch
    happens to be all-numeric-looking or not (a content-based
    dispatch fragmented per-key results across partitions)."""
    from rayraster.windows import _key_part

    a = _key_part(pa.chunked_array([pa.array(["1", "2"])]), 8)
    b = _key_part(pa.chunked_array([pa.array(["1", "2", "x"])]), 8)
    assert a.tolist() == b[:2].tolist()
    # integer-typed columns keep the multiply-hash path
    c = _key_part(pa.chunked_array([pa.array([1, 2], type=pa.int64())]), 8)
    assert c.min() >= 0 and c.max() < 8


def test_grouped_variance_raises_on_wrapped_sum(ray_session):
    """Regression: two values whose squares individually fit int64 can
    WRAP in the grouped sum; the old post-fold bound inspected the
    wrapped (small) value and passed, returning garbage silently."""
    from rayraster.agg import grouped_variance

    v = 3_037_000_499  # v*v ~ 9.22e18 < 2^63, but 2*v*v wraps
    df = pd.DataFrame({"g": [1, 1], "v": np.array([v, v], dtype=np.int64)})
    with pytest.raises(Exception, match="wrap|pre-scale"):
        grouped_variance(rd.from_pandas(df), ["g"], "v").to_pandas()
    # sane inputs still work and stay exact
    df2 = pd.DataFrame({"g": [1, 1, 2], "v": np.array([1, 3, 5], dtype=np.int64)})
    out = grouped_variance(rd.from_pandas(df2), ["g"], "v").to_pandas()
    out = out.sort_values("g").reset_index(drop=True)
    assert out.loc[0, "var"] == 1.0 and out.loc[1, "var"] == 0.0


def test_grouped_linreg_raises_on_wrapped_moment(ray_session):
    """Same wrap class for the regression moments."""
    from rayraster.agg import grouped_linreg

    v = 3_037_000_499
    df = pd.DataFrame({"g": [1, 1], "x": np.array([v, v], dtype=np.int64),
                       "y": np.array([v, v], dtype=np.int64)})
    with pytest.raises(Exception, match="wrap|pre-scale"):
        grouped_linreg(rd.from_pandas(df), ["g"], "x", "y").to_pandas()


def test_grouped_quantiles_ignores_null_values(ray_session):
    """Regression: NULL values inflated n and sorted last, so q=1.0
    returned NULL and every other rank shifted; quantile_disc
    semantics ignore NULLs."""
    from rayraster.agg import grouped_quantiles

    t = pa.table({"g": pa.array([1, 1, 1], type=pa.int64()),
                  "v": pa.array([1.0, 2.0, None], type=pa.float64())})
    out = grouped_quantiles(rd.from_arrow(t), ["g"], "v", [0.5, 1.0],
                            num_partitions=2).to_pandas()
    out = out.sort_values("q").reset_index(drop=True)
    assert out.value.tolist() == [1.0, 2.0]


def test_transition_counts_drops_null_event_types(ray_session):
    """Regression: a null event_type crashed finish()'s np.unique;
    null types never transition."""
    from rayraster.windows import transition_counts

    df = pd.DataFrame({"user_id": [1, 1, 1, 1],
                       "event_type": ["a", None, "b", "a"],
                       "ts": pd.to_datetime([1, 2, 3, 4], unit="s"),
                       "event_id": [1, 2, 3, 4]})
    got = transition_counts(rd.from_pandas(df), num_partitions=2).to_pandas()
    got = got.sort_values(["from_type", "to_type"]).reset_index(drop=True)
    assert list(zip(got.from_type, got.to_type)) == [("a", "b"), ("b", "a")]


def test_funnel_match_string_keys_and_empty_partitions(ray_session):
    """Regression: the hardcoded int64 empty-result schema clashed
    with string-keyed partitions."""
    from rayraster.windows import funnel_match

    df = pd.DataFrame({
        "user_id": ["u1", "u1", "u2", "u3"],
        "event_type": ["view", "click", "other", "view"],
        "ts": pd.to_datetime([1, 2, 3, 4], unit="s"),
        "value": [1.0, 2.0, 3.0, 4.0],
    })
    got = funnel_match(rd.from_pandas(df), ["view", "click"],
                       num_partitions=8).to_pandas()
    got = got.sort_values("user_id").reset_index(drop=True)
    assert got.user_id.tolist() == ["u1", "u3"]
    assert got.n_stages.tolist() == [2, 1]


def test_cohort_retention_floors_negative_periods(ray_session):
    """Regression: pc.divide truncated toward zero, mis-cohorting
    pre-1970 timestamps vs the documented floor semantics."""
    from rayraster.windows import cohort_retention

    df = pd.DataFrame({
        "user_id": [1, 1],
        "ts": pd.to_datetime([-1_000_000, 1_000_000], unit="us"),
    })
    got = cohort_retention(rd.from_pandas(df), period_us=1_000_000,
                           num_partitions=2).to_pandas()
    # cohort = floor(-1.0) = -1; offsets 0 (period -1) and 2 (period 1)
    assert sorted(got.cohort.unique()) == [-1]
    assert sorted(got.offset.tolist()) == [0, 2]


def test_rolling_time_aggregate_raises_on_wrapped_prefix(ray_session):
    """Regression: the documented overflow check did not exist; a
    window whose prefix sum exceeds int64 must raise, not wrap."""
    from rayraster.windows import rolling_time_aggregate

    big = np.int64(1) << 62
    t = pa.table({"ts": pa.array(
        pd.to_datetime([1, 2, 3], unit="s")),
        "v": pa.array([big, big, big], type=pa.int64())})
    with pytest.raises(Exception, match="wrap"):
        rolling_time_aggregate(rd.from_arrow(t), ts_col="ts", value_col="v",
                               window_us=10_000_000).to_pandas()
