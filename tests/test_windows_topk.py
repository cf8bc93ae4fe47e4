"""Sliding/session windows + grouped top-k."""

import numpy as np
import pandas as pd
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
