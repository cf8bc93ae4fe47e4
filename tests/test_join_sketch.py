"""Bucketed large×large join + sketches (HLL, Bloom) + priority sampling."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from rayraster.join import bucket_join
from rayraster.sketch import HLL, approx_distinct


def test_bucket_join_matches_pandas(ray_session):
    rng = np.random.default_rng(4)
    left = pd.DataFrame(
        {"k": rng.integers(0, 50, 300), "lv": np.arange(300)}
    )
    right = pd.DataFrame(
        {"rk": rng.integers(0, 50, 120), "rv": np.arange(120) * 10}
    )
    out = (
        bucket_join(rd.from_pandas(left), rd.from_pandas(right), "k", "rk",
                    num_buckets=8)
        .to_pandas()
        .sort_values(["lv", "rv"])
        .reset_index(drop=True)
    )
    want = (
        left.merge(right, left_on="k", right_on="rk")
        .drop(columns=["rk"])
        .sort_values(["lv", "rv"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out[["k", "lv", "rv"]], want[["k", "lv", "rv"]])


def test_bucket_join_string_keys(ray_session):
    left = pd.DataFrame({"k": ["a", "b", "c", "a"], "lv": [1, 2, 3, 4]})
    right = pd.DataFrame({"k2": ["a", "c"], "name": ["alpha", "gamma"]})
    out = bucket_join(
        rd.from_pandas(left), rd.from_pandas(right), "k", "k2", num_buckets=4
    ).to_pandas()
    assert len(out) == 3
    assert set(out[out.k == "a"].name) == {"alpha"}


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(6)
    vals = rng.integers(0, 10**12, 50000)
    true = len(np.unique(vals))
    h = HLL(12).add_values(vals.tolist())
    assert abs(h.estimate() - true) / true < 0.05
    # merge equivalence: split input, merge sketches
    h1 = HLL(12).add_values(vals[:25000].tolist())
    h2 = HLL(12).add_values(vals[25000:].tolist())
    merged = h1.merge(h2)
    assert merged.estimate() == HLL(12).add_values(vals.tolist()).estimate()
    # serialization round trip
    assert HLL.from_bytes(merged.to_bytes()).estimate() == merged.estimate()


def test_hll_small_range_linear_counting():
    h = HLL(12).add_values(list(range(10)))
    assert abs(h.estimate() - 10) < 1


def test_approx_distinct_grouped(ray_session):
    df = pd.DataFrame(
        {
            "g": ["a"] * 5000 + ["b"] * 3000,
            "v": list(range(5000)) + list(range(1000)) * 3,
        }
    )
    out = approx_distinct(rd.from_pandas(df), "v", group_col="g").to_pandas()
    est = dict(zip(out.g, out.approx_distinct))
    assert abs(est["a"] - 5000) / 5000 < 0.05
    assert abs(est["b"] - 1000) / 1000 < 0.05


def test_asof_join_matches_pandas(ray_session):
    from rayraster.join import asof_join

    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame(
        {
            "event_id": range(6),
            "user_id": [1, 1, 1, 2, 2, 3],
            "ts": base + pd.to_timedelta([10, 20, 30, 5, 25, 7], unit="m"),
            "value": [1.0] * 6,
        }
    )
    right = pd.DataFrame(
        {
            "event_id": [100, 101, 102],
            "user_id": [1, 1, 2],
            "ts": base + pd.to_timedelta([15, 28, 20], unit="m"),
            "value": [10.0, 20.0, 30.0],
        }
    )
    out = (
        asof_join(rd.from_pandas(left), rd.from_pandas(right), key="user_id")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # user1: e1(t20)→100, e2(t30)→101; user2: e4(t25)→102; others drop
    assert out.event_id.tolist() == [1, 2, 4]
    assert out.event_id_r.tolist() == [100, 101, 102]
    assert out.value_r.tolist() == [10.0, 20.0, 30.0]

    # forward: earliest right ts >= left ts
    fwd = (
        asof_join(rd.from_pandas(left), rd.from_pandas(right), key="user_id",
                  direction="forward")
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    # user1: e0(t10)→100(t15), e1(t20)→101(t28); user2: e3(t5)→102(t20)
    assert fwd.event_id.tolist() == [0, 1, 3]
    assert fwd.event_id_r.tolist() == [100, 101, 102]

    # nearest with a 6-minute tolerance: only |Δts| <= 6 min survives
    near = (
        asof_join(rd.from_pandas(left), rd.from_pandas(right), key="user_id",
                  direction="nearest", tolerance_us=6 * 60 * 1_000_000)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    # e0(t10)→100(t15,Δ5), e1(t20)→100(Δ5), e2(t30)→101(Δ2), e4(t25)→102(Δ5)
    assert near.event_id.tolist() == [0, 1, 2, 4]
    assert near.event_id_r.tolist() == [100, 100, 101, 102]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="direction"):
        asof_join(rd.from_pandas(left), rd.from_pandas(right), key="user_id",
                  direction="sideways")


def test_asof_join_preserves_int64_precision(ray_session):
    """Hash-scale int64 ids (> 2^53) must survive the join EXACTLY:
    merge_asof's NaN-fill float promotion (and the pandas group
    conversion of null-filled int columns) must never touch real
    values — the engine merges on row positions and sentinel-fills."""
    from rayraster.join import asof_join

    base = pd.Timestamp("2024-01-01")
    n = 40
    left = pd.DataFrame(
        {
            "lid": (np.arange(n) + (1 << 60)).astype(np.int64),
            "user_id": np.arange(n, dtype=np.int64) % 3,
            "ts": base + pd.to_timedelta(np.arange(n) * 10 + 10, unit="m"),
        }
    )
    right = pd.DataFrame(
        {
            "qty": (np.arange(n) + (1 << 60)).astype(np.int64),
            "user_id": np.arange(n, dtype=np.int64) % 3,
            "ts": base + pd.to_timedelta(np.arange(n) * 10 + 5, unit="m"),
        }
    )
    # one left row guaranteed unmatched (before every right ts) —
    # historically THIS row triggered the whole-column float promotion
    left = pd.concat(
        [left, pd.DataFrame({"lid": [np.int64(7 + (1 << 60))],
                             "user_id": [np.int64(0)], "ts": [base]})],
        ignore_index=True,
    )
    out = (
        asof_join(rd.from_pandas(left), rd.from_pandas(right), key="user_id",
                  num_partitions=4)
        .to_pandas().sort_values("lid").reset_index(drop=True)
    )
    assert out["lid"].dtype.kind == "i" and out["qty"].dtype.kind == "i"
    assert len(out) == n  # the pre-range row dropped (inner)
    assert len(set(out["qty"])) == n  # all 40 distinct 2^60-scale values
    # the per-key backward match is right row j=i (ts 10i+5 ≤ 10i+10),
    # so qty equals lid EXACTLY — any precision loss breaks this
    assert (out["qty"].to_numpy() == out["lid"].to_numpy()).all()


def test_bucket_join_salted_hot_key(ray_session):
    """One key holding 40% of the left side: the salted join must give
    identical output to the unsalted join (and to pandas), with hot
    rows spread across salt sub-buckets and right hot rows replicated."""
    rng = np.random.default_rng(3)
    n = 20_000
    keys = np.where(rng.random(n) < 0.4, 7, rng.integers(0, 500, n))
    left = pd.DataFrame({"k": keys, "lv": np.arange(n)})
    right = pd.DataFrame({"k": np.arange(500), "rv": np.arange(500) * 3})
    want = left.merge(right, on="k").sort_values(["k", "lv"]).reset_index(drop=True)

    for kwargs in (
        {},
        {"salt": 8, "hot_keys": [7]},
        {"salt": 8, "hot_keys": "auto"},
    ):
        got = (
            bucket_join(rd.from_pandas(left), rd.from_pandas(right), "k", "k",
                        num_buckets=16, **kwargs)
            .to_pandas()
            .sort_values(["k", "lv"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[["k", "lv", "rv"]], want[["k", "lv", "rv"]])


def test_detect_hot_keys(ray_session):
    from rayraster.join import detect_hot_keys

    df = pd.DataFrame({"k": [9] * 5000 + list(range(1000))})
    hot = detect_hot_keys(rd.from_pandas(df), "k", num_buckets=16)
    assert hot == [9]


def test_asof_join_null_carry_and_carry_less_right(ray_session):
    """Inner semantics must use the match indicator, not a data
    column: a matched right row whose carry value is NULL is KEPT, and
    a right side with no carry columns still drops unmatched lefts."""
    import pyarrow as pa

    from rayraster.join import asof_join

    left = pd.DataFrame(
        {"k": [1, 1, 2], "ts": pd.to_datetime([10, 20, 30], unit="s"), "lv": [1, 2, 3]}
    )
    right = pd.DataFrame(
        {"k": [1, 2], "ts": pd.to_datetime([5, 40], unit="s"), "rv": [None, 7.0]}
    )
    out = asof_join(
        rd.from_pandas(left), rd.from_pandas(right), key="k"
    ).to_pandas().sort_values("ts_us")
    # k=1 rows match the NULL-carry right row (kept); k=2 has no prior
    # right row (dropped)
    assert out.lv.tolist() == [1, 2]
    assert out.rv.isna().all()

    right2 = right[["k", "ts"]]  # no carry columns at all
    out2 = asof_join(
        rd.from_pandas(left), rd.from_pandas(right2), key="k"
    ).to_pandas().sort_values("ts_us")
    assert out2.lv.tolist() == [1, 2]  # still inner: k=2 dropped


def test_asof_join_explicit_schemas_no_build_time_execution(ray_session, tmp_path):
    """With explicit schemas, CONSTRUCTING an asof_join over a
    shuffle-derived side must not execute the upstream pipeline
    (Dataset.schema() on such lineage runs it — the bucket_join trap),
    and the worker UDFs must not re-execute it per batch via captured
    Dataset objects.  Proof: a counting map in the left lineage runs
    zero times at graph build and exactly once per batch overall."""
    from rayraster.join import asof_join

    marker = tmp_path / "exec_count"

    def touch(t):
        with open(marker, "a") as f:
            f.write("x" * len(t) + "\n")
        return t

    left = pd.DataFrame(
        {"k": [1, 1, 2], "ts": pd.to_datetime([10, 20, 30], unit="s"), "lv": [1, 2, 3]}
    )
    right = pd.DataFrame(
        {"k": [1, 2], "ts": pd.to_datetime([5, 25], unit="s"), "rv": [7.0, 8.0]}
    )
    # shuffle-derived left: sort puts an all-to-all in the lineage
    lds = (
        rd.from_pandas(left)
        .map_batches(touch, batch_format="pandas")
        .sort("lv")
    )
    import pyarrow as pa

    l_schema = pa.schema(
        [("k", pa.int64()), ("ts", pa.timestamp("us")), ("lv", pa.int64())]
    )
    r_schema = pa.schema(
        [("k", pa.int64()), ("ts", pa.timestamp("us")), ("rv", pa.float64())]
    )
    joined = asof_join(
        lds, rd.from_pandas(right), key="k",
        left_schema=l_schema, right_schema=r_schema,
    )
    assert not marker.exists(), "graph build executed the upstream pipeline"
    out = joined.to_pandas().sort_values("ts_us")
    assert out.lv.tolist() == [1, 2, 3]
    assert out.rv.tolist() == [7.0, 7.0, 8.0]
    # upstream ran exactly once: 3 left rows touched in total
    runs = marker.read_text().splitlines()
    assert sum(len(r) for r in runs) == 3, f"upstream re-executed: {runs}"


def test_range_join_overlapping_bands(ray_session):
    import pyarrow as pa

    from rayraster.join import range_join

    ds = rd.from_pandas(pd.DataFrame({"id": range(5), "v": [5.0, 15.0, 25.0, 15.0, 99.0]}))
    bands = pa.table(
        {"band": ["lo", "mid", "wide"], "lo": [0.0, 10.0, 0.0], "hi": [10.0, 20.0, 30.0]}
    )
    out = range_join(ds, bands, "v").to_pandas()
    got = sorted(zip(out.id, out.band))
    # v=5→lo+wide; v=15→mid+wide (×2 rows); v=25→wide; v=99→nothing
    assert got == [(0, "lo"), (0, "wide"), (1, "mid"), (1, "wide"),
                   (2, "wide"), (3, "mid"), (3, "wide")]


def test_range_join_indexed_matches_dense(ray_session):
    """The bucket-indexed interval join must produce the exact same
    (row, interval) pairs as the dense-mask path — random overlapping
    intervals plus a catch-all wide interval (the wide-list path)."""
    import pyarrow as pa

    from rayraster.join import range_join, range_join_indexed

    rng = np.random.default_rng(23)
    n_iv = 3000
    lo = rng.uniform(-100, 100, n_iv)
    hi = lo + rng.exponential(2.0, n_iv)
    lo[0], hi[0] = -1e6, 1e6  # catch-all: spans every bucket → wide list
    iv = pa.table({"iv_id": pa.array(np.arange(n_iv)),
                   "lo": pa.array(lo), "hi": pa.array(hi)})
    ds = rd.from_pandas(pd.DataFrame(
        {"id": np.arange(5000), "v": rng.uniform(-120, 120, 5000)}
    ))
    dense = range_join(ds, iv, "v").to_pandas()
    idx = range_join_indexed(ds, iv, "v").to_pandas()
    key = lambda df: sorted(zip(df.id, df.iv_id))
    assert key(idx) == key(dense)
    assert len(idx) > 5000  # catch-all matches every row at least once


def test_range_join_indexed_inf_nan_and_inverted(ray_session):
    """Review-confirmed traps: ±inf sentinel bounds must route to the
    wide list (int64 overflow mis-registered them), and degenerate
    intervals (NaN bound, lo > hi) must match nothing instead of
    crashing the actor — same pairs as the dense path throughout."""
    import pyarrow as pa

    from rayraster.join import range_join, range_join_indexed

    iv = pa.table({
        "iv_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "lo": pa.array([float("-inf"), 0.0, 10.0, float("nan")]),
        "hi": pa.array([float("inf"), 1.0, 2.0, 5.0]),  # 2: inverted
    })
    ds = rd.from_pandas(pd.DataFrame({"id": [0, 1, 2], "v": [0.5, 5.0, -3.0]}))
    dense = range_join(ds, iv, "v").to_pandas()
    idx = range_join_indexed(ds, iv, "v").to_pandas()
    key = lambda df: sorted(zip(df.id, df.iv_id))
    assert key(idx) == key(dense)
    # the catch-all matched every row; inverted/NaN matched none
    assert key(idx) == [(0, 0), (0, 1), (1, 0), (2, 0)]


def test_bucket_join_semi_anti_full(ray_session):
    left = pd.DataFrame({"k": [1, 2, 3, 4], "lv": [10, 20, 30, 40]})
    right = pd.DataFrame({"k": [2, 2, 4, 5], "rv": [1.0, 2.0, 3.0, 4.0]})
    lds, rds = rd.from_pandas(left), rd.from_pandas(right)

    semi = bucket_join(lds, rds, "k", "k", num_buckets=4, join_type="semi").to_pandas()
    assert sorted(semi.k) == [2, 4] and list(semi.columns) == ["k", "lv"]

    anti = bucket_join(lds, rds, "k", "k", num_buckets=4, join_type="anti").to_pandas()
    assert sorted(anti.k) == [1, 3]

    full = bucket_join(lds, rds, "k", "k", num_buckets=4, join_type="full").to_pandas()
    # 2 matches for k=2, 1 for k=4, unmatched left 1,3, unmatched right 5
    assert len(full) == 6 and sorted(full.k) == [1, 2, 2, 3, 4, 5]
    assert full[full.k == 5].lv.isna().all()


def test_bucket_join_salted_non_power_of_two_buckets(ray_session):
    """Regression: XOR salt mixing collided sub-buckets at
    num_buckets=10/salt=8 (duplicate right replicas in one bucket →
    duplicated output rows); additive mod-B injection cannot collide."""
    n = 2000
    left = pd.DataFrame({"k": np.where(np.arange(n) % 2 == 0, 1, np.arange(n) % 97),
                         "lv": np.arange(n)})
    right = pd.DataFrame({"k": np.arange(97), "rv": np.arange(97) * 3})
    want = left.merge(right, on="k").sort_values(["k", "lv"]).reset_index(drop=True)
    got = (
        bucket_join(rd.from_pandas(left), rd.from_pandas(right), "k", "k",
                    num_buckets=10, salt=8, hot_keys=[1])
        .to_pandas().sort_values(["k", "lv"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["k", "lv", "rv"]], want[["k", "lv", "rv"]])


def test_bucket_join_salt_rejects_full_and_oversalt(ray_session):
    left = rd.from_pandas(pd.DataFrame({"k": [1], "lv": [1]}))
    right = rd.from_pandas(pd.DataFrame({"k": [1], "rv": [1]}))
    with pytest.raises(ValueError, match="full"):
        bucket_join(left, right, "k", "k", join_type="full", salt=4, hot_keys=[1])
    with pytest.raises(ValueError, match="num_buckets"):
        bucket_join(left, right, "k", "k", num_buckets=2, salt=4, hot_keys=[1])


def test_approx_distinct_null_group(ray_session):
    """Regression: a null group key NaN-promoted the dictionary index
    array and crashed; nulls must form their own group."""
    df = pd.DataFrame({"g": ["a"] * 50 + [None] * 30, "v": list(range(50)) + list(range(30))})
    out = approx_distinct(rd.from_pandas(df), "v", group_col="g").to_pandas()
    est = dict(zip(out.g, out.approx_distinct))
    assert abs(est["a"] - 50) < 3 and abs(est["None"] - 30) < 3


def test_priority_sample_matches_duckdb_twin(ray_session):
    """The winners of priority_sample are EXACTLY the k rows DuckDB
    picks with the documented division-only priority rule (bit-exact:
    no log/pow in the key)."""
    import duckdb

    from rayraster.agg import priority_sample

    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "n_chars"])
    k = 25
    got = priority_sample(ds, "doc_id", "n_chars", k=k)
    want = duckdb.sql(
        f"""
        SELECT doc_id,
               n_chars / ((((doc_id*2654435761) % 1000003) + 0.5)/1000003.0)
                 AS _priority
        FROM read_parquet('{sf}/documents.parquet')
        WHERE n_chars > 0
        ORDER BY _priority DESC, doc_id ASC LIMIT {k}
        """
    ).df()
    assert got.num_rows == k
    assert got["doc_id"].to_pylist() == want.doc_id.tolist()
    assert got["_priority"].to_pylist() == want._priority.tolist()  # bit-exact
    # Horvitz-Thompson columns: tau = (k+1)-th priority, weight >= w
    tau = got["tau"][0].as_py()
    assert tau > 0 and all(v == tau for v in got["tau"].to_pylist())
    assert all(
        hw >= w for hw, w in zip(got["ht_weight"].to_pylist(),
                                 got["n_chars"].to_pylist())
    )
    assert min(got["_priority"].to_pylist()) >= tau


def test_priority_sample_weight_monotone_and_invariant(ray_session):
    """Doubling every weight keeps tau-relative structure sane and the
    sample is chunking-invariant (pure function of id and weight)."""
    import pandas as pd

    from rayraster.agg import priority_sample

    n = 20000
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "w": (np.arange(n) % 97 + 1).astype(np.float64)})
    a = priority_sample(rd.from_pandas(df), "id", "w", k=50)
    b = priority_sample(
        rd.from_pandas(df).repartition(13), "id", "w", k=50, fold_batch=256
    )
    assert a["id"].to_pylist() == b["id"].to_pylist()
    # heavier rows are sampled far above their uniform share
    mean_w_sample = np.mean(a["w"].to_numpy(zero_copy_only=False))
    assert mean_w_sample > df.w.mean() * 1.3
    # w <= 0 rows can never win
    df2 = df.copy(); df2.loc[df2.index[:10000], "w"] = 0.0
    c = priority_sample(rd.from_pandas(df2), "id", "w", k=50)
    assert all(i >= 10000 for i in c["id"].to_pylist())


def test_bloom_no_false_negatives_and_fp_bound():
    from rayraster.sketch import Bloom

    rng = np.random.default_rng(11)
    present = rng.choice(2**62, 20000, replace=False).astype(np.uint64)
    b = Bloom(log2_bits=18, num_hashes=5).add_hashes(present)
    assert b.contains_hashes(present).all()  # one-sided guarantee
    absent = (present + np.uint64(2**62)).astype(np.uint64)
    fp = b.contains_hashes(absent).mean()
    n, m, j = 20000, 2**18, 5
    theory = (1 - np.exp(-j * n / m)) ** j
    assert fp < 2.5 * theory + 0.01
    # merge == build-on-union (associative OR)
    b1 = Bloom(18, 5).add_hashes(present[:10000])
    b2 = Bloom(18, 5).add_hashes(present[10000:])
    assert (b1.merge(b2).bits == b.bits).all()
    rt = Bloom.from_bytes(b.to_bytes(), 18, 5)
    assert (rt.bits == b.bits).all()


def test_bloom_cross_snapshot_filter_composes_exact(ray_session):
    """Cross-snapshot dedup: bloom prefilter (superset of true dupes)
    + exact bucketed semi-join on the survivors == plain exact
    semi-join; keep='misses' rows are definitely-new and skip the
    exchange entirely."""
    import pandas as pd

    from rayraster.join import bucket_join
    from rayraster.sketch import build_bloom, bloom_filter

    old = pd.DataFrame({"url_id": np.arange(0, 30000, 3, dtype=np.int64)})
    new = pd.DataFrame({"url_id": np.arange(0, 20000, dtype=np.int64),
                        "v": np.arange(20000)})
    bl = build_bloom(rd.from_pandas(old).repartition(7), "url_id",
                     log2_bits=17, num_hashes=5, fold_batch=4)
    hits = bloom_filter(rd.from_pandas(new), bl, "url_id", keep="hits")
    misses = bloom_filter(rd.from_pandas(new), bl, "url_id", keep="misses")
    truly_old = {u for u in new.url_id if u % 3 == 0 and u < 30000}
    hit_ids = set(hits.to_pandas().url_id)
    assert truly_old <= hit_ids  # no false negatives
    assert set(misses.to_pandas().url_id).isdisjoint(truly_old)
    assert len(hit_ids) + misses.count() == len(new)
    # exact finish on the (much smaller) candidate set
    confirmed = bucket_join(
        hits, rd.from_pandas(old), "url_id", "url_id",
        num_buckets=8, join_type="semi",
    ).to_pandas()
    assert set(confirmed.url_id) == truly_old
    # the prefilter actually shrank the exchange input
    assert len(hit_ids) < len(new)


def test_bloom_string_column(ray_session):
    import pandas as pd

    from rayraster.sketch import build_bloom, bloom_filter

    old = pd.DataFrame({"url": [f"https://a.example/{i}" for i in range(0, 4000, 2)]})
    new = pd.DataFrame({"url": [f"https://a.example/{i}" for i in range(4000)]})
    bl = build_bloom(rd.from_pandas(old), "url", log2_bits=16)
    kept = bloom_filter(rd.from_pandas(new), bl, "url", keep="misses").to_pandas()
    assert all(int(u.rsplit("/", 1)[1]) % 2 == 1 for u in kept.url)
    assert len(kept) > 1000  # most odd urls survive (FP rate small)


def test_bloom_int_column_null_batch_consistency(ray_session):
    """An id must hash identically whether its batch contains nulls or
    not (pyarrow's to_numpy promotes null-bearing int batches to
    float64 — unguarded, the float BIT PATTERN would be hashed and
    seen ids in null-bearing batches would be missed)."""
    import pandas as pd

    from rayraster.sketch import build_bloom, bloom_filter

    old = pd.DataFrame({"url_id": np.arange(1000, dtype=np.int64)})
    bl = build_bloom(rd.from_pandas(old), "url_id", log2_bits=16)
    new = pa.table({"url_id": pa.array(
        [5, None, 999, 1500], type=pa.int64()
    ), "v": pa.array([1, 2, 3, 4])})
    kept = bloom_filter(
        rd.from_arrow(new), bl, "url_id", keep="hits"
    ).to_pandas()
    assert {5, 999} <= set(kept.url_id.dropna().astype(int))  # no false negatives


def test_bloom_validates_shape_and_hash_count():
    import pytest

    from rayraster.sketch import Bloom

    b = Bloom(log2_bits=16, num_hashes=4)
    blob = b.to_bytes()
    with pytest.raises(ValueError, match="bits buffer"):
        Bloom.from_bytes(blob, log2_bits=17)
    with pytest.raises(ValueError, match="num_hashes"):
        Bloom(16, 0)
    # read-only adoption: probing works, mutating raises
    ro = Bloom.from_bytes(blob, 16, 4, copy=False)
    assert ro.contains_hashes(np.array([1], np.uint64)).shape == (1,)
    with pytest.raises(ValueError):
        ro.add_hashes(np.array([1], np.uint64))


def test_cms_overestimates_only_and_bound():
    from rayraster.sketch import CMS

    rng = np.random.default_rng(13)
    # Zipf-ish: key k appears ~5000//(k+1) times
    keys = np.concatenate(
        [np.full(5000 // (k + 1), k, dtype=np.int64) for k in range(200)]
    )
    rng.shuffle(keys)
    true = {k: int((keys == k).sum()) for k in range(200)}
    c = CMS(depth=4, log2_width=12).add_hashes(keys.view(np.uint64))
    est = c.query_hashes(np.arange(200, dtype=np.int64).view(np.uint64))
    n = c.total()
    assert n == len(keys)
    for k in range(200):
        assert est[k] >= true[k]  # NEVER an underestimate
        assert est[k] - true[k] <= max(16, 4 * n // (1 << 12))
    # top-k by estimate matches top-k by truth on this skew
    top_est = np.argsort(-est)[:10]
    top_true = sorted(true, key=lambda k: -true[k])[:10]
    assert set(top_est.tolist()) == set(top_true)


def test_cms_merge_order_independent_and_weighted():
    from rayraster.sketch import CMS

    rng = np.random.default_rng(3)
    h1 = rng.integers(0, 2**63, 1000).astype(np.uint64)
    h2 = rng.integers(0, 2**63, 1000).astype(np.uint64)
    a = CMS(4, 10).add_hashes(h1).merge(CMS(4, 10).add_hashes(h2))
    b = CMS(4, 10).add_hashes(h2).merge(CMS(4, 10).add_hashes(h1))
    assert (a.counts == b.counts).all()
    # weighted add: one add of weight 7 == seven adds of weight 1
    w = CMS(4, 10).add_hashes(h1[:5], weights=np.full(5, 7, np.int64))
    u = CMS(4, 10)
    for _ in range(7):
        u.add_hashes(h1[:5])
    assert (w.counts == u.counts).all()
    # roundtrip + shape validation
    rt = CMS.from_bytes(a.to_bytes(), 4, 10)
    assert (rt.counts == a.counts).all()
    import pytest

    with pytest.raises(ValueError, match="shapes differ"):
        a.merge(CMS(4, 11))
    with pytest.raises(ValueError, match="counts buffer"):
        CMS.from_bytes(a.to_bytes(), 4, 11)


def test_build_cms_distributed_matches_local(ray_session):
    from rayraster.sketch import CMS, build_cms, cms_estimate

    rng = np.random.default_rng(21)
    ids = rng.integers(0, 300, 20000).astype(np.int64)
    t = pa.table({"k": pa.array(ids)})
    ds = rd.from_arrow(t).repartition(6)
    built = build_cms(ds, "k", depth=4, log2_width=12, fold_batch=4)
    # local reference over the same hashing path
    from rayraster.sketch import _col_hashes

    local = CMS(4, 12).add_hashes(_col_hashes(t, "k"))
    assert (built.counts == local.counts).all()  # bit-identical
    est = cms_estimate(built, pa.table({"k": pa.array(np.arange(300, dtype=np.int64))}), "k")
    true = np.bincount(ids, minlength=300)
    assert (est >= true).all()


# ---------------------------------------------------------------------------
# persisted bucketed layout + zero-shuffle join
# ---------------------------------------------------------------------------


def test_prebucketed_join_equals_bucket_join(ray_session, tmp_path):
    from rayraster.join import (
        bucket_join,
        bucket_join_prebucketed,
        write_bucketed,
    )

    rng = np.random.default_rng(3)
    n = 4000
    left = pa.table(
        {
            "k": pa.array(rng.integers(0, 500, n).astype(np.int64)),
            "v": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    # right covers only part of the key space → some buckets have
    # unmatched left rows; plus keys absent from the left entirely
    right = pa.table(
        {
            "rk": pa.array(np.arange(0, 700, 2, dtype=np.int64)),
            "tag": pa.array([f"t{i % 7}" for i in range(350)]),
        }
    )
    lp, rp = str(tmp_path / "L"), str(tmp_path / "R")
    write_bucketed(rd.from_arrow(left).repartition(7), "k", lp, num_buckets=12)
    write_bucketed(rd.from_arrow(right), "rk", rp, num_buckets=12)
    for jt in ("inner", "left", "semi", "anti", "full"):
        sort_cols = ["k", "v"] if jt != "full" else ["k", "v", "tag"]
        got = (
            bucket_join_prebucketed(lp, rp, join_type=jt)
            .to_pandas().sort_values(sort_cols, na_position="last")
            .reset_index(drop=True)
        )
        want = (
            bucket_join(
                rd.from_arrow(left), rd.from_arrow(right), "k", "rk",
                num_buckets=12, join_type=jt,
            )
            .to_pandas().sort_values(sort_cols, na_position="last")
            .reset_index(drop=True)
        )
        assert len(got) == len(want), jt
        cols = [c for c in ("k", "v", "tag") if c in got.columns]
        assert got[cols].equals(want[cols]), jt


def test_prebucketed_join_validates_bucket_counts(ray_session, tmp_path):
    from rayraster.join import bucket_join_prebucketed, write_bucketed

    t = pa.table({"k": pa.array([1, 2, 3], type=pa.int64())})
    a, b = str(tmp_path / "A"), str(tmp_path / "B")
    write_bucketed(rd.from_arrow(t), "k", a, num_buckets=4)
    write_bucketed(rd.from_arrow(t), "k", b, num_buckets=8)
    with pytest.raises(ValueError, match="bucket counts differ"):
        bucket_join_prebucketed(a, b)


def test_write_bucketed_layout_and_overwrite(ray_session, tmp_path):
    """One dir per touched bucket, manifest present, and a re-write
    REPLACES the layout (no stacked duplicate runs)."""
    import glob
    import os

    from rayraster.join import write_bucketed

    t = pa.table({"k": pa.array(range(100), type=pa.int64()),
                  "v": pa.array(range(100), type=pa.int64())})
    p = str(tmp_path / "W")
    write_bucketed(rd.from_arrow(t), "k", p, num_buckets=8)
    dirs = sorted(glob.glob(os.path.join(p, "_bucket=*")))
    assert 1 <= len(dirs) <= 8
    assert os.path.exists(os.path.join(p, "_BUCKETS.json"))
    write_bucketed(rd.from_arrow(t), "k", p, num_buckets=8)
    bucket_dirs = glob.glob(os.path.join(p, "_bucket=*"))
    total = sum(
        len(glob.glob(os.path.join(d, "*.parquet"))) for d in bucket_dirs
    )
    # clustered write: the sort("_bucket") keeps fragmentation at ~1
    # file per bucket (a block straddling a bucket border adds one) —
    # an unsorted partitioned write fragments blocks × buckets
    assert total <= 2 * len(bucket_dirs)
    import pyarrow.parquet as pq
    rows = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(os.path.join(p, "_bucket=*", "*.parquet"))
    )
    assert rows == 100  # overwrite, not append


def test_key_bucket_null_bearing_batch_matches_null_free(ray_session):
    """A null in the BATCH must not change other keys' buckets: without
    fill_null, to_numpy promotes int64→float64 and keys ≥ 2^53 round to
    a different bucket than the same key in a null-free batch —
    silently breaking co-location (and persisted layouts)."""
    from rayraster.join import key_bucket

    big = (1 << 60) + 1
    clean = pa.chunked_array([pa.array([big, 7, 12], type=pa.int64())])
    dirty = pa.chunked_array([pa.array([big, None, 12], type=pa.int64())])
    b_clean = key_bucket(clean, 64)
    b_dirty = key_bucket(dirty, 64)
    assert b_clean[0] == b_dirty[0]  # the big key
    assert b_clean[2] == b_dirty[2]  # the small key


def test_prebucketed_join_empty_right_side(ray_session, tmp_path):
    """An EMPTY side still writes a valid layout (manifest + schema);
    left/anti joins against it keep every left row — matching
    bucket_join's semantics, not crashing."""
    from rayraster.join import bucket_join_prebucketed, write_bucketed

    left = pa.table(
        {"k": pa.array([1, 2, 3], type=pa.int64()),
         "v": pa.array([10, 20, 30], type=pa.int64())}
    )
    empty = pa.table(
        {"rk": pa.array([], type=pa.int64()), "tag": pa.array([], type=pa.string())}
    )
    lp, rp = str(tmp_path / "L"), str(tmp_path / "E")
    write_bucketed(rd.from_arrow(left), "k", lp, num_buckets=4)
    write_bucketed(rd.from_arrow(empty), "rk", rp, num_buckets=4)
    out = bucket_join_prebucketed(lp, rp, join_type="left").to_pandas()
    assert sorted(out["k"]) == [1, 2, 3]
    assert out["tag"].isna().all()
    anti = bucket_join_prebucketed(lp, rp, join_type="anti").to_pandas()
    assert sorted(anti["k"]) == [1, 2, 3]
    assert bucket_join_prebucketed(lp, rp, join_type="inner").count() == 0


def test_prebucketed_join_detects_lost_bucket(ray_session, tmp_path):
    """A bucket recorded in the manifest whose files are gone is DATA
    LOSS, not an empty bucket — the join must raise, never silently
    shrink."""
    import glob
    import os
    import shutil

    from rayraster.join import bucket_join_prebucketed, write_bucketed

    t = pa.table({"k": pa.array(range(64), type=pa.int64()),
                  "v": pa.array(range(64), type=pa.int64())})
    lp, rp = str(tmp_path / "L"), str(tmp_path / "R")
    write_bucketed(rd.from_arrow(t), "k", lp, num_buckets=8)
    write_bucketed(rd.from_arrow(t), "k", rp, num_buckets=8)
    victim = sorted(glob.glob(os.path.join(rp, "_bucket=*")))[0]
    shutil.rmtree(victim)
    with pytest.raises(Exception, match="manifest but has no"):
        bucket_join_prebucketed(lp, rp).materialize()


def test_prebucketed_join_validates_hash_version(ray_session, tmp_path):
    """Layouts written under a different bucket-hash version must be
    rejected — joining across hash versions silently mis-co-locates."""
    import json
    import os

    from rayraster.join import bucket_join_prebucketed, write_bucketed

    t = pa.table({"k": pa.array([1, 2, 3], type=pa.int64())})
    a, b = str(tmp_path / "A"), str(tmp_path / "B")
    write_bucketed(rd.from_arrow(t), "k", a, num_buckets=4)
    write_bucketed(rd.from_arrow(t), "k", b, num_buckets=4)
    mpath = os.path.join(b, "_BUCKETS.json")
    m = json.load(open(mpath))
    m["hash"] = "legacy-v0"
    json.dump(m, open(mpath, "w"))
    with pytest.raises(ValueError, match="hash"):
        bucket_join_prebucketed(a, b)


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------


def test_mg_bounds_and_heavy_hitter_guarantee():
    from rayraster.sketch import MG

    rng = np.random.default_rng(7)
    # Zipf-ish stream over 500 keys, summarized with k=16 counters
    keys = np.concatenate(
        [np.full(8000 // (k + 1), k, dtype=np.int64) for k in range(500)]
    )
    rng.shuffle(keys)
    true = np.bincount(keys, minlength=500)
    n = int(true.sum())
    k = 16
    s = MG(k)
    # feed in batches through the exact-count path build_mg uses
    for chunk in np.array_split(keys, 37):
        vals, counts = np.unique(chunk, return_counts=True)
        s.add_counts([str(v) for v in vals], counts)
    assert len(s.counters) <= k
    assert s.err <= n // (k + 1)
    for key in range(500):
        lb = s.lower_bound(str(key))
        assert lb <= true[key]  # counter never exceeds truth
        assert true[key] - lb <= s.err  # within the decrement budget
        if true[key] > n // (k + 1):
            assert lb > 0, f"heavy hitter {key} missing from summary"


def test_mg_merge_bounds_roundtrip_and_validation():
    import pytest

    from rayraster.sketch import MG

    rng = np.random.default_rng(11)
    keys = rng.integers(0, 50, 4000)
    true = np.bincount(keys, minlength=50)
    n = len(keys)
    halves = np.array_split(keys, 2)
    parts = []
    for h in halves:
        vals, counts = np.unique(h, return_counts=True)
        parts.append(MG(8).add_counts([str(v) for v in vals], counts))
    merged = parts[0].merge(parts[1])
    assert merged.err <= n // 9
    for key in range(50):
        lb = merged.lower_bound(str(key))
        assert lb <= true[key] and true[key] - lb <= merged.err
    rt = MG.from_bytes(merged.to_bytes())
    assert rt.k == merged.k and rt.err == merged.err
    assert rt.counters == merged.counters
    assert rt.topk(3) == merged.topk(3)
    with pytest.raises(ValueError, match="sizes differ"):
        merged.merge(MG(4))
    with pytest.raises(ValueError, match="k must be"):
        MG(0)


def test_build_mg_distributed_guarantees(ray_session):
    from rayraster.sketch import MG, build_mg

    rng = np.random.default_rng(23)
    # heavy skew: key 0 is ~30% of the stream
    ids = np.concatenate(
        [np.zeros(6000, np.int64), rng.integers(1, 400, 14000).astype(np.int64)]
    )
    rng.shuffle(ids)
    t = pa.table({"k": pa.array(ids)})
    built = build_mg(rd.from_arrow(t).repartition(7), "k", k=32, fold_batch=3)
    true = np.bincount(ids, minlength=400)
    n = len(ids)
    assert built.err <= n // 33
    for key in range(400):
        lb = built.lower_bound(str(key))
        assert lb <= true[key] and true[key] - lb <= built.err
    # the dominant key is guaranteed present and ranked first
    assert built.topk(1)[0][0] == "0"


def _fragment_layout(path):
    """Split every bucket's parquet files into 1-row-group shards to
    simulate small-file accretion."""
    import glob
    import os

    import pyarrow.parquet as pq

    n_frag = 0
    for bdir in glob.glob(os.path.join(path, "_bucket=*")):
        for f in glob.glob(os.path.join(bdir, "*.parquet")):
            t = pq.read_table(f)
            os.remove(f)
            for i in range(t.num_rows):
                pq.write_table(
                    t.slice(i, 1), os.path.join(bdir, f"frag-{i:04d}.parquet")
                )
                n_frag += 1
    return n_frag


def _read_layout(path):
    """Read every bucket dir explicitly — `_bucket=*` dirs are
    underscore-prefixed, which parquet dataset discovery treats as
    hidden; the layout is only ever read via explicit bucket dirs
    (exactly what bucket_join_prebucketed / search_index do)."""
    import glob
    import os

    import pyarrow.parquet as pq

    tbls = [
        pq.read_table(f)
        for b in sorted(glob.glob(os.path.join(path, "_bucket=*")))
        for f in sorted(glob.glob(os.path.join(b, "*.parquet")))
    ]
    return (
        pa.concat_tables(tbls)
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )


def test_compact_bucketed_reduces_files_and_preserves_data(ray_session, tmp_path):
    import glob
    import os

    from rayraster.join import bucket_join_prebucketed, compact_bucketed, write_bucketed

    n = 200
    t = pa.table(
        {"k": pa.array(np.arange(n, dtype=np.int64) % 37),
         "v": pa.array(np.arange(n, dtype=np.int64))}
    )
    path = str(tmp_path / "layout")
    write_bucketed(rd.from_arrow(t), "k", path, num_buckets=8)
    before = _read_layout(path)
    n_frag = _fragment_layout(path)
    assert n_frag == n  # one file per row now

    res = compact_bucketed(path, target_rows_per_file=50)
    assert res["buckets_compacted"] == 8
    assert res["files_before"] == n
    assert res["files_after"] < n / 5
    after = _read_layout(path)
    pd.testing.assert_frame_equal(
        before[["k", "v"]], after[["k", "v"]], check_like=True
    )
    # second run is a no-op (idempotent resume)
    res2 = compact_bucketed(path, target_rows_per_file=50)
    assert res2["buckets_compacted"] == 0
    # the layout still joins with zero shuffle
    other = str(tmp_path / "other")
    write_bucketed(rd.from_arrow(t.rename_columns(["k2", "w"])), "k2", other,
                   num_buckets=8)
    j = bucket_join_prebucketed(path, other).to_pandas()
    assert len(j) > 0
    # no stray tmp/old dirs
    assert not glob.glob(os.path.join(path, "*.compact_*"))


def test_compact_bucketed_bounded_concurrency_and_validation(ray_session, tmp_path):
    import pytest as _pt

    from rayraster.join import compact_bucketed, write_bucketed

    t = pa.table(
        {"k": pa.array(np.arange(60, dtype=np.int64) % 5),
         "v": pa.array(np.arange(60, dtype=np.int64))}
    )
    path = str(tmp_path / "lay2")
    write_bucketed(rd.from_arrow(t), "k", path, num_buckets=4)
    _fragment_layout(path)
    res = compact_bucketed(path, target_rows_per_file=100, concurrency=2)
    assert res["buckets_compacted"] == 4
    a = _read_layout(path).v.tolist()
    assert a == list(range(60))
    with _pt.raises(ValueError, match="target_rows_per_file"):
        compact_bucketed(path, target_rows_per_file=0)
    with _pt.raises(FileNotFoundError):
        compact_bucketed(str(tmp_path / "not_a_layout"))


def test_build_hll_and_set_estimates(ray_session):
    from rayraster.sketch import HLL, build_hll, hll_set_estimates

    n = 20000
    a_keys = pd.DataFrame({"k": np.arange(n, dtype=np.int64)})
    b_keys = pd.DataFrame({"k": np.arange(n // 2, n + n // 2, dtype=np.int64)})
    ha = build_hll(rd.from_pandas(a_keys), "k")
    hb = build_hll(rd.from_pandas(b_keys), "k")
    # fold is partition-invariant bit-for-bit
    ha2 = build_hll(rd.from_pandas(a_keys).repartition(7), "k")
    assert ha.to_bytes() == ha2.to_bytes()
    est = hll_set_estimates(ha, hb)
    # true: union = 1.5n, intersection = 0.5n, jaccard = 1/3
    assert abs(est["union"] - 1.5 * n) / (1.5 * n) < 0.05
    assert abs(est["intersection"] - 0.5 * n) / (0.5 * n) < 0.15
    assert abs(est["jaccard"] - 1 / 3) < 0.05
    # disjoint sets -> near-zero intersection
    c_keys = pd.DataFrame({"k": np.arange(5 * n, 6 * n, dtype=np.int64)})
    hc = build_hll(rd.from_pandas(c_keys), "k")
    est2 = hll_set_estimates(ha, hc)
    assert est2["intersection"] < 0.05 * n
    # inputs not mutated
    assert ha.to_bytes() == ha2.to_bytes()
    import pytest as _pt

    with _pt.raises(ValueError, match="precision"):
        hll_set_estimates(ha, HLL(p=10))


def test_bucket_join_stream_layout_matches_pandas(ray_session, tmp_path):
    from rayraster.join import bucket_join_stream_layout, write_bucketed

    rng = np.random.default_rng(17)
    left = pd.DataFrame({"k": rng.integers(0, 60, 400), "lv": np.arange(400)})
    dim = pd.DataFrame({"dk": np.arange(50), "name": [f"d{i}" for i in range(50)]})
    layout = str(tmp_path / "dim")
    write_bucketed(rd.from_pandas(dim), "dk", layout, num_buckets=8)

    got = (
        bucket_join_stream_layout(rd.from_pandas(left), layout, "k")
        .to_pandas().sort_values(["lv"]).reset_index(drop=True)
    )
    want = (
        left.merge(dim, left_on="k", right_on="dk").drop(columns=["dk"])
        .sort_values(["lv"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["k", "lv", "name"]], want[["k", "lv", "name"]])

    # left join keeps unmatched stream rows (keys 50..59)
    lj = bucket_join_stream_layout(rd.from_pandas(left), layout, "k", "left").to_pandas()
    assert len(lj) == len(left)
    assert lj[lj.k >= 50].name.isna().all()

    # semi/anti partition the stream exactly
    semi = bucket_join_stream_layout(rd.from_pandas(left), layout, "k", "semi").to_pandas()
    anti = bucket_join_stream_layout(rd.from_pandas(left), layout, "k", "anti").to_pandas()
    assert len(semi) + len(anti) == len(left)
    assert (semi.k < 50).all() and (anti.k >= 50).all()
    # semi/anti never carry layout columns
    assert "name" not in semi.columns

    import pytest as _pt

    with _pt.raises(ValueError, match="join_type"):
        bucket_join_stream_layout(rd.from_pandas(left), layout, "k", "full")
    with _pt.raises(FileNotFoundError):
        bucket_join_stream_layout(rd.from_pandas(left), str(tmp_path / "nope"), "k")


def test_bloom_anti_join_identical_to_exact(ray_session):
    import ray.data as rd

    from rayraster.join import bloom_anti_join, bucket_join

    rng = np.random.default_rng(37)
    lk = rng.integers(0, 5000, 2000).astype(np.int64)
    rk = rng.integers(2500, 7500, 1500).astype(np.int64)
    left = pa.table({"k": pa.array(lk),
                     "v": pa.array(np.arange(2000, dtype=np.int64))})
    right = pa.table({"rk": pa.array(rk)})
    lds = rd.from_arrow(left).repartition(5)
    rds = rd.from_arrow(right).repartition(4)
    exact = bucket_join(lds, rds, "k", "rk", num_buckets=4,
                        join_type="anti").to_pandas()
    # tiny filter (2^10 bits for 1500 keys) -> heavy false positives;
    # output must STILL be identical, only the shuffle size changes
    for bits in (10, 20):
        got = bloom_anti_join(lds, rds, "k", "rk", num_buckets=4,
                              log2_bits=bits).to_pandas()
        assert (
            sorted(map(tuple, got.values.tolist()))
            == sorted(map(tuple, exact.values.tolist()))
        ), bits


def test_bitmap_index_build_and_query(ray_session, tmp_path):
    import ray.data as rd

    from rayraster.bitmap import bitmap_index_build, bitmap_query

    rng = np.random.default_rng(43)
    n = 3000
    ids = np.arange(n, dtype=np.int64)
    lang = rng.choice(["en", "de", "fr"], n)
    src = rng.choice(["a", "b"], n)
    t = pa.table({"doc_id": pa.array(ids), "lang": pa.array(lang),
                  "source": pa.array(src)})
    idx = str(tmp_path / "bm")
    # tiny chunks so many chunk blobs exist
    bitmap_index_build(rd.from_arrow(t).repartition(7), ["lang", "source"],
                       "doc_id", idx, chunk_bits=8)
    want_and = set(ids[(lang == "en") & (src == "b")].tolist())
    got = bitmap_query(idx, {"lang": "en", "source": "b"}, "and",
                       chunk_bits=8).to_pandas()
    assert set(got["doc_id"]) == want_and
    want_or = set(ids[(lang == "de") | (src == "a")].tolist())
    got_or = bitmap_query(idx, {"lang": "de", "source": "a"}, "or",
                          chunk_bits=8).to_pandas()
    assert set(got_or["doc_id"]) == want_or
    # missing value -> empty under AND
    assert bitmap_query(idx, {"lang": "zz", "source": "a"}, "and",
                        chunk_bits=8).count() == 0
    with pytest.raises(ValueError, match="mode"):
        bitmap_query(idx, {"lang": "en"}, "xor")


def test_bitmap_build_no_per_row_python(monkeypatch):
    """Scale guard for the vectorized bitmap build: the partial stage's
    Python loop count is O(#distinct (col,value,chunk) segments), NOT
    O(rows) — proven by counting np.packbits calls — and the fold
    stage issues exactly ONE bitwise_or.reduceat per partition call.
    Runs the stage functions in-process (no Ray) so monkeypatching
    observes the worker-side code path."""
    import rayraster.bitmap as bm

    rng = np.random.default_rng(7)
    n = 20_000
    ids = np.arange(n, dtype=np.int64)
    lang = rng.choice(["en", "de", "fr"], n)
    t = pa.table({"doc_id": pa.array(ids), "lang": pa.array(lang)})

    calls = {"packbits": 0, "reduceat": 0}
    real_packbits = np.packbits

    def counting_packbits(*a, **k):
        calls["packbits"] += 1
        return real_packbits(*a, **k)

    monkeypatch.setattr(np, "packbits", counting_packbits)
    partial = bm._make_partial(["lang"], "doc_id", 8, 4)
    part_out = partial(t)
    # 3 distinct values x ceil(20000/256) chunks >= segments >> but
    # crucially the bound is segments (<= 3 * 79), never rows (20000)
    n_chunks = (n + 255) // 256
    assert calls["packbits"] == part_out.num_rows
    assert part_out.num_rows <= 3 * n_chunks
    assert part_out.num_rows < n // 10

    real_or = np.bitwise_or

    class CountingOr:
        def reduceat(self, *a, **k):
            calls["reduceat"] += 1
            return real_or.reduceat(*a, **k)

        def __call__(self, *a, **k):
            return real_or(*a, **k)

    monkeypatch.setattr(np, "bitwise_or", CountingOr())
    fold = bm._make_fold(8)
    folded = fold(part_out.drop_columns(["_part"]).append_column(
        "_part", pa.array(np.zeros(part_out.num_rows, dtype=np.int64))))
    assert calls["reduceat"] == 1  # one vectorized fold per group call
    monkeypatch.setattr(np, "bitwise_or", real_or)
    monkeypatch.setattr(np, "packbits", real_packbits)

    # correctness of the in-process path vs brute force
    got = {}
    for c, v, ch, b in zip(folded["col"].to_pylist(), folded["val"].to_pylist(),
                           folded["chunk"].to_pylist(), folded["bits"].to_pylist()):
        pos = np.flatnonzero(np.unpackbits(
            np.frombuffer(b, dtype=np.uint8), bitorder="little"))
        got.setdefault((c, v), []).extend(((ch << 8) | p) for p in pos)
    for v in ("en", "de", "fr"):
        assert sorted(got[("lang", v)]) == ids[lang == v].tolist()


def test_broadcast_join_rejects_unknown_join_type(ray_session):
    """Regression: any join_type other than 'inner' was silently
    coerced to LEFT OUTER (e.g. a 'semi' or a typo) — must raise."""
    from rayraster.join import broadcast_join

    ds = rd.from_arrow(pa.table({"k": pa.array([1, 2], type=pa.int64())}))
    small = pa.table({"k": pa.array([1], type=pa.int64()),
                      "v": pa.array(["x"])})
    with pytest.raises(ValueError, match="join_type"):
        broadcast_join(ds, small, "k", join_type="semi")
    with pytest.raises(ValueError, match="join_type"):
        broadcast_join(ds, small, "k", join_type="innr")


def test_bucket_join_right_column_named_left_key_is_suffixed(ray_session):
    """Regression: a right DATA column literally named left_key was
    silently replaced by the join key; it must come through as _r."""
    from rayraster.join import bucket_join

    left = rd.from_arrow(pa.table(
        {"user_id": pa.array([1, 2], type=pa.int64()),
         "post": pa.array(["p1", "p2"])}))
    right = rd.from_arrow(pa.table(
        {"id": pa.array([1, 2], type=pa.int64()),
         "user_id": pa.array([77, 88], type=pa.int64())}))  # referrer ids
    got = bucket_join(left, right, "user_id", "id",
                      num_buckets=4).to_pandas().sort_values("user_id")
    assert "user_id_r" in got.columns
    assert got.user_id_r.tolist() == [77, 88]
    assert got.user_id.tolist() == [1, 2]


def test_asof_join_ignores_null_keys_and_timestamps(ray_session):
    """Regression: a null key or ts float-promoted the batch (ids >=
    2^53 would partition inconsistently) and emitted float _ts_us
    blocks; null rows must simply never match."""
    import pandas as pd

    from rayraster.join import asof_join

    left = pd.DataFrame({
        "k": pd.array([1, None, 2], dtype="Int64"),
        "ts": pd.to_datetime([10, 20, 30], unit="s"),
        "lv": [100, 200, 300],
    })
    right = pd.DataFrame({
        "k": pd.array([1, 2, 2], dtype="Int64"),
        "ts": pd.to_datetime([5, pd.NaT, 25], unit="s", errors="coerce"),
        "rv": [7, 8, 9],
    })
    got = asof_join(rd.from_pandas(left), rd.from_pandas(right), "k",
                    num_partitions=4).to_pandas().sort_values("k")
    assert got.k.tolist() == [1, 2]
    assert got.rv.tolist() == [7, 9]


def test_compact_bucketed_repairs_crashed_swap(ray_session, tmp_path):
    """Regression: a crash between the two swap renames left the data
    in _bucket=<b>.compact_old with no main dir; the next run globbed
    the debris as a real bucket and never restored the missing one.
    The repair pass must restore crashed buckets and drop stale tmp."""
    import os
    import shutil

    from rayraster.join import bucket_join_prebucketed, compact_bucketed, write_bucketed

    t = pa.table({"k": pa.array(np.arange(100, dtype=np.int64)),
                  "v": pa.array(np.arange(100, dtype=np.int64) * 2)})
    lay = str(tmp_path / "lay")
    write_bucketed(rd.from_arrow(t), "k", lay, num_buckets=4)
    bdirs = sorted(d for d in os.listdir(lay) if d.startswith("_bucket="))
    # simulate the crash window on one bucket + stale tmp on another
    crashed = os.path.join(lay, bdirs[0])
    os.rename(crashed, crashed + ".compact_old")
    os.makedirs(os.path.join(lay, bdirs[1]) + ".compact_tmp")
    compact_bucketed(lay, target_rows_per_file=1 << 20)
    names = set(os.listdir(lay))
    assert bdirs[0] in names
    assert not any(".compact" in n for n in names)
    # the layout still joins completely after repair
    other = str(tmp_path / "rhs")
    write_bucketed(rd.from_arrow(t.select(["k"])), "k", other, num_buckets=4)
    joined = bucket_join_prebucketed(lay, other).to_pandas()
    assert len(joined) == 100


def test_build_mg_ignores_nulls(ray_session):
    """Regression: a null value crashed MG serialization (None key in
    sorted-json) or drifted to the string 'null' after a round-trip."""
    from rayraster.sketch import build_mg

    t = pa.table({"v": pa.array(["a", None, "a", "b", None])})
    mg = build_mg(rd.from_arrow(t).repartition(2), "v", k=4)
    est = mg.counters
    assert set(est) == {"a", "b"}
    assert est["a"] >= est["b"]
