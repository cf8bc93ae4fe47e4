"""q-digest mergeable quantile summary (rayraster/sketch.py).

The deterministic guarantee under test (Agarwal/Cormode et al.,
"Mergeable Summaries": q-digest is the canonical mergeable quantile
summary): for est = quantiles(q) and the true rank interval
[lo, hi] = [#values < est, #values <= est],

    lo - err_bound() <= ceil(q*N) <= hi + err_bound()

on EVERY merge schedule — the property the t7 oracle gate's `qd_ok`
column asserts (the exact multi-pass path is agg.exact_quantiles;
the digest is the one-pass/mergeable/checkpointable trade).
"""

import numpy as np
import pyarrow as pa
import pytest

from rayraster.sketch import QDigest, _f64_key, _key_f64, build_qdigest

QS = (0.01, 0.25, 0.5, 0.75, 0.99)


def _assert_bound(d: QDigest, v: np.ndarray) -> None:
    sv = np.sort(v)
    n = len(v)
    eb = d.err_bound()
    assert d.n == n
    for q in QS:
        est = d.quantiles([q])[0]
        lo = np.searchsorted(sv, est, side="left")
        hi = np.searchsorted(sv, est, side="right")
        t = max(1, int(np.ceil(q * n)))
        assert lo - eb <= t <= hi + eb, (q, lo, hi, t, eb)


def test_key_mapping_is_monotone_and_invertible():
    rng = np.random.default_rng(3)
    v = np.concatenate(
        [rng.normal(0, 1e12, 5000), rng.normal(0, 1e-12, 5000),
         [-0.0, 0.0, np.inf, -np.inf, 1.5, -1.5]]
    )
    v = np.sort(v)
    k = _f64_key(v)
    assert (k[1:] >= k[:-1]).all()
    back = _key_f64(k)
    # -0.0 maps back to -0.0 which == 0.0; value equality is enough
    assert np.array_equal(back, v)


@pytest.mark.parametrize("dist", ["uniform", "zipf", "normal_neg", "const"])
def test_rank_bound_across_merge_schedules(dist):
    rng = np.random.default_rng(11)
    n = 120_000
    if dist == "uniform":
        v = rng.random(n) * 1e6
    elif dist == "zipf":
        v = rng.zipf(1.5, n).astype(np.float64)
    elif dist == "normal_neg":
        v = rng.normal(-40.0, 900.0, n)
    else:
        v = np.full(n, 3.25)
    chunks = np.array_split(v, 41)
    # schedule A: sequential left fold
    da = QDigest(512)
    for c in chunks:
        da.merge(QDigest(512).add_values(c))
    # schedule B: pairwise tree fold, reversed chunk order
    ds_ = [QDigest(512).add_values(c) for c in reversed(chunks)]
    while len(ds_) > 1:
        ds_ = [ds_[i].merge(ds_[i + 1]) if i + 1 < len(ds_) else ds_[i]
               for i in range(0, len(ds_), 2)]
    db = ds_[0]
    _assert_bound(da, v)
    _assert_bound(db, v)


def test_size_stays_bounded():
    rng = np.random.default_rng(5)
    d = QDigest(256)
    for _ in range(40):
        d.merge(QDigest(256).add_values(rng.random(50_000)))
    # q-digest size bound is O(k log U); canonical compress keeps it
    # within a small constant of 3k in practice
    assert d.node_count() <= 6 * 256
    assert d.n == 40 * 50_000


def test_serialization_roundtrip_preserves_queries():
    rng = np.random.default_rng(9)
    d = QDigest(512).add_values(rng.normal(0, 50, 30_000))
    rt = QDigest.from_bytes(d.to_bytes(), 512)
    assert rt.n == d.n
    assert np.array_equal(rt.quantiles(QS), d.quantiles(QS))


def test_heavy_leaf_is_exact():
    # one value is 60% of the stream: the digest must place every
    # quantile inside [0.2, 0.8] ON that value (leaf counts are exact)
    v = np.concatenate([np.full(60_000, 7.0),
                        np.linspace(0, 1, 20_000),
                        np.linspace(100, 101, 20_000)])
    d = QDigest(512)
    for c in np.array_split(v, 13):
        d.merge(QDigest(512).add_values(c))
    for q in (0.25, 0.5, 0.75):
        est = d.quantiles([q])[0]
        assert est == 7.0


def test_empty_and_nan_rejection():
    with pytest.raises(ValueError):
        QDigest(512).quantiles([0.5])
    with pytest.raises(ValueError):
        QDigest(512).add_values(np.array([1.0, np.nan]))
    with pytest.raises(ValueError):
        QDigest(4)  # k too small
    with pytest.raises(ValueError):
        QDigest(512).merge(QDigest(1024))


def test_build_qdigest_over_dataset_matches_bound(ray_session):
    import ray.data as rd

    from rayraster.agg import rank_interval

    rng = np.random.default_rng(17)
    v = rng.gamma(2.0, 10.0, 80_000)
    withnull = pa.table(
        {"x": pa.array(list(v[:40_000]) + [None] + list(v[40_000:]),
                       type=pa.float64())}
    )
    ds = rd.from_arrow(withnull).repartition(8)
    d = build_qdigest(ds, "x", k=1024)
    assert d.n == len(v)  # null skipped
    _assert_bound(d, v)
    ests = d.quantiles(QS)
    lo, hi = rank_interval(ds, "x", ests)
    sv = np.sort(v)
    assert np.array_equal(lo, np.searchsorted(sv, ests, side="left"))
    assert np.array_equal(hi, np.searchsorted(sv, ests, side="right"))


def test_build_qdigest_grouped_bounds_per_group(ray_session):
    import ray.data as rd

    from rayraster.agg import rank_interval_grouped
    from rayraster.sketch import build_qdigest_grouped

    rng = np.random.default_rng(23)
    n = 60_000
    groups = rng.choice(["a", "b", "c"], n, p=[0.6, 0.3, 0.1])
    vals = np.where(groups == "a", rng.normal(0, 10, n),
                    np.where(groups == "b", rng.zipf(1.6, n).astype(float),
                             rng.random(n) * 1e6))
    t = pa.table({"g": pa.array(groups.tolist()), "v": pa.array(vals)})
    ds = rd.from_arrow(t).repartition(8)
    qds = build_qdigest_grouped(ds, "g", "v", k=1024)
    assert set(qds) == {"a", "b", "c"}
    ests = {g: d.quantiles(QS) for g, d in qds.items()}
    lo, hi = rank_interval_grouped(ds, "g", "v", ests)
    for g, d in qds.items():
        gv = np.sort(vals[groups == g])
        assert d.n == len(gv)
        eb = d.err_bound()
        # rank_interval_grouped must agree with local searchsorted
        assert np.array_equal(lo[g], np.searchsorted(gv, ests[g], side="left"))
        assert np.array_equal(hi[g], np.searchsorted(gv, ests[g], side="right"))
        for i, q in enumerate(QS):
            tgt = max(1, int(np.ceil(q * len(gv))))
            assert lo[g][i] - eb <= tgt <= hi[g][i] + eb, (g, q)


def test_build_qdigest_grouped_skips_nulls(ray_session):
    import ray.data as rd

    from rayraster.sketch import build_qdigest_grouped

    t = pa.table(
        {"g": pa.array(["a", "a", None, "b"], type=pa.string()),
         "v": pa.array([1.0, None, 3.0, 4.0], type=pa.float64())}
    )
    qds = build_qdigest_grouped(rd.from_arrow(t), "g", "v", k=64)
    assert set(qds) == {"a", "b"}
    assert qds["a"].n == 1 and qds["b"].n == 1


def test_trimmed_mean_matches_sorted_brute(ray_session):
    import ray.data as rd

    from rayraster.agg import trimmed_mean

    rng = np.random.default_rng(6)
    for n, tn_, td in ((1000, 1, 20), (997, 1, 10), (53, 1, 4), (10, 0, 20)):
        x = rng.integers(-500, 5000, n).astype(np.int64)
        x[rng.integers(0, n, n // 3)] = 42  # heavy ties
        ds = rd.from_arrow(pa.table({"v": x})).repartition(5)
        got = trimmed_mean(ds, "v", tn_, td)
        s = np.sort(x)
        k = (n * tn_) // td
        kept = s[k:n - k]
        assert got["k"] == k and got["trimmed_n"] == len(kept)
        assert got["trimmed_sum"] == int(kept.sum())
        assert got["trimmed_mean"] == int(kept.sum()) / len(kept)
        if k:
            w = int(kept.sum()) + k * int(s[k]) + k * int(s[n - k - 1])
            assert got["winsorized_sum"] == w
            assert got["winsorized_mean"] == w / n
            assert got["lower"] == int(s[k]) and got["upper"] == int(s[n - k - 1])


def test_trimmed_mean_validations(ray_session):
    import pytest
    import ray.data as rd

    from rayraster.agg import trimmed_mean

    ds = rd.from_arrow(pa.table({"v": np.array([1.5, 2.5])}))
    with pytest.raises(Exception, match="integer column"):
        trimmed_mean(ds, "v")
    with pytest.raises(ValueError, match="trim_num"):
        trimmed_mean(ds, "v", 1, 2)
    empty = rd.from_arrow(
        pa.table({"v": pa.array([None, None], type=pa.int64())})
    )
    with pytest.raises(ValueError, match="no non-null rows"):
        trimmed_mean(empty, "v")
