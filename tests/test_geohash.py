"""Geohash index: published vectors, round-trip, SQL twin, prefix
hierarchy, Z-order locality."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from rayraster.geohash import (
    geohash_decode,
    geohash_encode,
    geohash_sql,
)


def _pts(seed: int, n: int):
    rng = np.random.default_rng(seed)
    return rng.uniform(-180, 180, n), rng.uniform(-90, 90, n)


def test_published_vectors():
    # the canonical examples from the public geohash spec pages
    assert (
        geohash_encode(np.array([10.40744]), np.array([57.64911]), 11)[0].as_py()
        == "u4pruydqqvj"
    )
    assert geohash_encode(np.array([-5.6]), np.array([42.6]), 5)[0].as_py() == "ezs42"
    # prefix property: lower precision = truncation
    assert (
        geohash_encode(np.array([10.40744]), np.array([57.64911]), 6)[0].as_py()
        == "u4pruy"
    )


def test_roundtrip_center_stays_in_cell():
    x, y = _pts(1, 5000)
    for p in (4, 8, 12):
        enc = geohash_encode(x, y, p)
        lon, lat = geohash_decode(enc, p)
        assert geohash_encode(lon, lat, p).equals(enc)


def test_sql_twin_byte_exact():
    x, y = _pts(2, 3000)
    # include the domain corners and the ±0 boundary
    x = np.concatenate([x, [-180.0, 180.0, 0.0, 179.999999]])
    y = np.concatenate([y, [-90.0, 90.0, 0.0, -89.999999]])
    enc = geohash_encode(x, y, 8).to_pylist()
    con = duckdb.connect()
    con.register("t", pa.table({"x": x, "y": y}))
    got = con.execute(f"SELECT {geohash_sql('x', 'y', 8)} AS gh FROM t").df()
    assert got.gh.tolist() == enc


def test_prefix_is_parent_cell():
    """Truncating k chars gives the enclosing coarser cell: all points
    sharing a precision-6 code share its precision-4 prefix."""
    x, y = _pts(3, 8000)
    p6 = np.array(geohash_encode(x, y, 6).to_pylist())
    p4 = np.array(geohash_encode(x, y, 4).to_pylist())
    assert all(a.startswith(b) for a, b in zip(p6, p4))


def test_zorder_locality():
    """Lexicographic geohash order is a Z-curve: consecutive codes in
    sorted order are spatially closer on average than random pairs."""
    x, y = _pts(4, 4000)
    codes = np.array(geohash_encode(x, y, 8).to_pylist())
    order = np.argsort(codes)
    xs, ys = x[order], y[order]
    adj = np.hypot(np.diff(xs), np.diff(ys)).mean()
    rng = np.random.default_rng(0)
    i, j = rng.integers(0, 4000, 4000), rng.integers(0, 4000, 4000)
    rand = np.hypot(x[i] - x[j], y[i] - y[j]).mean()
    assert adj < rand / 4


def test_decode_validates():
    with pytest.raises(ValueError, match="length"):
        geohash_decode(pa.array(["u4p", "u4pruydq"]), 8)
    with pytest.raises(ValueError, match="invalid"):
        geohash_decode(pa.array(["u4pruyda"]), 8)  # 'a' not in base32
    with pytest.raises(ValueError, match="precision"):
        geohash_encode(np.array([0.0]), np.array([0.0]), 13)


def test_sliced_and_chunked_decode():
    """The buffer-walk decode honors array offsets and chunking."""
    x, y = _pts(5, 100)
    enc = geohash_encode(x, y, 8)
    sl = enc.slice(10, 50)
    lon, lat = geohash_decode(sl, 8)
    lon2, lat2 = geohash_decode(enc, 8)
    assert np.array_equal(lon, lon2[10:60]) and np.array_equal(lat, lat2[10:60])
    ch = pa.chunked_array([enc.slice(0, 40), enc.slice(40, 60)])
    lon3, _ = geohash_decode(ch, 8)
    assert np.array_equal(lon3, lon2)
