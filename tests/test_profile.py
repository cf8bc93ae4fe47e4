"""profile_table (rayraster/agg.py) — the column-profile / describe
operator, pinned against a DuckDB twin (aggregate semantics: min/max/
distinct ignore NULLs; min/max fold in NATIVE type — an int column
must never order lexicographically)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from rayraster.agg import profile_table


def _fixture() -> pa.Table:
    rng = np.random.default_rng(3)
    n = 20_000
    ids = rng.integers(0, 5000, n)
    # ids span 1..4 digits so lexicographic folding would corrupt max
    langs = np.where(rng.random(n) < 0.15, None, rng.choice(["en", "fr", "de"], n))
    vals = np.where(rng.random(n) < 0.05, np.nan, rng.normal(0, 10, n))
    return pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()),
         "lang": pa.array(langs.tolist(), type=pa.string()),
         "value": pa.array(vals, type=pa.float64())}
    )


def test_profile_matches_duckdb(ray_session):
    t = _fixture()
    ds = rd.from_arrow(t).repartition(8)
    prof = profile_table(ds, ["doc_id", "lang"]).to_pandas().set_index("column")
    con = duckdb.connect()
    con.register("t", t)
    want = con.sql(
        """SELECT 'doc_id' AS c, COUNT(*) n, COUNT(*)-COUNT(doc_id) AS nn,
                  COUNT(DISTINCT doc_id) nd,
                  CAST(MIN(doc_id) AS VARCHAR) mn, CAST(MAX(doc_id) AS VARCHAR) mx
           FROM t
           UNION ALL
           SELECT 'lang', COUNT(*), COUNT(*)-COUNT(lang),
                  COUNT(DISTINCT lang), MIN(lang), MAX(lang) FROM t"""
    ).df().set_index("c")
    for c in ("doc_id", "lang"):
        assert prof.loc[c, "n"] == want.loc[c, "n"]
        assert prof.loc[c, "nulls"] == want.loc[c, "nn"]
        assert prof.loc[c, "n_distinct"] == want.loc[c, "nd"]
        assert prof.loc[c, "min_v"] == want.loc[c, "mn"]
        assert prof.loc[c, "max_v"] == want.loc[c, "mx"]


def test_profile_approx_and_none_modes(ray_session):
    t = _fixture()
    ds = rd.from_arrow(t).repartition(8)
    exact = profile_table(ds, ["doc_id"]).to_pandas().iloc[0]
    ap = profile_table(ds, ["doc_id"], distinct_mode="approx").to_pandas().iloc[0]
    no = profile_table(ds, ["doc_id"], distinct_mode="none").to_pandas().iloc[0]
    assert abs(ap.n_distinct - exact.n_distinct) <= max(2, 0.05 * exact.n_distinct)
    assert no.n_distinct == -1
    assert (ap.n, ap.nulls, ap.min_v, ap.max_v) == \
           (exact.n, exact.nulls, exact.min_v, exact.max_v)
    with pytest.raises(ValueError, match="distinct_mode"):
        profile_table(ds, ["doc_id"], distinct_mode="bogus")


def test_profile_all_null_column(ray_session):
    t = pa.table({"x": pa.array([None, None, None], type=pa.string())})
    prof = profile_table(rd.from_arrow(t), ["x"]).to_pandas().iloc[0]
    assert prof.n == 3 and prof.nulls == 3 and prof.n_distinct == 0
    assert prof.min_v is None and prof.max_v is None
