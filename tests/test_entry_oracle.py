"""Driver-mimic correctness gate: run every queries() entry and its
oracle_sql() twin over the same parquet tables and require EXACT
equality (row count, schema kinds, bit-exact values after sorting
columns by name and rows by all columns) — a local replica of the
driver's CORRECTNESS check, so mismatches are caught before a round.
"""

import glob
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _oracle_con():
    con = duckdb.connect()
    for f in glob.glob(f"{SF_DIR}/*.parquet"):
        name = os.path.basename(f)[: -len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    return con


def _to_pandas(res):
    import pyarrow as pa
    from ray.data import Dataset

    if isinstance(res, Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _pairs():
    import __ray_entry__ as e

    qs = e.queries()
    sql = e.oracle_sql()
    return [(name, qs[name], sql.get(name)) for name in qs]


@pytest.mark.parametrize("name", [p[0] for p in _pairs()])
def test_query_matches_oracle(name, ray_session):
    import __ray_entry__ as e

    fn = e.queries()[name]
    sql = e.oracle_sql().get(name)
    got = _canon(_to_pandas(fn(SF_DIR)))
    assert len(got) > 0, f"{name}: empty result"
    if sql is None:
        return  # rows-only query; driver records the weaker check
    con = _oracle_con()
    want = _canon(con.sql(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            g_arr = g.to_numpy(dtype=np.float64)
            w_arr = w.to_numpy(dtype=np.float64)
            exact = np.array_equal(g_arr, w_arr)
            assert exact, (
                f"{name}.{c}: max abs diff "
                f"{np.max(np.abs(g_arr - w_arr))} (bit-exact required)"
            )
        else:
            pd.testing.assert_series_equal(
                g, w, check_dtype=False, check_names=False, obj=f"{name}.{c}"
            )


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    res = e.entry()
    df = _to_pandas(res)
    assert len(df) >= 0 and "num_cell" in df.columns
