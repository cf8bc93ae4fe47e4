"""Checkpoint/resume: interrupted run resumes and matches a direct run."""

import glob
import os

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from rayraster.checkpoint import (
    load_pixels,
    plan_shards,
    rasterize_checkpointed,
    read_manifest,
)
from rayraster.grid import GridSpec
from rayraster.pipelines import add_geocode_id
from rayraster.rasterize import rasterize_features


@pytest.fixture(scope="module")
def sharded_input(tmp_path_factory):
    """documents rows spread over 6 parquet files."""
    root = tmp_path_factory.mktemp("shards")
    import pyarrow.parquet as pq
    import pyarrow as pa

    src = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["doc_id", "n_chars"])
    n = src.num_rows
    step = (n + 5) // 6
    for k in range(6):
        pq.write_table(src.slice(k * step, step), str(root / f"part-{k}.parquet"))
    return sorted(glob.glob(str(root / "*.parquet")))


SPEC = GridSpec(-180.0, -90.0, 30.0)


def test_interrupt_resume_equals_direct(sharded_input, tmp_path, ray_session):
    out = str(tmp_path / "ckpt")
    # phase 1: "crash" after 2 shards
    s1 = rasterize_checkpointed(
        sharded_input, out, SPEC, ["n_chars"], fun="sum",
        prepare=add_geocode_id, files_per_shard=2, max_shards=2,
    )
    assert not s1["complete"] and s1["shards_done"] == 2
    assert len(read_manifest(out)) == 2
    # phase 2: resume — only the remaining shard runs, then merge
    s2 = rasterize_checkpointed(
        sharded_input, out, SPEC, ["n_chars"], fun="sum",
        prepare=add_geocode_id, files_per_shard=2,
    )
    assert s2["complete"] and s2["shards_done"] == 3
    got = (
        load_pixels(out)
        .to_pandas()[["ix", "iy", "num_cell", "sum_n_chars"]]
        .sort_values(["ix", "iy"])
        .reset_index(drop=True)
    )
    # direct single-pass run over the same rows
    ds = rd.read_parquet(sharded_input).map_batches(
        add_geocode_id, batch_format="pyarrow"
    )
    direct, _ = rasterize_features(ds, 30.0, ["n_chars"], spec=SPEC, fun="sum")
    want = (
        direct.to_pandas()[["ix", "iy", "num_cell", "sum_n_chars"]]
        .sort_values(["ix", "iy"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_resume_rejects_changed_inputs(sharded_input, tmp_path, ray_session):
    """If the input file set changes between invocations, completed
    shard indexes map to different file groups — resume must refuse to
    skip them rather than silently mixing lineages."""
    out = str(tmp_path / "ckpt_changed")
    rasterize_checkpointed(
        sharded_input, out, SPEC, ["n_chars"], fun="sum",
        prepare=add_geocode_id, files_per_shard=2, max_shards=1,
    )
    with pytest.raises(RuntimeError, match="resume mismatch"):
        rasterize_checkpointed(
            sharded_input[1:], out, SPEC, ["n_chars"], fun="sum",
            prepare=add_geocode_id, files_per_shard=2,
        )


def test_manifest_lineage(sharded_input, tmp_path, ray_session):
    out = str(tmp_path / "ckpt2")
    rasterize_checkpointed(
        sharded_input, out, SPEC, ["n_chars"], fun="sum",
        prepare=add_geocode_id, files_per_shard=3,
    )
    m = read_manifest(out)
    assert len(m) == 2
    # lineage: every input file appears in exactly one shard entry
    all_inputs = [f for e in m.values() for f in e["inputs"]]
    assert sorted(all_inputs) == sorted(sharded_input)
    assert all(e["rows_out"] > 0 and e["wall_sec"] >= 0 for e in m.values())


def test_rerun_is_noop(sharded_input, tmp_path, ray_session):
    out = str(tmp_path / "ckpt3")
    rasterize_checkpointed(
        sharded_input, out, SPEC, ["n_chars"], prepare=add_geocode_id
    )
    m1 = read_manifest(out)
    s = rasterize_checkpointed(
        sharded_input, out, SPEC, ["n_chars"], prepare=add_geocode_id
    )
    assert s["complete"] and read_manifest(out) == m1  # nothing re-ran


def test_plan_shards_deterministic(sharded_input):
    a = plan_shards(sharded_input, 2)
    b = plan_shards(list(reversed(sharded_input)), 2)
    assert a == b and len(a) == 3


def test_resume_cleans_corrupt_tmp(sharded_input, tmp_path, ray_session):
    """A leftover .tmp dir from a mid-write crash must not poison the
    resumed run (atomic publish = tmp → rename)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = str(tmp_path / "ckpt4")
    os.makedirs(os.path.join(out, "partials", "shard=0.tmp"), exist_ok=True)
    pq.write_table(  # garbage partial from a "crashed" writer
        pa.table({"junk": [1]}),
        os.path.join(out, "partials", "shard=0.tmp", "part.parquet"),
    )
    s = rasterize_checkpointed(
        sharded_input, out, SPEC, ["n_chars"], fun="sum",
        prepare=add_geocode_id, files_per_shard=3,
    )
    assert s["complete"]
    got = load_pixels(out).to_pandas()
    assert got["num_cell"].sum() == 500  # all rows accounted for
    assert not os.path.exists(os.path.join(out, "partials", "shard=0.tmp"))


def test_checkpointed_run_detects_shrunken_input(sharded_input, tmp_path, ray_session):
    """Regression: stale manifest shards beyond the current input set
    left the run complete=False forever while load_pixels served the
    previous merge — must raise like the remap guard."""
    out = str(tmp_path / "ckpt2")
    r1 = rasterize_checkpointed(
        sharded_input, out, SPEC, ["n_chars"], fun="sum",
        prepare=add_geocode_id, files_per_shard=2,
    )
    assert r1["complete"]
    # input shrinks: same out_dir, fewer files -> stale manifest shard
    with pytest.raises(RuntimeError, match="shrank"):
        rasterize_checkpointed(
            sharded_input[:2], out, SPEC, ["n_chars"], fun="sum",
            prepare=add_geocode_id, files_per_shard=2,
        )
