"""Resumable checkpointed runs: per-shard partials + manifest + lineage.

north_rule: "resumable from checkpoint with per-partition lineage +
metrics".  For a batch engine that means (ray_guide.md "Sources &
sinks"): one output directory per input shard, written atomically
(tmp → rename), plus a manifest of completed shards; resume = skip
manifest entries.

The rasterize pipeline decomposes exactly: per-cell sums/counts are
algebraic, so each input shard's PARTIAL pixel table is a standalone
deterministic artifact.  A completed run is

    out_dir/
      partials/shard=<k>/*.parquet   per-shard partial aggregates
      manifest.jsonl                 one line per completed shard:
                                     inputs (lineage), rows, seconds,
                                     stage wall times
      pixels/*.parquet               finalized pixel table (merge step)

The merge step re-reduces partials (cheap: already cell-collapsed) —
rerunning it is idempotent, so a crash anywhere loses at most one
shard of work.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Sequence

import pyarrow.parquet as pq

import ray.data as rd
from ray.data import Dataset

from rayraster.grid import GridSpec
from rayraster.rasterize import (
    DEFAULT_PARTITIONS,
    _AssignAndPartial,
    _FinalProject,
    _make_finalize_partition,
    _PART,
)


def stage_times(stats: str) -> dict:
    """Per-stage wall seconds parsed from ``Dataset.stats()`` — the
    per-stage throughput metrics the north_rule asks runs to emit.
    Shared by the shard manifest below and ``bench.py``."""
    import re

    out = {}
    for m in re.finditer(r"Operator (\d+) (\S+):.*? in ([\d.]+)s", stats):
        name = m.group(2)[:70]
        out[f"{m.group(1)}:{name}"] = float(m.group(3))
    return out


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest.jsonl")


def read_manifest(out_dir: str) -> dict[int, dict]:
    path = _manifest_path(out_dir)
    done = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                if line.strip():
                    e = json.loads(line)
                    done[e["shard"]] = e
    return done


def _append_manifest(out_dir: str, entry: dict) -> None:
    with open(_manifest_path(out_dir), "a") as f:
        f.write(json.dumps(entry) + "\n")


def plan_shards(input_paths: Sequence[str], files_per_shard: int = 8) -> list[list[str]]:
    """Deterministic sharding of the input file list (sorted)."""
    paths = sorted(input_paths)
    return [
        paths[i : i + files_per_shard] for i in range(0, len(paths), files_per_shard)
    ]


def rasterize_checkpointed(
    input_paths: Sequence[str],
    out_dir: str,
    spec: GridSpec,
    value_cols: Sequence[str],
    fun: str = "sum",
    x_col: str = "x",
    y_col: str = "y",
    prepare=None,
    columns: Sequence[str] | None = None,
    files_per_shard: int = 8,
    num_partitions: int = DEFAULT_PARTITIONS,
    max_shards: int | None = None,
) -> dict:
    """Run (or RESUME) a checkpointed rasterization over parquet shards.

    ``prepare``: optional pyarrow-batch fn applied after the read (e.g.
    extract+geocode).  ``max_shards``: process at most this many new
    shards this invocation (lets tests/ops simulate interruption).

    Returns a summary dict; the finalized pixel table is written to
    ``out_dir/pixels`` once all shards are complete.
    """
    os.makedirs(os.path.join(out_dir, "partials"), exist_ok=True)
    shards = plan_shards(input_paths, files_per_shard)
    done = read_manifest(out_dir)
    processed = 0
    for k, files in enumerate(shards):
        if k in done:
            # lineage guard: a completed shard is only skippable if it
            # was built from EXACTLY this file group — if the input set
            # changed between invocations, shard indexes remap and
            # silently mixing lineages would corrupt the merge
            prev = list(done[k].get("inputs", ()))
            if prev != list(files):
                raise RuntimeError(
                    f"checkpoint resume mismatch for shard {k}: manifest records "
                    f"inputs {prev} but the current plan assigns {list(files)}; "
                    "the input file set changed — use a fresh out_dir"
                )
            continue
        if max_shards is not None and processed >= max_shards:
            break
        t0 = time.perf_counter()
        ds = rd.read_parquet(files, columns=list(columns) if columns else None)
        if prepare is not None:
            ds = ds.map_batches(prepare, batch_format="pyarrow", zero_copy_batch=True)
        partial = ds.map_batches(
            _AssignAndPartial(spec, x_col, y_col, value_cols, (), num_partitions),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        shard_dir = os.path.join(out_dir, "partials", f"shard={k}")
        tmp_dir = shard_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        partial.write_parquet(tmp_dir)
        rows_out = sum(
            pq.read_metadata(os.path.join(tmp_dir, f)).num_rows
            for f in os.listdir(tmp_dir)
            if f.endswith(".parquet")
        )
        shutil.rmtree(shard_dir, ignore_errors=True)
        os.rename(tmp_dir, shard_dir)  # atomic publish
        _append_manifest(
            out_dir,
            {
                "shard": k,
                "inputs": files,  # lineage: exactly these files produced it
                "rows_out": rows_out,
                "wall_sec": round(time.perf_counter() - t0, 3),
                # per-stage throughput metrics (north_rule): read/map/
                # partial wall per operator for THIS shard's pipeline
                "stages": stage_times(partial.stats()),
            },
        )
        processed += 1
    done = read_manifest(out_dir)
    stale = set(done) - set(range(len(shards)))
    if stale:
        # the input SHRANK under an existing out_dir: current shards
        # can all be done yet complete would stay False forever while
        # load_pixels serves the previous (larger) merge — refuse,
        # like the remap guard above
        raise RuntimeError(
            f"rasterize_checkpointed: manifest has shard(s) {sorted(stale)} "
            f"beyond the current {len(shards)}-shard input — the input set "
            "shrank; use a fresh out_dir (or clear the stale manifest)"
        )
    complete = len(done) == len(shards)
    summary = {
        "shards_total": len(shards),
        "shards_done": len(done),
        "complete": complete,
        "out_dir": out_dir,
    }
    if complete:
        t0 = time.perf_counter()
        partials = rd.read_parquet(os.path.join(out_dir, "partials"))
        cells = partials.groupby(_PART).map_groups(
            _make_finalize_partition(value_cols, ()), batch_format="pyarrow"
        )
        pixels = cells.map_batches(
            _FinalProject(spec, value_cols, fun, with_meta=True),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        final_dir = os.path.join(out_dir, "pixels")
        tmp_final = final_dir + ".tmp"
        shutil.rmtree(tmp_final, ignore_errors=True)
        pixels.write_parquet(tmp_final)
        shutil.rmtree(final_dir, ignore_errors=True)
        os.rename(tmp_final, final_dir)
        summary["merge_sec"] = round(time.perf_counter() - t0, 3)
        summary["pixels_dir"] = final_dir
    return summary


def load_pixels(out_dir: str) -> Dataset:
    return rd.read_parquet(os.path.join(out_dir, "pixels"))
