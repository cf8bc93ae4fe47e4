"""End-to-end pipeline builders used by the driver contract and bench.

The flagship pipeline is the web-scale analog of SEraster's E1
(SURVEY.md §3): read pages/documents parquet → geocode each row to a
deterministic (x, y) → rasterize into grid pixels with per-pixel
feature aggregates.  Everything is lazy Ray Data; nothing here calls
ray.init().
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd
from ray.data import Dataset

from rayraster.geo import geocode_id, geocode_url


def add_geocode_id(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Stateless map: SQL-twin geocode of an int64 id column."""
    x, y = geocode_id(batch[id_col].to_numpy(zero_copy_only=False))
    return batch.append_column("x", pa.array(x)).append_column("y", pa.array(y))


def add_geocode_url(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Stateless map: FNV-1a url geocode with hotspot skew injection."""
    x, y = geocode_url(batch[url_col])
    return batch.append_column("x", pa.array(x)).append_column("y", pa.array(y))


def load_doc_points(
    sf_dir: str,
    columns: tuple = ("doc_id", "lang", "n_chars"),
    blocks: "int | str | None" = "auto",
) -> Dataset:
    """documents.parquet → point Dataset with (x, y).

    Columns are pruned AT THE READ (only the requested ones leave
    storage) — the 100-TB rule in the task brief.

    ``blocks="auto"`` sizes the read block count from parquet
    metadata (``max(8, min(32, rows // 256))``) — Ray's default
    SplitBlocks(64) hands every downstream sort exchange 64 tiny
    blocks at these table sizes and the per-block fixed cost dominates
    (the same measured rationale as the documents/events gate
    helpers).  Pass ``blocks=None`` at real scale to let Ray size
    blocks from byte targets."""
    kwargs = {}
    if blocks == "auto":
        import pyarrow.parquet as pq

        n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
        kwargs["override_num_blocks"] = max(8, min(32, n // 256))
    elif blocks is not None:
        kwargs["override_num_blocks"] = int(blocks)
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=list(columns), **kwargs
    )
    return ds.map_batches(add_geocode_id, batch_format="pyarrow", zero_copy_batch=True)


def prepare_pages(batch: pa.Table, verify: bool = True) -> pa.Table:
    """Single-pass pages preparation: extract (invariant-verified) +
    text features + url geocode, emitting only the numeric columns the
    rasterizer needs — one fused batch function instead of three
    chained table rebuilds (measured ~15% off the map-stage CPU)."""
    from rayraster.extract import ExtractStage, text_features

    batch = ExtractStage(verify_against="text" if verify else None)(batch)
    batch = text_features(batch)
    batch = add_geocode_url(batch)
    keep = [
        c
        for c in ("text_len", "token_count", "digit_count", "x", "y")
        if c in batch.column_names
    ]
    return batch.select(keep)


def rasterize_temporal(
    ds: Dataset,
    resolution: float,
    value_cols,
    ts_col: str = "ts",
    window_us: int = 3_600_000_000,
    **kwargs,
):
    """Spatiotemporal raster: one pixel row per (cell, time window) —
    the composition of the tumbling-window id (a pure function of the
    timestamp, no pre-shuffle) with the rasterize exchange, so the
    WHOLE cube costs the same single shuffle as a plain raster
    (window id rides along as an ``extra_keys`` column).

    Composes with the other key-riding transforms: a caller-supplied
    ``extra_keys`` (e.g. ``("rotation",)`` from permutate_by_rotation,
    or ``("dataset_id",)``) is appended after ``window``.

    Returns (pixel_table, spec); pixel rows carry a ``window`` column
    (floor(epoch_us / window_us))."""
    from rayraster.rasterize import rasterize_features
    from rayraster.windows import add_tumbling_window

    windowed = ds.map_batches(
        lambda t: add_tumbling_window(t, ts_col=ts_col, window_us=window_us),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    extra = ("window", *kwargs.pop("extra_keys", ()))
    return rasterize_features(
        windowed, resolution, list(value_cols),
        extra_keys=extra, **kwargs,
    )


def load_page_points(pages_path: str, columns: tuple = ("url", "lang", "text")) -> Dataset:
    """Synthetic pages table (synth.py) → point Dataset via url hash
    geocode, with derived continuous features (text_len)."""

    def _feat(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = add_geocode_url(t)
        if "text" in t.column_names:
            t = t.append_column("text_len", pc.utf8_length(t["text"]))
            t = t.drop_columns(["text"])
        return t

    ds = rd.read_parquet(pages_path, columns=list(columns))
    return ds.map_batches(_feat, batch_format="pyarrow", zero_copy_batch=True)


def _stamp_cell_meta(t: pa.Table, spec) -> pa.Table:
    """Append the uniform ``cell_id``/``cx``/``cy`` projection derived
    from (ix, iy) under ``spec`` — THE one definition shared by the
    pyramid and merge sinks (rollup_quadtree stamps its own coarse
    spec internally)."""
    import numpy as np

    from rayraster.grid import pack_cell_id

    ix = t["ix"].to_numpy(zero_copy_only=False).astype(np.int64)
    iy = t["iy"].to_numpy(zero_copy_only=False).astype(np.int64)
    cx, cy = spec.centroid(ix, iy)
    t = t.append_column("cell_id", pa.array(pack_cell_id(spec.level, ix, iy)))
    t = t.append_column("cx", pa.array(cx))
    return t.append_column("cy", pa.array(cy))


def _spec_manifest(spec) -> dict:
    return {
        "x0": spec.x0, "y0": spec.y0, "resolution": spec.resolution,
        "square": spec.square, "level": spec.level,
    }


def write_pyramid(
    pixels: Dataset,
    spec,
    out_dir: str,
    sum_cols: tuple = (),
    levels: int = 4,
    count_col: str = "num_cell",
    num_partitions: int = 64,
) -> dict:
    """Multi-resolution tile pyramid (the map-tile deliverable): write
    the finest raster as ``level=0`` and each quad-tree rollup
    (resolution doubling per level) as ``level=k`` partitioned parquet
    under ``out_dir`` — a consumer zooms by reading ONE level
    directory, never re-aggregating.

    Each coarser level is computed from the previous (already reduced)
    level via :func:`rayraster.rasterize.rollup_quadtree` — level k
    costs one exchange over ~4^-k of the pixel rows, so the whole
    pyramid is ~1/3 extra work on top of the base raster (geometric
    series), independent of the input row count.  Square grids only
    (hex has no exact nesting).

    Every level shares ONE schema — ``ix, iy, *sum_cols, count_col,
    cell_id, cx, cy`` (the rollup's projection; level 0 is normalized
    to it, extra caller columns dropped) — so the whole pyramid also
    reads as a single hive-partitioned dataset.

    Returns ``{level: {"rows": int, "resolution": float}}``.
    """
    import os
    import shutil

    from rayraster.grid import pack_cell_id
    from rayraster.rasterize import rollup_quadtree

    shutil.rmtree(out_dir, ignore_errors=True)
    cols = ["ix", "iy", *sum_cols, count_col, "cell_id", "cx", "cy"]

    def normalize(t: pa.Table, _spec=spec) -> pa.Table:
        if "cell_id" not in t.column_names:
            t = _stamp_cell_meta(t, _spec)
        return t.select(cols)

    summary: dict = {}
    cur, cur_spec = pixels.map_batches(normalize, batch_format="pyarrow"), spec
    for k in range(levels + 1):
        path = os.path.join(out_dir, f"level={k}")
        cur = cur.materialize()  # consumed twice: write + next rollup
        cur.write_parquet(path)
        summary[k] = {
            "rows": cur.count(),
            "resolution": cur_spec.resolution,
        }
        if k == levels:
            break
        cur, cur_spec = rollup_quadtree(
            cur, cur_spec, list(sum_cols), levels_up=1,
            count_col=count_col, num_partitions=num_partitions,
        )
        cur = cur.map_batches(
            lambda t: t.select(cols), batch_format="pyarrow"
        )
    return summary


def merge_pixel_stores(
    stores,
    spec,
    out_dir: str,
    sum_cols: tuple = (),
    min_cols: tuple = (),
    max_cols: tuple = (),
    count_col: str = "num_cell",
    num_partitions: int = 64,
):
    """Incremental ingest: merge N pixel stores (e.g. one per crawl
    snapshot/day, each produced by ``rasterize_features(fun="sum")``
    over its own slice) into one combined raster — WITHOUT touching
    any original input rows.

    Pixel aggregates are algebraic (sums/counts add, mins/maxes fold),
    so the merge is one hash-partitioned re-aggregate over the pixel
    tables only: at 100 TB/day this is the difference between
    re-rasterizing the whole history and a job over ~10^8 pixel rows.
    Means are NOT mergeable directly — derive them from the merged
    sum/count downstream (the engine's mean is always sum/count).

    All stores MUST share one GridSpec: (ix, iy) indices from
    different resolutions/origins name different physical cells and
    would fold silently into garbage.  A store carrying a
    ``_SPEC.json`` manifest (this function writes one into its output,
    so CHAINED merges validate automatically) is checked against
    ``spec``; manifest-less stores are trusted to the caller — stamp
    raw rasterize outputs by merging them once, or write the manifest
    yourself.

    Returns the merged Dataset (also written to ``out_dir`` with the
    uniform cell_id/cx/cy projection + ``_SPEC.json``).
    """
    import json
    import os
    import shutil

    from rayraster.agg import hash_aggregate

    store_list = list(stores) if isinstance(stores, (list, tuple)) else [stores]
    if not store_list:
        raise ValueError("merge_pixel_stores: need at least one store")
    want = _spec_manifest(spec)
    for s in store_list:
        mf = os.path.join(s, "_SPEC.json")
        if os.path.exists(mf):
            with open(mf) as f:
                got = json.load(f)
            if got != want:
                raise ValueError(
                    f"merge_pixel_stores: store {s} was rasterized under"
                    f" {got}, not the requested {want} — (ix, iy) from"
                    " different grids name different physical cells"
                )

    cols = ["ix", "iy", *sum_cols, *min_cols, *max_cols, count_col]
    parts = [rd.read_parquet(s, columns=cols) for s in store_list]
    union = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
    merged = hash_aggregate(
        union, ["ix", "iy"],
        sum_cols=[*sum_cols, count_col],
        min_cols=list(min_cols),
        max_cols=list(max_cols),
        count=False,
        num_partitions=num_partitions,
    )

    def project(t: pa.Table) -> pa.Table:
        out = {"ix": t["ix"], "iy": t["iy"]}
        for c in sum_cols:
            out[c] = t[f"sum_{c}"]
        for c in min_cols:
            out[c] = t[f"min_{c}"]
        for c in max_cols:
            out[c] = t[f"max_{c}"]
        out[count_col] = t[f"sum_{count_col}"]
        return _stamp_cell_meta(pa.table(out), spec)

    result = merged.map_batches(project, batch_format="pyarrow").materialize()
    shutil.rmtree(out_dir, ignore_errors=True)
    result.write_parquet(out_dir)
    with open(os.path.join(out_dir, "_SPEC.json"), "w") as f:
        json.dump(want, f)
    return result


def upsert_latest(
    snapshot: Dataset,
    changes: Dataset,
    key_col: str,
    version_col: str,
    tombstone_col: str | None = None,
    num_partitions: int = 64,
) -> Dataset:
    """Merge a change log into a snapshot (the CDC / SCD-type-1
    compaction every incrementally-ingested 100-TB store needs): per
    ``key_col``, keep the row with the HIGHEST ``version_col`` across
    both inputs; at equal version the CHANGES side wins (a re-emitted
    version is a correction).  Rows whose winning version carries a
    true ``tombstone_col`` are deletions and drop out of the result.

    Built on :func:`rayraster.agg.grouped_topk` (k=1): per-batch
    partial argmax BEFORE the one hash-partition shuffle, so each
    batch ships at most one row per key it contains — the change log
    and the snapshot both stream; nothing lands on the driver.  The
    order key is ``version·2 + source`` (source: snapshot=0,
    changes=1), one int64 — versions must stay below 2^62 (raises
    otherwise; epoch-micro versions are fine until year 75 000).

    Ties beyond (version, source) — duplicate (key, version) rows
    WITHIN one side — are resolved arbitrarily (pass a pre-deduped
    change log, as every log-compaction contract requires).

    Schemas must match; if only ``changes`` carries ``tombstone_col``,
    the snapshot gets an all-false column.  Output columns = the input
    columns (tombstone column included — callers auditing deletes can
    read it; project it away otherwise).
    """
    import numpy as np
    import pyarrow.compute as pc

    from rayraster.agg import grouped_topk

    if tombstone_col is not None:
        snap_cols = set(snapshot.schema().names)
        if tombstone_col not in snap_cols:
            snapshot = snapshot.map_batches(
                lambda t: t.append_column(
                    tombstone_col, pa.array(np.zeros(t.num_rows, dtype=bool))
                ),
                batch_format="pyarrow",
            )

    _LIM = (2**63 - 2) // 2

    def tag(src: int):
        def _tag(t: pa.Table) -> pa.Table:
            v = t[version_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
            if t.num_rows and (v.max() > _LIM or v.min() < 0):
                raise ValueError(
                    f"upsert_latest: {version_col} must be in [0, 2^62)"
                )
            return t.append_column("_ord", pa.array(v * 2 + src))

        return _tag

    combined = snapshot.map_batches(tag(0), batch_format="pyarrow").union(
        changes.map_batches(tag(1), batch_format="pyarrow")
    )
    winners = grouped_topk(
        combined, [key_col], "_ord", k=1, descending=True,
        num_partitions=num_partitions,
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_ord", "rnk"])
        if tombstone_col is not None:
            t = t.filter(
                pc.invert(pc.fill_null(t[tombstone_col].cast(pa.bool_()), False))
            )
        return t

    return winners.map_batches(finish, batch_format="pyarrow")


def diff_snapshots(
    old: Dataset,
    new: Dataset,
    key_col: str,
    compare_cols: list[str],
    num_partitions: int = 64,
    include_unchanged: bool = False,
) -> Dataset:
    """Structural diff of two snapshot tables by key — the audit pass
    behind every incremental-ingest pipeline (validate yesterday's
    store + today's changes == today's store; see
    :func:`upsert_latest`): one FULL-OUTER
    :func:`rayraster.join.bucket_join` (hash-partitioned, both sides
    stream), then a map-only per-row classification:

    * ``added``     — key only in ``new``
    * ``removed``   — key only in ``old``
    * ``changed``   — key in both, any ``compare_cols`` value differs
      (NULL-safe: NULL↔value counts as a change, NULL↔NULL does not)
    * ``unchanged`` — key in both, all equal (emitted only with
      ``include_unchanged=True``; at 100 TB the diff output should be
      the CHANGE set, not a copy of the store)

    Output: ``key, change, old_<c>…, new_<c>…``.  Keys must be unique
    per side (snapshot semantics; duplicate keys produce a row per
    pair, as SQL would).
    """
    import numpy as np
    import pyarrow.compute as pc

    from rayraster.join import bucket_join

    if not compare_cols:
        raise ValueError("diff_snapshots: need at least one compare column")

    def prep(side: str):
        def _p(t: pa.Table) -> pa.Table:
            cols = {f"{side}_key": t[key_col], f"_{side}p": pa.array(
                np.ones(t.num_rows, dtype=bool))}
            for c in compare_cols:
                cols[f"{side}_{c}"] = t[c]
            return pa.table(cols)

        return _p

    o = old.map_batches(prep("old"), batch_format="pyarrow", zero_copy_batch=True)
    n = new.map_batches(prep("new"), batch_format="pyarrow", zero_copy_batch=True)
    j = bucket_join(
        o, n, "old_key", "new_key", num_buckets=num_partitions, join_type="full"
    )

    def classify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # carry the joined columns' real types so empty blocks
            # union cleanly with non-empty ones
            return pa.table(
                {key_col: pa.array([], type=t["old_key"].type),
                 "change": pa.array([], type=pa.string()),
                 **{f"old_{c}": pa.array([], type=t[f"old_{c}"].type)
                    for c in compare_cols},
                 **{f"new_{c}": pa.array([], type=t[f"new_{c}"].type)
                    for c in compare_cols}}
            )
        lp = pc.fill_null(t["_oldp"], False).to_numpy(zero_copy_only=False)
        rp = pc.fill_null(t["_newp"], False).to_numpy(zero_copy_only=False)
        differs = np.zeros(t.num_rows, dtype=bool)
        for c in compare_cols:
            a, b = t[f"old_{c}"], t[f"new_{c}"]
            an = pc.is_null(a).to_numpy(zero_copy_only=False)
            bn = pc.is_null(b).to_numpy(zero_copy_only=False)
            ne = pc.fill_null(pc.not_equal(a, b), False).to_numpy(
                zero_copy_only=False
            )
            differs |= ne | (an != bn)
        change = np.where(
            ~lp, "added", np.where(~rp, "removed",
                                   np.where(differs, "changed", "unchanged"))
        )
        # full-outer pa.Table.join coalesces the key columns into the
        # left key name — right-only rows carry it too
        out = {key_col: t["old_key"], "change": pa.array(change)}
        for c in compare_cols:
            out[f"old_{c}"] = t[f"old_{c}"]
            out[f"new_{c}"] = t[f"new_{c}"]
        tbl = pa.table(out)
        if not include_unchanged:
            tbl = tbl.filter(pc.not_equal(tbl["change"], "unchanged"))
        return tbl

    return j.map_batches(classify, batch_format="pyarrow")
