"""Terrain-analytics pipeline over a rasterized point corpus.

The full geospatial-analysis story SEraster's users hand off to R's
raster/terra/spatstat stack, composed end-to-end from the engine's
native operators (all streaming Ray Data, every stage an exchange
pattern proven by the oracle gates):

  points (geocoded docs)
      → rasterize_features        (the SEraster core: sum per cell)
      → kde_surface               (Epanechnikov density heatmap —
                                   reaches EMPTY neighbor cells)
      → focal_convolve + hillshade (Gaussian smoothing + Horn shading
                                   off ONE tile+halo exchange)
      → flow_direction            (D8 steepest descent)
      → flow_accumulation         (upstream cell counts)
      → basin_labels              (watershed delineation, pointer
                                   doubling)
      → cost_distance             (least-cost surface from the pits)
      → contour_cases             (marching-squares isolines)
      → parquet per product       (resumable, partitioned outputs)

Run:  PYTHONPATH=. python examples/terrain_pipeline.py [--rows 200000]
"""

from __future__ import annotations

import argparse
import json
import tempfile


def main(rows: int = 200_000, out_dir: str | None = None,
         num_cpus: int | None = None) -> dict:
    import numpy as np
    import pyarrow as pa

    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from rayraster import rasterize_features
    from rayraster.geo import geocode_id
    from rayraster.spatial import (
        basin_labels,
        contour_cases,
        cost_distance,
        flow_accumulation,
        flow_direction,
        focal_convolve,
        gaussian_kernel_int,
        hillshade,
        kde_surface,
        sobel_kernels_int,
    )

    out = out_dir or tempfile.mkdtemp(prefix="rayraster_terrain_")
    summary: dict = {"rows": rows, "out": out}
    RES = 3.0

    # --- synthetic geocoded points (deterministic, like the gates) ----
    ids = np.arange(rows, dtype=np.int64)

    def make_pts(t: pa.Table) -> pa.Table:
        i = t["id"].to_numpy(zero_copy_only=False)
        x, y = geocode_id(i)
        # shrink the globe-range geocode onto a dense local frame so
        # the raster has terrain-like occupancy at any row count
        return pa.table(
            {"doc_id": t["id"], "x": pa.array(x / 4.0),
             "y": pa.array(y / 4.0), "n_chars": pa.array((i % 997) + 1)}
        )

    pts = (
        rd.from_arrow(pa.table({"id": ids}))
        .repartition(max(2, min(32, rows // 25_000 or 2)))
        .map_batches(make_pts, batch_format="pyarrow")
        .materialize()  # consumed by the raster AND the kde surface
    )

    # --- the SEraster core: per-cell aggregate ------------------------
    px, spec = rasterize_features(pts, RES, ["n_chars"], fun="sum",
                                  with_meta=False)
    px = px.select_columns(["ix", "iy", "sum_n_chars"]).materialize()
    summary["cells"] = px.count()

    # --- density surface (scatter-gather, reaches empty cells) --------
    kde = kde_surface(pts, spec.x0, spec.y0, RES, num_partitions=16)
    kde.write_parquet(f"{out}/kde")
    summary["kde_cells"] = rd.read_parquet(f"{out}/kde").count()

    # --- smoothing + shading off ONE tile+halo exchange ---------------
    conv = focal_convolve(
        px, "sum_n_chars",
        {"g": gaussian_kernel_int(2, 1.0), **sobel_kernels_int()},
        num_partitions=16,
    )
    shade = hillshade(conv, gx_col="gx_sum", gy_col="gy_sum")
    shade.write_parquet(f"{out}/hillshade")

    # --- hydrology: direction → accumulation → basins → cost ----------
    fdir = flow_direction(px, "sum_n_chars", num_partitions=16).materialize()
    n_cells = summary["cells"]
    acc = flow_accumulation(fdir, rounds=32, num_partitions=16,
                            node_count=n_cells)
    acc.write_parquet(f"{out}/flow_acc")
    basins = basin_labels(fdir, doublings=6, num_partitions=16,
                          node_count=n_cells)
    basins.write_parquet(f"{out}/basins")
    import pyarrow.compute as pc

    pits = fdir.map_batches(
        lambda t: t.filter(pc.invert(t["has_down"])).select(["ix", "iy"]),
        batch_format="pyarrow",
    )
    cost = cost_distance(px, pits, rounds=24, cost_col="sum_n_chars",
                         num_partitions=16, node_count=n_cells)
    cost.write_parquet(f"{out}/cost")
    def basin_key(t: pa.Table) -> pa.Table:
        bx = t["basin_ix"].to_numpy(zero_copy_only=False).astype(np.int64)
        by = t["basin_iy"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"basin": pa.array(bx * np.int64(1 << 32) + by)})

    summary["basins"] = len(
        rd.read_parquet(f"{out}/basins")
        .map_batches(basin_key, batch_format="pyarrow")
        .unique("basin")
    )
    summary["reached"] = rd.read_parquet(f"{out}/cost").count()

    # --- isolines over the median-ish threshold -----------------------
    med = int(np.median(
        pa.concat_tables(px.iter_batches(batch_format="pyarrow"))
        ["sum_n_chars"].to_numpy(zero_copy_only=False)
    ))
    contours = contour_cases(px, "sum_n_chars", med, num_partitions=16)
    contours.write_parquet(f"{out}/contours")
    summary["contour_blocks"] = rd.read_parquet(f"{out}/contours").count()
    summary["threshold"] = med
    from rayraster.spatial import contour_segments

    segs = contour_segments(px, "sum_n_chars", med, spec.x0, spec.y0, RES,
                            num_partitions=16)
    segs.write_parquet(f"{out}/contour_segments")
    summary["contour_segments"] = rd.read_parquet(
        f"{out}/contour_segments"
    ).count()

    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--out", default=None)
    ap.add_argument("--num-cpus", type=int, default=None)
    a = ap.parse_args()
    main(rows=a.rows, out_dir=a.out, num_cpus=a.num_cpus)
