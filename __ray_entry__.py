"""Driver contract for the rayraster engine.

``queries()`` exposes one callable per implemented operator/pipeline
(SURVEY.md §2); ``oracle_sql()`` gives the DuckDB twin over the same
parquet tables.  Every float formula in the SQL is the literal twin of
the numpy formula (same constants via repr, same operation order) so
value hashes match bit-for-bit.

Ray is initialised by the driver BEFORE this module is imported; no
ray.init()/ray.shutdown() here or below.
"""

from __future__ import annotations

import math
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from rayraster.grid import GridSpec, polyfill_bbox, parse_wkb_polygon
from rayraster.geo import geocode_sql
from rayraster.pipelines import load_doc_points
from rayraster.rasterize import (
    rasterize_categories,
    rasterize_features,
    rollup_quadtree,
)
from rayraster.rotate import permutate_by_rotation
from rayraster.clip import ClipStage
from rayraster.knn import KnnStage

# --------------------------------------------------------------------------
# shared SQL fragments (twins of rayraster.geo / rayraster.grid formulas)
# --------------------------------------------------------------------------

_GX, _GY = geocode_sql("doc_id")

_PTS = f"""pts AS (
  SELECT doc_id, lang, n_chars, {_GX} AS x, {_GY} AS y
  FROM documents
)"""


def _bb(res: float) -> str:
    h = res / 2.0
    return (
        f"bb AS (SELECT floor(min(x) - {h!r}) AS x0, "
        f"floor(min(y) - {h!r}) AS y0 FROM pts)"
    )


def _square_cells(res: float) -> str:
    """pts × bb → per-row (ix, iy, cx, cy, …) — twin of
    GridSpec.assign_square + centroid_square."""
    return f"""cells AS (
  SELECT p.doc_id, p.lang, p.n_chars,
         CAST(greatest(ceiling((p.x - b.x0) / {res!r}) - 1, 0) AS BIGINT) AS ix,
         CAST(greatest(ceiling((p.y - b.y0) / {res!r}) - 1, 0) AS BIGINT) AS iy,
         b.x0, b.y0
  FROM pts p CROSS JOIN bb b
),
cells2 AS (
  SELECT *, x0 + (ix + 0.5) * {res!r} AS cx, y0 + (iy + 0.5) * {res!r} AS cy
  FROM cells
)"""


RES = 30.0  # headline resolution for the r-family queries


# --------------------------------------------------------------------------
# Ray-side query implementations
# --------------------------------------------------------------------------


def _q_geocode(sf_dir: str):
    return load_doc_points(sf_dir, columns=("doc_id",)).select_columns(
        ["doc_id", "x", "y"]
    )


def _q_square_sum(sf_dir: str):
    pts = load_doc_points(sf_dir)
    out, _ = rasterize_features(pts, RES, ["n_chars"], fun="sum", with_meta=False)
    return out.select_columns(["ix", "iy", "cx", "cy", "num_cell", "sum_n_chars"])


def _q_square_mean(sf_dir: str):
    pts = load_doc_points(sf_dir)
    out, _ = rasterize_features(pts, RES, ["n_chars"], fun="mean", with_meta=False)
    return out.select_columns(
        ["ix", "iy", "cx", "cy", "num_cell", "sum_n_chars", "mean_n_chars"]
    )


def _q_celltype(sf_dir: str):
    pts = load_doc_points(sf_dir)
    out, _ = rasterize_categories(pts, RES, "lang")
    return out.select_columns(["ix", "iy", "cx", "cy", "lang", "n", "num_cell", "prop"])


def _q_hex_sum(sf_dir: str):
    pts = load_doc_points(sf_dir)
    out, _ = rasterize_features(
        pts, RES, ["n_chars"], square=False, fun="sum", with_meta=False
    )
    return out.select_columns(["ix", "iy", "cx", "cy", "num_cell", "sum_n_chars"])


def _q_rotations(sf_dir: str):
    pts = load_doc_points(sf_dir, columns=("doc_id", "n_chars"))
    rot = permutate_by_rotation(pts, 3)
    out, _ = rasterize_features(
        rot, 40.0, ["n_chars"], fun="sum", extra_keys=("rotation",), with_meta=False
    )
    return out.select_columns(["rotation", "ix", "iy", "cx", "cy", "num_cell", "sum_n_chars"])


def _q_multires(sf_dir: str):
    pts = load_doc_points(sf_dir, columns=("doc_id", "n_chars"))
    fine, spec = rasterize_features(pts, 15.0, ["n_chars"], fun="sum", with_meta=False)
    coarse, _ = rollup_quadtree(fine, spec, ["sum_n_chars"], levels_up=1)
    return coarse.select_columns(["ix", "iy", "cx", "cy", "num_cell", "sum_n_chars"])


# clip polygon (CCW ring, vertices chosen so no point lies on an edge)
CLIP_RING = np.array(
    [
        (-100.1, -50.3),
        (80.7, -60.2),
        (120.3, 20.9),
        (10.4, 70.1),
        (-130.8, 30.5),
        (-100.1, -50.3),
    ]
)


def _q_clip(sf_dir: str):
    pts = load_doc_points(sf_dir, columns=("doc_id",))
    ref = ray.put([CLIP_RING])
    inside = pts.map_batches(ClipStage(ref, "x", "y"), batch_format="pyarrow")
    return inside.select_columns(["doc_id"])


def _q_knn(sf_dir: str):
    pts = load_doc_points(sf_dir, columns=("doc_id", "n_chars"))
    cells, _ = rasterize_features(pts, RES, ["n_chars"], fun="sum", with_meta=False)
    pix = (
        cells.select_columns(["ix", "iy", "cx", "cy"])
        .to_pandas()
        .sort_values(["ix", "iy"])  # ref row order == SQL tie-break (b.ix, b.iy)
        .reset_index(drop=True)
    )
    ref = ray.put(
        {
            "x": pix.cx.to_numpy(),
            "y": pix.cy.to_numpy(),
            "ix": pix.ix.to_numpy(),
            "iy": pix.iy.to_numpy(),
        }
    )
    out = rd.from_pandas(pix).map_batches(
        KnnStage(ref, k=4, exclude_self=True),
        batch_format="pyarrow",
        concurrency=2,
    )
    return out.select_columns(["ix", "iy", "rank", "dist2", "n_ix", "n_iy"])


POLYFILL_SPEC = GridSpec(-180.0, -90.0, 10.0)
POLYFILL_RECT = (-47.3, -12.7, 31.9, 44.2)


def _q_polyfill(sf_dir: str):
    ii, jj = polyfill_bbox(POLYFILL_SPEC, *POLYFILL_RECT[:2], *POLYFILL_RECT[2:])
    cx, cy = POLYFILL_SPEC.centroid(ii, jj)
    return pa.table({"ix": ii, "iy": jj, "cx": cx, "cy": cy})


def _q_raster_to_vector(sf_dir: str):
    """Pixel table → WKB polygons → parsed corner coordinates: the
    raster↔vector round trip, kept SQL-comparable by emitting corners."""
    pts = load_doc_points(sf_dir, columns=("doc_id",))
    cells, spec = rasterize_features(pts, RES, [], fun="sum", with_meta=False)

    def _vec(t: pa.Table) -> pa.Table:
        ix = t["ix"].to_numpy(zero_copy_only=False)
        iy = t["iy"].to_numpy(zero_copy_only=False)
        lo_x = np.empty(len(ix))
        lo_y = np.empty(len(ix))
        hi_x = np.empty(len(ix))
        hi_y = np.empty(len(ix))
        for k in range(len(ix)):
            ring = parse_wkb_polygon(spec.polygon_wkb(int(ix[k]), int(iy[k])))
            lo_x[k], lo_y[k] = ring[0]
            hi_x[k], hi_y[k] = ring[2]
        return pa.table(
            {"ix": ix, "iy": iy, "x_lo": lo_x, "y_lo": lo_y, "x_hi": hi_x, "y_hi": hi_y}
        )

    return cells.map_batches(_vec, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------------
# oracle SQL twins
# --------------------------------------------------------------------------


def _sql_square_sum() -> str:
    return f"""WITH {_PTS}, {_bb(RES)}, {_square_cells(RES)}
SELECT ix, iy, cx, cy, COUNT(*) AS num_cell,
       CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars
FROM cells2 GROUP BY ix, iy, cx, cy"""


def _sql_square_mean() -> str:
    return f"""WITH {_PTS}, {_bb(RES)}, {_square_cells(RES)}
SELECT ix, iy, cx, cy, COUNT(*) AS num_cell,
       CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
       CAST(SUM(n_chars) AS BIGINT) / CAST(COUNT(*) AS BIGINT) AS mean_n_chars
FROM cells2 GROUP BY ix, iy, cx, cy"""


def _sql_celltype() -> str:
    return f"""WITH {_PTS}, {_bb(RES)}, {_square_cells(RES)},
lc AS (
  SELECT ix, iy, cx, cy, lang, COUNT(*) AS n
  FROM cells2 GROUP BY ix, iy, cx, cy, lang
)
SELECT ix, iy, cx, cy, lang, n,
       CAST(SUM(n) OVER (PARTITION BY ix, iy) AS BIGINT) AS num_cell,
       n / CAST(SUM(n) OVER (PARTITION BY ix, iy) AS BIGINT) AS prop
FROM lc"""


def _sql_hex_sum() -> str:
    R = RES / math.sqrt(3.0)
    A = math.sqrt(3.0) / (3.0 * R)
    C = 1.0 / (3.0 * R)
    D = 2.0 / (3.0 * R)
    W = math.sqrt(3.0) * R
    Wh = W / 2.0
    H = 1.5 * R
    return f"""WITH {_PTS}, {_bb(RES)},
hx AS (
  SELECT p.n_chars,
         (p.x - b.x0) * {A!r} - (p.y - b.y0) * {C!r} AS qf,
         (p.y - b.y0) * {D!r} AS rf,
         b.x0, b.y0
  FROM pts p CROSS JOIN bb b
),
rnd AS (
  SELECT *, floor(qf + 0.5) AS rx, floor(-qf - rf + 0.5) AS ry,
         floor(rf + 0.5) AS rz
  FROM hx
),
dd AS (
  SELECT *, abs(rx - qf) AS dx, abs(ry - (-qf - rf)) AS dy, abs(rz - rf) AS dz
  FROM rnd
),
ax AS (
  SELECT *,
         CASE WHEN dx > dy AND dx > dz THEN -ry - rz ELSE rx END AS qq,
         CASE WHEN (NOT (dx > dy AND dx > dz)) AND (NOT (dy > dz))
              THEN -rx - ry ELSE rz END AS rr
  FROM dd
),
hcells AS (
  SELECT CAST(qq AS BIGINT) AS ix, CAST(rr AS BIGINT) AS iy, n_chars,
         x0 + qq * {W!r} + rr * {Wh!r} AS cx,
         y0 + rr * {H!r} AS cy
  FROM ax
)
SELECT ix, iy, cx, cy, COUNT(*) AS num_cell,
       CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars
FROM hcells GROUP BY ix, iy, cx, cy"""


def _sql_rotations() -> str:
    res = 40.0
    h = res / 2.0
    arms = []
    for k in range(3):
        a = k * (360.0 / 3)
        c = math.cos(math.radians(a))
        s = math.sin(math.radians(a))
        arms.append(
            f"""SELECT doc_id, n_chars, {a!r} AS rotation,
       ox + (x - ox) * {c!r} - (y - oy) * {s!r} AS x,
       oy + (x - ox) * {s!r} + (y - oy) * {c!r} AS y
FROM pts CROSS JOIN org"""
        )
    union = "\nUNION ALL\n".join(arms)
    return f"""WITH {_PTS},
org AS (SELECT (min(x) + max(x)) / 2.0 AS ox, (min(y) + max(y)) / 2.0 AS oy FROM pts),
rot AS (
{union}
),
bb AS (SELECT floor(min(x) - {h!r}) AS x0, floor(min(y) - {h!r}) AS y0 FROM rot),
cells AS (
  SELECT p.rotation, p.n_chars,
         CAST(greatest(ceiling((p.x - b.x0) / {res!r}) - 1, 0) AS BIGINT) AS ix,
         CAST(greatest(ceiling((p.y - b.y0) / {res!r}) - 1, 0) AS BIGINT) AS iy,
         b.x0, b.y0
  FROM rot p CROSS JOIN bb b
),
cells2 AS (
  SELECT *, x0 + (ix + 0.5) * {res!r} AS cx, y0 + (iy + 0.5) * {res!r} AS cy
  FROM cells
)
SELECT rotation, ix, iy, cx, cy, COUNT(*) AS num_cell,
       CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars
FROM cells2 GROUP BY rotation, ix, iy, cx, cy"""


def _sql_multires() -> str:
    # direct coarse binning at 2×15 with the res-15 pad-rule origin —
    # must equal the engine's fine→parent quad-tree rollup
    return f"""WITH {_PTS}, {_bb(15.0)},
cells AS (
  SELECT p.n_chars,
         CAST(greatest(ceiling((p.x - b.x0) / 30.0) - 1, 0) AS BIGINT) AS ix,
         CAST(greatest(ceiling((p.y - b.y0) / 30.0) - 1, 0) AS BIGINT) AS iy,
         b.x0, b.y0
  FROM pts p CROSS JOIN bb b
),
cells2 AS (
  SELECT *, x0 + (ix + 0.5) * 30.0 AS cx, y0 + (iy + 0.5) * 30.0 AS cy
  FROM cells
)
SELECT ix, iy, cx, cy, COUNT(*) AS num_cell,
       CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars
FROM cells2 GROUP BY ix, iy, cx, cy"""


def _sql_clip() -> str:
    ring = CLIP_RING
    # CCW convex ring ⇒ inside = strictly left of every edge
    conds = []
    for i in range(len(ring) - 1):
        x1, y1 = float(ring[i][0]), float(ring[i][1])
        x2, y2 = float(ring[i + 1][0]), float(ring[i + 1][1])
        conds.append(
            f"(({x2!r} - {x1!r}) * (y - {y1!r}) - ({y2!r} - {y1!r}) * (x - {x1!r})) > 0"
        )
    cond = " AND ".join(conds)
    return f"""WITH {_PTS}
SELECT doc_id FROM pts WHERE {cond}"""


def _sql_knn() -> str:
    return f"""WITH {_PTS}, {_bb(RES)}, {_square_cells(RES)},
c AS (
  SELECT ix, iy, cx, cy FROM cells2 GROUP BY ix, iy, cx, cy
)
SELECT ix, iy, "rank", dist2, n_ix, n_iy FROM (
  SELECT a.ix, a.iy, b.ix AS n_ix, b.iy AS n_iy,
         (a.cx - b.cx) * (a.cx - b.cx) + (a.cy - b.cy) * (a.cy - b.cy) AS dist2,
         row_number() OVER (
           PARTITION BY a.ix, a.iy
           ORDER BY (a.cx - b.cx) * (a.cx - b.cx) + (a.cy - b.cy) * (a.cy - b.cy),
                    b.ix, b.iy
         ) AS "rank"
  FROM c a JOIN c b ON NOT (a.ix = b.ix AND a.iy = b.iy)
) WHERE "rank" <= 4"""


def _sql_polyfill() -> str:
    x0, y0, res = POLYFILL_SPEC.x0, POLYFILL_SPEC.y0, POLYFILL_SPEC.resolution
    xmin, ymin, xmax, ymax = POLYFILL_RECT
    return f"""WITH ii AS (
  SELECT ix FROM generate_series(
    CAST(ceiling(({xmin!r} - {x0!r}) / {res!r} - 0.5) AS BIGINT),
    CAST(floor(({xmax!r} - {x0!r}) / {res!r} - 0.5) AS BIGINT)) AS t(ix)
),
jj AS (
  SELECT iy FROM generate_series(
    CAST(ceiling(({ymin!r} - {y0!r}) / {res!r} - 0.5) AS BIGINT),
    CAST(floor(({ymax!r} - {y0!r}) / {res!r} - 0.5) AS BIGINT)) AS t(iy)
)
SELECT ix, iy, {x0!r} + (ix + 0.5) * {res!r} AS cx, {y0!r} + (iy + 0.5) * {res!r} AS cy
FROM ii CROSS JOIN jj"""


def _sql_raster_to_vector() -> str:
    return f"""WITH {_PTS}, {_bb(RES)}, {_square_cells(RES)},
c AS (SELECT ix, iy, min(x0) AS x0, min(y0) AS y0 FROM cells2 GROUP BY ix, iy)
SELECT ix, iy,
       x0 + ix * {RES!r} AS x_lo, y0 + iy * {RES!r} AS y_lo,
       (x0 + ix * {RES!r}) + {RES!r} AS x_hi, (y0 + iy * {RES!r}) + {RES!r} AS y_hi
FROM c"""


# --------------------------------------------------------------------------
# driver entry points
# --------------------------------------------------------------------------


def entry() -> Any:
    """Flagship pipeline on sf0.001: geocode → square rasterize (mean)."""
    pts = load_doc_points("/root/testdata/sf0.001")
    out, _ = rasterize_features(pts, RES, ["n_chars"], fun="mean")
    return out


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "r0_geocode": _q_geocode,
        "r1_square_sum": _q_square_sum,
        "r2_square_mean": _q_square_mean,
        "r3_celltype": _q_celltype,
        "r4_hex_sum": _q_hex_sum,
        "r5_rotations": _q_rotations,
        "r6_multires": _q_multires,
        "r7_clip": _q_clip,
        "r8_knn": _q_knn,
        "r9_polyfill": _q_polyfill,
        "r10_raster_to_vector": _q_raster_to_vector,
    }


def oracle_sql() -> dict[str, str]:
    gx, gy = geocode_sql("doc_id")
    return {
        "r0_geocode": f"SELECT doc_id, {gx} AS x, {gy} AS y FROM documents",
        "r1_square_sum": _sql_square_sum(),
        "r2_square_mean": _sql_square_mean(),
        "r3_celltype": _sql_celltype(),
        "r4_hex_sum": _sql_hex_sum(),
        "r5_rotations": _sql_rotations(),
        "r6_multires": _sql_multires(),
        "r7_clip": _sql_clip(),
        "r8_knn": _sql_knn(),
        "r9_polyfill": _sql_polyfill(),
        "r10_raster_to_vector": _sql_raster_to_vector(),
    }
