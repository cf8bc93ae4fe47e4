"""Raster rendering — the ``plotRaster`` analog (R/main.R:791-849).

The reference renders pixel polygons with ggplot2 + viridis.  Here the
(already tiny, post-aggregation) pixel table is pulled to the driver
and painted into a PNG — matplotlib is absent in the sandbox, so the
PNG is written from scratch (stdlib zlib + the PNG spec) with a
viridis-like colormap.  This is a SINK for small results, not a
distributed operator (SURVEY.md §2 O5).

Reductions mirror the reference's fill options (R/main.R:805-812):
``feature_name="sum"``/``"mean"`` reduce across feature columns;
a named column plots that column.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# 16-stop approximation of viridis (public-domain colormap values)
_VIRIDIS = np.array(
    [
        (68, 1, 84), (72, 26, 108), (71, 47, 125), (65, 68, 135),
        (57, 86, 140), (49, 104, 142), (42, 120, 142), (35, 136, 142),
        (31, 152, 139), (34, 168, 132), (53, 183, 121), (84, 197, 104),
        (122, 209, 81), (165, 219, 54), (210, 226, 27), (253, 231, 37),
    ],
    dtype=np.float64,
)


def viridis(v: np.ndarray) -> np.ndarray:
    """v in [0,1] → (n,3) uint8 RGB via linear interpolation."""
    v = np.clip(np.asarray(v, dtype=np.float64), 0.0, 1.0)
    pos = v * (len(_VIRIDIS) - 1)
    lo = np.floor(pos).astype(int)
    hi = np.minimum(lo + 1, len(_VIRIDIS) - 1)
    frac = (pos - lo)[:, None]
    return (_VIRIDIS[lo] * (1 - frac) + _VIRIDIS[hi] * frac).astype(np.uint8)


def write_png(path: str, rgb: np.ndarray) -> None:
    """Minimal valid 8-bit RGB PNG (one IDAT, filter 0 per scanline)."""
    h, w, _ = rgb.shape
    raw = b"".join(b"\x00" + rgb[r].tobytes() for r in range(h))

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)


def plot_raster(
    pixel_df,
    path: str,
    feature_name: str = "sum",
    value_prefix: str = "sum_",
    max_px: int = 800,
    background=(255, 255, 255),
    log_scale: bool = False,
):
    """Render a pixel table (pandas DataFrame with ix, iy and value
    columns) to a PNG heatmap.

    ``feature_name``: "sum" / "mean" reduce across all ``value_prefix``
    columns (R/main.R:806-808 colSums/colMeans analog); any other name
    plots that exact column.  Returns (path, width, height).
    """
    ix = pixel_df["ix"].to_numpy()
    iy = pixel_df["iy"].to_numpy()
    if feature_name in ("sum", "mean"):
        cols = [c for c in pixel_df.columns if c.startswith(value_prefix)]
        if not cols:
            raise ValueError(f"no {value_prefix}* columns to reduce")
        vals = pixel_df[cols].to_numpy(dtype=np.float64)
        v = vals.sum(axis=1) if feature_name == "sum" else vals.mean(axis=1)
    else:
        v = pixel_df[feature_name].to_numpy(dtype=np.float64)
    if log_scale:  # heavy-tailed fills (hot tiles) wash out linearly
        v = np.log1p(np.maximum(v, 0.0))

    return _paint(ix, iy, values=v, path=path, max_px=max_px, background=background)


def plot_raster_categorical(
    pixel_df,
    path: str,
    cat_col: str,
    factor_levels=None,
    max_px: int = 800,
    background=(255, 255, 255),
):
    """Categorical fill (reference ``factor_levels`` + viridis_d,
    R/main.R:820-828): one row per cell with a label column; each
    level gets an evenly-spaced viridis color.  Returns
    (path, width, height, {level: rgb})."""
    levels = sorted(factor_levels) if factor_levels else sorted(set(pixel_df[cat_col]))
    lut = {
        lv: tuple(int(c) for c in viridis(np.array([k / max(1, len(levels) - 1)]))[0])
        for k, lv in enumerate(levels)
    }
    codes = pixel_df[cat_col].map({lv: k for k, lv in enumerate(levels)}).to_numpy()
    norm = codes / max(1, len(levels) - 1)
    path, w, h = _paint(
        pixel_df["ix"].to_numpy(),
        pixel_df["iy"].to_numpy(),
        values=norm,
        path=path,
        max_px=max_px,
        background=background,
        prenormalized=True,
    )
    return path, w, h, lut


def _paint(ix, iy, values, path, max_px, background, prenormalized=False):
    nx = int(ix.max() - ix.min()) + 1
    ny = int(iy.max() - iy.min()) + 1
    scale = max(1, int(np.ceil(max(nx, ny) / max_px)))
    # value → color (min-max normalized, like a continuous fill scale)
    if prenormalized:
        norm = np.asarray(values, dtype=np.float64)
    else:
        lo, hi = float(values.min()), float(values.max())
        norm = (values - lo) / (hi - lo) if hi > lo else np.full(len(values), 0.5)
    rgb_vals = viridis(norm)

    img = np.full((ny, nx, 3), background, dtype=np.uint8)
    img[(iy - iy.min()).astype(int), (ix - ix.min()).astype(int)] = rgb_vals
    img = np.flipud(img)  # y up
    if scale > 1:
        img = img[::scale, ::scale]
    else:
        # upscale small grids so single pixels are visible
        up = max(1, max_px // max(nx, ny, 1))
        if up > 1:
            img = np.kron(img, np.ones((up, up, 1), dtype=np.uint8))
    write_png(path, np.ascontiguousarray(img))
    return path, img.shape[1], img.shape[0]
