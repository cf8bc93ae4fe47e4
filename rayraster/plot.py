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

# 16-stop approximations of the viridis-family colormaps (the colormap
# VALUES are public domain, CC0 — van der Walt & Smith).  The reference
# forwards ``...`` to scale_fill_viridis_c/_d (R/main.R:819,827), whose
# most-used knobs are option / limits / direction / na.value — mirrored
# by plot_raster below.
_CMAPS: dict[str, np.ndarray] = {
    "viridis": np.array(
        [
            (68, 1, 84), (72, 26, 108), (71, 47, 125), (65, 68, 135),
            (57, 86, 140), (49, 104, 142), (42, 120, 142), (35, 136, 142),
            (31, 152, 139), (34, 168, 132), (53, 183, 121), (84, 197, 104),
            (122, 209, 81), (165, 219, 54), (210, 226, 27), (253, 231, 37),
        ],
        dtype=np.float64,
    ),
    "magma": np.array(
        [
            (0, 0, 4), (11, 9, 36), (28, 16, 71), (59, 15, 112),
            (88, 24, 126), (114, 31, 129), (140, 41, 129), (168, 50, 125),
            (196, 60, 117), (222, 73, 104), (241, 96, 93), (250, 127, 94),
            (254, 159, 109), (254, 191, 132), (253, 222, 160), (252, 253, 191),
        ],
        dtype=np.float64,
    ),
    "plasma": np.array(
        [
            (13, 8, 135), (51, 5, 151), (80, 2, 162), (106, 0, 168),
            (132, 5, 167), (156, 23, 158), (177, 42, 144), (195, 61, 128),
            (212, 80, 113), (226, 100, 98), (238, 121, 83), (246, 143, 68),
            (252, 166, 54), (254, 192, 41), (249, 220, 36), (240, 249, 33),
        ],
        dtype=np.float64,
    ),
    "cividis": np.array(
        [
            (0, 32, 77), (0, 42, 100), (14, 52, 111), (51, 62, 110),
            (74, 73, 109), (92, 84, 110), (109, 94, 113), (125, 105, 117),
            (141, 116, 117), (158, 128, 113), (175, 140, 106), (192, 153, 96),
            (210, 166, 83), (229, 180, 65), (248, 194, 42), (255, 234, 70),
        ],
        dtype=np.float64,
    ),
}


def colormap(v: np.ndarray, option: str = "viridis", direction: int = 1) -> np.ndarray:
    """v in [0,1] → (n,3) uint8 RGB via linear interpolation through a
    16-stop table.  ``option`` picks the map (viridis/magma/plasma/
    cividis — scale_fill_viridis_c's option knob); ``direction=-1``
    reverses it (ggplot's direction)."""
    table = _CMAPS.get(option)
    if table is None:
        raise ValueError(f"unknown colormap {option!r}; have {sorted(_CMAPS)}")
    if direction == -1:
        table = table[::-1]
    elif direction != 1:
        raise ValueError("direction must be 1 or -1")
    v = np.clip(np.asarray(v, dtype=np.float64), 0.0, 1.0)
    pos = v * (len(table) - 1)
    lo = np.floor(pos).astype(int)
    hi = np.minimum(lo + 1, len(table) - 1)
    frac = (pos - lo)[:, None]
    return (table[lo] * (1 - frac) + table[hi] * frac).astype(np.uint8)


def viridis(v: np.ndarray) -> np.ndarray:
    """v in [0,1] → (n,3) uint8 RGB via linear interpolation."""
    return colormap(v, "viridis")


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


# --------------------------------------------------------------------------
# 5×7 bitmap font (from-scratch; enough for titles, axis + legend labels)
# --------------------------------------------------------------------------

_FONT = {
    "0": (0x0E, 0x11, 0x13, 0x15, 0x19, 0x11, 0x0E),
    "1": (0x04, 0x0C, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "2": (0x0E, 0x11, 0x01, 0x02, 0x04, 0x08, 0x1F),
    "3": (0x1F, 0x02, 0x04, 0x02, 0x01, 0x11, 0x0E),
    "4": (0x02, 0x06, 0x0A, 0x12, 0x1F, 0x02, 0x02),
    "5": (0x1F, 0x10, 0x1E, 0x01, 0x01, 0x11, 0x0E),
    "6": (0x06, 0x08, 0x10, 0x1E, 0x11, 0x11, 0x0E),
    "7": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x08, 0x08),
    "8": (0x0E, 0x11, 0x11, 0x0E, 0x11, 0x11, 0x0E),
    "9": (0x0E, 0x11, 0x11, 0x0F, 0x01, 0x02, 0x0C),
    "A": (0x0E, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "B": (0x1E, 0x11, 0x11, 0x1E, 0x11, 0x11, 0x1E),
    "C": (0x0E, 0x11, 0x10, 0x10, 0x10, 0x11, 0x0E),
    "D": (0x1C, 0x12, 0x11, 0x11, 0x11, 0x12, 0x1C),
    "E": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x1F),
    "F": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x10),
    "G": (0x0E, 0x11, 0x10, 0x17, 0x11, 0x11, 0x0F),
    "H": (0x11, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "I": (0x0E, 0x04, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "J": (0x07, 0x02, 0x02, 0x02, 0x02, 0x12, 0x0C),
    "K": (0x11, 0x12, 0x14, 0x18, 0x14, 0x12, 0x11),
    "L": (0x10, 0x10, 0x10, 0x10, 0x10, 0x10, 0x1F),
    "M": (0x11, 0x1B, 0x15, 0x15, 0x11, 0x11, 0x11),
    "N": (0x11, 0x19, 0x15, 0x13, 0x11, 0x11, 0x11),
    "O": (0x0E, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "P": (0x1E, 0x11, 0x11, 0x1E, 0x10, 0x10, 0x10),
    "Q": (0x0E, 0x11, 0x11, 0x11, 0x15, 0x12, 0x0D),
    "R": (0x1E, 0x11, 0x11, 0x1E, 0x14, 0x12, 0x11),
    "S": (0x0F, 0x10, 0x10, 0x0E, 0x01, 0x01, 0x1E),
    "T": (0x1F, 0x04, 0x04, 0x04, 0x04, 0x04, 0x04),
    "U": (0x11, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "V": (0x11, 0x11, 0x11, 0x11, 0x11, 0x0A, 0x04),
    "W": (0x11, 0x11, 0x11, 0x15, 0x15, 0x1B, 0x11),
    "X": (0x11, 0x11, 0x0A, 0x04, 0x0A, 0x11, 0x11),
    "Y": (0x11, 0x11, 0x0A, 0x04, 0x04, 0x04, 0x04),
    "Z": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x10, 0x1F),
    ".": (0x00, 0x00, 0x00, 0x00, 0x00, 0x0C, 0x0C),
    "-": (0x00, 0x00, 0x00, 0x1F, 0x00, 0x00, 0x00),
    "+": (0x00, 0x04, 0x04, 0x1F, 0x04, 0x04, 0x00),
    ":": (0x00, 0x0C, 0x0C, 0x00, 0x0C, 0x0C, 0x00),
    "_": (0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x1F),
    "(": (0x02, 0x04, 0x08, 0x08, 0x08, 0x04, 0x02),
    ")": (0x08, 0x04, 0x02, 0x02, 0x02, 0x04, 0x08),
    "=": (0x00, 0x00, 0x1F, 0x00, 0x1F, 0x00, 0x00),
    "/": (0x01, 0x01, 0x02, 0x04, 0x08, 0x10, 0x10),
    " ": (0, 0, 0, 0, 0, 0, 0),
}


def draw_text(img: np.ndarray, x: int, y: int, text, color=(0, 0, 0)) -> np.ndarray:
    """Stamp 5×7 glyphs (uppercased; unknown chars → space) onto an
    RGB array in place; silently clips at the edges."""
    h, w, _ = img.shape
    for ch in str(text).upper():
        g = _FONT.get(ch, _FONT[" "])
        for r in range(7):
            if not (0 <= y + r < h):
                continue
            row = g[r]
            for c in range(5):
                if row & (1 << (4 - c)) and 0 <= x + c < w:
                    img[y + r, x + c] = color
        x += 6
    return img


def text_width(text) -> int:
    return 6 * len(str(text))


def _compose(
    heat: np.ndarray,
    plot_title=None,
    show_axis: bool = False,
    axis_ranges=None,
    legend=None,
    background=(255, 255, 255),
    option: str = "viridis",
    direction: int = 1,
) -> np.ndarray:
    """Assemble the final canvas: optional title band, axis frame +
    index labels, and a legend (continuous color bar with lo/hi
    labels, or categorical swatches) — plotRaster's showLegend /
    plotTitle / showAxis options (R/main.R:791-849)."""
    h, w, _ = heat.shape
    pad = 6
    top = 22 if plot_title is not None else pad
    bottom = 16 if show_axis else pad
    left = 8 + (10 if show_axis else 0)
    legend_w = 0
    if legend is not None:
        kind = legend[0]
        if kind == "continuous":
            legend_w = 24 + max(text_width(f"{v:.4g}") for v in legend[1:3]) + pad
        else:
            legend_w = 24 + max((text_width(lv) for lv, _ in legend[1]), default=0) + pad
    W = left + w + pad + legend_w
    H = top + h + bottom
    canvas = np.full((H, W, 3), background, dtype=np.uint8)
    canvas[top : top + h, left : left + w] = heat
    if plot_title is not None:
        draw_text(canvas, max(pad, (W - text_width(plot_title)) // 2), 7, plot_title)
    if show_axis:
        black = (0, 0, 0)
        canvas[top - 1, left - 1 : left + w + 1] = black
        canvas[top + h, left - 1 : left + w + 1] = black
        canvas[top - 1 : top + h + 1, left - 1] = black
        canvas[top - 1 : top + h + 1, left + w] = black
        if axis_ranges is not None:
            (x0, x1), (y0, y1) = axis_ranges
            draw_text(canvas, left - 1, top + h + 4, f"{x0}")
            xm = f"{x1}"
            draw_text(canvas, left + w - text_width(xm), top + h + 4, xm)
            draw_text(canvas, 1, top + h - 8, f"{y0}")
            draw_text(canvas, 1, top, f"{y1}")
    if legend is not None:
        lx = left + w + pad
        if legend[0] == "continuous":
            lo, hi = legend[1], legend[2]
            bar_h = min(h, 100)
            ramp = colormap(np.linspace(1.0, 0.0, bar_h), option, direction)
            canvas[top : top + bar_h, lx : lx + 12] = ramp[:, None, :]
            draw_text(canvas, lx + 16, top, f"{hi:.4g}")
            draw_text(canvas, lx + 16, top + bar_h - 7, f"{lo:.4g}")
        else:
            y = top
            for lv, rgb in legend[1]:
                canvas[y : y + 8, lx : lx + 8] = rgb
                draw_text(canvas, lx + 12, y, lv)
                y += 12
                if y + 8 > H:
                    break
    return canvas


def plot_raster(
    pixel_df,
    path: str,
    feature_name: str = "sum",
    value_prefix: str = "sum_",
    max_px: int = 800,
    background=(255, 255, 255),
    log_scale: bool = False,
    plot_title=None,
    show_legend: bool = False,
    show_axis: bool = False,
    option: str = "viridis",
    direction: int = 1,
    limits=None,
    na_color=(127, 127, 127),
):
    """Render a pixel table (pandas DataFrame with ix, iy and value
    columns) to a PNG heatmap.

    ``feature_name``: "sum" / "mean" reduce across all ``value_prefix``
    columns (R/main.R:806-808 colSums/colMeans analog); any other name
    plots that exact column.  ``plot_title`` / ``show_legend`` /
    ``show_axis`` mirror plotTitle / showLegend / showAxis
    (R/main.R:791-849).  ``option`` / ``direction`` / ``limits`` /
    ``na_color`` mirror the scale_fill_viridis_c(...) pass-through
    (R/main.R:819): limits fix the fill scale's range and — like
    ggplot's default oob censor — values OUTSIDE them render as
    ``na_color`` (as do NaNs).  Returns (path, width, height).
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
    if limits is not None:
        lo_lim, hi_lim = float(limits[0]), float(limits[1])
        if not hi_lim > lo_lim:
            raise ValueError("limits must be (lo, hi) with hi > lo")
        v = np.where((v < lo_lim) | (v > hi_lim), np.nan, v)
    finite = v[np.isfinite(v)]
    # legend labels carry the SCALE range: explicit limits if given,
    # else the data range — even under log_scale (the log transform
    # shapes the colors, not what the reader is told)
    if show_legend:
        if limits is not None:
            legend = ("continuous", lo_lim, hi_lim)
        elif len(finite):
            legend = ("continuous", float(finite.min()), float(finite.max()))
        else:  # all-NaN / fully censored column: NA-only render
            legend = ("continuous", 0.0, 0.0)
    else:
        legend = None
    if log_scale:  # heavy-tailed fills (hot tiles) wash out linearly
        v = np.log1p(np.maximum(v, 0.0))
        if limits is not None:
            lo_lim, hi_lim = np.log1p(max(lo_lim, 0.0)), np.log1p(max(hi_lim, 0.0))
    norm_limits = (lo_lim, hi_lim) if limits is not None else None
    axis_ranges = ((int(ix.min()), int(ix.max())), (int(iy.min()), int(iy.max())))
    return _paint(
        ix, iy, values=v, path=path, max_px=max_px, background=background,
        plot_title=plot_title, show_axis=show_axis, axis_ranges=axis_ranges,
        legend=legend, option=option, direction=direction,
        norm_limits=norm_limits, na_color=na_color,
    )


def plot_raster_categorical(
    pixel_df,
    path: str,
    cat_col: str,
    factor_levels=None,
    max_px: int = 800,
    background=(255, 255, 255),
    plot_title=None,
    show_legend: bool = False,
    show_axis: bool = False,
    option: str = "viridis",
    direction: int = 1,
):
    """Categorical fill (reference ``factor_levels`` + viridis_d,
    R/main.R:820-828): one row per cell with a label column; each
    level gets an evenly-spaced viridis color.  ``factor_levels``
    also fixes the legend order.  ``option`` / ``direction`` mirror
    scale_fill_viridis_d's pass-through knobs (R/main.R:827).
    Returns (path, width, height, {level: rgb})."""
    levels = list(factor_levels) if factor_levels else sorted(set(pixel_df[cat_col]))
    lut = {
        lv: tuple(int(c) for c in colormap(
            np.array([k / max(1, len(levels) - 1)]), option, direction)[0])
        for k, lv in enumerate(levels)
    }
    codes = pixel_df[cat_col].map({lv: k for k, lv in enumerate(levels)}).to_numpy()
    codes = np.asarray(codes, dtype=np.float64)
    # a category absent from factor_levels maps to NaN: the
    # prenormalized _paint branch passes values straight to colormap,
    # where floor(NaN).astype(int) is INT64_MIN (IndexError) — keep
    # NaN for the NA-color mask but clamp the color-table index path
    norm = codes / max(1, len(levels) - 1)
    ixv, iyv = pixel_df["ix"].to_numpy(), pixel_df["iy"].to_numpy()
    legend = ("categorical", [(lv, lut[lv]) for lv in levels]) if show_legend else None
    axis_ranges = ((int(ixv.min()), int(ixv.max())), (int(iyv.min()), int(iyv.max())))
    path, w, h = _paint(
        ixv,
        iyv,
        values=norm,
        path=path,
        max_px=max_px,
        background=background,
        prenormalized=True,
        plot_title=plot_title,
        show_axis=show_axis,
        axis_ranges=axis_ranges,
        legend=legend,
        option=option,
        direction=direction,
    )
    return path, w, h, lut


def _paint(ix, iy, values, path, max_px, background, prenormalized=False,
           plot_title=None, show_axis=False, axis_ranges=None, legend=None,
           option="viridis", direction=1, norm_limits=None,
           na_color=(127, 127, 127)):
    nx = int(ix.max() - ix.min()) + 1
    ny = int(iy.max() - iy.min()) + 1
    scale = max(1, int(np.ceil(max(nx, ny) / max_px)))
    # value → color (normalized to the fill scale: explicit limits when
    # given, else the finite data range); NaN / censored rows → na_color
    values = np.asarray(values, dtype=np.float64)
    na_mask = ~np.isfinite(values)
    if prenormalized:
        # neutralize NaN BEFORE colormap (floor(NaN).astype(int) is
        # INT64_MIN -> IndexError); the na_mask override below paints
        # these cells the NA color, matching the reference's na.value
        norm = np.where(na_mask, 0.0, values)
    else:
        finite = values[~na_mask]
        if norm_limits is not None:
            lo, hi = norm_limits
        elif len(finite):
            lo, hi = float(finite.min()), float(finite.max())
        else:
            lo, hi = 0.0, 0.0
        norm = (
            (np.where(na_mask, 0.0, values) - lo) / (hi - lo)
            if hi > lo else np.full(len(values), 0.5)
        )
    rgb_vals = colormap(norm, option, direction)
    if na_mask.any():
        rgb_vals[na_mask] = np.asarray(na_color, dtype=np.uint8)

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
    if plot_title is not None or show_axis or legend is not None:
        img = _compose(
            np.ascontiguousarray(img), plot_title=plot_title, show_axis=show_axis,
            axis_ranges=axis_ranges, legend=legend, background=background,
            option=option, direction=direction,
        )
    write_png(path, np.ascontiguousarray(img))
    return path, img.shape[1], img.shape[0]
