"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with metadata;
decode / feature-extract / resize / frame-sample are actor-pool
map_batches stages.  The kernels are REAL for BMP and binary-PPM
payloads — from-scratch stdlib/numpy parsers and pixel transforms
(the sandbox has no image libraries):

* :func:`decode_image_pixels` — 24-bit BMP (bottom-up or top-down,
  uncompressed), binary PPM (``P6``), and QOI (spec-complete
  :func:`encode_qoi`/:func:`decode_qoi`, all six chunk ops) → an
  (H, W, 3) uint8 RGB array
* :class:`ResizeStage` — exact area-average (box-filter) downscale on
  decoded pixels via an integral image, re-encoded to BMP
* :class:`FrameSampleStage` — PPM *stream* payloads (concatenated P6
  frames, the ``ffmpeg image2pipe`` wire format) → one row per
  sampled frame

Any other byte pattern falls back to a clearly deterministic fake so
the plumbing stays exercised on arbitrary binaries (as the task brief
directs).

Scale note: binary payloads dominate block size — these stages should
run with small ``batch_size`` (e.g. 256) and ``num_cpus=1`` actors so
a batch × concurrency of decoded frames fits worker heaps.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa


def make_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """Minimal valid 24-bit bottom-up BMP (BITMAPINFOHEADER), with
    deterministic pixel bytes — the test/bench payload generator."""
    row = (width * 3 + 3) & ~3  # rows padded to 4 bytes
    img_size = row * height
    header = b"BM" + struct.pack("<IHHI", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    px = bytes((seed + k * 37) % 256 for k in range(img_size))
    return header + info + px


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB array → 24-bit bottom-up BMP bytes (the
    inverse of :func:`decode_image_pixels` for BMP payloads)."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError(f"encode_bmp needs (H, W, 3), got {img.shape}")
    stride = (w * 3 + 3) & ~3
    img_size = stride * h
    header = b"BM" + struct.pack("<IHHI", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    return header + info + rows.tobytes()


def _parse_bmp(p: bytes):
    """(width, height, bpp, data_offset, stride, topdown) for a
    PLAUSIBLE uncompressed BITMAPINFOHEADER BMP, else None.

    Plausibility (beyond the magic): sane data offset and the payload
    actually containing the full pixel array — random binaries that
    merely start with 'BM' must not parse (they would silently diverge
    from the deterministic-fake formula and its SQL oracle twin)."""
    if len(p) < 54 or p[:2] != b"BM":
        return None
    (data_off,) = struct.unpack_from("<I", p, 10)
    (hdr_size,) = struct.unpack_from("<I", p, 14)
    if hdr_size < 40:
        return None  # ancient BITMAPCOREHEADER — not supported
    w, h = struct.unpack_from("<ii", p, 18)
    (bpp,) = struct.unpack_from("<H", p, 28)
    (compression,) = struct.unpack_from("<I", p, 30)
    if w <= 0 or h == 0 or bpp not in (8, 24, 32) or compression != 0:
        return None
    if not (54 <= data_off <= len(p)):
        return None
    stride = (w * (bpp // 8) + 3) & ~3
    if data_off + stride * abs(h) > len(p):
        return None  # declared pixel array doesn't fit the payload
    return int(w), abs(int(h)), int(bpp), int(data_off), int(stride), h < 0


def _parse_ppm(p: bytes, start: int = 0):
    """(width, height, maxval, data_start) for a plausible binary PPM
    at ``start``, else None.  Requires whitespace right after 'P6'
    (any text starting with 'P6' followed by digits must not parse)
    and the full ``3*w*h`` pixel bytes to be present."""
    if p[start : start + 2] != b"P6":
        return None
    i = start + 2
    if i >= len(p) or not p[i : i + 1].isspace():
        return None
    vals = []
    limit = min(len(p), start + 256)
    while len(vals) < 3 and i < limit:
        c = p[i : i + 1]
        if c == b"#":
            while i < limit and p[i : i + 1] != b"\n":
                i += 1
            i += 1
            continue
        if c.isspace():
            i += 1
            continue
        if not c.isdigit():
            return None
        tok = b""
        while i < limit and p[i : i + 1].isdigit():
            tok += p[i : i + 1]
            i += 1
            if len(tok) > 7:
                # dims/maxval are never 8+ digits; a longer run is a
                # binary false positive (and int() of a huge digit run
                # would raise — this parser must never raise)
                return None
        vals.append(int(tok))
    if len(vals) < 3 or i >= len(p) or not p[i : i + 1].isspace():
        return None
    w, h, maxval = vals
    data = i + 1  # exactly one whitespace byte after maxval
    if w <= 0 or h <= 0 or not (0 < maxval < 65536):
        return None
    if data + 3 * w * h > len(p):
        return None
    return w, h, maxval, data


def decode_image_header(p: bytes):
    """(width, height, channels) from a plausible BMP or binary-PPM
    payload, or None.  Pure stdlib; never raises."""
    try:
        bmp = _parse_bmp(p)
        if bmp is not None:
            w, h, bpp, *_ = bmp
            return w, h, bpp // 8
        ppm = _parse_ppm(p)
        if ppm is not None:
            return ppm[0], ppm[1], 3
        qoi = _parse_qoi_header(p)
        if qoi is not None:
            return qoi
        return None
    except (struct.error, ValueError):
        return None


def decode_image_pixels(p: bytes) -> np.ndarray | None:
    """REAL pixel decode: (H, W, 3) uint8 RGB for a 24-bit BMP or an
    8-bit binary PPM payload, else None.  Pure numpy — no image libs."""
    try:
        bmp = _parse_bmp(p)
        if bmp is not None:
            w, h, bpp, off, stride, topdown = bmp
            if bpp != 24:
                return None  # pixel kernel covers the 24-bit common case
            rows = np.frombuffer(p, dtype=np.uint8, count=stride * h, offset=off)
            rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
            if not topdown:
                rows = rows[::-1]  # bottom-up file order → top-down array
            return np.ascontiguousarray(rows[:, :, ::-1])  # BGR → RGB
        ppm = _parse_ppm(p)
        if ppm is not None:
            w, h, maxval, data = ppm
            if maxval > 255:
                return None  # 16-bit samples out of scope
            return (
                np.frombuffer(p, dtype=np.uint8, count=3 * w * h, offset=data)
                .reshape(h, w, 3)
                .copy()
            )
        if _parse_qoi_header(p) is not None:
            return decode_qoi(p)
        return None
    except (struct.error, ValueError):
        return None


class ImageDecodeStage:
    """binary payload → (width, height, channels) metadata + optional
    tiny feature vector / pixel statistics.  BMP / binary-PPM payloads
    are decoded for real; unrecognized payloads get the deterministic
    fake (dimensions and stats derived from payload length) so
    arbitrary binaries still flow.

    ``with_pixel_stats`` adds ``px_mean`` — the mean decoded pixel
    value, computed from an EXACT int64 sum so the float is
    bit-reproducible against a SQL oracle; fake path:
    ``float((len(payload) * 37) % 256)``; NULL when the header parses
    but the pixel kernel doesn't cover the variant (8/32-bit BMP,
    16-bit PPM)."""

    def __init__(self, bin_col: str = "payload", with_features: bool = False,
                 with_pixel_stats: bool = False, with_histogram: bool = False):
        self.bin_col = bin_col
        self.with_features = with_features
        self.with_pixel_stats = with_pixel_stats
        # with_histogram: 64-bin (value // 4) pixel-value histogram,
        # surfaced as two exact-int64 scalars so the driver's flat
        # hash compare covers the whole multiset: px_mode_bin (argmax
        # bin, ties -> lowest) and hist_l2 (sum of squared counts).
        # Fake path: (-1, 0); real header with uncovered pixel
        # variant: NULLs (same contract as px_mean).
        self.with_histogram = with_histogram

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.bin_col].to_pylist()
        n = len(payloads)
        width = np.empty(n, dtype=np.int64)
        height = np.empty(n, dtype=np.int64)
        channels = np.full(n, 3, dtype=np.int64)
        feats = np.zeros((n, 8), dtype=np.float64) if self.with_features else None
        px_mean: list[float | None] | None = [] if self.with_pixel_stats else None
        mode_bin: list[int | None] | None = [] if self.with_histogram else None
        hist_l2: list[int | None] | None = [] if self.with_histogram else None
        for i, p in enumerate(payloads):
            p = p if p is not None else b""  # null payload ≡ empty
            nb = len(p)
            real = decode_image_header(p)
            if real is not None:
                width[i], height[i], channels[i] = real
            else:
                width[i] = 64 + nb % 960
                height[i] = 64 + (nb * 7) % 960
            px = (
                decode_image_pixels(p)
                if real is not None and (self.with_pixel_stats or self.with_histogram)
                else None
            )  # decoded ONCE, shared by stats and histogram
            if self.with_pixel_stats:
                if real is not None:
                    # exact integer sum → one double division; a
                    # header-decodable payload whose PIXELS the kernel
                    # doesn't cover (8/32-bit BMP, 16-bit PPM) gets an
                    # honest NULL — never the fake formula beside real
                    # dimensions
                    px_mean.append(
                        int(px.astype(np.int64).sum()) / px.size
                        if px is not None else None
                    )
                else:
                    px_mean.append(float((nb * 37) % 256))
            if self.with_histogram:
                if real is not None and px is None:
                    mode_bin.append(None)
                    hist_l2.append(None)
                elif px is None:
                    mode_bin.append(-1)
                    hist_l2.append(0)
                else:
                    h64 = np.bincount(px.reshape(-1) >> 2, minlength=64)
                    mode_bin.append(int(np.argmax(h64)))  # first max = lowest bin
                    hist_l2.append(int((h64.astype(np.int64) ** 2).sum()))
            if self.with_features and nb:
                arr = np.frombuffer(p, dtype=np.uint8)
                feats[i, :] = [
                    arr.mean(), arr.std(), arr.min(), arr.max(),
                    float(arr[0]), float(arr[-1]), nb % 251, nb,
                ]
        batch = batch.append_column("width", pa.array(width))
        batch = batch.append_column("height", pa.array(height))
        batch = batch.append_column("channels", pa.array(channels))
        if self.with_pixel_stats:
            batch = batch.append_column(
                "px_mean", pa.array(px_mean, type=pa.float64())
            )
        if self.with_histogram:
            batch = batch.append_column(
                "px_mode_bin", pa.array(mode_bin, type=pa.int64())
            )
            batch = batch.append_column(
                "hist_l2", pa.array(hist_l2, type=pa.int64())
            )
        if self.with_features:
            batch = batch.append_column(
                "img_feat", pa.array(list(feats), type=pa.list_(pa.float64()))
            )
        return batch


def resize_box(img: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Exact area-average (box-filter) resample of an (H, W, C) uint8
    array to (new_h, new_w, C).

    Each output pixel is the EXACT mean of its fractional source box:
    the integral image is piecewise bilinear, so bilinear sampling of
    it at fractional box edges gives exact box integrals — fully
    vectorized, no per-pixel Python."""
    h, w, c = img.shape
    # integral image with a zero top row / left column: S[y, x] = sum
    # of img[:y, :x]
    S = np.zeros((h + 1, w + 1, c), dtype=np.float64)
    S[1:, 1:] = img.astype(np.float64).cumsum(axis=0).cumsum(axis=1)

    ys = np.linspace(0.0, float(h), new_h + 1)
    xs = np.linspace(0.0, float(w), new_w + 1)

    def integral_at(yy: np.ndarray, xx: np.ndarray) -> np.ndarray:
        yi = np.clip(np.floor(yy).astype(np.int64), 0, h - 1) if h > 0 else np.zeros_like(yy, int)
        xi = np.clip(np.floor(xx).astype(np.int64), 0, w - 1) if w > 0 else np.zeros_like(xx, int)
        fy = (yy - yi)[:, None, None]
        fx = (xx - xi)[None, :, None]
        S00 = S[yi][:, xi]
        S01 = S[yi][:, xi + 1]
        S10 = S[yi + 1][:, xi]
        S11 = S[yi + 1][:, xi + 1]
        return (
            S00 * (1 - fy) * (1 - fx) + S01 * (1 - fy) * fx
            + S10 * fy * (1 - fx) + S11 * fy * fx
        )

    G = integral_at(ys, xs)  # (new_h+1, new_w+1, c)
    box = G[1:, 1:] - G[:-1, 1:] - G[1:, :-1] + G[:-1, :-1]
    area = (ys[1:] - ys[:-1])[:, None, None] * (xs[1:] - xs[:-1])[None, :, None]
    out = box / area
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


class ResizeStage:
    """REAL resize: decode the payload, box-filter downscale so the
    longest side is ≤ ``max_side`` (aspect preserved, never upscales),
    re-encode as BMP, and update the metadata columns.  Payloads that
    don't decode keep their bytes and get the metadata-only rewrite
    (the plumbing-stays-exercised fallback for arbitrary binaries)."""

    def __init__(self, max_side: int = 256, bin_col: str = "payload"):
        self.max_side = max_side
        self.bin_col = bin_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.bin_col].to_pylist()
        w = batch["width"].to_numpy(zero_copy_only=False).astype(np.int64).copy()
        h = batch["height"].to_numpy(zero_copy_only=False).astype(np.int64).copy()
        out_payloads = []
        for i, p in enumerate(payloads):
            px = decode_image_pixels(p) if p is not None else None
            if px is None:
                # metadata-only fallback (aspect-preserving box fit)
                scale = min(1.0, self.max_side / max(float(w[i]), float(h[i]), 1.0))
                w[i] = int(w[i] * scale)
                h[i] = int(h[i] * scale)
                out_payloads.append(p)
                continue
            ih, iw = px.shape[:2]
            scale = min(1.0, self.max_side / max(iw, ih))
            nw = max(1, int(round(iw * scale)))
            nh = max(1, int(round(ih * scale)))
            if (nw, nh) != (iw, ih):
                px = resize_box(px, nw, nh)
            w[i], h[i] = nw, nh
            out_payloads.append(encode_bmp(px))
        batch = batch.set_column(
            batch.schema.get_field_index(self.bin_col),
            self.bin_col, pa.array(out_payloads, type=pa.binary()),
        )
        batch = batch.set_column(
            batch.schema.get_field_index("width"), "width", pa.array(w)
        )
        return batch.set_column(
            batch.schema.get_field_index("height"), "height", pa.array(h)
        )


def _ppm_stream_frames(p: bytes) -> list[tuple[int, int, int, int]]:
    """Offsets/dims of consecutive P6 frames in a PPM-stream payload
    (the ``ffmpeg image2pipe -vcodec ppm`` wire format): list of
    (data_offset, width, height, bytes_per_sample).  16-bit frames
    (maxval > 255) occupy ``6*w*h`` bytes — the tiling walk must
    account for that or it would land mid-pixel-data and misparse.
    Empty if the payload isn't a PPM stream."""
    frames = []
    pos = 0
    while pos < len(p):
        hdr = _parse_ppm(p, pos)
        if hdr is None:
            break
        w, h, maxval, data = hdr
        bps = 2 if maxval > 255 else 1
        if data + 3 * w * h * bps > len(p):
            break  # _parse_ppm checked 1-byte samples; recheck for 2
        frames.append((data, w, h, bps))
        pos = data + 3 * w * h * bps
    # only a real stream if the frames tile the payload exactly
    return frames if frames and pos == len(p) else []


class FrameSampleStage:
    """Video frame sampler: REAL for PPM-stream payloads (concatenated
    binary-PPM frames — every ``stride``-th frame is decoded and
    emitted as one row with its dims and mean pixel value); other
    payloads fall back to the deterministic fake frame count derived
    from payload length.  Demonstrates the row-expansion layout for
    video pipelines."""

    def __init__(self, bin_col: str = "payload", stride: int = 10):
        self.bin_col = bin_col
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.bin_col].to_pylist()
        take_rows: list[int] = []
        frame_idx: list[int] = []
        fw: list[int] = []
        fh: list[int] = []
        fmean: list[float] = []
        for i, p in enumerate(payloads):
            p = p if p is not None else b""  # null payload ≡ empty
            frames = _ppm_stream_frames(p)
            if frames:
                for j in range(0, len(frames), self.stride):
                    off, w, h, bps = frames[j]
                    # PPM 16-bit samples are big-endian (netpbm spec)
                    dt = np.dtype(">u2") if bps == 2 else np.dtype(np.uint8)
                    px = np.frombuffer(p, dtype=dt, count=3 * w * h, offset=off)
                    take_rows.append(i)
                    frame_idx.append(j)
                    fw.append(w)
                    fh.append(h)
                    fmean.append(int(px.astype(np.int64).sum()) / px.size)
            else:
                nf = 1 + len(p) % 100  # deterministic fake frame count
                for j in range(0, nf, self.stride):
                    take_rows.append(i)
                    frame_idx.append(j)
                    fw.append(0)
                    fh.append(0)
                    fmean.append(float((len(p) * 37) % 256))
        out = batch.drop_columns([self.bin_col]).take(pa.array(take_rows, type=pa.int64()))
        out = out.append_column("frame_idx", pa.array(frame_idx, type=pa.int64()))
        out = out.append_column("frame_w", pa.array(fw, type=pa.int64()))
        out = out.append_column("frame_h", pa.array(fh, type=pa.int64()))
        return out.append_column("frame_mean", pa.array(fmean, type=pa.float64()))


# ---------------------------------------------------------------------------
# perceptual hashing (image near-dup front end)
# ---------------------------------------------------------------------------


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash: exact box-resize to 9×8, integer
    grayscale (R+G+B channel sum per cell), bit = cell brighter than
    its left neighbor.  Robust to uniform brightness/scale changes —
    the standard perceptual-hash trade (vs byte hashing, which a
    single re-encode defeats).  Deterministic pure numpy."""
    small = resize_box(img, 9, 8).astype(np.int64).sum(axis=2)  # (8, 9)
    bits = (small[:, 1:] > small[:, :-1]).reshape(-1)
    return int(np.packbits(bits).view("<u8")[0])


def ahash64(img: np.ndarray) -> int:
    """64-bit average hash: exact box-resize to 8×8, integer
    grayscale, bit = cell brighter than the 64-cell mean."""
    small = resize_box(img, 8, 8).astype(np.int64).sum(axis=2)  # (8, 8)
    bits = (small > (small.sum() // 64)).reshape(-1)
    return int(np.packbits(bits).view("<u8")[0])


class ImagePHashStage:
    """binary payload → (id, phash) rows: decode (BMP/PPM pixel
    kernels above) + perceptual hash, one row per DECODABLE payload
    (non-images drop out — they have no perceptual identity).  The
    actor-pool front end of image near-dup: feed the output to
    :func:`rayraster.dedup.hamming_neardup_pairs`.  Decode/resize are
    inherently per-payload (images differ in size); everything else is
    vectorized."""

    def __init__(self, bin_col: str = "payload", id_col: str = "doc_id",
                 method: str = "dhash"):
        if method not in ("dhash", "ahash"):
            raise ValueError(f"method must be 'dhash' or 'ahash', got {method!r}")
        self.bin_col = bin_col
        self.id_col = id_col
        self.fn = dhash64 if method == "dhash" else ahash64

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        keep_ids, hashes = [], []
        for i, p in zip(ids, batch[self.bin_col].to_pylist()):
            px = decode_image_pixels(p) if p is not None else None
            if px is None:
                continue
            keep_ids.append(int(i))
            hashes.append(np.int64(np.uint64(self.fn(px))))
        return pa.table(
            {self.id_col: pa.array(keep_ids, type=pa.int64()),
             "phash": pa.array(hashes, type=pa.int64())}
        )


def synth_image(doc_id: int, perturb: bool = False) -> np.ndarray:
    """Deterministic pseudo-random (H, W, 3) test image per id
    (splitmix64-mixed pixels, dims 8–20 × 8–16 varying with the id);
    ``perturb=True`` flips ONE low pixel bit — a near-duplicate every
    perceptual hash must still match (planted ground truth for the
    image near-dup gate) and byte hashing cannot."""
    w = 8 + 4 * (doc_id % 4)
    h = 8 + 2 * (doc_id % 5)
    k = np.arange(h * w * 3, dtype=np.uint64)
    v = (np.uint64(doc_id + 1) * np.uint64(0x9E3779B97F4A7C15)) ^ (
        k * np.uint64(0xBF58476D1CE4E5B9)
    )
    v ^= v >> np.uint64(29)
    v *= np.uint64(0x94D049BB133111EB)
    v ^= v >> np.uint64(32)
    px = (v % np.uint64(256)).astype(np.uint8).reshape(h, w, 3)
    if perturb:
        px = px.copy()
        px[0, 0, 0] ^= 1
    return px


# ---------------------------------------------------------------------------
# audio: RIFF/WAVE PCM16 — real from-scratch codec + feature stage
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int = 8000, channels: int = 1) -> bytes:
    """Minimal RIFF/WAVE writer: 16-bit PCM, interleaved.  ``samples``
    is int16 (total values, i.e. frames × channels)."""
    s = np.ascontiguousarray(np.asarray(samples, dtype=np.int16))
    data = s.tobytes()
    block = 2 * channels
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * block, block, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(p: bytes):
    """Real RIFF chunk-walk parser for 16-bit PCM WAVE payloads:
    returns ``(rate, channels, int16 sample array)`` or ``None`` when
    the payload is not a PCM16 WAV this kernel covers (wrong magic,
    compressed codec, other bit depths) — the same
    plausibility-checked-magic contract as the image decoders (no
    false positives on text)."""
    if len(p) < 44 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return None
    pos = 12
    rate = channels = bits = None
    data = None
    while pos + 8 <= len(p):
        cid = p[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", p, pos + 4)
        body = p[pos + 8: pos + 8 + clen]
        if cid == b"fmt " and clen >= 16:
            if len(body) < 16:  # declared length beyond the payload
                return None
            codec, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if codec != 1:  # PCM only
                return None
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or data is None or bits != 16 or not channels:
        return None
    n = len(data) // 2
    if n == 0:
        return None
    return int(rate), int(channels), np.frombuffer(data[: 2 * n], dtype="<i2")


class AudioFeatureStage:
    """binary payload → per-clip audio features from a REAL PCM16 WAV
    decode (``decode_wav``); non-WAV payloads emit ``valid=false`` with
    zeroed features so arbitrary binaries still flow (filter on
    ``valid`` for the decoded slice).

    Features (all exact-integer folds, so every value is bit-exact
    against a SQL twin over the same planted samples):

    * ``sample_rate`` / ``n_samples`` / ``n_channels``
    * ``amp_mean`` — exact int64 sample sum ÷ n (one IEEE division)
    * ``amp_max`` — max |sample| as double
    * ``zero_crossings`` — count of adjacent pairs with
      ``s[t]·s[t+1] < 0``
    * ``win_energy_max`` — max over non-overlapping ``win``-sample
      windows of the exact int64 sum of squares (the peak-energy
      detector; RMS = sqrt(e/win) downstream if a float is wanted)
    """

    def __init__(self, bin_col: str = "payload", win: int = 16):
        if win < 1:
            raise ValueError(f"AudioFeatureStage: win must be >= 1, got {win}")
        self.bin_col = bin_col
        self.win = win

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.bin_col].to_pylist()
        n = len(payloads)
        valid = np.zeros(n, dtype=bool)
        rate = np.zeros(n, dtype=np.int64)
        nsamp = np.zeros(n, dtype=np.int64)
        nch = np.zeros(n, dtype=np.int64)
        amp_mean = np.zeros(n, dtype=np.float64)
        amp_max = np.zeros(n, dtype=np.float64)
        zc = np.zeros(n, dtype=np.int64)
        wmax = np.zeros(n, dtype=np.int64)
        for i, p in enumerate(payloads):
            dec = decode_wav(p) if p is not None else None
            if dec is None:
                continue
            r, c, s = dec
            s64 = s.astype(np.int64)
            valid[i] = True
            rate[i], nch[i], nsamp[i] = r, c, len(s)
            amp_mean[i] = float(int(s64.sum())) / float(len(s))
            amp_max[i] = float(np.abs(s64).max())
            if len(s) > 1:
                zc[i] = int((s64[1:] * s64[:-1] < 0).sum())
            sq = s64 * s64
            starts = np.arange(0, len(s), self.win)
            wmax[i] = int(np.add.reduceat(sq, starts).max())
        for name, col in (
            ("valid", pa.array(valid)),
            ("sample_rate", pa.array(rate)),
            ("n_samples", pa.array(nsamp)),
            ("n_channels", pa.array(nch)),
            ("amp_mean", pa.array(amp_mean)),
            ("amp_max", pa.array(amp_max)),
            ("zero_crossings", pa.array(zc)),
            ("win_energy_max", pa.array(wmax)),
        ):
            batch = batch.append_column(name, col)
        return batch


# --------------------------------------------------------------------------
# QOI — the "Quite OK Image" format (public spec, qoiformat.org/qoi-specification.pdf)
# --------------------------------------------------------------------------

_QOI_END = b"\x00\x00\x00\x00\x00\x00\x00\x01"


def encode_qoi(img: np.ndarray, channels: int = 3) -> bytes:
    """(H, W, 3|4) uint8 array → QOI bytes — a spec-complete
    from-scratch encoder (all six chunk ops: RGB, RGBA, INDEX, DIFF,
    LUMA, RUN).  Lossless: ``decode_qoi(encode_qoi(img))`` is
    bit-identical.  Per-pixel Python loop — QOI is inherently
    sequential (each chunk depends on the running index/previous
    pixel); the payloads this engine crafts are small, and a
    production deployment would swap in a compiled codec behind the
    same stage signature."""
    h, w, c = img.shape
    if c not in (3, 4) or channels not in (3, 4):
        raise ValueError(f"encode_qoi needs (H, W, 3|4), got {img.shape}")
    out = bytearray(b"qoif")
    out += struct.pack(">IIBB", w, h, channels, 0)
    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa_ = 0, 0, 0, 255
    run = 0
    flat = img.reshape(-1, c)
    for px in flat:
        r, g, b = int(px[0]), int(px[1]), int(px[2])
        a = int(px[3]) if c == 4 else 255
        if (r, g, b, a) == (pr, pg, pb, pa_):
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        ih = (r * 3 + g * 5 + b * 7 + a * 11) % 64
        if index[ih] == (r, g, b, a):
            out.append(ih)
        elif a != pa_:
            out.append(0xFF)
            out += bytes((r, g, b, a))
        else:
            dr = (r - pr + 256) % 256
            dg = (g - pg + 256) % 256
            db = (b - pb + 256) % 256
            dr = dr - 256 if dr > 127 else dr
            dg = dg - 256 if dg > 127 else dg
            db = db - 256 if db > 127 else db
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            elif -32 <= dg <= 31 and -8 <= dr - dg <= 7 and -8 <= db - dg <= 7:
                out.append(0x80 | (dg + 32))
                out.append(((dr - dg + 8) << 4) | (db - dg + 8))
            else:
                out.append(0xFE)
                out += bytes((r, g, b))
        index[ih] = (r, g, b, a)
        pr, pg, pb, pa_ = r, g, b, a
    if run:
        out.append(0xC0 | (run - 1))
    out += _QOI_END
    return bytes(out)


def _parse_qoi_header(p: bytes):
    """(width, height, channels) for a PLAUSIBLE QOI payload, else
    None.  Beyond the magic: sane bounded dims, valid channels /
    colorspace bytes, and the 8-byte end marker — random binaries that
    merely start with 'qoif' must not parse (same contract as
    :func:`_parse_bmp`)."""
    if len(p) < 14 + 8 or p[:4] != b"qoif":
        return None
    w, h, channels, colorspace = struct.unpack_from(">IIBB", p, 4)
    if not (0 < w < 1 << 24 and 0 < h < 1 << 24):
        return None
    if channels not in (3, 4) or colorspace not in (0, 1):
        return None
    if p[-8:] != _QOI_END:
        return None
    return int(w), int(h), int(channels)


def decode_qoi(p: bytes) -> np.ndarray | None:
    """REAL QOI decode: QOI bytes → (H, W, 3) uint8 RGB (alpha
    dropped for 4-channel payloads — ``channels`` in the header is
    informative per the spec; the chunk stream is always RGBA-state).
    Returns None unless the chunk stream decodes to EXACTLY
    width×height pixels and ends at the end marker — a truncated or
    trailing-garbage payload never half-decodes."""
    hd = _parse_qoi_header(p)
    if hd is None:
        return None
    w, h, _channels = hd
    n = w * h
    # a QOI_OP_RUN chunk encodes at most 62 pixels per payload byte,
    # so a stream of len(p)-22 chunk bytes can NEVER produce more —
    # bounding BEFORE np.empty stops a crafted header (2^24 × 2^24
    # dims = a ~1 PB allocation / MemoryError) cold
    if n > 62 * max(len(p) - 22, 0):
        return None
    out = np.empty((n, 4), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    i, k, end = 14, 0, len(p) - 8
    try:
        while k < n:
            if i >= end:
                return None
            byte = p[i]
            i += 1
            if byte == 0xFE:  # QOI_OP_RGB
                r, g, b = p[i], p[i + 1], p[i + 2]
                i += 3
            elif byte == 0xFF:  # QOI_OP_RGBA
                r, g, b, a = p[i], p[i + 1], p[i + 2], p[i + 3]
                i += 4
            else:
                tag = byte >> 6
                if tag == 0:  # QOI_OP_INDEX
                    r, g, b, a = index[byte]
                elif tag == 1:  # QOI_OP_DIFF (bias 2)
                    r = (r + ((byte >> 4) & 3) - 2) % 256
                    g = (g + ((byte >> 2) & 3) - 2) % 256
                    b = (b + (byte & 3) - 2) % 256
                elif tag == 2:  # QOI_OP_LUMA (bias 32 / 8)
                    dg = (byte & 0x3F) - 32
                    b2 = p[i]
                    i += 1
                    r = (r + dg + ((b2 >> 4) & 0xF) - 8) % 256
                    g = (g + dg) % 256
                    b = (b + dg + (b2 & 0xF) - 8) % 256
                else:  # QOI_OP_RUN (bias -1)
                    run = (byte & 0x3F) + 1
                    if k + run > n:
                        return None
                    out[k : k + run] = (r, g, b, a)
                    k += run
                    index[(r * 3 + g * 5 + b * 7 + a * 11) % 64] = (r, g, b, a)
                    continue
            index[(r * 3 + g * 5 + b * 7 + a * 11) % 64] = (r, g, b, a)
            out[k] = (r, g, b, a)
            k += 1
    except IndexError:
        return None  # chunk ran off the end of the stream
    if i != end:
        return None  # trailing bytes before the end marker
    return np.ascontiguousarray(out[:, :3]).reshape(h, w, 3)


class PatchStage:
    """Decoded image → non-overlapping p×p patch rows (the ViT-style
    patchifier: one output row per full patch, ragged edges dropped) —
    the map_batches fan-out that turns an image corpus into a patch
    corpus for embedding/training.

    Per image: REAL decode (BMP/PPM/QOI via
    :func:`decode_image_pixels`), one numpy reshape into
    (rows, p, cols, p, 3) patch blocks, exact int64 per-patch sums.
    Rows: ``(…, patch_row, patch_col, patch_px, patch_sum,
    patch_mean)`` with ``patch_mean`` = one double division of the
    exact sum.  Undecodable payloads contribute no rows (the
    image-stage fallback contract is ImageDecodeStage's job; a
    patchifier must never invent pixels).

    Scale note: output is ~(H·W)/(p²) rows per image — run with small
    ``batch_size`` actors like the other pixel stages."""

    def __init__(self, bin_col: str = "payload", patch: int = 2):
        if patch < 1:
            raise ValueError(f"patch must be >= 1, got {patch}")
        self.bin_col = bin_col
        self.patch = patch

    def __call__(self, batch: pa.Table) -> pa.Table:
        p = self.patch
        carry = [c for c in batch.column_names if c != self.bin_col]
        out_carry: dict[str, list] = {c: [] for c in carry}
        prows: list[int] = []
        pcols: list[int] = []
        psums: list[int] = []
        for i, payload in enumerate(batch[self.bin_col].to_pylist()):
            img = decode_image_pixels(payload) if payload is not None else None
            if img is None:
                continue
            h, w, _ = img.shape
            rows, cols = h // p, w // p
            if rows == 0 or cols == 0:
                continue
            blocks = (
                img[: rows * p, : cols * p]
                .astype(np.int64)
                .reshape(rows, p, cols, p, 3)
                .sum(axis=(1, 3, 4))
            )  # (rows, cols) exact int64 patch sums
            pr, pc_ = np.meshgrid(np.arange(rows), np.arange(cols),
                                  indexing="ij")
            prows.extend(pr.ravel().tolist())
            pcols.extend(pc_.ravel().tolist())
            psums.extend(blocks.ravel().tolist())
            for c in carry:
                out_carry[c].extend([batch[c][i].as_py()] * (rows * cols))
        n_px = p * p * 3
        sums = np.asarray(psums, dtype=np.int64)
        # type carry columns from the input so all-undecodable batches
        # keep the batch schema (pa.array([]) alone would infer null)
        cols_out = {c: pa.array(out_carry[c], type=batch[c].type)
                    for c in carry}
        cols_out["patch_row"] = pa.array(np.asarray(prows, dtype=np.int64))
        cols_out["patch_col"] = pa.array(np.asarray(pcols, dtype=np.int64))
        cols_out["patch_px"] = pa.array(
            np.full(len(sums), n_px, dtype=np.int64))
        cols_out["patch_sum"] = pa.array(sums)
        cols_out["patch_mean"] = pa.array(sums / float(n_px))
        return pa.table(cols_out)
