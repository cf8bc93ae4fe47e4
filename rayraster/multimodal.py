"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with metadata;
decode / feature-extract / resize / frame-sample are actor-pool
map_batches stages.  The decode kernel is REAL for BMP and binary PPM
payloads (from-scratch stdlib header parsers — the sandbox has no
image libraries); any other byte pattern falls back to a clearly
deterministic fake so the plumbing stays exercised on arbitrary
binaries (as the task brief directs).

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


def decode_image_header(p: bytes):
    """(width, height, channels) from a BMP or binary-PPM payload, or
    None if the bytes are neither.  Pure stdlib; never raises."""
    try:
        if len(p) >= 54 and p[:2] == b"BM":
            (hdr_size,) = struct.unpack_from("<I", p, 14)
            if hdr_size < 40:
                return None  # ancient BITMAPCOREHEADER — not supported
            w, h = struct.unpack_from("<ii", p, 18)
            (bpp,) = struct.unpack_from("<H", p, 28)
            if w <= 0 or h == 0 or bpp not in (8, 24, 32):
                return None
            return int(w), abs(int(h)), bpp // 8
        if p[:2] == b"P6":
            # header: P6 <ws> width <ws> height <ws> maxval, '#' comments
            vals, i, tok = [], 2, b""
            while len(vals) < 3 and i < min(len(p), 256):
                c = p[i : i + 1]
                if c == b"#":
                    while i < len(p) and p[i : i + 1] != b"\n":
                        i += 1
                elif c.isdigit():
                    tok += c
                elif tok:
                    vals.append(int(tok))
                    tok = b""
                i += 1
            if len(vals) >= 2 and vals[0] > 0 and vals[1] > 0:
                return vals[0], vals[1], 3
        return None
    except (struct.error, ValueError):
        return None


class ImageDecodeStage:
    """binary payload → (width, height, channels) metadata + optional
    tiny feature vector.  BMP / binary-PPM headers are parsed for
    real; unrecognized payloads get the deterministic fake (dimensions
    derived from payload length) so arbitrary binaries still flow."""

    def __init__(self, bin_col: str = "payload", with_features: bool = False):
        self.bin_col = bin_col
        self.with_features = with_features

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.bin_col].to_pylist()
        n = len(payloads)
        width = np.empty(n, dtype=np.int64)
        height = np.empty(n, dtype=np.int64)
        channels = np.full(n, 3, dtype=np.int64)
        feats = np.zeros((n, 8), dtype=np.float64) if self.with_features else None
        for i, p in enumerate(payloads):
            nb = len(p)
            real = decode_image_header(p)
            if real is not None:
                width[i], height[i], channels[i] = real
            else:
                width[i] = 64 + nb % 960
                height[i] = 64 + (nb * 7) % 960
            if self.with_features and nb:
                arr = np.frombuffer(p, dtype=np.uint8)
                feats[i, :] = [
                    arr.mean(), arr.std(), arr.min(), arr.max(),
                    float(arr[0]), float(arr[-1]), nb % 251, nb,
                ]
        batch = batch.append_column("width", pa.array(width))
        batch = batch.append_column("height", pa.array(height))
        batch = batch.append_column("channels", pa.array(channels))
        if self.with_features:
            batch = batch.append_column(
                "img_feat", pa.array(list(feats), type=pa.list_(pa.float64()))
            )
        return batch


class ResizeStage:
    """Stub resize: rewrites metadata to the target box preserving
    aspect (the real kernel would transform the payload)."""

    def __init__(self, max_side: int = 256):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch["width"].to_numpy(zero_copy_only=False).astype(np.float64)
        h = batch["height"].to_numpy(zero_copy_only=False).astype(np.float64)
        scale = np.minimum(1.0, self.max_side / np.maximum(w, h))
        batch = batch.set_column(
            batch.schema.get_field_index("width"),
            "width",
            pa.array((w * scale).astype(np.int64)),
        )
        return batch.set_column(
            batch.schema.get_field_index("height"),
            "height",
            pa.array((h * scale).astype(np.int64)),
        )


class FrameSampleStage:
    """Stub video frame sampler: emits one row per sampled frame index
    (every ``stride``-th of ``n_frames`` derived from payload length).
    Demonstrates the row-expansion layout for video pipelines."""

    def __init__(self, bin_col: str = "payload", stride: int = 10):
        self.bin_col = bin_col
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.bin_col].to_pylist()
        n_frames = np.array([1 + len(p) % 100 for p in payloads], dtype=np.int64)
        counts = (n_frames + self.stride - 1) // self.stride
        rows = np.repeat(np.arange(len(payloads)), counts)
        frame_idx = np.concatenate(
            [np.arange(0, nf, self.stride, dtype=np.int64) for nf in n_frames]
        )
        out = batch.drop_columns([self.bin_col]).take(pa.array(rows))
        return out.append_column("frame_idx", pa.array(frame_idx))
