"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with metadata;
decode / feature-extract / resize / frame-sample are actor-pool
map_batches stages.  The sandbox has no image/audio libraries, so the
decode kernels are STUBBED behind an import-try with a deterministic
fake (as the task brief directs) — the Ray-side plumbing (schema,
batch sizing, actor signature, output layout) is real and tested.

Scale note: binary payloads dominate block size — these stages should
run with small ``batch_size`` (e.g. 256) and ``num_cpus=1`` actors so
a batch × concurrency of decoded frames fits worker heaps.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

try:  # real decoder if ever present (not in this container)
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


class ImageDecodeStage:
    """binary payload → (width, height, channels) metadata + optional
    tiny feature vector.  Deterministic fake when PIL is absent:
    dimensions derived from payload length, features from byte stats.
    """

    def __init__(self, bin_col: str = "payload", with_features: bool = False):
        self.bin_col = bin_col
        self.with_features = with_features
        if _HAVE_PIL:
            raise NotImplementedError(
                "real image decode not wired in this sandbox build; "
                "the deterministic fake is the tested path"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.bin_col].to_pylist()
        n = len(payloads)
        width = np.empty(n, dtype=np.int64)
        height = np.empty(n, dtype=np.int64)
        feats = np.zeros((n, 8), dtype=np.float64) if self.with_features else None
        for i, p in enumerate(payloads):
            nb = len(p)
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
        batch = batch.append_column(
            "channels", pa.array(np.full(n, 3, dtype=np.int64))
        )
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
