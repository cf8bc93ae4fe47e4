"""Multimodal decode: real BMP/PPM header parsing + deterministic
fallback, and the Ray-side stage plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from rayraster.multimodal import (
    FrameSampleStage,
    ImageDecodeStage,
    ResizeStage,
    decode_image_header,
    make_bmp,
)


def test_bmp_roundtrip():
    for w, h in [(1, 1), (13, 7), (640, 480)]:
        assert decode_image_header(make_bmp(w, h)) == (w, h, 3)


def test_bmp_topdown_and_invalid():
    # negative height = top-down BMP; dims still abs
    import struct

    p = bytearray(make_bmp(5, 4))
    struct.pack_into("<i", p, 22, -4)
    assert decode_image_header(bytes(p)) == (5, 4, 3)
    # wrong bpp → rejected
    struct.pack_into("<H", p, 28, 13)
    assert decode_image_header(bytes(p)) is None


def test_ppm_header():
    assert decode_image_header(b"P6\n# a comment\n320 240\n255\n" + b"\x00" * 10) == (
        320,
        240,
        3,
    )
    assert decode_image_header(b"P6 2 3 255 " + b"\x00" * 18) == (2, 3, 3)


def test_garbage_falls_back_to_fake():
    assert decode_image_header(b"hello world") is None
    assert decode_image_header(b"") is None
    assert decode_image_header(b"BMxx") is None  # too short for a header


def test_decode_stage_mixed_payloads(ray_session):
    rows = [
        {"doc_id": 0, "payload": make_bmp(9, 5)},
        {"doc_id": 1, "payload": b"just bytes"},
        {"doc_id": 2, "payload": b"P6 4 6 255 " + b"\x00" * 72},
    ]
    out = (
        rd.from_pandas(pd.DataFrame(rows))
        .map_batches(ImageDecodeStage(bin_col="payload"), batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out.width.tolist() == [9, 64 + 10 % 960, 4]
    assert out.height.tolist() == [5, 64 + 70 % 960, 6]
    assert out.channels.tolist() == [3, 3, 3]


def test_resize_and_frame_sample(ray_session):
    rows = [{"doc_id": i, "payload": bytes(range(i + 1)) * 40} for i in range(8)]
    ds = rd.from_pandas(pd.DataFrame(rows)).map_batches(
        ImageDecodeStage(bin_col="payload"), batch_format="pyarrow"
    )
    resized = ds.map_batches(ResizeStage(max_side=32), batch_format="pyarrow").to_pandas()
    assert (resized[["width", "height"]].max(axis=1) <= 32).all()
    frames = (
        rd.from_pandas(pd.DataFrame(rows))
        .map_batches(FrameSampleStage(bin_col="payload", stride=10), batch_format="pyarrow")
        .to_pandas()
    )
    assert (frames.frame_idx % 10 == 0).all() and len(frames) >= len(rows)
