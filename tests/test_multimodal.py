"""Multimodal decode: real BMP/PPM pixel parsing + deterministic
fallback, box-filter resize, PPM-stream frame sampling, and the
Ray-side stage plumbing."""

import numpy as np
import pandas as pd
import pytest
import pyarrow as pa

import ray.data as rd

from rayraster.multimodal import (
    FrameSampleStage,
    ImageDecodeStage,
    ResizeStage,
    decode_image_header,
    decode_image_pixels,
    encode_bmp,
    make_bmp,
    resize_box,
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
    assert decode_image_header(
        b"P6\n# a comment\n3 2\n255\n" + b"\x00" * 18
    ) == (3, 2, 3)
    assert decode_image_header(b"P6 2 3 255 " + b"\x00" * 18) == (2, 3, 3)


def test_garbage_falls_back_to_fake():
    assert decode_image_header(b"hello world") is None
    assert decode_image_header(b"") is None
    assert decode_image_header(b"BMxx") is None  # too short for a header


def test_implausible_magic_rejected():
    """Advisor item: bytes that merely START like an image must not
    parse — the declared pixel array has to fit the payload and 'P6'
    needs immediate whitespace."""
    # text that happens to start with 'BM' and is ≥54 bytes
    assert decode_image_header(b"BM" + b"lorem ipsum dolor sit amet " * 3) is None
    # truncated BMP: header fine, pixel array missing
    assert decode_image_header(make_bmp(16, 16)[:100]) is None
    # 'P6' glued to digits (no whitespace) — e.g. a part number string
    assert decode_image_header(b"P6123 77 255 " + b"\x00" * 100) is None
    # P6 header whose declared dims exceed the payload
    assert decode_image_header(b"P6 320 240 255 " + b"\x00" * 10) is None


def test_bmp_pixel_decode_exact():
    """decode_image_pixels must invert make_bmp exactly (bottom-up file
    order, BGR, row padding stripped)."""
    w, h = 5, 3  # stride 16 → 1 pad byte per row
    p = make_bmp(w, h, seed=7)
    px = decode_image_pixels(p)
    assert px.shape == (h, w, 3)
    stride = (w * 3 + 3) & ~3
    # reconstruct the expected array from the generator formula
    flat = np.array([(7 + k * 37) % 256 for k in range(stride * h)], dtype=np.uint8)
    rows = flat.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    want = rows[::-1, :, ::-1]  # bottom-up → top-down, BGR → RGB
    assert (px == want).all()


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(7, 10, 3), dtype=np.uint8)
    assert (decode_image_pixels(encode_bmp(img)) == img).all()


def test_ppm_pixel_decode():
    img = np.arange(2 * 4 * 3, dtype=np.uint8).reshape(2, 4, 3)
    p = b"P6\n4 2\n255\n" + img.tobytes()
    assert (decode_image_pixels(p) == img).all()


def test_resize_box_exact_block_mean():
    """Integer 2x downscale = exact 2x2 block means."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(8, 6, 3), dtype=np.uint8)
    out = resize_box(img, 3, 4)
    want = img.astype(np.float64).reshape(4, 2, 3, 2, 3).mean(axis=(1, 3))
    assert (out == np.clip(np.rint(want), 0, 255).astype(np.uint8)).all()


def test_resize_box_mass_conservation_fractional():
    """Any-scale box filter conserves total mass (sum × area scale)."""
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    h, w = 10, 7
    nh, nw = 4, 3
    ys = np.linspace(0.0, h, nh + 1)
    xs = np.linspace(0.0, w, nw + 1)
    # un-rounded means × areas must sum to the image total per channel
    S = np.zeros((h + 1, w + 1, 3))
    S[1:, 1:] = img.astype(np.float64).cumsum(axis=0).cumsum(axis=1)
    total = img.astype(np.float64).sum(axis=(0, 1))
    out = resize_box(img, nw, nh).astype(np.float64)
    area = (ys[1:] - ys[:-1])[:, None, None] * (xs[1:] - xs[:-1])[None, :, None]
    got = (out * area).sum(axis=(0, 1))
    # rounding to uint8 can move each box mean by ≤0.5
    assert np.abs(got - total).max() <= 0.5 * area.sum() + 1e-6


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


def test_resize_and_frame_sample_fallback(ray_session):
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


def test_resize_stage_real_pixels(ray_session):
    """ResizeStage must actually transform the payload: the output is
    a valid BMP of the reduced size whose pixels are the box means."""
    img = np.repeat(
        np.repeat(np.arange(12, dtype=np.uint8).reshape(3, 4), 16, axis=0), 16, axis=1
    )
    img3 = np.stack([img, img + 1, img + 2], axis=-1)  # 48 × 64 × 3
    rows = [{"doc_id": 0, "payload": encode_bmp(img3)}]
    out = (
        rd.from_pandas(pd.DataFrame(rows))
        .map_batches(ImageDecodeStage(bin_col="payload"), batch_format="pyarrow")
        .map_batches(ResizeStage(max_side=16), batch_format="pyarrow")
        .to_pandas()
    )
    assert out.width.tolist() == [16] and out.height.tolist() == [12]
    px = decode_image_pixels(out.payload[0])
    assert px.shape == (12, 16, 3)
    # 4x downscale of a 16x16-block-constant image = the block values
    want = resize_box(img3, 16, 12)
    assert (px == want).all()


def test_frame_sample_real_ppm_stream(ray_session):
    """FrameSampleStage decodes PPM-stream payloads for real: frame
    count, dims, and mean pixel values come from the actual frames."""
    def frame(v, w=4, h=2):
        return b"P6\n%d %d\n255\n" % (w, h) + bytes([v]) * (3 * w * h)

    stream = b"".join(frame(10 * j) for j in range(25))
    rows = [{"doc_id": 0, "payload": stream},
            {"doc_id": 1, "payload": b"not a stream at all"}]
    out = (
        rd.from_pandas(pd.DataFrame(rows))
        .map_batches(FrameSampleStage(bin_col="payload", stride=10), batch_format="pyarrow")
        .to_pandas()
        .sort_values(["doc_id", "frame_idx"])
    )
    real = out[out.doc_id == 0]
    assert real.frame_idx.tolist() == [0, 10, 20]
    assert real.frame_w.tolist() == [4, 4, 4] and real.frame_h.tolist() == [2, 2, 2]
    assert real.frame_mean.tolist() == [0.0, 100.0, 200.0]
    fake = out[out.doc_id == 1]
    assert (fake.frame_w == 0).all() and len(fake) >= 1


def test_parse_never_raises_on_long_digit_runs():
    """Review-confirmed crash: 'P6 ' + 4301+ digits hit CPython's
    int() digit limit inside _parse_ppm; the parser must treat any
    8+-digit run as a binary false positive, silently."""
    from rayraster.multimodal import _ppm_stream_frames

    p = b"P6 " + b"9" * 5000 + b" 255 " + b"\x00" * 64
    assert decode_image_header(p) is None
    assert _ppm_stream_frames(p) == []


def test_frame_sample_16bit_ppm_stream(ray_session):
    """16-bit (maxval>255) frames occupy 6wh bytes: the stream tiling
    must account for that, and the mean comes from big-endian u16
    samples."""
    import struct

    w, h = 2, 2
    vals16 = list(range(1000, 1000 + 3 * w * h))
    f16 = b"P6\n2 2\n65535\n" + b"".join(struct.pack(">H", v) for v in vals16)
    f8 = b"P6\n2 2\n255\n" + bytes([9] * 12)
    stream = f16 + f8
    out = (
        rd.from_pandas(pd.DataFrame([{"doc_id": 0, "payload": stream}]))
        .map_batches(FrameSampleStage(bin_col="payload", stride=1), batch_format="pyarrow")
        .to_pandas()
        .sort_values("frame_idx")
    )
    assert out.frame_idx.tolist() == [0, 1]
    assert out.frame_mean.tolist() == [sum(vals16) / len(vals16), 9.0]


def test_pixel_stats_null_for_uncovered_variant(ray_session):
    """A header-decodable payload whose pixels the kernel doesn't
    cover (8-bit BMP) gets px_mean NULL — never the fake formula
    beside real dimensions."""
    import struct

    w, h = 4, 1  # 8bpp, stride 4
    header = b"BM" + struct.pack("<IHHI", 54 + 4, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, 4, 2835, 2835, 0, 0)
    p8 = header + info + bytes([1, 2, 3, 4])
    assert decode_image_header(p8) == (4, 1, 1)
    out = (
        rd.from_pandas(pd.DataFrame([{"doc_id": 0, "payload": p8}]))
        .map_batches(
            ImageDecodeStage(bin_col="payload", with_pixel_stats=True),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    assert out.width.tolist() == [4] and out.channels.tolist() == [1]
    assert out.px_mean.isna().all()


def test_decode_stage_pixel_stats(ray_session):
    """px_mean: exact decoded mean for real payloads, the documented
    deterministic formula for fakes."""
    p_real = make_bmp(4, 2, seed=5)  # w%4==0 → no row padding
    p_fake = b"some text payload"
    out = (
        rd.from_pandas(pd.DataFrame([{"doc_id": 0, "payload": p_real},
                                     {"doc_id": 1, "payload": p_fake}]))
        .map_batches(
            ImageDecodeStage(bin_col="payload", with_pixel_stats=True),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    n = 4 * 2 * 3
    want_real = sum((5 + 37 * k) % 256 for k in range(n)) / n
    assert out.px_mean.tolist() == [want_real, float((len(p_fake) * 37) % 256)]


def test_decode_stage_histogram_scalars():
    """px_mode_bin / hist_l2 pin the 64-bin pixel-value histogram:
    real BMP path computed from decoded pixels, fake path (-1, 0)."""
    import numpy as np
    import pyarrow as pa

    from rayraster.multimodal import ImageDecodeStage, make_bmp

    bmp = make_bmp(8, 4, seed=3)
    t = pa.table({"payload": pa.array([bmp, b"plain bytes"], type=pa.binary())})
    out = ImageDecodeStage(with_pixel_stats=True, with_histogram=True)(t)
    # reference: the generator formula (seed + 37k) % 256 over 3wh bytes
    px = (3 + 37 * np.arange(3 * 8 * 4, dtype=np.int64)) % 256
    h = np.bincount(px // 4, minlength=64)
    assert out["px_mode_bin"].to_pylist()[0] == int(np.argmax(h))
    assert out["hist_l2"].to_pylist()[0] == int((h.astype(np.int64) ** 2).sum())
    assert out["px_mode_bin"].to_pylist()[1] == -1
    assert out["hist_l2"].to_pylist()[1] == 0


# ---------------------------------------------------------------------------
# perceptual hashing + image near-dup
# ---------------------------------------------------------------------------


from rayraster.multimodal import synth_image as _rand_img  # noqa: E402


def test_dhash_ahash_are_deterministic_and_brightness_tolerant():
    from rayraster.multimodal import ahash64, dhash64

    px = _rand_img(7)
    assert dhash64(px) == dhash64(px.copy())
    assert 0 <= dhash64(px) < 1 << 64 and 0 <= ahash64(px) < 1 << 64
    # uniform brightness shift: dhash compares neighbors, so small
    # uniform shifts move few bits (byte hashing would change ALL)
    lifted = np.clip(px.astype(np.int64) + 8, 0, 255).astype(np.uint8)
    d = bin(dhash64(px) ^ dhash64(lifted)).count("1")
    assert d <= 8


def test_phash_stage_drops_non_images(ray_session):
    import ray.data as rd

    from rayraster.multimodal import ImagePHashStage, encode_bmp

    t = pa.table(
        {"doc_id": pa.array([1, 2, 3], type=pa.int64()),
         "payload": pa.array(
             [encode_bmp(_rand_img(1)), b"not an image", encode_bmp(_rand_img(3))],
             type=pa.binary())}
    )
    out = (
        rd.from_arrow(t)
        .map_batches(ImagePHashStage(), batch_format="pyarrow")
        .to_pandas()
    )
    assert sorted(out.doc_id) == [1, 3]
    with pytest.raises(ValueError, match="method"):
        ImagePHashStage(method="md5")


@pytest.mark.parametrize("verify_mode", ["broadcast", "partitioned"])
def test_image_neardup_finds_planted_pairs_exactly(ray_session, verify_mode):
    import ray.data as rd

    from rayraster.dedup import hamming_neardup_pairs
    from rayraster.multimodal import ImagePHashStage, encode_bmp

    ids, payloads = [], []
    for i in range(0, 120, 3):
        ids += [i, i + 1_000_000]
        payloads += [encode_bmp(_rand_img(i)), encode_bmp(_rand_img(i, True))]
    t = pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()),
         "payload": pa.array(payloads, type=pa.binary())}
    )
    hashed = (
        rd.from_arrow(t).repartition(4)
        .map_batches(ImagePHashStage(), batch_format="pyarrow")
        .materialize()
    )
    pairs = hamming_neardup_pairs(
        hashed, max_dist=4, verify_mode=verify_mode, corpus_count=len(ids),
    ).to_pandas().sort_values("a").reset_index(drop=True)
    want = sorted(range(0, 120, 3))
    assert list(pairs.a) == want
    assert list(pairs.b) == [i + 1_000_000 for i in want]
    assert (pairs.hamming <= 4).all()


def test_hamming_neardup_validations(ray_session):
    import ray.data as rd

    from rayraster.dedup import hamming_neardup_pairs

    ds = rd.from_arrow(pa.table({"doc_id": pa.array([1], type=pa.int64()),
                                 "phash": pa.array([0], type=pa.int64())}))
    with pytest.raises(ValueError, match="divide 64"):
        hamming_neardup_pairs(ds, n_bands=7)
    with pytest.raises(ValueError, match="pigeonhole"):
        hamming_neardup_pairs(ds, max_dist=8, n_bands=8)


def test_wav_roundtrip_and_magic():
    from rayraster.multimodal import decode_wav, encode_wav

    s = np.array([0, 100, -200, 32767, -32768, 5], dtype=np.int16)
    r, c, out = decode_wav(encode_wav(s, rate=44100, channels=2))
    assert (r, c) == (44100, 2) and np.array_equal(out, s)
    # plausibility-checked magic: no false positives on text/garbage
    assert decode_wav(b"some plain text that is long enough to matter..") is None
    assert decode_wav(b"RIFF" + b"x" * 100) is None          # not WAVE
    assert decode_wav(b"") is None
    # non-PCM codec id rejected
    bad = bytearray(encode_wav(s))
    bad[20] = 3  # codec = IEEE float
    assert decode_wav(bytes(bad)) is None


def test_audio_feature_stage_exact(ray_session):
    from rayraster.multimodal import AudioFeatureStage, encode_wav

    rng = np.random.default_rng(4)
    clips = [rng.integers(-32768, 32768, int(n)).astype(np.int16)
             for n in rng.integers(1, 200, 12)]
    payloads = [encode_wav(c, rate=8000) for c in clips] + [b"not audio"]
    t = pa.table({"doc_id": pa.array(range(len(payloads)), pa.int64()),
                  "payload": pa.array(payloads, type=pa.binary())})
    out = AudioFeatureStage("payload", win=16)(t)
    assert out["valid"].to_pylist() == [True] * 12 + [False]
    for i, c in enumerate(clips):
        s = c.astype(np.int64)
        assert out["n_samples"][i].as_py() == len(s)
        assert out["amp_mean"][i].as_py() == int(s.sum()) / len(s)
        assert out["amp_max"][i].as_py() == float(np.abs(s).max())
        assert out["zero_crossings"][i].as_py() == int(
            (s[1:] * s[:-1] < 0).sum()
        )
        want_w = max(
            int((s[j:j + 16].astype(np.int64) ** 2).sum())
            for j in range(0, len(s), 16)
        )
        assert out["win_energy_max"][i].as_py() == want_w

    with pytest.raises(ValueError, match="win"):
        AudioFeatureStage(win=0)


# --------------------------------------------------------------------------
# QOI codec (public spec, qoiformat.org)
# --------------------------------------------------------------------------

def test_qoi_roundtrip_random_images():
    from rayraster.multimodal import decode_qoi, encode_qoi

    rng = np.random.default_rng(7)
    for trial in range(6):
        h, w = int(rng.integers(1, 9)), int(rng.integers(1, 9))
        img = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        p = encode_qoi(img)
        got = decode_qoi(p)
        assert got is not None and np.array_equal(got, img), trial


def test_qoi_all_chunk_ops_exercised():
    """One image per chunk family, each roundtripping bit-exactly."""
    from rayraster.multimodal import decode_qoi, encode_qoi

    # RUN: long constant stretches (incl. a >62-px run needing 2 chunks)
    img = np.full((10, 10, 3), 9, dtype=np.uint8)
    assert np.array_equal(decode_qoi(encode_qoi(img)), img)
    # DIFF: +1 steps stay within the 2-bit window
    ramp = (np.arange(24, dtype=np.uint8) // 3).reshape(2, 4, 3) + 100
    assert np.array_equal(decode_qoi(encode_qoi(ramp)), ramp)
    # LUMA: +17 green steps with small dr-dg / db-dg
    v = (np.arange(8) * 17 % 256).astype(np.uint8)
    luma = np.stack([v, v, v], axis=-1).reshape(2, 4, 3)
    assert np.array_equal(decode_qoi(encode_qoi(luma)), luma)
    # INDEX: alternating colors revisit the running index
    a = np.array([10, 20, 30], dtype=np.uint8)
    b = np.array([200, 150, 99], dtype=np.uint8)
    alt = np.stack([a, b] * 8).reshape(4, 4, 3)
    enc = encode_qoi(alt)
    assert np.array_equal(decode_qoi(enc), alt)
    assert any(x < 0x40 for x in enc[14:-8])  # an INDEX byte appears
    # RGBA path: 4-channel input with varying alpha (alpha dropped on decode)
    rgba = np.zeros((2, 2, 4), dtype=np.uint8)
    rgba[..., :3] = [[[1, 2, 3], [4, 5, 6]], [[7, 8, 9], [250, 0, 128]]]
    rgba[..., 3] = [[255, 10], [10, 200]]
    assert np.array_equal(decode_qoi(encode_qoi(rgba, channels=4)),
                          rgba[..., :3])


def test_qoi_plausibility_rejects_corrupt_payloads():
    from rayraster.multimodal import decode_image_pixels, decode_qoi, encode_qoi

    img = (np.arange(36, dtype=np.uint8) * 37 % 256).reshape(3, 4, 3)
    p = encode_qoi(img)
    assert decode_qoi(p[:-1]) is None            # end marker broken
    assert decode_qoi(p[:20]) is None            # truncated stream
    assert decode_qoi(p + b"x") is None          # trailing garbage
    assert decode_qoi(b"qoif" + b"\x00" * 30) is None  # zero dims
    assert decode_qoi(b"qoifgarbagegarbagegarbage") is None
    # a chunk stream that decodes too few pixels must not half-decode
    bad = bytearray(p)
    bad[14:] = bytes([0xC0]) + p[-8:]  # one 1-px run for a 12-px image
    assert decode_qoi(bytes(bad)) is None
    # the generic entry points pick QOI up
    assert decode_image_pixels(p) is not None
    assert np.array_equal(decode_image_pixels(p), img)


def test_qoi_through_decode_stage(ray_session):
    from rayraster.multimodal import ImageDecodeStage, encode_qoi

    imgs = [(np.arange(3 * 4 * h, dtype=np.int64) * 37 % 256)
            .astype(np.uint8).reshape(h, 4, 3) for h in (1, 2, 3)]
    t = pa.table({"doc_id": pa.array([0, 1, 2], type=pa.int64()),
                  "payload": pa.array([encode_qoi(i) for i in imgs],
                                      type=pa.binary())})
    out = rd.from_arrow(t).map_batches(
        ImageDecodeStage("payload", with_pixel_stats=True, with_histogram=True),
        batch_format="pyarrow",
    ).to_pandas().sort_values("doc_id")
    for row, img in zip(out.itertuples(), imgs):
        assert (row.width, row.height, row.channels) == (4, img.shape[0], 3)
        assert row.px_mean == img.astype(np.int64).sum() / img.size


def test_patch_stage_exact_sums(ray_session):
    from rayraster.multimodal import PatchStage, encode_qoi

    # 5x4 image: 2x2 patches -> 2 rows x 2 cols of full patches
    img = (np.arange(5 * 4 * 3, dtype=np.int64) * 37 % 256).astype(
        np.uint8).reshape(5, 4, 3)
    t = pa.table({"doc_id": pa.array([7], type=pa.int64()),
                  "payload": pa.array([encode_qoi(img)], type=pa.binary()),
                  "junk": pa.array([b"notanimage"], type=pa.binary())})
    t = pa.table({"doc_id": pa.array([7, 8], type=pa.int64()),
                  "payload": pa.array([encode_qoi(img), b"notanimage"],
                                      type=pa.binary())})
    out = rd.from_arrow(t).map_batches(
        PatchStage("payload", patch=2), batch_format="pyarrow"
    ).to_pandas().sort_values(["patch_row", "patch_col"])
    assert set(out.doc_id) == {7}  # undecodable -> no rows
    assert len(out) == 4
    for row in out.itertuples():
        blk = img[row.patch_row * 2:(row.patch_row + 1) * 2,
                  row.patch_col * 2:(row.patch_col + 1) * 2]
        assert row.patch_sum == int(blk.astype(np.int64).sum())
        assert row.patch_px == 12
        assert row.patch_mean == row.patch_sum / 12.0
    with pytest.raises(ValueError, match="patch"):
        PatchStage(patch=0)


def test_patch_stage_all_undecodable_keeps_schema(ray_session):
    """A batch where NO payload decodes must emit an empty table with
    the CARRY columns' input types (a null-typed doc_id would break
    union/write against non-empty batches)."""
    from rayraster.multimodal import PatchStage, encode_qoi

    stage = PatchStage("payload", patch=2)
    bad = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                    "payload": pa.array([b"junk", None], type=pa.binary())})
    empty = stage(bad)
    assert empty.num_rows == 0
    assert empty["doc_id"].type == pa.int64()

    # and a mixed dataset (one all-bad block + one good block) unions
    img = (np.arange(4 * 4 * 3, dtype=np.int64) % 256).astype(
        np.uint8).reshape(4, 4, 3)
    good = pa.table({"doc_id": pa.array([3], type=pa.int64()),
                     "payload": pa.array([encode_qoi(img)], type=pa.binary())})
    ds = rd.from_arrow(bad).union(rd.from_arrow(good))
    out = ds.map_batches(stage, batch_format="pyarrow").to_pandas()
    assert set(out.doc_id) == {3} and len(out) == 4


def test_decoders_survive_hostile_payloads(ray_session):
    """Regression set: (a) a 22-byte QOI payload declaring 2^24×2^24
    dims must return None, not attempt a ~1 PB allocation; (b) a RIFF
    whose fmt chunk declares 16 bytes but truncates must yield
    valid=false, not crash; (c) null payloads flow through every
    stage."""
    import struct as _s

    from rayraster.multimodal import (
        AudioFeatureStage,
        FrameSampleStage,
        ImageDecodeStage,
        ResizeStage,
        decode_qoi,
        decode_wav,
    )

    bomb = b"qoif" + _s.pack(">IIBB", 1 << 24, 1 << 24, 3, 0) + b"\0" * 7 + b"\x01"
    assert decode_qoi(bomb) is None

    trunc = (b"RIFF" + _s.pack("<I", 40) + b"WAVE"
             + b"LIST" + _s.pack("<I", 4) + b"\0" * 4
             + b"fmt " + _s.pack("<I", 16) + b"\0" * 8)
    assert decode_wav(trunc) is None

    t = pa.table({"doc_id": pa.array([1], type=pa.int64()),
                  "payload": pa.array([None], type=pa.binary()),
                  "width": pa.array([4], type=pa.int64()),
                  "height": pa.array([4], type=pa.int64())})
    dec = ImageDecodeStage()(t.select(["doc_id", "payload"]))
    assert dec.num_rows == 1  # deterministic fake path, no crash
    rz = ResizeStage()(t)
    assert rz.num_rows == 1
    fs = FrameSampleStage()(t.select(["doc_id", "payload"]))
    assert fs.num_rows == 1  # the deterministic-fake path (null ≡ b"")
    au = AudioFeatureStage()(t.select(["doc_id", "payload"]))
    assert bool(au["valid"][0].as_py()) is False


def test_grid_index_far_query_is_fast_and_exact(ray_session):
    """Regression: a query far outside the reference extent walked
    O((dist/s)^2) empty rings; the clamped search must return the
    same exact answer quickly."""
    import time

    from rayraster.knn import GridIndex, brute_force_knn

    rng = np.random.default_rng(11)
    rx = rng.uniform(-10, 10, 2000)
    ry = rng.uniform(-10, 10, 2000)
    gi = GridIndex(rx, ry)
    qx = np.array([5000.0, -4000.0, 0.0])
    qy = np.array([5000.0, 3000.0, 0.0])
    t0 = time.perf_counter()
    idx, d2 = gi.query(qx, qy, 3)
    assert time.perf_counter() - t0 < 2.0
    bidx, bd2 = brute_force_knn(qx, qy, rx, ry, 3)
    assert (idx == bidx).all() and np.allclose(d2, bd2)
