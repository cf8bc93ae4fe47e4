"""Pages synthesis determinism + the byte-identical extract invariant."""

import numpy as np
import pytest

import ray.data as rd

from rayraster.extract import ExtractStage, extract_text, text_features
from rayraster.geo import fnv1a64, geocode_url
from rayraster.synth import make_pages_batch, pages_dataset, write_pages_parquet_local


def test_pages_deterministic_and_chunk_invariant():
    a = make_pages_batch(np.arange(0, 100))
    b1 = make_pages_batch(np.arange(0, 37))
    b2 = make_pages_batch(np.arange(37, 100))
    import pyarrow as pa

    assert pa.concat_tables([b1, b2]).equals(a)
    # schema matches the input_hint shape
    assert [f.name for f in a.schema] == ["url", "warc_ts", "html", "text", "lang"]
    assert str(a.schema.field("warc_ts").type) == "timestamp[us]"
    assert a.schema.field("html").type == "binary"


def test_extract_invariant_byte_identical():
    t = make_pages_batch(np.arange(0, 500))
    for h, txt in zip(t["html"].to_pylist(), t["text"].to_pylist()):
        assert extract_text(h) == txt
    # rows with escapable chars actually exercise escaping
    assert any(b"&lt;" in h or b"&amp;" in h for h in t["html"].to_pylist())


def test_extract_stage_verifies(tmp_path, ray_session):
    p = str(tmp_path / "pages.parquet")
    write_pages_parquet_local(p, 300)
    ds = rd.read_parquet(p)
    out = ds.map_batches(
        ExtractStage(verify_against="text"), batch_format="pyarrow"
    ).map_batches(text_features, batch_format="pyarrow")
    df = out.to_pandas()
    assert len(df) == 300
    assert (df["text_len"] == df["text"].str.len()).all()
    assert (df["token_count"] == df["text"].str.split().str.len()).all()


def test_extract_stage_raises_on_corruption(ray_session):
    import pyarrow as pa

    t = make_pages_batch(np.arange(5))
    bad = t.set_column(
        t.schema.get_field_index("text"),
        "text",
        pa.array(["WRONG"] * 5, type=pa.string()),
    )
    stage = ExtractStage(verify_against="text")
    with pytest.raises(AssertionError, match="extract"):
        stage(bad)


def test_fnv_vectorized_matches_reference_scalar():
    urls = [f"https://example-{i:08d}.test/page" for i in range(50)]
    urls += ["a", "", "xy", "longer-string-here"]
    got = fnv1a64(urls)

    def slow(s):
        h = 14695981039346656037
        for b in s.encode():
            h = ((h ^ b) * 1099511628211) % (1 << 64)
        return h

    want = np.array([slow(s) for s in urls], dtype=np.uint64)
    # empty string: vectorized path defines length 0 → offset basis
    np.testing.assert_array_equal(got, want)


def test_geocode_url_hotspots_create_skew():
    urls = [f"https://example-{i:08d}.test/page" for i in range(20000)]
    x, y = geocode_url(urls)
    assert ((x >= -180.5) & (x <= 180.5)).all()
    # hotspot near Paris (2.35, 48.86) should be dense
    near = ((np.abs(x - 2.35) < 0.2) & (np.abs(y - 48.86) < 0.2)).sum()
    assert near > 500  # ~6% of rows in one 0.4°×0.4° window = heavy skew


def test_pages_dataset_streaming(ray_session):
    df = pages_dataset(1000, parallelism=4).to_pandas()
    assert len(df) == 1000
    assert df["url"].is_unique


def test_prepare_pages_fused(ray_session):
    from rayraster.pipelines import prepare_pages
    from rayraster.synth import make_pages_batch

    t = make_pages_batch(np.arange(200))
    out = prepare_pages(t)
    assert out.column_names == ["text_len", "token_count", "digit_count", "x", "y"]
    assert out.num_rows == 200
    # invariant enforcement still active in the fused path
    import pyarrow as pa

    bad = t.set_column(
        t.schema.get_field_index("text"), "text",
        pa.array(["X"] * 200, type=pa.string()),
    )
    with pytest.raises(AssertionError):
        prepare_pages(bad)


def test_extract_links_quotes_and_decoys():
    import numpy as np
    import pyarrow as pa

    from rayraster.extract import extract_links

    htmls = [
        b'<html><body><a href="https://a.test/1">x</a> href= prose '
        b"<a href='https://b.test/2'>y</a> plain https://decoy.test/z"
        b"</body></html>",
        None,
        b"<html><body>no links</body></html>",
        b'<html><body><a href="https://c.test/3">z</a>'
        b'<a href="https://c.test/4">w</a>'
        b'<a href=unquoted>drop</a><a href="unterminated</body></html>',
    ]
    t = pa.table({"doc_id": pa.array([10, 13, 11, 12], type=pa.int64()),
                  "html": pa.array(htmls, type=pa.binary())})
    out = extract_links(t)
    pairs = sorted(zip(out["doc_id"].to_pylist(), out["link"].to_pylist()))
    assert pairs == [
        (10, "https://a.test/1"), (10, "https://b.test/2"),
        (12, "https://c.test/3"), (12, "https://c.test/4"),
    ]
    empty = extract_links(pa.table(
        {"doc_id": pa.array([], type=pa.int64()),
         "html": pa.array([], type=pa.binary())}
    ))
    assert empty.num_rows == 0


def test_extract_vectorized_byte_identical_incl_adversarial():
    """The Arrow-kernel extractor twin must be byte-identical to the
    per-row reference on every input: escape images (fast path),
    semicolon-less entities, unknown entities, bare ampersands, and
    multi-body pages (index/rindex semantics) — all via fallback."""
    import html as H

    import pyarrow as pa

    from rayraster.extract import _extract_texts_vectorized, extract_text

    texts = [
        "hello world", "", "a&b<c>d\"e'f", "&amp; literal", "&lt;tag&gt;",
        "&xlt; unknown", "&ampx noSemi", "x" * 10000 + " & <>" * 50,
        "unicode ☃ ünïcode", "&#39; decimal", "&ltcc;", "&quot;&#x27;",
    ]
    pages = [
        f"<html><head><title>x</title></head><body>{H.escape(t)}</body></html>"
        .encode() for t in texts
    ]
    pages += [
        b"<body>&ampx</body>",           # semicolon-less entity
        b"<body>&nbsp;</body>",          # entity outside the escape set
        b"<body>a&b</body>",             # bare ampersand
        b"<body>x</body><body>y</body>", # rindex semantics
    ]
    arr = pa.array(pages, type=pa.binary())
    got = _extract_texts_vectorized(arr).to_pylist()
    want = [extract_text(p) for p in pages]
    assert got == want


def test_extract_stage_vectorized_flag(ray_session):
    """Both ExtractStage kernels produce the same text column through
    a real map_batches run."""
    import html as H

    import pyarrow as pa
    import ray.data as rd

    from rayraster.extract import ExtractStage

    texts = [f"doc {i} body & <tag> 'q'" for i in range(64)]
    t = pa.table({
        "url": pa.array([f"u{i}" for i in range(64)]),
        "html": pa.array(
            [f"<html><head></head><body>{H.escape(x)}</body></html>".encode()
             for x in texts], type=pa.binary()),
        "text": pa.array(texts, type=pa.string()),
    })
    for vec in (False, True):
        out = rd.from_arrow(t).map_batches(
            ExtractStage(verify_against="text", vectorized=vec),
            batch_format="pyarrow",
        ).to_pandas()
        assert out.text.tolist() == texts, vec


def test_extract_vectorized_large_binary_and_invalid_utf8():
    """large_binary columns must carve through int64 offsets (not be
    silently misread as int32), and an invalid-UTF-8 body must RAISE
    (the reference raises UnicodeDecodeError; the vectorized path
    raises at the validating binary->string cast) — never emit poison."""
    import pyarrow as pa
    import pytest as _pytest

    from rayraster.extract import _extract_texts_vectorized, extract_text

    pages = [b"<body>hello</body>", b"<body>world</body>", b"<body>third</body>"]
    got = _extract_texts_vectorized(pa.array(pages, type=pa.large_binary()))
    assert got.to_pylist() == [extract_text(p) for p in pages]

    bad = pa.array([b"<body>\xff\xfeabc</body>"], type=pa.binary())
    with _pytest.raises(Exception):
        _extract_texts_vectorized(bad)
    with _pytest.raises(UnicodeDecodeError):
        extract_text(b"<body>\xff\xfeabc</body>")

    with _pytest.raises(TypeError):
        _extract_texts_vectorized(pa.array([1, 2], type=pa.int64()))
