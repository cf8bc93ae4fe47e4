"""Deterministic synthetic pages table (BASELINE.json input_hint shape).

``pages(url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string)`` — every column a pure function of the row index, so any
chunking/parallelism produces identical rows (FIXTURES.md F1).  No
wall-clock, no RNG state shared across rows.

The html wraps the text reversibly (``extract.extract_text(html) ==
text`` byte-identical — the per-row invariant in BASELINE.json
input_hint, golden-tested in tests/test_synth_extract.py).
"""

from __future__ import annotations

import html as _html

import numpy as np
import pyarrow as pa

# 256-word deterministic vocabulary (no regex-special or HTML-special
# chars, so escaping is exercised separately via punctuation rows)
_CONS = "bcdfglmnprstvz"
_VOW = "aeiou"
VOCAB = np.array(
    [
        _CONS[(k * 7) % 14] + _VOW[k % 5] + _CONS[(k * 3 + 1) % 14] + _VOW[(k * 11 + 2) % 5]
        + (_CONS[(k * 5 + 3) % 14] if k % 3 else "")
        for k in range(256)
    ]
)
LANGS = [f"lang{k:02d}" for k in range(16)]
EPOCH_2024 = np.datetime64("2024-01-01T00:00:00", "us")


def make_pages_batch(ids: np.ndarray) -> pa.Table:
    """Rows for the given int64 indices — vectorized except the final
    per-row string join (C-speed)."""
    ids = np.asarray(ids, dtype=np.int64)
    n = len(ids)
    urls = [f"https://example-{i:08d}.test/page" for i in ids.tolist()]
    ts = EPOCH_2024 + ids * np.timedelta64(1, "s")

    n_words = 20 + (ids * 7919) % 120
    max_w = int(n_words.max()) if n else 0
    j = np.arange(max_w, dtype=np.int64)
    # per-(row, position) splitmix so word sequences do NOT cycle with
    # a short period in i — an affine index (i*a + j*b) % V repeats
    # whole texts every few thousand rows, flooding large corpora with
    # accidental exact duplicates (found via the dedup demo pipeline)
    with np.errstate(over="ignore"):
        z = (ids[:, None] * np.int64(256) + j[None, :]).astype(np.uint64)
        z = (z + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    idx = (z % np.uint64(len(VOCAB))).astype(np.int64)
    words = VOCAB[idx]
    texts = []
    for r in range(n):
        t = " ".join(words[r, : n_words[r]])
        # a deterministic sprinkle of punctuation / digits / escapables
        # so extraction, escaping and text metrics are exercised
        m = int(ids[r]) % 7
        if m == 0:
            t += f" {int(ids[r])} < {int(ids[r]) + 1} & done."
        elif m == 1:
            t += " End of page?!"
        texts.append(t)

    langs = _lang_of(ids)
    htmls = [
        (
            f"<html><head><title>T{i}</title></head><body>"
            f"{_html.escape(t, quote=False)}</body></html>"
        ).encode("utf-8")
        for i, t in zip(ids.tolist(), texts)
    ]
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )


def _lang_of(ids: np.ndarray) -> list[str]:
    """Zipf-ish skewed deterministic label (16 levels, like the
    reference fixture's 16 cell types)."""
    u = ((ids * 48271) % 65536) / 65536.0
    k = np.minimum(15, (16.0 * u * u).astype(np.int64))
    return [LANGS[int(v)] for v in k]


def write_pages_parquet_local(path: str, n: int, chunk: int = 65536) -> None:
    """Small-scale writer (tests): single file, sequential chunks."""
    import pyarrow.parquet as pq

    schema = make_pages_batch(np.arange(0)).schema
    with pq.ParquetWriter(path, schema) as w:
        for lo in range(0, n, chunk):
            w.write_table(make_pages_batch(np.arange(lo, min(n, lo + chunk))))


def pages_dataset(n: int, parallelism: int = -1):
    """Streaming Ray generator: range(n) → map_batches(make_pages) —
    the scale path (never materializes the table on the driver)."""
    import ray.data as rd

    def _gen(b: pa.Table) -> pa.Table:
        return make_pages_batch(b["id"].to_numpy(zero_copy_only=False))

    return rd.range(n, override_num_blocks=parallelism if parallelism > 0 else None).map_batches(
        _gen, batch_format="pyarrow", zero_copy_batch=True
    )


def write_pages_parquet_ray(out_dir: str, n: int, parallelism: int = 64) -> None:
    """Scale writer: partitioned parquet directory via Ray streaming."""
    pages_dataset(n, parallelism).write_parquet(out_dir)
