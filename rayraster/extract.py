"""html → text extraction (the per-row byte-identical invariant).

BASELINE.json input_hint: "per-row invariant vs the reference:
byte-identical extracted text per url".  The extractor is the inverse
of synth.py's page template: body substring + entity unescape.  It is
deliberately trivial and deterministic (SURVEY.md §7 hard-part (e)) —
the contract is EXACT reproduction of the stored ``text`` column.
"""

from __future__ import annotations

import html as _html

import numpy as np
import pyarrow as pa

_OPEN = b"<body>"
_CLOSE = b"</body>"

# the exact entity set html.escape produces; &amp; must replace LAST
# so replacement output is never rescanned as a new entity
_KNOWN_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                   ("&#x27;", "'"), ("&amp;", "&")]


def extract_text(html: bytes) -> str:
    """Byte-exact inverse of the synth page template."""
    i = html.index(_OPEN) + len(_OPEN)
    j = html.rindex(_CLOSE)
    return _html.unescape(html[i:j].decode("utf-8"))


def _extract_texts_vectorized(col) -> pa.Array:
    """Arrow-native batch twin of :func:`extract_text`: offset-
    arithmetic carve of the ``<body>…</body>`` span (one ragged numpy
    gather over the binary buffer — no per-row Python) + sequential
    literal ``replace_substring`` for html.escape's five entities.

    The fast path is PROVABLY equal to ``html.unescape`` exactly when
    every ``&`` in the carved body starts one of the five known
    entities (true for any escape image: escape rewrites every
    ampersand, and no longer HTML5 entity can extend past a known
    entity's terminating ``;``).  Rows violating that — or with a
    non-unique body tag pair — fall back to the per-row reference
    extractor, so output is byte-identical to it for EVERY valid
    input; a carved span that is not valid UTF-8 raises at the final
    binary→string cast (``ArrowInvalid``) where the reference raises
    ``UnicodeDecodeError`` — both refuse, neither emits poison.
    Handles both 32-bit (``binary``/``string``) and 64-bit
    (``large_binary``/``large_string``) offset layouts; other column
    types raise.

    MEASURED SLOWER than the per-row kernel and therefore NOT the
    default (round-5 A/B, single core): 20.9 vs 2.1 µs/row at ~600 B
    bodies and 44.6 vs 8.0 µs/row at ~6 KB bodies — the ragged-gather
    index arrays cost 8 bytes of memory traffic per payload byte, and
    the kernel chain (find×2 + count×7 + gather + replace×5) makes
    ~15 passes over the corpus where CPython's C-speed
    ``bytes.index``/slice/``unescape`` makes 3.  Kept as a selectable
    path (``ExtractStage(vectorized=True)``) with a byte-identity
    test; revisit if a fused slice-by-offsets kernel lands in Arrow."""
    import pyarrow.compute as pc

    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(a)
    if n == 0:
        return pa.array([], type=pa.string())
    t = a.type
    if pa.types.is_large_binary(t) or pa.types.is_large_string(t):
        off_dtype, off_width = np.int64, 8
    elif pa.types.is_binary(t) or pa.types.is_string(t):
        off_dtype, off_width = np.int32, 4
    else:
        raise TypeError(f"extract: expected a (large_)binary/string "
                        f"column, got {t}")
    fi = pc.fill_null(pc.find_substring(a, "<body>"), -1).to_numpy(
        zero_copy_only=False).astype(np.int64)
    fj = pc.fill_null(pc.find_substring(a, "</body>"), -1).to_numpy(
        zero_copy_only=False).astype(np.int64)
    cb = pc.fill_null(pc.count_substring(a, "<body>"), 0).to_numpy(
        zero_copy_only=False)
    ce = pc.fill_null(pc.count_substring(a, "</body>"), 0).to_numpy(
        zero_copy_only=False)
    fallback = (cb != 1) | (ce != 1) | (fi < 0) | (fj < fi + 6)
    offs = np.frombuffer(a.buffers()[1], dtype=off_dtype, count=n + 1,
                         offset=a.offset * off_width).astype(np.int64)
    data = np.frombuffer(a.buffers()[2], dtype=np.uint8)
    src_start = offs[:-1] + fi + 6
    length = np.where(fallback, 0, fj - fi - 6)
    tot = int(length.sum())
    out_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(length, out=out_offs[1:])
    if tot > (1 << 31) - 8:  # int32 offset ceiling — carve per row
        fallback[:] = True
        body = pa.array([b""] * n, type=pa.binary())
    else:
        idx = (np.arange(tot, dtype=np.int64)
               - np.repeat(out_offs[:-1], length)
               + np.repeat(src_start, length))
        carved = np.ascontiguousarray(data[idx])
        # stay BINARY until the final cast: the cast-to-string at the
        # end is the utf8 validation the reference's .decode() does —
        # invalid bytes raise instead of poisoning a string column
        body = pa.Array.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(out_offs.astype(np.int32).tobytes()),
             pa.py_buffer(carved.tobytes())],
        )
    # escape-image gate: every '&' must begin a known entity
    known = np.zeros(n, dtype=np.int64)
    for ent, _ in _KNOWN_ENTITIES:
        known += pc.count_substring(body, ent).to_numpy(
            zero_copy_only=False).astype(np.int64)
    amps = pc.count_substring(body, "&").to_numpy(
        zero_copy_only=False).astype(np.int64)
    fallback |= known != amps
    texts = body
    for ent, rep in _KNOWN_ENTITIES:
        texts = pc.replace_substring(texts, pattern=ent, replacement=rep)
    if fallback.any():
        rows = np.flatnonzero(fallback)
        repl = pa.array(
            [extract_text(a[int(k)].as_py()).encode("utf-8") for k in rows],
            type=pa.binary(),
        )
        texts = pc.replace_with_mask(texts, pa.array(fallback), repl)
    return texts.cast(pa.string())  # validates utf8; raises like .decode()


class ExtractStage:
    """map_batches callable: html binary → ``text`` column.

    Default kernel = per-row slice+unescape, which the round-5 A/B
    measured 4–10× FASTER than the Arrow-kernel twin at both ~600 B
    and ~6 KB bodies (CPython ``bytes.index``/slice/``unescape`` are
    single C passes; the kernel chain pays ~15 corpus passes plus
    8 B/byte of gather-index traffic — see
    :func:`_extract_texts_vectorized` for the numbers).  Pass
    ``vectorized=True`` to run the Arrow twin instead; both are
    byte-identical on every input (tested incl. adversarial pages).
    The invariant VERIFY is vectorized (``pc.equal``) either way.
    ``verify_against``: optional column holding golden text; any row
    where extraction is not byte-identical raises — this is how the
    per-row invariant is enforced in-pipeline.
    """

    def __init__(self, html_col: str = "html", out_col: str = "text",
                 verify_against: str | None = None,
                 vectorized: bool = False):
        self.html_col = html_col
        self.out_col = out_col
        self.verify_against = verify_against
        self.vectorized = vectorized

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.vectorized:
            texts = _extract_texts_vectorized(batch[self.html_col])
        else:
            texts = pa.array(
                [extract_text(h) for h in batch[self.html_col].to_pylist()],
                type=pa.string(),
            )
        if self.verify_against is not None:
            import pyarrow.compute as pc

            golden = batch[self.verify_against]
            eq = pc.equal(texts.cast(pa.string()), golden.cast(pa.string()))
            bad = pc.sum(pc.invert(eq)).as_py() or 0
            if bad:
                k = int(np.flatnonzero(~eq.to_numpy(zero_copy_only=False))[0])
                url = batch["url"][k].as_py() if "url" in batch.column_names else k
                raise AssertionError(
                    f"extract(html) != text for {bad} rows (first: {url!r})"
                )
        if self.out_col in batch.column_names:
            batch = batch.drop_columns([self.out_col])
        return batch.append_column(self.out_col, texts.cast(pa.string()))


def text_features(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Continuous features derived from text (≙ gene expression,
    FIXTURES.md F1): text_len, token_count, digit_count — vectorized."""
    import pyarrow.compute as pc

    t = batch[text_col]
    batch = batch.append_column("text_len", pc.utf8_length(t))
    toks = pc.count_substring_regex(t, r"\S+")
    batch = batch.append_column("token_count", toks.cast(pa.int64()))
    digs = pc.count_substring_regex(t, r"[0-9]")
    batch = batch.append_column("digit_count", digs.cast(pa.int64()))
    return batch


def extract_links(
    batch: pa.Table,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> pa.Table:
    """Anchor-href extraction from raw HTML bytes — the web-graph edge
    builder (every ``href="…"`` / ``href='…'`` attribute value, one
    output row per link, carrying the source ``id_col``).

    Fully vectorized Arrow plan (no per-row Python): one
    ``split_pattern`` on ``href=`` (the C++ kernel scans each page
    once), offset arithmetic drops the pre-attribute fragment of every
    page, a 1-codeunit slice classifies the quote style, and one more
    bounded split per quote style carves the value.  Fragments whose
    first byte is not a quote (unquoted or prose ``href=``) are
    dropped — decoy text never becomes an edge.

    Returns ``(id_col, link)`` with links in page order within each
    quote class (downstream aggregation is order-independent)."""
    import pyarrow.compute as pc

    h = pc.cast(batch[html_col], pa.string())
    parts = pc.split_pattern(h, pattern="href=").combine_chunks()
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    lens = (
        pc.fill_null(pc.list_value_length(parts), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )  # null html → 0 fragments
    flat = pc.list_flatten(parts)
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    src = np.repeat(ids, lens)
    # mask out fragment 0 of every page (text before the first href=)
    total = int(lens.sum())
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    keep = np.ones(total, dtype=bool)
    keep[starts[(lens > 0) & (starts < total)]] = False
    frags = flat.filter(pa.array(keep))
    src = src[keep]
    q = pc.utf8_slice_codeunits(frags, 0, 1)
    out_src: list[np.ndarray] = []
    out_url: list[pa.Array] = []
    for quote in ('"', "'"):
        sel = pc.equal(q, quote).fill_null(False)
        sub = frags.filter(sel)
        if len(sub) == 0:
            continue
        body = pc.utf8_slice_codeunits(sub, 1, 1 << 30)
        sp = pc.split_pattern(body, pattern=quote, max_splits=1)
        closed = pc.equal(pc.list_value_length(sp), 2)  # unterminated → drop
        url = pc.list_element(sp, 0).filter(closed)
        out_src.append(src[sel.to_numpy(zero_copy_only=False)][
            closed.to_numpy(zero_copy_only=False)])
        out_url.append(url)
    if not out_src:
        return pa.table(
            {id_col: pa.array([], type=pa.int64()),
             "link": pa.array([], type=pa.string())}
        )
    return pa.table(
        {id_col: pa.array(np.concatenate(out_src)),
         "link": pa.concat_arrays(
             [u.combine_chunks() if isinstance(u, pa.ChunkedArray) else u
              for u in out_url]
         )}
    )
