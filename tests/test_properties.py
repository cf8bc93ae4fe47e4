"""Property-based tests (hypothesis) for the pure-geometry core.

These pin the engine's algebraic invariants over arbitrary inputs —
the reference's testthat suite asserts structure on one fixture
(SURVEY.md §5); properties cover the input space.
"""

import math

import numpy as np
from hypothesis import example, given, settings, strategies as st

from rayraster.dedup import char_shingle_hashes, jaccard, minhash_signature
from rayraster.geo import fnv1a64, geocode_id
from rayraster.grid import (
    GridSpec,
    derive_bbox,
    hex_cube_round,
    pack_cell_id,
    parent_cell,
    unpack_cell_id,
)

coord = st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False)
res_st = st.floats(0.01, 1000.0, allow_nan=False, allow_infinity=False)


@settings(max_examples=200, deadline=None)
@given(st.lists(coord, min_size=1, max_size=50), st.lists(coord, min_size=1, max_size=50), res_st)
def test_square_assignment_is_containment(xs, ys, res):
    """Every point lies inside (or on the boundary of) its assigned
    cell, and never left/below its cell's lower edge."""
    n = min(len(xs), len(ys))
    x = np.array(xs[:n])
    y = np.array(ys[:n])
    x0 = math.floor(x.min() - res / 2)
    y0 = math.floor(y.min() - res / 2)
    spec = GridSpec(float(x0), float(y0), res)
    ix, iy = spec.assign(x, y)
    lo_x = x0 + ix * res
    lo_y = y0 + iy * res
    eps = 1e-9 * max(1.0, res) + 1e-6 * np.maximum(np.abs(x), 1.0)
    assert (x >= lo_x - eps).all() and (x <= lo_x + res + eps).all()
    assert (y >= lo_y - eps).all() and (y <= lo_y + res + eps).all()
    assert (ix >= 0).all() and (iy >= 0).all()


@settings(max_examples=200, deadline=None)
@given(st.floats(-1e5, 1e5), st.floats(-1e5, 1e5), res_st)
def test_bbox_pad_rule_contains_min(mn, mx, res):
    lo, _, hi, _ = derive_bbox(min(mn, mx), max(mn, mx), min(mn, mx), max(mn, mx), res)
    assert lo <= min(mn, mx) and hi >= max(mn, mx)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.floats(-1e4, 1e4), min_size=1, max_size=30),
    st.lists(st.floats(-1e4, 1e4), min_size=1, max_size=30),
    st.floats(0.1, 100.0),
)
def test_hex_assignment_nearest_center_property(xs, ys, res):
    """Assigned hex center is within circumradius of the point (every
    point of a hexagon is ≤ R from its center)."""
    n = min(len(xs), len(ys))
    x = np.array(xs[:n])
    y = np.array(ys[:n])
    spec = GridSpec(0.0, 0.0, res, square=False)
    q, r = spec.assign(x, y)
    cx, cy = spec.centroid(q, r)
    d = np.hypot(x - cx, y - cy)
    assert (d <= spec.hex_R * (1 + 1e-9) + 1e-6).all()


@settings(max_examples=200, deadline=None)
@given(
    st.integers(-(2**27), 2**27 - 1),
    st.integers(-(2**27), 2**27 - 1),
    st.integers(0, 20),
)
def test_pack_unpack_parent_properties(ix, iy, level):
    cid = pack_cell_id(level, np.array([ix]), np.array([iy]))
    lv, ix2, iy2 = unpack_cell_id(cid)
    assert (lv[0], ix2[0], iy2[0]) == (level, ix, iy)
    if 0 <= ix and 0 <= iy:
        par = parent_cell(cid)
        _, px, py = unpack_cell_id(par)
        assert px[0] == ix // 2 and py[0] == iy // 2


@settings(max_examples=100, deadline=None)
@given(st.lists(st.floats(-50, 50), min_size=2, max_size=40))
def test_hex_cube_round_is_valid_cube(vals):
    """Cube rounding returns integer axial coords (x+y+z=0 respected)."""
    n = len(vals) // 2
    qf = np.array(vals[:n])
    rf = np.array(vals[n : 2 * n])
    q, r = hex_cube_round(qf, rf)
    # rounding distance bounded: |q-qf| ≤ 1, |r-rf| ≤ 1
    assert (np.abs(q - qf) <= 1.0 + 1e-9).all()
    assert (np.abs(r - rf) <= 1.0 + 1e-9).all()


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 10**12))
def test_geocode_in_domain(i):
    x, y = geocode_id(np.array([i]))
    assert -180.0 <= x[0] < 180.0
    assert -90.0 <= y[0] < 90.0


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=30), min_size=1, max_size=20))
def test_fnv_vectorized_equals_scalar(strings):
    got = fnv1a64(strings)

    def slow(s):
        h = 14695981039346656037
        for b in s.encode("utf-8"):
            h = ((h ^ b) * 1099511628211) % (1 << 64)
        return h

    want = np.array([slow(s) for s in strings], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


@settings(max_examples=50, deadline=None)
@given(st.text(min_size=0, max_size=200), st.text(min_size=0, max_size=200))
def test_jaccard_bounds_and_symmetry(a, b):
    ha = char_shingle_hashes(a, 5)
    hb = char_shingle_hashes(b, 5)
    j1 = jaccard(ha, hb)
    j2 = jaccard(hb, ha)
    assert 0.0 <= j1 <= 1.0 and j1 == j2
    assert jaccard(ha, ha) == 1.0
    # minhash equality share is a [0,1] estimate
    if len(ha) and len(hb):
        est = (minhash_signature(ha, 64) == minhash_signature(hb, 64)).mean()
        assert 0.0 <= est <= 1.0


@given(
    st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=400),
    st.floats(0.01, 0.99),
)
@settings(max_examples=25, deadline=None)
@example(
    # regression: subnormal-width refinement interval — num_bins/w
    # overflowed to inf and the bin map degenerated (0*inf = NaN)
    vals=[-2.225073858507203e-309, 1.1754943508222875e-38] + [0.0] * 27,
    q=0.5,
)
@example(vals=[-1e6, 1e6], q=0.5)
def test_exact_quantiles_property(vals, q):
    """exact_quantiles == the k-th smallest element (quantile_disc rank
    rule) for arbitrary float corpora, including duplicates and
    single-element inputs."""
    import pandas as pd
    import ray.data as rd

    from rayraster.agg import exact_quantiles

    got = exact_quantiles(
        rd.from_pandas(pd.DataFrame({"v": vals})), "v", [q],
        num_bins=64, collect_threshold=8, max_rounds=64,
    )[0]
    s = sorted(vals)
    n = len(s)
    k = min(max(int(np.ceil(n * q)) - 1, 0), n - 1)
    assert got == s[k]


@given(
    st.integers(0, 5000),   # doc length
    st.integers(1, 600),    # window
    st.integers(1, 600),    # stride
)
@settings(max_examples=100, deadline=None)
def test_chunk_count_covers_document(length, window, stride):
    """Packing invariants for any (len, window, stride): the emitted
    windows exactly cover [0, len) with no window a pure subset of its
    predecessor, and the count matches the closed form."""
    from rayraster.textops import chunk_count

    n = int(chunk_count(np.array([length]), window, stride)[0])
    eff = max(length, 1)
    starts = [k * stride for k in range(n)]
    ends = [min(s + window, eff) for s in starts]
    # coverage: first window starts at 0, consecutive windows overlap
    # or touch, last window reaches the end of the document
    assert starts[0] == 0
    if stride <= window:  # overlap mode: gapless cover (sampling mode
        for a, b in zip(ends, starts[1:]):  # with stride>window may gap)
            assert b <= a  # no gap
    assert ends[-1] == eff or (n == 1 and window >= eff)
    # no redundant tail: every window past the first adds new content
    for prev_end, s in zip(ends, starts[1:]):
        assert s + window > prev_end


# ---------------------------------------------------------------------------
# curation kernel properties (pure batch ops — no Ray)
# ---------------------------------------------------------------------------

import pyarrow as pa

text_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200
)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.one_of(text_st, st.none()), min_size=1, max_size=20))
def test_normalize_text_idempotent_and_shaped(texts):
    from rayraster.textops import normalize_text

    t = pa.table({"text": pa.array(texts, type=pa.string())})
    once = normalize_text(t)["text_norm"]
    twice = normalize_text(
        pa.table({"text": once}), text_col="text"
    )["text_norm"]
    assert once.to_pylist() == twice.to_pylist()  # idempotent
    for src, out in zip(texts, once.to_pylist()):
        if src is None:
            assert out is None
        else:
            assert "  " not in out  # no double spaces survive
            assert out == out.strip(" ")


@settings(max_examples=150, deadline=None)
@given(st.lists(st.one_of(text_st, st.none()), min_size=1, max_size=20))
def test_repetition_metrics_bounds(texts):
    from rayraster.textops import repetition_metrics

    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    out = repetition_metrics(t)
    assert all(v >= 1 for v in out["n_lines"].to_pylist())
    for col in ("dup_line_frac", "dup_line_char_frac", "top_word_frac"):
        assert all(0.0 <= v <= 1.0 for v in out[col].to_pylist()), col


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcd"), max_size=12).map(" ".join),
        min_size=1,
        max_size=10,
    ),
    st.integers(1, 6),
)
def test_ngram_counts_per_doc(texts, n):
    from rayraster.textops import _ngrams_of, _split_words_flat

    t = pa.array(texts, type=pa.string())
    flat, doc = _split_words_flat(t)
    grams, gdoc = _ngrams_of(flat, doc, n)
    words_per_doc = np.bincount(doc, minlength=len(texts))
    grams_per_doc = np.bincount(gdoc, minlength=len(texts))
    expect = np.maximum(words_per_doc - n + 1, 0)
    assert (grams_per_doc == expect).all()  # grams never cross docs
    # every gram has exactly n space-separated tokens
    for g in grams.to_pylist()[:20]:
        assert len(g.split(" ")) == n


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.text(alphabet="abc", min_size=0, max_size=3), min_size=1, max_size=60),
    st.integers(1, 5),
)
def test_first_occurrence_matches_pandas_dedup(values, n_segs):
    """The shared segment-distinct kernel keeps exactly the first
    occurrence of every (segment, value) pair — pandas drop_duplicates
    is the oracle."""
    import pandas as pd
    import pyarrow as pa

    from rayraster.textops import _first_occurrence

    seg = np.arange(len(values), dtype=np.int64) % n_segs
    order, first = _first_occurrence(pa.array(values), seg)
    kept = sorted(order[first].tolist())
    df = pd.DataFrame({"seg": seg, "v": values})
    want = sorted(df.drop_duplicates(["seg", "v"]).index.tolist())
    assert kept == want


@settings(max_examples=300, deadline=None)
@given(
    st.integers(-(2**31) + 1, 2**31 - 1),
    st.integers(-(2**31) + 1, 2**31 - 1),
)
def test_pack_lo_hi_injective_roundtrip(a, b):
    """The closing-edge key is injective over |id| < 2^31 (including
    negatives): proven by DECODING the key back to the exact (lo, hi)
    pair — random pair-vs-pair collision checks have no power against
    a ~2^62 key space, a round trip does."""
    from rayraster.graph import _pack_lo_hi

    key = int(_pack_lo_hi(np.array([a], np.int64), np.array([b], np.int64))[0])
    hi = (key + (1 << 31)) % (1 << 32) - (1 << 31)
    lo = (key - hi) >> 32
    assert (lo, hi) == (a, b)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="AaBb01:/?&=.#x-", min_size=0, max_size=40))
def test_canonicalize_url_idempotent(s):
    """canon(canon(x)) == canon(x): a canonical form must be a fixed
    point, for parseable AND unparseable inputs alike."""
    import pyarrow as pa

    from rayraster.textops import canonicalize_url

    once = canonicalize_url(pa.table({"url": pa.array([s], type=pa.string())}))[
        "url_canon"
    ]
    twice = canonicalize_url(pa.table({"url": once}))["url_canon"]
    assert once.to_pylist() == twice.to_pylist()


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab .!\n", min_size=0, max_size=40),
        min_size=1,
        max_size=6,
    ),
    st.integers(1, 4),
)
def test_c4_line_filter_idempotent_and_subset(texts, min_words):
    """Filtering is idempotent (kept lines still satisfy the rule) and
    the output's lines are a subsequence of the input's."""
    import pyarrow as pa

    from rayraster.textops import c4_line_filter

    t = pa.table({"text": pa.array(texts, type=pa.string())})
    once = c4_line_filter(t, min_words=min_words)["text_c4"]
    twice = c4_line_filter(
        pa.table({"text": once}), min_words=min_words
    )["text_c4"]
    assert once.to_pylist() == twice.to_pylist()
    for src, out in zip(texts, once.to_pylist()):
        src_lines = src.split("\n")
        out_lines = out.split("\n") if out else []
        it = iter(src_lines)
        assert all(l in it for l in out_lines)  # subsequence


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=40,
                        # Arrow string columns are UTF-8; lone surrogates (Cs)
                        # can never appear in one, so exclude them here.
                        alphabet=st.characters(min_codepoint=1,
                                               blacklist_categories=("Cs",))),
                min_size=0, max_size=30))
def test_fnv_arrow_buffer_path_equals_list_path(strings):
    import pyarrow as pa

    from rayraster.geo import fnv1a64_arrow

    arr = pa.array(strings, type=pa.string())
    np.testing.assert_array_equal(fnv1a64_arrow(arr), fnv1a64(strings))


def test_fnv_arrow_nulls_slices_chunks_and_empties():
    import pyarrow as pa

    from rayraster.geo import fnv1a64_arrow

    # NULL hashes like the string "None" (legacy str() behavior)
    arr = pa.array(["a", None, "", "日本語テキスト", "None"])
    got = fnv1a64_arrow(arr)
    want = fnv1a64(["a", "None", "", "日本語テキスト", "None"])
    np.testing.assert_array_equal(got, want)
    assert got[1] == got[4]
    # sliced array keeps offsets straight
    np.testing.assert_array_equal(fnv1a64_arrow(arr.slice(2, 2)), want[2:4])
    # chunked arrays combine
    ch = pa.chunked_array([["x", "yy"], ["zzz"]])
    np.testing.assert_array_equal(fnv1a64_arrow(ch), fnv1a64(["x", "yy", "zzz"]))
    # all-empty column and zero-row column
    np.testing.assert_array_equal(fnv1a64_arrow(pa.array(["", ""])), fnv1a64(["", ""]))
    assert len(fnv1a64_arrow(pa.array([], type=pa.string()))) == 0
    # fnv1a64 itself dispatches Arrow input to the buffer path
    np.testing.assert_array_equal(fnv1a64(arr), got)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(0, 5000), min_size=1, max_size=300, unique=True),
    st.lists(st.sampled_from(["a", "b", "c", None]), min_size=300, max_size=300),
    st.integers(3, 8),
)
def test_bitmap_partial_fold_query_matches_brute_force(ids, vals, chunk_bits):
    """In-process property for the vectorized bitmap index: for ANY
    id set, value assignment and chunk size, partial-blob build + OR
    fold + AND/OR query reproduce the brute-force row sets exactly
    (incl. null values folding under 'None')."""
    import pyarrow as pa

    import rayraster.bitmap as bm

    n = len(ids)
    vals = vals[:n]
    t = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                  "val": pa.array(vals, type=pa.string())})
    # split into two batches to force the fold to merge partials
    partial = bm._make_partial(["val"], "doc_id", chunk_bits, 4)
    p1 = partial(t.slice(0, n // 2))
    p2 = partial(t.slice(n // 2))
    both = pa.concat_tables([p1, p2]).drop_columns(["_part"])
    both = both.append_column(
        "_part", pa.array(np.zeros(both.num_rows, dtype=np.int64)))
    folded = bm._make_fold(chunk_bits)(both)
    got: dict = {}
    for v, ch, b in zip(folded["val"].to_pylist(), folded["chunk"].to_pylist(),
                        folded["bits"].to_pylist()):
        pos = np.flatnonzero(np.unpackbits(
            np.frombuffer(b, dtype=np.uint8), bitorder="little"))
        got.setdefault(v, set()).update(
            (int(ch) << chunk_bits) | int(p) for p in pos)
    want: dict = {}
    for i, v in zip(ids, vals):
        want.setdefault(str(v), set()).add(i)
    assert got == want
