"""Text analysis operators: token counts, quality scoring, language
ID, fingerprinting — the per-document metrics a training-data pipeline
computes before filtering (task-brief extension; no reference analog).

All stages are stateless map_batches over Arrow batches; the regex
work uses pyarrow.compute's RE2 kernels (vectorized, C++).  Formulas
that feed SQL-parity queries keep the exact op order of their DuckDB
twins in __ray_entry__.py.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

_WS = r"\s+"


def token_metrics(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """token_count (\\S+ runs), char_count, digit/punct/upper counts,
    ws-token mean length — all vectorized RE2 counts.

    SQL twins use duckdb ``regexp_extract_all`` lengths with the same
    patterns (RE2 on both sides ⇒ identical counts).  NULL text ≡ ''
    (all counts 0) — null counts would otherwise NaN-poison every
    downstream ratio (quality_score)."""
    t = pc.fill_null(batch[text_col], "")
    n_chars = pc.utf8_length(t).cast(pa.int64())
    tokens = pc.count_substring_regex(t, r"\S+").cast(pa.int64())
    digits = pc.count_substring_regex(t, r"[0-9]").cast(pa.int64())
    punct = pc.count_substring_regex(t, r"[.,;:!?]").cast(pa.int64())
    upper = pc.count_substring_regex(t, r"[A-Z]").cast(pa.int64())
    batch = batch.append_column("n_chars_m", n_chars)
    batch = batch.append_column("token_count", tokens)
    batch = batch.append_column("digit_count", digits)
    batch = batch.append_column("punct_count", punct)
    batch = batch.append_column("upper_count", upper)
    return batch


def quality_score(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic quality score in [0, 1] from exact integer counts.

    score = 0.4·min(1, tokens/100) + 0.3·(1 − min(1, digit_ratio·5))
          + 0.3·(1 − min(1, punct_ratio·10)),  ratios over max(chars,1)

    Every operand derives from int counts, so the one float expression
    is bit-reproducible by the SQL twin."""
    b = token_metrics(batch, text_col)
    chars = b["n_chars_m"].to_numpy(zero_copy_only=False).astype(np.float64)
    toks = b["token_count"].to_numpy(zero_copy_only=False).astype(np.float64)
    digs = b["digit_count"].to_numpy(zero_copy_only=False).astype(np.float64)
    pun = b["punct_count"].to_numpy(zero_copy_only=False).astype(np.float64)
    denom = np.maximum(chars, 1.0)
    score = (
        0.4 * np.minimum(1.0, toks / 100.0)
        + 0.3 * (1.0 - np.minimum(1.0, digs / denom * 5.0))
        + 0.3 * (1.0 - np.minimum(1.0, pun / denom * 10.0))
    )
    return b.append_column("quality", pa.array(score))


# GPT-2-style pre-tokenizer split pattern, RE2-compatible (no
# lookahead — the original's `\s+(?!\S)` arm is folded into `\s+`),
# ASCII classes so pyarrow and DuckDB count identically.  This counts
# BPE pre-tokens (the units a byte-pair encoder would then merge) —
# the "BPE-ish regex" token count the training-data brief asks for.
BPE_SPLIT_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+"


def bpe_token_count(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """``bpe_token_count`` column: non-overlapping matches of the BPE
    pre-tokenizer split regex (vectorized RE2; DuckDB twin uses the
    same pattern)."""
    c = pc.count_substring_regex(
        pc.fill_null(batch[text_col], ""), BPE_SPLIT_RE
    ).cast(pa.int64())
    return batch.append_column("bpe_token_count", c)


# ---------------------------------------------------------------------------
# trained BPE merges — the merged-token count after applying a learned
# merge table to the pre-tokens
# ---------------------------------------------------------------------------
#
# The trainable universe is (consonant, vowel) character pairs.  Any
# merge table drawn from it has disjoint first/second symbol sets, so
# within a pre-token no two merge occurrences can overlap or chain
# (an occurrence's second char would have to be another's first), and
# full rank-ordered BPE application degenerates to ONE round merging
# every original occurrence: merged_count = chars − Σ occurrences.
# That closed form is what makes the operator (a) fully vectorized —
# byte-level bigram counting, no per-row tokenizer loop — and (b)
# SQL-oracle-exact; the generic iterative applier (`bpe_apply_count`,
# arbitrary/chaining merges) is the reference the closed form is
# pytest-proven against.

BPE_CONSONANTS = "bcdfghjklmnpqrstvwxyz"
BPE_VOWELS = "aeiou"


def _texts_as_bytes(col) -> tuple[np.ndarray, np.ndarray]:
    """(byte array, row offsets) of a string column: ZERO-COPY views of
    Arrow's own offsets + data buffers (no per-row Python string
    round-trip — this runs per batch in the BPE kernels).
    ASCII-substring counting on bytes equals codepoint counting
    (multi-byte UTF-8 units are ≥ 0x80 and can never alias an ASCII
    pair)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    if pa.types.is_large_string(col.type):
        col = col.cast(pa.string())
    # buffers(): [validity, int32 offsets, utf8 data]; honor the slice
    # offset — a sliced array's buffers cover the WHOLE parent
    raw_offs = np.frombuffer(col.buffers()[1], dtype=np.int32)
    offs = raw_offs[col.offset : col.offset + len(col) + 1].astype(np.int64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)[offs[0] : offs[-1]]
    return data, offs - offs[0]


_ALNUM_LUT = np.zeros(256, dtype=bool)
for _c in (
    list(range(ord("a"), ord("z") + 1))
    + list(range(ord("A"), ord("Z") + 1))
    + list(range(ord("0"), ord("9") + 1))
):
    _ALNUM_LUT[_c] = True


def _contraction_spans(b: np.ndarray, offs: np.ndarray):
    """Positions where a contraction arm of BPE_SPLIT_RE splits a
    letter run, with the (last-arm-letter, following-letter) pair that
    therefore SPANS a pre-token boundary.  Returns (row_idx,
    first_byte, second_byte) arrays.

    An apostrophe starts a token iff the previous char is alphanumeric
    (a letter/digit run just ended) or it sits at a row start — after
    whitespace or punctuation the punct arm swallows the apostrophe
    and no contraction match happens.  Arms and their boundary letter:
    's 't 'm 'd → that letter; 'll → l; 're 've → e."""
    apos = np.nonzero(b == ord("'"))[0]
    if len(apos) == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z.astype(np.uint8), z.astype(np.uint8)
    row = np.searchsorted(offs, apos, side="right") - 1
    at_start = apos == offs[row]
    prev_ok = np.zeros(len(apos), dtype=bool)
    inner = ~at_start
    prev_ok[inner] = _ALNUM_LUT[b[apos[inner] - 1]]
    tok_start = at_start | prev_ok
    row_end = offs[row + 1]

    def nxt(k: int) -> np.ndarray:
        """byte at apos+k, 0 where it would cross the row end."""
        p = apos + k
        ok = p < row_end
        out = np.zeros(len(apos), dtype=np.uint8)
        out[ok] = b[p[ok]]
        return out

    b1, b2, b3 = nxt(1), nxt(2), nxt(3)
    rows_out, firsts, seconds = [], [], []
    # single-letter arms — 's 't 'm 'd (alternation order puts 're/'ve
    # between 't and 'm, but first bytes are distinct so order is moot)
    single = np.isin(b1, np.frombuffer(b"stmd", dtype=np.uint8))
    m = tok_start & single
    rows_out.append(row[m]); firsts.append(b1[m]); seconds.append(b2[m])
    # 'll
    m = tok_start & (b1 == ord("l")) & (b2 == ord("l"))
    rows_out.append(row[m])
    firsts.append(np.full(int(m.sum()), ord("l"), dtype=np.uint8))
    seconds.append(b3[m])
    # 're / 've
    m = tok_start & np.isin(b1, np.frombuffer(b"rv", dtype=np.uint8)) & (b2 == ord("e"))
    rows_out.append(row[m])
    firsts.append(np.full(int(m.sum()), ord("e"), dtype=np.uint8))
    seconds.append(b3[m])
    return (
        np.concatenate(rows_out),
        np.concatenate(firsts),
        np.concatenate(seconds),
    )


def cv_pair_counts(col, firsts: str = BPE_CONSONANTS,
                   seconds: str = BPE_VOWELS) -> np.ndarray:
    """(len(firsts), len(seconds)) int64 matrix of WITHIN-pre-token
    adjacent character-pair counts over a string column — one
    vectorized byte pass: raw bigram histogram (row-boundary pairs
    masked) minus the contraction-split boundary pairs.  This is the
    BPE training statistic."""
    b, offs = _texts_as_bytes(col)
    if len(b) < 2:
        return np.zeros((len(firsts), len(seconds)), dtype=np.int64)
    idx = b[:-1].astype(np.int64) * 256 + b[1:]
    # mask pairs that straddle a row boundary
    starts = offs[1:-1]  # interior row starts
    valid = np.ones(len(idx), dtype=bool)
    inb = starts[(starts > 0) & (starts < len(b))]
    valid[inb - 1] = False
    hist = np.bincount(idx[valid], minlength=65536)
    srow, sf, ss = _contraction_spans(b, offs)
    span = np.zeros(65536, dtype=np.int64)
    if len(sf):
        np.add.at(span, sf.astype(np.int64) * 256 + ss, 1)
    f = np.frombuffer(firsts.encode(), dtype=np.uint8).astype(np.int64)
    s = np.frombuffer(seconds.encode(), dtype=np.uint8).astype(np.int64)
    cells = f[:, None] * 256 + s[None, :]
    return (hist[cells] - span[cells]).astype(np.int64)


def bpe_train_merges(
    ds,
    text_col: str = "text",
    n_merges: int = 8,
    firsts: str = BPE_CONSONANTS,
    seconds: str = BPE_VOWELS,
) -> list[str]:
    """Train a merge table: one distributed map-only pass folds a
    per-batch (|firsts|×|seconds|) pair-count matrix (the only bytes
    that ever reach the driver), then the top ``n_merges`` pairs win
    by (count desc, pair asc) — deterministic for any partitioning
    because integer partial sums are order-free.  The candidate
    universe (consonant→vowel) guarantees the disjointness the
    closed-form applier needs; see the section comment."""

    def partial(t: pa.Table) -> pa.Table:
        m = cv_pair_counts(t[text_col], firsts, seconds)
        return pa.table({"blob": pa.array([m.tobytes()], type=pa.binary())})

    total = np.zeros((len(firsts), len(seconds)), dtype=np.int64)
    folded = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    for t in folded.iter_batches(batch_format="pyarrow", batch_size=256):
        for blob in t["blob"].to_pylist():
            total += np.frombuffer(blob, dtype=np.int64).reshape(total.shape)
    pairs = [
        (f + s, int(total[i, j]))
        for i, f in enumerate(firsts)
        for j, s in enumerate(seconds)
    ]
    pairs.sort(key=lambda kv: (-kv[1], kv[0]))
    return [p for p, _ in pairs[:n_merges]]


def _validate_merges(merges: list[str]) -> None:
    fs, ss = set(), set()
    for m in merges:
        if len(m) != 2 or not m.isascii() or not m.isalpha() or m[0] == m[1]:
            raise ValueError(f"merge {m!r}: need two distinct ASCII letters")
        fs.add(m[0]); ss.add(m[1])
    if fs & ss:
        raise ValueError(
            f"merge table firsts∩seconds = {sorted(fs & ss)} — occurrences "
            "could chain; use bpe_apply_count (iterative) instead"
        )


def bpe_merged_token_count(
    batch: pa.Table,
    merges: list[str],
    text_col: str = "text",
    out_col: str = "bpe_token_count",
) -> pa.Table:
    """Merged-token count after applying ``merges`` to the pre-tokens:
    chars − Σ within-pre-token occurrences, valid for any merge table
    with disjoint first/second symbol sets (validated; equals full
    rank-ordered BPE — proven against :func:`bpe_apply_count`).
    Vectorized: one C++ ``count_substring`` per merge plus one shared
    byte pass for the contraction-boundary correction."""
    _validate_merges(merges)
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    total = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(col)
    occ = np.zeros(n, dtype=np.int64)
    for m in merges:
        occ += pc.count_substring(col, m).to_numpy(zero_copy_only=False)
    b, offs = _texts_as_bytes(col)
    srow, sf, ss = _contraction_spans(b, offs)
    if len(srow):
        want = {(ord(m[0]), ord(m[1])) for m in merges}
        hit = np.array(
            [(int(a), int(c)) in want for a, c in zip(sf, ss)], dtype=bool
        )
        if hit.any():
            # spanning pairs were counted by count_substring but are
            # NOT within-token merges — remove them from occ
            np.subtract.at(occ, srow[hit], 1)
    merged = total - occ
    return batch.append_column(out_col, pa.array(merged))


def bpe_apply_count(texts, merges: list[str]) -> np.ndarray:
    """Reference ITERATIVE byte-pair encoder: per pre-token, repeatedly
    merge the lowest-rank adjacent pair (all its occurrences, leftmost
    first) until none applies — handles arbitrary/chaining merge
    tables.  Per-unique-token cache (pre-tokens repeat massively).
    This is the slow correctness reference for the closed form, not a
    pipeline stage."""
    import re as _re

    ranks = {m: i for i, m in enumerate(merges)}
    rx = _re.compile(BPE_SPLIT_RE)
    cache: dict[str, int] = {}

    def tok_count(tok: str) -> int:
        hit = cache.get(tok)
        if hit is not None:
            return hit
        syms = list(tok)
        while len(syms) > 1:
            best_rank, best = None, None
            for a, b2 in zip(syms, syms[1:]):
                r = ranks.get(a + b2)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best = r, a + b2
            if best is None:
                break
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] + syms[i + 1] == best:
                    out.append(best)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        cache[tok] = len(syms)
        return len(syms)

    return np.array(
        [sum(tok_count(t) for t in rx.findall(s or "")) for s in texts],
        dtype=np.int64,
    )


# ---------------------------------------------------------------------------
# BM25 ranked retrieval over a persisted scored index
# ---------------------------------------------------------------------------


def build_scored_index(
    docs,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
) -> str:
    """BM25-ready persisted index: ``(word, doc_id, tf, dl)`` postings
    hash-bucketed by word (the Lucene norm-in-posting trick — the doc
    LENGTH rides every posting, so query-time scoring is map-only over
    the probed buckets with no doc-table join), plus a
    ``_bm25_stats.json`` sidecar with the corpus doc count and total
    token count (→ avgdl).  Same bucketed layout/manifest as
    :func:`build_inverted_index`; pay the posting exchange once at
    ingest, read only the query terms' buckets forever after."""
    import json as _json
    import os

    from rayraster.join import write_bucketed

    def posting_rows(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"word": pa.array([], type=pa.string()),
             id_col: pa.array([], type=pa.int64()),
             "tf": pa.array([], type=pa.int64()),
             "dl": pa.array([], type=pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        text = _combined(pc.fill_null(batch[text_col], ""))
        flat, doc = _split_words_flat(text)
        if len(flat) == 0:
            return empty
        # tf per (doc, word) via one C++ group_by (docs are single
        # rows → in-batch counts ARE the global tf); dl = word count
        t = pa.table({"_d": pa.array(doc), "word": flat})
        tf = t.group_by(["_d", "word"]).aggregate([("word", "count")])
        dl = np.bincount(doc, minlength=batch.num_rows).astype(np.int64)
        d = tf["_d"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "word": tf["word"],
                id_col: pa.array(ids[d]),
                "tf": tf["word_count"].cast(pa.int64()),
                "dl": pa.array(dl[d]),
            }
        )

    pairs = docs.map_batches(
        posting_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    out = write_bucketed(pairs, "word", path, num_buckets=num_buckets)

    # corpus stats sidecar: one (docs, tokens) int64 pair per batch
    # reaches the driver.  Token count = Σ count_substring_regex(\S+)
    # — the same value as len(_split_words_flat(...)) but a single RE2
    # counting pass instead of re-tokenizing the whole corpus a
    # second time (no token array materialized)
    def stats(batch: pa.Table) -> pa.Table:
        text = _combined(pc.fill_null(batch[text_col], ""))
        tok = pc.sum(pc.count_substring_regex(text, r"\S+")).as_py() or 0
        return pa.table(
            {"n": pa.array([batch.num_rows], type=pa.int64()),
             "tok": pa.array([int(tok)], type=pa.int64())}
        )

    n_docs = tokens = 0
    folded = docs.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)
    for t in folded.iter_batches(batch_format="pyarrow", batch_size=1024):
        n_docs += int(pc.sum(t["n"]).as_py() or 0)
        tokens += int(pc.sum(t["tok"]).as_py() or 0)
    with open(os.path.join(path, "_bm25_stats.json"), "w") as f:
        _json.dump({"n_docs": n_docs, "total_tokens": tokens}, f)
    return out


def _probed_bucket_files(path: str, terms) -> "list[str]":
    """Parquet files of ONLY the buckets the given terms hash into
    (intersected with the manifest's written set) — the shared
    bucket-pruned listing used by every probed index read."""
    import glob as _glob
    import os

    from rayraster.join import _read_bucket_manifest, key_bucket

    m = _read_bucket_manifest(path)
    B = m["num_buckets"]
    written = set(m.get("buckets_written", []))
    buckets = sorted(
        set(int(b) for b in key_bucket(pa.array(list(terms), type=pa.string()), B))
        & written
    )
    return [
        f
        for b in buckets
        for f in sorted(_glob.glob(os.path.join(path, f"_bucket={b}", "*.parquet")))
    ]


def bm25_search(
    path: str,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    num_partitions: int = 8,
):
    """BM25 ranked retrieval over a :func:`build_scored_index` layout:
    reads ONLY the query terms' buckets, scores each posting map-only
    (idf, tf saturation and length norm all from the posting row +
    broadcast stats), one hash-partitioned per-doc aggregate, then a
    distributed top-``k`` by (score desc, id asc).

    Oracle-exactness rules: the division-only idf
    ``(N − df + ½)/(df + ½)`` (the module's documented log-free trade,
    see :func:`tfidf_topk_terms`), every float expression written as
    ONE fixed tree both engines evaluate identically, and the per-doc
    term sum taken in sorted-term order via per-term columns (a
    grouped float SUM would be order-nondeterministic; one nonzero per
    column is exact).  Returns a Dataset of (doc_id, score, rank)."""
    import glob as _glob
    import json as _json
    import os

    import pyarrow.dataset as pads
    import ray.data as rd

    from rayraster.agg import grouped_topk, hash_aggregate
    from rayraster.join import _read_bucket_manifest, key_bucket

    terms = sorted(set(terms))
    if not terms:
        raise ValueError("bm25_search: need at least one term")
    with open(os.path.join(path, "_bm25_stats.json")) as f:
        st = _json.load(f)
    N = int(st["n_docs"])
    avgdl = st["total_tokens"] / max(1, N)  # ONE division, shared with the twin
    files = _probed_bucket_files(path, terms)
    s_cols = [f"s_{i}" for i in range(len(terms))]
    empty = pa.table(
        {id_col: pa.array([], type=pa.int64()),
         "score": pa.array([], type=pa.float64()),
         "rank": pa.array([], type=pa.int64())}
    )
    if not files:
        return rd.from_arrow(empty)
    tset = pa.array(terms, type=pa.string())
    post = rd.read_parquet(
        files,
        columns=["word", id_col, "tf", "dl"],
        filter=pads.field("word").isin(terms),
    )

    # df per term — a bounded aggregate (≤ len(terms) rows) computed
    # from the complete posting lists already being read
    dfs = {
        r["word"]: int(r["n"])
        for r in hash_aggregate(
            post, ["word"], count=True, num_partitions=num_partitions
        ).take_all()
    }
    idf = {
        t: (N - dfs.get(t, 0) + 0.5) / (dfs.get(t, 0) + 0.5) for t in terms
    }

    def score(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        t = t.filter(_pc.is_in(t["word"], value_set=tset))
        words = t["word"].to_numpy(zero_copy_only=False)
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        # the ONE shared expression tree (parens mirror the SQL twin):
        # idf * ((tf * (k1+1)) / (tf + k1 * ((1-b) + b * (dl/avgdl))))
        s = tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * (dl / avgdl)))
        cols = {id_col: t[id_col]}
        for i, term in enumerate(terms):
            mask = words == term
            vals = np.zeros(len(words), dtype=np.float64)
            vals[mask] = idf[term] * s[mask]
            cols[s_cols[i]] = pa.array(vals)
        return pa.table(cols)

    scored = post.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    per_doc = hash_aggregate(
        scored, [id_col], sum_cols=s_cols, count=False,
        num_partitions=num_partitions,
    )

    def total(t: pa.Table) -> pa.Table:
        acc = t[f"sum_{s_cols[0]}"].to_numpy(zero_copy_only=False).copy()
        for c in s_cols[1:]:
            acc = acc + t[f"sum_{c}"].to_numpy(zero_copy_only=False)
        return pa.table(
            {id_col: t[id_col], "score": pa.array(acc),
             "_one": pa.array(np.zeros(t.num_rows, dtype=np.int64))}
        )

    ranked = grouped_topk(
        per_doc.map_batches(total, batch_format="pyarrow"),
        ["_one"], "score", k, descending=True, tie_col=id_col,
        num_partitions=1,
    )
    return ranked.map_batches(
        lambda t: pa.table(
            {id_col: t[id_col], "score": t["score"],
             "rank": t["rnk"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )


# URL canonicalization — the web-crawl dedup key normalizer.
_URL_PARTS_RE = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<host>[^/?#:]+)"
    r"(?::(?P<port>[0-9]+))?(?P<path>[^?#]*)"
    r"(?:\?(?P<query>[^#]*))?(?:#(?P<frag>.*))?$"
)
_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_url(
    batch: pa.Table, url_col: str = "url", out_col: str = "url_canon"
) -> pa.Table:
    """Canonical URL form (crawl-dedup key): lowercase scheme+host,
    default port stripped, empty path → ``/``, query parameters
    sorted bytewise, fragment dropped.  Vectorized: one RE2
    ``extract_regex`` for the parts, one C++ sort for the flattened
    query parameters, offset-arithmetic rebuild + ``binary_join``
    (same idiom as :func:`c4_line_filter`).  Rows that don't parse as
    ``scheme://host...`` pass through UNCHANGED (relative/garbage
    URLs are not this operator's business)."""
    col = batch[url_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    filled = pc.fill_null(col, "")
    parts = pc.extract_regex(filled, pattern=_URL_PARTS_RE)
    ok = pc.is_valid(parts)
    scheme = pc.utf8_lower(pc.fill_null(pc.struct_field(parts, "scheme"), ""))
    host = pc.utf8_lower(pc.fill_null(pc.struct_field(parts, "host"), ""))
    port = pc.fill_null(pc.struct_field(parts, "port"), "")
    path = pc.fill_null(pc.struct_field(parts, "path"), "")
    query = pc.fill_null(pc.struct_field(parts, "query"), "")

    # default/empty port → no ':port'; else keep
    sch_np = scheme.to_numpy(zero_copy_only=False)
    port_np = port.to_numpy(zero_copy_only=False)
    keep_port = np.array(
        [p != "" and p != _DEFAULT_PORTS.get(s, "") for s, p in zip(sch_np, port_np)],
        dtype=bool,
    )
    port_part = pc.if_else(
        pa.array(keep_port), pc.binary_join_element_wise(":", port, ""), ""
    )
    path = pc.if_else(pc.equal(path, ""), "/", path)

    # sort query params bytewise within each URL: flatten, stable-sort
    # by (url index, param), rebuild lists from the unchanged counts
    plist = pc.split_pattern(query, "&")
    if isinstance(plist, pa.ChunkedArray):
        plist = plist.combine_chunks()
    offs = plist.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = plist.values.slice(offs[0], offs[-1] - offs[0])
    offs = offs - offs[0]
    seg = np.repeat(np.arange(len(filled), dtype=np.int64), np.diff(offs))
    order = pa.table({"seg": seg, "p": flat}).sort_by(
        [("seg", "ascending"), ("p", "ascending")]
    )
    sorted_list = pa.ListArray.from_arrays(
        pa.array(offs, type=pa.int32()), order["p"].combine_chunks()
    )
    sorted_q = pc.binary_join(sorted_list, "&")
    q_part = pc.if_else(
        pc.equal(query, ""), "", pc.binary_join_element_wise("?", sorted_q, "")
    )
    canon = pc.binary_join_element_wise(
        scheme, "://", host, port_part, path, q_part, ""
    )
    out = pc.if_else(ok, canon, col)
    return batch.append_column(out_col, out)


# C4-style line filtering (Raffel et al. 2020 §2.2): keep lines that
# look like prose — ≥ min_words words AND terminal punctuation — and
# rebuild the document from the survivors.
C4_TERMINALS = (".", "!", "?", '"')


def c4_line_filter(
    batch: pa.Table,
    text_col: str = "text",
    min_words: int = 3,
    out_col: str = "text_c4",
) -> pa.Table:
    """The C4 line-level cleaning rule, vectorized end-to-end: split
    on newlines (one C++ pass), per-line word counts + terminal-punct
    checks on the FLATTENED line array, then rebuild each document
    from its kept lines via offset arithmetic + ``binary_join`` — no
    per-row Python.  Documents with no surviving line become ``""``
    (NULL text ≡ '' per the module convention)."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    lines_list = pc.split_pattern(col, "\n")
    if isinstance(lines_list, pa.ChunkedArray):
        lines_list = lines_list.combine_chunks()
    offs = lines_list.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    # the list child is RAW (offsets include any slice offset) —
    # window it so mask indices and list offsets share coordinates
    flat = lines_list.values.slice(offs[0], offs[-1] - offs[0])
    offs = offs - offs[0]
    words = pc.count_substring_regex(flat, r"\S+").to_numpy(zero_copy_only=False)
    keep = words >= min_words
    term = pc.ends_with(flat, pattern=C4_TERMINALS[0])
    for t in C4_TERMINALS[1:]:
        term = pc.or_(term, pc.ends_with(flat, pattern=t))
    keep &= term.to_numpy(zero_copy_only=False)
    # rebuild: kept-line count per doc = prefix-sum difference of the
    # mask at the doc boundaries → new list offsets over the kept
    # lines (order-preserving: filter scans left→right and offsets
    # are monotone)
    csum = np.concatenate([[0], np.cumsum(keep.astype(np.int64))])
    new_offs = csum[offs]  # kept lines before each boundary
    kept_flat = flat.filter(pa.array(keep))
    rebuilt = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(new_offs, type=pa.int32()), kept_flat),
        "\n",
    )
    return batch.append_column(out_col, rebuilt)


# ---------------------------------------------------------------------------
# text → embedding: hashed character-n-gram count vectors
# ---------------------------------------------------------------------------


def hashed_ngram_embed(
    batch: pa.Table,
    text_col: str = "text",
    dim: int = 64,
    out_col: str = "embedding",
) -> pa.Table:
    """Deterministic text embedding: the INTEGER count vector of
    hashed character trigrams — ``h = (c₁·961 + c₂·31 + c₃) mod dim``
    over codepoints (a polynomial base-31 hash both numpy and ANSI SQL
    can express: ``unicode(substr(...))`` arithmetic).  Integer counts
    make downstream dot-product ranking bit-exact under ANY summation
    order — the property that lets an ANN gate over learned-ish text
    vectors be oracle-checkable (float embeddings would tie-break on
    summation order).  One vectorized pass: codepoints via a single
    utf-32 decode, trigram hashes by array arithmetic, per-(row, dim)
    scatter-add.  Output: ``fixed_size_list<int64>[dim]``."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    texts = pc.fill_null(col, "").to_pylist()
    joined = "".join(texts)
    cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    lens = np.array([len(s) for s in texts], dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)])
    n = len(texts)
    counts = np.zeros(n * dim, dtype=np.int64)
    if len(cp) >= 3:
        pos = np.arange(len(cp) - 2, dtype=np.int64)
        row = np.searchsorted(offs, pos, side="right") - 1
        valid = pos + 3 <= offs[row + 1]  # trigram fully inside its row
        h = (cp[:-2] * 961 + cp[1:-1] * 31 + cp[2:]) % dim
        np.add.at(counts, row[valid] * dim + h[valid], 1)
    arr = pa.FixedSizeListArray.from_arrays(pa.array(counts, type=pa.int64()), dim)
    return batch.append_column(out_col, arr)


# ---------------------------------------------------------------------------
# language ID — vectorized stopword-count + script-range heuristic
# ---------------------------------------------------------------------------

# tiny per-language stopword profiles (top function words); heuristic
# n-gram/stopword scoring per the task brief — not a trained model.
# Order matters: ties break to the FIRST language in this list.
_PROFILES = [
    ("en", ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for")),
    ("de", ("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den")),
    ("fr", ("le", "la", "et", "les", "des", "est", "un", "une", "dans", "que")),
    ("es", ("el", "la", "de", "que", "los", "las", "es", "un", "una", "por")),
]

_CJK_RE = "[一-鿿]"
_CJK_MIN = 5  # > this many CJK codepoints → zh


def _profile_regex(words) -> str:
    return r"\b(" + "|".join(words) + r")\b"


class LangIdStage:
    """map_batches stage: stopword-count vote + CJK script-range rule.

    Fully vectorized: one RE2 ``count_substring_regex`` pass per
    language profile plus one CJK codepoint-range count — no per-row
    Python.  Emits ``lang_pred`` and ``lang_conf`` (winning stopword
    count over \\S+ token count).  Deterministic decision rule (the
    SQL twin in __ray_entry__ reproduces it bit-for-bit):

      cjk > 5                  → zh, conf 1.0
      max(count) = 0 or toks=0 → und, conf 0.0
      else                     → first profile with the max count,
                                 conf = max_count / toks
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.patterns = [(lang, _profile_regex(ws)) for lang, ws in _PROFILES]

    def __call__(self, batch: pa.Table) -> pa.Table:
        # NULL text ≡ '' → und/0.0 (a null count_substring_regex result
        # would NaN-cast to an arbitrary int and mispredict)
        t = pc.fill_null(batch[self.text_col], "")
        lower = pc.utf8_lower(t)
        cjk = pc.count_substring_regex(t, _CJK_RE).to_numpy(zero_copy_only=False)
        toks = (
            pc.count_substring_regex(t, r"\S+")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        counts = np.stack(
            [
                pc.count_substring_regex(lower, pat)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
                for _, pat in self.patterns
            ],
            axis=1,
        )  # (n, n_langs)
        best_idx = counts.argmax(axis=1)  # first max wins (profile order)
        best_v = counts[np.arange(len(toks)), best_idx]
        langs = np.array([lang for lang, _ in self.patterns])
        pred = langs[best_idx]
        is_zh = cjk > _CJK_MIN
        is_und = (~is_zh) & ((best_v == 0) | (toks == 0))
        pred = np.where(is_zh, "zh", np.where(is_und, "und", pred))
        conf = np.where(
            is_zh,
            1.0,
            np.where(
                is_und,
                0.0,
                best_v.astype(np.float64) / np.maximum(toks, 1).astype(np.float64),
            ),
        )
        batch = batch.append_column("lang_pred", pa.array(pred.tolist(), type=pa.string()))
        return batch.append_column("lang_conf", pa.array(conf, type=pa.float64()))


def langid_sql(text_col: str = "text") -> tuple[str, str, str]:
    """(CTE column list, lang_pred CASE, lang_conf CASE) — the DuckDB
    twin of :class:`LangIdStage` (both sides RE2, identical patterns
    and decision order ⇒ bit-exact)."""
    count_cols = ", ".join(
        rf"CAST(length(regexp_extract_all(lower({text_col}), '{_profile_regex(ws)}')) AS BIGINT) AS c_{lang}"
        for lang, ws in _PROFILES
    )
    cte_cols = (
        rf"CAST(length(regexp_extract_all({text_col}, '{_CJK_RE}')) AS BIGINT) AS cjk, "
        rf"CAST(length(regexp_extract_all({text_col}, '\S+')) AS BIGINT) AS toks, "
        + count_cols
    )
    names = [lang for lang, _ in _PROFILES]
    gmax = "greatest(" + ", ".join(f"c_{lang}" for lang in names) + ")"
    # first-wins argmax: lang i wins when its count >= all later counts
    arms = []
    for i, lang in enumerate(names[:-1]):
        cond = " AND ".join(f"c_{lang} >= c_{o}" for o in names[i + 1 :])
        arms.append(f"WHEN {cond} THEN '{lang}'")
    pred = (
        f"CASE WHEN cjk > {_CJK_MIN} THEN 'zh' "
        f"WHEN {gmax} = 0 OR toks = 0 THEN 'und' "
        + " ".join(arms)
        + f" ELSE '{names[-1]}' END"
    )
    conf = (
        f"CASE WHEN cjk > {_CJK_MIN} THEN 1.0 "
        f"WHEN {gmax} = 0 OR toks = 0 THEN 0.0 "
        f"ELSE CAST({gmax} AS DOUBLE) / CAST(greatest(toks, 1) AS DOUBLE) END"
    )
    return cte_cols, pred, conf


# ---------------------------------------------------------------------------
# fingerprints
# ---------------------------------------------------------------------------


def json_extract_int(batch: pa.Table, json_col: str, key: str, out_col: str) -> pa.Table:
    """Extract an integer field from a JSON string column.

    Fast path (no JSON kernel in pyarrow 16): one vectorized RE2
    ``extract_regex`` pass with an ANCHORED whole-string pattern for
    the single-scalar-key object shape (``{"key": 123}``) — anchoring
    is what makes the regex sound (an unanchored ``"k": \\d+`` could
    match inside a nested string VALUE).  Rows the anchor rejects
    (extra keys, floats, nesting, malformed) fall back to stdlib
    ``json.loads`` row-by-row — only the misses pay the Python loop.
    Rows that lack the key or fail to parse yield null."""
    import re as _re

    col = batch[json_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    pat = r'^\s*\{\s*"' + _re.escape(key) + r'"\s*:\s*(?P<v>-?[0-9]+)\s*\}\s*$'
    hit = pc.extract_regex(col, pattern=pat)
    vals = pc.struct_field(hit, "v").cast(pa.int64())
    misses = pc.and_(pc.is_null(vals), pc.is_valid(col))
    if pc.any(misses).as_py():
        import json as _json

        # to_pylist keeps the regex hits EXACT int64 — to_numpy on a
        # null-bearing int64 column float-promotes and corrupts
        # values above 2^53
        out = vals.to_pylist()
        for i in np.nonzero(misses.to_numpy(zero_copy_only=False))[0]:
            try:
                v = _json.loads(col[int(i)].as_py()).get(key)
                out[i] = int(v) if v is not None else None
            except (ValueError, TypeError, AttributeError):
                out[i] = None
        vals = pa.array(out, type=pa.int64())
    return batch.append_column(out_col, vals)


# PII scrubbing patterns — RE2-compatible, ASCII classes, ordered
# (email first so its user/host digits can't be half-eaten by the
# phone rule).  DuckDB twins use the same patterns via
# regexp_replace(..., 'g'), same engine ⇒ identical rewrites.
PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
    (r"\+?[0-9][0-9()\-\s]{6,}[0-9]\b", "[PHONE]"),
]


def redact_pii(batch: pa.Table, text_col: str = "text",
               out_col: str = "text_redacted") -> pa.Table:
    """PII scrubbing (training-data hygiene): emails, IPv4 addresses
    and phone-shaped digit runs replaced by typed placeholders — one
    vectorized RE2 ``replace_substring_regex`` pass per pattern, in a
    fixed order."""
    t = batch[text_col]
    for pat, repl in PII_PATTERNS:
        t = pc.replace_substring_regex(t, pattern=pat, replacement=repl)
    return batch.append_column(out_col, t)


def pii_sql_expr(col: str) -> str:
    """The DuckDB twin of :func:`redact_pii`: nested
    ``regexp_replace(..., 'g')`` in the same pattern order."""
    expr = col
    for pat, repl in PII_PATTERNS:
        # DuckDB single-quoted literals keep backslashes verbatim —
        # only quotes need escaping (doubling backslashes would turn
        # \b into an RE2 literal-backslash + b)
        p = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{repl}', 'g')"
    return expr


def normalize_text(
    batch: pa.Table, text_col: str = "text", out_col: str = "text_norm"
) -> pa.Table:
    """Canonical text normalization (dedup/matching preprocessing):
    lowercase, collapse every ``\\s+`` run to one space, strip the
    boundary spaces — all vectorized RE2/utf8 kernels, NULL → NULL.

    The edge trim is itself an RE2 replace (``^ +| +$``) rather than
    ``utf8_trim_whitespace`` so the DuckDB twin
    (:func:`normalize_sql_expr`) is the same engine end-to-end —
    Arrow's trim strips UNICODE whitespace (e.g. NBSP, which ``\\s``
    leaves in place) while SQL ``trim`` strips ASCII spaces only.

    Unicode NFC composition is deliberately NOT applied:
    ``pc.utf8_normalize`` in pyarrow 16 returns decomposed output for
    form="NFC" (measured), so composition-sensitive pipelines should
    normalize at ingest.
    """
    t = pc.utf8_lower(batch[text_col])
    t = pc.replace_substring_regex(t, _WS, " ")
    t = pc.replace_substring_regex(t, r"^ +| +$", "")
    return batch.append_column(out_col, t)


def normalize_sql_expr(col: str) -> str:
    """The DuckDB twin of :func:`normalize_text`."""
    return (
        f"regexp_replace(regexp_replace(lower({col}), '\\s+', ' ', 'g'),"
        " '^ +| +$', '', 'g')"
    )


def fingerprint_md5(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Hex md5 per document — SQL twin: duckdb ``md5(text)``."""
    fp = _md5_hex(batch[text_col])
    return batch.append_column("fingerprint", pa.array(fp, type=pa.string()))


def rolling_fingerprint(batch: pa.Table, text_col: str = "text", window: int = 64) -> pa.Table:
    """winnowing-style fingerprint: min rolling-64-byte polynomial hash
    (cheap near-dup prefilter; rows-only — not SQL-expressible)."""
    from rayraster.dedup import char_shingle_hashes

    out = np.empty(batch.num_rows, dtype=np.int64)
    for i, s in enumerate(batch[text_col].to_pylist()):
        s = s or ""  # NULL text ≡ '' → fingerprint 0
        h = char_shingle_hashes(s, k=min(window, max(1, len(s))))
        out[i] = np.int64(h.min().astype(np.int64)) if len(h) else 0
    return batch.append_column("rfp", pa.array(out))


# ---------------------------------------------------------------------------
# context-window chunking + vocabulary — corpus-preparation operators
# ---------------------------------------------------------------------------


def _md5_hex(strings) -> list[str]:
    """Hex md5 per value of a string array — the binary cast hands
    hashlib the utf-8 buffers without a str decode/encode round trip
    (shared by fingerprint_md5 and chunk_text_windows).  NULL → NULL,
    matching DuckDB ``md5(NULL)``."""
    return [
        None if b is None else hashlib.md5(b).hexdigest()
        for b in strings.cast(pa.binary()).to_pylist()
    ]


def chunk_count(lens: np.ndarray, window: int, stride: int) -> np.ndarray:
    """Standard packing chunk count: one window if the doc fits,
    else 1 + ceil((len − window)/stride) — the LAST window always
    reaches the end of the document and no window is a pure subset of
    the previous one (a tail shorter than the overlap adds no chunk)."""
    eff = np.maximum(lens, 1)
    return np.where(
        eff <= window, 1, (eff - window + stride - 1) // stride + 1
    ).astype(np.int64)


def chunk_text_windows(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 512,
    stride: int = 384,
) -> pa.Table:
    """Split each document into fixed-size codepoint windows (training
    context-window packing): chunk ``k`` covers codepoints
    ``[k·stride, k·stride + window)``; the number of chunks is the
    standard packing count (:func:`chunk_count`) — the last window
    reaches the document end and a tail already covered by the
    previous window emits NO duplicate chunk.  An empty or NULL
    document still yields its one empty chunk (a row in, at least a
    row out).

    Row-expansion is vectorized per window INDEX, not per row: one
    ``utf8_slice_codeunits`` (codepoint-based, like SQL ``substr``)
    over the surviving rows per k, with k bounded by the batch's
    longest document.  Output: ``id_col, chunk_idx, n_chunks,
    chunk_len, chunk_md5`` — the md5 keeps the oracle row narrow while
    pinning the exact chunk BYTES.

    SQL twin: per-doc ``n_chunks`` CTE + ``range`` + ``substr`` +
    ``md5``."""
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    texts = pc.fill_null(batch[text_col], "")  # NULL doc ≡ empty doc
    ln = pc.utf8_length(texts).cast(pa.int64()).to_numpy(zero_copy_only=False)
    n_chunks = chunk_count(ln, window, stride)
    max_k = int(n_chunks.max()) if len(n_chunks) else 0
    parts = []
    for k in range(max_k):
        alive = np.flatnonzero(n_chunks > k)
        sub = batch.take(pa.array(alive))
        piece = pc.utf8_slice_codeunits(
            pc.fill_null(sub[text_col], ""), start=k * stride, stop=k * stride + window
        )
        md5 = _md5_hex(piece)
        parts.append(
            pa.table(
                {
                    id_col: sub[id_col],
                    "chunk_idx": pa.array(np.full(len(alive), k, dtype=np.int64)),
                    "n_chunks": pa.array(n_chunks[alive]),
                    "chunk_len": pc.utf8_length(piece).cast(pa.int64()),
                    "chunk_md5": pa.array(md5, type=pa.string()),
                }
            )
        )
    if not parts:
        return pa.table(
            {
                id_col: pa.array([], type=batch[id_col].type),
                "chunk_idx": pa.array([], type=pa.int64()),
                "n_chunks": pa.array([], type=pa.int64()),
                "chunk_len": pa.array([], type=pa.int64()),
                "chunk_md5": pa.array([], type=pa.string()),
            }
        )
    return pa.concat_tables(parts)


def word_count_partial(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch word counts — the map-side COMBINER of the wordcount:
    RE2 ``\\s+`` split (vectorized; the SAME regex engine and pattern
    as the DuckDB twin, so tokenization is bit-identical), flatten,
    drop empty boundary tokens, and pre-aggregate inside the batch so
    the exchange ships one row per (batch, distinct word), not one
    per token."""
    words = pc.list_flatten(pc.split_pattern_regex(batch[text_col], _WS))
    words = words.filter(pc.not_equal(words, ""))
    t = pa.table({"word": words, "_c": np.ones(len(words), dtype=np.int64)})
    out = t.group_by(["word"]).aggregate([("_c", "sum")])
    return pa.table({"word": out["word"], "n": out["_c_sum"]})


def vocab_topk(ds, text_col: str = "text", k: int = 100, num_partitions: int = 64,
               corpus_count: int | None = None):
    """Global vocabulary top-k by frequency: per-batch partial counts
    (combiner above) → hash-partitioned grouped sum → native
    ``sort(count desc, word asc).limit(k)`` — the classic wordcount,
    shaped so the exchange carries distinct words only.  Deterministic
    tie-break on the word itself.  ``corpus_count`` (doc count, if the
    caller knows it) scales the exchange partition count down for
    small corpora — same per-partition fixed-cost rationale as
    :func:`rayraster.dedup._adaptive_parts`.

    SQL twin: ``unnest(string_split_regex(text, '\\s+'))`` (empty
    tokens filtered) + GROUP BY + ORDER BY/LIMIT."""
    from rayraster.agg import hash_aggregate
    from rayraster.dedup import _adaptive_parts

    partial = ds.map_batches(
        lambda t: word_count_partial(t, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    counts = hash_aggregate(
        partial, ["word"], sum_cols=["n"], count=False,
        num_partitions=_adaptive_parts(corpus_count, num_partitions),
    )
    counts = counts.map_batches(
        lambda t: pa.table({"word": t["word"], "n": t["sum_n"]}),
        batch_format="pyarrow",
    )
    return counts.sort(["n", "word"], descending=[True, False]).limit(k)


def tfidf_topk_terms(
    ds,
    corpus_count: int,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 64,
):
    """Per-document top-``k`` characteristic terms by **linear
    TF-IDF**: ``score = (tf * N) / df`` with exact integer ``tf``
    (within-doc term frequency), ``N`` (corpus doc count,
    caller-supplied — parquet metadata knows it) and ``df`` (number of
    distinct docs containing the word).

    The classic ``tf * log(N/df)`` is deliberately NOT used: ``log``
    does not twin bit-exactly across engines (numpy vs DuckDB ``ln``
    differ in the last ulp), while one IEEE division of exact integers
    does.  Linear IDF preserves the signal (monotone in ``tf`` and
    ``1/df``); rankings differ from log-IDF only in how multiple terms
    trade off rarity against frequency — fine for keyword extraction,
    documented here for anyone expecting the textbook formula.
    ``tf * N`` must stay below 2^53 for the float64 conversion to be
    exact (at web scale that is ~10^12 docs × tf 9000 — beyond it,
    pre-divide ``tf/df`` first at the cost of twin exactness).

    Plan (2 shuffles, nothing on the driver):
      1. ``map_batches``: per-doc term frequencies via one C++
         ``group_by`` (docs are single rows, so within-batch counts
         are exact global ``tf``), partitioned by ``fnv1a64(word)`` —
         every row of a word lands in ONE partition;
      2. ``groupby(part).map_groups``: ``df`` per word is locally
         complete (rows are distinct ``(doc, word)`` pairs); score
         each row;
      3. :func:`rayraster.agg.grouped_topk` by doc — per-batch partial
         top-k BEFORE the doc exchange, deterministic ``(score DESC,
         word ASC)`` order (= ``ROW_NUMBER`` twin).
    """
    from rayraster.agg import grouped_topk
    from rayraster.dedup import _adaptive_parts
    from rayraster.geo import fnv1a64

    P = _adaptive_parts(corpus_count, num_partitions)
    N = np.int64(corpus_count)

    def tf_pairs(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "word": pa.array([], type=pa.string()),
                "tf": pa.array([], type=pa.int64()),
                "_part": pa.array([], type=pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        text = _combined(pc.fill_null(batch[text_col], ""))
        flat, doc = _split_words_flat(text)
        if len(flat) == 0:
            return empty
        t = pa.table({id_col: pa.array(ids[doc]), "word": flat})
        out = t.group_by([id_col, "word"]).aggregate([([], "count_all")])
        part = (fnv1a64(out["word"]) % np.uint64(P)).astype(np.int64)
        return pa.table(
            {
                id_col: out[id_col],
                "word": out["word"],
                "tf": out["count_all"].cast(pa.int64()),
                "_part": pa.array(part),
            }
        )

    pairs = ds.map_batches(tf_pairs, batch_format="pyarrow", zero_copy_batch=True)

    def score(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "word": pa.array([], type=pa.string()),
                    "tf": pa.array([], type=pa.int64()),
                    "df": pa.array([], type=pa.int64()),
                    "score": pa.array([], type=pa.float64()),
                }
            )
        codes = (
            pc.dictionary_encode(_combined(group["word"]))
            .indices.to_numpy()
            .astype(np.int64)
        )
        df = np.bincount(codes)[codes]  # rows are distinct (doc, word)
        tf = group["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = (tf * N).astype(np.float64) / df.astype(np.float64)
        return pa.table(
            {
                id_col: group[id_col],
                "word": group["word"],
                "tf": pa.array(tf),
                "df": pa.array(df),
                "score": pa.array(s),
            }
        )

    scored = pairs.groupby("_part").map_groups(score, batch_format="pyarrow")
    return grouped_topk(
        scored, [id_col], "score", k, descending=True, tie_col="word",
        num_partitions=P,
    )


def build_inverted_index(
    docs,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
) -> str:
    """Persisted inverted index: DISTINCT ``(word, doc_id)`` posting
    pairs hash-bucketed by word into a
    :func:`rayraster.join.write_bucketed` layout — the retrieval twin
    of the persisted IVF index (``similarity.ivf_build_index``): pay
    the posting exchange once at ingest, then every query reads ONLY
    the buckets its terms hash to.

    Pairs are emitted fully vectorized (RE2 ``\\s+`` split shared with
    the oracle, dictionary-code lexsort first-occurrence mask for the
    within-doc distinct — docs are single rows, so the in-batch
    distinct IS the global distinct)."""
    from rayraster.join import write_bucketed

    def posting_pairs(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"word": pa.array([], type=pa.string()),
             id_col: pa.array([], type=pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        flat, doc = _split_words_flat(_combined(pc.fill_null(batch[text_col], "")))
        if len(flat) == 0:
            return empty
        order, first = _first_occurrence(flat, doc)
        kept = order[first]
        return pa.table(
            {"word": flat.take(pa.array(kept, type=pa.int64())),
             id_col: pa.array(ids[doc[kept]])}
        )

    pairs = docs.map_batches(
        posting_pairs, batch_format="pyarrow", zero_copy_batch=True
    )
    return write_bucketed(pairs, "word", path, num_buckets=num_buckets)


def search_index(
    path: str,
    terms: list[str],
    mode: str = "and",
    id_col: str = "doc_id",
    num_partitions: int = 8,
):
    """Boolean term search over a :func:`build_inverted_index` layout.

    Reads ONLY the bucket directories the (deduplicated) query terms
    hash to — partition pruning at the storage layer, exactly like the
    IVF probe path — with the term filter pushed into the parquet
    read.  One small hash-partitioned per-doc aggregate finishes:
    ``mode="and"`` keeps docs matching ALL terms (posting pairs are
    distinct, so the per-doc row count IS the distinct-term match
    count), ``mode="or"`` keeps any match.  Returns a Dataset of
    ``(doc_id, n_matched)``.  Size ``num_partitions`` to the expected
    posting volume (a stop-word-scale term streams its whole list
    through this one exchange).

    Posting lists stream through tasks — nothing lands on the driver;
    a stop-word-scale term costs its posting list's read, as in any
    inverted index (filter such terms from ``terms`` first)."""
    import glob as _glob
    import os

    import pyarrow.compute as _pc
    import pyarrow.dataset as pads

    import ray.data as rd

    from rayraster.agg import hash_aggregate
    from rayraster.join import _read_bucket_manifest, key_bucket

    if mode not in ("and", "or"):
        raise ValueError(f'mode must be "and" or "or", got {mode!r}')
    terms = sorted(set(terms))
    if not terms:
        raise ValueError("search_index: need at least one term")
    files = _probed_bucket_files(path, terms)
    empty = pa.table(
        {id_col: pa.array([], type=pa.int64()),
         "n_matched": pa.array([], type=pa.int64())}
    )
    if not files:
        return rd.from_arrow(empty)
    hits = rd.read_parquet(
        files,
        columns=["word", id_col],
        filter=pads.field("word").isin(terms),
    )
    agg = hash_aggregate(
        hits, [id_col], count=True, count_name="n_matched",
        num_partitions=num_partitions,
    )
    if mode == "and":
        need = len(terms)
        agg = agg.map_batches(
            lambda t: t.filter(_pc.greater_equal(t["n_matched"], need)),
            batch_format="pyarrow",
        )
    return agg


# ---------------------------------------------------------------------------
# repetition metrics (Gopher-style quality rules), domain extraction,
# n-gram blocklist decontamination — web-pipeline curation staples
# ---------------------------------------------------------------------------


def _combined(col) -> pa.Array:
    """One contiguous Array from a possibly-chunked table column (a
    shared dictionary requires a single array — per-chunk dictionaries
    would not share codes)."""
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def repetition_metrics(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style repetition quality metrics, fully vectorized.

    Appends per document:

    * ``n_lines``            — ``\\n``-split line count (≥ 1)
    * ``dup_line_frac``      — (lines − distinct lines) / lines
    * ``dup_line_char_frac`` — codepoints in repeat occurrences of a
      line / total line codepoints (0 when the doc is empty)
    * ``top_word_frac``      — occurrences of the most frequent
      ``\\s+`` token / total tokens (0 when there are no tokens)

    Exact string equality comes from ``dictionary_encode`` (shared
    integer codes — no hash collisions), distinct/max counts from one
    ``lexsort`` + segment reductions; every fraction is a single IEEE
    division of exact integer counts, so the DuckDB twin
    (``string_split`` + GROUP BY, same divisions) matches bit-for-bit.
    Rules follow Rae et al. 2021 (Gopher) §A1.1; no reference analog
    (SEraster is spatial-only) — task-brief training-data extension.
    """
    n = batch.num_rows
    if n == 0:
        for name in ("n_lines", "dup_line_frac", "dup_line_char_frac", "top_word_frac"):
            typ = pa.int64() if name == "n_lines" else pa.float64()
            batch = batch.append_column(name, pa.array([], type=typ))
        return batch
    # NULL text ≡ '' (one line, zero tokens) — a null list from
    # split_pattern would otherwise abort the whole task at the
    # zero-copy to_numpy below
    t = _combined(pc.fill_null(batch[text_col], ""))

    # --- line-level: split on literal \n (DuckDB string_split(text, chr(10)))
    lines = pc.split_pattern(t, "\n")
    lens = pc.list_value_length(lines).cast(pa.int64()).to_numpy()
    flat = _combined(pc.list_flatten(lines))
    doc = np.repeat(np.arange(n, dtype=np.int64), lens)
    order, first = _first_occurrence(flat, doc)
    line_chars = pc.utf8_length(flat).cast(pa.int64()).to_numpy()[order]
    offs = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    distinct = np.add.reduceat(first.astype(np.int64), offs)
    rep_chars = np.add.reduceat(np.where(first, 0, line_chars), offs)
    tot_chars = np.add.reduceat(line_chars, offs)
    dup_line_frac = (lens - distinct).astype(np.float64) / lens.astype(np.float64)
    dup_line_char_frac = rep_chars.astype(np.float64) / np.maximum(tot_chars, 1).astype(np.float64)

    # --- word-level: \s+ split, empty boundary tokens dropped (same
    # filter as the twin's list_filter(x -> x <> ''))
    wflat, wdoc = _split_words_flat(t)
    top = np.zeros(n, dtype=np.int64)
    tot_words = np.bincount(wdoc, minlength=n).astype(np.int64)
    if len(wdoc):
        wcodes = pc.dictionary_encode(wflat).indices.to_numpy().astype(np.int64)
        worder = np.lexsort((wcodes, wdoc))
        swc = wcodes[worder]
        swd = wdoc[worder]
        newrun = np.ones(len(swc), dtype=bool)
        newrun[1:] = (swd[1:] != swd[:-1]) | (swc[1:] != swc[:-1])
        run_starts = np.flatnonzero(newrun)
        run_len = np.diff(np.append(run_starts, len(swc)))
        run_doc = swd[run_starts]
        newdoc = np.ones(len(run_doc), dtype=bool)
        newdoc[1:] = run_doc[1:] != run_doc[:-1]
        doc_off = np.flatnonzero(newdoc)
        top[run_doc[doc_off]] = np.maximum.reduceat(run_len, doc_off)
    top_word_frac = np.where(
        tot_words > 0,
        top.astype(np.float64) / np.maximum(tot_words, 1).astype(np.float64),
        0.0,
    )

    batch = batch.append_column("n_lines", pa.array(lens))
    batch = batch.append_column("dup_line_frac", pa.array(dup_line_frac))
    batch = batch.append_column("dup_line_char_frac", pa.array(dup_line_char_frac))
    batch = batch.append_column("top_word_frac", pa.array(top_word_frac))
    return batch


_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?P<h>[^/?#]+)"


def url_host(batch: pa.Table, url_col: str = "url", out_col: str = "host") -> pa.Table:
    """Extract the authority (host[:port]) from a URL column — the
    grouping key for per-domain corpus caps.  One vectorized RE2
    ``extract_regex`` (:data:`_HOST_RE`); non-URL strings get ``''``
    to match DuckDB's ``regexp_extract(url, pattern, 1)`` no-match
    convention."""
    got = pc.extract_regex(batch[url_col], _HOST_RE)
    host = pc.if_else(pc.is_valid(got), pc.struct_field(got, "h"), "")
    return batch.append_column(out_col, host.cast(pa.string()))


def build_ngram_blocklist(texts, n: int = 8) -> pa.Array:
    """DISTINCT word ``n``-grams (space-joined) of the given benchmark
    texts — the broadcast side of :func:`decontaminate`.  Tokenization
    is the shared ``\\s+`` split with empties dropped, identical to the
    document side and to the SQL twin."""
    t = pa.array(list(texts), type=pa.string())
    flat, doc = _split_words_flat(t)
    grams, gdoc = _ngrams_of(flat, doc, n)
    return pc.unique(grams)


def _first_occurrence(values, seg: np.ndarray):
    """THE segment-distinct kernel (one definition — four call sites
    used to hand-roll it): dictionary-encode ``values``, sort rows by
    ``(segment, code)`` and mark each (segment, value) pair's first
    occurrence.  Returns ``(order, first)``; the kept GLOBAL indices
    are ``order[first]``."""
    codes = pc.dictionary_encode(_combined(values)).indices.to_numpy().astype(np.int64)
    order = np.lexsort((codes, seg))
    sc, sd = codes[order], seg[order]
    first = np.ones(len(sc), dtype=bool)
    first[1:] = (sd[1:] != sd[:-1]) | (sc[1:] != sc[:-1])
    return order, first


def _split_words_flat(t: pa.Array):
    """(flat nonempty \\s+ tokens, int64 doc index per token).
    NULL text ≡ '' (zero tokens)."""
    wlists = pc.split_pattern_regex(pc.fill_null(t, ""), _WS)
    wlens = pc.list_value_length(wlists).cast(pa.int64()).to_numpy()
    flat = _combined(pc.list_flatten(wlists))
    doc = np.repeat(np.arange(len(t), dtype=np.int64), wlens)
    ne = pc.not_equal(flat, "")
    return flat.filter(ne), doc[ne.to_numpy(zero_copy_only=False)]


def _ngrams_of(flat: pa.Array, doc: np.ndarray, n: int):
    """Space-joined word n-grams from a flat token array.

    An n-gram starting at position ``k`` is valid iff token ``k`` and
    token ``k+n−1`` belong to the same document — one vectorized
    equality on the shifted doc-index array; the join itself is one
    ``binary_join_element_wise`` over ``n`` zero-copy slices."""
    m = len(flat)
    cnt = m - n + 1
    if cnt <= 0:
        return pa.array([], type=pa.string()), np.array([], dtype=np.int64)
    parts = [flat.slice(i, cnt) for i in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    valid = doc[:cnt] == doc[n - 1:]
    return grams.filter(pa.array(valid)), doc[:cnt][valid]


class DecontaminateStage:
    """``map_batches`` callable: flag documents sharing any word
    ``n``-gram with a broadcast benchmark blocklist (test-set
    decontamination, à la GPT-3 appendix C / Dolma).

    The blocklist n-gram array is ``ray.put`` ONCE on the driver and
    fetched lazily per worker; membership is one C++ hash-set probe
    (``pc.is_in``) over all n-grams of the batch.  Exact strings are
    compared (no hash collisions).  Appends ``ngram_hits`` (count of
    blocked n-gram OCCURRENCES), ``ngram_total`` (n-gram occurrences
    of the doc — normalize hits with it) and ``contaminated``.
    """

    def __init__(self, blocked_ref, n: int = 8, text_col: str = "text"):
        self._ref = blocked_ref
        self._blocked = None
        self.n = n
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._blocked is None:
            obj = self._ref
            self._blocked = ray.get(obj) if isinstance(obj, ray.ObjectRef) else obj
        nrows = batch.num_rows
        hits = np.zeros(nrows, dtype=np.int64)
        total = np.zeros(nrows, dtype=np.int64)
        if nrows:
            flat, doc = _split_words_flat(_combined(batch[self.text_col]))
            grams, gdoc = _ngrams_of(flat, doc, self.n)
            if len(grams):
                total = np.bincount(gdoc, minlength=nrows).astype(np.int64)
                hit = pc.is_in(grams, value_set=self._blocked).to_numpy(
                    zero_copy_only=False
                )
                hits = np.bincount(gdoc[hit], minlength=nrows).astype(np.int64)
        batch = batch.append_column("ngram_hits", pa.array(hits))
        batch = batch.append_column("ngram_total", pa.array(total))
        batch = batch.append_column("contaminated", pa.array(hits > 0))
        return batch


def decontaminate(ds, blocklist_texts, n: int = 8, text_col: str = "text"):
    """Dataset-level decontamination: build the distinct n-gram
    blocklist from ``blocklist_texts`` (small side — benchmark suites
    are MBs, not TBs), broadcast it once, and probe every batch.
    Returns the input with ``ngram_hits`` / ``contaminated`` appended;
    filter on ``contaminated == False`` to scrub."""
    blocked = build_ngram_blocklist(blocklist_texts, n=n)
    ref = ray.put(blocked)
    return ds.map_batches(
        DecontaminateStage(ref, n=n, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def cross_doc_ngram_stats(
    ds,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 64,
    corpus_count: int | None = None,
    with_novelty: bool = False,
):
    """Per-document cross-document duplicate n-gram statistics — the
    substring-level duplication signal of Lee et al. 2021
    ("Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499) over word ``n``-grams instead of suffix-array
    byte spans.

    Per document: ``total_ngrams`` = its DISTINCT word n-grams;
    ``shared_ngrams`` = how many of those occur in ≥ 1 OTHER document.
    ``shared_ngrams / total_ngrams`` is the doc's memorization-risk
    fraction.  Documents with < ``n`` words emit no row — LEFT JOIN +
    COALESCE 0 downstream (the SQL twin in __ray_entry__ does).

    Plan (2 shuffles, nothing on the driver):
      1. ``map_batches``: distinct ``(gram, doc)`` pairs (lexsort +
         first-occurrence mask on dictionary codes), partitioned by
         ``fnv1a64(gram) % P`` — every occurrence of a gram lands in
         ONE partition regardless of doc;
      2. ``groupby(part).map_groups``: gram doc-counts via dictionary
         codes + bincount, mark pairs whose gram has doc_count > 1,
         fold per-doc partial (shared, total) sums — one small row
         per (partition, doc);
      3. :func:`~rayraster.agg.hash_aggregate` by doc merges partials.

    The gram STRINGS ride the first exchange (oracle-bound: the DuckDB
    twin joins on strings).  At 10^12-doc scale substitute
    ``dedup.word_ngram_hashes`` int64s for the strings to cut exchange
    bytes — documented trade: 64-bit collisions can over-mark
    ~|grams|²/2⁶⁵ pairs.

    ``with_novelty=True`` additionally emits ``old_ngrams`` — how many
    of the doc's distinct n-grams FIRST occurred in an earlier
    document (smaller ``id_col`` = earlier crawl): the temporal
    novelty / recency-dedup signal ("how much of this page is recycled
    text?").  Computed in the SAME two exchanges — the gram partition
    already co-locates every (gram, doc) pair, so the per-gram MIN id
    and the doc-count come from one group pass.
    """
    from rayraster.agg import hash_aggregate
    from rayraster.dedup import _adaptive_parts
    from rayraster.geo import fnv1a64

    P = _adaptive_parts(corpus_count, num_partitions)

    def emit(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "gram": pa.array([], type=pa.string()),
                id_col: pa.array([], type=pa.int64()),
                "_part": pa.array([], type=pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        t = _combined(pc.fill_null(batch[text_col], ""))
        flat, doc = _split_words_flat(t)
        grams, gdoc = _ngrams_of(flat, doc, n)
        if len(grams) == 0:
            return empty
        # distinct within doc (docs are single rows, so within-batch
        # distinct per doc IS global distinct per doc)
        order, first = _first_occurrence(grams, gdoc)
        kept = order[first]
        g = grams.take(pa.array(kept, type=pa.int64()))
        part = (fnv1a64(g) % np.uint64(P)).astype(np.int64)
        return pa.table(
            {
                "gram": g,
                id_col: pa.array(ids[gdoc[kept]]),
                "_part": pa.array(part),
            }
        )

    pairs = ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)

    def mark(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            cols = {
                id_col: pa.array([], type=pa.int64()),
                "shared": pa.array([], type=pa.int64()),
                "total": pa.array([], type=pa.int64()),
            }
            if with_novelty:
                cols["old"] = pa.array([], type=pa.int64())
            return pa.table(cols)
        codes = (
            pc.dictionary_encode(_combined(group["gram"]))
            .indices.to_numpy()
            .astype(np.int64)
        )
        ndocs = np.bincount(codes)  # rows are distinct (gram, doc)
        shared = ndocs[codes] > 1
        d = group[id_col].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(d, return_inverse=True)
        sh = np.bincount(inv, weights=shared.astype(np.int64)).astype(np.int64)
        tot = np.bincount(inv).astype(np.int64)
        cols = {
            id_col: pa.array(uniq), "shared": pa.array(sh),
            "total": pa.array(tot),
        }
        if with_novelty:
            # per-gram MIN doc id — the gram partition sees every doc
            # of the gram, so the min is global
            minv = np.full(len(ndocs), np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(minv, codes, d)
            old = d > minv[codes]
            cols["old"] = pa.array(
                np.bincount(inv, weights=old.astype(np.int64)).astype(np.int64)
            )
        return pa.table(cols)

    partials = pairs.groupby("_part").map_groups(mark, batch_format="pyarrow")
    sum_cols = ["shared", "total"] + (["old"] if with_novelty else [])
    out_names = [id_col, "shared_ngrams", "total_ngrams"] + (
        ["old_ngrams"] if with_novelty else []
    )
    agg = hash_aggregate(
        partials,
        [id_col],
        sum_cols=sum_cols,
        count=False,
        num_partitions=P,
    )
    return agg.map_batches(
        lambda t: t.rename_columns(out_names),
        batch_format="pyarrow",
    )


def remove_duplicate_ngram_spans(
    ds,
    n: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 64,
    corpus_count: int | None = None,
    keep_cols: tuple = (),
):
    """Exact duplicated-substring REMOVAL (the deduplication act of
    Lee et al. 2021, arXiv:2107.06499 §4 "ExactSubstr" — word-granular
    here instead of suffix-array byte spans): every word position
    covered by any word ``n``-gram that occurs in ≥ ``min_docs``
    DISTINCT documents is removed from every document (all copies —
    Lee et al. drop every occurrence, unlike keep-first document
    dedup), and each document is rebuilt from its surviving words
    (single-space joined, the corpus' ``\\s+`` token convention).

    Returns a Dataset of ``(id_col, text_col [rebuilt], n_words,
    n_removed, *keep_cols)`` — one row per input document (unchanged
    docs pass through; a fully-covered doc rebuilds to ``''``).
    ``keep_cols`` ride the doc side of the rebuild exchange, so a
    pipeline keeps its metadata columns without a join back.

    Plan (2 hash-partitioned shuffles, nothing driver-side):

    1. ``map_batches``: ALL word n-gram occurrences as
       ``(gram, doc, pos)`` rows partitioned by ``fnv1a64(gram)`` —
       every occurrence of a gram lands in ONE partition;
    2. ``groupby(part).map_groups``: per-gram DISTINCT-doc counts
       (dictionary codes + lexsort, partition-complete), keep the
       occurrences of grams meeting ``min_docs``, emit ``(doc, pos)``
       covered-start markers re-keyed by ``fnv-mix(doc)``;
    3. markers UNION the docs table (side-tagged, same partition key)
       → ``groupby(part).map_groups``: per group, one vectorized
       interval-coverage pass (+1/−1 deltas at span ends, cumsum > 0)
       over the flat word array, rebuild via ``ListArray`` offsets +
       ``binary_join`` — the same reassembly kernel shape as
       :func:`~rayraster.dedup.paragraph_dedup`.

    The gram STRINGS ride the first exchange (oracle-bound); at
    10^12-doc scale substitute int64 gram hashes (documented trade:
    ~|grams|²/2⁶⁵ over-removal risk) or a true distributed suffix
    array.  No reference analog (SEraster is spatial-only) —
    task-brief training-data extension.
    """
    from rayraster.dedup import _adaptive_parts
    from rayraster.geo import fnv1a64

    P = _adaptive_parts(corpus_count, num_partitions)
    _MIX = np.int64(2654435761)

    def emit(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "gram": pa.array([], type=pa.string()),
                "_doc": pa.array([], type=pa.int64()),
                "_pos": pa.array([], type=pa.int64()),
                "_part": pa.array([], type=pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        t = _combined(pc.fill_null(batch[text_col], ""))
        flat, doc = _split_words_flat(t)
        m = len(flat)
        cnt = m - n + 1
        if cnt <= 0:
            return empty
        parts = [flat.slice(i, cnt) for i in range(n)]
        grams = pc.binary_join_element_wise(*parts, " ")
        valid = doc[:cnt] == doc[n - 1 :]
        grams = grams.filter(pa.array(valid))
        if len(grams) == 0:
            return empty
        gdoc = doc[:cnt][valid]
        # within-doc start position of each gram: global word index −
        # the doc's first flat index (docs are contiguous in flat)
        wcounts = np.bincount(doc, minlength=batch.num_rows)
        wstarts = np.concatenate(([0], np.cumsum(wcounts)))[:-1]
        gpos = np.flatnonzero(valid) - wstarts[gdoc]
        part = (fnv1a64(grams) % np.uint64(P)).astype(np.int64)
        return pa.table(
            {
                "gram": grams,
                "_doc": pa.array(ids[gdoc]),
                "_pos": pa.array(gpos.astype(np.int64)),
                "_part": pa.array(part),
            }
        )

    occurrences = ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)

    def mark(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "_doc": pa.array([], type=pa.int64()),
                "_pos": pa.array([], type=pa.int64()),
                "_part": pa.array([], type=pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        codes = (
            pc.dictionary_encode(_combined(group["gram"]))
            .indices.to_numpy()
            .astype(np.int64)
        )
        d = group["_doc"].to_numpy(zero_copy_only=False)
        # distinct docs per gram: sort (code, doc), count pair firsts
        order = np.lexsort((d, codes))
        cs, dsrt = codes[order], d[order]
        newpair = np.ones(len(cs), dtype=bool)
        newpair[1:] = (cs[1:] != cs[:-1]) | (dsrt[1:] != dsrt[:-1])
        ndocs = np.bincount(cs[newpair])
        shared = ndocs[codes] >= min_docs
        if not shared.any():
            return empty
        dd = d[shared]
        part2 = np.abs(dd * _MIX) % np.int64(P)
        return pa.table(
            {
                "_doc": pa.array(dd),
                "_pos": group["_pos"].filter(pa.array(shared)),
                "_part": pa.array(part2),
            }
        )

    markers = occurrences.groupby("_part").map_groups(mark, batch_format="pyarrow")

    # side-tagged union: markers (text NULL) + the docs table (pos −1),
    # co-located by the same doc-keyed partition id
    keep_types: dict | None = None
    if keep_cols:
        sch = ds.schema()  # metadata probe on the (usually read) input
        base = sch.base_schema if hasattr(sch, "base_schema") else sch
        keep_types = {c: base.field(c).type for c in keep_cols}

    def doc_side(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        part = np.abs(ids * _MIX) % np.int64(P)
        t = pa.table(
            {
                "_doc": pa.array(ids),
                "_pos": pa.array(np.full(len(ids), -1, dtype=np.int64)),
                "_part": pa.array(part),
                "_text": pc.fill_null(batch[text_col], "").cast(pa.string()),
            }
        )
        for c in keep_cols:
            t = t.append_column(c, batch[c])
        return t

    def marker_side(batch: pa.Table) -> pa.Table:
        batch = batch.append_column("_text", pa.nulls(batch.num_rows, type=pa.string()))
        for c in keep_cols:
            batch = batch.append_column(c, pa.nulls(batch.num_rows, type=keep_types[c]))
        return batch

    both = ds.map_batches(doc_side, batch_format="pyarrow").union(
        markers.map_batches(marker_side, batch_format="pyarrow")
    )

    def rebuild(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                text_col: pa.array([], type=pa.string()),
                "n_words": pa.array([], type=pa.int64()),
                "n_removed": pa.array([], type=pa.int64()),
                **{c: pa.array([], type=keep_types[c]) for c in keep_cols},
            }
        )
        if group.num_rows == 0:
            return empty
        is_doc = (
            group["_pos"].to_numpy(zero_copy_only=False).astype(np.int64) == -1
        )
        docs_t = group.filter(pa.array(is_doc))
        if docs_t.num_rows == 0:
            return empty
        ids = docs_t["_doc"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = _combined(docs_t["_text"])
        flat, wdoc = _split_words_flat(texts)
        nd = docs_t.num_rows
        wcounts = np.bincount(wdoc, minlength=nd)
        wstarts = np.concatenate(([0], np.cumsum(wcounts)))[:-1]
        m = len(flat)
        covered = np.zeros(m, dtype=bool)
        mk = group.filter(pa.array(~is_doc))
        if mk.num_rows:
            mdoc = mk["_doc"].to_numpy(zero_copy_only=False).astype(np.int64)
            mpos = mk["_pos"].to_numpy(zero_copy_only=False).astype(np.int64)
            sids = np.argsort(ids, kind="stable")
            didx = sids[np.searchsorted(ids, mdoc, sorter=sids)]
            g0 = wstarts[didx] + mpos
            delta = np.zeros(m + 1, dtype=np.int64)
            np.add.at(delta, g0, 1)
            np.add.at(delta, g0 + n, -1)  # span ends stay inside the doc
            covered = np.cumsum(delta[:m]) > 0
        kept = flat.filter(pa.array(~covered))
        kept_counts = np.bincount(wdoc[~covered], minlength=nd).astype(np.int64)
        offsets = np.concatenate(([0], np.cumsum(kept_counts)))
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), kept.cast(pa.string())
        )
        rebuilt = pc.binary_join(lists, " ")
        return pa.table(
            {
                id_col: pa.array(ids),
                text_col: rebuilt.cast(pa.string()),
                "n_words": pa.array(wcounts.astype(np.int64)),
                "n_removed": pa.array((wcounts - kept_counts).astype(np.int64)),
                **{c: docs_t[c] for c in keep_cols},
            }
        )

    return both.groupby("_part").map_groups(rebuild, batch_format="pyarrow")


def corpus_freq_score(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 64,
    corpus_count: int | None = None,
    mode: str = "auto",
    broadcast_threshold: int = 2_000_000,
):
    """CCNet-style LM-lite fluency signal: per document, the mean
    CORPUS frequency of its token occurrences.

    A count-based stand-in for language-model perplexity scoring
    (CCNet, Wenzek et al. 2020 buckets docs by LM score; no model
    libraries in this environment): documents made of common corpus
    tokens score high, documents full of rare/garbled tokens score
    low.  All-integer counts + ONE IEEE division ⇒ bit-exact SQL twin.

    Output per doc (docs with ≥ 1 token): ``token_count``,
    ``freq_sum`` = Σ over the doc's token occurrences of that token's
    total corpus occurrence count, ``mean_freq`` =
    freq_sum / token_count.

    Two execution paths with IDENTICAL output:

    * ``broadcast`` (the Zipf path — real vocabularies are tiny next
      to the corpus): per-batch combiner wordcount → one SMALL
      grouped sum (the only exchange carries distinct words per
      batch) → the (word, count) table broadcast once via ``ray.put``
      → ONE scoring map pass (``pc.index_in`` C++ hash lookup; a doc
      is a single row, so per-doc sums never leave the batch).  The
      driver holds O(vocab), never O(corpus).
    * ``partitioned`` (the adversarial path — unique-garbage tokens
      make vocab O(corpus)): (word, doc) occurrence pairs partitioned
      by ``fnv1a64(word) % P`` — ALL occurrences of a word land in
      one partition, so exact global counts are computed locally —
      then per-doc partials fold through
      :func:`~rayraster.agg.hash_aggregate`.  2 shuffles, nothing on
      the driver.

    ``mode="auto"`` builds the count table (needed by both paths'
    semantics anyway) and broadcasts iff its row count ≤
    ``broadcast_threshold``; the rare fallback re-derives counts
    inside partitions (one wasted combiner pass, documented).
    """
    from rayraster.agg import hash_aggregate
    from rayraster.dedup import _adaptive_parts
    from rayraster.geo import fnv1a64

    if mode not in ("auto", "broadcast", "partitioned"):
        raise ValueError(f"mode must be auto|broadcast|partitioned, got {mode!r}")
    P = _adaptive_parts(corpus_count, num_partitions)

    if mode in ("auto", "broadcast"):
        partial = ds.map_batches(
            lambda t: word_count_partial(t, text_col),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        counts = hash_aggregate(
            partial, ["word"], sum_cols=["n"], count=False, num_partitions=P
        ).materialize()
        n_vocab = counts.count()
        if mode == "broadcast" or n_vocab <= broadcast_threshold:
            wc = counts.to_pandas()  # O(vocab) on the driver — the
            # documented broadcast side, NOT the corpus
            words = pa.array(wc["word"].tolist(), type=pa.string())
            cnts = wc["sum_n"].to_numpy().astype(np.int64)
            ref = ray.put((words, cnts))

            def score_broadcast(batch: pa.Table) -> pa.Table:
                w, c = ray.get(ref)  # plasma-cached per worker
                empty = pa.table(
                    {
                        id_col: pa.array([], type=pa.int64()),
                        "token_count": pa.array([], type=pa.int64()),
                        "freq_sum": pa.array([], type=pa.int64()),
                        "mean_freq": pa.array([], type=pa.float64()),
                    }
                )
                if batch.num_rows == 0:
                    return empty
                ids = batch[id_col].to_numpy(zero_copy_only=False)
                flat, doc = _split_words_flat(_combined(batch[text_col]))
                if len(flat) == 0:
                    return empty
                pos = (
                    pc.fill_null(pc.index_in(flat, value_set=w), -1)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
                occ = np.where(pos >= 0, c[np.clip(pos, 0, len(c) - 1)], 0)
                nrows = batch.num_rows
                fs = np.bincount(doc, weights=occ, minlength=nrows).astype(
                    np.int64
                )
                tc = np.bincount(doc, minlength=nrows).astype(np.int64)
                keep = tc > 0  # token-less docs emit no row (both paths)
                mean = fs[keep].astype(np.float64) / tc[keep].astype(np.float64)
                return pa.table(
                    {
                        id_col: pa.array(ids[keep]),
                        "token_count": pa.array(tc[keep]),
                        "freq_sum": pa.array(fs[keep]),
                        "mean_freq": pa.array(mean),
                    }
                )

            return ds.map_batches(
                score_broadcast, batch_format="pyarrow", zero_copy_batch=True
            )

    def emit(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "word": pa.array([], type=pa.string()),
                id_col: pa.array([], type=pa.int64()),
                "_part": pa.array([], type=pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        flat, doc = _split_words_flat(_combined(batch[text_col]))
        if len(flat) == 0:
            return empty
        part = (fnv1a64(flat) % np.uint64(P)).astype(np.int64)
        return pa.table(
            {"word": flat, id_col: pa.array(ids[doc]), "_part": pa.array(part)}
        )

    pairs = ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)

    def score(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "freq_sum": pa.array([], type=pa.int64()),
                    "token_count": pa.array([], type=pa.int64()),
                }
            )
        codes = (
            pc.dictionary_encode(_combined(group["word"]))
            .indices.to_numpy()
            .astype(np.int64)
        )
        freq = np.bincount(codes)  # exact global count: word ⊆ one partition
        occ_freq = freq[codes]
        d = group[id_col].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(d, return_inverse=True)
        fs = np.bincount(inv, weights=occ_freq).astype(np.int64)
        tc = np.bincount(inv).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(uniq),
                "freq_sum": pa.array(fs),
                "token_count": pa.array(tc),
            }
        )

    partials = pairs.groupby("_part").map_groups(score, batch_format="pyarrow")
    agg = hash_aggregate(
        partials,
        [id_col],
        sum_cols=["freq_sum", "token_count"],
        count=False,
        num_partitions=P,
    )

    def finish(t: pa.Table) -> pa.Table:
        fs = t["sum_freq_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        tc = t["sum_token_count"].to_numpy(zero_copy_only=False).astype(np.int64)
        mean = fs.astype(np.float64) / np.maximum(tc, 1).astype(np.float64)
        return pa.table(
            {
                id_col: t[id_col],
                "token_count": pa.array(tc),
                "freq_sum": pa.array(fs),
                "mean_freq": pa.array(mean),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# --------------------------------------------------------------------------
# bigram language-model perplexity scoring (CCNet-style quality filter)
# --------------------------------------------------------------------------

_LM_Q = 1 << 20  # fixed-point scale for quantized log-probs (micro-ish nats)


def _floor_q_log(r: np.ndarray, q: int = _LM_Q) -> np.ndarray:
    """floor(q * ln(r)) matching libm (and therefore the DuckDB twin's
    ``floor(q * ln(r))``) BIT-FOR-BIT: numpy's SIMD log differs from
    libm by a few ulps (measured ~20% of values at the last bit), so
    the vectorized result is used everywhere except values within 1e-6
    of an integer boundary, which are recomputed with ``math.log``.
    The ulp error is ~1e-9 at this scale, so only boundary values can
    flip the floor — the repaired set is exact."""
    import math

    v = float(q) * np.log(r)
    out = np.floor(v)
    sus = np.abs(v - np.rint(v)) < 1e-6
    if sus.any():
        idx = np.nonzero(sus)[0]
        out[idx] = [math.floor(q * math.log(float(r[i]))) for i in idx]
    return out.astype(np.int64)


def _kn_pair_logq(
    c2: np.ndarray, c1x: np.ndarray, n1px: np.ndarray, nrx: np.ndarray,
    bv: int,
) -> np.ndarray:
    """Quantized log-probs of interpolated Kneser–Ney bigrams with the
    dyadic discount D = 3/4 (so every term is a ratio of exact ints):

      ``P = max(4·c2−3, 0)/(4·c1) + (3·N1+(w1·))/(4·c1)
            · (N1+(·w2)+1)/(B+V)``

    — absolute discounting of the ML estimate, mass redistributed to
    the CONTINUATION probability (how many distinct contexts each w2
    follows; Kneser & Ney 1995; Chen & Goodman 1999 interpolated
    form), with add-one on the continuation counts so P > 0 always.
    The expression tree is fixed (two divisions, one multiply, one
    add — same left-assoc shape in the SQL twin) and the floor of the
    quantized log is libm-repaired (:func:`_floor_q_log`), so scores
    are bit-exact against DuckDB and across partitionings."""
    af = np.maximum(4 * c2 - 3, 0).astype(np.float64)
    c1qf = (4 * c1x).astype(np.float64)
    p = af / c1qf + ((3 * n1px).astype(np.float64) / c1qf) * (
        (nrx + 1).astype(np.float64) / float(bv)
    )
    return _floor_q_log(p)


def _bigram_flat(batch_text):
    """(w1, w2, doc_row_index) for every consecutive nonempty-token
    pair within each document — pure Arrow slicing over the flat token
    stream, no per-row Python."""
    flat, doc = _split_words_flat(_combined(batch_text))
    if len(flat) < 2:
        e = pa.array([], type=pa.string())
        return e, e, np.array([], dtype=np.int64)
    m = doc[1:] == doc[:-1]
    pm = pa.array(m)
    return (
        flat.slice(0, len(flat) - 1).filter(pm),
        flat.slice(1).filter(pm),
        doc[:-1][m],
    )


def bigram_lm_score(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 64,
    corpus_count: int | None = None,
    mode: str = "auto",
    broadcast_threshold: int = 4_000_000,
    smoothing: str = "addone",
):
    """Per-document bigram language-model log-likelihood — the actual
    perplexity-style quality filter (CCNet, Wenzek et al. 2020 filter
    by LM score; :func:`corpus_freq_score` is the unigram-frequency
    stand-in, this is the real conditional model, trained ON the
    corpus it scores, from scratch — no model libraries).

    Model: add-one-smoothed bigram over ``\\s+`` tokens,
    ``P(w2|w1) = (c2(w1,w2)+1) / (c1(w1)+V)`` with ``c1`` the left-
    context total and ``V`` the corpus distinct-token count.  Scores
    are order-independent int64 sums of ``floor(2^20 · ln P)`` — the
    fixed-point trick the graph engine uses — so results are
    bit-identical across partitionings AND against the SQL twin
    (the floor is libm-exact, see :func:`_floor_q_log`).

    Output per doc with ≥ 1 bigram: ``bigram_count`` (int64),
    ``lm_logprob_q`` (int64; divide by ``bigram_count·2^20`` and
    negate-exp for perplexity).

    Execution paths (same contract as :func:`corpus_freq_score`):

    * ``broadcast`` — per-batch bigram combiner → ONE small grouped
      sum (distinct bigrams per batch on the wire) → the model
      quantized on the driver (O(bigram vocab), never O(corpus)) and
      broadcast once via ``ray.put``; scoring is one map pass with two
      ``pc.index_in`` C++ hash lookups per token stream.
    * ``partitioned`` — (w1, w2, doc) occurrence rows exchanged by
      ``fnv1a64(w1) % P``: every ``(w1, ·)`` lands in one partition, so
      both ``c2`` and ``c1`` are computed exactly LOCALLY; per-doc
      partial scores fold through one more hash aggregate.  2
      shuffles, nothing driver-side but the scalar ``V``.

    ``mode="auto"`` broadcasts iff the bigram vocabulary fits
    ``broadcast_threshold``.

    ``smoothing``: ``"addone"`` (above), ``"kn"`` — interpolated
    Kneser–Ney with dyadic discount D=3/4 (:func:`_kn_pair_logq`;
    output column ``kn_logprob_q``), or ``"both"`` — BOTH scores from
    ONE model build / ONE scoring pass (the t1 gate shape).  KN needs
    two model sidecars beyond add-one: ``N1+(w1·)`` (distinct
    continuations per left context — local to the w1 partition) and
    ``N1+(·w2)`` (distinct contexts per right word — an O(vocab)
    table built from the distributed pair counts and broadcast via
    ``ray.put``, like the model side of the broadcast path; never the
    corpus).
    """
    import ray

    from rayraster.agg import hash_aggregate
    from rayraster.dedup import _adaptive_parts
    from rayraster.geo import fnv1a64

    if mode not in ("auto", "broadcast", "partitioned"):
        raise ValueError(f"mode must be auto|broadcast|partitioned, got {mode!r}")
    if smoothing not in ("addone", "kn", "both"):
        raise ValueError(f"smoothing must be addone|kn|both, got {smoothing!r}")
    want_a1 = smoothing in ("addone", "both")
    want_kn = smoothing in ("kn", "both")
    lp_cols = (["lm_logprob_q"] if want_a1 else []) + (
        ["kn_logprob_q"] if want_kn else []
    )
    P = _adaptive_parts(corpus_count, num_partitions)

    # V: corpus distinct-token count (both paths; one SMALL exchange —
    # the combiner ships distinct words per batch)
    wpartial = ds.map_batches(
        lambda t: word_count_partial(t, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    vocab = hash_aggregate(
        wpartial, ["word"], sum_cols=["n"], count=False, num_partitions=P
    )
    V = vocab.count()

    def bigram_partial(batch: pa.Table) -> pa.Table:
        # the module-level combiner (incl. its empty-batch guard)
        return bigram_count_partial(batch, text_col)

    c2ds = None
    if mode in ("auto", "broadcast"):
        c2ds = hash_aggregate(
            ds.map_batches(
                bigram_partial, batch_format="pyarrow", zero_copy_batch=True
            ),
            ["w1", "w2"],
            sum_cols=["n"],
            count=False,
            num_partitions=P,
        ).materialize()
        n_bigram_vocab = c2ds.count()
        if mode == "broadcast" or n_bigram_vocab <= broadcast_threshold:
            bt = c2ds.to_pandas()  # O(bigram vocab) on the driver — the
            # documented broadcast side (the model), NOT the corpus
            c2 = bt["sum_n"].to_numpy().astype(np.int64)
            # c1 = left-context totals; vocab ids via two small dictionaries
            u1, inv1 = np.unique(bt["w1"].to_numpy(), return_inverse=True)
            u2, inv2 = np.unique(bt["w2"].to_numpy(), return_inverse=True)
            c1 = np.zeros(len(u1), dtype=np.int64)
            np.add.at(c1, inv1, c2)
            mlogs = {}
            kn_side = None
            if want_a1:
                r = (c2 + 1.0) / (c1[inv1] + float(V))
                mlogs["lm_logprob_q"] = _floor_q_log(r)
            if want_kn:
                n1p = np.bincount(inv1).astype(np.int64)
                nr = np.bincount(inv2).astype(np.int64)
                bv = n_bigram_vocab + V
                mlogs["kn_logprob_q"] = _kn_pair_logq(
                    c2, c1[inv1], n1p[inv1], nr[inv2], bv
                )
                kn_side = (nr, n1p, c1, bv)
            keys = inv1.astype(np.int64) * np.int64(len(u2)) + inv2.astype(np.int64)
            ref = ray.put(
                (
                    pa.array(u1, type=pa.string()),
                    pa.array(u2, type=pa.string()),
                    pa.array(keys, type=pa.int64()),
                    mlogs,
                    kn_side,
                )
            )

            def score_broadcast(batch: pa.Table) -> pa.Table:
                a1, a2, mkeys, mlog, kns = ray.get(ref)
                empty = pa.table(
                    {
                        id_col: pa.array([], type=pa.int64()),
                        "bigram_count": pa.array([], type=pa.int64()),
                        **{c: pa.array([], type=pa.int64()) for c in lp_cols},
                    }
                )
                if batch.num_rows == 0:
                    return empty
                ids = batch[id_col].to_numpy(zero_copy_only=False)
                w1, w2, doc = _bigram_flat(batch[text_col])
                if len(w1) == 0:
                    return empty
                i1 = (
                    pc.fill_null(pc.index_in(w1, value_set=a1), -1)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
                i2 = (
                    pc.fill_null(pc.index_in(w2, value_set=a2), -1)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
                key = i1 * np.int64(len(a2)) + i2
                pos = (
                    pc.fill_null(pc.index_in(pa.array(key), value_set=mkeys), -1)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
                # scoring the training corpus ⇒ every bigram is in the
                # model; an out-of-model pair (scoring NEW text) falls
                # back to the add-one floor P = 1/V, and for KN to the
                # backoff λ(w1)·Pcont(w2) (pure continuation when w1
                # itself is unseen)
                hit = (i1 >= 0) & (i2 >= 0) & (pos >= 0)
                cpos = np.clip(pos, 0, len(mkeys) - 1)
                lps = {}
                if want_a1:
                    oov = _floor_q_log(np.array([1.0 / float(V)]))[0]
                    lps["lm_logprob_q"] = np.where(
                        hit, mlog["lm_logprob_q"][cpos], oov
                    )
                if want_kn:
                    nr_u2, n1p_u1, c1_u1, bv = kns
                    nr_i = np.where(
                        i2 >= 0, nr_u2[np.clip(i2, 0, len(nr_u2) - 1)], 0
                    )
                    cont = (nr_i + 1).astype(np.float64) / float(bv)
                    lam = np.where(
                        i1 >= 0,
                        (3 * n1p_u1[np.clip(i1, 0, len(n1p_u1) - 1)]).astype(
                            np.float64
                        )
                        / (4 * c1_u1[np.clip(i1, 0, len(c1_u1) - 1)]).astype(
                            np.float64
                        ),
                        1.0,
                    )
                    lps["kn_logprob_q"] = np.where(
                        hit,
                        mlog["kn_logprob_q"][cpos],
                        _floor_q_log(lam * cont),
                    )
                nrows = batch.num_rows
                cnt = np.bincount(doc, minlength=nrows).astype(np.int64)
                keep = cnt > 0
                cols = {
                    id_col: pa.array(ids[keep]),
                    "bigram_count": pa.array(cnt[keep]),
                }
                for c in lp_cols:
                    acc = np.zeros(nrows, dtype=np.int64)
                    np.add.at(acc, doc, lps[c])
                    cols[c] = pa.array(acc[keep])
                return pa.table(cols)

            return ds.map_batches(
                score_broadcast, batch_format="pyarrow", zero_copy_batch=True
            )

    # partitioned path: exchange (w1, w2, doc) by hash(w1) so c2 AND c1
    # are exact locally; fold per-doc partials through one more exchange.
    # KN additionally needs the RIGHT-continuation counts N1+(·w2),
    # which the w1 partition cannot see: build them from the
    # DISTRIBUTED distinct-pair table (one grouped count by w2 — an
    # O(vocab) table, broadcast once via ray.put like the model side)
    nr_ref = None
    bv_global = 0
    if want_kn:
        if c2ds is None:
            c2ds = hash_aggregate(
                ds.map_batches(
                    bigram_partial, batch_format="pyarrow", zero_copy_batch=True
                ),
                ["w1", "w2"],
                sum_cols=["n"],
                count=False,
                num_partitions=P,
            ).materialize()
        bv_global = int(c2ds.count()) + V
        nr_pd = hash_aggregate(
            c2ds, ["w2"], count=True, count_name="nr", num_partitions=P
        ).to_pandas()  # O(vocab) on the driver — a model sidecar
        nr_ref = ray.put(
            (
                pa.array(nr_pd["w2"].to_numpy(), type=pa.string()),
                nr_pd["nr"].to_numpy().astype(np.int64),
            )
        )

    def emit(batch: pa.Table) -> pa.Table:
        w1, w2, doc = _bigram_flat(batch[text_col])
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        part = fnv1a64(w1) % np.uint64(P)
        return pa.table(
            {
                "w1": w1,
                "w2": w2,
                id_col: pa.array(ids[doc] if len(doc) else np.array([], dtype=ids.dtype)),
                "_part": pa.array(part.astype(np.int64)),
            }
        )

    def solve(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "bigram_count": pa.array([], type=pa.int64()),
                    **{c: pa.array([], type=pa.int64()) for c in lp_cols},
                }
            )
        g = part.group_by(["w1", "w2"]).aggregate([([], "count_all")])
        c2 = g["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
        u1, inv1 = np.unique(g["w1"].to_numpy(), return_inverse=True)
        c1 = np.zeros(len(u1), dtype=np.int64)
        np.add.at(c1, inv1, c2)
        # per-occurrence score: look each row's (w1,w2) up in g
        u2, inv2 = np.unique(g["w2"].to_numpy(), return_inverse=True)
        logqs = {}
        if want_a1:
            logqs["lm_logprob_q"] = _floor_q_log(
                (c2 + 1.0) / (c1[inv1] + float(V))
            )
        if want_kn:
            # local: c2, c1, N1+(w1·) — every (w1, ·) is in this
            # partition; global: N1+(·w2) from the broadcast sidecar
            nr_w2a, nr_cnt = ray.get(nr_ref)
            n1p = np.bincount(inv1).astype(np.int64)
            j2 = (
                pc.fill_null(pc.index_in(pa.array(u2), value_set=nr_w2a), -1)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            nr_u2 = np.where(
                j2 >= 0, nr_cnt[np.clip(j2, 0, max(len(nr_cnt) - 1, 0))], 0
            )
            logqs["kn_logprob_q"] = _kn_pair_logq(
                c2, c1[inv1], n1p[inv1], nr_u2[inv2], bv_global
            )
        gkey = inv1.astype(np.int64) * np.int64(len(u2)) + inv2
        i1 = (
            pc.fill_null(pc.index_in(part["w1"], value_set=pa.array(u1)), -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        i2 = (
            pc.fill_null(pc.index_in(part["w2"], value_set=pa.array(u2)), -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        pos = (
            pc.fill_null(
                pc.index_in(
                    pa.array(i1 * np.int64(len(u2)) + i2), value_set=pa.array(gkey)
                ),
                -1,
            )
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        # every occurrence is in its own partition's model
        cols = {
            id_col: part[id_col],
            "_one": pa.array(np.ones(part.num_rows, dtype=np.int64)),
        }
        for c in lp_cols:
            cols[f"_{c}"] = pa.array(logqs[c][pos])
        t = pa.table(cols)
        aggs = [("_one", "sum")] + [(f"_{c}", "sum") for c in lp_cols]
        out = t.group_by([id_col]).aggregate(aggs)
        return pa.table(
            {
                id_col: out[id_col],
                "bigram_count": out["_one_sum"],
                **{c: out[f"_{c}_sum"] for c in lp_cols},
            }
        )

    pairs = ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)
    partials = pairs.groupby("_part").map_groups(solve, batch_format="pyarrow")
    return hash_aggregate(
        partials,
        [id_col],
        sum_cols=["bigram_count", *lp_cols],
        count=False,
        num_partitions=P,
    ).map_batches(
        lambda t: pa.table(
            {
                id_col: t[id_col],
                "bigram_count": t["sum_bigram_count"],
                **{c: t[f"sum_{c}"] for c in lp_cols},
            }
        ),
        batch_format="pyarrow",
    )


def bigram_count_partial(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch consecutive-word-pair counts — the map-side combiner
    of the bigram count: :func:`_bigram_flat` pairs + one in-batch
    C++ ``group_by``, so the exchange ships one row per (batch,
    distinct bigram), not one per token pair."""
    w1, w2, _ = _bigram_flat(batch[text_col])
    if len(w1) == 0:
        return pa.table(
            {
                "w1": pa.array([], type=pa.string()),
                "w2": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
            }
        )
    t = pa.table({"w1": w1, "w2": w2, "_c": np.ones(len(w1), dtype=np.int64)})
    out = t.group_by(["w1", "w2"]).aggregate([("_c", "sum")])
    return pa.table({"w1": out["w1"], "w2": out["w2"], "n": out["_c_sum"]})


def collocations_topk(
    ds,
    k: int = 50,
    min_count: int = 5,
    text_col: str = "text",
    num_partitions: int = 64,
    corpus_count: int | None = None,
):
    """Corpus-level collocation extraction: the top-``k`` word bigrams
    by pointwise-mutual-information RATIO — the statistic behind
    phrase detection / multi-word-expression mining in tokenizer and
    corpus pipelines (Mikolov et al. 2013 word2vec phrases use the
    same count form).  The score is the PMI argument itself,

        score = (c12 · T²) / (c1 · c2 · B)

    (c12 = bigram count, c1/c2 = unigram counts, T = total tokens,
    B = total bigrams) — MONOTONE with textbook PMI = ln(score·T²/…)
    so the ranking is identical, but computable as ONE IEEE division
    of exact int64 products, which twins bit-exactly against DuckDB
    (this module's log-free rule; see :func:`tfidf_topk_terms`).
    ``min_count`` is the standard low-frequency guard (rare pairs
    otherwise dominate PMI).

    Plan (3 exchanges + 2 partitioned joins, nothing on the driver but
    two int64 totals and the final k rows):
      1. bigram counts: per-batch combiner above → hash-partitioned
         grouped sum; unigram counts: :func:`word_count_partial` →
         same; both materialized (vocab-bounded post-aggregation
         tables — the object store spills, the driver never sees them)
         so the totals pass and the joins share one execution;
      2. ``c12 >= min_count`` filter FIRST, then two
         :func:`rayraster.join.bucket_join` hops attach c1 (on w1) and
         c2 (on w2) — no broadcast: vocabularies at corpus scale
         don't fit a worker;
      3. map-only score with an exact-int64 overflow guard
         (conservative max·max bound; raise → raise ``min_count`` or
         pre-scale counts), native ``sort(score desc, w1, w2)`` +
         ``limit(k)``, rank stamped on the k-row result.

    Returns a k-row Dataset: ``w1, w2, c12, c1, score, rnk``.

    Reference: SEraster has no text operators at all (R/main.R —
    rasterization only); this extends the mandated text-analysis
    family.  SQL twin: two count CTEs + a double join + one division,
    ``QUALIFY rnk <= k`` (see ``__ray_entry__._sql_vocab_topk``,
    path='colloc').
    """
    from rayraster.agg import hash_aggregate
    from rayraster.dedup import _adaptive_parts
    from rayraster.join import bucket_join

    if k < 1:
        raise ValueError("collocations_topk: k must be >= 1")
    if min_count < 1:
        raise ValueError("collocations_topk: min_count must be >= 1")
    parts = _adaptive_parts(corpus_count, num_partitions)

    bi_partial = ds.map_batches(
        lambda t: bigram_count_partial(t, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    bi = hash_aggregate(
        bi_partial, ["w1", "w2"], sum_cols=["n"], count=False, num_partitions=parts
    ).map_batches(
        lambda t: pa.table({"w1": t["w1"], "w2": t["w2"], "c12": t["sum_n"]}),
        batch_format="pyarrow",
    ).materialize()
    uni_partial = ds.map_batches(
        lambda t: word_count_partial(t, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    uni = hash_aggregate(
        uni_partial, ["word"], sum_cols=["n"], count=False, num_partitions=parts
    ).map_batches(
        lambda t: pa.table({"word": t["word"], "c": t["sum_n"]}),
        batch_format="pyarrow",
    ).materialize()

    total_tokens = int(uni.sum("c") or 0)
    total_bigrams = int(bi.sum("c12") or 0)
    if total_bigrams == 0:
        return ray_data_from_table(
            pa.table(
                {
                    "w1": pa.array([], type=pa.string()),
                    "w2": pa.array([], type=pa.string()),
                    "c12": pa.array([], type=pa.int64()),
                    "c1": pa.array([], type=pa.int64()),
                    "score": pa.array([], type=pa.float64()),
                    "rnk": pa.array([], type=pa.int64()),
                }
            )
        )

    mc = int(min_count)
    cand = bi.map_batches(
        lambda t: t.filter(pc.greater_equal(t["c12"], mc)), batch_format="pyarrow"
    )
    # explicit schemas: both sides' lineage contains a shuffle, and the
    # candidate set may be EMPTY (schema probe would return None)
    bi_schema = pa.schema(
        [("w1", pa.string()), ("w2", pa.string()), ("c12", pa.int64())]
    )
    uni_schema = pa.schema([("word", pa.string()), ("c", pa.int64())])
    j1 = bucket_join(
        cand, uni, "w1", "word", num_buckets=parts,
        left_schema=bi_schema, right_schema=uni_schema,
    ).map_batches(
        lambda t: t.rename_columns(["w1", "w2", "c12", "c1"]), batch_format="pyarrow"
    )
    j1_schema = pa.schema(
        [("w1", pa.string()), ("w2", pa.string()), ("c12", pa.int64()),
         ("c1", pa.int64())]
    )
    j2 = bucket_join(
        j1, uni, "w2", "word", num_buckets=parts,
        left_schema=j1_schema, right_schema=uni_schema,
    ).map_batches(
        lambda t: t.rename_columns(["w1", "w2", "c12", "c1", "c2"]),
        batch_format="pyarrow",
    )

    T, B = total_tokens, total_bigrams

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "w1": t["w1"],
                    "w2": t["w2"],
                    "c12": t["c12"],
                    "c1": t["c1"],
                    "score": pa.array([], type=pa.float64()),
                }
            )
        c12 = t["c12"].to_numpy(zero_copy_only=False)
        c1 = t["c1"].to_numpy(zero_copy_only=False)
        c2 = t["c2"].to_numpy(zero_copy_only=False)
        # exact-int64 guard in Python ints (no silent numpy wraparound);
        # conservative (max·max) — raise min_count or pre-scale to pass
        if int(c12.max()) * T * T > 2**63 - 1 or int(c1.max()) * int(c2.max()) * B > 2**63 - 1:
            raise ValueError(
                "collocations_topk: count products exceed int64 — raise "
                "min_count or pre-scale counts (T=%d, B=%d)" % (T, B)
            )
        num = (c12 * np.int64(T) * np.int64(T)).astype(np.float64)
        den = (c1 * c2 * np.int64(B)).astype(np.float64)
        return pa.table(
            {
                "w1": t["w1"],
                "w2": t["w2"],
                "c12": t["c12"],
                "c1": t["c1"],
                "score": pa.array(num / den),
            }
        )

    scored = j2.map_batches(score, batch_format="pyarrow")
    top = scored.sort(
        ["score", "w1", "w2"], descending=[True, False, False]
    ).limit(k)
    # k rows only — bounded driver stamp for the global rank
    tbl = pa.Table.from_pylist(top.take_all())
    if tbl.num_rows == 0:
        tbl = pa.table(
            {
                "w1": pa.array([], type=pa.string()),
                "w2": pa.array([], type=pa.string()),
                "c12": pa.array([], type=pa.int64()),
                "c1": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64()),
            }
        )
    tbl = tbl.append_column(
        "rnk", pa.array(np.arange(1, tbl.num_rows + 1, dtype=np.int64))
    )
    return ray_data_from_table(tbl)


def keywords_textrank(
    ds,
    edges_path: str,
    k: int = 20,
    iterations: int = 3,
    text_col: str = "text",
    scale: int = 1_000_000,
    num_partitions: int = 64,
    corpus_count: int | None = None,
):
    """TextRank keyword extraction (Mihalcea & Tarau 2004): rank every
    vocabulary word by WEIGHTED PageRank over the word co-occurrence
    graph (bigram adjacency, undirected) and return the top-``k`` —
    the classic unsupervised corpus-keyword primitive, here as a
    composition of already-proven distributed stages:

      1. unigram counts (one partitioned grouped sum), then word →
         dense int64 id via :func:`rayraster.agg.global_rank` ordered
         ``(count DESC, word ASC)`` — deterministic and
         SQL-reproducible (``ROW_NUMBER``), no string hashing;
      2. bigram counts (one grouped sum) + two
         :func:`rayraster.join.bucket_join` hops to swap endpoints for
         ids, then a map-only symmetrization (both directions, weight
         = bigram count — parallel edges fold inside PageRank);
      3. :func:`rayraster.graph.pagerank` WEIGHTED variant: int64
         fixed-point (bit-identical across partitionings / cluster
         sizes), edges persisted bucketed at ``edges_path``, exact
         overflow bounds checked from recorded layout maxima (the
         default ``scale`` is 1e6, not PageRank's 1e9 — vocab · scale
         · 85 · max-bigram-count must stay < 2^63);
      4. one ``bucket_join`` back to words, native sort + ``limit(k)``,
         rank stamped on the k-row result.

    Returns ``(word, wid, n, pr, score, rnk)`` — ``n`` the global
    count, ``pr`` the int64 fixed-point rank after ``iterations``
    synchronous rounds, ``score = pr / scale`` (ONE IEEE division),
    ``rnk`` 1-based ordered ``(pr DESC, word ASC)``.

    Reference: SEraster has no text operators (R/main.R); this extends
    the mandated text-analysis family with graph-based keyword
    scoring.  SQL twin: unigram/bigram CTEs + ROW_NUMBER ids + 3
    unrolled integer PageRank rounds (``__ray_entry__._sql_vocab_topk``
    path='textrank').
    """
    from rayraster.agg import global_rank, hash_aggregate
    from rayraster.dedup import _adaptive_parts
    from rayraster.graph import pagerank
    from rayraster.join import bucket_join

    if k < 1:
        raise ValueError("keywords_textrank: k must be >= 1")
    if iterations < 1:
        raise ValueError("keywords_textrank: iterations must be >= 1")
    parts = _adaptive_parts(corpus_count, num_partitions)

    uni = hash_aggregate(
        ds.map_batches(
            lambda t: word_count_partial(t, text_col),
            batch_format="pyarrow", zero_copy_batch=True,
        ),
        ["word"], sum_cols=["n"], count=False, num_partitions=parts,
    ).map_batches(
        lambda t: pa.table({"word": t["word"], "n": t["sum_n"]}),
        batch_format="pyarrow",
    ).materialize()
    vocab_n = uni.count()
    empty = pa.table(
        {
            "word": pa.array([], type=pa.string()),
            "wid": pa.array([], type=pa.int64()),
            "n": pa.array([], type=pa.int64()),
            "pr": pa.array([], type=pa.int64()),
            "score": pa.array([], type=pa.float64()),
            "rnk": pa.array([], type=pa.int64()),
        }
    )
    if vocab_n == 0:
        return ray_data_from_table(empty)

    ids = global_rank(
        uni, [("n", "descending"), ("word", "ascending")],
        bucket_fn=lambda t: -t["n"].to_numpy(zero_copy_only=False),
        rank_col="wid", num_partitions=parts,
    ).materialize()
    ids_schema = pa.schema(
        [("word", pa.string()), ("n", pa.int64()), ("wid", pa.int64())]
    )

    bi = hash_aggregate(
        ds.map_batches(
            lambda t: bigram_count_partial(t, text_col),
            batch_format="pyarrow", zero_copy_batch=True,
        ),
        ["w1", "w2"], sum_cols=["n"], count=False, num_partitions=parts,
    ).map_batches(
        lambda t: pa.table({"w1": t["w1"], "w2": t["w2"], "c12": t["sum_n"]}),
        batch_format="pyarrow",
    )
    bi_schema = pa.schema(
        [("w1", pa.string()), ("w2", pa.string()), ("c12", pa.int64())]
    )
    j1 = bucket_join(
        bi, ids, "w1", "word", num_buckets=parts,
        left_schema=bi_schema, right_schema=ids_schema,
    ).map_batches(
        lambda t: pa.table(
            {"w2": t["w2"], "c12": t["c12"], "wid1": t["wid"]}
        ),
        batch_format="pyarrow",
    )
    j1_schema = pa.schema(
        [("w2", pa.string()), ("c12", pa.int64()), ("wid1", pa.int64())]
    )
    pairs = bucket_join(
        j1, ids, "w2", "word", num_buckets=parts,
        left_schema=j1_schema, right_schema=ids_schema,
    ).map_batches(
        lambda t: pa.table(
            {"a": t["wid1"], "b": t["wid"], "w": t["c12"]}
        ),
        batch_format="pyarrow",
    )

    def symmetrize(t: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [
                pa.table({"src": t["a"], "dst": t["b"], "w": t["w"]}),
                pa.table({"src": t["b"], "dst": t["a"], "w": t["w"]}),
            ]
        )

    edges = pairs.map_batches(symmetrize, batch_format="pyarrow")
    nodes = ids.map_batches(
        lambda t: pa.table({"node": t["wid"]}), batch_format="pyarrow"
    )
    pr = pagerank(
        edges, edges_path, nodes=nodes, iterations=iterations,
        scale=scale, num_buckets=parts, node_count=vocab_n,
        weight_col="w",
    )
    pr_schema = pa.schema([("node", pa.int64()), ("pr", pa.int64())])
    back = bucket_join(
        pr, ids, "node", "wid", num_buckets=parts,
        left_schema=pr_schema, right_schema=ids_schema,
    ).map_batches(
        lambda t: pa.table(
            {"word": t["word"], "wid": t["node"], "n": t["n"], "pr": t["pr"]}
        ),
        batch_format="pyarrow",
    )
    top = back.sort(["pr", "word"], descending=[True, False]).limit(k)
    tbl = pa.Table.from_pylist(top.take_all())
    if tbl.num_rows == 0:
        tbl = empty.drop_columns(["score", "rnk"])
    prv = tbl["pr"].to_numpy(zero_copy_only=False).astype(np.int64)
    tbl = tbl.select(["word", "wid", "n", "pr"]).append_column(
        "score", pa.array(prv.astype(np.float64) / np.float64(scale))
    ).append_column(
        "rnk", pa.array(np.arange(1, tbl.num_rows + 1, dtype=np.int64))
    )
    return ray_data_from_table(tbl)


_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")


def summarize_textrank(
    ds,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    iterations: int = 30,
    damping: float = 0.85,
):
    """Per-document EXTRACTIVE summarization (TextRank over the
    sentence-similarity graph, Mihalcea & Tarau 2004 §4): keep each
    document's ``k`` most central sentences, re-joined in ORIGINAL
    order — the salient-content extraction stage of a curation
    pipeline (filter boilerplate-heavy docs to their informative
    core before token budgeting).

    Embarrassingly parallel map-only stage: the unit of work is one
    DOCUMENT (a dense |S|×|S| overlap matrix + a fixed-iteration power
    method in numpy — |S| is sentence count, tiny), so there is no
    exchange, no state, and the result is deterministic per document
    regardless of batching/partitioning.  Similarity is Mihalcea's
    word-overlap normalized by ``1 + log|Si| + log|Sj|`` (the +1
    guards 1-word sentences); documents with ≤ k sentences pass
    through whole.

    Returns ``(id, summary, n_sentences, n_kept)``.
    """
    if k < 1:
        raise ValueError("summarize_textrank: k must be >= 1")
    if iterations < 1:
        raise ValueError("summarize_textrank: iterations must be >= 1")
    if not (0.0 < damping < 1.0):
        raise ValueError("summarize_textrank: damping must be in (0, 1)")

    def kernel(text: str) -> tuple[str, int, int]:
        sents = [s for s in _SENT_SPLIT.split(text) if s.strip()]
        n = len(sents)
        if n == 0:
            return "", 0, 0
        if n <= k:
            return " ".join(sents), n, n
        words = [set(s.lower().split()) for s in sents]
        norm = np.array([1.0 + np.log(max(len(w), 1)) for w in words])
        M = np.zeros((n, n))
        for i in range(n):
            for j in range(i + 1, n):
                ov = len(words[i] & words[j])
                if ov:
                    M[i, j] = M[j, i] = ov / (norm[i] + norm[j])
        col = M.sum(axis=0)
        col[col == 0.0] = 1.0  # isolated sentences keep teleport mass only
        P = M / col  # column-stochastic (or zero column)
        r = np.full(n, 1.0 / n)
        for _ in range(iterations):
            r = (1.0 - damping) / n + damping * (P @ r)
        keep = np.sort(np.lexsort((np.arange(n), -r))[:k])
        return " ".join(sents[i] for i in keep), n, k

    def run(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        outs = [kernel(x or "") for x in texts]
        return pa.table(
            {
                "id": t[id_col],
                "summary": pa.array([o[0] for o in outs], type=pa.string()),
                "n_sentences": pa.array(
                    [o[1] for o in outs], type=pa.int64()
                ),
                "n_kept": pa.array([o[2] for o in outs], type=pa.int64()),
            }
        )

    return ds.map_batches(run, batch_format="pyarrow", zero_copy_batch=True)


def ray_data_from_table(t: pa.Table):
    import ray.data as _rd

    return _rd.from_arrow(t)


def build_positional_index(
    docs,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
) -> str:
    """Persisted POSITIONAL inverted index: every ``(word, doc_id,
    pos)`` occurrence (pos = 0-based token index within the doc),
    hash-bucketed by word into the same
    :func:`rayraster.join.write_bucketed` layout as
    :func:`build_inverted_index` — the storage that makes PHRASE
    queries (:func:`phrase_search`) a bucket-pruned read instead of a
    corpus scan.  ~tokens rows instead of distinct pairs; positions
    are what Lucene calls the ``positions`` posting payload.

    Emission is fully vectorized: one flat-token pass per batch, token
    positions from the doc-segment offsets (no per-row Python)."""
    from rayraster.join import write_bucketed

    def occurrences(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"word": pa.array([], type=pa.string()),
             id_col: pa.array([], type=pa.int64()),
             "pos": pa.array([], type=pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        flat, doc = _split_words_flat(_combined(pc.fill_null(batch[text_col], "")))
        n = len(flat)
        if n == 0:
            return empty
        first = np.ones(n, dtype=bool)
        first[1:] = doc[1:] != doc[:-1]
        idx = np.arange(n, dtype=np.int64)
        starts = np.maximum.accumulate(np.where(first, idx, 0))
        return pa.table(
            {"word": flat, id_col: pa.array(ids[doc]),
             "pos": pa.array(idx - starts)}
        )

    occ = docs.map_batches(
        occurrences, batch_format="pyarrow", zero_copy_batch=True
    )
    return write_bucketed(occ, "word", path, num_buckets=num_buckets)


def phrase_search(
    path: str,
    phrase: list[str],
    id_col: str = "doc_id",
    num_partitions: int = 8,
):
    """Exact phrase retrieval over a :func:`build_positional_index`
    layout: docs containing the words of ``phrase`` CONSECUTIVELY, in
    order.  Returns a Dataset of ``(doc_id, n_hits)`` (n_hits =
    distinct anchor positions; overlapping matches each count).

    Anchor algebra (the classic positional-postings plan): a posting
    ``(w, doc, p)`` supports phrase offset ``i`` iff ``w ==
    phrase[i]``, contributing the anchor ``p − i``; a doc matches at
    anchor ``a`` iff all ``len(phrase)`` offsets contributed ``(doc,
    a)``.  Each (doc, anchor, i) triple is unique by construction, so
    the match test is ONE count per (doc, anchor) — no distinct pass.

    Reads ONLY the bucket dirs the phrase's distinct words hash to
    (term filter pushed into the parquet read, like
    :func:`search_index`), then ONE hash-partition exchange keyed by
    doc — anchors of a doc co-locate, and the per-partition finish is
    a vectorized lexsort + run-length pass."""
    import glob as _glob
    import os

    import pyarrow.dataset as pads

    import ray.data as rd

    from rayraster.join import _read_bucket_manifest, key_bucket

    if len(phrase) < 2:
        raise ValueError("phrase_search: need at least two words")
    terms = sorted(set(phrase))
    files = _probed_bucket_files(path, terms)
    empty = pa.table(
        {id_col: pa.array([], type=pa.int64()),
         "n_hits": pa.array([], type=pa.int64())}
    )
    if not files:
        return rd.from_arrow(empty)
    hits = rd.read_parquet(
        files,
        columns=["word", id_col, "pos"],
        filter=pads.field("word").isin(terms),
    )
    L = len(phrase)
    offsets_of = {}  # word -> [phrase offsets]
    for i, w in enumerate(phrase):
        offsets_of.setdefault(w, []).append(i)

    def anchors(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], type=pa.int64()),
                 "anchor": pa.array([], type=pa.int64()),
                 "_part": pa.array([], type=pa.int64())}
            )
        doc = t[id_col].to_numpy(zero_copy_only=False)
        pos = t["pos"].to_numpy(zero_copy_only=False)
        parts = []
        for w, offs in offsets_of.items():
            mask = pc.equal(t["word"], w).to_numpy(zero_copy_only=False)
            if not mask.any():
                continue
            d, p = doc[mask], pos[mask]
            for i in offs:
                a = p - i
                keep = a >= 0
                parts.append((d[keep], a[keep]))
        if not parts:
            return pa.table(
                {id_col: pa.array([], type=pa.int64()),
                 "anchor": pa.array([], type=pa.int64()),
                 "_part": pa.array([], type=pa.int64())}
            )
        dd = np.concatenate([x for x, _ in parts])
        aa = np.concatenate([y for _, y in parts])
        part = np.abs(dd * np.int64(1000003)) % np.int64(num_partitions)
        return pa.table(
            {id_col: pa.array(dd), "anchor": pa.array(aa), "_part": pa.array(part)}
        )

    def finish(part: pa.Table) -> pa.Table:
        part = part.drop_columns(["_part"])
        if part.num_rows == 0:
            return empty
        d = part[id_col].to_numpy(zero_copy_only=False)
        a = part["anchor"].to_numpy(zero_copy_only=False)
        order = np.lexsort((a, d))
        d, a = d[order], a[order]
        new = np.ones(len(d), dtype=bool)
        new[1:] = (d[1:] != d[:-1]) | (a[1:] != a[:-1])
        grp = np.cumsum(new) - 1
        counts = np.bincount(grp)
        full = counts == L  # all offsets present at this anchor
        gd = d[new]  # one doc id per (doc, anchor) group
        hit_docs = gd[full]
        if len(hit_docs) == 0:
            return empty
        uniq, n_hits = np.unique(hit_docs, return_counts=True)
        return pa.table(
            {id_col: pa.array(uniq), "n_hits": pa.array(n_hits.astype(np.int64))}
        )

    cand = hits.map_batches(anchors, batch_format="pyarrow", zero_copy_batch=True)
    return cand.groupby("_part").map_groups(finish, batch_format="pyarrow")


def oov_rate(
    docs,
    vocab,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Per-document out-of-vocabulary rate against a fixed vocabulary
    — the tokenizer-coverage audit run before committing a trained
    vocab (docs with high OOV either need the vocab extended or get
    filtered).  MAP-ONLY: the vocab ships once via ``ray.put`` (the
    small side of a broadcast join, never per batch), each batch does
    one flat-token pass + one C++ ``is_in`` hash probe + one bincount
    — no shuffle, no driver state.

    Returns ``(doc_id, n_tokens, n_oov, oov_frac)`` per doc;
    ``oov_frac`` = n_oov/n_tokens as one IEEE division (0.0 for empty
    docs).  Tokenization is the module's shared ``\\s+`` RE2 rule."""
    import ray as _ray

    varr = pa.array(sorted(set(vocab)), type=pa.string())
    if len(varr) == 0:
        raise ValueError("oov_rate: vocabulary is empty")
    vref = _ray.put(varr)

    def score(batch: pa.Table) -> pa.Table:
        vs = _ray.get(vref) if isinstance(vref, _ray.ObjectRef) else vref
        ids = batch[id_col]
        nrows = batch.num_rows
        flat, doc = _split_words_flat(_combined(pc.fill_null(batch[text_col], "")))
        total = np.bincount(doc, minlength=nrows).astype(np.int64)
        if len(flat):
            known = pc.is_in(flat, value_set=vs).to_numpy(zero_copy_only=False)
            oov = np.bincount(doc[~known], minlength=nrows).astype(np.int64)
        else:
            oov = np.zeros(nrows, dtype=np.int64)
        frac = np.where(total > 0, oov / np.maximum(total, 1), 0.0)
        return pa.table(
            {id_col: ids, "n_tokens": pa.array(total), "n_oov": pa.array(oov),
             "oov_frac": pa.array(frac)}
        )

    return docs.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def pattern_counts(
    docs,
    patterns: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple = (),
):
    """Per-document occurrence counts of NAMED regex patterns — the
    audit pass before :func:`redact_pii` (how much PII is there, per
    doc and pattern, without touching the bytes) or any policy filter
    keyed on pattern density.  ``patterns`` maps output column name →
    RE2 pattern; each becomes one vectorized C++
    ``count_substring_regex`` kernel per batch — map-only, no shuffle,
    no Python in the hot path.

    Returns ``(doc_id, n_<name>…)`` plus ``n_total`` (sum across
    patterns, exact int64) and any ``keep_cols`` passed through
    unchanged (so the audit can ride an existing per-doc row set
    without a join).  NULL text counts 0 everywhere (the module's
    NULL ≡ '' convention)."""
    if not patterns:
        raise ValueError("pattern_counts: need at least one named pattern")
    names = list(patterns)
    if any(not n or not n.isidentifier() for n in names):
        raise ValueError("pattern_counts: names must be identifiers")

    def count(batch: pa.Table) -> pa.Table:
        t = pc.fill_null(batch[text_col], "")
        cols = {id_col: batch[id_col]}
        for kc in keep_cols:
            cols[kc] = batch[kc]
        total = np.zeros(batch.num_rows, dtype=np.int64)
        for name in names:
            c = pc.count_substring_regex(t, patterns[name]).cast(pa.int64())
            cols[f"n_{name}"] = c
            total += c.to_numpy(zero_copy_only=False)
        cols["n_total"] = pa.array(total)
        return pa.table(cols)

    return docs.map_batches(count, batch_format="pyarrow", zero_copy_batch=True)


def nb_train(
    ds,
    text_col: str = "text",
    label_col: str = "lang",
    num_partitions: int = 64,
    max_vocab: int | None = None,
    q: int = _LM_Q,
) -> dict:
    """Train a multinomial Naive Bayes text classifier — the classic
    supervised companion of the heuristic :class:`LangIdStage`
    (McCallum & Nigam 1998; language/domain/topic classification in
    curation pipelines).  No reference counterpart (SEraster has no
    text ops); the distributed shape is the same grouped-count fold as
    :func:`vocab_topk`.

    Counts are gathered distributedly — per-batch ``(label, word)``
    partial ``group_by`` counts folded through ONE hash-partitioned
    exchange — and only the model itself (vocab × classes) lands on
    the driver: the broadcast-side contract.  ``max_vocab`` caps the
    feature space to the top-V words by (corpus frequency desc, word
    asc) — the standard feature-selection escape hatch when the full
    vocabulary would not fit a worker heap; out-of-vocab tokens are
    then dropped at both train and score time.

    Probabilities are add-one smoothed exact integer ratios
    ``(c+1)/(tot_c+V)`` quantized through :func:`_floor_q_log`
    (libm-repaired ``floor(q·ln r)``), so every score is an exact
    int64 sum — bit-identical across partitionings, cluster sizes and
    a SQL twin using ``FLOOR(q*LN(...))`` on the same IEEE divisions.

    Returns the model dict consumed by :func:`nb_score`.
    """
    from rayraster.agg import hash_aggregate

    def pair_partial(t: pa.Table) -> pa.Table:
        flat, doc = _split_words_flat(_combined(t[text_col]))
        labels = _combined(t[label_col]).take(pa.array(doc))
        g = (
            pa.table({"label": labels, "word": flat})
            .group_by(["label", "word"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {"label": g["label"], "word": g["word"],
             "c": g["count_all"].cast(pa.int64())}
        )

    folded = hash_aggregate(
        ds.map_batches(pair_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=["label", "word"],
        sum_cols=["c"],
        count=False,
        num_partitions=num_partitions,
    )
    # the model is the ONE driver materialization (vocab × classes —
    # the broadcast side), same contract as vocab_topk's k rows
    counts = pa.concat_tables(folded.iter_batches(batch_format="pyarrow"))
    lab = np.asarray(counts["label"].to_pylist(), dtype=object)
    wrd = np.asarray(counts["word"].to_pylist(), dtype=object)
    cnt = counts["sum_c"].to_numpy(zero_copy_only=False).astype(np.int64)

    if max_vocab is not None:
        if max_vocab < 1:
            raise ValueError(f"nb_train: max_vocab must be >= 1, got {max_vocab}")
        uw, inv = np.unique(wrd, return_inverse=True)
        freq = np.bincount(inv, weights=cnt.astype(np.float64)).astype(np.int64)
        order = np.lexsort((uw, -freq))[:max_vocab]  # freq desc, word asc
        keep_words = set(uw[order].tolist())
        m = np.fromiter((w in keep_words for w in wrd), dtype=bool, count=len(wrd))
        lab, wrd, cnt = lab[m], wrd[m], cnt[m]
    if len(wrd) == 0:
        raise ValueError("nb_train: empty corpus (no tokens)")

    # priors from per-label doc counts (second tiny fold)
    def lab_rows(t: pa.Table) -> pa.Table:
        return pa.table({"label": t[label_col]})

    pri = pa.concat_tables(
        hash_aggregate(
            ds.map_batches(lab_rows, batch_format="pyarrow"),
            keys=["label"], count=True, count_name="nd",
            num_partitions=min(num_partitions, 16),
        ).iter_batches(batch_format="pyarrow")
    )
    plab = np.asarray(pri["label"].to_pylist(), dtype=object)
    pnd = pri["nd"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_docs = int(pnd.sum())

    # classes = ALL labels seen in docs (a label whose every doc is
    # empty text still gets a column — its likelihoods are the pure
    # add-one floor 1/V, matching a twin that outer-joins token totals)
    classes = np.unique(np.concatenate([lab, plab]))
    vocab = np.unique(wrd)
    V, C = len(vocab), len(classes)
    M = np.zeros((V, C), dtype=np.int64)
    M[np.searchsorted(vocab, wrd), np.searchsorted(classes, lab)] = cnt
    tot = M.sum(axis=0)
    nd = np.zeros(C, dtype=np.int64)
    nd[np.searchsorted(classes, plab)] = pnd

    # the FIXED expression tree both engines evaluate: one IEEE
    # division, then floor(q·ln) with libm boundary repair
    denom = (tot + V).astype(np.float64)
    lq = _floor_q_log(((M + 1).astype(np.float64) / denom).reshape(-1), q)
    lq = lq.reshape(V, C)
    miss_lq = _floor_q_log(1.0 / denom, q)
    with np.errstate(divide="ignore"):
        prior_lq = _floor_q_log(
            np.where(nd > 0, nd, 1).astype(np.float64) / float(n_docs), q
        )
    prior_lq = np.where(nd > 0, prior_lq, np.int64(np.iinfo(np.int64).min // 4))
    return {
        "classes": classes.tolist(),
        "vocab": pa.array(vocab.tolist(), type=pa.string()),
        "lq": lq,
        "miss_lq": miss_lq,
        "prior_lq": prior_lq,
        "q": int(q),
        "drop_oov": max_vocab is not None,
    }


def nb_score(
    ds,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Score documents with an :func:`nb_train` model — map-only, the
    model broadcast ONCE via ``ray.put`` and read per actor, one C++
    ``index_in`` vocab probe + one matrix gather per batch.

    Returns ``(id_col, nb_pred, nb_score_q)``: the argmax class (ties
    → lexicographically smallest, matching a ``ROW_NUMBER(score DESC,
    class ASC)`` twin) and its exact int64 quantized log-score
    ``floor_q_log(prior) + Σ_tokens floor_q_log(P(w|class))``.
    Out-of-vocab tokens contribute the add-one floor ``1/(tot_c+V)``
    unless the model was vocab-capped (then they are dropped, the
    feature-selection semantics)."""
    import ray

    classes = model["classes"]
    ref = ray.put((model["vocab"], model["lq"], model["miss_lq"],
                   model["prior_lq"], model["drop_oov"]))

    def score(t: pa.Table) -> pa.Table:
        vocab, lq, miss_lq, prior_lq, drop_oov = ray.get(ref)
        n = t.num_rows
        flat, doc = _split_words_flat(_combined(t[text_col]))
        scores = np.tile(prior_lq, (n, 1))
        if len(flat):
            idx = pc.index_in(flat, value_set=vocab)
            valid = pc.is_valid(idx).to_numpy(zero_copy_only=False)
            iv = idx.to_numpy(zero_copy_only=False)
            if valid.any():
                np.add.at(scores, doc[valid], lq[iv[valid].astype(np.int64)])
            if not drop_oov and (~valid).any():
                nmiss = np.bincount(doc[~valid], minlength=n).astype(np.int64)
                scores += nmiss[:, None] * miss_lq[None, :]
        best = np.argmax(scores, axis=1)  # first max = smallest class
        return pa.table({
            id_col: t[id_col],
            "nb_pred": pa.array(np.asarray(classes, dtype=object)[best],
                                type=pa.string()),
            "nb_score_q": pa.array(scores[np.arange(n), best]),
        })

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def flesch_score(
    batch: pa.Table, text_col: str = "text", out_col: str = "flesch"
) -> pa.Table:
    """Flesch reading-ease with the standard regex surrogates
    (readability filtering for curation, Flesch 1948): words =
    ``\\S+`` runs, sentences = ``[.!?]+`` runs, syllables =
    ``[aeiouyAEIOUY]+`` vowel groups — all three are single RE2
    ``count_substring_regex`` passes (the SAME RE2 DuckDB links, so a
    twin using ``regexp_extract_all`` lengths counts identically).

    ``score = 206.835 − 1.015·(W/S) − 84.6·(Y/W)`` with W and S
    floored at 1 — a FIXED IEEE expression tree (two divisions, two
    multiplies, two subtractions, no libm), bit-equal to the same SQL
    expression.  Map-only; appends ``out_col``."""
    t = pc.fill_null(batch[text_col], "")
    one = pa.scalar(1, type=pa.int64())
    W = pc.max_element_wise(
        pc.count_substring_regex(t, r"\S+").cast(pa.int64()), one
    ).to_numpy(zero_copy_only=False).astype(np.float64)
    S = pc.max_element_wise(
        pc.count_substring_regex(t, r"[.!?]+").cast(pa.int64()), one
    ).to_numpy(zero_copy_only=False).astype(np.float64)
    Y = (
        pc.count_substring_regex(t, r"[aeiouyAEIOUY]+")
        .cast(pa.int64())
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )
    score = 206.835 - 1.015 * (W / S) - 84.6 * (Y / W)
    return batch.append_column(out_col, pa.array(score))


def _utf8_codepoints(data: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized UTF-8 → codepoints over a flat byte buffer (Arrow
    strings are guaranteed valid UTF-8).  Returns (codepoints,
    start_positions) — both one entry per character."""
    is_start = (data & np.uint8(0xC0)) != np.uint8(0x80)
    start_idx = np.flatnonzero(is_start)
    if len(start_idx) == 0:
        return np.zeros(0, dtype=np.int64), start_idx
    nb = np.diff(np.append(start_idx, len(data)))
    bp = np.concatenate([data, np.zeros(3, dtype=np.uint8)]).astype(np.int64)
    b0 = bp[start_idx]
    b1, b2, b3 = bp[start_idx + 1], bp[start_idx + 2], bp[start_idx + 3]
    cp = np.select(
        [nb == 1, nb == 2, nb == 3],
        [
            b0,
            ((b0 & 0x1F) << 6) | (b1 & 0x3F),
            ((b0 & 0x0F) << 12) | ((b1 & 0x3F) << 6) | (b2 & 0x3F),
        ],
        default=((b0 & 0x07) << 18) | ((b1 & 0x3F) << 12)
        | ((b2 & 0x3F) << 6) | (b3 & 0x3F),
    )
    return cp, start_idx


def char_entropy(
    batch: pa.Table, text_col: str = "text", q: int = _LM_Q
) -> pa.Table:
    """Per-document character (codepoint) Shannon entropy — the
    classic gibberish / compressibility quality signal (≈0 bits =
    repeated boilerplate, high = diverse text; the SQL-reproducible
    stand-in for the zlib-ratio filter in Gopher-style curation
    stacks).

    Exactness contract: entropy in bits is

        H = (ln n − (1/n)·Σ_c k_c·ln k_c) / ln 2

    over the per-doc codepoint counts ``k_c``.  Every per-codepoint
    term is quantized to int64 — ``floor(q·(k·ln k))`` with the
    module's libm-boundary repair (the :func:`_floor_q_log` rule) —
    so the per-doc sum ``ent_sum_q`` is an ORDER-INDEPENDENT exact
    integer, and the final float is one fixed-order expression the
    DuckDB twin (``unicode(substr(text, i, 1))`` unnest) reproduces
    bit-for-bit:

        entropy = (ln_n_q − ent_sum_q / n_cp) / (q · ln 2)

    Map-only — one vectorized pass over the flat Arrow byte buffer
    (UTF-8 decoded by bit ops, np.unique on ``doc·2^21 + codepoint``
    keys), no per-row Python.  Appends ``n_cp``, ``ln_n_q``,
    ``ent_sum_q``, ``entropy``; empty/NULL docs get 0s and 0.0."""
    import math

    col = pc.fill_null(batch[text_col], "")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.cast(pa.large_binary())
    n_docs = len(col)
    bufs = col.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int64)[col.offset : col.offset + n_docs + 1]
    blens = np.diff(offs)
    ent_sum = np.zeros(n_docs, dtype=np.int64)
    ln_n_q = np.zeros(n_docs, dtype=np.int64)
    n_cp = np.zeros(n_docs, dtype=np.int64)
    if blens.sum() > 0:
        data = np.frombuffer(bufs[2], dtype=np.uint8)[offs[0] : offs[-1]]
        doc_rep = np.repeat(np.arange(n_docs, dtype=np.int64), blens)
        cp, start_idx = _utf8_codepoints(data)
        doc_of_char = doc_rep[start_idx]
        n_cp = np.bincount(doc_of_char, minlength=n_docs).astype(np.int64)
        key = doc_of_char * np.int64(1 << 21) + cp
        uniq, counts = np.unique(key, return_counts=True)
        cf = counts.astype(np.float64)
        v = float(q) * (cf * np.log(cf))
        terms = np.floor(v)
        sus = np.abs(v - np.rint(v)) < 1e-6
        if sus.any():
            idx = np.nonzero(sus)[0]
            terms[idx] = [
                math.floor(q * (float(counts[i]) * math.log(float(counts[i]))))
                for i in idx
            ]
        np.add.at(ent_sum, uniq >> np.int64(21), terms.astype(np.int64))
        nz = n_cp > 0
        ln_n_q[nz] = _floor_q_log(n_cp[nz].astype(np.float64), q)
    nf = n_cp.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        ent = (ln_n_q.astype(np.float64) - ent_sum.astype(np.float64) / nf) / (
            float(q) * math.log(2.0)
        )
    ent = np.where(n_cp > 0, ent, 0.0)
    return (
        batch.append_column("n_cp", pa.array(n_cp))
        .append_column("ln_n_q", pa.array(ln_n_q))
        .append_column("ent_sum_q", pa.array(ent_sum))
        .append_column("entropy", pa.array(ent))
    )


def rrf_fuse(
    rank_a: "Dataset",
    rank_b: "Dataset",
    k0: int = 60,
    num_buckets: int = 8,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> "Dataset":
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR
    2009) of TWO rankings — the standard way to combine heterogeneous
    retrieval signals (BM25 × freshness, lexical × vector) without
    score calibration:

        rrf(d) = 1/(k0 + rank_a(d)) + 1/(k0 + rank_b(d))

    with a missing ranking contributing exactly 0.  One FULL-OUTER
    hash-partitioned :func:`rayraster.join.bucket_join` on the doc id
    (both sides stream — ranked lists are usually tiny but nothing
    here assumes it), then a map-only FIXED-ORDER float expression
    (a-term + b-term — never a grouped float sum, whose order would
    be plan-dependent), then one single-group sort assigning the
    fused rank by (score DESC, doc_id).  Bit-reproducible in SQL.
    Fuse more than two rankings by folding pairwise.

    Returns ``(doc_id, score, rnk)``."""
    from rayraster.join import bucket_join

    if k0 < 1:
        raise ValueError("rrf_fuse: k0 must be >= 1")

    def prep(side: str):
        def f(t: pa.Table) -> pa.Table:
            cols = {
                f"{side}_key": t[id_col].cast(pa.int64()),
                f"{side}_r": t[rank_col].cast(pa.int64()),
            }
            if side == "b":  # the join drops the right KEY column
                cols["b_id"] = t[id_col].cast(pa.int64())
            return pa.table(cols)

        return f

    a = rank_a.map_batches(prep("a"), batch_format="pyarrow")
    b = rank_b.map_batches(prep("b"), batch_format="pyarrow")
    j = bucket_join(
        a, b, "a_key", "b_key", num_buckets=num_buckets, join_type="full",
        left_schema=pa.schema([("a_key", pa.int64()), ("a_r", pa.int64())]),
        right_schema=pa.schema(
            [("b_key", pa.int64()), ("b_r", pa.int64()), ("b_id", pa.int64())]
        ),
    )

    def score(t: pa.Table) -> pa.Table:
        # presence from the RANK columns: pyarrow's full-outer join may
        # coalesce the key into the left key column, so a_key validity
        # is not "row came from a"
        a_has = pc.is_valid(t["a_r"]).to_numpy(zero_copy_only=False)
        b_has = pc.is_valid(t["b_r"]).to_numpy(zero_copy_only=False)
        ak = pc.fill_null(t["a_key"], 0).to_numpy(zero_copy_only=False)
        ar = pc.fill_null(t["a_r"], 0).to_numpy(zero_copy_only=False)
        bi = pc.fill_null(t["b_id"], 0).to_numpy(zero_copy_only=False)
        br = pc.fill_null(t["b_r"], 0).to_numpy(zero_copy_only=False)
        key = np.where(a_has, ak, bi).astype(np.int64)
        sa = np.where(a_has, 1.0 / (np.float64(k0) + ar.astype(np.float64)), 0.0)
        sb = np.where(b_has, 1.0 / (np.float64(k0) + br.astype(np.float64)), 0.0)
        return pa.table(
            {"doc_id": pa.array(key), "score": pa.array(sa + sb),
             "_one": pa.array(np.zeros(len(key), dtype=np.int64))}
        )

    def finish(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_one"]).sort_by(
            [("score", "descending"), ("doc_id", "ascending")]
        )
        return g.append_column(
            "rnk", pa.array(np.arange(1, g.num_rows + 1, dtype=np.int64))
        )

    return j.map_batches(score, batch_format="pyarrow").groupby("_one").map_groups(
        finish, batch_format="pyarrow"
    )


def zipf_stats(
    ds,
    text_col: str = "text",
    k: int = 10,
    num_partitions: int = 64,
    corpus_count: int | None = None,
):
    """Zipf rank-frequency profile of the WHOLE vocabulary — the
    corpus-health diagnostic (a natural corpus follows freq ∝ 1/rank;
    template spam and synthetic floods bend the curve):

    * the full vocabulary is ranked distributively by (freq DESC,
      word ASC) with :func:`rayraster.agg.global_rank` — no all-to-all
      sort; driver state = one frequency histogram
    * the profile is pinned by exact int64 folds over EVERY vocab
      row: Σ rank·freq (the rank-weighted mass — any rank or count
      off by one changes it), vocabulary size V, hapax count H
      (freq = 1), and total token mass T = Σ freq

    Returns ``(topk, stats)``: ``topk`` = the first ``k`` (rank, word,
    n) rows along the ranking; ``stats`` = ``{"rank_dot_freq",
    "vocab_size", "hapax", "tokens"}`` — all exact ints, identical at
    any partitioning."""
    import pyarrow.compute as _pc

    from rayraster.agg import global_rank, hash_aggregate
    from rayraster.dedup import _adaptive_parts

    P = _adaptive_parts(corpus_count, num_partitions)
    partial = ds.map_batches(
        lambda t: word_count_partial(t, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    counts = hash_aggregate(
        partial, ["word"], sum_cols=["n"], count=False, num_partitions=P,
    ).map_batches(
        lambda t: pa.table({"word": t["word"], "n": t["sum_n"]}),
        batch_format="pyarrow",
    )
    ranked = global_rank(
        counts,
        [("n", "descending"), ("word", "ascending")],
        bucket_fn=lambda t: -t["n"].to_numpy(zero_copy_only=False),
        rank_col="rank",
        num_partitions=P,
    ).materialize()  # consumed twice: top-k + the stats folds

    def fold(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = t["rank"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"rdf": pa.array([int((r * n).sum())], type=pa.int64()),
             "v": pa.array([len(n)], type=pa.int64()),
             "h": pa.array([int((n == 1).sum())], type=pa.int64()),
             "tok": pa.array([int(n.sum())], type=pa.int64())}
        )

    parts = ranked.map_batches(fold, batch_format="pyarrow").take_all()
    stats = {
        "rank_dot_freq": sum(p["rdf"] for p in parts),
        "vocab_size": sum(p["v"] for p in parts),
        "hapax": sum(p["h"] for p in parts),
        "tokens": sum(p["tok"] for p in parts),
    }
    topk = ranked.map_batches(
        lambda t: t.filter(_pc.less_equal(t["rank"], k)),
        batch_format="pyarrow",
    )
    return topk, stats
