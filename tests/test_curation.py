"""Corpus-curation operators: Gopher repetition metrics, per-domain
caps, n-gram blocklist decontamination — each proven bit-exact against
its DuckDB twin on corpora written to parquet (both engines read the
same bytes), plus property tests on crafted edge cases."""

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from rayraster.agg import cap_per_group
from rayraster.textops import (
    DecontaminateStage,
    build_ngram_blocklist,
    decontaminate,
    repetition_metrics,
    url_host,
)


def _write(tmp_path, name, table):
    p = os.path.join(str(tmp_path), name)
    pq.write_table(table, p)
    return p


def _rep_corpus():
    """Docs exercising every repetition edge: repeats, all-unique,
    empty doc, whitespace-only, single line, unicode lengths."""
    texts = [
        "alpha beta\nalpha beta\ngamma",          # dup line, dup words
        "one\ntwo\nthree\nfour",                   # all unique
        "",                                         # empty (1 empty line)
        "   \n\t",                                  # whitespace only
        "solo solo solo solo",                      # one line, one word
        "héllo wörld\nhéllo wörld\nhéllo",          # unicode codepoints
        "x\nx\nx\nx\nx\ny",                         # heavy line dup
        "a b c a b c a a a",                        # top-word dominance
    ]
    return pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                     "text": pa.array(texts, type=pa.string())})


REP_TWIN = r"""
WITH l AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line
  FROM read_parquet('{p}')
), lg AS (
  SELECT doc_id, line, count(*) AS c, length(line) AS len
  FROM l GROUP BY doc_id, line
), la AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT)            AS n_lines,
         CAST(SUM(c) - COUNT(*) AS BIGINT) AS dup_lines,
         CAST(SUM((c-1)*len) AS BIGINT)    AS rep_chars,
         CAST(SUM(c*len) AS BIGINT)        AS tot_chars
  FROM lg GROUP BY doc_id
), w AS (
  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS word
  FROM read_parquet('{p}')
), wg AS (
  SELECT doc_id, word, count(*) AS c
  FROM w WHERE word <> '' GROUP BY doc_id, word
), wa AS (
  SELECT doc_id, CAST(MAX(c) AS BIGINT) AS max_c,
         CAST(SUM(c) AS BIGINT) AS tot_w
  FROM wg GROUP BY doc_id
)
SELECT la.doc_id,
       n_lines,
       CAST(dup_lines AS DOUBLE) / n_lines                AS dup_line_frac,
       CAST(rep_chars AS DOUBLE) / GREATEST(tot_chars, 1) AS dup_line_char_frac,
       COALESCE(CAST(max_c AS DOUBLE) / tot_w, 0.0)       AS top_word_frac
FROM la LEFT JOIN wa USING (doc_id)
ORDER BY doc_id
"""


def test_repetition_metrics_matches_duckdb_twin(ray_session, tmp_path):
    p = _write(tmp_path, "rep.parquet", _rep_corpus())
    got = (
        rd.read_parquet(p)
        .map_batches(repetition_metrics, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(REP_TWIN.format(p=p)).df()
    assert got.doc_id.tolist() == want.doc_id.tolist()
    for col in ("n_lines", "dup_line_frac", "dup_line_char_frac", "top_word_frac"):
        assert got[col].tolist() == want[col].tolist(), col  # bit-exact


def test_repetition_metrics_matches_twin_on_documents(ray_session):
    """Same twin on the driver-shaped documents table (organic text)."""
    p = "/root/testdata/sf0.001/documents.parquet"
    got = (
        rd.read_parquet(p, columns=["doc_id", "text"])
        .map_batches(repetition_metrics, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(REP_TWIN.format(p=p)).df()
    assert len(got) == len(want) > 0
    for col in ("n_lines", "dup_line_frac", "dup_line_char_frac", "top_word_frac"):
        assert got[col].tolist() == want[col].tolist(), col


def test_repetition_metrics_values_by_hand():
    out = repetition_metrics(_rep_corpus())
    r = {d: (nl, dl, dc, tw) for d, nl, dl, dc, tw in zip(
        out["doc_id"].to_pylist(), out["n_lines"].to_pylist(),
        out["dup_line_frac"].to_pylist(), out["dup_line_char_frac"].to_pylist(),
        out["top_word_frac"].to_pylist())}
    assert r[0] == (3, 1 / 3, 10 / 25, 2 / 5)       # "alpha beta" repeats
    assert r[1] == (4, 0.0, 0.0, 1 / 4)
    assert r[2] == (1, 0.0, 0.0, 0.0)                # empty doc
    assert r[3][3] == 0.0                            # whitespace-only: no words
    assert r[4] == (1, 0.0, 0.0, 1.0)                # all the same word
    assert r[6] == (6, 4 / 6, 4 / 6, 5 / 6)          # x×5 + y
    assert r[7][3] == 5 / 9                          # 'a' 5 of 9


def test_repetition_metrics_empty_batch():
    t = pa.table({"doc_id": pa.array([], type=pa.int64()),
                  "text": pa.array([], type=pa.string())})
    out = repetition_metrics(t)
    assert out.num_rows == 0
    assert out.schema.field("dup_line_frac").type == pa.float64()


# ---------------------------------------------------------------------------
# url_host + cap_per_group
# ---------------------------------------------------------------------------


def _domains_corpus(n=400, hosts=7):
    ids = np.arange(n, dtype=np.int64)
    urls = [f"https://host-{int(i) % hosts:02d}.test/p/{int(i)}" for i in ids]
    urls[3] = "not a url"                      # no-match row → host ''
    urls[5] = "ftp://files.test:2121/x"        # scheme+port
    return pa.table({"doc_id": ids, "url": pa.array(urls, type=pa.string())})


def test_url_host_matches_duckdb_twin(ray_session, tmp_path):
    p = _write(tmp_path, "urls.parquet", _domains_corpus())
    got = url_host(pq.read_table(p))
    want = duckdb.sql(
        f"""SELECT regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)
            AS host FROM read_parquet('{p}') ORDER BY doc_id"""
    ).df()
    assert got["host"].to_pylist() == want.host.tolist()
    assert got["host"][3].as_py() == ""               # no-match convention
    assert got["host"][5].as_py() == "files.test:2121"


def test_cap_per_group_matches_duckdb_twin(ray_session, tmp_path):
    tbl = url_host(_domains_corpus())
    p = _write(tmp_path, "hosts.parquet", tbl)
    cap = 9
    got = (
        cap_per_group(rd.read_parquet(p), ["host"], "doc_id", cap,
                      num_partitions=8)
        .to_pandas()
        .sort_values(["host", "rnk"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""SELECT * FROM (
              SELECT doc_id, host,
                     ROW_NUMBER() OVER (
                       PARTITION BY host
                       ORDER BY (doc_id*2654435761) % 1000003, doc_id) AS rnk
              FROM read_parquet('{p}'))
            WHERE rnk <= {cap} ORDER BY host, rnk"""
    ).df()
    assert got.doc_id.tolist() == want.doc_id.tolist()
    assert got.rnk.tolist() == want.rnk.tolist()
    assert (got.groupby("host").size() <= cap).all()


def test_cap_per_group_chunking_invariant(ray_session):
    """The kept set is a pure function of ids — identical under
    different block structures."""
    tbl = url_host(_domains_corpus())
    a = cap_per_group(rd.from_arrow(tbl), ["host"], "doc_id", 5,
                      num_partitions=4).to_pandas()
    b = cap_per_group(rd.from_arrow(tbl).repartition(13), ["host"], "doc_id", 5,
                      num_partitions=16).to_pandas()
    key = lambda df: sorted(map(tuple, df[["host", "doc_id", "rnk"]].values.tolist()))
    assert key(a) == key(b)


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def _decon_corpus():
    bench = [
        "the quick brown fox jumps over the lazy dog today",
        "pack my box with five dozen liquor jugs right now ok",
    ]
    texts = [
        # contains an 8-gram of bench[0]
        "intro words then the quick brown fox jumps over the lazy dog and more",
        "totally clean document with no benchmark overlap at all in any window",
        # contains an 8-gram of bench[1] twice
        "pack my box with five dozen liquor jugs again pack my box with five dozen liquor jugs",
        "short doc",
        "",
        # 7 shared words only (below n=8) → clean
        "quick brown fox jumps over the lazy cat here",
    ]
    docs = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                     "text": pa.array(texts, type=pa.string())})
    bl = pa.table({"bench_id": pa.array(range(len(bench)), type=pa.int64()),
                   "text": pa.array(bench, type=pa.string())})
    return docs, bl, bench


DECON_TWIN = r"""
WITH bw AS (
  SELECT list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws
  FROM read_parquet('{bl}')
), bg AS (
  SELECT DISTINCT array_to_string(ws[k+1:k+{n}], ' ') AS ng
  FROM bw, range(0, {kmax}) t(k) WHERE k + {n} <= len(ws)
), dw AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws
  FROM read_parquet('{docs}')
), dg AS (
  SELECT doc_id, array_to_string(ws[k+1:k+{n}], ' ') AS ng
  FROM dw, range(0, {kmax}) t(k) WHERE k + {n} <= len(ws)
), h AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS ngram_hits
  FROM dg JOIN bg USING (ng) GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(h.ngram_hits, 0)     AS ngram_hits,
       COALESCE(h.ngram_hits, 0) > 0 AS contaminated
FROM read_parquet('{docs}') d LEFT JOIN h USING (doc_id)
ORDER BY d.doc_id
"""


def test_decontaminate_matches_duckdb_twin(ray_session, tmp_path):
    docs, bl, bench = _decon_corpus()
    pd_ = _write(tmp_path, "docs.parquet", docs)
    pb = _write(tmp_path, "bl.parquet", bl)
    got = (
        decontaminate(rd.read_parquet(pd_), bench, n=8)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = duckdb.sql(
        DECON_TWIN.format(docs=pd_, bl=pb, n=8, kmax=64)
    ).df()
    assert got.doc_id.tolist() == want.doc_id.tolist()
    assert got.ngram_hits.tolist() == want.ngram_hits.tolist()
    assert got.contaminated.tolist() == want.contaminated.tolist()
    # the hand-expected pattern
    assert got.contaminated.tolist() == [True, False, True, False, False, False]
    assert got.ngram_hits[2] == want.ngram_hits[2] >= 2  # two occurrences count


def test_decontaminate_twin_on_documents_table(ray_session):
    """Twin parity on the organic documents table, blocklist drawn
    from the corpus itself (guaranteed hits)."""
    p = "/root/testdata/sf0.001/documents.parquet"
    bench = duckdb.sql(
        f"SELECT text FROM read_parquet('{p}') WHERE doc_id % 97 = 3"
    ).df().text.tolist()
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        pb = os.path.join(td, "bl.parquet")
        pq.write_table(pa.table({"text": pa.array(bench)}), pb)
        got = (
            decontaminate(rd.read_parquet(p, columns=["doc_id", "text"]), bench, n=8)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        want = duckdb.sql(DECON_TWIN.format(docs=p, bl=pb, n=8, kmax=256)).df()
    assert got.ngram_hits.tolist() == want.ngram_hits.tolist()
    assert got.contaminated.sum() >= len(bench)  # sources are flagged


def test_ngram_blocklist_dedup_and_boundaries():
    bl = build_ngram_blocklist(["a b c d", "a b c d"], n=3)
    assert sorted(bl.to_pylist()) == ["a b c", "b c d"]  # distinct, in-doc only
    # n-grams never cross document boundaries
    bl2 = build_ngram_blocklist(["a b", "c d"], n=2)
    assert sorted(bl2.to_pylist()) == ["a b", "c d"]


def test_decontaminate_stage_broadcast_ref(ray_session):
    """The actor-pool form: blocklist via ray.put, fetched once."""
    import ray as _ray

    docs, _, bench = _decon_corpus()
    ref = _ray.put(build_ngram_blocklist(bench, n=8))
    out = (
        rd.from_arrow(docs)
        .map_batches(DecontaminateStage(ref, n=8), batch_format="pyarrow")
        .to_pandas().sort_values("doc_id")
    )
    assert out.contaminated.tolist() == [True, False, True, False, False, False]


# ---------------------------------------------------------------------------
# cross-document duplicate n-grams (Lee et al. 2021)
# ---------------------------------------------------------------------------

CROSSDOC_TWIN = r"""
WITH dw AS (
  SELECT doc_id,
         list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                     x -> x <> '') AS ws
  FROM read_parquet('{docs}')
), dg AS (
  SELECT DISTINCT doc_id, array_to_string(ws[k+1:k+{n}], ' ') AS ng
  FROM dw, range(0, {kmax}) t(k) WHERE k + {n} <= len(ws)
), gc AS (SELECT ng, count(*) AS ndocs FROM dg GROUP BY ng)
SELECT doc_id,
       CAST(SUM(CASE WHEN ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS shared_ngrams,
       CAST(count(*) AS BIGINT) AS total_ngrams
FROM dg JOIN gc USING (ng) GROUP BY doc_id ORDER BY doc_id"""


def test_cross_doc_ngram_stats_matches_twin(ray_session, tmp_path):
    from rayraster.textops import cross_doc_ngram_stats

    docs = pa.table(
        {
            "doc_id": pa.array(range(6), type=pa.int64()),
            "text": [
                "a b c d e f g h i j",        # shares with doc 1
                "a b c d e f g h i j k",      # superset of doc 0
                "z y x w v u t s r q",        # all unique
                "short doc",                  # < n words → no row
                None,                         # NULL ≡ ''
                "a b c d e f g h a b c d e f g h",  # in-doc repeat, shares
            ],
        }
    )
    p = _write(tmp_path, "cross.parquet", docs)
    got = (
        cross_doc_ngram_stats(rd.read_parquet(p), n=8, corpus_count=6)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = duckdb.sql(CROSSDOC_TWIN.format(docs=p, n=8, kmax=64)).df()
    assert got.equals(want)
    by = got.set_index("doc_id")
    # a full duplicate pair would have shared == total; doc 0 ⊂ doc 1
    assert by.loc[0, "shared_ngrams"] == by.loc[0, "total_ngrams"] == 3
    assert by.loc[2, "shared_ngrams"] == 0
    assert 3 not in by.index and 4 not in by.index  # no-gram docs absent
    # in-doc repetition does NOT make a gram shared (distinct per doc)
    assert by.loc[5, "shared_ngrams"] < by.loc[5, "total_ngrams"]


def test_cross_doc_novelty_matches_brute(ray_session, tmp_path):
    """with_novelty: old_ngrams = distinct grams whose first occurrence
    (min doc_id) is an earlier doc; shared/total unchanged."""
    from rayraster.textops import cross_doc_ngram_stats

    docs = pa.table(
        {
            "doc_id": pa.array(range(6), type=pa.int64()),
            "text": [
                "a b c d e f g h i j",        # earliest: nothing old
                "a b c d e f g h i j k",      # 3 grams seen in doc 0
                "z y x w v u t s r q",        # unique → 0 old
                "short doc",
                None,
                "a b c d e f g h a b c d e f g h",  # gram 'a..h' first in 0
            ],
        }
    )
    p = _write(tmp_path, "novel.parquet", docs)
    got = (
        cross_doc_ngram_stats(
            rd.read_parquet(p), n=8, corpus_count=6, with_novelty=True
        )
        .to_pandas().sort_values("doc_id").set_index("doc_id")
    )
    # brute in SQL: per-gram min doc, count grams with min < own doc
    want = duckdb.sql(rf"""WITH dw AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws
  FROM read_parquet('{p}')
), dg AS (
  SELECT DISTINCT doc_id, array_to_string(ws[k+1:k+8], ' ') AS ng
  FROM dw, range(0, 64) t(k) WHERE k + 8 <= len(ws)
), gm AS (SELECT ng, min(doc_id) AS mn FROM dg GROUP BY ng)
SELECT doc_id,
       CAST(SUM(CASE WHEN doc_id > mn THEN 1 ELSE 0 END) AS BIGINT) AS old
FROM dg JOIN gm USING (ng) GROUP BY doc_id ORDER BY doc_id""").df().set_index("doc_id")
    assert (got["old_ngrams"] == want["old"]).all()
    assert got.loc[0, "old_ngrams"] == 0          # earliest doc
    assert got.loc[1, "old_ngrams"] == 3          # the 3 grams of doc 0
    assert got.loc[2, "old_ngrams"] == 0
    assert got.loc[5, "old_ngrams"] > 0           # 'a..h' first in doc 0
    # a gram old for this doc is by definition shared with its first doc
    assert (got["old_ngrams"] <= got["shared_ngrams"]).all()


def test_cross_doc_stats_chunking_invariant(ray_session, tmp_path):
    """Identical results at 1 block and many blocks (the partial
    per-partition sums must fold associatively)."""
    from rayraster.textops import cross_doc_ngram_stats

    docs = pa.table(
        {
            "doc_id": pa.array(range(40), type=pa.int64()),
            "text": [
                " ".join(f"w{(i * 7 + j) % 23}" for j in range(12))
                for i in range(40)
            ],
        }
    )
    p = _write(tmp_path, "inv.parquet", docs)
    one = (
        cross_doc_ngram_stats(rd.read_parquet(p), n=4, corpus_count=40)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    many = (
        cross_doc_ngram_stats(
            rd.read_parquet(p).repartition(13), n=4, num_partitions=11,
            corpus_count=None,
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert one.equals(many)


def test_exact_duplicates_fully_shared(ray_session):
    """The Lee et al. signal: an exact duplicate pair has frac 1.0."""
    from rayraster.textops import cross_doc_ngram_stats

    t = "the quick brown fox jumps over the lazy dog today"
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([10, 20], type=pa.int64()),
                "text": [t, t],
            }
        )
    )
    got = cross_doc_ngram_stats(ds, n=5, corpus_count=2).to_pandas()
    assert (got.shared_ngrams == got.total_ngrams).all()
    assert (got.total_ngrams > 0).all()


# ---------------------------------------------------------------------------
# corpus-frequency fluency score (CCNet-style LM-lite)
# ---------------------------------------------------------------------------

FREQ_TWIN = r"""
WITH dw AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                            x -> x <> '')) AS w
  FROM read_parquet('{docs}')
), wc AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM dw GROUP BY w)
SELECT doc_id, CAST(count(*) AS BIGINT) AS token_count,
       CAST(SUM(c) AS BIGINT) AS freq_sum,
       CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE)
         / CAST(GREATEST(CAST(count(*) AS BIGINT), 1) AS DOUBLE) AS mean_freq
FROM dw JOIN wc USING (w) GROUP BY doc_id ORDER BY doc_id"""


def test_corpus_freq_score_matches_twin(ray_session, tmp_path):
    from rayraster.textops import corpus_freq_score

    docs = pa.table(
        {
            "doc_id": pa.array(range(5), type=pa.int64()),
            "text": [
                "the cat sat on the mat",
                "the dog",
                "rare wordzzz here",
                None,
                "",
            ],
        }
    )
    p = _write(tmp_path, "freq.parquet", docs)
    got = (
        corpus_freq_score(rd.read_parquet(p), corpus_count=5)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = duckdb.sql(FREQ_TWIN.format(docs=p)).df()
    assert got.equals(want)
    by = got.set_index("doc_id")
    # common-token doc scores above the rare-token doc
    assert by.loc[0, "mean_freq"] > by.loc[2, "mean_freq"] == 1.0
    assert 3 not in by.index and 4 not in by.index  # token-less docs absent


def test_corpus_freq_score_partition_invariant(ray_session, tmp_path):
    """Word counts must be exact regardless of block layout and
    partition count (each word's occurrences co-locate by hash)."""
    from rayraster.textops import corpus_freq_score

    docs = pa.table(
        {
            "doc_id": pa.array(range(60), type=pa.int64()),
            "text": [
                " ".join(f"tok{(i * 5 + j) % 17}" for j in range(9))
                for i in range(60)
            ],
        }
    )
    p = _write(tmp_path, "freqinv.parquet", docs)
    one = (
        corpus_freq_score(rd.read_parquet(p), corpus_count=60)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    many = (
        corpus_freq_score(
            rd.read_parquet(p).repartition(17), num_partitions=13,
            corpus_count=None,
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert one.equals(many)
    want = duckdb.sql(FREQ_TWIN.format(docs=p)).df()
    assert one.equals(want)


# ---------------------------------------------------------------------------
# token-budget shard packing (distributed exclusive prefix sum)
# ---------------------------------------------------------------------------

PACK_TWIN = """
SELECT ord, chunk_len,
  CAST(COALESCE(SUM(chunk_len) OVER w, 0) AS BIGINT)          AS tokens_before,
  CAST(COALESCE(SUM(chunk_len) OVER w, 0) AS BIGINT) // {b}   AS bin_id,
  CAST(COALESCE(SUM(chunk_len) OVER w, 0) AS BIGINT) %  {b}   AS bin_offset
FROM read_parquet('{p}')
WINDOW w AS (ORDER BY ord ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
ORDER BY ord"""


def test_pack_by_budget_matches_window_twin(ray_session, tmp_path):
    from rayraster.agg import pack_by_budget

    rng = np.random.default_rng(11)
    n = 700
    tab = pa.table(
        {
            "ord": pa.array(np.arange(n) * 7 + 3, type=pa.int64()),
            "chunk_len": pa.array(rng.integers(1, 600, n).astype(np.int64)),
        }
    )
    p = _write(tmp_path, "pack.parquet", tab)
    got = (
        pack_by_budget(
            rd.read_parquet(p).repartition(9), 2048, "chunk_len", "ord",
            num_partitions=5,
        )
        .to_pandas().sort_values("ord").reset_index(drop=True)
    )
    want = duckdb.sql(PACK_TWIN.format(p=p, b=2048)).df()
    # no dtype coercion: the CAST ... AS BIGINT twin must come back
    # int64, exactly like the engine (the driver gate compares schema)
    assert got.equals(want)
    # packing invariants: prefix strictly consistent, bins contiguous
    assert (got.tokens_before.diff().dropna() == got.chunk_len[:-1].values).all()
    assert (got.bin_id.diff().dropna() >= 0).all()
    assert got.bin_offset.between(0, 2047).all()


def test_pack_by_budget_empty_and_single(ray_session):
    from rayraster.agg import pack_by_budget

    empty = rd.from_arrow(
        pa.table({"ord": pa.array([], type=pa.int64()),
                  "chunk_len": pa.array([], type=pa.int64())})
    )
    assert pack_by_budget(empty, 100, "chunk_len", "ord").count() == 0
    one = rd.from_arrow(
        pa.table({"ord": pa.array([9], type=pa.int64()),
                  "chunk_len": pa.array([42], type=pa.int64())})
    )
    row = pack_by_budget(one, 100, "chunk_len", "ord").to_pandas().iloc[0]
    assert (row.tokens_before, row.bin_id, row.bin_offset) == (0, 0, 0)


def test_pack_by_budget_composite_order(ray_session):
    """Composite (doc_id, chunk_idx) order with huge/negative hash
    ids — no synthetic packed key, no overflow."""
    from rayraster.agg import pack_by_budget

    tab = pa.table(
        {
            "doc_id": pa.array(
                [-(2**62), -(2**62), 5, 2**62, 2**62], type=pa.int64()
            ),
            "chunk_idx": pa.array([0, 1, 0, 0, 1], type=pa.int64()),
            "chunk_len": pa.array([100, 50, 70, 30, 10], type=pa.int64()),
        }
    )
    got = (
        pack_by_budget(
            rd.from_arrow(tab).repartition(3), 128, "chunk_len",
            ["doc_id", "chunk_idx"], num_partitions=3,
        )
        .to_pandas().sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    )
    assert got.tokens_before.tolist() == [0, 100, 150, 220, 250]
    assert got.bin_id.tolist() == [0, 0, 1, 1, 1]
    assert got.bin_offset.tolist() == [0, 100, 22, 92, 122]


def test_corpus_freq_modes_identical(ray_session, tmp_path):
    """broadcast and partitioned paths produce IDENTICAL rows; auto
    picks broadcast under the threshold and partitioned above it."""
    from rayraster.textops import corpus_freq_score

    docs = pa.table(
        {
            "doc_id": pa.array(range(30), type=pa.int64()),
            "text": [
                " ".join(f"v{(i * 3 + j) % 11}" for j in range(7))
                for i in range(30)
            ],
        }
    )
    p = _write(tmp_path, "modes.parquet", docs)
    outs = {}
    for mode in ("broadcast", "partitioned"):
        outs[mode] = (
            corpus_freq_score(rd.read_parquet(p), corpus_count=30, mode=mode)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
    assert outs["broadcast"].equals(outs["partitioned"])
    # auto with a tiny threshold must fall back to partitioned and
    # still match
    forced = (
        corpus_freq_score(
            rd.read_parquet(p), corpus_count=30, mode="auto",
            broadcast_threshold=2,
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert forced.equals(outs["broadcast"])


# ---------------------------------------------------------------------------
# deterministic corpus mixture (source weighting with upsampling epochs)
# ---------------------------------------------------------------------------


def test_mixture_sample_matches_twin_and_invariants(ray_session, tmp_path):
    from rayraster.agg import mixture_sample

    tab = pa.table(
        {
            "doc_id": pa.array(range(1000), type=pa.int64()),
            "v": pa.array(range(1000), type=pa.int64()),
        }
    )
    p = _write(tmp_path, "mix.parquet", tab)
    a = rd.read_parquet(p).repartition(4)
    b = rd.read_parquet(p)
    mix = (
        mixture_sample({"a": a, "b": b}, {"a": 2.4, "b": 0.3})
        .to_pandas().sort_values(["source", "epoch", "doc_id"])
        .reset_index(drop=True)
    )
    den = 1_000_003
    thr_a, thr_b = int(round(0.4 * den)), int(round(0.3 * den))
    want = duckdb.sql(f"""
SELECT doc_id, v, 'a' AS source, k AS epoch
FROM read_parquet('{p}'), range(0, 3) r(k)
WHERE k < 2 OR (doc_id*2654435761) % {den} < {thr_a}
UNION ALL
SELECT doc_id, v, 'b' AS source, 0 AS epoch FROM read_parquet('{p}')
WHERE (doc_id*2654435761) % {den} < {thr_b}
ORDER BY source, epoch, doc_id""").df()
    want["epoch"] = want["epoch"].astype("int64")
    assert mix.equals(want)
    # invariants: full epochs are complete copies; fractional epoch
    # rate ≈ frac; weight 0 contributes nothing
    sizes = mix.groupby(["source", "epoch"]).size()
    assert sizes[("a", 0)] == sizes[("a", 1)] == 1000
    assert 300 < sizes[("a", 2)] < 500
    zero = mixture_sample({"a": rd.read_parquet(p)}, {"a": 0.0})
    assert zero.count() == 0


def test_mixture_sample_validates_inputs(ray_session):
    import pytest as _pytest

    from rayraster.agg import mixture_sample

    ds = rd.from_arrow(pa.table({"doc_id": pa.array([1], type=pa.int64())}))
    with _pytest.raises(ValueError):
        mixture_sample({"a": ds}, {"b": 1.0})
    with _pytest.raises(ValueError):
        mixture_sample({"a": ds}, {"a": -0.5})


def test_normalize_text_matches_twin_and_edges(ray_session, tmp_path):
    from rayraster.textops import normalize_text, normalize_sql_expr

    docs = pa.table(
        {
            "doc_id": pa.array(range(7), type=pa.int64()),
            "text": [
                "Héllo   Wörld",
                "  tabs\tand\nnewlines  ",
                "Mixed\r\nCRLF  spaces",
                None,
                "",
                "Straße ÅNGSTRÖM",
                "nbsp stays",  # \s is ASCII-only on both engines
            ],
        }
    )
    p = _write(tmp_path, "norm.parquet", docs)
    got = normalize_text(pq.read_table(p))["text_norm"].to_pylist()
    want = [
        r[0]
        for r in duckdb.sql(
            f"SELECT {normalize_sql_expr('text')} FROM read_parquet('{p}') "
            "ORDER BY doc_id"
        ).fetchall()
    ]
    assert got == want
    assert got[0] == "héllo wörld"
    assert got[1] == "tabs and newlines"
    assert got[3] is None and got[4] == ""
    assert got[6] == "nbsp stays"


# ---------------------------------------------------------------------------
# duplicated-span removal (Lee et al. 2021 ExactSubstr, word-granular)
# ---------------------------------------------------------------------------


def _spanrm_brute(texts, n=3, min_docs=2):
    """Local reference: remove every word covered by an n-gram shared
    by >= min_docs distinct docs; rebuild with single spaces."""
    words = [t.split() if t else [] for t in texts]
    from collections import defaultdict

    docs_of = defaultdict(set)
    for d, ws in enumerate(words):
        for i in range(len(ws) - n + 1):
            docs_of[" ".join(ws[i : i + n])].add(d)
    out = []
    for d, ws in enumerate(words):
        cov = [False] * len(ws)
        for i in range(len(ws) - n + 1):
            if len(docs_of[" ".join(ws[i : i + n])]) >= min_docs:
                for j in range(i, i + n):
                    cov[j] = True
        out.append(" ".join(w for w, c in zip(ws, cov) if not c))
    return out


def test_remove_duplicate_ngram_spans_matches_brute(ray_session):
    from rayraster.textops import remove_duplicate_ngram_spans

    rng = np.random.default_rng(23)
    vocab = [f"w{k}" for k in range(30)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 40)))
        for _ in range(120)
    ]
    # inject a literal shared run into several docs (mid-span overlap)
    shared = "alpha beta gamma delta epsilon"
    texts[3] = texts[3] + " " + shared
    texts[7] = shared + " " + texts[7]
    texts[11] = shared  # whole doc removed
    docs = pa.table({"doc_id": np.arange(len(texts), dtype=np.int64),
                     "text": texts})
    want = _spanrm_brute(texts, n=3)
    out = (
        remove_duplicate_ngram_spans(rd.from_arrow(docs), n=3, num_partitions=8)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert list(out["text"]) == want
    assert (out["n_words"] == [len(t.split()) for t in texts]).all()
    assert (
        out["n_removed"]
        == [len(t.split()) - len(w.split()) for t, w in zip(texts, want)]
    ).all()


def test_remove_duplicate_ngram_spans_edges(ray_session):
    from rayraster.textops import remove_duplicate_ngram_spans

    docs = pa.table({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "a b c d e f g",          # shares 'b c d' with doc 2
            "x b c d y",
            "p q p q p q",            # within-ONE-doc repeat: untouched
            None,                      # NULL text -> ''
            "s t",                     # shorter than n: untouched
        ],
    })
    out = (
        remove_duplicate_ngram_spans(rd.from_arrow(docs), n=3, num_partitions=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert list(out["text"]) == ["a e f g", "x y", "p q p q p q", "", "s t"]
    assert list(out["n_removed"]) == [3, 3, 0, 0, 0]


def test_remove_duplicate_ngram_spans_partition_invariant(ray_session):
    from rayraster.textops import remove_duplicate_ngram_spans

    rng = np.random.default_rng(5)
    vocab = [f"t{k}" for k in range(12)]
    texts = [" ".join(rng.choice(vocab, size=20)) for _ in range(60)]
    docs = pa.table({"doc_id": np.arange(60, dtype=np.int64), "text": texts})

    def run(parts, blocks):
        ds = rd.from_arrow(docs)
        if blocks > 1:
            ds = ds.repartition(blocks)
        return (
            remove_duplicate_ngram_spans(ds, n=4, num_partitions=parts)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )

    a, b = run(4, 1), run(13, 7)
    assert list(a["text"]) == list(b["text"])
    assert list(a["n_removed"]) == list(b["n_removed"])


def test_remove_duplicate_ngram_spans_keep_cols(ray_session):
    from rayraster.textops import remove_duplicate_ngram_spans

    docs = pa.table({
        "doc_id": [1, 2],
        "text": ["a b c d", "z a b c q"],
        "url": ["u1", "u2"],
        "quality": [0.5, 0.9],
    })
    out = (
        remove_duplicate_ngram_spans(
            rd.from_arrow(docs), n=3, num_partitions=4,
            keep_cols=("url", "quality"),
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert list(out["url"]) == ["u1", "u2"]
    assert list(out["quality"]) == [0.5, 0.9]
    assert list(out["text"]) == ["d", "z q"]


# ---------------------------------------------------------------------------
# character-entropy quality signal
# ---------------------------------------------------------------------------


def test_char_entropy_matches_duckdb_twin_bit_exact():
    import math

    import pandas as pd

    from rayraster.textops import char_entropy

    texts = [
        "hello world", "", "aaaaaaa", "abcabcabc \xe9\xe8 mixed \U0001F600",
        None, "x", "日本語テキスト 日本", "abab", "a b\nc\td  e",
    ]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
         "text": pa.array(texts, type=pa.string())}
    )
    got = char_entropy(t).to_pandas()
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    want = duckdb.sql(
        """WITH bi AS (
  SELECT doc_id, COALESCE(text,'') AS s,
         unnest(range(1, length(COALESCE(text,'')) + 1)) AS i FROM df
), bc AS (
  SELECT doc_id, unicode(substr(s, CAST(i AS BIGINT), 1)) AS cp,
         CAST(COUNT(*) AS BIGINT) AS c FROM bi GROUP BY 1, 2
), bq AS (
  SELECT doc_id, CAST(SUM(CAST(floor(1048576.0 * (CAST(c AS DOUBLE)
       * ln(CAST(c AS DOUBLE)))) AS BIGINT)) AS BIGINT) AS ent_sum_q
  FROM bc GROUP BY 1
)
SELECT d.doc_id, length(COALESCE(d.text,'')) AS n_cp,
  CASE WHEN length(COALESCE(d.text,'')) > 0
       THEN CAST(floor(1048576.0 * ln(CAST(length(COALESCE(d.text,''))
            AS DOUBLE))) AS BIGINT) ELSE 0 END AS ln_n_q,
  COALESCE(bq.ent_sum_q, 0) AS ent_sum_q,
  CASE WHEN length(COALESCE(d.text,'')) > 0 THEN
    (CAST(CASE WHEN length(COALESCE(d.text,'')) > 0
          THEN CAST(floor(1048576.0 * ln(CAST(length(COALESCE(d.text,''))
               AS DOUBLE))) AS BIGINT) ELSE 0 END AS DOUBLE)
     - CAST(COALESCE(bq.ent_sum_q, 0) AS DOUBLE)
       / CAST(length(COALESCE(d.text,'')) AS DOUBLE))
    / (1048576.0 * ln(2.0))
  ELSE 0.0 END AS entropy
FROM df d LEFT JOIN bq ON d.doc_id = bq.doc_id ORDER BY d.doc_id"""
    ).df()
    for c in ("n_cp", "ln_n_q", "ent_sum_q", "entropy"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # hand values: "abab" → exactly 1 bit (up to the q-quantization);
    # constant text → ~0; k equiprobable symbols → ~log2 k
    assert abs(got.entropy[7] - 1.0) < 1e-5
    assert abs(got.entropy[2]) < 1e-5
    assert abs(got.entropy[0] - 2.8453505) < 1e-4  # "hello world" classic


def test_char_entropy_utf8_decoder_matches_python():
    from rayraster.textops import _utf8_codepoints

    s = "a\xe9€\U0001F600 日本 b\x00c"
    b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
    cp, starts = _utf8_codepoints(b)
    assert cp.tolist() == [ord(c) for c in s]
