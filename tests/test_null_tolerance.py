"""NULL-text tolerance sweep: every text operator must treat a NULL
text value as '' (documented convention) — never abort the whole
map_batches task with ArrowInvalid/TypeError, and never mispredict
through a NaN→int cast (the LangIdStage bug this sweep pinned).

A real web crawl ALWAYS contains null text rows (failed extraction,
empty responses); one poisoned row must not kill a 100-TB stage.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

import rayraster.dedup as D
import rayraster.textops as T


@pytest.fixture()
def nbatch():
    return pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "text": [
                "hello world foo bar hello world",
                None,
                "",
                "plain text row",
            ],
            "url": ["https://a.example/x", None, "nonsense", "http://b.example/"],
        }
    )


BATCH_OPS = [
    ("token_metrics", lambda b: T.token_metrics(b)),
    ("quality_score", lambda b: T.quality_score(b)),
    ("bpe_token_count", lambda b: T.bpe_token_count(b)),
    ("redact_pii", lambda b: T.redact_pii(b)),
    ("fingerprint_md5", lambda b: T.fingerprint_md5(b)),
    ("rolling_fingerprint", lambda b: T.rolling_fingerprint(b)),
    ("word_count_partial", lambda b: T.word_count_partial(b)),
    ("url_host", lambda b: T.url_host(b)),
    ("repetition_metrics", lambda b: T.repetition_metrics(b)),
    ("lang_id", lambda b: T.LangIdStage()(b)),
    ("add_content_hash", lambda b: D.add_content_hash(b)),
]


@pytest.mark.parametrize("name,fn", BATCH_OPS, ids=[n for n, _ in BATCH_OPS])
def test_batch_op_survives_null_text(nbatch, name, fn):
    out = fn(nbatch)
    assert isinstance(out, pa.Table)
    if name != "word_count_partial":  # flat output, row count differs
        assert out.num_rows == nbatch.num_rows


def test_null_text_equals_empty_text(nbatch):
    """The convention itself: the NULL row's metrics equal the ''
    row's metrics for every appended numeric column."""
    for name, fn in BATCH_OPS:
        if name in ("fingerprint_md5", "word_count_partial", "url_host",
                    "add_content_hash", "redact_pii"):
            # md5/regexp_replace are NULL→NULL (DuckDB-twin semantics);
            # word_count_partial is not rowwise; url uses its own col
            continue
        out = fn(nbatch)
        for col in out.column_names:
            if col in nbatch.column_names:
                continue
            vals = out[col].to_pylist()
            assert vals[1] == vals[2], f"{name}.{col}: NULL != '' row"


def test_fingerprint_md5_null_matches_duckdb():
    import duckdb

    out = T.fingerprint_md5(pa.table({"text": ["x", None]}))
    want = [r[0] for r in duckdb.sql(
        "SELECT md5(t) FROM (VALUES ('x'), (NULL)) v(t)").fetchall()]
    assert out["fingerprint"].to_pylist() == want


def test_langid_null_is_und(nbatch):
    out = T.LangIdStage()(nbatch)
    assert out["lang_pred"].to_pylist()[1] == "und"
    assert out["lang_conf"].to_pylist()[1] == 0.0


def test_chunk_windows_null_yields_one_empty_chunk(nbatch):
    out = T.chunk_text_windows(nbatch, window=8, stride=4)
    rows = out.filter(
        pa.array(np.asarray(out["doc_id"].to_numpy(zero_copy_only=False)) == 2)
    )
    assert rows.num_rows == 1
    assert rows["chunk_len"].to_pylist() == [0]


def test_dataset_ops_survive_null_text(ray_session):
    """End-to-end: exact dedup, MinHash LSH, SimHash and
    decontamination over a corpus with NULL rows run to completion and
    treat the NULL docs as '' (the two null/empty docs become exact
    dupes of each other)."""
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox jumps over the lazy dog again and again!",
        None,
        "",
        "completely different content with nothing shared at all here",
    ]
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(5), type=pa.int64()), "text": texts})
    )
    keep = sorted(
        D.exact_dedup_keep_ids(ds, num_partitions=4).to_pandas()["doc_id"]
    )
    assert keep == [0, 1, 2, 4]  # doc 3 ('') deduped into doc 2 (NULL)

    pairs = D.minhash_lsh_pairs(
        ds, threshold=0.5, k=8, num_buckets=4, corpus_count=5
    ).to_pandas()
    assert {tuple(r) for r in pairs[["a", "b"]].values} >= {(0, 1)}

    sp = D.simhash_pairs(ds, num_buckets=4, corpus_count=5).to_pandas()
    assert isinstance(sp, object)  # ran to completion

    dec = T.decontaminate(ds, ["quick brown fox jumps"], n=2).to_pandas()
    assert bool(dec.set_index("doc_id")["contaminated"][2]) is False


def test_tfidf_and_index_survive_null_text(ray_session, tmp_path):
    """The round-3-final text operators follow the NULL ≡ '' rule:
    NULL/empty docs simply emit no terms / postings."""
    texts = ["alpha beta", None, "", "alpha gamma"]
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(4), type=pa.int64()), "text": texts})
    )
    out = T.tfidf_topk_terms(ds, corpus_count=4, k=2, num_partitions=4).to_pandas()
    assert set(out.doc_id) == {0, 3}  # null/empty docs emit nothing

    path = T.build_inverted_index(ds, str(tmp_path / "nidx"), num_buckets=4)
    hits = T.search_index(path, ["alpha"], mode="and").to_pandas()
    assert sorted(hits.doc_id) == [0, 3]


def test_paragraph_dedup_graph_ops_null_ids(ray_session, tmp_path):
    """pagerank tolerates edges referencing every node id shape the
    engine produces (no text involvement, but the null-int trap —
    to_numpy float-promotion — must not bite the rank columns)."""
    import numpy as np

    from rayraster.graph import pagerank

    src = pa.array([0, 1, None, 2], type=pa.int64())
    dst = pa.array([1, 2, 0, None], type=pa.int64())
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    # the engine-wide convention: NULL keys never match in equi-joins.
    # A null-SRC edge therefore contributes nothing (no rank row joins
    # it) and a null-DST contribution lands on a phantom node the
    # membership marker drops; the null-dst edge still counts toward
    # its src's out-degree (mass leak, like any dangling edge).
    # Deterministic and pinned exactly — never silent corruption.
    tel = 10**9 * 15 // 100
    out = (
        pagerank(edges, str(tmp_path / "pnull"), iterations=2,
                 num_buckets=4)
        .to_pandas()
    )
    out = out[out["node"].notna()].set_index("node")["pr"]
    # effective contributing edges: 0→1, 1→2; outdegs 0:1, 1:1, 2:1
    rank = {n: 10**9 for n in (0, 1, 2)}
    for _ in range(2):
        c = {n: 0 for n in (0, 1, 2)}
        for s, d in ((0, 1), (1, 2)):
            c[d] += (rank[s] * 85) // 100
        rank = {n: tel + c[n] for n in (0, 1, 2)}
    for n in (0, 1, 2):
        assert out.loc[n] == rank[n], n
