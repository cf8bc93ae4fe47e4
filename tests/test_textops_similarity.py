"""Text analysis + similarity search + windows + broadcast join."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from rayraster.similarity import brute_topk, ivf_topk, seeded_centroids
from rayraster.textops import LangIdStage, fingerprint_md5, quality_score, token_metrics
from rayraster.windows import tumbling_aggregate
from rayraster.join import broadcast_join, semi_join_filter
from rayraster.agg import hash_aggregate


def test_token_metrics_vectorized():
    t = pa.table({"text": ["Hello, world! 42", "", "a b  c"]})
    out = token_metrics(t)
    assert out["token_count"].to_pylist() == [3, 0, 3]
    assert out["digit_count"].to_pylist() == [2, 0, 0]
    assert out["punct_count"].to_pylist() == [2, 0, 0]
    assert out["upper_count"].to_pylist() == [1, 0, 0]


def test_quality_score_bounds():
    t = pa.table(
        {"text": ["good " * 120, "1234567890" * 10, "!!!???" * 30, ""]}
    )
    q = quality_score(t)["quality"].to_pylist()
    assert all(0.0 <= v <= 1.0 for v in q)
    assert q[0] > q[1] and q[0] > q[2]


def test_lang_id_heuristic():
    t = pa.table(
        {
            "text": [
                "the cat and the dog sat in the yard for a while and it was good",
                "der hund und die katze ist nicht in den garten mit ein ball zu",
                "el perro y la casa de los gatos es una cosa que por las noches",
                "这是一个中文文本的示例 内容足够长以便检测 这是一个中文文本",
                "",
            ]
        }
    )
    out = LangIdStage()(t)
    assert out["lang_pred"].to_pylist() == ["en", "de", "es", "zh", "und"]


def test_fingerprint_matches_hashlib():
    import hashlib

    t = pa.table({"text": ["abc", "déjà vu"]})
    fp = fingerprint_md5(t)["fingerprint"].to_pylist()
    assert fp[0] == hashlib.md5(b"abc").hexdigest()
    assert fp[1] == hashlib.md5("déjà vu".encode()).hexdigest()


def test_redact_pii_patterns():
    """Emails, IPv4s and phone-shaped runs become typed placeholders;
    clean text and short digit runs are untouched."""
    from rayraster.textops import redact_pii

    t = pa.table({"text": [
        "mail bob.smith+x@foo-bar.co.uk thanks",
        "from 192.168.0.1 call +1 (555) 123-4567 today",
        "clean text 123 v2.0",
        "two emails a@b.io and c.d@e-f.org here",
    ]})
    got = redact_pii(t)["text_redacted"].to_pylist()
    assert got == [
        "mail [EMAIL] thanks",
        "from [IP] call [PHONE] today",
        "clean text 123 v2.0",
        "two emails [EMAIL] and [EMAIL] here",
    ]


def test_chunk_text_windows_exact_slices():
    import hashlib

    from rayraster.textops import chunk_text_windows

    # empty + NULL + non-ASCII + exact-window-fit lengths
    texts = ["x" * 1000, "short", "", None, "é" * 400, "y" * 300]
    t = pa.table({"doc_id": pa.array(list(range(len(texts))), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    out = chunk_text_windows(t, window=300, stride=250)
    rows = sorted(zip(out["doc_id"].to_pylist(), out["chunk_idx"].to_pylist(),
                      out["chunk_len"].to_pylist(), out["chunk_md5"].to_pylist()))
    want = []
    for i, s in enumerate(texts):
        s = s or ""
        eff = max(len(s), 1)
        # standard packing: last window reaches the end, no duplicate tail
        n = 1 if eff <= 300 else (eff - 300 + 249) // 250 + 1
        for k in range(n):
            piece = s[k * 250 : k * 250 + 300]
            want.append((i, k, len(piece), hashlib.md5(piece.encode()).hexdigest()))
    assert rows == sorted(want)
    # n_chunks constant per doc and equal to the emitted row count
    df = out.to_pandas()
    for i, grp in df.groupby("doc_id"):
        assert (grp.n_chunks == len(grp)).all()


def test_chunk_text_windows_overlap():
    from rayraster.textops import chunk_text_windows

    t = pa.table({"doc_id": pa.array([7], type=pa.int64()), "text": ["abcdefghij"]})
    out = chunk_text_windows(t, window=6, stride=4).to_pandas().sort_values("chunk_idx")
    # chunks: [0:6]='abcdef', [4:10]='efghij'; NO [8:14]='ij' — that
    # tail is already fully inside the previous window
    assert out.chunk_len.tolist() == [6, 6]
    assert out.n_chunks.tolist() == [2, 2]


def test_vocab_topk_wordcount(ray_session):
    from rayraster.textops import vocab_topk

    docs = pd.DataFrame({"doc_id": range(4), "text": [
        "the cat sat", "the cat", "the\t dog\nran", "  the "]})
    out = vocab_topk(rd.from_pandas(docs), k=3).to_pandas()
    assert out.word.tolist() == ["the", "cat", "dog"]  # count desc, word asc
    assert out.n.tolist() == [4, 2, 1]


def test_tfidf_topk_terms_matches_brute(ray_session):
    from rayraster.textops import tfidf_topk_terms

    texts = [
        "apple banana apple cherry",
        "banana cherry cherry date",
        "apple apple apple egg",
        "fig grape fig  banana",
        "",            # no tokens → no rows
        None,          # NULL ≡ '' → no rows
        "solo",
        "apple banana cherry date egg fig grape",
    ]
    n = len(texts)
    docs = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})
    out = (
        tfidf_topk_terms(rd.from_pandas(docs), corpus_count=n, k=3, num_partitions=8)
        .to_pandas()
        .sort_values(["doc_id", "rnk"])
        .reset_index(drop=True)
    )

    # brute local reference of the SAME division-only score
    import collections

    tf: dict[tuple[int, str], int] = collections.Counter()
    df: dict[str, set] = collections.defaultdict(set)
    for i, t in enumerate(texts):
        for w in (t or "").split():
            tf[(i, w)] += 1
            df[w].add(i)
    want = []
    for i in range(n):
        terms = [(w, c) for (d, w), c in tf.items() if d == i]
        scored = sorted(
            ((-(c * n) / len(df[w]), w, c) for w, c in terms)
        )[:3]
        for r, (neg, w, c) in enumerate(scored, 1):
            want.append((i, w, c, len(df[w]), -neg, r))
    want_df = pd.DataFrame(
        want, columns=["doc_id", "word", "tf", "df", "score", "rnk"]
    )
    pd.testing.assert_frame_equal(
        out[["doc_id", "word", "tf", "df", "score", "rnk"]],
        want_df,
        check_dtype=False,
    )
    # empty/NULL docs emit nothing; every other doc has min(3, |vocab|) rows
    assert set(out.doc_id) == {0, 1, 2, 3, 6, 7}
    assert (out[out.doc_id == 6].word == "solo").all()


def test_tfidf_topk_partition_invariant(ray_session):
    from rayraster.textops import tfidf_topk_terms

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(5, 30)))
        for _ in range(60)
    ]
    docs = pd.DataFrame(
        {"doc_id": np.arange(60, dtype=np.int64), "text": texts}
    )

    def run(parts, blocks):
        ds = rd.from_pandas(docs).repartition(blocks)
        return (
            tfidf_topk_terms(ds, corpus_count=60, k=2, num_partitions=parts)
            .to_pandas()
            .sort_values(["doc_id", "rnk"])
            .reset_index(drop=True)
        )

    a, b = run(8, 2), run(16, 7)
    pd.testing.assert_frame_equal(a, b)


def test_inverted_index_search_matches_brute(ray_session, tmp_path):
    from rayraster.textops import build_inverted_index, search_index

    texts = [
        "alpha beta gamma",
        "alpha beta",
        "beta gamma delta",
        "alpha alpha alpha",   # duplicate words collapse to one posting
        "",
        None,
        "gamma",
    ]
    docs = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    path = build_inverted_index(
        rd.from_pandas(docs).repartition(3), str(tmp_path / "idx"), num_buckets=8
    )

    def brute(terms, mode):
        out = []
        for i, t in enumerate(texts):
            ws = set((t or "").split())
            hit = len(ws & set(terms))
            if (mode == "and" and hit == len(set(terms))) or (
                mode == "or" and hit > 0
            ):
                out.append((i, hit))
        return out

    for terms, mode in [
        (["alpha", "beta"], "and"),
        (["alpha", "beta"], "or"),
        (["gamma"], "and"),
        (["alpha", "nosuchword"], "and"),
        (["alpha", "nosuchword"], "or"),
        (["alpha", "alpha"], "and"),  # duplicate query terms dedupe
    ]:
        df = search_index(path, terms, mode=mode).to_pandas()
        got = (
            sorted(map(tuple, df[["doc_id", "n_matched"]].to_numpy().tolist()))
            if len(df) else []
        )
        assert got == brute(terms, mode), (terms, mode, got)

    import pytest

    with pytest.raises(ValueError, match="at least one term"):
        search_index(path, [], mode="and")
    with pytest.raises(ValueError, match="mode"):
        search_index(path, ["alpha"], mode="xor")


def _emb_ds(n=300, dim=32, seed=3):
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, dim)).astype(np.float32)
    return (
        rd.from_pandas(pd.DataFrame({"vec_id": range(n), "embedding": list(mat)})),
        mat,
    )


def test_brute_topk_exact(ray_session):
    ds, mat = _emb_ds()
    qids = np.array([0, 1])
    out = brute_topk(ds, qids, mat[:2], k=5, vec_col="embedding").to_pandas()
    # oracle: numpy full cosine
    M = mat.astype(np.float64)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    for q in (0, 1):
        sims = M[q] @ M.T
        want = np.lexsort((np.arange(len(sims)), -sims))[:5]
        got = out[out.qid == q].sort_values("rank").vec_id.to_numpy()
        np.testing.assert_array_equal(got, want)
    # self is rank 1 with cos ~1
    assert (out[out["rank"] == 1].vec_id.to_numpy() == qids).all()


def test_brute_topk_empty_corpus(ray_session):
    """Advisor item: a 0-row corpus must return a typed EMPTY result,
    not crash in the final merge."""
    ds, mat = _emb_ds(10)
    empty = ds.filter(lambda r: False)
    out = brute_topk(empty, np.array([0, 1]), mat[:2], k=5, vec_col="embedding")
    assert out.num_rows == 0
    assert out.column_names == ["qid", "vec_id", "rank", "cos"]


def test_ivf_topk_recall(ray_session):
    ds, mat = _emb_ds(500, 32)
    qids = np.arange(5)
    brute = brute_topk(ds, qids, mat[:5], k=10, vec_col="embedding").to_pandas()
    ivf = ivf_topk(
        ds, qids, mat[:5], k=10, n_centroids=8, nprobe=4, dim=32
    ).to_pandas()
    recalls = []
    for q in qids:
        b = set(brute[brute.qid == q].vec_id)
        i = set(ivf[ivf.qid == q].vec_id)
        recalls.append(len(b & i) / len(b))
    assert np.mean(recalls) >= 0.6  # nprobe=4 of 8 buckets


def test_kmeans_centroids_train_and_improve(ray_session):
    """One-pass sampled k-means: deterministic, unit-norm, and a
    better spherical objective (mean max-cosine) than both its own
    init and random centroids on clustered data."""
    from rayraster.similarity import ivf_objective, kmeans_centroids

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((6, 32)) * 3
    mat = np.concatenate(
        [c + rng.standard_normal((80, 32)) * 0.3 for c in centers]
    ).astype(np.float32)
    ds = rd.from_pandas(pd.DataFrame({"vec_id": range(len(mat)), "embedding": list(mat)}))
    C1 = kmeans_centroids(ds, 6, iters=0)
    C2 = kmeans_centroids(ds, 6, iters=8)
    C2b = kmeans_centroids(ds, 6, iters=8)
    np.testing.assert_array_equal(C2, C2b)  # deterministic
    np.testing.assert_allclose(np.linalg.norm(C2, axis=1), 1.0, rtol=1e-12)
    assert ivf_objective(mat, C2) > ivf_objective(mat, C1)
    assert ivf_objective(mat, C2) > ivf_objective(mat, seeded_centroids(32, 6))


def test_ivf_persisted_index_matches_inflight(ray_session, tmp_path):
    """Bucket-partitioned index on disk: querying it (partition-pruned
    read of only probed buckets) must return bit-identical top-k to
    the in-flight ivf_topk with the same centroids — and the read must
    actually prune (touch fewer rows than the corpus)."""
    from rayraster.similarity import (
        ivf_build_index,
        ivf_query_index,
        kmeans_centroids,
    )

    ds, mat = _emb_ds(400, 32)
    C = kmeans_centroids(ds, 8, iters=4)
    idx = str(tmp_path / "ivf")
    ivf_build_index(ds, idx, C)
    qids = np.arange(3)
    inflight = ivf_topk(ds, qids, mat[:3], k=7, nprobe=3, dim=32, centroids=C).to_pandas()
    persisted = ivf_query_index(idx, qids, mat[:3], C, k=7, nprobe=3).to_pandas()
    pd.testing.assert_frame_equal(
        inflight.sort_values(["qid", "rank"]).reset_index(drop=True),
        persisted.sort_values(["qid", "rank"]).reset_index(drop=True),
    )
    # pruning: each bucket dir holds only its slice of the corpus
    import ray.data as rd

    probed = rd.read_parquet(str(tmp_path / "ivf" / "bucket=0")).count()
    assert 0 < probed < 400


def test_ivf_trained_centroids_recall(ray_session):
    """Trained centroids must not regress recall vs the brute answer
    (the kmeans-centroid scale path of ivf_topk)."""
    from rayraster.similarity import kmeans_centroids

    ds, mat = _emb_ds(500, 32)
    C = kmeans_centroids(ds, 8, iters=5)
    qids = np.arange(5)
    brute = brute_topk(ds, qids, mat[:5], k=10, vec_col="embedding").to_pandas()
    ivf = ivf_topk(ds, qids, mat[:5], k=10, nprobe=4, dim=32, centroids=C).to_pandas()
    recalls = []
    for q in qids:
        b = set(brute[brute.qid == q].vec_id)
        i = set(ivf[ivf.qid == q].vec_id)
        recalls.append(len(b & i) / len(b))
    assert np.mean(recalls) >= 0.6


def test_tumbling_window(ray_session):
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(np.arange(0, 7200, 10), unit="s")
    df = pd.DataFrame(
        {
            "ts": ts,
            "event_type": ["a" if i % 2 else "b" for i in range(len(ts))],
            "value": np.arange(len(ts), dtype=np.float64),
        }
    )
    out = tumbling_aggregate(rd.from_pandas(df)).to_pandas()
    assert out["n"].sum() == len(df)
    assert len(out) == 4  # 2 types × 2 hours
    first = out[(out.event_type == "b") & (out.window == out.window.min())].iloc[0]
    assert first["min_value"] == 0.0 and first["n"] == 180


def test_broadcast_join_and_semi(ray_session):
    big = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3, 2, 5], "v": range(5)}))
    small = pa.table({"k": [1, 2], "name": ["one", "two"]})
    j = broadcast_join(big, small, "k").to_pandas().sort_values("v")
    assert j.name.tolist() == ["one", "two", "two"]
    s = semi_join_filter(big, [2, 5], "k").to_pandas()
    assert sorted(s.k) == [2, 2, 5]
    a = semi_join_filter(big, [2, 5], "k", invert=True).to_pandas()
    assert sorted(a.k) == [1, 3]


def test_hash_aggregate_generic(ray_session):
    df = pd.DataFrame(
        {"g": ["x", "y"] * 50, "h": [1, 1, 2, 2] * 25, "v": np.arange(100)}
    )
    out = hash_aggregate(
        rd.from_pandas(df), ["g", "h"], sum_cols=["v"], min_cols=["v"], max_cols=["v"]
    ).to_pandas()
    want = (
        df.groupby(["g", "h"])
        .agg(sum_v=("v", "sum"), min_v=("v", "min"), max_v=("v", "max"), n=("v", "count"))
        .reset_index()
    )
    got = out.sort_values(["g", "h"]).reset_index(drop=True)
    want = want.sort_values(["g", "h"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["g", "h", "sum_v", "min_v", "max_v", "n"]], want, check_dtype=False
    )


def test_bpe_token_count():
    from rayraster.textops import bpe_token_count

    t = pa.table({"text": ["I'll don't co-op 42x", "", "hello   world"]})
    out = bpe_token_count(t)["bpe_token_count"].to_pylist()
    # "I"+"'ll"+" don"+"'t"+" co"+"-"+"op"+" 42"+"x" = 9
    assert out == [9, 0, 3]


# ---------------------------------------------------------------------------
# all-pairs top-k self-similarity join
# ---------------------------------------------------------------------------


def test_self_topk_matches_cross_join_twin(ray_session):
    import duckdb

    from rayraster.similarity import self_topk

    p = "/root/testdata/sf0.001/embeddings.parquet"
    ds = rd.read_parquet(p, columns=["vec_id", "embedding"])
    got = (
        self_topk(ds, k=5)
        .to_pandas().sort_values(["qid", "rank"]).reset_index(drop=True)
        [["qid", "vec_id", "rank"]]
    )
    want = duckdb.sql(f"""
SELECT qid, vec_id, "rank" FROM (
  SELECT a.vec_id AS qid, b.vec_id AS vec_id,
         row_number() OVER (PARTITION BY a.vec_id
           ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC,
                    b.vec_id) AS "rank"
  FROM read_parquet('{p}') a CROSS JOIN read_parquet('{p}') b
  WHERE a.vec_id <> b.vec_id
) WHERE "rank" <= 5 ORDER BY qid, "rank" """).df()
    pd.testing.assert_frame_equal(got, want)


def test_self_topk_duplicate_vector_and_self_handling(ray_session):
    from rayraster.similarity import self_topk

    v = [1.0, 0.0, 0.0]
    w = [0.0, 1.0, 0.0]
    tab = pa.table(
        {
            "vec_id": pa.array([1, 2, 3], type=pa.int64()),
            "embedding": [v, v, w],  # 1 and 2 are exact duplicates
        }
    )
    out = self_topk(rd.from_arrow(tab), k=2).to_pandas()
    by = out.set_index(["qid", "rank"])
    # each duplicate ranks the OTHER duplicate first (cos 1.0), never
    # itself — exclusion is by id, not by cosine
    assert by.loc[(1, 1), "vec_id"] == 2 and by.loc[(1, 1), "cos"] == 1.0
    assert by.loc[(2, 1), "vec_id"] == 1 and by.loc[(2, 1), "cos"] == 1.0
    assert (out.vec_id != out.qid).all()
    # without exclusion, self (or the tied lower id) ranks first
    raw = self_topk(rd.from_arrow(tab), k=1, exclude_self=False).to_pandas()
    assert raw.set_index("qid")["vec_id"].to_dict() == {1: 1, 2: 1, 3: 3}


def test_self_topk_tie_exact_under_duplicate_blocks(ray_session):
    """8 exact duplicates + 8 distinct vectors in one batch: the
    per-batch top-k cut must not drop tied lower-id candidates — the
    result must equal the (cos desc, id asc) ROW_NUMBER twin even when
    every candidate of a query is cosine-tied."""
    import duckdb

    from rayraster.similarity import self_topk

    dup = [1.0, 0.0]
    vecs = [dup] * 8 + [
        [float(np.cos(i * 0.3)), float(np.sin(i * 0.3))] for i in range(1, 9)
    ]
    tab = pa.table(
        {
            "vec_id": pa.array(range(1, 17), type=pa.int64()),
            "embedding": vecs,
        }
    )
    got = (
        self_topk(rd.from_arrow(tab), k=4)
        .to_pandas().sort_values(["qid", "rank"]).reset_index(drop=True)
        [["qid", "vec_id", "rank"]]
    )
    con = duckdb.connect()
    con.register("e", tab)
    want = con.sql("""
SELECT qid, vec_id, "rank" FROM (
  SELECT a.vec_id AS qid, b.vec_id AS vec_id,
         row_number() OVER (PARTITION BY a.vec_id
           ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC,
                    b.vec_id) AS "rank"
  FROM e a CROSS JOIN e b WHERE a.vec_id <> b.vec_id
) WHERE "rank" <= 4 ORDER BY qid, "rank" """).df()
    pd.testing.assert_frame_equal(got, want)
    # every duplicate ranks the OTHER lowest-id duplicates first
    assert got[got.qid == 5].vec_id.tolist() == [1, 2, 3, 4]


def test_list_col_to_matrix_shapes():
    from rayraster.similarity import list_col_to_matrix

    a = pa.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]], type=pa.list_(pa.float32()))
    np.testing.assert_array_equal(
        list_col_to_matrix(a), [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]
    )
    # sliced + chunked views must respect offsets (the raw child
    # buffer is larger than the logical window)
    np.testing.assert_array_equal(list_col_to_matrix(a.slice(1, 2)), [[3, 4], [5, 6]])
    ch = pa.chunked_array([a.slice(0, 1), a.slice(2, 1)])
    np.testing.assert_array_equal(list_col_to_matrix(ch), [[1, 2], [5, 6]])
    f = pa.array([[1.0, 2.0], [3.0, 4.0]], type=pa.list_(pa.float64(), 2))
    np.testing.assert_array_equal(list_col_to_matrix(f.slice(1, 1)), [[3, 4]])
    with pytest.raises(ValueError, match="ragged"):
        list_col_to_matrix(pa.array([[1.0], [2.0, 3.0]]))
    with pytest.raises(ValueError, match="null"):
        list_col_to_matrix(pa.array([[1.0, 2.0], None], type=pa.list_(pa.float64())))


def test_json_extract_int_fast_path_and_fallback():
    from rayraster.textops import json_extract_int

    t = pa.table(
        {
            "j": [
                '{"k": 69}',          # anchored RE2 fast path
                '{"k":-3}',
                '  { "k" : 7 } ',     # whitespace tolerated
                '{"x": 1}',           # key absent -> null
                "not json",           # malformed -> null
                None,                 # null in -> null out
                '{"k": 2, "z": 1}',   # multi-key -> stdlib fallback
                '{"k": 4.0}',         # float value -> fallback, int()
                '{"z": "\\"k\\": 9", "k": 5}',  # key text inside a VALUE
            ]
        }
    )
    out = json_extract_int(t, "j", "k", "k")
    assert out["k"].to_pylist() == [69, -3, 7, None, None, None, 2, 4, 5]


def test_self_topk_distributed_exact_and_bounded(tmp_path):
    """The slab-tiled self-join must equal the broadcast path (and the
    cross-join ROW_NUMBER oracle) bit-for-bit, while the candidate
    stream that reaches the final merge stays ~k per query per tile —
    never the corpus."""
    import duckdb

    from rayraster.similarity import (
        _self_tile_candidates,
        self_topk,
        self_topk_distributed,
        write_slab_layout,
    )

    rng = np.random.default_rng(7)
    n, k = 120, 5
    tab = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": [row.tolist() for row in rng.standard_normal((n, 8))],
        }
    )
    ds = rd.from_arrow(tab)
    work = str(tmp_path / "slabs")
    got = (
        self_topk_distributed(ds, k=k, slab_rows=40, work_dir=work)
        .to_pandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    ref = (
        self_topk(ds, k=k)
        .to_pandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, ref)
    con = duckdb.connect()
    con.register("e", tab)
    want = con.sql(f"""
SELECT qid, vec_id, "rank" FROM (
  SELECT a.vec_id AS qid, b.vec_id AS vec_id,
         row_number() OVER (PARTITION BY a.vec_id
           ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC,
                    b.vec_id) AS "rank"
  FROM e a CROSS JOIN e b WHERE a.vec_id <> b.vec_id
) WHERE "rank" <= {k} ORDER BY qid, "rank" """).df()
    pd.testing.assert_frame_equal(got[["qid", "vec_id", "rank"]], want)

    # slab layout exists (S = ceil(120/40) = 3 hive dirs)
    import os

    slabs = sorted(d for d in os.listdir(work) if d.startswith("slab="))
    assert slabs == ["slab=0", "slab=1", "slab=2"]

    # candidate-traffic cap: per tile each query emits its tie-safe
    # top-k only — bounded by N*S*(k+1), nowhere near the N*N cross
    cand = _self_tile_candidates(work, 3, k, "embedding", "vec_id", True)
    n_cand = cand.count()
    assert n_cand <= n * 3 * (k + 1), n_cand
    assert n_cand < n * n / 2


def test_bpe_merged_closed_form_equals_iterative():
    """The vectorized closed-form counter must equal true rank-ordered
    BPE application for any disjoint merge table, including across
    contraction splits, non-ASCII text and empty strings."""
    from rayraster.textops import bpe_apply_count, bpe_merged_token_count

    texts = [
        "it's a test of the tokenizer", "don'task me again", "x'sa'sa",
        "banana bandana", "", "x'lla 'llo", "3't okay",
        "they've gone, we're here", "he'll sell seashells",
        "héllo wörld naïve", "Tomato potato",
    ]
    merges = ["ba", "to", "he", "se", "na"]
    got = bpe_merged_token_count(pa.table({"text": texts}), merges)[
        "bpe_token_count"
    ].to_pylist()
    assert got == bpe_apply_count(texts, merges).tolist()
    # fuzz with contraction-heavy alphabet
    import random
    import string

    rng = random.Random(99)
    alpha = string.ascii_lowercase + "  '.!e'"
    fuzz = ["".join(rng.choice(alpha) for _ in range(rng.randrange(60)))
            for _ in range(300)]
    m2 = ["se", "ta", "le", "ne", "pa"]
    g = bpe_merged_token_count(pa.table({"text": fuzz}), m2)[
        "bpe_token_count"
    ].to_pylist()
    assert g == bpe_apply_count(fuzz, m2).tolist()
    # chaining tables are rejected by the closed form, handled iteratively
    with pytest.raises(ValueError, match="chain"):
        bpe_merged_token_count(pa.table({"text": texts}), ["th", "he"])
    assert bpe_apply_count(["the theme"], ["th", "he"]).tolist() == [7]
    # chaining reference goldens: 'th' alone leaves (th, e); adding the
    # 'the' merge lets (th)+(e) chain into ONE token
    assert bpe_apply_count(["the"], ["th"]).tolist() == [2]
    assert bpe_apply_count(["the"], ["th", "the"]).tolist() == [1]


def test_bpe_training_partition_invariant():
    """Merge training folds integer partials — the learned table must
    be identical for any partitioning of the same corpus."""
    from rayraster.textops import bpe_train_merges

    texts = [f"banana bandana tomato potato number {i} don'task" for i in range(64)]
    tab = pa.table({"doc_id": pa.array(range(64), type=pa.int64()), "text": texts})
    one = bpe_train_merges(rd.from_arrow(tab), n_merges=6)
    many = bpe_train_merges(rd.from_arrow(tab).repartition(13), n_merges=6)
    assert one == many
    # disjointness by construction: consonant firsts, vowel seconds
    assert all(len(m) == 2 for m in one)
    assert not ({m[0] for m in one} & {m[1] for m in one})


def test_bpe_merged_counts_feed_pack_by_budget():
    """The merged counts slot straight into the token-budget shard
    packer (the downstream consumer of a token counter)."""
    from rayraster.agg import pack_by_budget
    from rayraster.textops import bpe_merged_token_count

    texts = ["banana " * (i + 1) for i in range(10)]
    tab = pa.table({"doc_id": pa.array(range(10), type=pa.int64()), "text": texts})
    counted = rd.from_arrow(tab).map_batches(
        lambda t: bpe_merged_token_count(t, ["ba", "na"]).select(
            ["doc_id", "bpe_token_count"]
        ),
        batch_format="pyarrow",
    )
    packed = pack_by_budget(counted, 40, "bpe_token_count", "doc_id").to_pandas()
    packed = packed.sort_values("doc_id").reset_index(drop=True)
    lens = packed.bpe_token_count.to_numpy()
    before = np.concatenate([[0], np.cumsum(lens)[:-1]])
    assert (packed.tokens_before.to_numpy() == before).all()
    assert (packed.bin_id.to_numpy() == before // 40).all()


def test_hashed_ngram_embed_matches_naive():
    from rayraster.textops import hashed_ngram_embed

    texts = ["hello world", "", "ab", "abc", "the quick brown fox", "aaa aaa"]
    dim = 16
    out = hashed_ngram_embed(pa.table({"text": texts}), dim=dim)["embedding"]
    for s, vec in zip(texts, out.to_pylist()):
        naive = [0] * dim
        for i in range(len(s) - 2):
            h = (ord(s[i]) * 961 + ord(s[i + 1]) * 31 + ord(s[i + 2])) % dim
            naive[h] += 1
        assert vec == naive, s
        assert sum(vec) == max(0, len(s) - 2)  # trigram conservation


def test_c4_line_filter_rules_and_slices():
    from rayraster.textops import c4_line_filter

    texts = [
        "Good line with words here.\nshort.\nno terminal punct\nProper sentence two!",
        "", None, "one two three",
        'He said "stop".\nquoted line ends right"',
        "a.\nb b b b.",
    ]

    def ref(s):
        if not s:
            return ""
        return "\n".join(
            l for l in s.split("\n")
            if len(l.split()) >= 3 and l.endswith((".", "!", "?", '"'))
        )

    t = pa.table({"text": pa.array(texts, type=pa.string())})
    assert c4_line_filter(t, min_words=3)["text_c4"].to_pylist() == [
        ref(s or "") for s in texts
    ]
    # sliced + chunked columns must respect list offsets
    sl = pa.table(
        {"text": pa.chunked_array([pa.array(texts, type=pa.string()).slice(3, 3)])}
    )
    assert c4_line_filter(sl, min_words=3)["text_c4"].to_pylist() == [
        ref(s or "") for s in texts[3:]
    ]


def test_canonicalize_url_rules():
    from rayraster.textops import canonicalize_url

    cases = {
        "HTTPS://WWW.Example.COM:443/Path/To?z=9&a=1&m=5#frag":
            "https://www.example.com/Path/To?a=1&m=5&z=9",
        "http://Host.org:80/": "http://host.org/",
        "http://host.org:8080/x?b=2&a=1": "http://host.org:8080/x?a=1&b=2",
        "https://h.io": "https://h.io/",          # empty path -> /
        "ftp://Files.NET:21/pub": "ftp://files.net:21/pub",  # unknown scheme keeps port
        "not a url": "not a url",                 # unparseable passes through
        "https://h.io/p?single=1": "https://h.io/p?single=1",
    }
    t = pa.table({"url": pa.array(list(cases), type=pa.string())})
    assert canonicalize_url(t)["url_canon"].to_pylist() == list(cases.values())
    # null stays null
    tn = pa.table({"url": pa.array([None], type=pa.string())})
    assert canonicalize_url(tn)["url_canon"].to_pylist() == [None]


def test_self_topk_distributed_dataset_output_and_resume(tmp_path):
    """output='dataset' (distributed grouped-top-k finalize) must equal
    the driver-merge table; the slab layout must be reused on a second
    run (resumability marker)."""
    import os

    from rayraster.similarity import self_topk_distributed

    rng = np.random.default_rng(3)
    n, k = 90, 4
    tab = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": [row.tolist() for row in rng.standard_normal((n, 6))],
        }
    )
    ds = rd.from_arrow(tab)
    work = str(tmp_path / "slabs")
    as_table = (
        self_topk_distributed(ds, k=k, slab_rows=30, work_dir=work)
        .to_pandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    files_before = sorted(
        os.path.join(r, f) for r, _, fs in os.walk(work) for f in fs
    )
    as_ds = (
        self_topk_distributed(ds, k=k, slab_rows=30, work_dir=work,
                              output="dataset")
        .to_pandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        as_table, as_ds[["qid", "vec_id", "rank", "cos"]]
    )
    # second run reused the layout byte-for-byte (no new/changed files)
    files_after = sorted(
        os.path.join(r, f) for r, _, fs in os.walk(work) for f in fs
    )
    assert files_before == files_after
    with pytest.raises(ValueError, match="different slab count"):
        self_topk_distributed(ds, k=k, slab_rows=10, work_dir=work)


def test_bm25_search_matches_local_reference(tmp_path):
    """BM25 over the persisted scored index equals a local reference
    computed with the same division-only idf and fixed op order."""
    from rayraster.textops import bm25_search, build_scored_index

    texts = [
        "the join hash batch", "join join join table", "hash map batch",
        "nothing here", "batch batch hash join extra words making this "
        "doc much longer than all of the rest", "join", "hash hash", "",
    ]
    tab = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts}
    )
    idx = str(tmp_path / "bm25")
    build_scored_index(rd.from_arrow(tab), idx, num_buckets=4)
    got = (
        bm25_search(idx, ["join", "hash", "batch"], k=5)
        .to_pandas().sort_values("rank").reset_index(drop=True)
    )

    # local reference, same op order
    import collections

    k1, b = 1.2, 0.75
    tf: dict[tuple[int, str], int] = collections.Counter()
    dl: dict[int, int] = collections.Counter()
    for i, s in enumerate(texts):
        for w in s.split():
            tf[(i, w)] += 1
            dl[i] += 1
    df = collections.Counter(w for (_, w) in tf)
    N = len(texts)
    avgdl = sum(dl.values()) / N
    scores = {}
    for d in range(N):
        tot = 0.0
        for t in sorted(["join", "hash", "batch"]):
            f = tf.get((d, t), 0)
            if not f:
                continue
            idf = (N - df[t] + 0.5) / (df[t] + 0.5)
            s = f * (k1 + 1.0) / (f + k1 * ((1.0 - b) + b * (dl[d] / avgdl)))
            tot = tot + idf * s
        if tot:
            scores[d] = tot
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got.doc_id.tolist() == [d for d, _ in want]
    assert got.score.tolist() == [s for _, s in want]  # bit-exact
    assert got["rank"].tolist() == list(range(1, len(want) + 1))

    with pytest.raises(ValueError, match="at least one term"):
        bm25_search(idx, [])


def test_binary_col_to_matrix_views_and_raises():
    from rayraster.similarity import binary_col_to_matrix

    vecs = np.arange(12, dtype=np.float64).reshape(3, 4)
    blobs = pa.array([v.tobytes() for v in vecs], type=pa.binary())
    np.testing.assert_array_equal(binary_col_to_matrix(blobs), vecs)
    # large_binary, sliced, chunked
    lb = blobs.cast(pa.large_binary())
    np.testing.assert_array_equal(binary_col_to_matrix(lb), vecs)
    np.testing.assert_array_equal(binary_col_to_matrix(blobs.slice(1, 2)), vecs[1:])
    ch = pa.chunked_array([blobs.slice(0, 1), blobs.slice(1, 2)])
    np.testing.assert_array_equal(binary_col_to_matrix(ch), vecs)
    # fixed_size_binary
    fsb = pa.array([v.tobytes() for v in vecs], type=pa.binary(32))
    np.testing.assert_array_equal(binary_col_to_matrix(fsb), vecs)
    np.testing.assert_array_equal(binary_col_to_matrix(fsb.slice(2, 1)), vecs[2:])
    # other dtypes
    ints = pa.array([np.arange(2, dtype=np.int32).tobytes()])
    np.testing.assert_array_equal(binary_col_to_matrix(ints, np.int32), [[0, 1]])
    # empty
    assert binary_col_to_matrix(pa.array([], type=pa.binary())).shape == (0, 0)
    # ragged / nulls / bad width raise
    with pytest.raises(ValueError):
        binary_col_to_matrix(pa.array([b"12345678", b"1234567890123456"]))
    with pytest.raises(ValueError):
        binary_col_to_matrix(pa.array([b"12345678", None]))
    with pytest.raises(ValueError):
        binary_col_to_matrix(pa.array([b"123"]))


# --------------------------------------------------------------------------
# bigram LM perplexity scoring
# --------------------------------------------------------------------------


_LM_DOCS = pa.table(
    {
        "doc_id": np.arange(8, dtype=np.int64),
        "text": [
            "the cat sat on the mat",
            "the cat ran",
            "the dog sat on the mat",
            "cat",                      # 1 token → no bigrams → no row
            "",                         # empty → no row
            "  the   cat  sat  ",       # whitespace runs ≡ single spaces
            "zq xv qqq zq xv",          # rare garbage scores lower
            "the cat sat on the mat",   # duplicate of doc 0
        ],
    }
)


def _lm_brute(table: pa.Table):
    """Reference model in plain Python: add-one bigram, libm floor."""
    import math
    from collections import Counter

    toks = {r["doc_id"]: [w for w in r["text"].split()] for r in table.to_pylist()}
    vocab = {w for ws in toks.values() for w in ws}
    c2, c1 = Counter(), Counter()
    for ws in toks.values():
        for a, b in zip(ws, ws[1:]):
            c2[(a, b)] += 1
            c1[a] += 1
    out = {}
    for d, ws in toks.items():
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            continue
        s = sum(
            math.floor((1 << 20) * math.log((c2[p] + 1.0) / (c1[p[0]] + float(len(vocab)))))
            for p in pairs
        )
        out[d] = (len(pairs), s)
    return out


def test_bigram_lm_matches_brute_both_paths(ray_session):
    from rayraster.textops import bigram_lm_score

    want = _lm_brute(_LM_DOCS)
    for mode in ("broadcast", "partitioned"):
        got = (
            bigram_lm_score(rd.from_arrow(_LM_DOCS), mode=mode, num_partitions=4)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert set(got.index) == set(want)
        for d, (n, s) in want.items():
            assert got.loc[d, "bigram_count"] == n, (mode, d)
            assert got.loc[d, "lm_logprob_q"] == s, (mode, d)
    # fluent text beats garbage per-bigram
    g = got
    fluent = g.loc[0, "lm_logprob_q"] / g.loc[0, "bigram_count"]
    garbage = g.loc[6, "lm_logprob_q"] / g.loc[6, "bigram_count"]
    assert fluent > garbage
    # duplicate docs score identically
    assert g.loc[0, "lm_logprob_q"] == g.loc[7, "lm_logprob_q"]


def test_bigram_lm_partition_invariance(ray_session):
    """Scores are pure corpus functions — identical at any partition
    count and either engine (the fixed-point sum is order-free)."""
    from rayraster.textops import bigram_lm_score

    rng = np.random.default_rng(7)
    words = np.array(["alpha", "beta", "gamma", "delta", "xq"])
    texts = [" ".join(rng.choice(words, rng.integers(0, 30))) for _ in range(300)]
    t = pa.table({"doc_id": np.arange(300, dtype=np.int64), "text": texts})
    ref = None
    for mode, P in (("broadcast", 4), ("partitioned", 2), ("partitioned", 16)):
        got = (
            bigram_lm_score(rd.from_arrow(t), mode=mode, num_partitions=P)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        if ref is None:
            ref = got
        else:
            pd.testing.assert_frame_equal(got, ref)


def test_floor_q_log_matches_libm():
    """The knife-edge repair: floor(Q·ln r) equals a pure-libm loop on
    values specifically constructed near floor boundaries."""
    import math
    from rayraster.textops import _floor_q_log, _LM_Q

    rng = np.random.default_rng(1)
    r = rng.uniform(1e-9, 1.0, 20000)
    # values engineered to sit ~at integer boundaries of Q·ln(r)
    k = rng.integers(-40 * _LM_Q, -1, 2000)
    r = np.concatenate([r, np.exp(k / _LM_Q)])
    got = _floor_q_log(r)
    want = np.array([math.floor(_LM_Q * math.log(v)) for v in r])
    assert np.array_equal(got, want)


# ---------------------------------------------------------------------------
# PCA / whitening
# ---------------------------------------------------------------------------


def _pca_fixture(n=4000, d=16, seed=7):
    rng = np.random.default_rng(seed)
    # anisotropic: a few dominant directions + noise floor
    basis = np.linalg.qr(rng.normal(size=(d, d)))[0]
    scales = np.concatenate([[10.0, 6.0, 3.0], np.full(d - 3, 0.3)])
    X = rng.normal(size=(n, d)) * scales @ basis.T + rng.normal(2.0, 0.1, d)
    return X


def test_embedding_pca_matches_numpy_reference(ray_session):
    from rayraster.similarity import embedding_pca

    X = _pca_fixture()
    t = pa.table({"embedding": pa.array(
        [row for row in X.astype(np.float32)], type=pa.list_(pa.float32())
    )})
    ds = rd.from_arrow(t).repartition(8)
    comps, mean, ev = embedding_pca(ds, d_out=4)
    Xf = X.astype(np.float32).astype(np.float64)  # the stored precision
    assert np.allclose(mean, Xf.mean(axis=0), atol=1e-8)
    cov = np.cov(Xf, rowvar=False)
    w, V = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    w, V = w[order], V[:, order]
    assert np.allclose(ev, w[:4], rtol=1e-8)
    for i in range(4):
        ref = V[:, i]
        j = int(np.argmax(np.abs(comps[i])))
        if ref[j] < 0:
            ref = -ref
        assert np.allclose(comps[i], ref, atol=1e-6), i
    # orthonormal rows
    assert np.allclose(comps @ comps.T, np.eye(4), atol=1e-10)


def test_pca_transform_stage_projects_and_whitens(ray_session):
    from rayraster.similarity import PCATransformStage, embedding_pca

    X = _pca_fixture(n=3000)
    t = pa.table({"embedding": pa.array(
        [row for row in X.astype(np.float32)], type=pa.list_(pa.float32())
    )})
    ds = rd.from_arrow(t).repartition(4)
    comps, mean, ev = embedding_pca(ds, d_out=3)
    out = ds.map_batches(
        PCATransformStage(comps, mean, ev, whiten=True),
        batch_format="pyarrow",
    ).to_pandas()
    Y = np.stack(out.embedding_pca.to_numpy())
    assert Y.shape == (3000, 3)
    # whitened: unit variance per component, near-zero mean
    assert np.allclose(Y.mean(axis=0), 0.0, atol=1e-6)
    assert np.allclose(Y.var(axis=0, ddof=1), 1.0, atol=1e-3)
    with pytest.raises(ValueError, match="whiten"):
        PCATransformStage(comps, mean, whiten=True)


def test_embedding_pca_validations(ray_session):
    from rayraster.similarity import embedding_pca

    one = pa.table({"embedding": pa.array([[1.0, 2.0]], type=pa.list_(pa.float64()))})
    with pytest.raises(ValueError, match="at least 2"):
        embedding_pca(rd.from_arrow(one))


# ---------------------------------------------------------------------------
# product quantization
# ---------------------------------------------------------------------------


def test_pq_lossless_when_codebook_covers_data(ray_session):
    """≤256 distinct vectors ⇒ every subvector is a centroid ⇒ ADC
    distances are EXACT and PQ top-k equals brute cosine top-k."""
    from rayraster.similarity import brute_topk, pq_encode, pq_search, pq_train

    rng = np.random.default_rng(5)
    base = rng.normal(size=(40, 32))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    pick = rng.integers(0, 40, 2000)
    X = base[pick]
    ids = np.arange(2000, dtype=np.int64)
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array([r for r in X], type=pa.list_(pa.float64()))})
    ds = rd.from_arrow(t).repartition(6).materialize()
    books = pq_train(ds, m=8, n_centroids=64)
    codes = pq_encode(ds, books).materialize()
    qids = np.array([0, 7, 13], dtype=np.int64)
    Q = X[[0, 7, 13]]
    got = pq_search(codes, books, qids, Q, k=5).to_pandas()
    want = brute_topk(ds, qids, Q, k=5).to_pandas()
    g = got.sort_values(["qid", "rank"]).reset_index(drop=True)
    w = want.sort_values(["qid", "rank"]).reset_index(drop=True)
    assert list(g.vec_id) == list(w.vec_id)
    # ADC on unit vectors is 2 − 2·cos, exactly
    assert np.allclose(g.adc, 2.0 - 2.0 * w.cos, atol=1e-9)


def test_pq_recall_on_clustered_corpus(ray_session):
    from rayraster.similarity import brute_topk, pq_encode, pq_search, pq_train

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(20, 32)) * 4
    X = np.concatenate([c + rng.normal(size=(300, 32)) for c in centers])
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    ids = np.arange(len(X), dtype=np.int64)
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array([r for r in X], type=pa.list_(pa.float64()))})
    ds = rd.from_arrow(t).repartition(8).materialize()
    books = pq_train(ds, m=8, n_centroids=256)
    codes = pq_encode(ds, books).materialize()
    # compression: 8 bytes per vector
    sch = dict(zip(codes.schema().names, codes.schema().types))
    assert sch["pq_code"] == pa.binary(8)
    qn = 25
    qids = np.arange(qn, dtype=np.int64) * 17
    Q = X[qids]
    got = pq_search(codes, books, qids, Q, k=10).to_pandas()
    want = brute_topk(ds, qids, Q, k=10).to_pandas()
    hits = 0
    for q in qids:
        g = set(got[got.qid == q].vec_id)
        w = set(want[want.qid == q].vec_id)
        hits += len(g & w)
    recall = hits / (qn * 10)
    assert recall >= 0.6, recall


def test_pq_validations(ray_session):
    from rayraster.similarity import pq_train

    t = pa.table({"embedding": pa.array([[1.0] * 10, [2.0] * 10],
                                        type=pa.list_(pa.float64()))})
    ds = rd.from_arrow(t)
    with pytest.raises(ValueError, match="divisible"):
        pq_train(ds, m=3)
    with pytest.raises(ValueError, match="uint8"):
        pq_train(ds, m=2, n_centroids=512)


def _colloc_corpus():
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for d in range(40):
        words = list(rng.choice(vocab, size=60))
        # plant a strong collocation
        for j in range(0, 50, 10):
            words[j], words[j + 1] = "new", "york"
        docs.append({"doc_id": d, "text": " ".join(words)})
    return pd.DataFrame(docs)


def test_collocations_topk_matches_duckdb(ray_session):
    import duckdb

    from rayraster.textops import collocations_topk

    df = _colloc_corpus()
    got = (
        collocations_topk(rd.from_pandas(df), k=20, min_count=3)
        .to_pandas()
        .sort_values("rnk")
        .reset_index(drop=True)
    )
    ora = duckdb.sql(
        r"""WITH tl AS (
  SELECT list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws FROM df),
uni AS (SELECT unnest(ws) AS word FROM tl),
c AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM uni GROUP BY 1),
bgp AS (SELECT unnest(ws[1:length(ws)-1]) AS w1, unnest(ws[2:length(ws)]) AS w2
        FROM tl WHERE length(ws) >= 2),
bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bgp GROUP BY 1, 2),
tot AS (SELECT (SELECT CAST(SUM(n) AS BIGINT) FROM c) AS t,
               (SELECT CAST(SUM(c12) AS BIGINT) FROM bc) AS b),
sc AS (SELECT bc.w1, bc.w2, bc.c12, u1.n AS c1,
              CAST(bc.c12 * tot.t * tot.t AS DOUBLE)
                / CAST(u1.n * u2.n * tot.b AS DOUBLE) AS score
       FROM bc JOIN c u1 ON bc.w1 = u1.word JOIN c u2 ON bc.w2 = u2.word
       CROSS JOIN tot WHERE bc.c12 >= 3)
SELECT *, CAST(row_number() OVER (ORDER BY score DESC, w1, w2) AS BIGINT) AS rnk
FROM sc QUALIFY rnk <= 20 ORDER BY rnk"""
    ).df()
    assert len(got) == len(ora)
    for col in ["w1", "w2", "c12", "c1", "score", "rnk"]:
        assert (got[col].to_numpy() == ora[col].to_numpy()).all(), col
    # the planted collocation dominates
    assert (got.w1.iloc[0], got.w2.iloc[0]) == ("new", "york")


def test_collocations_topk_partition_invariant_and_min_count(ray_session):
    from rayraster.textops import collocations_topk

    df = _colloc_corpus()
    a = collocations_topk(rd.from_pandas(df), k=10, min_count=3).to_pandas()
    b = collocations_topk(
        rd.from_pandas(df).repartition(7), k=10, min_count=3, num_partitions=5
    ).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("rnk").reset_index(drop=True),
        b.sort_values("rnk").reset_index(drop=True),
    )
    assert (a.c12 >= 3).all()
    # a huge min_count empties the result
    e = collocations_topk(rd.from_pandas(df), k=10, min_count=10**6).to_pandas()
    assert len(e) == 0


def test_collocations_topk_validations(ray_session):
    from rayraster.textops import collocations_topk

    ds = rd.from_items([{"text": "a b"}])
    with pytest.raises(ValueError, match="k must"):
        collocations_topk(ds, k=0)
    with pytest.raises(ValueError, match="min_count"):
        collocations_topk(ds, min_count=0)


def test_sq_lossless_on_grid_equals_brute(ray_session):
    """Corpus coords on the 256-grid of the trained ranges -> exact
    reconstruction -> sq_search == brute_topk bit for bit."""
    from rayraster.similarity import brute_topk, sq_encode, sq_search, sq_train

    rng = np.random.default_rng(5)
    n, d = 400, 16
    X = rng.integers(0, 256, size=(n, d)).astype(np.float64)
    # pin the range ends so lo=0, hi=255 on every dim
    X[0] = 0.0
    X[1] = 255.0
    t = pa.table(
        {"vec_id": pa.array(np.arange(n, dtype=np.int64)),
         "embedding": pa.array(list(X), type=pa.list_(pa.float64()))}
    )
    ds = rd.from_arrow(t)
    r = sq_train(ds, normalize=False)
    assert (r["lo"] == 0.0).all() and (r["hi"] == 255.0).all()
    codes = sq_encode(ds, r)
    qids = np.arange(5, dtype=np.int64)
    Q = X[:5]
    got = sq_search(codes, r, qids, Q, k=10).to_pandas()
    want = brute_topk(ds, qids, Q, k=10).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values(["qid", "rank"]).reset_index(drop=True),
        want.sort_values(["qid", "rank"]).reset_index(drop=True),
    )


def test_sq_recall_on_gaussian_corpus(ray_session):
    from rayraster.similarity import brute_topk, sq_encode, sq_search, sq_train

    rng = np.random.default_rng(9)
    n, d = 1000, 32
    X = rng.normal(size=(n, d))
    t = pa.table(
        {"vec_id": pa.array(np.arange(n, dtype=np.int64)),
         "embedding": pa.array(list(X), type=pa.list_(pa.float64()))}
    )
    ds = rd.from_arrow(t)
    r = sq_train(ds)
    codes = sq_encode(ds, r)
    qids = np.arange(20, dtype=np.int64)
    Q = X[:20]
    got = sq_search(codes, r, qids, Q, k=10).to_pandas()
    want = brute_topk(ds, qids, Q, k=10).to_pandas()
    hits = sum(
        len(set(got[got.qid == q].vec_id) & set(want[want.qid == q].vec_id))
        for q in qids
    )
    assert hits / (20 * 10) >= 0.9  # 8-bit/dim loses almost nothing


def test_sq_degenerate_dims_and_empty(ray_session):
    from rayraster.similarity import sq_encode, sq_train

    X = np.array([[1.0, 5.0], [1.0, 7.0], [1.0, 6.0]])
    t = pa.table(
        {"vec_id": pa.array(np.arange(3, dtype=np.int64)),
         "embedding": pa.array(list(X), type=pa.list_(pa.float64()))}
    )
    ds = rd.from_arrow(t)
    r = sq_train(ds, normalize=False)
    assert r["lo"][0] == r["hi"][0] == 1.0
    rows = sq_encode(ds, r).take_all()
    codes = np.stack([np.frombuffer(x["sq_code"], np.uint8) for x in rows])
    assert (codes[:, 0] == 0).all()  # degenerate dim encodes 0
    assert codes[:, 1].min() == 0 and codes[:, 1].max() == 255
    import pytest as _pt

    with _pt.raises(ValueError, match="empty"):
        sq_train(rd.from_arrow(t.slice(0, 0)))


def _phrase_brute(df, phrase):
    out = {}
    for r in df.itertuples():
        words = r.text.split()
        n = 0
        for a in range(len(words) - len(phrase) + 1):
            if words[a:a + len(phrase)] == phrase:
                n += 1
        if n:
            out[r.doc_id] = n
    return out


def test_phrase_search_matches_brute(ray_session, tmp_path):
    from rayraster.textops import build_positional_index, phrase_search

    rng = np.random.default_rng(8)
    vocab = ["red", "green", "blue", "fox", "dog"]
    docs = []
    for d in range(60):
        words = list(rng.choice(vocab, size=30))
        if d % 4 == 0:
            words[5:7] = ["green", "fox"]
        docs.append({"doc_id": d, "text": " ".join(words)})
    df = pd.DataFrame(docs)
    path = str(tmp_path / "pos_idx")
    build_positional_index(rd.from_pandas(df), path, num_buckets=8)
    got = (
        phrase_search(path, ["green", "fox"], num_partitions=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = _phrase_brute(df, ["green", "fox"])
    assert dict(zip(got.doc_id, got.n_hits)) == want
    assert len(want) >= 15  # the planted phrase is found


def test_phrase_search_overlaps_repeats_and_edges(ray_session, tmp_path):
    from rayraster.textops import build_positional_index, phrase_search

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "a a a b",      # phrase (a,a): anchors 0,1 -> 2 overlapping hits
                "a b a",        # no consecutive pair
                "x y",          # terms absent
                "a a",          # exactly one hit
            ],
        }
    )
    path = str(tmp_path / "pos_idx2")
    build_positional_index(rd.from_pandas(df), path, num_buckets=4)
    got = (
        phrase_search(path, ["a", "a"], num_partitions=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert dict(zip(got.doc_id, got.n_hits)) == {0: 2, 3: 1}
    # three-word phrase across the same corpus
    got3 = phrase_search(path, ["a", "a", "a"], num_partitions=2).to_pandas()
    assert dict(zip(got3.doc_id, got3.n_hits)) == {0: 1}
    import pytest as _pt

    with _pt.raises(ValueError, match="two words"):
        phrase_search(path, ["solo"])


def test_oov_rate_matches_reference(ray_session):
    from rayraster.textops import oov_rate

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["a b c d", "a a zz", "", "qq ww ee"],
        }
    )
    vocab = ["a", "b", "c"]
    out = (
        oov_rate(rd.from_pandas(df), vocab)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out.n_tokens.tolist() == [4, 3, 0, 3]
    assert out.n_oov.tolist() == [1, 1, 0, 3]
    assert out.oov_frac.tolist() == [0.25, 1 / 3, 0.0, 1.0]
    import pytest as _pt

    with _pt.raises(ValueError, match="empty"):
        oov_rate(rd.from_pandas(df), [])


def test_oov_rate_composes_with_trained_vocab(ray_session):
    from rayraster.textops import oov_rate, vocab_topk

    rng = np.random.default_rng(12)
    words = [f"w{i}" for i in range(50)]
    docs = pd.DataFrame(
        {"doc_id": range(30),
         "text": [" ".join(rng.choice(words, 40)) for _ in range(30)]}
    )
    ds = rd.from_pandas(docs)
    top = vocab_topk(ds, k=25).to_pandas()
    out = oov_rate(ds, top.word.tolist()).to_pandas()
    # every doc's oov fraction is a real fraction of its 40 tokens
    assert ((out.n_oov <= out.n_tokens) & (out.n_tokens == 40)).all()
    brute_total = sum(
        1 for t in docs.text for w in t.split() if w not in set(top.word)
    )
    assert out.n_oov.sum() == brute_total


def _semdedup_corpus(n=300, d=24, n_dups=40, seed=13):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d))
    ids = np.arange(n, dtype=np.int64)
    # planted near-duplicates: id and id+10000 differ by a tiny nudge
    dup_ids = ids[:n_dups] + 10000
    Xd = X[:n_dups] + rng.normal(scale=1e-4, size=(n_dups, d))
    allX = np.concatenate([X, Xd])
    all_ids = np.concatenate([ids, dup_ids])
    t = pa.table(
        {"vec_id": pa.array(all_ids),
         "embedding": pa.array(list(allX), type=pa.list_(pa.float64()))}
    )
    return t, set(zip(ids[:n_dups].tolist(), dup_ids.tolist()))


def test_semantic_neardup_finds_planted_pairs(ray_session):
    from rayraster.similarity import semantic_neardup_pairs

    t, planted = _semdedup_corpus()
    ds = rd.from_arrow(t)
    out = semantic_neardup_pairs(ds, threshold=0.999, n_clusters=8).to_pandas()
    got = set(zip(out.a.tolist(), out.b.tolist()))
    # every planted twin lands in the same cluster (identical up to 1e-4)
    # and must be recovered; random Gaussians at d=24 never hit 0.999
    assert got == planted
    assert (out.cos >= 0.999).all()


def test_semantic_neardup_partition_invariant_and_guards(ray_session):
    import pytest as _pt

    from rayraster.similarity import semantic_neardup_pairs

    t, _ = _semdedup_corpus(n=150, n_dups=15, seed=21)
    a = semantic_neardup_pairs(
        rd.from_arrow(t), threshold=0.999, n_clusters=6
    ).to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    b = semantic_neardup_pairs(
        rd.from_arrow(t).repartition(5), threshold=0.999, n_clusters=6
    ).to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["a", "b"]], b[["a", "b"]])
    with _pt.raises(ValueError, match="threshold"):
        semantic_neardup_pairs(rd.from_arrow(t), threshold=1.5)
    with _pt.raises(Exception, match="max_cluster"):
        semantic_neardup_pairs(
            rd.from_arrow(t), threshold=0.5, n_clusters=1, max_cluster=10
        ).to_pandas()
    # composes with the CC keep-list chain
    from rayraster.dedup import connected_components_distributed

    pairs = semantic_neardup_pairs(rd.from_arrow(t), threshold=0.999, n_clusters=6)
    cl = connected_components_distributed(pairs, num_partitions=4).to_pandas()
    assert (cl.groupby("cluster").size() == 2).all()  # planted twins only


def test_pattern_counts_matches_re_and_nulls(ray_session):
    import re

    from rayraster.textops import pattern_counts

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["mail a@b.co and c@d.eu ip 1.2.3.4", None, "no hits"],
        }
    )
    pats = {"email": r"[a-z]+@[a-z]+\.[a-z]+", "ipv4": r"[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+"}
    out = (
        pattern_counts(rd.from_pandas(df), pats)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    for i, txt in enumerate(df.text.fillna("")):
        assert out.n_email[i] == len(re.findall(pats["email"], txt))
        assert out.n_ipv4[i] == len(re.findall(pats["ipv4"], txt))
    assert out.n_total.tolist() == [3, 0, 0]
    import pytest as _pt

    with _pt.raises(ValueError, match="at least one"):
        pattern_counts(rd.from_pandas(df), {})
    with _pt.raises(ValueError, match="identifiers"):
        pattern_counts(rd.from_pandas(df), {"bad name": "x"})


# ---------------------------------------------------------------------------
# TextRank keywords
# ---------------------------------------------------------------------------


def _textrank_ref(texts, iterations=3, scale=1_000_000, k=20):
    """Pure-Python integer TextRank with the engine's exact arithmetic."""
    import re
    from collections import Counter

    toks = [[w for w in re.split(r"\s+", t) if w] for t in texts]
    uni = Counter(w for ws in toks for w in ws)
    order = sorted(uni, key=lambda w: (-uni[w], w))
    ids = {w: i + 1 for i, w in enumerate(order)}
    bi = Counter(
        (ws[i], ws[i + 1]) for ws in toks for i in range(len(ws) - 1)
    )
    edges = []
    for (a, b), c in bi.items():
        edges.append((ids[a], ids[b], c))
        edges.append((ids[b], ids[a], c))
    W = Counter()
    for s, _, w in edges:
        W[s] += w
    r = {i: scale for i in ids.values()}
    tele = scale * 15 // 100
    for _ in range(iterations):
        c = {i: 0 for i in ids.values()}
        for s, d, w in edges:
            c[d] += (r[s] * 85 * w) // (100 * W[s])
        r = {i: tele + c[i] for i in ids.values()}
    inv = {i: w for w, i in ids.items()}
    rows = sorted(
        ((i, pr) for i, pr in r.items()), key=lambda p: (-p[1], inv[p[0]])
    )[:k]
    return [
        (inv[i], i, uni[inv[i]], pr, pr / scale, j + 1)
        for j, (i, pr) in enumerate(rows)
    ]


def test_keywords_textrank_matches_integer_reference(ray_session, tmp_path):
    from rayraster.textops import keywords_textrank

    rng = np.random.default_rng(61)
    vocab = [f"w{i:02d}" for i in range(30)]
    # planted hub: "graph" co-occurs with everything
    texts = []
    for d in range(40):
        ws = list(rng.choice(vocab, size=25))
        for j in range(0, 25, 5):
            ws.insert(j, "graph")
        texts.append(" ".join(ws))
    docs = rd.from_pandas(pd.DataFrame({"text": texts})).repartition(4)
    got = keywords_textrank(
        docs, str(tmp_path / "tr_edges"), k=15, num_partitions=8,
        corpus_count=len(texts),
    ).to_pandas()
    want = _textrank_ref(texts, k=15)
    assert len(got) == 15
    got_rows = list(
        got[["word", "wid", "n", "pr", "score", "rnk"]].itertuples(index=False)
    )
    for g, w in zip(got_rows, want):
        assert tuple(g) == w
    # the planted hub must rank first
    assert got.iloc[0].word == "graph"


def test_keywords_textrank_partition_invariant_and_validations(
    ray_session, tmp_path
):
    from rayraster.textops import keywords_textrank

    texts = ["alpha beta gamma beta", "beta gamma delta", "alpha delta"]
    docs1 = rd.from_pandas(pd.DataFrame({"text": texts}))
    docs3 = docs1.repartition(3)
    a = keywords_textrank(
        docs1, str(tmp_path / "e1"), k=10, num_partitions=2
    ).to_pandas()
    b = keywords_textrank(
        docs3, str(tmp_path / "e2"), k=10, num_partitions=8
    ).to_pandas()
    assert a.equals(b)
    want = _textrank_ref(texts, k=10)
    assert [tuple(r) for r in a.itertuples(index=False)] == want
    with pytest.raises(ValueError, match="k must"):
        keywords_textrank(docs1, str(tmp_path / "e3"), k=0)
    with pytest.raises(ValueError, match="iterations"):
        keywords_textrank(docs1, str(tmp_path / "e4"), iterations=0)


def test_summarize_textrank_planted_hub_and_passthrough(ray_session):
    from rayraster.textops import summarize_textrank

    # sentence 2 shares words with every other sentence -> most central
    doc = ("alpha beta gamma delta. epsilon zeta eta theta. "
           "alpha epsilon iota kappa. iota lambda mu nu. "
           "omicron pi rho sigma.")
    short = "one two. three four."
    t = pa.table(
        {"doc_id": pa.array([1, 2, 3], type=pa.int64()),
         "text": pa.array([doc, short, ""], type=pa.string())}
    )
    out = (
        summarize_textrank(rd.from_arrow(t), k=1)
        .to_pandas().set_index("id")
    )
    assert out.loc[1, "n_sentences"] == 5 and out.loc[1, "n_kept"] == 1
    assert out.loc[1, "summary"] == "alpha epsilon iota kappa."
    # 2 sentences, k=1: disconnected tie -> earliest sentence wins
    assert out.loc[2, "summary"] == "one two." and out.loc[2, "n_kept"] == 1
    assert out.loc[3, "summary"] == "" and out.loc[3, "n_sentences"] == 0
    # <= k sentences pass through whole, original order
    out3 = (
        summarize_textrank(rd.from_arrow(t), k=3)
        .to_pandas().set_index("id")
    )
    assert out3.loc[2, "summary"] == short and out3.loc[2, "n_kept"] == 2


def test_summarize_textrank_order_and_partition_invariance(ray_session):
    from rayraster.textops import summarize_textrank

    rng = np.random.default_rng(97)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    for d in range(30):
        sents = [
            " ".join(rng.choice(vocab, size=6)) + "."
            for _ in range(rng.integers(4, 12))
        ]
        docs.append(" ".join(sents))
    t = pa.table(
        {"doc_id": pa.array(range(30), type=pa.int64()),
         "text": pa.array(docs, type=pa.string())}
    )
    a = (
        summarize_textrank(rd.from_arrow(t), k=3)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    b = (
        summarize_textrank(rd.from_arrow(t).repartition(7), k=3)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    assert a.equals(b)
    # kept sentences appear in original order: summary is a subsequence
    for r in a.itertuples():
        doc_sents = [s for s in docs[r.id].split(". ") if s]
        kept = [s for s in r.summary.split(". ") if s]
        it = iter([s.rstrip(".") for s in doc_sents])
        assert all(any(ks.rstrip(".") == ds for ds in it) for ks in kept)
    with pytest.raises(ValueError, match="k must"):
        summarize_textrank(rd.from_arrow(t), k=0)
    with pytest.raises(ValueError, match="damping"):
        summarize_textrank(rd.from_arrow(t), damping=1.5)


def _kn_brute(table: pa.Table):
    """Reference interpolated Kneser-Ney (D=3/4) in plain Python,
    mirroring _kn_pair_logq's expression tree exactly."""
    import math
    from collections import Counter

    toks = {r["doc_id"]: r["text"].split() for r in table.to_pylist()}
    vocab = {w for ws in toks.values() for w in ws}
    c2, c1 = Counter(), Counter()
    for ws in toks.values():
        for a, b in zip(ws, ws[1:]):
            c2[(a, b)] += 1
            c1[a] += 1
    n1p = Counter(p[0] for p in c2)   # distinct continuations per w1
    nr = Counter(p[1] for p in c2)    # distinct contexts per w2
    bv = len(c2) + len(vocab)
    out = {}
    for d, ws in toks.items():
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            continue
        s = 0
        for p in pairs:
            prob = (
                max(4 * c2[p] - 3, 0) / (4 * c1[p[0]])
                + (3 * n1p[p[0]]) / (4 * c1[p[0]]) * ((nr[p[1]] + 1) / bv)
            )
            s += math.floor((1 << 20) * math.log(prob))
        out[d] = (len(pairs), s)
    return out


def test_kn_bigram_matches_brute_both_paths(ray_session):
    from rayraster.textops import bigram_lm_score

    want = _kn_brute(_LM_DOCS)
    for mode in ("broadcast", "partitioned"):
        got = (
            bigram_lm_score(
                rd.from_arrow(_LM_DOCS), mode=mode, num_partitions=4,
                smoothing="kn",
            )
            .to_pandas().set_index("doc_id").sort_index()
        )
        assert set(got.index) == set(want)
        assert "lm_logprob_q" not in got.columns
        for d, (n, s) in want.items():
            assert got.loc[d, "bigram_count"] == n, (mode, d)
            assert got.loc[d, "kn_logprob_q"] == s, (mode, d)
    # fluent text still beats garbage per-bigram under KN
    fluent = got.loc[0, "kn_logprob_q"] / got.loc[0, "bigram_count"]
    garbage = got.loc[6, "kn_logprob_q"] / got.loc[6, "bigram_count"]
    assert fluent > garbage


def test_kn_smoothing_both_and_validation(ray_session):
    from rayraster.textops import bigram_lm_score

    both = (
        bigram_lm_score(
            rd.from_arrow(_LM_DOCS), mode="broadcast", smoothing="both"
        )
        .to_pandas().set_index("doc_id").sort_index()
    )
    a1 = _lm_brute(_LM_DOCS)
    kn = _kn_brute(_LM_DOCS)
    for d in a1:
        assert both.loc[d, "lm_logprob_q"] == a1[d][1]
        assert both.loc[d, "kn_logprob_q"] == kn[d][1]
    with pytest.raises(ValueError):
        bigram_lm_score(rd.from_arrow(_LM_DOCS), smoothing="katz")


def test_kn_is_a_proper_distribution():
    """The interpolated-KN model with add-one continuation smoothing
    sums to EXACTLY 1 over the vocabulary for every seen context
    (1 - lambda discount mass + lambda * 1)."""
    from collections import Counter
    from fractions import Fraction

    toks = {r["doc_id"]: r["text"].split() for r in _LM_DOCS.to_pylist()}
    vocab = sorted({w for ws in toks.values() for w in ws})
    c2, c1 = Counter(), Counter()
    for ws in toks.values():
        for a, b in zip(ws, ws[1:]):
            c2[(a, b)] += 1
            c1[a] += 1
    n1p = Counter(p[0] for p in c2)
    nr = Counter(p[1] for p in c2)
    bv = len(c2) + len(vocab)
    for w1 in c1:
        tot = sum(
            Fraction(max(4 * c2[(w1, w2)] - 3, 0), 4 * c1[w1])
            + Fraction(3 * n1p[w1], 4 * c1[w1]) * Fraction(nr[w2] + 1, bv)
            for w2 in vocab
        )
        assert tot == 1


def test_kn_partition_invariance(ray_session):
    from rayraster.textops import bigram_lm_score

    rng = np.random.default_rng(11)
    words = np.array(["alpha", "beta", "gamma", "delta", "xq", "zz"])
    texts = [" ".join(rng.choice(words, rng.integers(0, 24))) for _ in range(200)]
    t = pa.table({"doc_id": np.arange(200, dtype=np.int64), "text": texts})
    ref = None
    for mode, P in (("broadcast", 4), ("partitioned", 3), ("partitioned", 11)):
        got = (
            bigram_lm_score(
                rd.from_arrow(t), mode=mode, num_partitions=P, smoothing="both"
            )
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        got = got[["doc_id", "bigram_count", "lm_logprob_q", "kn_logprob_q"]]
        if ref is None:
            ref = got
        else:
            pd.testing.assert_frame_equal(got, ref)


def _nb_local(docs, q=None):
    """Plain-Python NB reference: add-one smoothing, floor(q*ln)."""
    import math
    from collections import Counter, defaultdict

    from rayraster.textops import _LM_Q

    q = q or _LM_Q
    cnt = defaultdict(Counter)
    nd = Counter()
    vocab = set()
    for _, lab, txt in docs:
        nd[lab] += 1
        for w in txt.split():
            cnt[lab][w] += 1
            vocab.add(w)
    V = len(vocab)
    classes = sorted(nd)
    n = len(docs)

    def fql(r):
        return math.floor(q * math.log(r))

    out = {}
    for i, _, txt in docs:
        best = None
        for c in classes:
            tot = sum(cnt[c].values())
            s = fql(nd[c] / n)
            for w in txt.split():
                s += fql((cnt[c][w] + 1) / (tot + V))
            if best is None or s > best[1]:
                best = (c, s)
        out[i] = best
    return out


def test_nb_matches_local_reference(ray_session):
    from rayraster.textops import nb_score, nb_train

    docs = [
        (0, "en", "the cat sat on the mat"),
        (1, "en", "the dog ate the bone"),
        (2, "fr", "le chat est sur le tapis"),
        (3, "fr", "le chien mange le os"),
        (4, "de", "der hund isst den knochen"),
        (5, "en", "cat and dog and mat"),
        (6, "fr", "chat et chien"),
        (7, "de", ""),  # empty text: prior-only score, still classed
    ]
    t = pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "lang": pa.array([d[1] for d in docs]),
        "text": pa.array([d[2] for d in docs]),
    })
    ds = rd.from_arrow(t).repartition(3)
    model = nb_train(ds, num_partitions=4)
    got = {
        r["doc_id"]: (r["nb_pred"], r["nb_score_q"])
        for r in nb_score(ds, model).take_all()
    }
    assert got == _nb_local(docs)
    # non-empty training docs classify as their own language here
    assert all(got[i][0] == docs[i][1] for i in range(7))


def test_nb_unseen_words_and_vocab_cap(ray_session):
    from rayraster.textops import nb_score, nb_train, _LM_Q
    import math

    train = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "lang": pa.array(["a", "b"]),
        "text": pa.array(["x x y", "z z w"]),
    })
    ds = rd.from_arrow(train)
    model = nb_train(ds, num_partitions=2)
    # score a doc whose words were never trained: every token takes the
    # add-one floor 1/(tot_c+V) — still deterministic and comparable
    test = rd.from_arrow(pa.table({
        "doc_id": pa.array([9], pa.int64()),
        "text": pa.array(["qq rr"]),
    }))
    [row] = nb_score(test, model).take_all()
    fql = lambda r: math.floor(_LM_Q * math.log(r))
    want = fql(1 / 2) + 2 * fql(1 / (3 + 4))  # both classes equal …
    assert row["nb_score_q"] == want
    assert row["nb_pred"] == "a"  # … tie → lexicographically smallest

    # cap to top-2 words (freq desc, word asc): x and z survive; OOV
    # tokens are DROPPED under a cap (feature-selection semantics)
    capped = nb_train(ds, num_partitions=2, max_vocab=2)
    assert capped["vocab"].to_pylist() == ["x", "z"]
    [r2] = nb_score(test, capped).take_all()
    assert r2["nb_score_q"] == fql(1 / 2)  # prior only: both tokens OOV

    with pytest.raises(ValueError, match="max_vocab"):
        nb_train(ds, max_vocab=0)


def test_nb_partitioning_invariance(ray_session):
    from rayraster.textops import nb_score, nb_train

    rng = np.random.default_rng(11)
    words = np.array(["alpha", "beta", "gamma", "delta", "eps"])
    texts = [" ".join(rng.choice(words, rng.integers(1, 12))) for _ in range(80)]
    t = pa.table({
        "doc_id": pa.array(range(80), pa.int64()),
        "lang": pa.array([("x" if i % 3 else "y") for i in range(80)]),
        "text": pa.array(texts),
    })

    def run(parts, np_):
        ds = rd.from_arrow(t).repartition(parts)
        m = nb_train(ds, num_partitions=np_)
        return sorted(
            (r["doc_id"], r["nb_pred"], r["nb_score_q"])
            for r in nb_score(ds, m).take_all()
        )

    assert run(2, 4) == run(7, 16)


def test_flesch_score_matches_duckdb_expression(ray_session):
    import duckdb

    from rayraster.textops import flesch_score

    texts = [
        "The cat sat. It was happy!",
        "no terminal punctuation here at all",
        "",
        "One? Two! Three. Yyy aeiou.",
        None,
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    got = flesch_score(t)["flesch"].to_pylist()
    con = duckdb.connect()
    con.register("d", t)
    want = [r[0] for r in con.sql(r"""
      SELECT 206.835
        - 1.015 * (CAST(GREATEST(length(regexp_extract_all(COALESCE(text, '') , '\S+')), 1) AS DOUBLE)
                   / CAST(GREATEST(length(regexp_extract_all(COALESCE(text, ''), '[.!?]+')), 1) AS DOUBLE))
        - 84.6 * (CAST(length(regexp_extract_all(COALESCE(text, ''), '[aeiouyAEIOUY]+')) AS DOUBLE)
                  / CAST(GREATEST(length(regexp_extract_all(COALESCE(text, ''), '\S+')), 1) AS DOUBLE))
      FROM d ORDER BY doc_id
    """).fetchall()]
    assert got == want  # bit-equal: same RE2 counts, same IEEE tree


def test_rrf_fuse_matches_duckdb_twin(ray_session):
    import duckdb
    import ray.data as rd

    from rayraster.textops import rrf_fuse

    a = pd.DataFrame({"doc_id": [10, 20, 30, 40], "rank": [1, 2, 3, 4]})
    b = pd.DataFrame({"doc_id": [30, 10, 99], "rank": [1, 2, 3]})
    got = (
        rrf_fuse(rd.from_pandas(a), rd.from_pandas(b), k0=60)
        .to_pandas().sort_values("rnk").reset_index(drop=True)
    )
    want = duckdb.sql(
        """WITH f AS (
  SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
         COALESCE(1.0/(60.0 + CAST(a.rank AS DOUBLE)), 0.0)
         + COALESCE(1.0/(60.0 + CAST(b.rank AS DOUBLE)), 0.0) AS score
  FROM a FULL OUTER JOIN b USING (doc_id)
)
SELECT doc_id, score,
       CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
FROM f ORDER BY rnk"""
    ).df()
    assert got.doc_id.tolist() == want.doc_id.tolist()
    assert (got.score.to_numpy() == want.score.to_numpy()).all()
    assert got.rnk.tolist() == want.rnk.tolist()
    # the doc in BOTH lists outranks every single-list doc here
    assert got.doc_id.iloc[0] in (10, 30)
    with pytest.raises(ValueError, match="k0"):
        rrf_fuse(rd.from_pandas(a), rd.from_pandas(b), k0=0)


def test_zipf_stats_exact(ray_session):
    import ray.data as rd

    from rayraster.textops import zipf_stats

    docs = ["a b b c c c", "c d a", "e e e e b"]
    t = pa.table({"text": pa.array(docs)})
    topk, stats = zipf_stats(rd.from_arrow(t).repartition(3), k=2,
                             num_partitions=4)
    # counts: a2 b3 c4 d1 e4 -> rank by (n desc, word): c1 e2 b3 a4 d5
    assert stats == {
        "rank_dot_freq": 1 * 4 + 2 * 4 + 3 * 3 + 4 * 2 + 5 * 1,
        "vocab_size": 5, "hapax": 1, "tokens": 14,
    }
    got = sorted(
        (r.rank, r.word, r.n) for r in topk.to_pandas().itertuples()
    )
    assert got == [(1, "c", 4), (2, "e", 4)]


def test_summarize_textrank_star_corpus_analytic_selection(ray_session):
    """The t11 'summ' oracle arm's planted star corpus: 6 sentences,
    hub h = id % 6 sharing one connector word per leaf, leaves
    disjoint.  The kept set must be exactly {0,1,2} for h < 3 else
    {0,1,h} — hub rank strictly dominant, leaf ties broken by index."""
    from rayraster.textops import summarize_textrank

    ids, texts = [], []
    for i in range(12):
        h = i % 6
        sents = []
        for j in range(6):
            if j == h:
                toks = [f"u{m}" for m in range(6) if m != h] + [f"y{i}."]
            else:
                toks = [f"u{j}", f"x{i}x{j}."]
            sents.append(" ".join(toks))
        ids.append(i)
        texts.append(" ".join(sents))
    t = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    out = summarize_textrank(rd.from_arrow(t), k=3).to_pandas()
    out = out.sort_values("id").reset_index(drop=True)
    for i in range(12):
        h = i % 6
        kept = [0, 1, 2] if h < 3 else [0, 1, h]
        want = []
        for j in kept:
            if j == h:
                want.append(" ".join(
                    [f"u{m}" for m in range(6) if m != h] + [f"y{i}."]))
            else:
                want.append(f"u{j} x{i}x{j}.")
        assert out.loc[i, "summary"] == " ".join(want), i
        assert out.loc[i, "n_sentences"] == 6
        assert out.loc[i, "n_kept"] == 3


def test_semantic_neardup_planted_cone_corpus(ray_session):
    """The d5 'semdedup' oracle arm's planted corpus: 4 orthogonal
    axis cones (amplitude 96, shared jitter <= 22 in dims 4..7) with
    row 0..3 pure anchors.  Pins the analytic claims the twin relies
    on: every intra-cone cosine >= 0.92, every cross-cone cosine
    <= 0.15, min |cos - 0.97| gap > 1e-6, and the engine's pairs equal
    the brute-force intra filter exactly."""
    from rayraster.similarity import semantic_neardup_pairs

    n = 128
    sids = np.arange(n, dtype=np.int64)
    V = np.zeros((n, 8), dtype=np.float64)
    V[sids, sids % 4] = 96
    mm = np.arange(4, dtype=np.int64)
    jit = (sids[:, None] * 31 + mm[None, :] * 17
           + sids[:, None] * mm[None, :] * 7) % 23
    jit[:4] = 0
    V[:, 4:] = jit
    X = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = X @ X.T
    same = (sids[:, None] % 4) == (sids[None, :] % 4)
    iu = np.triu(np.ones((n, n), bool), 1)
    assert S[same & iu].min() >= 0.92
    assert S[~same & iu].max() <= 0.15
    assert np.abs(S[same & iu] - 0.97).min() > 1e-6

    want = sorted(map(tuple, np.argwhere((S >= 0.97) & iu)))
    got = (
        semantic_neardup_pairs(
            rd.from_arrow(pa.table(
                {"vec_id": pa.array(sids), "embedding": pa.array(list(V))}
            )),
            threshold=0.97, n_clusters=4, sample_size=n,
        )
        .to_pandas()
    )
    assert sorted(zip(got.a, got.b)) == want


def test_batch_topk_and_quantized_search_survive_empty_blocks(ray_session):
    """Regression: _BatchTopK / pq_search / sq_search crashed on
    0-row blocks (np.partition kth=-1) and pq_search raised on an
    all-empty codes dataset instead of returning the typed empty
    table."""
    from rayraster.similarity import (
        brute_topk,
        pq_encode,
        pq_search,
        pq_train,
        sq_encode,
        sq_search,
        sq_train,
    )

    rng = np.random.default_rng(5)
    V = rng.integers(0, 256, (40, 8)).astype(np.float64)
    t = pa.table({"vec_id": pa.array(np.arange(40, dtype=np.int64)),
                  "embedding": pa.array(list(V))})
    empty = pa.table({"vec_id": pa.array([], type=pa.int64()),
                      "embedding": pa.array([], type=pa.list_(pa.float64()))})
    ds = rd.from_arrow(empty).union(rd.from_arrow(t))  # one 0-row block
    out = brute_topk(ds, np.arange(2), V[:2], k=5)
    assert out.num_rows == 10

    books = pq_train(rd.from_arrow(t).repartition(2), m=4, n_centroids=16)
    codes = pq_encode(rd.from_arrow(empty), books).union(
        pq_encode(rd.from_arrow(t), books))
    assert pq_search(codes, books, np.arange(2), V[:2], k=5).num_rows == 10
    # all-empty corpus: typed empty result, not ArrowInvalid
    e = pq_search(pq_encode(rd.from_arrow(empty), books), books,
                  np.arange(2), V[:2], k=5)
    assert e.num_rows == 0 and "rank" in e.column_names

    ranges = sq_train(rd.from_arrow(t), normalize=False)
    sq_codes = sq_encode(rd.from_arrow(empty), ranges).union(
        sq_encode(rd.from_arrow(t), ranges))
    assert sq_search(sq_codes, ranges, np.arange(2), V[:2], k=5).num_rows == 10


def test_semantic_neardup_no_self_pairs_on_duplicate_ids(ray_session):
    """Regression: a vec_id appearing on two rows produced (id, id)
    self-pairs from the cluster compare, violating the a < b
    contract."""
    from rayraster.similarity import semantic_neardup_pairs

    V = np.zeros((4, 4)); V[:, 0] = 1.0
    t = pa.table({"vec_id": pa.array([1, 1, 2, 3], type=pa.int64()),
                  "embedding": pa.array(list(V))})
    got = semantic_neardup_pairs(rd.from_arrow(t), threshold=0.9,
                                 n_clusters=1, sample_size=4).to_pandas()
    assert (got.a < got.b).all()
    assert sorted(set(zip(got.a, got.b))) == [(1, 2), (1, 3), (2, 3)]


def test_json_extract_int_exact_above_2_53_with_fallback_rows(ray_session):
    """Regression: a malformed sibling row sent the whole batch's
    already-exact regex hits through a float64 round-trip, silently
    corrupting integers above 2^53."""
    from rayraster.textops import json_extract_int

    big = (1 << 53) + 1
    t = pa.table({"j": pa.array([f'{{"k": {big}}}', "not json",
                                 '{"k": 5, "x": 1}'])})
    out = json_extract_int(t, "j", "k", "v")
    assert out["v"].to_pylist() == [big, None, 5]
