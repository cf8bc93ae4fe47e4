"""Dedup operators: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding near-dup — over constructed corpora with known answers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from rayraster.dedup import (
    char_shingle_hashes,
    embedding_neardup_pairs,
    exact_dedup_keep_ids,
    jaccard,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash64,
    simhash_pairs,
    word_ngram_hashes,
)


def _corpus(n=60, dup_every=3):
    """n base docs; every dup_every-th doc gets an exact copy with
    id + 1000."""
    rng = np.random.default_rng(5)
    words = [f"w{k:03d}" for k in range(400)]
    rows = []
    for i in range(n):
        text = " ".join(rng.choice(words, size=80))
        rows.append({"doc_id": i, "text": text})
        if i % dup_every == 0:
            rows.append({"doc_id": i + 1000, "text": text})
    return pd.DataFrame(rows)


def test_exact_dedup(ray_session):
    df = _corpus()
    keep = exact_dedup_keep_ids(rd.from_pandas(df)).to_pandas()
    # kept = min id per text = exactly the base ids
    assert sorted(keep.doc_id) == sorted(df[df.doc_id < 1000].doc_id)


def test_jaccard_and_signatures():
    a = char_shingle_hashes("the quick brown fox jumps", 5)
    b = char_shingle_hashes("the quick brown fox jumped", 5)
    c = char_shingle_hashes("completely different words", 5)
    assert jaccard(a, a) == 1.0
    assert jaccard(a, b) > 0.6 > jaccard(a, c)
    # minhash similarity approximates jaccard
    sa = minhash_signature(a, 256)
    sb = minhash_signature(b, 256)
    est = (sa == sb).mean()
    assert abs(est - jaccard(a, b)) < 0.15
    # determinism
    assert (minhash_signature(a, 64) == minhash_signature(a, 64)).all()


def test_minhash_lsh_finds_neardups(ray_session):
    df = _corpus(40, dup_every=2)
    # perturb the copies slightly (near-dup, not exact)
    df.loc[df.doc_id >= 1000, "text"] = df.loc[df.doc_id >= 1000, "text"] + " xtra"
    pairs = minhash_lsh_pairs(rd.from_pandas(df), threshold=0.8).to_pandas()
    want = {(i, i + 1000) for i in df[df.doc_id < 1000].doc_id if (df.doc_id == i + 1000).any()}
    got = {(a, b) for a, b in zip(pairs.a, pairs.b)}
    assert got == want
    assert (pairs.jac >= 0.8).all()


def test_simhash_pairs(ray_session):
    df = _corpus(40, dup_every=2)
    pairs = simhash_pairs(rd.from_pandas(df), max_dist=3).to_pandas()
    want = {(i, i + 1000) for i in df[df.doc_id < 1000].doc_id if (df.doc_id == i + 1000).any()}
    got = {(a, b) for a, b in zip(pairs.a, pairs.b)}
    assert want <= got  # exact copies: hamming 0, guaranteed found
    assert (pairs.hamming <= 3).all()


def test_simhash_determinism_and_locality():
    t = "some reasonably long text with many words appearing here"
    assert simhash64(t) == simhash64(t)
    h1 = int(simhash64(t))
    h2 = int(simhash64(t + " tail"))
    assert bin(h1 ^ h2).count("1") < 20  # similar docs → close hashes


def test_ngram_jaccard_pairs(ray_session):
    df = _corpus(30, dup_every=2)
    df.loc[df.doc_id >= 1000, "text"] = df.loc[df.doc_id >= 1000, "text"] + " zz"
    pairs = ngram_jaccard_pairs(rd.from_pandas(df), threshold=0.5, n=3).to_pandas()
    want = {(i, i + 1000) for i in df[df.doc_id < 1000].doc_id if (df.doc_id == i + 1000).any()}
    got = {(a, b) for a, b in zip(pairs.a, pairs.b)}
    assert got == want


def test_embedding_neardup(ray_session):
    rng = np.random.default_rng(9)
    base = rng.standard_normal((50, 64)).astype(np.float32)
    rows = [{"vec_id": i, "embedding": base[i]} for i in range(50)]
    rows += [{"vec_id": i + 1000, "embedding": base[i]} for i in range(0, 50, 5)]
    ds = rd.from_pandas(pd.DataFrame(rows))
    pairs = embedding_neardup_pairs(ds, threshold=0.99, dim=64).to_pandas()
    want = {(i, i + 1000) for i in range(0, 50, 5)}
    got = {(a, b) for a, b in zip(pairs.a, pairs.b)}
    assert got == want
    assert (pairs.cos >= 0.99).all()


def test_word_ngram_short_texts():
    assert len(word_ngram_hashes("", 3)) == 0
    assert len(word_ngram_hashes("one two", 3)) == 1


def test_connected_components_chains(ray_session):
    """Chains and separate components: min-label propagation converges
    to the smallest node id per component."""
    from rayraster.dedup import connected_components, dedup_keep_from_clusters

    # components: {1,2,3,4} (chain), {10,11}, {20,21,22} (star)
    pairs = pd.DataFrame(
        {"a": [1, 2, 3, 10, 20, 20], "b": [2, 3, 4, 11, 21, 22]}
    )
    out = connected_components(rd.from_pandas(pairs)).to_pandas()
    got = dict(zip(out.node, out.cluster))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}
    keep = dedup_keep_from_clusters(
        connected_components(rd.from_pandas(pairs))
    ).to_pandas()
    assert sorted(keep.doc_id) == [1, 10, 20]


def test_connected_components_distributed_matches_driver(ray_session):
    from rayraster.dedup import (
        connected_components_distributed,
        dedup_keep_from_clusters_ds,
    )

    pairs = pd.DataFrame({"a": [1, 2, 3, 10, 20, 20], "b": [2, 3, 4, 11, 21, 22]})
    out = connected_components_distributed(rd.from_pandas(pairs)).to_pandas()
    got = dict(zip(out.node, out.cluster))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}
    keep = dedup_keep_from_clusters_ds(
        connected_components_distributed(rd.from_pandas(pairs))
    ).to_pandas()
    assert sorted(keep.doc_id) == [1, 10, 20]


def test_connected_components_distributed_star_and_chain(ray_session):
    """The scale shapes the driver-side version can't hold: a 10^6-edge
    star (hub key skew) and a 4096-node chain (diameter beyond any
    fixed round budget without pointer jumping) — labels stay in a
    Dataset; the only per-round driver value is one checksum."""
    from rayraster.dedup import connected_components_distributed

    n_star = 1_000_000
    star = pd.DataFrame(
        {
            "a": np.full(n_star, 20_000_000, dtype=np.int64),
            "b": np.arange(1, n_star + 1, dtype=np.int64) + 20_000_000,
        }
    )
    lab = connected_components_distributed(rd.from_pandas(star)).to_pandas()
    assert (lab.cluster == 20_000_000).all() and len(lab) == n_star + 1

    n = 4096
    chain = pd.DataFrame(
        {
            "a": np.arange(n - 1, dtype=np.int64) + 10_000_000,
            "b": np.arange(n - 1, dtype=np.int64) + 10_000_001,
        }
    )
    lab = connected_components_distributed(rd.from_pandas(chain)).to_pandas()
    assert (lab.cluster == 10_000_000).all() and len(lab) == n


def test_connected_components_long_chain_converges(ray_session):
    """Driver-side CC on a chain longer than the old 20-round budget:
    pointer jumping must converge it (and non-convergence now raises
    instead of silently returning partial clusters)."""
    from rayraster.dedup import connected_components

    n = 300  # diameter 300 ≫ 20 rounds of plain propagation
    pairs = pd.DataFrame({"a": np.arange(n - 1), "b": np.arange(1, n)})
    out = connected_components(rd.from_pandas(pairs)).to_pandas()
    assert (out.cluster == 0).all() and len(out) == n
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(rd.from_pandas(pairs), max_rounds=2)


def test_connected_components_empty_pairs(ray_session):
    from rayraster.dedup import connected_components

    out = connected_components(
        rd.from_pandas(pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                     "b": pd.Series([], dtype="int64")}))
    )
    assert out.num_rows == 0


def _collect_pairs(ds):
    """Collect a pairs Dataset WITHOUT Dataset.to_pandas (which the
    no-materialization guard below disables)."""
    import pyarrow as pa
    import ray as _ray

    t = pa.concat_tables([_ray.get(r) for r in ds.to_arrow_refs()])
    return sorted(zip(t["a"].to_pylist(), t["b"].to_pylist()))


def test_partitioned_verify_matches_broadcast(ray_session):
    """The 10^12-row verify path (two-hop bucket join) must produce
    bit-identical pairs to the broadcast path, for every near-dup op."""
    df = _corpus(40, dup_every=2)
    df.loc[df.doc_id >= 1000, "text"] = df.loc[df.doc_id >= 1000, "text"] + " xtra"
    for fn in (
        lambda m: minhash_lsh_pairs(rd.from_pandas(df), threshold=0.8, verify_mode=m),
        lambda m: simhash_pairs(rd.from_pandas(df), max_dist=16, verify_mode=m),
        lambda m: ngram_jaccard_pairs(rd.from_pandas(df), threshold=0.5, n=3, verify_mode=m),
    ):
        assert _collect_pairs(fn("broadcast")) == _collect_pairs(fn("partitioned"))

    rng = np.random.default_rng(9)
    base = rng.standard_normal((50, 64)).astype(np.float32)
    rows = [{"vec_id": i, "embedding": base[i]} for i in range(50)]
    rows += [{"vec_id": i + 1000, "embedding": base[i]} for i in range(0, 50, 5)]
    eds = pd.DataFrame(rows)
    b = _collect_pairs(
        embedding_neardup_pairs(rd.from_pandas(eds), threshold=0.99, verify_mode="broadcast")
    )
    p = _collect_pairs(
        embedding_neardup_pairs(rd.from_pandas(eds), threshold=0.99, verify_mode="partitioned")
    )
    assert b == p and len(b) == 10


def test_partitioned_verify_never_materializes_on_driver(ray_session, monkeypatch):
    """Hard guard for the scale property: the partitioned path must not
    call Dataset.to_pandas (driver materialization) anywhere."""
    from ray.data import Dataset

    def _boom(self, *a, **k):
        raise AssertionError("driver materialization (to_pandas) in partitioned path")

    monkeypatch.setattr(Dataset, "to_pandas", _boom)
    df = _corpus(20, dup_every=2)
    got = _collect_pairs(
        minhash_lsh_pairs(rd.from_pandas(df), threshold=0.8, verify_mode="partitioned")
    )
    want = sorted(
        (i, i + 1000) for i in df[df.doc_id < 1000].doc_id if (df.doc_id == i + 1000).any()
    )
    assert got == want


def test_verify_mode_auto_picks_partitioned_above_threshold(ray_session, monkeypatch):
    """auto must flip to the partitioned path once the corpus exceeds
    broadcast_threshold (proved by forbidding to_pandas)."""
    from ray.data import Dataset

    def _boom(self, *a, **k):
        raise AssertionError("auto chose broadcast above the threshold")

    monkeypatch.setattr(Dataset, "to_pandas", _boom)
    df = _corpus(20, dup_every=2)
    got = _collect_pairs(
        minhash_lsh_pairs(rd.from_pandas(df), threshold=0.8, broadcast_threshold=10)
    )
    assert len(got) > 0


def test_dedup_filter_chain_never_materializes_on_driver(ray_session, monkeypatch):
    """The END-TO-END dedup filter (exact-keep semi bucket-join →
    near-dup pairs → distributed CC → loser anti bucket-join) must
    keep every list distributed: on a real crawl both the keep list
    and the loser list are O(corpus).  to_pandas is forbidden for the
    whole chain (the guard the example/CLI glue is held to)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray as _ray
    from ray.data import Dataset

    from rayraster.dedup import connected_components_distributed
    from rayraster.join import bucket_join

    df = _corpus(30, dup_every=3)  # exact copies at id+1000 for i%3==0
    extra = df[(df.doc_id < 1000) & (df.doc_id % 5 == 0)].copy()
    extra["doc_id"] += 5000
    extra["text"] = extra["text"] + " zz9y"  # near (not exact) dups
    df = pd.concat([df, extra], ignore_index=True)

    def _boom(self, *a, **k):
        raise AssertionError("driver materialization (to_pandas) in dedup filter chain")

    monkeypatch.setattr(Dataset, "to_pandas", _boom)

    docs = rd.from_pandas(df).materialize()
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    keep_exact = exact_dedup_keep_ids(docs)
    docs = bucket_join(
        docs, keep_exact, "doc_id", "doc_id", join_type="semi",
        left_schema=schema, right_schema=pa.schema([("doc_id", pa.int64())]),
    ).materialize()
    pairs = minhash_lsh_pairs(
        docs, threshold=0.8, verify_mode="partitioned"
    ).select_columns(["a", "b"])
    clusters = connected_components_distributed(pairs)
    losers = clusters.map_batches(
        lambda t: t.filter(pc.not_equal(t["node"], t["cluster"])).select(["node"]),
        batch_format="pyarrow",
    )
    final = bucket_join(
        docs, losers, "doc_id", "node", join_type="anti",
        left_schema=schema, right_schema=pa.schema([("node", pa.int64())]),
    )
    t = pa.concat_tables([_ray.get(r) for r in final.to_arrow_refs()])
    # exact dedup removes the +1000 copies; near-dup CC removes the
    # +5000 perturbed copies (originals win as min-id cluster reps)
    assert sorted(t["doc_id"].to_pylist()) == sorted(df[df.doc_id < 1000].doc_id)


def test_synth_texts_unique_at_scale():
    from rayraster.synth import make_pages_batch

    t = make_pages_batch(np.arange(30000))
    texts = t["text"].to_pylist()
    assert len(set(texts)) == len(texts)  # no accidental duplicates


# ---------------------------------------------------------------------------
# paragraph-level dedup + reassembly
# ---------------------------------------------------------------------------


def _brute_paragraph_dedup(docs: dict[int, str], split="\n", block_words=None):
    """Reference implementation: global keep-first over (doc, position)."""
    units = []  # (doc_id, uidx, unit)
    for did in sorted(docs):
        txt = docs[did] or ""
        if block_words is None:
            parts = txt.split(split)
        else:
            import re

            words = re.split(r"\s+", txt)
            parts = [
                " ".join(words[i : i + block_words])
                for i in range(0, max(len(words), 1), block_words)
            ]
        for i, p in enumerate(parts):
            units.append((did, i, p))
    seen = set()
    kept = []
    for did, i, p in sorted(units):
        if p not in seen:
            seen.add(p)
            kept.append((did, i, p))
    sep = " " if block_words is not None else split
    out = {}
    for did, i, p in kept:
        out.setdefault(did, []).append(p)
    return {did: sep.join(ps) for did, ps in out.items()}


def test_paragraph_dedup_matches_brute(ray_session):
    from rayraster.dedup import paragraph_dedup

    rng = np.random.default_rng(11)
    pool = [f"para {i} " + "w " * int(rng.integers(1, 6)) for i in range(40)]
    docs = {
        did: "\n".join(pool[j] for j in rng.integers(0, 40, rng.integers(1, 9)))
        for did in range(120)
    }
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    got = dict(
        paragraph_dedup(rd.from_pandas(df).repartition(7), num_partitions=8)
        .to_pandas()[["doc_id", "text"]].itertuples(index=False, name=None)
    )
    assert got == _brute_paragraph_dedup(docs)


def test_paragraph_dedup_block_mode_matches_brute(ray_session):
    from rayraster.dedup import paragraph_dedup

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(12)]
    docs = {
        did: " ".join(vocab[j] for j in rng.integers(0, 12, rng.integers(3, 40)))
        for did in range(80)
    }
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    got = dict(
        paragraph_dedup(
            rd.from_pandas(df).repartition(5), block_words=4, num_partitions=8
        )
        .to_pandas()[["doc_id", "text"]].itertuples(index=False, name=None)
    )
    assert got == _brute_paragraph_dedup(docs, block_words=4)


def test_paragraph_dedup_keep_first_and_within_doc(ray_session):
    """Keep-first is lexicographic (doc_id, position) over the CORPUS,
    and a paragraph repeated WITHIN one document also dedups; a doc
    whose every paragraph was seen earlier disappears entirely."""
    from rayraster.dedup import paragraph_dedup

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["a\nb\na", "b\nc", "a\nb"],
        }
    )
    got = (
        paragraph_dedup(rd.from_pandas(df), num_partitions=4)
        .to_pandas().sort_values("doc_id")
    )
    assert dict(zip(got.doc_id, got.text)) == {1: "a\nb", 2: "c"}


def test_paragraph_dedup_partition_invariant(ray_session):
    """Identical output at different partition counts and chunkings —
    nothing depends on block boundaries or parallelism (the property
    that makes per-partition checkpointing sound)."""
    from rayraster.dedup import paragraph_dedup

    rng = np.random.default_rng(3)
    pool = [f"p{i}" for i in range(10)]
    df = pd.DataFrame(
        {
            "doc_id": np.arange(60),
            "text": [
                "\n".join(pool[j] for j in rng.integers(0, 10, 4)) for _ in range(60)
            ],
        }
    )
    outs = []
    for parts, chunks in ((4, 1), (16, 9)):
        outs.append(
            paragraph_dedup(
                rd.from_pandas(df).repartition(chunks), num_partitions=parts
            )
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_paragraph_dedup_null_and_empty_text(ray_session):
    """NULL ≡ '' (repo convention): both produce ONE empty unit; the
    first such doc keeps text '', later ones vanish."""
    from rayraster.dedup import paragraph_dedup

    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": [None, "", "real"]})
    got = (
        paragraph_dedup(rd.from_pandas(df), num_partitions=4)
        .to_pandas().sort_values("doc_id")
    )
    assert dict(zip(got.doc_id, got.text)) == {1: "", 3: "real"}


def test_leakage_safe_split_keeps_clusters_together(ray_session):
    from rayraster.dedup import connected_components_distributed, leakage_safe_split

    # pairs chain 0-1-2, pair 10-11; singletons elsewhere
    pairs = rd.from_pandas(
        pd.DataFrame({"a": [0, 1, 10], "b": [1, 2, 11]})
    )
    clusters = connected_components_distributed(pairs, num_partitions=8)
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64),
                      "text": [f"t{i}" for i in range(40)]})
    )
    out = (
        leakage_safe_split(docs, clusters, val_num=300000, num_partitions=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(out) == 40
    # cluster members share the split AND the cluster label
    g1 = out[out.doc_id.isin([0, 1, 2])]
    assert g1.cluster.nunique() == 1 and g1.split.nunique() == 1
    g2 = out[out.doc_id.isin([10, 11])]
    assert g2.cluster.nunique() == 1 and g2.split.nunique() == 1
    # singletons: cluster = own id
    single = out[~out.doc_id.isin([0, 1, 2, 10, 11])]
    assert (single.cluster == single.doc_id).all()
    # split is the documented pure function of the cluster id
    h = (out.cluster.to_numpy() * 2654435761) % 1000003
    assert (out.split.to_numpy() == np.where(h < 300000, "val", "train")).all()
    # both sides populated at this rate
    assert set(out.split) == {"train", "val"}


def test_leakage_safe_split_partition_invariant_and_validations(ray_session):
    import pytest

    from rayraster.dedup import leakage_safe_split

    clusters = rd.from_pandas(pd.DataFrame({"node": [1, 2], "cluster": [1, 1]}))
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(20, dtype=np.int64)})
    )
    a = leakage_safe_split(docs, clusters, num_partitions=4).to_pandas()
    b = leakage_safe_split(
        docs.repartition(5), clusters, num_partitions=16
    ).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True),
    )
    bad = rd.from_pandas(pd.DataFrame({"doc_id": [1], "split": ["x"]}))
    with pytest.raises(ValueError, match="already carry"):
        leakage_safe_split(bad, clusters)


def _cdc_brute(text: str, bits: int, mn: int, mx: int):
    import hashlib

    from rayraster.dedup import gear_table

    G = gear_table()
    mask = (1 << bits) - 1
    b = text.encode()
    h = 0
    cuts = []
    last = 0
    for i, byte in enumerate(b):
        h = ((h << 1) + int(G[byte])) & 0xFFFFFFFFFFFFFFFF
        if (h & mask) == 0:
            pos = i + 1
            while pos - last > mx:
                cuts.append(last + mx)
                last += mx
            if pos - last >= mn:
                cuts.append(pos)
                last = pos
    e = len(b)
    while e - last > mx:
        cuts.append(last + mx)
        last += mx
    if last < e:
        cuts.append(e)
    out = []
    prev = 0
    for ci, c in enumerate(cuts):
        out.append((ci, c - prev, hashlib.md5(b[prev:c]).hexdigest()))
        prev = c
    return out


def test_cdc_chunks_matches_brute(ray_session):
    from rayraster.dedup import cdc_chunks

    rng = np.random.default_rng(5)
    texts = ["".join(chr(c) for c in rng.integers(32, 127, int(L)))
             for L in rng.integers(0, 400, 50)]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    for bits, mn, mx in ((4, 1, 10**9), (4, 8, 64), (6, 1, 100)):
        got = {}
        for r in cdc_chunks(rd.from_arrow(t).repartition(5),
                            min_size=mn, avg_bits=bits,
                            max_size=mx).take_all():
            got.setdefault(r["doc_id"], []).append(
                (r["chunk_idx"], r["chunk_len"], r["chunk_md5"]))
        for d in got:
            got[d].sort()
        exp = {i: _cdc_brute(texts[i], bits, mn, mx)
               for i in range(len(texts)) if texts[i]}
        assert got == exp, (bits, mn, mx)


def test_cdc_chunks_edit_resilience_and_validation(ray_session):
    """The CDC property fixed windows lack: boundaries re-synchronize
    after an insertion, so all chunks off the edit site still match."""
    from rayraster.dedup import cdc_chunks

    rng = np.random.default_rng(9)
    base = "".join(chr(c) for c in rng.integers(97, 123, 3000))
    edited = base[:100] + "XYZXYZ" + base[100:]
    t = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array([base, edited]),
    }))
    rows = cdc_chunks(t, min_size=16, avg_bits=6, max_size=1024).take_all()
    a = {r["chunk_md5"] for r in rows if r["doc_id"] == 0}
    b = {r["chunk_md5"] for r in rows if r["doc_id"] == 1}
    assert len(a & b) / max(len(a), 1) > 0.5

    with pytest.raises(ValueError, match="avg_bits"):
        cdc_chunks(t, avg_bits=0)
    with pytest.raises(ValueError, match="min_size"):
        cdc_chunks(t, min_size=0)
    with pytest.raises(ValueError, match="max_size"):
        cdc_chunks(t, min_size=64, max_size=32)


def test_cdc_gate_plant_is_boundary_clean():
    """Static pin of the d1 'cdc' plant: with avg_bits=6 the boundary
    condition is a pure function of the LAST 6 BYTES, the magic forces
    a cut at its final byte from any context, and every pool segment
    (with its surrounding magics) contains no other cut — so the
    oracle's analytic chunk enumeration is exact."""
    import __ray_entry__ as e
    from rayraster.dedup import gear_table

    G = gear_table()
    magic = e._CDC_MAGIC.encode()
    assert len(magic) == 6

    def hv(window: bytes) -> int:
        s = 0
        for byte in window[-6:]:
            s = ((s << 1) + int(G[byte])) & 0xFFFFFFFFFFFFFFFF
        return s & 63

    # magic cuts at its end from arbitrary contexts, not before
    rng = np.random.default_rng(3)
    for _ in range(50):
        ctx = bytes(rng.integers(97, 123, 5).tolist())
        assert hv(ctx + magic) == 0
    for i in range(5):
        assert hv(magic[: i + 1]) != 0  # doc-initial partial windows

    for seg in e._CDC_POOL:
        doc = magic + seg.encode() + magic
        cuts = [i + 1 for i in range(len(doc))
                if hv(doc[: i + 1] if i + 1 < 6 else doc[i - 5: i + 1]) == 0]
        assert cuts == [6, len(doc)], seg


def _synth_hex(i: int) -> str:
    r = np.random.default_rng(i * 977 + 13)
    return " ".join(format(x, "08x") for x in r.integers(0, 2**32, 40))


def test_minhash_cross_pairs_and_fuzzy_decontaminate(ray_session):
    """Cross-corpus near-dup join: only the planted (train, bench)
    copies match, in BOTH verify shapes; fuzzy_decontaminate drops
    exactly the contaminated train docs via the anti bucket-join."""
    from rayraster.dedup import fuzzy_decontaminate, minhash_lsh_pairs_cross

    train_texts = [_synth_hex(i) for i in range(150)]
    bench_ids = [5, 50, 120]
    bench_texts = [train_texts[i] + " qz9xqz9x" for i in bench_ids] + [
        _synth_hex(10_000 + j) for j in range(3)
    ]
    train = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(150), pa.int64()),
        "text": pa.array(train_texts),
    })).repartition(4)
    bench = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array(bench_texts),
    }))

    for vm in ("broadcast", "partitioned"):
        pairs = sorted(
            (r["left_id"], r["right_id"])
            for r in minhash_lsh_pairs_cross(
                train, bench, threshold=0.8, verify_mode=vm
            ).take_all()
        )
        assert pairs == [(5, 0), (50, 1), (120, 2)], vm

    kept = sorted(
        r["doc_id"]
        for r in fuzzy_decontaminate(train, bench, threshold=0.8)
        .select_columns(["doc_id"]).take_all()
    )
    assert kept == [i for i in range(150) if i not in bench_ids]

    bad = rd.from_arrow(pa.table({
        "doc_id": pa.array([-1], pa.int64()), "text": pa.array(["x"]),
    }))
    with pytest.raises(Exception, match="2\\^60"):
        minhash_lsh_pairs_cross(bad, bench).take_all()


def _lev_brute(a: str, b: str) -> int:
    a, b = a.encode(), b.encode()
    prev = list(range(len(a) + 1))
    for j, cb in enumerate(b, 1):
        cur = [j] + [0] * len(a)
        for i, ca in enumerate(a, 1):
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + (ca != cb))
        prev = cur
    return prev[len(a)]


def test_levenshtein_batch_matches_brute():
    import string

    from rayraster.dedup import levenshtein_batch

    rng = np.random.default_rng(3)
    alpha = list(string.ascii_lowercase + " é")
    pairs = []
    for _ in range(120):
        n1, n2 = rng.integers(0, 60, 2)
        pairs.append((
            "".join(rng.choice(alpha) for _ in range(n1)),
            "".join(rng.choice(alpha) for _ in range(n2)),
        ))
    pairs += [("", ""), ("abc", ""), ("", "xyz"), ("same", "same")]
    got = levenshtein_batch([p[0] for p in pairs], [p[1] for p in pairs],
                            chunk=37)
    assert got.tolist() == [_lev_brute(a, b) for a, b in pairs]


def test_minhash_edit_pairs_planted(ray_session):
    """MinHash candidates + edit verify return exactly the planted
    suffix-perturbed copies (the d2 corpus construction): planted
    edit similarity ≈ 0.976, false candidates ≈ 0."""
    import __ray_entry__ as e
    from rayraster.dedup import minhash_edit_pairs

    ids = np.arange(150, dtype=np.int64)
    texts = e._synth_neardup_text(ids)
    all_ids = list(ids) + [int(i) + 1000 for i in ids]
    all_texts = texts + [t + " qz9xqz9x" for t in texts]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(all_ids, pa.int64()),
        "text": pa.array(all_texts),
    })).repartition(4)
    out = sorted(
        (r["a"], r["b"], round(r["edit_sim"], 4))
        for r in minhash_edit_pairs(ds, threshold=0.95).take_all()
    )
    assert [(a, b) for a, b, _ in out] == [(int(i), int(i) + 1000) for i in ids]
    assert all(s > 0.97 for _, _, s in out)


# ---------------------------------------------------------------------------
# exact set-similarity self-join (AllPairs / PPJoin prefix filtering)
# ---------------------------------------------------------------------------


def _brute_word_jaccard_pairs(df, threshold):
    from rayraster.dedup import jaccard, word_ngram_hashes

    sets = {r.doc_id: word_ngram_hashes(r.text or "", 1) for r in df.itertuples()}
    ids = sorted(sets)
    out = []
    for i, a in enumerate(ids):
        if len(sets[a]) == 0:
            continue
        for b in ids[i + 1:]:
            if len(sets[b]) == 0:
                continue
            j = jaccard(sets[a], sets[b])
            if j >= threshold:
                out.append((a, b, j))
    return sorted(out)


def _setsim_corpus(n=80):
    """Word sets drawn from a SMALL pool so many pairs sit near the
    threshold (overlapping, not planted) — the adversarial case for a
    prefix filter."""
    rng = np.random.default_rng(11)
    pool = [f"t{k:02d}" for k in range(40)]
    rows = []
    for i in range(n):
        k = int(rng.integers(5, 25))
        words = list(rng.choice(pool, size=k, replace=False))
        rows.append({"doc_id": i, "text": " ".join(words)})
        if i % 4 == 0:  # a near-dup twin: drop one word
            rows.append({"doc_id": i + 5000, "text": " ".join(words[:-1] or words)})
    return pd.DataFrame(rows)


@pytest.mark.parametrize("mode", ["broadcast", "partitioned"])
def test_set_similarity_pairs_matches_brute(ray_session, mode):
    from rayraster.dedup import set_similarity_pairs

    df = _setsim_corpus()
    for tau in (0.7, 0.9):
        got = set_similarity_pairs(
            rd.from_pandas(df).repartition(5), threshold=tau,
            verify_mode=mode, corpus_count=len(df),
        ).to_pandas()
        got_t = sorted(zip(got.a, got.b, got.jac))
        want = _brute_word_jaccard_pairs(df, tau)
        assert [(a, b) for a, b, _ in got_t] == [(a, b) for a, b, _ in want]
        assert np.allclose([j for *_, j in got_t], [j for *_, j in want])
        # bit-exact jac (both are inter/union IEEE divisions)
        assert [j for *_, j in got_t] == [j for *_, j in want]


def test_set_similarity_exact_duplicates_and_tau_one(ray_session):
    from rayraster.dedup import set_similarity_pairs

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["x y z", "x y z", "z y x q", "totally different words"],
        }
    )
    got = set_similarity_pairs(
        rd.from_pandas(df), threshold=1.0, corpus_count=4
    ).to_pandas()
    assert sorted(zip(got.a, got.b)) == [(1, 2)]
    # tau=1.0 prefix length is exactly 1 token — the rarest one


def test_set_similarity_empty_docs_excluded_and_validation(ray_session):
    from rayraster.dedup import set_similarity_pairs

    df = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["", None, "a b c"]}
    )
    got = set_similarity_pairs(
        rd.from_pandas(df), threshold=0.5, corpus_count=3
    ).to_pandas()
    assert len(got) == 0  # empty-token docs never join
    with pytest.raises(ValueError, match="threshold"):
        set_similarity_pairs(rd.from_pandas(df), threshold=0.0)


def test_set_similarity_partition_invariance(ray_session):
    from rayraster.dedup import set_similarity_pairs

    df = _setsim_corpus(40)
    outs = []
    for parts in (1, 7):
        got = set_similarity_pairs(
            rd.from_pandas(df).repartition(parts), threshold=0.8,
            corpus_count=len(df), num_buckets=16,
        ).to_pandas()
        outs.append(sorted(zip(got.a, got.b, got.jac)))
    assert outs[0] == outs[1]


def test_set_similarity_hot_token_guard(ray_session):
    from rayraster.dedup import set_similarity_pairs

    # every doc is the same single token: the prefix IS the hot token
    df = pd.DataFrame({"doc_id": range(30), "text": ["same"] * 30})
    with pytest.raises(ValueError, match="max_token_group"):
        set_similarity_pairs(
            rd.from_pandas(df), threshold=0.9, corpus_count=30,
            max_token_group=10,
        ).to_pandas()


def test_set_similarity_cross_matches_brute(ray_session):
    from rayraster.dedup import jaccard, set_similarity_pairs_cross, word_ngram_hashes

    rng = np.random.default_rng(17)
    pool = [f"c{k:02d}" for k in range(30)]
    L, R = [], []
    for i in range(40):
        k = int(rng.integers(6, 18))
        words = list(rng.choice(pool, size=k, replace=False))
        L.append({"doc_id": i, "text": " ".join(words)})
        if i % 3 == 0:  # near-copy crosses the corpora
            R.append({"doc_id": i, "text": " ".join(words[:-1] or words)})
        R.append({"doc_id": 500 + i,
                  "text": " ".join(rng.choice(pool, size=k, replace=False))})
    ldf, rdf = pd.DataFrame(L), pd.DataFrame(R)
    tau = 0.75
    got = set_similarity_pairs_cross(
        rd.from_pandas(ldf), rd.from_pandas(rdf), threshold=tau,
        left_count=len(ldf), right_count=len(rdf),
    ).to_pandas()
    lsets = {r.doc_id: word_ngram_hashes(r.text, 1) for r in ldf.itertuples()}
    rsets = {r.doc_id: word_ngram_hashes(r.text, 1) for r in rdf.itertuples()}
    want = sorted(
        (a, b)
        for a, sa in lsets.items() for b, sb in rsets.items()
        if len(sa) and len(sb) and jaccard(sa, sb) >= tau
    )
    assert sorted(zip(got.left_id, got.right_id)) == want
    assert len(want) > 0  # the corpus actually exercises cross pairs


def test_set_similarity_cross_id_validation(ray_session):
    from rayraster.dedup import set_similarity_pairs_cross

    bad = pd.DataFrame({"doc_id": [1 << 61], "text": ["a b"]})
    ok = pd.DataFrame({"doc_id": [1], "text": ["a b"]})
    with pytest.raises(Exception, match="2\\^60"):
        set_similarity_pairs_cross(
            rd.from_pandas(bad), rd.from_pandas(ok),
            left_count=1, right_count=1,
        ).to_pandas()


def test_hamming_broadcast_verify_handles_sign_bit(ray_session):
    """Regression: the broadcast Hamming verifier used int.bit_count()
    on a SIGNED xor, which popcounts the absolute value — wrong
    whenever bit 63 differs.  Signatures differing only in bits
    {63, 0} are TRUE distance 2 and must be kept; signatures with the
    whole top band flipped are TRUE distance 16 and must be dropped —
    on BOTH verify paths."""
    import pandas as pd

    from rayraster.dedup import hamming_neardup_pairs

    base = np.uint64(0x1234ABCD)
    near = (base ^ np.uint64(1) ^ np.uint64(1 << 63)).astype(np.int64)  # bits {0, 63}
    far = (base ^ np.uint64(0xFFFF000000000000)).astype(np.int64)  # top band
    base = base.astype(np.int64)
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "phash": np.array([base, near, far], dtype=np.int64)})
    for mode in ("broadcast", "partitioned"):
        got = hamming_neardup_pairs(
            rd.from_pandas(df).repartition(2), "phash", "doc_id",
            max_dist=4, n_bands=8, verify_mode=mode,
        ).to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        assert list(zip(got.a, got.b)) == [(1, 2)], mode
        assert got.hamming.tolist() == [2], mode


def test_leakage_safe_split_preserves_ids_above_2_53(ray_session):
    """Regression: the split's cluster coalesce round-tripped int64
    through float64 (null-promotion), corrupting ids >= 2^53.  A
    snowflake-scale id must keep its exact value in the cluster
    column on both the joined and the singleton path."""
    import pandas as pd

    from rayraster.dedup import leakage_safe_split

    big = (1 << 60) + 1
    docs = rd.from_arrow(pa.table(
        {"doc_id": pa.array([big, 7], type=pa.int64()),
         "text": pa.array(["a", "b"])}))
    clusters = rd.from_arrow(pa.table(
        {"node": pa.array([7], type=pa.int64()),
         "cluster": pa.array([big], type=pa.int64())}))
    got = leakage_safe_split(docs, clusters, num_partitions=4).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    # id 7 is clustered under the big id; the big doc is a singleton
    assert got.loc[0, "cluster"] == big          # joined path, exact
    assert got.loc[1, "cluster"] == big          # singleton path, exact


def test_minhash_signature_blocked_equals_unblocked():
    """The 64k-block running-min form must equal the one-shot outer
    product bit for bit (min is associative)."""
    from rayraster.dedup import _MIX, _perm_salts, minhash_signature

    rng = np.random.default_rng(3)
    sh = rng.integers(0, 2**63, 200_000, dtype=np.int64).astype(np.uint64)
    got = minhash_signature(sh, 16)
    salts = _perm_salts(16)
    with np.errstate(over="ignore"):
        want = ((sh[:, None] ^ salts[None, :]) * _MIX).min(axis=0)
    assert (got == want).all()
