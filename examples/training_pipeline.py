"""End-to-end training-data pipeline over a Common-Crawl-style corpus.

Composes the engine's operator families the way a 100-TB preprocessing
job would, all streaming Ray Data:

  synth pages → extract (byte-invariant) → text features →
  column profile (map-only ingest audit) → canonical-url ids (lowercased host, sorted params — the crawl dedup
  key) → data-driven quality gate (exact distributed 25th percentile
  — no magic constant, no shuffle) → exact dedup → cross-snapshot
  filter (Bloom prefilter + exact anti-join finish on the hits only)
  → MinHash near-dup dedup (LSH → verified pairs [partitioned verify
  above the broadcast threshold] → DISTRIBUTED connected components
  → anti-join drops non-representatives) → BPE token budget
  (pre-tokens AND a trained merge table applied closed-form) →
  context-window chunking + vocabulary top-k → link-authority prior
  (site-hub graph → fixed-point distributed PageRank over a persisted
  edge layout) → weighted eval holdout
  (priority sampling) → url geocode → square rasterize (density +
  mean quality per tile) → pixel parquet + decorated PNG heatmap +
  per-stage summary JSON.

Run:  PYTHONPATH=. python examples/training_pipeline.py [--rows 200000]
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time


def main(rows: int = 100_000, out_dir: str | None = None, num_cpus: int | None = None):
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from rayraster.agg import exact_quantiles
    from rayraster.dedup import (
        connected_components_distributed,
        exact_dedup_keep_ids,
        minhash_lsh_pairs,
    )
    from rayraster.extract import ExtractStage
    from rayraster.grid import GridSpec
    from rayraster.join import bucket_join
    from rayraster.pipelines import add_geocode_url
    from rayraster.rasterize import rasterize_features
    from rayraster.synth import pages_dataset
    from rayraster.textops import quality_score

    out_dir = out_dir or tempfile.mkdtemp(prefix="rayraster_demo_")
    summary: dict = {"rows_in": rows}
    t0 = time.perf_counter()

    # 1. corpus (synthetic; swap for read_parquet of real WARC-derived data)
    pages = pages_dataset(rows)

    # inject exact duplicates (every 10th page repeated with a new url)
    def dup_some(t: pa.Table) -> pa.Table:
        keep = t.filter(pa.array(np.arange(t.num_rows) % 10 == 0))
        bumped = keep.set_column(
            keep.schema.get_field_index("url"),
            "url",
            pc.binary_join_element_wise(keep["url"], "?copy", ""),
        )
        return pa.concat_tables([t, bumped])

    pages = pages.map_batches(dup_some, batch_format="pyarrow")

    # 2. extract + features + quality
    docs = pages.map_batches(
        ExtractStage(verify_against="text"), batch_format="pyarrow"
    )
    docs = docs.map_batches(quality_score, batch_format="pyarrow")
    docs = docs.map_batches(
        lambda t: t.select(["url", "text", "quality"]), batch_format="pyarrow"
    )

    # ids for dedup — deterministic from the CANONICAL url (lowercase
    # host, default port stripped, params sorted, fragment dropped):
    # on a real crawl the same page arrives under many url spellings,
    # and the canonical form is what the id/dedup key must hash
    def add_id(t: pa.Table) -> pa.Table:
        from rayraster.geo import fnv1a64
        from rayraster.textops import canonicalize_url

        canon = canonicalize_url(t)["url_canon"]
        ids = fnv1a64(canon).view(np.int64)
        return t.append_column("doc_id", pa.array(ids))

    docs = docs.map_batches(add_id, batch_format="pyarrow").materialize()

    # ingest audit: the profile every real pipeline runs first — one
    # map-only pass over all columns (+ approx-HLL distinct, no
    # shuffle); catches schema drift/null storms before any compute
    from rayraster.agg import profile_table

    prof = profile_table(docs, ["doc_id", "url", "quality"],
                         distinct_mode="approx")
    summary["profile"] = {
        r["column"]: {k: r[k] for k in ("n", "nulls", "n_distinct")}
        for r in prof.to_pylist()
    }

    # data-driven gate: drop the bottom quality quartile — the exact
    # distributed 25th percentile (histogram refinement, map-only
    # passes) instead of a hand-picked constant
    q25 = exact_quantiles(docs, "quality", [0.25])[0]
    summary["quality_q25"] = round(q25, 6)
    docs = docs.map_batches(
        lambda t: t.filter(pc.greater_equal(t["quality"], q25)),
        batch_format="pyarrow",
    ).materialize()
    n_q = docs.count()
    summary["rows_after_quality"] = n_q

    # 2b. fluency gate (CCNet LM-lite): drop docs whose mean corpus
    # token frequency falls below the exact 5th percentile — rare/
    # garbled-token pages.  The score is a 2-shuffle distributed
    # wordcount join; the keep set comes back via a semi bucket-join
    # (never a driver list).
    from rayraster.textops import corpus_freq_score

    freq = corpus_freq_score(docs, corpus_count=n_q).materialize()
    f05 = exact_quantiles(freq, "mean_freq", [0.05])[0]
    summary["mean_freq_p05"] = round(f05, 4)
    # ANTI-join on the scored losers: token-less docs have no score
    # row and pass through this gate explicitly (the quality gate
    # already penalizes empty text) — a semi-join on keepers would
    # silently drop them
    unfluent_ids = freq.map_batches(
        lambda t: t.filter(pc.less(t["mean_freq"], f05)).select(["doc_id"]),
        batch_format="pyarrow",
    )
    docs_schema = docs.schema()  # docs is materialized — probe is free
    docs = bucket_join(
        docs, unfluent_ids, "doc_id", "doc_id", join_type="anti",
        left_schema=docs_schema,
        right_schema=pa.schema([("doc_id", pa.int64())]),
    ).materialize()
    summary["rows_after_fluency"] = docs.count()

    # 3. exact dedup (content hash, keep min id): the keep-list STAYS
    # a Dataset — a distributed semi bucket-join (one co-location
    # shuffle) filters the corpus; on a real crawl the keep list is
    # O(corpus), so a driver to_pandas broadcast here would be the
    # pipeline's scale ceiling
    docs_schema = docs.schema()  # docs is materialized — probe is free
    keep_exact = exact_dedup_keep_ids(docs)
    docs = bucket_join(
        docs, keep_exact, "doc_id", "doc_id", join_type="semi",
        left_schema=docs_schema,
        right_schema=pa.schema([("doc_id", pa.int64())]),
    ).materialize()
    summary["rows_after_exact_dedup"] = docs.count()

    # 3b. cross-snapshot dedup: drop documents already present in the
    # previous crawl snapshot (simulated: ids ≡ 0 mod 7).  The old
    # corpus is never shuffled — its ids fold into a mergeable Bloom
    # (one blob per batch, OR-fold, driver sees a handful of blobs)
    # and the probe broadcasts once via ray.put; keep="misses" rows
    # are DEFINITELY new (Bloom has no false negatives) and skip the
    # exchange entirely, so only the hits (true olds + an FP-rate
    # sliver) pay the exact anti-join finish.
    from rayraster.sketch import build_bloom, bloom_mark

    old_ids = docs.map_batches(
        lambda t: t.select(["doc_id"]).filter(
            pa.array(t["doc_id"].to_numpy(zero_copy_only=False) % 7 == 0)
        ),
        batch_format="pyarrow",
    ).materialize()  # one int64 col; consumed twice (bloom + anti-join)
    snap_bloom = build_bloom(old_ids, "doc_id", log2_bits=20)
    # mark once (one hashing pass), then split with two boolean
    # filters — the transient marked copy is spillable; re-hashing the
    # corpus twice is not recoverable work
    marked = bloom_mark(docs, snap_bloom, "doc_id").materialize()

    def side(hit: bool):
        return marked.map_batches(
            lambda t, h=hit: t.filter(
                pc.equal(t["bloom_hit"], h)
            ).drop_columns(["bloom_hit"]),
            batch_format="pyarrow",
        )

    new_from_candidates = bucket_join(
        side(True), old_ids, "doc_id", "doc_id", join_type="anti",
        left_schema=docs_schema,
        right_schema=pa.schema([("doc_id", pa.int64())]),
    )
    docs = side(False).union(new_from_candidates).materialize()
    n_docs = docs.count()
    summary["rows_after_snapshot_filter"] = n_docs

    # 4. near-dup dedup: LSH pairs → verified (partitioned above the
    # broadcast threshold) → DISTRIBUTED connected components (labels
    # stay in a Dataset) → anti bucket-join drops non-representatives
    # (duplicates are 30-50% of a real crawl — the loser list is
    # O(corpus) too, so it must never land on the driver)
    pairs = minhash_lsh_pairs(
        docs, threshold=0.85, corpus_count=n_docs
    ).select_columns(["a", "b"])
    clusters = connected_components_distributed(pairs)
    losers = clusters.map_batches(
        lambda t: t.filter(pc.not_equal(t["node"], t["cluster"])).select(["node"]),
        batch_format="pyarrow",
    )
    docs = bucket_join(
        docs, losers, "doc_id", "node", join_type="anti",
        left_schema=docs_schema,
        right_schema=pa.schema([("node", pa.int64())]),
    ).materialize()
    summary["rows_after_near_dedup"] = docs.count()

    # 4a2. duplicated-SPAN removal (Lee et al. 2021 ExactSubstr):
    # document-level dedup leaves DISTINCT pages that still share
    # boilerplate runs (navbars, license blocks, templated footers) —
    # excise every word run covered by an 8-gram appearing in ≥ 2
    # surviving docs; url/quality metadata rides the rebuild exchange
    # (keep_cols), so no join back
    from rayraster.textops import remove_duplicate_ngram_spans

    docs = remove_duplicate_ngram_spans(
        docs, n=8, corpus_count=summary["rows_after_near_dedup"],
        keep_cols=("url", "quality"),
    ).materialize()
    summary["span_words_removed"] = int(docs.sum("n_removed") or 0)

    # 4b. token budget of the surviving corpus: the pre-token count
    # AND the trained-merge count (train a small byte-pair merge table
    # on the corpus with the distributed pair-count fold, then apply
    # it with the closed-form vectorized counter — the number a real
    # tokenizer-budget plan would use)
    from rayraster.textops import (
        bpe_merged_token_count,
        bpe_token_count,
        bpe_train_merges,
    )

    summary["bpe_tokens_total"] = int(
        docs.map_batches(bpe_token_count, batch_format="pyarrow").sum("bpe_token_count")
    )
    merges = bpe_train_merges(docs, n_merges=8)
    summary["bpe_merges"] = merges
    summary["bpe_merged_tokens_total"] = int(
        docs.map_batches(
            lambda t: bpe_merged_token_count(t, merges), batch_format="pyarrow"
        ).sum("bpe_token_count")
    )

    # 4c. context-window packing + corpus vocabulary (the training-set
    # deliverables: chunk count for the packed dataset, top words for
    # tokenizer sanity).  The chunk COUNT is a closed-form function of
    # the lengths — no need to expand (and md5) every chunk just to
    # count them; a real run would write chunk_text_windows output to
    # parquet instead.
    from rayraster.textops import chunk_count, vocab_topk

    def n_chunks_batch(t: pa.Table) -> pa.Table:
        ln = (
            pc.utf8_length(pc.fill_null(t["text"], ""))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        return pa.table({"n_chunks": pa.array(chunk_count(ln, 512, 384))})

    summary["chunks_total"] = int(
        docs.map_batches(n_chunks_batch, batch_format="pyarrow").sum("n_chunks")
    )

    # …and assign every real chunk to its 1M-token training shard via
    # the distributed exclusive prefix sum (no global sort; the driver
    # folds P partial sums) — the composite (doc_id, chunk_idx) order
    # handles the hash ids without a synthetic packed key
    from rayraster.agg import pack_by_budget
    from rayraster.textops import chunk_text_windows

    chunk_rows = docs.map_batches(
        lambda t: chunk_text_windows(t, window=512, stride=384).select(
            ["doc_id", "chunk_idx", "chunk_len"]
        ),
        batch_format="pyarrow",
    )
    packed = pack_by_budget(
        chunk_rows, budget=1_000_000, len_col="chunk_len",
        order_cols=["doc_id", "chunk_idx"], num_partitions=16,
    )
    max_bin = packed.max("bin_id")  # None when every doc was filtered
    summary["train_shards"] = int(max_bin) + 1 if max_bin is not None else 0
    top_words = vocab_topk(
        docs, k=10, corpus_count=summary["rows_after_near_dedup"]
    ).to_pandas()  # k rows, post-agg
    summary["vocab_top3"] = top_words.word.head(3).tolist()

    # 4c2. link-authority prior: an intra-site link graph (every doc →
    # its SITE hub; the synthetic corpus has one host per url, so
    # hosts are clustered into ~1024 "sites" by host hash and the hub
    # is the site's min doc_id) and 3 rounds of fixed-point
    # distributed PageRank over it.  All distributed: host extraction
    # is one RE2 map, hubs come from grouped_topk (per-batch partial
    # top-1 before ONE shuffle), edges from a bucket join, and
    # pagerank persists the edge layout once then shuffles only the
    # rank table per round.  The fnv doc_ids are sparse/non-contiguous
    # — exactly the vertex-set shape the phantom-node guard covers.
    from rayraster.agg import grouped_topk
    from rayraster.geo import fnv1a64
    from rayraster.graph import pagerank
    from rayraster.textops import url_host

    def site_of(t: pa.Table) -> pa.Table:
        h = url_host(t)["host"]
        site = (fnv1a64(h) % np.uint64(1024)).astype(np.int64)
        return pa.table({"doc_id": t["doc_id"], "site": pa.array(site)})

    sites = docs.map_batches(
        site_of, batch_format="pyarrow"
    ).materialize()  # consumed twice (hub derivation + edge join)
    hubs = grouped_topk(
        sites, ["site"], "doc_id", k=1, descending=False, num_partitions=16,
    ).map_batches(
        lambda t: pa.table({"site": t["site"], "hub_id": t["doc_id"]}),
        batch_format="pyarrow",
    )
    edges = bucket_join(
        sites, hubs, "site", "site", num_buckets=16,
        left_schema=pa.schema([("doc_id", pa.int64()), ("site", pa.int64())]),
        right_schema=pa.schema([("site", pa.int64()), ("hub_id", pa.int64())]),
    ).map_batches(
        lambda t: pa.table({"src": t["doc_id"], "dst": t["hub_id"]}),
        batch_format="pyarrow",
    )
    # the edge set derives from THIS run's surviving docs — an existing
    # layout (e.g. a re-run with the same --out dir but different
    # --rows) must never be reused, so clear it first
    pr_edges_dir = os.path.join(out_dir, "pr_edges")
    import shutil

    shutil.rmtree(pr_edges_dir, ignore_errors=True)
    pr = pagerank(
        edges,
        edges_path=pr_edges_dir,
        nodes=docs.map_batches(
            lambda t: pa.table({"node": t["doc_id"]}), batch_format="pyarrow"
        ),
        iterations=3,
        num_buckets=16,
        node_count=summary["rows_after_near_dedup"],
    )
    top_hub = pr.sort("pr", descending=True).limit(1).to_pandas()
    summary["top_hub_pagerank"] = round(float(top_hub.pr[0]) / 1e9, 4)

    # 4d. weighted eval holdout: 64 docs sampled ∝ quality WITHOUT
    # replacement (deterministic priority sampling — identical pick
    # across runs and cluster sizes; ht_weight sums give unbiased
    # corpus totals)
    from rayraster.agg import priority_sample

    hold = priority_sample(docs, "doc_id", "quality", k=64)
    summary["holdout_rows"] = hold.num_rows
    summary["holdout_tau"] = round(float(hold["tau"][0].as_py()), 4)

    # 5. geocode + rasterize (density + mean quality per 1° tile)
    pts = docs.map_batches(add_geocode_url, batch_format="pyarrow")
    spec = GridSpec(-180.0, -90.0, 1.0)
    pixels, _ = rasterize_features(
        pts, 1.0, ["quality"], spec=spec, fun="mean", with_meta=False
    )
    # clear first: Ray's write_parquet APPENDS into an existing dir,
    # and a doubled pixel table would (correctly) make neighbor_stats
    # refuse on duplicate (ix, iy) rows
    shutil.rmtree(os.path.join(out_dir, "pixels"), ignore_errors=True)
    pixels.write_parquet(os.path.join(out_dir, "pixels"))

    # 5b. spatial hot-spot detection on the density raster: local
    # Moran's I over num_cell (exact int sums, one tiled-halo
    # exchange) — the strongest positive-LISA pixel is the corpus's
    # spatial clustering hot spot (the hotspot-skewed geocode plants
    # real ones)
    from rayraster.spatial import local_moran

    lisa = local_moran(
        rd.read_parquet(
            os.path.join(out_dir, "pixels"),
            columns=["ix", "iy", "num_cell"],
        ),
        "num_cell",
        num_partitions=16,
    )
    hot = lisa.sort("lisa", descending=True).limit(1).to_pandas()
    summary["hotspot_tile"] = [int(hot.ix[0]), int(hot.iy[0])]
    summary["hotspot_lisa"] = round(float(hot.lisa[0]), 1)

    # 6. plot
    from rayraster.plot import plot_raster

    pdf = rd.read_parquet(os.path.join(out_dir, "pixels")).to_pandas()
    png, w, h = plot_raster(
        pdf, os.path.join(out_dir, "density.png"),
        feature_name="num_cell", log_scale=True,
        plot_title="DOC DENSITY PER TILE", show_legend=True, show_axis=True,
    )
    summary["pixels"] = len(pdf)
    summary["png"] = png
    summary["wall_sec"] = round(time.perf_counter() - t0, 2)
    summary["out_dir"] = out_dir
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--out", default=None)
    ap.add_argument("--num-cpus", type=int, default=None)
    a = ap.parse_args()
    main(a.rows, a.out, a.num_cpus)
