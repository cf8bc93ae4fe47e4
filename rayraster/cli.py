"""CLI entry — the ``ray job submit`` surface of the engine.

    python -m rayraster.cli rasterize --input '<glob>' --out /tmp/out \
        --resolution 0.5 [--hex] [--fun mean] [--value-cols a,b] \
        [--geocode id|url]   # resume is automatic via the manifest
    python -m rayraster.cli synth --out /tmp/pages --rows 1000000
    python -m rayraster.cli dedup --input '<glob>' --out /tmp/keep \
        [--method exact|minhash|ppjoin|spanrm] [--verify-mode auto|broadcast|partitioned]
    python -m rayraster.cli chunk --input '<glob>' --out /tmp/chunks \
        [--window 512 --stride 384]
    python -m rayraster.cli vocab --input '<glob>' --out /tmp/vocab [--k 100]
    python -m rayraster.cli index --input '<glob>' --out /tmp/idx
    python -m rayraster.cli search --index /tmp/idx --terms join,hash [--mode and|or]
    python -m rayraster.cli pagerank --input '<edges glob>' --out /tmp/pr \
        [--iterations 5]
    python -m rayraster.cli s2 --input '<glob>' --out /tmp/s2cells \
        [--level 7 --rollup 2 --value-cols n_chars --geocode id|url]
    python -m rayraster.cli plot --pixels /tmp/out/pixels --png /tmp/r.png

On a real cluster: ``ray job submit --working-dir . -- python -m
rayraster.cli rasterize ...`` — the code only ever talks to Ray Data,
so the same invocation scales from this sandbox to N nodes.  This is
the ONLY module (besides bench.py/tests) that owns a Ray session.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _init_ray(num_cpus: int | None):
    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    DataContext.get_current().enable_progress_bars = False
    from ray.data.context import ShuffleStrategy

    DataContext.get_current().shuffle_strategy = (
        ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    )


def cmd_rasterize(args) -> int:
    from rayraster.checkpoint import rasterize_checkpointed
    from rayraster.extract import ExtractStage, text_features
    from rayraster.grid import GridSpec
    from rayraster.pipelines import add_geocode_id, add_geocode_url

    _init_ray(args.num_cpus)
    files = sorted(glob.glob(args.input))
    if not files:
        print(f"no input files match {args.input}", file=sys.stderr)
        return 2
    spec = GridSpec(args.x0, args.y0, args.resolution, square=not args.hex)
    value_cols = args.value_cols.split(",") if args.value_cols else ["text_len"]

    read_cols = None
    if args.geocode == "url":
        def prepare(t):
            t = ExtractStage(verify_against=None)(t) if "html" in t.column_names else t
            t = text_features(t)
            t = add_geocode_url(t)
            return t.drop_columns(
                [c for c in ("html", "text", "url") if c in t.column_names]
            )
    else:
        # the default value column only exists on the url path (it is
        # derived by text_features) — fail FAST with an argument error
        # instead of a KeyError deep inside a distributed shard task
        if not args.value_cols:
            print(
                "rasterize --geocode id needs --value-cols (the default "
                "'text_len' is derived only on the url path)",
                file=sys.stderr,
            )
            return 2
        # prune at the read: this path touches only the id + values
        read_cols = [args.id_col, *value_cols]

        def prepare(t):
            return add_geocode_id(t, id_col=args.id_col)

    summary = rasterize_checkpointed(
        files,
        args.out,
        spec,
        value_cols,
        fun=args.fun,
        prepare=prepare,
        columns=read_cols,
        files_per_shard=args.files_per_shard,
    )
    print(json.dumps(summary))
    return 0 if summary["complete"] else 3


def cmd_synth(args) -> int:
    from rayraster.synth import write_pages_parquet_ray

    _init_ray(args.num_cpus)
    os.makedirs(args.out, exist_ok=True)
    write_pages_parquet_ray(args.out, args.rows, parallelism=args.parallelism)
    print(json.dumps({"out": args.out, "rows": args.rows}))
    return 0


def cmd_dedup(args) -> int:
    """Dedup a parquet corpus: exact (content hash) or near (MinHash →
    verified pairs → connected components); writes the keep-list
    parquet + a JSON summary line."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data as rd

    from rayraster.dedup import (
        connected_components_distributed,
        exact_dedup_keep_ids,
        minhash_lsh_pairs,
    )
    from rayraster.join import bucket_join

    _init_ray(args.num_cpus)
    files = sorted(glob.glob(args.input))
    if not files:
        print(f"no input files match {args.input}", file=sys.stderr)
        return 2
    ds = rd.read_parquet(files, columns=[args.id_col, args.text_col])
    ds_schema = ds.schema()  # raw read — probe reads one block's metadata
    n_in = ds.count()
    if args.method == "spanrm":
        # duplicated-SPAN removal: output is the rebuilt corpus (one
        # row per doc with the cleaned text + removal stats), not a
        # keep list — every copy of a shared n-gram run is excised
        from rayraster.textops import remove_duplicate_ngram_spans

        keep = remove_duplicate_ngram_spans(
            ds, n=args.ngram, text_col=args.text_col, id_col=args.id_col,
            corpus_count=n_in,
        )
    elif args.method == "exact":
        keep = exact_dedup_keep_ids(ds, args.text_col, args.id_col)
    else:
        if args.method == "ppjoin":
            # EXACT set-similarity join (AllPairs/PPJoin prefix
            # filter): 100% recall at word-unigram Jaccard >= t — no
            # LSH banding miss; same CC + anti-join finish
            from rayraster.dedup import set_similarity_pairs

            pairs = set_similarity_pairs(
                ds, args.text_col, args.id_col, threshold=args.threshold,
                verify_mode=args.verify_mode, corpus_count=n_in,
            ).select_columns(["a", "b"])
        else:
            pairs = minhash_lsh_pairs(
                ds, args.text_col, args.id_col, threshold=args.threshold,
                verify_mode=args.verify_mode, corpus_count=n_in,
            ).select_columns(["a", "b"])
        clusters = connected_components_distributed(pairs)
        # losers = nodes whose cluster label is another doc.  On a real
        # crawl duplicates are 30-50% of the corpus, so the loser list
        # is O(corpus): it stays a Dataset and the final filter is a
        # distributed anti bucket-join (one co-location shuffle),
        # never a driver to_pandas broadcast
        losers = clusters.map_batches(
            lambda t: t.filter(pc.not_equal(t["node"], t["cluster"])).select(["node"]),
            batch_format="pyarrow",
        )
        keep = bucket_join(
            ds, losers, args.id_col, "node", join_type="anti",
            left_schema=ds_schema,
            right_schema=pa.schema([("node", pa.int64())]),
        ).map_batches(
            lambda t: t.select([args.id_col]), batch_format="pyarrow"
        )
    import shutil

    shutil.rmtree(args.out, ignore_errors=True)
    keep.write_parquet(args.out)
    import pyarrow.parquet as pq

    n_keep = sum(
        pq.read_metadata(os.path.join(args.out, f)).num_rows
        for f in os.listdir(args.out)
        if f.endswith(".parquet")
    )
    print(json.dumps({"method": args.method, "rows_in": n_in, "rows_kept": n_keep,
                      "out": args.out}))
    return 0


def cmd_chunk(args) -> int:
    """Context-window packing of a parquet corpus: one output row per
    chunk (id, chunk_idx, n_chunks, chunk_len, chunk_md5) — swap the
    md5 projection for the chunk text itself when feeding a trainer."""
    import shutil

    import ray.data as rd

    from rayraster.textops import chunk_text_windows

    _init_ray(args.num_cpus)
    files = sorted(glob.glob(args.input))
    if not files:
        print(f"no input files match {args.input}", file=sys.stderr)
        return 2
    ds = rd.read_parquet(files, columns=[args.id_col, args.text_col])
    chunks = ds.map_batches(
        lambda t: chunk_text_windows(
            t, args.text_col, args.id_col, args.window, args.stride
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    shutil.rmtree(args.out, ignore_errors=True)
    chunks.write_parquet(args.out)
    n = rd.read_parquet(args.out).count()  # metadata count of the sink
    print(json.dumps({"out": args.out, "chunks": n,
                      "window": args.window, "stride": args.stride}))
    return 0


def cmd_vocab(args) -> int:
    """Corpus vocabulary top-k by frequency (tokenizer-training
    wordcount): writes the (word, n) table and prints the head."""
    import shutil

    import ray.data as rd

    from rayraster.textops import vocab_topk

    _init_ray(args.num_cpus)
    files = sorted(glob.glob(args.input))
    if not files:
        print(f"no input files match {args.input}", file=sys.stderr)
        return 2
    ds = rd.read_parquet(files, columns=[args.text_col])
    n_docs = ds.count()  # raw read → parquet metadata count
    top = vocab_topk(ds, args.text_col, k=args.k, corpus_count=n_docs)
    shutil.rmtree(args.out, ignore_errors=True)
    top.write_parquet(args.out)
    head = rd.read_parquet(args.out).sort(
        ["n", "word"], descending=[True, False]
    ).limit(5).to_pandas()
    print(json.dumps({"out": args.out, "docs": n_docs, "k": args.k,
                      "head": [[r.word, int(r.n)] for r in head.itertuples()]}))
    return 0


def cmd_index(args) -> int:
    """Build the persisted inverted index (posting pairs bucketed by
    word) — pay the posting exchange once; `search` then reads only
    probed term buckets."""
    import ray.data as rd

    from rayraster.textops import build_inverted_index

    _init_ray(args.num_cpus)
    files = sorted(glob.glob(args.input))
    if not files:
        print(f"no input files match {args.input}", file=sys.stderr)
        return 2
    ds = rd.read_parquet(files, columns=[args.id_col, args.text_col])
    path = build_inverted_index(
        ds, args.out, text_col=args.text_col, id_col=args.id_col,
        num_buckets=args.num_buckets,
    )
    print(json.dumps({"index": path, "num_buckets": args.num_buckets}))
    return 0


def cmd_search(args) -> int:
    """Boolean term search over a built index — reads ONLY the buckets
    the query terms hash to."""
    from rayraster.textops import search_index

    _init_ray(args.num_cpus)
    # strip whitespace: "--terms 'alpha, beta'" must not search ' beta'
    # (no posting word carries spaces — it would silently match nothing)
    terms = [t.strip() for t in args.terms.split(",") if t.strip()]
    out = search_index(
        args.index, terms, mode=args.mode, id_col=args.id_col
    ).to_pandas()
    n_matches = int(len(out))  # the TRUE count, before head truncation
    out = (
        out.sort_values(args.id_col).head(args.limit)
        if n_matches else out
    )
    print(json.dumps({
        "terms": sorted(set(terms)), "mode": args.mode,
        "matches": n_matches,
        "truncated": n_matches > args.limit,
        "head": out[args.id_col].head(10).tolist() if len(out) else [],
    }))
    return 0


def cmd_pagerank(args) -> int:
    """Fixed-point distributed PageRank over an (src, dst) edge
    parquet; the bucketed edge layout persists beside the output and
    is reused on re-runs (resumable)."""
    import shutil

    import ray.data as rd

    from rayraster.graph import pagerank

    _init_ray(args.num_cpus)
    files = sorted(glob.glob(args.input))
    if not files:
        print(f"no input files match {args.input}", file=sys.stderr)
        return 2
    edges = rd.read_parquet(files, columns=["src", "dst"])
    # the persisted layout is reusable ONLY for the same input: key the
    # path on an input fingerprint (file list + sizes), or a re-run
    # with --out unchanged but different --input would silently rank
    # the previous run's graph
    import hashlib

    fp = hashlib.md5(
        "|".join(f"{f}:{os.path.getsize(f)}" for f in files).encode()
    ).hexdigest()[:10]
    ranks = pagerank(
        edges,
        edges_path=f"{args.out}_edges_{fp}",
        iterations=args.iterations,
        num_buckets=args.num_buckets,
    )
    shutil.rmtree(args.out, ignore_errors=True)
    ranks.write_parquet(args.out)
    top = rd.read_parquet(args.out).sort("pr", descending=True).limit(5).to_pandas()
    print(json.dumps({
        "out": args.out, "iterations": args.iterations,
        "top": [[int(r.node), int(r.pr)] for r in top.itertuples()],
    }))
    return 0


def cmd_embed(args) -> int:
    """Hashed-trigram count embedding of a text corpus → parquet
    (id, embedding fixed_size_list<int64>) — the deterministic
    text→vector stage feeding dedup/ANN/self-join."""
    import shutil

    import ray.data as rd

    from rayraster.textops import hashed_ngram_embed

    _init_ray(args.num_cpus)
    files = sorted(glob.glob(args.input))
    if not files:
        print(f"no input files match {args.input}", file=sys.stderr)
        return 2
    ds = rd.read_parquet(files, columns=[args.id_col, args.text_col])
    out = ds.map_batches(
        lambda t: hashed_ngram_embed(t, text_col=args.text_col, dim=args.dim)
        .select([args.id_col, "embedding"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    shutil.rmtree(args.out, ignore_errors=True)
    out.write_parquet(args.out)
    n = rd.read_parquet(args.out).count()
    print(json.dumps({"out": args.out, "rows": n, "dim": args.dim}))
    return 0


def cmd_selfjoin(args) -> int:
    """Exact all-pairs cosine top-k self-join over an embedding
    parquet via the slab-tiled distributed engine (no whole-corpus
    matrix anywhere)."""
    import shutil

    import ray.data as rd

    from rayraster.similarity import self_topk_distributed

    _init_ray(args.num_cpus)
    files = sorted(glob.glob(args.input))
    if not files:
        print(f"no input files match {args.input}", file=sys.stderr)
        return 2
    ds = rd.read_parquet(files, columns=[args.id_col, args.vec_col])
    # the slab layout persists beside the output (resumable: a re-run
    # skips the slab exchange via its _DONE marker); the result stays
    # a streaming Dataset end-to-end (output="dataset") — k·N result
    # rows never gather on the driver
    res = self_topk_distributed(
        ds, k=args.k, vec_col=args.vec_col, id_col=args.id_col,
        slab_rows=args.slab_rows, work_dir=args.out + "_slabs",
        output="dataset",
    )
    shutil.rmtree(args.out, ignore_errors=True)
    res.write_parquet(args.out)
    n = rd.read_parquet(args.out).count()
    print(json.dumps({"out": args.out, "pairs": n, "k": args.k}))
    return 0


def cmd_kcore(args) -> int:
    """k-core decomposition of an (src, dst) edge parquet — the
    graph-density filter (dense cores = link rings / spam farms)."""
    import shutil

    import ray.data as rd

    from rayraster.graph import k_core

    _init_ray(args.num_cpus)
    files = sorted(glob.glob(args.input))
    if not files:
        print(f"no input files match {args.input}", file=sys.stderr)
        return 2
    edges = rd.read_parquet(files, columns=["src", "dst"])
    core = k_core(edges, args.k, num_buckets=args.num_buckets)
    shutil.rmtree(args.out, ignore_errors=True)
    core.write_parquet(args.out)
    n = rd.read_parquet(args.out).count()
    print(json.dumps({"out": args.out, "k": args.k, "core_nodes": n}))
    return 0


def cmd_graphstats(args) -> int:
    """One-stop link-graph analytics over an (src, dst) edge parquet:
    SCC labels + k-truss edges written as parquet, plus a JSON line of
    whole-graph statistics (reciprocity, degree-assortativity moments,
    triangle count) — the web-graph health report."""
    import shutil

    import ray.data as rd

    from rayraster.graph import (
        degree_moments,
        k_truss,
        reciprocity,
        scc,
        triangle_count,
    )

    _init_ray(args.num_cpus)
    files = sorted(glob.glob(args.input))
    if not files:
        print(f"no input files match {args.input}", file=sys.stderr)
        return 2
    edges = rd.read_parquet(files, columns=["src", "dst"])
    comps = scc(edges, num_buckets=args.num_buckets, engine=args.engine)
    shutil.rmtree(f"{args.out}/scc", ignore_errors=True)
    comps.write_parquet(f"{args.out}/scc")
    truss = k_truss(edges, args.truss_k, num_buckets=args.num_buckets)
    shutil.rmtree(f"{args.out}/truss", ignore_errors=True)
    truss.write_parquet(f"{args.out}/truss")
    rec = reciprocity(edges, num_buckets=args.num_buckets)
    mom = degree_moments(edges, num_buckets=args.num_buckets)
    tri = triangle_count(edges, num_buckets=args.num_buckets)
    n_scc = rd.read_parquet(f"{args.out}/scc").count()
    n_truss = rd.read_parquet(f"{args.out}/truss").count()
    print(json.dumps({
        "out": args.out, "nodes": n_scc, "truss_k": args.truss_k,
        "truss_edges": n_truss, "triangles": tri,
        "reciprocity": rec, "assortativity": mom,
    }))
    return 0


def cmd_s2(args) -> int:
    """Spherical S2-style cell aggregate of a points parquet: encode
    lon/lat to level-`--level` Hilbert cells, one hash-shuffle sum per
    value column, optional bit-op rollup `--rollup` levels coarser."""
    import shutil

    import ray.data as rd

    from rayraster.pipelines import add_geocode_id, add_geocode_url
    from rayraster.s2cell import s2_aggregate, s2_rollup

    _init_ray(args.num_cpus)
    files = sorted(glob.glob(args.input))
    if not files:
        print(f"no input files match {args.input}", file=sys.stderr)
        return 2
    value_cols = [c for c in args.value_cols.split(",") if c]
    read_cols = None
    if args.geocode == "id":
        read_cols = [args.id_col, *value_cols]
    elif args.geocode == "url":
        read_cols = ["url", *value_cols]
    ds = rd.read_parquet(files, columns=read_cols)
    if args.geocode == "id":
        ds = ds.map_batches(
            lambda t: add_geocode_id(t, id_col=args.id_col),
            batch_format="pyarrow",
        )
    elif args.geocode == "url":
        ds = ds.map_batches(add_geocode_url, batch_format="pyarrow")
    cells = s2_aggregate(ds, args.level, value_cols)
    if args.rollup:
        cells = s2_rollup(
            cells, [f"sum_{c}" for c in value_cols], levels_up=args.rollup
        )
    shutil.rmtree(args.out, ignore_errors=True)
    cells.write_parquet(args.out)
    n = rd.read_parquet(args.out).count()
    print(
        json.dumps(
            {"out": args.out, "level": args.level - args.rollup, "cells": n}
        )
    )
    return 0


def cmd_curate(args) -> int:
    """Corpus curation metrics in one pass over a parquet corpus:
    per-doc quality + Gopher repetition + corpus-frequency fluency
    score, written as a feature table to join back on id."""
    import shutil

    import ray.data as rd

    from rayraster.join import bucket_join
    from rayraster.textops import corpus_freq_score, quality_score, repetition_metrics

    import pyarrow as pa

    _init_ray(args.num_cpus)
    files = sorted(glob.glob(args.input))
    if not files:
        print(f"no input files match {args.input}", file=sys.stderr)
        return 2
    ds = rd.read_parquet(files, columns=[args.id_col, args.text_col])
    n_docs = ds.count()  # raw read → parquet metadata count
    feats = ds.map_batches(
        lambda t: quality_score(t, args.text_col), batch_format="pyarrow",
        zero_copy_batch=True,
    ).map_batches(
        lambda t: repetition_metrics(t, args.text_col).drop_columns(
            [args.text_col]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    freq = corpus_freq_score(
        rd.read_parquet(files, columns=[args.id_col, args.text_col]),
        text_col=args.text_col, id_col=args.id_col, corpus_count=n_docs,
    ).map_batches(
        lambda t: t.select([args.id_col, "freq_sum", "mean_freq"]),
        batch_format="pyarrow",
    )
    out = bucket_join(
        feats, freq, args.id_col, args.id_col, join_type="left",
        right_schema=pa.schema(
            [(args.id_col, pa.int64()), ("freq_sum", pa.int64()),
             ("mean_freq", pa.float64())]
        ),
    )
    # capture the joined schema DRIVER-SIDE for the optional second
    # join: out is a shuffle lineage, and bucket_join's schema() probe
    # on it would execute the whole feats+freq pipeline once just to
    # fetch one block (the documented 3x-wall trap).  feats.schema()
    # is a map-only one-block probe — cheap.
    out_schema = None
    f_sch = feats.schema()
    if f_sch is not None and all(
        isinstance(t, pa.DataType) for t in f_sch.types
    ):
        out_schema = pa.schema(
            list(zip(f_sch.names, f_sch.types))
            + [("freq_sum", pa.int64()), ("mean_freq", pa.float64())]
        )
    if args.lm != "none":
        from rayraster.textops import bigram_lm_score

        lp = (["lm_logprob_q"] if args.lm in ("addone", "both") else []) + (
            ["kn_logprob_q"] if args.lm in ("kn", "both") else []
        )
        lm = bigram_lm_score(
            rd.read_parquet(files, columns=[args.id_col, args.text_col]),
            text_col=args.text_col, id_col=args.id_col,
            corpus_count=n_docs, smoothing=args.lm,
        ).map_batches(
            lambda t: t.select([args.id_col, "bigram_count", *lp]),
            batch_format="pyarrow",
        )
        out = bucket_join(
            out, lm, args.id_col, args.id_col, join_type="left",
            left_schema=out_schema,
            right_schema=pa.schema(
                [(args.id_col, pa.int64()), ("bigram_count", pa.int64())]
                + [(c, pa.int64()) for c in lp]
            ),
        )
    shutil.rmtree(args.out, ignore_errors=True)
    out.write_parquet(args.out)
    n = rd.read_parquet(args.out).count()
    print(json.dumps({"out": args.out, "docs": n}))
    return 0


def cmd_pack(args) -> int:
    """Chunk a corpus and assign every chunk to its token-budget
    training shard (tokens_before / bin_id / bin_offset) — the
    loader-ready packing table."""
    import shutil

    import ray.data as rd

    from rayraster.agg import pack_by_budget
    from rayraster.textops import chunk_text_windows

    _init_ray(args.num_cpus)
    files = sorted(glob.glob(args.input))
    if not files:
        print(f"no input files match {args.input}", file=sys.stderr)
        return 2
    ds = rd.read_parquet(files, columns=[args.id_col, args.text_col])
    chunks = ds.map_batches(
        lambda t: chunk_text_windows(
            t, args.text_col, args.id_col, args.window, args.stride
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    packed = pack_by_budget(
        chunks, budget=args.budget, len_col="chunk_len",
        order_cols=[args.id_col, "chunk_idx"],
    )
    shutil.rmtree(args.out, ignore_errors=True)
    packed.write_parquet(args.out)
    sink = rd.read_parquet(args.out)
    n = sink.count()
    max_bin = sink.max("bin_id") if n else None
    print(json.dumps({
        "out": args.out, "chunks": n, "budget": args.budget,
        "shards": int(max_bin) + 1 if max_bin is not None else 0,
    }))
    return 0


def cmd_plot(args) -> int:
    import ray.data as rd

    from rayraster.plot import plot_raster

    _init_ray(args.num_cpus)
    pdf = rd.read_parquet(args.pixels).to_pandas()
    path, w, h = plot_raster(
        pdf, args.png, feature_name=args.feature, log_scale=args.log_scale,
        plot_title=args.title, show_legend=args.legend, show_axis=args.axis,
    )
    print(json.dumps({"png": path, "width": w, "height": h, "pixels": len(pdf)}))
    return 0


def cmd_profile(args) -> int:
    """Column profile of a parquet table (n / nulls / distinct /
    min / max per column) — the first pass of any ingest audit."""
    import ray.data as rd

    from rayraster.agg import profile_table

    _init_ray(args.num_cpus)
    files = sorted(glob.glob(args.input))
    if not files:
        print(f"no input files match {args.input}", file=sys.stderr)
        return 2
    cols = args.columns.split(",")
    ds = rd.read_parquet(files, columns=cols)
    prof = profile_table(ds, cols, distinct_mode=args.distinct)
    print(json.dumps({
        "input": args.input, "distinct_mode": args.distinct,
        "profile": {
            r["column"]: {k: r[k] for k in
                          ("n", "nulls", "n_distinct", "min_v", "max_v")}
            for r in prof.to_pylist()
        },
    }))
    return 0


def cmd_compact(args) -> int:
    """Compact a write_bucketed layout's small files in place (table
    maintenance after incremental ingests)."""
    from rayraster.join import compact_bucketed

    _init_ray(args.num_cpus)
    try:
        res = compact_bucketed(
            args.layout, target_rows_per_file=args.target_rows,
            concurrency=args.concurrency,
        )
    except FileNotFoundError:
        print(f"{args.layout} is not a write_bucketed layout", file=sys.stderr)
        return 2
    print(json.dumps({"layout": args.layout, **res}))
    return 0


def cmd_keywords(args) -> int:
    """Corpus keywords by TextRank: weighted integer PageRank over the
    bigram co-occurrence graph (see textops.keywords_textrank); the
    bucketed edge layout persists beside the output, keyed on an input
    fingerprint, and is reused on re-runs."""
    import hashlib
    import shutil

    import ray.data as rd

    from rayraster.textops import keywords_textrank

    _init_ray(args.num_cpus)
    files = sorted(glob.glob(args.input))
    if not files:
        print(f"no input files match {args.input}", file=sys.stderr)
        return 2
    docs = rd.read_parquet(files, columns=[args.text_col])
    fp = hashlib.md5(
        "|".join(f"{f}:{os.path.getsize(f)}" for f in files).encode()
    ).hexdigest()[:10]
    out = keywords_textrank(
        docs, edges_path=f"{args.out}_edges_{fp}", k=args.k,
        iterations=args.iterations, text_col=args.text_col,
    )
    shutil.rmtree(args.out, ignore_errors=True)
    out.write_parquet(args.out)
    top = rd.read_parquet(args.out).sort("rnk").limit(5).to_pandas()
    print(json.dumps({
        "out": args.out, "k": args.k,
        "top": [[r.word, int(r.pr)] for r in top.itertuples()],
    }))
    return 0


def cmd_pointstats(args) -> int:
    """Point-pattern diagnostics of a point parquet (id, x, y):
    Ripley's K/L at the given radii + the censored Clark–Evans index
    (+ the empirical semivariogram when --value-col is given) — one
    JSON line (see rayraster/pointpattern.py; all heavy stages are
    ε-tile exchanges, the driver sees len(radii)/len(bins) rows)."""
    import ray.data as rd

    from rayraster.pointpattern import (
        extent_stats, nn_censored, ripley_k, semivariogram,
    )

    _init_ray(args.num_cpus)
    files = sorted(glob.glob(args.input))
    if not files:
        print(f"no input files match {args.input}", file=sys.stderr)
        return 2
    cols = [args.id_col, args.x_col, args.y_col]
    if args.value_col:
        cols.append(args.value_col)
    pts = rd.read_parquet(files, columns=cols).materialize()
    radii = sorted(float(r) for r in args.radii.split(","))
    ext = extent_stats(pts, args.x_col, args.y_col)
    rip = ripley_k(
        pts, radii, id_col=args.id_col, x_col=args.x_col, y_col=args.y_col,
        extent=ext,
    )
    ce = nn_censored(
        pts, radii[-1], id_col=args.id_col, x_col=args.x_col,
        y_col=args.y_col, extent=ext,
    )
    out = {
        "n": ext["n"], "area": ext["area"],
        "ripley": [
            {"r": rip["radius"][i].as_py(),
             "npairs": rip["npairs"][i].as_py(),
             "k": rip["k_est"][i].as_py()}
            for i in range(rip.num_rows)
        ],
        "clark_evans": {"r_index": ce["r_index"], "covered": ce["ncov"]},
    }
    if args.value_col:
        vg = semivariogram(
            pts, args.value_col, bin_width=args.bin_width or radii[0],
            max_dist=radii[-1], id_col=args.id_col,
            x_col=args.x_col, y_col=args.y_col,
        )
        out["variogram"] = [
            {"h": vg["h"][i].as_py(), "cnt": vg["cnt"][i].as_py(),
             "gamma": vg["gamma"][i].as_py()}
            for i in range(vg.num_rows)
        ]
    print(json.dumps(out))
    return 0


def cmd_dbscan(args) -> int:
    """Density clustering of a point parquet (id, x, y) → one
    (node, label) row per point; noise = -1 (see
    cluster.dbscan_labels — ε-tile pairs, dual label engine)."""
    import shutil

    import ray.data as rd

    from rayraster.cluster import dbscan_labels

    _init_ray(args.num_cpus)
    files = sorted(glob.glob(args.input))
    if not files:
        print(f"no input files match {args.input}", file=sys.stderr)
        return 2
    pts = rd.read_parquet(
        files, columns=[args.id_col, args.x_col, args.y_col]
    )
    labels = dbscan_labels(
        pts, args.eps, min_samples=args.min_samples,
        id_col=args.id_col, x_col=args.x_col, y_col=args.y_col,
    )
    shutil.rmtree(args.out, ignore_errors=True)
    labels.write_parquet(args.out)
    import pyarrow as _pa
    import pyarrow.compute as _pc

    lab = rd.read_parquet(args.out)
    n = lab.count()
    noise = lab.map_batches(
        lambda t: _pa.table(
            {"c": _pa.array(
                [t.filter(_pc.equal(t["label"], -1)).num_rows],
                type=_pa.int64(),
            )}
        ),
        batch_format="pyarrow",
    ).sum("c")
    clusters = lab.map_batches(
        lambda t: t.filter(_pc.not_equal(t["label"], -1)).select(["label"]),
        batch_format="pyarrow",
    ).unique("label")
    print(json.dumps({
        "out": args.out, "points": n, "noise": int(noise or 0),
        "clusters": len(clusters),
    }))
    return 0


def cmd_classify(args) -> int:
    """Train a multinomial Naive Bayes on a labeled parquet corpus and
    score every document (textops.nb_train / nb_score): writes
    (id, nb_pred, nb_score_q) parquet + a JSON summary with the class
    set and training accuracy."""
    import shutil

    import pyarrow.compute as _pc

    import ray.data as rd

    from rayraster.textops import nb_score, nb_train

    _init_ray(args.num_cpus)
    files = sorted(glob.glob(args.input))
    if not files:
        print(f"no input files match {args.input}", file=sys.stderr)
        return 2
    ds = rd.read_parquet(
        files, columns=[args.id_col, args.text_col, args.label_col]
    )
    model = nb_train(
        ds, text_col=args.text_col, label_col=args.label_col,
        max_vocab=args.max_vocab,
    )
    scored = nb_score(ds, model, text_col=args.text_col, id_col=args.id_col)
    shutil.rmtree(args.out, ignore_errors=True)
    scored.write_parquet(args.out)
    # training accuracy: one co-located compare of pred vs label
    from rayraster.join import bucket_join

    truth = ds.map_batches(
        lambda t: t.select([args.id_col, args.label_col]),
        batch_format="pyarrow",
    )
    import pyarrow as _pa

    joined = bucket_join(
        rd.read_parquet(args.out), truth, args.id_col, args.id_col,
        left_schema=_pa.schema([
            (args.id_col, _pa.int64()), ("nb_pred", _pa.string()),
            ("nb_score_q", _pa.int64()),
        ]),
        right_schema=_pa.schema([
            (args.id_col, _pa.int64()), (args.label_col, _pa.string()),
        ]),
    )
    hits = joined.map_batches(
        lambda t: _pa.table({"h": _pc.equal(
            t["nb_pred"], t[args.label_col]).cast(_pa.int64())}),
        batch_format="pyarrow",
    ).sum("h")
    n = ds.count()
    print(json.dumps({
        "out": args.out, "docs": n, "classes": model["classes"],
        "vocab": len(model["vocab"]),
        "train_accuracy": (int(hits or 0)) / max(n, 1),
    }))
    return 0


def cmd_cdc(args) -> int:
    """Content-defined chunking of a corpus (dedup.cdc_chunks): writes
    the chunk table parquet + a JSON dedup summary (total vs distinct
    chunk bytes — the storage-dedup ratio)."""
    import shutil

    import pyarrow as _pa

    import ray.data as rd

    from rayraster.agg import hash_aggregate
    from rayraster.dedup import cdc_chunks

    _init_ray(args.num_cpus)
    files = sorted(glob.glob(args.input))
    if not files:
        print(f"no input files match {args.input}", file=sys.stderr)
        return 2
    ds = rd.read_parquet(files, columns=[args.id_col, args.text_col])
    chunks = cdc_chunks(
        ds, text_col=args.text_col, id_col=args.id_col,
        min_size=args.min_size, avg_bits=args.avg_bits,
        max_size=args.max_size,
    ).materialize()
    shutil.rmtree(args.out, ignore_errors=True)
    chunks.write_parquet(args.out)
    total = chunks.sum("chunk_len") or 0
    per = hash_aggregate(
        chunks.map_batches(
            lambda t: t.select(["chunk_md5", "chunk_len"]),
            batch_format="pyarrow",
        ),
        keys=["chunk_md5"], min_cols=["chunk_len"], count=False,
        num_partitions=16,
    )
    distinct_bytes = per.sum("min_chunk_len") or 0
    n_chunks = chunks.count()
    print(json.dumps({
        "out": args.out, "chunks": n_chunks,
        "total_bytes": int(total), "distinct_bytes": int(distinct_bytes),
        "dedup_ratio": (int(total)) / max(int(distinct_bytes), 1),
    }))
    return 0


def cmd_transitions(args) -> int:
    """First-order Markov transition matrix of an event parquet
    (windows.transition_counts): writes (from_type, to_type, n,
    n_from, p) parquet + a JSON line with the top transitions."""
    import shutil

    import ray.data as rd

    from rayraster.windows import transition_counts

    _init_ray(args.num_cpus)
    files = sorted(glob.glob(args.input))
    if not files:
        print(f"no input files match {args.input}", file=sys.stderr)
        return 2
    ev = rd.read_parquet(
        files,
        columns=[args.key_col, args.order_col, args.type_col],
    )
    tm = transition_counts(
        ev, key_col=args.key_col, type_col=args.type_col,
        order_cols=(args.order_col,),
    ).materialize()
    shutil.rmtree(args.out, ignore_errors=True)
    tm.write_parquet(args.out)
    top = sorted(
        tm.take_all(), key=lambda r: (-r["n"], r["from_type"], r["to_type"])
    )[:5]
    print(json.dumps({
        "out": args.out, "transitions": tm.count(),
        "top": [[r["from_type"], r["to_type"], r["n"]] for r in top],
    }))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="rayraster")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("rasterize", help="checkpointed rasterization run")
    r.add_argument("--input", required=True, help="input parquet glob")
    r.add_argument("--out", required=True)
    r.add_argument("--resolution", type=float, required=True)
    r.add_argument("--hex", action="store_true")
    r.add_argument("--fun", choices=["sum", "mean"], default="mean")
    r.add_argument("--value-cols", default="")
    r.add_argument("--geocode", choices=["id", "url"], default="url")
    r.add_argument("--id-col", default="doc_id")
    r.add_argument("--x0", type=float, default=-180.0)
    r.add_argument("--y0", type=float, default=-90.0)
    r.add_argument("--files-per-shard", type=int, default=8)
    r.set_defaults(fn=cmd_rasterize)

    s = sub.add_parser("synth", help="generate the synthetic pages table")
    s.add_argument("--out", required=True)
    s.add_argument("--rows", type=int, default=1_000_000)
    s.add_argument("--parallelism", type=int, default=64)
    s.set_defaults(fn=cmd_synth)

    d = sub.add_parser("dedup", help="exact, near, or duplicated-span dedup of a corpus")
    d.add_argument("--input", required=True)
    d.add_argument("--out", required=True)
    d.add_argument("--method", choices=["exact", "minhash", "ppjoin", "spanrm"], default="exact")
    d.add_argument("--id-col", default="doc_id")
    d.add_argument("--text-col", default="text")
    d.add_argument("--threshold", type=float, default=0.8)
    d.add_argument("--ngram", type=int, default=8,
                   help="span-removal n-gram width (spanrm only)")
    d.add_argument("--verify-mode", choices=["auto", "broadcast", "partitioned"],
                   default="auto")
    d.set_defaults(fn=cmd_dedup)

    c = sub.add_parser("chunk", help="context-window packing of a corpus")
    c.add_argument("--input", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--id-col", default="doc_id")
    c.add_argument("--text-col", default="text")
    c.add_argument("--window", type=int, default=512)
    c.add_argument("--stride", type=int, default=384)
    c.set_defaults(fn=cmd_chunk)

    v = sub.add_parser("vocab", help="vocabulary top-k wordcount")
    v.add_argument("--input", required=True)
    v.add_argument("--out", required=True)
    v.add_argument("--text-col", default="text")
    v.add_argument("--k", type=int, default=100)
    v.set_defaults(fn=cmd_vocab)

    u = sub.add_parser("curate", help="per-doc quality/repetition/fluency features")
    u.add_argument("--input", required=True)
    u.add_argument("--out", required=True)
    u.add_argument("--id-col", default="doc_id")
    u.add_argument("--text-col", default="text")
    u.add_argument("--lm", choices=["none", "addone", "kn", "both"],
                   default="none",
                   help="also train+score a bigram LM on the corpus")
    u.set_defaults(fn=cmd_curate)

    k = sub.add_parser("pack", help="chunk + token-budget shard packing")
    k.add_argument("--input", required=True)
    k.add_argument("--out", required=True)
    k.add_argument("--id-col", default="doc_id")
    k.add_argument("--text-col", default="text")
    k.add_argument("--window", type=int, default=512)
    k.add_argument("--stride", type=int, default=384)
    k.add_argument("--budget", type=int, default=1_000_000)
    k.set_defaults(fn=cmd_pack)

    ix = sub.add_parser("index", help="build the persisted inverted index")
    ix.add_argument("--input", required=True)
    ix.add_argument("--out", required=True)
    ix.add_argument("--id-col", default="doc_id")
    ix.add_argument("--text-col", default="text")
    ix.add_argument("--num-buckets", type=int, default=64)
    ix.set_defaults(fn=cmd_index)

    se = sub.add_parser("search", help="boolean term search over a built index")
    se.add_argument("--index", required=True)
    se.add_argument("--terms", required=True, help="comma-separated")
    se.add_argument("--mode", choices=("and", "or"), default="and")
    se.add_argument("--id-col", default="doc_id")
    se.add_argument("--limit", type=int, default=1000)
    se.set_defaults(fn=cmd_search)

    pr = sub.add_parser("pagerank", help="fixed-point PageRank over (src,dst) edges")
    pr.add_argument("--input", required=True)
    pr.add_argument("--out", required=True)
    pr.add_argument("--iterations", type=int, default=5)
    pr.add_argument("--num-buckets", type=int, default=64)
    pr.set_defaults(fn=cmd_pagerank)

    em = sub.add_parser("embed", help="hashed-trigram text embedding to parquet")
    em.add_argument("--input", required=True)
    em.add_argument("--out", required=True)
    em.add_argument("--id-col", default="doc_id")
    em.add_argument("--text-col", default="text")
    em.add_argument("--dim", type=int, default=64)
    em.set_defaults(fn=cmd_embed)

    sj = sub.add_parser("selfjoin", help="exact all-pairs cosine top-k (slab-tiled)")
    sj.add_argument("--input", required=True)
    sj.add_argument("--out", required=True)
    sj.add_argument("--id-col", default="vec_id")
    sj.add_argument("--vec-col", default="embedding")
    sj.add_argument("--k", type=int, default=10)
    sj.add_argument("--slab-rows", type=int, default=65536)
    sj.set_defaults(fn=cmd_selfjoin)

    kc = sub.add_parser("kcore", help="k-core decomposition of (src,dst) edges")
    kc.add_argument("--input", required=True)
    kc.add_argument("--out", required=True)
    kc.add_argument("--k", type=int, default=3)
    kc.add_argument("--num-buckets", type=int, default=64)
    kc.set_defaults(fn=cmd_kcore)

    gs = sub.add_parser(
        "graphstats",
        help="SCC + k-truss + whole-graph link statistics of (src,dst) edges",
    )
    gs.add_argument("--input", required=True)
    gs.add_argument("--out", required=True)
    gs.add_argument("--truss-k", type=int, default=3)
    gs.add_argument("--num-buckets", type=int, default=64)
    gs.add_argument("--engine", default="auto",
                    choices=["auto", "local", "distributed"],
                    help="SCC engine (auto = bounded Tarjan pull below threshold)")
    gs.set_defaults(fn=cmd_graphstats)

    s2 = sub.add_parser("s2", help="spherical S2-style cell aggregate")
    s2.add_argument("--input", required=True, help="input parquet glob")
    s2.add_argument("--out", required=True)
    s2.add_argument("--level", type=int, default=7)
    s2.add_argument("--rollup", type=int, default=0, help="levels to roll up")
    s2.add_argument("--value-cols", default="n_chars")
    s2.add_argument("--geocode", choices=["id", "url", "none"], default="id")
    s2.add_argument("--id-col", default="doc_id")
    s2.set_defaults(fn=cmd_s2)

    pf = sub.add_parser("profile", help="column profile (n/nulls/distinct/min/max)")
    pf.add_argument("--input", required=True)
    pf.add_argument("--columns", required=True, help="comma-separated column list")
    pf.add_argument("--distinct", default="exact", choices=["exact", "approx", "none"])
    pf.set_defaults(fn=cmd_profile)

    cp = sub.add_parser("compact", help="compact a bucketed layout's small files")
    cp.add_argument("--layout", required=True, help="write_bucketed dir")
    cp.add_argument("--target-rows", type=int, default=1_000_000)
    cp.add_argument("--concurrency", type=int, default=None)
    cp.set_defaults(fn=cmd_compact)

    kw = sub.add_parser("keywords", help="corpus keywords by TextRank")
    kw.add_argument("--input", required=True, help="docs parquet glob")
    kw.add_argument("--out", required=True)
    kw.add_argument("--k", type=int, default=20)
    kw.add_argument("--iterations", type=int, default=3)
    kw.add_argument("--text-col", default="text")
    kw.set_defaults(fn=cmd_keywords)

    ps = sub.add_parser(
        "pointstats", help="Ripley K/L + Clark-Evans (+ variogram) of points"
    )
    ps.add_argument("--input", required=True, help="points parquet glob")
    ps.add_argument("--radii", default="10,20,40", help="comma-separated")
    ps.add_argument("--id-col", default="id")
    ps.add_argument("--x-col", default="x")
    ps.add_argument("--y-col", default="y")
    ps.add_argument("--value-col", default=None,
                    help="integer column: also emit the semivariogram")
    ps.add_argument("--bin-width", type=float, default=None)
    ps.set_defaults(fn=cmd_pointstats)

    db = sub.add_parser("dbscan", help="DBSCAN density clustering of points")
    db.add_argument("--input", required=True, help="points parquet glob")
    db.add_argument("--out", required=True)
    db.add_argument("--eps", type=float, required=True)
    db.add_argument("--min-samples", type=int, default=3)
    db.add_argument("--id-col", default="id")
    db.add_argument("--x-col", default="x")
    db.add_argument("--y-col", default="y")
    db.set_defaults(fn=cmd_dbscan)

    cf = sub.add_parser(
        "classify", help="train + score a Naive Bayes text classifier"
    )
    cf.add_argument("--input", required=True, help="labeled parquet glob")
    cf.add_argument("--out", required=True)
    cf.add_argument("--id-col", default="doc_id")
    cf.add_argument("--text-col", default="text")
    cf.add_argument("--label-col", default="lang")
    cf.add_argument("--max-vocab", type=int, default=None)
    cf.set_defaults(fn=cmd_classify)

    cd = sub.add_parser(
        "cdc", help="content-defined chunking (Gear/FastCDC) of a corpus"
    )
    cd.add_argument("--input", required=True)
    cd.add_argument("--out", required=True)
    cd.add_argument("--id-col", default="doc_id")
    cd.add_argument("--text-col", default="text")
    cd.add_argument("--min-size", type=int, default=64)
    cd.add_argument("--avg-bits", type=int, default=13)
    cd.add_argument("--max-size", type=int, default=65536)
    cd.set_defaults(fn=cmd_cdc)

    tr = sub.add_parser(
        "transitions", help="Markov event-type transition matrix"
    )
    tr.add_argument("--input", required=True, help="event parquet glob")
    tr.add_argument("--out", required=True)
    tr.add_argument("--key-col", default="user_id")
    tr.add_argument("--order-col", default="ts")
    tr.add_argument("--type-col", default="event_type")
    tr.set_defaults(fn=cmd_transitions)

    g = sub.add_parser("plot", help="render a pixel table to PNG")
    g.add_argument("--pixels", required=True)
    g.add_argument("--png", required=True)
    g.add_argument("--feature", default="sum")
    g.add_argument("--log-scale", action="store_true")
    g.add_argument("--title", default=None)
    g.add_argument("--legend", action="store_true")
    g.add_argument("--axis", action="store_true")
    g.set_defaults(fn=cmd_plot)

    args = p.parse_args(argv)
    try:
        return args.fn(args)
    finally:
        import ray

        if ray.is_initialized():
            ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
