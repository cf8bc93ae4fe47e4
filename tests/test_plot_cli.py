"""plotRaster analog (PNG sink) + CLI surface."""

import json
import os
import struct
import subprocess
import sys
import zlib

import numpy as np
import pandas as pd
import pytest

from rayraster.plot import plot_raster, viridis, write_png


def test_write_png_valid(tmp_path):
    img = np.zeros((4, 5, 3), dtype=np.uint8)
    img[0, 0] = (255, 0, 0)
    p = str(tmp_path / "t.png")
    write_png(p, img)
    raw = open(p, "rb").read()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    # IHDR dims
    w, h = struct.unpack(">II", raw[16:24])
    assert (w, h) == (5, 4)
    # IDAT decompresses to h*(1+w*3) bytes
    idat_pos = raw.index(b"IDAT")
    ln = struct.unpack(">I", raw[idat_pos - 4 : idat_pos])[0]
    payload = raw[idat_pos + 4 : idat_pos + 4 + ln]
    assert len(zlib.decompress(payload)) == 4 * (1 + 5 * 3)


def test_viridis_endpoints():
    c = viridis(np.array([0.0, 1.0]))
    assert tuple(c[0]) == (68, 1, 84)
    assert tuple(c[1]) == (253, 231, 37)


def test_plot_raster_reductions(tmp_path):
    df = pd.DataFrame(
        {
            "ix": [0, 1, 2],
            "iy": [0, 1, 0],
            "sum_a": [1.0, 5.0, 3.0],
            "sum_b": [0.0, 1.0, 2.0],
        }
    )
    path, w, h = plot_raster(df, str(tmp_path / "r.png"), feature_name="sum")
    assert w > 0 and h > 0
    plot_raster(df, str(tmp_path / "r2.png"), feature_name="sum_a")
    with pytest.raises(ValueError):
        plot_raster(df[["ix", "iy"]].assign(zz=1.0), str(tmp_path / "r3.png"))


def test_plot_options_title_legend_axis(tmp_path):
    """plotTitle / showLegend / showAxis parity (R/main.R:791-849):
    the decorated canvas is strictly larger, stays a valid PNG, and
    the legend actually paints the colormap endpoints."""
    df = pd.DataFrame(
        {"ix": [0, 1, 2], "iy": [0, 1, 0], "sum_a": [1.0, 5.0, 3.0]}
    )
    _, w0, h0 = plot_raster(df, str(tmp_path / "bare.png"))
    p, w, h = plot_raster(
        df, str(tmp_path / "full.png"), plot_title="DENSITY",
        show_legend=True, show_axis=True,
    )
    assert w > w0 and h > h0
    raw = open(p, "rb").read()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    iw, ih = struct.unpack(">II", raw[16:24])
    assert (iw, ih) == (w, h)
    idat = raw.index(b"IDAT")
    ln = struct.unpack(">I", raw[idat - 4 : idat])[0]
    px = np.frombuffer(
        zlib.decompress(raw[idat + 4 : idat + 4 + ln]), dtype=np.uint8
    )
    img = px.reshape(ih, 1 + iw * 3)[:, 1:].reshape(ih, iw, 3)
    flat = set(map(tuple, img.reshape(-1, 3)))
    assert (68, 1, 84) in flat and (253, 231, 37) in flat  # legend bar ends
    assert (0, 0, 0) in flat  # axis frame / text ink


def test_plot_categorical_legend_order(tmp_path):
    from rayraster.plot import plot_raster_categorical

    df = pd.DataFrame(
        {"ix": [0, 1, 2, 0], "iy": [0, 0, 0, 1], "lang": ["en", "de", "en", "fr"]}
    )
    p, w, h, lut = plot_raster_categorical(
        df, str(tmp_path / "cl.png"), "lang", factor_levels=["fr", "en", "de"],
        plot_title="LANGS", show_legend=True, show_axis=True,
    )
    assert list(lut) == ["fr", "en", "de"]  # factor_levels fixes order
    assert w > 0 and h > 0 and os.path.getsize(p) > 0


def test_cli_end_to_end(tmp_path):
    """synth → rasterize (checkpointed) → plot, through the real CLI."""
    import pyarrow.parquet as pq

    from rayraster.synth import write_pages_parquet_local

    pages = tmp_path / "pages"
    pages.mkdir()
    for k in range(2):
        write_pages_parquet_local(str(pages / f"p{k}.parquet"), 400)
    out = tmp_path / "run"
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin", "HOME": "/root",
           "RAY_ADDRESS": "local"}
    r = subprocess.run(
        [sys.executable, "-m", "rayraster.cli", "--num-cpus", "4",
         "rasterize", "--input", str(pages / "*.parquet"), "--out", str(out),
         "--resolution", "10", "--fun", "sum", "--geocode", "url",
         "--value-cols", "text_len,token_count"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["complete"]
    px = pq.read_table(summary["pixels_dir"])
    assert px.num_rows > 0
    assert sum(pq.read_table(summary["pixels_dir"])["num_cell"].to_pylist()) == 800
    g = subprocess.run(
        [sys.executable, "-m", "rayraster.cli", "--num-cpus", "4",
         "plot", "--pixels", summary["pixels_dir"],
         "--png", str(tmp_path / "out.png")],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert g.returncode == 0, g.stderr[-2000:]
    assert json.loads(g.stdout.strip().splitlines()[-1])["width"] > 0


def test_plot_categorical(tmp_path):
    from rayraster.plot import plot_raster_categorical

    df = pd.DataFrame(
        {"ix": [0, 1, 2, 0], "iy": [0, 0, 0, 1], "lang": ["en", "de", "en", "fr"]}
    )
    path, w, h, lut = plot_raster_categorical(df, str(tmp_path / "c.png"), "lang")
    assert set(lut) == {"en", "de", "fr"} and len(set(lut.values())) == 3
    assert w > 0 and h > 0


def test_cli_dedup(tmp_path):
    """CLI dedup surface: exact method over a corpus with known dupes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    corpus = tmp_path / "docs"
    corpus.mkdir()
    texts = [f"document number {i}" for i in range(50)] * 2  # every text twice
    pq.write_table(
        pa.table({"doc_id": list(range(100)), "text": texts}),
        str(corpus / "d.parquet"),
    )
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin", "HOME": "/root",
           "RAY_ADDRESS": "local"}
    r = subprocess.run(
        [sys.executable, "-m", "rayraster.cli", "--num-cpus", "4",
         "dedup", "--input", str(corpus / "*.parquet"),
         "--out", str(tmp_path / "keep")],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["rows_in"] == 100 and summary["rows_kept"] == 50
    kept = pq.read_table(str(tmp_path / "keep")).to_pandas()
    assert sorted(kept.doc_id) == list(range(50))


def test_cli_dedup_minhash_partitioned(tmp_path):
    """Near-dup CLI path: distributed CC + vectorized anti-filter,
    partitioned verify — the exactly-one-survivor-per-cluster
    invariant over a corpus with perturbed copies."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    corpus = tmp_path / "docs"
    corpus.mkdir()
    rng = np.random.default_rng(17)
    words = [f"tok{k:03d}" for k in range(500)]
    rows = []
    for i in range(60):
        text = " ".join(rng.choice(words, size=90))
        rows.append({"doc_id": i, "text": text})
        if i % 2 == 0:
            rows.append({"doc_id": i + 5000, "text": text + " zz9y"})
    pq.write_table(
        pa.table({"doc_id": [r["doc_id"] for r in rows],
                  "text": [r["text"] for r in rows]}),
        str(corpus / "d.parquet"),
    )
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin", "HOME": "/root",
           "RAY_ADDRESS": "local"}
    r = subprocess.run(
        [sys.executable, "-m", "rayraster.cli", "--num-cpus", "4",
         "dedup", "--input", str(corpus / "*.parquet"),
         "--out", str(tmp_path / "keep"), "--method", "minhash",
         "--threshold", "0.8", "--verify-mode", "partitioned"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["rows_in"] == 90 and summary["rows_kept"] == 60
    kept = pq.read_table(str(tmp_path / "keep")).to_pandas()
    assert sorted(kept.doc_id) == list(range(60))  # originals win (min id)


def test_cli_chunk_and_vocab(tmp_path):
    """The chunk/vocab CLI surface over a small corpus."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    corpus = tmp_path / "docs"
    corpus.mkdir()
    texts = ["alpha beta gamma " * 40, "alpha beta", "alpha"]
    pq.write_table(
        pa.table({"doc_id": [0, 1, 2], "text": texts}),
        str(corpus / "d.parquet"),
    )
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin", "HOME": "/root",
           "RAY_ADDRESS": "local"}
    r = subprocess.run(
        [sys.executable, "-m", "rayraster.cli", "--num-cpus", "4",
         "chunk", "--input", str(corpus / "*.parquet"),
         "--out", str(tmp_path / "chunks"), "--window", "100", "--stride", "80"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    s = json.loads(r.stdout.strip().splitlines()[-1])
    # doc0 len 680: 1 + ceil((680-100)/80) = 9 chunks; docs 1-2: 1 each
    assert s["chunks"] == 9 + 1 + 1
    r = subprocess.run(
        [sys.executable, "-m", "rayraster.cli", "--num-cpus", "4",
         "vocab", "--input", str(corpus / "*.parquet"),
         "--out", str(tmp_path / "vocab"), "--k", "2"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    s = json.loads(r.stdout.strip().splitlines()[-1])
    assert s["head"][0] == ["alpha", 42] and s["head"][1] == ["beta", 41]


def test_training_pipeline_example(tmp_path):
    """The examples/ flagship composition runs end-to-end."""
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin", "HOME": "/root",
           "RAY_ADDRESS": "local"}
    r = subprocess.run(
        [sys.executable, "/root/repo/examples/training_pipeline.py",
         "--rows", "3000", "--num-cpus", "4", "--out", str(tmp_path / "demo")],
        capture_output=True, text=True, env=env, timeout=400,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    s = json.loads(r.stdout.strip().splitlines()[-1])
    # 3000 rows + 300 injected dups; the quantile gate drops ~the
    # bottom quartile (ties may keep a few extra)
    assert 0.70 * 3300 <= s["rows_after_quality"] <= 0.80 * 3300
    # dup pairs share a text → same quality → both survive the gate,
    # and exact dedup then removes exactly one of each
    assert s["rows_after_exact_dedup"] < s["rows_after_quality"]
    # cross-snapshot filter drops the ~1/7 of hash-distributed ids
    # simulated as last snapshot's crawl (bloom prefilter + exact
    # anti-join on the hits)
    assert (
        0.80 * s["rows_after_exact_dedup"]
        <= s["rows_after_snapshot_filter"]
        <= 0.92 * s["rows_after_exact_dedup"]
    )
    # synth texts are unique → near-dedup loses nothing further
    assert s["rows_after_near_dedup"] == s["rows_after_snapshot_filter"]
    # weighted holdout: full k picked, threshold priority recorded
    assert s["holdout_rows"] == 64 and s["holdout_tau"] > 0
    assert s["bpe_tokens_total"] > 0
    # every surviving doc yields >= 1 chunk
    assert s["chunks_total"] >= s["rows_after_near_dedup"]
    assert len(s["vocab_top3"]) == 3
    assert s["pixels"] > 0 and os.path.exists(s["png"])


def test_cli_curate_and_pack(tmp_path):
    """The curate/pack CLI surface over a small corpus."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    corpus = tmp_path / "docs"
    corpus.mkdir()
    texts = ["common words common words " * 20, "common words", None]
    pq.write_table(
        pa.table({"doc_id": [0, 1, 2], "text": texts}),
        str(corpus / "d.parquet"),
    )
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin", "HOME": "/root",
           "RAY_ADDRESS": "local"}
    r = subprocess.run(
        [sys.executable, "-m", "rayraster.cli", "--num-cpus", "4",
         "curate", "--input", str(corpus / "*.parquet"),
         "--out", str(tmp_path / "feats")],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    s = json.loads(r.stdout.strip().splitlines()[-1])
    assert s["docs"] == 3  # NULL-text doc survives with und features
    import pandas as pd

    feats = pd.read_parquet(str(tmp_path / "feats"))
    assert {"quality", "dup_line_frac", "top_word_frac", "mean_freq"} <= set(
        feats.columns
    )
    by = feats.set_index("doc_id")
    assert by.loc[0, "mean_freq"] > 0  # common tokens score
    assert pd.isna(by.loc[2, "mean_freq"])  # token-less: unscored

    r = subprocess.run(
        [sys.executable, "-m", "rayraster.cli", "--num-cpus", "4",
         "curate", "--input", str(corpus / "*.parquet"),
         "--out", str(tmp_path / "feats_lm"), "--lm", "both"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    flm = pd.read_parquet(str(tmp_path / "feats_lm")).set_index("doc_id")
    assert {"bigram_count", "lm_logprob_q", "kn_logprob_q"} <= set(flm.columns)
    assert flm.loc[0, "bigram_count"] > 0 and flm.loc[0, "lm_logprob_q"] < 0
    assert flm.loc[0, "kn_logprob_q"] < 0
    assert pd.isna(flm.loc[2, "lm_logprob_q"])  # no bigrams: unscored

    r = subprocess.run(
        [sys.executable, "-m", "rayraster.cli", "--num-cpus", "4",
         "pack", "--input", str(corpus / "*.parquet"),
         "--out", str(tmp_path / "packed"),
         "--window", "100", "--stride", "80", "--budget", "200"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    s = json.loads(r.stdout.strip().splitlines()[-1])
    packed = pd.read_parquet(str(tmp_path / "packed")).sort_values(
        ["doc_id", "chunk_idx"]
    )
    assert s["chunks"] == len(packed)
    assert s["shards"] == int(packed.bin_id.max()) + 1
    # prefix consistency across the shard table
    assert (
        packed.tokens_before.diff().dropna()
        == packed.chunk_len[:-1].values
    ).all()


def test_cli_index_search_pagerank(tmp_path):
    """The index/search/pagerank CLI surface."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    corpus = tmp_path / "docs"
    corpus.mkdir()
    pq.write_table(
        pa.table({"doc_id": [0, 1, 2, 3],
                  "text": ["alpha beta", "alpha", "beta gamma", "alpha beta x"]}),
        str(corpus / "d.parquet"),
    )
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin", "HOME": "/root",
           "RAY_ADDRESS": "local"}
    r = subprocess.run(
        [sys.executable, "-m", "rayraster.cli", "--num-cpus", "4",
         "index", "--input", str(corpus / "*.parquet"),
         "--out", str(tmp_path / "idx"), "--num-buckets", "8"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    r = subprocess.run(
        [sys.executable, "-m", "rayraster.cli", "--num-cpus", "4",
         "search", "--index", str(tmp_path / "idx"),
         "--terms", "alpha,beta", "--mode", "and"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    s = json.loads(r.stdout.strip().splitlines()[-1])
    assert s["matches"] == 2 and s["head"] == [0, 3]

    edges = tmp_path / "edges"
    edges.mkdir()
    ids = np.arange(50, dtype=np.int64)
    pq.write_table(
        pa.table({"src": ids, "dst": np.zeros(50, dtype=np.int64)}),
        str(edges / "e.parquet"),
    )
    r = subprocess.run(
        [sys.executable, "-m", "rayraster.cli", "--num-cpus", "4",
         "pagerank", "--input", str(edges / "*.parquet"),
         "--out", str(tmp_path / "pr"), "--iterations", "3",
         "--num-buckets", "8"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    s = json.loads(r.stdout.strip().splitlines()[-1])
    assert s["top"][0][0] == 0  # the star center dominates
    assert s["top"][0][1] > s["top"][1][1] * 5


def test_cli_embed_selfjoin_kcore(tmp_path):
    """The embed → selfjoin pipeline and the kcore command."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    corpus = tmp_path / "docs"
    corpus.mkdir()
    texts = [f"the quick brown fox number {i} jumps over the lazy dog" for i in range(30)]
    texts += texts[:5]  # near-identical tails -> meaningful neighbours
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": texts}),
        str(corpus / "d.parquet"),
    )
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin", "HOME": "/root",
           "RAY_ADDRESS": "local"}
    r = subprocess.run(
        [sys.executable, "-m", "rayraster.cli", "--num-cpus", "4",
         "embed", "--input", str(corpus / "*.parquet"),
         "--out", str(tmp_path / "emb"), "--dim", "32"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["rows"] == len(texts)

    r = subprocess.run(
        [sys.executable, "-m", "rayraster.cli", "--num-cpus", "4",
         "selfjoin", "--input", str(tmp_path / "emb") + "/*.parquet",
         "--out", str(tmp_path / "nn"), "--id-col", "doc_id",
         "--k", "3", "--slab-rows", "12"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["pairs"] == len(texts) * 3
    nn = pq.read_table(str(tmp_path / "nn")).to_pandas()
    # the duplicated docs must rank their exact copies first
    first = nn[(nn.qid == 30) & (nn["rank"] == 1)]
    assert first.doc_id.tolist() == [0]

    edges = tmp_path / "edges"
    edges.mkdir()
    # a 6-clique plus a dangling path: 5-core = the clique
    cl = [(a, b) for a in range(6) for b in range(6) if a < b]
    path = [(6, 7), (7, 8)]
    src, dst = zip(*(cl + path))
    pq.write_table(
        pa.table({"src": pa.array(src, type=pa.int64()),
                  "dst": pa.array(dst, type=pa.int64())}),
        str(edges / "e.parquet"),
    )
    r = subprocess.run(
        [sys.executable, "-m", "rayraster.cli", "--num-cpus", "4",
         "kcore", "--input", str(edges / "*.parquet"),
         "--out", str(tmp_path / "core"), "--k", "5", "--num-buckets", "4"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["core_nodes"] == 6
    core = sorted(pq.read_table(str(tmp_path / "core")).to_pandas().node)
    assert core == [0, 1, 2, 3, 4, 5]


def test_plot_fill_scale_passthrough_knobs(tmp_path):
    """option / direction / limits / na_color parity with the
    reference's scale_fill_viridis_c(...) pass-through (R/main.R:819):
    magma endpoints paint, direction=-1 flips the ramp, out-of-limits
    pixels render as na_color, and unknown options raise."""
    import struct
    import zlib

    from rayraster.plot import colormap

    df = pd.DataFrame(
        {"ix": [0, 1, 2, 3], "iy": [0, 0, 0, 0], "sum_a": [1.0, 2.0, 3.0, 99.0]}
    )

    def pixels_of(path):
        raw = open(path, "rb").read()
        iw, ih = struct.unpack(">II", raw[16:24])
        idat = raw.index(b"IDAT")
        ln = struct.unpack(">I", raw[idat - 4 : idat])[0]
        px = np.frombuffer(
            zlib.decompress(raw[idat + 4 : idat + 4 + ln]), dtype=np.uint8
        )
        return set(map(tuple, px.reshape(ih, 1 + iw * 3)[:, 1:].reshape(-1, 3)))

    # magma option: its endpoints (not viridis') appear in the legend bar
    p, _, _ = plot_raster(
        df, str(tmp_path / "m.png"), option="magma", show_legend=True
    )
    flat = pixels_of(p)
    assert (0, 0, 4) in flat and (252, 253, 191) in flat
    assert (68, 1, 84) not in flat
    # direction=-1 maps the LOW end to the table's last stop
    lo_rev = tuple(colormap(np.array([0.0]), "viridis", -1)[0])
    assert lo_rev == (253, 231, 37)
    p2, _, _ = plot_raster(df, str(tmp_path / "r.png"), direction=-1)
    assert (253, 231, 37) in pixels_of(p2)
    # limits censor: 99.0 falls outside (0, 4) and paints na_color;
    # legend labels carry the explicit limits
    p3, _, _ = plot_raster(
        df, str(tmp_path / "lim.png"), limits=(0.0, 4.0),
        na_color=(255, 0, 0), show_legend=True,
    )
    assert (255, 0, 0) in pixels_of(p3)
    with pytest.raises(ValueError, match="unknown colormap"):
        plot_raster(df, str(tmp_path / "x.png"), option="jet")
    with pytest.raises(ValueError, match="limits"):
        plot_raster(df, str(tmp_path / "x.png"), limits=(4.0, 0.0))
    # categorical option/direction forwards to the level LUT
    from rayraster.plot import plot_raster_categorical

    cdf = pd.DataFrame({"ix": [0, 1], "iy": [0, 0], "lab": ["a", "b"]})
    _, _, _, lut = plot_raster_categorical(
        cdf, str(tmp_path / "c.png"), "lab", option="plasma"
    )
    assert lut["a"] == (13, 8, 135) and lut["b"] == (240, 249, 33)


def test_cli_dedup_spanrm(tmp_path):
    """CLI span-removal surface: shared 3-gram runs excised from every
    copy, rebuilt corpus written with removal stats."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    corpus = tmp_path / "docs"
    corpus.mkdir()
    shared = "alpha beta gamma"
    pq.write_table(
        pa.table({
            "doc_id": [0, 1, 2],
            "text": [f"one {shared} two", f"{shared} three", "untouched words here"],
        }),
        str(corpus / "d.parquet"),
    )
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin", "HOME": "/root",
           "RAY_ADDRESS": "local"}
    r = subprocess.run(
        [sys.executable, "-m", "rayraster.cli", "--num-cpus", "4",
         "dedup", "--method", "spanrm", "--ngram", "3",
         "--input", str(corpus / "*.parquet"),
         "--out", str(tmp_path / "clean")],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["rows_in"] == 3 and summary["rows_kept"] == 3
    got = pq.read_table(str(tmp_path / "clean")).to_pandas().sort_values("doc_id")
    assert list(got.text) == ["one two", "three", "untouched words here"]
    assert list(got.n_removed) == [3, 3, 0]


def test_cli_s2(tmp_path):
    """s2 subcommand: encode + rollup equals a direct coarse encode."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rayraster import s2cell as s2
    from rayraster.geo import geocode_id

    ids = np.arange(0, 900, dtype=np.int64)
    nch = (ids % 101).astype(np.int64)
    src = tmp_path / "docs"
    src.mkdir()
    pq.write_table(pa.table({"doc_id": ids, "n_chars": nch}),
                   str(src / "d.parquet"))
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin", "HOME": "/root",
           "RAY_ADDRESS": "local"}
    r = subprocess.run(
        [sys.executable, "-m", "rayraster.cli", "--num-cpus", "4",
         "s2", "--input", str(src / "*.parquet"), "--out", str(tmp_path / "cells"),
         "--level", "6", "--rollup", "1", "--value-cols", "n_chars"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["level"] == 5
    got = pq.read_table(str(tmp_path / "cells")).to_pandas()
    assert summary["cells"] == len(got)
    assert got.num_cell.sum() == 900 and got.sum_n_chars.sum() == nch.sum()
    # direct level-5 encode oracle
    x, y = geocode_id(ids)
    t = s2.s2_encode(pa.table({"doc_id": ids, "n_chars": nch,
                               "x": x, "y": y}), 5)
    import pandas as pd

    want = (
        t.select(["s2_id", "n_chars"]).to_pandas()
        .groupby("s2_id")
        .agg(sum_n_chars=("n_chars", "sum"), num_cell=("n_chars", "size"))
        .reset_index()
    )
    g = got[["s2_id", "sum_n_chars", "num_cell"]].sort_values("s2_id").reset_index(drop=True)
    w = want.astype({"num_cell": "int64"}).sort_values("s2_id").reset_index(drop=True)
    assert g.equals(w[["s2_id", "sum_n_chars", "num_cell"]])


def test_cli_profile(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {"doc_id": pa.array(list(range(300)), type=pa.int64()),
         "lang": pa.array((["en", "fr", None] * 100), type=pa.string())}
    )
    pq.write_table(t, str(tmp_path / "d.parquet"))
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin", "HOME": "/root",
           "RAY_ADDRESS": "local"}
    r = subprocess.run(
        [sys.executable, "-m", "rayraster.cli", "--num-cpus", "4",
         "profile", "--input", str(tmp_path / "d.parquet"),
         "--columns", "doc_id,lang"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])["profile"]
    assert out["doc_id"] == {"n": 300, "nulls": 0, "n_distinct": 300,
                             "min_v": "0", "max_v": "299"}
    assert out["lang"] == {"n": 300, "nulls": 100, "n_distinct": 2,
                           "min_v": "en", "max_v": "fr"}


def test_cli_compact(ray_session, tmp_path):
    import glob as _glob
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data as rd
    from rayraster.join import write_bucketed

    t = pa.table({"k": pa.array(np.arange(120, dtype=np.int64) % 9),
                  "v": pa.array(np.arange(120, dtype=np.int64))})
    layout = str(tmp_path / "lay")
    write_bucketed(rd.from_arrow(t), "k", layout, num_buckets=4)
    # fragment: one row per file
    for bdir in _glob.glob(os.path.join(layout, "_bucket=*")):
        for f in _glob.glob(os.path.join(bdir, "*.parquet")):
            tt = pq.read_table(f)
            os.remove(f)
            for i in range(tt.num_rows):
                pq.write_table(tt.slice(i, 1), os.path.join(bdir, f"f{i:04d}.parquet"))
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin", "HOME": "/root",
           "RAY_ADDRESS": "local"}
    r = subprocess.run(
        [sys.executable, "-m", "rayraster.cli", "--num-cpus", "4",
         "compact", "--layout", layout, "--target-rows", "1000"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["buckets_compacted"] == 4
    assert out["files_before"] == 120 and out["files_after"] == 4
    rows = pa.concat_tables(
        [pq.read_table(f) for f in sorted(
            _glob.glob(os.path.join(layout, "_bucket=*", "*.parquet")))]
    )
    assert sorted(rows["v"].to_pylist()) == list(range(120))


def test_incremental_ingest_example(tmp_path):
    """The examples/ table-ops composition runs end-to-end with exact
    bookkeeping: day1 = day0 + inserts - deletes; the diff counts are
    closed-form functions of the change-log construction."""
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin", "HOME": "/root",
           "RAY_ADDRESS": "local"}
    rows = 5000
    r = subprocess.run(
        [sys.executable, "/root/repo/examples/incremental_ingest.py",
         "--rows", str(rows), "--num-cpus", "4", "--out", str(tmp_path / "ing")],
        capture_output=True, text=True, env=env, timeout=400,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    s = json.loads(r.stdout.strip().splitlines()[-1])
    n_upd = len([i for i in range(rows) if i % 7 == 0])
    n_del = len([i for i in range(rows) if i % 131 == 0])
    n_both = len([i for i in range(rows) if i % 7 == 0 and i % 131 == 0])
    n_ins = rows // 10
    assert s["day1_rows"] == rows + n_ins - n_del
    assert s["diff"] == {
        "added": n_ins, "removed": n_del, "changed": n_upd - n_both,
    }
    assert s["compact"]["buckets_compacted"] == 1
    assert s["compact"]["files_after"] < s["compact"]["files_before"]
    assert s["split"]["train"] + s["split"]["val"] == s["day1_rows"]


def test_cli_keywords_and_dbscan(tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = ["graph rank graph node", "rank graph node edge",
             "node edge graph rank"] * 30
    pq.write_table(
        pa.table({"text": pa.array(texts, type=pa.string())}),
        str(tmp_path / "docs.parquet"),
    )
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin", "HOME": "/root",
           "RAY_ADDRESS": "local"}
    r = subprocess.run(
        [sys.executable, "-m", "rayraster.cli", "--num-cpus", "4",
         "keywords", "--input", str(tmp_path / "docs.parquet"),
         "--out", str(tmp_path / "kw"), "--k", "3"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["top"][0][0] == "graph" and len(out["top"]) == 3

    rng = np.random.default_rng(5)
    n = 60
    x = np.concatenate([rng.uniform(0, 1, n // 2), rng.uniform(100, 101, n // 2 - 1), [500.0]])
    y = np.concatenate([rng.uniform(0, 1, n // 2), rng.uniform(100, 101, n // 2 - 1), [500.0]])
    pq.write_table(
        pa.table({"id": np.arange(n, dtype=np.int64), "x": x, "y": y}),
        str(tmp_path / "pts.parquet"),
    )
    r = subprocess.run(
        [sys.executable, "-m", "rayraster.cli", "--num-cpus", "4",
         "dbscan", "--input", str(tmp_path / "pts.parquet"),
         "--out", str(tmp_path / "db"), "--eps", "2.0"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out == {"out": str(tmp_path / "db"), "points": n,
                   "noise": 1, "clusters": 2}


def test_terrain_pipeline_example(tmp_path):
    """The examples/ geospatial composition runs end-to-end with
    invariant bookkeeping: cost-distance from the pits reaches every
    cell (D8 flow always leads to a pit), KDE covers at least the
    occupied cells, every basin label is a pit."""
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin", "HOME": "/root",
           "RAY_ADDRESS": "local"}
    r = subprocess.run(
        [sys.executable, "/root/repo/examples/terrain_pipeline.py",
         "--rows", "20000", "--num-cpus", "4", "--out", str(tmp_path / "tr")],
        capture_output=True, text=True, env=env, timeout=400,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    s = json.loads(r.stdout.strip().splitlines()[-1])
    assert s["reached"] == s["cells"]          # min-plus converged
    assert s["kde_cells"] >= s["cells"]        # density spreads outward
    assert 0 < s["basins"] <= s["cells"]
    assert 0 < s["contour_blocks"]
    import pyarrow.parquet as pq

    basins = pq.read_table(str(tmp_path / "tr/basins")).to_pandas()
    fa = pq.read_table(str(tmp_path / "tr/flow_acc")).to_pandas()
    assert len(basins) == s["cells"] and len(fa) == s["cells"]
    # total accumulation mass = sum over cells of (1 + upstream count)
    assert fa.acc.min() >= 1


def test_cli_pointstats(tmp_path):
    """pointstats subcommand: Ripley/CE/variogram JSON over a point
    parquet, cross-checked against brute numpy."""
    import math

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(8)
    n = 250
    t = pa.table(
        {
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "x": pa.array(rng.uniform(0, 80, n)),
            "y": pa.array(rng.uniform(0, 80, n)),
            "v": pa.array(rng.integers(0, 9, n).astype(np.int64)),
        }
    )
    p = tmp_path / "pts.parquet"
    pq.write_table(t, p)
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin", "HOME": "/root",
           "RAY_ADDRESS": "local"}
    r = subprocess.run(
        [sys.executable, "-m", "rayraster.cli", "--num-cpus", "4",
         "pointstats", "--input", str(p), "--radii", "5,10",
         "--value-col", "v"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    x = t["x"].to_numpy()
    y = t["y"].to_numpy()
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    np.fill_diagonal(d2, np.inf)
    assert out["n"] == n
    for row, rr in zip(out["ripley"], (5.0, 10.0)):
        assert row["r"] == rr
        assert row["npairs"] == int(np.count_nonzero(d2 <= rr * rr))
    assert 0.5 < out["clark_evans"]["r_index"] < 1.5  # CSR-ish input
    assert len(out["variogram"]) >= 1
    assert all(v["gamma"] >= 0.0 for v in out["variogram"])


def test_cli_classify_cdc_transitions(tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pa.table({
        "doc_id": pa.array(list(range(6)), type=pa.int64()),
        "lang": pa.array(["en", "en", "fr", "fr", "en", "fr"]),
        "text": pa.array([
            "the cat sat", "the dog ran", "le chat dort", "le chien court",
            "cat and dog", "chat et chien",
        ]),
    })
    pq.write_table(docs, str(tmp_path / "docs.parquet"))
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
           "HOME": "/root", "RAY_ADDRESS": "local"}

    r = subprocess.run(
        [sys.executable, "-m", "rayraster.cli", "--num-cpus", "4",
         "classify", "--input", str(tmp_path / "docs.parquet"),
         "--out", str(tmp_path / "cls")],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["classes"] == ["en", "fr"]
    assert out["train_accuracy"] == 1.0  # separable vocabulary

    r = subprocess.run(
        [sys.executable, "-m", "rayraster.cli", "--num-cpus", "4",
         "cdc", "--input", str(tmp_path / "docs.parquet"),
         "--out", str(tmp_path / "chunks"),
         "--min-size", "1", "--avg-bits", "3", "--max-size", "64"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["chunks"] >= 6 and out["total_bytes"] >= out["distinct_bytes"]

    ev = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2], type=pa.int64()),
        "ts": pa.array([1, 2, 3, 1, 2], type=pa.int64()),
        "event_type": pa.array(["view", "click", "buy", "view", "click"]),
    })
    pq.write_table(ev, str(tmp_path / "ev.parquet"))
    r = subprocess.run(
        [sys.executable, "-m", "rayraster.cli", "--num-cpus", "4",
         "transitions", "--input", str(tmp_path / "ev.parquet"),
         "--out", str(tmp_path / "tm")],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["transitions"] == 2
    assert [["view", "click", 2], ["click", "buy", 1]] == sorted(
        out["top"], key=lambda x: -x[2]
    )


def test_cli_dedup_ppjoin(tmp_path):
    """CLI dedup --method ppjoin: exact set-similarity near-dup — a
    one-word-suffix twin must cluster with its base (no LSH recall
    luck involved), and distinct docs survive."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    corpus = tmp_path / "docs"
    corpus.mkdir()
    rows = []
    for i in range(30):
        words = " ".join(f"w{i}x{j}" for j in range(20))
        rows.append({"doc_id": i, "text": words})
        rows.append({"doc_id": i + 1000, "text": words + " extra"})
    pq.write_table(
        pa.table({"doc_id": [r["doc_id"] for r in rows],
                  "text": [r["text"] for r in rows]}),
        str(corpus / "d.parquet"),
    )
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin", "HOME": "/root",
           "RAY_ADDRESS": "local"}
    r = subprocess.run(
        [sys.executable, "-m", "rayraster.cli", "--num-cpus", "4",
         "dedup", "--input", str(corpus / "*.parquet"),
         "--out", str(tmp_path / "keep"),
         "--method", "ppjoin", "--threshold", "0.9"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["rows_in"] == 60 and summary["rows_kept"] == 30
    kept = pq.read_table(str(tmp_path / "keep")).to_pandas()
    assert sorted(kept.doc_id) == list(range(30))


def test_cli_graphstats(tmp_path):
    """graphstats: SCC + truss parquet outputs + the JSON stats line."""
    import itertools

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    edir = tmp_path / "edges"
    edir.mkdir()
    edges = [(0, 1), (1, 2), (2, 0), (3, 4)]          # one 3-cycle + a chain
    edges += [(10, 11), (11, 10)]                     # a mutual pair
    edges += [(a, b) for a, b in itertools.combinations(range(20, 24), 2)]
    pq.write_table(
        pa.table({"src": pa.array([e[0] for e in edges], type=pa.int64()),
                  "dst": pa.array([e[1] for e in edges], type=pa.int64())}),
        str(edir / "e.parquet"),
    )
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin", "HOME": "/root",
           "RAY_ADDRESS": "local"}
    r = subprocess.run(
        [sys.executable, "-m", "rayraster.cli", "--num-cpus", "4",
         "graphstats", "--input", str(edir / "*.parquet"),
         "--out", str(tmp_path / "gs"), "--truss-k", "4"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    # K4 clique: 6 edges survive 4-truss; 4 triangles + the 3-cycle = 5
    assert info["truss_edges"] == 6
    assert info["triangles"] == 5
    # mutual pair + the 3-cycle are the reciprocated directed edges
    assert info["reciprocity"]["mutual"] == 2
    scc = pq.read_table(str(tmp_path / "gs" / "scc")).to_pydict()
    lab = dict(zip(scc["node"], scc["scc"]))
    assert lab[0] == lab[1] == lab[2] == 0 and lab[3] == 3 and lab[4] == 4


def test_webgraph_pipeline_example(tmp_path):
    """The examples/ web-graph composition runs end-to-end from raw
    HTML bytes with invariant bookkeeping: 3 planted anchors per page
    all extract (edges = 3n), the 3-out-regular graph is one giant
    SCC, and the whole-graph scalars are sane."""
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin", "HOME": "/root",
           "RAY_ADDRESS": "local"}
    r = subprocess.run(
        [sys.executable, "/root/repo/examples/webgraph_pipeline.py",
         "--rows", "2000", "--num-cpus", "4", "--out", str(tmp_path / "wg")],
        capture_output=True, text=True, env=env, timeout=400,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    s = json.loads(r.stdout.strip().splitlines()[-1])
    assert s["edges"] == 3 * s["pages"]  # every planted anchor extracted
    assert s["scc_nontrivial"] > s["pages"] // 2
    assert 0.0 <= s["reciprocity"]["reciprocity"] <= 1.0
    import pyarrow.parquet as pq

    pr = pq.read_table(str(tmp_path / "wg/pagerank")).to_pandas()
    assert len(pr) == s["pages"] and (pr.pr > 0).all()
    hi = pq.read_table(str(tmp_path / "wg/hits")).to_pandas()
    assert len(hi) == s["pages"]


def test_categorical_plot_handles_unlisted_level(ray_session, tmp_path):
    """Regression: a category absent from factor_levels produced NaN
    codes that crashed colormap (floor(NaN) -> INT64_MIN index); it
    must render as the NA color like the reference's na.value."""
    import pandas as pd

    from rayraster.plot import plot_raster_categorical

    df = pd.DataFrame({"ix": [0, 1, 2], "iy": [0, 0, 0],
                       "lang": ["fr", "en", "de"]})
    path, w, h, lut = plot_raster_categorical(
        df, str(tmp_path / "c.png"), "lang", factor_levels=["fr", "en"])
    assert w >= 3 and set(lut) == {"fr", "en"}


def test_plot_raster_all_nan_column_with_legend(ray_session, tmp_path):
    """Regression: an all-NaN value column with show_legend=True
    raised on an empty reduction."""
    import pandas as pd

    from rayraster.plot import plot_raster

    df = pd.DataFrame({"ix": [0, 1], "iy": [0, 0],
                       "v": [float("nan"), float("nan")]})
    path, w, h = plot_raster(df, str(tmp_path / "n.png"), "v",
                             show_legend=True)
    assert w >= 2


def test_seraster_api_rejects_empty_members(ray_session):
    from rayraster.seraster_api import rasterize_gene_expression

    with pytest.raises(ValueError, match="empty"):
        rasterize_gene_expression({}, 10.0, ["f1"])


def test_cli_rasterize_geocode_id_requires_value_cols(tmp_path):
    """Regression: --geocode id with the default value column failed
    with a KeyError deep inside a shard task; now a fast arg error."""
    import subprocess
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                  "v": pa.array([1.0, 2.0])}),
        str(tmp_path / "in.parquet"),
    )
    r = subprocess.run(
        [sys.executable, "-m", "rayraster.cli", "rasterize",
         "--input", str(tmp_path / "*.parquet"), "--out",
         str(tmp_path / "o"), "--resolution", "1.0", "--geocode", "id"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 2
    assert "value-cols" in r.stderr
