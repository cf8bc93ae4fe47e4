"""Web-graph analytics pipeline: raw HTML → link graph → structure.

The link-analysis story a Common-Crawl-scale corpus needs, composed
end-to-end from the engine's native operators (all streaming Ray
Data, every stage an exchange pattern proven by the oracle gates):

  pages (synthetic, deterministic — url/html/text)
      → extract_links        (vectorized href carving from raw bytes)
      → host parse           (url_host + digit parse → doc-id edges)
      → pagerank             (int64 fixed-point, bucketed edge layout)
      → hits                 (hubs & authorities, exact-int rounds)
      → scc                  (Trim + FW-BW — link rings / redirect
                              cycles are exactly the non-trivial SCCs)
      → k_truss + edge_support (spam-farm filter: edges in ≥ k−2
                              triangles survive; support = the edge-
                              strength feature)
      → reciprocity + degree_moments (whole-graph health scalars)
      → parquet per product  (resumable, partitioned outputs)

Run:  PYTHONPATH=. python examples/webgraph_pipeline.py [--rows 20000]
"""

from __future__ import annotations

import argparse
import json
import tempfile


def main(rows: int = 20_000, out_dir: str | None = None,
         num_cpus: int | None = None) -> dict:
    import numpy as np
    import pyarrow as pa

    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus or 8,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from rayraster.extract import extract_links
    from rayraster.graph import (
        degree_moments,
        edge_support,
        hits,
        k_truss,
        pagerank,
        reciprocity,
        scc,
    )
    from rayraster.synth import make_pages_batch

    out = out_dir or tempfile.mkdtemp(prefix="webgraph_")
    n = int(rows)

    # --- 1. synthesize pages and inject deterministic <a href> links
    # (the synth template carries no anchors; a crawl corpus does —
    # the injector appends a nav block with formula-planted links so
    # the extractor works on REAL html bytes end-to-end)
    def with_links(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        pages = make_pages_batch(ids)
        htmls = []
        for i, h in zip(ids.tolist(), pages["html"].to_pylist()):
            nav = "".join(
                f'<a href="https://example-{(i * m + c) % n:08d}.test/page">l</a>'
                for m, c in ((7, 3), (13, 11), (29, 5))
            )
            htmls.append(h + nav.encode())
        return pa.table(
            {"doc_id": t["doc_id"],
             "html": pa.array(htmls, type=pa.binary())}
        )

    ids = rd.range(n).map_batches(
        lambda t: pa.table({"doc_id": t["id"].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    pages = ids.map_batches(with_links, batch_format="pyarrow")

    # --- 2. carve the edges from the raw bytes
    import pyarrow.compute as pc

    def to_edges(t: pa.Table) -> pa.Table:
        e = extract_links(t)
        got = pc.extract_regex(e["link"], r"example-(?P<d>\d{8})\.test")
        ok = pc.is_valid(got)
        return pa.table(
            {"src": e["doc_id"].filter(ok),
             "dst": pc.cast(pc.struct_field(got, "d"), pa.int64()).filter(ok)}
        )

    edges = pages.map_batches(to_edges, batch_format="pyarrow").materialize()
    m_edges = edges.count()

    # --- 3. structure
    pr = pagerank(
        edges.map_batches(
            lambda t: pa.table({"src": t["src"], "dst": t["dst"]}),
            batch_format="pyarrow",
        ),
        edges_path=f"{out}/pr_edges", iterations=3,
    )
    pr.write_parquet(f"{out}/pagerank")
    ha = hits(edges, rounds=2, edge_count=m_edges)
    ha.write_parquet(f"{out}/hits")
    comps = scc(edges, edge_count=m_edges)
    comps.write_parquet(f"{out}/scc")
    truss = k_truss(edges, k=3, edge_count=m_edges)
    truss.write_parquet(f"{out}/truss")
    sup = edge_support(edges, edge_count=m_edges)
    sup.write_parquet(f"{out}/support")
    rec = reciprocity(edges, edge_count=m_edges)
    mom = degree_moments(edges, edge_count=m_edges)

    report = {
        "out": out,
        "pages": n,
        "edges": m_edges,
        "scc_nontrivial": int(
            comps.map_batches(
                lambda t: pa.table(
                    {"x": pa.array([int(
                        (t["scc"].to_numpy(zero_copy_only=False)
                         != t["node"].to_numpy(zero_copy_only=False)).sum()
                    )], type=pa.int64())}
                ),
                batch_format="pyarrow",
            ).sum("x") or 0
        ),
        "truss_edges": truss.count(),
        "reciprocity": rec,
        "assortativity": mom["assortativity"],
    }
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000)
    ap.add_argument("--out", default=None)
    ap.add_argument("--num-cpus", type=int, default=None)
    a = ap.parse_args()
    main(a.rows, a.out, a.num_cpus)
