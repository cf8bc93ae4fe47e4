"""Distributed link-graph operators: fixed-point PageRank.

The reference (SEraster, ``/root/reference/R/main.R``) has no graph
operators — this family comes from the task's Common-Crawl north rule
(BASELINE.json ``north_star``: web pages at 10^12-row scale), where
the canonical iterative whole-corpus computation is PageRank over the
page link graph.

Design (the 100-TB shape):

* **Edges are persisted bucketed by ``src`` ONCE** via
  :func:`rayraster.join.write_bucketed` — the big side of the
  per-iteration join never moves again (the fact-table pattern; an
  existing layout at ``edges_path`` is reused, which also makes a
  multi-day run resumable after a restart).
* **Each iteration shuffles only the rank table** (one row per node):
  ranks are hash-tagged with the SAME :func:`~rayraster.join.key_bucket`
  the layout used, co-located with one ``groupby(bucket)`` exchange,
  and each bucket task reads its edge partition locally, computes
  out-degrees with a C++ ``group_by`` (all edges of a ``src`` live in
  its bucket, so the degree is locally complete), fans contributions
  out to destinations and **pre-aggregates per ``dst`` inside the
  bucket** before the second exchange (the combiner).
* **Fixed-point integer arithmetic**: ranks are int64 multiples of
  ``1/scale``; a node of rank ``r`` and out-degree ``d`` sends
  ``(r * damping_num) // (damping_den * d)`` to each successor and
  every node receives ``scale * (damping_den - damping_num) //
  damping_den`` teleport mass.  Integer sums are order-independent, so
  the result is bit-identical across partitionings, cluster sizes and
  a DuckDB twin — float PageRank cannot promise any of that.
  Dangling nodes (out-degree 0) keep their mass to themselves minus
  damping, i.e. their outflow is simply dropped (the standard
  simplified formulation; the SQL twin drops it identically).

Overflow bound (checked, not assumed): a node's rank can never exceed
the total mass ``num_nodes * scale``, so the per-edge product needs
``num_nodes * scale * damping_num < 2**63``.

NULL edge endpoints follow the engine-wide convention (NULL keys
never match in equi-joins): a null-src edge contributes nothing, a
null-dst contribution lands on a phantom node the membership marker
drops — deterministic, pinned by test, never silent corruption.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from rayraster.agg import hash_aggregate
from rayraster.dedup import _adaptive_parts
from rayraster.join import (
    _BUCKET_HASH,
    _read_bucket_manifest,
    key_bucket,
    write_bucketed,
)

_EMPTY_CONTRIB = pa.schema([("node", pa.int64()), ("c", pa.int64()), ("m", pa.int64())])


def _edge_layout(
    edges: Dataset,
    edges_path: str,
    num_buckets: int,
    weight_col: str | None = None,
) -> tuple[str, dict]:
    """Ensure the bucketed edge layout (+ per-bucket out-degree
    sidecars) exists at ``edges_path`` and return it.  A layout whose
    manifest matches ``num_buckets`` AND the engine's bucket-hash
    version AND the sidecar's weighting mode is reused as-is —
    re-running a job against the same path skips the only edge
    exchange.  A hash-version mismatch forces a rewrite (rank rows are
    tagged with the CURRENT ``key_bucket``; joining them against
    buckets written by an older hash would silently mis-co-locate —
    the same failure ``bucket_join_prebucketed`` refuses).

    ``weight_col``: when set, the layout keeps that int64 column and
    the sidecar stores per-src WEIGHT SUMS instead of plain counts.

    Returns ``(path, meta)`` — meta holds ``max_w`` (largest single
    edge weight) and ``max_W`` (largest per-src degree/weight-sum),
    recorded at build time for the caller's exact overflow checks."""
    import json as _json

    import ray.data as rd

    meta_path = os.path.join(edges_path, "_deg", "_META.json")

    def _load_meta() -> dict | None:
        try:
            with open(meta_path) as f:
                return _json.load(f)
        except (FileNotFoundError, ValueError):
            return None

    try:
        m = _read_bucket_manifest(edges_path)
        if (
            m["num_buckets"] == num_buckets
            and m["key"] == "src"
            and m.get("hash") == _BUCKET_HASH
        ):
            # the sidecar counts only when its completion marker landed
            # — a crash mid-build would otherwise leave SOME deg files,
            # and missing ones read as "bucket has no edges", silently
            # dropping contributions.  A weighting-mode mismatch also
            # invalidates it (count sidecars are not weight sums).
            meta = _load_meta()
            if (
                os.path.exists(os.path.join(edges_path, "_deg", "_DONE"))
                and meta is not None
                and meta.get("weight_col") == weight_col
            ):
                return edges_path, meta
            path = edges_path  # layout fine, only the sidecar missing
        else:
            path = write_bucketed(edges, "src", edges_path, num_buckets=num_buckets)
    except (FileNotFoundError, KeyError, ValueError):
        path = write_bucketed(edges, "src", edges_path, num_buckets=num_buckets)

    # out-degrees / out-weight-sums are iteration-invariant: compute
    # them ONCE per bucket at layout time (one independent task per
    # bucket), not once per bucket per PageRank round
    manifest = _read_bucket_manifest(path)
    written = manifest.get("buckets_written", list(range(num_buckets)))
    deg_dir = os.path.join(path, "_deg")
    os.makedirs(deg_dir, exist_ok=True)
    # invalidate FIRST: an interrupted rebuild (e.g. weighting-mode
    # switch that crashes mid-way) must never leave a stale marker/META
    # beside mixed count/weight-sum files — a later run in the old mode
    # would silently reuse them
    for stale in ("_DONE", "_META.json"):
        try:
            os.remove(os.path.join(deg_dir, stale))
        except FileNotFoundError:
            pass
    wcols = ("src",) if weight_col is None else ("src", weight_col)

    def build_deg(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        done = []
        maxw = []
        maxW = []
        for b in batch["b"].to_pylist():
            et = _read_edge_bucket(path, int(b), set(written), columns=wcols)
            if weight_col is None:
                deg = et.group_by("src").aggregate([("src", "count")])
                bucket_max = 1
            else:
                w = et[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
                if len(w) and w.min() < 1:
                    raise ValueError("pagerank: edge weights must be >= 1")
                deg = et.group_by("src").aggregate([(weight_col, "sum")])
                bucket_max = int(w.max(initial=1))
            deg = deg.rename_columns(["src", "deg"])
            pq.write_table(deg, os.path.join(deg_dir, f"deg_{int(b)}.parquet"))
            done.append(int(b))
            maxw.append(bucket_max)
            d = deg["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
            maxW.append(int(d.max(initial=1)))
        return pa.table(
            {"b": pa.array(done, type=pa.int64()),
             "maxw": pa.array(maxw, type=pa.int64()),
             "maxW": pa.array(maxW, type=pa.int64())}
        )

    max_w, max_W = 1, 1
    if written:
        got = rd.from_items(
            [{"b": b} for b in written], override_num_blocks=len(written)
        ).map_batches(build_deg, batch_format="pyarrow").to_pandas()
        if len(got):
            max_w = int(got["maxw"].max())
            max_W = int(got["maxW"].max())
    meta = {"weight_col": weight_col, "max_w": max_w, "max_W": max_W}
    with open(meta_path, "w") as f:
        _json.dump(meta, f)
    with open(os.path.join(deg_dir, "_DONE"), "w") as f:
        f.write("ok")
    return path, meta


def _read_edge_bucket(
    edges_path: str, b: int, written: set[int], columns=("src", "dst")
) -> pa.Table:
    files = sorted(glob.glob(os.path.join(edges_path, f"_bucket={b}", "*.parquet")))
    if not files:
        if b in written:
            raise FileNotFoundError(
                f"edge bucket {b} is in {edges_path}'s manifest but has no"
                " files visible from this node; refusing to silently drop"
                " its contributions"
            )
        return pa.table({c: pa.array([], pa.int64()) for c in columns})
    import pyarrow.parquet as pq

    return pa.concat_tables(
        pq.read_table(f, columns=list(columns)) for f in files
    )


def _read_deg_bucket(
    edges_path: str, b: int, written: set[int] | None = None
) -> pa.Table | None:
    """Degree sidecar for bucket ``b``; None only when the bucket
    genuinely has no edges.  A sidecar missing for a bucket the
    manifest says WAS written is data loss (node-local path on a
    multi-node cluster, manual deletion) — raise, exactly like
    :func:`_read_edge_bucket` does for the edges themselves."""
    f = os.path.join(edges_path, "_deg", f"deg_{b}.parquet")
    if not os.path.exists(f):
        if written is not None and b in written:
            raise FileNotFoundError(
                f"degree sidecar for bucket {b} is missing under"
                f" {edges_path}/_deg though the bucket was written —"
                " refusing to silently zero its contributions"
            )
        return None
    import pyarrow.parquet as pq

    return pq.read_table(f)


def pagerank(
    edges: Dataset,
    edges_path: str,
    nodes: Dataset | None = None,
    iterations: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 1_000_000_000,
    num_buckets: int = 64,
    node_count: int | None = None,
    seeds: "np.ndarray | None" = None,
    weight_col: str | None = None,
) -> Dataset:
    """Fixed-point PageRank over an int64 ``(src, dst)`` edge Dataset.

    Returns a Dataset of ``(node, pr)`` — ``pr`` is the int64
    fixed-point rank after ``iterations`` synchronous rounds starting
    from ``rank_0 = scale`` per node.  Divide by ``scale`` for the
    conventional float value; keep the integer for bit-exact
    comparisons.

    ``nodes``: optional ``(node)`` Dataset naming the vertex set; when
    omitted it is discovered as ``distinct(src) ∪ distinct(dst)`` (one
    extra exchange).  ``node_count`` skips a ``count()`` when the
    caller already knows it (used for the overflow check and adaptive
    exchange sizing).

    ``seeds``: optional array of node ids for PERSONALIZED PageRank —
    teleport mass (and the initial rank) goes only to the seed set, so
    ranks measure authority *relative to the seeds* (random walk with
    restart).  The seed array rides each task's closure: it is meant
    for the usual small personalization sets; for a huge seed set,
    pre-join a seed flag onto ``nodes`` and run the uniform variant
    per flag partition instead.

    ``weight_col``: optional int64 edge-weight column (≥ 1) for
    WEIGHTED PageRank — an edge of weight ``w`` from a node whose
    outgoing weights sum to ``W`` carries
    ``(r * damping_num * w) // (damping_den * W)``; the sidecar stores
    weight sums and the overflow bound tightens to
    ``n · scale · damping_num · max_w < 2^63`` (``max_w`` is recorded
    at layout time, so the check is exact, not assumed).

    Exchanges: 1 (edge layout, skipped when ``edges_path`` already
    holds a matching layout) + [1 if nodes are discovered] + 2 per
    iteration (rank co-location; contribution aggregate).  Nothing is
    ever materialized on the driver.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if not (0 < damping_num < damping_den):
        raise ValueError(
            f"need 0 < damping_num < damping_den, got {damping_num}/{damping_den}"
        )

    _RESERVED = {"src", "dst", "rank", "W", "deg", "node", "c", "m"}
    if weight_col in _RESERVED:
        raise ValueError(
            f"weight_col {weight_col!r} collides with an internal join"
            f" column — rename it (reserved: {sorted(_RESERVED)})"
        )
    path, layout_meta = _edge_layout(
        edges, edges_path, num_buckets, weight_col=weight_col
    )
    manifest = _read_bucket_manifest(path)
    written = set(manifest.get("buckets_written", range(num_buckets)))
    max_w = int(layout_meta.get("max_w", 1))
    max_W = int(layout_meta.get("max_W", 1))

    if nodes is None:
        from rayraster.agg import distinct

        def endpoints(t: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            # drop NULL endpoints: a null would survive distinct() as
            # its own group (a phantom node collecting teleport mass)
            # and float-promote downstream int64 node batches
            s = _pc.drop_null(t["src"].cast(pa.int64()))
            d = _pc.drop_null(t["dst"].cast(pa.int64()))
            return pa.table(
                {"node": pa.chunked_array(list(s.chunks) + list(d.chunks), pa.int64())}
            )

        both = edges.map_batches(endpoints, batch_format="pyarrow")
        nodes = distinct(
            both, ["node"], num_partitions=_adaptive_parts(node_count, num_buckets)
        ).materialize()
    if node_count is None:
        nodes = nodes.materialize()
        node_count = nodes.count()

    if node_count * scale * damping_num * max_w >= 2**63:
        raise ValueError(
            "fixed-point overflow: num_nodes*scale*damping_num*max_weight = "
            f"{node_count * scale * damping_num * max_w} >= 2^63 — lower `scale`"
        )
    if damping_den * max_W >= 2**63:
        # the per-edge denominator dd*W must also fit (max_W is the
        # largest per-src degree/weight-sum, recorded at layout time —
        # checked, not assumed; a wrap here would flip contributions
        # negative with no error)
        raise ValueError(
            f"fixed-point overflow: damping_den*max_out_weight_sum = "
            f"{damping_den * max_W} >= 2^63"
        )
    teleport = scale * (damping_den - damping_num) // damping_den
    agg_parts = _adaptive_parts(node_count, num_buckets)
    dn = np.int64(damping_num)
    dd = np.int64(damping_den)
    seed_arr = (
        None if seeds is None
        else np.unique(np.asarray(seeds, dtype=np.int64))
    )

    def _seed_flag(node_col) -> np.ndarray:
        ids = node_col.to_numpy(zero_copy_only=False).astype(np.int64)
        if seed_arr is None:
            return np.ones(len(ids), dtype=np.int64)
        return np.isin(ids, seed_arr).astype(np.int64)

    def init_ranks(t: pa.Table) -> pa.Table:
        node = t["node"].cast(pa.int64())
        sd = _seed_flag(node)
        return pa.table(
            {"node": node, "rank": pa.array(sd * np.int64(scale))}
        )

    ranks = nodes.map_batches(init_ranks, batch_format="pyarrow").materialize()
    if seed_arr is not None and ranks.sum("rank") == 0:
        # a seed set disjoint from the vertex set (wrong id space —
        # e.g. raw ints against fnv-hashed nodes) would otherwise run
        # every round and silently return all-zero ranks
        raise ValueError(
            "pagerank: no seed id is in the vertex set — seeds must use"
            " the same id space as the nodes"
        )

    def tag_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_bucket", pa.array(key_bucket(t["node"].combine_chunks(), num_buckets))
        )

    def contribs(g: pa.Table) -> pa.Table:
        """Rank rows of ONE bucket → per-dst partial contribution sums.

        The edge partition is read locally; out-degrees come from the
        per-bucket sidecar written once at layout time (they are
        iteration-invariant — recomputing the group_by every round was
        pure waste)."""
        b = int(g["_bucket"][0].as_py())
        deg = _read_deg_bucket(path, b, written)
        if deg is None:  # bucket with no edges written
            return _EMPTY_CONTRIB.empty_table()
        rt = pa.table({"src": g["node"], "rank": g["rank"]})
        per_src = rt.join(deg, keys=["src"], join_type="inner")
        if per_src.num_rows == 0:
            return _EMPTY_CONTRIB.empty_table()
        r = per_src["rank"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = per_src["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        if weight_col is None:
            # unweighted: one contribution value per src, fanned as-is
            per_src = pa.table(
                {"src": per_src["src"], "c": pa.array((r * dn) // (d * dd))}
            )
            et = _read_edge_bucket(path, b, written)
            fan = et.join(per_src, keys=["src"], join_type="inner")
        else:
            # weighted: contribution differs per EDGE — join rank and
            # the weight SUM onto the edges, divide per edge
            per_src = pa.table(
                {"src": per_src["src"], "rank": pa.array(r), "W": pa.array(d)}
            )
            et = _read_edge_bucket(
                path, b, written, columns=("src", "dst", weight_col)
            )
            fan = et.join(per_src, keys=["src"], join_type="inner")
            fr = fan["rank"].to_numpy(zero_copy_only=False).astype(np.int64)
            fw = fan[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
            fW = fan["W"].to_numpy(zero_copy_only=False).astype(np.int64)
            fan = pa.table(
                {"dst": fan["dst"],
                 "c": pa.array((fr * dn * fw) // (dd * fW))}
            )
        out = fan.group_by("dst").aggregate([("c", "sum")])
        return pa.table(
            {
                "node": out["dst"].cast(pa.int64()),
                "c": out["c_sum"].cast(pa.int64()),
                "m": pa.array(np.zeros(out.num_rows, dtype=np.int64)),
            }
        )

    def zeros(t: pa.Table) -> pa.Table:
        # the membership marker: only nodes present in the CURRENT rank
        # table carry m=1.  A dst outside the declared vertex set gets
        # contributions but no marker and is dropped in finish — the
        # exact semantics of the SQL twin's LEFT JOIN onto r_{i-1}
        # (without this, phantom nodes would silently enter the ranks)
        n_rows = t.num_rows
        return pa.table(
            {
                "node": t["node"],
                "c": pa.array(np.zeros(n_rows, dtype=np.int64)),
                # the marker doubles as the teleport weight: 2 = member
                # AND seed (gets teleport), 1 = member only
                "m": pa.array(np.int64(1) + _seed_flag(t["node"])),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        m = t["sum_m"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = t.filter(pa.array(m >= 1))
        m = m[m >= 1]
        s = t["sum_c"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"node": t["node"], "rank": pa.array(s + (m - 1) * np.int64(teleport))}
        )

    for _ in range(iterations):
        partials = (
            ranks.map_batches(tag_bucket, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(contribs, batch_format="pyarrow")
        )
        # every node appears (zero row from the rank table itself), so
        # in-link-less nodes still get their teleport row downstream
        folded = hash_aggregate(
            partials.union(ranks.map_batches(zeros, batch_format="pyarrow")),
            keys=["node"],
            sum_cols=["c", "m"],
            count=False,
            num_partitions=agg_parts,
        )
        ranks = folded.map_batches(finish, batch_format="pyarrow").materialize()

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"], "pr": t["rank"]})

    return ranks.map_batches(project, batch_format="pyarrow")


def triangle_count(
    edges: Dataset,
    num_buckets: int = 64,
    edge_count: int | None = None,
    broadcast_threshold: int = 2_000_000,
) -> int:
    """EXACT distributed triangle count of the undirected support of an
    int64 ``(src, dst)`` edge Dataset (self-loops dropped, duplicate /
    reverse edges collapsed).

    Skew-safe formulation: edges are oriented from their lower-
    ``(degree, id)`` endpoint, so a hub of degree d generates wedges
    only at neighbors that are "heavier" than it — the classic bound
    of O(m^1.5) wedges total regardless of degree skew (a value-
    ordered orientation would generate C(d, 2) wedges at every hub).

    Dual path (the near-dup verify pattern): when the distinct edge
    set fits the broadcast threshold, the degree map and the closing
    edge set ship ONCE via ``ray.put`` — exchanges: distinct dedup,
    degree aggregate, wedge self-join (3 total; every exchange costs
    a fixed barrier, measured repeatedly).  Above the threshold the
    fully partitioned path runs: two degree-attach bucket joins and a
    packed-key closing semi-join instead of the broadcasts (6
    exchanges, nothing driver- or broadcast-resident).  Both paths
    return identical counts (tested).  Node ids must satisfy
    |id| < 2^31 (wedge endpoints pack into one int64 key — checked,
    not assumed).
    """
    import ray

    from rayraster.agg import distinct, hash_aggregate
    from rayraster.join import bucket_join

    P = _adaptive_parts(edge_count, num_buckets)

    und = _undirected_distinct(edges, P).materialize()
    # consumed three times (degrees, orientation, closing)
    und_schema = pa.schema([("lo", pa.int64()), ("hi", pa.int64())])

    deg = hash_aggregate(
        und.map_batches(_edge_endpoints, batch_format="pyarrow"),
        ["node"], count=True, count_name="deg", num_partitions=P,
    )
    deg_schema = pa.schema([("node", pa.int64()), ("deg", pa.int64())])

    m_edges = edge_count if edge_count is not None else und.count()
    o_schema = pa.schema([("c", pa.int64()), ("o", pa.int64())])

    if m_edges <= broadcast_threshold:
        # deg table ≤ 2m rows: ship it once, orient in a pure map
        deg_pd = deg.to_pandas()
        order = np.argsort(deg_pd["node"].to_numpy())
        deg_ref = ray.put(
            (deg_pd["node"].to_numpy()[order].astype(np.int64),
             deg_pd["deg"].to_numpy()[order].astype(np.int64))
        )

        def orient_bc(t: pa.Table) -> pa.Table:
            nodes, degs = ray.get(deg_ref)
            lo = t["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
            hi = t["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
            dl = degs[np.searchsorted(nodes, lo)]
            dh = degs[np.searchsorted(nodes, hi)]
            lo_first = (dl < dh) | ((dl == dh) & (lo < hi))
            return pa.table(
                {"c": pa.array(np.where(lo_first, lo, hi)),
                 "o": pa.array(np.where(lo_first, hi, lo))}
            )

        # materialize: bucket_join consumes BOTH sides of the self-join
        # from this chain — unmaterialized, orient_bc would run twice
        oriented = und.map_batches(orient_bc, batch_format="pyarrow").materialize()
        wedges = bucket_join(
            oriented, oriented, "c", "c", num_buckets=P,
            left_schema=o_schema, right_schema=o_schema,
        ).map_batches(_pack_pairs, batch_format="pyarrow")

        # closing check against the broadcast sorted packed edge set
        pk_parts = und.map_batches(
            _pack_und, batch_format="pyarrow"
        ).to_pandas()["pk"].to_numpy()
        edge_set_ref = ray.put(np.sort(pk_parts.astype(np.int64)))

        def count_closed(t: pa.Table) -> pa.Table:
            es = ray.get(edge_set_ref)
            pk = t["pk"].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(es, pk)
            pos_c = np.minimum(pos, max(len(es) - 1, 0))
            hit = (es[pos_c] == pk) if len(es) else np.zeros(len(pk), bool)
            return pa.table({"n": pa.array([int(hit.sum())], type=pa.int64())})

        counts = wedges.map_batches(count_closed, batch_format="pyarrow")
        total = counts.sum("n")
        return int(total) if total is not None else 0

    # partitioned path: degree-attach joins + packed-key closing semi
    with_lo = bucket_join(
        und, deg, "lo", "node", num_buckets=P,
        left_schema=und_schema, right_schema=deg_schema,
    )  # lo, hi, deg
    with_both = bucket_join(
        with_lo.map_batches(
            lambda t: t.rename_columns(["lo", "hi", "deg_lo"]),
            batch_format="pyarrow",
        ),
        deg, "hi", "node", num_buckets=P,
        left_schema=pa.schema(
            [("lo", pa.int64()), ("hi", pa.int64()), ("deg_lo", pa.int64())]
        ),
        right_schema=deg_schema,
    )  # lo, hi, deg_lo, deg (deg of hi)

    def orient(t: pa.Table) -> pa.Table:
        lo = t["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = t["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        dl = t["deg_lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        dh = t["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        # lighter (deg, id) endpoint becomes the wedge center
        lo_first = (dl < dh) | ((dl == dh) & (lo < hi))
        return pa.table(
            {
                "c": pa.array(np.where(lo_first, lo, hi)),
                "o": pa.array(np.where(lo_first, hi, lo)),
            }
        )

    oriented = with_both.map_batches(orient, batch_format="pyarrow").materialize()

    # wedges: two oriented edges sharing the center; dedupe the
    # (b, c) / (c, b) double-count by requiring o < o_r
    wedges = bucket_join(
        oriented, oriented, "c", "c", num_buckets=P,
        left_schema=o_schema, right_schema=o_schema,
    ).map_batches(_pack_pairs, batch_format="pyarrow")

    und_packed = und.map_batches(_pack_und, batch_format="pyarrow")
    closed = bucket_join(
        wedges, und_packed, "pk", "pk", num_buckets=P, join_type="semi",
        left_schema=pa.schema([("pk", pa.int64())]),
        right_schema=pa.schema([("pk", pa.int64())]),
    )
    return closed.count()


def _pack_lo_hi(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """THE injective (lo, hi) → int64 closing-edge key (|id| < 2^31,
    callers check).  One definition — the wedge side and both und
    sides must hash identically or the closing join matches nothing."""
    return lo.astype(np.int64) * np.int64(1 << 32) + hi.astype(np.int64)


def _pack_und(t: pa.Table) -> pa.Table:
    return pa.table(
        {"pk": pa.array(_pack_lo_hi(
            t["lo"].to_numpy(zero_copy_only=False),
            t["hi"].to_numpy(zero_copy_only=False),
        ))}
    )


def _pack_pairs(t: pa.Table) -> pa.Table:
    """Wedge rows (c, o, o_r) → packed closing-edge keys, dropping the
    self/double-counted half (keep o < o_r, which already fixes the
    (lo, hi) order)."""
    o = t["o"].to_numpy(zero_copy_only=False).astype(np.int64)
    o2 = t["o_r"].to_numpy(zero_copy_only=False).astype(np.int64)
    keep = o < o2
    return pa.table({"pk": pa.array(_pack_lo_hi(o[keep], o2[keep]))})


def _norm_undirected(t: pa.Table) -> pa.Table:
    """(src, dst) batch → (lo, hi) with self-loops AND null-endpoint
    edges dropped (engine convention: NULL keys never match — an edge
    to NULL is no adjacency; without the explicit filter the nullable
    to_numpy would float-promote and collapse every NULL onto one
    INT64_MIN phantom node).  |id| < 2^31 enforced (the closing-key
    packing bound); INT64_MIN's |abs| stays negative, so the bound is
    checked on both signs explicitly."""
    import pyarrow.compute as pc

    valid = pc.and_(pc.is_valid(t["src"]), pc.is_valid(t["dst"]))
    t = t.filter(valid)
    s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    lim = np.int64(1 << 31)
    if len(s) and (
        s.max(initial=0) >= lim or d.max(initial=0) >= lim
        or s.min(initial=0) <= -lim or d.min(initial=0) <= -lim
    ):
        raise ValueError("graph op: |node id| must be < 2^31")
    keep = s != d
    s, d = s[keep], d[keep]
    return pa.table(
        {"lo": pa.array(np.minimum(s, d)), "hi": pa.array(np.maximum(s, d))}
    )


def _undirected_distinct(edges: Dataset, num_partitions: int) -> Dataset:
    """Distinct undirected support of an (src, dst) edge Dataset."""
    from rayraster.agg import distinct

    return distinct(
        edges.map_batches(
            _norm_undirected, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["lo", "hi"],
        num_partitions=num_partitions,
    )


def _edge_endpoints(t: pa.Table) -> pa.Table:
    lo = t["lo"].to_numpy(zero_copy_only=False)
    hi = t["hi"].to_numpy(zero_copy_only=False)
    return pa.table({"node": pa.array(np.concatenate([lo, hi]))})


def bfs_depths(
    edges: Dataset,
    sources,
    num_buckets: int = 64,
    edge_count: int | None = None,
    max_depth: int = 64,
    broadcast_threshold: int = 1_000_000,
) -> Dataset:
    """Multi-source BFS hop distance over the undirected support
    (self-loops / duplicate edges collapsed): every node reachable
    from ``sources`` with its minimum hop count — crawl-frontier
    depth, seed-proximity scoring, reachability layers.

    Level-synchronous iteration, rounds = graph diameter.  The
    frontier and visited sets are O(V) node ids — tiny next to the
    edge table (the 100-TB side, which NEVER leaves the cluster) — so
    the round has two shapes picked by the CURRENT state size:

    * frontier AND visited ≤ ``broadcast_threshold`` (the usual
      case): state lives on the driver as sorted int64 arrays (≤ 8 MB
      at the default threshold — the same small-state-on-driver shape
      as ``exact_quantiles``' histogram folds), the frontier ships
      once via ``ray.put`` and the whole round is ONE map-only
      ``is_in`` gather pass over the distributed edge table with
      per-batch dedup, folded into ``setdiff`` on the driver — ZERO
      exchanges per level (the previous distinct + anti-join shape
      cost 2 exchanges + a count barrier per level: 140 s of pure
      barrier floor on a 10-level 50k-node gate graph).
    * above it: state spills into Datasets mid-flight — two semi
      bucket-joins gather neighbors, an anti bucket-join excludes
      visited, nothing driver-side.

    Returns a Dataset of ``(node, depth)``; unreached nodes are
    absent.  Raises if the graph is deeper than ``max_depth``."""
    import ray
    import ray.data as rd
    import pyarrow.compute as pc

    from rayraster.agg import distinct
    from rayraster.join import bucket_join

    P = _adaptive_parts(edge_count, num_buckets)
    und = _undirected_distinct(edges, P).materialize()
    node_schema = pa.schema([("node", pa.int64())])

    src = np.unique(np.asarray(list(sources), dtype=np.int64))
    if len(src) == 0:
        raise ValueError("bfs_depths: need at least one source node")

    # driver-mode state (None once spilled to Datasets)
    frontier_ids: np.ndarray | None = src
    visited_ids: np.ndarray | None = src
    done_tables: list[pa.Table] = [
        pa.table({"node": pa.array(src),
                  "depth": pa.array(np.zeros(len(src), dtype=np.int64))})
    ]
    # dataset-mode state
    frontier_ds: Dataset | None = None
    visited_ds: Dataset | None = None
    ds_levels: list[Dataset] = []
    n_frontier = len(src)
    if n_frontier > broadcast_threshold:  # giant seed set: spill at once
        frontier_ds = rd.from_arrow(
            pa.table({"node": pa.array(src)})
        ).materialize()
        visited_ds = frontier_ds
        frontier_ids = visited_ids = None

    def _finish() -> Dataset:
        out = rd.from_arrow(pa.concat_tables(done_tables))
        return out.union(*ds_levels) if ds_levels else out

    # max_depth + 1 rounds: the LAST round only verifies the frontier
    # is empty, so a graph whose deepest node sits at exactly
    # max_depth hops converges instead of spuriously raising (the
    # k_core fixpoint-check convention)
    for depth in range(1, max_depth + 2):
        if frontier_ids is not None:
            ref = ray.put(frontier_ids)

            def gather(t: pa.Table, _ref=ref) -> pa.Table:
                vs = pa.array(ray.get(_ref))
                lo_hit = t.filter(pc.is_in(t["lo"], value_set=vs))["hi"]
                hi_hit = t.filter(pc.is_in(t["hi"], value_set=vs))["lo"]
                nodes = np.unique(np.concatenate([
                    lo_hit.to_numpy(zero_copy_only=False),
                    hi_hit.to_numpy(zero_copy_only=False),
                ]))
                return pa.table({"node": pa.array(nodes)})

            cand_parts = [
                b["node"].to_numpy(zero_copy_only=False)
                for b in und.map_batches(
                    gather, batch_format="pyarrow", zero_copy_batch=True
                ).iter_batches(batch_format="pyarrow")
            ]
            uniq = (
                np.unique(np.concatenate(cand_parts))
                if cand_parts else np.zeros(0, dtype=np.int64)
            )
            nxt_ids = np.setdiff1d(uniq, visited_ids, assume_unique=True)
            n_frontier = len(nxt_ids)
            if n_frontier == 0:
                return _finish()
            if depth > max_depth:
                break  # genuinely deeper than max_depth: raise below
            done_tables.append(
                pa.table({"node": pa.array(nxt_ids),
                          "depth": pa.array(np.full(n_frontier, depth,
                                                    dtype=np.int64))})
            )
            visited_ids = np.union1d(visited_ids, nxt_ids)
            frontier_ids = nxt_ids
            if (n_frontier > broadcast_threshold
                    or len(visited_ids) > broadcast_threshold):
                # spill state into Datasets; partitioned path takes over
                frontier_ds = rd.from_arrow(
                    pa.table({"node": pa.array(frontier_ids)})
                ).materialize()
                visited_ds = rd.from_arrow(
                    pa.table({"node": pa.array(visited_ids)})
                ).materialize()
                frontier_ids = visited_ids = None
            continue

        lo_side = bucket_join(
            und, frontier_ds, "lo", "node", num_buckets=P, join_type="semi",
            left_schema=pa.schema([("lo", pa.int64()), ("hi", pa.int64())]),
            right_schema=node_schema,
        ).map_batches(
            lambda t: pa.table({"node": t["hi"]}), batch_format="pyarrow"
        )
        hi_side = bucket_join(
            und, frontier_ds, "hi", "node", num_buckets=P, join_type="semi",
            left_schema=pa.schema([("lo", pa.int64()), ("hi", pa.int64())]),
            right_schema=node_schema,
        ).map_batches(
            lambda t: pa.table({"node": t["lo"]}), batch_format="pyarrow"
        )
        nxt = bucket_join(
            distinct(lo_side.union(hi_side), ["node"], num_partitions=P),
            visited_ds,
            "node",
            "node",
            num_buckets=P,
            join_type="anti",
            left_schema=node_schema,
            right_schema=node_schema,
        ).materialize()
        n_frontier = nxt.count()
        if n_frontier == 0:
            return _finish()
        if depth > max_depth:
            break  # genuinely deeper than max_depth: raise below
        frontier_ds = nxt
        ds_levels.append(
            frontier_ds.map_batches(
                lambda t, d=depth: t.append_column(
                    "depth", pa.array(np.full(t.num_rows, d, dtype=np.int64))
                ),
                batch_format="pyarrow",
            )
        )
        visited_ds = visited_ds.union(frontier_ds)
    raise RuntimeError(
        f"bfs_depths did not converge within {max_depth} levels — "
        "raise max_depth for deeper graphs"
    )


def k_core(
    edges: Dataset,
    k: int,
    num_buckets: int = 64,
    edge_count: int | None = None,
    max_rounds: int = 200,
    broadcast_threshold: int = 100_000,
) -> Dataset:
    """Nodes of the k-core: the maximal subgraph of the undirected
    support in which every node has degree ≥ ``k`` (self-loops and
    duplicate/reverse edges collapsed first) — the standard
    graph-density filter (spam farms and link rings live in dense
    cores; isolated tails don't).

    Iterative peeling, all distributed: each round computes degrees
    over the SURVIVING edge set and drops every node below ``k`` plus
    its edges.  Both halves of the round are adaptive to the O(V)
    state sizes the driver already tracks:

    * degree computation — once the surviving NODE count is known to
      be ≤ ``broadcast_threshold``, it is a map-only per-batch
      endpoint-bincount pass folded on the driver (the same
      small-state-on-driver shape as ``bfs_depths``; driver traffic
      is bounded by batches × alive nodes) — ZERO exchanges; above
      the threshold (or on the first round, before the node count is
      known) it is one hash-partitioned aggregate.
    * the drop — ``dying ≤ broadcast_threshold`` (the common thin
      shell): dying ids ship ONCE via ``ray.put``, both endpoint
      checks collapse to a map-only ``is_in`` filter — zero
      exchanges; above it: two anti bucket joins, nothing
      driver-side.

    A round that kills nobody is the fixpoint.  Rounds are bounded by
    the peeling depth (≤ n/2 pathological chains; raises at
    ``max_rounds`` rather than looping forever).

    Returns a Dataset of ``(node,)``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    import ray
    import ray.data as rd
    import pyarrow.compute as pc

    from rayraster.agg import hash_aggregate
    from rayraster.join import bucket_join

    P = _adaptive_parts(edge_count, num_buckets)
    und_schema = pa.schema([("lo", pa.int64()), ("hi", pa.int64())])
    node_schema = pa.schema([("node", pa.int64())])
    cur = _undirected_distinct(edges, P).materialize()
    # surviving node count — exact after the first round; before it,
    # the 2·|E| endpoint bound lets small graphs skip the aggregate
    # from round 1
    alive_n: int | None = 2 * edge_count if edge_count is not None else None

    def _deg_partial(t: pa.Table) -> pa.Table:
        ends = np.concatenate([
            t["lo"].to_numpy(zero_copy_only=False),
            t["hi"].to_numpy(zero_copy_only=False),
        ])
        uniq, cnt = np.unique(ends, return_counts=True)
        return pa.table({"node": pa.array(uniq), "cnt": pa.array(cnt.astype(np.int64))})

    # max_rounds KILL-rounds plus one final fixpoint check (without the
    # +1, a graph converging on exactly the last kill would spuriously
    # raise before its fixpoint check could run)
    for _ in range(max_rounds + 1):
        if alive_n is not None and alive_n <= broadcast_threshold:
            # driver-state round: fold per-batch degree partials
            nparts, cparts = [], []
            for b in cur.map_batches(
                _deg_partial, batch_format="pyarrow", zero_copy_batch=True
            ).iter_batches(batch_format="pyarrow"):
                nparts.append(b["node"].to_numpy(zero_copy_only=False))
                cparts.append(b["cnt"].to_numpy(zero_copy_only=False))
            if nparts:
                nodes = np.concatenate(nparts)
                uniq, inv = np.unique(nodes, return_inverse=True)
                degs = np.bincount(
                    inv, weights=np.concatenate(cparts)
                ).astype(np.int64)
            else:
                uniq = np.zeros(0, dtype=np.int64)
                degs = uniq
            dying_ids = uniq[degs < k]
            alive_ids = uniq[degs >= k]
            alive_n = len(alive_ids)
            n_dying = len(dying_ids)
            if n_dying == 0:
                return rd.from_arrow(pa.table({"node": pa.array(alive_ids)}))
            # dying ≤ uniq ≤ the previous round's alive bound ≤ the
            # threshold, so the drop in this mode is always broadcast
            dying = None
        else:
            # deg already holds the surviving node set — it serves BOTH
            # the dying filter and the fixpoint projection (no extra
            # distinct pass over the final edge set)
            deg = hash_aggregate(
                cur.map_batches(_edge_endpoints, batch_format="pyarrow"),
                ["node"], count=True, count_name="deg", num_partitions=P,
            ).materialize()
            alive_n = deg.count()  # metadata count on the materialized set
            dying = deg.map_batches(
                lambda t: t.filter(pc.less(t["deg"], k)).select(["node"]),
                batch_format="pyarrow",
            ).materialize()  # consumed twice (both drops) + counted
            n_dying = dying.count()
            alive_n -= n_dying
            if n_dying == 0:
                return deg.map_batches(
                    lambda t: t.select(["node"]), batch_format="pyarrow"
                )
            dying_ids = None
        if n_dying <= broadcast_threshold:
            if dying_ids is None:
                dying_ids = np.sort(
                    np.fromiter(
                        (r["node"] for r in dying.take_all()), dtype=np.int64,
                        count=n_dying,
                    )
                )
            ref = ray.put(dying_ids)

            def drop_bcast(t: pa.Table, _ref=ref) -> pa.Table:
                vs = pa.array(ray.get(_ref))
                keep = pc.and_(
                    pc.invert(pc.is_in(t["lo"], value_set=vs)),
                    pc.invert(pc.is_in(t["hi"], value_set=vs)),
                )
                return t.filter(keep)

            cur = cur.map_batches(
                drop_bcast, batch_format="pyarrow", zero_copy_batch=True
            ).materialize()
        else:
            cur = bucket_join(
                cur, dying, "lo", "node", num_buckets=P, join_type="anti",
                left_schema=und_schema, right_schema=node_schema,
            )
            cur = bucket_join(
                cur, dying, "hi", "node", num_buckets=P, join_type="anti",
                left_schema=und_schema, right_schema=node_schema,
            ).materialize()
    raise RuntimeError(
        f"k_core did not converge within {max_rounds} kill-rounds — "
        "raise max_rounds for pathologically deep peeling chains"
    )


def sssp(
    edges: Dataset,
    sources,
    weight_col: str = "w",
    rounds: int = 12,
    num_buckets: int = 64,
    edge_count: int | None = None,
    broadcast_threshold: int = 1_000_000,
    edge_gather_threshold: int = 2_000_000,
) -> Dataset:
    """Multi-source weighted shortest-path distances (directed) —
    link-distance from a seed set over a weighted crawl graph, the
    weighted companion of :func:`bfs_depths` (hops) and the
    general-graph companion of :func:`rayraster.spatial.cost_distance`
    (grid min-plus).  No reference counterpart (SEraster has no graph
    ops); the pattern is the textbook synchronous Bellman–Ford /
    min-plus Jacobi.

    Runs EXACTLY ``rounds`` synchronous relaxation rounds (with an
    early exit once a round changes nothing — bit-identical to the
    fixed unroll because relaxation is idempotent at the fixpoint):
    after round ``r`` every node holds the cheapest path that uses at
    most ``r`` edges, so the result equals the true distance for all
    nodes whose shortest path has ≤ ``rounds`` edges.  Grouped-MIN
    folds are order-independent ⇒ the result is bit-identical across
    partitionings, cluster sizes and an unrolled-CTE SQL twin.

    Weights must be int64 ≥ 0 (checked on every batch — a negative
    weight would silently break the ≤-r-edges invariant).  Distances
    are exact int64 sums; every relaxation checks the exact
    ``dist + weight`` bound with Python ints and raises before an
    int64 wrap could corrupt a MIN fold.

    When the EDGE TABLE itself is small (``edge_count`` ≤
    ``edge_gather_threshold``), it is pulled to the driver once and
    every round runs locally — zero cluster passes (each synchronous
    round otherwise costs a full map pass whose barrier floor dwarfs
    the compute at small graph sizes; measured 8 s → <1 s on the
    5k-node gate graph).  Above it, like :func:`bfs_depths`, the
    distance table is O(reachable nodes) — tiny next to the edge
    table — and the round has two shapes picked by the CURRENT state
    size:

    * state ≤ ``broadcast_threshold`` rows (the usual case): the
      (sorted ids, dists) pair lives on the driver, ships once per
      round via ``ray.put``, and the whole round is ONE map-only
      relax pass over the distributed edge Dataset with per-batch
      grouped-MIN combiners — ZERO exchanges per round.
    * above it: state spills into a Dataset mid-flight; each round is
      a src-bucket co-location exchange (per-bucket local join +
      relax + combiner) followed by one grouped-MIN fold — nothing
      driver-side.

    Returns a Dataset of ``(node, dist)``; unreached nodes are absent.
    """
    import ray
    import ray.data as rd

    if rounds < 1:
        raise ValueError(f"sssp: rounds must be >= 1, got {rounds}")
    src_ids = np.unique(np.asarray(list(sources), dtype=np.int64))
    if len(src_ids) == 0:
        raise ValueError("sssp: need at least one source node")

    P = _adaptive_parts(edge_count, num_buckets)
    ecols = ["src", "dst", weight_col]

    def _relax_np(
        s: np.ndarray, d: np.ndarray, w: np.ndarray,
        ids: np.ndarray, dv: np.ndarray,
    ) -> pa.Table:
        """Candidate (dst, dist+w) rows for edges whose src is settled,
        pre-folded to one MIN per dst — the per-batch combiner."""
        if w.size and int(w.min()) < 0:
            raise ValueError("sssp: edge weights must be >= 0")
        if len(ids) == 0 or s.size == 0:
            return pa.table({"node": pa.array([], type=pa.int64()),
                             "dist": pa.array([], type=pa.int64())})
        pos = np.searchsorted(ids, s).clip(0, len(ids) - 1)
        hit = ids[pos] == s
        if not hit.any():
            return pa.table({"node": pa.array([], type=pa.int64()),
                             "dist": pa.array([], type=pa.int64())})
        hd = dv[pos[hit]]
        hw = w[hit]
        if int(hd.max()) + int(hw.max()) >= 2**63:  # exact Python ints
            raise ValueError(
                "sssp: dist + weight would overflow int64 — rescale weights"
            )
        cand = hd + hw
        dsts = d[hit]
        order = np.argsort(dsts, kind="stable")
        u, start = np.unique(dsts[order], return_index=True)
        return pa.table({"node": pa.array(u),
                         "dist": pa.array(np.minimum.reduceat(cand[order], start))})

    def _edge_np(t: pa.Table):
        import pyarrow.compute as _pc

        # NULL endpoints/weights never relax (engine-wide NULL-keys-
        # never-match rule); dropping them keeps to_numpy on the int64
        # path — a null-bearing batch float-promotes and corrupts ids
        # >= 2^53 while fabricating an INT64_MIN phantom source
        ok = _pc.and_(
            _pc.and_(_pc.is_valid(t["src"]), _pc.is_valid(t["dst"])),
            _pc.is_valid(t[weight_col]),
        )
        if not _pc.all(ok).as_py():
            t = t.filter(ok)
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return s, d, w

    if edge_count is not None and edge_count <= edge_gather_threshold:
        # small-graph fast path (the DBSCAN-finish precedent): the
        # whole edge table is ONE bounded driver pull — three int64
        # columns, ≤ ~48 MB at the default threshold — and every round
        # runs locally with the SAME relax + grouped-MIN fold math
        # (bit-identical to both cluster shapes; pinned by test),
        # replacing `rounds` synchronous cluster passes with zero.
        parts = [
            b for b in edges.select_columns(ecols)
            .iter_batches(batch_format="pyarrow") if b.num_rows
        ]
        if parts:
            s, d, w = _edge_np(pa.concat_tables(parts))
        else:
            s = d = w = np.zeros(0, dtype=np.int64)
        g_ids = src_ids
        g_dv = np.zeros(len(src_ids), dtype=np.int64)
        for _ in range(rounds):
            cand = _relax_np(s, d, w, g_ids, g_dv)
            if cand.num_rows == 0:
                break
            u = cand["node"].to_numpy(zero_copy_only=False)
            m = cand["dist"].to_numpy(zero_copy_only=False)
            all_ids = np.union1d(g_ids, u)
            nd = np.full(len(all_ids), np.iinfo(np.int64).max, dtype=np.int64)
            nd[np.searchsorted(all_ids, g_ids)] = g_dv
            np.minimum.at(nd, np.searchsorted(all_ids, u), m)
            if len(all_ids) == len(g_ids) and np.array_equal(nd, g_dv):
                break
            g_ids, g_dv = all_ids, nd
        return rd.from_arrow(
            pa.table({"node": pa.array(g_ids), "dist": pa.array(g_dv)})
        )

    # driver-mode state (None once spilled)
    ids: np.ndarray | None = src_ids
    dv: np.ndarray | None = np.zeros(len(src_ids), dtype=np.int64)
    dist_ds: Dataset | None = None
    if len(src_ids) > broadcast_threshold:
        dist_ds = rd.from_arrow(
            pa.table({"node": pa.array(src_ids),
                      "dist": pa.array(np.zeros(len(src_ids), dtype=np.int64))})
        ).materialize()
        ids = dv = None

    for _ in range(rounds):
        if ids is not None:
            ref = ray.put((ids, dv))

            def relax(t: pa.Table, _ref=ref) -> pa.Table:
                i, v = ray.get(_ref)
                return _relax_np(*_edge_np(t), i, v)

            parts = [
                b for b in edges.select_columns(ecols).map_batches(
                    relax, batch_format="pyarrow", zero_copy_batch=True
                ).iter_batches(batch_format="pyarrow")
                if b.num_rows
            ]
            if not parts:
                break
            cand = pa.concat_tables(parts)
            cn = cand["node"].to_numpy(zero_copy_only=False)
            cd = cand["dist"].to_numpy(zero_copy_only=False)
            order = np.argsort(cn, kind="stable")
            u, start = np.unique(cn[order], return_index=True)
            m = np.minimum.reduceat(cd[order], start)
            # fold with the settled table: min per node, new nodes enter
            all_ids = np.union1d(ids, u)
            nd = np.full(len(all_ids), np.iinfo(np.int64).max, dtype=np.int64)
            nd[np.searchsorted(all_ids, ids)] = dv
            cpos = np.searchsorted(all_ids, u)
            np.minimum.at(nd, cpos, m)
            if len(all_ids) == len(ids) and np.array_equal(nd, dv):
                break  # fixpoint: further rounds are identity
            ids, dv = all_ids, nd
            if len(ids) > broadcast_threshold:
                dist_ds = rd.from_arrow(
                    pa.table({"node": pa.array(ids), "dist": pa.array(dv)})
                ).materialize()
                ids = dv = None
            continue

        # partitioned shape: co-locate dist rows with their src bucket
        def tag(t: pa.Table) -> pa.Table:
            return t.append_column(
                "_bucket",
                pa.array(key_bucket(t["node"].combine_chunks(), P)),
            )

        def tag_edges(t: pa.Table) -> pa.Table:
            return t.select(ecols).append_column(
                "_bucket",
                pa.array(key_bucket(t["src"].cast(pa.int64()).combine_chunks(), P)),
            )

        def relax_bucket(g: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            st = g.filter(pc.invert(pc.is_null(g["dist"])))
            ed = g.filter(pc.is_null(g["dist"]))
            if st.num_rows == 0 or ed.num_rows == 0:
                return pa.table({"node": pa.array([], type=pa.int64()),
                                 "dist": pa.array([], type=pa.int64())})
            i = st["node"].to_numpy(zero_copy_only=False).astype(np.int64)
            v = st["dist"].to_numpy(zero_copy_only=False).astype(np.int64)
            o = np.argsort(i, kind="stable")
            s = ed["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = ed["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            w = ed[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
            return _relax_np(s, d, w, i[o], v[o])

        # one co-location exchange: dist rows (src=dst=w NULL) union
        # edge rows (dist NULL) grouped by the src bucket
        def dist_rows(t: pa.Table) -> pa.Table:
            n = t.num_rows
            null = pa.nulls(n, pa.int64())
            return pa.table({"node": t["node"], "dist": t["dist"],
                             "src": null, "dst": null, weight_col: null})

        def edge_rows(t: pa.Table) -> pa.Table:
            t = t.select(ecols)
            n = t.num_rows
            null = pa.nulls(n, pa.int64())
            return pa.table({"node": t["src"].cast(pa.int64()), "dist": null,
                             "src": t["src"].cast(pa.int64()),
                             "dst": t["dst"].cast(pa.int64()),
                             weight_col: t[weight_col].cast(pa.int64())})

        mixed = dist_ds.map_batches(dist_rows, batch_format="pyarrow").union(
            edges.map_batches(edge_rows, batch_format="pyarrow")
        )
        cands = (
            mixed.map_batches(tag, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(relax_bucket, batch_format="pyarrow")
        )
        folded = hash_aggregate(
            cands.union(dist_ds),
            keys=["node"],
            min_cols=["dist"],
            count=False,
            num_partitions=P,
        ).map_batches(
            lambda t: pa.table({"node": t["node"], "dist": t["min_dist"]}),
            batch_format="pyarrow",
        ).materialize()
        # monotone checksum: count can only grow, sum(dist) only shrink
        if (folded.count() == dist_ds.count()
                and folded.sum("dist") == dist_ds.sum("dist")):
            break
        dist_ds = folded

    if ids is not None:
        return rd.from_arrow(pa.table({"node": pa.array(ids), "dist": pa.array(dv)}))
    return dist_ds


def label_propagation(
    edges: Dataset,
    rounds: int = 2,
    num_buckets: int = 64,
    edge_count: int | None = None,
) -> Dataset:
    """Semi-synchronous label-propagation community detection (LPA,
    Raghavan et al. 2007) over the undirected support — the
    density-based community family next to the exact-component
    engines (:func:`connected_components` finds *connectivity*, LPA
    finds *densely linked* groups inside one component).

    Deterministic variant: every node updates SIMULTANEOUSLY from the
    previous round's labels (semi-synchronous Jacobi — no update
    order to race on), new label = the most frequent label among
    NEIGHBORS with ties broken to the smallest label; fixed
    ``rounds`` (asynchronous LPA's stochastic sweep order is exactly
    what a distributed engine cannot reproduce bit-for-bit, so the
    synchronous form is the contract — same trade as
    :func:`pagerank`'s fixed iterations).  Labels start as node ids,
    so round 1 is the min-neighbor relaxation and round r uses round
    r−1's labels.

    Plan: ONE distinct-support exchange up front (reused every round,
    materialized); per round one label co-location ``bucket_join`` +
    one exact (node, label) count aggregate + one ``grouped_topk``
    argmax — all hash-partitioned, label state never on the driver.
    Counts are exact ints and the tie rule is total, so the result is
    bit-identical across partitionings and cluster sizes.

    Returns ``(node, lab)`` for every non-isolated node (isolated
    nodes are their own community by definition — union them in if
    the caller's node table is wider)."""
    import pyarrow.compute as pc

    from rayraster.agg import grouped_topk, hash_aggregate
    from rayraster.join import bucket_join

    if rounds < 1:
        raise ValueError("label_propagation: rounds must be >= 1")
    P = _adaptive_parts(edge_count, num_buckets)
    und = _undirected_distinct(edges, P)

    def bidir(t: pa.Table) -> pa.Table:
        lo = t["lo"].to_numpy(zero_copy_only=False)
        hi = t["hi"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"a": pa.array(np.concatenate([lo, hi])),
             "b": pa.array(np.concatenate([hi, lo]))}
        )

    adj = und.map_batches(
        bidir, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    adj_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    lab_schema = pa.schema([("node", pa.int64()), ("lab", pa.int64())])

    labels: Dataset | None = None  # None ≡ identity labels (round 1)
    for _ in range(rounds):
        if labels is None:
            contrib = adj.map_batches(
                lambda t: pa.table({"a": t["a"], "lab": t["b"]}),
                batch_format="pyarrow",
            )
        else:
            joined = bucket_join(
                adj, labels, "b", "node", num_buckets=P,
                left_schema=adj_schema, right_schema=lab_schema,
            )
            contrib = joined.map_batches(
                lambda t: pa.table({"a": t["a"], "lab": t["lab"]}),
                batch_format="pyarrow",
            )
        counts = hash_aggregate(
            contrib, ["a", "lab"], count=True, count_name="n",
            num_partitions=P,
        )
        top = grouped_topk(
            counts, ["a"], "n", k=1, tie_col="lab", num_partitions=P
        )
        labels = top.map_batches(
            lambda t: pa.table({"node": t["a"], "lab": t["lab"]}),
            batch_format="pyarrow",
        ).materialize()  # O(V) rows; reused by the next round's join
    return labels


def hits(
    edges: Dataset,
    rounds: int = 2,
    num_buckets: int = 64,
    edge_count: int | None = None,
) -> Dataset:
    """HITS hubs & authorities (Kleinberg 1999) over the DIRECTED
    edge set — the query-independent link-analysis companion of
    :func:`pagerank` (PageRank scores endorsement flow; HITS separates
    *pointing well* (hub) from *being pointed at* (authority)).

    Exact-integer variant: scores start at 1 and stay UNNORMALIZED
    int64 through ``rounds`` synchronous mutual-reinforcement rounds

        a_r(u) = Σ_{(v,u)∈E} h_{r−1}(v);   h_r(v) = Σ_{(v,u)∈E} a_r(u)

    — every value is an exact integer (the classic L2 normalization
    only rescales the ranking, and floats would break the bit-exact
    twin rule), so results are bit-identical across partitionings and
    reproducible by unrolled SQL joins.  Scores grow like
    (max degree)^(2·rounds); a post-round driver max check RAISES
    past 2^46 (one more fold of degree ≤ 2^17 still fits int64) —
    normalize by shifting in the caller if you need more rounds.

    Plan: one distinct-directed-edge exchange up front (materialized,
    reused 2·rounds − 1 times); per half-round ONE score co-location
    ``bucket_join`` + ONE grouped-sum fold.  Round 1's a-update skips
    the join (h₀ ≡ 1 ⇒ a₁ = in-degree).

    Returns ``(node, hub, auth)`` for every endpoint node (0 = no
    out-/in-edges)."""
    import pyarrow.compute as pc

    from rayraster.agg import distinct, hash_aggregate
    from rayraster.join import bucket_join

    if rounds < 1:
        raise ValueError("hits: rounds must be >= 1")
    P = _adaptive_parts(edge_count, num_buckets)

    def dropnull(t: pa.Table) -> pa.Table:
        valid = pc.and_(pc.is_valid(t["src"]), pc.is_valid(t["dst"]))
        t = t.filter(valid)
        return pa.table(
            {"src": t["src"].cast(pa.int64()), "dst": t["dst"].cast(pa.int64())}
        )

    e = distinct(
        edges.map_batches(dropnull, batch_format="pyarrow", zero_copy_batch=True),
        ["src", "dst"], num_partitions=P,
    ).materialize()
    e_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    s_schema = pa.schema([("node", pa.int64()), ("s", pa.int64())])
    # the per-round bound must make the NEXT fold wrap-free, not just
    # cap the current scores: a fold sums up to deg_max terms, so the
    # check runs at min(2^46, 2^62 / deg_max) — with the old flat 2^46
    # a hub of degree > 2^17 could wrap int64 IN the fold and the
    # wrapped (negative/small) max would sail past the post-fold check
    _BOUND = np.int64(1) << np.int64(46)  # tightened below via deg_max

    def _check(state: Dataset, what: str) -> Dataset:
        m = state.max("s")
        if m is not None and m > _BOUND:
            raise ValueError(
                f"hits: {what} score {m} exceeds the wrap-safe bound "
                f"{_BOUND} after a round — reduce rounds or rescale"
            )
        return state

    def _fold(contrib: Dataset, key: str) -> Dataset:
        agg = hash_aggregate(
            contrib, [key], sum_cols=["s"], count=False, num_partitions=P
        )
        return agg.map_batches(
            lambda t: pa.table({"node": t[key], "s": t["sum_s"]}),
            batch_format="pyarrow",
        ).materialize()

    a = _fold(  # a₁ = in-degree (h₀ ≡ 1)
        e.map_batches(
            lambda t: pa.table(
                {"dst": t["dst"],
                 "s": pa.array(np.ones(t.num_rows, dtype=np.int64))}
            ),
            batch_format="pyarrow",
        ),
        "dst",
    )
    dout = _fold(
        e.map_batches(
            lambda t: pa.table(
                {"src": t["src"],
                 "s": pa.array(np.ones(t.num_rows, dtype=np.int64))}
            ),
            batch_format="pyarrow",
        ),
        "src",
    )
    deg_max = max(int(a.max("s") or 1), int(dout.max("s") or 1))
    _BOUND = np.int64(min(1 << 46, (1 << 62) // max(deg_max, 1)))
    h: Dataset | None = None
    for r in range(rounds):
        if r > 0:
            ja = bucket_join(
                e, h, "src", "node", num_buckets=P,
                left_schema=e_schema, right_schema=s_schema,
            )
            a = _check(_fold(
                ja.map_batches(
                    lambda t: pa.table({"dst": t["dst"], "s": t["s"]}),
                    batch_format="pyarrow",
                ), "dst",
            ), "authority")
        jh = bucket_join(
            e, a, "dst", "node", num_buckets=P,
            left_schema=e_schema, right_schema=s_schema,
        )
        h = _check(_fold(
            jh.map_batches(
                lambda t: pa.table({"src": t["src"], "s": t["s"]}),
                batch_format="pyarrow",
            ), "src",
        ), "hub")

    nodes = distinct(
        e.map_batches(
            lambda t: pa.table(
                {"node": pa.array(np.concatenate(
                    [t["src"].to_numpy(zero_copy_only=False),
                     t["dst"].to_numpy(zero_copy_only=False)]))}
            ),
            batch_format="pyarrow",
        ),
        ["node"], num_partitions=P,
    )
    nh = bucket_join(
        nodes, h, "node", "node", join_type="left", num_buckets=P,
        left_schema=pa.schema([("node", pa.int64())]), right_schema=s_schema,
    ).map_batches(
        lambda t: pa.table(
            {"node": t["node"],
             "hub": pc.fill_null(t["s"], 0).cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )
    out = bucket_join(
        nh, a, "node", "node", join_type="left", num_buckets=P,
        left_schema=pa.schema([("node", pa.int64()), ("hub", pa.int64())]),
        right_schema=s_schema,
    )
    return out.map_batches(
        lambda t: pa.table(
            {"node": t["node"], "hub": t["hub"],
             "auth": pc.fill_null(t["s"], 0).cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )


def _scc_local(src: np.ndarray, dst: np.ndarray):
    """Iterative Tarjan over int64 edge arrays → (nodes, scc_id)
    where ``scc_id`` is the MIN node id of each strongly connected
    component (the same canonical labeling the distributed engine
    emits).  Driver-side fast path for small (sub)graphs."""
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    n = len(nodes)
    cs = inv[: len(src)]
    cd = inv[len(src):]
    order = np.argsort(cs, kind="stable")
    cs, cd = cs[order], cd[order]
    starts = np.searchsorted(cs, np.arange(n + 1))
    index = np.full(n, -1, dtype=np.int64)
    low = np.zeros(n, dtype=np.int64)
    on_stack = np.zeros(n, dtype=bool)
    comp = np.full(n, -1, dtype=np.int64)
    stack: list[int] = []
    counter = 0
    for root in range(n):
        if index[root] != -1:
            continue
        # explicit DFS stack of (node, next-edge-cursor)
        work = [(root, starts[root])]
        index[root] = low[root] = counter
        counter += 1
        stack.append(root)
        on_stack[root] = True
        while work:
            v, cur = work[-1]
            if cur < starts[v + 1]:
                work[-1] = (v, cur + 1)
                w = int(cd[cur])
                if index[w] == -1:
                    index[w] = low[w] = counter
                    counter += 1
                    stack.append(w)
                    on_stack[w] = True
                    work.append((w, starts[w]))
                elif on_stack[w]:
                    low[v] = min(low[v], index[w])
            else:
                work.pop()
                if work:
                    pv = work[-1][0]
                    low[pv] = min(low[pv], low[v])
                if low[v] == index[v]:
                    members = []
                    while True:
                        w = stack.pop()
                        on_stack[w] = False
                        members.append(w)
                        if w == v:
                            break
                    m = np.asarray(members)
                    comp[m] = nodes[m].min()
    return nodes, comp


def scc(
    edges: Dataset,
    num_buckets: int = 64,
    edge_count: int | None = None,
    engine: str = "auto",
    max_outer: int = 50,
    label_rounds: int = 64,
    broadcast_threshold: int = 100_000,
) -> Dataset:
    """Strongly connected components of a DIRECTED graph; each node is
    labeled with the MIN node id of its SCC (link rings / redirect
    cycles in a web graph are exactly its non-trivial SCCs).

    Dual engine.  ``engine='local'`` (or 'auto' with ``edge_count`` ≤
    ``broadcast_threshold``): one bounded driver pull + iterative
    Tarjan.  ``engine='distributed'``: the published Trim + FW-BW
    scheme (Hong et al. 2013; McLendon et al. 2005) in min-label form,
    every step a Dataset op:

    * **trim** — endpoints missing an in- or out-degree row in the
      surviving edge set are singleton SCCs (one degree aggregate +
      two left joins per round; their edges drop via anti joins)
    * **FW/BW min-label fixpoint** — F(v) = min ancestor-or-self id
      via rounds of (in-neighbor min ⊕ pointer jump F(F(v)) — the
      jump is sound because ancestors compose, and shortcuts the
      fixpoint to O(log diameter) rounds); B(v) likewise over
      reversed edges.  One int64 label-sum checksum per round on the
      driver (labels only ever decrease, so an unchanged sum IS the
      fixpoint)
    * **resolve** — F(v) == B(v) ⟺ v is in the SCC of pivot F(v)
      (F(v) reaches v, v reaches B(v) = F(v)); resolved nodes leave
      the graph and the outer loop repeats.  Every outer round
      resolves at least the whole SCC of the minimum surviving id, so
      ≤ #SCC rounds; ``max_outer`` bounds adversarial chains.

    Isolated nodes never appear in the edge table — inject self-loops
    to label them (a self-loop trivially resolves F = B = self).

    Returns ``(node, scc)``.  Distributed and local engines are
    bit-identical (pytest-proven on random digraphs).
    """
    import ray.data as rd
    import pyarrow.compute as pc

    from rayraster.agg import distinct, hash_aggregate
    from rayraster.join import bucket_join

    if engine not in ("auto", "local", "distributed"):
        raise ValueError(f"unknown engine {engine!r}")
    P = _adaptive_parts(edge_count, num_buckets)

    def dropnull(t: pa.Table) -> pa.Table:
        valid = pc.and_(pc.is_valid(t["src"]), pc.is_valid(t["dst"]))
        t = t.filter(valid)
        return pa.table(
            {"src": t["src"].cast(pa.int64()), "dst": t["dst"].cast(pa.int64())}
        )

    e = distinct(
        edges.map_batches(dropnull, batch_format="pyarrow", zero_copy_batch=True),
        ["src", "dst"], num_partitions=P,
    ).materialize()

    if engine == "local" or (
        engine == "auto"
        and (edge_count if edge_count is not None else e.count())
        <= broadcast_threshold
    ):
        parts = [
            (b["src"].to_numpy(zero_copy_only=False),
             b["dst"].to_numpy(zero_copy_only=False))
            for b in e.iter_batches(batch_format="pyarrow")
        ]
        if parts:
            src = np.concatenate([p[0] for p in parts])
            dst = np.concatenate([p[1] for p in parts])
        else:
            src = dst = np.zeros(0, dtype=np.int64)
        nodes, comp = _scc_local(src, dst)
        return rd.from_arrow(
            pa.table({"node": pa.array(nodes), "scc": pa.array(comp)})
        )

    e_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    node_schema = pa.schema([("node", pa.int64())])
    lab_schema = pa.schema([("node", pa.int64()), ("lab", pa.int64())])
    out_parts: list[Dataset] = []
    rem = e

    def _ends(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": pa.array(np.concatenate(
                [t["src"].to_numpy(zero_copy_only=False),
                 t["dst"].to_numpy(zero_copy_only=False)]
            ))}
        )

    def _nodes_of(es: Dataset) -> Dataset:
        return distinct(
            es.map_batches(_ends, batch_format="pyarrow"),
            ["node"], num_partitions=P,
        )

    def _drop_nodes(es: Dataset, gone: Dataset) -> Dataset:
        es = bucket_join(
            es, gone, "src", "node", num_buckets=P, join_type="anti",
            left_schema=e_schema, right_schema=node_schema,
        )
        return bucket_join(
            es, gone, "dst", "node", num_buckets=P, join_type="anti",
            left_schema=e_schema, right_schema=node_schema,
        ).materialize()

    def _fb_fixpoint(es: Dataset, nodes: Dataset) -> Dataset:
        """Forward AND backward min-label fixpoints in ONE loop: the
        graph is lifted to a packed node space (F-copy of v = 2v,
        B-copy = 2v+1; forward edges 2u→2v carry ancestor labels, the
        reversed pair 2v+1→2u+1 carries descendant labels), so every
        round is a single materialized execution covering both
        directions instead of two sequential fixpoints.

        A round is: in-neighbor min fold ⊕ pointer jump
        lab(v) ← lab(lab(v)) (sound — an ancestor's ancestor is an
        ancestor; the jump probes the PREVIOUS round's labels, which
        are valid bounds, so hop coverage still grows 2h+1 per round
        → O(log diameter) rounds).  One int64 label-sum checksum per
        round on the driver: labels only ever decrease, so an
        unchanged sum IS the fixpoint.

        Returns packed ``(node, lab)``: even rows F, odd rows B, with
        ``lab`` in the ORIGINAL id space."""
        pk_schema = pa.schema([("node", pa.int64()), ("lab", pa.int64())])

        def lift_edges(t: pa.Table) -> pa.Table:
            s = t["src"].to_numpy(zero_copy_only=False)
            d = t["dst"].to_numpy(zero_copy_only=False)
            return pa.table(
                {"src": pa.array(np.concatenate([2 * s, 2 * d + 1])),
                 "dst": pa.array(np.concatenate([2 * d, 2 * s + 1]))}
            )

        pes = es.map_batches(lift_edges, batch_format="pyarrow").materialize()

        def lift_nodes(t: pa.Table) -> pa.Table:
            v = t["node"].to_numpy(zero_copy_only=False)
            return pa.table(
                {"node": pa.array(np.concatenate([2 * v, 2 * v + 1])),
                 "lab": pa.array(np.concatenate([v, v]))}
            )

        labs = nodes.map_batches(lift_nodes, batch_format="pyarrow").materialize()
        i64max = np.iinfo(np.int64).max
        prev = None
        for _ in range(label_rounds):
            offer = bucket_join(
                pes, labs, "src", "node", num_buckets=P,
                left_schema=e_schema, right_schema=pk_schema,
            )
            inc = hash_aggregate(
                offer.map_batches(
                    lambda t: pa.table({"node": t["dst"], "lab": t["lab"]}),
                    batch_format="pyarrow",
                ),
                ["node"], min_cols=["lab"], count=False, num_partitions=P,
            )

            def merge_and_key(t: pa.Table) -> pa.Table:
                lab = pc.min_element_wise(
                    t["lab"], pc.fill_null(t["min_lab"], i64max)
                )
                v = t["node"].to_numpy(zero_copy_only=False)
                jk = 2 * lab.to_numpy(zero_copy_only=False) + (v & 1)
                return pa.table(
                    {"node": t["node"], "lab": lab, "jkey": pa.array(jk)}
                )

            merged = bucket_join(
                labs, inc, "node", "node", num_buckets=P, join_type="left",
                left_schema=pk_schema,
                right_schema=pa.schema(
                    [("node", pa.int64()), ("min_lab", pa.int64())]
                ),
            ).map_batches(merge_and_key, batch_format="pyarrow")
            probe = labs.map_batches(
                lambda t: pa.table({"jn": t["node"], "jlab": t["lab"]}),
                batch_format="pyarrow",
            )
            jumped = bucket_join(
                merged, probe, "jkey", "jn", num_buckets=P, join_type="left",
                left_schema=pa.schema(
                    [("node", pa.int64()), ("lab", pa.int64()),
                     ("jkey", pa.int64())]
                ),
                right_schema=pa.schema([("jn", pa.int64()), ("jlab", pa.int64())]),
            ).map_batches(
                lambda t: pa.table(
                    {"node": t["node"],
                     "lab": pc.min_element_wise(
                         t["lab"], pc.fill_null(t["jlab"], i64max)
                     )}
                ),
                batch_format="pyarrow",
            ).materialize()
            chk = jumped.sum("lab")
            labs = jumped
            if prev is not None and chk == prev:
                break
            prev = chk
        return labs

    def _as_singletons(ns: Dataset) -> Dataset:
        return ns.map_batches(
            lambda t: pa.table({"node": t["node"], "scc": t["node"]}),
            batch_format="pyarrow",
        ).materialize()

    # the pending universe: nodes seen in edges but not yet resolved —
    # a node whose LAST edge is dropped (e.g. the middle of a trimmed
    # chain) leaves the endpoint set without ever being resolved, so
    # every round starts by emitting pending \ endpoints as singletons
    pending = _nodes_of(e).materialize()
    for _ in range(max_outer):
        nodes = _nodes_of(rem).materialize()
        orphans = bucket_join(
            pending, nodes, "node", "node", num_buckets=P, join_type="anti",
            left_schema=node_schema, right_schema=node_schema,
        ).materialize()
        if orphans.count() > 0:
            out_parts.append(_as_singletons(orphans))
        pending = nodes
        n_edges = rem.count()
        if n_edges == 0:
            break
        # --- trim: endpoints with no in-edge or no out-edge are
        # singleton SCCs (scc = own id)
        indeg = hash_aggregate(
            rem.map_batches(
                lambda t: pa.table({"node": t["dst"]}), batch_format="pyarrow"
            ),
            ["node"], count=True, count_name="ind", num_partitions=P,
        )
        outdeg = hash_aggregate(
            rem.map_batches(
                lambda t: pa.table({"node": t["src"]}), batch_format="pyarrow"
            ),
            ["node"], count=True, count_name="outd", num_partitions=P,
        )
        deg_schema_i = pa.schema([("node", pa.int64()), ("ind", pa.int64())])
        deg_schema_o = pa.schema([("node", pa.int64()), ("outd", pa.int64())])
        nd = bucket_join(
            nodes, indeg, "node", "node", num_buckets=P, join_type="left",
            left_schema=node_schema, right_schema=deg_schema_i,
        )
        nd = bucket_join(
            nd, outdeg, "node", "node", num_buckets=P, join_type="left",
            left_schema=deg_schema_i, right_schema=deg_schema_o,
        ).materialize()
        singles = nd.map_batches(
            lambda t: t.filter(
                pc.or_(pc.is_null(t["ind"]), pc.is_null(t["outd"]))
            ).select(["node"]),
            batch_format="pyarrow",
        ).materialize()
        if singles.count() > 0:
            out_parts.append(_as_singletons(singles))
            pending = bucket_join(
                pending, singles, "node", "node", num_buckets=P,
                join_type="anti",
                left_schema=node_schema, right_schema=node_schema,
            ).materialize()
            rem = _drop_nodes(rem, singles)
            continue
        # --- FW/BW min-label fixpoints (one packed loop) + resolve
        fb_labs = _fb_fixpoint(rem, nodes)

        def _unpack_f(t: pa.Table) -> pa.Table:
            v = t["node"].to_numpy(zero_copy_only=False)
            keep = t.filter(pa.array(v % 2 == 0))
            return pa.table(
                {"node": pa.array(
                    keep["node"].to_numpy(zero_copy_only=False) >> 1),
                 "lab": keep["lab"]}
            )

        def _unpack_b(t: pa.Table) -> pa.Table:
            v = t["node"].to_numpy(zero_copy_only=False)
            keep = t.filter(pa.array(v % 2 == 1))
            return pa.table(
                {"node": pa.array(
                    keep["node"].to_numpy(zero_copy_only=False) >> 1),
                 "blab": keep["lab"]}
            )

        f = fb_labs.map_batches(_unpack_f, batch_format="pyarrow")
        b2 = fb_labs.map_batches(_unpack_b, batch_format="pyarrow")
        fb = bucket_join(
            f, b2, "node", "node", num_buckets=P,
            left_schema=lab_schema,
            right_schema=pa.schema([("node", pa.int64()), ("blab", pa.int64())]),
        ).materialize()

        def _resolve(t: pa.Table) -> pa.Table:
            hit = t.filter(pc.equal(t["lab"], t["blab"]))
            return pa.table({"node": hit["node"], "scc": hit["lab"]})

        resolved = fb.map_batches(_resolve, batch_format="pyarrow").materialize()
        if resolved.count() == 0:
            raise RuntimeError(
                "scc: FW/BW round resolved nothing — raise label_rounds "
                "(the min-label fixpoint did not converge)"
            )
        out_parts.append(resolved)
        rnodes = resolved.map_batches(
            lambda t: t.select(["node"]), batch_format="pyarrow"
        ).materialize()
        pending = bucket_join(
            pending, rnodes, "node", "node", num_buckets=P, join_type="anti",
            left_schema=node_schema, right_schema=node_schema,
        ).materialize()
        rem = _drop_nodes(rem, rnodes)
    else:
        raise RuntimeError(
            f"scc did not converge within {max_outer} outer rounds — "
            "raise max_outer for graphs with very many SCCs"
        )
    if not out_parts:
        return rd.from_arrow(
            pa.table({"node": pa.array([], type=pa.int64()),
                      "scc": pa.array([], type=pa.int64())})
        )
    out = out_parts[0]
    for p in out_parts[1:]:
        out = out.union(p)
    return out


def reciprocity(
    edges: Dataset,
    num_buckets: int = 64,
    edge_count: int | None = None,
) -> dict:
    """Edge reciprocity of a DIRECTED graph: the fraction of distinct
    non-self edges (u, v) whose reverse (v, u) is also present — the
    classic mutual-link density of a web/link graph (Newman 2003).

    Plan: one distinct-edge exchange, then ONE semi ``bucket_join`` of
    the edge set against its own swap (key = the packed (u, v) pair —
    |ids| < 2^31 so lo·2³² + hi is collision-free), with per-batch
    int64 count folds on the driver (two scalars; no row data).

    Returns ``{"n_edges", "mutual", "reciprocity"}`` with ``mutual``
    the exact count of reciprocated directed edges and ``reciprocity``
    one float division of the two ints."""
    import pyarrow.compute as pc

    from rayraster.agg import distinct
    from rayraster.join import bucket_join

    P = _adaptive_parts(edge_count, num_buckets)
    lim = np.int64(1 << 31)

    def dropnull(t: pa.Table) -> pa.Table:
        valid = pc.and_(pc.is_valid(t["src"]), pc.is_valid(t["dst"]))
        t = t.filter(valid)
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(s) and (
            s.max(initial=0) >= lim or d.max(initial=0) >= lim
            or s.min(initial=0) <= -lim or d.min(initial=0) <= -lim
        ):
            raise ValueError("reciprocity: |node id| must be < 2^31")
        keep = s != d
        return pa.table({"src": pa.array(s[keep]), "dst": pa.array(d[keep])})

    e = distinct(
        edges.map_batches(dropnull, batch_format="pyarrow", zero_copy_batch=True),
        ["src", "dst"], num_partitions=P,
    ).materialize()

    def pack_fwd(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"k": pa.array(s * np.int64(1 << 32) + d)})

    def pack_rev(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"rk": pa.array(d * np.int64(1 << 32) + s)})

    k_schema = pa.schema([("k", pa.int64())])
    mut = bucket_join(
        e.map_batches(pack_fwd, batch_format="pyarrow"),
        e.map_batches(pack_rev, batch_format="pyarrow"),
        "k", "rk", num_buckets=P, join_type="semi",
        left_schema=k_schema,
        right_schema=pa.schema([("rk", pa.int64())]),
    )
    n = e.count()
    m = mut.count()
    return {
        "n_edges": int(n),
        "mutual": int(m),
        "reciprocity": float(m) / float(n) if n else float("nan"),
    }


def degree_moments(
    edges: Dataset,
    num_buckets: int = 64,
    edge_count: int | None = None,
) -> dict:
    """Degree-assortativity ingredients of the UNDIRECTED support
    (self-loops and duplicate/reverse edges collapsed): the exact
    int64 degree moments S1 = Σd, S2 = Σd², S3 = Σd³ and the edge
    degree-product sum Se = Σ_{(u,v)∈E} d_u·d_v, from which Newman's
    degree assortativity coefficient is the fixed-order float

        r = (4·M·Se − S2²) / (2·M·S3 − S2²)

    (M = |E|; the standard Pearson form with both sums over ordered
    edge ends).  Plan: one undirected-distinct exchange, one degree
    aggregate, two ``bucket_join`` hops to stamp d_u/d_v on each edge,
    and map-only int64 partial folds — the driver sees five scalars.
    Overflow: exact while Σd³ < 2^63 (max degree ≤ ~2 × 10⁶ at 10⁹
    nodes); the folds raise on the numpy overflow check otherwise.

    Returns ``{"m", "s1", "s2", "s3", "se", "assortativity"}``."""
    from rayraster.agg import hash_aggregate
    from rayraster.join import bucket_join

    P = _adaptive_parts(edge_count, num_buckets)
    und = _undirected_distinct(edges, P).materialize()
    m = und.count()
    if m == 0:
        raise ValueError("degree_moments: empty edge set")
    deg = hash_aggregate(
        und.map_batches(_edge_endpoints, batch_format="pyarrow"),
        ["node"], count=True, count_name="d", num_partitions=P,
    ).materialize()

    def mom_fold(t: pa.Table) -> pa.Table:
        d = t["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        # exactness gate: per-element d³ must fit int64 (a wrapped d³
        # can land POSITIVE, so a sign check alone is not sound), and
        # the batch fold is cross-checked against a float64 shadow sum
        # that detects any ±2^64 wrap in the int64 accumulation
        if len(d) and int(d.max()) >= (1 << 21):
            raise OverflowError(
                f"degree_moments: max degree {int(d.max())} >= 2^21 — "
                "Σd³ terms would exceed int64"
            )
        d2 = d * d
        d3 = d2 * d
        s3 = int(d3.sum())
        if abs(float(s3) - float(d3.astype(np.float64).sum())) > max(
            1.0, abs(float(s3))
        ) * 1e-6:
            raise OverflowError("degree_moments: Σd³ overflowed int64")
        return pa.table(
            {"s1": pa.array([int(d.sum())], type=pa.int64()),
             "s2": pa.array([int(d2.sum())], type=pa.int64()),
             "s3": pa.array([s3], type=pa.int64())}
        )

    mparts = deg.map_batches(mom_fold, batch_format="pyarrow").take_all()
    s1 = sum(r["s1"] for r in mparts)
    s2 = sum(r["s2"] for r in mparts)
    s3 = sum(r["s3"] for r in mparts)

    und_schema = pa.schema([("lo", pa.int64()), ("hi", pa.int64())])
    d_schema = pa.schema([("node", pa.int64()), ("d", pa.int64())])
    e1 = bucket_join(
        und, deg, "lo", "node", num_buckets=P,
        left_schema=und_schema, right_schema=d_schema,
    )
    dh = deg.map_batches(
        lambda t: pa.table({"node": t["node"], "dh": t["d"]}),
        batch_format="pyarrow",
    )
    e2 = bucket_join(
        e1, dh, "hi", "node", num_buckets=P,
        left_schema=pa.schema(
            [("lo", pa.int64()), ("hi", pa.int64()), ("d", pa.int64())]
        ),
        right_schema=pa.schema([("node", pa.int64()), ("dh", pa.int64())]),
    )

    def se_fold(t: pa.Table) -> pa.Table:
        p = (t["d"].to_numpy(zero_copy_only=False)
             * t["dh"].to_numpy(zero_copy_only=False))
        return pa.table({"se": pa.array([int(p.sum())], type=pa.int64())})

    se = sum(
        r["se"]
        for r in e2.map_batches(se_fold, batch_format="pyarrow").take_all()
    )
    num = 4 * m * se - s2 * s2
    den = 2 * m * s3 - s2 * s2
    return {
        "m": int(m), "s1": int(s1), "s2": int(s2), "s3": int(s3),
        "se": int(se),
        "assortativity": float(num) / float(den) if den else float("nan"),
    }


def edge_support(
    edges: Dataset,
    num_buckets: int = 64,
    edge_count: int | None = None,
    broadcast_threshold: int = 2_000_000,
) -> Dataset:
    """Per-edge triangle SUPPORT of the undirected support graph: for
    every distinct edge (lo, hi), the exact number of triangles it
    participates in (= its common-neighbor count — the k-truss
    ingredient and the standard link-strength feature for edges).

    Same skew-safe degree-oriented wedge plan as
    :func:`triangle_count` (O(m^1.5) wedges regardless of hubs), but
    every CLOSED wedge (c; o1, o2) credits all THREE of its edges —
    (c,o1), (c,o2), (o1,o2) — via one packed-key grouped count, then
    one left join stamps the support back on the edge table (missing
    → 0).

    Dual path below/above ``broadcast_threshold`` distinct edges
    (degree map + closing set via ``ray.put`` vs fully partitioned
    joins); both bit-identical (pytest).  Returns ``(lo, hi,
    support)``."""
    import ray
    import pyarrow.compute as pc

    from rayraster.agg import hash_aggregate
    from rayraster.join import bucket_join

    P = _adaptive_parts(edge_count, num_buckets)
    und = _undirected_distinct(edges, P).materialize()
    und_schema = pa.schema([("lo", pa.int64()), ("hi", pa.int64())])
    deg = hash_aggregate(
        und.map_batches(_edge_endpoints, batch_format="pyarrow"),
        ["node"], count=True, count_name="deg", num_partitions=P,
    )
    deg_schema = pa.schema([("node", pa.int64()), ("deg", pa.int64())])
    m_edges = und.count()
    o_schema = pa.schema([("c", pa.int64()), ("o", pa.int64())])

    if m_edges <= broadcast_threshold:
        deg_pd = deg.to_pandas()
        order = np.argsort(deg_pd["node"].to_numpy())
        deg_ref = ray.put(
            (deg_pd["node"].to_numpy()[order].astype(np.int64),
             deg_pd["deg"].to_numpy()[order].astype(np.int64))
        )

        def orient_bc(t: pa.Table) -> pa.Table:
            nodes, degs = ray.get(deg_ref)
            lo = t["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
            hi = t["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
            dl = degs[np.searchsorted(nodes, lo)]
            dh = degs[np.searchsorted(nodes, hi)]
            lo_first = (dl < dh) | ((dl == dh) & (lo < hi))
            return pa.table(
                {"c": pa.array(np.where(lo_first, lo, hi)),
                 "o": pa.array(np.where(lo_first, hi, lo))}
            )

        oriented = und.map_batches(orient_bc, batch_format="pyarrow").materialize()
        wedges = bucket_join(
            oriented, oriented, "c", "c", num_buckets=P,
            left_schema=o_schema, right_schema=o_schema,
        )
        pk_parts = und.map_batches(
            _pack_und, batch_format="pyarrow"
        ).to_pandas()["pk"].to_numpy()
        edge_set_ref = ray.put(np.sort(pk_parts.astype(np.int64)))

        def credit(t: pa.Table) -> pa.Table:
            es = ray.get(edge_set_ref)
            c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
            o = t["o"].to_numpy(zero_copy_only=False).astype(np.int64)
            o2 = t["o_r"].to_numpy(zero_copy_only=False).astype(np.int64)
            half = o < o2
            c, o, o2 = c[half], o[half], o2[half]
            pk = _pack_lo_hi(o, o2)
            pos = np.searchsorted(es, pk)
            pos_c = np.minimum(pos, max(len(es) - 1, 0))
            hit = (es[pos_c] == pk) if len(es) else np.zeros(len(pk), bool)
            c, o, o2 = c[hit], o[hit], o2[hit]
            keys = np.concatenate([
                _pack_lo_hi(np.minimum(c, o), np.maximum(c, o)),
                _pack_lo_hi(np.minimum(c, o2), np.maximum(c, o2)),
                _pack_lo_hi(o, o2),
            ])
            return pa.table({"pk": pa.array(keys)})

        credits = wedges.map_batches(credit, batch_format="pyarrow")
    else:
        with_lo = bucket_join(
            und, deg, "lo", "node", num_buckets=P,
            left_schema=und_schema, right_schema=deg_schema,
        )
        with_both = bucket_join(
            with_lo.map_batches(
                lambda t: t.rename_columns(["lo", "hi", "deg_lo"]),
                batch_format="pyarrow",
            ),
            deg, "hi", "node", num_buckets=P,
            left_schema=pa.schema(
                [("lo", pa.int64()), ("hi", pa.int64()), ("deg_lo", pa.int64())]
            ),
            right_schema=deg_schema,
        )

        def orient(t: pa.Table) -> pa.Table:
            lo = t["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
            hi = t["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
            dl = t["deg_lo"].to_numpy(zero_copy_only=False).astype(np.int64)
            dh = t["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
            lo_first = (dl < dh) | ((dl == dh) & (lo < hi))
            return pa.table(
                {"c": pa.array(np.where(lo_first, lo, hi)),
                 "o": pa.array(np.where(lo_first, hi, lo))}
            )

        oriented = with_both.map_batches(orient, batch_format="pyarrow").materialize()

        def wedge_rows(t: pa.Table) -> pa.Table:
            c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
            o = t["o"].to_numpy(zero_copy_only=False).astype(np.int64)
            o2 = t["o_r"].to_numpy(zero_copy_only=False).astype(np.int64)
            half = o < o2
            c, o, o2 = c[half], o[half], o2[half]
            return pa.table(
                {"pk": pa.array(_pack_lo_hi(o, o2)), "c": pa.array(c),
                 "o": pa.array(o), "o2": pa.array(o2)}
            )

        wedges = bucket_join(
            oriented, oriented, "c", "c", num_buckets=P,
            left_schema=o_schema, right_schema=o_schema,
        ).map_batches(wedge_rows, batch_format="pyarrow")
        closed = bucket_join(
            wedges,
            und.map_batches(_pack_und, batch_format="pyarrow"),
            "pk", "pk", num_buckets=P, join_type="semi",
            left_schema=pa.schema(
                [("pk", pa.int64()), ("c", pa.int64()),
                 ("o", pa.int64()), ("o2", pa.int64())]
            ),
            right_schema=pa.schema([("pk", pa.int64())]),
        )

        def credit_part(t: pa.Table) -> pa.Table:
            c = t["c"].to_numpy(zero_copy_only=False)
            o = t["o"].to_numpy(zero_copy_only=False)
            o2 = t["o2"].to_numpy(zero_copy_only=False)
            keys = np.concatenate([
                _pack_lo_hi(np.minimum(c, o), np.maximum(c, o)),
                _pack_lo_hi(np.minimum(c, o2), np.maximum(c, o2)),
                _pack_lo_hi(o, o2),
            ])
            return pa.table({"pk": pa.array(keys)})

        credits = closed.map_batches(credit_part, batch_format="pyarrow")

    sup = hash_aggregate(
        credits, ["pk"], count=True, count_name="support", num_partitions=P,
    )
    out = bucket_join(
        und.map_batches(
            lambda t: t.append_column("pk", _pack_und(t)["pk"]),
            batch_format="pyarrow",
        ),
        sup, "pk", "pk", num_buckets=P, join_type="left",
        left_schema=pa.schema(
            [("lo", pa.int64()), ("hi", pa.int64()), ("pk", pa.int64())]
        ),
        right_schema=pa.schema([("pk", pa.int64()), ("support", pa.int64())]),
    )
    return out.map_batches(
        lambda t: pa.table(
            {"lo": t["lo"], "hi": t["hi"],
             "support": pc.fill_null(t["support"], 0).cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )


def k_truss(
    edges: Dataset,
    k: int,
    num_buckets: int = 64,
    edge_count: int | None = None,
    max_rounds: int = 100,
    broadcast_threshold: int = 2_000_000,
) -> Dataset:
    """Edges of the k-truss: the maximal subgraph in which every edge
    participates in ≥ k−2 triangles (Cohen 2008) — the edge-level
    density filter one notch stronger than the k-core (spam link
    farms survive degree filters; they rarely survive triangle
    support).

    Iterative peeling, each round one :func:`edge_support` pass over
    the SURVIVING edge set followed by a vectorized filter — peel is
    idempotent once converged, so a fixed generous unroll in the SQL
    twin equals run-to-fixpoint.  A round that drops nothing is the
    fixpoint; ``max_rounds`` bounds pathological peeling chains.

    Returns ``(lo, hi, support)`` — the surviving undirected edges
    with their final (converged) support."""
    import pyarrow.compute as pc

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    P = _adaptive_parts(edge_count, num_buckets)
    cur = _undirected_distinct(edges, P).materialize()
    thr = k - 2
    for _ in range(max_rounds):
        sup = edge_support(
            cur.map_batches(
                lambda t: pa.table({"src": t["lo"], "dst": t["hi"]}),
                batch_format="pyarrow",
            ),
            num_buckets=P,
            broadcast_threshold=broadcast_threshold,
        ).materialize()
        n_before = cur.count()
        keep = sup.map_batches(
            lambda t: t.filter(pc.greater_equal(t["support"], thr)),
            batch_format="pyarrow",
        ).materialize()
        n_after = keep.count()
        if n_after == n_before:
            return keep
        cur = keep.map_batches(
            lambda t: t.select(["lo", "hi"]), batch_format="pyarrow"
        ).materialize()
        if n_after == 0:
            return keep
    raise RuntimeError(
        f"k_truss did not converge within {max_rounds} rounds — "
        "raise max_rounds for pathologically deep peeling chains"
    )
