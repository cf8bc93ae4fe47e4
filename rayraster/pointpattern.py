"""Point-pattern statistics over distributed point sets: Ripley's K/L
functions, a censored nearest-neighbor (Clark–Evans) summary, and the
empirical semivariogram.

SEraster's purpose is to hand spatial data to structure-finding tools
(vignettes/getting-started-with-SEraster.Rmd runs SpatialDE/nnSVG on
the pixel matrix); these operators compute the classical
point-pattern / geostatistics diagnostics natively on the distributed
points — "is this corpus of geocoded pages clustered, and at what
range?" (Ripley 1976; Clark & Evans 1954; Matheron's semivariogram).

100-TB shape: all three ride the provably-total ε-tile pair exchange
(:func:`rayraster.cluster.radius_pairs` — every point visits its own
ε-tile as a query and the 3×3 halo as a reference, ONE hash-partitioned
shuffle, tile populations O(density·ε²)).  Everything after the pair
stream is a bounded partial aggregate (per-batch numpy fold → one small
hash-partitioned grouped merge), so driver traffic never scales with
the corpus: the driver sees len(radii) / len(bins) rows plus one
extent row.

Determinism (the oracle contract): pair counts and quantized distance
sums are int64 (associative — identical on every merge schedule and
cluster size); every float that reaches the output is a SINGLE fixed
expression tree over those ints, evaluated once (the same IEEE ops in
numpy and a DuckDB twin), never an order-dependent float reduction.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Count, Max, Min, Sum

from .agg import hash_aggregate
from .cluster import radius_pairs

_I64 = pa.int64()

#: quantization scale for censored-NN distance sums (2^20 — the repo's
#: standard float→int lattice, exact in int64 up to 2^43 points·deg).
NN_SCALE = 1 << 20


def extent_stats(
    pts: Dataset, x_col: str = "x", y_col: str = "y"
) -> dict:
    """One aggregate pass: ``{"n", "xmin", "xmax", "ymin", "ymax",
    "area"}`` of the point set's bounding box.  min/max/count are
    order-invariant, so the result is schedule-deterministic; ``area``
    is two exact-rounded IEEE ops on them."""
    agg = pts.aggregate(
        Count(), Min(x_col), Max(x_col), Min(y_col), Max(y_col)
    )
    n = int(agg["count()"])
    xmin, xmax = float(agg[f"min({x_col})"]), float(agg[f"max({x_col})"])
    ymin, ymax = float(agg[f"min({y_col})"]), float(agg[f"max({y_col})"])
    return {
        "n": n, "xmin": xmin, "xmax": xmax, "ymin": ymin, "ymax": ymax,
        "area": (xmax - xmin) * (ymax - ymin),
    }


def ripley_k(
    pts: Dataset,
    radii: "list[float] | tuple[float, ...]",
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    num_partitions: int = 64,
    query_chunk: int = 1024,
    extent: dict | None = None,
) -> pa.Table:
    """Ripley's K (and quantized L) at each radius — the clustering-
    vs-CSR diagnostic: ``K(r) = A · |{ordered pairs with d ≤ r}| /
    (n·(n−1))``; under complete spatial randomness K(r) ≈ πr².

    ONE pair exchange at ``max(radii)`` serves every radius, in
    COUNT-ONLY mode (``radius_pairs(count_radii=…)``): qualifying
    pairs are folded to ``len(radii)`` int64 counts inside the tile
    scan itself, so the pair table is never materialized; one tiny
    grouped sum merges the per-group histograms.  Ties on each radius
    are included (``d² ≤ r²``, exact IEEE compare — twin-reproducible).

    Returns an arrow table ``(ri, radius, npairs, n, k_est, l_q)``
    sorted by ``ri``; ``npairs`` is the ORDERED pair count (int64),
    ``k_est`` the single-expression double
    ``area * npairs / (n · (n−1))`` and ``l_q`` the 2^20-quantized
    L-function ``floor(2^20 · sqrt(k_est / π))``.
    """
    radii = [float(r) for r in radii]
    if not radii or sorted(radii) != radii or radii[0] <= 0.0:
        raise ValueError("radii must be positive and ascending")
    if extent is None:
        extent = extent_stats(pts, x_col, y_col)
    n, area = extent["n"], extent["area"]
    nr = len(radii)

    counts = radius_pairs(
        pts, radii[-1], id_col=id_col, x_col=x_col, y_col=y_col,
        num_partitions=num_partitions, query_chunk=query_chunk,
        count_radii=radii,
    )
    npairs = _radii_counts(counts, nr, num_partitions)

    if n < 2:
        raise ValueError(f"ripley_k: need at least 2 points, got {n}")
    denom = float(n) * (float(n) - 1.0)
    k_est = np.array([(area * float(c)) / denom for c in npairs])
    l_q = np.array(
        [math.floor(float(NN_SCALE) * math.sqrt(k / math.pi)) for k in k_est],
        dtype=np.int64,
    )
    return pa.table(
        {
            "ri": pa.array(np.arange(nr, dtype=np.int64)),
            "radius": pa.array(np.asarray(radii)),
            "npairs": pa.array(npairs),
            "n": pa.array(np.full(nr, n, dtype=np.int64)),
            "k_est": pa.array(k_est),
            "l_q": pa.array(l_q),
        }
    )


def _radii_counts(
    counts: Dataset, nr: int, num_partitions: int
) -> np.ndarray:
    """Merge the per-tile-group ``(ri, cnt)`` histograms emitted by the
    count-only tile solve (``radius_pairs(count_radii=…)`` /
    ``radius_join(count_radii=…)``) into int64 counts per radius —
    one tiny grouped sum; missing radii fill 0.  Counting happens
    INSIDE the exchange, so the O(n²·πr²/A) pair table is never
    materialized (measured 6.6 s → ~1 s on 39M cross-pairs)."""
    merged = hash_aggregate(
        counts, keys=["ri"], sum_cols=["cnt"], count=False,
        num_partitions=min(num_partitions, nr),
    ).take_all()  # ≤ len(radii) rows — bounded, not corpus-sized
    npairs = np.zeros(nr, dtype=np.int64)
    for row in merged:
        npairs[int(row["ri"])] = int(row["sum_cnt"])
    return npairs


def cross_k(
    left: Dataset,
    right: Dataset,
    radii: "list[float] | tuple[float, ...]",
    left_id: str = "id",
    right_id: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    num_partitions: int = 64,
    query_chunk: int = 1024,
    extent: dict | None = None,
    n_right: int | None = None,
) -> pa.Table:
    """Bivariate (cross-type) Ripley's K between TWO point sets —
    "do events concentrate around documents?": ``K₁₂(r) = A ·
    |{(a ∈ left, b ∈ right): d ≤ r}| / (n₁ · n₂)``; under independence
    K₁₂(r) ≈ πr², above ⇒ attraction, below ⇒ repulsion (Lotwick &
    Silverman 1982).

    ONE sided ε-tile exchange at max(radii)
    (:func:`rayraster.cluster.radius_join` — left rows visit their own
    tile, right rows the 3×3 halo, neither side broadcast) serves all
    radii via the same bounded count fold as :func:`ripley_k`.

    ``extent`` (study area + n₁) defaults to the LEFT set's bounding
    box — pass a shared frame for a symmetric-area convention.
    ``n_right`` skips the right-count pass when the caller knows it.

    Returns ``(ri, radius, npairs, n1, n2, k_est, l_q)`` sorted by
    ``ri`` with the same int-count / single-expression-float /
    quantized-L contract as :func:`ripley_k`.
    """
    from .cluster import radius_join

    radii = [float(r) for r in radii]
    if not radii or sorted(radii) != radii or radii[0] <= 0.0:
        raise ValueError("radii must be positive and ascending")
    if extent is None:
        extent = extent_stats(left, x_col, y_col)
    n1, area = extent["n"], extent["area"]
    if n_right is None:
        n_right = int(right.count())

    nr = len(radii)
    counts = radius_join(
        left, right, radii[-1], left_id=left_id, right_id=right_id,
        x_col=x_col, y_col=y_col,
        num_partitions=num_partitions, query_chunk=query_chunk,
        count_radii=radii,
    )
    npairs = _radii_counts(counts, nr, num_partitions)
    if n1 < 1 or n_right < 1:
        raise ValueError(
            f"cross_k: both point sets must be non-empty "
            f"(n1={n1}, n2={n_right})"
        )
    denom = float(n1) * float(n_right)
    k_est = np.array([(area * float(c)) / denom for c in npairs])
    l_q = np.array(
        [math.floor(float(NN_SCALE) * math.sqrt(k / math.pi)) for k in k_est],
        dtype=np.int64,
    )
    return pa.table(
        {
            "ri": pa.array(np.arange(nr, dtype=np.int64)),
            "radius": pa.array(np.asarray(radii)),
            "npairs": pa.array(npairs),
            "n1": pa.array(np.full(nr, n1, dtype=np.int64)),
            "n2": pa.array(np.full(nr, n_right, dtype=np.int64)),
            "k_est": pa.array(k_est),
            "l_q": pa.array(l_q),
        }
    )


def nn_censored(
    pts: Dataset,
    eps: float,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    num_partitions: int = 64,
    query_chunk: int = 1024,
    extent: dict | None = None,
) -> dict:
    """Censored nearest-neighbor summary + Clark–Evans index: the
    nearest-neighbor distance of every point whose NN lies within
    ``eps`` (one ε-pair exchange → one grouped MIN — both
    order-invariant), folded to the int64 quantized sum
    ``qsum = Σ floor(2^20 · √(min d²))`` over the ``ncov`` covered
    points.

    The aggregation index is the Clark–Evans ratio on the censored
    mean: ``r_index = ((qsum / 2^20) / ncov) / (0.5 · sqrt(area / n))``
    — < 1 clustered, ≈ 1 CSR, > 1 dispersed (Clark & Evans 1954).
    Censoring at ε (rather than an unbounded NN search) keeps the pair
    exchange provably total and the statistic exactly reproducible in
    SQL; pick ε ≳ the CSR mean spacing so coverage is high.

    Returns ``{"n", "ncov", "qsum", "r_index", "area"}``.
    """
    if extent is None:
        extent = extent_stats(pts, x_col, y_col)
    n, area = extent["n"], extent["area"]
    pairs = radius_pairs(
        pts, eps, id_col=id_col, x_col=x_col, y_col=y_col,
        num_partitions=num_partitions, query_chunk=query_chunk,
    )
    nn = hash_aggregate(
        pairs, keys=["a"], min_cols=["d2"], count=False,
        num_partitions=num_partitions,
    )

    def fold(t: pa.Table) -> pa.Table:
        d2 = t["min_d2"].to_numpy(zero_copy_only=False)
        q = np.floor(float(NN_SCALE) * np.sqrt(d2)).astype(np.int64)
        return pa.table(
            {"q": pa.array([int(q.sum())], type=_I64),
             "c": pa.array([len(q)], type=_I64)}
        )

    agg = nn.map_batches(
        fold, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(Sum("q"), Sum("c"))
    qsum = int(agg["sum(q)"] or 0)
    ncov = int(agg["sum(c)"] or 0)
    if ncov:
        mean_obs = (float(qsum) / float(NN_SCALE)) / float(ncov)
        expected = 0.5 * math.sqrt(area / float(n))
        r_index = mean_obs / expected
    else:
        r_index = 0.0
    return {"n": n, "ncov": ncov, "qsum": qsum, "r_index": r_index,
            "area": area}


def semivariogram(
    pts: Dataset,
    value_col: str,
    bin_width: float,
    max_dist: float,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    num_partitions: int = 64,
    query_chunk: int = 1024,
) -> pa.Table:
    """Empirical (Matheron) semivariogram over an INTEGER value column:
    ``γ(h) = Σ (v_a − v_b)² / (2 · cnt_h)`` over the pairs whose
    distance falls in bin ``h = floor(√d² / bin_width)``, ``h ≥ 0``,
    up to ``max_dist``.

    Ordered pairs double both the squared-difference sum and the
    count, so γ equals the classical unordered definition exactly.
    The value payload rides the ε-tile exchange itself
    (``radius_pairs(payload_cols=…)``) — no join back onto the pair
    stream; per-batch ``np.bincount`` folds keep the merge tiny.
    Squared diffs of int64 values sum exactly (validated ≲ 2^31 per
    value), so every bin's ``(sqsum, cnt)`` is schedule-invariant; γ
    is the single division ``sqsum / (2·cnt)``.

    Returns an arrow table ``(h, cnt, sqsum, gamma)`` sorted by ``h``
    (bins with no pairs are omitted — match with an INNER join or a
    HAVING cnt > 0 twin).
    """
    if bin_width <= 0 or max_dist <= 0:
        raise ValueError("bin_width and max_dist must be positive")
    pairs = radius_pairs(
        pts, max_dist, id_col=id_col, x_col=x_col, y_col=y_col,
        num_partitions=num_partitions, query_chunk=query_chunk,
        payload_cols=(value_col,),
    )
    av, bv = f"a_{value_col}", f"b_{value_col}"

    def fold(t: pa.Table) -> pa.Table:
        if not pa.types.is_integer(t.schema.field(av).type):
            raise TypeError(
                f"semivariogram: {value_col!r} must be an integer column "
                "(int sums are exact; quantize floats first)"
            )
        d = np.sqrt(t["d2"].to_numpy(zero_copy_only=False))
        h = np.floor(d / bin_width).astype(np.int64)
        dv = (
            t[av].to_numpy(zero_copy_only=False).astype(np.int64)
            - t[bv].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        if np.any(np.abs(dv) > (1 << 31)):
            raise OverflowError(
                "semivariogram: |value diff| exceeds 2^31 — int64 "
                "squared-diff sums could overflow; rescale the values"
            )
        sq = dv * dv
        # the per-pair guard bounds dv, not the per-bin SUM — shadow
        # the int64 bin sums in float64 and raise on wrap (a bin with
        # >2^23 pairs at the permitted |dv| boundary wraps silently)
        if not len(h):
            return pa.table(
                {"h": pa.array([], _I64), "cnt": pa.array([], _I64),
                 "sqsum": pa.array([], _I64)}
            )
        # exact int64 segment sums (sorted-run reduction, no float pass)
        order = np.argsort(h, kind="stable")
        hs, sqo = h[order], sq[order]
        brk = np.flatnonzero(np.diff(hs)) + 1
        starts = np.concatenate(([0], brk))
        ends = np.concatenate((brk, [len(hs)]))
        csum = np.concatenate(([0], np.cumsum(sqo)))
        if len(sqo):
            shadow = float(np.cumsum(sqo.astype(np.float64))[-1])
            if abs(float(csum[-1]) - shadow) > 0.01 * max(1.0, abs(shadow)):
                raise OverflowError(
                    "semivariogram: Σdiff² wrapped int64 in a batch "
                    "fold — rescale the values"
                )
        return pa.table(
            {"h": pa.array(hs[starts]),
             "cnt": pa.array((ends - starts).astype(np.int64)),
             "sqsum": pa.array(csum[ends] - csum[starts])}
        )

    merged = hash_aggregate(
        pairs.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True),
        keys=["h"], sum_cols=["cnt", "sqsum"], count=False,
        num_partitions=8,
    ).take_all()  # ≤ #bins rows — bounded, not corpus-sized

    merged.sort(key=lambda r: int(r["h"]))
    h = np.array([int(r["h"]) for r in merged], dtype=np.int64)
    cnt = np.array([int(r["sum_cnt"]) for r in merged], dtype=np.int64)
    sqsum = np.array([int(r["sum_sqsum"]) for r in merged], dtype=np.int64)
    if (sqsum < 0).any():
        raise OverflowError(
            "semivariogram: Σdiff² wrapped int64 in the grouped fold "
            "— rescale the values"
        )
    gamma = np.array(
        [float(s) / (2.0 * float(c)) for s, c in zip(sqsum, cnt)]
    )
    return pa.table(
        {"h": pa.array(h), "cnt": pa.array(cnt), "sqsum": pa.array(sqsum),
         "gamma": pa.array(gamma)}
    )
