"""Generic hash-partitioned grouped aggregation (partial → final).

The same pattern rasterize.py uses for cells, generalized to arbitrary
keys and (sum / count / min / max) aggregates — all algebraic, so the
partial/final decomposition is exact:

  map_batches[per-batch pyarrow group_by + part = hash(keys) % P]
  → groupby(part).map_groups[one vectorized pyarrow group_by]

The shuffle key is the small int ``part``; group count per finalize
task is bounded by |keys|/P.  Never uses Ray's per-group-Python
aggregate reduce (see rasterize.py module docstring for the numbers).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from rayraster.geo import fnv1a64

_PART = "_part"
_ONES = "_n1"


def _part_of(t: pa.Table, keys: Sequence[str], num_partitions: int) -> np.ndarray:
    """Deterministic partition id from arbitrary-typed key columns."""
    h = np.zeros(t.num_rows, dtype=np.int64)
    for k in keys:
        col = t[k]
        if pa.types.is_integer(col.type):
            v = col.to_numpy(zero_copy_only=False).astype(np.int64)
        elif pa.types.is_floating(col.type):
            f = col.to_numpy(zero_copy_only=False)
            # normalize -0.0 → +0.0 so bit-hashing agrees with value
            # equality (group_by would merge them; the partition must too)
            v = (f + 0.0).view(np.int64)
        elif pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            # buffer path; NULL hashes like "None", same as the str() route
            v = fnv1a64(col).view(np.int64)
        else:
            v = fnv1a64([str(s) for s in col.to_pylist()]).view(np.int64)
        h = h * np.int64(1000003) ^ v
    return np.abs(h) % np.int64(num_partitions)


def _aggs_for(sum_cols, min_cols, max_cols, count):
    aggs = [(c, "sum") for c in sum_cols]
    aggs += [(c, "min") for c in min_cols]
    aggs += [(c, "max") for c in max_cols]
    if count:
        aggs.append((_ONES, "sum"))
    return aggs


def hash_aggregate(
    ds: Dataset,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
    count: bool = True,
    count_name: str = "n",
    num_partitions: int = 64,
    batch_size: int | None = 65536,
) -> Dataset:
    """Grouped aggregate: one row per distinct key combination with
    ``sum_<c>``, ``min_<c>``, ``max_<c>`` and a count column.

    Output column names are stable regardless of pyarrow's internal
    naming: ``[*keys, sum_*…, min_*…, max_*…, count_name]``.
    """
    keys = list(keys)
    sum_cols = list(sum_cols)
    min_cols = list(min_cols)
    max_cols = list(max_cols)
    out_names = (
        keys
        + [f"sum_{c}" for c in sum_cols]
        + [f"min_{c}" for c in min_cols]
        + [f"max_{c}" for c in max_cols]
        + ([count_name] if count else [])
    )

    def partial(batch: pa.Table) -> pa.Table:
        cols = {k: batch[k] for k in keys}
        for c in set(sum_cols + min_cols + max_cols):
            cols[c] = batch[c]
        if count:
            cols[_ONES] = pa.array(np.ones(batch.num_rows, dtype=np.int64))
        t = pa.table(cols)
        out = t.group_by(keys).aggregate(_aggs_for(sum_cols, min_cols, max_cols, count))
        out = out.rename_columns(out_names)
        return out.append_column(_PART, pa.array(_part_of(out, keys, num_partitions)))

    def finalize(part: pa.Table) -> pa.Table:
        # merge partials: sum of sums/counts, min of mins, max of maxes
        aggs = [(f"sum_{c}", "sum") for c in sum_cols]
        aggs += [(f"min_{c}", "min") for c in min_cols]
        aggs += [(f"max_{c}", "max") for c in max_cols]
        if count:
            aggs.append((count_name, "sum"))
        out = part.group_by(keys).aggregate(aggs)
        return out.rename_columns(out_names)

    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    return partials.groupby(_PART).map_groups(finalize, batch_format="pyarrow")


def distinct(ds: Dataset, keys: Sequence[str], num_partitions: int = 64) -> Dataset:
    """Distinct key combinations (a hash-partitioned dedup of keys)."""
    return hash_aggregate(ds, keys, count=False, num_partitions=num_partitions)


def _sample_hash(ids: np.ndarray, rate_den: int) -> np.ndarray:
    """The shared Knuth-hash sampling rule — ONE definition so the
    uniform and stratified samplers (and their SQL twins) can never
    desync."""
    return (ids.astype(np.int64) * np.int64(2654435761)) % np.int64(rate_den)


def deterministic_sample(
    ds: Dataset, id_col: str, rate_num: int, rate_den: int = 1000003
) -> Dataset:
    """Reproducible row sample: keep rows where
    ``(id * 2654435761) % rate_den < rate_num`` — a pure function of
    the id, so the sample is identical across runs, chunkings and
    cluster sizes (unlike seeded RNG sampling, which depends on block
    layout), and exactly reproducible in SQL."""

    def keep(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        mask = _sample_hash(ids, rate_den) < np.int64(rate_num)
        return t.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample(
    ds: Dataset, id_col: str, group_col: str, rates: dict,
    default_num: int = 0, rate_den: int = 1000003,
) -> Dataset:
    """Per-group deterministic sampling (class rebalancing): keep a
    row of group ``g`` when ``(id·2654435761) % rate_den <
    rates.get(g, default_num)`` — the same chunk/cluster-invariant id
    arithmetic as :func:`deterministic_sample`, with a per-group
    threshold.  Vectorized: one equality mask per listed group (the
    rates dict is small by construction); unlisted and NULL groups get
    ``default_num``."""
    import pyarrow.compute as pc

    items = sorted(rates.items())

    def keep(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        h = _sample_hash(ids, rate_den)
        thr = np.full(t.num_rows, default_num, dtype=np.int64)
        g = t[group_col]
        for key, num in items:
            m = pc.fill_null(
                pc.equal(g, pa.scalar(key, type=g.type)), False
            ).to_numpy(zero_copy_only=False).astype(bool)
            thr[m] = num
        return t.filter(pa.array(h < thr))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def priority_sample(
    ds: Dataset,
    id_col: str,
    weight_col: str,
    k: int,
    rate_den: int = 1000003,
    fold_batch: int = 65536,
) -> pa.Table:
    """Weighted sample WITHOUT replacement of size ``k`` via priority
    sampling (Duffield–Lund–Thorup, JACM 2007): each row gets priority
    ``q = w / u`` with a per-row uniform ``u``; the ``k`` largest
    priorities are the sample, and the (k+1)-th priority ``tau`` gives
    the unbiased Horvitz–Thompson weight ``max(w, tau)`` (returned as
    ``ht_weight``; its sum estimates the population total of ``w``).

    ``u`` comes from the shared deterministic sampling hash
    (:func:`_sample_hash`): ``u = ((id·2654435761) % rate_den + 0.5)
    / rate_den`` — priority needs only DIVISION (no log/pow), so
    unlike Efraimidis–Spirakis exponential keys the whole rule is
    bit-exact in SQL::

        ORDER BY w / ((((id*2654435761) % 1000003) + 0.5)/1000003.0)
          DESC, id ASC LIMIT k

    and the sample is identical across runs, chunkings and cluster
    sizes.  Requires non-negative ids (SQL ``%`` keeps the dividend's
    sign) and positive weights (rows with ``w <= 0`` or non-finite
    priority are never sampled).  Ties broken by id ascending.

    Distributed shape: per-batch partial top-(k+1) → fold stage
    (top-(k+1) per ~``fold_batch`` candidate rows, so driver traffic
    is bounded by k, not block count) → tiny driver merge.  Returns an
    arrow table of the winners' rows + ``_priority``/``tau``/
    ``ht_weight`` columns."""
    import ray

    if k < 1:
        raise ValueError("priority_sample: k must be >= 1")
    kp = k + 1
    order = [("_priority", "descending"), (id_col, "ascending")]

    def partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        u = (_sample_hash(ids, rate_den) + 0.5) / float(rate_den)
        q = w / u
        t = t.append_column("_priority", pa.array(q))
        t = t.filter(pa.array((w > 0.0) & np.isfinite(q)))
        return t.sort_by(order).slice(0, kp)

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        return t.sort_by(order).slice(0, kp)

    folded = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        fold, batch_format="pyarrow", batch_size=fold_batch, zero_copy_batch=True
    )
    tbls = [t for t in (ray.get(r) for r in folded.to_arrow_refs())
            if t.num_columns > 0 and t.num_rows > 0]
    if not tbls:
        raise ValueError("priority_sample: no rows with positive weight")
    allc = pa.concat_tables(tbls).sort_by(order)
    tau = (
        float(allc["_priority"][k].as_py()) if allc.num_rows > kp - 1 else 0.0
    )
    win = allc.slice(0, k)
    w_win = win[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
    return win.append_column("tau", pa.array(np.full(win.num_rows, tau))) \
              .append_column("ht_weight", pa.array(np.maximum(w_win, tau)))


def exact_quantiles(
    ds: Dataset,
    col: str,
    qs: Sequence[float],
    num_bins: int = 4096,
    collect_threshold: int = 262144,
    max_rounds: int = 64,
    batch_size: int = 262144,
    fold_batch: int = 512,
) -> list[float]:
    """EXACT order statistics of a numeric column at any scale with NO
    shuffle: iterative histogram refinement.

    Rank semantics: ``k = ceil(n·q) − 1`` 0-based (clamped to
    [0, n−1]) — empirically identical to DuckDB ``quantile_disc`` and
    to SQL ``ORDER BY col LIMIT 1 OFFSET k``.

    Shape: each round is one streaming map-only pass emitting ONE
    fixed-size blob per batch (per-bin count + min + max); the driver
    folds blobs and narrows each target rank to one bin.  All ranks
    refine in the SAME pass (shared histograms over per-rank
    intervals).  The next interval is the chosen bin's ACTUAL
    [min, max] — data-adaptive bounds, so a bin that is one repeated
    value terminates immediately (min == max ⇒ the answer), a
    duplicate mass can never spin the refinement, and an extreme
    outlier collapses the empty range in one round.  When a rank's
    bin holds ≤ ``collect_threshold`` rows, a final filter pass
    collects just those candidates and selects the k-th locally.
    Rounds needed ≈ log_B(distinct values in the bin path).  Driver
    state: num_bins × |qs| counters.  NULL/NaN rows are ignored
    (quantile_disc semantics).

    Blob traffic is bounded at any row count: one blob per
    ``batch_size`` input rows, then a distributed fold stage merges
    ``fold_batch`` blobs per task before the driver sees them — at
    10^12 rows the driver folds ~rows/(batch_size·fold_batch) ≈ 10^4
    blobs per round, not millions.

    Precision bound: values refine in float64, so int64 columns are
    exact up to |v| < 2^53 — beyond that, neighbouring large integers
    collapse to one double and the returned value may be the rounded
    double rather than a column element.  An INTEGER column whose
    range reaches 2^53 is DETECTED in the first stats pass and raises
    (hash/id columns near int64-max want min/max/topk, not quantiles;
    an integer-space refinement would double the blob width for a
    case no pipeline here has).  Float columns of any magnitude are
    fine — they are already doubles.
    """
    qs = list(qs)

    def _bins_of(v: np.ndarray, lo: float, hi: float) -> np.ndarray:
        w = hi - lo
        if w <= 0:
            return np.zeros(len(v), dtype=np.int64)
        if not np.isfinite(w):
            # |lo| + |hi| overflows double (±~1e308 extremes): one
            # midpoint split still halves the interval every round
            mid = lo / 2.0 + hi / 2.0
            return np.where(v >= mid, num_bins - 1, 0).astype(np.int64)
        # divide BEFORE scaling: (v-lo)/w is always finite in [0, 1],
        # whereas num_bins/w overflows to inf for subnormal widths
        # (found by hypothesis: {-2.2e-309, 0.0, 1.2e-38} corpora made
        # 0·inf = NaN bins and the refinement never converged)
        return np.clip(
            ((v - lo) / w * num_bins).astype(np.int64), 0, num_bins - 1
        )

    def _mask_for(v: np.ndarray, path) -> np.ndarray:
        # membership via the SAME bin function that counted the rows —
        # recomputing interval bounds in floats would let boundary rows
        # drift between rounds and corrupt the rank accounting
        m = np.ones(len(v), dtype=bool)
        for lo, hi, b in path:
            m &= _bins_of(v, lo, hi) == b
        return m

    def _values(t: pa.Table) -> np.ndarray:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        return v[~np.isnan(v)]  # nulls → NaN; quantile_disc ignores them

    def stats_batch(t: pa.Table) -> pa.Table:
        v = _values(t)
        if len(v) == 0:
            return pa.table({"lo": pa.array([], type=pa.float64()),
                             "hi": pa.array([], type=pa.float64()),
                             "n": pa.array([], type=pa.int64()),
                             "wide": pa.array([], type=pa.bool_())})
        lo, hi = float(v.min()), float(v.max())
        wide_int = bool(
            pa.types.is_integer(t[col].type)
            and max(abs(lo), abs(hi)) >= 2.0**53
        )
        return pa.table({"lo": [lo], "hi": [hi], "n": [int(len(v))],
                         "wide": [wide_int]})

    gmin, gmax, n, wide = np.inf, -np.inf, 0, False
    for t in ds.map_batches(stats_batch, batch_format="pyarrow", batch_size=batch_size,
                            zero_copy_batch=True).iter_batches(batch_format="pyarrow"):
        for lo, hi, cnt, w in zip(t["lo"].to_pylist(), t["hi"].to_pylist(),
                                  t["n"].to_pylist(), t["wide"].to_pylist()):
            gmin, gmax, n, wide = min(gmin, lo), max(gmax, hi), n + cnt, wide or w
    if n == 0:
        raise ValueError("exact_quantiles on an empty dataset")
    if wide:
        raise ValueError(
            f"exact_quantiles: integer column {col!r} reaches |v| >= 2^53, "
            "where float64 refinement can no longer separate neighbouring "
            "values — use min/max/grouped_topk for id/hash-scale integers"
        )

    # path = list of (lo, hi, chosen_bin) refinement levels; the live
    # interval of the deepest level is subdivided next round
    states = [
        {"path": [], "lo": gmin, "hi": gmax,
         "k": min(max(int(np.ceil(n * q)) - 1, 0), n - 1),
         "val": None, "collect": False}
        for q in qs
    ]

    for _ in range(max_rounds):
        act = [i for i, s in enumerate(states) if s["val"] is None and not s["collect"]]
        if not act:
            break
        specs = [(tuple(states[i]["path"]), states[i]["lo"], states[i]["hi"])
                 for i in act]

        def hist_batch(t: pa.Table, _specs=specs) -> pa.Table:
            v = _values(t)
            blobs = []
            for path, lo, hi in _specs:
                m = _mask_for(v, path)
                bv = v[m]
                bins = _bins_of(bv, lo, hi)
                # float64 counts are exact below 2^53 — keeps the blob
                # a single homogeneous array with the min/max planes
                counts = np.bincount(bins, minlength=num_bins).astype(np.float64)
                bmin = np.full(num_bins, np.inf)
                bmax = np.full(num_bins, -np.inf)
                if len(bv):
                    np.minimum.at(bmin, bins, bv)
                    np.maximum.at(bmax, bins, bv)
                blobs += [counts, bmin, bmax]
            return pa.table({"h": pa.array([np.concatenate(blobs).tobytes()],
                                           type=pa.binary())})

        stride = 3 * num_bins
        n_act = len(act)

        def fold_blobs(t: pa.Table) -> pa.Table:
            parts = np.stack(
                [np.frombuffer(b, dtype=np.float64) for b in t["h"].to_pylist()]
            ).reshape(-1, n_act, stride)
            merged = np.empty((n_act, stride))
            merged[:, :num_bins] = parts[:, :, :num_bins].sum(axis=0)
            merged[:, num_bins : 2 * num_bins] = parts[:, :, num_bins : 2 * num_bins].min(axis=0)
            merged[:, 2 * num_bins :] = parts[:, :, 2 * num_bins :].max(axis=0)
            return pa.table({"h": pa.array([merged.tobytes()], type=pa.binary())})

        hist = ds.map_batches(hist_batch, batch_format="pyarrow",
                              batch_size=batch_size, zero_copy_batch=True)
        folded = hist.map_batches(fold_blobs, batch_format="pyarrow",
                                  batch_size=fold_batch, zero_copy_batch=True)
        tot_counts = np.zeros((n_act, num_bins))
        tot_min = np.full((n_act, num_bins), np.inf)
        tot_max = np.full((n_act, num_bins), -np.inf)
        for t in folded.iter_batches(batch_format="pyarrow"):
            for blob in t["h"].to_pylist():
                part = np.frombuffer(blob, dtype=np.float64).reshape(n_act, stride)
                tot_counts += part[:, :num_bins]
                np.minimum(tot_min, part[:, num_bins : 2 * num_bins], out=tot_min)
                np.maximum(tot_max, part[:, 2 * num_bins :], out=tot_max)
        for j, i in enumerate(act):
            s = states[i]
            counts = tot_counts[j].astype(np.int64)
            bmin = tot_min[j]
            bmax = tot_max[j]
            cum = np.cumsum(counts)
            b = int(np.searchsorted(cum, s["k"] + 1))
            below = int(cum[b - 1]) if b else 0
            s["k"] -= below
            s["path"].append((s["lo"], s["hi"], b))
            if bmin[b] == bmax[b]:
                # the bin is one repeated value — the k-th of equal
                # values IS that value; no collect, no further rounds
                s["val"] = float(bmin[b])
                continue
            # data-adaptive bounds: the chosen bin's ACTUAL value range
            s["lo"], s["hi"] = float(bmin[b]), float(bmax[b])
            if counts[b] <= collect_threshold:
                s["collect"] = True
    pending = [i for i, s in enumerate(states) if s["val"] is None]
    if any(not states[i]["collect"] for i in pending):
        raise RuntimeError(f"exact_quantiles did not converge in {max_rounds} rounds")
    if pending:
        paths = [tuple(states[i]["path"]) for i in pending]

        def collect_batch(t: pa.Table, _paths=paths) -> pa.Table:
            v = _values(t)
            tags, vals = [], []
            for j, path in enumerate(_paths):
                m = _mask_for(v, path)
                vals.append(v[m])
                tags.append(np.full(int(m.sum()), j, dtype=np.int64))
            return pa.table({"tag": pa.array(np.concatenate(tags)),
                             "v": pa.array(np.concatenate(vals))})

        buf: dict[int, list[np.ndarray]] = {j: [] for j in range(len(pending))}
        for t in ds.map_batches(collect_batch, batch_format="pyarrow", batch_size=batch_size,
                                zero_copy_batch=True).iter_batches(batch_format="pyarrow"):
            tg = t["tag"].to_numpy(zero_copy_only=False)
            vv = t["v"].to_numpy(zero_copy_only=False)
            for j in range(len(pending)):
                buf[j].append(vv[tg == j])
        for j, i in enumerate(pending):
            cand = np.concatenate(buf[j]) if buf[j] else np.zeros(0)
            s = states[i]
            if len(cand) == 0:
                raise RuntimeError("exact_quantiles: empty candidate interval")
            s["val"] = float(np.partition(cand, s["k"])[s["k"]])
    return [s["val"] for s in states]


def _detect_giant_groups(sample: pa.Table, group_cols: Sequence[str],
                         giant_frac: float) -> list[tuple]:
    """Group tuples holding ≥ giant_frac of the bounded sample.
    Tuples containing NULL keys are never routed (NULL equality can't
    drive a safe vectorized split) — they stay on the normal path."""
    if sample.num_rows == 0:
        return []
    import collections

    cnt = collections.Counter(zip(*[sample[g].to_pylist() for g in group_cols]))
    thresh = giant_frac * sample.num_rows
    return [k for k, c in cnt.items() if c >= thresh and None not in k]


def grouped_quantiles(
    ds: Dataset,
    group_cols: Sequence[str],
    value_col: str,
    qs: Sequence[float],
    num_partitions: int = 64,
    giant_frac: float | None = 0.5,
    sample_rows: int = 65536,
) -> Dataset:
    """Exact per-group order statistics (quantile_disc rank rule,
    ``k = ceil(n·q) − 1``): hash-partition by group so every group is
    local, then ONE vectorized sorted pass per partition — segment
    boundaries + fancy indexing, never a task per group.  Assumes each
    group's rows fit a partition (the contract of every grouped
    operator here).

    **Giant-group escape hatch**: a group holding most of the corpus
    would serialize the whole dataset into ONE partition.  A bounded
    prefix sample (``sample_rows`` rows — never a full pass) detects
    groups at ≥ ``giant_frac`` of the sample; their rows are routed
    through :func:`exact_quantiles` (map-only histogram refinement,
    NO shuffle, group never co-located) and the remaining groups take
    the normal partitioned path; results are unioned.  Missing a
    giant in the sample costs only balance, never correctness — the
    partitioned path is exact for any group that fits a partition.
    ``giant_frac=None`` disables detection.  Like
    :func:`exact_quantiles`, the escape path is exact for integer
    values up to 2^53 (float64 refinement).  Output: group cols +
    ``q`` + ``value``, one row per (group, q)."""
    group_cols = list(group_cols)
    qs = list(qs)

    def add_part(t: pa.Table) -> pa.Table:
        keep = t.select([*group_cols, value_col])
        keep = keep.append_column(
            _PART, pa.array(_part_of(t, group_cols, num_partitions))
        )
        # NULL values are ignored (quantile_disc semantics, and the
        # giant-group exact_quantiles path already drops them) — kept,
        # they would inflate n and sort to the end, so q=1.0 selected
        # NULL and every other q was rank-shifted
        import pyarrow.compute as _pc

        v = keep[value_col]
        if v.null_count:
            keep = keep.filter(_pc.is_valid(v))
        return keep

    def solve(part: pa.Table) -> pa.Table:
        part = part.sort_by(
            [*[(g, "ascending") for g in group_cols], (value_col, "ascending")]
        )
        n = part.num_rows
        if n == 0:
            cols = {g: pa.array([], type=part[g].type) for g in group_cols}
            cols["q"] = pa.array([], type=pa.float64())
            cols["value"] = pa.array([], type=part[value_col].type)
            return pa.table(cols)
        new_grp = np.zeros(n, dtype=bool)
        new_grp[0] = True
        for g in group_cols:
            col = part[g].to_numpy(zero_copy_only=False)
            new_grp[1:] |= col[1:] != col[:-1]
        starts = np.flatnonzero(new_grp)
        sizes = np.append(starts[1:], n) - starts
        idxs, q_out = [], []
        for q in qs:
            k = np.minimum(np.maximum(np.ceil(sizes * q).astype(np.int64) - 1, 0),
                           sizes - 1)
            idxs.append(starts + k)
            q_out.append(np.full(len(starts), q))
        idx = np.concatenate(idxs)
        cols = {g: part[g].take(pa.array(starts.tolist() * len(qs)))
                for g in group_cols}
        cols["q"] = pa.array(np.concatenate(q_out))
        cols["value"] = part[value_col].take(pa.array(idx))
        return pa.table(cols)

    def partitioned(dsx: Dataset) -> Dataset:
        parted = dsx.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        return parted.groupby(_PART).map_groups(solve, batch_format="pyarrow")

    giants: list[tuple] = []
    smp = None
    if giant_frac is not None and 0 < giant_frac <= 1:
        import ray as _ray

        smp = pa.concat_tables(
            _ray.get(
                ds.select_columns([*group_cols, value_col])
                .limit(sample_rows)
                .to_arrow_refs()
            )
        )
        giants = _detect_giant_groups(smp, group_cols, giant_frac)
    if not giants:
        return partitioned(ds)

    import pyarrow.compute as pc

    import ray.data as rd

    # the giant branch reads ds several times (drop_giants pass + one
    # multi-round exact_quantiles per giant) — materialize ONCE so a
    # lazy/shuffle-derived lineage is not re-executed per pass (the
    # same convention as simhash_pairs' sig table)
    ds = ds.materialize()

    def _mask_tuple(t: pa.Table, tup: tuple):
        # fill_null(False): giant tuples never contain NULL (filtered
        # in detection), so a null key is NOT this giant — without the
        # fill, the null mask would propagate through or_/invert and
        # filter would silently drop every NULL-keyed row
        mm = None
        for g, v in zip(group_cols, tup):
            e = pc.fill_null(pc.equal(t[g], pa.scalar(v, type=t[g].type)), False)
            mm = e if mm is None else pc.and_(mm, e)
        return mm

    def drop_giants(t: pa.Table) -> pa.Table:
        m = None
        for tup in giants:
            mm = _mask_tuple(t, tup)
            m = mm if m is None else pc.or_(m, mm)
        return t.filter(pc.invert(m))

    out = partitioned(
        ds.map_batches(drop_giants, batch_format="pyarrow", zero_copy_batch=True)
    )
    vt = smp[value_col].type
    gtabs = []
    for tup in giants:
        sub = ds.map_batches(
            lambda t, _tup=tup: t.filter(_mask_tuple(t, _tup)),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        vals = exact_quantiles(sub, value_col, qs)
        cols = {
            g: pa.array([v] * len(qs), type=smp[g].type)
            for g, v in zip(group_cols, tup)
        }
        cols["q"] = pa.array([float(q) for q in qs], type=pa.float64())
        # quantile_disc picks an actual element, so the float64 from
        # the refinement converts back to the column type exactly
        cols["value"] = pa.array(
            [int(v) for v in vals] if pa.types.is_integer(vt) else vals, type=vt
        )
        gtabs.append(pa.table(cols))
    return out.union(rd.from_arrow(pa.concat_tables(gtabs)))


def grouped_topk(
    ds: Dataset,
    keys: Sequence[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tie_col: str | None = None,
    num_partitions: int = 64,
    batch_size: int | None = 65536,
) -> Dataset:
    """Top-k rows per key group by ``order_col`` (deterministic ties via
    ``tie_col``), with a ``rnk`` column (1-based).

    Partial top-k is taken per batch BEFORE the shuffle (a batch can
    only contribute k rows per key), then per-partition finalize sorts
    each group — both steps vectorized via pyarrow sort + numpy
    segment logic, never one task per key."""
    keys = list(keys)

    def _topk_table(t: pa.Table, with_rank: bool) -> pa.Table:
        order = [(kc, "ascending") for kc in keys]
        order.append((order_col, "descending" if descending else "ascending"))
        if tie_col:
            order.append((tie_col, "ascending"))
        t = t.sort_by(order)
        import numpy as _np

        n = t.num_rows
        if n == 0:
            return t.append_column("rnk", pa.array([], type=pa.int64())) if with_rank else t
        new_grp = _np.zeros(n, dtype=bool)
        new_grp[0] = True
        for kc in keys:
            col = t[kc].to_numpy(zero_copy_only=False)
            new_grp[1:] |= col[1:] != col[:-1]
        # rank within group = index - start_of_group
        starts = _np.maximum.accumulate(_np.where(new_grp, _np.arange(n), 0))
        rnk = _np.arange(n) - starts + 1
        keep = rnk <= k
        t = t.filter(pa.array(keep))
        if with_rank:
            t = t.append_column("rnk", pa.array(rnk[keep]))
        return t

    def partial(batch: pa.Table) -> pa.Table:
        out = _topk_table(batch, with_rank=False)
        return out.append_column(
            _PART, pa.array(_part_of(out, keys, num_partitions))
        )

    def finalize(part: pa.Table) -> pa.Table:
        part = part.drop_columns([_PART])
        return _topk_table(part, with_rank=True)

    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    return partials.groupby(_PART).map_groups(finalize, batch_format="pyarrow")


def cap_per_group(
    ds: Dataset,
    keys: Sequence[str],
    id_col: str,
    cap: int,
    rate_den: int = 1000003,
    num_partitions: int = 64,
) -> Dataset:
    """Keep at most ``cap`` rows per key group (per-domain corpus caps
    — the CCNet/Dolma "max N pages per host" rule), deterministically:
    rows win by ascending ``(id·2654435761) % rate_den`` (the shared
    Knuth sampling hash, :func:`_sample_hash`) with the id itself as
    tie-break, so the kept set is a pure function of ids — independent
    of chunking, partitioning and cluster size.

    Rides :func:`grouped_topk` (per-batch partial top-``cap`` before
    the one hash-partition shuffle).  SQL twin::

        ROW_NUMBER() OVER (PARTITION BY <keys>
                           ORDER BY (id*2654435761) % 1000003, id) <= cap

    The hash column is dropped from the output; ``rnk`` (1-based) is
    kept and equals the twin's row number.
    """

    def _add_h(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("_cap_h", pa.array(_sample_hash(ids, rate_den)))

    withh = ds.map_batches(_add_h, batch_format="pyarrow", zero_copy_batch=True)
    kept = grouped_topk(
        withh, keys, "_cap_h", cap,
        descending=False, tie_col=id_col, num_partitions=num_partitions,
    )
    return kept.map_batches(
        lambda t: t.drop_columns(["_cap_h"]), batch_format="pyarrow"
    )


def pack_by_budget(
    ds: Dataset,
    budget: int,
    len_col: str,
    order_cols,
    num_partitions: int = 64,
) -> Dataset:
    """Token-budget contiguous packing: assign every row (a chunk /
    sequence) to a fixed-budget training shard by the EXCLUSIVE
    prefix sum of ``len_col`` over the global ``order_cols``
    lexicographic order — the sharding rule of a streaming
    training-data loader (each shard holds ``budget`` tokens of
    consecutive chunks; a chunk straddling a boundary starts writing
    at ``bin_offset``).

    Appends (all exact int64 — no floats anywhere):

    * ``tokens_before`` — exclusive prefix sum of ``len_col``
    * ``bin_id``        — ``tokens_before // budget``
    * ``bin_offset``    — ``tokens_before %  budget``

    SQL twin: ``COALESCE(SUM(len) OVER (ORDER BY <order_cols> ROWS
    BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)`` then integer
    ``//`` and ``%`` — identical integer arithmetic on both engines.

    ``order_cols``: a column name or a sequence of them (e.g.
    ``["doc_id", "chunk_idx"]``); the COMPOSITE must be unique int64s
    (a duplicate composite makes the prefix order ambiguous).  No
    synthetic packed key is needed, so arbitrary (hash) id ranges
    can't overflow.

    Distributed prefix scan with NO global sort (same shape as
    ``windows.add_late_flag``): range-partition the FIRST order
    column into contiguous chunks (ties land in one partition, so the
    composite order never straddles a boundary), per-chunk sums via
    one grouped aggregate, prefix-fold the P chunk sums on the driver
    (the ONLY driver state: P int64s), then one seeded vectorized
    cumsum per chunk.
    """
    import ray

    if isinstance(order_cols, str):
        order_cols = [order_cols]
    order_cols = list(order_cols)
    primary = order_cols[0]

    # three consumers below (lo/hi stats scan, partial-sum aggregate,
    # final scan) — pin the input once so an expensive lazy lineage
    # (e.g. a chunk expansion) executes once, not three times
    ds = ds.materialize()

    def stats(t: pa.Table) -> pa.Table:
        o = t[primary].to_numpy(zero_copy_only=False)
        if len(o) == 0:
            return pa.table({"lo": pa.array([], type=pa.int64()),
                             "hi": pa.array([], type=pa.int64())})
        return pa.table({"lo": [int(o.min())], "hi": [int(o.max())]})

    lo, hi = None, None
    for t in ds.map_batches(
        stats, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        for a, b in zip(t["lo"].to_pylist(), t["hi"].to_pylist()):
            lo = a if lo is None else min(lo, a)
            hi = b if hi is None else max(hi, b)
    if lo is None:
        for name in ("tokens_before", "bin_id", "bin_offset"):
            ds = ds.map_batches(
                lambda t, n=name: t.append_column(
                    n, pa.array([], type=pa.int64())
                ),
                batch_format="pyarrow",
            )
        return ds
    chunk = max((hi - lo + num_partitions) // num_partitions, 1)
    # hash ids can span nearly the whole int64 range, so (o - lo) can
    # exceed int64 — the unsigned reinterpretation makes the wrapping
    # subtraction exact (0 ≤ o − lo < 2⁶⁴ always)
    lo_u = np.uint64(lo & 0xFFFFFFFFFFFFFFFF)
    chunk_u = np.uint64(chunk)

    def tag(t: pa.Table) -> pa.Table:
        o = t[primary].to_numpy(zero_copy_only=False).astype(np.int64)
        diff = o.view(np.uint64) - lo_u
        return t.append_column(
            "_ppart", pa.array((diff // chunk_u).astype(np.int64))
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    part_sum = hash_aggregate(
        tagged, ["_ppart"], sum_cols=[len_col], count=False,
        num_partitions=num_partitions,
    ).to_pandas()  # ≤ num_partitions rows — the prefix fold input
    part_sum = part_sum.sort_values("_ppart")
    seeds = {}
    running = 0
    for p, s in zip(part_sum["_ppart"], part_sum[f"sum_{len_col}"]):
        seeds[int(p)] = running
        running += int(s)
    seeds_ref = ray.put(seeds)
    b = np.int64(budget)

    def scan(group: pa.Table) -> pa.Table:
        s = ray.get(seeds_ref)
        group = group.sort_by([(c, "ascending") for c in order_cols])
        ln = (
            group[len_col].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        seed = np.int64(s.get(int(group["_ppart"][0].as_py()), 0))
        before = seed + np.cumsum(ln) - ln
        group = group.append_column("tokens_before", pa.array(before))
        group = group.append_column("bin_id", pa.array(before // b))
        group = group.append_column("bin_offset", pa.array(before % b))
        return group.drop_columns(["_ppart"])

    return tagged.groupby("_ppart").map_groups(scan, batch_format="pyarrow")


def mixture_sample(
    sources: dict,
    weights: dict,
    id_col: str = "doc_id",
    rate_den: int = 1_000_003,
) -> Dataset:
    """Deterministic corpus mixture (the Pile/Dolma source-weighting
    operator): each source contributes ``floor(w)`` full epochs plus a
    deterministic fractional epoch sampled at rate ``w - floor(w)`` by
    the shared Knuth hash — so a weight of 2.4 means every document
    appears twice and a fixed 40% slice appears a third time.

    ``sources``: ``{name: Dataset}`` (same schema); ``weights``:
    ``{name: float ≥ 0}``.  Appends ``source`` (str) and ``epoch``
    (int64, 0-based).  Pure id arithmetic — identical mix across
    runs, chunkings and cluster sizes (unlike seeded RNG, which
    depends on block layout), and bit-exact in SQL: the fractional
    threshold is computed ONCE as the integer
    ``round(frac · rate_den)`` so both engines compare the same ints.

    Map-only (no shuffle): epoch fan-out happens inside each batch and
    the union streams.  Upsampling multiplies bytes, not exchanges.
    """
    import math

    names = sorted(sources)
    if set(names) != set(weights):
        raise ValueError("sources and weights must have identical keys")
    outs = []
    for name in names:
        w = float(weights[name])
        if w < 0 or not math.isfinite(w):
            raise ValueError(f"weight for {name!r} must be finite and ≥ 0: {w}")
        full, thr = mixture_epochs(w, rate_den)

        def fan(t: pa.Table, full=full, thr=thr, name=name) -> pa.Table:
            def with_tags(tbl: pa.Table, k: int) -> pa.Table:
                tbl = tbl.append_column(
                    "source", pa.array([name] * tbl.num_rows, type=pa.string())
                )
                return tbl.append_column(
                    "epoch", pa.array(np.full(tbl.num_rows, k, dtype=np.int64))
                )

            parts = [with_tags(t, k) for k in range(full)]
            if thr > 0:
                ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
                keep = _sample_hash(ids, rate_den) < np.int64(thr)
                parts.append(with_tags(t.filter(pa.array(keep)), full))
            if not parts:  # weight 0 (or fractional rounds to 0)
                return with_tags(t.slice(0, 0), 0)
            return pa.concat_tables(parts)

        outs.append(
            sources[name].map_batches(
                fan, batch_format="pyarrow", zero_copy_batch=True
            )
        )
    mix = outs[0]
    for o in outs[1:]:
        mix = mix.union(o)
    return mix


def mixture_epochs(w: float, rate_den: int = 1_000_003) -> tuple:
    """(full_epochs, fractional_threshold) of a mixture weight — the
    ONE definition of the epoch split, shared by
    :func:`mixture_sample` and any SQL twin (the threshold is the
    integer ``round((w - floor(w)) · rate_den)`` so both engines
    compare identical ints)."""
    import math

    full = math.floor(w)
    return full, int(round((w - full) * rate_den))


def global_rank(
    ds: Dataset,
    sort_cols: Sequence[tuple],
    bucket_fn,
    rank_col: str = "rank",
    num_partitions: int = 64,
) -> Dataset:
    """Global 1-based ORDER-BY rank WITHOUT an all-to-all sort — the
    distributed ``ROW_NUMBER() OVER (ORDER BY ...)``.

    ``sort_cols``: ``[(col, "ascending"|"descending"), ...]`` — the
    COMPOSITE must be a total order (make the last key unique, as the
    SQL twin would) for a deterministic result.
    ``bucket_fn(batch) -> int64 ndarray``: a caller-supplied COARSE key
    that is MONOTONE in the sort order (e.g. the negated primary for a
    descending sort, a timestamp day, a quantized score).  Rows never
    compare across buckets, so the global rank decomposes into
    (exclusive prefix of bucket sizes) + (local rank inside the
    bucket).

    Plan — the same histogram-offset shape as :func:`pack_by_budget`:

    1. map-only bucket histogram (ONE small grouped count — the only
       pre-pass; ships one row per distinct bucket per batch),
    2. exclusive prefix sum of bucket sizes on the driver (driver state
       = #buckets int64s, broadcast once via ``ray.put``),
    3. one hash exchange by bucket, then a vectorized in-bucket sort +
       ``offset + arange`` per bucket.

    Versus ``Dataset.sort``: the exchange is a plain hash shuffle (no
    sample-and-range-split barrier), the driver never sees row data,
    and downstream stages keep streaming per bucket.  Keep buckets
    ≲ a few million (the histogram lands on the driver).
    """
    import ray

    sort_cols = [
        sc if isinstance(sc, tuple) else (sc, "ascending") for sc in sort_cols
    ]

    def add_bucket(t: pa.Table) -> pa.Table:
        b = np.asarray(bucket_fn(t), dtype=np.int64)
        return t.append_column("_rbkt", pa.array(b))

    # materialize ONCE: the histogram pass and the ranking exchange
    # both consume this lineage — unmaterialized, an expensive
    # upstream (e.g. a corpus wordcount shuffle) would execute twice
    withb = ds.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    hist = (
        hash_aggregate(
            withb.select_columns(["_rbkt"]),
            ["_rbkt"],
            count=True,
            num_partitions=num_partitions,
        )
        .to_pandas()
        .sort_values("_rbkt")
    )
    sizes = hist["n"].to_numpy(dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int64)
    offsets = ray.put(
        (hist["_rbkt"].to_numpy(dtype=np.int64), starts)
    )

    def solve(part: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        bkts, offs = ray.get(offsets)
        out_parts = []
        # a map_groups partition is ONE bucket (groupby key), but stay
        # robust to multi-bucket coalescing
        for b in np.unique(part["_rbkt"].to_numpy(zero_copy_only=False)):
            sub = part.filter(pc.equal(part["_rbkt"], pa.scalar(int(b))))
            sub = sub.sort_by(sort_cols)
            pos = np.searchsorted(bkts, b)
            base = int(offs[pos])
            rk = pa.array(base + 1 + np.arange(sub.num_rows, dtype=np.int64))
            out_parts.append(sub.append_column(rank_col, rk))
        out = pa.concat_tables(out_parts)
        return out.drop_columns(["_rbkt"])

    return withb.groupby("_rbkt").map_groups(solve, batch_format="pyarrow")


def ntile(
    ds: Dataset,
    k: int,
    sort_cols: Sequence[tuple],
    bucket_fn,
    total: int | None = None,
    out_col: str = "tile",
    num_partitions: int = 64,
) -> Dataset:
    """Distributed ``NTILE(k) OVER (ORDER BY ...)`` — the equi-COUNT
    partitioner (vs :func:`assign_equidepth_bins`, which cuts by VALUE
    and splits ties by value only): :func:`global_rank` supplies the
    exact 1-based total-order rank without an all-to-all sort, then the
    SQL tile rule is a closed form over (rank, n, k) — the first
    ``n % k`` tiles get ``n//k + 1`` rows, the rest ``n//k`` — applied
    map-only.  Ties MUST be broken by the trailing sort key (same
    contract as ``global_rank``), so the assignment is bit-identical
    to the window function at any partitioning.

    ``total``: pass the (known) row count to skip the counting pass —
    e.g. parquet metadata; ``None`` counts ``ds`` (map-only).

    Returns the input rows + ``rank`` + ``out_col`` (1-based tile id).
    """
    if k < 1:
        raise ValueError(f"ntile: k must be >= 1, got {k}")
    n = int(total) if total is not None else ds.count()
    if n <= 0:
        raise ValueError("ntile: empty input")
    q, rem = divmod(n, k)
    big = rem * (q + 1)  # rows covered by the size-(q+1) tiles

    ranked = global_rank(
        ds, sort_cols, bucket_fn, rank_col="rank",
        num_partitions=num_partitions,
    )

    def assign(t: pa.Table) -> pa.Table:
        r0 = t["rank"].to_numpy(zero_copy_only=False) - 1  # 0-based
        if q == 0:
            tile = r0 + 1  # n < k: one row per tile
        else:
            tile = np.where(
                r0 < big, r0 // (q + 1) + 1, rem + (r0 - big) // q + 1
            )
        return t.append_column(out_col, pa.array(tile.astype(np.int64)))

    return ranked.map_batches(assign, batch_format="pyarrow")


def grouped_rank_sums(
    ds: Dataset,
    group_col: str,
    value_col: str,
    num_partitions: int = 64,
) -> Dataset:
    """Per-group DOUBLED rank sums over the COMBINED sample with
    average-rank tie handling — the shared ingredient of the classic
    rank tests (Mann-Whitney U / Wilcoxon rank-sum, Kruskal-Wallis H):

        2·R_g = Σ_v cnt_{g,v} · (2·count(< v) + count(= v) + 1)

    Doubling keeps tied average ranks (…·.5) exact int64.
    ``value_col`` must be integer-valued (quantize floats first) with
    BOUNDED distinct cardinality: the plan is one (group, value)
    grouped count exchange, one tiny value-histogram re-aggregate, a
    driver prefix fold over the distinct-value histogram broadcast
    once via ``ray.put`` (the same driver-state bound as
    :func:`global_rank`), and one final per-group sum — row data never
    lands on the driver.

    Returns ``(group_col, n_g, two_rsum)`` — exact int64, identical at
    any partitioning (all folds are order-independent sums)."""
    import ray

    gv = hash_aggregate(
        ds.map_batches(
            lambda t: t.select([group_col, value_col]),
            batch_format="pyarrow",
        ),
        [group_col, value_col], count=True, count_name="c",
        num_partitions=num_partitions,
    ).materialize()
    vh = (
        hash_aggregate(
            gv.map_batches(
                lambda t: t.select([value_col, "c"]), batch_format="pyarrow"
            ),
            [value_col], sum_cols=["c"], count=False,
            num_partitions=num_partitions,
        )
        .to_pandas()
        .sort_values(value_col)
    )  # bounded by the distinct-value cardinality
    vals = vh[value_col].to_numpy(dtype=np.int64)
    tv = vh["sum_c"].to_numpy(dtype=np.int64)
    before = np.concatenate([[0], np.cumsum(tv)[:-1]]).astype(np.int64)
    two_r = 2 * before + tv + 1  # doubled average rank of each value
    ref = ray.put((vals, two_r))

    def stamp(t: pa.Table) -> pa.Table:
        v, r2 = ray.get(ref)
        x = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(v, x)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {group_col: t[group_col], "n_g": t["c"],
             "two_rsum": pa.array(c * r2[pos])}
        )

    out = hash_aggregate(
        gv.map_batches(stamp, batch_format="pyarrow"),
        [group_col], sum_cols=["n_g", "two_rsum"], count=False,
        num_partitions=min(num_partitions, 8),
    )
    return out.map_batches(
        lambda t: pa.table(
            {group_col: t[group_col], "n_g": t["sum_n_g"],
             "two_rsum": t["sum_two_rsum"]}
        ),
        batch_format="pyarrow",
    )


def grouped_ranks(
    ds: Dataset,
    group_col: str,
    value_col: str,
    num_partitions: int = 64,
) -> Dataset:
    """Per-ROW rank within each group — the quantile-normalization /
    rank-transform feature op (``RANK`` density-equalizes a skewed
    feature; ``two_rank / (2·n_g)`` is the uniform transform).  Ties
    take the DOUBLED average rank (exact int64, same convention as
    :func:`grouped_rank_sums`); ``n_g`` (the group size) rides along
    so the normalizer needs no second join.

    ONE group-hash exchange (FNV on the group key — strings or ints),
    then an in-partition ``sort_by(group, value)`` + vectorized tie
    runs — never a task per group.

    Returns the input rows + ``two_rank`` + ``n_g``."""
    from rayraster.geo import fnv1a64

    def add_part(batch: pa.Table) -> pa.Table:
        col = batch[group_col]
        try:
            keys = col.to_numpy(zero_copy_only=False).astype(np.int64)
            h = np.abs(keys * np.int64(1000003))
        except (ValueError, TypeError):
            h = fnv1a64([str(v) for v in col.to_pylist()]).view(np.int64)
            h = np.abs(h)
        part = h % np.int64(num_partitions)
        return batch.append_column("_part", pa.array(part))

    def solve(part: pa.Table) -> pa.Table:
        part = part.drop_columns(["_part"]).sort_by(
            [(group_col, "ascending"), (value_col, "ascending")]
        )
        n = part.num_rows
        if n == 0:
            return part.append_column(
                "two_rank", pa.array([], type=pa.int64())
            ).append_column("n_g", pa.array([], type=pa.int64()))
        g = part[group_col].to_pylist()
        v = part[value_col].to_numpy(zero_copy_only=False)
        first = np.ones(n, dtype=bool)
        first[1:] = [g[i] != g[i - 1] for i in range(1, n)]
        gstart = np.flatnonzero(first)
        gend = np.concatenate([gstart[1:], [n]])
        sizes = gend - gstart
        n_g = np.repeat(sizes, sizes)
        # tie runs within each group: a new run starts at a group
        # boundary or a value change
        newrun = first.copy()
        newrun[1:] |= v[1:] != v[:-1]
        rstart = np.flatnonzero(newrun)
        rend = np.concatenate([rstart[1:], [n]])
        pos = np.arange(n, dtype=np.int64)
        base = np.repeat(gstart, sizes)  # group start of each row
        # doubled average rank of a run [s, e): (s+1) + e, 0-based in
        # group coords
        run_lo = np.repeat(rstart, rend - rstart)
        run_hi = np.repeat(rend, rend - rstart)
        two_rank = (run_lo - base + 1) + (run_hi - base)
        return part.append_column(
            "two_rank", pa.array(two_rank.astype(np.int64))
        ).append_column("n_g", pa.array(n_g.astype(np.int64)))

    parted = ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
    return parted.groupby("_part").map_groups(solve, batch_format="pyarrow")


def rank_interval(
    ds: Dataset, col: str, values: Sequence[float], batch_size: int = 262144,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact rank intervals ``(lo, hi) = (#rows < v, #rows <= v)`` for
    a handful of threshold ``values`` in ONE map-only streaming pass —
    no shuffle, one fixed-width int64 row per batch, summed on the
    driver (the verification half of a sketch-estimated quantile:
    :class:`rayraster.sketch.QDigest` answers, this certifies).
    NULL/NaN rows are ignored (rank semantics of ``quantile_disc``)."""
    import pyarrow.compute as pc

    v = np.asarray(list(values), np.float64)

    def count_batch(t: pa.Table) -> pa.Table:
        c = t[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        x = pc.drop_null(c).to_numpy(zero_copy_only=False).astype(np.float64)
        x = np.sort(x[~np.isnan(x)])
        row = np.concatenate([np.searchsorted(x, v, side="left"),
                              np.searchsorted(x, v, side="right")])
        return pa.table(
            {"blob": pa.array([row.astype(np.int64).tobytes()],
                              type=pa.binary())}
        )

    acc = np.zeros(2 * len(v), np.int64)
    counted = ds.map_batches(
        count_batch, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )
    for t in counted.iter_batches(batch_format="pyarrow", batch_size=4096):
        for blob in t["blob"].to_pylist():
            acc += np.frombuffer(blob, np.int64)
    return acc[: len(v)].copy(), acc[len(v):].copy()


def profile_table(
    ds: Dataset,
    columns: Sequence[str],
    distinct_mode: str = "exact",
    num_partitions: int = 64,
) -> pa.Table:
    """Column profile — the `describe`/data-quality operator every
    ingest pipeline runs first: one row per column with ``n``,
    ``nulls``, ``n_distinct``, ``min_v``/``max_v`` (rendered as
    strings so int and string columns share one output schema;
    DuckDB's ``CAST(BIGINT AS VARCHAR)`` renders identically, which
    the pytest twin pins).

    Shape at 10^12 rows: n/nulls/min/max for ALL columns come from ONE
    map-only streaming pass (a fixed-size partial row per batch,
    folded on the driver — no shuffle); ``n_distinct`` is
    ``distinct_mode``:

    * ``"exact"``  — one hash-partitioned ``distinct`` + count per
      column (|columns| small shuffles; right at raster/dimension
      scale and for the oracle gate),
    * ``"approx"`` — one shared HLL pass, NO shuffle (±2% typical) —
      the corpus-scale default,
    * ``"none"``   — skip (-1).

    NULL semantics match SQL aggregates: min/max/distinct ignore
    NULLs (``n_distinct`` counts distinct non-null values).
    """
    import pyarrow.compute as pc

    if distinct_mode not in ("exact", "approx", "none"):
        raise ValueError(
            f"distinct_mode must be exact|approx|none, got {distinct_mode!r}"
        )
    columns = list(columns)

    def stats_batch(t: pa.Table) -> pa.Table:
        cols = {}
        for c in columns:
            arr = t[c]
            cols[f"n_{c}"] = pa.array([t.num_rows], type=pa.int64())
            cols[f"nulls_{c}"] = pa.array([arr.null_count], type=pa.int64())
            valid = arr.null_count < len(arr)
            # min/max stay in the column's NATIVE type through the fold
            # (stringifying first would order ints lexicographically)
            mn = pc.min(arr).as_py() if valid else None
            mx = pc.max(arr).as_py() if valid else None
            typ = arr.type
            cols[f"min_{c}"] = pa.array([mn], type=typ)
            cols[f"max_{c}"] = pa.array([mx], type=typ)
        return pa.table(cols)

    acc: dict[str, object] = {f"n_{c}": 0 for c in columns}
    acc.update({f"nulls_{c}": 0 for c in columns})
    acc.update({f"min_{c}": None for c in columns})
    acc.update({f"max_{c}": None for c in columns})
    partials = ds.map_batches(
        stats_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    for t in partials.iter_batches(batch_format="pyarrow", batch_size=4096):
        for c in columns:
            acc[f"n_{c}"] += int(pc.sum(t[f"n_{c}"]).as_py() or 0)
            acc[f"nulls_{c}"] += int(pc.sum(t[f"nulls_{c}"]).as_py() or 0)
            for side, op in (("min", min), ("max", max)):
                col = [v for v in t[f"{side}_{c}"].to_pylist() if v is not None]
                if col:
                    cur = acc[f"{side}_{c}"]
                    best = op(col)
                    acc[f"{side}_{c}"] = best if cur is None else op(cur, best)

    nd = {c: -1 for c in columns}
    if distinct_mode == "exact":
        for c in columns:
            nonnull = ds.map_batches(
                lambda t, c=c: pa.table({c: pc.drop_null(t[c])}),
                batch_format="pyarrow", zero_copy_batch=True,
            )
            nd[c] = distinct(nonnull, [c], num_partitions=num_partitions).count()
    elif distinct_mode == "approx":
        from rayraster.sketch import HLL, _col_hashes

        def hll_batch(t: pa.Table) -> pa.Table:
            blobs = []
            for c in columns:
                h = HLL()
                nn = pc.drop_null(t[c])
                if len(nn):
                    h.add_hashes(_col_hashes(pa.table({c: nn}), c))
                blobs.append(h.to_bytes())
            return pa.table({"blob": pa.array([b"".join(blobs)], type=pa.binary())})

        hs = [HLL() for _ in columns]
        width = len(hs[0].to_bytes())
        folded = ds.map_batches(
            hll_batch, batch_format="pyarrow", zero_copy_batch=True
        )
        for t in folded.iter_batches(batch_format="pyarrow", batch_size=4096):
            for blob in t["blob"].to_pylist():
                for i in range(len(columns)):
                    hs[i].merge(HLL.from_bytes(blob[i * width:(i + 1) * width]))
        nd = {c: int(round(h.estimate())) for c, h in zip(columns, hs)}

    def _s(v) -> str | None:
        return None if v is None else str(v)

    return pa.table(
        {"column": pa.array(columns, type=pa.string()),
         "n": pa.array([acc[f"n_{c}"] for c in columns], type=pa.int64()),
         "nulls": pa.array([acc[f"nulls_{c}"] for c in columns], type=pa.int64()),
         "n_distinct": pa.array([nd[c] for c in columns], type=pa.int64()),
         "min_v": pa.array([_s(acc[f"min_{c}"]) for c in columns],
                           type=pa.string()),
         "max_v": pa.array([_s(acc[f"max_{c}"]) for c in columns],
                           type=pa.string())}
    )


def rank_interval_grouped(
    ds: Dataset, group_col: str, col: str, thresholds: dict,
    batch_size: int = 262144,
) -> tuple[dict, dict]:
    """Per-group :func:`rank_interval`: for each group key in
    ``thresholds`` (→ array of values), exact ``(#< v, #<= v)`` within
    that group — still ONE map-only pass (per-batch sorted-segment
    ``searchsorted`` per present group, fixed-width blob rows summed
    on the driver).  Returns ``({group: lo}, {group: hi})``."""
    import pyarrow.compute as pc

    keys = sorted(thresholds)
    kidx = {key: i for i, key in enumerate(keys)}
    vlists = [np.asarray(thresholds[key], np.float64) for key in keys]
    offs = np.concatenate([[0], np.cumsum([len(v) for v in vlists])])
    total = int(offs[-1])

    def count_batch(t: pa.Table) -> pa.Table:
        t = pa.table({group_col: t[group_col], col: t[col]})
        t = t.drop_null().combine_chunks()
        row = np.zeros(2 * total, np.int64)
        if t.num_rows:
            t = t.sort_by([(group_col, "ascending"), (col, "ascending")])
            g = t[group_col]
            v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
            eq = pc.equal(g.slice(1), g.slice(0, len(g) - 1)).to_numpy(
                zero_copy_only=False
            )
            starts = np.concatenate([[0], np.nonzero(~eq)[0] + 1])
            ends = np.append(starts[1:], len(g))
            for s, e in zip(starts.tolist(), ends.tolist()):
                key = g[s].as_py()
                i = kidx.get(key)
                if i is None:
                    continue
                x = v[s:e]
                x = x[~np.isnan(x)]
                lo = np.searchsorted(x, vlists[i], side="left")
                hi = np.searchsorted(x, vlists[i], side="right")
                row[offs[i]:offs[i + 1]] += lo
                row[total + offs[i]:total + offs[i + 1]] += hi
        return pa.table({"blob": pa.array([row.tobytes()], type=pa.binary())})

    acc = np.zeros(2 * total, np.int64)
    counted = ds.map_batches(
        count_batch, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )
    for t in counted.iter_batches(batch_format="pyarrow", batch_size=4096):
        for blob in t["blob"].to_pylist():
            acc += np.frombuffer(blob, np.int64)
    lo = {key: acc[offs[i]:offs[i + 1]].copy() for i, key in enumerate(keys)}
    hi = {key: acc[total + offs[i]:total + offs[i + 1]].copy()
          for i, key in enumerate(keys)}
    return lo, hi


def assign_equidepth_bins(
    ds: Dataset, value_col: str, cuts, bin_col: str = "bin"
) -> Dataset:
    """Equi-depth (quantile) binning: append ``bin_col`` = the number
    of cut points STRICTLY below the value (``Σ value > cut`` — the
    SQL-twin form; values equal to a cut fall in the lower bin, and
    duplicate cuts from heavy repeated values collapse bins exactly
    like the CASE-sum would).  With cuts from
    :func:`exact_quantiles` this is the feature-engineering
    discretizer (equal-population bins), map-only: one vectorized
    ``searchsorted`` per batch against the broadcast cut vector — no
    shuffle, composable with any downstream grouped aggregate.

    ``cuts`` must be sorted ascending (raises otherwise)."""
    import numpy as np

    c = np.asarray(list(cuts), dtype=np.float64)
    if len(c) == 0:
        raise ValueError("assign_equidepth_bins: need at least one cut")
    if np.any(np.diff(c) < 0):
        raise ValueError("assign_equidepth_bins: cuts must be sorted ascending")

    def assign(t: pa.Table) -> pa.Table:
        x = t[value_col].to_numpy(zero_copy_only=False)
        # searchsorted(side='left') = #cuts strictly below x; NaN/NULL
        # values sort past every cut — mask them to bin -1
        b = np.searchsorted(c, x, side="left").astype(np.int64)
        b = np.where(np.isnan(x), np.int64(-1), b)
        return t.append_column(bin_col, pa.array(b))

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def grouped_variance(
    ds: Dataset,
    keys: Sequence[str],
    value_col: str,
    num_partitions: int = 64,
) -> Dataset:
    """Per-group mean / population variance / population stddev from
    the algebraic (n, Σx, Σx²) decomposition — the mergeable moments
    every feature-statistics pass needs, riding the SAME partial →
    shuffle → fold plan as :func:`hash_aggregate` (the squares column
    is added map-only before the exchange, so this costs exactly one
    grouped-sum exchange).

    Exactness contract (this module's twin rule): for INTEGER values
    the sums are exact int64 and every output is ONE fixed-order
    float expression —

        mean = Σx / n
        var  = (n·Σx² − (Σx)²) / n²          (population)
        std  = sqrt(var)                      (sqrt is libm-bit-exact)

    — reproducible bit-for-bit in SQL from the same BIGINT sums
    (pytest-pinned).  ``n·Σx²`` and ``(Σx)²`` must stay below 2^63
    (checked per batch in Python ints; raise → pre-scale or shard).
    Float inputs work but carry the usual order-dependent-summation
    caveat (pyarrow's grouped sum order is deterministic per plan, not
    per algebra).

    Returns one row per key: ``[*keys, n, sum_v, sumsq_v, mean, var,
    std]``."""
    import pyarrow.compute as pc

    keys = list(keys)

    def add_sq(t: pa.Table) -> pa.Table:
        v = t[value_col]
        if pa.types.is_integer(v.type):
            x = v.cast(pa.int64()).to_numpy(zero_copy_only=False)
            if len(x):
                m = max(abs(int(x.max())), abs(int(x.min())))
                if m * m > 2**63 - 1:
                    raise ValueError(
                        "grouped_variance: value² exceeds int64 — pre-scale"
                    )
            sq = pa.array(x * x)
            # float64 SHADOW of the squares: the grouped int64 sum can
            # wrap silently even when every term fits (two 9.2e18
            # terms), and a post-fold bound check would inspect the
            # already-wrapped value — finish() compares the int sum to
            # this shadow (a wrap shifts it by ~2^64, float drift is
            # orders of magnitude smaller) and raises
            sqf = pa.array((x * x).astype(np.float64))
            return pa.table({**{k: t[k] for k in keys}, value_col: v,
                             "_sq": sq, "_sqf": sqf})
        sq = pc.multiply(v, v)
        return pa.table({**{k: t[k] for k in keys}, value_col: v,
                         "_sq": sq, "_sqf": sq.cast(pa.float64())})

    prepped = ds.map_batches(add_sq, batch_format="pyarrow", zero_copy_batch=True)
    agg = hash_aggregate(
        prepped, keys, sum_cols=[value_col, "_sq", "_sqf"], count=True,
        num_partitions=num_partitions,
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx_col = t[f"sum_{value_col}"]
        sx = sx_col.to_numpy(zero_copy_only=False)
        sx2 = t["sum__sq"].to_numpy(zero_copy_only=False)
        if pa.types.is_integer(sx_col.type) and len(n):
            ni = t["n"].to_numpy(zero_copy_only=False)
            sx2f = t["sum__sqf"].to_numpy(zero_copy_only=False)
            drift = np.abs(sx2.astype(np.float64) - sx2f)
            if (drift > 0.01 * np.maximum(1.0, np.abs(sx2f))).any():
                raise ValueError(
                    "grouped_variance: Σx² wrapped int64 in the "
                    "grouped sum — pre-scale or shard the group"
                )
            if (
                max(int(np.abs(sx2).max()) * int(ni.max()), int(np.abs(sx).max()) ** 2)
                > 2**63 - 1
            ):
                raise ValueError(
                    "grouped_variance: n·Σx² exceeds int64 — pre-scale"
                )
            num = ni * sx2 - sx * sx  # exact int64 (guarded above)
            nf = ni.astype(np.float64)
            # denominator in float (n² would wrap int64 past n ~ 3e9;
            # n < 2^53 keeps nf*nf == n² exactly — same as the twin's
            # CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
            var = num.astype(np.float64) / (nf * nf)
            mean = sx.astype(np.float64) / nf
        else:
            var = (n * sx2 - sx * sx) / (n * n)
            mean = sx / n
        return pa.table(
            {
                **{k: t[k] for k in keys},
                "n": t["n"],
                f"sum_{value_col}": sx_col,
                f"sumsq_{value_col}": t["sum__sq"],
                "mean": pa.array(mean),
                "var": pa.array(var),
                "std": pa.array(np.sqrt(np.maximum(var, 0.0))),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def trimmed_mean(
    ds: Dataset,
    col: str,
    trim_num: int = 1,
    trim_den: int = 20,
    batch_size: int = 262144,
) -> dict:
    """EXACT distributed trimmed AND winsorized mean of an integer
    column with NO shuffle — the robust-statistics companion of
    :func:`exact_quantiles` (outlier-proof corpus averages: mean doc
    length / value / latency with the tails cut).

    ``k = (n · trim_num) // trim_den`` rows are trimmed from EACH
    tail (exact integer rational — no float trim fraction), so the
    result is the textbook trimmed mean: mean of ranks ``k … n−k−1``
    in sorted order, ties handled by rank arithmetic, identical to a
    ``ROW_NUMBER``-filtered SQL twin.  The winsorized mean replaces
    each trimmed tail by ``k`` copies of the nearest kept value.

    Shape: one map-only stats pass (n, total, max |v|), ONE
    :func:`exact_quantiles` call resolving all four cut ranks
    (iterative histogram refinement — itself map-only), and one final
    map-only pass counting/summing the strict tails; every sum is an
    exact int64-per-batch → Python-int driver fold, so the two means
    are single IEEE divisions of exact integers — bit-identical
    across partitionings, cluster sizes and the SQL twin.

    Integer columns only (float sums are order-dependent; quantize
    upstream — the engine's established ``floor(v·100)`` pattern).

    Returns ``{n, k, lower, upper, trimmed_n, trimmed_sum,
    trimmed_mean, winsorized_sum, winsorized_mean}``.
    """
    import pyarrow.compute as pc

    if not (0 <= trim_num * 2 < trim_den):
        raise ValueError(
            f"trimmed_mean: need 0 <= 2·trim_num/trim_den < 1, got "
            f"{trim_num}/{trim_den}"
        )

    def stats_batch(t: pa.Table) -> pa.Table:
        c = t[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        if not pa.types.is_integer(c.type):
            raise ValueError(
                f"trimmed_mean: {col!r} must be an integer column "
                "(float sums are order-dependent; quantize upstream)"
            )
        x = pc.drop_null(c).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(x) == 0:
            row = np.zeros(3, dtype=np.int64)
        else:
            if int(np.abs(x).max()) * len(x) >= 2**63:
                raise ValueError(
                    "trimmed_mean: per-batch sum could overflow int64 — "
                    "rescale the column or lower batch_size"
                )
            row = np.array([len(x), x.sum(), np.abs(x).max()], dtype=np.int64)
        return pa.table({"blob": pa.array([row.tobytes()], type=pa.binary())})

    n = 0
    total = 0
    for t in ds.map_batches(
        stats_batch, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    ).iter_batches(batch_format="pyarrow"):
        for blob in t["blob"].to_pylist():
            r = np.frombuffer(blob, np.int64)
            n += int(r[0])
            total += int(r[1])
    if n == 0:
        raise ValueError("trimmed_mean: no non-null rows")

    k = (n * trim_num) // trim_den
    if k == 0:
        m = total / n
        return {"n": n, "k": 0, "lower": None, "upper": None,
                "trimmed_n": n, "trimmed_sum": total, "trimmed_mean": m,
                "winsorized_sum": total, "winsorized_mean": m}

    # ranks (0-based): k−1 = largest trimmed low, k = first kept (the
    # winsor lower clamp), n−k−1 = last kept (upper clamp), n−k =
    # smallest trimmed high.  q = (rank + 0.5)/n makes ceil(n·q)−1 hit
    # each rank robustly against float rounding.
    ranks = [k - 1, k, n - k - 1, n - k]
    vb, lo_keep, hi_keep, vt = (
        int(v) for v in exact_quantiles(
            ds, col, [(r + 0.5) / n for r in ranks], batch_size=batch_size,
        )
    )

    def tail_batch(t: pa.Table) -> pa.Table:
        c = t[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        x = pc.drop_null(c).to_numpy(zero_copy_only=False).astype(np.int64)
        lt = x < vb
        gt = x > vt
        row = np.array(
            [lt.sum(), x[lt].sum(), gt.sum(), x[gt].sum()], dtype=np.int64
        )
        return pa.table({"blob": pa.array([row.tobytes()], type=pa.binary())})

    c_lt = s_lt = c_gt = s_gt = 0
    for t in ds.map_batches(
        tail_batch, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    ).iter_batches(batch_format="pyarrow"):
        for blob in t["blob"].to_pylist():
            r = np.frombuffer(blob, np.int64)
            c_lt += int(r[0]); s_lt += int(r[1])
            c_gt += int(r[2]); s_gt += int(r[3])

    bottom = s_lt + (k - c_lt) * vb
    top = s_gt + (k - c_gt) * vt
    tsum = total - bottom - top
    tn = n - 2 * k
    wsum = tsum + k * lo_keep + k * hi_keep
    return {
        "n": n, "k": k, "lower": lo_keep, "upper": hi_keep,
        "trimmed_n": tn, "trimmed_sum": tsum, "trimmed_mean": tsum / tn,
        "winsorized_sum": wsum, "winsorized_mean": wsum / n,
    }


def grouped_linreg(
    ds: Dataset,
    keys: Sequence[str],
    x_col: str,
    y_col: str,
    num_partitions: int = 64,
) -> Dataset:
    """Per-group ordinary least squares y = slope·x + intercept plus
    the Pearson correlation — from the algebraic bivariate moments
    (n, Σx, Σy, Σx², Σy², Σxy), riding ONE grouped-sum exchange (the
    square/product columns are added map-only before it, exactly like
    :func:`grouped_variance`).

    Exactness contract: INTEGER inputs keep every moment an exact
    int64 (per-batch |x|·|y| / x² / y² bound checks raise instead of
    wrapping), and each output is one fixed-order float expression —

        cov_n  = n·Σxy − Σx·Σy       (each moment cast to double FIRST:
        varx_n = n·Σx² − (Σx)²        the int64 product n·Σxy can pass
        vary_n = n·Σy² − (Σy)²        2^63 long before the doubles lose
        slope  = cov_n / varx_n       anything a twin could detect)
        intercept = (Σy − slope·Σx) / n
        r  = cov_n / (sqrt(varx_n) · sqrt(vary_n))
        r² = r·r

    — reproducible bit-for-bit in SQL from the same BIGINT sums.
    Degenerate groups (constant x) yield ±inf/NaN in BOTH engines the
    same IEEE way; sqrt is libm-bit-exact (the module's twin rule).

    Returns one row per key: ``[*keys, n, sum_x, sum_y, sum_xx,
    sum_yy, sum_xy, slope, intercept, r, r2]``."""
    import pyarrow.compute as pc

    keys = list(keys)

    def add_moments(t: pa.Table) -> pa.Table:
        xa, ya = t[x_col], t[y_col]
        if pa.types.is_integer(xa.type) and pa.types.is_integer(ya.type):
            x = xa.cast(pa.int64()).to_numpy(zero_copy_only=False)
            y = ya.cast(pa.int64()).to_numpy(zero_copy_only=False)
            if len(x):
                mx = max(abs(int(x.max())), abs(int(x.min())))
                my = max(abs(int(y.max())), abs(int(y.min())))
                if max(mx * mx, my * my, mx * my) > 2**63 - 1:
                    raise ValueError(
                        "grouped_linreg: value product exceeds int64 — pre-scale"
                    )
            xx, yy, xy = pa.array(x * x), pa.array(y * y), pa.array(x * y)
        else:
            xx, yy, xy = (
                pc.multiply(xa, xa), pc.multiply(ya, ya), pc.multiply(xa, ya)
            )
        # float64 shadow of the largest moment: the grouped int64 sums
        # can wrap even when every per-row product fits int64 — see
        # grouped_variance's shadow for the detection rationale
        return pa.table(
            {**{k: t[k] for k in keys}, "_x": xa, "_y": ya,
             "_xx": xx, "_yy": yy, "_xy": xy,
             "_xxf": xx.cast(pa.float64()), "_yyf": yy.cast(pa.float64()),
             "_xyf": xy.cast(pa.float64())}
        )

    prepped = ds.map_batches(add_moments, batch_format="pyarrow", zero_copy_batch=True)
    agg = hash_aggregate(
        prepped, keys,
        sum_cols=["_x", "_y", "_xx", "_yy", "_xy", "_xxf", "_yyf", "_xyf"],
        count=True, num_partitions=num_partitions,
    )

    def finish(t: pa.Table) -> pa.Table:
        ni = t["n"].to_numpy(zero_copy_only=False)
        sx = t["sum__x"].to_numpy(zero_copy_only=False)
        sy = t["sum__y"].to_numpy(zero_copy_only=False)
        sxx = t["sum__xx"].to_numpy(zero_copy_only=False)
        syy = t["sum__yy"].to_numpy(zero_copy_only=False)
        sxy = t["sum__xy"].to_numpy(zero_copy_only=False)
        if pa.types.is_integer(t["sum__xx"].type):
            for s_int, shadow in (
                (sxx, "sum__xxf"), (syy, "sum__yyf"), (sxy, "sum__xyf")
            ):
                sf = t[shadow].to_numpy(zero_copy_only=False)
                drift = np.abs(s_int.astype(np.float64) - sf)
                if (drift > 0.01 * np.maximum(1.0, np.abs(sf))).any():
                    raise ValueError(
                        "grouped_linreg: a moment sum wrapped int64 in "
                        "the grouped fold — pre-scale or shard the group"
                    )
        nf = ni.astype(np.float64)
        sxf, syf = sx.astype(np.float64), sy.astype(np.float64)
        sxxf, syyf = sxx.astype(np.float64), syy.astype(np.float64)
        sxyf = sxy.astype(np.float64)
        cov_n = nf * sxyf - sxf * syf
        varx_n = nf * sxxf - sxf * sxf
        vary_n = nf * syyf - syf * syf
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = cov_n / varx_n
            intercept = (syf - slope * sxf) / nf
            r = cov_n / (np.sqrt(varx_n) * np.sqrt(vary_n))
        return pa.table(
            {
                **{k: t[k] for k in keys},
                "n": t["n"],
                "sum_x": t["sum__x"], "sum_y": t["sum__y"],
                "sum_xx": t["sum__xx"], "sum_yy": t["sum__yy"],
                "sum_xy": t["sum__xy"],
                "slope": pa.array(slope), "intercept": pa.array(intercept),
                "r": pa.array(r), "r2": pa.array(r * r),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def skyline(
    ds: Dataset,
    a_col: str,
    b_col: str,
    num_partitions: int = 8,
    max_candidates: int = 1_000_000,
) -> Dataset:
    """Distributed 2-D skyline (Pareto frontier, both objectives
    MAXIMIZED): rows for which no other row is ≥ on both columns and
    > on at least one.  Duplicated frontier points (equal on both
    objectives) are all kept — neither dominates the other.

    The skyline operator is self-decomposing: ``sky(A ∪ B) =
    sky(sky(A) ∪ sky(B))``, so the plan is per-batch local skylines
    (vectorized: one lexsort + a strict prefix-max over the per-a-group
    b maxima — no pairwise loop) folded through ONE single-group
    reduce over the pruned candidates.  Candidate volume is the sum of
    per-batch skyline sizes — typically a few points per batch on
    real-valued data; ``max_candidates`` raises (never truncates) if a
    degenerate input (e.g. perfectly anti-correlated objectives) makes
    the frontier itself huge, in which case pre-bucket by a coarse
    ``a`` range and skyline each bucket with a b-threshold handoff.

    To MINIMIZE an objective, negate the column first (map-only)."""

    def _local(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False)
        b = t[b_col].to_numpy(zero_copy_only=False)
        n = len(a)
        if n == 0:
            return t
        order = np.lexsort((-b, -a))
        a_s, b_s = a[order], b[order]
        grp = np.empty(n, dtype=bool)
        grp[0] = True
        grp[1:] = a_s[1:] != a_s[:-1]
        starts = np.flatnonzero(grp)
        bmax = b_s[starts]  # per-a-group max (b sorted desc in group)
        # strict prefix max over groups with larger a
        prev = np.concatenate(([np.iinfo(np.int64).min if bmax.dtype.kind == "i"
                                else -np.inf], np.maximum.accumulate(bmax)[:-1]))
        keep_grp = bmax > prev
        gidx = np.cumsum(grp) - 1
        keep = keep_grp[gidx] & (b_s == bmax[gidx])
        return t.take(pa.array(order[keep]))

    pruned = ds.map_batches(_local, batch_format="pyarrow", zero_copy_batch=True)

    def _fold(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_one"])
        if g.num_rows > max_candidates:
            raise ValueError(
                f"skyline: {g.num_rows} fold candidates > max_candidates="
                f"{max_candidates} — pre-bucket by a-range"
            )
        return _local(g)

    tagged = pruned.map_batches(
        lambda t: t.append_column("_one", pa.array(np.zeros(t.num_rows, np.int64))),
        batch_format="pyarrow",
    )
    return tagged.groupby("_one").map_groups(_fold, batch_format="pyarrow")


def _sentinel_key_types(ds, keys, sentinels) -> dict:
    """Arrow type per rollup/cube key: the input schema's type when it
    is a real Arrow type (Ray Schema.types may hold Python classes for
    pandas-backed blocks), else inferred from the sentinel value —
    shared by rollup_aggregate and cube_aggregate so their rolled-up
    sentinel columns always union with the retained levels."""
    sch = ds.schema()

    def _ktype(k):
        if sch is not None and k in sch.names:
            t = sch.types[sch.names.index(k)]
            if isinstance(t, pa.DataType):
                return t
        return pa.array([sentinels[k]]).type

    return {k: _ktype(k) for k in keys}


def rollup_aggregate(
    ds: Dataset,
    keys: Sequence[str],
    sum_col: str,
    sentinels: dict,
    num_partitions: int = 64,
) -> Dataset:
    """GROUP BY ROLLUP: the (count, sum) aggregate at EVERY prefix of
    ``keys`` — (k1,…,kd), (k1,…,k(d−1)), …, (), the warehouse
    multi-level rollup — from ONE row exchange.  Only the finest level
    aggregates the input; every coarser level re-aggregates the
    previous level's already-reduced output (sums of sums, sums of
    counts — the same geometric-tail argument as the tile pyramid), so
    the whole rollup costs the finest groupby + a vanishing tail.

    Rolled-up key columns carry caller ``sentinels`` (never NULL — a
    NULL numeric would break NaN-equality in oracle compares) and
    every row carries ``lvl`` = number of keys retained.  The DuckDB
    twin is native ``GROUP BY ROLLUP`` with ``GROUPING()`` mapped to
    the same sentinels."""
    keys = list(keys)
    if not keys:
        raise ValueError("rollup_aggregate: need at least one key")
    missing = [k for k in keys if k not in sentinels]
    if missing:
        raise ValueError(f"rollup_aggregate: no sentinel for {missing}")

    key_types = _sentinel_key_types(ds, keys, sentinels)
    finest = hash_aggregate(
        ds, keys, sum_cols=[sum_col], count=True, num_partitions=num_partitions
    ).map_batches(
        lambda t: t.rename_columns(
            ["rsum" if c == f"sum_{sum_col}" else c for c in t.column_names]
        ),
        batch_format="pyarrow",
    ).materialize()  # every level re-aggregates THIS, never the input

    def _project(lvl: int):
        kept = keys[:lvl]

        def fn(t: pa.Table) -> pa.Table:
            cols = {}
            for k in keys:
                if k in kept:
                    cols[k] = t[k]
                else:
                    cols[k] = pa.array(
                        [sentinels[k]] * t.num_rows, type=key_types[k],
                    )
            cols["rsum"] = t["rsum"]
            cols["n"] = t["n"]
            cols["lvl"] = pa.array(np.full(t.num_rows, lvl, dtype=np.int64))
            return pa.table(cols)

        return fn

    levels = [finest.map_batches(_project(len(keys)), batch_format="pyarrow")]
    prev = finest
    for lvl in range(len(keys) - 1, 0, -1):
        prev = hash_aggregate(
            prev, keys[:lvl], sum_cols=["rsum", "n"], count=False,
            num_partitions=max(8, num_partitions // 4),
        ).map_batches(
            lambda t: t.rename_columns(
                [c.removeprefix("sum_") for c in t.column_names]
            ),
            batch_format="pyarrow",
        )
        levels.append(prev.map_batches(_project(lvl), batch_format="pyarrow"))

    # grand total: one single-group fold over the lvl-1 output
    def _total(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_one"])
        cols = {
            k: pa.array([sentinels[k]], type=key_types[k]) for k in keys
        }
        cols["rsum"] = pa.array(
            [int(np.sum(g["rsum"].to_numpy(zero_copy_only=False)))], type=pa.int64()
        )
        cols["n"] = pa.array(
            [int(np.sum(g["n"].to_numpy(zero_copy_only=False)))], type=pa.int64()
        )
        cols["lvl"] = pa.array([0], type=pa.int64())
        return pa.table(cols)

    total = prev.map_batches(
        lambda t: t.append_column("_one", pa.array(np.zeros(t.num_rows, np.int64))),
        batch_format="pyarrow",
    ).groupby("_one").map_groups(_total, batch_format="pyarrow")

    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out.union(total)


def cube_aggregate(
    ds: Dataset,
    keys: Sequence[str],
    sum_col: str,
    sentinels: dict,
    num_partitions: int = 64,
) -> Dataset:
    """GROUP BY CUBE: the (count, sum) aggregate at EVERY subset of
    ``keys`` (2^d grouping sets).  Same plan shape as
    :func:`rollup_aggregate` — the finest groupby is the only row
    exchange; every other subset re-aggregates the finest output
    (already one row per distinct key combination), so the input is
    read once no matter how many grouping sets the cube spans.
    ``lvl`` = number of keys retained (subsets of equal size are
    distinguished by their sentinel pattern, exactly like GROUPING()).
    d is capped at 4 (16 sets) — past that use explicit rollups."""
    from itertools import combinations

    keys = list(keys)
    if not keys:
        raise ValueError("cube_aggregate: need at least one key")
    if len(keys) > 4:
        raise ValueError("cube_aggregate: more than 4 keys (2^d sets) — "
                         "use explicit rollup_aggregate calls")
    missing = [k for k in keys if k not in sentinels]
    if missing:
        raise ValueError(f"cube_aggregate: no sentinel for {missing}")

    key_types = _sentinel_key_types(ds, keys, sentinels)
    finest = hash_aggregate(
        ds, keys, sum_cols=[sum_col], count=True, num_partitions=num_partitions
    ).map_batches(
        lambda t: t.rename_columns(
            ["rsum" if c == f"sum_{sum_col}" else c for c in t.column_names]
        ),
        batch_format="pyarrow",
    ).materialize()  # every level re-aggregates THIS, never the input

    def _project(kept: tuple):
        def fn(t: pa.Table) -> pa.Table:
            cols = {}
            for k in keys:
                if k in kept:
                    cols[k] = t[k]
                else:
                    cols[k] = pa.array(
                        [sentinels[k]] * t.num_rows, type=key_types[k],
                    )
            cols["rsum"] = t["rsum"]
            cols["n"] = t["n"]
            cols["lvl"] = pa.array(np.full(t.num_rows, len(kept), dtype=np.int64))
            return pa.table(cols)

        return fn

    out = finest.map_batches(_project(tuple(keys)), batch_format="pyarrow")
    parts2 = max(8, num_partitions // 4)
    for size in range(len(keys) - 1, 0, -1):
        for kept in combinations(keys, size):
            sub = hash_aggregate(
                finest, list(kept), sum_cols=["rsum", "n"], count=False,
                num_partitions=parts2,
            ).map_batches(
                lambda t: t.rename_columns(
                    [c.removeprefix("sum_") for c in t.column_names]
                ),
                batch_format="pyarrow",
            )
            out = out.union(sub.map_batches(_project(kept), batch_format="pyarrow"))

    def _total(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_one"])
        cols = {
            k: pa.array([sentinels[k]], type=key_types[k]) for k in keys
        }
        cols["rsum"] = pa.array(
            [int(np.sum(g["rsum"].to_numpy(zero_copy_only=False)))], type=pa.int64()
        )
        cols["n"] = pa.array(
            [int(np.sum(g["n"].to_numpy(zero_copy_only=False)))], type=pa.int64()
        )
        cols["lvl"] = pa.array([0], type=pa.int64())
        return pa.table(cols)

    total = finest.map_batches(
        lambda t: t.append_column("_one", pa.array(np.zeros(t.num_rows, np.int64))),
        batch_format="pyarrow",
    ).groupby("_one").map_groups(_total, batch_format="pyarrow")
    return out.union(total)


def grouped_mad(
    ds: Dataset,
    group_col: str,
    value_col: str,
    num_partitions: int = 64,
) -> Dataset:
    """Per-group MEDIAN ABSOLUTE DEVIATION — the robust spread
    statistic (outliers move a variance arbitrarily; they move the
    MAD not at all until they are half the data): ``mad =
    median(|x − median(x)|)`` with :func:`grouped_quantiles`' exact
    ``quantile_disc`` rank rule (``k = ceil(n/2) − 1``) at both
    levels.

    Two grouped-quantile passes: medians (one grouped exchange),
    broadcast once via ``ray.put`` (one small row per group), map-only
    vectorized ``|x − med|`` (C++ ``index_in`` group lookup — no
    per-row Python), then the second grouped exchange.  Every residual
    is one IEEE subtraction of the group's exact discrete median —
    reproducible bit-for-bit by a nested ``quantile_disc`` SQL twin.

    Returns one row per group: ``[group_col, med, mad]``."""
    import ray

    med = grouped_quantiles(
        ds, [group_col], value_col, [0.5], num_partitions=num_partitions
    ).to_pandas()  # post-aggregation: one row per group
    med_ref = ray.put(
        (med[group_col].to_numpy(), med["value"].to_numpy(dtype=np.float64))
    )

    class _Resid:
        def __init__(self, ref):
            self._g, self._m = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            idx = pc.index_in(
                t[group_col], value_set=pa.array(self._g)
            ).to_numpy(zero_copy_only=False)
            v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
            return pa.table(
                {group_col: t[group_col],
                 "_r": pa.array(np.abs(v - self._m[idx]))}
            )

    resid = ds.map_batches(_Resid(med_ref), batch_format="pyarrow")
    mad = grouped_quantiles(
        resid, [group_col], "_r", [0.5], num_partitions=num_partitions
    ).to_pandas()
    mmap = dict(zip(mad[group_col], mad["value"]))
    out = med[[group_col]].copy()
    out["med"] = med["value"].to_numpy()
    out["mad"] = [mmap[x] for x in med[group_col]]
    import ray.data as _rd

    return _rd.from_arrow(pa.Table.from_pandas(out, preserve_index=False))
