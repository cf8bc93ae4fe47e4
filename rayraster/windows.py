"""Tumbling-window aggregates over an event stream table.

Ray Data is a batch engine (the reference is strictly batch too —
SURVEY.md §2 "Streaming: none"); stream-shaped workloads are treated
as an ordered log: the window id is a pure function of the timestamp,
so windowed aggregation is just the engine's hash-partitioned grouped
aggregate with (key, window) keys — no watermarks, no state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from rayraster.agg import hash_aggregate


def _key_part(col, num_partitions: int) -> np.ndarray:
    """Partition id for a key column — delegates to ``agg._part_of``
    so windows.py shares ONE key-hash convention with every grouped
    aggregate (type-based dispatch, −0.0 float normalization, the
    string buffer path; NULL hashes like "None").  Type-based dispatch
    matters: a content-based try/except would route the same key
    value through different hash functions in different batches and
    silently fragment per-key results across partitions."""
    from rayraster.agg import _part_of

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return _part_of(pa.table({"_k": col}), ["_k"], num_partitions)


def add_tumbling_window(
    batch: pa.Table, ts_col: str = "ts", window_us: int = 3_600_000_000
) -> pa.Table:
    """window = floor(epoch_us / window_us) — SQL twin:
    ``epoch_us(ts) // {window_us}`` (non-negative timestamps)."""
    us = (
        batch[ts_col]
        .cast(pa.timestamp("us"))
        .cast(pa.int64())
        .to_numpy(zero_copy_only=False)
    )
    win = us // np.int64(window_us)
    return batch.append_column("window", pa.array(win))


def tumbling_aggregate(
    ds: Dataset,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    window_us: int = 3_600_000_000,
    num_partitions: int = 64,
) -> Dataset:
    """Per (key, window): row count + min/max of ``value``.

    min/max (not sum) for the float column so the result is independent
    of reduction order — bit-reproducible against the SQL oracle."""
    wds = ds.map_batches(
        lambda b: add_tumbling_window(b, ts_col, window_us),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return hash_aggregate(
        wds,
        [key_col, "window"],
        min_cols=[value_col],
        max_cols=[value_col],
        count=True,
        num_partitions=num_partitions,
    )


def sliding_aggregate(
    ds: Dataset,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    size_us: int = 7_200_000_000,
    step_us: int = 3_600_000_000,
    num_partitions: int = 64,
) -> Dataset:
    """Sliding windows (size = m·step): each event fans out to the m
    windows covering it, then the same hash-partitioned aggregate.
    ``window`` = start step index of the window."""
    if size_us % step_us:
        raise ValueError("size_us must be a multiple of step_us")
    m = size_us // step_us

    def fanout(batch: pa.Table) -> pa.Table:
        us = (
            batch[ts_col]
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        step_idx = us // np.int64(step_us)
        pieces = []
        for j in range(m):
            t = batch.append_column("window", pa.array(step_idx - j))
            pieces.append(t)
        return pa.concat_tables(pieces)

    wds = ds.map_batches(fanout, batch_format="pyarrow", zero_copy_batch=True)
    return hash_aggregate(
        wds,
        [key_col, "window"],
        min_cols=[value_col],
        max_cols=[value_col],
        count=True,
        num_partitions=num_partitions,
    )


def add_late_flag(
    ds: Dataset,
    ts_col: str = "ts",
    order_col: str = "event_id",
    delay_us: int = 1_800_000_000,
    num_partitions: int = 64,
) -> Dataset:
    """Event-time late-data detection over an arrival log — the
    watermark semantics of a streaming engine, replayed batch.

    Arrival order = ``order_col`` (the ingest sequence, unique).  The
    watermark before row i is the max event-time seen over all rows
    that ARRIVED earlier, minus ``delay_us``; a row is ``late`` iff
    its own event time is below that.  SQL twin:
    ``ts_us < max(ts_us) OVER (ORDER BY order ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING) - delay``.

    Distributed prefix scan (a global running max with no global
    sort): range-partition the arrival axis into contiguous chunks,
    per-chunk max (one grouped aggregate), prefix-fold the P chunk
    maxes on the driver (the ONLY driver state: P int64s), then one
    vectorized shifted-cummax per chunk seeded with its prefix.
    Output: input columns + ``ts_us`` + ``late`` (bool)."""
    import ray

    _MIN = np.iinfo(np.int64).min

    def stats(t: pa.Table) -> pa.Table:
        o = t[order_col].to_numpy(zero_copy_only=False)
        if len(o) == 0:
            return pa.table({"lo": pa.array([], type=pa.int64()),
                             "hi": pa.array([], type=pa.int64())})
        return pa.table({"lo": [int(o.min())], "hi": [int(o.max())]})

    lo, hi = None, None
    for t in ds.map_batches(stats, batch_format="pyarrow",
                            zero_copy_batch=True).iter_batches(batch_format="pyarrow"):
        for a, b in zip(t["lo"].to_pylist(), t["hi"].to_pylist()):
            lo = a if lo is None else min(lo, a)
            hi = b if hi is None else max(hi, b)
    if lo is None:
        return ds
    chunk = max((hi - lo + num_partitions) // num_partitions, 1)
    # unsigned reinterpretation: (o − lo) can exceed int64 when the
    # order axis spans most of the hash-id range (wrapping subtraction
    # is exact since 0 ≤ o − lo < 2⁶⁴)
    lo_u = np.uint64(lo & 0xFFFFFFFFFFFFFFFF)
    chunk_u = np.uint64(chunk)

    def tag(t: pa.Table) -> pa.Table:
        o = t[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        us = (
            t[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        t = t.append_column("ts_us", pa.array(us))
        part = (o.view(np.uint64) - lo_u) // chunk_u
        return t.append_column("_wpart", pa.array(part.astype(np.int64)))

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    part_max = hash_aggregate(
        tagged, ["_wpart"], max_cols=["ts_us"], count=False,
        num_partitions=num_partitions,
    ).to_pandas()  # ≤ num_partitions rows — the prefix fold input
    part_max = part_max.sort_values("_wpart")
    seeds = {}
    running = _MIN
    for p, m in zip(part_max["_wpart"], part_max["max_ts_us"]):
        seeds[int(p)] = running
        running = max(running, int(m))
    seeds_ref = ray.put(seeds)

    def scan(group: pa.Table) -> pa.Table:
        s = ray.get(seeds_ref)
        group = group.sort_by([(order_col, "ascending")])
        us = group["ts_us"].to_numpy(zero_copy_only=False)
        n = len(us)
        seed = s.get(int(group["_wpart"][0].as_py()), _MIN)
        wm = np.maximum.accumulate(np.concatenate([[np.int64(seed)], us[:-1]]))
        late = np.zeros(n, dtype=bool)
        valid = wm != _MIN  # rows with no prior arrival have no watermark
        late[valid] = us[valid] < wm[valid] - np.int64(delay_us)
        group = group.append_column("late", pa.array(late))
        return group.drop_columns(["_wpart"])

    return tagged.groupby("_wpart").map_groups(scan, batch_format="pyarrow")


def watermark_tumbling(
    ds: Dataset,
    key_col: str = "event_type",
    ts_col: str = "ts",
    order_col: str = "event_id",
    value_col: str = "value",
    window_us: int = 3_600_000_000,
    delay_us: int = 1_800_000_000,
    num_partitions: int = 64,
) -> Dataset:
    """Tumbling windows over on-time rows only: rows arriving after
    the watermark passed their event time (by > delay) are dropped —
    what a streaming engine's window operator emits at close."""
    import pyarrow.compute as pc

    flagged = add_late_flag(ds, ts_col, order_col, delay_us, num_partitions)
    on_time = flagged.map_batches(
        lambda t: t.filter(pc.invert(t["late"])), batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return tumbling_aggregate(
        on_time, key_col, ts_col, value_col, window_us, num_partitions
    )


def lag_columns(
    ds: Dataset,
    key_col: str,
    order_col: str,
    cols: list[str],
    num_partitions: int = 64,
) -> Dataset:
    """Per-key ordered LAG: append ``lag_<c>`` (the previous row's
    value within the key, ordered by ``order_col``; NULL on each key's
    first row) for every ``c`` in ``cols`` — the building block for
    deltas, inter-event gaps, trajectory steps and change detection.

    ONE hash-partition shuffle on the key, then a vectorized
    in-partition ``sort_by(key, order) + shift`` — never a task per
    key, no window state on the driver.  Ties on ``order_col`` within
    a key break by the existing sort stability (callers needing
    deterministic ties should pass a unique order column, as the SQL
    ``LAG ... OVER (PARTITION BY key ORDER BY o)`` twin would).
    """
    if not cols:
        raise ValueError("lag_columns: need at least one column to lag")

    def add_part(batch: pa.Table) -> pa.Table:
        part = _key_part(batch[key_col], num_partitions)
        return batch.append_column("_part", pa.array(part))

    def solve(part: pa.Table) -> pa.Table:
        part = part.drop_columns(["_part"]).sort_by(
            [(key_col, "ascending"), (order_col, "ascending")]
        )
        n = part.num_rows
        if n == 0:
            out = part
            for c in cols:
                out = out.append_column(f"lag_{c}", pa.array([], type=part[c].type))
            return out
        keys = part[key_col].to_numpy(zero_copy_only=False)
        first = np.ones(n, dtype=bool)
        first[1:] = keys[1:] != keys[:-1]
        # previous-row take index; key-first rows get NULL via a mask
        idx = np.arange(n, dtype=np.int64) - 1
        take = pa.array(np.where(first, 0, idx), type=pa.int64())
        out = part
        for c in cols:
            shifted = part[c].take(take)
            lag = pc.if_else(pa.array(first), pa.nulls(n, type=part[c].type), shifted)
            out = out.append_column(f"lag_{c}", lag)
        return out

    parted = ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
    return parted.groupby("_part").map_groups(solve, batch_format="pyarrow")


def session_windows(
    ds: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_us: int = 1_800_000_000,
    num_partitions: int = 64,
) -> Dataset:
    """Gap-based session windows per key.

    Hash-partition by key, then sessionize the WHOLE partition in one
    vectorized pass (sort by key,ts; session breaks = key change OR
    gap > gap_us; session id = cumsum; one pyarrow group_by) — never a
    task per key.  Output per session:
    ``key, session_start (us), n, min_<v>, max_<v>, max_gap_us`` —
    ``max_gap_us`` is the largest intra-session inter-event gap (0 for
    single-event sessions), i.e. the LAG-delta statistic computed in
    the same pass (see :func:`lag_columns` for the standalone
    primitive)."""

    def add_part(batch: pa.Table) -> pa.Table:
        us = (
            batch[ts_col]
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        part = _key_part(batch[key_col], num_partitions)
        return pa.table(
            {
                key_col: batch[key_col],
                "_us": pa.array(us),
                value_col: batch[value_col],
                "_part": pa.array(part),
            }
        )

    def sessionize(part: pa.Table) -> pa.Table:
        part = part.sort_by([(key_col, "ascending"), ("_us", "ascending")])
        keys = part[key_col].to_numpy(zero_copy_only=False)
        us = part["_us"].to_numpy(zero_copy_only=False)
        n = len(keys)
        if n == 0:
            return pa.table(
                {
                    key_col: pa.array([], type=part[key_col].type),
                    "session_start": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                    f"min_{value_col}": pa.array([], type=part[value_col].type),
                    f"max_{value_col}": pa.array([], type=part[value_col].type),
                    "max_gap_us": pa.array([], type=pa.int64()),
                }
            )
        brk = np.ones(n, dtype=np.int64)
        brk[1:] = (keys[1:] != keys[:-1]) | (us[1:] - us[:-1] > gap_us)
        sid = np.cumsum(brk)
        # intra-session inter-event gap per row (0 at session starts)
        gap = np.zeros(n, dtype=np.int64)
        gap[1:] = np.where(brk[1:] == 1, 0, us[1:] - us[:-1])
        t = pa.table(
            {
                key_col: part[key_col],
                "_sid": pa.array(sid),
                "_us": part["_us"],
                value_col: part[value_col],
                "_gap": pa.array(gap),
            }
        )
        out = t.group_by([key_col, "_sid"]).aggregate(
            [("_us", "min"), ("_us", "count"), (value_col, "min"), (value_col, "max"),
             ("_gap", "max")]
        )
        out = out.rename_columns(
            [key_col, "_sid", "session_start", "n", f"min_{value_col}",
             f"max_{value_col}", "max_gap_us"]
        )
        return out.drop_columns(["_sid"])

    parted = ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
    return parted.groupby("_part").map_groups(sessionize, batch_format="pyarrow")


def rolling_time_aggregate(
    ds: Dataset,
    ts_col: str = "ts",
    value_col: str = "value",
    window_us: int = 7_200_000_000,
    bucket_us: int = 21_600_000_000,
    keep_cols: tuple[str, ...] = (),
) -> Dataset:
    """Per-row GLOBAL time-range rolling aggregate — the SQL window
    ``SUM(v) OVER (ORDER BY ts RANGE BETWEEN window PRECEDING AND
    CURRENT ROW)`` — WITHOUT a global sort.

    The distributed shape (the 100-TB point of this operator): rows are
    hash-exchanged by their TIME BUCKET (``ts // bucket_us``), and each
    row is additionally shipped as a read-only HALO copy to every later
    bucket whose frames can reach back to it — at most
    ``ceil(window_us / bucket_us)`` extra copies, a constant chosen by
    sizing ``bucket_us`` a few multiples of ``window_us`` (the default
    ships ≤ 1/3 of rows once).  Each bucket then solves its rows with
    one in-partition sort + two vectorized ``searchsorted`` passes over
    an int64 prefix sum, and emits only its OWN rows.  Driver holds
    nothing; no stage sees more than one bucket + its halo.

    Frame semantics match SQL RANGE frames exactly, including ties:
    the frame is every row with ``ts in [row.ts - window_us, row.ts]``
    — equal-timestamp PEERS are all included (``searchsorted
    side='right'`` on the row's own ts).

    ``value_col`` must be an integer column (sums are order-independent
    and overflow-checked by numpy's int64); quantize floats with
    ``floor(v * scale)`` first — the same expression the SQL twin uses.
    Output: ``keep_cols + [ts_col, value_col, rolling_sum, rolling_n]``.
    """
    if window_us <= 0 or bucket_us <= 0:
        raise ValueError("window_us and bucket_us must be positive")
    max_hops = -(-window_us // bucket_us)  # ceil

    cols = list(dict.fromkeys([*keep_cols, ts_col, value_col]))

    def fanout(batch: pa.Table) -> pa.Table:
        us = (
            batch[ts_col]
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        vals = batch[value_col]
        if not pa.types.is_integer(vals.type):
            raise TypeError(
                f"rolling_time_aggregate: {value_col} must be integer "
                "(quantize floats with floor(v*scale) first)"
            )
        base = pa.table(
            {c: batch[c] for c in cols}
            | {"_us": pa.array(us), "_bkt": pa.array(us // np.int64(bucket_us))}
        )
        own = base.append_column("_halo", pa.array(np.zeros(len(us), dtype=bool)))
        pieces = [own]
        bkt = us // np.int64(bucket_us)
        # a row is needed by bucket B iff B*bucket_us - window_us <= ts,
        # i.e. B <= (ts + window_us) // bucket_us (boundary inclusive:
        # the frame's lower bound is closed)
        bmax = (us + np.int64(window_us)) // np.int64(bucket_us)
        for h in range(1, max_hops + 1):
            m = bkt + np.int64(h) <= bmax
            if not m.any():
                break
            halo = base.filter(pa.array(m))
            halo = halo.set_column(
                halo.schema.get_field_index("_bkt"),
                "_bkt",
                pc.add(halo["_bkt"], pa.scalar(h, type=pa.int64())),
            )
            pieces.append(
                halo.append_column("_halo", pa.array(np.ones(halo.num_rows, dtype=bool)))
            )
        return pa.concat_tables(pieces)

    def solve(part: pa.Table) -> pa.Table:
        part = part.sort_by([("_us", "ascending")])
        us = part["_us"].to_numpy(zero_copy_only=False)
        vals = part[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cum = np.cumsum(vals)
        # np.cumsum wraps silently — a float64 shadow of the final
        # prefix detects any ±2^64 wrap (float drift is orders of
        # magnitude smaller), making the documented overflow check real
        if len(cum):
            tail = float(np.cumsum(vals.astype(np.float64))[-1])
            if abs(float(cum[-1]) - tail) > 0.01 * max(1.0, abs(tail)):
                raise ValueError(
                    "rolling_time_aggregate: prefix sum wrapped int64 "
                    "— pre-scale the quantized values"
                )
        lo = np.searchsorted(us, us - np.int64(window_us), side="left")
        hi = np.searchsorted(us, us, side="right")
        rsum = cum[hi - 1] - np.where(lo > 0, cum[np.maximum(lo - 1, 0)], 0)
        own = ~part["_halo"].to_numpy(zero_copy_only=False)
        out = part.filter(pa.array(own)).drop_columns(["_us", "_bkt", "_halo"])
        return out.append_column(
            "rolling_sum", pa.array(rsum[own], type=pa.int64())
        ).append_column("rolling_n", pa.array((hi - lo)[own].astype(np.int64)))

    fanned = ds.map_batches(fanout, batch_format="pyarrow", zero_copy_batch=True)
    return fanned.groupby("_bkt").map_groups(solve, batch_format="pyarrow")


def grouped_ewma(
    ds: Dataset,
    key_col: str,
    order_col: str,
    value_col: str,
    alpha: float,
    out_col: str = "ewma",
    adjust: bool = True,
    num_partitions: int = 64,
) -> Dataset:
    """Per-key exponentially weighted moving average ordered by
    ``order_col`` — the classic streaming smoother (metrics decay,
    trend baselines, anomaly scores):

        adjust=True :  y_i = Σ_j (1−α)^(i−j)·x_j / Σ_j (1−α)^(i−j)
        adjust=False:  y_i = (1−α)·y_{i−1} + α·x_i   (y_0 = x_0)

    Same distribution shape as :func:`lag_columns`: ONE hash-partition
    shuffle on the key, then pandas' C ``groupby(...).ewm(...)`` per
    partition — pandas IS the kernel here (the recursion has no stable
    closed-form vectorization: rescaling by (1−α)^(−j) overflows past
    a few hundred rows), which is this repo's accepted map_groups
    pattern (`merge_asof`, `pivot_table`).  Per-partition work is
    bounded by the hash partitioning; never a task per key, no state
    on the driver.  NULL values propagate pandas-ewm semantics
    (skipped in the weighting; output NULL until the first value)."""
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")

    def add_part(batch: pa.Table) -> pa.Table:
        part = _key_part(batch[key_col], num_partitions)
        return batch.append_column("_part", pa.array(part))

    def solve(part: pa.Table) -> pa.Table:
        import pandas as pd

        pdf = part.drop_columns(["_part"]).to_pandas()
        pdf = pdf.sort_values([key_col, order_col], kind="mergesort")
        pdf[out_col] = (
            pdf.groupby(key_col, sort=False)[value_col]
            .transform(lambda s: s.ewm(alpha=alpha, adjust=adjust).mean())
        )
        return pa.Table.from_pandas(pdf, preserve_index=False)

    parted = ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
    return parted.groupby("_part").map_groups(solve, batch_format="pyarrow")


def grouped_ewma_dyadic(
    ds: Dataset,
    key_col: str,
    order_cols,
    value_col: str,
    s: int = 1,
    out_col: str = "ewma",
    num_partitions: int = 64,
) -> Dataset:
    """Per-key EWMA (``adjust=True``) with a DYADIC decay ``β = 2^−s``
    — the module's oracle-exact twin of :func:`grouped_ewma`
    (pandas' iterative kernel divides at every step, so its floats
    can't be reproduced in SQL; a dyadic β admits a CLOSED FORM whose
    only float op is one final division):

        y_i = Σ_j v_j·β^(i−j) / Σ_j β^(i−j)
            = Σ_j v_j·2^(s·j) / Σ_j 2^(s·j)     (scale 2^(s·i) out)

    Numerator = within-key cumulative sum of ``v << (s·j)``,
    denominator = the geometric sum ``((1 << s·(i+1)) − 1)/(2^s − 1)``
    — both EXACT int64 (overflow-guarded: per-key position and |v|
    must satisfy ``s·(L−1) + bits(v) + ceil(log2 L) ≤ 62``; past that
    the dropped weights are < 2^−60, split the series upstream), so
    the output is ONE IEEE division the SQL twin reproduces
    bit-for-bit (``CAST(num AS BIGINT << shifts) / den``).  Matches
    pandas ``ewm(alpha=1−β, adjust=True).mean()`` to float tolerance
    (pytest-pinned).

    ONE hash-partition shuffle on the key (`agg._part_of`, so string
    keys work), one vectorized lexsort + segment-cumsum pass per
    partition — never a task per key.  Integer values only; NULLs
    rejected.  Appends ``out_col`` and the 0-based within-key
    position ``{out_col}_pos``."""
    from rayraster.agg import _part_of

    if s < 1:
        raise ValueError(f"s must be >= 1, got {s}")
    order_cols = list(order_cols)

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_part", pa.array(_part_of(batch, [key_col], num_partitions))
        )

    def solve(part: pa.Table) -> pa.Table:
        part = part.drop_columns(["_part"])
        n = part.num_rows
        if n == 0:
            return part.append_column(out_col, pa.array([], type=pa.float64())) \
                       .append_column(f"{out_col}_pos", pa.array([], type=pa.int64()))
        vc = part[value_col]
        if not pa.types.is_integer(vc.type):
            raise ValueError("grouped_ewma_dyadic: integer values only "
                             "(quantize floats upstream — the twin rule)")
        if vc.null_count:
            raise ValueError("grouped_ewma_dyadic: NULL values unsupported")
        part = part.sort_by([(key_col, "ascending")]
                            + [(c, "ascending") for c in order_cols])
        v = part[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = part[key_col]
        if pa.types.is_integer(keys.type):
            kv = keys.to_numpy(zero_copy_only=False)
            new = np.ones(n, dtype=bool)
            new[1:] = kv[1:] != kv[:-1]
        else:
            import pyarrow.compute as pc

            codes = pc.dictionary_encode(
                keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
            ).indices.to_numpy(zero_copy_only=False)
            new = np.ones(n, dtype=bool)
            new[1:] = codes[1:] != codes[:-1]
        idx = np.arange(n, dtype=np.int64)
        starts = np.maximum.accumulate(np.where(new, idx, 0))
        j = idx - starts  # 0-based within-key position
        L = int(j.max()) + 1
        vmax = int(np.abs(v).max()) if n else 0
        if s * (L - 1) + max(vmax, 1).bit_length() + (L - 1).bit_length() > 62:
            raise ValueError(
                f"grouped_ewma_dyadic: int64 overflow at key length {L} "
                f"with |v|max {vmax} (s={s}) — split the series upstream"
            )
        term = v << (s * j)
        run = np.cumsum(term)
        seg0 = run - term  # exclusive prefix sum
        num = run - seg0[starts]  # within-key inclusive cumsum, exact
        den = ((np.int64(1) << (s * (j + 1))) - 1) // ((1 << s) - 1)
        ew = num.astype(np.float64) / den.astype(np.float64)
        return part.append_column(out_col, pa.array(ew)) \
                   .append_column(f"{out_col}_pos", pa.array(j))

    parted = ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
    return parted.groupby("_part").map_groups(solve, batch_format="pyarrow")


def cohort_retention(
    ds: Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_us: int = 86_400_000_000,
    num_partitions: int = 64,
) -> Dataset:
    """Cohort retention matrix — the product-analytics staple next to
    sessions (:func:`session_windows`) and funnels
    (:func:`funnel_match`): users are grouped into COHORTS by their
    first-seen period (``epoch_us(ts) // period_us``), and for each
    ``(cohort, offset)`` the output counts how many of that cohort's
    users were active ``offset`` periods later, plus the retention
    rate ``n_active / cohort_size`` (one IEEE division of exact
    int64 counts — SQL-twin-exact).  No reference analog (SEraster is
    pure rasterization, R/main.R); part of the mandated event-stream
    analytics family.

    Distributed plan (everything exact-integer, nothing driver-side
    except the tiny per-cohort size table):

    1. map-only ``(user, period)`` projection;
    2. ONE hash-partitioned distinct (a user active 50× in a day
       counts once);
    3. cohort per user = grouped MIN period (one more exchange over
       distinct pairs);
    4. ONE ``bucket_join`` pairs ⨝ cohorts → ``offset = period −
       cohort``;
    5. grouped count by ``(cohort, offset)``;
    6. cohort sizes = the ``offset == 0`` rows (bounded by #cohorts),
       broadcast once via ``ray.put`` for the rate column.

    Returns ``(cohort, offset, n_active, rate, cohort_size)`` rows."""
    import pyarrow.compute as pc

    from rayraster.agg import distinct, hash_aggregate
    from rayraster.join import broadcast_join, bucket_join

    if period_us <= 0:
        raise ValueError(f"period_us must be positive, got {period_us}")

    def proj(t: pa.Table) -> pa.Table:
        us = (t[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        # numpy FLOOR division — the documented `epoch_us // period`
        # semantics (pc.divide truncates toward zero, which would
        # mis-cohort pre-1970 timestamps)
        period = pa.array(us // np.int64(period_us))
        return pa.table({user_col: t[user_col], "period": period})

    # materialized ONCE: dp feeds both the cohort aggregate and the
    # period join; un-materialized, the distinct shuffle runs twice
    dp = distinct(
        ds.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True),
        [user_col, "period"],
        num_partitions=num_partitions,
    ).materialize()
    cohorts = hash_aggregate(
        dp, [user_col], min_cols=["period"], count=False,
        num_partitions=num_partitions,
    ).map_batches(
        lambda t: pa.table({user_col: t[user_col], "cohort": t["min_period"]}),
        batch_format="pyarrow",
    )
    joined = bucket_join(
        dp, cohorts, left_key=user_col, right_key=user_col,
        num_buckets=num_partitions,
        left_schema=pa.schema([(user_col, pa.int64()), ("period", pa.int64())]),
        right_schema=pa.schema([(user_col, pa.int64()), ("cohort", pa.int64())]),
    )

    def off(t: pa.Table) -> pa.Table:
        return pa.table(
            {"cohort": t["cohort"],
             "offset": pc.subtract(t["period"], t["cohort"])}
        )

    # materialized: consumed by the sizes pull AND the broadcast join
    ret = hash_aggregate(
        joined.map_batches(off, batch_format="pyarrow", zero_copy_batch=True),
        ["cohort", "offset"], count=True, count_name="n_active",
        num_partitions=num_partitions,
    ).materialize()
    sizes = ret.filter(lambda r: r["offset"] == 0).map_batches(
        lambda t: pa.table({"cohort": t["cohort"], "cohort_size": t["n_active"]}),
        batch_format="pyarrow",
    )
    sizes_tbl = pa.Table.from_pandas(sizes.to_pandas())  # bounded: #cohorts rows
    out = broadcast_join(ret, sizes_tbl, keys=["cohort"])

    def rate(t: pa.Table) -> pa.Table:
        na = t["n_active"].to_numpy(zero_copy_only=False).astype(np.float64)
        cs = t["cohort_size"].to_numpy(zero_copy_only=False).astype(np.float64)
        return t.append_column("rate", pa.array(na / cs))

    return out.map_batches(rate, batch_format="pyarrow", zero_copy_batch=True)


def funnel_match(
    ds: Dataset,
    stages: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    num_partitions: int = 64,
) -> Dataset:
    """First-touch funnel analysis: for each key, match the ordered
    stage sequence ``stages`` (e.g. ``["view", "click", "purchase"]``)
    against its event log — stage 1 anchors at the key's EARLIEST
    stage-1 event, each later stage at its earliest event STRICTLY
    after the previous matched stage (the classic web-analytics
    conversion funnel; SQL twin = chained ``min(us) ... WHERE us >
    prev`` CTEs).  The reference has no event-log analytics at all
    (SEraster is pure rasterization, R/main.R); this is part of the
    mandated event/stream family alongside sessions and windows.

    Output, one row per key that reached stage 1::

        key, funnel_start (us of the stage-1 match, int64),
        n_stages (1..len(stages)),
        min_value / max_value (least/greatest of the matched stage
            events' ``value_col``; ties at a matched (stage, ts) break
            by MIN(value) so the result is set-deterministic),
        max_step_us (largest gap between consecutive matched stages;
            0 when n_stages == 1)

    Distribution: ONE hash-partition shuffle on the key, then a fully
    vectorized per-partition pass — sort by (key, us), per-stage
    candidate masks + ``np.minimum.reduceat`` over the key segments
    (2 reduceats per stage), never a task per key and no state on the
    driver.  Keys, not events, bound the output; 100-TB event logs
    stream through the exchange.

    NULL ``value_col`` entries are ignored for min/max (SQL MIN/MAX
    semantics); a matched stage whose tied events are all NULL
    contributes nothing to the value range.
    """
    if len(stages) < 1:
        raise ValueError("funnel_match: need at least one stage")
    if len(set(stages)) != len(stages):
        raise ValueError("funnel_match: stages must be distinct")
    n_stages = len(stages)
    stage_arr = pa.array(stages, type=pa.string())
    i64max = np.iinfo(np.int64).max

    def add_part(batch: pa.Table) -> pa.Table:
        us = (
            batch[ts_col]
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        code = pc.index_in(batch[type_col], value_set=stage_arr)
        code = pc.fill_null(code, -1).cast(pa.int64())
        keep = pc.not_equal(code, pa.scalar(-1, type=pa.int64()))
        part = _key_part(batch[key_col], num_partitions)
        t = pa.table(
            {
                key_col: batch[key_col],
                "_us": pa.array(us),
                "_code": code,
                value_col: batch[value_col],
                "_part": pa.array(part),
            }
        )
        return t.filter(keep)  # non-stage events never enter the exchange

    def _empty(ktype: pa.DataType) -> pa.Table:
        # key column typed from the INPUT — a hardcoded int64 would
        # clash with string-keyed partitions at schema unification
        return pa.table(
            {
                key_col: pa.array([], type=ktype),
                "funnel_start": pa.array([], type=pa.int64()),
                "n_stages": pa.array([], type=pa.int64()),
                f"min_{value_col}": pa.array([], type=pa.float64()),
                f"max_{value_col}": pa.array([], type=pa.float64()),
                "max_step_us": pa.array([], type=pa.int64()),
            }
        )

    def solve(part: pa.Table) -> pa.Table:
        part = part.drop_columns(["_part"]).sort_by(
            [(key_col, "ascending"), ("_us", "ascending")]
        )
        n = part.num_rows
        if n == 0:
            return _empty(part[key_col].type)
        keys = part[key_col].to_numpy(zero_copy_only=False)
        us = part["_us"].to_numpy(zero_copy_only=False)
        code = part["_code"].to_numpy(zero_copy_only=False)
        val = part[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        first = np.ones(n, dtype=bool)
        first[1:] = keys[1:] != keys[:-1]
        seg_starts = np.flatnonzero(first)
        seg_id = np.cumsum(first) - 1
        n_seg = len(seg_starts)

        prev_ts = np.full(n_seg, np.int64(-(2**62)))  # below any epoch_us
        stage_ts = np.full((n_stages, n_seg), i64max, dtype=np.int64)
        stage_val = np.full((n_stages, n_seg), np.inf)
        for s in range(n_stages):
            cand = (code == s) & (us > prev_ts[seg_id])
            tmp = np.where(cand, us, i64max)
            ts_s = np.minimum.reduceat(tmp, seg_starts)
            # tie rule: MIN(value) among the matched (stage, ts) events
            tie = cand & (us == ts_s[seg_id])
            vtmp = np.where(tie & ~np.isnan(val), val, np.inf)
            stage_ts[s] = ts_s
            stage_val[s] = np.minimum.reduceat(vtmp, seg_starts)
            prev_ts = ts_s  # unreached (i64max) poisons later stages

        reached = stage_ts < i64max
        depth = reached.sum(axis=0)  # monotone by construction
        keep = depth > 0
        if not keep.any():
            return _empty(part[key_col].type)
        vals = np.where(reached, stage_val, np.inf)
        vmin = np.min(vals, axis=0)
        vmax = np.max(np.where(reached & np.isfinite(stage_val), stage_val, -np.inf), axis=0)
        steps = np.where(
            reached[1:] & reached[:-1], stage_ts[1:] - stage_ts[:-1], np.int64(0)
        )
        max_step = (
            steps.max(axis=0) if n_stages > 1 else np.zeros(n_seg, dtype=np.int64)
        )
        out_keys = part[key_col].take(pa.array(seg_starts[keep], type=pa.int64()))
        vmin_k, vmax_k = vmin[keep], vmax[keep]
        return pa.table(
            {
                key_col: out_keys,
                "funnel_start": pa.array(stage_ts[0][keep]),
                "n_stages": pa.array(depth[keep].astype(np.int64)),
                f"min_{value_col}": pa.array(
                    np.where(np.isfinite(vmin_k), vmin_k, np.nan), from_pandas=True
                ),
                f"max_{value_col}": pa.array(
                    np.where(np.isfinite(vmax_k), vmax_k, np.nan), from_pandas=True
                ),
                "max_step_us": pa.array(max_step[keep]),
            }
        )

    parted = ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
    return parted.groupby("_part").map_groups(solve, batch_format="pyarrow")


def transition_counts(
    ds: Dataset,
    key_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: "tuple[str, ...]" = ("ts", "event_id"),
    num_partitions: int = 64,
) -> Dataset:
    """First-order Markov transition matrix of an event log: for every
    consecutive pair of events WITHIN a key (ordered by
    ``order_cols``), count ``from_type → to_type`` — the clickstream /
    user-journey transition mining step (next-event prediction priors,
    funnel discovery, bot-pattern detection).

    ONE hash-partition exchange on the key, then a vectorized
    in-partition lexsort + shift (the :func:`lag_columns` shape) with
    per-partition partial counts, folded through a tiny second
    exchange; the final matrix is ≤ ``|types|²`` rows, so per-row
    probabilities (``p = n / n_from``, one IEEE division of exact
    counts) are finished in a single-partition pass.  Pass a unique
    trailing order column (e.g. ``event_id``) for deterministic ties —
    the matrix COUNTS are tie-invariant only when ties cannot
    interleave across types.

    Returns ``(from_type, to_type, n, n_from, p)``.
    """
    from rayraster.agg import hash_aggregate

    if not order_cols:
        raise ValueError("transition_counts: need at least one order column")

    def add_part(batch: pa.Table) -> pa.Table:
        # NULL event types never transition (engine-wide NULL rule) —
        # kept, a None would crash finish()'s np.unique over the
        # object-typed type column
        v = batch[type_col]
        if v.null_count:
            batch = batch.filter(pc.is_valid(v))
        part = _key_part(batch[key_col], num_partitions)
        return batch.append_column("_part", pa.array(part))

    def pairs(part: pa.Table) -> pa.Table:
        part = part.drop_columns(["_part"]).sort_by(
            [(key_col, "ascending")] + [(c, "ascending") for c in order_cols]
        )
        n = part.num_rows
        if n < 2:
            e = pa.array([], type=pa.string())
            return pa.table({"from_type": e, "to_type": e,
                             "n": pa.array([], type=pa.int64())})
        keys = part[key_col].to_numpy(zero_copy_only=False)
        same = pa.array(keys[1:] == keys[:-1])
        types = part[type_col]
        g = (
            pa.table({
                "from_type": types.slice(0, n - 1).filter(same),
                "to_type": types.slice(1).filter(same),
            })
            .group_by(["from_type", "to_type"])
            .aggregate([([], "count_all")])
        )
        return pa.table({"from_type": g["from_type"], "to_type": g["to_type"],
                         "n": g["count_all"].cast(pa.int64())})

    folded = hash_aggregate(
        ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(pairs, batch_format="pyarrow"),
        keys=["from_type", "to_type"],
        sum_cols=["n"],
        count=False,
        num_partitions=min(num_partitions, 8),
    )

    def finish(t: pa.Table) -> pa.Table:
        f = t["from_type"].to_numpy(zero_copy_only=False)
        n = t["sum_n"].to_numpy(zero_copy_only=False).astype(np.int64)
        uf, inv = np.unique(f, return_inverse=True)
        nf = np.bincount(inv, weights=n.astype(np.float64)).astype(np.int64)[inv]
        return pa.table({
            "from_type": t["from_type"], "to_type": t["to_type"],
            "n": pa.array(n), "n_from": pa.array(nf),
            "p": pa.array(n.astype(np.float64) / nf.astype(np.float64)),
        })

    # the matrix is |types|^2-bounded — one partition finishes it
    return folded.repartition(1).map_batches(finish, batch_format="pyarrow")


def scd2_history(
    ds: Dataset,
    key_col: str,
    order_col: str,
    state_col: str,
    num_partitions: int = 64,
) -> Dataset:
    """Type-2 slowly-changing-dimension historization: compress a
    per-key ordered change log into interval rows — one row per RUN of
    equal ``state_col`` values, carrying ``valid_from`` (the run's
    first ``order_col``) and ``valid_to`` (the NEXT run's first
    ``order_col``; NULL on each key's current/last run).  The
    warehouse history-table builder (MERGE…SCD2), expressed as pure
    shuffle + vectorized shifts.

    ONE hash-partition shuffle on the key (the :func:`lag_columns`
    shape), then in-partition ``sort_by(key, order) +`` three
    vectorized masks — never a task per key, no state on the driver.
    ``order_col`` must be unique per key for a deterministic result
    (same contract as the SQL ``LAG/LEAD`` twin).

    Returns ``(key_col, state_col, valid_from, valid_to)``."""

    def add_part(batch: pa.Table) -> pa.Table:
        part = _key_part(batch[key_col], num_partitions)
        return batch.append_column("_part", pa.array(part))

    def solve(part: pa.Table) -> pa.Table:
        part = part.drop_columns(["_part"]).sort_by(
            [(key_col, "ascending"), (order_col, "ascending")]
        )
        n = part.num_rows
        ot = part[order_col].type
        if n == 0:
            return pa.table(
                {key_col: part[key_col], state_col: part[state_col],
                 "valid_from": pa.array([], type=ot),
                 "valid_to": pa.array([], type=ot)}
            )
        keys = part[key_col].to_numpy(zero_copy_only=False)
        st = part[state_col].to_numpy(zero_copy_only=False)
        first = np.ones(n, dtype=bool)
        first[1:] = keys[1:] != keys[:-1]
        change = first.copy()
        change[1:] |= st[1:] != st[:-1]
        starts = np.flatnonzero(change)
        # valid_to = the NEXT change row's order value, unless that
        # row starts a new key (then NULL — the run is current)
        nxt = np.concatenate([starts[1:], [n]])
        to_idx = np.minimum(nxt, n - 1)
        open_run = (nxt >= n) | first[to_idx]
        kept = part.take(pa.array(starts))
        to_vals = part[order_col].take(pa.array(to_idx))
        valid_to = pc.if_else(
            pa.array(open_run), pa.nulls(len(starts), type=ot), to_vals
        )
        return pa.table(
            {key_col: kept[key_col], state_col: kept[state_col],
             "valid_from": kept[order_col], "valid_to": valid_to}
        )

    parted = ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
    return parted.groupby("_part").map_groups(solve, batch_format="pyarrow")


def trajectory_trips(
    ds: Dataset,
    key_col: str,
    order_col: str,
    x_col: str = "x",
    y_col: str = "y",
    jump_threshold: float = 30.0,
    qscale: float = 1_000_000.0,
    num_partitions: int = 64,
) -> Dataset:
    """Spatial trip segmentation of per-key point streams — the
    geo × event-log composition: order each key's points by
    ``order_col`` and cut a new TRIP whenever the squared euclidean
    step to the previous point exceeds ``jump_threshold²`` (a vehicle
    teleporting between sightings, a user hopping cities).

    ONE key-hash exchange (the :func:`lag_columns` shape), then
    in-partition sort + vectorized step distances, boundary cumsum,
    and ``np.add.reduceat`` per-trip folds — never a task per key.
    Per-trip ``qlen`` is the sum of the ×``qscale`` floor-quantized
    within-trip squared steps: each step's float is a fixed-order
    expression (bit-equal to the SQL twin) and the SUM is over exact
    int64s, so the result is order-independent and hash-exact at any
    partitioning.  ``order_col`` must be unique per key.

    Returns ``(key_col, trip, n, start, end, qlen)`` — trip ids are
    1-based per key in stream order."""

    def add_part(batch: pa.Table) -> pa.Table:
        part = _key_part(batch[key_col], num_partitions)
        return batch.append_column("_part", pa.array(part))

    thr2 = float(jump_threshold) * float(jump_threshold)

    def solve(part: pa.Table) -> pa.Table:
        part = part.drop_columns(["_part"]).sort_by(
            [(key_col, "ascending"), (order_col, "ascending")]
        )
        n = part.num_rows
        if n == 0:
            return pa.table(
                {key_col: part[key_col],
                 "trip": pa.array([], type=pa.int64()),
                 "n": pa.array([], type=pa.int64()),
                 "start": pa.array([], type=part[order_col].type),
                 "end": pa.array([], type=part[order_col].type),
                 "qlen": pa.array([], type=pa.int64())}
            )
        keys = part[key_col].to_numpy(zero_copy_only=False)
        x = part[x_col].to_numpy(zero_copy_only=False)
        y = part[y_col].to_numpy(zero_copy_only=False)
        first = np.ones(n, dtype=bool)
        first[1:] = keys[1:] != keys[:-1]
        d2 = np.zeros(n, dtype=np.float64)
        dx = x[1:] - x[:-1]
        dy = y[1:] - y[:-1]
        d2[1:] = dx * dx + dy * dy  # same op order as the SQL twin
        boundary = first | (d2 > thr2)
        qd = np.where(
            boundary, np.int64(0),
            np.floor(d2 * qscale).astype(np.int64),
        )
        starts = np.flatnonzero(boundary)
        ends = np.concatenate([starts[1:], [n]])
        trip_n = ends - starts
        # 1-based trip rank within each key
        key_first_pos = starts[first[starts]]
        key_of_start = np.searchsorted(key_first_pos, starts, side="right") - 1
        brank = np.cumsum(boundary)  # 1-based global boundary count
        trip_id = brank[starts] - brank[key_first_pos[key_of_start]] + 1
        order_np = part[order_col].to_numpy(zero_copy_only=False)
        qsum = np.add.reduceat(qd, starts)
        return pa.table(
            {key_col: part[key_col].take(pa.array(starts)),
             "trip": pa.array(trip_id.astype(np.int64)),
             "n": pa.array(trip_n.astype(np.int64)),
             "start": pa.array(order_np[starts]),
             "end": pa.array(order_np[ends - 1]),
             "qlen": pa.array(qsum.astype(np.int64))}
        )

    parted = ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
    return parted.groupby("_part").map_groups(solve, batch_format="pyarrow")


def lagged_products(
    ds: Dataset,
    group_col: str,
    t_col: str,
    val_col: str,
    lags: "list[int]",
    num_partitions: int = 8,
) -> Dataset:
    """Per-group lag-k product sums over an integer time grid — the
    autocorrelation ingredient: ``num_k(g) = Σ_t v(g, t) · v(g, t−k)``
    with absent grid cells contributing 0 (the inner join drops
    them).  With v = per-hour event counts, ``num_k / num_0`` is the
    raw lag-k autocorrelation of the series.

    Plan: the series fans out once per lag with the shifted key
    ``g:(t−k)``, ONE string-keyed ``bucket_join`` co-locates every
    (t, t−k) pair, and exact int64 product partials fold per
    (group, lag).  Everything is a Dataset op; the fan-out is
    |lags| × |series rows|.

    Returns ``(group_col, lag, num)`` — include lag 0 in ``lags`` for
    the Σv² denominator."""
    import pyarrow.compute as pc

    from rayraster.agg import hash_aggregate
    from rayraster.join import bucket_join

    if not lags:
        raise ValueError("lagged_products: need at least one lag")

    def rside(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            pc.cast(t[group_col], pa.string()),
            pc.cast(t[t_col], pa.string()), ":",
        )
        return pa.table({"rk": k, "rv": t[val_col].cast(pa.int64())})

    def lside(t: pa.Table) -> pa.Table:
        parts = []
        tt = t[t_col].to_numpy(zero_copy_only=False).astype(np.int64)
        for lag in lags:
            k = pc.binary_join_element_wise(
                pc.cast(t[group_col], pa.string()),
                pc.cast(pa.array(tt - lag), pa.string()), ":",
            )
            parts.append(pa.table(
                {"lk": k, "grp": pc.cast(t[group_col], pa.string()),
                 "lag": pa.array(np.full(t.num_rows, lag, dtype=np.int64)),
                 "lv": t[val_col].cast(pa.int64())}
            ))
        return pa.concat_tables(parts)

    rds = ds.map_batches(rside, batch_format="pyarrow")
    lds = ds.map_batches(lside, batch_format="pyarrow")
    j = bucket_join(
        lds, rds, "lk", "rk", num_buckets=num_partitions,
        left_schema=pa.schema(
            [("lk", pa.string()), ("grp", pa.string()),
             ("lag", pa.int64()), ("lv", pa.int64())]
        ),
        right_schema=pa.schema([("rk", pa.string()), ("rv", pa.int64())]),
    )

    def partial(t: pa.Table) -> pa.Table:
        prod = (t["lv"].to_numpy(zero_copy_only=False)
                * t["rv"].to_numpy(zero_copy_only=False))
        return pa.table(
            {"grp": t["grp"], "lag": t["lag"], "p": pa.array(prod)}
        )

    out = hash_aggregate(
        j.map_batches(partial, batch_format="pyarrow"),
        ["grp", "lag"], sum_cols=["p"], count=False,
        num_partitions=min(num_partitions, 4),
    )
    return out.map_batches(
        lambda t: pa.table(
            {group_col: t["grp"], "lag": t["lag"], "num": t["sum_p"]}
        ),
        batch_format="pyarrow",
    )
