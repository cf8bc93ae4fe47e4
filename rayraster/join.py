"""Joins: broadcast hash join (small side) — the Ray-Data-first lookup.

The reference's only join is the computable spatial join (SURVEY.md §2
O1d); for relational enrichment (dimension tables, blocklists, label
maps) the right distributed shape at 100 TB is: ``ray.put`` the small
side ONCE, then an actor-pool map_batches doing a vectorized pyarrow
join per batch — no shuffle, no re-ship per batch.

Four join shapes, smallest-movement-first:

* :func:`broadcast_join` — small side broadcast once, C++ join/batch
* :func:`semi_join_filter` — broadcast key set, vectorized is_in
* :func:`bucket_join` — large × large equi-join, one co-location
  shuffle, C++ join per bucket
* :func:`asof_join` / :func:`range_join` — temporal and interval
  joins (custom operators per the task brief)
"""

from __future__ import annotations

import pyarrow as pa

import ray
from ray.data import Dataset


class BroadcastJoinStage:
    """map_batches actor: inner/left join each batch against the
    broadcast small side (a pyarrow Table in the object store).

    The small side is fetched ONCE per actor (first call) and the
    per-batch work is pyarrow's C++ hash join."""

    def __init__(self, small_ref, keys, join_type: str = "inner",
                 right_suffix: str = "_r"):
        self._ref = small_ref
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        if join_type not in ("inner", "left", "left outer"):
            raise ValueError(
                f"broadcast_join supports join_type 'inner' or 'left', "
                f"got {join_type!r} (use bucket_join for other types)"
            )
        self.join_type = "inner" if join_type == "inner" else "left outer"
        self.right_suffix = right_suffix
        self._small = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._small is None:
            small = ray.get(self._ref) if isinstance(self._ref, ray.ObjectRef) else self._ref
            self._small = small.combine_chunks()
        return batch.join(
            self._small,
            keys=self.keys,
            join_type=self.join_type,
            right_suffix=self.right_suffix,
        )


def broadcast_join(
    ds: Dataset,
    small: pa.Table,
    keys,
    join_type: str = "inner",
    concurrency: int = 4,
) -> Dataset:
    """ds ⨝ small on ``keys`` with the small side broadcast once."""
    ref = ray.put(small)
    return ds.map_batches(
        BroadcastJoinStage(ref, keys, join_type),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def detect_hot_keys(
    ds: Dataset, key: str, num_buckets: int, sample_rows: int = 65536
) -> list:
    """Keys whose sampled frequency would overload one bucket: a
    bounded prefix sample (a key hot enough to skew a bucket is hot in
    any prefix), counted vectorized; threshold = 2× the even-spread
    share.  Missing a hot key only costs balance, never correctness."""
    import collections

    import pyarrow.compute as pc

    counts: collections.Counter = collections.Counter()
    seen = 0
    for t in ds.select_columns([key]).limit(sample_rows).iter_batches(
        batch_format="pyarrow", batch_size=16384
    ):
        vc = t[key].value_counts()
        for rec in vc.to_pylist():
            counts[rec["values"]] += rec["counts"]
        seen += t.num_rows
    if not seen:
        return []
    thresh = max(2 * seen / num_buckets, 2)
    return [k for k, c in counts.items() if c >= thresh]


def key_bucket(keys, num_buckets: int):
    """THE bucket hash — shared by :func:`bucket_join`, the persisted
    bucketed layout (:func:`write_bucketed`) and its zero-shuffle join
    (:func:`bucket_join_prebucketed`).  Co-location depends on every
    writer and reader agreeing on this function, so there is exactly
    one definition.  Integer keys hash by value (key NAME is
    irrelevant — sides may call the column differently)."""
    import numpy as np

    if pa.types.is_integer(keys.type):
        import pyarrow.compute as pc

        # fill_null BEFORE to_numpy: a null-bearing int batch promotes
        # to float64 and keys >= 2^53 round — the same key would then
        # bucket differently depending on whether its BATCH contains a
        # null, silently breaking co-location.  Nulls never match in an
        # equi-join; bucketing them as 0 is deterministic and harmless.
        if keys.null_count:
            keys = pc.fill_null(keys, 0)
        kv = keys.to_numpy(zero_copy_only=False).astype(np.int64)
    elif pa.types.is_string(keys.type) or pa.types.is_large_string(keys.type):
        from rayraster.geo import fnv1a64

        # buffer path; NULL hashes like "None", same as the str() route
        kv = fnv1a64(keys).view(np.int64)
    else:
        from rayraster.geo import fnv1a64

        kv = fnv1a64([str(v) for v in keys.to_pylist()]).view(np.int64)
    return np.abs(kv * np.int64(2654435761)) % np.int64(num_buckets)


def bucket_join(
    left: Dataset,
    right: Dataset,
    left_key: str,
    right_key: str,
    num_buckets: int = 64,
    join_type: str = "inner",
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
    salt: int = 1,
    hot_keys=None,
) -> Dataset:
    """Large × large equi-join: the explicit partitioned hash join —
    add ``bucket = hash(key) % B`` to BOTH sides, tag the side, union,
    co-locate with ONE groupby(bucket) shuffle, then join each bucket
    with pyarrow's C++ hash join.  No broadcast; both sides stream.

    Output: left columns + right columns (right key dropped; name
    collisions suffixed ``_r``).

    **Hot-key salting** (``salt`` > 1): rows of the listed
    ``hot_keys`` (or ``hot_keys="auto"`` → :func:`detect_hot_keys` on
    a bounded left sample) are spread across ``salt`` sub-buckets on
    the left and REPLICATED ``salt``× on the right, so one dominating
    key no longer lands in a single reduce bucket.  Each left row
    still meets every right row of its key exactly once ⇒ output is
    identical to the unsalted join.  Non-hot keys pay nothing.

    ``left_schema`` / ``right_schema``: pass the (known) schema when a
    side's lineage contains a shuffle — ``Dataset.schema()`` on such a
    dataset EXECUTES the upstream pipeline just to fetch one block, so
    a lazy chain of joins would re-run its inputs once per schema
    probe (measured 3× wall on a minhash verify chain)."""
    import numpy as np

    l_schema = left.schema() if left_schema is None else left_schema
    r_schema = right.schema() if right_schema is None else right_schema
    if salt > 1 and isinstance(hot_keys, str) and hot_keys == "auto":
        hot_keys = detect_hot_keys(left, left_key, num_buckets)
    use_salt = salt > 1 and bool(hot_keys)
    if use_salt and join_type == "full":
        # replicated right hot rows would each surface as a spurious
        # unmatched row in every sub-bucket without a left match
        raise ValueError("hot-key salting does not support join_type='full'")
    if use_salt and salt > num_buckets:
        raise ValueError(f"salt ({salt}) must be <= num_buckets ({num_buckets})")
    hot_set = pa.array(sorted(set(hot_keys))) if use_salt else None
    left_cols = list(l_schema.names)
    right_cols = list(r_schema.names)
    types = {**dict(zip(r_schema.names, r_schema.types)),
             **dict(zip(l_schema.names, l_schema.types))}
    # a right carry column whose name collides with a LEFT column
    # (incl. one literally named left_key) is suffixed _r here, driver
    # side — previously such a column was silently dropped because the
    # union schema collapsed the duplicate name
    _orig_r_types = dict(zip(r_schema.names, r_schema.types))
    _carry_orig = [c for c in right_cols if c != right_key]
    _carry_out = {c: (c + "_r" if c in left_cols else c) for c in _carry_orig}
    _carry_inv = {v: k for k, v in _carry_out.items()}
    right_carry = [_carry_out[c] for c in _carry_orig]
    r_types = {_carry_out[c]: _orig_r_types[c] for c in _carry_orig}
    all_cols = [*left_cols, *right_carry]

    def bucket_of(keys: pa.ChunkedArray, salt_ids: np.ndarray | None = None) -> np.ndarray:
        base = key_bucket(keys, num_buckets)
        if salt_ids is not None:
            # additive mod-B salt injection: distinct salt ids < salt
            # <= B can never collide into one sub-bucket (an XOR mix
            # could — verified collision at num_buckets=10, salt=8 —
            # and colliding sub-buckets would double right replicas)
            base = (base + salt_ids) % np.int64(num_buckets)
        return base

    def _hot_mask(keys) -> np.ndarray:
        import pyarrow.compute as pc

        m = pc.is_in(keys, value_set=hot_set)
        return m.to_numpy(zero_copy_only=False).astype(bool)

    def unify(side_is_left: bool):
        def fn(t: pa.Table) -> pa.Table:
            key = left_key if side_is_left else right_key
            cols = {}
            for name in all_cols:
                if side_is_left and name in t.column_names:
                    cols[name] = t[name]
                elif not side_is_left and name == left_key:
                    cols[name] = t[right_key]  # key under the left name
                elif (not side_is_left and name in _carry_inv
                      and _carry_inv[name] in t.column_names):
                    cols[name] = t[_carry_inv[name]]
                else:
                    typ = r_types[name] if name in right_carry else types[name]
                    if not isinstance(typ, pa.DataType):
                        # Ray Schema may report Python types for pandas
                        # object columns
                        typ = {str: pa.string(), int: pa.int64(),
                               float: pa.float64(), bytes: pa.binary()}.get(
                            typ, pa.string()
                        )
                    cols[name] = pa.nulls(t.num_rows, type=typ)
            out = pa.table(cols)
            keys_arr = t[key].combine_chunks() if t.num_rows else t[key]
            salt_ids = None
            if use_salt:
                hot = _hot_mask(keys_arr)
                n = t.num_rows
                if side_is_left:
                    # spread hot left rows across salt sub-buckets
                    # (which sub-bucket is irrelevant to correctness)
                    salt_ids = np.where(hot, np.arange(n, dtype=np.int64) % salt, 0)
                else:
                    # replicate hot right rows once per sub-bucket
                    hot_idx = np.flatnonzero(hot)
                    if len(hot_idx):
                        take = np.concatenate(
                            [np.arange(n, dtype=np.int64),
                             np.repeat(hot_idx, salt - 1)]
                        )
                        salt_ids = np.concatenate(
                            [np.zeros(n, dtype=np.int64),
                             np.tile(np.arange(1, salt, dtype=np.int64), len(hot_idx))]
                        )
                        out = out.take(pa.array(take))
                        keys_arr = keys_arr.take(pa.array(take))
                    else:
                        salt_ids = np.zeros(n, dtype=np.int64)
            out = out.append_column("_bucket", pa.array(bucket_of(keys_arr, salt_ids)))
            return out.append_column(
                "_side_l", pa.array(np.full(out.num_rows, side_is_left))
            )

        return fn

    lt = left.map_batches(unify(True), batch_format="pyarrow")
    rt = right.map_batches(unify(False), batch_format="pyarrow")

    jt = {
        "inner": "inner", "left": "left outer", "left outer": "left outer",
        "semi": "left semi", "anti": "left anti", "full": "full outer",
    }.get(join_type)
    if jt is None:
        raise ValueError(f"join_type must be inner|left|semi|anti|full, got {join_type!r}")

    def join_bucket(g: pa.Table) -> pa.Table:
        mask = g["_side_l"].to_numpy(zero_copy_only=False)
        lg = g.filter(pa.array(mask)).select(left_cols)
        rg = g.filter(pa.array(~mask)).select([left_key, *right_carry])
        if jt in ("left semi", "left anti"):
            # existence joins: only the right KEYS matter; no carries
            return lg.join(rg.select([left_key]), keys=[left_key], join_type=jt)
        return lg.join(rg, keys=[left_key], join_type=jt, right_suffix="_r")

    both = lt.union(rt)
    return both.groupby("_bucket").map_groups(join_bucket, batch_format="pyarrow")


def asof_join(
    left: Dataset,
    right: Dataset,
    key: str,
    ts_col: str = "ts",
    num_partitions: int = 64,
    suffix: str = "_r",
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> Dataset:
    """As-of join: for each left row, the temporally closest right row
    with the same ``key`` — the task-brief custom-operator example.

    ``direction``: ``backward`` (default — most recent right ``ts ≤``
    left ts), ``forward`` (earliest right ``ts ≥``), or ``nearest``.
    ``tolerance_us``: optional maximum |Δts| in microseconds — rows
    whose best match is farther are dropped (INNER semantics, like
    every other unmatched row here).

    Shape: tag side, hash-partition BOTH sides by key (all rows of a
    key co-locate), then one vectorized ``pandas.merge_asof`` per
    partition (sorted by ts, ``by=key`` — per-key semantics without
    per-key tasks).  INNER semantics: unmatched left rows are dropped
    (no null-typed columns to reconcile).  Output: left columns
    (ts as ``ts_us`` int64) + right columns suffixed.

    ``left_schema`` / ``right_schema``: pass them when a side's
    lineage contains a shuffle — ``Dataset.schema()`` on such a
    dataset EXECUTES the upstream pipeline (same trap as
    :func:`bucket_join`).  All type information is resolved ONCE here
    on the driver; the per-batch/per-group UDFs capture only plain
    dicts, never the Dataset objects."""
    import numpy as np
    import pandas as pd

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    l_schema = left.schema() if left_schema is None else left_schema
    r_schema = right.schema() if right_schema is None else right_schema
    l_cols = [c for c in l_schema.names if c not in (ts_col,)]
    r_cols = [c for c in r_schema.names if c not in (ts_col,)]

    def _pa_type(typ) -> pa.DataType:
        if not isinstance(typ, pa.DataType):
            # Ray Schema may report Python types for pandas object cols
            typ = {str: pa.string(), int: pa.int64(),
                   float: pa.float64()}.get(typ, pa.string())
        return typ

    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))
    # fill type per column, resolved on the driver (left wins for
    # shared names, matching the output projection)
    null_types = {
        name: _pa_type(l_types[name] if name in l_cols else r_types[name])
        for name in set(l_cols) | set(r_cols)
    }

    def unify(is_left: bool):
        def fn(t: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            # NULL keys / timestamps never match (engine-wide rule);
            # dropping them HERE keeps both to_numpy paths int64 — a
            # null-bearing batch otherwise float-promotes, corrupting
            # ids >= 2^53 and emitting float _ts_us blocks that clash
            # with int64 blocks at the exchange
            ok = _pc.and_(_pc.is_valid(t[key]), _pc.is_valid(t[ts_col]))
            if not _pc.all(ok).as_py():
                t = t.filter(ok)
            us = (
                t[ts_col]
                .cast(pa.timestamp("us"))
                .cast(pa.int64())
                .to_numpy(zero_copy_only=False)
            )
            cols = {"_ts_us": pa.array(us)}
            mine = l_cols if is_left else r_cols
            for name, typ in null_types.items():
                if name in mine and name in t.column_names:
                    cols[name] = t[name]
                elif pa.types.is_integer(typ):
                    # SENTINEL zeros, not nulls: a null-bearing int
                    # column float-promotes at the pandas group
                    # conversion, silently corrupting 64-bit ids above
                    # 2^53 in the rows that DO carry values.  The
                    # other side never reads these cells (each side
                    # projects only its own columns in solve).
                    cols[name] = pa.array(
                        np.zeros(t.num_rows, dtype=np.int64)
                    ).cast(typ)
                else:
                    cols[name] = pa.nulls(t.num_rows, type=typ)
            out = pa.table(cols)
            kv = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
            out = out.append_column(
                "_part", pa.array(np.abs(kv * np.int64(1000003)) % np.int64(num_partitions))
            )
            return out.append_column(
                "_side_l", pa.array(np.full(t.num_rows, is_left))
            )

        return fn

    lt = left.map_batches(unify(True), batch_format="pyarrow")
    rt = right.map_batches(unify(False), batch_format="pyarrow")
    order = sorted({"_ts_us", "_part", "_side_l", *null_types})
    lt = lt.map_batches(lambda t: t.select(order), batch_format="pyarrow")
    rt = rt.map_batches(lambda t: t.select(order), batch_format="pyarrow")

    def solve(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side_l"]].sort_values("_ts_us", kind="mergesort")
        rg = g[~g["_side_l"]].sort_values("_ts_us", kind="mergesort")
        lg = lg[["_ts_us", *l_cols]].rename(columns={"_ts_us": "ts_us"})
        rg = rg[["_ts_us", *r_cols]].rename(columns={"_ts_us": "ts_us"})
        carry_out = [
            (c, f"{c}{suffix}" if c in l_cols or c == "ts_us" else c)
            for c in r_cols if c != key
        ]
        if lg.empty or rg.empty:
            return pd.DataFrame(
                columns=["ts_us", *l_cols, *[n for _, n in carry_out]]
            )
        # merge on ROW POSITIONS, not values: merge_asof NaN-fills its
        # carry columns for (pre-filter) unmatched rows, float-promoting
        # int64 carries and corrupting ids above 2^53 even in matched
        # rows.  Only the position column suffers the promotion (group
        # positions are < 2^53 by construction); the real carries are
        # taken from rg afterwards with their ORIGINAL dtypes.  The
        # position is also the always-non-null match indicator (a
        # legitimately-NULL carry value must not drop its row).
        rg = rg.reset_index(drop=True)
        probe = rg[["ts_us", key]].assign(
            _ridx=np.arange(len(rg), dtype=np.int64)
        )
        m = pd.merge_asof(
            lg, probe, on="ts_us", by=key, direction=direction,
            suffixes=("", suffix), tolerance=tolerance_us,
        )
        m = m[m["_ridx"].notna()]
        ridx = m["_ridx"].to_numpy().astype(np.int64)
        out = m[["ts_us", *l_cols]].reset_index(drop=True)
        for src_name, out_name in carry_out:
            out[out_name] = rg[src_name].iloc[ridx].reset_index(drop=True)
        return out

    both = lt.union(rt)
    return both.groupby("_part").map_groups(solve, batch_format="pandas")


class RangeJoinStage:
    """map_batches actor: join each batch row to every broadcast
    interval containing its value (``lo ≤ v ≤ hi``) — the range-join
    custom operator (task brief).  The interval table is small-side by
    construction (bands, buckets, SLA tiers); emits one row per
    (row, matching interval).

    Vectorized: a (batch × intervals) containment mask per chunk of
    intervals — right for up to ~10^4 intervals; beyond that sort and
    bucket the interval endpoints."""

    def __init__(self, intervals_ref, value_col: str, lo_col: str = "lo", hi_col: str = "hi"):
        import numpy as np

        iv = ray.get(intervals_ref) if isinstance(intervals_ref, ray.ObjectRef) else intervals_ref
        self.iv = iv.combine_chunks() if isinstance(iv, pa.Table) else iv
        self.lo = np.asarray(self.iv[lo_col].to_numpy(zero_copy_only=False), dtype=np.float64)
        self.hi = np.asarray(self.iv[hi_col].to_numpy(zero_copy_only=False), dtype=np.float64)
        self.value_col = value_col

    def _emit(self, batch: pa.Table, rows, ivs) -> pa.Table:
        """Assemble (row, interval) pairs — shared by both range-join
        paths so output layout can never diverge between them."""
        out = batch.take(pa.array(rows))
        for name in self.iv.column_names:
            out = out.append_column(name, self.iv[name].take(pa.array(ivs)))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        v = batch[self.value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        mask = (v[:, None] >= self.lo[None, :]) & (v[:, None] <= self.hi[None, :])
        rows, ivs = np.nonzero(mask)
        return self._emit(batch, rows, ivs)


def range_join(ds: Dataset, intervals: pa.Table, value_col: str,
               lo_col: str = "lo", hi_col: str = "hi", concurrency=(1, 2)) -> Dataset:
    """ds ⨝ intervals on ``lo ≤ ds[value_col] ≤ hi`` (broadcast side).
    Dense O(batch × intervals) mask — right up to ~10^4 intervals; use
    :func:`range_join_indexed` beyond that."""
    ref = ray.put(intervals)
    return ds.map_batches(
        RangeJoinStage,
        fn_constructor_args=(ref, value_col, lo_col, hi_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )


class RangeJoinIndexedStage(RangeJoinStage):
    """The scale path past :class:`RangeJoinStage`'s dense-mask limit:
    a BUCKET INDEX over the interval table, built once per actor
    (table unpacking and output assembly inherited from the dense
    stage — the two paths cannot diverge).

    Value space is cut into buckets of width ``granularity``; each
    interval registers in every bucket it touches, except intervals
    spanning more than ``wide_buckets`` buckets — including ±inf or
    sentinel catch-alls, whose clipped span is astronomically wide —
    which go to a small "wide" list tested against the whole batch.
    Degenerate intervals (NaN bounds, lo > hi) match nothing in the
    dense path and are dropped here for the same result.  Per batch:
    rows are grouped by bucket with one argsort (NOT a per-bucket
    scan), and each present bucket tests its rows against ONLY that
    bucket's candidates — work is O(rows·log(rows) +
    rows × candidates-per-bucket), independent of total interval
    count."""

    # bucket ids are clipped here before the int cast: ±inf / huge
    # sentinels would overflow int64 and silently mis-register.  ±2^31
    # buckets keeps every span arithmetic safely inside int64; values
    # and bounds clip CONSISTENTLY, and clipped collisions only add
    # candidates that the exact containment test then filters
    _BMAX = float(2**31)

    def __init__(self, intervals_ref, value_col: str, lo_col: str = "lo",
                 hi_col: str = "hi", granularity: float | None = None,
                 wide_buckets: int = 64):
        import numpy as np

        super().__init__(intervals_ref, value_col, lo_col, hi_col)
        if granularity is None:
            # median interval width: a typical interval touches ~2 buckets
            with np.errstate(invalid="ignore"):
                width = np.maximum(self.hi - self.lo, 0.0)
            finite = width[np.isfinite(width)]
            med = float(np.median(finite)) if len(finite) else 1.0
            granularity = med if med > 0 else 1.0
        self.g = float(granularity)
        with np.errstate(invalid="ignore"):
            valid = ~(np.isnan(self.lo) | np.isnan(self.hi)) & (self.lo <= self.hi)
        b_lo = np.floor(np.clip(self.lo / self.g, -self._BMAX, self._BMAX)).astype(np.int64)
        b_hi = np.floor(np.clip(self.hi / self.g, -self._BMAX, self._BMAX)).astype(np.int64)
        spans = np.where(valid, b_hi - b_lo + 1, 0)
        wide = valid & (spans > wide_buckets)
        self.wide_ids = np.flatnonzero(wide)
        self.index: dict[int, np.ndarray] = {}
        narrow = np.flatnonzero(valid & ~wide)
        if len(narrow):
            reg_iv = np.repeat(narrow, spans[narrow])
            reg_b = np.concatenate(
                [np.arange(b_lo[i], b_hi[i] + 1, dtype=np.int64) for i in narrow]
            )
            order = np.argsort(reg_b, kind="stable")
            reg_b, reg_iv = reg_b[order], reg_iv[order]
            cuts = np.flatnonzero(np.diff(reg_b)) + 1
            for b, ids in zip(reg_b[np.concatenate([[0], cuts])],
                              np.split(reg_iv, cuts)):
                self.index[int(b)] = ids

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        v = batch[self.value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        vb = np.floor(np.clip(v / self.g, -self._BMAX, self._BMAX)).astype(np.int64)
        out_rows, out_ivs = [], []
        # group rows by bucket with ONE argsort (a per-unique-bucket
        # boolean scan would be O(unique × rows) — quadratic when
        # values are spread over many buckets)
        order = np.argsort(vb, kind="stable")
        svb = vb[order]
        cuts = np.flatnonzero(np.diff(svb)) + 1
        for b, rows in zip(
            svb[np.concatenate([[0], cuts])] if len(svb) else [],
            np.split(order, cuts) if len(svb) else [],
        ):
            cand = self.index.get(int(b))
            if cand is None:
                continue
            m = (v[rows, None] >= self.lo[cand][None, :]) & (
                v[rows, None] <= self.hi[cand][None, :]
            )
            r, c = np.nonzero(m)
            out_rows.append(rows[r])
            out_ivs.append(cand[c])
        # wide intervals: tested against the whole batch (few by design)
        if len(self.wide_ids):
            m = (v[:, None] >= self.lo[self.wide_ids][None, :]) & (
                v[:, None] <= self.hi[self.wide_ids][None, :]
            )
            r, c = np.nonzero(m)
            out_rows.append(r)
            out_ivs.append(self.wide_ids[c])
        rows = np.concatenate(out_rows) if out_rows else np.zeros(0, dtype=np.int64)
        ivs = np.concatenate(out_ivs) if out_ivs else np.zeros(0, dtype=np.int64)
        fin = np.lexsort((ivs, rows))  # deterministic output order
        return self._emit(batch, rows[fin], ivs[fin])


def range_join_indexed(ds: Dataset, intervals: pa.Table, value_col: str,
                       lo_col: str = "lo", hi_col: str = "hi",
                       granularity: float | None = None,
                       wide_buckets: int = 64,
                       concurrency=(1, 2)) -> Dataset:
    """ds ⨝ intervals on ``lo ≤ v ≤ hi`` via the per-actor bucket
    index — for interval tables past :func:`range_join`'s ~10^4 dense
    limit.  Same pairs as :func:`range_join` up to row order;
    ``wide_buckets`` tunes when an interval moves to the batch-wide
    catch-all list."""
    ref = ray.put(intervals)
    return ds.map_batches(
        RangeJoinIndexedStage,
        fn_constructor_args=(ref, value_col, lo_col, hi_col, granularity, wide_buckets),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def semi_join_filter(ds: Dataset, key_values, key_col: str, invert: bool = False) -> Dataset:
    """Semi/anti join: keep rows whose key is (not) in the broadcast
    key set — vectorized ``pc.is_in`` per batch."""
    vals = pa.array(sorted(set(key_values)))
    ref = ray.put(vals)

    class _Semi:
        def __init__(self):
            self._vals = None

        def __call__(self, t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            if self._vals is None:
                self._vals = ray.get(ref)
            mask = pc.is_in(t[key_col], value_set=self._vals)
            if invert:
                mask = pc.invert(mask)
            return t.filter(mask)

    return ds.map_batches(_Semi, batch_format="pyarrow", zero_copy_batch=True, concurrency=2)


# ---------------------------------------------------------------------------
# persisted bucketed layout: pay the exchange ONCE at ingest, then every
# equi-join on the bucketing key is zero-shuffle (the bucketBy pattern)
# ---------------------------------------------------------------------------

_BUCKET_MANIFEST = "_BUCKETS.json"
_BUCKET_HASH = "knuth-fnv"  # bump if key_bucket's definition ever changes


def write_bucketed(ds: Dataset, key: str, path: str, num_buckets: int = 64) -> str:
    """Persist ``ds`` hash-bucketed by ``key`` into hive-style
    ``path/_bucket=<b>/`` dirs plus a ``_BUCKETS.json`` manifest.

    The one exchange this costs (sort by bucket before the partitioned
    write — an unsorted write fragments blocks × buckets: measured 895
    files / 57 s probe vs ~1 file per bucket clustered) is paid ONCE;
    afterwards :func:`bucket_join_prebucketed` joins two layouts that
    share ``num_buckets`` with NO shuffle at all — the fact-table
    pattern for repeated joins at 100 TB.
    """
    import base64
    import glob as _glob
    import json
    import os
    import shutil

    import pyarrow.parquet as pq

    shutil.rmtree(path, ignore_errors=True)  # appends stack otherwise

    def addb(t: pa.Table) -> pa.Table:
        return t.append_column("_bucket", pa.array(key_bucket(t[key], num_buckets)))

    tagged = ds.map_batches(addb, batch_format="pyarrow", zero_copy_batch=True)
    tagged.sort("_bucket").write_parquet(path, partition_cols=["_bucket"])
    # a 0-row write creates nothing — the manifest still must land
    os.makedirs(path, exist_ok=True)
    # record WHICH buckets were written (a join-time glob cannot tell a
    # genuinely-empty bucket from a lost/unreachable one — e.g. a
    # node-local path on a multi-node cluster — without this) and the
    # schema (so an all-empty layout still joins with correct columns).
    written = sorted(
        int(os.path.basename(d).split("=", 1)[1])
        for d in _glob.glob(os.path.join(path, "_bucket=*"))
    )
    if written:
        first = sorted(
            _glob.glob(os.path.join(path, f"_bucket={written[0]}", "*.parquet"))
        )[0]
        schema = pq.read_schema(first)
    else:
        schema = ds.schema().base_schema  # empty dataset: lineage is cheap
    with open(os.path.join(path, _BUCKET_MANIFEST), "w") as f:
        json.dump(
            {
                "key": key,
                "num_buckets": num_buckets,
                "hash": _BUCKET_HASH,
                "buckets_written": written,
                "schema_b64": base64.b64encode(schema.serialize().to_pybytes()).decode(),
            },
            f,
        )
    return path


def _read_bucket_manifest(path: str) -> dict:
    import json
    import os

    with open(os.path.join(path, _BUCKET_MANIFEST)) as f:
        return json.load(f)


def bucket_join_prebucketed(
    left_path: str,
    right_path: str,
    join_type: str = "inner",
) -> Dataset:
    """ZERO-shuffle large × large equi-join over two
    :func:`write_bucketed` layouts: bucket ``b`` of the left joins
    bucket ``b`` of the right in one independent task — co-location
    was bought at write time, so nothing moves between nodes here and
    a failed bucket retries alone.

    Both layouts must share ``num_buckets`` (validated from the
    manifests); the bucketing keys may have different NAMES — the
    shared :func:`key_bucket` hashes values only.  Output: pyarrow's
    C++ join per bucket (keys coalesced, right collisions suffixed
    ``_r``), exactly :func:`bucket_join`'s per-bucket kernel.
    """
    import glob as _glob
    import os

    import pyarrow.parquet as pq

    import ray.data as rd

    lm, rm = _read_bucket_manifest(left_path), _read_bucket_manifest(right_path)
    if lm["num_buckets"] != rm["num_buckets"]:
        raise ValueError(
            f"bucket counts differ: {lm['num_buckets']} vs {rm['num_buckets']}"
            " — rewrite one side (co-location requires identical hashing)"
        )
    for m, p in ((lm, left_path), (rm, right_path)):
        if m.get("hash", _BUCKET_HASH) != _BUCKET_HASH:
            raise ValueError(
                f"layout at {p} was bucketed with hash {m['hash']!r}; this"
                f" engine uses {_BUCKET_HASH!r} — rewrite the layout"
                " (joining across hash versions silently mis-co-locates)"
            )
    pa_join = {
        "inner": "inner",
        "left": "left outer",
        "semi": "left semi",
        "anti": "left anti",
        "full": "full outer",
    }.get(join_type)
    if pa_join is None:
        raise ValueError(f"join_type must be inner|left|semi|anti|full, got {join_type!r}")
    B = lm["num_buckets"]
    l_key, r_key = lm["key"], rm["key"]

    def _schema(path: str, manifest: dict) -> pa.Schema:
        if "schema_b64" in manifest:
            import base64

            return pa.ipc.read_schema(
                pa.py_buffer(base64.b64decode(manifest["schema_b64"]))
            )
        files = sorted(_glob.glob(os.path.join(path, "_bucket=*", "*.parquet")))
        if not files:
            raise ValueError(f"no bucket files under {path}")
        return pq.read_schema(files[0])

    l_schema, r_schema = _schema(left_path, lm), _schema(right_path, rm)
    # existence joins need only the right KEY — prune at the parquet read
    # (bucket_join's kernel ships right keys only for semi/anti too)
    r_cols = [r_key] if pa_join in ("left semi", "left anti") else None
    if r_cols is not None:
        r_schema = pa.schema([r_schema.field(r_key)])
    l_written = set(lm.get("buckets_written", range(B)))
    r_written = set(rm.get("buckets_written", range(B)))

    def join_buckets(batch: pa.Table) -> pa.Table:
        def read_side(path, schema, b, written, columns=None) -> pa.Table:
            files = sorted(
                _glob.glob(os.path.join(path, f"_bucket={b}", "*.parquet"))
            )
            if not files:
                if b in written:
                    raise FileNotFoundError(
                        f"bucket {b} is in {path}'s manifest but has no"
                        " files — the layout is partially lost or not"
                        " visible from this node; refusing to silently"
                        " drop its rows"
                    )
                return schema.empty_table()
            return pa.concat_tables(pq.read_table(f, columns=columns) for f in files)

        outs = []
        for b in batch["b"].to_pylist():
            lt = read_side(left_path, l_schema, int(b), l_written)
            rt = read_side(right_path, r_schema, int(b), r_written, r_cols)
            outs.append(
                lt.join(
                    rt, keys=[l_key], right_keys=[r_key],
                    join_type=pa_join, right_suffix="_r",
                )
            )
        return pa.concat_tables(outs)

    # one block per bucket → one independent task per bucket
    ids = rd.from_items([{"b": b} for b in range(B)], override_num_blocks=B)
    return ids.map_batches(join_buckets, batch_format="pyarrow")


def compact_bucketed(
    path: str,
    target_rows_per_file: int = 1_000_000,
    concurrency: int | None = None,
) -> dict:
    """Compact a :func:`write_bucketed` layout's small files in place:
    every ``_bucket=<b>/`` dir whose parquet files outnumber
    ``ceil(rows / target_rows_per_file)`` is rewritten to that many
    files — the table-maintenance pass every long-lived bucketed store
    needs (daily :func:`rayraster.pipelines.merge_pixel_stores`-style
    ingests and checkpoint shards accrete small files; parquet scan
    cost is per-file footer + row-group overhead, so a 10^4-file
    bucket reads ~100× slower than a 10-file one at equal bytes).

    One Ray task per bucket (this is FILE-SYSTEM maintenance on
    directory units with atomic swaps — the unit of work is the
    bucket dir, not a row batch, so raw tasks are the honest shape;
    the row data itself never crosses the driver):

    * streams input row groups through one ``pq.ParquetWriter`` at a
      time, rolling to the next file at the row target — peak heap is
      ONE row group, not the bucket;
    * writes into ``<dir>.compact_tmp`` then swaps via two renames —
      a crash mid-compact leaves either the old or the new complete
      dir, never a mix, and a re-run skips already-compacted buckets
      (idempotent resume, same contract as ``checkpoint.py``);
    * the join-visible layout (``_BUCKETS.json``, bucket dirs, row
      order within the concatenated bucket) is unchanged —
      :func:`bucket_join_prebucketed` and
      :func:`rayraster.textops.search_index`-style probed reads work
      identically before and after.

    Returns ``{"buckets_compacted", "files_before", "files_after"}``
    (counts over REWRITTEN buckets only).  ``concurrency`` caps the
    in-flight tasks (default: all buckets; Ray queues what the
    cluster can't run).
    """
    import glob as _glob
    import math
    import os

    if target_rows_per_file < 1:
        raise ValueError("target_rows_per_file must be >= 1")
    _read_bucket_manifest(path)  # raises on a non-bucketed dir
    # crash repair BEFORE compacting: a worker dying between the two
    # swap renames leaves the data in _bucket=<b>.compact_old with no
    # main dir — restore it; a stale .compact_old WITH a main dir is
    # post-swap debris — drop it; .compact_tmp is always incomplete
    import shutil as _shutil

    for old_dir in _glob.glob(os.path.join(path, "_bucket=*.compact_old")):
        main = old_dir[: -len(".compact_old")]
        if os.path.isdir(main):
            _shutil.rmtree(old_dir)
        else:
            os.rename(old_dir, main)
    for tmp_dir in _glob.glob(os.path.join(path, "_bucket=*.compact_tmp")):
        _shutil.rmtree(tmp_dir)
    bucket_dirs = sorted(
        d for d in _glob.glob(os.path.join(path, "_bucket=*"))
        if ".compact" not in os.path.basename(d)
    )

    @ray.remote
    def _compact(bdir: str):
        import shutil

        import pyarrow.parquet as pq

        files = sorted(_glob.glob(os.path.join(bdir, "*.parquet")))
        if not files:
            return (0, 0)
        total = sum(pq.read_metadata(f).num_rows for f in files)
        n_out = max(1, math.ceil(total / target_rows_per_file))
        if len(files) <= n_out:
            return (0, 0)  # already compact — idempotent resume skip
        tmp = bdir + ".compact_tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        schema = pq.read_schema(files[0])
        writer = None
        out_idx = 0
        rows_in_file = 0
        try:
            for f in files:
                pf = pq.ParquetFile(f)
                if not pf.schema_arrow.equals(schema):
                    raise ValueError(
                        f"compact_bucketed: schema mismatch in {f} vs {files[0]}"
                    )
                for g in range(pf.num_row_groups):
                    rg = pf.read_row_group(g)
                    if writer is None:
                        writer = pq.ParquetWriter(
                            os.path.join(tmp, f"part-{out_idx:05d}.parquet"), schema
                        )
                    writer.write_table(rg)
                    rows_in_file += rg.num_rows
                    if rows_in_file >= target_rows_per_file:
                        writer.close()
                        writer = None
                        out_idx += 1
                        rows_in_file = 0
        finally:
            if writer is not None:
                writer.close()
        old = bdir + ".compact_old"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(bdir, old)
        os.rename(tmp, bdir)
        shutil.rmtree(old)
        return (len(files), len(_glob.glob(os.path.join(bdir, "*.parquet"))))

    if concurrency is not None and concurrency >= 1:
        # bounded submission window (wait-one, submit-next) — caps the
        # number of IN-FLIGHT tasks, e.g. to limit filesystem pressure
        it = iter(bucket_dirs)
        pending = [_compact.remote(d) for _, d in zip(range(concurrency), it)]
        results = []
        while pending:
            done, pending = ray.wait(pending, num_returns=1)
            results.extend(ray.get(done))
            nxt = next(it, None)
            if nxt is not None:
                pending.append(_compact.remote(nxt))
    else:
        results = ray.get([_compact.remote(d) for d in bucket_dirs])
    rewritten = [(b, a) for b, a in results if b > 0]
    return {
        "buckets_compacted": len(rewritten),
        "files_before": sum(b for b, _ in rewritten),
        "files_after": sum(a for _, a in rewritten),
    }


def bucket_join_stream_layout(
    left: Dataset,
    right_path: str,
    left_key: str,
    join_type: str = "inner",
    left_schema: pa.Schema | None = None,
) -> Dataset:
    """Join an IN-FLIGHT Dataset against a persisted
    :func:`write_bucketed` layout: the stream side pays ONE
    hash-partition exchange (bucketed with the layout's own hash, so
    co-location is exact) and the layout side never moves — each
    bucket task reads only its own ``_bucket=<b>/`` dir.  The
    fact-stream ⨝ dimension-layout pattern: the dim was bucketed once
    at ingest; every subsequent pipeline probes it for free without
    rewriting itself via :func:`write_bucketed` first (compare
    :func:`bucket_join_prebucketed`, which needs BOTH sides laid out).

    ``join_type``: inner|left|semi|anti (existence joins read only the
    layout's key column — pruned at the parquet read).  Output:
    pyarrow's C++ join per bucket, right collisions suffixed ``_r`` —
    the same kernel as every bucket join here.
    """
    import glob as _glob
    import os

    import pyarrow.parquet as pq

    rm = _read_bucket_manifest(right_path)
    if rm.get("hash", _BUCKET_HASH) != _BUCKET_HASH:
        raise ValueError(
            f"layout at {right_path} was bucketed with hash {rm['hash']!r};"
            f" this engine uses {_BUCKET_HASH!r} — rewrite the layout"
        )
    pa_join = {
        "inner": "inner", "left": "left outer",
        "semi": "left semi", "anti": "left anti",
    }.get(join_type)
    if pa_join is None:
        raise ValueError(
            f"join_type must be inner|left|semi|anti, got {join_type!r}"
        )
    B = rm["num_buckets"]
    r_key = rm["key"]
    if "schema_b64" in rm:
        import base64

        r_schema = pa.ipc.read_schema(
            pa.py_buffer(base64.b64decode(rm["schema_b64"]))
        )
    else:
        files = sorted(_glob.glob(os.path.join(right_path, "_bucket=*", "*.parquet")))
        if not files:
            raise ValueError(f"no bucket files under {right_path}")
        r_schema = pq.read_schema(files[0])
    r_cols = [r_key] if pa_join in ("left semi", "left anti") else None
    if r_cols is not None:
        r_schema = pa.schema([r_schema.field(r_key)])
    r_written = set(rm.get("buckets_written", range(B)))

    def addb(t: pa.Table) -> pa.Table:
        return t.append_column("_bucket", pa.array(key_bucket(t[left_key], B)))

    tagged = left.map_batches(addb, batch_format="pyarrow", zero_copy_batch=True)

    def join_bucket(g: pa.Table) -> pa.Table:
        b = int(g["_bucket"][0].as_py())
        lt = g.drop_columns(["_bucket"])
        files = sorted(
            _glob.glob(os.path.join(right_path, f"_bucket={b}", "*.parquet"))
        )
        if not files:
            if b in r_written:
                raise FileNotFoundError(
                    f"bucket {b} is in {right_path}'s manifest but has no"
                    " files — the layout is partially lost; refusing to"
                    " silently drop its rows"
                )
            rt = r_schema.empty_table()
        else:
            rt = pa.concat_tables(pq.read_table(f, columns=r_cols) for f in files)
        if pa_join in ("left semi", "left anti"):
            rt = rt.select([r_key])
        return lt.join(
            rt, keys=[left_key], right_keys=[r_key],
            join_type=pa_join, right_suffix="_r",
        )

    return tagged.groupby("_bucket").map_groups(join_bucket, batch_format="pyarrow")


def bloom_anti_join(
    left: Dataset,
    right: Dataset,
    left_key: str,
    right_key: str,
    num_buckets: int = 64,
    log2_bits: int = 20,
    num_hashes: int = 5,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
) -> Dataset:
    """Bloom-accelerated large × large ANTI join — the classic
    runtime-filter pushdown: a Bloom filter of the right keys is built
    with blob folds (one ~128 KiB filter per batch leaves a node,
    never rows), ships once via ``ray.put``, and splits the left in a
    single map pass.  Bloom membership has NO false negatives, so
    definite-miss rows are CORRECT anti-join output immediately — they
    skip the shuffle entirely; only the hits (true matches + the
    false-positive sliver) pay the exact anti ``bucket_join``.

    Output is row-identical to ``bucket_join(..., join_type='anti')``
    (pytest-proven); the win is that the exchange carries only
    ~|matches| + ε·|left| rows instead of |left| + |right|.
    """
    from rayraster.sketch import bloom_mark, build_bloom

    import pyarrow.compute as pc

    l_schema = left.schema() if left_schema is None else left_schema
    bl = build_bloom(
        right.map_batches(
            lambda t, _k=right_key: t.select([_k]), batch_format="pyarrow"
        ),
        right_key, log2_bits=log2_bits, num_hashes=num_hashes,
    )
    marked = bloom_mark(left, bl, left_key).materialize()
    miss = marked.map_batches(
        lambda t: t.filter(pc.invert(t["bloom_hit"])).drop_columns(
            ["bloom_hit"]
        ),
        batch_format="pyarrow",
    )
    hits = marked.map_batches(
        lambda t: t.filter(t["bloom_hit"]).drop_columns(["bloom_hit"]),
        batch_format="pyarrow",
    )
    anti = bucket_join(
        hits, right, left_key, right_key, num_buckets=num_buckets,
        join_type="anti", left_schema=l_schema, right_schema=right_schema,
    )
    return miss.union(anti)
