"""Incremental-ingest ops loop over a bucketed document store.

The daily-maintenance story every long-lived 100-TB corpus needs,
composed from the engine's table-ops family (all streaming Ray Data):

  day-0 snapshot  →  write_bucketed store (pay the exchange once)
  day-1 change log (updates + inserts + deletes, re-emitted versions)
      → upsert_latest   (CDC/SCD-1 compaction: latest version per key,
                         changes win ties, tombstones drop)
      → diff_snapshots  (audit: the change set actually applied —
                         added / removed / changed, NULL-safe)
      → write_bucketed  (day-1 store, same bucket count → future joins
                         stay zero-shuffle)
      → fragment + compact_bucketed  (small-file maintenance:
                         streaming row-group rewrite, atomic swap)
      → leakage_safe_split (near-dup-cluster-keyed train/val sides)

Run:  PYTHONPATH=. python examples/incremental_ingest.py [--rows 20000]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import tempfile


def main(rows: int = 20_000, out_dir: str | None = None,
         num_cpus: int | None = None) -> dict:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

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

    from rayraster.dedup import connected_components_distributed, leakage_safe_split
    from rayraster.join import compact_bucketed, write_bucketed
    from rayraster.pipelines import diff_snapshots, upsert_latest

    out = out_dir or tempfile.mkdtemp(prefix="rayraster_ingest_")
    summary: dict = {"rows": rows, "out": out}

    # --- day 0: deterministic snapshot --------------------------------
    ids = np.arange(rows, dtype=np.int64)
    day0 = pa.table(
        {
            "doc_id": pa.array(ids),
            "version": pa.array(np.zeros(rows, dtype=np.int64)),
            "n_chars": pa.array((ids * 37 % 5000) + 100),
            "host_id": pa.array(ids % 97),
        }
    )
    store0 = os.path.join(out, "store_day0")
    write_bucketed(rd.from_arrow(day0), "doc_id", store0, num_buckets=16)

    # --- day 1: change log --------------------------------------------
    # updates for every 7th doc, deletes every 131st, inserts beyond
    upd = ids[ids % 7 == 0]
    dele = ids[ids % 131 == 0]
    ins = np.arange(rows, rows + rows // 10, dtype=np.int64)
    chg_ids = np.concatenate([upd, dele, ins])
    chg = pa.table(
        {
            "doc_id": pa.array(chg_ids),
            "version": pa.array(
                np.concatenate(
                    [np.ones(len(upd), dtype=np.int64),
                     2 * np.ones(len(dele), dtype=np.int64),
                     np.ones(len(ins), dtype=np.int64)]
                )
            ),
            "n_chars": pa.array((chg_ids * 41 % 5000) + 100),
            "host_id": pa.array(chg_ids % 97),
            "deleted": pa.array(
                np.concatenate(
                    [np.zeros(len(upd), dtype=bool),
                     np.ones(len(dele), dtype=bool),
                     np.zeros(len(ins), dtype=bool)]
                )
            ),
        }
    )

    snap0 = rd.from_arrow(day0)
    merged = upsert_latest(
        snap0, rd.from_arrow(chg), "doc_id", "version",
        tombstone_col="deleted", num_partitions=16,
    )
    day1 = merged.materialize()
    summary["day0_rows"] = rows
    summary["day1_rows"] = day1.count()

    # --- audit: what actually changed ---------------------------------
    diff = diff_snapshots(
        snap0, day1, "doc_id", ["n_chars", "version"], num_partitions=16
    ).materialize()
    by_change = {
        r["change"]: r["n"]
        for r in (
            diff.groupby("change").count().rename_columns(["change", "n"])
            .take_all()
        )
    }
    summary["diff"] = by_change

    # --- persist day-1 store + small-file maintenance ------------------
    store1 = os.path.join(out, "store_day1")
    write_bucketed(
        day1.map_batches(lambda t: t.drop_columns(["deleted"]),
                         batch_format="pyarrow"),
        "doc_id", store1, num_buckets=16,
    )
    # simulate small-file accretion: split bucket 0's file per row group
    b0 = sorted(glob.glob(os.path.join(store1, "_bucket=0", "*.parquet")))
    frag_dir = os.path.dirname(b0[0])
    t0 = pq.read_table(b0[0])
    os.remove(b0[0])
    step = max(1, t0.num_rows // 40)
    for i, off in enumerate(range(0, t0.num_rows, step)):
        pq.write_table(t0.slice(off, step),
                       os.path.join(frag_dir, f"frag-{i:04d}.parquet"))
    summary["compact"] = compact_bucketed(store1, target_rows_per_file=500_000)

    # --- near-dup-aware split of the merged corpus ---------------------
    # toy near-dup pairs: docs sharing (id // 500) in the update set
    pair_base = upd[: (len(upd) // 2) * 2]
    pairs = rd.from_arrow(
        pa.table({"a": pa.array(pair_base[0::2]), "b": pa.array(pair_base[1::2])})
    )
    clusters = connected_components_distributed(pairs, num_partitions=8)
    split = leakage_safe_split(
        day1.map_batches(lambda t: t.select(["doc_id"]), batch_format="pyarrow"),
        clusters, num_partitions=16,
    )
    sp = split.groupby("split").count().rename_columns(["split", "n"]).take_all()
    summary["split"] = {r["split"]: r["n"] for r in sp}

    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000)
    ap.add_argument("--out", default=None)
    ap.add_argument("--num-cpus", type=int, default=None)
    a = ap.parse_args()
    main(a.rows, a.out, a.num_cpus)
