"""Store-maintenance ops at scale: compaction read-amplification payoff,
merge-on-read upsert cost, and Z-order pruning on a ~2M-row table.

Three measured claims behind the round-5 lakehouse layer:
 1. COMPACTION: a 512-fragment store (the shape thousands of small crawl
    waves leave behind) compacts to ~32 fragments; the full-table read is
    then measurably faster (parquet open/footer cost amortized).
 2. UPSERT: a 10k-row wave against the 2M-row store touches only the key
    column of each fragment + writes O(wave) bytes — never a rewrite.
 3. Z-ORDER: a box selective in BOTH dimensions reads a small fraction of
    fragments; the same box on a 1-D-sorted layout reads ~the x-selective
    fraction only, and an unclustered layout reads everything.

Prints one JSON line per claim. Run with the machine otherwise idle
(BENCH/BASELINE.md noise discipline):
    python tools/store_maintenance_demo.py [n_rows]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
import pyarrow as pa  # noqa: E402
import ray  # noqa: E402


def _mk_rows(lo: int, n: int, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    ids = np.arange(lo, lo + n, dtype=np.int64)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "qty": pa.array(rng.uniform(1.0, 50.0, n).round(2)),
        "disc": pa.array(rng.uniform(0.0, 0.1, n).round(4)),
        "payload": pa.array([f"text-{v}-{'x' * 64}" for v in ids]),
    })


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_frags = 512
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    from crawler_ray.functions import zorder
    from crawler_ray.sources import lance_layout as ll

    # ---- seed a 512-fragment store ------------------------------------
    root = "/tmp/crawler_ray_maint_demo"
    shutil.rmtree(root, ignore_errors=True)
    rows_each = n_rows // n_frags
    n_rows = rows_each * n_frags  # exact fragment grid
    frags = []
    for i in range(n_frags):
        frags += ll.write_table_fragment(_mk_rows(i * rows_each, rows_each, i),
                                         root, "store", f"w{i:04d}")
    ll.write_manifest(root, 1, {"tables": {"store": frags}})

    def timed_read():
        t0 = time.time()
        m = ll.latest_manifest(root)
        ds = rd.read_parquet(ll.fragment_paths(root, "store", m["tables"]["store"]))
        n = ds.count()
        return time.time() - t0, n

    read_before, n0 = timed_read()

    # ---- claim 1: compaction ------------------------------------------
    t0 = time.time()
    s = ll.compact_table(root, "store", target_rows=n_rows // 32)
    compact_sec = time.time() - t0
    read_after, n1 = timed_read()
    assert n0 == n1 == n_rows
    print(json.dumps({"claim": "compaction", "rows": n_rows,
                      "frags_before": s["n_before"], "frags_after": s["n_after"],
                      "compact_sec": round(compact_sec, 2),
                      "full_read_before_sec": round(read_before, 2),
                      "full_read_after_sec": round(read_after, 2)}))

    # ---- claim 2: merge-on-read upsert cost ----------------------------
    wave_ids = np.arange(0, n_rows, n_rows // 10_000, dtype=np.int64)[:10_000]
    wave = pd.DataFrame({"doc_id": wave_ids,
                         "qty": np.full(len(wave_ids), 25.0),
                         "disc": np.full(len(wave_ids), 0.05),
                         "payload": [f"upserted-{v}" for v in wave_ids]})
    bytes_before = sum(os.path.getsize(os.path.join(root, "store", f))
                       for f in os.listdir(os.path.join(root, "store"))
                       if f.endswith(".parquet"))
    t0 = time.time()
    u = ll.merge_insert(root, "store", rd.from_pandas(wave), "doc_id")
    upsert_sec = time.time() - t0
    bytes_after = sum(os.path.getsize(os.path.join(root, "store", f))
                      for f in os.listdir(os.path.join(root, "store"))
                      if f.endswith(".parquet"))
    got = ll.read_table(root, "store")
    assert got.num_rows == n_rows, got.num_rows  # pure replace
    print(json.dumps({"claim": "upsert", "wave_rows": int(u["n_added"]),
                      "deleted": int(u["n_deleted"]),
                      "upsert_sec": round(upsert_sec, 2),
                      "new_bytes_mb": round((bytes_after - bytes_before) / 2**20, 1),
                      "store_bytes_mb": round(bytes_before / 2**20, 1)}))

    # ---- claim 3: z-order pruning vs 1-D sort vs unclustered -----------
    zroot = "/tmp/crawler_ray_zorder_demo"
    shutil.rmtree(zroot, ignore_errors=True)
    m = ll.latest_manifest(root)
    base = rd.read_parquet(ll.fragment_paths(root, "store", m["tables"]["store"]),
                           columns=["doc_id", "qty", "disc"])
    t0 = time.time()
    zorder.write_zorder_layout(base, zroot, "t", "qty", "disc",
                               x_range=(1.0, 50.0), y_range=(0.0, 0.1),
                               bits=8, bucket_bits=6)
    layout_sec = time.time() - t0
    box = (10.0, 20.0, 0.02, 0.06)
    t0 = time.time()
    ds, n_total, n_read = zorder.bbox_scan(zroot, "t", "qty", "disc", *box)
    n_match = ds.count()
    scan_sec = time.time() - t0
    # honest baseline: the same exact-predicate scan over ALL fragments
    import pyarrow.compute as pc

    t0 = time.time()
    flt = ((pc.field("qty") >= box[0]) & (pc.field("qty") <= box[1])
           & (pc.field("disc") >= box[2]) & (pc.field("disc") <= box[3]))
    zm = ll.latest_manifest(zroot)
    n_full = rd.read_parquet(
        ll.fragment_paths(zroot, "t", zm["tables"]["t"]), filter=flt).count()
    full_sec = time.time() - t0
    assert n_match == n_full
    print(json.dumps({"claim": "zorder", "rows": n_rows,
                      "layout_sec": round(layout_sec, 2),
                      "frags_total": n_total, "frags_read": n_read,
                      "matched": int(n_match),
                      "pruned_scan_sec": round(scan_sec, 2),
                      "full_scan_sec": round(full_sec, 2)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
