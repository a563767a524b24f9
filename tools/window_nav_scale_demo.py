"""Bench-tier demonstration of the window-navigation operators.

20,000,000 rows / 1,000,000 keys through the production kernels behind the
round-5 window wave — the distributed LAG (`scan.grouped_lag_ds`, one sort
exchange + O(blocks) driver seam carry) and the CDC latest-record-per-key
dedup (one keyed exchange + per-block sort/last, exact by co-location) —
each verified row-for-row against DuckDB's native window functions on the
same data. The instrumented point: the LAG driver state is one summary row
per block (tens of rows), never O(rows) or O(keys), and the latest-per-key
output writes straight to parquet without the 1M-row result ever sitting
on the driver.

Run: python tools/window_nav_scale_demo.py   (~2 min at 32 cpus)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 20_000_000
N_KEYS = 1_000_000


def _mix(x: np.ndarray, salt: int) -> np.ndarray:
    x = (np.asarray(x, np.uint64) + np.uint64(salt)) * np.uint64(0x9E3779B185EBCA87)
    x ^= x >> np.uint64(29)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(32)
    return x


def gen(b: pd.DataFrame) -> pd.DataFrame:
    i = b["id"].to_numpy(np.int64)
    return pd.DataFrame({
        "rid": (_mix(i, 1)).astype(np.int64),           # unique unordered key
        "k": (_mix(i, 2) % N_KEYS).astype(np.int64),
        "v": (_mix(i, 3) % 1000).astype(np.int64),
    })


def main() -> None:
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from crawler_ray.functions import scan
    from crawler_ray.pipelines.queries import _keyed
    from crawler_ray.sizing import exchange_width as _W

    src = rd.range(N).map_batches(gen, batch_format="pandas").materialize()
    n_blocks = src.num_blocks()

    # --- distributed LAG ------------------------------------------------
    path = "/tmp/window_nav_demo_lag"
    shutil.rmtree(path, ignore_errors=True)
    t0 = time.time()
    lag = scan.grouped_lag_ds(src, "k", ["rid"], "v", out_col="prev_v")
    lag.write_parquet(path)          # production consumption: stream to store
    t_lag = time.time() - t0

    # --- CDC latest-record-per-key ---------------------------------------
    pathl = "/tmp/window_nav_demo_latest"
    shutil.rmtree(pathl, ignore_errors=True)

    def latest(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or "k" not in b.columns:
            return pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                                 "last_rid": pd.Series([], dtype=np.int64),
                                 "last_v": pd.Series([], dtype=np.int64),
                                 "n": pd.Series([], dtype=np.int64)})
        b = b.sort_values(["k", "rid"], kind="mergesort")
        g = b.groupby("k", as_index=False)
        last = g.last()
        return pd.DataFrame({"k": last["k"].astype(np.int64),
                             "last_rid": last["rid"].astype(np.int64),
                             "last_v": last["v"].astype(np.int64),
                             "n": g.size()["size"].astype(np.int64)})

    t0 = time.time()
    dk = (_keyed(src).repartition(_W(), keys=["k"])
          .map_batches(latest, batch_format="pandas", batch_size=None))
    dk.write_parquet(pathl)          # 1M-row result never touches the driver
    t_latest = time.time() - t0

    # --- DuckDB verification (single-node columnar oracle) ---------------
    con = duckdb.connect()
    t0 = time.time()
    bad_lag = con.execute(f"""
        WITH exp AS (SELECT rid,
                            LAG(v) OVER (PARTITION BY k ORDER BY rid) AS e
                     FROM (SELECT rid, k, v FROM read_parquet('{path}/*.parquet'))),
             got AS (SELECT rid, prev_v FROM read_parquet('{path}/*.parquet'))
        SELECT COUNT(*) FROM exp JOIN got USING (rid)
        WHERE CAST(e AS DOUBLE) IS DISTINCT FROM prev_v
    """).fetchone()[0]
    t_duck_lag = time.time() - t0
    t0 = time.time()
    bad_latest = con.execute(f"""
        WITH exp AS (
          SELECT k, rid AS last_rid, v AS last_v,
                 ROW_NUMBER() OVER (PARTITION BY k ORDER BY rid DESC) AS rn,
                 COUNT(*) OVER (PARTITION BY k) AS n
          FROM read_parquet('{path}/*.parquet')),
             got AS (SELECT * FROM read_parquet('{pathl}/*.parquet'))
        SELECT (SELECT COUNT(*) FROM exp WHERE rn = 1) - (SELECT COUNT(*) FROM got)
               + (SELECT COUNT(*) FROM exp JOIN got USING (k)
                  WHERE rn = 1 AND (exp.last_rid <> got.last_rid
                                    OR exp.last_v <> got.last_v
                                    OR exp.n <> got.n))
    """).fetchone()[0]
    t_duck_latest = time.time() - t0

    print(json.dumps({
        "metric": "window_nav_scale_demo", "rows": N, "keys": N_KEYS,
        "blocks": n_blocks,
        "driver_carry_rows_lag": n_blocks,   # one summary row per block
        "lag_wall_sec": round(t_lag, 2),
        "latest_wall_sec": round(t_latest, 2),
        "mismatches_lag": bad_lag, "mismatches_latest": int(bad_latest),
        "duckdb_lag_sec": round(t_duck_lag, 2),
        "duckdb_latest_sec": round(t_duck_latest, 2),
        "exact_match_vs_duckdb": bad_lag == 0 and bad_latest == 0,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
