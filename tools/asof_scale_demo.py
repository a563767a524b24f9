"""Bench-tier demonstration of the distributed as-of join.

2,000,000 left rows ⋈ 500,000 right rows over 100,000 keys — far past any
broadcast-side comfort — through the production `functions.joins.asof_join`
(one sort shuffle + per-block ffill + driver seam fold), verified
row-for-row against DuckDB's native ASOF LEFT JOIN on the same data.

Run: python tools/asof_scale_demo.py   (~1 min at 32 cpus)
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

N_LEFT, N_RIGHT, N_KEYS = 2_000_000, 500_000, 100_000
T_RANGE = 10_000_000


def _mix(x: np.ndarray, salt: int) -> np.ndarray:
    x = (np.asarray(x, np.uint64) + np.uint64(salt)) * np.uint64(0x9E3779B185EBCA87)
    x ^= x >> np.uint64(29)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(32)
    return x


def gen_left(b: pd.DataFrame) -> pd.DataFrame:
    i = b["id"].to_numpy(np.int64)
    return pd.DataFrame({"event_id": i,
                         "user_id": (_mix(i, 1) % N_KEYS).astype(np.int64),
                         "t": (_mix(i, 2) % T_RANGE).astype(np.int64)})


def gen_right(b: pd.DataFrame) -> pd.DataFrame:
    j = b["id"].to_numpy(np.int64)
    return pd.DataFrame({"k": (_mix(j, 3) % N_KEYS).astype(np.int64),
                         "rt": (_mix(j, 4) % T_RANGE).astype(np.int64),
                         "price": ((_mix(j, 5) % 1_000_000) / 100.0)})


def main() -> None:
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from crawler_ray.functions import joins
    from crawler_ray.functions.joins import asof_join_ds

    left = rd.range(N_LEFT, override_num_blocks=64).map_batches(gen_left, batch_format="pandas")
    right = rd.range(N_RIGHT, override_num_blocks=32).map_batches(gen_right, batch_format="pandas")

    # instrument the seam gather: the ONLY rows the operator pulls to the
    # driver go through _asof_fold(final=True) — count them to evidence
    # O(seam) driver memory (vs N_LEFT for a full gather)
    seam_rows = {"n": 0}
    _orig_fold = joins._asof_fold

    def counting_fold(df, final=False):
        if final:
            seam_rows["n"] += len(df)
        return _orig_fold(df, final=final)

    joins._asof_fold = counting_fold
    try:
        t0 = time.time()
        out_ds = asof_join_ds(left, right, left_id="event_id", key="user_id", time="t",
                              right_key="k", right_time="rt", right_value="price")
        n_rows = out_ds.count()  # streams; result never concentrates anywhere
        wall = time.time() - t0
    finally:
        joins._asof_fold = _orig_fold
    # gather is for VERIFICATION against DuckDB only, not part of the operator
    joined = out_ds.to_pandas()
    assert n_rows == len(joined)

    # oracle: DuckDB native ASOF LEFT JOIN over the identical data
    lf = gen_left(pd.DataFrame({"id": np.arange(N_LEFT, dtype=np.int64)}))
    rf = gen_right(pd.DataFrame({"id": np.arange(N_RIGHT, dtype=np.int64)}))
    con = duckdb.connect()
    con.register("lf", lf)
    con.register("rf", rf)
    t1 = time.time()
    ora = con.sql("""
        WITH r AS (SELECT k, rt, max(price) AS price FROM rf GROUP BY k, rt)
        SELECT lf.event_id, lf.user_id, r.price
        FROM lf ASOF LEFT JOIN r ON lf.user_id = r.k AND lf.t >= r.rt
    """).df()
    duck_wall = time.time() - t1

    a = joined.sort_values("event_id").reset_index(drop=True)
    b = ora.sort_values("event_id").reset_index(drop=True)
    match = (len(a) == len(b) == N_LEFT
             and bool(np.array_equal(a["user_id"].to_numpy(), b["user_id"].to_numpy()))
             and bool(np.allclose(a["price"].fillna(-1).to_numpy(),
                                  b["price"].fillna(-1).to_numpy(), atol=0, rtol=0)))
    print(json.dumps({
        "metric": "asof_scale_demo", "n_left": N_LEFT, "n_right": N_RIGHT,
        "n_keys": N_KEYS, "wall_sec": round(wall, 2),
        "rows_per_sec": round(N_LEFT / wall, 0),
        "nulls": int(a["price"].isna().sum()),
        "seam_rows_on_driver": seam_rows["n"],
        "seam_fraction_of_left": round(seam_rows["n"] / N_LEFT, 4),
        "duckdb_single_node_sec": round(duck_wall, 2),
        "exact_match_vs_duckdb_asof": match,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
