"""Scale demo: Bloom-pruned semi-join + CMS heavy hitters at 20M rows.

Synthesizes (deterministically, in parquet under /tmp) a 20M-row fact
table and a 400k-key build side with ~2 % fact selectivity, then runs:

1. the Bloom-pruned semi-join (build-side filter partials → OR fold →
   in-map prune → exact join over survivors) — the aggregate must match
   DuckDB's plain ``IN`` subquery exactly, and the prune must drop ~98 %
   of fact rows BEFORE the shuffle;
2. the same semi-join as a plain Dataset hash join (no prune) — the
   baseline whose shuffle the Bloom path avoids;
3. CMS φ-heavy hitters over a 20M-token zipf stream vs DuckDB's
   GROUP BY/HAVING.

Prints one JSON line per stage. Run: python tools/sketch_scale_demo.py
(owns its Ray session; ~2 min at 32 cpus).
"""
import json
import os
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FACT = 20_000_000
N_BUILD = 400_000
KEY_SPACE = 20_000_000
OUT = "/tmp/sketch_scale_demo"


def _mur(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.uint64).copy()
    x ^= x >> np.uint64(32)
    x *= np.uint64(0xD6E8FEB86659FD93)
    x ^= x >> np.uint64(32)
    x *= np.uint64(0xD6E8FEB86659FD93)
    x ^= x >> np.uint64(32)
    return x


def synth():
    os.makedirs(OUT, exist_ok=True)
    fact_p = f"{OUT}/fact.parquet"
    build_p = f"{OUT}/build.parquet"
    if not (os.path.exists(fact_p) and os.path.exists(build_p)):
        # fact keys uniform over KEY_SPACE; build keys = a deterministic
        # murmur-selected 2 % slice of the key space
        keys = (_mur(np.arange(N_FACT, dtype=np.uint64)) % np.uint64(KEY_SPACE)).astype(np.int64)
        val = (_mur(np.arange(N_FACT, dtype=np.uint64) ^ np.uint64(7)) % np.uint64(1000)).astype(np.int64)
        pq.write_table(pa.table({"k": keys, "v": val}), fact_p)
        build = np.flatnonzero(_mur(np.arange(KEY_SPACE, dtype=np.uint64)) % np.uint64(50) == 0)[:N_BUILD].astype(np.int64)
        pq.write_table(pa.table({"bk": build}), build_p)
    return fact_p, build_p


def main():
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from crawler_ray.functions import sketches as sk

    fact_p, build_p = synth()

    # ---- 1. Bloom-pruned semi-join -------------------------------------
    t0 = time.time()
    build = rd.read_parquet(build_p)
    m_bits = sk.bloom_m_bits(N_BUILD)

    def bloom_partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"filt": [sk.bloom_build(
            _mur(b["bk"].to_numpy(np.int64).view(np.uint64)), m_bits).tobytes()]})

    parts = build.map_batches(bloom_partial, batch_format="pandas").to_pandas()
    filt = np.zeros(m_bits >> 6, np.uint64)
    for blob in parts["filt"]:
        filt = sk.bloom_merge(filt, np.frombuffer(blob, np.uint64))
    filt_ref = ray.put(filt)

    class Prune:
        def __init__(self):
            self.filt = ray.get(filt_ref)
            self.seen = 0
            self.kept = 0

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            keep = sk.bloom_contains(self.filt, _mur(b["k"].to_numpy(np.int64).view(np.uint64)))
            return b.loc[keep]

    fact = rd.read_parquet(fact_p)
    survivors = fact.map_batches(Prune, batch_format="pandas", concurrency=(1, 16))
    joined = survivors.join(build, join_type="inner", num_partitions=16,
                            on=("k",), right_on=("bk",))
    agg = joined.map_batches(
        lambda b: pd.DataFrame({"n": [len(b)], "sv": [int(b["v"].sum())]}),
        batch_format="pandas").to_pandas()
    n_match, sum_v = int(agg["n"].sum()), int(agg["sv"].sum())
    bloom_sec = time.time() - t0
    # prune stats measured OUTSIDE the timed path (a second execution —
    # the timed pipeline streams prune→join in ONE pass)
    n_surv = (rd.read_parquet(fact_p)
              .map_batches(Prune, batch_format="pandas", concurrency=(1, 16))
              .count())

    import duckdb
    con = duckdb.connect()
    t0 = time.time()
    want = con.sql(f"""
        SELECT COUNT(*) n, SUM(v) sv FROM read_parquet('{fact_p}')
        WHERE k IN (SELECT bk FROM read_parquet('{build_p}'))""").fetchone()
    duck_sec = time.time() - t0
    exact = (n_match == want[0]) and (sum_v == want[1])
    print(json.dumps({
        "stage": "bloom_semi_join", "fact_rows": N_FACT, "build_keys": N_BUILD,
        "rows_into_shuffle": n_surv,
        "shuffle_rows_avoided_frac": round(1 - n_surv / N_FACT, 4),
        "matches": n_match, "exact_vs_duckdb": exact,
        "wall_sec": round(bloom_sec, 1), "duckdb_sec": round(duck_sec, 1)}))
    assert exact

    # ---- 2. plain hash join baseline (what the prune avoids) ----------
    t0 = time.time()
    fact2 = rd.read_parquet(fact_p)
    j2 = fact2.join(rd.read_parquet(build_p), join_type="inner",
                    num_partitions=16, on=("k",), right_on=("bk",))
    agg2 = j2.map_batches(lambda b: pd.DataFrame({"n": [len(b)]}),
                          batch_format="pandas").to_pandas()
    plain_sec = time.time() - t0
    print(json.dumps({"stage": "plain_hash_join_baseline",
                      "matches": int(agg2["n"].sum()),
                      "wall_sec": round(plain_sec, 1),
                      "bloom_speedup": round(plain_sec / bloom_sec, 2)}))

    # ---- 3. CMS heavy hitters over a 20M-token zipf stream -------------
    toks_p = f"{OUT}/toks.parquet"
    if not os.path.exists(toks_p):
        # zipf-ish: token id = KEY_SPACE-uniform draw mapped through 1/rank
        u = (_mur(np.arange(N_FACT, dtype=np.uint64) ^ np.uint64(13))
             % np.uint64(1 << 30)).astype(np.float64) / float(1 << 30)
        tok = np.minimum((1.0 / np.maximum(u, 1e-9)).astype(np.int64), 200_000)
        pq.write_table(pa.table({"tok": tok}), toks_p)

    t0 = time.time()
    ds = rd.read_parquet(toks_p)

    def cms_partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b["tok"].value_counts()
        h = _mur(vc.index.to_numpy(np.int64).view(np.uint64))
        return pd.DataFrame({"cms": [sk.cms_build(h, vc.to_numpy(np.int64)).tobytes()],
                             "total": np.array([int(vc.sum())], np.int64)})

    parts = ds.map_batches(cms_partial, batch_format="pandas").to_pandas()
    cms = np.zeros((sk.CMS_D, sk.CMS_W), np.int64)
    for blob in parts["cms"]:
        cms = sk.cms_merge(cms, np.frombuffer(blob, np.int64).reshape(sk.CMS_D, sk.CMS_W))
    total = int(parts["total"].sum())
    thresh = max(1, int(np.ceil(1e-4 * total)))
    cms_ref = ray.put(cms)

    class Cand:
        def __init__(self):
            self.cms = ray.get(cms_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            vc = b["tok"].value_counts()
            h = _mur(vc.index.to_numpy(np.int64).view(np.uint64))
            keep = sk.cms_query(self.cms, h) >= thresh
            return pd.DataFrame({"tok": vc.index.to_numpy(np.int64)[keep],
                                 "cnt": vc.to_numpy(np.int64)[keep]})

    cand = (ds.map_batches(Cand, batch_format="pandas", concurrency=(1, 16))
            .to_pandas().groupby("tok", as_index=False).agg(cnt=("cnt", "sum")))
    hh = cand.loc[cand["cnt"] >= thresh].sort_values("tok").reset_index(drop=True)
    cms_sec = time.time() - t0

    t0 = time.time()
    want = con.sql(f"""
        SELECT tok, CAST(COUNT(*) AS BIGINT) cnt FROM read_parquet('{toks_p}')
        GROUP BY tok HAVING COUNT(*) >= {thresh} ORDER BY tok""").df()
    duck_sec = time.time() - t0
    exact = hh.reset_index(drop=True).astype(np.int64).equals(want.astype(np.int64))
    print(json.dumps({
        "stage": "cms_heavy_hitters", "stream": total, "threshold": thresh,
        "heavy_tokens": len(hh), "candidate_rows_via_driver": int(len(cand)),
        "exact_vs_duckdb": exact,
        "wall_sec": round(cms_sec, 1), "duckdb_sec": round(duck_sec, 1)}))
    assert exact
    ray.shutdown()


if __name__ == "__main__":
    main()
