"""Bench-tier demonstration of product-quantization ANN (functions/ann.py
pq_topk) at 100k × 64-dim vectors.

What it shows:
- the PQ scan touches 8 bytes of codes per vector (64:1 compression vs
  float64, 32:1 vs the stored float32) — the memory-bound shape a
  10^10-vector corpus needs;
- recall@10 against the exact brute-force cosine top-10 on CLUSTERED data
  (the regime ANN indexes exist for) and on uniform-random data (the
  honest worst case — random 64-dim unit vectors have no neighborhood
  structure for ANY quantizer to exploit);
- bit-identical results across two different block layouts (the
  integer-exactness claim at demo scale).

Run: python tools/pq_scale_demo.py   (~2 min at 32 cpus)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")


def build(n: int, d: int, clustered: bool, seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    if clustered:
        k = 64
        cents = rng.standard_normal((k, d)) * 3.0
        a = rng.integers(0, k, n)
        mat = cents[a] + rng.standard_normal((n, d)) * 0.4
    else:
        mat = rng.standard_normal((n, d))
    return pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                         "embedding": [v.astype(np.float32) for v in mat]})


def recall(approx: pd.DataFrame, exact: pd.DataFrame) -> float:
    hits = 0
    total = 0
    for qid, g in exact.groupby("qid"):
        want = set(g["vid"].astype(int))
        got = set(approx.loc[approx["qid"] == qid, "vid"].astype(int))
        hits += len(want & got)
        total += len(want)
    return hits / total


def main() -> None:
    import ray
    import ray.data as rd

    from crawler_ray.functions import ann

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)
    n, d, nq = 100_000, 64, 16
    for regime in ("clustered", "uniform"):
        df = build(n, d, regime == "clustered", seed=21)
        qmat = np.stack([np.asarray(v, np.float64)
                         for v in df["embedding"].iloc[:nq]])
        queries = {"qid": np.arange(nq, dtype=np.int64), "mat": qmat}
        corpus = df.iloc[nq:]
        ds = rd.from_pandas(corpus).repartition(32)
        train = rd.from_pandas(corpus.iloc[:4096])

        t0 = time.time()
        qref = ray.put(queries)
        exact = ann.brute_force_topk(ds, qref, k=10).to_pandas()
        t_brute = time.time() - t0

        t0 = time.time()
        approx = ann.pq_topk(ds, train, queries, k=10).to_pandas()
        t_pq = time.time() - t0

        t0 = time.time()
        rerank = ann.pq_topk_rerank(ds, train, queries, k=10, r=200).to_pandas()
        t_rr = time.time() - t0

        alt = ann.pq_topk(rd.from_pandas(corpus).repartition(7),
                          train, queries, k=10).to_pandas()
        same = (approx.sort_values(["qid", "vid"]).reset_index(drop=True)
                .equals(alt.sort_values(["qid", "vid"]).reset_index(drop=True)))

        print(json.dumps({
            "stage": f"pq_demo_{regime}", "n": n, "d": d, "queries": nq,
            "adc_recall_at_10_vs_brute": round(recall(approx, exact), 4),
            "rerank200_recall_at_10_vs_brute": round(recall(rerank, exact), 4),
            "code_bytes_per_vector": 8,
            "float32_bytes_per_vector": 4 * d,
            "compression_x": 4 * d // 8,
            "brute_wall_sec": round(t_brute, 2),
            "pq_wall_sec": round(t_pq, 2),
            "rerank_wall_sec": round(t_rr, 2),
            "bit_identical_across_layouts": bool(same)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
