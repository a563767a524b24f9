"""Bench-tier MinHash-LSH near-dup run: ≥100k documents, fully distributed.

Builds a 100k-doc corpus from the sf0.1 documents table (5,000 docs × 20
replicas; each replica Caesar-shifts letters by its replica index, so
cross-replica texts share almost no shingles while each replica preserves
the original near-dup pair structure), writes it as a parquet table, and
runs the EXACT production pipeline (`queries.minhash_near_dups`) over it.

Evidence target (VERDICT r1 item 1): the LSH orchestration holds at
bench tier with no corpus-scale driver materialization — the band table
never leaves the cluster (sort-shuffle + per-block kernels), the driver
touches only candidate-pair-scale data, and the verified pair structure
replicates per replica.

Run:  python tools/minhash_scale_demo.py
"""

from __future__ import annotations

import json
import os
import shutil
import string
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"
OUT = "/tmp/minhash_scale"
REPLICAS = 20


def caesar(texts: pd.Series, r: int) -> pd.Series:
    lower = string.ascii_lowercase
    upper = string.ascii_uppercase
    table = str.maketrans(lower + upper,
                          lower[r % 26:] + lower[:r % 26] + upper[r % 26:] + upper[:r % 26])
    return texts.str.translate(table)


def build_corpus() -> int:
    src = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    os.makedirs(OUT, exist_ok=True)
    parts = []
    for r in range(REPLICAS):
        parts.append(pd.DataFrame({
            "doc_id": src["doc_id"].to_numpy(np.int64) + np.int64(r * 1_000_000),
            "text": caesar(src["text"].astype("string"), r),
        }))
    corpus = pd.concat(parts, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(corpus, preserve_index=False),
                   f"{OUT}/documents.parquet")
    return len(corpus)


def main():
    import ray

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from crawler_ray.pipelines.queries import minhash_near_dups

    shutil.rmtree(OUT, ignore_errors=True)
    n_docs = build_corpus()
    t0 = time.time()
    pairs = minhash_near_dups(OUT)
    dt = time.time() - t0

    # pair structure must replicate: every pair's endpoints share a replica,
    # and each replica contributes the same base-pair set
    rep_a = pairs["doc_a"] // 1_000_000
    rep_b = pairs["doc_b"] // 1_000_000
    same_replica = bool((rep_a == rep_b).all())
    per_replica = pairs.assign(rep=rep_a).groupby("rep").size()
    base = set(zip(pairs.loc[rep_a == 0, "doc_a"], pairs.loc[rep_a == 0, "doc_b"]))
    print(json.dumps({
        "metric": "minhash_scale_demo", "n_docs": n_docs, "replicas": REPLICAS,
        "wall_sec": round(dt, 2), "docs_per_sec": round(n_docs / dt, 1),
        "verified_pairs": int(len(pairs)),
        "pairs_replica0": int(len(base)),
        "replicas_with_pairs": int((per_replica > 0).sum()),
        "all_pairs_within_replica": same_replica,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
