"""Scale demonstration: banded embedding near-dup at 100k+ vectors.

Builds a 102,500-vector 64-d corpus (100k random + 2,500 planted near-dup
pairs at cos≈0.95), runs the production banded path
(``ann.banded_near_dup_pairs``: hyperplane sign bands → sort-shuffle bucket
collision → shuffle-join exact-cosine verify) and checks it against the
INDEPENDENT exact algorithm (``ann.tiled_near_dup_pairs``: distributed
block-pair tile grid) at the same threshold. The two paths share no
candidate-generation code, so agreement is a real recall measurement.

Context (BENCH/BASELINE.md): at LOW thresholds (0.45, the DuckDB-checked
query default) the fixture's qualifying pairs are the ~2σ tail of the
random-sim distribution — banding cannot prune there and the tiled exact
grid IS the production path. This demo covers the other regime: true
near-duplicates, where banding is linear-time.

Run:  python tools/embedding_banded_demo.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BASE = 100_000
N_DUPS = 2_500
DIM = 64
THRESHOLD = 0.9
SEED = 101


def main() -> None:
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from crawler_ray.functions import ann

    rng = np.random.default_rng(SEED)
    base = rng.standard_normal((N_BASE, DIM))
    idx = rng.choice(N_BASE, N_DUPS, replace=False)
    dup = base[idx] + 0.32 * rng.standard_normal((N_DUPS, DIM))  # cos≈0.95
    mat = np.vstack([base, dup]).astype(np.float64)
    df = pd.DataFrame({"vec_id": np.arange(len(mat), dtype=np.int64),
                       "embedding": [v.tolist() for v in mat]})
    ds = rd.from_pandas(df).repartition(64).materialize()

    t0 = time.time()
    banded = ann.banded_near_dup_pairs(ds, THRESHOLD)
    banded_sec = time.time() - t0

    t0 = time.time()
    exact = ann.tiled_near_dup_pairs(ds, THRESHOLD)
    exact_sec = time.time() - t0

    bset = set(zip(banded["vid_a"], banded["vid_b"]))
    eset = set(zip(exact["vid_a"], exact["vid_b"]))
    print(json.dumps({
        "metric": "embedding_banded_demo",
        "n_vectors": len(mat), "dim": DIM, "threshold": THRESHOLD,
        "pairs_exact": len(eset), "pairs_banded": len(bset),
        "missed": len(eset - bset), "spurious": len(bset - eset),
        "recall": round(len(bset & eset) / max(1, len(eset)), 6),
        "banded_sec": round(banded_sec, 1), "exact_sec": round(exact_sec, 1),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
