"""Similarity search over embedding columns (``list<float>``).

Two paths, both Ray-Data-native:

- **Brute-force cosine top-k** (the exactness baseline): the query matrix is
  broadcast once (``ray.put``), every batch computes a (batch × queries)
  similarity matrix with one float64 matmul and emits its local top-k per
  query; a final tiny ``groupby(qid)`` merge selects the global top-k.
  Wall-clock scales linearly with corpus size and is embarrassingly
  parallel — no shuffle of the corpus itself.

- **LSH-bucketed cosine** (the scale path): random-hyperplane signatures
  (b bits) bucket the corpus; queries probe matching buckets (optionally
  multi-probe with Hamming-1 neighbors). Recall<1 by design; the bucket
  groupby is the only all-to-all exchange.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _to_matrix(col) -> np.ndarray:
    """list<float32> pandas column → (n, d) float64 matrix."""
    return np.stack([np.asarray(v, np.float64) for v in col])


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceTopK:
    """map_batches kernel: per-batch local top-k per query (partial step)."""

    def __init__(self, queries_ref, k: int = 10):
        import ray

        q = ray.get(queries_ref)  # {"qid": int64[], "mat": (nq, d) float64}
        self.qids = q["qid"]
        self.qmat = _normalize(q["mat"])
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({"qid": pd.Series([], dtype=np.int64),
                                 "vid": pd.Series([], dtype=np.int64),
                                 "sim": pd.Series([], dtype=np.float64)})
        t = _normalize(_to_matrix(batch["embedding"]))
        sims = t @ self.qmat.T  # (batch, nq)
        vids = batch["vec_id"].to_numpy(np.int64)
        k = min(self.k, len(batch))
        out_q, out_v, out_s = [], [], []
        for j, qid in enumerate(self.qids):
            col = sims[:, j]
            idx = np.argpartition(-col, k - 1)[:k]
            # deterministic order: sim desc, vid asc
            idx = idx[np.lexsort((vids[idx], -col[idx]))]
            out_q.append(np.full(k, qid, np.int64))
            out_v.append(vids[idx])
            out_s.append(col[idx])
        return pd.DataFrame({"qid": np.concatenate(out_q),
                             "vid": np.concatenate(out_v),
                             "sim": np.concatenate(out_s)})


def merge_topk(group: pd.DataFrame, k: int = 10) -> pd.DataFrame:
    """map_groups kernel on qid: merge partial top-ks → global top-k."""
    g = group.sort_values(["sim", "vid"], ascending=[False, True], kind="mergesort")
    return g.head(k)


def brute_force_topk(ds, queries_ref, k: int = 10):
    """Dataset driver: embeddings ds → (qid, vid, sim) global top-k rows."""
    partial = ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs=dict(queries_ref=queries_ref, k=k),
        batch_format="pandas",
        concurrency=2,
    )
    return partial.groupby("qid").map_groups(lambda g: merge_topk(g, k), batch_format="pandas")


# ---------------------------------------------------------------------------
# IVF (inverted file over a k-means coarse quantizer)
# ---------------------------------------------------------------------------

def kmeans_centroids(mat: np.ndarray, nlist: int = 16, iters: int = 10,
                     seed: int = 3) -> np.ndarray:
    """Deterministic spherical k-means on L2-normalized vectors (cosine
    assignment, renormalized mean update; empty lists keep their centroid).
    Trained on a SAMPLE on the driver — the coarse quantizer is tiny and
    broadcast; assignment of the full corpus stays distributed."""
    m = _normalize(np.asarray(mat, np.float64))
    rng = np.random.default_rng(seed)
    c = m[rng.choice(len(m), min(nlist, len(m)), replace=False)].copy()
    for _ in range(iters):
        assign = (m @ c.T).argmax(axis=1)
        for j in range(len(c)):
            members = m[assign == j]
            if len(members):
                mean = members.mean(axis=0)
                norm = np.linalg.norm(mean)
                if norm:
                    c[j] = mean / norm
    return c


def make_ivf_assigner(centroids: np.ndarray):
    def assigner(batch: pd.DataFrame) -> pd.DataFrame:
        m = _normalize(_to_matrix(batch["embedding"]))
        out = batch.copy()
        out["ivf_list"] = (m @ centroids.T).argmax(axis=1).astype(np.int32)
        return out

    return assigner


def ivf_topk(ds, queries: dict, k: int = 10, nlist: int = 16, nprobe: int = 4,
             iters: int = 10, seed: int = 3, train_rows: int = 4096):
    """Approximate top-k via an inverted file: train a coarse quantizer on
    the first ``train_rows`` corpus vectors (driver-side numpy — the
    quantizer is nlist×d, broadcast once), assign the corpus to lists with
    a distributed map_batches, probe each query's ``nprobe`` nearest lists,
    and brute-force only the probed candidates. Recall<1 by design; the
    probed fraction ≈ nprobe/nlist of the corpus."""
    import ray

    sample = _to_matrix(ds.limit(train_rows).to_pandas()["embedding"])
    centroids = kmeans_centroids(sample, nlist, iters, seed)
    qsim = _normalize(queries["mat"]) @ centroids.T
    probe = set()
    for row in qsim:
        probe.update(int(j) for j in np.argsort(-row)[:nprobe])
    assigned = ds.map_batches(make_ivf_assigner(centroids), batch_format="pandas")
    cand = assigned.map_batches(
        lambda b, pr=frozenset(probe): b.loc[b["ivf_list"].isin(pr)],
        batch_format="pandas")
    qref = ray.put(queries)
    return brute_force_topk(cand, qref, k)


# ---------------------------------------------------------------------------
# LSH (random hyperplanes)
# ---------------------------------------------------------------------------

def hyperplanes(d: int, bits: int = 12, seed: int = 11) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((bits, d))


def lsh_signature(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (mat @ planes.T) > 0
    out = np.zeros(len(mat), np.int64)
    for i in range(planes.shape[0]):
        out |= bits[:, i].astype(np.int64) << i
    return out


def make_lsh_bucketer(planes: np.ndarray):
    def bucketer(batch: pd.DataFrame) -> pd.DataFrame:
        m = _to_matrix(batch["embedding"])
        out = batch.copy()
        out["bucket"] = lsh_signature(m, planes)
        return out

    return bucketer


def lsh_topk(ds, queries: dict, k: int = 10, bits: int = 12, seed: int = 11, d: int | None = None):
    """Approximate top-k: bucket corpus by hyperplane signature, search only
    the queries' (multi-probe Hamming≤1) buckets. Returns (qid, vid, sim)."""
    import ray

    d = d or queries["mat"].shape[1]
    planes = hyperplanes(d, bits, seed)
    qsig = lsh_signature(queries["mat"], planes)
    probe: set[int] = set()
    for s in qsig:
        probe.add(int(s))
        for b in range(bits):
            probe.add(int(s) ^ (1 << b))
    bucketed = ds.map_batches(make_lsh_bucketer(planes), batch_format="pandas")
    cand = bucketed.map_batches(
        lambda b, pr=frozenset(probe): b.loc[b["bucket"].isin(pr)], batch_format="pandas"
    )
    qref = ray.put(queries)
    return brute_force_topk(cand, qref, k)
