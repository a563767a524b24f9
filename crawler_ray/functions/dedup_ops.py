"""Deduplication operators for training-data pipelines (SURVEY.md §2.7+).

The reference only has exact URL/content dedup (D1/D2). A 100 TB corpus
engine needs near-dup too; this module provides the batch kernels and
Dataset drivers for:

- exact dedup        hash-partition on xxh64(text) + per-group first-wins
- MinHash + LSH      shingle → k minhashes → b bands → band-bucket groupby
                     → candidate pairs → exact-Jaccard verify
- SimHash            64-bit simhash + 4-way band blocking → Hamming verify
- n-gram Jaccard     direct pairwise verify kernel (used by both)

Scale notes: every stage is a ``map_batches`` or ``groupby`` — the only
all-to-all exchanges are the band-bucket groupbys keyed on (band, band_hash)
and the final pair dedup. Candidate pairs are verified with the exact
kernel before being reported, so LSH false positives never escape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from crawler_ray.hashing import xxh64, xxh64_array

def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Sorted unique 64-bit hashes of the k-byte shingles of ``text``,
    computed fully vectorized: sliding windows over the UTF-8 byte array,
    k FNV-style fold steps, then an avalanche mix (no per-shingle Python)."""
    b = np.frombuffer(text.lower().encode("utf-8"), np.uint8)
    if len(b) == 0:
        return np.zeros(0, np.uint64)
    if len(b) < k:
        win = b[None, :]
    else:
        win = np.lib.stride_tricks.sliding_window_view(b, k)
    h = np.full(len(win), 0xCBF29CE484222325, np.uint64)
    prime = np.uint64(0x100000001B3)
    for i in range(win.shape[1]):
        h = (h ^ win[:, i].astype(np.uint64)) * prime
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xC2B2AE3D27D4EB4F)
    h ^= h >> np.uint64(29)
    return np.unique(h)


def _perm_seeds(num_perm: int, seed: int = 7) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 1 << 63, num_perm, dtype=np.uint64)


def minhash_signature(sh: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """num_perm minhashes of a shingle-hash set: min over shingles of the
    xxh64-avalanche remix of (hash ^ seed_i) — fully vectorized (perms ×
    shingles matrix)."""
    if len(sh) == 0:
        return np.full(len(seeds), np.iinfo(np.uint64).max, np.uint64)
    x = sh[None, :] ^ seeds[:, None]
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xC2B2AE3D27D4EB4F)
    x ^= x >> np.uint64(29)
    x *= np.uint64(0x165667B19E3779F9)
    x ^= x >> np.uint64(32)
    return x.min(axis=1)


def minhash_bands(batch: pd.DataFrame, num_perm: int = 32, bands: int = 8,
                  k: int = 5, seed: int = 7) -> pd.DataFrame:
    """map_batches kernel: doc → (band, band_hash, doc_id) rows for LSH."""
    seeds = _perm_seeds(num_perm, seed)
    rows_band, rows_hash, rows_doc = [], [], []
    r = num_perm // bands
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        sig = minhash_signature(shingle_hashes(str(text), k), seeds)
        for band in range(bands):
            h = xxh64(sig[band * r : (band + 1) * r].tobytes())
            rows_band.append(band)
            rows_hash.append(h)
            rows_doc.append(doc_id)
    return pd.DataFrame(
        {"band": np.array(rows_band, np.int32),
         "band_hash": np.array(rows_hash, np.uint64),
         "doc_id": np.array(rows_doc, np.int64)}
    )


def connected_components(pairs: pd.DataFrame, all_ids=None) -> pd.DataFrame:
    """Near-dup clusters from verified pairs: iterative min-label
    propagation (each round every node takes the min label among itself and
    its neighbors; converges in O(diameter) rounds — the groupby-friendly
    formulation). The pair set is verified-near-dups, i.e. orders of
    magnitude smaller than the corpus, so rounds run in memory here; at
    cluster scale each round is a groupby(node).min(label) shuffle with the
    identical dataflow."""
    edges = pd.concat([
        pairs.rename(columns={"doc_a": "node", "doc_b": "peer"})[["node", "peer"]],
        pairs.rename(columns={"doc_b": "node", "doc_a": "peer"})[["node", "peer"]],
    ], ignore_index=True)
    label = {}
    for n in pd.unique(edges[["node", "peer"]].to_numpy().ravel()):
        label[int(n)] = int(n)
    changed = True
    while changed:
        changed = False
        merged = edges.assign(peer_label=edges["peer"].map(label))
        mins = merged.groupby("node")["peer_label"].min()
        for n, m in mins.items():
            m = min(int(m), label[int(n)])
            if m < label[int(n)]:
                label[int(n)] = m
                changed = True
    out_ids = sorted(label) if all_ids is None else sorted(set(all_ids) | set(label))
    return pd.DataFrame({
        "doc_id": np.array(out_ids, np.int64),
        "cluster_id": np.array([label.get(i, i) for i in out_ids], np.int64),
    })


def collide_pairs(bands: pd.DataFrame) -> pd.DataFrame:
    """(band, band_hash, doc_id) rows → unique candidate pairs, touching only
    colliding buckets: a vectorized duplicated() mask removes the (vast)
    singleton majority first, then pairs expand per surviving bucket."""
    dup = bands.duplicated(["band", "band_hash"], keep=False)
    hot = bands.loc[dup]
    if len(hot) == 0:
        return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                             "doc_b": pd.Series([], dtype=np.int64)})
    pieces = [bucket_pairs(g) for _, g in hot.groupby(["band", "band_hash"])]
    out = pd.concat(pieces, ignore_index=True)
    return out.drop_duplicates(["doc_a", "doc_b"]).reset_index(drop=True)


def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """map_groups kernel on (band, band_hash): emit candidate doc pairs."""
    ids = np.sort(group["doc_id"].unique())
    if len(ids) < 2:
        return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                             "doc_b": pd.Series([], dtype=np.int64)})
    ii, jj = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"doc_a": ids[ii], "doc_b": ids[jj]})


def jaccard(sh_a: np.ndarray, sh_b: np.ndarray) -> float:
    """Exact Jaccard of two sorted-unique shingle-hash sets."""
    if len(sh_a) == 0 and len(sh_b) == 0:
        return 1.0
    inter = len(np.intersect1d(sh_a, sh_b, assume_unique=True))
    return inter / (len(sh_a) + len(sh_b) - inter)


class PairVerifier:
    """Actor-pool stage: exact-Jaccard verification of candidate pairs.

    Holds the doc_id → shingle-set index built ONCE per actor from a
    broadcast ref (ray.put on the driver) — the small-side lookup pattern."""

    def __init__(self, texts_ref, k: int = 5, threshold: float = 0.5):
        import ray

        texts = ray.get(texts_ref)
        self.shingles = {d: shingle_hashes(t, k) for d, t in texts.items()}
        self.threshold = threshold

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        keep, sims = [], []
        for a, b in zip(batch["doc_a"], batch["doc_b"]):
            sim = jaccard(self.shingles[int(a)], self.shingles[int(b)])
            keep.append(sim >= self.threshold)
            sims.append(sim)
        out = batch.copy()
        out["jaccard"] = np.round(np.array(sims, np.float64), 6)
        return out.loc[np.array(keep, bool)]


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(batch: pd.DataFrame) -> pd.DataFrame:
    """64-bit SimHash over token xxh64s (sign-sum of hash bits)."""
    text = batch["text"].astype("string")
    words = text.str.lower().str.findall(r"[A-Za-z0-9_一-鿿]+")
    out = batch[["doc_id"]].copy()
    hashes = []
    for ws in words:
        ws = list(ws)
        if not ws:
            hashes.append(0)
            continue
        hs = xxh64_array(ws)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        acc = (2 * bits - 1).sum(axis=0)
        val = np.uint64(0)
        for i in np.nonzero(acc > 0)[0]:
            val |= np.uint64(1) << np.uint64(i)
        hashes.append(int(val.astype(np.int64)))
    out["simhash"] = np.array(hashes, np.int64)
    return out


def simhash_bands(batch: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, simhash) → 4 band rows of 16 bits each; Hamming≤3 dups must
    collide in ≥1 band (pigeonhole)."""
    sh = batch["simhash"].to_numpy(np.int64).view(np.uint64)
    rows = []
    for band in range(4):
        chunk = (sh >> np.uint64(16 * band)) & np.uint64(0xFFFF)
        rows.append(pd.DataFrame({
            "band": np.int32(band), "band_hash": chunk.astype(np.int64),
            "doc_id": batch["doc_id"].to_numpy(np.int64),
            "simhash": batch["simhash"].to_numpy(np.int64)}))
    return pd.concat(rows, ignore_index=True)


def simhash_bucket_pairs(group: pd.DataFrame, max_hamming: int = 3) -> pd.DataFrame:
    g = group.drop_duplicates("doc_id").sort_values("doc_id")
    ids = g["doc_id"].to_numpy(np.int64)
    hs = g["simhash"].to_numpy(np.int64).view(np.uint64)
    empty = pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                          "doc_b": pd.Series([], dtype=np.int64),
                          "hamming": pd.Series([], dtype=np.int32)})
    if len(ids) < 2:
        return empty
    ii, jj = np.triu_indices(len(ids), k=1)
    x = hs[ii] ^ hs[jj]
    ham = np.zeros(len(x), np.int32)
    for _ in range(64):
        ham += (x & np.uint64(1)).astype(np.int32)
        x = x >> np.uint64(1)
        if not x.any():
            break
    keep = ham <= max_hamming
    return pd.DataFrame({"doc_a": ids[ii][keep], "doc_b": ids[jj][keep], "hamming": ham[keep]})
